"""Device enumeration must match the host AffineSpace order bit-for-bit."""

import numpy as np

from gf2bv_tpu import AffineSpace, QuadraticSystem
from gf2bv_tpu.core import packing
from gf2bv_tpu.ops.enumerate import (
    enumerate_device,
    iter_quad_filtered,
    quad_consistency_mask,
)

COLS = 77


def mk_space(origin_int, basis_ints):
    origin = packing.int_to_words(origin_int, COLS)
    basis = (
        packing.ints_to_rows(basis_ints, COLS)
        if basis_ints
        else np.zeros((0, packing.nwords64(COLS)), dtype=np.uint64)
    )
    return AffineSpace(origin, basis, COLS)


def test_enumerate_device_matches_host():
    rng = np.random.default_rng(8)
    basis = [int(rng.integers(1, 2**62)) for _ in range(9)]
    sp = mk_space(0b1101, basis)
    host = list(sp)
    pts = np.asarray(enumerate_device(sp, 0, 512))
    dev = packing.rows_to_ints(packing.from_u32(pts))
    assert dev == host
    # chunked from an offset
    pts2 = np.asarray(enumerate_device(sp, 100, 64))
    assert packing.rows_to_ints(packing.from_u32(pts2)) == host[100:164]


def test_enumerate_device_dim0():
    sp = mk_space(99, [])
    pts = np.asarray(enumerate_device(sp, 0, 1))
    assert packing.rows_to_ints(packing.from_u32(pts)) == [99]


def test_quad_consistency_mask_matches_host():
    n = 8
    qsys = QuadraticSystem([n])
    rng = np.random.default_rng(4)
    nbits_sol = qsys._cols  # lin + quad bits
    raws = []
    for _ in range(32):
        lin = int(rng.integers(0, 1 << n))
        bits = [(lin >> i) & 1 for i in range(n)]
        quad = 0
        mi = 0
        for i in range(n):
            for j in range(i):
                quad |= (bits[i] & bits[j]) << mi
                mi += 1
        if rng.integers(0, 2):
            quad ^= 1 << int(rng.integers(0, max(1, qsys._quad_size)))
        raws.append(lin | (quad << n))
    pts = packing.to_u32(packing.ints_to_rows(raws, nbits_sol))
    import jax.numpy as jnp

    got = np.asarray(quad_consistency_mask(jnp.asarray(pts), n))
    want = [qsys._check_lin_match_quad(r & ((1 << n) - 1), r >> n) for r in raws]
    assert list(got) == want


def test_iter_quad_filtered_equals_host_filter():
    n = 6
    qsys = QuadraticSystem([n])
    # space over lin+quad bits with a random small basis
    rng = np.random.default_rng(11)
    cols = qsys._cols
    basis_ints = [int(rng.integers(1, 1 << cols)) for _ in range(10)]
    origin = packing.int_to_words(int(rng.integers(0, 1 << cols)), cols)
    basis = packing.ints_to_rows(basis_ints, cols)
    sp = AffineSpace(origin, basis, cols)
    got = list(iter_quad_filtered(sp, n, chunk=128))
    want = [
        s
        for s in sp
        if qsys._check_lin_match_quad(s & ((1 << n) - 1), s >> n)
    ]
    assert got == want


def test_enumerate_device_dim_over_32():
    """Selector bits beyond 32 must come from the high index word (uint32
    shifts >= 32 are undefined in XLA); checked against the host iterator."""
    import numpy as np

    from gf2bv_tpu.core import packing
    from gf2bv_tpu.core.affine import AffineSpace
    from gf2bv_tpu.ops.enumerate import enumerate_device

    rng = np.random.default_rng(40)
    cols, dim = 80, 40
    origin = packing.pack_bits(rng.integers(0, 2, (1, cols)).astype(np.uint8), cols)[0]
    basis = packing.pack_bits(rng.integers(0, 2, (dim, cols)).astype(np.uint8), cols)
    space = AffineSpace(origin, basis, cols)

    # a window straddling index 2**33 exercises both high selector bits and
    # the 64-bit start split
    start, count = (1 << 33) - 8, 16
    got = np.asarray(enumerate_device(space, start, count))
    want = packing.to_u32(space.enumerate_packed(start, count, gray=True))
    assert np.array_equal(got[:, : want.shape[1]], want)
    assert not got[:, want.shape[1]:].any()
