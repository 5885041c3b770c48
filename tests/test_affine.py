"""AffineSpace semantics: reference iteration order, get(n), properties."""

import numpy as np

from gf2bv_tpu import AffineSpace
from gf2bv_tpu.core import packing

COLS = 70


def mk_space(origin_int, basis_ints):
    origin = packing.int_to_words(origin_int, COLS)
    basis = (
        packing.ints_to_rows(basis_ints, COLS)
        if basis_ints
        else np.zeros((0, packing.nwords64(COLS)), dtype=np.uint64)
    )
    return AffineSpace(origin, basis, COLS)


def test_properties():
    basis = [0b11, 1 << 65]
    sp = mk_space(5, basis)
    assert sp.dimension == 2
    assert sp.origin == 5
    assert sp.basis == [0b11, 1 << 65]  # list, as the reference returns
    assert sp.size == 4
    assert bool(sp)  # truthiness must not overflow for large dims


def test_get_binary_selection():
    # _internal.c:242-273: get(n) = origin ^ basis[i] for set bits of binary n
    o, b = 9, [2, 4, 8]
    sp = mk_space(o, b)
    for n in range(8):
        want = o
        for i in range(3):
            if (n >> i) & 1:
                want ^= b[i]
        assert sp.get(n) == want


def test_iteration_gray_order():
    # _internal.c:101-122: point(k) = origin ^ combo(gray(k))
    o, b = 16, [1, 2, 4]
    sp = mk_space(o, b)
    got = list(sp)
    want = []
    for k in range(8):
        g = k ^ (k >> 1)
        v = o
        for i in range(3):
            if (g >> i) & 1:
                v ^= b[i]
        want.append(v)
    assert got == want
    # gray order: consecutive points differ by exactly one basis vector
    for x, y in zip(got, got[1:]):
        assert (x ^ y) in b


def test_iteration_dim_zero():
    sp = mk_space(42, [])
    assert list(sp) == [42]
    assert sp.get(0) == 42


def test_iteration_crosses_chunks():
    rng = np.random.default_rng(3)
    b = [int(rng.integers(1, 2**60)) for _ in range(13)]
    sp = mk_space(7, b)
    got = list(sp.iter_ints(chunk=100))  # 8192 points, non-pow2 chunk
    assert len(got) == 1 << 13
    assert len(set(got)) == 1 << 13  # all distinct (basis is indep w.h.p.)
    assert got[0] == 7
    # spot-check a few positions against the gray formula
    for k in [1, 99, 100, 101, 4095, 8191]:
        g = k ^ (k >> 1)
        v = 7
        for i in range(13):
            if (g >> i) & 1:
                v ^= b[i]
        assert got[k] == v


def test_pickle():
    import pickle

    sp = mk_space(3, [1, 6])
    sp2 = pickle.loads(pickle.dumps(sp))
    assert list(sp2) == list(sp)


def test_enumerate_packed_native_matches_numpy():
    """The native enumeration accelerator must match the numpy formulation
    exactly (same order, same packing)."""
    import numpy as np

    from gf2bv_tpu import _native
    from gf2bv_tpu.core.affine import combine_batch, _int_bits_lsb

    if not _native.available():
        import pytest

        pytest.skip("no native engine")
    rng = np.random.default_rng(3)
    sp = mk_space(
        int(rng.integers(0, 1 << 60)),
        [int(rng.integers(1, 1 << 60)) for _ in range(7)],
    )
    for start, count, gray in [(0, 64, True), (37, 100, True), (5, 50, False)]:
        got = sp.enumerate_packed(start, count, gray)
        idx = np.arange(start, start + count, dtype=np.uint64)
        if gray:
            idx = idx ^ (idx >> np.uint64(1))
        sel = _int_bits_lsb(idx, sp.dimension)
        want = combine_batch(sp._origin, sp._basis, sel)
        assert np.array_equal(got, want)
