"""Device-side quadratic row construction (ops/quad_device.py) and the
pre-packed solve entries (solve_raw_packed / solve_all_packed).

Differential against the host mul_bits path, which is itself diff-tested
against the reference's coefficient formula (test_quadratic.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gf2bv_tpu import LinearSystem, QuadraticSystem
from gf2bv_tpu.core import packing
from gf2bv_tpu.core.bitvec import BitVec
from gf2bv_tpu.ops import quad_device


def _random_narrow(rng, rows, n):
    """Random narrow (linear-columns-only) bitvec rows over 1+n bits."""
    nw = packing.nwords64(1 + n)
    raw = rng.integers(0, 1 << 63, size=(rows, nw), dtype=np.uint64)
    bits = packing.unpack_rows(raw, 1 + n)
    return BitVec(packing.pack_bits(bits, 1 + n), 1 + n)


@pytest.mark.parametrize("n,rows", [(24, 40), (31, 17)])
def test_quad_rows_matches_mul_bits(n, rows):
    rng = np.random.default_rng(5)
    qsys = QuadraticSystem([n])
    a, b, c = (_random_narrow(rng, rows, n) for _ in range(3))
    const = int(rng.integers(0, 1 << 16)) & ((1 << rows) - 1)

    want = (
        qsys.mul_bits(a, b)
        ^ qsys.mul_bits(b, c)
        ^ qsys.lift(a)
        ^ qsys.lift(c)
        ^ const
    )
    got = quad_device.quad_rows(
        qsys, pairs=[(a, b), (b, c)], linear=[a, c], const=const
    )
    got64 = packing.from_u32(np.asarray(got))
    w = want.rows
    assert np.array_equal(got64[:, : w.shape[1]], w)
    assert not got64[:, w.shape[1] :].any()


def test_solve_packed_device_equals_zeros_path():
    rng = np.random.default_rng(9)
    n, rows = 16, 200
    qsys = QuadraticSystem([n])
    a, b, c = (_random_narrow(rng, rows, n) for _ in range(3))
    zeros_bv = qsys.mul_bits(a, b) ^ qsys.lift(c) ^ ((1 << rows) - 1)
    eqs_dev = quad_device.quad_rows(
        qsys, pairs=[(a, b)], linear=[c], const=(1 << rows) - 1
    )

    want_space = qsys.solve_raw_space([zeros_bv])
    got_space = qsys.solve_raw_packed(jnp.asarray(eqs_dev), 1)
    if want_space is None:
        assert got_space is None
        return
    assert got_space.dimension == want_space.dimension
    assert got_space.origin == want_space.origin
    assert got_space.basis == want_space.basis


def test_solve_packed_accepts_host_matrices():
    lin = LinearSystem([12])
    (v,) = lin.gens()
    zeros = [v ^ 0xABC]
    eqs = lin.get_eqs_packed(zeros)
    want = lin.solve_raw_one(zeros)
    assert lin.solve_raw_packed(eqs, 0) == want  # u64 host rows
    assert lin.solve_raw_packed(packing.to_u32(eqs), 0) == want  # u32 view
    assert lin.solve_raw_packed(jnp.asarray(packing.to_u32(eqs)), 0) == want

    sols = list(lin.solve_all_packed(eqs))
    assert sols == [lin.convert_sol(want)]
    assert lin.solve_one_packed(eqs) == lin.convert_sol(want)
