"""LinearSystem API semantics on small systems (oracle + jax backends)."""

import pickle

import numpy as np
import pytest

from gf2bv_tpu import BitVec, DimensionTooLargeError, LinearSystem


def test_gens_and_get_eqs_compat():
    lin = LinearSystem([4, 4])
    x, y = lin.gens()
    zeros = [x ^ y, x ^ 0b1010]
    eqs = lin.get_eqs(zeros)
    # var i of x at packed bit 1+i, of y at 5+i; const at bit 0
    assert eqs[:4] == [(1 << (1 + i)) ^ (1 << (5 + i)) for i in range(4)]
    assert eqs[4:] == [
        (1 << 1),
        (1 << 2) | 1,
        (1 << 3),
        (1 << 4) | 1,
    ]


def test_get_eqs_drops_zero_rows_and_accepts_ints():
    lin = LinearSystem([4])
    (x,) = lin.gens()
    zero_bv = x ^ x
    eqs = lin.get_eqs([zero_bv, 0, 6, x[0]])
    assert eqs == [6, 2]


@pytest.mark.parametrize("backend", ["oracle", "jax"])
def test_solve_one_unique(backend):
    lin = LinearSystem([8], backend=backend)
    (x,) = lin.gens()
    secret = 0b10110011
    # 8 independent equations: bit i = secret bit i
    zeros = [x ^ secret]
    (sol,) = lin.solve_one(zeros)
    assert sol == secret


@pytest.mark.parametrize("backend", ["oracle", "jax"])
def test_solve_all_space(backend):
    lin = LinearSystem([4], backend=backend)
    (x,) = lin.gens()
    # only constrain low 2 bits -> 4 solutions
    zeros = [(x & 0b11) ^ 0b01]
    sols = sorted(s for (s,) in lin.solve_all(zeros))
    assert sols == [0b0001, 0b0101, 0b1001, 0b1101]


def test_solve_all_dimension_guard():
    lin = LinearSystem([20], backend="oracle")
    (x,) = lin.gens()
    zeros = [x[0] ^ 1]
    with pytest.raises(DimensionTooLargeError) as ei:
        list(lin.solve_all(zeros, max_dimension=16))
    assert ei.value.space.dimension == 19
    # the space is still attached and enumerable/guessable (nlfsr_ex.py:69-93)
    assert ei.value.space.get(0) & 1 == 1


def test_unsat_literal_one_early_out():
    lin = LinearSystem([4])
    (x,) = lin.gens()
    one = x[0] ^ x[0] ^ 1  # literal constant 1
    assert lin.solve_one([one]) is None
    assert lin.solve_raw_space([one]) is None


@pytest.mark.parametrize("backend", ["oracle", "jax"])
def test_unsat_contradiction(backend):
    lin = LinearSystem([4], backend=backend)
    (x,) = lin.gens()
    assert lin.solve_one([x[0] ^ 1, x[0]]) is None


def test_convert_sol_blocks():
    lin = LinearSystem([3, 5])
    assert lin.convert_sol(0b10101_011) == (0b011, 0b10101)
    with pytest.raises(AssertionError):
        lin.convert_sol(1 << 9)


@pytest.mark.parametrize("backend", ["oracle", "jax"])
def test_evaluate_roundtrip(backend):
    lin = LinearSystem([16, 16], backend=backend)
    x, y = lin.gens()
    sx, sy = 0xBEEF, 0x1234
    zeros = [x ^ sx, y ^ sy]
    sol = lin.solve_one(zeros)
    assert sol == (sx, sy)
    for z in zeros:
        assert lin.evaluate(z, sol) == 0
    assert lin.evaluate(x ^ y, sol) == sx ^ sy


def test_pickle_system():
    lin = LinearSystem([8, 8])
    lin2 = pickle.loads(pickle.dumps(lin))
    assert lin2._sizes == [8, 8]
    (a, b) = lin2.gens()
    assert len(a) == 8


def test_get_mat_numpy():
    lin = LinearSystem([4])
    (x,) = lin.gens()
    a, b = lin.get_mat_numpy([x ^ 0b0101])
    assert a.shape == (4, 4)
    assert np.array_equal(a, np.eye(4, dtype=np.uint8))
    assert list(b) == [1, 0, 1, 0]


def test_get_mat_scipy():
    lin = LinearSystem([6])
    (x,) = lin.gens()
    zeros = [(x & 0b101) ^ 0b100, x[1] ^ 1]
    a, b = lin.get_mat_scipy(zeros)
    ad, bd = lin.get_mat_numpy(zeros)
    import scipy.sparse as sp

    assert sp.issparse(a)
    assert np.array_equal(a.toarray(), ad)
    assert np.array_equal(b, bd)
    # Ax = b for the actual solution
    (sol,) = lin.solve_one(zeros)
    xv = np.array([(sol >> i) & 1 for i in range(6)], np.uint8)
    assert np.array_equal((a @ xv) % 2, b)


def test_m4ri_solve_compat_shim():
    """Top-level m4ri_solve accepts big-int equation masks like the
    reference's native entry (_internal.pyi:18-23)."""
    import gf2bv_tpu

    # x0 ^ x1 = 1, x1 = 1  ->  x = 0b10 ... wait bits: const=bit0
    # eq1: bits x1(bit1) ^ x2(bit2) ^ const(1) -> mask 0b111? Use LinearSystem to build
    lin = gf2bv_tpu.LinearSystem([4])
    (x,) = lin.gens()
    secret = 0b1011
    zeros = [x ^ secret]
    eqs = lin.get_eqs(zeros)
    sol = gf2bv_tpu.m4ri_solve(eqs, 4, 0)
    assert sol == secret
    space = gf2bv_tpu.m4ri_solve(eqs, 4, 1)
    assert space.dimension == 0 and space.origin == secret
    assert isinstance(space.basis, list)
    # unsat
    assert gf2bv_tpu.m4ri_solve([0b10 | 1, 0b10], 1, 0) is None
