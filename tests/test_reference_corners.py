"""Small reference-semantics corners not covered elsewhere
(``/root/reference/gf2bv`` behaviors the acceptance examples don't hit)."""

import pytest

from gf2bv_tpu import BitVec, LinearSystem, m4ri_solve
from gf2bv_tpu.crypto.mt import MT19937, MersenneTwister


def test_getrandbits_corners():
    rng = MT19937(list(range(624)))
    assert rng.getrandbits(0) == 0
    with pytest.raises(ValueError):
        rng.getrandbits(-1)
    # default k = word size
    rng2 = MT19937(list(range(624)))
    rng3 = MT19937(list(range(624)))
    assert rng2.getrandbits() == rng3.getrandbits(32)


def test_mt_parameter_validation():
    with pytest.raises(ValueError):
        MersenneTwister([0] * 3, 16, 24, 13, 7, 0x9908, 7, 0xFFFF, 5, 0x9D2C, 4, 0xEFC6, 9)
    with pytest.raises(ValueError):  # mask wider than w
        MersenneTwister([0] * 24, 16, 24, 13, 7, 0x19908, 7, 0xFFFF, 5, 0x9D2C, 4, 0xEFC6, 9)
    with pytest.raises(ValueError):  # zero shift
        MersenneTwister([0] * 24, 16, 24, 13, 7, 0x9908, 0, 0xFFFF, 5, 0x9D2C, 4, 0xEFC6, 9)


def test_modulo_non_power_of_two_raises():
    lin = LinearSystem([8])
    (v,) = lin.gens()
    with pytest.raises(ValueError):
        v % 3
    assert len(v % 4) == 8  # power of two -> mask


def test_m4ri_solve_shim_modes():
    # x0 = 1, x1 = 0 over 2 cols: eqs as big-int masks (bit0 = const)
    eqs = [0b010 ^ 1, 0b100]
    assert m4ri_solve(eqs, 2, 0) == 1
    space = m4ri_solve(eqs, 2, 1)
    assert space.dimension == 0 and space.origin == 1
    # unsat: x0 = 0 and x0 = 1
    assert m4ri_solve([0b010, 0b010 ^ 1], 2, 0) is None


def test_empty_zeros_full_space():
    lin = LinearSystem([4])
    space = lin.solve_raw_space([])
    assert space.dimension == 4
    assert sorted(space.get(i) for i in range(16)) == list(range(16))


def test_evaluate_matches_reference_parity_rule():
    lin = LinearSystem([8])
    (v,) = lin.gens(lazy=False)
    w = (v ^ 0b1010) & 0x7F
    for s in (0, 0xFF, 0b1100101):
        assert w.evaluate(s) == ((s ^ 0b1010) & 0x7F)


def test_index_errors():
    lin = LinearSystem([8])
    for lazy in (True, False):
        (v,) = lin.gens(lazy=lazy)
        with pytest.raises(IndexError):
            v[8]
        with pytest.raises(IndexError):
            v[-9]
        assert isinstance(v[-1], BitVec) and len(v[-1]) == 1
