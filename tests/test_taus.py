"""Combined Tausworthe generators (taus88 / LFSR113): linearity, dual-mode
agreement, state recovery with the documented don't-care dimensions."""

import random

import pytest

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.taus import (
    LFSR113,
    LFSR113_PARAMS,
    TAUS88_PARAMS,
    Taus88,
    Tausworthe,
    dont_care_dims,
)

# seed-validity thresholds = 1 << (trailing zeros of each component mask)
TAUS88_MIN = (2, 8, 16)
LFSR113_MIN = (2, 8, 16, 128)


def _valid_state(rng, mins):
    return [rng.getrandbits(32) | m for m in mins]


def _outputs(gen, n):
    return [gen() for _ in range(n)]


def test_dont_care_dims():
    assert dont_care_dims(TAUS88_PARAMS) == 8
    assert dont_care_dims(LFSR113_PARAMS) == 15


@pytest.mark.parametrize("cls,mins", [(Taus88, TAUS88_MIN), (LFSR113, LFSR113_MIN)])
def test_superposition(cls, mins):
    """outputs(a ^ b) == outputs(a) ^ outputs(b): the map is GF(2)-linear."""
    rng = random.Random(0x7A05)
    a = _valid_state(rng, mins)
    b = _valid_state(rng, mins)
    oa = _outputs(cls(a), 12)
    ob = _outputs(cls(b), 12)
    oab = _outputs(cls([x ^ y for x, y in zip(a, b)]), 12)
    assert oab == [x ^ y for x, y in zip(oa, ob)]


@pytest.mark.parametrize("cls,mins", [(Taus88, TAUS88_MIN), (LFSR113, LFSR113_MIN)])
def test_symbolic_matches_concrete(cls, mins):
    """The BitVec trace evaluated at a concrete state equals the int path."""
    rng = random.Random(0x7A06)
    state = _valid_state(rng, mins)
    n_words = len(mins)
    lin = LinearSystem([32] * n_words)
    sym = cls(list(lin.gens()))
    sym_outs = _outputs(sym, 6)
    conc_outs = _outputs(cls(state), 6)
    packed = 0
    for i, w in enumerate(state):
        packed |= w << (32 * i)
    for s_out, c_out in zip(sym_outs, conc_outs):
        for bit in range(32):
            assert lin.evaluate(s_out[bit : bit + 1], (packed,)) == (c_out >> bit) & 1


@pytest.mark.parametrize(
    "cls,mins,params",
    [(Taus88, TAUS88_MIN, TAUS88_PARAMS), (LFSR113, LFSR113_MIN, LFSR113_PARAMS)],
)
def test_state_recovery_and_prediction(cls, mins, params):
    rng = random.Random(0x7A07)
    secret = _valid_state(rng, mins)
    victim = cls(list(secret))
    observed = _outputs(victim, 6)
    future = _outputs(victim, 10)

    n_words = len(mins)
    lin = LinearSystem([32] * n_words)
    sym = cls(list(lin.gens()))
    zeros = [sym() ^ o for o in observed]
    space = lin.solve_raw_space(zeros)
    assert space is not None
    # the don't-care bits are exactly the unconstrained directions
    assert space.dimension == dont_care_dims(params)
    clone = cls(list(lin.convert_sol(space.origin)))
    assert _outputs(clone, 6) == observed
    assert _outputs(clone, 10) == future


def test_generic_tausworthe_validation():
    with pytest.raises(ValueError):
        Tausworthe(TAUS88_PARAMS, [1, 2])
