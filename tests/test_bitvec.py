"""BitVec op semantics, differentially tested against a big-int model.

The big-int model below IS the reference representation (one mask per bit,
``/root/reference/gf2bv/__init__.py:21-134``), so agreement here is agreement
with the reference's symbolic algebra.
"""

import numpy as np
import pytest

from gf2bv_tpu import BitVec, LinearSystem
from gf2bv_tpu.core import packing

NBITS = 129  # 128 vars + const


def mk(masks):
    return BitVec(packing.ints_to_rows(list(masks), NBITS), NBITS)


def masks_of(bv):
    return list(bv._bits)


def rand_masks(rng, width):
    return [int(rng.integers(0, 2**63)) | (int(rng.integers(0, 2**63)) << 63) for _ in range(width)]


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def test_xor_bitvec(rng):
    a, b = rand_masks(rng, 16), rand_masks(rng, 16)
    out = masks_of(mk(a) ^ mk(b))
    assert out == [x ^ y for x, y in zip(a, b)]


def test_xor_int_const(rng):
    a = rand_masks(rng, 16)
    c = 0b1010111100001111
    out = masks_of(mk(a) ^ c)
    assert out == [x ^ ((c >> i) & 1) for i, x in enumerate(a)]


def test_xor_length_mismatch():
    with pytest.raises(ValueError):
        mk([1, 2]) ^ mk([1])


def test_shifts(rng):
    a = rand_masks(rng, 8)
    assert masks_of(mk(a) >> 3) == a[3:] + [0] * 3
    assert masks_of(mk(a) << 3) == [0] * 3 + a[:-3]
    assert masks_of(mk(a) >> 0) == a
    assert masks_of(mk(a).lshift_ext(2)) == [0, 0] + a


def test_and_or_mask(rng):
    a = rand_masks(rng, 8)
    m = 0b10110101
    assert masks_of(mk(a) & m) == [x if (m >> i) & 1 else 0 for i, x in enumerate(a)]
    assert masks_of(mk(a) & 0xFF) == a
    assert masks_of(mk(a) | 0) == a
    assert masks_of(mk(a) | 0xFF) == [1] * 8
    got = masks_of(mk(a) | m)
    assert got == [1 if (m >> i) & 1 else x for i, x in enumerate(a)]


def test_or_bitvec_const_rules():
    a = mk([0, 1, 5, 0])
    b = mk([7, 0, 0, 1])
    got = masks_of(a | b)
    assert got == [7, 1, 5, 1]
    with pytest.raises(ValueError):
        mk([5]) | mk([7])


def test_mod():
    a = mk([2, 4, 8, 16])
    assert masks_of(a % 4) == [2, 4, 0, 0]
    with pytest.raises(ValueError):
        a % 3


def test_rot_sum_ext(rng):
    a = rand_masks(rng, 8)
    assert masks_of(mk(a).rotr(3)) == a[3:] + a[:3]
    assert masks_of(mk(a).rotl(3)) == a[-3:] + a[:-3]
    acc = 0
    for x in a:
        acc ^= x
    assert masks_of(mk(a).sum()) == [acc]
    assert masks_of(mk(a).zeroext(2)) == a + [0, 0]
    assert masks_of(mk(a).signext(2)) == a + [a[-1]] * 2
    assert masks_of(mk(a).broadcast(2, 3)) == [a[2]] * 3
    assert masks_of(mk(a).dup(2)) == a * 2
    assert masks_of(mk(a).concat(mk(a))) == a * 2


def test_getitem(rng):
    a = rand_masks(rng, 8)
    assert masks_of(mk(a)[2]) == [a[2]]
    assert masks_of(mk(a)[2:5]) == a[2:5]
    assert masks_of(mk(a)[-1]) == [a[-1]]


def test_evaluate_matches_reference_formula(rng):
    # reference __init__.py:128-134
    a = rand_masks(rng, 8)
    s = int(rng.integers(0, 2**63)) | (int(rng.integers(0, 2**63)) << 63)
    s &= (1 << (NBITS - 1)) - 1
    r1 = (s << 1) | 1
    expect = int(
        "".join(str((b & r1).bit_count() & 1) for b in reversed(a)), 2
    )
    assert mk(a).evaluate(s) == expect


def test_tuple_constructor_compat():
    bv = BitVec((1, 2, 4), nbits=NBITS)
    assert masks_of(bv) == [1, 2, 4]


def test_pickle_roundtrip(rng):
    import pickle

    a = rand_masks(rng, 8)
    bv = mk(a)
    bv2 = pickle.loads(pickle.dumps(bv))
    assert masks_of(bv2) == a


def test_gens_layout():
    lin = LinearSystem([3, 2])
    x, y = lin.gens()
    assert masks_of(x) == [2, 4, 8]
    assert masks_of(y) == [16, 32]
