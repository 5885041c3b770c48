"""GF(2^m) extension-field arithmetic: field axioms on concrete ints,
symbolic-vs-concrete differentials via evaluate(), GHASH spec-order
semantics, and linear solve round-trips (GHASH preimage)."""

import random

import pytest

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.core.bitvec import BitVec
from gf2bv_tpu.crypto.gf2m import GCM_MODULUS, GF2m, GHASH

F8 = GF2m(8, 0x11B)  # the AES byte field
F128 = GF2m(128, GCM_MODULUS)


def test_modulus_validation():
    with pytest.raises(ValueError):
        GF2m(8, 0x1B)  # degree < m
    with pytest.raises(ValueError):
        GF2m(8, 0x11A)  # even constant term


def test_field_axioms_concrete():
    rnd = random.Random(20)
    for field in (F8, F128):
        mask = (1 << field.m) - 1
        for _ in range(20):
            a, b, c = (rnd.getrandbits(field.m) for _ in range(3))
            assert field.mul(a, b) == field.mul(b, a)
            assert field.mul(a, field.mul(b, c)) == field.mul(
                field.mul(a, b), c
            )
            assert field.mul(a, b ^ c) == field.mul(a, b) ^ field.mul(a, c)
            assert field.mul(a, 1) == a & mask
            assert field.mul(a, 2) == field.xtime(a)
            assert field.square(a) == field.mul(a, a)


def test_aes_field_known_values():
    # xtime table facts from the AES spec: 0x57 * 0x13 = 0xFE in GF(2^8)
    assert F8.mul(0x57, 0x83) == 0xC1
    assert F8.mul(0x57, 0x13) == 0xFE


def test_inverse_and_frobenius_order():
    rnd = random.Random(21)
    for field in (F8, F128):
        for _ in range(5):
            a = rnd.getrandbits(field.m) or 1
            assert field.mul(a, field.inv(a)) == 1
            # a^(2^m) == a: m repeated squarings come back around
            x = a
            for _ in range(field.m):
                x = field.square(x)
            assert x == a
    with pytest.raises(ZeroDivisionError):
        F8.inv(0)


def _sym_matches_concrete(field, op, rnd, trials=5):
    lin = LinearSystem([field.m])
    (x,) = lin.gens()
    sym = op(x)
    assert isinstance(sym, BitVec) and len(sym) == field.m
    for _ in range(trials):
        v = rnd.getrandbits(field.m)
        got = lin.evaluate(sym, [v])
        assert got == op(v)


def test_symbolic_ops_match_concrete():
    rnd = random.Random(22)
    for field in (F8, F128):
        c = rnd.getrandbits(field.m) | 1
        _sym_matches_concrete(field, field.xtime, rnd)
        _sym_matches_concrete(field, lambda a: field.mul(a, c), rnd)
        _sym_matches_concrete(field, lambda a: field.mul(c, a), rnd)
        _sym_matches_concrete(field, field.square, rnd)


def test_symbolic_times_symbolic_rejected():
    lin = LinearSystem([8, 8])
    a, b = lin.gens()
    with pytest.raises(TypeError):
        F8.mul(a, b)


def test_mul_const_solve_roundtrip():
    # recover a from a*c = y — the solver inverts the linear map
    rnd = random.Random(23)
    for field in (F8, F128):
        secret = rnd.getrandbits(field.m)
        c = rnd.getrandbits(field.m) | 1
        y = field.mul(secret, c)
        lin = LinearSystem([field.m])
        (x,) = lin.gens()
        (rec,) = lin.solve_one([field.mul(x, c) ^ y])
        assert rec == secret


# ---------------------------------------------------------------- GHASH


def test_ghash_mulx_spec_order():
    # spec bit order: x^0 is the MSB; multiplying the one-element by x
    # right-shifts, and the wraparound injects R = 0xE1 << 120
    one = 1 << 127
    assert GHASH._mulx(one) == 1 << 126
    assert GHASH._mulx(1) == 0xE1 << 120


def test_ghash_matches_gf2m_via_bit_reflection():
    # GHASH's field is GF(2^128) with reflected bit order: reflecting
    # operands, multiplying with mulX-chains, and reflecting back must
    # agree with an independent spec-order product of reflected inputs.
    rnd = random.Random(24)

    def refl(v):
        return int(f"{v & ((1 << 128) - 1):0128b}"[::-1], 2)

    def ghash_mul_spec(a, b):
        # independent implementation: schoolbook over spec-order bits
        z, v = 0, a
        for i in range(128):
            if (b >> (127 - i)) & 1:
                z ^= v
            v = GHASH._mulx(v)
        return z

    for _ in range(5):
        h = rnd.getrandbits(128)
        x = rnd.getrandbits(128)
        g = GHASH(h)
        assert g.mul_h(x) == ghash_mul_spec(h, x)
        # the reflected-operand product maps to the natural-basis field:
        # refl(a GHASH* b) == refl(a) * refl(b) in F128 (the GHASH order
        # is exactly bit-reflected arithmetic mod the same polynomial)
        lhs = refl(g.mul_h(x))
        rhs = F128.mul(refl(h), refl(x))
        assert lhs == rhs


def test_ghash_symbolic_differential():
    rnd = random.Random(25)
    h = rnd.getrandbits(128)
    g = GHASH(h)
    lin = LinearSystem([128, 128])
    b1, b2 = lin.gens()
    sym = g.process([b1, 0xDEADBEEF, b2])
    v1, v2 = rnd.getrandbits(128), rnd.getrandbits(128)
    assert lin.evaluate(sym, [v1, v2]) == g.process([v1, 0xDEADBEEF, v2])


def test_ghash_preimage_solve():
    # choose block2 so the 3-block GHASH hits a target tag
    rnd = random.Random(26)
    h = rnd.getrandbits(128)
    g = GHASH(h)
    target = rnd.getrandbits(128)
    b0, b2 = rnd.getrandbits(128), rnd.getrandbits(128)

    lin = LinearSystem([128])
    (x,) = lin.gens()
    (rec,) = lin.solve_one([g.process([b0, x, b2]) ^ target])
    assert g.process([b0, rec, b2]) == target


def test_ghash_tag_and_blocks_helpers():
    g = GHASH(0x123456789ABCDEF)
    blocks = GHASH.bytes_to_blocks(b"A" * 17)
    assert len(blocks) == 2
    assert blocks[0] == int.from_bytes(b"A" * 16, "big")
    assert blocks[1] == int.from_bytes(b"A" + b"\x00" * 15, "big")
    assert GHASH.length_block(128, 256) == (128 << 64) | 256
    # tag is GHASH ⊕ ej0 and round-trips the mask
    t0 = g.tag(b"aad", b"ct" * 10, ej0=0)
    t1 = g.tag(b"aad", b"ct" * 10, ej0=0xFFFF)
    assert t0 ^ t1 == 0xFFFF
