"""New-capability crypto models (xorshift family, CRC): concrete behavior
vs independent oracles, and symbolic state/input recovery round-trips."""

import binascii
import random

import numpy as np
import pytest

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.crc import CRC32, ReflectedCRC
from gf2bv_tpu.crypto.xorshift import (
    Xorshift32,
    Xorshift64,
    Xorshift128,
    Xorshift64star,
)


def test_xorshift32_recovery():
    rnd = random.Random(1)
    seed = rnd.getrandbits(32) | 1
    ref = Xorshift32(seed)
    outs = [ref() for _ in range(3)]

    lin = LinearSystem([32])
    (x,) = lin.gens()
    sym = Xorshift32(x)
    zeros = [sym() ^ o for o in outs]
    (rec,) = lin.solve_one(zeros)
    assert rec == seed


def test_xorshift64_recovery():
    rnd = random.Random(2)
    seed = rnd.getrandbits(64) | 1
    ref = Xorshift64(seed)
    outs = [ref() for _ in range(2)]

    lin = LinearSystem([64])
    (x,) = lin.gens()
    sym = Xorshift64(x)
    zeros = [sym() ^ o for o in outs]
    (rec,) = lin.solve_one(zeros)
    assert rec == seed


def test_xorshift128_recovery_from_partial_outputs():
    rnd = random.Random(3)
    seed = [rnd.getrandbits(32) for _ in range(4)]
    ref = Xorshift128(list(seed))
    # only the high 16 bits of each output -> needs more samples
    outs = [ref() >> 16 for _ in range(12)]

    lin = LinearSystem([32] * 4)
    sym = Xorshift128(list(lin.gens()))
    zeros = [(sym() >> 16) ^ o for o in outs]
    rec = lin.solve_one(zeros)
    assert rec is not None
    rep = Xorshift128(list(rec))
    assert all(rep() >> 16 == o for o in outs)
    assert list(rec) == seed


def test_xorshift64star_untemper_roundtrip_and_recovery():
    rnd = random.Random(4)
    seed = rnd.getrandbits(64) | 1
    ref = Xorshift64star(seed)
    outs = [ref() for _ in range(2)]
    assert all(
        Xorshift64star.temper(Xorshift64star.untemper(o)) == o for o in outs
    )

    lin = LinearSystem([64])
    (x,) = lin.gens()
    sym = Xorshift64star(x)
    zeros = [sym.step() ^ Xorshift64star.untemper(o) for o in outs]
    (rec,) = lin.solve_one(zeros)
    assert rec == seed


@pytest.mark.parametrize("data", [b"", b"123456789", b"hello gf2bv", b"\x00" * 7])
def test_crc32_concrete_matches_zlib(data):
    crc = CRC32()
    got = crc.process(int.from_bytes(data, "little"), 8 * len(data))
    assert got == binascii.crc32(data)


def test_crc32_symbolic_is_affine_and_recovers_input():
    """Find the 4 unknown bytes x such that crc32(prefix + x) == target."""
    prefix = b"gf2bv_tpu:"
    secret = b"\xde\xad\xbe\xef"
    target = binascii.crc32(prefix + secret)

    lin = LinearSystem([32])
    (x,) = lin.gens()
    # full message bits: prefix (known) followed by the 4 unknown bytes
    pref_int = int.from_bytes(prefix, "little")
    msg = x.lshift_ext(8 * len(prefix)) ^ pref_int
    sym = CRC32().process(msg)
    rec = lin.solve_one([sym ^ target])
    assert rec is not None
    assert rec[0].to_bytes(4, "little") == secret


def test_crc16_modbus_concrete():
    # CRC-16/MODBUS: poly 0x8005 reflected = 0xA001, init 0xFFFF, xorout 0
    crc = ReflectedCRC(16, 0xA001, 0xFFFF, 0x0000)
    got = crc.process(int.from_bytes(b"123456789", "little"), 72)
    assert got == 0x4B37  # published check value


def test_crc_factories_check_values():
    """Every packaged CRC variant against its published '123456789' check."""
    from gf2bv_tpu.crypto.crc import CRC16_CCITT_KERMIT, CRC16_MODBUS, CRC32C, CRC64_XZ

    data = int.from_bytes(b"123456789", "little")
    for factory, expect in [
        (CRC32, 0xCBF43926),
        (CRC32C, 0xE3069283),
        (CRC16_MODBUS, 0x4B37),
        (CRC16_CCITT_KERMIT, 0x2189),
        (CRC64_XZ, 0x995DC9BBDF1939FA),
    ]:
        assert factory().process(data, 72) == expect, factory.__name__


def test_crc64_symbolic_preimage():
    """64 unknown bits pinned by one CRC-64/XZ observation: exact preimage."""
    from gf2bv_tpu.crypto.crc import CRC64_XZ

    secret = b"\x13\x37\xc0\xde\xfa\xce\xb0\x0c"
    target = CRC64_XZ().process(int.from_bytes(secret, "little"), 64)
    lin = LinearSystem([64])
    (x,) = lin.gens()
    rec = lin.solve_one([CRC64_XZ().process(x) ^ target])
    assert rec is not None and rec[0].to_bytes(8, "little") == secret


def test_well512_recovery():
    from gf2bv_tpu.crypto.well import Well512

    rnd = random.Random(7)
    seed = [rnd.getrandbits(32) for _ in range(16)]
    ref = Well512(list(seed))
    outs = [ref() for _ in range(20)]

    lin = LinearSystem([32] * 16)
    sym = Well512(list(lin.gens()))
    zeros = [sym() ^ o for o in outs]
    rec = lin.solve_one(zeros)
    assert rec is not None and list(rec) == seed
    # replay
    rep = Well512(list(rec))
    assert all(rep() == o for o in outs)


def test_well512_truncated_outputs():
    from gf2bv_tpu.crypto.well import Well512

    rnd = random.Random(8)
    seed = [rnd.getrandbits(32) for _ in range(16)]
    ref = Well512(list(seed))
    outs = [ref() >> 24 for _ in range(80)]  # only top byte leaks

    lin = LinearSystem([32] * 16)
    sym = Well512(list(lin.gens()))
    zeros = [(sym() >> 24) ^ o for o in outs]
    rec = lin.solve_one(zeros)
    assert rec is not None
    rep = Well512(list(rec))
    assert all(rep() >> 24 == o for o in outs)


def test_xorshift128plus_step_matches_plus_output_state():
    # __call__ (concrete "+" output) advances exactly one step()
    rnd = random.Random(9)
    s0, s1 = rnd.getrandbits(64), rnd.getrandbits(64)
    from gf2bv_tpu.crypto.xorshift import Xorshift128Plus

    a = Xorshift128Plus(s0, s1)
    b = Xorshift128Plus(s0, s1)
    out = a()
    b.step()
    assert (a.s0, a.s1) == (b.s0, b.s1)
    assert out == (a.s0 + a.s1) & ((1 << 64) - 1)


def test_xorshift128plus_symbolic_plus_output_rejected():
    from gf2bv_tpu.crypto.xorshift import Xorshift128Plus

    lin = LinearSystem([64, 64])
    sym = Xorshift128Plus(*lin.gens())
    with pytest.raises(TypeError):
        sym()


def test_xorshift128plus_recovery_from_step_outputs():
    rnd = random.Random(10)
    s0, s1 = rnd.getrandbits(64), rnd.getrandbits(64)
    from gf2bv_tpu.crypto.xorshift import Xorshift128Plus

    ref = Xorshift128Plus(s0, s1)
    outs = [ref.step() for _ in range(3)]

    lin = LinearSystem([64, 64])
    sym = Xorshift128Plus(*lin.gens())
    zeros = [sym.step() ^ o for o in outs]
    rec = lin.solve_one(zeros)
    assert rec is not None and tuple(rec) == (s0, s1)


def test_v8_math_random_recovery_and_prediction():
    from gf2bv_tpu.crypto.xorshift import V8MathRandom, Xorshift128Plus

    rnd = random.Random(11)
    s0, s1 = rnd.getrandbits(64), rnd.getrandbits(64)
    victim = V8MathRandom(s0, s1)
    observed = [victim.random() for _ in range(5)]

    lin = LinearSystem([64, 64])
    sym = Xorshift128Plus(*lin.gens())
    sym_outs = [sym.step() for _ in range(V8MathRandom.CACHE_SIZE)]
    zeros = [
        sym_outs[V8MathRandom.CACHE_SIZE - 1 - i][12:]
        ^ V8MathRandom.mantissa(d)
        for i, d in enumerate(observed)
    ]
    rec = lin.solve_one(zeros)
    assert rec is not None and tuple(rec) == (s0, s1)

    clone = V8MathRandom(*rec)
    assert [clone.random() for _ in range(5)] == observed
    assert [clone.random() for _ in range(3)] == [
        victim.random() for _ in range(3)
    ]


def test_v8_math_random_cache_is_consumed_in_reverse():
    from gf2bv_tpu.crypto.xorshift import V8MathRandom, Xorshift128Plus

    rnd = random.Random(12)
    s0, s1 = rnd.getrandbits(64), rnd.getrandbits(64)
    v8 = V8MathRandom(s0, s1)
    eng = Xorshift128Plus(s0, s1)
    gen = [V8MathRandom.to_double(eng.step()) for _ in range(64)]
    got = [v8.random() for _ in range(64)]
    assert got == gen[::-1]
    # mantissa() round-trips to_double exactly
    assert all(
        V8MathRandom.mantissa(V8MathRandom.to_double(m << 12)) == m
        for m in (0, 1, (1 << 52) - 1, 0xDEADBEEF)
    )


def test_xoroshiro128starstar_recovery():
    from gf2bv_tpu.crypto.xoshiro import Xoroshiro128starstar

    rnd = random.Random(13)
    seed = [rnd.getrandbits(64) for _ in range(2)]
    ref = Xoroshiro128starstar(list(seed))
    outs = [ref() for _ in range(3)]
    assert all(
        Xoroshiro128starstar.temper(Xoroshiro128starstar.untemper(o)) == o
        for o in outs
    )

    lin = LinearSystem([64, 64])
    sym = Xoroshiro128starstar(list(lin.gens()))
    zeros = [sym.step() ^ Xoroshiro128starstar.untemper(o) for o in outs]
    rec = lin.solve_one(zeros)
    assert rec is not None and list(rec) == seed
    rep = Xoroshiro128starstar(list(rec))
    assert all(rep() == o for o in outs)
