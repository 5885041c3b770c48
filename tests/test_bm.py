"""Berlekamp–Massey: linear complexity, tap recovery (both register forms),
solver composition."""

import random

import pytest

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.bm import (
    berlekamp_massey,
    fibonacci_taps,
    galois_lfsr_from_stream,
    galois_taps,
    lfsr_from_stream,
    linear_complexity_profile,
)
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR, GaloisLFSR

# x^64 + x^63 + x^61 + x^60 + 1 (primitive): recurrence o[t] = o[t-1]^o[t-3]^o[t-4]^o[t-64]
P64_MASK = (1 << 63) | (1 << 61) | (1 << 60) | 1


def stream_of(reg, n):
    return [reg() for _ in range(n)]


def test_zero_and_empty_stream():
    assert berlekamp_massey([]) == (0, 1)
    assert berlekamp_massey([0] * 17) == (0, 1)
    with pytest.raises(ValueError):
        lfsr_from_stream([0] * 8)


def test_known_linear_complexity():
    # classic: 0^(n-1) 1 has linear complexity n
    assert berlekamp_massey([0, 0, 0, 1])[0] == 4
    # constant ones: o[t] = o[t-1], L = 1, C = 1 + x
    assert berlekamp_massey([1] * 10) == (1, 0b11)
    # alternating: o[t] = o[t-1] ^ ... actually o[t] = o[t-2] has L=2, but
    # minimal is o[t] = o[t-1] ^ 1? BM over GF(2) has no affine term: [1,0]*k
    L, C = berlekamp_massey([1, 0] * 8)
    assert L == 2
    fib = lfsr_from_stream([1, 0] * 8)
    assert stream_of(fib, 20) == [1, 0] * 10


def test_primitive_taps_recovered_exactly():
    secret = random.Random(1).getrandbits(64) | 1
    reg = FibonacciLFSR(64, P64_MASK, secret)
    bits = stream_of(reg, 160)  # >= 2 * 64
    L, mask = fibonacci_taps(bits)
    assert (L, mask) == (64, P64_MASK)
    rec = lfsr_from_stream(bits)
    assert rec.state == secret
    assert stream_of(rec, 400) == stream_of(FibonacciLFSR(64, P64_MASK, secret), 400)


@pytest.mark.parametrize("trial", range(8))
def test_fuzz_reproduces_any_lfsr_stream(trial):
    rng = random.Random(0xB31 + trial)
    n = rng.randrange(4, 48)
    mask = rng.getrandbits(n) | 1  # ensure the register actually has memory n
    state = rng.getrandbits(n) or 1
    bits = stream_of(FibonacciLFSR(n, mask, state), 3 * n)
    L, _ = berlekamp_massey(bits)
    assert L <= n
    rec = lfsr_from_stream(bits)
    assert stream_of(rec, len(bits)) == bits


def test_galois_stream_also_linear():
    rng = random.Random(7)
    n = 32
    mask = rng.getrandbits(n) | (1 << (n - 1)) | 1
    bits = stream_of(GaloisLFSR(n, mask, rng.getrandbits(n) or 1), 3 * n)
    rec = lfsr_from_stream(bits)
    assert stream_of(rec, len(bits)) == bits


def test_short_prefix_still_consistent():
    # fewer than 2L bits: recovered register must still replay what it saw
    bits = [1, 1, 0, 1, 0, 0, 1]
    rec = lfsr_from_stream(bits)
    assert stream_of(rec, len(bits)) == bits


def test_linear_complexity_profile():
    rng = random.Random(42)
    bits = [rng.getrandbits(1) for _ in range(200)]
    prof = linear_complexity_profile(bits)
    # each prefix value matches an independent BM run
    for k in (0, 1, 7, 63, 199):
        assert prof[k] == berlekamp_massey(bits[: k + 1])[0]
    # profile is non-decreasing and a random stream tracks k/2
    assert all(a <= b for a, b in zip(prof, prof[1:]))
    assert abs(prof[-1] - 100) <= 8
    # an LFSR stream's profile saturates at the register width
    lfsr_bits = stream_of(FibonacciLFSR(64, P64_MASK, 0xDEADBEEF), 300)
    assert linear_complexity_profile(lfsr_bits)[-1] == 64


def test_galois_taps_roundtrip_exact():
    # a full-complexity Galois stream gives back the exact mask and state
    rng = random.Random(0xA11)
    n = 48
    g = rng.getrandbits(n) | (1 << (n - 1)) | 1  # top tap set -> degree exactly n
    st = rng.getrandbits(n) or 1
    bits = stream_of(GaloisLFSR(n, g, st), 3 * n)
    L, mask = galois_taps(bits)
    assert (L, mask) == (n, g)
    rec = galois_lfsr_from_stream(bits)
    assert rec.state == st
    assert stream_of(rec, 4 * n) == stream_of(GaloisLFSR(n, g, st), 4 * n)


@pytest.mark.parametrize("trial", range(8))
def test_galois_reconstruction_fuzz(trial):
    # either register form's stream replays through the recovered Galois form
    rng = random.Random(0x6A1 + trial)
    n = rng.randrange(4, 40)
    form = FibonacciLFSR if trial % 2 else GaloisLFSR
    bits = stream_of(form(n, rng.getrandbits(n) | 1, rng.getrandbits(n) or 1), 4 * n)
    if not any(bits):
        return
    rec = galois_lfsr_from_stream(bits)
    assert rec.n <= n
    assert stream_of(rec, len(bits)) == bits


def test_bm_then_sparse_solve():
    """The composed workflow: BM on one full leak -> symbolic solve of a
    sparse leak from a fresh session with the recovered taps."""
    rng = random.Random(0x5EED)
    full_leak = stream_of(FibonacciLFSR(64, P64_MASK, rng.getrandbits(64) | 1), 160)
    L, mask = fibonacci_taps(full_leak)
    assert (L, mask) == (64, P64_MASK)

    secret2 = rng.getrandbits(64) | 1
    session = FibonacciLFSR(64, mask, secret2)
    observed = [(i, b) for i, b in enumerate(stream_of(session, 3 * 64)) if i % 3 == 0]

    lin = LinearSystem([64])
    (s0,) = lin.gens()
    sym = FibonacciLFSR(64, mask, s0)
    sym_bits = stream_of(sym, 3 * 64)
    zeros = [sym_bits[i] ^ b for i, b in observed]
    sol = lin.solve_one(zeros)
    assert sol is not None and sol[0] == secret2
