"""The reference examples re-expressed as the acceptance suite
(SURVEY.md §4: every example is a self-checking end-to-end round-trip).

Fast variants run always; the full-size MT19937 / NLFSR workloads are
``slow``-marked (bench.py runs them on real hardware).
"""

import secrets

import pytest

from gf2bv_tpu import LinearSystem, QuadraticSystem
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR, GaloisLFSR
from gf2bv_tpu.crypto.mt import MT19937, MersenneTwister
from gf2bv_tpu.crypto.xoshiro import Xoshiro256starstar

# ---------------------------------------------------------------- simple.py


def magic(x, y):
    MASK64 = (1 << 64) - 1
    z1 = ((x ^ (y >> 22) ^ (x << 13)) & MASK64) >> 3
    z2 = ((y ^ (x >> 7) ^ (y << 5)) & MASK64) >> 3
    z3 = (x ^ y) & 0b101101
    return z1, z2, z3


def _solve_and_check(lin, zeros, expected):
    for sol in lin.solve_all(zeros):
        assert magic(*sol) == expected
    sol = lin.solve_one(zeros)
    assert magic(*sol) == expected
    for z in zeros:
        assert lin.evaluate(z, sol) == 0


def test_simple_linear():
    lin = LinearSystem((64, 64))
    xs, ys = lin.gens()
    zeros = list(magic(xs, ys))
    assert all(e & 1 == 0 for e in lin.get_eqs(zeros)), "the system is not linear"
    _solve_and_check(lin, zeros, (0, 0, 0))


def test_simple_affine():
    inp = secrets.randbits(64), secrets.randbits(64)
    z1, z2, z3 = magic(*inp)
    lin = LinearSystem((64, 64))
    xs, ys = lin.gens()
    z1s, z2s, z3s = magic(xs, ys)
    _solve_and_check(lin, [z1s ^ z1, z2s ^ z2, z3s ^ z3], (z1, z2, z3))


# ------------------------------------------------------------------ lfsr.py


@pytest.mark.parametrize(
    "LFSR,mask",
    [
        (GaloisLFSR, 0x5C2B76970103D4EEFCD4A2C681CC400D),
        (FibonacciLFSR, 0x6D6AC812F52A212D5A0B9F3117801FD5),
    ],
)
def test_lfsr_recovery(LFSR, mask):
    n = 128
    init_st = secrets.randbits(n)
    lfsr = LFSR(n, mask, init_st)
    out = [lfsr() for _ in range(256)]

    lin = LinearSystem([n])
    (sym,) = lin.gens()
    lfsr2 = LFSR(n, mask, sym)
    zeros = [lfsr2() ^ o for o in out]
    sols = [sol for (sol,) in lin.solve_all(zeros)]
    assert sols == [init_st]


# --------------------------------------------------------------- xoshiro.py


def test_xoshiro256starstar_recovery():
    xos = Xoshiro256starstar.generate()
    out = [xos() for _ in range(10)]

    lin = LinearSystem([64] * 4)
    xos2 = Xoshiro256starstar(lin.gens())
    zeros = [xos2.step() ^ Xoshiro256starstar.untemper(o) for o in out]
    found = False
    for sol in lin.solve_all(zeros):
        xos3 = Xoshiro256starstar(list(sol))
        assert all(xos3() == o for o in out)
        found = True
    assert found


# ------------------------------------------------------------------- mt.py


def _mini_mt(state):
    # small-w MersenneTwister so the CPU test stays fast; same generic model
    return MersenneTwister(state, 16, 24, 13, 7, 0x9908, 7, 0xFFFF, 5, 0x9D2C, 4, 0xEFC6, 9)


def test_mini_mt_recovery():
    import random

    rand = random.Random(1337)
    secret = [rand.getrandbits(16) for _ in range(24)]
    rng = _mini_mt(list(secret))
    out = [rng() for _ in range(24 * 2)]

    lin = LinearSystem([16] * 24)
    sym = _mini_mt(list(lin.gens()))
    zeros = [sym() ^ o for o in out]
    sol = lin.solve_one(zeros)
    assert sol is not None
    rng2 = _mini_mt(list(sol))
    assert all(rng2() == o for o in out)


@pytest.mark.slow
@pytest.mark.parametrize("bs", [32, 17])
def test_mt19937_full(bs):
    import random

    rand = random.Random(3142)
    st = tuple(rand.getstate()[1][:-1])
    effective_bs = ((bs - 1) & bs) or bs
    samples = 624 * 32 // effective_bs
    out = [rand.getrandbits(bs) for _ in range(samples)]

    lin = LinearSystem([32] * 624)
    mt = lin.gens()
    rng = MT19937(list(mt))
    zeros = [rng.getrandbits(bs) ^ o for o in out] + [mt[0] ^ 0x80000000]
    sol = lin.solve_one(zeros)
    assert sol == st

    rng2 = MT19937(list(sol))
    pyrand = rng2.to_python_random()
    assert all(rng2.getrandbits(bs) == o for o in out)
    assert all(pyrand.getrandbits(bs) == o for o in out)


# ----------------------------------------------------------------- nlfsr.py


def _combiner(x0, x1, x2, x3, x4):
    return (x0 * x1) ^ (x0 * x1 * x3 * x4) ^ x0 ^ x1 ^ x2


def _mini_nlfsr(LFSR, n, mask, select, N):
    init = secrets.randbits(n) | 1

    def output(lfsr):
        lfsr()
        x = [(lfsr.state >> i) & 1 for i in select]
        return _combiner(*x)

    lfsr = LFSR(n, mask, init)
    out = [output(lfsr) for _ in range(N)]

    qsys = QuadraticSystem([n])
    (x,) = qsys.gens()
    lfsr_sys = LFSR(n, mask, x)
    zeros = []
    for o in out:
        lfsr_sys()
        x0, x1, x2, x3, x4 = [lfsr_sys.state[i] for i in select]
        if o == 1:
            # annihilator of the combiner (examples/nlfsr.py:24-26)
            z = qsys.mul_bit(x0, x1) ^ x0 ^ qsys.mul_bit(x1, x2) ^ x1 ^ x2 ^ 1
            zeros.append(z)
    return qsys, x, zeros, init


def test_mini_nlfsr_quadratic():
    # scaled-down examples/nlfsr.py: 24-bit LFSR, quadratic annihilator attack
    n, mask = 24, 0xE10000  # maximal-length taps -> near-full-rank system
    select = (3, 7, 11, 15, 19)
    qsys, x, zeros, init = _mini_nlfsr(GaloisLFSR, n, mask, select, 2**12)
    sols = list(qsys.solve_all(zeros, max_dimension=12))
    assert any(sol == init for (sol,) in sols)


def test_mini_nlfsr_bit_assert_bruteforce():
    # scaled-down examples/nlfsr_ex.py:69-93: too-large space -> guess bits
    import itertools

    from gf2bv_tpu import DimensionTooLargeError

    n, mask = 24, 0xC20000  # rank-deficient taps -> dim ~25 space
    select = (3, 7, 11, 15, 19)
    qsys, x, zeros, init = _mini_nlfsr(GaloisLFSR, n, mask, select, 2**12)
    try:
        sols = list(qsys.solve_all(zeros, max_dimension=12))
    except DimensionTooLargeError:
        found = False
        for b0, b1 in itertools.product([0, 1], repeat=2):
            try:
                sols = list(
                    qsys.solve_all(
                        zeros
                        + qsys.bit_assert(x[0], b0)
                        + qsys.bit_assert(x[1] ^ x[2] ^ x[20], b1)
                    )
                )
            except DimensionTooLargeError:
                continue
            for sol_tuple in sols:
                sol = qsys.evaluate(x, sol_tuple)
                if sol == init:
                    assert sol & 1 == b0
                    assert ((sol >> 1) ^ (sol >> 2) ^ (sol >> 20)) & 1 == b1
                    found = True
        assert found
    else:
        assert any(sol == init for (sol,) in sols)


# ----------------------------------------------------------------- geffe.py


def test_geffe_guess_sweep_batch():
    """Scaled-down examples/geffe.py: guess the short register (2^9), the
    conditioned keystream is linear in the other two — all guesses solved
    in one batched device call, exactly one satisfiable + verified."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    import geffe

    # shrink the sweep: 9-bit register 1 (512 guesses)
    old = (geffe.N1, geffe.T1, geffe.T)
    geffe.N1, geffe.T1, geffe.T = 9, 0x110, 96
    try:
        s1, s2, s3 = 0x1A5, 0x2B3C7, 0x5D1E33
        ks = geffe.geffe_stream(s1, s2, s3, geffe.T)
        hits = geffe.attack(ks)
        assert (s1, s2, s3) in hits
        assert len(hits) == 1
    finally:
        geffe.N1, geffe.T1, geffe.T = old
