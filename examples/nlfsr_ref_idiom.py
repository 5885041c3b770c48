"""Nonlinear-LFSR attack written in the REFERENCE'S OWN idiom.

This file mirrors ``/root/reference/examples/nlfsr.py`` line-shape for
line-shape: full-width quadratic gens, a plain Python loop stepping the
symbolic LFSR, one ``qsys.mul_bit``-built annihilator equation per
keystream 1 — no tap-stream rewrite, no device-expansion API.  The lazy
engine makes this idiom fast anyway: each ``mul_bit`` records a ``mulq``
node, and the whole zeros list materializes at solve time in ONE shared
walk with a single batched ``mul_bits`` monomial expansion
(core/lazy.py:_batch_mulq).

Compare examples/nlfsr.py, which is the TPU-idiomatic version of the same
attack (narrow tap streams + on-device expansion); both recover the same
register.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import itertools
import secrets
import time

from gf2bv_tpu import QuadraticSystem
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR, GaloisLFSR

n, mask = 128, 0xD670201BAC7515352A273372B2A95B23
select = (13, 24, 35, 46, 57)


def combiner(x0, x1, x2, x3, x4):
    # balanced: emits 1 half the time
    return (x0 * x1) ^ (x0 * x1 * x3 * x4) ^ x0 ^ x1 ^ x2


def non_linear_output(lfsr):
    lfsr()
    x0, x1, x2, x3, x4 = [(lfsr.state >> i) & 1 for i in select]
    return combiner(x0, x1, x2, x3, x4)


def annihilator(x0, x1, x2, x3, x4):
    return (x0 * x1) ^ x0 ^ (x1 * x2) ^ x1 ^ x2 ^ 1


def sanity_check():
    for x0, x1, x2, x3, x4 in itertools.product([0, 1], repeat=5):
        if combiner(x0, x1, x2, x3, x4) == 1:
            assert annihilator(x0, x1, x2, x3, x4) == 0


def nlfsr_test(LFSR):
    print(f"Testing {LFSR.__name__}")
    init = secrets.randbits(n)
    print(f"{init = :0{n}b}")
    lfsr = LFSR(n, mask, init)

    N = 2**14 + 1000
    out = [non_linear_output(lfsr) for _ in range(N)]

    t0 = time.perf_counter()
    qsys = QuadraticSystem([128])
    (x,) = qsys.gens()  # lazy by default: ops below only RECORD
    lfsr_sys = LFSR(128, mask, x)
    zeros = []
    for o in out:
        lfsr_sys()
        if o == 1:
            x0, x1, x2, x3, x4 = [lfsr_sys.state[i] for i in select]
            # this is the annihilator, exactly as the reference writes it
            z = qsys.mul_bit(x0, x1) ^ x0 ^ qsys.mul_bit(x1, x2) ^ x1 ^ x2 ^ 1
            zeros.append(z)
    print(f"{len(zeros) = }  (recorded in {time.perf_counter() - t0:.2f}s)")

    t0 = time.perf_counter()
    sols = list(qsys.solve_all(zeros))
    print(f"solve_all: {time.perf_counter() - t0:.2f}s")
    for (sol,) in sols:
        print(f"{sol = :0{n}b}")
        assert sol == init

    t0 = time.perf_counter()
    (sol,) = qsys.solve_one(zeros)
    print(f"solve_one: {time.perf_counter() - t0:.2f}s")
    print(f"{sol = :0{n}b}")
    assert sol == init


if __name__ == "__main__":
    sanity_check()
    nlfsr_test(GaloisLFSR)
    nlfsr_test(FibonacciLFSR)
    print("ok")
