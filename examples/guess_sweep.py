"""Guess-and-solve in ONE elimination: `solve_one_sweep`.

Scenario: a 96-bit Galois LFSR keystream where only 84 output bits made it
into the linear system — the solution space keeps 12 free dimensions (for
this right-shifting register: the high state bits).  The classic move is to
guess them: the reference idiom loops `for guess in range(2**12):
solve(zeros + pinned)`, paying a full factorization per guess
(/root/reference/gf2bv/_internal.c:359-502).  Pinning the SAME bit
expressions to different values changes only the affine column, so here all
4096 candidates ride ONE elimination as appended RHS columns
(ops/multi_rhs.py).

Every candidate is consistent with the 84 system bits by construction (the
guessed bits span exactly the free dimensions), so disambiguation needs
data the system did not consume: the attacker's remaining 16 observed bits
serve as the per-candidate check.  (With a purely linear check you would
just add those bits as equations; the per-candidate filter is the shape
you need when the check is nonlinear — a MAC, a reseed, a filter output —
which is where sweeps earn their keep, e.g. QuadraticSystem.solve_one_sweep
over mul_bit expressions.)
"""

import _bootstrap  # noqa: F401

import secrets
import time

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.lfsr import GaloisLFSR

WIDTH = 96
TAPS = (1 << 95) | (1 << 81) | (1 << 17) | 0b101
N_SYS = WIDTH - 12  # bits consumed by the linear system
N_CHK = 16          # bits reserved for per-candidate verification


def main():
    key = secrets.randbits(WIDTH) | 1
    stream = GaloisLFSR(WIDTH, TAPS, key)
    observed = [stream() for _ in range(N_SYS + N_CHK)]

    lin = LinearSystem([WIDTH])
    (x,) = lin.gens()
    sym = GaloisLFSR(WIDTH, TAPS, x)
    zeros = [sym() ^ o for o in observed[:N_SYS]]

    # sweep the 12 free dimensions (the high state bits): 4096 candidates,
    # ONE elimination
    guesses = [x[i] for i in range(WIDTH - 12, WIDTH)]
    t0 = time.perf_counter()
    sols = lin.solve_one_sweep(zeros, guesses)
    dt = time.perf_counter() - t0
    hits = [s for s in sols if s is not None]
    print(f"swept {len(sols)} candidates in {dt:.2f} s -> "
          f"{len(hits)} satisfy the {N_SYS}-bit system")

    # per-candidate check against the reserved keystream bits
    survivors = []
    for (st,) in hits:
        replay = GaloisLFSR(WIDTH, TAPS, st)
        if all(replay() == o for o in observed):
            survivors.append(st)
    assert survivors == [key], survivors
    print(f"{N_CHK} verification bits leave {len(survivors)} survivor: "
          f"{hex(survivors[0])}")


if __name__ == "__main__":
    main()
