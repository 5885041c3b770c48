"""Online state recovery with the incremental solver.

The classic serving-side loop: keystream bits arrive a few at a time, and
after each batch you want to know how much of the key space remains — and
the key itself the moment it is unique.  The reference re-factors the
whole system on every check (one full PLUQ per `m4ri_solve` call,
/root/reference/gf2bv/_internal.c:359-502); `IncrementalSolver` keeps the
RREF device-resident and folds each batch in with three bounded passes,
so the per-batch cost is independent of how many equations came before.
"""

import _bootstrap  # noqa: F401

import secrets
import time

from gf2bv_tpu import IncrementalSolver, LinearSystem
from gf2bv_tpu.crypto.lfsr import GaloisLFSR

WIDTH = 128
TAPS = 0xE1000000000000000000000000000000 | 0b10010011


def keystream(state: int, n: int):
    reg = GaloisLFSR(WIDTH, TAPS, state)
    return [reg() for _ in range(n)]


def main():
    secret = secrets.randbits(WIDTH) | 1
    stream = keystream(secret, WIDTH + 16)

    lin = LinearSystem([WIDTH])
    (x,) = lin.gens(lazy=False)
    sym = GaloisLFSR(WIDTH, TAPS, x)
    sym_stream = [sym() for _ in range(WIDTH + 16)]

    inc = IncrementalSolver(lin)
    print(f"start: dimension {inc.dimension} (nothing observed)")

    batch = 24
    t_total = 0.0
    for lo in range(0, len(stream), batch):
        zeros = [
            s ^ o
            for s, o in zip(sym_stream[lo : lo + batch], stream[lo : lo + batch])
        ]
        t0 = time.perf_counter()
        inc.add(zeros)
        dt = time.perf_counter() - t0
        t_total += dt
        print(
            f"observed {min(lo + batch, len(stream)):3d} bits: "
            f"dimension {inc.dimension:3d}  (add: {dt * 1e3:.1f} ms)"
        )
        if inc.dimension == 0:
            break

    assert not inc.unsat and inc.dimension == 0
    (rec,) = inc.solve_one()
    assert rec == secret, "recovery failed"
    # predict keystream the solver never saw
    future = keystream(rec, WIDTH + 64)[WIDTH + 16 :]
    assert future == keystream(secret, WIDTH + 64)[WIDTH + 16 :]
    print(
        f"recovered the {WIDTH}-bit state after "
        f"{t_total * 1e3:.0f} ms of incremental adds; future outputs verified"
    )


if __name__ == "__main__":
    main()
