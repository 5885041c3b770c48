"""xoshiro256** full-state recovery from 10 outputs.

Port of ``/root/reference/examples/xoshiro.py``."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo-root run

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.xoshiro import Xoshiro256starstar


def xoshiro256starstar():
    xos = Xoshiro256starstar.generate()
    print(f"{xos.s = }")
    out = [xos() for _ in range(10)]

    lin = LinearSystem([64] * 4)
    xos2 = Xoshiro256starstar(lin.gens())
    zeros = [xos2.step() ^ Xoshiro256starstar.untemper(o) for o in out]
    for sol in lin.solve_all(zeros):
        print(f"{sol = }")
        xos2 = Xoshiro256starstar(list(sol))
        assert all(xos2() == o for o in out)


if __name__ == "__main__":
    xoshiro256starstar()
