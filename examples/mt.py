"""MT19937 state recovery from truncated outputs — the headline workload.

Port of ``/root/reference/examples/mt.py``: recovers the full 624-word state
from getrandbits(bs) outputs for bs in {32, 17, 9, 1, 1337, 137}, via a
19968-variable GF(2) system solved on TPU."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo-root run

import random

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.mt import MT19937
from gf2bv_tpu.utils.timing import timeit


def mt19937(bs, samples=None):
    print("bs:", bs)
    rand = random.Random(3142)
    st = tuple(rand.getstate()[1][:-1])

    effective_bs = ((bs - 1) & bs) or bs
    samples = 624 * 32 // effective_bs if samples is None else samples
    out = [rand.getrandbits(bs) for _ in range(samples)]

    lin = LinearSystem([32] * 624)
    mt = lin.gens()

    rng = MT19937(list(mt))
    with timeit("generate system"):
        zeros = [rng.getrandbits(bs) ^ o for o in out] + [mt[0] ^ 0x80000000]
    print("solving...")
    with timeit("solve_one"):
        sol = lin.solve_one(zeros)
    print("solved", sol[:10])
    assert sol == st

    rng = MT19937(list(sol))
    pyrand = rng.to_python_random()
    assert all(rng.getrandbits(bs) == o for o in out)
    assert all(pyrand.getrandbits(bs) == o for o in out)
    for _ in range(100):
        assert rng.getrandbits(bs) == rand.getrandbits(bs)


if __name__ == "__main__":
    mt19937(32)
    mt19937(17)
    mt19937(9)
    mt19937(1)
    mt19937(1337, 19968 // 1337 + 10)
    mt19937(137, 19968 // 137 + 60)
