"""Hardware timing of IncrementalSolver adds at flagship (MT19937) shape.

Measures what the online-attack loop actually pays per new batch of
equations, against the from-scratch alternative (a full fused solve,
~0.1 s warm).  The reference pays a fresh PLUQ per `m4ri_solve` call
(/root/reference/gf2bv/_internal.c:359-502); here an add is three bounded
passes over the device-resident RREF.

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_incremental.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from gf2bv_tpu.ops.incremental import IncrementalSolver
from gf2bv_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(Path(__file__).resolve().parent.parent / ".jax_cache")

COLS = 19968
ROWS = COLS + 64  # overdetermined, rank ~= COLS


def rand_rows(rng, n):
    w64 = -(-(1 + COLS) // 64)
    m = rng.integers(0, 1 << 63, size=(n, w64), dtype=np.uint64) * 2 + 1
    # clear bits past cols
    top = (1 + COLS) % 64
    if top:
        m[:, -1] &= (np.uint64(1) << np.uint64(top)) - np.uint64(1)
    return m


def sync(inc):
    np.asarray(inc._M[0, :1])  # forced readback: block through the tunnel


def main():
    import jax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0xD4)

    t0 = time.perf_counter()
    inc = IncrementalSolver.from_packed(rand_rows(rng, ROWS - 4096), COLS,
                                        slack=8192)
    sync(inc)
    t_init = time.perf_counter() - t0
    print(f"init elimination ({ROWS - 4096} rows): {t_init:.3f} s  "
          f"rank={inc.rank}", flush=True)

    for b in (128, 512, 2048):
        # warm compile for this bucket
        inc.add_packed(rand_rows(rng, b))
        sync(inc)
        times = []
        for _ in range(3):
            rows = rand_rows(rng, b)
            t0 = time.perf_counter()
            inc.add_packed(rows)
            sync(inc)
            times.append(time.perf_counter() - t0)
        print(f"add B={b:5d}: min {min(times)*1e3:8.1f} ms  "
              f"(all: {[f'{t*1e3:.1f}' for t in times]})  rank={inc.rank}",
              flush=True)

    print(f"dimension now: {inc.dimension}  unsat={inc.unsat}", flush=True)


if __name__ == "__main__":
    main()
