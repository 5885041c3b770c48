"""Headline benchmark: MT19937 19968-var state recovery (solve_one).

This is the driver metric (BASELINE.json "metric"): wall-clock to solve the
19968-variable system traced from 624 MT19937 outputs, matching the
reference harness ``/root/reference/examples/mt.py:29-36`` (bs=32 plus the
known-MSB equation).  The reference publishes no numbers (BASELINE.md); M4RI
single-core on this size is documented there as seconds-scale — the
``vs_baseline`` field uses the BASELINE.md sizing estimate (2.0 s) until a
measured M4RI number exists.

Prints exactly ONE JSON line on stdout; phase detail goes to stderr.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

# Persistent XLA compilation cache: cold compiles of the big solver graphs
# take minutes through the remote-compile tunnel; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

# Documented estimate (BASELINE.md: "seconds-scale single-core solve").
M4RI_BASELINE_EST_S = 2.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_mt19937(bs: int = 32):
    from gf2bv_tpu import LinearSystem
    from gf2bv_tpu.crypto.mt import MT19937

    rand = random.Random(3142)
    st = tuple(rand.getstate()[1][:-1])
    effective_bs = ((bs - 1) & bs) or bs
    samples = 624 * 32 // effective_bs
    out = [rand.getrandbits(bs) for _ in range(samples)]

    lin = LinearSystem([32] * 624)
    mt = lin.gens()
    rng = MT19937(list(mt))

    t0 = time.perf_counter()
    zeros = [rng.getrandbits(bs) ^ o for o in out] + [mt[0] ^ 0x80000000]
    t1 = time.perf_counter()
    log(f"generate system: {t1 - t0:.3f}s")

    # warm-up solve: jit compile + device transfer paths
    t2 = time.perf_counter()
    sol = lin.solve_one(zeros)
    t3 = time.perf_counter()
    log(f"solve_one (cold, incl. compile): {t3 - t2:.3f}s")
    assert sol == st, "solution mismatch"

    # timed solve
    t4 = time.perf_counter()
    sol = lin.solve_one(zeros)
    t5 = time.perf_counter()
    solve_s = t5 - t4
    log(f"solve_one (warm): {solve_s:.3f}s")
    assert sol == st

    return solve_s, t1 - t0


def main():
    import jax

    log(f"devices: {jax.devices()}")
    solve_s, trace_s = bench_mt19937()
    print(
        json.dumps(
            {
                "metric": "mt19937_19968var_solve_one_wall_clock",
                "value": round(solve_s, 4),
                "unit": "s",
                "vs_baseline": round(M4RI_BASELINE_EST_S / solve_s, 3),
                "detail": {
                    "trace_s": round(trace_s, 3),
                    "baseline": "M4RI single-core estimate 2.0s (BASELINE.md; reference publishes no numbers)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
