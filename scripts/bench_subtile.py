"""VERDICT round-3 item #3 decision experiment: sub-tile trailing skip.

The phase-2 trailing skip is quantized to whole 128-word tiles
(ops/pallas_update.py); the boundary tile is half-wasted on average
(~12 ms of the ~47 ms phase-2 budget at flagship shape).  A sub-tile skip
only helps if a NARROWER word tile is proportionally cheaper on the MXU —
i.e. if a (TR,K)x(K,32) int8 matmul costs ~1/4 of (TR,K)x(K,128).  The
v5 MXU's output lane dimension is 128 wide, so the expected answer is NO
(both are one pass through the systolic array); this script measures it.

A: panel update on a (rows, tw) matrix for tw in {32, 64, 128, 256}:
   cost per word if lanes were free would halve each step down; lane
   quantization predicts flat time below 128.
B: the real trailing kernel at flagship width (rows, 640) across w0 sweep:
   confirms the whole-tile skip model the round-3 accounting fit.
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from gf2bv_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from gf2bv_tpu.ops import pallas_update

ROWS = 20224
K = 256


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(x):
    return np.asarray(x[0, :1])


def best_of(fn, n=7):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0x5AB)
    sel = jnp.asarray(
        rng.integers(0, 1 << 32, size=(ROWS, K // 32), dtype=np.uint64
                     ).astype(np.uint32)
    )

    log("--- A: lane-width sweep (one word tile, k=256) ---")
    results = {}
    for tw in (32, 64, 128, 256):
        a = jnp.asarray(
            rng.integers(0, 1 << 32, size=(ROWS, tw), dtype=np.uint64
                         ).astype(np.uint32)
        )
        pf = jnp.asarray(
            rng.integers(0, 1 << 32, size=(K, tw), dtype=np.uint64
                         ).astype(np.uint32)
        )
        fn = jax.jit(
            lambda a, sel, pf: pallas_update.panel_update_mxu(a, sel, pf)
        )
        force(fn(a, sel, pf))  # warm/compile
        t, ts = best_of(lambda: force(fn(a, sel, pf)))
        results[tw] = t
        log(f"tw={tw:4d}: best {t * 1e3:8.3f} ms of "
            f"{[round(x * 1e3, 2) for x in ts]}")
    r = results
    log(f"t(32)/t(128) = {r[32] / r[128]:.2f} "
        f"(1.0 => lane-quantized, 0.25 => proportional)")
    log(f"t(256)/t(128) = {r[256] / r[128]:.2f} (expect ~2.0)")

    log("--- B: trailing w0 sweep at flagship width (wp=640) ---")
    wp = 640
    a = jnp.asarray(
        rng.integers(0, 1 << 32, size=(ROWS, wp), dtype=np.uint64
                     ).astype(np.uint32)
    )
    pf = jnp.asarray(
        rng.integers(0, 1 << 32, size=(K, wp), dtype=np.uint64
                     ).astype(np.uint32)
    )
    fnt = jax.jit(
        lambda a, sel, pf, w0: pallas_update.panel_update_mxu(
            a, sel, pf, w0=w0
        )
    )
    for w0 in (0, 64, 128, 256, 384, 512):
        w0j = jnp.asarray(w0, jnp.int32)
        force(fnt(a, sel, pf, w0j))
        t, ts = best_of(lambda: force(fnt(a, sel, pf, w0j)))
        live = wp - (w0 // 128) * 128
        log(f"w0={w0:4d}: best {t * 1e3:8.3f} ms "
            f"(live tiles cover {live} words)  "
            f"{[round(x * 1e3, 2) for x in ts]}")

    verdict = "DEAD END (lane-quantized)" if r[32] / r[128] > 0.6 else \
        "VIABLE (narrow tiles are cheaper)"
    log(f"sub-tile skip verdict: {verdict}")


if __name__ == "__main__":
    main()
