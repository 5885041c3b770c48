"""VERDICT round-3 item #3 decision experiment: sub-tile trailing skip.

The phase-2 trailing skip is quantized to whole 128-word tiles
(ops/pallas_update.py); the boundary tile is half-wasted on average
(~12 ms of the ~47 ms phase-2 budget at flagship shape).  A sub-tile skip
only helps if a NARROWER word tile is proportionally cheaper on the MXU —
i.e. if a (TR,K)x(K,32) int8 matmul costs ~1/4 of (TR,K)x(K,128).  The
v5 MXU's output lane dimension is 128 wide, so the expected answer is NO
(both are one pass through the systolic array); this script measures it.

One panel update is ~0.6 ms device while the tunnel RTT is ~28 ms, so a
single timed call measures only the tunnel (the first version of this
script made that mistake).  Each measurement therefore chains N=64
data-dependent kernel calls inside ONE jit (a <- update(a, sel, pf)) and
reports (wall - rtt) / N.

A: panel update on a (rows, tw) matrix for tw in {32, 64, 128, 256}:
   cost per word if lanes were free would halve each step down; lane
   quantization predicts flat time below 128.
B: the real trailing kernel at flagship width (rows, 640) across w0 sweep:
   confirms the whole-tile skip model the round-3 accounting fit.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gf2bv_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from gf2bv_tpu.ops import pallas_update

ROWS = 20224
K = 256
N_CHAIN = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(x):
    return np.asarray(x[0, :1])


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


@functools.partial(jax.jit, static_argnames=("n",))
def _chain(a, sel, pf, n):
    return lax.fori_loop(
        0, n, lambda i, a: pallas_update.panel_update_mxu(a, sel, pf), a
    )


@functools.partial(jax.jit, static_argnames=("n",))
def _chain_w0(a, sel, pf, w0, n):
    return lax.fori_loop(
        0, n, lambda i, a: pallas_update.panel_update_mxu(a, sel, pf, w0=w0), a
    )


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0x5AB)
    sel = jnp.asarray(
        rng.integers(0, 1 << 32, size=(ROWS, K // 32), dtype=np.uint64
                     ).astype(np.uint32)
    )

    small = jnp.zeros((8,), jnp.uint32)
    force(small[None, :])
    rtt, _ = best_of(lambda: np.asarray(small[:1]), 7)
    log(f"rtt: {rtt * 1e3:.1f} ms; chain N={N_CHAIN}")

    log("--- A: lane-width sweep (chained word tile, k=256) ---")
    results = {}
    for tw in (32, 64, 128, 256):
        # narrow tiles compute ~4-5 ms per 64-call chain, small next to the
        # subtracted ~28 ms RTT whose jitter would distort the ratio; scale
        # the chain so compute dominates RTT (ADVICE r4)
        n = N_CHAIN * (4 if tw <= 64 else 1)
        a = jnp.asarray(
            rng.integers(0, 1 << 32, size=(ROWS, tw), dtype=np.uint64
                         ).astype(np.uint32)
        )
        pf = jnp.asarray(
            rng.integers(0, 1 << 32, size=(K, tw), dtype=np.uint64
                         ).astype(np.uint32)
        )
        force(_chain(a, sel, pf, n))  # warm/compile
        t, ts = best_of(lambda: force(_chain(a, sel, pf, n)))
        per = (t - rtt) / n
        results[tw] = per
        log(f"tw={tw:4d}: per-call {per * 1e3:8.3f} ms (chain N={n} best "
            f"{t * 1e3:.1f} ms of {[round(x * 1e3, 1) for x in ts]})")
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
    bpercall = {}
    for w0 in (0, 64, 128, 256, 384, 512):
        w0j = jnp.asarray(w0, jnp.int32)
        force(_chain_w0(a, sel, pf, w0j, N_CHAIN))
        t, ts = best_of(lambda: force(_chain_w0(a, sel, pf, w0j, N_CHAIN)))
        per = (t - rtt) / N_CHAIN
        bpercall[w0] = per
        live = wp - (w0 // 128) * 128
        log(f"w0={w0:4d}: per-call {per * 1e3:8.3f} ms "
            f"(live tiles cover {live} words)  chain "
            f"{[round(x * 1e3, 1) for x in ts]}")

    # least-squares fit per-call = floor + slope * live_tiles over the w0
    # sweep, so the "~0.2 ms fixed copy-through floor" documented in
    # BASELINE.md is reproducible from this script's output (ADVICE r4)
    xs = np.array([5 - (w0 // 128) for w0 in bpercall])  # live 128-word tiles
    ys = np.array([bpercall[w0] for w0 in bpercall])
    slope, floor = np.polyfit(xs, ys, 1)
    log(f"w0-sweep fit: per-call = {floor * 1e3:.3f} ms fixed floor "
        f"+ {slope * 1e3:.3f} ms per live 128-word tile")

    log("--- C: segmented kernel (dead tiles excluded from the grid) ---")
    # the round-5 fix: panel_update_mxu_seg never DMAs dead tiles; compare
    # per-call cost against the pl.when-copy trailing kernel at matching w0
    for dead in (1, 2, 3, 4):
        w0 = dead * 128

        @functools.partial(jax.jit, static_argnames=("n", "dead"))
        def _chain_seg(a, sel, pf, n, dead):
            return lax.fori_loop(
                0, n,
                lambda i, a: pallas_update.panel_update_mxu_seg(
                    a, sel, pf, dead
                ),
                a,
            )

        force(_chain_seg(a, sel, pf, N_CHAIN, dead))
        t, ts = best_of(lambda: force(_chain_seg(a, sel, pf, N_CHAIN, dead)))
        per_seg = (t - rtt) / N_CHAIN
        per_old = bpercall.get(w0)
        log(f"dead={dead}: seg per-call {per_seg * 1e3:8.3f} ms vs trailing "
            f"{per_old * 1e3 if per_old else float('nan'):8.3f} ms "
            f"(chain {[round(x * 1e3, 1) for x in ts]})")

    verdict = "DEAD END (lane-quantized)" if r[32] / r[128] > 0.6 else \
        "VIABLE (narrow tiles are cheaper)"
    log(f"sub-tile skip verdict: {verdict}")


if __name__ == "__main__":
    main()
