"""Measure the look-ahead megakernel engine (phase2="mxu_la") against the
split-engine path on the real TPU at the flagship MT19937 shape.

VERDICT round-3 item #1: phase 1 (~23 ms VPU scan) runs strictly serially
after phase 2 (~47 ms MXU update) because two pallas_calls never overlap on
a TPU core; the mxu_la engine fuses the NEXT panel's scan into the current
panel's trailing update so both functional units run concurrently.  Success
criterion from the verdict: fused mode-0 device time <= ~55 ms.
"""

import os
import random
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from gf2bv_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from gf2bv_tpu.crypto import mt_jax
from gf2bv_tpu.ops import gauss_blocked

K = gauss_blocked.K_PANEL


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(x):
    return np.asarray(x[0, :1] if x.ndim > 1 else x[:1])


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def main():
    log(f"devices: {jax.devices()}")
    rand = random.Random(3142)
    out = [rand.getrandbits(32) for _ in range(624)]
    outs32 = jnp.asarray(np.asarray(out, dtype=np.uint32))
    eqs = mt_jax.mt19937_system_device(outs32, 32, 624)
    force(eqs)
    rows, wp = eqs.shape
    cols = mt_jax.COLS
    log(f"system: rows={rows} wp={wp} cols={cols}")

    from gf2bv_tpu.ops.pallas_update import la_grid

    nj, ni, ngrid = la_grid(rows, wp)
    log(f"la grid: nj={nj} ni={ni} ngrid={ngrid} (spp={-(-K // ngrid)})")
    assert ngrid * 32 >= K

    small = jnp.zeros((8,), jnp.uint32)
    force(small)
    rtt, _ = best_of(lambda: force(small), 5)
    log(f"rtt: {rtt * 1e3:.1f} ms")

    p1, _ = gauss_blocked._pick_engines(wp)
    results = {}
    for label, p2 in (("mxu (split)", "mxu"), ("mxu_la (fused)", "mxu_la")):
        def run():
            o, u = gauss_blocked.rref_origin_blocked(eqs, cols, K, p2, p1)
            force(o)

        t0 = time.perf_counter()
        run()  # compile + warm
        log(f"{label}: first call {time.perf_counter() - t0:.1f}s")
        t, ts = best_of(run)
        results[label] = t
        log(
            f"{label}: fused mode-0 best {t * 1e3:.1f} ms "
            f"(device ~{(t - rtt) * 1e3:.1f} ms) of "
            f"{[round(x * 1e3, 1) for x in ts]}"
        )

    base = results["mxu (split)"]
    la = results["mxu_la (fused)"]
    log(
        f"lookahead vs split: {la * 1e3:.1f} vs {base * 1e3:.1f} ms "
        f"({(base - la) * 1e3:+.1f} ms, {base / la:.2f}x)"
    )

    # correctness on hardware: same origin from both engines
    o1, u1 = gauss_blocked.rref_origin_blocked(eqs, cols, K, "mxu", p1)
    o2, u2 = gauss_blocked.rref_origin_blocked(eqs, cols, K, "mxu_la", p1)
    assert not bool(u1) and not bool(u2)
    assert np.array_equal(np.asarray(o1), np.asarray(o2)), "ORIGIN MISMATCH"
    log("hardware origins match bit-for-bit")


if __name__ == "__main__":
    main()
