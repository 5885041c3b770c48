"""Phase-level accounting of the blocked TPU solver on the MT19937 system.

Round-2 review: BASELINE's phase decomposition (~55 ms) left ~22 ms of the
77 ms device-chained solve unattributed.  This harness measures every layer
of the fused mode-0 solve and prints a table that must attribute >= 90%:

  fused        = rref_origin_blocked wall      (the headline solve)
  rref_trail   = elimination only, trailing    (fused - rref_trail = origin
                                                extraction + parity verify)
  p1_only      = phase2="skip"                 (rref_trail - p1_only =
                                                trailing MXU phase 2)
  scan / recon / gather = the three phase-1 sub-steps, measured standalone
                 as 80-panel chained jits at the exact MT shapes
                 (p1_only - sum = per-panel glue: dynamic slices, selector,
                 pof scatter, loop overhead)

Every wall includes ONE forced tunnel readback; the measured RTT is
subtracted in the attribution table.  Run on the real TPU.
"""

import itertools
import os
import random
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from gf2bv_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

from gf2bv_tpu.core import packing
from gf2bv_tpu.crypto import mt_jax
from gf2bv_tpu.ops import extract_device, gauss_blocked

K = gauss_blocked.K_PANEL
PANELS = None  # filled from shapes


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def force(x):
    return np.asarray(x[0, :1] if x.ndim > 1 else x[:1])


def best_of(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    log(f"devices: {jax.devices()}")
    rand = random.Random(3142)
    out = [rand.getrandbits(32) for _ in range(624)]
    outs32 = jnp.asarray(np.asarray(out, dtype=np.uint32))

    eqs = mt_jax.mt19937_system_device(outs32, 32, 624)
    rows = eqs.shape[0]
    want = -(-rows // 256) * 256
    eqs = jnp.concatenate(
        [eqs, jnp.zeros((want - rows, eqs.shape[1]), jnp.uint32)], axis=0
    )
    force(eqs)
    rows, wp = eqs.shape
    panels = wp // (K // 32)
    cols = mt_jax.COLS
    log(f"system: rows={rows} wp={wp} panels={panels} cols={cols}")

    p1, p2 = gauss_blocked._pick_engines(wp)
    interp = p1.endswith("_interpret")

    # ---- RTT: readback of an already-materialized tiny array -------------
    small = jnp.zeros((8,), jnp.uint32)
    force(small)
    rtt = best_of(lambda: force(small), 5)
    log(f"rtt: {rtt * 1e3:.1f} ms")

    timings = {}

    # ---- end-to-end layers ----------------------------------------------
    def run_fused():
        o, u = gauss_blocked.rref_origin_blocked(eqs, cols, K, p2, p1)
        force(o)

    def run_trail():
        r, pof, inc = gauss_blocked.rref_blocked(eqs, cols, K, p2, p1, True)
        force(r)

    def run_full():
        r, pof, inc = gauss_blocked.rref_blocked(eqs, cols, K, p2, p1, False)
        force(r)

    def run_p1only():
        r, pof, inc = gauss_blocked.rref_blocked(eqs, cols, K, "skip", p1)
        force(r)

    for name, fn in (
        ("fused", run_fused),
        ("rref_trail", run_trail),
        ("rref_full", run_full),
        ("p1_only", run_p1only),
    ):
        fn()  # warm/compile
        timings[name] = best_of(fn)
        log(f"{name}: {timings[name] * 1e3:.1f} ms")

    # ---- standalone phase-1 sub-steps, chained x panels ------------------
    from gf2bv_tpu.ops import pallas_phase1 as pp1

    kw = K // 32
    bT0 = eqs[:, :kw].T
    used0 = jnp.zeros((1, rows), jnp.int32)
    prow0 = jnp.arange(K, dtype=jnp.int32)  # plausible gather indices
    coeff0 = jnp.zeros((K, kw), jnp.uint32)
    arows0 = eqs[:K, :]

    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def scan_chain(bT, used, n):
        def body(t, carry):
            bT, used = carry
            prow, used_o, cT = pp1._call_scan_kernel(
                bT, used, jnp.asarray([0], jnp.int32), K, cols, interp
            )
            # feed outputs forward so steps serialize and nothing is DCE'd
            return bT ^ cT, used_o

        return lax.fori_loop(0, n, body, (bT, used))

    @functools.partial(jax.jit, static_argnums=(4,))
    def recon_chain(arows, coeff, prow, w0, n):
        def body(t, acc):
            pf = pp1.phase1_reconstruct(acc, coeff, prow, w0, K, cols, interp)
            return pf

        return lax.fori_loop(0, n, body, arows)

    @functools.partial(jax.jit, static_argnums=(3,))
    def gather_chain(a, prow, cT, n):
        def body(t, carry):
            s, _ = carry
            idx = (prow + s) % rows
            arows = a[idx]  # (K, wp) gather
            coeff = cT[:, idx].T  # (K, kw) gather
            return s + 1, arows[0, 0] + coeff[0, 0]

        return lax.fori_loop(0, n, body, (jnp.int32(0), jnp.uint32(0)))

    cT0 = jnp.zeros((kw, rows), jnp.uint32)

    r = scan_chain(bT0, used0, panels)
    force(r[0])
    timings["scan_x80"] = best_of(lambda: force(scan_chain(bT0, used0, panels)[0]))
    log(f"scan_x{panels}: {timings['scan_x80'] * 1e3:.1f} ms")

    r = recon_chain(arows0, coeff0, prow0, 0, panels)
    force(r)
    timings["recon_x80"] = best_of(
        lambda: force(recon_chain(arows0, coeff0, prow0, 0, panels))
    )
    log(f"recon_x{panels}: {timings['recon_x80'] * 1e3:.1f} ms")

    r = gather_chain(eqs, prow0, cT0, panels)
    force(r[1][None])
    timings["gather_x80"] = best_of(
        lambda: force(gather_chain(eqs, prow0, cT0, panels)[1][None])
    )
    log(f"gather_x{panels}: {timings['gather_x80'] * 1e3:.1f} ms")

    # ---- attribution table ----------------------------------------------
    dev = {k: v - rtt for k, v in timings.items()}
    fused = dev["fused"]
    origin_verify = dev["fused"] - dev["rref_trail"]
    phase2_trail = dev["rref_trail"] - dev["p1_only"]
    phase2_full = dev["rref_full"] - dev["p1_only"]
    scan = dev["scan_x80"]
    recon = dev["recon_x80"]
    gather = dev["gather_x80"]
    glue = dev["p1_only"] - scan - recon - gather

    rowsfmt = [
        ("phase-1 scan kernel", scan),
        ("phase-1 reconstruct kernel", recon),
        ("phase-1 pivot/coeff gathers", gather),
        ("phase-1 glue (slices/selector/pof/loop)", glue),
        ("phase-2 trailing MXU update", phase2_trail),
        ("origin extraction + parity verify", origin_verify),
    ]
    print(f"\ndevice-time attribution of the fused mode-0 solve "
          f"({fused * 1e3:.1f} ms device, rtt {rtt * 1e3:.1f} ms):")
    total = 0.0
    for name, v in rowsfmt:
        total += v
        print(f"  {name:42s} {v * 1e3:7.1f} ms  {v / fused * 100:5.1f}%")
    print(f"  {'SUM':42s} {total * 1e3:7.1f} ms  {total / fused * 100:5.1f}%")
    print(f"  (full-width phase-2 would be {phase2_full * 1e3:.1f} ms; "
          f"trailing saves {(phase2_full - phase2_trail) * 1e3:.1f} ms)")

    # legacy sweep (kept: K/engine comparison)
    if "--sweep" in sys.argv:
        for Ksw, p1sw in itertools.product((128, 256), ("pallas_scan", "pallas_sub")):
            r, pof, inc = gauss_blocked.rref_blocked(eqs, cols, Ksw, "mxu", p1sw)
            force(r)
            t = best_of(
                lambda: force(
                    gauss_blocked.rref_blocked(eqs, cols, Ksw, "mxu", p1sw)[0]
                )
            )
            print(f"K={Ksw} p1={p1sw}: rref={t:.4f}s")


if __name__ == "__main__":
    main()
