"""Headline benchmark: MT19937 19968-var state recovery (solve_one).

This is the driver metric (BASELINE.json "metric"): wall-clock to solve the
19968-variable system traced from 624 MT19937 outputs, matching the
reference harness ``/root/reference/examples/mt.py:29-36`` (bs=32 plus the
known-MSB equation).  The reference publishes no numbers (BASELINE.md); M4RI
single-core on this size is documented there as seconds-scale — the
``vs_baseline`` field uses the BASELINE.md sizing estimate (2.0 s).  A
measured reference point on THIS machine: our own M4R-class native C engine
(gf2bv_tpu/_native, libm4ri's algorithm family) takes 0.43 s warm on the
single available CPU core (mode-0 trailing path, adaptive macro-panels).

Pipeline measured: the symbolic system is built ON the TPU
(crypto/mt_jax.py — bit-exact vs the generic host trace, tested), so only
the 624 observed words cross the host boundary; the blocked Pallas/MXU
elimination and the canonical extraction also stay on device.

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

M4RI_BASELINE_EST_S = 2.0
# mode-0 trailing path, warm (first call ~1 s; round-1 single-table
# engine was 5.9 s) — see scripts/bench_native.py + BASELINE.md
NATIVE_ENGINE_MEASURED_S = 0.43


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    r = fn()
    return time.perf_counter() - t0, r


def bench_mt19937(bs: int = 32):

    from gf2bv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np

    import jax
    import jax.numpy as jnp

    from gf2bv_tpu.core import packing
    from gf2bv_tpu.crypto import mt_jax
    from gf2bv_tpu.crypto.mt import MT19937
    from gf2bv_tpu.ops import gauss_blocked

    rand = random.Random(3142)
    st = tuple(rand.getstate()[1][:-1])
    samples = 624 * 32 // bs
    out = [rand.getrandbits(bs) for _ in range(samples)]
    outs32 = jnp.asarray(np.asarray(out, dtype=np.uint32))

    def build():
        eqs = mt_jax.mt19937_system_device(outs32, bs, samples)
        rows = eqs.shape[0]
        want = -(-rows // 256) * 256
        if want != rows:
            eqs = jnp.concatenate(
                [eqs, jnp.zeros((want - rows, eqs.shape[1]), jnp.uint32)], axis=0
            )
        return eqs

    def solve(eqs):
        phase1, phase2 = gauss_blocked._pick_engines(eqs.shape[1])
        origin32, inconsistent = jax.device_get(
            gauss_blocked.rref_origin_blocked(
                eqs, mt_jax.COLS, gauss_blocked.K_PANEL, phase2, phase1
            )
        )
        assert not bool(inconsistent)
        return packing.from_u32(origin32[None, :])[0]

    # cold run: compile everything, check correctness; the extra forced
    # readback also compiles the tiny force-slice executable so the warm
    # loop below never pays a first-use compile
    t0 = time.perf_counter()
    _ = np.asarray(build()[0, :1])
    raw = solve(build())
    log(f"cold build+solve (incl. compile): {time.perf_counter() - t0:.3f}s")

    # warm timed runs (best of 3: the axon tunnel adds jittery RTT)
    trace_s, solve_s = float("inf"), float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        eqs = build()
        _ = np.asarray(eqs[0, :1])  # force (block_until_ready is async here)
        trace_s = min(trace_s, time.perf_counter() - t0)

        t0 = time.perf_counter()
        raw = solve(eqs)
        solve_s = min(solve_s, time.perf_counter() - t0)
    log(f"generate system (device trace, warm): {trace_s:.3f}s")
    log(f"solve_one (warm): {solve_s:.3f}s")

    # pipelined throughput: N builds+solves in flight before one readback —
    # amortizes the dev-tunnel dispatch/readback RTT, i.e. the rate a real
    # host would sustain
    npipe = 8
    phase1, phase2 = gauss_blocked._pick_engines(eqs.shape[1])
    t0 = time.perf_counter()
    results = []
    for _ in range(npipe):
        e = build()
        results.append(
            gauss_blocked.rref_origin_blocked(
                e, mt_jax.COLS, gauss_blocked.K_PANEL, phase2, phase1
            )[0]
        )
    for r in results:
        _ = np.asarray(r[:1])
    pipe_s = (time.perf_counter() - t0) / npipe
    log(f"pipelined build+solve: {pipe_s:.3f}s/solve ({1 / pipe_s:.2f} solves/s)")

    # pure device throughput: N trace+solve iterations chained inside ONE
    # jit via lax.scan — zero host involvement between solves, the
    # solves/s/chip a serving deployment would see
    import functools

    from jax import lax

    nchain = 4

    @functools.partial(jax.jit, static_argnums=())
    def solve_many(outs_b):
        def body(carry, outs_i):
            e = mt_jax.mt19937_system_device(outs_i, bs, samples)
            rows = e.shape[0]
            want = -(-rows // 256) * 256
            if want != rows:
                e = jnp.concatenate(
                    [e, jnp.zeros((want - rows, e.shape[1]), jnp.uint32)],
                    axis=0,
                )
            origin32, inc = gauss_blocked.rref_origin_blocked(
                e, mt_jax.COLS, gauss_blocked.K_PANEL, phase2, phase1
            )
            return carry, origin32
        _, res = lax.scan(body, 0, outs_b)
        return res

    try:
        outs_b = jnp.stack([outs32] * nchain)
        res = solve_many(outs_b)
        _ = np.asarray(res[0, :1])  # warm + force
        # measure the dispatch+readback RTT with a no-op readback of an
        # already-materialized device array (machine-specific: the dev
        # tunnel here adds ~30 ms; a real host adds ~nothing)
        rtt = min(
            _timed(lambda: np.asarray(res[0, :1]))[0] for _ in range(3)
        )
        t0 = time.perf_counter()
        res = solve_many(outs_b)
        _ = np.asarray(res[0, :1])
        elapsed = time.perf_counter() - t0
        chain_raw_s = elapsed / nchain
        chain_s = max(elapsed - rtt, elapsed * 0.25) / nchain
        log(
            f"device-chained trace+solve: {chain_s:.3f}s/solve "
            f"({1 / chain_s:.2f} solves/s/chip; raw incl. one readback "
            f"RTT of {rtt * 1e3:.0f}ms: {chain_raw_s:.3f}s/solve)"
        )
    except Exception as e:  # keep the headline robust to regressions here
        chain_s = None
        log(f"device-chained measurement failed: {type(e).__name__}: {e}")

    # efficiency keys (VERDICT r4 #7): device seconds of the fused solve and
    # the phase-2 MXU utilization, so the driver record captures the
    # architecture-meaningful numbers, not just tunnel-afflicted wall.
    device_s = mxu_util = phase1_s = phase2_s = None
    try:
        small = jnp.zeros((8,), jnp.uint32)
        _ = np.asarray(small[:1])
        rtt = min(_timed(lambda: np.asarray(small[:1]))[0] for _ in range(5))
        device_s = max(solve_s - rtt, 0.0)

        def run_variant(p2v, trailing):
            r = gauss_blocked.rref_blocked(
                eqs, mt_jax.COLS, gauss_blocked.K_PANEL, p2v, phase1, trailing
            )[0]
            _ = np.asarray(r[0, :1])

        run_variant(phase2, True)  # warm/compile
        run_variant("skip", True)
        trail_s = min(
            _timed(lambda: run_variant(phase2, True))[0] for _ in range(3)
        )
        p1only_s = min(
            _timed(lambda: run_variant("skip", True))[0] for _ in range(3)
        )
        phase1_s = max(p1only_s - rtt, 0.0)
        phase2_s = max(trail_s - p1only_s, 1e-9)
        # int8 MXU MACs actually issued by the trailing/segmented update:
        # per panel t, rows x K x 32 bit-planes x live words, live words =
        # wp - 128 * (fully-dead tiles) + 1 const word once tile 0 is dead
        rows_, wp_ = eqs.shape
        K_ = gauss_blocked.K_PANEL
        kw_ = K_ // 32
        panels_ = min(wp_ // kw_, -(-(1 + mt_jax.COLS) // K_))
        tpp = 128 // kw_
        macs = 0
        for t in range(panels_):
            d = min(t // tpp, wp_ // 128 - 1)
            live = wp_ - 128 * d + (1 if d else 0)
            macs += rows_ * K_ * 32 * live
        peak_macs = 197.0e12  # v5e int8: 394 TOPS = 197e12 MAC/s
        mxu_util = (macs / peak_macs) / phase2_s
        log(
            f"device_s {device_s * 1e3:.1f} ms (rtt {rtt * 1e3:.1f} ms); "
            f"phase1 {phase1_s * 1e3:.1f} ms, phase2 {phase2_s * 1e3:.1f} ms"
            f" -> mxu_util {mxu_util * 100:.0f}% of v5e int8 peak"
        )
    except Exception as e:
        log(f"efficiency measurement failed: {type(e).__name__}: {e}")

    # public API through the generic lazy trace engine: the same workload
    # via LinearSystem.solve_one — the first call materializes + uploads the
    # device-cached coefficient matrix, warm calls ship only the ~2.5 KB
    # affine delta (ops/lazy_solve.py)
    from gf2bv_tpu import LinearSystem

    def api_zeros():
        lin = LinearSystem([32] * 624)
        words = lin.gens()
        sym = MT19937(list(words))
        return lin, [sym.getrandbits(bs) ^ o for o in out] + [
            words[0] ^ 0x80000000
        ]

    lin, zeros = api_zeros()
    t0 = time.perf_counter()
    sol_api = lin.solve_one(zeros)
    log(f"public-API solve_one (cache build incl. upload): "
        f"{time.perf_counter() - t0:.3f}s")
    assert sol_api == st
    api_s = min(_timed(lambda: lin.solve_one(zeros))[0] for _ in range(3))
    t0 = time.perf_counter()
    lin2, zeros2 = api_zeros()
    assert lin2.solve_one(zeros2) == st
    api_full_s = time.perf_counter() - t0
    log(f"public-API solve_one (warm): {api_s:.3f}s; full user path incl. "
        f"re-trace: {api_full_s:.3f}s")

    # captured-trace path: model recorded ONCE with Param slots; per
    # instance only the 624 observed words are bound — no Python re-trace
    # at all (core/capture.py).  This is the real "new outputs -> state"
    # user path; it shares the device coefficient cache with the direct
    # solves above (Params hash like literal constants).
    def mt_model(ws, p):
        sym = MT19937(list(ws))
        return [sym.getrandbits(bs) ^ p[i] for i in range(samples)] + [
            ws[0] ^ 0x80000000
        ]

    tmpl = lin.capture(mt_model)
    assert tmpl.solve_one(out) == st  # warm the path
    tmpl_s = min(_timed(lambda: tmpl.solve_one(out))[0] for _ in range(3))
    log(f"captured-trace solve_one (full per-instance path): {tmpl_s:.3f}s")

    # multi-RHS batch: B instances ride ONE elimination (ops/multi_rhs) —
    # the serving-throughput number for "new outputs -> state" at scale
    nb = 256
    batch, states = [], []
    for k in range(nb):
        r = random.Random(91_000 + k)
        states.append(tuple(r.getstate()[1][:-1]))
        batch.append([r.getrandbits(32) for _ in range(samples)])
    sols = tmpl.solve_one_batch(batch)  # warm (compile + caches)
    assert sols == states
    # e2e includes ~2 MB of host<->device traffic, which on THIS machine
    # rides a dev tunnel fluctuating 5-500 MB/s — the spread across repeats
    # is tunnel jitter, not solver variance, so log it explicitly
    e2e = sorted(
        _timed(lambda: tmpl.solve_one_batch(batch))[0] for _ in range(3)
    )
    batch_s = e2e[0]
    log(
        f"captured multi-RHS batch e2e: B={nb} best {batch_s:.3f}s of "
        f"{[round(t, 3) for t in e2e]} = {nb / batch_s:.0f} recoveries/s "
        f"(spread is dev-tunnel I/O jitter on ~2 MB)"
    )

    # device rate: same elimination+extraction with inputs already device
    # resident and only a tiny forced readback — the rate a production host
    # sees (PCIe moves the ~2 MB in sub-ms).  This is the stable, hardware-
    # meaningful multi-RHS number; e2e above is tunnel-bound on this box.
    from gf2bv_tpu.ops import lazy_solve, multi_rhs

    cs = lazy_solve.cached_system(lin, tmpl.zeros)
    exprs = [z._expr for z in tmpl.zeros]
    affs = tmpl._affine_matrix(exprs, cs.widths, batch)
    bw = multi_rhs._bw_for(nb)
    rhs_dev = jnp.asarray(
        multi_rhs._pack_rhs(affs[:, cs.kept], cs.a_dev.shape[0], bw)
    )
    _ = np.asarray(rhs_dev[:1, :1])  # force upload outside the timed region

    def dev_solve():
        _, _, origins, unsat = multi_rhs.solve_multi_rhs_device(
            cs.a_dev, mt_jax.COLS, rhs_dev, bw
        )
        _ = np.asarray(unsat[:1])  # forces the fused executable
        return origins

    origins = dev_solve()  # warm
    dev = sorted(_timed(dev_solve)[0] for _ in range(3))
    dev_s = dev[0]
    d2h_s, _ = _timed(lambda: jax.device_get(origins))
    log(
        f"multi-RHS device rate: B={nb} in {dev_s:.3f}s of "
        f"{[round(t, 3) for t in dev]} = {nb / dev_s:.0f} recoveries/s/chip "
        f"(origins D2H alone: {d2h_s:.3f}s through the tunnel)"
    )

    # guess sweep at the flagship shape: pin 12 state bits, solve all 4096
    # candidates in ONE elimination (round-5 capability; the reference
    # idiom re-factors per candidate).  The system is full-rank here, so
    # exactly the true assignment survives.
    sweep_s = None
    try:
        gw = lin.gens()
        sw_guesses = [gw[0][i] for i in range(12)]
        k_true = sum(((st[0] >> i) & 1) << i for i in range(12))
        sweep_sols = lin.solve_one_sweep(zeros, sw_guesses)  # warm
        assert sweep_sols[k_true] == st
        assert sum(x is not None for x in sweep_sols) == 1
        sweep_s = min(
            _timed(lambda: lin.solve_one_sweep(zeros, sw_guesses))[0]
            for _ in range(2)
        )
        log(f"flagship guess sweep: 4096 candidates in {sweep_s:.3f}s "
            f"({4096 / sweep_s:.0f} cand/s)")
    except Exception as e:
        log(f"sweep measurement failed: {type(e).__name__}: {e}")

    # correctness: reference-style round trip
    s = packing.words_to_int(raw)
    sol = []
    for _ in range(624):
        sol.append(s & 0xFFFFFFFF)
        s >>= 32
    assert tuple(sol) == st, "solution mismatch"
    rng2 = MT19937(list(sol))
    assert all(rng2.getrandbits(bs) == o for o in out)
    log("round-trip verified")

    return {
        "solve_s": solve_s,
        "trace_s": trace_s,
        "pipe_s": pipe_s,
        "chain_s": chain_s,
        "api_s": api_s,
        "api_full_s": api_full_s,
        "tmpl_s": tmpl_s,
        "batch_rate": nb / batch_s,
        "dev_rate": nb / dev_s,
        "sweep_s": sweep_s,
        "device_s": device_s,
        "phase1_s": phase1_s,
        "phase2_s": phase2_s,
        "mxu_util": mxu_util,
    }


def _wait_for_tpu(deadline_s: float) -> bool:
    """Probe the device platform in a SUBPROCESS until it answers or the
    deadline passes.  ``jax.devices()`` hangs indefinitely when the axon
    tunnel is down and cannot be interrupted in-process; probing out of
    process keeps this script from wedging the driver.  Returns True when a
    probe succeeds (the main process then claims the device itself)."""
    import subprocess

    t_end = time.monotonic() + deadline_s
    attempt = 0
    while True:
        attempt += 1
        budget = min(400.0, max(30.0, t_end - time.monotonic()))
        try:
            subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=budget, check=True,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
            return True
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            log(f"device probe {attempt} failed")
        if time.monotonic() >= t_end:
            return False
        time.sleep(min(60.0, max(1.0, t_end - time.monotonic())))


def _native_fallback_detail() -> dict:
    """The same headline workload on the host C engine — a real measured
    number for the record when the device transport is down."""
    try:
        import numpy as np

        from gf2bv_tpu import LinearSystem, _native
        from gf2bv_tpu.core import packing
        from gf2bv_tpu.crypto.mt import MT19937

        if not _native.available():
            return {"native_cpu": "unavailable (no gcc)"}
        rand = random.Random(3142)
        st = tuple(rand.getstate()[1][:-1])
        out = [rand.getrandbits(32) for _ in range(624)]
        lin = LinearSystem([32] * 624)
        words = lin.gens(lazy=False)
        sym = MT19937(list(words))
        zeros = [sym.getrandbits(32) ^ o for o in out] + [
            words[0] ^ 0x80000000
        ]
        eqs = lin.get_eqs_packed(zeros)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sol = _native.solve_native(eqs, 19968, 0)
            ts.append(time.perf_counter() - t0)
        v = packing.words_to_int(np.asarray(sol))
        ok = tuple((v >> (32 * i)) & 0xFFFFFFFF for i in range(624)) == st
        det = {
            "native_cpu_solve_one_s": round(min(ts), 3),
            "native_cpu_verified": bool(ok),
        }
        # the serving axis on the same engine: one elimination, B=256
        # appended RHS columns = 256 full state recoveries (the host twin
        # of the TPU multi-RHS path; rate is per core).  Real instances:
        # only the affine column varies across instances (lazy-engine
        # invariant), so instance k's column = matrix's own column with
        # instance 0's output bits swapped for instance k's.  Own try:
        # a failure here must not discard the solve_one numbers above.
        try:
            def outbits(o):
                a = np.zeros(eqs.shape[0], np.uint8)
                w = np.asarray(o, np.uint32)
                b = ((w[:, None] >> np.arange(32)[None, :]) & 1).astype(
                    np.uint8
                )
                a[: b.size] = b.reshape(-1)
                return a

            eqs_aff = (eqs[:, 0] & np.uint64(1)).astype(np.uint8)
            base = outbits(out)
            states, rhs_rows = [], []
            for k in range(256):
                r = random.Random(10_000 + k)
                states.append(tuple(r.getstate()[1][:-1]))
                o_k = [r.getrandbits(32) for _ in range(624)]
                rhs_rows.append(eqs_aff ^ base ^ outbits(o_k))
            rhs = np.stack(rhs_rows)
            dt = float("inf")  # best-of-2: this box has noisy neighbors
            for _ in range(2):
                t0 = time.perf_counter()
                res = _native.solve_multi_rhs_native(eqs, 19968, rhs, 0)
                dt = min(dt, time.perf_counter() - t0)
            ok_b = all(  # verify EVERY recovered state (costs ~ms)
                r is not None
                and tuple((r >> (32 * i)) & 0xFFFFFFFF for i in range(624))
                == s
                for r, s in zip(res, states)
            )
            det["native_cpu_multi_rhs_b256_per_s"] = round(256 / dt, 1)
            det["native_cpu_multi_rhs_verified"] = bool(ok_b)
        except Exception as e:
            det["native_cpu_multi_rhs"] = f"failed: {type(e).__name__}: {e}"
        return det
    except Exception as e:  # the fallback must never take down the record
        return {"native_cpu": f"failed: {type(e).__name__}: {e}"}


def main():
    wait_s = float(os.environ.get("GF2BV_BENCH_TPU_WAIT_S", "1500"))
    if not _wait_for_tpu(wait_s):
        # Emit a well-formed record rather than hanging: the device tunnel
        # is down.  Measure the same workload on the host C engine so the
        # record still carries a real number.
        detail = {"error": "tpu_unreachable", "probe_window_s": wait_s}
        detail.update(_native_fallback_detail())
        print(json.dumps({
            "metric": "mt19937_19968var_solve_one_wall_clock",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "detail": detail,
        }))
        return

    import jax

    log(f"devices: {jax.devices()}")
    r = bench_mt19937()
    solve_s, chain_s, sweep_s = r["solve_s"], r["chain_s"], r["sweep_s"]
    print(
        json.dumps(
            {
                "metric": "mt19937_19968var_solve_one_wall_clock",
                "value": round(solve_s, 4),
                "unit": "s",
                "vs_baseline": round(M4RI_BASELINE_EST_S / solve_s, 3),
                "detail": {
                    "trace_s": round(r["trace_s"], 4),
                    "public_api_solve_one_s": round(r["api_s"], 4),
                    "public_api_full_path_s": round(r["api_full_s"], 4),
                    "captured_trace_full_path_s": round(r["tmpl_s"], 4),
                    # device rate (inputs resident, forced readback): the
                    # stable hardware number — e2e on this box rides a
                    # 5-500 MB/s dev tunnel and swings ~40% run-to-run
                    "multi_rhs_recoveries_per_s_b256": round(
                        r["dev_rate"], 1
                    ),
                    # methodology changed in round 4: the key above now
                    # records the device rate; rounds <= 3 recorded e2e
                    # including tunnel I/O (kept below for comparison) —
                    # declared here so cross-round diffs aren't read as a
                    # solver speedup
                    "multi_rhs_recoveries_per_s_b256_semantics": (
                        "device rate since r4; r<=3 was e2e incl. tunnel I/O"
                    ),
                    "multi_rhs_e2e_tunnel_bound_per_s_b256": round(
                        r["batch_rate"], 1
                    ),
                    "pipelined_solves_per_s": round(1 / r["pipe_s"], 2),
                    "device_chained_solves_per_s": (
                        round(1 / chain_s, 2) if chain_s else None
                    ),
                    # efficiency keys (VERDICT r4 #7): device seconds of
                    # the fused solve + phase split + phase-2 MXU
                    # utilization by the whole-phase MAC model (BASELINE.md
                    # round-5 note: steady-state kernel ~85%; the gap is
                    # the per-row-tile pipeline floor)
                    "device_s": (
                        round(r["device_s"], 4)
                        if r["device_s"] is not None else None
                    ),
                    "phase1_s": (
                        round(r["phase1_s"], 4)
                        if r["phase1_s"] is not None else None
                    ),
                    "phase2_s": (
                        round(r["phase2_s"], 4)
                        if r["phase2_s"] is not None else None
                    ),
                    "mxu_util": (
                        round(r["mxu_util"], 3)
                        if r["mxu_util"] is not None else None
                    ),
                    # flagship guess sweep (round 5): 4096 candidates, one
                    # elimination
                    "sweep_candidates_per_s_flagship": (
                        round(4096 / sweep_s, 1) if sweep_s else None
                    ),
                    "baseline": "M4RI single-core estimate 2.0s (BASELINE.md; reference publishes no numbers)",
                    "native_baseline_s": NATIVE_ENGINE_MEASURED_S,
                    "vs_native_engine": round(
                        NATIVE_ENGINE_MEASURED_S / solve_s, 2
                    ),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
