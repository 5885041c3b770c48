"""Pallas kernel for the blocked solver's phase 1 (thin panel elimination).

Together with pallas_update.py this replaces the reference's native
factorization path (``/root/reference/gf2bv/_internal.c:309-502``: PLUQ +
kernel-basis reuse) with a TPU-shaped PLE.

The jnp phase 1 runs 2*K tiny dependent steps per panel through the XLA
fori_loop machinery — tens of µs of fixed per-step overhead dominate the
~1 µs of useful work, costing seconds over the 19969 pivots of an MT19937
solve.  This kernel runs the entire panel — K forward pivot steps, the
pivot-row reconstructions, and the K-step back-elimination — inside ONE
kernel invocation with everything VMEM-resident; only the per-pivot row
fetch DMAs from HBM.

Mosaic layout notes (the constraints that shaped this kernel):
* lane (minor-dim) indices must be static or 128-aligned, so the thin
  per-row state is stored TRANSPOSED — rows on lanes: bT/cT are (kw, rows),
  used is (1, rows).  Dynamic per-row reads become masked lane reductions;
  per-word reads become static sublane selects (kw is tiny).
* sums over unsigned ints are unsupported -> reductions go through int32.
* pf stays (K, wp) — dynamic SUBLANE indexing (pf[jj]) is allowed.

outputs: pf (K, wp) final pivot rows, prow (K,) int32 pivot row indices (-1
free), used' (1, rows).  Selector-matrix construction and pof bookkeeping
stay outside (cheap jnp on tiny arrays).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(rows: int, wp: int, K: int, kw: int, cols: int):
    def kernel(w0_ref, bT_in, used_in, a_hbm, pf_ref, prow_ref, used_ref,
               bT_ref, cT_ref, rowbuf, sem):
        w0 = w0_ref[0]
        lane_ids = lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        k_ids = lax.broadcasted_iota(jnp.int32, (K, 1), 0)

        bT_ref[:] = bT_in[:]
        used_ref[:] = used_in[:]
        cT_ref[:] = jnp.zeros((kw, rows), jnp.uint32)
        pf_ref[:] = jnp.zeros((K, wp), jnp.uint32)

        def lane_extract(mat, piv):
            """mat: (s, rows) -> (s, 1): the column at dynamic lane piv."""
            sel = jnp.where(lane_ids == piv, mat.astype(jnp.int32), 0)
            return jnp.sum(sel, axis=1, keepdims=True).astype(jnp.uint32)

        # The pivot loop is a static outer loop over the kw 32-bit sub-words
        # of the panel with a dynamic 32-step inner loop.  A static sub-word
        # index makes every slice static, which buys (per pivot step):
        # * the candidate column word is ONE static row of bT, not a kw-way
        #   dynamic select over the whole (kw, rows) slice;
        # * the intra-slice elimination only touches bT[sw:] — words < sw
        #   are never scanned again within this panel (triangular update);
        # * the coefficient write hits the single static word sw;
        # * coefficient reads and the pivot-row combination only cover the
        #   32*(sw+1) pivots seen so far.
        for sw in range(kw):
            rows_used = 32 * (sw + 1)  # pivots 0 .. rows_used-1 exist so far
            k_ids_u = k_ids[:rows_used]

            def p1_step(jj32, _, sw=sw, rows_used=rows_used, k_ids_u=k_ids_u):
                jj = 32 * sw + jj32
                gbit = 32 * w0 + jj
                valid = (gbit >= 1) & (gbit <= cols)
                shift = jj32.astype(jnp.uint32)
                colb = (bT_ref[sw : sw + 1, :] >> shift) & 1
                cand = (colb == 1) & (used_ref[:] == 0) & valid
                piv = jnp.min(jnp.where(cand, lane_ids, rows))
                has = piv < rows
                piv_safe = jnp.where(has, piv, 0)

                # fetch the pivot's full (panel-start) row from HBM; HBM
                # slices must be sublane-tiling (8) aligned, so copy the
                # aligned 8-row block and select the row with a masked
                # reduction
                base = pl.multiple_of((piv_safe >> 3) << 3, 8)
                dma = pltpu.make_async_copy(
                    a_hbm.at[pl.ds(base, 8), :], rowbuf, sem
                )
                dma.start()

                # XOR-combination of the earlier forward pivot rows selected
                # by C[piv]; only coefficient words 0..sw / pf rows
                # 0..rows_used-1 can be populated yet
                crow = lane_extract(cT_ref[: sw + 1, :], piv_safe)  # (sw+1, 1)
                word_k = k_ids_u >> 5
                shift_k = (k_ids_u & 31).astype(jnp.uint32)
                wsel = jnp.zeros((rows_used, 1), jnp.uint32)
                for t in range(sw + 1):
                    wsel = jnp.where(word_k == t, crow[t, 0], wsel)
                bits_k = (wsel >> shift_k) & 1
                mask_k = (jnp.uint32(0) - bits_k).astype(jnp.uint32)
                # balanced XOR-reduce per 32-row block (rows_used = 32*(sw+1)
                # is not always a power of two)
                x = None
                for t in range(sw + 1):
                    xb = pf_ref[32 * t : 32 * (t + 1)] & mask_k[32 * t : 32 * (t + 1)]
                    n = 32
                    while n > 1:
                        half = n // 2
                        xb = xb[:half] ^ xb[half:n]
                        n = half
                    x = xb if x is None else x ^ xb
                dma.wait()
                sub_ids = lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                arow = jnp.sum(
                    jnp.where(
                        sub_ids == (piv_safe & 7), rowbuf[:].astype(jnp.int32), 0
                    ),
                    axis=0,
                    keepdims=True,
                ).astype(jnp.uint32)
                full = arow ^ x  # (1, wp)
                mask_has = jnp.where(has, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))
                pf_ref[pl.ds(jj, 1), :] = full & mask_has
                prow_ref[jj] = jnp.where(has, piv, -1)

                # eliminate remaining candidates within the slice; record
                # coeffs — triangular: only words >= sw are still live
                bpiv = lane_extract(bT_ref[sw:, :], piv_safe)  # (kw-sw, 1)
                elim = cand & (lane_ids != piv)  # (1, rows)
                elim_mask = jnp.where(
                    elim, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                )
                bT_ref[sw:, :] = bT_ref[sw:, :] ^ (elim_mask & bpiv)
                cT_ref[sw : sw + 1, :] = cT_ref[sw : sw + 1, :] ^ (
                    elim_mask & (jnp.uint32(1) << shift)
                )
                used_ref[:] = jnp.where(
                    (lane_ids == piv) & has, jnp.int32(1), used_ref[:]
                )
                return 0

            lax.fori_loop(0, 32, p1_step, 0)

        # back-eliminate the pivot rows among themselves (descending).
        # Triangular: a forward row r was eliminated against pivots 0..r-1,
        # so it has zeros in pivot columns < r — only rows ABOVE jj can have
        # bit jj set.  Static descending sub-words keep the slice static.
        for sw in reversed(range(kw)):
            rows_used = 32 * (sw + 1)
            k_ids_u = k_ids[:rows_used]
            win_lanes = lax.broadcasted_iota(jnp.int32, (rows_used, 128), 1)

            def p1b_step(s, _, sw=sw, rows_used=rows_used, k_ids_u=k_ids_u,
                         win_lanes=win_lanes):
                jj32 = 31 - s
                jj = 32 * sw + jj32
                pivoted = prow_ref[jj] >= 0
                wcol = w0 + sw
                base = pl.multiple_of((wcol >> 7) << 7, 128)  # 128-lane window
                lane = wcol - base
                win = pf_ref[:rows_used, pl.ds(base, 128)]
                colw = jnp.sum(
                    jnp.where(win_lanes == lane, win.astype(jnp.int32), 0),
                    axis=1,
                    keepdims=True,
                ).astype(jnp.uint32)
                colb = (colw >> jj32.astype(jnp.uint32)) & 1  # (rows_used, 1)
                elim = (colb == 1) & (k_ids_u != jj) & pivoted
                elim_mask = jnp.where(
                    elim, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                )
                pfrow = pf_ref[pl.ds(jj, 1), :]  # (1, wp)
                pf_ref[:rows_used] = pf_ref[:rows_used] ^ (elim_mask & pfrow)
                return 0

            lax.fori_loop(0, 32, p1b_step, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def phase1_panel(a, bT, used, w0, K: int, cols: int, interpret: bool = False):
    """Run phase 1 for one panel.

    a: (rows, wp) u32 (stays in HBM); bT: (kw, rows) u32 transposed panel
    slice; used: (1, rows) int32; w0: () int32 panel word offset.
    Returns (pf (K, wp) u32, prow (K,) i32, used' (1, rows) i32).
    """
    rows, wp = a.shape
    kw = K // 32
    assert wp % 128 == 0, "wp must be lane-aligned for the back pass"
    kernel = _make_kernel(rows, wp, K, kw, cols)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((K, wp), jnp.uint32),
            jax.ShapeDtypeStruct((K,), jnp.int32),
            jax.ShapeDtypeStruct((1, rows), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((kw, rows), jnp.uint32),  # bT (working slice)
            pltpu.VMEM((kw, rows), jnp.uint32),  # cT (coefficients)
            pltpu.VMEM((8, wp), jnp.uint32),  # rowbuf (aligned 8-row DMA)
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(jnp.asarray(w0, jnp.int32).reshape(1), bT, used, a)


# ---------------------------------------------------------------------------
# Split phase 1 (the "pallas_scan" engine): the forward scan only needs the
# thin slice, so run it as a pure-VPU kernel with NO per-pivot HBM DMA and
# no (K, wp)-wide work; then gather the K pivot rows and their coefficient
# words with ONE XLA gather each; then reconstruct the full-width pivot rows
# in a second kernel whose coefficients live in SMEM (scalar reads instead
# of masked lane reductions).  Removes the two per-pivot latency lumps of
# the fused kernel above (DMA wait + coefficient lane-extract).
# ---------------------------------------------------------------------------


def _make_scan_kernel(rows: int, K: int, kw: int, cols: int):
    def kernel(w0_ref, bT_in, used_in, prow_ref, used_ref, cT_ref, bT_ref):
        w0 = w0_ref[0]
        lane_ids = lax.broadcasted_iota(jnp.int32, (1, rows), 1)

        bT_ref[:] = bT_in[:]
        used_ref[:] = used_in[:]
        cT_ref[:] = jnp.zeros((kw, rows), jnp.uint32)

        def lane_extract(mat, piv):
            sel = jnp.where(lane_ids == piv, mat.astype(jnp.int32), 0)
            return jnp.sum(sel, axis=1, keepdims=True).astype(jnp.uint32)

        for sw in range(kw):
            def p1_step(jj32, _, sw=sw):
                jj = 32 * sw + jj32
                gbit = 32 * w0 + jj
                valid = (gbit >= 1) & (gbit <= cols)
                shift = jj32.astype(jnp.uint32)
                colb = (bT_ref[sw : sw + 1, :] >> shift) & 1
                cand = (colb == 1) & (used_ref[:] == 0) & valid
                piv = jnp.min(jnp.where(cand, lane_ids, rows))
                has = piv < rows
                piv_safe = jnp.where(has, piv, 0)
                prow_ref[jj] = jnp.where(has, piv, -1)

                bpiv = lane_extract(bT_ref[sw:, :], piv_safe)  # (kw-sw, 1)
                elim = cand & (lane_ids != piv)
                elim_mask = jnp.where(
                    elim, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                )
                bT_ref[sw:, :] = bT_ref[sw:, :] ^ (elim_mask & bpiv)
                cT_ref[sw : sw + 1, :] = cT_ref[sw : sw + 1, :] ^ (
                    elim_mask & (jnp.uint32(1) << shift)
                )
                used_ref[:] = jnp.where(
                    (lane_ids == piv) & has, jnp.int32(1), used_ref[:]
                )
                return 0

            lax.fori_loop(0, 32, p1_step, 0)

    return kernel


def _make_reconstruct_kernel(wp: int, K: int, kw: int):
    def kernel(w0_ref, prow_ref, coeff_ref, arows_in, pf_ref):
        w0 = w0_ref[0]
        k_ids = lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        pf_ref[:] = jnp.zeros((K, wp), jnp.uint32)

        # forward reconstruction: full[jj] = a[piv_jj] ^ combo(full[:jj])
        for sw in range(kw):
            rows_used = 32 * (sw + 1)
            k_ids_u = k_ids[:rows_used]

            def fwd_step(jj32, _, sw=sw, rows_used=rows_used, k_ids_u=k_ids_u):
                jj = 32 * sw + jj32
                has = prow_ref[jj] >= 0
                word_k = k_ids_u >> 5
                shift_k = (k_ids_u & 31).astype(jnp.uint32)
                wsel = jnp.zeros((rows_used, 1), jnp.uint32)
                for t in range(sw + 1):
                    wsel = jnp.where(word_k == t, coeff_ref[jj, t], wsel)
                bits_k = (wsel >> shift_k) & 1
                mask_k = (jnp.uint32(0) - bits_k).astype(jnp.uint32)
                x = None
                for t in range(sw + 1):
                    xb = pf_ref[32 * t : 32 * (t + 1)] & mask_k[
                        32 * t : 32 * (t + 1)
                    ]
                    n = 32
                    while n > 1:
                        half = n // 2
                        xb = xb[:half] ^ xb[half:n]
                        n = half
                    x = xb if x is None else x ^ xb
                full = arows_in[pl.ds(jj, 1), :] ^ x
                mask_has = jnp.where(
                    has, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                )
                pf_ref[pl.ds(jj, 1), :] = full & mask_has
                return 0

            lax.fori_loop(0, 32, fwd_step, 0)

        # back-eliminate (triangular, as in _make_kernel)
        for sw in reversed(range(kw)):
            rows_used = 32 * (sw + 1)
            k_ids_u = k_ids[:rows_used]
            win_lanes = lax.broadcasted_iota(jnp.int32, (rows_used, 128), 1)

            def p1b_step(s, _, sw=sw, rows_used=rows_used, k_ids_u=k_ids_u,
                         win_lanes=win_lanes):
                jj32 = 31 - s
                jj = 32 * sw + jj32
                pivoted = prow_ref[jj] >= 0
                wcol = w0 + sw
                base = pl.multiple_of((wcol >> 7) << 7, 128)
                lane = wcol - base
                win = pf_ref[:rows_used, pl.ds(base, 128)]
                colw = jnp.sum(
                    jnp.where(win_lanes == lane, win.astype(jnp.int32), 0),
                    axis=1,
                    keepdims=True,
                ).astype(jnp.uint32)
                colb = (colw >> jj32.astype(jnp.uint32)) & 1
                elim = (colb == 1) & (k_ids_u != jj) & pivoted
                elim_mask = jnp.where(
                    elim, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                )
                pfrow = pf_ref[pl.ds(jj, 1), :]
                pf_ref[:rows_used] = pf_ref[:rows_used] ^ (elim_mask & pfrow)
                return 0

            lax.fori_loop(0, 32, p1b_step, 0)

    return kernel


def _make_scan_kernel2(rows: int, K: int, kw: int, cols: int):
    """Forward scan, TWO pivots per sequential step.

    The scan is per-step-latency-bound (~1 us of fixed overhead per
    dependent step; narrowing the lanes measurably changes nothing — see
    SUBSET_ROWS).  Processing pivot columns jj and jj+1 in one step halves
    the sequential step count and fuses the two panel-slice updates into
    one pass: the second column's candidates are computed against the
    FIRST pivot's elimination virtually (one scalar bit of the first pivot
    row), and the second pivot row is corrected by the first before use.
    Coefficient semantics are identical to the 1-pivot kernel (each c bit
    is relative to the forward pivot row at its time), so the shared
    reconstruct kernel applies unchanged.
    """

    def kernel(w0_ref, bT_in, used_in, prow_ref, used_ref, cT_ref, bT_ref):
        w0 = w0_ref[0]
        lane_ids = lax.broadcasted_iota(jnp.int32, (1, rows), 1)

        bT_ref[:] = bT_in[:]
        used_ref[:] = used_in[:]
        cT_ref[:] = jnp.zeros((kw, rows), jnp.uint32)

        def lane_extract(mat, piv):
            sel = jnp.where(lane_ids == piv, mat.astype(jnp.int32), 0)
            return jnp.sum(sel, axis=1, keepdims=True).astype(jnp.uint32)

        for sw in range(kw):
            def p1_step2(s2, _, sw=sw):
                jj0 = 32 * sw + 2 * s2
                gbit0 = 32 * w0 + jj0
                shift0 = (2 * s2).astype(jnp.uint32)
                shift1 = shift0 + 1

                cur = bT_ref[sw : sw + 1, :]
                valid0 = (gbit0 >= 1) & (gbit0 <= cols)
                col0 = (cur >> shift0) & 1
                cand0 = (col0 == 1) & (used_ref[:] == 0) & valid0
                piv0 = jnp.min(jnp.where(cand0, lane_ids, rows))
                has0 = piv0 < rows
                p0 = jnp.where(has0, piv0, 0)
                prow_ref[jj0] = jnp.where(has0, piv0, -1)
                bpiv0 = lane_extract(bT_ref[sw:, :], p0)  # (kw-sw, 1)
                elim0 = cand0 & (lane_ids != piv0)
                em0 = jnp.where(elim0, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))

                # second column, with pivot 0's elimination applied
                # virtually: only its bit jj0+1 matters here
                valid1 = (gbit0 + 1 >= 1) & (gbit0 + 1 <= cols)
                p0b1 = (bpiv0[0:1, :] >> shift1) & 1  # (1, 1)
                col1 = ((cur >> shift1) & 1) ^ jnp.where(elim0, p0b1, 0)
                cand1 = (
                    (col1 == 1)
                    & (used_ref[:] == 0)
                    & valid1
                    & ~((lane_ids == piv0) & has0)
                )
                piv1 = jnp.min(jnp.where(cand1, lane_ids, rows))
                has1 = piv1 < rows
                p1 = jnp.where(has1, piv1, 0)
                prow_ref[jj0 + 1] = jnp.where(has1, piv1, -1)
                bpiv1_raw = lane_extract(bT_ref[sw:, :], p1)
                e0_at_p1 = lane_extract(em0, p1)  # (1, 1): 0 or all-ones
                bpiv1 = bpiv1_raw ^ (e0_at_p1 & bpiv0)
                elim1 = cand1 & (lane_ids != piv1)
                em1 = jnp.where(elim1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0))

                # one fused rank-2 update of the live slice + coefficients
                bT_ref[sw:, :] = bT_ref[sw:, :] ^ (em0 & bpiv0) ^ (em1 & bpiv1)
                cT_ref[sw : sw + 1, :] = (
                    cT_ref[sw : sw + 1, :]
                    ^ (em0 & (jnp.uint32(1) << shift0))
                    ^ (em1 & (jnp.uint32(1) << shift1))
                )
                used_ref[:] = jnp.where(
                    ((lane_ids == piv0) & has0) | ((lane_ids == piv1) & has1),
                    jnp.int32(1),
                    used_ref[:],
                )
                return 0

            lax.fori_loop(0, 16, p1_step2, 0)

    return kernel


def _make_scan_kernel_minkey(rows: int, K: int, kw: int, cols: int):
    """Forward scan with the election and the pivot-row extraction FUSED
    into one reduction level.

    The 1-pivot scan's per-step critical path is two dependent tree
    reductions: min-index election, then a masked-sum lane extract of the
    winner's slice words (~0.5 us each, x 20480 pivots ~= 20 ms at MT
    shape).  Here every live slice word forms packed int32 keys
    ``lane_id << 16 | payload_half``; the lane id occupies the high bits,
    so the per-word minima all land on the SAME (minimum candidate) lane
    and carry that lane's payload halves — election AND extraction come out
    of independent min-reductions that issue together, halving the
    sequential depth.  Pivot choice (minimum row index) is identical to the
    1-pivot kernel, so results are bit-exact.
    """

    # lane ids occupy int32 bits 16..30; the no-candidate sentinel is
    # rows << 16, so the padded row count must fit in 15 bits
    assert rows < (1 << 15), (
        f"pallas_scanm packs lane ids into int32 bits 16+; rows={rows} "
        ">= 32768 would overflow the min-keys — use the default "
        "pallas_scan engine for systems this tall"
    )

    def kernel(w0_ref, bT_in, used_in, prow_ref, used_ref, cT_ref, bT_ref):
        w0 = w0_ref[0]
        lane_ids = lax.broadcasted_iota(jnp.int32, (1, rows), 1)
        big = jnp.int32(rows << 16)

        bT_ref[:] = bT_in[:]
        used_ref[:] = used_in[:]
        cT_ref[:] = jnp.zeros((kw, rows), jnp.uint32)

        for sw in range(kw):
            def p1_step(jj32, _, sw=sw):
                jj = 32 * sw + jj32
                gbit = 32 * w0 + jj
                valid = (gbit >= 1) & (gbit <= cols)
                shift = jj32.astype(jnp.uint32)
                colb = (bT_ref[sw : sw + 1, :] >> shift) & 1
                cand = (colb == 1) & (used_ref[:] == 0) & valid

                live = bT_ref[sw:, :]  # (kw-sw, rows)
                lane_keys = lane_ids << 16  # (1, rows)
                key_lo = jnp.where(
                    cand,
                    lane_keys | (live & jnp.uint32(0xFFFF)).astype(jnp.int32),
                    big,
                )
                key_hi = jnp.where(
                    cand,
                    lane_keys | (live >> jnp.uint32(16)).astype(jnp.int32),
                    big,
                )
                min_lo = jnp.min(key_lo, axis=1, keepdims=True)  # (kw-sw, 1)
                min_hi = jnp.min(key_hi, axis=1, keepdims=True)
                piv = min_lo[0, 0] >> 16  # min candidate lane (or >= rows)
                has = piv < rows
                prow_ref[jj] = jnp.where(has, piv, -1)

                bpiv = (
                    ((min_hi & 0xFFFF) << 16) | (min_lo & 0xFFFF)
                ).astype(jnp.uint32)  # (kw-sw, 1): the winner's slice words
                elim = cand & (lane_ids != piv)
                elim_mask = jnp.where(
                    elim, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                )
                bT_ref[sw:, :] = bT_ref[sw:, :] ^ (elim_mask & bpiv)
                cT_ref[sw : sw + 1, :] = cT_ref[sw : sw + 1, :] ^ (
                    elim_mask & (jnp.uint32(1) << shift)
                )
                used_ref[:] = jnp.where(
                    (lane_ids == piv) & has, jnp.int32(1), used_ref[:]
                )
                return 0

            lax.fori_loop(0, 32, p1_step, 0)

    return kernel


# subset-scan working-set size: K pivots leave >= 512 live candidates at
# panel end, making a missed pivot (-> fallback pass) vanishingly rare for
# unstructured systems; lane-aligned (multiple of 128)
SUBSET_ROWS = 768


def _call_scan_kernel(bT, used, w0_arr, K: int, cols: int, interpret: bool,
                      variant: str = ""):
    """One scan-kernel invocation (shared by the full and subset engines).
    variant: "" (1-pivot), "2" (two pivots/step), "m" (fused min-key)."""
    kw, s_rows = bT.shape
    if variant == "m" and s_rows >= (1 << 15):
        # the min-key packing needs the lane id in 15 bits; fall back to
        # the default scan for taller systems instead of failing the trace
        variant = ""
    make = {
        "": _make_scan_kernel,
        "2": _make_scan_kernel2,
        "m": _make_scan_kernel_minkey,
    }[variant]
    return pl.pallas_call(
        make(s_rows, K, kw, cols),
        out_shape=(
            jax.ShapeDtypeStruct((K,), jnp.int32),
            jax.ShapeDtypeStruct((1, s_rows), jnp.int32),
            jax.ShapeDtypeStruct((kw, s_rows), jnp.uint32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((kw, s_rows), jnp.uint32)],
        interpret=interpret,
    )(w0_arr, bT, used)


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def phase1_scan_subset(bT, used, w0, K: int, cols: int,
                       interpret: bool = False):
    """Forward scan only: bT (kw, S) slice, used (1, S).  Returns
    (prow (K,) local row indices, cT (kw, S) coefficient words)."""
    kw, s_rows = bT.shape
    assert K == 32 * kw
    w0_arr = jnp.asarray(w0, jnp.int32).reshape(1)
    prow, used_o, cT = _call_scan_kernel(bT, used, w0_arr, K, cols, interpret)
    del used_o
    return prow, cT


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def phase1_reconstruct(arows, coeff, prow, w0, K: int, cols: int,
                       interpret: bool = False):
    """Full-width pivot-row reconstruction + triangular back pass.
    arows (K, wp) gathered pivot rows; coeff (K, kw); prow (K,)."""
    del cols
    _, wp = arows.shape
    kw = K // 32
    assert wp % 128 == 0
    w0_arr = jnp.asarray(w0, jnp.int32).reshape(1)
    return pl.pallas_call(
        _make_reconstruct_kernel(wp, K, kw),
        out_shape=jax.ShapeDtypeStruct((K, wp), jnp.uint32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(w0_arr, prow, coeff, arows)


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def phase1_panel_split(a, bT, used, w0, K: int, cols: int,
                       interpret: bool = False, variant: str = ""):
    """Split-phase-1 drop-in for phase1_panel (same contract).

    a: (rows, wp) u32; bT: (kw, rows); used: (1, rows) i32; w0 scalar word
    offset.  Returns (pf (K, wp), prow (K,), used' (1, rows))."""
    rows, wp = a.shape
    kw = K // 32
    assert wp % 128 == 0
    w0_arr = jnp.asarray(w0, jnp.int32).reshape(1)
    prow, used_o, cT = _call_scan_kernel(
        bT, used, w0_arr, K, cols, interpret, variant
    )

    # one batched gather each for the pivot rows and their coefficients
    prow_safe = jnp.maximum(prow, 0)
    arows = a[prow_safe]  # (K, wp)
    coeff = cT[:, prow_safe].T  # (K, kw)
    pf = phase1_reconstruct(arows, coeff, prow, w0, K, cols, interpret)
    return pf, prow, used_o
