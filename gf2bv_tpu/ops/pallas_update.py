"""Pallas TPU kernel for the blocked solver's rank-K panel update.

The TPU replacement for libm4ri's elimination engine (the reference links
it for its PLUQ, ``/root/reference/setup.py:55-73``); here the bulk of the
elimination is a rank-K GF(2) update driven as MXU matmuls.

Computes ``a[i] ^= XOR_{jj: sel[i] bit jj} pf[jj]`` — the phase-2 bulk of
gauss_blocked.py — with the A tile, selector tile and the whole PF panel
resident in VMEM, so the matrix is streamed from HBM exactly once per panel
(read + write).  The jnp fallback streams it kw times (one xor-reduce per
selector word); on CPU/interpret the fallback is used instead.

Layout: a (rows, Wp) uint32, sel (rows, K/32) uint32, pf (K, Wp) uint32.
Grid: (rows/TR, Wp/TW); every kernel instance owns a (TR, TW) output tile.
The inner loop over the K selector bits is a static unroll of VPU
mask-and-XOR ops on VMEM-resident tiles.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TR = 256  # row tile
TW = 512  # word tile (lanes; multiple of 128)


def _panel_update_kernel(sel_ref, pf_ref, a_ref, out_ref):
    acc = a_ref[:]
    sel = sel_ref[:]
    kw = sel.shape[1]
    for w in range(kw):
        sw = sel[:, w]
        for b in range(32):
            bit = (sw >> jnp.uint32(b)) & jnp.uint32(1)
            mask = (jnp.uint32(0) - bit).astype(jnp.uint32)
            acc = acc ^ (mask[:, None] & pf_ref[w * 32 + b, :][None, :])
    out_ref[:] = acc


def _rank_k_body(selbits_ref, pfbits_ref, a_ref, out_ref):
    """Shared MXU update body: 32 bit-plane matmuls, parity, repack, XOR.

    selbits: (TR, K) int8 0/1; pfbits: (32, K, TW) int8 — bit-plane-major
    unpacked pivot rows; int8 x int8 -> int32 accumulation is exact and runs
    at 2x the MXU's bf16 rate on v5; parity repacks straight into uint32
    words, no in-kernel reshape (Mosaic-unsupported).
    """
    packed = jnp.zeros_like(a_ref[:], dtype=jnp.int32)
    for b in range(32):
        counts = jnp.dot(
            selbits_ref[:], pfbits_ref[b], preferred_element_type=jnp.int32
        )
        packed = packed | ((counts & 1) << b)
    out_ref[:] = a_ref[:] ^ packed.astype(jnp.uint32)


def _mxu_kernel(selbits_ref, pfbits_ref, a_ref, out_ref):
    """GF(2) rank-K update as 32 bit-plane matmuls on the MXU."""
    _rank_k_body(selbits_ref, pfbits_ref, a_ref, out_ref)


def _rank_k_body2(selbits_ref, pfbits2_ref, a_ref, out_ref):
    """Fused-plane MXU body: the 32 bit planes are laid out along the lane
    axis (pfbits2: (K, 32*TW) int8, plane-major within the word tile), so
    the whole tile is ONE (TR, K) x (K, 32*TW) matmul — the MXU streams
    uninterrupted instead of ping-ponging with the VPU between 32 small
    matmuls — followed by a single parity/repack pass of static slices."""
    counts = jnp.dot(
        selbits_ref[:], pfbits2_ref[:], preferred_element_type=jnp.int32
    )  # (TR, 32*TW)
    tw = out_ref.shape[1]
    packed = jnp.zeros_like(a_ref[:], dtype=jnp.int32)
    for b in range(32):
        packed = packed | ((counts[:, b * tw : (b + 1) * tw] & 1) << b)
    out_ref[:] = a_ref[:] ^ packed.astype(jnp.uint32)


def _mxu2_kernel(selbits_ref, pfbits2_ref, a_ref, out_ref):
    _rank_k_body2(selbits_ref, pfbits2_ref, a_ref, out_ref)


def _pack_weight_matrix(tw: int) -> np.ndarray:
    """Block-diagonal byte-pack weights: W[b*tw + w, w] = 2^b (b = 7 stored
    as int8 -128; the int32 accumulator's two's-complement low byte is still
    0x80<<0, and bytes are masked before assembly)."""
    w = np.zeros((8 * tw, tw), np.int8)
    ar = np.arange(tw)
    for b in range(8):
        w[b * tw + ar, ar] = (1 << b) if b < 7 else -128
    return w


def _rank_k_body4(selbits_ref, pfbits2_ref, packw_ref, a_ref, out_ref):
    """MXU-packed body: one fused-plane matmul for the parities, then the
    32-plane -> uint32 repack ALSO on the MXU.

    The round-3 accounting showed the 32-step VPU shift/or repack of
    _rank_k_body costs as much as the matmul itself (~2 us vs ~1.4 us per
    tile).  Here the packing is 4 block-diagonal byte matmuls
    ((TR, 8*TW) 0/1 int8 x (8*TW, TW) power-of-two weights -> byte values),
    +0.5x MXU work in exchange for retiring almost all VPU work.
    """
    counts = jnp.dot(
        selbits_ref[:], pfbits2_ref[:], preferred_element_type=jnp.int32
    )  # (TR, 32*TW), plane-major
    tw = out_ref.shape[1]
    byte_vals = []
    for g in range(4):
        cg = (counts[:, g * 8 * tw : (g + 1) * 8 * tw] & 1).astype(jnp.int8)
        bg = jnp.dot(cg, packw_ref[:], preferred_element_type=jnp.int32)
        byte_vals.append(bg & 0xFF)
    packed = (
        byte_vals[0]
        | (byte_vals[1] << 8)
        | (byte_vals[2] << 16)
        | (byte_vals[3] << 24)
    )
    out_ref[:] = a_ref[:] ^ packed.astype(jnp.uint32)


def _mxu4_kernel(selbits_ref, pfbits2_ref, packw_ref, a_ref, out_ref):
    _rank_k_body4(selbits_ref, pfbits2_ref, packw_ref, a_ref, out_ref)


def _mxu4_kernel_trailing(
    w0_ref, pfconst_ref, selbits_ref, pfbits2_ref, packw_ref, a_ref, out_ref
):
    j = pl.program_id(0)
    tw = out_ref.shape[1]
    w0 = w0_ref[0]
    skip = (j > 0) & ((j + 1) * tw <= w0)
    const_only = (j == 0) & (tw <= w0)

    @pl.when(skip)
    def _copy():
        out_ref[:] = a_ref[:]

    @pl.when(const_only)
    def _const():
        _const_word_update(selbits_ref, pfconst_ref, a_ref, out_ref)

    @pl.when(~skip & ~const_only)
    def _compute():
        _rank_k_body4(selbits_ref, pfbits2_ref, packw_ref, a_ref, out_ref)


def panel_update_mxu4(a, sel, pf, *, interpret: bool = False, w0=None):
    """MXU-packed variant (see _rank_k_body4); same contract as
    panel_update_mxu."""
    rows, wp = a.shape
    k = pf.shape[0]
    tw = 128 if wp % 128 == 0 else wp
    tr = min(TR, rows)
    grid = (wp // tw, rows // tr)
    selbits = unpack_sel_bits(sel)
    pfbits2 = unpack_pf_planes2(pf, tw)
    packw = jnp.asarray(_pack_weight_matrix(tw))
    data_specs = [
        pl.BlockSpec((tr, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (k, 32 * tw), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(
            (8 * tw, tw), lambda j, i: (0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * rows * k * wp * 32 + 2 * rows * wp * 8 * 32,
        bytes_accessed=2 * rows * wp * 4 + rows * k + 32 * k * wp,
        transcendentals=0,
    )
    if w0 is None:
        return pl.pallas_call(
            _mxu4_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
            grid_spec=pl.GridSpec(grid=grid, in_specs=data_specs, out_specs=out_spec),
            cost_estimate=cost,
            interpret=interpret,
        )(selbits, pfbits2, packw, a)
    w0_arr = jnp.asarray(w0, jnp.int32).reshape(1)
    pfconst = _pfconst_planes(pf)
    return pl.pallas_call(
        _mxu4_kernel_trailing,
        out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (k, 32), lambda j, i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + data_specs,
            out_specs=out_spec,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(w0_arr, pfconst, selbits, pfbits2, packw, a)


def _mxu2_kernel_trailing(w0_ref, selbits_ref, pfbits2_ref, a_ref, out_ref):
    j = pl.program_id(0)
    tw = out_ref.shape[1]
    skip = (j > 0) & ((j + 1) * tw <= w0_ref[0])

    @pl.when(skip)
    def _copy():
        out_ref[:] = a_ref[:]

    @pl.when(~skip)
    def _compute():
        _rank_k_body2(selbits_ref, pfbits2_ref, a_ref, out_ref)


def unpack_pf_planes2(pf, tw: int):
    """(K, wp) u32 -> (K, wp*32) int8 with columns grouped per word tile as
    [plane b major, word minor]: column j*(32*tw) + b*tw + w_local."""
    k, wp = pf.shape
    nj = wp // tw
    planes = ((pf[None, :, :] >> _SHIFTS32[:, None, None]) & 1).astype(jnp.int8)
    # (32, K, wp) -> (32, K, nj, tw) -> (K, nj, 32, tw) -> (K, nj*32*tw)
    return (
        planes.reshape(32, k, nj, tw)
        .transpose(1, 2, 0, 3)
        .reshape(k, nj * 32 * tw)
    )


# numpy constant: safe to close over inside traced functions (a cached jnp
# array would leak a tracer across jit scopes)
_SHIFTS32 = np.arange(32, dtype=np.uint32)


def unpack_sel_bits(sel):
    """(rows, kw) u32 -> (rows, K) int8 0/1."""
    rows, kw = sel.shape
    s = _SHIFTS32
    return (
        ((sel[:, :, None] >> s[None, None, :]) & 1)
        .reshape(rows, kw * 32)
        .astype(jnp.int8)
    )


def unpack_pf_planes(pf):
    """(K, wp) u32 -> (32, K, wp) int8: bit-plane-major unpacked rows."""
    s = _SHIFTS32
    return ((pf[None, :, :] >> s[:, None, None]) & 1).astype(jnp.int8)


def _mxu_kernel_trailing(
    w0_ref, pfconst_ref, selbits_ref, pfbits_ref, a_ref, out_ref
):
    """Trailing variant: word-tiles entirely left of the panel start w0
    copy through untouched — in a mode-0 solve those columns are never read
    again, so their MXU work is skipped.  Tile 0 carries the affine/const
    column (word 0): once the panel has moved past it, only that ONE word
    is updated — a (TR, K) x (K, 32) matmul against the const word's bit
    planes (``pfconst``) instead of the full 32x(K x TW) tile body.  The
    round-3 accounting showed this tile-0 quantization was ~half of the
    trailing mode's residual waste.  See gauss_blocked.rref_blocked.
    """
    j = pl.program_id(0)
    tw = out_ref.shape[1]
    w0 = w0_ref[0]
    skip = (j > 0) & ((j + 1) * tw <= w0)
    const_only = (j == 0) & (tw <= w0)

    @pl.when(skip)
    def _copy():
        out_ref[:] = a_ref[:]

    @pl.when(const_only)
    def _const():
        _const_word_update(selbits_ref, pfconst_ref, a_ref, out_ref)

    @pl.when(~skip & ~const_only)
    def _compute():
        _rank_k_body(selbits_ref, pfbits_ref, a_ref, out_ref)


def _const_word_update(selbits_ref, pfconst_ref, a_ref, out_ref):
    """Shared tile-0 const-only path: update ONLY word 0 via a (TR, K) x
    (K, 32) matmul against the const word's bit planes, pass the rest
    through.  Correctness-critical and shared by every trailing kernel."""
    counts = jnp.dot(
        selbits_ref[:], pfconst_ref[:], preferred_element_type=jnp.int32
    )  # (TR, 32): per-plane parities of the const word
    shifts = jnp.arange(32, dtype=jnp.int32)[None, :]
    word0 = jnp.sum(
        (counts & 1) << shifts, axis=1, keepdims=True
    )  # exact: one distinct power of two per lane, no carries
    out_ref[:] = a_ref[:]
    out_ref[:, 0:1] = a_ref[:, 0:1] ^ word0.astype(jnp.uint32)


def _pfconst_planes(pf):
    """(K, 32) int8 bit planes of the const word pf[:, 0]."""
    return ((pf[:, 0:1] >> _SHIFTS32[None, :]) & 1).astype(jnp.int8)


def _mxu_kernel_seg(pfconst_ref, selbits_ref, pfbits_ref, a_ref, out_ref):
    """Segmented trailing kernel: grid step 0 is the const tile (word 0
    only), steps >= 1 are live word tiles.  Dead tiles are excluded from
    the grid by the caller's index maps, so — unlike _mxu_kernel_trailing's
    ``pl.when(skip)`` copy branch — they are never DMA'd through VMEM at
    all (the measured ~0.2 ms/call copy-through floor, BASELINE.md round-4
    "Trailing w0 sweep")."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _const():
        _const_word_update(selbits_ref, pfconst_ref, a_ref, out_ref)

    @pl.when(j > 0)
    def _compute():
        _rank_k_body(selbits_ref, pfbits_ref, a_ref, out_ref)


def panel_update_mxu_seg(
    a, sel, pf, dead_tiles: int, *, interpret: bool = False
):
    """Trailing rank-K update with the dead-tile prefix STATICALLY excluded
    from the grid (mode-0 fast path; see gauss_blocked.rref_blocked's
    segmented panel loop).

    ``dead_tiles`` (static int >= 1): 128-word tiles [1, dead_tiles) are
    entirely left of the live panel — they are neither read nor written, so
    their contents in the returned array are UNDEFINED (callers in trailing
    mode never read them).  Tile 0 takes the const-word-only path; tiles
    [dead_tiles, nj) get the full MXU rank-K body.  Replaces the reference's
    full-width PLUQ update (/root/reference/gf2bv/_internal.c:431-433) with
    a strictly-live memory footprint."""
    rows, wp = a.shape
    k = pf.shape[0]
    tw = 128
    tr = min(TR, rows)
    nj = wp // tw
    ni = rows // tr
    s = int(dead_tiles)
    assert 1 <= s < nj and wp % 128 == 0
    grid = (nj - s + 1, ni)
    selbits = unpack_sel_bits(sel)
    pfbits = unpack_pf_planes(pf)
    pfconst = _pfconst_planes(pf)

    def a_map(j, i):
        return (i, jnp.where(j == 0, 0, j - 1 + s))

    def pf_map(j, i):
        # j == 0 prefetches the first live tile's planes (reused at j == 1,
        # so the pipeline issues no extra DMA for it)
        return (0, 0, jnp.where(j == 0, s, j - 1 + s))

    live = nj - s
    cost = pl.CostEstimate(
        flops=2 * rows * k * live * tw * 32,
        bytes_accessed=2 * rows * (live + 1) * tw * 4 + rows * k
        + 32 * k * live * tw,
        transcendentals=0,
    )
    return pl.pallas_call(
        _mxu_kernel_seg,
        out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (k, 32), lambda j, i: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (tr, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((32, k, tw), pf_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, tw), a_map, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, tw), a_map, memory_space=pltpu.VMEM),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(pfconst, selbits, pfbits, a)


def panel_update_mxu2(a, sel, pf, *, interpret: bool = False, w0=None):
    """Fused-plane MXU variant (one matmul per tile; see _rank_k_body2)."""
    rows, wp = a.shape
    k = pf.shape[0]
    tw = 128 if wp % 128 == 0 else wp
    tr = min(TR, rows)
    grid = (wp // tw, rows // tr)
    selbits = unpack_sel_bits(sel)
    pfbits2 = unpack_pf_planes2(pf, tw)
    data_specs = [
        pl.BlockSpec((tr, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (k, 32 * tw), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * rows * k * wp * 32,
        bytes_accessed=2 * rows * wp * 4 + rows * k + 32 * k * wp,
        transcendentals=0,
    )
    if w0 is None:
        return pl.pallas_call(
            _mxu2_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
            grid_spec=pl.GridSpec(grid=grid, in_specs=data_specs, out_specs=out_spec),
            cost_estimate=cost,
            interpret=interpret,
        )(selbits, pfbits2, a)
    w0_arr = jnp.asarray(w0, jnp.int32).reshape(1)
    return pl.pallas_call(
        _mxu2_kernel_trailing,
        out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + data_specs,
            out_specs=out_spec,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(w0_arr, selbits, pfbits2, a)


def panel_update_mxu(a, sel, pf, *, interpret: bool = False, w0=None):
    """MXU variant of panel_update; same contract.  If ``w0`` (a traced
    scalar: first live word of the panel) is given, tiles left of it skip
    their matmuls (mode-0 trailing update)."""
    rows, wp = a.shape
    k = pf.shape[0]
    tw = 128 if wp % 128 == 0 else wp
    tr = min(TR, rows)
    # Word tiles on the OUTER grid dim, row tiles inner: the (32, k, tw)
    # pfbits block's index map depends only on j, so Mosaic keeps it resident
    # in VMEM across the whole inner row sweep instead of re-fetching it
    # every step (it is ~8x larger than the a/selbits tiles combined).
    grid = (wp // tw, rows // tr)
    selbits = unpack_sel_bits(sel)
    pfbits = unpack_pf_planes(pf)
    data_specs = [
        pl.BlockSpec((tr, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (32, k, tw), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM),
    ]
    cost = pl.CostEstimate(
        flops=2 * rows * k * wp * 32,
        bytes_accessed=2 * rows * wp * 4 + rows * k + 32 * k * wp,
        transcendentals=0,
    )
    out_spec = pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    if w0 is None:
        return pl.pallas_call(
            _mxu_kernel,
            out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
            grid_spec=pl.GridSpec(grid=grid, in_specs=data_specs, out_specs=out_spec),
            cost_estimate=cost,
            interpret=interpret,
        )(selbits, pfbits, a)
    w0_arr = jnp.asarray(w0, jnp.int32).reshape(1)
    # bit planes of the const word (pf[:, 0]) for the tile-0 const-only path
    pfconst = _pfconst_planes(pf)
    return pl.pallas_call(
        _mxu_kernel_trailing,
        out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (k, 32), lambda j, i: (0, 0), memory_space=pltpu.VMEM
                ),
            ]
            + data_specs,
            out_specs=out_spec,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(w0_arr, pfconst, selbits, pfbits, a)


# ---------------------------------------------------------------------------
# Look-ahead megakernel ("mxu_la"): the trailing rank-K update of panel t
# FUSED with the forward scan of panel t+1 in ONE Mosaic instruction stream.
#
# Two separate pallas calls can never overlap on a TPU core (HLOs execute
# sequentially), so the ~23 ms of VPU-bound phase-1 scan work sits strictly
# after the ~47 ms of MXU-bound phase-2 work every solve.  Inside a single
# kernel the scalar core issues both streams and the units run concurrently
# — the same mechanism that already hides the VPU repack under the bit-plane
# matmuls here.  Schedule: one scan step per grid step (the grid has >= K
# steps at flagship shapes; smaller shapes take ``spp`` steps per grid
# step), with the thin scan state (bT/cT/used) persistent across grid steps
# in scratch/constant-mapped outputs.  The scan is bit-identical to
# pallas_phase1._make_scan_kernel: same static sub-word windows (via
# pl.when on the grid step id), same min-lane pivot election.
# ---------------------------------------------------------------------------


def _make_mxu_scan_kernel(
    rows: int, K: int, kw: int, cols: int, spp: int, ngrid: int
):
    def kernel(
        w0_ref,       # SMEM (2,): [trailing boundary word, next-panel word]
        pfconst_ref,  # VMEM (K, 32) int8 const-word planes
        selbits_ref,  # VMEM (tr, K) int8 tile
        pfbits_ref,   # VMEM (32, K, tw) int8 tile
        a_ref,        # VMEM (tr, tw) u32 tile
        bTn_in,       # VMEM (kw, rows) u32: PRE-UPDATED next panel slice^T
        used_in,      # VMEM (1, rows) i32
        out_ref,      # VMEM (tr, tw) u32 tile
        prow_ref,     # SMEM (K,) i32
        cT_ref,       # VMEM (kw, rows) u32 (constant map: resident)
        used_ref,     # VMEM (1, rows) i32 (constant map: resident)
        bT_s,         # scratch VMEM (kw, rows) u32
    ):
        j = pl.program_id(0)
        i = pl.program_id(1)
        ni = pl.num_programs(1)
        g = j * ni + i
        tw = out_ref.shape[1]
        w0 = w0_ref[0]
        w0n = w0_ref[1]
        lane_ids = lax.broadcasted_iota(jnp.int32, (1, rows), 1)

        @pl.when(g == 0)
        def _init():
            bT_s[:] = bTn_in[:]
            used_ref[:] = used_in[:]
            cT_ref[:] = jnp.zeros((kw, rows), jnp.uint32)

        # ---- MXU part: the trailing rank-K update of THIS tile ----------
        skip = (j > 0) & ((j + 1) * tw <= w0)
        const_only = (j == 0) & (tw <= w0)

        @pl.when(skip)
        def _copy():
            out_ref[:] = a_ref[:]

        @pl.when(const_only)
        def _const():
            _const_word_update(selbits_ref, pfconst_ref, a_ref, out_ref)

        @pl.when(~skip & ~const_only)
        def _compute():
            _rank_k_body(selbits_ref, pfbits_ref, a_ref, out_ref)

        # ---- VPU part: spp forward-scan steps of the NEXT panel ---------
        def lane_extract(mat, piv):
            sel = jnp.where(lane_ids == piv, mat.astype(jnp.int32), 0)
            return jnp.sum(sel, axis=1, keepdims=True).astype(jnp.uint32)

        for u in range(spp):
            idx = g * spp + u if spp > 1 else g
            for sw in range(kw):
                # static sub-word window keeps every slice static (the
                # triangular bT_s[sw:] structure of the standalone scan)
                @pl.when((idx >= 32 * sw) & (idx < 32 * (sw + 1)))
                def _scan(sw=sw, idx=idx):
                    jj = idx
                    jj32 = jj - 32 * sw
                    gbit = 32 * w0n + jj
                    valid = (gbit >= 1) & (gbit <= cols)
                    shift = jj32.astype(jnp.uint32)
                    colb = (bT_s[sw : sw + 1, :] >> shift) & 1
                    cand = (colb == 1) & (used_ref[:] == 0) & valid
                    piv = jnp.min(jnp.where(cand, lane_ids, rows))
                    has = piv < rows
                    piv_safe = jnp.where(has, piv, 0)
                    prow_ref[jj] = jnp.where(has, piv, -1)
                    bpiv = lane_extract(bT_s[sw:, :], piv_safe)
                    elim = cand & (lane_ids != piv)
                    em = jnp.where(
                        elim, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                    )
                    bT_s[sw:, :] = bT_s[sw:, :] ^ (em & bpiv)
                    cT_ref[sw : sw + 1, :] = cT_ref[sw : sw + 1, :] ^ (
                        em & (jnp.uint32(1) << shift)
                    )
                    used_ref[:] = jnp.where(
                        (lane_ids == piv) & has, jnp.int32(1), used_ref[:]
                    )

    return kernel


def la_grid(rows: int, wp: int) -> tuple[int, int, int]:
    """(nj, ni, total grid steps) the look-ahead kernel would use."""
    tw = 128 if wp % 128 == 0 else wp
    tr = min(TR, rows)
    return wp // tw, rows // tr, (wp // tw) * (rows // tr)


def panel_update_mxu_scan(
    a, sel, pf, bTn, used, w0n, *, cols: int, w0=None, interpret: bool = False
):
    """Fused trailing update + next-panel scan (see module section above).

    a/sel/pf as panel_update_mxu; bTn (kw, rows) u32 = the next panel's
    slice^T ALREADY carrying this panel's rank-K update; used (1, rows)
    i32; w0n traced next-panel word offset; w0 traced trailing boundary
    (None = full update).  Returns (a', prow_next, cT_next, used_next).
    """
    rows, wp = a.shape
    k = pf.shape[0]
    kw = k // 32
    tw = 128 if wp % 128 == 0 else wp
    tr = min(TR, rows)
    nj, ni, ngrid = la_grid(rows, wp)
    spp = -(-k // ngrid)  # scan steps per grid step (1 at flagship shapes)
    assert spp * ngrid >= k
    grid = (nj, ni)
    selbits = unpack_sel_bits(sel)
    pfbits = unpack_pf_planes(pf)
    pfconst = _pfconst_planes(pf)
    w0_arr = jnp.stack(
        [
            jnp.asarray(0 if w0 is None else w0, jnp.int32),
            jnp.asarray(w0n, jnp.int32),
        ]
    )
    cost = pl.CostEstimate(
        flops=2 * rows * k * wp * 32,
        bytes_accessed=2 * rows * wp * 4 + rows * k + 32 * k * wp,
        transcendentals=0,
    )
    return pl.pallas_call(
        _make_mxu_scan_kernel(rows, k, kw, cols, spp, ngrid),
        out_shape=(
            jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
            jax.ShapeDtypeStruct((k,), jnp.int32),
            jax.ShapeDtypeStruct((kw, rows), jnp.uint32),
            jax.ShapeDtypeStruct((1, rows), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (k, 32), lambda j, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tr, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (32, k, tw), lambda j, i: (0, 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kw, rows), lambda j, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rows), lambda j, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (kw, rows), lambda j, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rows), lambda j, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        scratch_shapes=[pltpu.VMEM((kw, rows), jnp.uint32)],
        cost_estimate=cost,
        interpret=interpret,
    )(w0_arr, pfconst, selbits, pfbits, a, bTn, used)


def pick_tw(wp: int) -> int:
    """Largest word-tile (multiple of 128) dividing wp."""
    for tw in (640, 512, 384, 256, 128):
        if wp % tw == 0:
            return tw
    return wp  # wp < 128: single tile


def panel_update(a, sel, pf, *, interpret: bool = False):
    """a: (rows, Wp) u32; sel: (rows, kw) u32; pf: (K, Wp) u32.
    rows % TR == 0 and Wp % 128 == 0 (or Wp < 128) are the caller's
    responsibility.  Traceable (used inside the blocked solver's jit)."""
    rows, wp = a.shape
    k = pf.shape[0]
    kw = sel.shape[1]
    assert k == 32 * kw
    tw = pick_tw(wp)
    tr = min(TR, rows)
    # word tiles outer / row tiles inner: the (k, tw) pf block only depends
    # on j, so it stays VMEM-resident across the inner row sweep
    grid = (wp // tw, rows // tr)
    return pl.pallas_call(
        _panel_update_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, wp), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tr, kw), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((k, tw), lambda j, i: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (tr, tw), lambda j, i: (i, j), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * wp * k,
            bytes_accessed=2 * rows * wp * 4 + rows * kw * 4 + k * wp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(sel, pf, a)
