"""JAX bit-packed Gauss-Jordan solver (v1: per-pivot fori_loop).

Replaces the reference's M4RI PLUQ + kernel path
(``/root/reference/gf2bv/_internal.c:359-502``) with a single
reduced-row-echelon-form pass on the device: one ``lax.fori_loop`` over
variable columns, each step doing pivot selection (masked argmax), pivot-row
broadcast, and a full-matrix masked XOR — all uint32 VPU work with static
shapes.  One algorithm yields the particular solution, rank, inconsistency
detection, and the kernel basis, matching all of ``m4ri_solve``'s outputs.

Data layout: A is (rows, W32) uint32; packed bit j (j=0 const / RHS,
j=1..cols variables) lives at 32-bit word j>>5, bit j&31.

v2 (blocked panels + Pallas update kernel) lives in gauss_blocked.py; this
module is the always-correct fallback and the small-system fast path.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core import packing

_ROW_BUCKET = 256  # pad row counts to multiples of this to bound recompiles


def _pad_rows(a32: np.ndarray, cols: int) -> np.ndarray:
    del cols
    return packing.pad2d(a32, row_align=_ROW_BUCKET)


@functools.partial(jax.jit, static_argnums=(1,))
def rref_device(a: jnp.ndarray, cols: int):
    """Full Gauss-Jordan to RREF.

    Returns (rref, pivot_row_of_col, inconsistent):
      * rref: (rows, W32) uint32
      * pivot_row_of_col: (cols,) int32, row index of the pivot for variable
        column k+1, or -1 if the column is free
      * inconsistent: () bool — some row reduces to 1 = 0
    """
    rows, nw = a.shape
    row_ids = lax.broadcasted_iota(jnp.int32, (rows, 1), 0)[:, 0]
    used0 = jnp.zeros((rows,), jnp.bool_)
    pof0 = jnp.full((cols,), -1, jnp.int32)

    def step(k, carry):
        a, used, pof = carry
        j = k + 1  # packed bit position of variable column k+1
        word = j >> 5
        shift = (j & 31).astype(jnp.uint32)
        col = (lax.dynamic_index_in_dim(a, word, axis=1, keepdims=False) >> shift) & 1
        cand = (col == 1) & ~used
        piv = jnp.argmax(cand)  # first candidate row (deterministic)
        has = cand[piv]
        pivrow = lax.dynamic_index_in_dim(a, piv, axis=0, keepdims=False)
        elim = (col == 1) & (row_ids != piv) & has
        a = jnp.where(elim[:, None], a ^ pivrow[None, :], a)
        used = used | ((row_ids == piv) & has)
        pof = pof.at[k].set(jnp.where(has, piv, -1))
        return a, used, pof

    a, used, pof = lax.fori_loop(0, cols, step, (a, used0, pof0))

    from . import extract_device

    return a, pof, extract_device.inconsistent_device(a)


@functools.partial(jax.jit, static_argnums=(1,))
def rref_origin_device(a: jnp.ndarray, cols: int):
    """Fused RREF + mode-0 extraction: one dispatch, tiny outputs
    (origin32, inconsistent) — the small-system analog of
    gauss_blocked.rref_origin_blocked."""
    from . import extract_device

    rref32, pof, inconsistent = rref_device(a, cols)
    return extract_device.origin_device(rref32, pof, cols), inconsistent


def solve_jax(eqs: np.ndarray, cols: int, mode: int):
    """Solve a packed (rows, W64) uint64 system over ``cols`` variables.

    mode 0 -> packed particular solution (Wsol,) uint64 or None.
    mode 1 -> (origin, basis) packed, or None.  Mirrors m4ri_solve's two
    modes (``_internal.h:25-26``).
    """
    from . import extract_device

    a32 = _pad_rows(np.ascontiguousarray(packing.to_u32(eqs)), cols)
    if mode == 0:
        origin32, inconsistent = jax.device_get(
            rref_origin_device(jnp.asarray(a32), cols)
        )
        if bool(inconsistent):
            return None
        return packing.from_u32(origin32[None, :])[0]
    rref32, pof, inconsistent = rref_device(jnp.asarray(a32), cols)
    return extract_device.finalize(rref32, pof, inconsistent, cols, mode)
