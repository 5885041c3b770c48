"""Panel-blocked Gauss-Jordan for large systems (v2 — placeholder).

Will implement the PLE-style panel scheme (phase 1: sequential pivots on a
K-column slice; phase 2: one rank-K XOR update of the trailing matrix, the
HBM-bandwidth-bound bulk).  Until then, delegates to the per-pivot v1.
"""

from __future__ import annotations

import numpy as np


def solve_blocked(eqs: np.ndarray, cols: int, mode: int):
    from .gauss_jax import solve_jax

    return solve_jax(eqs, cols, mode)
