"""Distribution layer (all new capability; the reference is single-core,
SURVEY.md §2): device meshes, batched vmapped solving, and three row-sharded
elimination kernels with increasing communication efficiency."""

from __future__ import annotations


def solve_sharded(eqs, cols: int, mode: int, mesh, k_panel: int = 256):
    """Solve one system row-sharded over ``mesh``, picking the algorithm by
    mesh shape: tournament pivoting (one collective per panel) when the
    rows axis actually spans devices, the plain panel-blocked kernel on a
    single-device rows axis (where tournament's extra merge pass buys
    nothing)."""
    from . import mesh as meshlib
    from .rowshard_blocked import solve_rowsharded_blocked
    from .rowshard_tournament import solve_rowsharded_tournament

    if mesh.shape[meshlib.ROWS_AXIS] > 1:
        return solve_rowsharded_tournament(eqs, cols, mode, mesh, k_panel)
    return solve_rowsharded_blocked(eqs, cols, mode, mesh, k_panel)
