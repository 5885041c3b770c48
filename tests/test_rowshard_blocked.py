"""Panel-blocked row-sharded solver: must match single-chip RREF results
bit-for-bit on the 8-device virtual CPU mesh (RREF is canonical, so origin
and kernel basis are comparable exactly)."""

import numpy as np
import pytest

from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.parallel import mesh as meshlib
from gf2bv_tpu.parallel.rowshard_blocked import solve_rowsharded_blocked

from test_solver import random_system


@pytest.fixture(scope="module")
def mesh_rows():
    return meshlib.make_mesh(batch=1, rows=8)


@pytest.mark.parametrize(
    "rows,cols,deficit",
    [(64, 48, 0), (48, 60, 5), (96, 33, 2), (256, 140, 0), (200, 150, 7)],
)
def test_blocked_rowsharded_matches_single(mesh_rows, rows, cols, deficit):
    rng = np.random.default_rng(1000 + rows + cols)
    eqs, _ = random_system(rng, rows, cols, rank_deficit=deficit)

    single = solver.solve(eqs, cols, 1, backend="jax")
    sharded = solve_rowsharded_blocked(eqs, cols, 1, mesh_rows)
    assert (sharded is None) == (single is None)
    origin, basis = sharded
    assert packing.words_to_int(origin) == single.origin
    assert packing.rows_to_ints(basis) == list(single.basis)


@pytest.mark.parametrize("k_panel", [64, 128])
def test_blocked_rowsharded_k_panel(mesh_rows, k_panel):
    rng = np.random.default_rng(7)
    eqs, secret = random_system(rng, 96, 80)
    got = solve_rowsharded_blocked(eqs, 80, 0, mesh_rows, k_panel=k_panel)
    want = solver.solve(eqs, 80, 0, backend="oracle")
    assert packing.words_to_int(got) == want


def test_blocked_rowsharded_inconsistent(mesh_rows):
    rng = np.random.default_rng(5)
    eqs, _ = random_system(rng, 40, 32, inconsistent=True)
    assert solve_rowsharded_blocked(eqs, 32, 0, mesh_rows) is None


def test_blocked_rowsharded_2d_mesh():
    mesh = meshlib.make_mesh(batch=2, rows=4)
    rng = np.random.default_rng(11)
    eqs, _ = random_system(rng, 64, 50, rank_deficit=3)
    single = solver.solve(eqs, 50, 1, backend="jax")
    sharded = solve_rowsharded_blocked(eqs, 50, 1, mesh)
    origin, basis = sharded
    assert packing.words_to_int(origin) == single.origin
    assert packing.rows_to_ints(basis) == list(single.basis)
