"""Multi-device tests on the 8-device virtual CPU mesh: sharded solve must
equal single-chip solve bit-for-bit (SURVEY.md §4's multi-chip strategy)."""

import numpy as np
import pytest

import jax

from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.parallel import batch as pbatch
from gf2bv_tpu.parallel import mesh as meshlib
from gf2bv_tpu.parallel.rowshard import solve_rowsharded

from test_solver import random_system, spaces_equal


def test_device_count():
    assert jax.device_count() == 8


@pytest.fixture(scope="module")
def mesh_rows():
    return meshlib.make_mesh(batch=1, rows=8)


@pytest.fixture(scope="module")
def mesh_batch():
    return meshlib.make_mesh(batch=8, rows=1)


@pytest.fixture(scope="module")
def mesh_2d():
    return meshlib.make_mesh(batch=2, rows=4)


@pytest.mark.parametrize("rows,cols,deficit", [(64, 48, 0), (48, 60, 5), (96, 33, 2)])
def test_rowsharded_matches_single(mesh_rows, rows, cols, deficit):
    rng = np.random.default_rng(rows + cols)
    eqs, _ = random_system(rng, rows, cols, rank_deficit=deficit)

    single = solver.solve(eqs, cols, 1, backend="jax")
    sharded = solve_rowsharded(eqs, cols, 1, mesh_rows)
    assert (sharded is None) == (single is None)
    origin, basis = sharded
    # canonical RREF -> must match the single-chip result bit-exactly
    assert packing.words_to_int(origin) == single.origin
    assert packing.rows_to_ints(basis) == list(single.basis)


def test_rowsharded_inconsistent(mesh_rows):
    rng = np.random.default_rng(3)
    eqs, _ = random_system(rng, 40, 32, inconsistent=True)
    assert solve_rowsharded(eqs, 32, 0, mesh_rows) is None


@pytest.mark.parametrize("mesh_name", ["mesh_batch", "mesh_2d", None])
def test_batched_matches_loop(request, mesh_name):
    mesh = request.getfixturevalue(mesh_name) if mesh_name else None
    rng = np.random.default_rng(17)
    cols = 40
    mats, singles = [], []
    for i in range(5):  # deliberately not a multiple of the batch axis
        eqs, _ = random_system(
            rng, 48 + 8 * i, cols, rank_deficit=i % 3, inconsistent=(i == 3)
        )
        mats.append(eqs)
        singles.append(solver.solve(eqs, cols, 1, backend="jax"))

    got = pbatch.solve_batch(mats, cols, 1, mesh=mesh)
    assert len(got) == 5
    for g, s in zip(got, singles):
        assert (g is None) == (s is None)
        if g is None:
            continue
        origin, basis = g
        assert packing.words_to_int(origin) == s.origin
        assert packing.rows_to_ints(basis) == list(s.basis)


def test_solve_batch_systems_frontend(mesh_batch):
    from gf2bv_tpu import LinearSystem

    lin = LinearSystem([16])
    (x,) = lin.gens()
    secrets = [0xBEE5 + i for i in range(9)]
    zeros_batch = [[x ^ s] for s in secrets]
    # add one unsatisfiable instance
    zeros_batch.append([x[0] ^ 1, x[0]])
    got = pbatch.solve_batch_systems(lin, zeros_batch, mode=0, mesh=mesh_batch)
    assert got[:-1] == secrets
    assert got[-1] is None


def test_system_solve_one_batch(mesh_batch):
    from gf2bv_tpu import LinearSystem

    lin = LinearSystem([12])
    (x,) = lin.gens()
    batch = [[x ^ v] for v in (1, 2, 3)] + [[x[0] ^ 1, x[0]]]
    got = lin.solve_one_batch(batch, mesh=mesh_batch)
    assert got == [(1,), (2,), (3,), None]


def test_system_solve_all_batch():
    from gf2bv_tpu import LinearSystem

    lin = LinearSystem([6])
    (x,) = lin.gens()
    batch = [[(x & 0b11) ^ 0b10], [x ^ 5], [x[0] ^ 1, x[0]]]
    gens = lin.solve_all_batch(batch)
    assert sorted(s for (s,) in gens[0]) == [2, 6, 10, 14, 18, 22, 26, 30, 34, 38, 42, 46, 50, 54, 58, 62]
    assert list(gens[1]) == [(5,)]
    assert gens[2] is None


def test_quadratic_solve_batch():
    """Batched per-guess quadratic subsystems (the nlfsr_ex pattern)."""
    import numpy as np

    from gf2bv_tpu import QuadraticSystem

    n = 6
    rng = np.random.default_rng(23)
    secret = int(rng.integers(1, 1 << n))
    sbits = [(secret >> i) & 1 for i in range(n)]

    qsys = QuadraticSystem([n])
    (x,) = qsys.gens()
    base = []
    for i in range(n):
        for j in range(i):
            base.append(qsys.mul_bit(x[i], x[j]) ^ (sbits[i] & sbits[j]))
    base.append((x >> 1) ^ (secret >> 1))  # leave bit 0 unknown
    # guess bit 0 both ways; exactly one guess must solve to the secret
    batches = [base + qsys.bit_assert(x[0], b) for b in (0, 1)]
    out = qsys.solve_all_batch(batches, max_dimension=16)
    sols = []
    for gen in out:
        if gen is None:
            sols.append(None)
            continue
        got = [s for s in gen]
        sols.append(got[0] if got else None)
    matching = [s for s in sols if s is not None and s[0] == secret]
    assert matching, sols


def test_solve_batch_wide_systems_route_to_blocked():
    """Above the blocked threshold, batched solves go through the panel
    solver per instance with the same return contract."""
    import numpy as np

    from gf2bv_tpu.core import packing as pk
    from gf2bv_tpu.parallel.batch import solve_batch

    rng = np.random.default_rng(31)
    cols = 1100  # >= _BLOCKED_THRESHOLD
    mats, secrets = [], []
    for _ in range(3):
        secret = rng.integers(0, 2, size=cols).astype(np.uint8)
        coeff = rng.integers(0, 2, size=(cols + 32, cols)).astype(np.uint8)
        rhs = (coeff @ secret) % 2
        mats.append(
            pk.pack_bits(np.concatenate([rhs[:, None], coeff], axis=1), 1 + cols)
        )
        secrets.append(pk.pack_bits(secret[None, :], cols)[0])
    res0 = solve_batch(mats, cols, 0)
    assert all(np.array_equal(r, s) for r, s in zip(res0, secrets))
    res1 = solve_batch(mats, cols, 1)
    for (origin, basis), s in zip(res1, secrets):
        assert np.array_equal(origin, s) and basis.shape[0] == 0
