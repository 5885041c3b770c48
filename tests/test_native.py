"""Native C engine vs oracle/JAX: bit-exact RREF-canonical results."""

import numpy as np
import pytest

from gf2bv_tpu import _native
from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.ops.gauss_ref import solve_oracle

from test_solver import random_system

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="no C compiler for native backend"
)


@pytest.mark.parametrize(
    "rows,cols,deficit",
    [(40, 32, 0), (20, 32, 0), (48, 40, 8), (5, 100, 0), (70, 65, 3), (300, 257, 9)],
)
def test_native_vs_oracle(rows, cols, deficit):
    rng = np.random.default_rng(rows * 7 + cols + deficit)
    eqs, _ = random_system(rng, rows, cols, rank_deficit=deficit)
    ref = solve_oracle(eqs, cols)

    one = solver.solve(eqs, cols, 0, backend="native")
    assert one == packing.words_to_int(ref.origin)
    space = solver.solve(eqs, cols, 1, backend="native")
    assert space.dimension == ref.dimension
    assert packing.int_to_words(space.origin, cols).tolist() == ref.origin.tolist()
    assert packing.rows_to_ints(
        np.asarray(packing.ints_to_rows(list(space.basis), cols))
    ) == packing.rows_to_ints(ref.basis)


def test_native_inconsistent():
    rng = np.random.default_rng(5)
    eqs, _ = random_system(rng, 30, 24, inconsistent=True)
    assert solver.solve(eqs, 24, 0, backend="native") is None


def test_native_enumerate_matches_host():
    from gf2bv_tpu import AffineSpace
    from gf2bv_tpu._native import enumerate_native

    rng = np.random.default_rng(2)
    cols = 90
    basis_ints = [int(rng.integers(1, 1 << 60)) for _ in range(11)]
    origin = packing.int_to_words(12345, cols)
    basis = packing.ints_to_rows(basis_ints, cols)
    sp = AffineSpace(origin, basis, cols)
    want = list(sp)
    got = enumerate_native(origin, basis, 0, 1 << 11, gray=True)
    assert packing.rows_to_ints(got) == want

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_macro_panel_fuzz(seed):
    """Macro-panel edge cases vs the oracle: shapes spanning many NSUB*8
    panels with ragged tails, heavy rank deficits, and whole zeroed column
    bands (sub-panels with no pivots skip their table build)."""
    rng = np.random.default_rng(1000 + seed)
    for _ in range(4):
        cols = int(rng.integers(300, 1300))
        rows = cols + int(rng.integers(-40, 60))
        deficit = int(rng.integers(0, 50))
        eqs, _ = random_system(rng, max(rows, 8), cols, rank_deficit=deficit)
        # zero out a random contiguous column band (pivotless sub-panels)
        lo = int(rng.integers(1, cols - 64))
        hi = lo + int(rng.integers(16, 64))
        mask = np.zeros(1 + cols, np.uint8)
        mask[lo:hi] = 1
        eqs &= ~packing.pack_bits(mask[None, :], 1 + cols)[0]

        ref = solve_oracle(eqs, cols)
        one = solver.solve(eqs, cols, 0, backend="native")
        if ref.origin is None:
            assert one is None
            continue
        assert one == packing.words_to_int(ref.origin)
        space = solver.solve(eqs, cols, 1, backend="native")
        assert space.dimension == ref.dimension
        assert packing.int_to_words(space.origin, cols).tolist() == \
            ref.origin.tolist()
