"""Chunked basis extraction (ops/extract_device._basis_device).

The pivot axis is processed in fixed-size chunks so the compiled shape is
capped (the single-call form cost a ~100 s one-time XLA compile at the
NLFSR-size 16384 rank bucket).  Chunking must not change the basis: run a
rank-deficient system whose rank crosses several (shrunk) chunk boundaries
and compare against the oracle solver's canonical RREF basis.
"""

import numpy as np
import pytest

from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import extract_device, solver
from gf2bv_tpu.ops.gauss_ref import solve_oracle


@pytest.fixture
def small_chunks(monkeypatch):
    monkeypatch.setattr(extract_device, "_PCHUNK", 16)


def _random_deficient_system(rng, cols, rank):
    """rows spanning exactly a rank-dimensional row space."""
    base = rng.integers(0, 2, size=(rank, 1 + cols), dtype=np.uint8)
    base[:, 0] = rng.integers(0, 2, size=rank)
    mix = rng.integers(0, 2, size=(2 * cols, rank), dtype=np.uint8)
    rows = (mix @ base) & 1
    return packing.pack_bits(rows, 1 + cols)


def test_chunked_basis_matches_oracle(small_chunks):
    rng = np.random.default_rng(7)
    cols, rank = 90, 83  # rank spans 6 chunks of 16
    eqs = _random_deficient_system(rng, cols, rank)
    want = solve_oracle(eqs, cols, 1)
    assert want.consistent

    got = solver.solve(eqs, cols, 1, backend="jax")
    assert got is not None
    assert got.dimension == want.basis.shape[0]
    assert got.origin == packing.words_to_int(want.origin)
    assert np.array_equal(got._basis, want.basis)


def test_chunked_basis_single_chunk_unchanged(small_chunks):
    rng = np.random.default_rng(11)
    cols, rank = 30, 12  # fits one chunk
    eqs = _random_deficient_system(rng, cols, rank)
    want = solve_oracle(eqs, cols, 1)
    got = solver.solve(eqs, cols, 1, backend="jax")
    assert got is not None and got.dimension == want.basis.shape[0]
    assert np.array_equal(got._basis, want.basis)
