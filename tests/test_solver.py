"""Differential tests: JAX solvers vs the numpy oracle on random systems.

Covers full-rank, underdetermined, inconsistent, empty, and padded systems.
The oracle (ops/gauss_ref.py) plays Sage's role from the reference's
differential test (``/root/reference/examples/sage_mt.py:39-43``).
"""

import numpy as np
import pytest

from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.ops.gauss_ref import solve_oracle

BACKENDS = ["jax", "blocked"]


def random_system(rng, rows, cols, *, rank_deficit=0, inconsistent=False):
    """Build a random packed system with known satisfiability."""
    nbits = 1 + cols
    secret = rng.integers(0, 2, size=cols).astype(np.uint8)
    n_indep = max(0, rows - rank_deficit)
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    if rank_deficit > 0 and rows >= 2:
        # make some rows linear combos of others
        for i in range(n_indep, rows):
            pick = rng.integers(0, 2, size=n_indep).astype(np.uint8)
            coeff[i] = (pick[:, None] * coeff[:n_indep]).sum(axis=0) % 2
    rhs = (coeff @ secret) % 2
    if inconsistent:
        # flip one RHS bit of a duplicated row to create 0 = 1 after reduction
        coeff = np.concatenate([coeff, coeff[:1]], axis=0)
        rhs = np.concatenate([rhs, rhs[:1] ^ 1])
    bits = np.concatenate([rhs[:, None], coeff], axis=1).astype(np.uint8)
    return packing.pack_bits(bits, nbits), secret


def check_solution_satisfies(eqs, cols, raw_int):
    bits = packing.unpack_rows(eqs, 1 + cols)
    x = packing.mask_bits(cols, raw_int)
    resid = (bits[:, 1:] @ x + bits[:, 0]) % 2
    assert not resid.any()


def spaces_equal(origin_a, basis_a, origin_b, basis_b, cols):
    """Set equality of two affine spaces via RREF canonical form."""
    from gf2bv_tpu.ops.gauss_ref import rref_bits

    def canon(origin, basis):
        if basis.shape[0] == 0:
            o = packing.unpack_rows(origin[None, :], cols)[0]
            return (np.zeros((0, cols), np.uint8), o), 0
        b = packing.unpack_rows(basis, cols)
        # rref_bits pivots from column 1; prepend a zero RHS column
        b_aug = np.concatenate([np.zeros((b.shape[0], 1), np.uint8), b], axis=1)
        r, piv = rref_bits(b_aug)
        r = r[: len(piv), 1:]
        o = packing.unpack_rows(origin[None, :], cols)[0]
        # reduce origin by the basis to canonical coset representative
        for j, c in enumerate(piv):
            if o[c - 1]:
                o = o ^ r[j]
        return (r, o), len(piv)

    (ra, oa), da = canon(origin_a, basis_a)
    (rb, ob), db = canon(origin_b, basis_b)
    assert da == db
    assert np.array_equal(oa, ob)
    assert np.array_equal(ra, rb)


@pytest.mark.parametrize("backend", BACKENDS)
@pytest.mark.parametrize(
    "rows,cols,deficit",
    [(40, 32, 0), (32, 32, 0), (20, 32, 0), (48, 40, 8), (5, 100, 0), (70, 65, 3)],
)
def test_vs_oracle(backend, rows, cols, deficit):
    rng = np.random.default_rng(rows * 1000 + cols + deficit)
    eqs, secret = random_system(rng, rows, cols, rank_deficit=deficit)
    ref = solve_oracle(eqs, cols)
    assert ref.consistent

    one = solver.solve(eqs, cols, 0, backend=backend)
    assert one is not None
    check_solution_satisfies(eqs, cols, one)
    # canonical RREF origin must match the oracle bit-exactly
    assert one == packing.words_to_int(ref.origin)

    space = solver.solve(eqs, cols, 1, backend=backend)
    assert space is not None
    assert space.dimension == ref.dimension
    spaces_equal(
        packing.int_to_words(space.origin, cols),
        np.asarray(
            packing.ints_to_rows(list(space.basis), cols)
        ),
        ref.origin,
        ref.basis,
        cols,
    )


@pytest.mark.parametrize("backend", BACKENDS)
def test_inconsistent(backend):
    rng = np.random.default_rng(7)
    eqs, _ = random_system(rng, 30, 24, inconsistent=True)
    assert solve_oracle(eqs, 24).consistent is False
    assert solver.solve(eqs, 24, 0, backend=backend) is None
    assert solver.solve(eqs, 24, 1, backend=backend) is None


@pytest.mark.parametrize("backend", BACKENDS)
def test_empty_system_full_space(backend):
    cols = 48
    eqs = np.zeros((0, packing.nwords64(1 + cols)), dtype=np.uint64)
    space = solver.solve(eqs, cols, 1, backend=backend)
    assert space.dimension == cols
    assert space.origin == 0


@pytest.mark.parametrize("backend", BACKENDS)
def test_unique_solution_bit_exact(backend):
    rng = np.random.default_rng(11)
    eqs, secret = random_system(rng, 80, 64)
    ref = solve_oracle(eqs, 64)
    if ref.dimension == 0:
        one = solver.solve(eqs, 64, 0, backend=backend)
        want = packing.words_to_int(
            packing.pack_bits(secret[None, :], 64)[0]
        )
        assert one == want


@pytest.mark.parametrize("k_panel", [64, 128, 256])
def test_blocked_panel_sizes(k_panel):
    from gf2bv_tpu.ops.gauss_blocked import solve_blocked

    rng = np.random.default_rng(k_panel)
    eqs, _ = random_system(rng, 96, 80, rank_deficit=6)
    ref = solve_oracle(eqs, 80)
    origin, basis = solve_blocked(eqs, 80, 1, k_panel=k_panel)
    assert packing.words_to_int(origin) == packing.words_to_int(ref.origin)
    assert packing.rows_to_ints(basis) == packing.rows_to_ints(ref.basis)


def test_env_backend_override(monkeypatch):
    monkeypatch.setenv("GF2BV_TPU_BACKEND", "oracle")
    rng = np.random.default_rng(1)
    eqs, _ = random_system(rng, 2000, 1500)  # above blocked threshold
    # auto would pick blocked; env forces oracle — same canonical answer
    one = solver.solve(eqs, 1500, 0)
    ref = solve_oracle(eqs, 1500)
    assert one == packing.words_to_int(ref.origin)


def test_packed_oracle_matches_uint8_oracle():
    """The large-system packed oracle path must agree with the uint8 one."""
    from gf2bv_tpu.ops import gauss_ref

    rng = np.random.default_rng(77)
    for deficit, unsat in [(0, False), (4, False), (0, True)]:
        eqs, _ = random_system(rng, 120, 90, rank_deficit=deficit, inconsistent=unsat)
        ref8 = gauss_ref.solve_oracle(eqs, 90)
        rref_p, piv_p = gauss_ref.rref_packed(eqs, 91)
        bits = packing.unpack_rows(eqs, 91)
        rref_8, piv_8 = gauss_ref.rref_bits(bits)
        assert piv_p == piv_8
        assert np.array_equal(
            packing.unpack_rows(rref_p, 91), rref_8
        )
