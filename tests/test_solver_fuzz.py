"""Hypothesis fuzz: every backend must agree with the numpy oracle on
random systems of random shape/rank, both modes, including unsat."""

import numpy as np
from hypothesis import given, settings, strategies as st

from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.ops.gauss_ref import solve_oracle


def build_system(seed, rows, cols, deficit, unsat):
    rng = np.random.default_rng(seed)
    free = rng.permutation(cols)[:deficit]
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    coeff[:, free] = 0
    secret = rng.integers(0, 2, size=cols).astype(np.uint8)
    rhs = (coeff @ secret) % 2
    if unsat and rows >= 2:
        # duplicate a nonzero row with a flipped RHS
        i = int(np.argmax(coeff.any(axis=1)))
        coeff[rows - 1] = coeff[i]
        rhs[rows - 1] = rhs[i] ^ 1
    bits = np.concatenate([rhs[:, None], coeff], axis=1)
    return packing.pack_bits(bits, 1 + cols)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31),
    rows=st.integers(min_value=1, max_value=96),
    cols=st.integers(min_value=1, max_value=80),
    deficit=st.integers(min_value=0, max_value=6),
    unsat=st.booleans(),
    backend=st.sampled_from(["jax", "blocked", "native"]),
)
def test_backend_matches_oracle(seed, rows, cols, deficit, unsat, backend):
    deficit = min(deficit, cols)
    eqs = build_system(seed, rows, cols, deficit, unsat)
    ref = solve_oracle(eqs, cols)

    got0 = solver.solve(eqs, cols, 0, backend=backend)
    got1 = solver.solve(eqs, cols, 1, backend=backend)
    if not ref.consistent:
        assert got0 is None and got1 is None
        return
    assert got0 == packing.words_to_int(ref.origin)
    assert got1.origin == packing.words_to_int(ref.origin)
    assert got1.basis == [packing.words_to_int(b) for b in ref.basis]
