"""Randomized differential fuzz of the COMPILED TPU kernels vs the numpy
oracle (interpret-mode tests validate kernel logic; this validates the real
Mosaic-compiled path on hardware).  One padded shape -> one compile; many
random instances incl. rank-deficient and inconsistent systems, both modes.

Run: python scripts/tpu_fuzz.py [n_instances]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.ops.gauss_ref import solve_oracle


def main(n=30, cols=4000, backend="blocked", seed=0xF022):
    import jax
    from gf2bv_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.default_rng(seed)
    for i in range(n):
        rows = int(rng.integers(cols - 40, cols + 300))
        deficit = int(rng.integers(0, 5)) * int(rng.integers(0, 2))
        unsat = bool(rng.integers(0, 4) == 0)
        free = rng.permutation(cols)[:deficit]
        coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
        coeff[:, free] = 0
        secret = rng.integers(0, 2, size=cols).astype(np.uint8)
        rhs = (coeff @ secret) % 2
        if unsat:
            j = int(np.argmax(coeff.any(axis=1)))
            coeff[rows - 1] = coeff[j]
            rhs[rows - 1] = rhs[j] ^ 1
        eqs = packing.pack_bits(
            np.concatenate([rhs[:, None], coeff], axis=1), 1 + cols
        )

        ref = solve_oracle(eqs, cols)
        got0 = solver.solve(eqs, cols, 0, backend=backend)
        got1 = solver.solve(eqs, cols, 1, backend=backend)
        if not ref.consistent:
            assert got0 is None and got1 is None, f"[{i}] unsat not detected"
        else:
            assert got0 == packing.words_to_int(ref.origin), f"[{i}] origin0"
            assert got1.origin == packing.words_to_int(ref.origin), f"[{i}] origin1"
            assert got1.basis == [
                packing.words_to_int(b) for b in ref.basis
            ], f"[{i}] basis"
        print(
            f"[{i}] rows={rows} deficit={deficit} unsat={unsat} OK",
            file=sys.stderr,
        )
    print(f"TPU fuzz [{backend} cols={cols}]: {n} instances OK")


def _random_system(rng, cols):
    rows = int(rng.integers(cols - 40, cols + 300))
    deficit = int(rng.integers(0, 5)) * int(rng.integers(0, 2))
    unsat = bool(rng.integers(0, 4) == 0)
    free = rng.permutation(cols)[:deficit]
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    coeff[:, free] = 0
    secret = rng.integers(0, 2, size=cols).astype(np.uint8)
    rhs = (coeff @ secret) % 2
    if unsat:
        j = int(np.argmax(coeff.any(axis=1)))
        coeff[rows - 1] = coeff[j]
        rhs[rows - 1] = rhs[j] ^ 1
    return packing.pack_bits(
        np.concatenate([rhs[:, None], coeff], axis=1), 1 + cols
    )


def _check(i, ref, got0, got1):
    if not ref.consistent:
        assert got0 is None and got1 is None, f"[{i}] unsat not detected"
        return
    assert got0 == packing.words_to_int(ref.origin), f"[{i}] origin0"
    assert got1.origin == packing.words_to_int(ref.origin), f"[{i}] origin1"
    assert got1.basis == [
        packing.words_to_int(b) for b in ref.basis
    ], f"[{i}] basis"


def fuzz_batched(n=24, batch=8, cols=2000, seed=0xBA7C):
    """The batched blocked solver (ops/gauss_batched) vs the oracle, both
    modes, on the real chip."""
    from gf2bv_tpu.core.affine import AffineSpace
    from gf2bv_tpu.ops import gauss_batched

    rng = np.random.default_rng(seed)
    done = 0
    while done < n:
        mats = [_random_system(rng, cols) for _ in range(batch)]
        got0 = gauss_batched.solve_batched(mats, cols, 0)
        got1 = gauss_batched.solve_batched(mats, cols, 1)
        for i, m in enumerate(mats):
            ref = solve_oracle(m, cols)
            g0 = None if got0[i] is None else packing.words_to_int(got0[i])
            g1 = (
                None
                if got1[i] is None
                else AffineSpace(got1[i][0], got1[i][1], cols)
            )
            _check(done + i, ref, g0, g1)
        done += batch
        print(f"[batched {done}/{n}] OK", file=sys.stderr)
    print(f"TPU fuzz [batched blocked cols={cols}]: {n} instances OK")


def fuzz_sharded(n=12, cols=2000, seed=0x5AAD):
    """The row-sharded solvers on a 1-device mesh (the shape available on
    this machine) vs the oracle, both kernels, both modes."""
    import jax

    from gf2bv_tpu.core.affine import AffineSpace
    from gf2bv_tpu.parallel import mesh as meshlib
    from gf2bv_tpu.parallel.rowshard_blocked import solve_rowsharded_blocked
    from gf2bv_tpu.parallel.rowshard_tournament import (
        solve_rowsharded_tournament,
    )

    mesh = meshlib.make_mesh(batch=1, rows=jax.device_count())
    rng = np.random.default_rng(seed)
    for i in range(n):
        eqs = _random_system(rng, cols)
        ref = solve_oracle(eqs, cols)
        for name, fn in (
            ("blocked", solve_rowsharded_blocked),
            ("tournament", solve_rowsharded_tournament),
        ):
            got0 = fn(eqs, cols, 0, mesh)
            got1 = fn(eqs, cols, 1, mesh)
            g0 = None if got0 is None else packing.words_to_int(got0)
            g1 = (
                None
                if got1 is None
                else AffineSpace(got1[0], got1[1], cols)
            )
            _check(f"{i}:{name}", ref, g0, g1)
        print(f"[sharded {i}] OK", file=sys.stderr)
    print(f"TPU fuzz [rowsharded 1-dev mesh cols={cols}]: {n} instances OK")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2], 0) if len(sys.argv) > 2 else 0xF022
    main(n, cols=4000, backend="blocked", seed=seed)
    main(n, cols=700, backend="jax", seed=seed ^ 0x11)
    fuzz_batched(max(8, n // 2), seed=seed ^ 0x22)
    fuzz_sharded(max(6, n // 4), seed=seed ^ 0x33)
