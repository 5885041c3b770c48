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


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    seed = int(sys.argv[2], 0) if len(sys.argv) > 2 else 0xF022
    main(n, cols=4000, backend="blocked", seed=seed)
    main(n, cols=700, backend="jax", seed=seed ^ 0x11)
