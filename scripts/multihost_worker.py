"""Worker for the multi-host smoke test: N processes x 4 CPU devices."""
import os, sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

pid = int(sys.argv[1]); nproc = int(sys.argv[2])
port = int(sys.argv[3]) if len(sys.argv) > 3 else 17731
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
)
import numpy as np
from gf2bv_tpu.core import packing
from gf2bv_tpu.ops import solver
from gf2bv_tpu.parallel import mesh as meshlib
from gf2bv_tpu.parallel.rowshard_blocked import solve_rowsharded_blocked
from gf2bv_tpu.parallel.rowshard_tournament import solve_rowsharded_tournament

assert jax.device_count() == 4 * nproc, jax.devices()
cols = 96
rng = np.random.default_rng(42)
secret = rng.integers(0, 2, size=cols).astype(np.uint8)
coeff = rng.integers(0, 2, size=(128, cols)).astype(np.uint8)
rhs = (coeff @ secret) % 2
bits = np.concatenate([rhs[:, None], coeff], axis=1)
eqs = packing.pack_bits(bits, 1 + cols)

mesh = meshlib.make_mesh(batch=1, rows=jax.device_count())
want = solver.solve(eqs, cols, 0, backend="oracle")
got = solve_rowsharded_blocked(eqs, cols, 0, mesh, k_panel=64)
assert packing.words_to_int(got) == want, "multi-process sharded solve mismatch"
got_t = solve_rowsharded_tournament(eqs, cols, 0, mesh, k_panel=64)
assert packing.words_to_int(got_t) == want, "multi-process tournament mismatch"
print(f"proc {pid}: OK ({jax.process_count()} processes, {jax.device_count()} devices)", flush=True)
