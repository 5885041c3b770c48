"""Phase-level profiling of the blocked TPU solver on the MT19937 system.

Times the device RREF (per panel-width K), the separate mode-1 extraction,
and phase 1 alone (phase2="skip"), each best-of-3 with a forced readback
(block_until_ready is asynchronous through the axon tunnel; every number
therefore includes one ~30 ms tunnel round trip).  Companion to bench.py —
use this to see WHERE the solve time goes.
"""

import os, time, random, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import numpy as np, jax, jax.numpy as jnp

from gf2bv_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()

from gf2bv_tpu.core import packing
from gf2bv_tpu.crypto import mt_jax
from gf2bv_tpu.ops import extract_device, gauss_blocked

rand = random.Random(3142)
out = [rand.getrandbits(32) for _ in range(624)]
outs32 = jnp.asarray(np.asarray(out, dtype=np.uint32))

def build():
    eqs = mt_jax.mt19937_system_device(outs32, 32, 624)
    eqs = jnp.concatenate([eqs, jnp.zeros((224, eqs.shape[1]), jnp.uint32)], axis=0)
    return eqs

def force(x):
    return np.asarray(x[0, :1] if x.ndim > 1 else x[:1])

eqs = build(); force(eqs)

import itertools
for K, p1 in itertools.product((128, 256), ("pallas_scan", "pallas_sub")):
    try:
        # warm
        r, pof, inc = gauss_blocked.rref_blocked(eqs, mt_jax.COLS, K, "mxu", p1)
        force(r)
        best_rref = float("inf"); best_fin = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r, pof, inc = gauss_blocked.rref_blocked(eqs, mt_jax.COLS, K, "mxu", p1)
            force(r)
            best_rref = min(best_rref, time.perf_counter() - t0)
            t0 = time.perf_counter()
            raw = extract_device.finalize(r, pof, inc, mt_jax.COLS, 0)
            best_fin = min(best_fin, time.perf_counter() - t0)
        print(f"K={K} p1={p1}: rref={best_rref:.4f}s finalize={best_fin:.4f}s")
        # phase1 alone
        r2, _, _ = gauss_blocked.rref_blocked(eqs, mt_jax.COLS, K, "skip", p1); force(r2)
        t0 = time.perf_counter()
        r2, _, _ = gauss_blocked.rref_blocked(eqs, mt_jax.COLS, K, "skip", p1); force(r2)
        print(f"K={K} p1={p1}: phase1-only={time.perf_counter()-t0:.4f}s")
    except Exception as e:
        print(f"K={K} p1={p1}: FAILED {type(e).__name__}: {e}")
        sys.exit(1)
