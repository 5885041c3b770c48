"""Shared example bootstrap: repo-root imports + persistent compile cache.

Examples are run as scripts (``python examples/foo.py``); this makes the
in-repo package importable and points JAX at the repo's persistent
compilation cache — cold Mosaic/XLA compiles of the big kernels take
minutes through this machine's TPU tunnel and must be paid once, not per
process.
"""

import os
import sys
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
if str(_ROOT) not in sys.path:
    sys.path.insert(0, str(_ROOT))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_ROOT / ".jax_cache"))

# The env var alone is NOT enough on this machine (the axon site hook
# imports jax before user code, freezing the env-derived config), so set it
# through jax.config — see gf2bv_tpu/utils/cache.py.
from gf2bv_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(_ROOT / ".jax_cache")

# GF2BV_FORCE_CPU=1 pins every example to the host CPU backend (the
# JAX_PLATFORMS env var is frozen by the same site hook, so this too must
# go through jax.config).  Useful when no accelerator is reachable and for
# virtual-mesh runs (XLA_FLAGS=--xla_force_host_platform_device_count=N).
if os.environ.get("GF2BV_FORCE_CPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
