"""Test config: force JAX onto an 8-device virtual CPU mesh.

Real-TPU benchmarking happens in bench.py; tests must run anywhere and must
exercise the multi-device sharding paths, so we ask XLA for 8 host devices
(the standard way to test jax.sharding code without hardware).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# the suite's job is to exercise the TPU code paths on the virtual mesh, so
# force auto-routing onto blocked/jax here (hard assignment, like the
# platform pin below: an exported =1 must not silently reroute the suite);
# the CPU->native preference has its own tests (test_cpu_native_routing.py)
os.environ["GF2BV_TPU_CPU_NATIVE"] = "0"

# The machine's site hook pins JAX_PLATFORMS to the TPU tunnel plugin and
# ignores the env override, so force the platform through jax.config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
