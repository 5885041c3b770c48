"""CPU fuzz soak: every tpu_fuzz family on the 8-virtual-device mesh.

scripts/tpu_fuzz.py is written for the real chip (it inherits whatever
platform JAX resolves); this wrapper pins the process to the host CPU with
8 virtual devices (the test-suite configuration) and runs a scaled-down
pass of every family — the standing soak for TPU-less boxes and CI-like
validation between hardware windows.  GF2BV_TPU_CPU_NATIVE is forced off
so the families exercise the device code paths they were written for (the
native route has its own family, run last).

Usage: python scripts/cpu_soak.py [scale] [seed]
  scale (default 1): multiplies every family's instance count.
"""

import importlib.util
import os
import sys
from pathlib import Path

# append-if-missing (conftest pattern): a pre-set XLA_FLAGS must not
# silently drop the virtual devices — single-device meshes can't reproduce
# the multi-shard bug class this soak exists to catch
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["GF2BV_TPU_CPU_NATIVE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

_SCRIPT = Path(__file__).resolve().parent / "tpu_fuzz.py"
spec = importlib.util.spec_from_file_location("tpu_fuzz", _SCRIPT)
m = importlib.util.module_from_spec(spec)
sys.modules["tpu_fuzz"] = m
spec.loader.exec_module(m)


def main(scale: int = 1, seed: int = 0x5A4B) -> None:
    m.main(6 * scale, cols=2000, backend="blocked", seed=seed)
    m.main(8 * scale, cols=700, backend="jax", seed=seed ^ 0x11)
    m.fuzz_batched(6 * scale, seed=seed ^ 0x22)
    m.fuzz_sharded(4 * scale, seed=seed ^ 0x33)
    m.fuzz_lazy(8 * scale, seed=seed ^ 0x44)
    m.fuzz_quad(4 * scale, seed=seed ^ 0x55)
    m.fuzz_capture(4 * scale, seed=seed ^ 0x66)
    m.fuzz_multi_rhs(3 * scale, seed=seed ^ 0x77)
    m.fuzz_multi_rhs_multitile(1 * scale, seed=seed ^ 0x88)
    m.fuzz_mrhs_sharded(3 * scale, seed=seed ^ 0xF1)
    m.fuzz_sweep(4 * scale, seed=seed ^ 0x99)
    m.fuzz_captured_sweep(2 * scale, seed=seed ^ 0xAA)
    m.fuzz_native_route(12 * scale, seed=seed ^ 0xBB)
    m.fuzz_incremental(4 * scale, seed=seed ^ 0xCC)
    m.fuzz_engines(1 * scale, seed=seed ^ 0xDD)
    print("CPU SOAK COMPLETE")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 1,
        int(sys.argv[2], 0) if len(sys.argv) > 2 else 0x5A4B,
    )
