"""Pallas per-call launch-floor probe (round 5).

The w0 sweep fit (scripts/bench_subtile.py) prices a panel update at
0.179 ms fixed + 0.091 ms per live 128-word tile.  The slope is MXU
compute; this probe asks what the FIXED part is made of by chaining
kernels of decreasing size:

  tiny    : (256, 128) u32 pass-through copy, grid (1, 1)
  1-tile  : the real rank-K body on one (256-row, 128-word) tile
  update1 : the real panel update at rows=20224, ONE live tile

If `tiny` costs ~the same as the fit's fixed floor, the floor is Mosaic
launch/prologue and no kernel restructuring can reclaim it short of
fewer-kernels-per-solve (mxu_la tried that: Mosaic serializes, BASELINE
round-4 ledger).

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_launch_floor.py
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from gf2bv_tpu.utils.cache import enable_persistent_cache

enable_persistent_cache(Path(__file__).resolve().parent.parent / ".jax_cache")

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 256  # chained calls per jit


def log(*a):
    print(*a, flush=True)


def best_of(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def _copy_kernel(a_ref, out_ref):
    out_ref[:] = a_ref[:] ^ jnp.uint32(1)


def tiny_call(a):
    return pl.pallas_call(
        _copy_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=(1, 1),
            in_specs=[pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(a.shape, lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(a)


@functools.partial(jax.jit, static_argnames=("n",))
def tiny_chain(a, n):
    return lax.fori_loop(0, n, lambda i, a: tiny_call(a), a)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(7)
    small = jnp.zeros((8,), jnp.uint32)
    np.asarray(small[:1])
    rtt, _ = best_of(lambda: np.asarray(small[:1]), 7)
    log(f"rtt {rtt * 1e3:.1f} ms, chain N={N}")

    a = jnp.asarray(
        rng.integers(0, 1 << 32, size=(256, 128), dtype=np.uint64
                     ).astype(np.uint32)
    )
    np.asarray(tiny_chain(a, N)[0, :1])  # warm
    t, ts = best_of(lambda: np.asarray(tiny_chain(a, N)[0, :1]))
    log(f"tiny pass-through kernel: {(t - rtt) / N * 1e3:.4f} ms/call "
        f"(chain {[round(x * 1e3, 1) for x in ts]})")

    # the real update at rows=256 (one row tile), one live word tile
    from gf2bv_tpu.ops import pallas_update

    sel = jnp.asarray(
        rng.integers(0, 1 << 32, size=(256, 8), dtype=np.uint64
                     ).astype(np.uint32)
    )
    pf = jnp.asarray(
        rng.integers(0, 1 << 32, size=(256, 128), dtype=np.uint64
                     ).astype(np.uint32)
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def one_tile_chain(a, n):
        return lax.fori_loop(
            0, n, lambda i, a: pallas_update.panel_update_mxu(a, sel, pf), a
        )

    np.asarray(one_tile_chain(a, N)[0, :1])
    t, ts = best_of(lambda: np.asarray(one_tile_chain(a, N)[0, :1]))
    log(f"1-row-tile 1-word-tile rank-256 update: "
        f"{(t - rtt) / N * 1e3:.4f} ms/call "
        f"(chain {[round(x * 1e3, 1) for x in ts]})")


if __name__ == "__main__":
    main()
