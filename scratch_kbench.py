"""Microbenchmark: phase-2 kernel variants at MT19937 shape (throwaway)."""

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, WP, K = 20224, 1280, 128
KW = K // 32
PANELS = 157


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/panel -> {dt*PANELS:.2f} s total")
    return dt


rng = np.random.default_rng(0)
a = jnp.asarray(rng.integers(0, 2**32, size=(ROWS, WP), dtype=np.uint32))
sel = jnp.asarray(rng.integers(0, 2**32, size=(ROWS, KW), dtype=np.uint32))
pf = jnp.asarray(rng.integers(0, 2**32, size=(K, WP), dtype=np.uint32))

# ---- A: current pallas kernel (row-broadcast per bit) ----------------------
from gf2bv_tpu.ops.pallas_update import panel_update

timeit("A pallas row-bcast", jax.jit(lambda a, s, p: panel_update(a, s, p)), a, sel, pf)


# ---- A2: per-tile bit-plane precompute then lane-broadcast -----------------
def kernel_a2(sel_ref, pf_ref, a_ref, out_ref):
    acc = a_ref[:]
    sel = sel_ref[:]  # (TR, KW)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    # bits: (TR, K) 0/1
    bits = ((sel[:, :, None] >> shifts[None, None, :]) & 1).reshape(acc.shape[0], -1)
    masks = (jnp.uint32(0) - bits).astype(jnp.uint32)
    for jj in range(K):
        acc = acc ^ (masks[:, jj][:, None] & pf_ref[jj, :][None, :])
    out_ref[:] = acc


def run_a2(a, sel, pf, tr=256, tw=640):
    grid = (ROWS // tr, WP // tw)
    return pl.pallas_call(
        kernel_a2,
        out_shape=jax.ShapeDtypeStruct((ROWS, WP), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tr, KW), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, tw), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )(sel, pf, a)


timeit("A2 bitplane", jax.jit(run_a2), a, sel, pf)


# ---- C: MXU bitmatmul with in-kernel parity+pack ---------------------------
def kernel_c(selbits_ref, pfbits_ref, a_ref, out_ref):
    # selbits (TR, K) bf16; pfbits (K, TWB=tw*32) bf16; a (TR, tw) u32
    counts = jnp.dot(
        selbits_ref[:], pfbits_ref[:], preferred_element_type=jnp.float32
    )
    par = counts.astype(jnp.int32) & 1  # (TR, TWB)
    tr, twb = par.shape
    tw = twb // 32
    par3 = par.reshape(tr, tw, 32).astype(jnp.uint32)
    pow2 = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(par3 * pow2, axis=2, dtype=jnp.uint32)
    out_ref[:] = a_ref[:] ^ packed


def run_c(a, selbits, pfbits, tr=256, tw=128):
    twb = tw * 32
    grid = (ROWS // tr, WP // tw)
    return pl.pallas_call(
        kernel_c,
        out_shape=jax.ShapeDtypeStruct((ROWS, WP), jnp.uint32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((tr, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((K, twb), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tr, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tr, tw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )(selbits, pfbits, a)


shifts = jnp.arange(32, dtype=jnp.uint32)


@jax.jit
def unpack_sel(sel):
    return ((sel[:, :, None] >> shifts[None, None, :]) & 1).reshape(ROWS, K).astype(jnp.bfloat16)


@jax.jit
def unpack_pf(pf):
    return ((pf[:, :, None] >> shifts[None, None, :]) & 1).reshape(K, WP * 32).astype(jnp.bfloat16)


selbits = unpack_sel(sel)
pfbits = unpack_pf(pf)
jax.block_until_ready((selbits, pfbits))
timeit("C mxu+pack (kernel only)", jax.jit(run_c), a, selbits, pfbits)


@jax.jit
def run_c_full(a, sel, pf):
    return run_c(a, unpack_sel(sel), unpack_pf(pf))


timeit("C mxu+pack (incl unpack)", run_c_full, a, sel, pf)


# ---- correctness cross-check on small slice -------------------------------
small_a = np.asarray(a[:256, :128])
small_sel = np.asarray(sel[:256])
small_pf = np.asarray(pf[:, :128])
ref = small_a.copy()
for i in range(256):
    s = int(small_sel[i, 0]) | (int(small_sel[i, 1]) << 32) | (int(small_sel[i, 2]) << 64) | (int(small_sel[i, 3]) << 96)
    for jj in range(K):
        if (s >> jj) & 1:
            ref[i] ^= small_pf[jj]
gota = np.asarray(panel_update(jnp.asarray(small_a), jnp.asarray(small_sel), jnp.asarray(small_pf)))
print("A correct:", np.array_equal(gota, ref))
