"""Device-built MT19937 system must equal the generic host trace bit-exactly,
and the end-to-end device pipeline must recover the state."""

import random

import numpy as np
import pytest

import jax.numpy as jnp

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.core import packing
from gf2bv_tpu.crypto.mt import MT19937
from gf2bv_tpu.crypto import mt_jax


@pytest.mark.parametrize(
    "bs,samples", [(32, 624), (17, 1174), (9, 2218), (1, 1000), (1337, 14), (137, 100)]
)
def test_device_system_matches_host_trace(bs, samples):
    rand = random.Random(3142)
    out = [rand.getrandbits(bs) for _ in range(samples)]

    lin = LinearSystem([32] * 624)
    mt = lin.gens()
    rng = MT19937(list(mt))
    zeros = [rng.getrandbits(bs) ^ o for o in out] + [mt[0] ^ 0x80000000]
    host_eqs32 = packing.to_u32(lin.get_eqs_packed(zeros))

    wpc = -(-bs // 32)
    if wpc == 1:
        outs32 = jnp.asarray(np.asarray(out, dtype=np.uint32))
    else:
        arr = np.zeros((samples, wpc), np.uint32)
        for i, v in enumerate(out):
            for j in range(wpc):
                arr[i, j] = (v >> (32 * j)) & 0xFFFFFFFF
        outs32 = jnp.asarray(arr)
    dev = np.asarray(mt_jax.mt19937_system_device(outs32, bs, samples))
    # host trace drops all-zero rows; device keeps them — compare nonzero rows
    # in order (row order is otherwise identical by construction)
    devnz = dev[dev.any(axis=1)]
    assert devnz.shape[0] == host_eqs32.shape[0]
    assert np.array_equal(devnz[:, : host_eqs32.shape[1]], host_eqs32)
    assert not dev[:, host_eqs32.shape[1]:].any()


@pytest.mark.slow
def test_solve_mt19937_device_pipeline():
    rand = random.Random(777)
    st = tuple(rand.getstate()[1][:-1])
    out = [rand.getrandbits(32) for _ in range(624)]
    sol = mt_jax.solve_mt19937(out, bs=32)
    assert sol == st


@pytest.mark.slow
def test_solve_mt19937_batch_device_pipeline():
    states, outs = [], []
    for seed in (101, 202, 303):
        rand = random.Random(seed)
        states.append(tuple(rand.getstate()[1][:-1]))
        outs.append([rand.getrandbits(32) for _ in range(624)])
    got = mt_jax.solve_mt19937_batch(outs, bs=32)
    assert got == states
