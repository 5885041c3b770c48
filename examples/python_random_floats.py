"""Recover CPython's random.Random state from random() FLOAT outputs.

CPython's ``random.random()`` (Modules/_randommodule.c:random_random) draws
two 32-bit words per call: ``a = genrand() >> 5`` (27 bits),
``b = genrand() >> 6`` (26 bits), returning ``(a*2^26 + b) * 2^-53`` — so
every observed float fixes the top 27 + 26 bits of two consecutive MT words.
That's 53 of 64 bits per pair; ~400 floats overdetermine the 19968-bit
state, which the solver recovers exactly.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import random

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.mt import MT19937
from gf2bv_tpu.utils.timing import timeit

# Truncated-word observations lose rank: 400 floats give rank 17603 and 500
# give 18728 (solve_one then reproduces the observed floats but mispredicts
# the future); the system reaches full rank 19968 at 625 floats.
N_FLOATS = 625

rand = random.Random(20260816)
floats = [rand.random() for _ in range(N_FLOATS)]

# invert the float to the two truncated words
observed = []
for f in floats:
    v = int(f * (1 << 53))
    observed.append((v >> 26, v & ((1 << 26) - 1)))  # (a: 27 bits, b: 26 bits)

with timeit("generate system"):
    lin = LinearSystem([32] * 624)
    mt = lin.gens()
    rng = MT19937(list(mt))
    zeros = []
    for a, b in observed:
        zeros.append((rng.getrandbits(32) >> 5) ^ a)
        zeros.append((rng.getrandbits(32) >> 6) ^ b)
    zeros.append(mt[0] ^ 0x80000000)

# (first run pays a one-time XLA compile for this system shape plus the
# ~85 MB host->device upload; warm solves are ~0.2 s on device)
with timeit("solve_one"):
    sol = lin.solve_one(zeros)

assert sol is not None
recovered = MT19937(list(sol)).to_python_random()
assert [recovered.random() for _ in range(N_FLOATS)] == floats
pred, true = [recovered.random() for _ in range(3)], [rand.random() for _ in range(3)]
assert pred == true, (pred, true)
print(f"state recovered from {N_FLOATS} floats; future outputs predicted:")
print(pred, "==", true)
