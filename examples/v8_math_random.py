"""Predict V8's ``Math.random()`` (node / Chrome) from a few observed draws.

The classic real-world application of a GF(2) bitvector solver: V8's
``Math.random`` is xorshift128+ underneath, its double exposes bits
[12, 64) of the post-step ``state0`` (GF(2)-linear in the seed), and the
64-entry cache is consumed in REVERSE generation order.  Five observed
doubles (260 bits) pin the 128-bit state; the recovered state then predicts
every future draw.

Model: gf2bv_tpu/crypto/xorshift.py ``Xorshift128Plus`` / ``V8MathRandom``
(no analog in the reference, which ships MT19937/LFSR/xoshiro only —
``/root/reference/gf2bv/crypto/``).
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.xorshift import V8MathRandom, Xorshift128Plus

# --- the victim: a browser/node process we can sample a few draws from ----
seed0, seed1 = secrets.randbits(64), secrets.randbits(64)
victim = V8MathRandom(seed0, seed1)
observed = [victim.random() for _ in range(5)]
print("observed :", " ".join(f"{d:.6f}" for d in observed))

# --- recovery ---------------------------------------------------------------
# Math.random() pops from the END of a 64-entry cache filled in generation
# order, so observation i is generation step (64 - 1 - i).  Trace the first
# refill symbolically and equate the 52 mantissa bits of the matching steps.
lin = LinearSystem([64, 64])
s0, s1 = lin.gens()
sym = Xorshift128Plus(s0, s1)
sym_outs = [sym.step() for _ in range(V8MathRandom.CACHE_SIZE)]

zeros = [
    sym_outs[V8MathRandom.CACHE_SIZE - 1 - i][12:] ^ V8MathRandom.mantissa(d)
    for i, d in enumerate(observed)
]
rec = lin.solve_one(zeros)
assert rec is not None, "system unsatisfiable?"
rec_s0, rec_s1 = rec
print(f"recovered: state0={rec_s0:#018x} state1={rec_s1:#018x}")
assert (rec_s0, rec_s1) == (seed0, seed1)

# --- replay + predict -------------------------------------------------------
clone = V8MathRandom(rec_s0, rec_s1)
replayed = [clone.random() for _ in range(len(observed))]
assert replayed == observed

predicted = [clone.random() for _ in range(3)]
actual = [victim.random() for _ in range(3)]
print("predicted:", " ".join(f"{d:.6f}" for d in predicted))
assert predicted == actual
print("next 3 Math.random() calls predicted exactly")
