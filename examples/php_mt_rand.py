"""Crack PHP's ``mt_rand()`` from raw 31-bit outputs — both engine modes.

PHP's ``mt_rand()`` is MT19937 with the tempered word shifted right once,
and (pre-7.1, or behind ``mt_srand(seed, MT_RAND_PHP)``) a buggy reload
that twists on ``loBit(s[i])`` instead of ``loBit(s[i+1])``.  Both modes
are GF(2)-linear, so ~1300 observed draws (two reload generations — each
draw hides the tempered LSB) pin the 624-word state and every future draw —
including ``mt_rand(min, max)`` range calls — is predicted exactly.  Same attack shape as the flagship CPython MT19937 recovery
(reference: ``/root/reference/examples/mt.py``), on a PRNG the reference
does not model.

Model: gf2bv_tpu/crypto/php.py ``PHPMtRand``.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets
import time

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.php import MT_RAND_MT19937, MT_RAND_PHP, PHPMtRand

# Each mt_rand() hides the tempered word's LSB, so one reload generation of
# draws (624) pins only ~19341 of the 19968 state bits; draws from the NEXT
# generation close the hidden LSBs (~1 bit per extra draw).  1300 draws
# leave exactly the inherent 31/30-bit unobservable degeneracy.
N_OBS = 1300

for mode, name in ((MT_RAND_MT19937, "MT_RAND_MT19937"), (MT_RAND_PHP, "MT_RAND_PHP")):
    # --- the victim: mt_srand(secret), then a stream of mt_rand() draws ----
    seed = secrets.randbits(32)
    victim = PHPMtRand.from_seed(seed, mode)
    observed = [victim() for _ in range(N_OBS)]

    # --- recovery: the post-seed state is 624 unknown 32-bit words ---------
    t0 = time.perf_counter()
    lin = LinearSystem([32] * 624)
    mt = lin.gens()
    sym = PHPMtRand(list(mt), mode)
    zeros = [sym() ^ o for o in observed]
    t1 = time.perf_counter()
    sol = lin.solve_one(zeros)
    t2 = time.perf_counter()
    assert sol is not None, "system unexpectedly unsatisfiable"

    # --- replay from the recovered state: past AND future draws match ------
    clone = PHPMtRand(list(sol), mode)
    assert [clone() for _ in range(N_OBS)] == observed
    future_true = [victim() for _ in range(5)]
    future_pred = [clone() for _ in range(5)]
    assert future_pred == future_true
    # range draws consume raw words, so they are predicted exactly too
    rng_true = [victim.mt_rand(1, 6) for _ in range(8)]
    rng_pred = [clone.mt_rand(1, 6) for _ in range(8)]
    assert rng_pred == rng_true

    print(
        f"{name}: recovered state from {N_OBS} draws "
        f"(trace {t1 - t0:.2f}s, solve {t2 - t1:.2f}s); "
        f"next mt_rand() = {future_pred[0]}, d6 rolls {rng_pred} ok"
    )

print("ok")
