"""Clone taus88 / LFSR113 (L'Ecuyer combined Tausworthe) from 6 outputs.

Each 32-bit component is pure shifts/masks/XORs, so the whole generator is
GF(2)-linear (`crypto/taus.py`).  A handful of low initial-state bits never
reach any output (the same bits the published seed thresholds guard), so
the recovery is a solution *space* — dim 8 for taus88, dim 15 for LFSR113 —
and any member replays and predicts the victim exactly.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.taus import (
    LFSR113,
    LFSR113_PARAMS,
    TAUS88_PARAMS,
    Taus88,
    dont_care_dims,
)

CASES = [
    (Taus88, (2, 8, 16), TAUS88_PARAMS),
    (LFSR113, (2, 8, 16, 128), LFSR113_PARAMS),
]


def main():
    for cls, mins, params in CASES:
        secret = [secrets.randbits(32) | m for m in mins]
        victim = cls(list(secret))
        observed = [victim() for _ in range(6)]
        future = [victim() for _ in range(16)]

        lin = LinearSystem([32] * len(mins))
        sym = cls(list(lin.gens()))
        space = lin.solve_raw_space([sym() ^ o for o in observed])
        assert space is not None and space.dimension == dont_care_dims(params)

        clone = cls(list(lin.convert_sol(space.origin)))
        assert [clone() for _ in range(6)] == observed
        predicted = [clone() for _ in range(16)]
        assert predicted == future
        print(
            f"{cls.__name__}: dim-{space.dimension} space from 6 outputs; "
            f"next draws {['%08x' % p for p in predicted[:3]]} match the victim"
        )


if __name__ == "__main__":
    main()
