"""Warm-up: invert a toy 128-bit mixing function.

Workload parity with the reference example (``/root/reference/examples/
simple.py``): the same ``magic`` mixer, solved both as a homogeneous system
(all-zero outputs) and as an affine one (outputs of a random secret), with
``solve_all`` / ``solve_one`` / ``evaluate`` round-trip checks.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets

from gf2bv_tpu import LinearSystem

_M64 = (1 << 64) - 1


def magic(x, y):
    """The mixer under attack — every step is GF(2)-linear in (x, y)."""
    a = ((x ^ (y >> 22) ^ (x << 13)) & _M64) >> 3
    b = ((y ^ (x >> 7) ^ (y << 5)) & _M64) >> 3
    c = (x ^ y) & 0b101101
    return a, b, c


def recover(observed, *, check_homogeneous=False):
    """Build the symbolic system for ``magic`` and recover all preimages of
    ``observed``; every recovered point must reproduce it."""
    lin = LinearSystem((64, 64))
    sym_outputs = magic(*lin.gens())
    zeros = [s ^ o for s, o in zip(sym_outputs, observed)]

    if check_homogeneous:
        # with observed == 0 the system has no affine terms at all
        assert not any(eq & 1 for eq in lin.get_eqs(zeros)), "system is not linear"

    count = 0
    for point in lin.solve_all(zeros):
        print(f"  preimage: {point}")
        assert magic(*point) == observed
        count += 1

    one = lin.solve_one(zeros)
    assert magic(*one) == observed
    assert all(lin.evaluate(z, one) == 0 for z in zeros)
    return count


def main():
    print("homogeneous (zero outputs):")
    n = recover((0, 0, 0), check_homogeneous=True)
    print(f"  {n} solution(s)")

    secret = (secrets.randbits(64), secrets.randbits(64))
    print(f"affine (secret {secret}):")
    n = recover(magic(*secret))
    print(f"  {n} solution(s)")


if __name__ == "__main__":
    main()
