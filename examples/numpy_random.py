"""Recover a ``numpy.random.RandomState`` from its outputs.

numpy's legacy RandomState is the same MT19937 core as CPython's
``random`` (one raw genrand word per ``randint(0, 2**32, dtype=uint32)``
draw), so the flagship 19968-variable recovery applies unchanged — a
breadth demo that the generic lazy trace engine covers ecosystem PRNGs,
not just the stdlib.  New-capability example (the reference ships no numpy
interop).
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import numpy as np

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.mt import MT19937
from gf2bv_tpu.utils.timing import timeit


def main():
    source = np.random.RandomState(20260817)
    observed = source.randint(0, 2**32, size=624, dtype=np.uint32)

    lin = LinearSystem([32] * 624)
    words = lin.gens()
    sym = MT19937(list(words))
    with timeit("generate system"):
        zeros = [sym.getrandbits(32) ^ int(o) for o in observed]
    # unlike CPython, numpy's int seeding does NOT pin mt[0] = 0x80000000,
    # and the twist discards mt[0]'s low 31 bits — they influence nothing
    # observable, so the solution space has dimension exactly 31 and ANY
    # member is a perfect clone
    with timeit("solve_raw_space"):
        space = lin.solve_raw_space(zeros)
    assert space.dimension == 31, space.dimension
    state = lin.convert_sol(space.origin)  # canonical member (free bits 0)
    print(f"solution space dim {space.dimension}; clone head: {state[:6]}")

    clone = np.random.RandomState()
    clone.set_state(("MT19937", np.array(state, dtype=np.uint32), 624, 0, 0.0))
    assert np.array_equal(
        clone.randint(0, 2**32, size=624, dtype=np.uint32), observed
    )  # bit-exact replay despite mt[0] differing from the true seed state
    # predict the source's future draws across OTHER consumer methods too
    assert np.array_equal(
        clone.randint(0, 2**32, size=100, dtype=np.uint32),
        source.randint(0, 2**32, size=100, dtype=np.uint32),
    )
    print("numpy RandomState cloned; future outputs predicted")


if __name__ == "__main__":
    main()
