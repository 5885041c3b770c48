"""Recover the full xoshiro256** state from 10 scrambled outputs.

Workload parity with ``/root/reference/examples/xoshiro.py``: the ``*5,
rotl 7, *9`` scrambler is not GF(2)-linear, so each observed output is
inverted with ``untemper`` first and the system is built on raw ``step()``
outputs.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.xoshiro import Xoshiro256starstar


def main():
    source = Xoshiro256starstar.generate()
    print(f"secret state: {source.s}")
    observed = [source() for _ in range(10)]

    lin = LinearSystem([64] * 4)
    sym = Xoshiro256starstar(lin.gens())
    zeros = [sym.step() ^ Xoshiro256starstar.untemper(o) for o in observed]

    recovered = 0
    for state in lin.solve_all(zeros):
        print(f"recovered:    {list(state)}")
        replay = Xoshiro256starstar(list(state))
        assert [replay() for _ in range(10)] == observed
        recovered += 1
    assert recovered >= 1


if __name__ == "__main__":
    main()
