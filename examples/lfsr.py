"""Recover a 128-bit LFSR state from 256 observed output bits.

Workload parity with ``/root/reference/examples/lfsr.py``: the same widths,
tap masks, and 256-bit keystream, for both the Galois and Fibonacci forms.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR, GaloisLFSR

WIDTH = 128
TAPS = {
    GaloisLFSR: 0x5C2B76970103D4EEFCD4A2C681CC400D,
    FibonacciLFSR: 0x6D6AC812F52A212D5A0B9F3117801FD5,
}


def keystream(reg, nbits):
    return [reg() for _ in range(nbits)]


def recover(lfsr_cls, stream):
    """Equate a symbolic keystream with the observed one and solve."""
    lin = LinearSystem([WIDTH])
    (state0,) = lin.gens()
    sym = lfsr_cls(WIDTH, TAPS[lfsr_cls], state0)
    zeros = [sym() ^ bit for bit in stream]
    return [s for (s,) in lin.solve_all(zeros)]


def main():
    for lfsr_cls in (GaloisLFSR, FibonacciLFSR):
        secret = secrets.randbits(WIDTH)
        stream = keystream(lfsr_cls(WIDTH, TAPS[lfsr_cls], secret), 256)
        found = recover(lfsr_cls, stream)
        print(f"{lfsr_cls.__name__}: secret {secret:#034x} -> recovered {found[0]:#034x}")
        assert found == [secret]


if __name__ == "__main__":
    main()
