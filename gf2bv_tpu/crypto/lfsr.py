"""Galois / Fibonacci LFSR models, generic over BitVec | int.

Faithful to the reference (``/root/reference/gf2bv/crypto/lfsr.py``): the
feedback select is linearized via ``bit.broadcast`` for the Galois form
(ref lfsr.py:13-17) and tap parity via ``(state & mask).sum()`` reinserted at
the top for the Fibonacci form (ref lfsr.py:31-37).
"""

from __future__ import annotations

from ..core.bitvec import BitVec


class GaloisLFSR:
    def __init__(self, n: int, mask: int, state):
        M = (1 << n) - 1
        self.mask = mask & M
        self.state = state & M

    def __call__(self):
        bit = self.state & 1
        self.state >>= 1
        sel = (
            bit.broadcast(0, len(self.state)) & self.mask
            if isinstance(bit, BitVec)
            else bit * self.mask
        )
        self.state ^= sel
        return bit


class FibonacciLFSR:
    def __init__(self, n: int, mask: int, state):
        self.n = n
        M = (1 << n) - 1
        self.mask = mask & M
        self.state = state & M

    def __call__(self):
        b = self.state & 1
        if isinstance(self.state, BitVec):
            o = (self.state & self.mask).sum()
            self.state = (self.state >> 1) ^ o.zeroext(self.n - 1) << (self.n - 1)
        else:
            self.state = (self.state >> 1) | (
                ((self.state & self.mask).bit_count() & 1) << (self.n - 1)
            )
        return b
