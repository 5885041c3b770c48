"""Marsaglia xorshift family, generic over BitVec | int.

New-capability models (no analog in the reference, which ships MT19937,
LFSRs, and xoshiro256** only — ``/root/reference/gf2bv/crypto/``): the pure
xorshift updates are GF(2)-linear, so state recovery from outputs is a
straight LinearSystem workload.  ``Xorshift64star`` follows the
xoshiro256** pattern (``/root/reference/gf2bv/crypto/xoshiro.py:28-37``):
its multiplicative output scrambler is inverted with a modular inverse
OUTSIDE the system via ``untemper``.
"""

from __future__ import annotations

from ..core.bitvec import BitVec

MASK32 = (1 << 32) - 1
MASK64 = (1 << 64) - 1


def _m32(x):
    return x if isinstance(x, BitVec) else x & MASK32


def _m64(x):
    return x if isinstance(x, BitVec) else x & MASK64


class Xorshift32:
    """x ^= x<<13; x ^= x>>17; x ^= x<<5 (period 2^32-1)."""

    def __init__(self, x):
        self.x = x

    def __call__(self):
        x = self.x
        x = _m32(x ^ (x << 13))
        x = x ^ (x >> 17)
        x = _m32(x ^ (x << 5))
        self.x = x
        return x


class Xorshift64:
    """x ^= x<<13; x ^= x>>7; x ^= x<<17 (period 2^64-1)."""

    def __init__(self, x):
        self.x = x

    def __call__(self):
        x = self.x
        x = _m64(x ^ (x << 13))
        x = x ^ (x >> 7)
        x = _m64(x ^ (x << 17))
        self.x = x
        return x


class Xorshift128:
    """Marsaglia xorshift128: four 32-bit words, period 2^128-1."""

    def __init__(self, s):
        if len(s) != 4:
            raise ValueError("invalid state")
        self.s = list(s)

    def __call__(self):
        x, y, z, w = self.s
        t = _m32(x ^ (x << 11))
        t = t ^ (t >> 8)
        w_new = (w >> 19) ^ w ^ t
        self.s = [y, z, w, w_new]
        return w_new


class Xorshift64star:
    """xorshift64* : linear state update, output = state * M (mod 2^64).

    The multiply is not GF(2)-linear; ``untemper`` inverts it with the
    modular inverse so callers build equations against ``step()`` outputs,
    exactly like the reference handles xoshiro256**'s scrambler."""

    M = 0x2545F4914F6CDD1D
    M_INV = pow(M, -1, 1 << 64)

    def __init__(self, x):
        self.x = x

    def step(self):
        x = self.x
        x = x ^ (x >> 12)
        x = _m64(x ^ (x << 25))
        x = x ^ (x >> 27)
        self.x = x
        return x

    @staticmethod
    def temper(x):
        return (x * Xorshift64star.M) & MASK64

    @staticmethod
    def untemper(out):
        return (out * Xorshift64star.M_INV) & MASK64

    def __call__(self):
        return self.temper(self.step())
