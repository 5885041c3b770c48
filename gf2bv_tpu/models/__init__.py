"""Model library alias: the symbolic PRNG models live in gf2bv_tpu.crypto
(matching the reference's package name); this alias provides the
models-namespace spelling."""

from ..crypto import crc, lfsr, mt, well, xorshift, xoshiro
from ..crypto.crc import CRC32, ReflectedCRC
from ..crypto.lfsr import FibonacciLFSR, GaloisLFSR
from ..crypto.mt import MT19937, MersenneTwister
from ..crypto.well import Well512
from ..crypto.xorshift import Xorshift32, Xorshift64, Xorshift64star, Xorshift128
from ..crypto.xoshiro import Xoshiro256starstar

__all__ = [
    "crc",
    "lfsr",
    "mt",
    "well",
    "xorshift",
    "xoshiro",
    "CRC32",
    "ReflectedCRC",
    "FibonacciLFSR",
    "GaloisLFSR",
    "MT19937",
    "MersenneTwister",
    "Well512",
    "Xorshift32",
    "Xorshift64",
    "Xorshift64star",
    "Xorshift128",
    "Xoshiro256starstar",
]
