"""Model library alias: the symbolic PRNG models live in gf2bv_tpu.crypto
(matching the reference's package name); this alias provides the
models-namespace spelling."""

from ..crypto import lfsr, mt, xoshiro
from ..crypto.lfsr import FibonacciLFSR, GaloisLFSR
from ..crypto.mt import MT19937, MersenneTwister
from ..crypto.xoshiro import Xoshiro256starstar

__all__ = [
    "lfsr",
    "mt",
    "xoshiro",
    "FibonacciLFSR",
    "GaloisLFSR",
    "MT19937",
    "MersenneTwister",
    "Xoshiro256starstar",
]
