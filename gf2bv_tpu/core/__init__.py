from . import packing
from .affine import AffineSpace
from .bitvec import BitVec
from .system import DimensionTooLargeError, LinearSystem, QuadraticSystem

__all__ = [
    "packing",
    "AffineSpace",
    "BitVec",
    "DimensionTooLargeError",
    "LinearSystem",
    "QuadraticSystem",
]
