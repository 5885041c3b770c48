from . import solver

__all__ = ["solver"]
