"""ctypes loader for the native host engine (native.c).

Plays the role of the reference's C extension + libm4ri on hosts without a
TPU (``/root/reference/gf2bv/_internal.c:359-502`` / ``setup.py:55-73``) —
a from-scratch M4R-family engine, no m4ri code.

Builds the shared library on demand (single-file gcc compile, cached next to
the source keyed by mtime) and exposes numpy-friendly wrappers.  Everything
degrades gracefully: ``lib()`` returns None if no compiler is available and
callers fall back to the pure-numpy/JAX paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "native.c"
_LIB: ctypes.CDLL | None | bool = None  # None = not tried, False = unavailable


def _build() -> Path | None:
    so = _HERE / "libgf2native.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    cmd = [
        "gcc", "-O3", "-march=native", "-funroll-loops", "-fopenmp",
        "-shared", "-fPIC", "-o", str(so), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        # read-only package dir or missing gcc: try a temp dir
        try:
            tmp = Path(tempfile.gettempdir()) / f"libgf2native_{os.getuid()}.so"
            cmd[-2] = str(tmp)
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return tmp
        except Exception:
            return None


def lib() -> ctypes.CDLL | None:
    global _LIB
    if _LIB is None:
        so = _build()
        if so is None:
            _LIB = False
        else:
            L = ctypes.CDLL(str(so))
            L.gf2_rref.restype = ctypes.c_int64
            L.gf2_rref.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int,
            ]
            L.gf2_inconsistent.restype = ctypes.c_int
            L.gf2_inconsistent.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ]
            L.gf2_enumerate.restype = None
            L.gf2_enumerate.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_uint64, ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p,
            ]
            _LIB = L
    return _LIB or None


def available() -> bool:
    return lib() is not None


def rref_native(eqs: np.ndarray, cols: int, trailing: bool = False):
    """In-place-free native RREF.  eqs: (rows, W64) uint64 packed.

    Returns (rref (rows, W64), pof (cols,) int32, inconsistent bool|None).
    trailing=True is the mode-0 fast path (~2x less memory traffic): the
    matrix is then NOT a full RREF in the free columns and satisfiability is
    NOT determined — the flag comes back as None (never False) and callers
    must verify the candidate solution (see solve_native)."""
    L = lib()
    assert L is not None, "native backend unavailable (no gcc?)"
    rows, w = eqs.shape
    a = np.zeros((rows, w + 1), dtype=np.uint64)  # +1 pad word for strip8
    a[:, :w] = eqs
    pof = np.full(cols, -1, dtype=np.int32)
    used = np.zeros(rows, dtype=np.uint8)
    L.gf2_rref(
        a.ctypes.data, rows, w + 1, cols, pof.ctypes.data, used.ctypes.data,
        int(trailing),
    )
    inconsistent = None if trailing else bool(
        L.gf2_inconsistent(a.ctypes.data, rows, w + 1, cols)
    )
    return a[:, :w], pof, inconsistent


def enumerate_native(
    origin: np.ndarray, basis: np.ndarray, start: int, count: int, gray: bool
) -> np.ndarray:
    """Batched affine enumeration on the host (OpenMP)."""
    L = lib()
    assert L is not None
    w = origin.shape[0]
    out = np.empty((count, w), dtype=np.uint64)
    basis = np.ascontiguousarray(basis, dtype=np.uint64)
    origin = np.ascontiguousarray(origin, dtype=np.uint64)
    L.gf2_enumerate(
        origin.ctypes.data, basis.ctypes.data, basis.shape[0], w,
        ctypes.c_uint64(start), count, int(gray), out.ctypes.data,
    )
    return out


def solve_native(eqs: np.ndarray, cols: int, mode: int):
    """m4ri_solve-shaped entry on the native engine (solver.py contract).

    mode 0 runs the trailing update (~2x faster) and verifies the candidate
    origin against the ORIGINAL system by row parity (exactly the TPU
    fused-path contract); mode 1 needs the free columns and does the full
    update."""
    from ..core import packing
    from ..ops import extract

    rref, pof, inconsistent = rref_native(eqs, cols, trailing=(mode == 0))
    if inconsistent:
        return None
    pivot_cols = np.nonzero(pof >= 0)[0].astype(np.int64) + 1
    pivot_rows = rref[pof[pivot_cols - 1]]
    origin = extract.build_origin(pivot_rows, pivot_cols, cols)
    if mode == 0:
        xfull = packing.int_to_words(
            (packing.words_to_int(origin) << 1) | 1, 1 + cols
        )
        if packing.parity_rows(eqs & xfull[None, : eqs.shape[1]]).any():
            return None  # unsat (or any engine bug): origin does not satisfy
        return origin
    return origin, extract.build_basis(pivot_rows, pivot_cols, cols)
