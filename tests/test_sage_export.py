"""The Sage interop path executed for real via an injected fake module.

The reference exercises its Sage export in ``examples/sage_mt.py:33-43``
(cross-checking the exported matrix against its own solver); no Sage exists
in this image, so ``get_sage_mat`` takes a ``_sage`` injection hook and this
test asserts exactly what a real ``sage.all`` would receive — making the
construction lines runtime-covered instead of dead code.
"""

import numpy as np
import pytest

from gf2bv_tpu import LinearSystem


class FakeSage:
    """Duck-typed stand-in for sage.all: records GF/matrix/vector calls."""

    def __init__(self):
        self.calls = []

    def GF(self, p):
        self.calls.append(("GF", p))
        return ("GF", p)

    def matrix(self, field, arr):
        self.calls.append(("matrix", field))
        return ("matrix", field, np.asarray(arr, dtype=np.uint8))

    def vector(self, field, arr):
        self.calls.append(("vector", field))
        return ("vector", field, np.asarray(arr, dtype=np.uint8))


def _toy_system():
    lin = LinearSystem([4, 3])
    a, b = lin.gens(lazy=False)
    zeros = [a ^ 0b1010, b ^ 0b010, a[:3] ^ b]
    return lin, zeros


def test_get_sage_mat_builds_gf2_matrix_and_vector():
    lin, zeros = _toy_system()
    fake = FakeSage()
    mat, vec = lin.get_sage_mat(zeros, _sage=fake)

    assert mat[0] == "matrix" and mat[1] == ("GF", 2)
    assert vec[0] == "vector" and vec[1] == ("GF", 2)

    # the exported pair must be exactly get_mat_numpy's (A, b): Ax = b
    a_np, b_np = lin.get_mat_numpy(zeros)
    assert np.array_equal(mat[2], a_np)
    assert np.array_equal(vec[2], b_np)
    assert mat[2].shape[1] == lin.cols

    # and the export must be solvable: the known solution satisfies it
    sol = lin.solve_one(zeros)
    assert sol is not None
    bits = np.zeros(lin.cols, dtype=np.uint8)
    s = 0
    assert sol == (0b1010, 0b010)
    for v, sz in zip(sol, [4, 3]):
        for i in range(sz):
            bits[s + i] = (v >> i) & 1
        s += sz
    assert np.array_equal((mat[2] @ bits) % 2, vec[2])


def test_get_sage_mat_slow_delegates():
    lin, zeros = _toy_system()
    fake = FakeSage()
    mat, vec = lin.get_sage_mat_slow(zeros, tqdm=lambda x, desc: x, _sage=fake)
    a_np, b_np = lin.get_mat_numpy(zeros)
    assert np.array_equal(mat[2], a_np)
    assert np.array_equal(vec[2], b_np)


def test_get_sage_mat_without_sage_raises_importerror():
    lin, zeros = _toy_system()
    with pytest.raises(ImportError):
        lin.get_sage_mat(zeros)
