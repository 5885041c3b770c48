"""Trace-cache serialization + pickling (the reference's checkpoint story,
SURVEY.md §5)."""

import pickle

import numpy as np

from gf2bv_tpu import LinearSystem, QuadraticSystem
from gf2bv_tpu.core import packing
from gf2bv_tpu.utils import serialization


def test_save_load_eqs(tmp_path):
    lin = LinearSystem([16])
    (x,) = lin.gens()
    zeros = [x ^ 0xBEEF]
    p = tmp_path / "trace.npz"
    serialization.save_zeros(p, lin, zeros)
    eqs, cols = serialization.load_eqs(p)
    assert cols == 16
    assert np.array_equal(eqs, lin.get_eqs_packed(zeros))
    raw = serialization.solve_saved(p, lin, mode=0)
    assert lin.convert_sol(packing.words_to_int(raw)) == (0xBEEF,)


def test_pickle_quadratic_roundtrip():
    q = QuadraticSystem([6])
    (x,) = q.gens()
    zeros = [q.mul_bit(x[0], x[1]) ^ 1, x ^ 0b111111]
    blob = pickle.dumps((q, zeros))
    q2, z2 = pickle.loads(blob)
    assert q2.solve_one(z2) == (0b111111,)


def test_phase_timers():
    from gf2bv_tpu.utils import profiling

    profiling.reset()
    with profiling.phase("solve"):
        pass
    with profiling.phase("solve"):
        pass
    rep = profiling.phase_report()
    assert rep["solve"]["count"] == 2
