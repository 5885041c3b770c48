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


def test_matrix_png_roundtrip(tmp_path):
    """The PNG visualizer emits a valid 1-bit grayscale PNG whose pixel
    bits decode back to the coefficient matrix."""
    import struct
    import zlib

    import numpy as np

    from gf2bv_tpu import LinearSystem
    from gf2bv_tpu.core import packing
    from gf2bv_tpu.utils import matviz

    lin = LinearSystem([8, 8])
    x, y = lin.gens()
    zeros = [x ^ 0xA5, y ^ 0x3C, x ^ y]
    png = matviz.system_matrix_png(lin, zeros)

    assert png.startswith(b"\x89PNG\r\n\x1a\n")
    # parse IHDR
    assert png[12:16] == b"IHDR"
    w, h, depth, ctype = struct.unpack(">IIBB", png[16:26])
    eqs = lin.get_eqs_packed(zeros)
    bits = packing.unpack_rows(eqs, 1 + lin.cols)
    assert (h, w, depth, ctype) == (*bits.shape, 1, 0)
    # parse IDAT and decode scanlines
    idat_off = png.index(b"IDAT")
    (ln,) = struct.unpack(">I", png[idat_off - 4 : idat_off])
    raw = zlib.decompress(png[idat_off + 4 : idat_off + 4 + ln])
    stride = 1 + (w + 7) // 8
    got = np.zeros((h, w), np.uint8)
    for r in range(h):
        line = raw[r * stride : (r + 1) * stride]
        assert line[0] == 0  # filter: none
        px = np.unpackbits(
            np.frombuffer(line[1:], np.uint8), bitorder="big"
        )[:w]
        got[r] = 1 - px  # black (0) = bit set
    assert np.array_equal(got, bits)

    p = tmp_path / "mat.png"
    matviz.save_matrix_png(lin, zeros, str(p))
    assert p.read_bytes() == png
