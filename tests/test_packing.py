import numpy as np
import pytest

from gf2bv_tpu.core import packing


@pytest.mark.parametrize("nbits", [1, 31, 32, 33, 63, 64, 65, 1000, 19969])
def test_int_roundtrip(nbits):
    rng = np.random.default_rng(nbits)
    v = int.from_bytes(rng.bytes((nbits + 7) // 8), "little") & ((1 << nbits) - 1)
    w = packing.int_to_words(v, nbits)
    assert packing.words_to_int(w) == v


def test_rows_roundtrip():
    vals = [0, 1, 2**64, 2**100 - 1, 12345678901234567890]
    rows = packing.ints_to_rows(vals, 101)
    assert packing.rows_to_ints(rows) == vals


def test_bit_rows():
    rows = packing.bit_rows(130, np.array([0, 1, 63, 64, 129]))
    ints = packing.rows_to_ints(rows)
    assert ints == [1, 2, 1 << 63, 1 << 64, 1 << 129]


def test_mask_bits_and_pack():
    m = 0b1011001
    bits = packing.mask_bits(7, m)
    assert list(bits) == [1, 0, 0, 1, 1, 0, 1]
    packed = packing.pack_bits(bits[None, :], 7)
    assert packing.rows_to_ints(packed) == [m]


def test_unpack_rows():
    vals = [0b101, (1 << 70) | 1]
    rows = packing.ints_to_rows(vals, 71)
    bits = packing.unpack_rows(rows, 71)
    assert bits[0, 0] == 1 and bits[0, 2] == 1 and bits[0, 1] == 0
    assert bits[1, 0] == 1 and bits[1, 70] == 1


def test_u32_view_layout():
    # bit j of the u64 layout must be bit j%32 of u32 word j//32
    v = (1 << 37) | (1 << 95) | 1
    rows = packing.ints_to_rows([v], 96)
    r32 = packing.to_u32(rows)[0]
    assert r32[0] == 1
    assert r32[1] == 1 << 5  # bit 37 -> word 1, bit 5
    assert r32[2] == 1 << 31  # bit 95 -> word 2, bit 31
    back = packing.from_u32(packing.to_u32(rows))
    assert packing.rows_to_ints(back) == [v]


def test_parity_rows():
    rows = packing.ints_to_rows([0b111, 0b101, 0], 100)
    assert list(packing.parity_rows(rows)) == [1, 0, 0]


def test_split_rows_by_sizes_matches_convert_sol():
    """Vectorized batch split == the reference's per-int convert_sol chain
    (s & mask; s >>= size), incl. >64-bit blocks and the chunked path."""
    import random

    from gf2bv_tpu.core import packing as P

    rng = random.Random(0x5EED)
    for sizes in ([32] * 7, [5, 64, 1, 100, 30], [200], [1] * 65):
        nbits = sum(sizes)
        vals = [rng.getrandbits(nbits) for _ in range(9)]
        rows = P.ints_to_rows(vals, nbits)
        got = P.split_rows_by_sizes(rows, sizes)
        for v, tup in zip(vals, got):
            want = []
            s = v
            for sz in sizes:
                want.append(s & ((1 << sz) - 1))
                s >>= sz
            assert s == 0
            assert tup == tuple(want)


def test_split_rows_by_sizes_rejects_stray_bits():
    import numpy as np
    import pytest

    from gf2bv_tpu.core import packing as P

    rows = P.ints_to_rows([0b1011], 4)
    assert P.split_rows_by_sizes(rows, [2, 2]) == [(0b11, 0b10)]
    bad = P.ints_to_rows([1 << 5], 6)  # bit above sum(sizes)=4
    with pytest.raises(AssertionError):
        P.split_rows_by_sizes(bad, [2, 2])


def test_split_rows_by_sizes_chunking():
    """Force the internal chunk loop (chunk size derives from total bits)."""
    import numpy as np

    from gf2bv_tpu.core import packing as P

    sizes = [17, 47]  # 64 bits/row
    n = 4            # with a tiny chunk budget this still exercises >1 chunk
    rng = np.random.default_rng(3)
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    rows = P.ints_to_rows(vals, 64)
    got = P.split_rows_by_sizes(rows, sizes)
    assert got == [
        (v & ((1 << 17) - 1), v >> 17) for v in vals
    ]
