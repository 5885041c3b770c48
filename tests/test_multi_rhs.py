"""Multi-RHS solving (ops/multi_rhs + CapturedTrace.solve_raw_batch): many
instances of the SAME coefficient matrix must ride one elimination and come
out bit-identical to per-instance solves."""

import random

import numpy as np
import pytest

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.core import packing
from gf2bv_tpu.crypto.lfsr import GaloisLFSR
from gf2bv_tpu.ops import multi_rhs
from gf2bv_tpu.ops.gauss_ref import solve_oracle


@pytest.mark.parametrize("mode", [0, 1])
def test_multi_rhs_matches_per_instance_oracle(mode):
    rng = np.random.default_rng(60 + mode)
    rows, cols, nb = 180, 150, 37
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    coeff[:, rng.permutation(cols)[:3]] = 0  # dim-3 space
    rhs = []
    for k in range(nb):
        secret = rng.integers(0, 2, size=cols).astype(np.uint8)
        rhs.append((coeff @ secret) % 2)
    rhs = np.stack(rhs).astype(np.uint8)

    # packed coefficient matrix, blocked-solver padding (bit 0 inert)
    eqs = packing.pack_bits(
        np.concatenate([np.zeros((rows, 1), np.uint8), coeff], axis=1),
        1 + cols,
    )
    from gf2bv_tpu.ops.gauss_blocked import K_PANEL, _pad

    a32 = _pad(eqs, K_PANEL, word_align=128)
    got = multi_rhs.solve_multi_rhs(a32, cols, rhs, mode)
    assert len(got) == nb

    for k in range(nb):
        bits = np.concatenate([rhs[k][:, None], coeff], axis=1)
        ref = solve_oracle(packing.pack_bits(bits, 1 + cols), cols)
        assert ref.consistent
        if mode == 0:
            assert got[k] == packing.words_to_int(ref.origin), k
        else:
            assert got[k].origin == packing.words_to_int(ref.origin), k
            assert got[k].basis == [
                packing.words_to_int(b) for b in ref.basis
            ], k


def test_multi_rhs_unsat_flags_per_instance():
    rng = np.random.default_rng(71)
    rows, cols = 140, 100
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    # make the last row dependent so we can plant per-instance contradictions
    coeff[rows - 1] = coeff[0] ^ coeff[1]
    rhs, expect = [], []
    for k in range(16):
        secret = rng.integers(0, 2, size=cols).astype(np.uint8)
        b = (coeff @ secret) % 2
        bad = k % 3 == 2
        if bad:
            b[rows - 1] ^= 1
        rhs.append(b)
        expect.append(bad)
    eqs = packing.pack_bits(
        np.concatenate([np.zeros((rows, 1), np.uint8), coeff], axis=1),
        1 + cols,
    )
    from gf2bv_tpu.ops.gauss_blocked import K_PANEL, _pad

    a32 = _pad(eqs, K_PANEL, word_align=128)
    got = multi_rhs.solve_multi_rhs(a32, cols, np.stack(rhs), 0)
    for k, bad in enumerate(expect):
        assert (got[k] is None) == bad, k


def test_captured_batch_matches_single_solves():
    """CapturedTrace.solve_raw_batch / solve_one_batch vs per-instance
    template solves, including unsat (contradictory duplicate rows) and
    literal-1 (dropped-row) instances."""
    MASK = 0xB4BCD35C
    lin = LinearSystem([32])

    def model(g, p):
        reg = GaloisLFSR(32, MASK, g[0])
        zs = [reg() ^ p[i] for i in range(48)]
        zs.append(g[0].sum() ^ p[48])
        zs.append(g[0].sum() ^ p[49])
        zs.append(g[0][0] ^ g[0][0] ^ p[50])  # zero-coeff row: literal-1 trap
        return zs

    tmpl = lin.capture(model)
    rnd = random.Random(5)
    batch, kinds = [], []
    for k in range(23):
        init = rnd.getrandbits(32) | 1
        reg = GaloisLFSR(32, MASK, init)
        outs = [reg() for _ in range(48)]
        par = bin(init).count("1") & 1
        kind = k % 3  # 0 sat, 1 contradictory parity, 2 literal-1
        vals = outs + [par, par ^ (kind == 1), int(kind == 2)]
        batch.append(vals)
        kinds.append((kind, init))

    raw_batch = tmpl.solve_raw_batch(batch, mode=0)
    sols_batch = tmpl.solve_one_batch(batch)
    for vals, (kind, init), rb, sb in zip(batch, kinds, raw_batch, sols_batch):
        single = tmpl.solve_raw_one(vals)
        assert rb == single, (kind, init)
        if kind == 0:
            assert sb == (init,)
        else:
            assert rb is None and sb is None


def test_captured_batch_mode1_spaces_match():
    lin = LinearSystem([16])

    def model(g, p):
        (v,) = g
        return [v[i] ^ v[i + 4] ^ p[i] for i in range(12)]  # dim-4 space

    tmpl = lin.capture(model)
    rnd = random.Random(8)
    batch = []
    for _ in range(5):
        secret = rnd.getrandbits(16)
        batch.append(
            [((secret >> i) ^ (secret >> (i + 4))) & 1 for i in range(12)]
        )
    spaces = tmpl.solve_raw_batch(batch, mode=1)
    for vals, sp in zip(batch, spaces):
        single = tmpl.solve_raw_space(vals)
        assert sp.dimension == single.dimension == 4
        assert sp.origin == single.origin
        assert sp.basis == single.basis


def test_multi_rhs_multitile_bucket():
    """>4096 instances ride ONE elimination via multiple appended 128-word
    tiles (bw=256 bucket); spot-check instances across the tile boundary
    against the oracle, including a planted unsat."""
    rng = np.random.default_rng(83)
    rows, cols, nb = 96, 80, 4100
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    coeff[rows - 1] = coeff[0] ^ coeff[2]  # dependent row for planted unsat
    secrets = rng.integers(0, 2, size=(nb, cols)).astype(np.uint8)
    rhs = (secrets @ coeff.T) % 2
    bad = {1, 4096, 4099}
    for k in bad:
        rhs[k, rows - 1] ^= 1
    eqs = packing.pack_bits(
        np.concatenate([np.zeros((rows, 1), np.uint8), coeff], axis=1),
        1 + cols,
    )
    from gf2bv_tpu.ops.gauss_blocked import K_PANEL, _pad

    a32 = _pad(eqs, K_PANEL, word_align=128)
    assert multi_rhs._bw_for(nb) == 256  # the 2-tile bucket
    got = multi_rhs.solve_multi_rhs(a32, cols, rhs.astype(np.uint8), 0)
    assert len(got) == nb
    for k in (0, 1, 7, 4095, 4096, 4097, 4099):
        if k in bad:
            assert got[k] is None, k
            continue
        bits = np.concatenate([rhs[k][:, None], coeff], axis=1)
        ref = solve_oracle(packing.pack_bits(bits, 1 + cols), cols)
        assert ref.consistent
        assert got[k] == packing.words_to_int(ref.origin), k


def test_multi_rhs_too_many_instances_rejected():
    with pytest.raises(ValueError, match="at most"):
        multi_rhs._bw_for(multi_rhs.MAX_RHS + 1)


def test_native_multi_rhs_matches_device_path():
    """Host multi-RHS (one gf2_rref, appended RHS words) must agree with
    the device multi-RHS entry instance-for-instance, both modes, including
    unsatisfiable instances."""
    from gf2bv_tpu import _native
    from gf2bv_tpu.core import packing

    if not _native.available():
        pytest.skip("no C compiler")
    rng = np.random.default_rng(71)
    cols, rows, B = 200, 210, 75
    secret = rng.integers(0, 2, size=cols).astype(np.uint8)
    coeff = rng.integers(0, 2, size=(rows, cols)).astype(np.uint8)
    coeff[:, -9:] = 0  # rank-deficient: a 9-dim kernel, so mode-1 bases
    # have content (an empty-basis comparison would be vacuous)
    base_rhs = (coeff @ secret) % 2
    eqs = packing.pack_bits(
        np.concatenate([base_rhs[:, None], coeff], axis=1), 1 + cols
    )
    # instance k: flip k extra random affine bits (some become unsat)
    rhs_bits = np.broadcast_to(base_rhs.astype(np.uint8), (B, rows)).copy()
    flips = rng.integers(0, 2, size=(B, rows)).astype(np.uint8)
    flips[0] = 0  # instance 0 stays the clean system
    rhs_bits ^= flips & (rng.integers(0, 4, size=(B, 1)) == 0)

    from gf2bv_tpu.ops import multi_rhs as mr

    a32 = packing.to_u32(eqs)
    for mode in (0, 1):
        want = mr.solve_multi_rhs(a32, cols, rhs_bits, mode)
        got = _native.solve_multi_rhs_native(eqs, cols, rhs_bits, mode)
        assert len(got) == len(want) == B
        for k, (g, w) in enumerate(zip(got, want)):
            if w is None:
                assert g is None, k
            elif mode == 0:
                assert g == w, k
            else:
                assert g.get(0) == w.get(0), k
                assert g.dimension == w.dimension == 9
                # construction-independent basis comparison via get()
                gb = [g.get(1 << j) ^ g.get(0) for j in range(9)]
                wb = [w.get(1 << j) ^ w.get(0) for j in range(9)]
                assert gb == wb, k
