"""Lazy trace engine (core/lazy.py + ops/lazy_solve.py).

Differential strategy: RREF is unique, so the lazy device-cached route must
agree bit-for-bit with the eager host route — on the packed equations, the
affine split, and the solver outputs.
"""

import random
import secrets

import numpy as np
import pytest

from gf2bv_tpu import BitVec, LinearSystem, QuadraticSystem
from gf2bv_tpu.core import lazy
from gf2bv_tpu.core.lazy import LazyBitVec
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR, GaloisLFSR
from gf2bv_tpu.crypto.mt import MersenneTwister
from gf2bv_tpu.crypto.xoshiro import Xoshiro256starstar
from gf2bv_tpu.ops import lazy_solve


def _mini_mt(state):
    return MersenneTwister(
        state, 16, 24, 13, 7, 0x9908, 7, 0xFFFF, 5, 0x9D2C, 4, 0xEFC6, 9
    )


def _trace_pairs():
    """(name, zeros_lazy, zeros_eager) for several model families."""
    pairs = []

    for lazy_flag in (True, False):
        rows = {}
        lin = LinearSystem([128])
        (s,) = lin.gens(lazy=lazy_flag)
        reg = GaloisLFSR(128, 0x5C2B76970103D4EEFCD4A2C681CC400D, s)
        rows["galois"] = [reg() ^ (i & 1) for i in range(64)]

        lin = LinearSystem([128])
        (s,) = lin.gens(lazy=lazy_flag)
        reg = FibonacciLFSR(128, 0x6D6AC812F52A212D5A0B9F3117801FD5, s)
        rows["fibonacci"] = [reg() ^ 1 for _ in range(64)]

        lin = LinearSystem([64] * 4)
        x = Xoshiro256starstar(lin.gens(lazy=lazy_flag))
        rows["xoshiro"] = [x.step() ^ 12345 for _ in range(6)]

        lin = LinearSystem([16] * 24)
        m = _mini_mt(list(lin.gens(lazy=lazy_flag)))
        rows["mt_multiword"] = [
            m.getrandbits(16) ^ 7,
            m.getrandbits(37) ^ (1 << 36),
            m.getrandbits(5) ^ 3,
        ]
        pairs.append(rows)
    return pairs[0], pairs[1]


def test_lazy_trace_matches_eager():
    lazy_rows, eager_rows = _trace_pairs()
    lin = LinearSystem([1])  # packing host, any instance works for stacking
    for name in lazy_rows:
        a = np.concatenate([z.rows for z in lazy_rows[name]])
        b = np.concatenate([z.rows for z in eager_rows[name]])
        assert np.array_equal(a, b), name
        assert all(isinstance(z, LazyBitVec) for z in lazy_rows[name])


def test_affine_split_reconstructs_full_trace():
    lazy_rows, _ = _trace_pairs()
    for name, zeros in lazy_rows.items():
        exprs = [z._expr for z in zeros]
        full = lazy.materialize_many(exprs, strip_consts=False)
        strip = lazy.materialize_many(exprs, strip_consts=True)
        affs = lazy.affine_many(exprs)
        for f, s, a in zip(full, strip, affs):
            w = f.shape[0]
            abits = np.unpackbits(
                np.frombuffer(a.to_bytes((w + 7) // 8, "little"), np.uint8),
                bitorder="little",
            )[:w]
            got = s.copy()
            got[:, 0] = (got[:, 0] & ~np.uint64(1)) | abits.astype(np.uint64)
            assert np.array_equal(got, f), name


def test_struct_key_ignores_xor_constants():
    def build(out_words):
        lin = LinearSystem([16] * 24)
        m = _mini_mt(list(lin.gens()))
        return [m() ^ o for o in out_words]

    za = build([1, 2, 3])
    zb = build([4000, 5000, 6000])
    ka = lazy.struct_key([z._expr for z in za])
    kb = lazy.struct_key([z._expr for z in zb])
    assert ka == kb
    # a structural change (different AND mask) must change the key
    lin = LinearSystem([16] * 24)
    (g0, *_) = lin.gens()
    assert lazy.struct_key([(g0 & 0x0F0F)._expr]) != lazy.struct_key(
        [(g0 & 0x0F0E)._expr]
    )


def test_solve_lazy_matches_oracle_solution():
    rand = random.Random(1337)
    secret = [rand.getrandbits(16) for _ in range(24)]
    rng = _mini_mt(list(secret))
    outs = [rng() for _ in range(48)]

    lin = LinearSystem([16] * 24)
    sym = _mini_mt(list(lin.gens()))
    zeros = [sym() ^ o for o in outs]
    assert all(isinstance(z, LazyBitVec) for z in zeros)

    from gf2bv_tpu.ops import solver

    want = solver.solve(lin.get_eqs_packed(zeros), lin.cols, 0, backend="oracle")
    got = lazy_solve.solve_lazy(lin, zeros, 0)
    assert got == want  # RREF is unique -> identical raw origin

    sol = lin.solve_one(zeros)
    replay = _mini_mt(list(sol))
    assert [replay() for _ in range(len(outs))] == outs


def test_solve_lazy_cache_hit_across_instances():
    lazy_solve.clear_cache()

    def solve_for(seed):
        rand = random.Random(seed)
        secret = [rand.getrandbits(16) for _ in range(24)]
        rng = _mini_mt(list(secret))
        outs = [rng() for _ in range(48)]
        lin = LinearSystem([16] * 24)
        sym = _mini_mt(list(lin.gens()))
        sol = lin.solve_one([sym() ^ o for o in outs])
        replay = _mini_mt(list(sol))
        assert [replay() for _ in range(len(outs))] == outs

    solve_for(1)
    assert len(lazy_solve._CACHE) == 1
    solve_for(2)
    assert len(lazy_solve._CACHE) == 1  # same structure -> no new entry


def test_cache_key_includes_backend():
    """A structure cached under one backend must not hijack a solve that
    explicitly requests another."""
    lazy_solve.clear_cache()

    def zeros_for(backend):
        lin = LinearSystem([16], backend=backend)
        (v,) = lin.gens()
        return lin, [v ^ 0x1234, (v >> 3) ^ 0x0101]

    lin_b, zb = zeros_for("blocked")
    lin_j, zj = zeros_for("jax")
    sol_b = lin_b.solve_one(zb)
    n = len(lazy_solve._CACHE)
    sol_j = lin_j.solve_one(zj)
    assert sol_b == sol_j  # RREF unique across backends
    assert len(lazy_solve._CACHE) == n + 1  # distinct entries per backend
    kinds = {cs.backend for cs in lazy_solve._CACHE.values()}
    assert kinds == {"blocked", "jax"}


def test_lazy_unsat_paths():
    lin = LinearSystem([8])
    (v,) = lin.gens()
    # literal 1: zero coefficients, affine bit set -> host-side early None
    assert lin.solve_one([(v ^ v) ^ 1]) is None
    # contradictory equations -> device-side inconsistency
    lin2 = LinearSystem([8])
    (w,) = lin2.gens()
    assert lin2.solve_one([w ^ 3, w ^ 5]) is None
    # all-zero rows only -> dropped, full space remains
    lin3 = LinearSystem([4])
    (u,) = lin3.gens()
    sols = list(lin3.solve_all([u ^ u]))
    assert len(sols) == 16


def test_lazy_solve_all_matches_eager():
    def magic(x, y):
        m = (1 << 64) - 1
        a = ((x ^ (y >> 22) ^ (x << 13)) & m) >> 3
        b = ((y ^ (x >> 7) ^ (y << 5)) & m) >> 3
        return a, b, (x ^ y) & 0b101101

    inp = (secrets.randbits(64), secrets.randbits(64))
    target = magic(*inp)

    def all_sols(lazy_flag):
        lin = LinearSystem((64, 64))
        xs, ys = lin.gens(lazy=lazy_flag)
        zeros = [s ^ o for s, o in zip(magic(xs, ys), target)]
        return sorted(lin.solve_all(zeros))

    got, want = all_sols(True), all_sols(False)
    assert got == want and len(got) == 8
    assert all(magic(*s) == target for s in got)


def test_lazy_full_op_surface_matches_eager():
    """Random op sequences over the ENTIRE recorded surface (including ops
    no crypto model uses: rotr, zeroext, signext, dup, mod, or-const,
    fancy/negative indexing) must materialize identically to eager."""
    rng = random.Random(2024)

    def apply(op_seed, v, width):
        r = random.Random(op_seed)
        for _ in range(12):
            w = len(v)
            op = r.randrange(12)
            if op == 0:
                v = v ^ r.getrandbits(w)
            elif op == 1:
                v = v >> r.randrange(0, w + 2)
            elif op == 2:
                v = v << r.randrange(0, w + 2)
            elif op == 3:
                v = v & r.getrandbits(w)
            elif op == 4:
                v = v | r.getrandbits(w)
            elif op == 5:
                v = v.rotr(r.randrange(1, w)) if w > 1 else v
            elif op == 6:
                v = v.rotl(r.randrange(1, w)) if w > 1 else v
            elif op == 7:
                v = v.zeroext(r.randrange(1, 5))
            elif op == 8:
                v = v.signext(r.randrange(1, 5))
            elif op == 9 and w <= 24:
                v = v.dup(2)
            elif op == 10:
                v = v[[r.randrange(-w, w) for _ in range(min(w, 8))]]
            elif op == 11:
                v = v.sum().broadcast(0, r.randrange(1, 9))
            if len(v) > 96:
                v = v[: 48]
        return v

    for trial in range(8):
        seed = rng.getrandbits(32)
        lin_l = LinearSystem([24])
        lin_e = LinearSystem([24])
        (vl,) = lin_l.gens(lazy=True)
        (ve,) = lin_e.gens(lazy=False)
        got = apply(seed, vl, 24)
        want = apply(seed, ve, 24)
        assert isinstance(got, LazyBitVec), trial
        assert np.array_equal(got.rows, want.rows), trial
        # and the affine split must reconstruct the materialized bit0
        (aff,) = lazy.affine_many([got._expr])
        bits = (want.rows[:, 0] & np.uint64(1)).astype(np.uint8)
        assert aff == int.from_bytes(
            np.packbits(bits, bitorder="little").tobytes(), "little"
        ), trial


def test_lazy_bitvec_is_a_bitvec_everywhere():
    """Inherited eager behaviors must keep working via materialization."""
    lin = LinearSystem([16])
    (v,) = lin.gens()
    w = (v ^ 0xABCD) & 0xFF0F
    assert isinstance(w, BitVec) and isinstance(w, LazyBitVec)
    # _bits view, evaluate, pickling
    assert len(w._bits) == 16
    assert w.evaluate(0x1234) == ((0x1234 ^ 0xABCD) & 0xFF0F)
    import pickle

    w2 = pickle.loads(pickle.dumps(w))
    assert np.array_equal(w2.rows, w.rows)
    # slicing/indexing parity with eager
    (ve,) = lin.gens(lazy=False)
    we = (ve ^ 0xABCD) & 0xFF0F
    for key in (slice(3, 11), slice(None, None, 2), -1, 5, [0, 3, 15]):
        assert np.array_equal(w[key].rows, we[key].rows), key


def test_lazy_quadratic_interop():
    """QuadraticSystem flows: lazy gens record mulq nodes whose
    materialization is bit-identical to the eager path."""
    qsys = QuadraticSystem([8])
    (x,) = qsys.gens(lazy=True)
    assert isinstance(x, LazyBitVec)
    (xe,) = qsys.gens(lazy=False)
    # quadratic gens default LAZY like LinearSystem (mulq recording makes
    # the reference's per-bit idiom evaluate in one shared walk)
    assert isinstance(qsys.gens()[0], LazyBitVec)
    prod = qsys.mul_bit(x[0], x[1])  # recorded, materialized on .rows
    assert isinstance(prod, LazyBitVec)
    want = qsys.mul_bit(xe[0], xe[1])
    assert np.array_equal(prod.rows, want.rows)
    got = qsys.mul_bits(x[:4], x[4:8] >> 1)
    want2 = qsys.mul_bits(xe[:4], xe[4:8] >> 1)
    assert np.array_equal(got.rows, want2.rows)
