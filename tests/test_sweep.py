"""Guess-sweep API: every candidate assignment rides ONE elimination.

Oracle: the reference idiom — append ``expr ^ value`` to the zeros and
re-solve per candidate.  Both must agree candidate-for-candidate, including
None for unsatisfiable assignments.
"""

import numpy as np
import pytest

from gf2bv_tpu import LinearSystem, QuadraticSystem
from gf2bv_tpu.core.system import DimensionTooLargeError


def _mt_like(rng, lin, n_eqs):
    """A random well-determined workload: secret + XOR-mask observations."""
    (x,) = lin.gens(lazy=False)
    w = len(x)
    secret = int.from_bytes(rng.bytes(w // 8 + 1), "little") % (1 << w) or 1
    zeros = []
    for _ in range(n_eqs):
        mask = int.from_bytes(rng.bytes(w // 8 + 1), "little") % (1 << w)
        bit = bin(secret & mask).count("1") & 1
        zeros.append((x & mask).sum() ^ bit)
    return secret, zeros


def test_linear_sweep_matches_per_guess_resolve():
    rng = np.random.default_rng(11)
    lin = LinearSystem([48])
    secret, zeros = _mt_like(rng, lin, 44)  # leaves ~4 free dims
    (x,) = lin.gens(lazy=False)

    guesses = [(x >> 5).sum(), ((x >> 9) & 1) ^ ((x >> 30) & 1)]
    got = lin.solve_one_sweep(zeros, guesses)
    assert len(got) == 4
    for k, sol in enumerate(got):
        v0, v1 = k & 1, (k >> 1) & 1
        want = lin.solve_one(list(zeros) + [guesses[0] ^ v0,
                                            guesses[1] ^ v1])
        assert sol == want, (k, sol, want)
    # with enough equations the true assignment must be among the hits
    true0 = bin(secret >> 5).count("1") & 1
    true1 = ((secret >> 9) & 1) ^ ((secret >> 30) & 1)
    assert got[true0 | (true1 << 1)] is not None


def test_sweep_multibit_guess_and_explicit_candidates():
    rng = np.random.default_rng(5)
    lin = LinearSystem([40])
    secret, zeros = _mt_like(rng, lin, 52)  # full rank whp
    (x,) = lin.gens(lazy=False)

    g = (x >> 12) & 0b111  # one 40-bit expr; only low 3 bits vary... width 40
    # use explicit candidates over the full-width guess: value = masked bits
    true_v = (secret >> 12) & 0b111
    cands = [(v,) for v in range(8)]
    got = lin.solve_one_sweep(zeros, [g], cands)
    assert len(got) == 8
    hits = [v for v, s in zip(range(8), got) if s is not None]
    assert hits == [true_v]
    assert got[true_v] == lin.solve_one(zeros)

    with pytest.raises(ValueError):
        lin.solve_one_sweep(zeros, [g], [(1 << 40,)])
    with pytest.raises(ValueError):
        lin.solve_one_sweep(zeros, [g], [(0, 1)])
    with pytest.raises(TypeError):
        lin.solve_one_sweep(zeros, [42], None)
    assert lin.solve_one_sweep(zeros, [g], []) == []


def test_sweep_constant_guess_bit_kept():
    """A zero-coefficient guess row must be KEPT: pinning a constant-0 bit
    to 1 is unsatisfiable, to 0 a no-op (get_eqs_packed drops zero rows;
    the sweep matrix must not)."""
    rng = np.random.default_rng(3)
    lin = LinearSystem([32])
    secret, zeros = _mt_like(rng, lin, 36)
    (x,) = lin.gens(lazy=False)

    const0 = (x ^ x) & 1  # identically zero expression, width 32
    got = lin.solve_one_sweep(zeros, [const0], [(0,), (1,)])
    assert got[0] == lin.solve_one(zeros)
    assert got[1] is None


def test_sweep_unsat_base_system():
    lin = LinearSystem([16])
    (x,) = lin.gens(lazy=False)
    zeros = [(x & 1) ^ 0, (x & 1) ^ 1]  # x0=0 and x0=1
    got = lin.solve_one_sweep(zeros, [(x >> 1) & 1])
    assert got == [None, None]


def test_sweep_chunks_past_max_rhs(monkeypatch):
    from gf2bv_tpu.ops import multi_rhs

    rng = np.random.default_rng(9)
    lin = LinearSystem([24])
    secret, zeros = _mt_like(rng, lin, 26)
    (x,) = lin.gens(lazy=False)
    monkeypatch.setattr(multi_rhs, "MAX_RHS", 4)  # force the chunk loop
    guesses = [(x >> i).sum() for i in (1, 2, 3)]
    got = lin.solve_one_sweep(zeros, guesses)
    assert len(got) == 8
    want = [
        lin.solve_one(list(zeros) + [g ^ ((k >> i) & 1)
                                     for i, g in enumerate(guesses)])
        for k in range(8)
    ]
    assert got == want


def test_sweep_all_returns_shared_space_generators():
    rng = np.random.default_rng(21)
    lin = LinearSystem([32])
    secret, zeros = _mt_like(rng, lin, 29)  # underdetermined
    (x,) = lin.gens(lazy=False)
    gens = lin.solve_all_sweep(zeros, [(x & 1)], max_dimension=8)
    assert len(gens) == 2
    sols = [None if g is None else sorted(g) for g in gens]
    # every enumerated solution must satisfy the pinned bit
    for v, s in enumerate(sols):
        if s is None:
            continue
        for sol in s:
            assert (sol[0] & 1) == v
    # the union over candidates = the unpinned solution set
    union = sorted(sum((s for s in sols if s), []))
    assert union == sorted(lin.solve_all(zeros, max_dimension=9))


def test_quadratic_sweep_consistency_filtered():
    """Sweep over a mul_bit product expression: candidates whose pinned
    product value contradicts the monomial relations must come back None
    via enumeration, not a raw inconsistent point."""
    rng = np.random.default_rng(33)
    n = 6
    qsys = QuadraticSystem([n])
    (x,) = qsys.gens()
    secret = int(rng.integers(1, 1 << n))
    sbits = [(secret >> i) & 1 for i in range(n)]

    # all pairwise product observations except the (2,1) pair, plus the
    # linear bits EXCEPT bits 1/2 — the guess below pins their product
    zeros = []
    for i in range(n):
        for j in range(i):
            if (i, j) == (2, 1):
                continue
            zeros.append(qsys.mul_bit(x[i], x[j]) ^ (sbits[i] & sbits[j]))
    keep_mask = ((1 << n) - 1) ^ 0b110
    zeros.append((x & keep_mask) ^ (secret & keep_mask))

    # guess a product expression's value: only consistent ones may solve
    g = qsys.mul_bit(x[1], x[2])
    true_g = sbits[1] & sbits[2]
    got = qsys.solve_one_sweep(zeros, [g])
    want = [
        qsys.solve_one(list(zeros) + [g ^ v]) for v in (0, 1)
    ]
    assert got == want
    assert got[true_g] == (secret,)

def test_sweep_interior_dead_bits_not_enumerated():
    """A guess like (x >> k) & 0b101 has an interior identically-zero bit:
    default enumeration covers only the LIVE bits (4 candidates, not 8),
    and an explicit candidate setting the dead bit comes back None."""
    rng = np.random.default_rng(13)
    lin = LinearSystem([32])
    secret, zeros = _mt_like(rng, lin, 40)
    (x,) = lin.gens(lazy=False)

    g = (x >> 3) & 0b101  # live bits at expr positions 0 and 2
    got = lin.solve_one_sweep(zeros, [g])
    assert len(got) == 4  # 2 live bits
    true_live = ((secret >> 3) & 1) | ((((secret >> 5) & 1)) << 1)
    assert got[true_live] == lin.solve_one(zeros)
    assert [s is not None for s in got].count(True) == 1

    # explicit candidates use the EXPRESSION's value space: bit 1 is dead
    ex = lin.solve_one_sweep(zeros, [g], [(0b101,), (0b010,), (0b111,)])
    assert ex[1] is None and ex[2] is None  # dead bit pinned to 1
    want_v = secret >> 3 & 0b101
    assert (ex[0] is not None) == (want_v == 0b101)


def test_sweep_native_backend_matches_default():
    from gf2bv_tpu import _native

    if not _native.available():
        pytest.skip("no C compiler")
    rng = np.random.default_rng(17)
    lin = LinearSystem([40])
    secret, zeros = _mt_like(rng, lin, 36)
    lin_nat = LinearSystem([40], backend="native")
    (x,) = lin.gens(lazy=False)
    (xn,) = lin_nat.gens(lazy=False)

    got = lin.solve_one_sweep(zeros, [(x >> 2).sum(), x[7]])
    # rebuild the same workload against the native-backend system
    rngb = np.random.default_rng(17)
    secret_b, zeros_b = _mt_like(rngb, lin_nat, 36)
    assert secret_b == secret
    nat = lin_nat.solve_one_sweep(zeros_b, [(xn >> 2).sum(), xn[7]])
    assert nat == got


def test_captured_trace_sweep_matches_direct():
    """CapturedTrace.solve_one_sweep: bind one instance's outputs, sweep
    guessed bits — must equal the direct-system sweep on the same
    workload, and recover the key from truncated observations."""
    from gf2bv_tpu.crypto.lfsr import GaloisLFSR

    W, TAPS = 48, (1 << 47) | 0b1101
    lin = LinearSystem([W])

    def model(ws, p):
        reg = GaloisLFSR(W, TAPS, ws[0])
        return [reg() ^ p[i] for i in range(W - 6)]  # 6 bits short

    tmpl = lin.capture(model)
    key = 0xBEEF1234CAFE & ((1 << W) - 1) | 1
    reg = GaloisLFSR(W, TAPS, key)
    observed = [reg() for _ in range(W - 6)]

    (x,) = lin.gens(lazy=False)
    guesses = [x[i] for i in range(W - 6, W)]  # the free high bits
    got = tmpl.solve_one_sweep(observed, guesses)
    assert len(got) == 64

    # direct-system oracle
    (xs,) = lin.gens()
    sym = GaloisLFSR(W, TAPS, xs)
    zeros = [sym() ^ o for o in observed]
    want = lin.solve_one_sweep(zeros, guesses)
    assert got == want
    # the true high-bit assignment recovers the key
    true_k = key >> (W - 6)
    assert got[true_k] == (key,)


def test_sweep_adev_cache_hits_across_affine_rebinding():
    """The sweep's device coefficient matrix is cached by coefficient
    content with the (inert) affine bit zeroed: two systems sharing
    coefficients but with DIFFERENT constants must hit one cache entry
    and still solve each to its own (different, correct) answers."""
    from gf2bv_tpu.core import system as sysmod

    rng = np.random.default_rng(17)
    lin = LinearSystem([40])
    secret, zeros = _mt_like(rng, lin, 52)
    (x,) = lin.gens(lazy=False)
    guesses = [(x >> 3) & 1]

    # same structure, flipped constants: XOR 1 into a few zeros
    zeros2 = [z ^ 1 if i < 5 else z for i, z in enumerate(zeros)]

    sysmod._sweep_adev_cache.clear()
    got1 = lin.solve_one_sweep(zeros, guesses)
    n_after_first = len(sysmod._sweep_adev_cache)
    got2 = lin.solve_one_sweep(zeros2, guesses)
    if n_after_first:  # device route taken (0 = native route, no cache)
        assert len(sysmod._sweep_adev_cache) == n_after_first  # cache HIT
    for k in range(2):
        assert got1[k] == lin.solve_one(list(zeros) + [guesses[0] ^ k])
        assert got2[k] == lin.solve_one(list(zeros2) + [guesses[0] ^ k])
    # the flipped-constant system must actually differ somewhere
    assert got1 != got2


def test_sweep_batch_conversion_matches_per_point():
    """_convert_sols_batch (vectorized split) == per-raw convert_sol."""
    rng = np.random.default_rng(23)
    lin = LinearSystem([13, 64, 3])
    raws = [None] + [int(rng.integers(0, 1 << 62)) << 5 | int(v)
                     for v in rng.integers(0, 32, size=6)]
    # keep within 80 bits
    raws = [r if r is None else r % (1 << 80) for r in raws]
    got = lin._convert_sols_batch(raws)
    want = [None if r is None else lin.convert_sol(r) for r in raws]
    assert got == want
