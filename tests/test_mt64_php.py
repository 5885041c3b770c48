"""MT19937-64 and PHP mt_rand models: known vectors + symbolic recovery.

The concrete generators are pinned to external oracles: the C++ standard's
10000th-invocation guarantees for ``std::mt19937`` / ``std::mt19937_64``
([rand.predef]) and the published first output of mt19937-64.c; the PHP
modern mode is cross-checked word-for-word against the MT19937 model (same
seeding, same twist, tempered word >> 1).  Symbolic recovery runs at the
full flagship scale (19968 unknowns) on the native engine route, the same
CI pattern as test_cpu_native_routing.test_mt19937_full_flagship_native.
"""

import pytest

from gf2bv_tpu import LinearSystem, _native
from gf2bv_tpu.crypto.mt import MT19937, MT19937_64
from gf2bv_tpu.crypto.php import MT_RAND_MT19937, MT_RAND_PHP, PHPMtRand
from gf2bv_tpu.ops import lazy_solve


@pytest.fixture
def cpu_native(monkeypatch):
    monkeypatch.setenv("GF2BV_TPU_CPU_NATIVE", "1")
    yield
    lazy_solve.clear_cache()


# --- concrete vectors -------------------------------------------------------


def test_mt19937_std_10000th():
    r = MT19937.from_seed(5489)
    for _ in range(9999):
        r()
    assert r() == 4123659995  # C++ [rand.predef] mt19937 guarantee


def test_mt19937_64_std_vectors():
    r = MT19937_64.from_seed(5489)
    assert r() == 14514284786278117030  # mt19937-64.c published output
    for _ in range(9998):
        r()
    assert r() == 9981545732273789042  # C++ [rand.predef] mt19937_64


def test_mt19937_64_getrandbits_layout():
    # top-k truncation and little-endian multi-word joins at w=64
    a = MT19937_64.from_seed(7)
    b = MT19937_64.from_seed(7)
    words = [b() for _ in range(3)]
    assert a.getrandbits(17) == words[0] >> (64 - 17)
    assert a.getrandbits(100) == words[1] | ((words[2] >> (64 - 36)) << 64)


def test_php_modern_matches_mt19937():
    php = PHPMtRand.from_seed(0xC0FFEE)
    ref = MT19937.from_seed(0xC0FFEE)
    assert all(php.rand_raw() == ref() for _ in range(1500))  # two reloads
    php2 = PHPMtRand.from_seed(0xC0FFEE)
    ref2 = MT19937.from_seed(0xC0FFEE)
    assert all(php2() == ref2() >> 1 for _ in range(700))


def test_php_legacy_twist_differs():
    a = PHPMtRand.from_seed(1234, MT_RAND_PHP)
    b = PHPMtRand.from_seed(1234, MT_RAND_MT19937)
    assert [a() for _ in range(16)] != [b() for _ in range(16)]


def test_php_mt_rand_range_semantics():
    # modern: modulo-rejection; legacy: float bad-scaling; both in range,
    # both deterministic replays of the raw stream
    for mode in (MT_RAND_MT19937, MT_RAND_PHP):
        r1 = PHPMtRand.from_seed(99, mode)
        r2 = PHPMtRand.from_seed(99, mode)
        draws1 = [r1.mt_rand(1, 6) for _ in range(50)]
        draws2 = [r2.mt_rand(1, 6) for _ in range(50)]
        assert draws1 == draws2
        assert all(1 <= d <= 6 for d in draws1)
        assert len(set(draws1)) > 1
    # power-of-two fast path (mask, no rejection) consumes exactly one word
    r = PHPMtRand.from_seed(5)
    ref = PHPMtRand.from_seed(5)
    got = [r.mt_rand(0, 7) for _ in range(20)]
    assert got == [ref.rand_raw() & 7 for _ in range(20)]


def test_php_symbolic_trace_evaluates():
    # cheap symbolic sanity without a solve: evaluate the traced draws at
    # the concrete state and compare (both modes, crossing no reload)
    for mode in (MT_RAND_MT19937, MT_RAND_PHP):
        conc = PHPMtRand.from_seed(31337, mode)
        want = [conc() for _ in range(4)]
        lin = LinearSystem([32] * 624)
        mt = lin.gens()
        sym = PHPMtRand(list(mt), mode)
        sol = tuple(PHPMtRand.from_seed(31337, mode).mt)
        got = [lin.evaluate(sym(), sol) for _ in range(4)]
        assert got == want


# --- full-scale symbolic recovery (native engine route, seconds) ------------

pytestmark_native = pytest.mark.skipif(
    not _native.available(), reason="no native engine (gcc missing)"
)


@pytestmark_native
@pytest.mark.parametrize("mode", [MT_RAND_MT19937, MT_RAND_PHP])
def test_php_full_recovery(cpu_native, mode):
    # Each draw hides the tempered word's LSB, so one generation of draws
    # (624) pins only ~19341/19968 bits; the second generation's draws close
    # the 624 hidden LSBs.  At 1300 draws the residual dimension is exactly
    # the inherent degeneracy: 31 (modern) / 30 (legacy reads mt[0] bit 0) —
    # all unobservable, so any solution predicts every future draw.
    victim = PHPMtRand.from_seed(0xDEAD0000 + mode, mode)
    n_obs = 1300
    observed = [victim() for _ in range(n_obs)]

    lin = LinearSystem([32] * 624)
    sym = PHPMtRand(list(lin.gens()), mode)
    sol = lin.solve_one([sym() ^ o for o in observed])
    assert sol is not None

    clone = PHPMtRand(list(sol), mode)
    assert [clone() for _ in range(n_obs)] == observed
    assert [clone() for _ in range(5)] == [victim() for _ in range(5)]
    assert [clone.mt_rand(1, 100) for _ in range(5)] == [
        victim.mt_rand(1, 100) for _ in range(5)
    ]


@pytestmark_native
def test_mt19937_64_full_recovery(cpu_native):
    victim = MT19937_64.from_seed(0xFEEDFACE)
    n_obs = 316  # 316 * 64 = 20224 bits >= 19968 unknowns
    observed = [victim() for _ in range(n_obs)]

    lin = LinearSystem([64] * 312)
    sym = MT19937_64(list(lin.gens()))
    sol = lin.solve_one([sym() ^ o for o in observed])
    assert sol is not None

    clone = MT19937_64(list(sol))
    assert [clone() for _ in range(n_obs)] == observed
    assert [clone() for _ in range(5)] == [victim() for _ in range(5)]
