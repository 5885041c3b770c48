"""MT19937 state recovery from truncated outputs — the headline workload.

Workload parity with ``/root/reference/examples/mt.py``: seed 3142, output
sizes bs in {32, 17, 9, 1, 1337, 137} (word-aligned, sub-word, single-bit,
and multi-word), just enough samples to reach full rank, the known-MSB pin
``mt[0] ^ 0x80000000``, and round-trip verification against both the
symbolic model and CPython's ``random.Random``.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import random

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.mt import MT19937
from gf2bv_tpu.utils.timing import timeit

STATE_BITS = 32 * 624


def sample_count(bs: int) -> int:
    """Samples needed for full rank: truncation to a non-power-of-2 keeps
    every requested bit, power-of-2-aligned sizes lose the rest of the word."""
    kept = bs & (bs - 1) or bs
    return STATE_BITS // kept


def recover(bs: int, samples: int | None = None):
    print(f"--- bs={bs} ---")
    source = random.Random(3142)
    true_state = tuple(source.getstate()[1][:-1])
    observed = [source.getrandbits(bs) for _ in range(samples or sample_count(bs))]

    lin = LinearSystem([32] * 624)
    words = lin.gens()
    sym = MT19937(list(words))
    with timeit("generate system"):
        zeros = [sym.getrandbits(bs) ^ o for o in observed]
        zeros.append(words[0] ^ 0x80000000)  # python always sets the MSB of mt[0]

    with timeit("solve_one"):
        state = lin.solve_one(zeros)
    print(f"recovered state head: {state[:8]}")
    assert state == true_state

    # replaying the recovered state must reproduce everything observed...
    replay = MT19937(list(state))
    clone = replay.to_python_random()
    assert observed == [replay.getrandbits(bs) for _ in range(len(observed))]
    assert observed == [clone.getrandbits(bs) for _ in range(len(observed))]
    # ...and predict the source's future outputs
    assert all(replay.getrandbits(bs) == source.getrandbits(bs) for _ in range(100))


def recover_many_captured(n_instances: int = 5):
    """Many-victim recovery through a CAPTURED trace: the model runs in
    Python exactly once; every further victim costs one values-bind (the
    observed words) plus the fused device solve — the pattern a recovery
    service would run (core/capture.py)."""
    print(f"--- captured trace, {n_instances} instances ---")
    lin = LinearSystem([32] * 624)

    def model(words, p):
        sym = MT19937(list(words))
        return [sym.getrandbits(32) ^ p[i] for i in range(624)] + [
            words[0] ^ 0x80000000
        ]

    with timeit("capture (one-time)"):
        tmpl = lin.capture(model)

    for k in range(n_instances):
        source = random.Random(31337 + k)
        observed = [source.getrandbits(32) for _ in range(624)]
        with timeit(f"instance {k}: bind + solve"):
            state = tmpl.solve_one(observed)
        assert state == tuple(random.Random(31337 + k).getstate()[1][:-1])
        replay = MT19937(list(state))
        assert observed == [replay.getrandbits(32) for _ in range(624)]
    print("all instances recovered (no re-trace after the first)")

    # at scale, batches ride ONE elimination (multi-RHS): every instance is
    # an appended RHS column of the shared coefficient matrix
    nb = 64
    batch = []
    for k in range(nb):
        src = random.Random(52_000 + k)
        batch.append([src.getrandbits(32) for _ in range(624)])
    with timeit(f"multi-RHS batch of {nb}"):
        states = tmpl.solve_one_batch(batch)
    for k, st in enumerate(states):
        assert st == tuple(random.Random(52_000 + k).getstate()[1][:-1])
    print(f"{nb} victims recovered in one elimination")


if __name__ == "__main__":
    for bs in (32, 17, 9, 1):
        recover(bs)
    recover(1337, STATE_BITS // 1337 + 10)
    recover(137, STATE_BITS // 137 + 60)
    recover_many_captured()
