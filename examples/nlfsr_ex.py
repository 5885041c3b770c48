"""NLFSR attack with trace caching + DimensionTooLargeError bruteforce.

Port of ``/root/reference/examples/nlfsr_ex.py``: demonstrates (a) pickling
the traced (input-independent) system for reuse, (b) recovering from an
oversized solution space by guessing bits with ``bit_assert``, and (c) the
TPU addition — solving all guess subsystems as ONE batched device call."""

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # repo-root run

import gzip
import itertools
import pickle
import secrets
import traceback
from pathlib import Path

from nlfsr import mask, n, non_linear_output, select

from gf2bv_tpu import DimensionTooLargeError, QuadraticSystem
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR, GaloisLFSR
from gf2bv_tpu.parallel.batch import solve_batch_systems


def nlfsr_ex_test(LFSR, batched_guessing: bool = True):
    print(f"Testing {LFSR.__name__}")

    # not 2**14 + 1000: we want DimensionTooLargeError to be possible
    N = 2**14

    # multiple sizes work for quadratic systems too
    qsys = QuadraticSystem([65, 63])
    lo, hi = qsys.gens()
    x = lo.concat(hi)

    # the traced system is input-independent -> cache it
    cache_file_name = Path(__file__).parent / f"cache_{LFSR.__name__}.pkl.gz"
    try:
        with gzip.open(cache_file_name, "rb") as f:
            maybe_zeros = pickle.load(f)
        assert len(maybe_zeros) == N
        print("cache found, reusing...")
    except Exception:
        print("cache not found, generating...")
        lfsr_sys = LFSR(128, mask, x)
        maybe_zeros = []
        for _ in range(N):
            lfsr_sys()
            x0, x1, x2, x3, x4 = [lfsr_sys.state[i] for i in select]
            z = qsys.mul_bit(x0, x1) ^ x0 ^ qsys.mul_bit(x1, x2) ^ x1 ^ x2 ^ 1
            maybe_zeros.append(z)
        with gzip.open(cache_file_name, "wb") as f:
            pickle.dump(maybe_zeros, f)

    init = secrets.randbits(n)
    print(f"{init = :0{n}b}")
    lfsr = LFSR(n, mask, init)
    out = [non_linear_output(lfsr) for _ in range(N)]

    zeros = [z for z, o in zip(maybe_zeros, out) if o == 1]
    print(f"{len(zeros) = }")

    try:
        sol_tuple = qsys.solve_one(zeros)
        sol = qsys.evaluate(x, sol_tuple)
        print(f"{sol = :0{n}b}")
        assert sol == init
        print("Lucky, enough zeros to avoid DimensionTooLargeError")
    except DimensionTooLargeError:
        traceback.print_exc()
        print("=" * 40)
        # solution space too large -> bruteforce some bits via bit_assert
        guesses = list(itertools.product([0, 1], repeat=2))
        guess_zeros = [
            zeros
            + qsys.bit_assert(x[0], b0)
            + qsys.bit_assert(x[1] ^ x[2] ^ x[87], b1)
            for b0, b1 in guesses
        ]
        if batched_guessing:
            # TPU path: all guess subsystems in one vmapped device solve
            spaces = solve_batch_systems(qsys, guess_zeros, mode=1)
            results = []
            for space in spaces:
                sol_tuple = None
                if space is not None and space.dimension <= 16:
                    for s in space:
                        sol_tuple = qsys.convert_sol(s)
                        if sol_tuple is not None:
                            break
                results.append(sol_tuple)
        else:
            results = [qsys.solve_one(gz) for gz in guess_zeros]
        for (b0, b1), sol_tuple in zip(guesses, results):
            print(b0, b1, sol_tuple)
            if sol_tuple:
                sol = qsys.evaluate(x, sol_tuple)
                print(f"{sol = :0{n}b}")
                assert sol == init
                assert sol & 1 == b0
                assert ((sol >> 1) & 1) ^ ((sol >> 2) & 1) ^ ((sol >> 87) & 1) == b1
    print()


if __name__ == "__main__":
    nlfsr_ex_test(GaloisLFSR)
    nlfsr_ex_test(FibonacciLFSR)
