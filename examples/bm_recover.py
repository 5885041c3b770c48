"""Unknown-taps LFSR break: Berlekamp–Massey + sparse symbolic solve.

The classic two-phase workflow the reference leaves to the user
(`/root/reference/gf2bv/crypto/lfsr.py` models known taps only):

1. One fully-leaked session (>= 2n consecutive keystream bits) gives the
   register's taps via Berlekamp–Massey (`crypto/bm.py`) — no solver needed.
2. A fresh session leaks only every 3rd bit.  With the recovered taps the
   register is now a known linear map, so the sparse leak becomes a
   LinearSystem: recover the new seed, replay, and predict.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.bm import fibonacci_taps, galois_lfsr_from_stream, lfsr_from_stream
from gf2bv_tpu.crypto.lfsr import FibonacciLFSR

WIDTH = 128
SECRET_TAPS = 0x6D6AC812F52A212D5A0B9F3117801FD5  # primitive; unknown to the attacker


def keystream(reg, nbits):
    return [reg() for _ in range(nbits)]


def main():
    # --- phase 1: full leak -> taps ---------------------------------------
    leak = keystream(FibonacciLFSR(WIDTH, SECRET_TAPS, secrets.randbits(WIDTH) | 1), 2 * WIDTH + 32)
    L, taps = fibonacci_taps(leak)
    print(f"phase 1: linear complexity {L}, taps {taps:#034x}")
    assert (L, taps) == (WIDTH, SECRET_TAPS)
    # lfsr_from_stream also hands back the replaying register directly,
    # in either convention (Fibonacci or Galois form)
    assert keystream(lfsr_from_stream(leak), len(leak)) == leak
    assert keystream(galois_lfsr_from_stream(leak), len(leak)) == leak

    # --- phase 2: sparse leak of a fresh session -> seed -------------------
    secret2 = secrets.randbits(WIDTH) | 1
    session = keystream(FibonacciLFSR(WIDTH, SECRET_TAPS, secret2), 3 * WIDTH)
    observed = [(i, b) for i, b in enumerate(session) if i % 3 == 0]
    print(f"phase 2: {len(observed)} observed bits (every 3rd of {len(session)})")

    lin = LinearSystem([WIDTH])
    (s0,) = lin.gens()
    sym_bits = keystream(FibonacciLFSR(WIDTH, taps, s0), 3 * WIDTH)
    sol = lin.solve_one([sym_bits[i] ^ b for i, b in observed])
    assert sol is not None and sol[0] == secret2
    predicted = keystream(FibonacciLFSR(WIDTH, taps, sol[0]), 3 * WIDTH + 64)
    assert predicted[: len(session)] == session
    print(f"recovered seed {sol[0]:#034x}; next 8 bits: {predicted[len(session):len(session)+8]}")


if __name__ == "__main__":
    main()
