"""Beyond-the-reference models: xorshift state recovery + CRC-32 preimage.

Demonstrates the new-capability crypto models (gf2bv_tpu/crypto/xorshift.py,
crc.py — no analog in the reference): recover a xorshift128 state from
truncated outputs, and find input bytes hitting a chosen CRC-32.
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import binascii
import random

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.crc import CRC32
from gf2bv_tpu.crypto.xorshift import Xorshift128

# --- xorshift128: recover the 128-bit state from 12 truncated outputs -----
rnd = random.Random(1337)
seed = [rnd.getrandbits(32) for _ in range(4)]
ref = Xorshift128(list(seed))
outs = [ref() >> 16 for _ in range(12)]  # only the top 16 bits leak

lin = LinearSystem([32] * 4)
sym = Xorshift128(list(lin.gens()))
zeros = [(sym() >> 16) ^ o for o in outs]
rec = lin.solve_one(zeros)
print(f"xorshift128 state = {rec}")
assert list(rec) == seed

# --- CRC-32 preimage: which 4 bytes x make crc32(prefix + x) == target? ---
prefix = b"gimme "
target = 0x1337C0DE

lin = LinearSystem([32])
(x,) = lin.gens()
msg = x.lshift_ext(8 * len(prefix)) ^ int.from_bytes(prefix, "little")
rec = lin.solve_one([CRC32().process(msg) ^ target])
found = rec[0].to_bytes(4, "little")
print(f"crc32({prefix + found!r}) == {binascii.crc32(prefix + found):#x}")
assert binascii.crc32(prefix + found) == target
