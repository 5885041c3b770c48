"""AES-GCM nonce-reuse forgery: craft a ciphertext that keeps a valid tag.

Under nonce reuse the tag mask E_K(J0) is identical across messages, so any
ciphertext C' with GHASH_H(C') == GHASH_H(C) carries C's tag.  With H known
(recovered by the standard nonce-reuse key-recovery), GHASH over unknown
blocks is GF(2)-LINEAR (gf2bv_tpu/crypto/gf2m.py): pin the attacker-chosen
bytes of one block, leave the rest plus a sacrificial block free, and
solve_one picks the correction that lands the original tag.

New capability — the reference has no field-arithmetic models at all
(``/root/reference/gf2bv/crypto/``).
"""

import _bootstrap  # noqa: F401  (repo-root imports + persistent compile cache)

import secrets

from gf2bv_tpu import LinearSystem
from gf2bv_tpu.crypto.gf2m import GHASH

# --- the victim session (nonce reused, so E_K(J0) is a fixed unknown mask) --
h = secrets.randbits(128)  # recovered GHASH key
ej0 = secrets.randbits(128)  # fixed tag mask — never learned by the attacker
g = GHASH(h)

ciphertext = secrets.token_bytes(64)  # 4 blocks
aad = b"from: alice"
tag = g.tag(aad, ciphertext, ej0)

# --- forgery: change block 1 to attacker bytes, let block 2 absorb it ------
# Unknowns: block2' (128 bits).  Block1' is fully pinned to attacker bytes.
evil = b"pay mallory $999"  # exactly 16 bytes
assert len(evil) == 16

lin = LinearSystem([128])
(b2,) = lin.gens()

blocks = GHASH.bytes_to_blocks(aad) + GHASH.bytes_to_blocks(ciphertext) + [
    GHASH.length_block(8 * len(aad), 8 * len(ciphertext))
]
b1_index = 1 + 1  # one aad block, then ciphertext block 1
forged = list(blocks)
forged[b1_index] = int.from_bytes(evil, "big")
forged[b1_index + 1] = b2

# same GHASH ⇒ same tag (the unknown ej0 cancels)
rec = lin.solve_one([g.process(forged) ^ g.process(blocks)])
assert rec is not None
(b2_fix,) = rec

forged_ct = (
    ciphertext[:16] + evil + b2_fix.to_bytes(16, "big") + ciphertext[48:]
)
print(f"original tag : {tag:#034x}")
print(f"forged block2: {b2_fix:#034x}")
assert forged_ct != ciphertext
assert g.tag(aad, forged_ct, ej0) == tag  # verifier accepts
print("forged ciphertext carries the original tag — verifier accepts")
