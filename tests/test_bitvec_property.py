"""Property-based differential test: random BitVec op sequences vs a
pure-bigint oracle implementing the reference's representation (one mask per
bit, ``/root/reference/gf2bv/__init__.py:21-134`` semantics re-derived)."""

import random

from hypothesis import given, settings, strategies as st

from gf2bv_tpu import BitVec
from gf2bv_tpu.core import packing


class OracleBV:
    """Reference-representation oracle: tuple of int masks, LSB first."""

    def __init__(self, masks, nbits):
        self.masks = list(masks)
        self.nbits = nbits

    def __len__(self):
        return len(self.masks)

    def xor(self, other):
        if isinstance(other, OracleBV):
            return OracleBV(
                [a ^ b for a, b in zip(self.masks, other.masks)], self.nbits
            )
        return OracleBV(
            [m ^ ((other >> i) & 1) for i, m in enumerate(self.masks)],
            self.nbits,
        )

    def rshift(self, n):
        return OracleBV(self.masks[n:] + [0] * min(n, len(self)), self.nbits)

    def lshift(self, n):
        return OracleBV(([0] * n + self.masks)[: len(self)], self.nbits)

    def and_mask(self, mask):
        return OracleBV(
            [m if (mask >> i) & 1 else 0 for i, m in enumerate(self.masks)],
            self.nbits,
        )

    def rotl(self, n):
        n %= len(self)
        return OracleBV(self.masks[-n:] + self.masks[:-n] if n else self.masks,
                        self.nbits)

    def rotr(self, n):
        n %= len(self)
        return OracleBV(self.masks[n:] + self.masks[:n] if n else self.masks,
                        self.nbits)

    def sum(self):
        acc = 0
        for m in self.masks:
            acc ^= m
        return OracleBV([acc], self.nbits)

    def zeroext(self, n):
        return OracleBV(self.masks + [0] * n, self.nbits)

    def broadcast(self, i, n):
        return OracleBV([self.masks[i]] * n, self.nbits)

    def concat(self, other):
        return OracleBV(self.masks + other.masks, self.nbits)


OPS = st.lists(
    st.tuples(
        st.sampled_from(
            ["xor_bv", "xor_int", "rshift", "lshift", "and", "rotl", "rotr",
             "sum", "zeroext", "broadcast", "concat"]
        ),
        st.integers(min_value=0, max_value=2**64 - 1),
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(
    width=st.integers(min_value=1, max_value=40),
    nvars=st.integers(min_value=1, max_value=70),
    seed=st.integers(min_value=0, max_value=2**31),
    ops=OPS,
)
def test_random_op_sequences_match_oracle(width, nvars, seed, ops):
    rng = random.Random(seed)
    nbits = 1 + nvars
    masks = [rng.getrandbits(nbits) for _ in range(width)]
    bv = BitVec(packing.ints_to_rows(masks, nbits), nbits)
    ob = OracleBV(masks, nbits)
    # a second operand for binary ops
    masks2 = [rng.getrandbits(nbits) for _ in range(width)]

    for op, arg in ops:
        w = len(ob)
        if op == "xor_bv":
            m2 = (masks2 * (w // len(masks2) + 1))[:w]
            bv = bv ^ BitVec(packing.ints_to_rows(m2, nbits), nbits)
            ob = ob.xor(OracleBV(m2, nbits))
        elif op == "xor_int":
            c = arg & ((1 << w) - 1)
            bv, ob = bv ^ c, ob.xor(c)
        elif op == "rshift":
            n = arg % w
            bv, ob = bv >> n, ob.rshift(n)
        elif op == "lshift":
            n = arg % w
            bv, ob = bv << n, ob.lshift(n)
        elif op == "and":
            m = arg & ((1 << w) - 1)
            bv, ob = bv & m, ob.and_mask(m)
        elif op == "rotl":
            n = arg % w
            bv, ob = bv.rotl(n), ob.rotl(n)
        elif op == "rotr":
            n = arg % w
            bv, ob = bv.rotr(n), ob.rotr(n)
        elif op == "sum":
            bv, ob = bv.sum(), ob.sum()
        elif op == "zeroext":
            n = arg % 8
            bv, ob = bv.zeroext(n), ob.zeroext(n)
        elif op == "broadcast":
            i = arg % w
            n = 1 + (arg >> 32) % 8
            bv, ob = bv.broadcast(i, n), ob.broadcast(i, n)
        elif op == "concat":
            m2 = (masks2 * (w // len(masks2) + 1))[: max(1, w // 2)]
            bv = bv.concat(BitVec(packing.ints_to_rows(m2, nbits), nbits))
            ob = ob.concat(OracleBV(m2, nbits))
        assert list(bv._bits) == ob.masks, (op, arg)

    # evaluate parity at a few random points
    for _ in range(3):
        x = rng.getrandbits(nvars)
        got = bv.evaluate(x)
        want = 0
        full = (x << 1) | 1  # const bit always on
        for i, m in enumerate(ob.masks):
            want |= (bin(m & full).count("1") & 1) << i
        assert got == want
