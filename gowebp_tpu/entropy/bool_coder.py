"""VP8 boolean (binary arithmetic) coder — RFC 6386 §7 convention.

Decoder state: (value, range, bit_count) with range in [128, 255] and
split = 1 + (((range - 1) * prob) >> 8).  Encoder mirrors the decoder
exactly, with carry propagation into already-emitted bytes.

Reference behavior: /root/reference/pkg/vp8/bits_reader_vp8.go and
bits_writer_vp8.go (which use libwebp's offset-by-one range representation
— the produced bitstreams are identical).  This implementation follows the
RFC's own formulation, written fresh from the spec.
"""

from __future__ import annotations


class BoolDecoder:
    """RFC 6386 boolean decoder with an 8-bit lookahead window."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.value = 0
        self.range = 255
        self.bit_count = 0
        for _ in range(2):
            self.value = (self.value << 8) | self._next_byte()

    def _next_byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        # Past the end: zeros (decoder detects overrun via exhausted()).
        self.pos += 1
        return 0

    def exhausted(self) -> bool:
        # Allow a few virtual zero bytes of tail padding (the encoder's
        # 32-bit flush guarantees decided symbols never need more).
        return self.pos > len(self.data) + 4

    def get_bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                self.value |= self._next_byte()
        return ret

    def get_flag(self) -> int:
        """Uniform bit (prob 128)."""
        return self.get_bit(128)

    def get_literal(self, n: int) -> int:
        """n uniform bits, MSB first (RFC 6386 'L(n)')."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit(128)
        return v

    def get_signed_literal(self, n: int) -> int:
        """Value then sign bit (RFC 6386 quantizer/filter deltas)."""
        v = self.get_literal(n)
        if v and self.get_bit(128):
            return -v
        return v

    def get_signed(self, v: int) -> int:
        """Sign bit applied to a decoded magnitude."""
        return -v if self.get_bit(128) else v

    def read_tree(self, tree, probs, start: int = 0) -> int:
        """Decode a token from an RFC 6386 tree.

        ``tree`` is the flat int array where negative entries are leaves;
        ``probs[i >> 1]`` is the probability at node position i.
        """
        i = start
        while True:
            i = tree[i + self.get_bit(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 boolean encoder (mirror of BoolDecoder)."""

    __slots__ = ("_buf", "bottom", "range", "bit_count")

    def __init__(self):
        self._buf = bytearray()
        self.bottom = 0
        self.range = 255
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self._buf) - 1
        while i >= 0 and self._buf[i] == 0xFF:
            self._buf[i] = 0
            i -= 1
        if i >= 0:
            self._buf[i] += 1
        # A carry out of an empty buffer cannot happen in a valid stream.

    def put_bit(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            if self.bottom >> 32:  # immediate carry (unbounded Python int)
                self._carry()
                self.bottom &= 0xFFFFFFFF
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self._buf.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8

    def put_flag(self, bit: int) -> None:
        self.put_bit(bit, 128)

    def put_literal(self, value: int, n: int) -> None:
        for shift in range(n - 1, -1, -1):
            self.put_bit((value >> shift) & 1, 128)

    def put_signed_literal(self, value: int, n: int) -> None:
        self.put_literal(abs(value), n)
        if value:
            self.put_bit(1 if value < 0 else 0, 128)

    def write_tree(self, tree, probs, value_path) -> None:
        """Encode the (bit, node) path produced by tree tokenization."""
        for bit, node in value_path:
            self.put_bit(bit, probs[node >> 1])

    def finish(self) -> bytes:
        """Flush remaining bits; returns the completed partition bytes."""
        # Push out 32 more bits so every decided interval byte is emitted.
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self._buf.append((self.bottom >> 24) & 0xFF)
                self.bottom &= 0xFFFFFF
                self.bit_count = 8
        return bytes(self._buf)


__all__ = ["BoolDecoder", "BoolEncoder"]
