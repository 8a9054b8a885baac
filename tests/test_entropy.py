"""Bit I/O, Huffman, and boolean-coder unit tests."""

import numpy as np
import pytest

from gowebp_tpu.entropy.bitio import BitReader, BitWriter
from gowebp_tpu.entropy.bool_coder import BoolDecoder, BoolEncoder
from gowebp_tpu.entropy.huffman import (
    HuffmanDecodeTable,
    build_code_lengths,
    canonical_codes,
)


class TestBitIO:
    def test_roundtrip(self):
        rng = np.random.default_rng(7)
        fields = [(int(rng.integers(0, 1 << n)), n) for n in rng.integers(1, 24, 500)]
        w = BitWriter()
        for v, n in fields:
            w.put_bits(v, int(n))
        r = BitReader(w.getvalue())
        for v, n in fields:
            assert r.read_bits(int(n)) == v
        assert not r.eos

    def test_lsb_first(self):
        r = BitReader(bytes([0b10110100, 0xFF]))
        assert r.read_bits(2) == 0b00
        assert r.read_bits(3) == 0b101
        assert r.read_bits(3) == 0b101
        assert r.read_bits(4) == 0xF

    def test_eos(self):
        r = BitReader(b"\xaa")
        r.read_bits(8)
        assert not r.eos
        assert r.read_bits(4) == 0
        assert r.eos


class TestHuffman:
    def test_canonical_codes_known(self):
        # Classic example: lengths [2,1,3,3] -> codes 10,0,110,111.
        codes = canonical_codes([2, 1, 3, 3])
        assert list(codes) == [0b10, 0b0, 0b110, 0b111]

    def test_decode_roundtrip(self):
        rng = np.random.default_rng(3)
        counts = rng.integers(0, 1000, 300)
        counts[5] = 100000  # skewed
        lengths = build_code_lengths(counts)
        codes = canonical_codes(lengths)
        table = HuffmanDecodeTable(lengths)
        syms = [int(s) for s in rng.choice(np.flatnonzero(counts > 0), 200)]
        w = BitWriter()
        for s in syms:
            ln = int(lengths[s])
            code = int(codes[s])
            # write MSB-of-code first
            for i in range(ln - 1, -1, -1):
                w.put_bit((code >> i) & 1)
        r = BitReader(w.getvalue())
        for s in syms:
            assert table.decode(r) == s

    def test_single_symbol(self):
        lengths = np.zeros(256, np.int32)
        lengths[42] = 1
        t = HuffmanDecodeTable(lengths)
        r = BitReader(b"")
        assert t.decode(r) == 42
        assert r.bit_pos == 0

    def test_depth_limit(self):
        # Fibonacci-ish counts force deep trees; limit must hold.
        counts = np.array([1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233,
                           377, 610, 987, 1597, 2584, 4181, 6765], np.int64)
        lengths = build_code_lengths(counts, max_depth=15)
        assert lengths.max() <= 15
        # Kraft equality: complete code.
        assert sum(2 ** (15 - l) for l in lengths if l > 0) == 2 ** 15

    def test_incomplete_code_rejected(self):
        from gowebp_tpu.errors import BitstreamError

        with pytest.raises(BitstreamError):
            HuffmanDecodeTable([2, 2, 2])  # kraft < 1
        with pytest.raises(BitstreamError):
            HuffmanDecodeTable([1, 1, 1])  # oversubscribed


class TestBoolCoder:
    def test_roundtrip(self):
        rng = np.random.default_rng(11)
        n = 5000
        probs = rng.integers(1, 255, n)
        bits = (rng.random(n) < probs / 256.0).astype(int)
        enc = BoolEncoder()
        for b, p in zip(bits, probs):
            enc.put_bit(int(b), int(p))
        data = enc.finish()
        dec = BoolDecoder(data)
        for b, p in zip(bits, probs):
            assert dec.get_bit(int(p)) == b

    def test_literals(self):
        enc = BoolEncoder()
        enc.put_literal(0x5A, 8)
        enc.put_signed_literal(-17, 6)
        enc.put_literal(3, 2)
        data = enc.finish()
        dec = BoolDecoder(data)
        assert dec.get_literal(8) == 0x5A
        assert dec.get_signed_literal(6) == -17
        assert dec.get_literal(2) == 3

    def test_compression_ratio(self):
        # Highly predictable bits should compress far below 1 bit/symbol.
        enc = BoolEncoder()
        for _ in range(8000):
            enc.put_bit(0, 250)
        data = enc.finish()
        assert len(data) < 8000 / 8 / 4
