"""Xpress-Huffman oracle tests — table/bitstream framing + properties."""

import pytest

import tpucomp
from tpucomp import Format
from tpucomp.oracle import huffman, xpress_huff


class TestHuffman:
    def test_package_merge_simple(self):
        lengths = huffman.package_merge([1, 1, 2, 4], 15)
        # optimal: freqs 4:1bit, 2:2bits, 1,1:3bits -> total cost 1+1*3+1*3+2*2+4*1
        assert sorted(lengths) == [1, 2, 3, 3]
        # Kraft equality for an optimal complete code
        assert sum(2 ** -l for l in lengths if l) == 1.0

    def test_package_merge_limit_binds(self):
        # Fibonacci-ish frequencies force deep trees; limit must clamp.
        freqs = [1, 1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144, 233, 377, 610, 987, 1597]
        lengths = huffman.package_merge(freqs, 5)
        assert max(lengths) <= 5
        assert sum(2 ** -l for l in lengths if l) <= 1.0

    def test_single_symbol(self):
        lengths = huffman.package_merge([0, 7, 0], 15)
        assert lengths == [0, 1, 0]

    def test_canonical_codes(self):
        lengths = [2, 1, 3, 3]
        codes = huffman.canonical_codes(lengths)
        # order by (len, sym): sym1(len1)=0; sym0(len2)=0b10; sym2=0b110; sym3=0b111
        assert codes == [0b10, 0, 0b110, 0b111]

    def test_decode_table(self):
        lengths = [2, 1, 3, 3]
        table = huffman.build_decode_table(lengths, 3)
        # 1-bit code 0 for sym1 covers entries 000..011
        assert table[0] == (1 << 4) | 1
        assert table[0b011] == (1 << 4) | 1
        assert table[0b100] == (0 << 4) | 2
        assert table[0b110] == (2 << 4) | 3
        assert table[0b111] == (3 << 4) | 3


class TestFraming:
    def test_table_nibble_packing(self):
        data = b"a" * 300
        c = xpress_huff.compress(data)
        # table is first 256 bytes; recover lengths and re-derive
        lengths = []
        for i in range(256):
            lengths.append(c[i] & 0xF)
            lengths.append(c[i] >> 4)
        used = [s for s, l in enumerate(lengths) if l]
        assert 0x61 in used  # literal 'a'
        assert any(s >= 256 for s in used)  # some match symbol
        assert xpress_huff.decompress(c, len(data)) == data

    def test_single_literal(self):
        c = xpress_huff.compress(b"z")
        assert len(c) == 256 + 4  # table + two reserved word slots
        assert xpress_huff.decompress(c, 1) == b"z"

    def test_empty(self):
        assert xpress_huff.decompress(xpress_huff.compress(b""), 0) == b""

    def test_offset_bit_counts(self):
        """Matches at many offsets exercise all raw-offset-bit widths."""
        pieces = [b"<<marker>>"]
        gap = 1
        total = len(pieces[0])
        while total < 60000:
            pieces.append(b"\xAA" * gap)
            pieces.append(b"<<marker>>")
            total += gap + 10
            gap = min(gap * 2 + 3, 30000)
        data = b"".join(pieces)[:60000]
        c = xpress_huff.compress(data)
        assert xpress_huff.decompress(c, len(data)) == data

    def test_length_escapes(self):
        for run in [17, 18, 19, 270, 272, 273, 274, 65540]:
            data = b"S" + b"T" * run
            c = xpress_huff.compress(data)
            assert xpress_huff.decompress(c, len(data)) == data, run


class TestMultiBlock:
    def test_two_blocks(self, corpus):
        data = corpus(100000)
        c = xpress_huff.compress(data)
        assert xpress_huff.decompress(c, len(data)) == data

    def test_exact_block_boundary(self, corpus):
        data = corpus(65536)
        c = xpress_huff.compress(data)
        assert xpress_huff.decompress(c, len(data)) == data
        data2 = corpus(131072)
        c2 = xpress_huff.compress(data2)
        assert xpress_huff.decompress(c2, len(data2)) == data2

    def test_block_boundary_plus_one(self, corpus):
        data = corpus(65537)
        c = xpress_huff.compress(data)
        assert xpress_huff.decompress(c, len(data)) == data

    def test_incompressible_blocks(self, rng):
        data = bytes(rng.randrange(256) for _ in range(70000))
        c = xpress_huff.compress(data)
        assert xpress_huff.decompress(c, len(data)) == data
        assert len(c) <= xpress_huff.max_compressed_size(len(data))


class TestRoundTrip:
    @pytest.mark.parametrize(
        "n", [0, 1, 2, 3, 100, 255, 256, 257, 4096, 65535, 65536, 65537, 200000]
    )
    def test_sizes(self, corpus, n):
        data = corpus(n)
        c = xpress_huff.compress(data)
        assert xpress_huff.decompress(c, n) == data

    def test_all_zero(self):
        data = b"\x00" * 150000
        c = xpress_huff.compress(data)
        assert len(c) < 3 * (256 + 32)
        assert xpress_huff.decompress(c, len(data)) == data

    def test_via_public_api(self, corpus):
        data = corpus(70000)
        c = tpucomp.compress(Format.XPRESS_HUFF, data)
        assert tpucomp.decompress(Format.XPRESS_HUFF, c, len(data)) == data
