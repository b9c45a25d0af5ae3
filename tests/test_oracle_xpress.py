"""Plain-Xpress oracle tests — [MS-XCA] §3.1 worked examples + properties."""

import pytest

import tpucomp
from tpucomp import Format
from tpucomp.oracle import xpress


class TestSpecVectors:
    def test_msxca_literal_example(self):
        """[MS-XCA] §3.1 worked example 1: all-literal alphabet.

        26 literal flag bits (0) then 6 padding bits (1) -> flag word
        0x0000003F stored LE, followed by the 26 ASCII bytes.
        """
        data = b"abcdefghijklmnopqrstuvwxyz"
        c = xpress.compress(data)
        assert c == bytes([0x3F, 0x00, 0x00, 0x00]) + data
        assert xpress.decompress(c, len(data)) == data

    def test_msxca_rle_example(self):
        """[MS-XCA] §3.1 worked example 2: 300 bytes of 'abc' repeated.

        Tokens: 3 literals + match(offset=3, len=297).  Flag word: bits
        0,0,0,1 then 28 padding 1s = 0x1FFFFFFF.  Match token:
        ((3-1)<<3)|7 = 0x0017.  Escape chain: nibble 15 (low nibble of
        0x0F byte), byte 255, u16 = 297-3 = 294 = 0x0126.
        """
        data = (b"abc" * 100)
        assert len(data) == 300
        c = xpress.compress(data)
        expect = bytes(
            [0xFF, 0xFF, 0xFF, 0x1F, 0x61, 0x62, 0x63, 0x17, 0x00, 0x0F,
             0xFF, 0x26, 0x01]
        )
        assert c == expect
        assert xpress.decompress(c, len(data)) == data

    def test_escape_boundaries(self):
        """Exercise every branch of the length escape chain."""
        # length L+3 for L in: 6 (plain), 7 (nibble 0), 21 (nibble 14),
        # 22 (nibble 15, byte 0), 276 (byte 254), 277 (u16), 65535+3 region
        for length in [3, 9, 10, 24, 25, 279, 280, 281, 5000, 65537]:
            data = b"Q" + b"R" * length + b"ZZZZ"
            prefix = b"R"  # seed a match source
            buf = prefix + data
            c = xpress.compress(buf)
            assert xpress.decompress(c, len(buf)) == buf, length

    def test_u32_escape(self):
        # length - 3 >= 0x10000 forces the u16==0 -> u32 escape
        data = b"x" * 70000
        c = xpress.compress(data)
        assert xpress.decompress(c, len(data)) == data
        # The u16==0, u32 escape must appear: find token 0xFFFF.. pattern:
        # flag word + 'x' + tok + nibble byte + 0xFF + u16(0) + u32
        assert len(c) < 30

    def test_shared_nibble_state(self):
        """Two escape-length matches must share one nibble byte."""
        a = b"A" * 15   # match len 14 after literal -> L=11 nibble branch
        b = b"B" * 15
        data = a + b + a + b
        c = xpress.compress(data)
        assert xpress.decompress(c, len(data)) == data

    def test_multiple_flag_words(self, corpus):
        data = bytes(range(256)) * 2  # 512 literals -> 16 flag words
        c = xpress.compress(data)
        assert xpress.decompress(c, len(data)) == data


class TestRoundTrip:
    @pytest.mark.parametrize("n", [0, 1, 2, 3, 31, 32, 33, 100, 8191, 8192, 8193, 40000])
    def test_sizes(self, corpus, n):
        data = corpus(n)
        c = xpress.compress(data)
        assert xpress.decompress(c, n) == data

    def test_window_limit(self, rng):
        """Matches must not reach farther than 8192 back."""
        block = bytes(rng.randrange(256) for _ in range(4000))
        data = block + b"\x00" * 6000 + block
        c = xpress.compress(data)
        assert xpress.decompress(c, len(data)) == data

    def test_bound(self, rng):
        data = bytes(rng.randrange(256) for _ in range(10000))
        c = xpress.compress(data)
        assert len(c) <= xpress.max_compressed_size(len(data))
        assert xpress.decompress(c, len(data)) == data

    def test_out_len_required(self):
        with pytest.raises(tpucomp.ArgError):
            xpress.decompress(b"\x3f\x00\x00\x00abc", None)

    def test_via_public_api(self, corpus):
        data = corpus(5000)
        c = tpucomp.compress(Format.XPRESS, data)
        assert tpucomp.decompress(Format.XPRESS, c, len(data)) == data
