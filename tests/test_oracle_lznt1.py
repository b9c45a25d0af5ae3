"""LZNT1 oracle tests — spec vectors + round-trip properties."""

import pytest

import tpucomp
from tpucomp import Format
from tpucomp.oracle import lznt1


class TestSpecVectors:
    def test_incompressible_is_stored_raw(self):
        data = b"abcdefghijklmnopqrstuvwxyz"
        c = lznt1.compress(data)
        # stored chunk: header 0x3000 | (26-1) = 0x3019 LE, then raw bytes
        assert c == bytes([0x19, 0x30]) + data
        assert lznt1.decompress(c) == data

    def test_simple_rle_token(self):
        # 'a'*100: literal 'a', then copy disp=1 len=99 at pos=1
        # (4-bit disp / 12-bit len split). tok = (0<<12)|(99-3) = 0x0060.
        data = b"a" * 100
        c = lznt1.compress(data)
        assert c == bytes([0x03, 0xB0, 0x02, 0x61, 0x60, 0x00])
        assert lznt1.decompress(c) == data

    def test_decode_handles_terminator(self):
        data = b"a" * 100
        c = lznt1.compress(data, emit_terminator=True)
        assert c.endswith(b"\x00\x00")
        assert lznt1.decompress(c) == data

    def test_known_token_split_late_positions(self):
        # Construct a chunk by hand: 17 literals then a copy.  At output
        # position 17 the split is 5 disp bits / 11 len bits (q=16 -> one
        # shift).  disp=17, len=17: tok = (16<<11) | 14 = 0x800E.
        payload = bytearray()
        payload.append(0x00)  # flags: 8 literals
        payload += b"ABCDEFGH"
        payload.append(0x00)  # flags: 8 literals
        payload += b"IJKLMNOP"
        payload.append(0x06)  # flags: literal, copy, copy
        payload += b"Q"
        tok = (16 << 11) | (17 - 3)
        payload += tok.to_bytes(2, "little")
        # second copy at pos 34: q=33 -> two shifts: 6 disp bits/10 len bits
        tok2 = ((3 - 1) << 10) | (6 - 3)
        payload += tok2.to_bytes(2, "little")
        header = 0xB000 | (len(payload) - 1)
        stream = header.to_bytes(2, "little") + bytes(payload)
        out = lznt1.decompress(stream)
        expect = bytearray(b"ABCDEFGHIJKLMNOPQ")
        expect += expect[:17]          # disp 17, len 17
        for _ in range(6):             # disp 3, len 6 (overlapping)
            expect.append(expect[-3])
        assert out == bytes(expect)

    def test_overlapping_copy(self):
        data = b"abcabcabcabcabcabcabcabc"
        c = lznt1.compress(data)
        assert lznt1.decompress(c) == data
        assert len(c) < len(data)

    def test_empty(self):
        assert lznt1.compress(b"") == b""
        assert lznt1.decompress(b"") == b""

    def test_single_byte(self):
        c = lznt1.compress(b"x")
        assert lznt1.decompress(c) == b"x"

    def test_corrupt_raises(self):
        with pytest.raises(tpucomp.DataError):
            # compressed chunk whose copy reaches before chunk start
            payload = bytes([0x01]) + (0x0000).to_bytes(2, "little")
            header = 0xB000 | (len(payload) - 1)
            lznt1.decompress(header.to_bytes(2, "little") + payload)


class TestRoundTrip:
    @pytest.mark.parametrize("n", [0, 1, 2, 3, 100, 4095, 4096, 4097, 8192, 20000])
    def test_sizes(self, corpus, n):
        data = corpus(n)
        c = lznt1.compress(data)
        assert lznt1.decompress(c) == data
        assert lznt1.decompress(c, out_len=n) == data

    def test_all_zero(self):
        data = b"\x00" * 10000
        c = lznt1.compress(data)
        assert len(c) < 100
        assert lznt1.decompress(c) == data

    def test_random_incompressible(self, rng):
        data = bytes(rng.randrange(256) for _ in range(10000))
        c = lznt1.compress(data)
        assert lznt1.decompress(c) == data
        # stored-raw fallback bounds expansion to the header overhead
        assert len(c) <= lznt1.max_compressed_size(len(data))

    def test_exact_chunk_multiples(self, corpus):
        data = corpus(4096) * 3
        c = lznt1.compress(data)
        assert lznt1.decompress(c) == data

    def test_via_public_api(self, corpus):
        data = corpus(9000)
        c = tpucomp.compress(Format.LZNT1, data)
        assert tpucomp.decompress(Format.LZNT1, c) == data
        assert len(c) <= tpucomp.max_compressed_size(Format.LZNT1, len(data))


class TestMatchesWindowsSemantics:
    """Cross-checks of the position-dependent disp/len split table."""

    def test_split_table(self):
        # (pos, expected d_shift): 4 disp bits until pos 16, then widening.
        expect = [
            (1, 12), (16, 12), (17, 11), (32, 11), (33, 10), (64, 10),
            (65, 9), (128, 9), (129, 8), (256, 8), (257, 7), (512, 7),
            (513, 6), (1024, 6), (1025, 5), (2048, 5), (2049, 4), (4096, 4),
        ]
        for pos, d_shift in expect:
            lm, ds = lznt1._split_for_pos(pos)
            assert ds == d_shift, (pos, ds, d_shift)
            assert lm == (1 << ds) - 1

    def test_mask_consistency(self):
        for pos in range(1, 4097):
            lm, ds = lznt1._split_for_pos(pos)
            # length mask occupies exactly the low d_shift bits
            assert lm == (1 << ds) - 1
            # displacement field must be able to hold any disp <= pos
            assert (pos - 1) >> (16 - ds) == 0
