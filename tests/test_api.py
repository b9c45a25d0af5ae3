"""Public API + streaming tests (reference: ms_deflate/ms_inflate surface)."""

import pytest

import tpucomp
from tpucomp import Compressor, Decompressor, Format


class TestOneShot:
    def test_format_aliases(self, corpus):
        data = corpus(1000)
        a = tpucomp.compress(Format.LZNT1, data)
        b = tpucomp.compress(2, data)
        c = tpucomp.compress("lznt1", data)
        d = tpucomp.compress(Format.DEFAULT, data)  # Windows alias of LZNT1
        assert a == b == c == d

    def test_unknown_format(self):
        with pytest.raises(tpucomp.UnsupportedFormatError):
            tpucomp.compress("lzx", b"data")  # descoped (SURVEY.md §2 row 6)
        with pytest.raises(tpucomp.UnsupportedFormatError):
            tpucomp.compress("bogus", b"data")

    def test_registered_formats(self):
        fmts = tpucomp.registered_formats()
        assert Format.LZNT1 in fmts
        assert Format.XPRESS in fmts
        assert Format.XPRESS_HUFF in fmts

    def test_status_taxonomy(self):
        assert tpucomp.Status.OK == 0
        assert tpucomp.DataError().status == tpucomp.Status.DATA_ERROR
        assert issubclass(tpucomp.UnsupportedFormatError, tpucomp.ArgError)
        assert issubclass(tpucomp.ArgError, tpucomp.MSCompError)


class TestStreamingLZNT1:
    def test_chunked_feed_roundtrip(self, corpus):
        data = corpus(30000)
        comp = Compressor(Format.LZNT1)
        out = bytearray()
        for i in range(0, len(data), 700):  # odd feed sizes
            out += comp.compress(data[i : i + 700])
        out += comp.flush()
        # one-shot decode
        assert tpucomp.decompress(Format.LZNT1, bytes(out)) == data

    def test_streaming_decode(self, corpus):
        data = corpus(30000)
        c = tpucomp.compress(Format.LZNT1, data)
        dec = Decompressor(Format.LZNT1)
        out = bytearray()
        for i in range(0, len(c), 333):  # feed slices not aligned to chunks
            out += dec.decompress(c[i : i + 333])
        out += dec.flush()
        assert bytes(out) == data

    def test_streaming_equals_oneshot(self, corpus):
        # LZNT1 is chunk-local: streaming at 4096 multiples gives identical
        # bytes to one-shot compression.
        data = corpus(20000)
        comp = Compressor(Format.LZNT1, unit_size=4096)
        s = comp.compress(data) + comp.flush()
        assert s == tpucomp.compress(Format.LZNT1, data)


class TestStreamingXpress:
    def test_unit_streaming(self, corpus):
        data = corpus(150000)
        units = [data[i : i + 65536] for i in range(0, len(data), 65536)]
        comp_units = [tpucomp.compress(Format.XPRESS, u) for u in units]
        dec = Decompressor(Format.XPRESS, unit_out_lens=[len(u) for u in units])
        out = b"".join(dec.decompress_unit(cu) for cu in comp_units)
        assert out == data

    def test_huff_streaming(self, corpus):
        data = corpus(200000)
        comp = Compressor(Format.XPRESS_HUFF, unit_size=65536)
        stream = comp.compress(data) + comp.flush()
        # each 64 KiB unit is an independent single-block stream; since our
        # decoder reads blocks back-to-back, the concatenation decodes whole
        assert tpucomp.decompress(Format.XPRESS_HUFF, stream, len(data)) == data


class TestBatchAPI:
    def test_batch_all_formats(self, corpus):
        data = corpus(20000)
        units = [data[i : i + 4096] for i in range(0, len(data), 4096)]
        for fmt in (Format.LZNT1, Format.XPRESS, Format.XPRESS_HUFF):
            kw = {} if fmt == Format.LZNT1 else {"unit_size": 4096}
            streams = tpucomp.compress_batch(fmt, units, **kw)
            out = tpucomp.decompress_batch(
                fmt, streams, [len(u) for u in units], **kw
            )
            assert b"".join(out) == data, fmt
