"""Native C backend vs oracle: cross bit-compatibility (third
independent implementation)."""

import pytest

pytest.importorskip("ctypes")

from tpucomp import _native
from tpucomp.oracle import lznt1 as o_lznt1
from tpucomp.oracle import xpress as o_xpress
from tpucomp.oracle import xpress_huff as o_xh

try:
    _native._load()
    HAVE = True
except Exception:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="no C compiler")


def cases(corpus, rng):
    return [
        b"",
        b"x",
        b"abc" * 700,
        b"a" * 10000,
        bytes(range(256)) * 40,
        corpus(4096),
        corpus(70000),
        bytes(rng.randrange(256) for _ in range(9000)),
        b"\x00" * 70000,
        b"S" + b"T" * 300,
    ]


class TestLZNT1:
    def test_cross(self, corpus, rng):
        for data in cases(corpus, rng):
            c_n = _native.lznt1_compress(data)
            assert o_lznt1.decompress(c_n) == data, len(data)
            c_o = o_lznt1.compress(data)
            assert _native.lznt1_decompress(c_o) == data, len(data)


class TestXpress:
    def test_cross(self, corpus, rng):
        for data in cases(corpus, rng):
            if not data:
                continue
            c_n = _native.xpress_compress(data)
            assert o_xpress.decompress(c_n, len(data)) == data, len(data)
            c_o = o_xpress.compress(data)
            assert _native.xpress_decompress(c_o, len(data)) == data, len(data)

    def test_resolved_profile_ratio_gate(self, corpus):
        """The r5 overlap depth model makes the archive profile cheap
        at per-64KiB-unit granularity: +0.00% on 16 MB silesia-like at
        chain cap 32 (the bench corpus/number), +4.0% on THIS more
        repetitive mixed-runs corpus.  Gate at +6% so a model
        regression toward the r4 segment model (+7% silesia / ~+10%
        here) cannot land silently."""
        total_p = total_r = 0
        for k in range(8):
            u = corpus(65536)
            total_p += len(_native.xpress_compress(u))
            total_r += len(_native.xpress_compress_resolved(u))
            # resolved streams stay standard [MS-XCA]
            assert o_xpress.decompress(
                _native.xpress_compress_resolved(u), len(u)) == u
        assert total_r <= total_p * 1.06, (total_r, total_p)


class TestXH:
    def test_cross(self, corpus, rng):
        for data in cases(corpus, rng):
            if not data:
                continue
            c_n = _native.xh_compress(data)
            assert o_xh.decompress(c_n, len(data)) == data, len(data)
            c_o = o_xh.compress(data)
            assert _native.xh_decompress(c_o, len(data)) == data, len(data)

    def test_multiblock_sync(self, corpus):
        data = corpus(200000)  # 4 blocks
        c_n = _native.xh_compress(data)
        assert o_xh.decompress(c_n, len(data)) == data
        c_o = o_xh.compress(data)
        assert _native.xh_decompress(c_o, len(data)) == data

    def test_dbg_decoder_matches_production(self, corpus):
        """xh_decompress_dbg shares the production parse loop; pin the
        equality so the offline resolve-schedule census (benchmarks/
        analyze_chain_depth.py) measures the token stream the real
        decoder sees."""
        import ctypes

        import numpy as np

        data = corpus(150000)  # multi-block
        c = _native.xh_compress(data)
        lib = _native._load()
        fn = lib.xh_decompress_dbg
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p,
                       ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
        out = ctypes.create_string_buffer(len(data))
        disp = np.zeros(len(data), np.int32)
        tokp = np.zeros(len(data), np.int32)
        rc = fn(c, len(c), out, len(data),
                disp.ctypes.data, tokp.ctypes.data)
        assert rc == len(data)
        assert out.raw == data == _native.xh_decompress(c, len(data))
        # every copy byte's recorded source reproduces the output
        j = np.arange(len(data))
        a = np.frombuffer(data, np.uint8)
        cp = disp > 0
        assert (a[(j - disp)[cp]] == a[cp]).all()


class TestRegistry:
    def test_cpu_backend_registered(self, corpus):
        import tpucomp

        data = corpus(10000)
        c = tpucomp.compress("lznt1", data, backend="cpu")
        assert tpucomp.decompress("lznt1", c, backend="cpu") == data
        # auto prefers cpu over oracle
        c2 = tpucomp.compress("lznt1", data)
        assert c2 == c


class TestNativeStreaming:
    """Window-carry streaming in the native C backend (reference
    ms_deflate/ms_inflate parity, SURVEY.md §3.5; VERDICT r2 weak #5:
    Compressor/Decompressor must honor backend=)."""

    def test_xpress_stream_equals_oneshot(self, corpus):
        data = corpus(150000)
        for step in (1, 333, 777, 65536, len(data)):
            sc = _native.NativeStreamCompressor("xpress")
            out = bytearray()
            for i in range(0, len(data), step):
                out += sc.compress(data[i : i + step])
            out += sc.flush()
            assert bytes(out) == _native.xpress_compress(data), step
            assert _native.xpress_decompress(bytes(out), len(data)) == data

    def test_xh_stream_equals_oneshot(self, corpus):
        data = corpus(200000)  # several blocks
        for step in (50001, 65536, 999, len(data)):
            sc = _native.NativeStreamCompressor("xpress_huff")
            out = bytearray()
            for i in range(0, len(data), step):
                out += sc.compress(data[i : i + step])
            out += sc.flush()
            assert bytes(out) == _native.xh_compress(data), step

    def test_stream_empty_input(self):
        for fmt in ("xpress", "xpress_huff"):
            sc = _native.NativeStreamCompressor(fmt)
            out = sc.flush()
            assert out == (
                _native.xh_compress(b"")
                if fmt == "xpress_huff"
                else _native.xpress_compress(b"")
            )

    def test_stream_decode_arbitrary_slices(self, corpus):
        data = corpus(180000)
        for fmt, stream in (
            ("xpress", o_xpress.compress(data)),
            # cross-block back-references exercise the carried window
            ("xpress_huff", o_xh.compress(data, cross_block=True)),
        ):
            for step in (1, 997, 65536, len(stream)):
                sd = _native.NativeStreamDecompressor(fmt, len(data))
                out = bytearray()
                for i in range(0, len(stream), step):
                    out += sd.decompress(stream[i : i + step])
                out += sd.flush()
                assert bytes(out) == data, (fmt, step)

    def test_stream_decode_truncated_raises(self, corpus):
        import tpucomp

        data = corpus(100000)
        stream = o_xh.compress(data)
        sd = _native.NativeStreamDecompressor("xpress_huff", len(data))
        sd.decompress(stream[: len(stream) // 2])
        with pytest.raises(tpucomp.DataError):
            sd.flush()

    def test_api_streaming_honors_backend(self, corpus):
        """Compressor/Decompressor(backend='cpu') run the native engines
        and round-trip against each other and the oracle."""
        import tpucomp
        from tpucomp import Compressor, Decompressor, Format

        data = corpus(150000)
        for fmt in (Format.XPRESS, Format.XPRESS_HUFF):
            comp = Compressor(fmt, backend="cpu")
            assert comp.backend == "cpu"
            s = comp.compress(data) + comp.flush()
            # native stream == native one-shot
            assert s == tpucomp.compress(fmt, data, backend="cpu")
            dec = Decompressor(fmt, backend="cpu", out_len=len(data))
            out = bytearray()
            for i in range(0, len(s), 1013):
                out += dec.decompress(s[i : i + 1013])
            out += dec.flush()
            assert bytes(out) == data
            # oracle still decodes the native stream (cross-impl)
            mod = o_xpress if fmt == Format.XPRESS else o_xh
            assert mod.decompress(s, len(data)) == data

    def test_api_streaming_tpu_backend_raises(self):
        import tpucomp
        from tpucomp import Compressor, Format

        with pytest.raises(tpucomp.ArgError):
            Compressor(Format.XPRESS, backend="tpu")
