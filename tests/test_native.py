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


class TestRegistry:
    def test_cpu_backend_registered(self, corpus):
        import tpucomp

        data = corpus(10000)
        c = tpucomp.compress("lznt1", data, backend="cpu")
        assert tpucomp.decompress("lznt1", c, backend="cpu") == data
        # auto prefers cpu over oracle
        c2 = tpucomp.compress("lznt1", data)
        assert c2 == c
