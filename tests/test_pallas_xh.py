"""Pallas XH parse kernel vs the XLA scan and the oracle.

The kernel (kernels/xh_pallas.py) runs in interpreter mode on CPU; the
suite keeps sizes tiny because interpret mode executes the grid
step-by-step.  Real-TPU behavior is exercised by bench.py.
"""

import numpy as np
import pytest

from tpucomp.codecs import xpress_huff as xh
from tpucomp.oracle import xpress_huff as oxh


U = 512


def _units(corpus, n_units):
    data = corpus(U * n_units - 100)
    return [data[i : i + U] for i in range(0, len(data), U)], data


def test_pallas_roundtrip_matches_xla(corpus, monkeypatch):
    units, data = _units(corpus, 3)
    streams = xh.compress_units(units, unit_size=U)
    lens = [len(u) for u in units]

    monkeypatch.setenv("TPUCOMP_XH_PALLAS", "0")
    out_xla = xh.decompress_units(streams, lens, unit_size=U)
    monkeypatch.setenv("TPUCOMP_XH_PALLAS", "interpret")
    out_pl = xh.decompress_units(streams, lens, unit_size=U)

    assert b"".join(out_xla) == data
    assert out_pl == out_xla


def test_pallas_decodes_oracle_streams(corpus, monkeypatch):
    units, data = _units(corpus, 2)
    streams = [oxh.compress(u) for u in units]
    monkeypatch.setenv("TPUCOMP_XH_PALLAS", "interpret")
    out = xh.decompress_units(streams, [len(u) for u in units], unit_size=U)
    assert b"".join(out) == data


def test_pallas_mid_rank_tier(rng, monkeypatch):
    """A block whose table uses 257-384 symbols must decode through the
    new rank_cap=384 kernel tier (R3 = 128), bit-exactly vs the oracle."""
    # all 256 literal values (shuffled) + planted repeats: >256 but
    # well under 384 used symbols
    vals = list(range(256))
    rng.shuffle(vals)
    buf = bytearray(vals) + bytearray(rng.randrange(256) for _ in range(U - 256))
    buf[300:340] = buf[20:60]  # long matches -> match symbols
    buf[400:430] = buf[350:380]
    data = bytes(buf)
    stream = oxh.compress(data)
    assert xh._rank_cap(stream) == 384, xh._rank_cap(stream)
    monkeypatch.setenv("TPUCOMP_XH_PALLAS", "interpret")
    out = xh.decompress_units([stream], [len(data)], unit_size=U)
    assert out[0] == data


def test_pallas_flags_truncated_stream(corpus, monkeypatch):
    units, _ = _units(corpus, 1)
    stream = xh.compress_units(units, unit_size=U)[0]
    bad = stream[: 256 + max(4, (len(stream) - 256) // 3)]
    monkeypatch.setenv("TPUCOMP_XH_PALLAS", "interpret")
    from tpucomp.errors import DataError

    with pytest.raises(DataError):
        xh.decompress_units([bad], [len(units[0])], unit_size=U)
