"""Pallas Xpress parse kernel vs the XLA scan and the oracle
(interpreter mode on CPU; tiny sizes — see test_pallas_xh.py)."""

import pytest

from tpucomp.codecs import xpress as xp
from tpucomp.oracle import xpress as oxp


U = 512


def _units(corpus, n_units):
    data = corpus(U * n_units - 77)
    return [data[i : i + U] for i in range(0, len(data), U)], data


def test_pallas_roundtrip_matches_xla(corpus, monkeypatch):
    units, data = _units(corpus, 3)
    streams = xp.compress_units(units, unit_size=U)
    lens = [len(u) for u in units]

    monkeypatch.setenv("TPUCOMP_XP_PALLAS", "0")
    out_xla = xp.decompress_units(streams, lens, unit_size=U)
    monkeypatch.setenv("TPUCOMP_XP_PALLAS", "interpret")
    out_pl = xp.decompress_units(streams, lens, unit_size=U)

    assert b"".join(out_xla) == data
    assert out_pl == out_xla


def test_pallas_decodes_oracle_streams(corpus, monkeypatch):
    units, data = _units(corpus, 2)
    streams = [oxp.compress(u) for u in units]
    monkeypatch.setenv("TPUCOMP_XP_PALLAS", "interpret")
    out = xp.decompress_units(streams, [len(u) for u in units], unit_size=U)
    assert b"".join(out) == data


def test_pallas_long_run_escapes(monkeypatch):
    # u16 length escape + shared-nibble pairing in one unit (fits U)
    data = b"\x07" * 300 + b"ab" * 30 + b"\x07" * 80
    assert len(data) <= U
    stream = oxp.compress(data)
    monkeypatch.setenv("TPUCOMP_XP_PALLAS", "interpret")
    out = xp.decompress_units([stream], [len(data)], unit_size=U)
    assert out[0] == data


def test_pallas_flags_truncated_stream(corpus, monkeypatch):
    units, _ = _units(corpus, 1)
    stream = xp.compress_units(units, unit_size=U)[0]
    monkeypatch.setenv("TPUCOMP_XP_PALLAS", "interpret")
    from tpucomp.errors import DataError

    with pytest.raises(DataError):
        xp.decompress_units([stream[: len(stream) // 2]], [len(units[0])],
                            unit_size=U)


def test_lznt1_pallas_parse_matches_xla(corpus, monkeypatch):
    """LZNT1 Pallas parse kernel decodes oracle streams bit-exactly."""
    import numpy as np
    import jax.numpy as jnp
    from tpucomp.codecs import lznt1 as codec
    from tpucomp.kernels import lznt1_pallas
    from tpucomp.oracle import lznt1 as oracle

    data = corpus(40000) + b"\x00" * 5000 + corpus(3000)
    stream = oracle.compress(data)
    payloads, comps = codec.split_stream(stream)
    N = len(payloads)
    payload = np.zeros((N, codec.PAYLOAD_PAD), np.int32)
    plen = np.zeros(N, np.int32)
    is_comp = np.zeros(N, bool)
    for k, (pl_, cp) in enumerate(zip(payloads, comps)):
        a = np.frombuffer(pl_, np.uint8)
        payload[k, : len(a)] = a
        plen[k] = len(a)
        is_comp[k] = cp
    args = (jnp.asarray(payload), jnp.asarray(plen), jnp.asarray(is_comp))

    rp, rv, pf, errk = lznt1_pallas.parse_records(
        args[0], args[1], args[2], codec.CHUNK, interpret=True)
    assert not np.asarray(errk).any()
    out, out_len, err = codec._records_to_output(
        rp, rv, pf, errk != 0, args[0], args[1], args[2], N)
    assert not np.asarray(err).any()
    got = b"".join(
        np.asarray(out[i, : int(out_len[i])]).astype(np.uint8).tobytes()
        for i in range(N)
    )
    assert got == data
