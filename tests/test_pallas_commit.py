"""Pallas greedy_commit (kernels/lz_pallas) vs the XLA K-unrolled scan."""

import numpy as np
import jax.numpy as jnp

from tpucomp.kernels import common


def test_commit_matches_xla():
    rng = np.random.default_rng(7)
    N, n = 9, 1000
    is_match = rng.random((N, n)) < 0.3
    best_len = rng.integers(3, 40, (N, n)).astype(np.int32)
    ok = np.ones((N, n), bool)
    ok[:, -5:] = False
    a = common.greedy_commit(
        jnp.asarray(is_match), jnp.asarray(best_len), jnp.asarray(ok),
        mode=None)
    b = common.greedy_commit(
        jnp.asarray(is_match), jnp.asarray(best_len), jnp.asarray(ok),
        mode="interpret")
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_encode_roundtrip_via_pallas_commit(corpus, monkeypatch):
    monkeypatch.setenv("TPUCOMP_COMMIT_PALLAS", "interpret")
    from tpucomp.codecs import xpress_huff as xh

    data = corpus(3000)
    U = 1024
    units = [data[i : i + U] for i in range(0, len(data), U)]
    # fresh trace: the encoder jit cache may hold the XLA-commit trace
    xh._ENCODERS.pop(U, None)
    streams = xh.compress_units(units, unit_size=U)
    out = xh.decompress_units(streams, [len(u) for u in units], unit_size=U)
    assert b"".join(out) == data
    xh._ENCODERS.pop(U, None)
