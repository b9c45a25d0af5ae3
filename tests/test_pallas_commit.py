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


def test_greedy_commit_layout_matches_scan(corpus, rng):
    """The walk's in-kernel layout prefix sums == the XLA scan's."""
    import numpy as np
    import jax.numpy as jnp
    from jax import lax

    from tpucomp.kernels.lz_pallas import greedy_commit_layout

    N, n = 9, 512
    is_match = np.zeros((N, n), bool)
    best_len = np.ones((N, n), np.int32)
    for i in range(N):
        for j in range(0, n - 8, rng.randrange(3, 9)):
            if rng.random() < 0.5:
                is_match[i, j] = True
                best_len[i, j] = rng.randrange(3, 20)
    okpos = np.ones((N, n), bool)
    okpos[:, n - 5 :] = False

    com, ta, db = greedy_commit_layout(
        jnp.asarray(is_match), jnp.asarray(best_len), jnp.asarray(okpos),
        interpret=True)
    com, ta, db = np.asarray(com), np.asarray(ta), np.asarray(db)

    # reference walk
    for i in range(N):
        nc = t = d = 0
        for p in range(n):
            commit = (p == nc) and okpos[i, p]
            assert com[i, p] == commit, (i, p)
            assert db[i, p] == d, (i, p)
            if commit:
                t += 1
                d += 2 if is_match[i, p] else 1
                nc = p + (best_len[i, p] if is_match[i, p] else 1)
            assert ta[i, p] == t, (i, p)


def test_lznt1_encode_via_pallas_layout(corpus, monkeypatch):
    """LZNT1 encode through the in-kernel commit+layout walk equals the
    XLA-scan encode byte-for-byte."""
    monkeypatch.setenv("TPUCOMP_COMMIT_PALLAS", "interpret")
    import jax

    from tpucomp.codecs import lznt1 as lz
    from tpucomp.oracle import lznt1 as o_lz

    data = corpus(20000)
    c = jax.jit(lz.encode_batch.__wrapped__)  # fresh trace (env-gated)
    import numpy as np

    n = lz.CHUNK
    nc = -(-len(data) // n)
    chunks = np.zeros((nc, n), np.int32)
    arr = np.frombuffer(data, np.uint8)
    flat = chunks.reshape(-1)
    flat[: len(arr)] = arr
    chunks = flat.reshape(nc, n)
    clen = np.minimum(len(data) - np.arange(nc) * n, n).astype(np.int32)
    pay_p, len_p = (np.asarray(x) for x in c(chunks, clen))
    monkeypatch.setenv("TPUCOMP_COMMIT_PALLAS", "0")
    c2 = jax.jit(lz.encode_batch.__wrapped__)
    pay_x, len_x = (np.asarray(x) for x in c2(chunks, clen))
    assert (len_p == len_x).all()
    assert (pay_p == pay_x).all()
    # and the streams are spec-valid
    for k in range(nc):
        body = pay_p[k, : int(len_p[k])].astype(np.uint8).tobytes()
        if len_p[k] < clen[k]:
            hdr = (0xB000 | (int(len_p[k]) - 1)).to_bytes(2, "little")
            assert o_lz.decompress(hdr + body) == data[k * n : k * n + int(clen[k])]
