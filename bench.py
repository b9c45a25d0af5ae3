#!/usr/bin/env python
"""Benchmark entry point: prints ONE JSON line.

Headline metric (BASELINE.md): GB/s/chip decode on a Silesia-like corpus,
vs the 1 GB/s/chip north-star baseline.

Measurement methodology — the dev chip is reached through a network
tunnel whose runtime (a) elides repeated identical dispatches and (b)
acknowledges before completion, so naive rep loops measure nothing.
Reps are therefore CHAINED on device: each iteration's inputs carry a
data dependency on the previous iteration's outputs (a zero-valued salt
derived from them), with a single sync at the end.  This measures true
device-resident kernel throughput — the production configuration, where
compressed/uncompressed batches stream device-side (host transfers
through this tunnel run at ~15 MB/s and would swamp any kernel; on a
production-attached v5p PCIe/ICI feeds are orders of magnitude faster).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CORPUS_MB = 8
BASELINE_GBPS = 1.0  # north star: >= 1 GB/s/chip decode (BASELINE.md)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from benchmarks.corpus import silesia_like
    from tpucomp.codecs import lznt1 as codec
    from tpucomp.codecs.lznt1_expose import decode_batch_impl, encode_batch_impl

    data = silesia_like(CORPUS_MB << 20)

    nchunks = -(-len(data) // codec.CHUNK)
    N = max(256, -(-nchunks // 256) * 256)
    chunks = np.zeros((N, codec.CHUNK), np.int32)
    clen = np.zeros(N, np.int32)
    arr = np.frombuffer(data, np.uint8)
    flat = chunks[:nchunks].reshape(-1)
    flat[: len(arr)] = arr
    chunks[:nchunks] = flat.reshape(nchunks, codec.CHUNK)
    clen[:nchunks] = np.minimum(len(arr) - np.arange(nchunks) * codec.CHUNK, codec.CHUNK)
    d_chunks = jnp.asarray(chunks)
    d_clen = jnp.asarray(clen)

    # chained wrappers: `salt` is always 0 but data-depends on the previous
    # iteration, defeating dispatch elision without changing semantics
    enc = jax.jit(lambda c, l, salt: encode_batch_impl(c, l + salt))
    dec = jax.jit(lambda p, l, ic, salt: decode_batch_impl(p, l + salt, ic))

    # --- encode ---
    salt = jnp.int32(0)
    payload, plen = enc(d_chunks, d_clen, salt)
    jax.block_until_ready((payload, plen))
    t0 = time.perf_counter()
    REPS_E = 20
    for _ in range(REPS_E):
        payload, plen = enc(d_chunks, d_clen, salt)
        salt = jnp.min(plen) * 0
    jax.block_until_ready((payload, plen, salt))
    enc_gbps = (len(data) * REPS_E / (time.perf_counter() - t0)) / 1e9

    # --- build decode batch from the encoded payloads (host, untimed) ---
    payload_h = np.asarray(payload)
    plen_h = np.asarray(plen)
    dec_payload = np.zeros((N, codec.PAYLOAD_PAD), np.int32)
    dec_plen = np.zeros(N, np.int32)
    dec_comp = np.zeros(N, bool)
    for k in range(nchunks):
        pl, cl = int(plen_h[k]), int(clen[k])
        if pl < cl:
            dec_payload[k, :pl] = payload_h[k, :pl]
            dec_plen[k] = pl
            dec_comp[k] = True
        else:
            dec_payload[k, :cl] = chunks[k, :cl]
            dec_plen[k] = cl
    comp_bytes = int(2 * nchunks + sum(min(int(plen_h[k]), int(clen[k])) for k in range(nchunks)))
    d_payload = jnp.asarray(dec_payload)
    d_plen = jnp.asarray(dec_plen)
    d_comp = jnp.asarray(dec_comp)

    # correctness gate (untimed)
    salt = jnp.int32(0)
    out, out_lens, err = dec(d_payload, d_plen, d_comp, salt)
    jax.block_until_ready(out)
    assert not np.asarray(err)[:nchunks].any()
    got = np.asarray(out)[:nchunks].astype(np.uint8)
    ol = np.asarray(out_lens)
    recon = b"".join(got[i, : int(ol[i])].tobytes() for i in range(nchunks))
    assert recon == data, "decode mismatch"

    # --- decode (chained) ---
    t0 = time.perf_counter()
    REPS_D = 20
    for _ in range(REPS_D):
        out, out_lens, err = dec(d_payload, d_plen, d_comp, salt)
        salt = jnp.min(out_lens) * 0
    jax.block_until_ready((out, salt))
    dec_gbps = (len(data) * REPS_D / (time.perf_counter() - t0)) / 1e9

    print(
        json.dumps(
            {
                "metric": "lznt1_decode_GBps_chip",
                "value": round(dec_gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(dec_gbps / BASELINE_GBPS, 4),
                "extras": {
                    "lznt1_encode_GBps_chip": round(enc_gbps, 4),
                    "corpus_mb": CORPUS_MB,
                    "ratio": round(comp_bytes / len(data), 4),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
