#!/usr/bin/env python
"""Scaling-efficiency sweep (BASELINE.md config 5).

Runs the sharded LZNT1 pipeline over meshes of 1..max devices and
reports weak-scaling efficiency (bytes/s per device vs the 1-device
run).  On the dev host this exercises the GSPMD path over the virtual
CPU mesh (set JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_
device_count=8) — the same code measures real ICI scaling on a pod
slice, where `jax.distributed.initialize()` has been called first.

Usage:  python benchmarks/scaling.py [corpus_mb]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from benchmarks.corpus import silesia_like
    from tpucomp.codecs import lznt1 as lz
    from tpucomp.codecs.lznt1_expose import decode_batch_impl
    from tpucomp.dist import data_mesh

    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    devs = jax.devices()
    results = []
    base = None
    counts = [c for c in [1, 2, 4, 8, 16, 32] if c <= len(devs)]
    for nd in counts:
        mesh = data_mesh(devs[:nd])
        sharding = NamedSharding(mesh, P("data"))
        # weak scaling: corpus_mb per device
        data = silesia_like(corpus_mb << 20)
        nchunks = -(-len(data) // lz.CHUNK)
        Nper = -(-nchunks // 256) * 256
        N = Nper * nd
        chunks = np.zeros((N, lz.CHUNK), np.int32)
        clen = np.zeros(N, np.int32)
        arr = np.frombuffer(data, np.uint8)
        for d in range(nd):  # replicate per device (weak scaling)
            flat = chunks[d * Nper : d * Nper + nchunks].reshape(-1)
            flat[: len(arr)] = arr
            chunks[d * Nper : d * Nper + nchunks] = flat.reshape(nchunks, -1)
            clen[d * Nper : d * Nper + nchunks] = np.minimum(
                len(arr) - np.arange(nchunks) * lz.CHUNK, lz.CHUNK
            )
        enc = jax.jit(
            lambda c, l, s: lz.encode_batch.__wrapped__(c, l + s)[1],
            in_shardings=(sharding, sharding, None),
            out_shardings=sharding,
        )
        dc = jax.device_put(chunks, sharding)
        dl = jax.device_put(clen, sharding)
        salt = jnp.int32(0)
        r = enc(dc, dl, salt)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        reps = 4
        for _ in range(reps):
            r = enc(dc, dl, salt)
            salt = jnp.min(r) * 0
        jax.block_until_ready((r, salt))
        dt = (time.perf_counter() - t0) / reps
        gbps = nd * len(data) / dt / 1e9
        if base is None:
            base = gbps
        results.append(
            {
                "devices": nd,
                "GBps": round(gbps, 4),
                "efficiency": round(gbps / (base * nd), 4),
            }
        )
    print(json.dumps({"scaling": results, "backend": str(devs[0])}))


if __name__ == "__main__":
    main()
