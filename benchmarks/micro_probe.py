"""Micro-benchmark the pair-packed probe gather at production shapes.

Times probe_gather_pairs at the XH far-level shapes (N rows of
U = 64 KiB, Q = U/2 query pairs) with the in-jit chained-reps pattern
from profile_xh (salt-threaded python-unrolled reps, host transfer to
force execution through the tunnel), so tiling changes (QCHUNK / RB)
can be judged in isolation from the pipeline.

    python benchmarks/micro_probe.py [N] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 388
    import os
    qc = int(os.environ.get('QC', 0)) or None
    rb = int(os.environ.get('RB', 0)) or None
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpucomp.kernels import gather_pallas as gp

    U = 65536
    Q = U // 2
    rng = np.random.default_rng(0)
    probe = jnp.asarray(rng.integers(0, 257, (N, U), dtype=np.int32))
    idx1 = jnp.asarray(rng.integers(0, U, (N, Q), dtype=np.int32))
    idx2 = jnp.asarray(rng.integers(0, U, (N, Q), dtype=np.int32))

    @jax.jit
    def run(zero, p, i1, i2):
        s = jnp.int32(0)
        for _ in range(reps):
            o1, o2 = gp.probe_gather_pairs(p + s, i1 + s, i2 + s,
                                           qc=qc, rb=rb)
            s = (jnp.min(o1) + jnp.min(o2)).astype(jnp.int32) * zero
        return s

    z = jnp.int32(0)
    r = run(z, probe, idx1, idx2)
    jax.block_until_ready(r)
    _ = np.asarray(r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(z, probe, idx1, idx2))
        best = min(best, (time.perf_counter() - t0) / reps)
    dt = best
    macs = N * Q * (U // 128) * 128  # one bf16 plane, pair-packed
    print(f"QCHUNK={qc or gp.QCHUNK} RB={rb or gp.RB}: {dt*1e3:8.2f} ms   "
          f"{macs/dt/1e12:6.2f} TMAC/s")


if __name__ == "__main__":
    main()
