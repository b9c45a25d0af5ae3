"""Far-level micro-bench: overlapped vs segmented schedules on
synthetic tag states shaped like real xpress post-near states.

    python benchmarks/micro_far.py [N] [tag_frac] [max_links]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    tag_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3
    links = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tpucomp.kernels.common import (
        FAR_TAG, _far_level_overlapped, _far_level_segmented, _far_rounds)

    U = 65536
    rng = np.random.default_rng(0)
    out = rng.integers(0, 256, (N, U), dtype=np.int32)
    ntag = int(tag_frac * U)
    for n in range(N):
        # chains of up to `links` hops, each hop 512..8192 (in-window)
        heads = rng.integers(9000, U, ntag // max(1, links))
        for p in heads:
            q = int(p)
            for _ in range(rng.integers(1, links + 1)):
                step = int(rng.integers(513, 8192))
                src = q - step
                if src < 0:
                    break
                out[n, q] = FAR_TAG | src
                q = src
    d = jnp.asarray(out)

    def timeit(name, fn):
        f = jax.jit(fn)
        r = f(d)
        jax.block_until_ready(r)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r = f(d)
            jax.block_until_ready(r)
            ts.append(time.perf_counter() - t0)
        print(f"{name:28s} {min(ts) * 1e3:9.2f} ms", flush=True)
        return r

    a = timeit("overlapped(S4096,H8192)",
               lambda x: _far_level_overlapped(x, U, 4096, 8192, cap=6))
    b = timeit("segmented(4k,cap6)",
               lambda x: _far_level_segmented(x, U, 4096, cap=6))
    timeit("far_rounds seg (old)",
           lambda x: _far_rounds(x, U, 512, max_hop=None))
    timeit("far_rounds ovl (new)",
           lambda x: _far_rounds(x, U, 512, max_hop=8192))
    timeit("far_rounds ovl fast",
           lambda x: _far_rounds(x, U, 512, fast=True, max_hop=8192))
    ta = int(np.asarray((a & FAR_TAG) != 0).sum())
    tb = int(np.asarray((b & FAR_TAG) != 0).sum())
    print(f"# leftover tags: overlapped {ta}  segmented {tb}")


if __name__ == "__main__":
    main()
