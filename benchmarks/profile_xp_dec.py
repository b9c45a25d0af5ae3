"""Xpress decode micro-bench: archive (resolved) + foreign streams,
slope-timed (mirrors bench.py stage_xpress's decode protocol without
the encode stage).  For iterating on the far-resolve schedule.

    python benchmarks/profile_xp_dec.py [corpus_mb]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.corpus import silesia_like
    from tpucomp import _native
    from tpucomp.codecs import xpress as xp
    from tpucomp.util import pallas_mode

    XU = 65536
    data = silesia_like(corpus_mb << 20)
    units = [data[i : i + XU] for i in range(0, len(data), XU)]
    nbytes = len(data)
    mode = pallas_mode("TPUCOMP_XP_PALLAS")
    print(f"# {corpus_mb} MB, {len(units)} units, mode={mode}")

    def slope(fn, args, reps_lo=2):
        def runner(reps):
            @jax.jit
            def run(zero, *a):
                s = jnp.int32(0)
                for _ in range(reps):
                    outs = fn(*a, s)
                    acc = zero
                    for leaf in jax.tree_util.tree_leaves(outs):
                        acc = acc + jnp.min(leaf).astype(jnp.int32)
                    s = acc * zero
                return s

            return run

        times = {}
        for reps in (reps_lo, 2 * reps_lo):
            run = runner(reps)
            z = jnp.int32(0)
            r = run(z, *args)
            _ = np.asarray(r)
            best = 1e9
            for _t in range(3):
                t0 = time.perf_counter()
                r = run(z, *args)
                _ = np.asarray(r)
                best = min(best, time.perf_counter() - t0)
            times[reps] = best
        return (times[2 * reps_lo] - times[reps_lo]) / reps_lo

    def run_decode(name, streams, fast):
        PX = min(
            xp.max_payload(XU),
            max(1024, -(-max(len(s) for s in streams) // 8192) * 8192)
            + 16,
        )
        N = max(8, len(streams))
        pp = np.zeros((N, PX), np.int32)
        pl = np.zeros(N, np.int32)
        ol = np.zeros(N, np.int32)
        for i, s in enumerate(streams):
            a = np.frombuffer(s, np.uint8)
            pp[i, : len(a)] = a
            pl[i] = len(a)
            ol[i] = len(units[i])
        d = (jnp.asarray(pp), jnp.asarray(pl), jnp.asarray(ol))
        f = jax.jit(lambda p, l, o, s: xp._decode_impl(
            p, l, o + s, XU, mode, fast_resolve=fast))
        o_dev, err = f(*d, jnp.int32(0))
        jax.block_until_ready(o_dev)
        assert not np.asarray(err)[: len(units)].any(), name
        got = np.asarray(o_dev).astype(np.uint8)
        recon = b"".join(got[i, : len(units[i])].tobytes()
                         for i in range(len(units)))
        assert recon == data, f"{name} decode mismatch"
        t = slope(lambda p, l, o, s: xp._decode_impl(
            p + s, l, o, XU, mode, fast_resolve=fast)[0], d)
        print(f"{name:14s} {t * 1e3:9.2f} ms   {nbytes / t / 1e9:7.3f} "
              "GB/s", flush=True)

    import multiprocessing as mp
    import os

    from bench import _native_xp_compress, _native_xp_compress_rw

    with mp.get_context("spawn").Pool(min(12, os.cpu_count() or 4)) as pool:
        nat = pool.map(_native_xp_compress, units, chunksize=8)
        nat_rw = pool.map(_native_xp_compress_rw, units, chunksize=8)
    print(f"# ratios: plain {sum(map(len, nat)) / nbytes:.4f}  resolved "
          f"{sum(map(len, nat_rw)) / nbytes:.4f}")
    run_decode("archive", nat_rw, True)
    run_decode("foreign", nat, False)


if __name__ == "__main__":
    main()
