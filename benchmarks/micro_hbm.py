"""Micro-profile hash_best_match internals (the LZNT1/Xpress match finder).

Splits the fused finder into its three phases — the 9-plane hash sort,
the candidate compare loop, the packed bitonic un-sort — with the
salted chained-reps pattern (data-operand salt so XLA cannot CSE the
work across reps; slope timing not needed here since each phase is
>> the dispatch floor at production widths).

    python benchmarks/micro_hbm.py [corpus_mb] [N] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.corpus import silesia_like
    from tpucomp.config import DEFAULT as CFG
    from tpucomp.kernels import common as C

    n = 4096
    data = silesia_like(corpus_mb << 20)
    nchunks = min(N, -(-len(data) // n))
    arr = np.frombuffer(data[: nchunks * n], np.uint8)
    chunks = np.zeros(nchunks * n, np.int32)
    chunks[: len(arr)] = arr
    chunks = chunks.reshape(nchunks, n)
    d_c = jnp.asarray(chunks)
    nbytes = nchunks * n
    hb, nc, cap = (CFG.match.hash_bits, CFG.match.num_candidates,
                   CFG.match.cap)
    nwords = cap // 4
    pos_bits = (n - 1).bit_length()
    print(f"# {nchunks}x{n} ({nbytes >> 20} MB), reps={reps}, "
          f"planes={1 + nwords}, cands={nc}")

    def build(x):
        w = C.le_words(x)
        tri = (x | (jnp.roll(x, -1, axis=1) << 8)
               | (jnp.roll(x, -2, axis=1) << 16)).astype(jnp.uint32)
        h = ((tri * jnp.uint32(0x9E3779B1))
             >> jnp.uint32(32 - hb)).astype(jnp.int32)
        pos = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, :], (nchunks, n))
        key = (h << pos_bits) | pos
        shifted = tuple(jnp.roll(w, -4 * t, axis=1) for t in range(nwords))
        return key, shifted

    def stage_sort(x):
        key, shifted = build(x)
        return C.sort_rows((key, *shifted), num_keys=1)

    def cand_loop(srt):
        skey, sw = srt[0], srt[1:]
        spos = skey & ((1 << pos_bits) - 1)
        sh = skey >> pos_bits
        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        best_len = jnp.zeros((nchunks, n), jnp.int32)
        best_disp = jnp.ones((nchunks, n), jnp.int32)
        for k in range(1, nc + 1):
            cand = jnp.roll(spos, k, axis=1)
            ok = (idx >= k) & (jnp.roll(sh, k, axis=1) == sh)
            total = jnp.zeros((nchunks, n), jnp.int32)
            alive = ok
            for t in range(nwords):
                off = 4 * t
                v = sw[t] ^ jnp.roll(sw[t], k, axis=1)
                tz = 32 - lax.clz(v & -v) - 1
                agree = jnp.where(v == 0, 4, tz >> 3)
                clip_m = ((spos + off) > (n - 4)) | (cand + off > n - 4)
                agree = jnp.where(clip_m, 0, agree)
                total = total + jnp.where(alive, agree, 0)
                alive = alive & (v == 0) & ~clip_m
            ml = jnp.where(ok, total, 0)
            better = ok & (ml > best_len)
            best_len = jnp.where(better, ml, best_len)
            best_disp = jnp.where(better, spos - cand, best_disp)
        return spos, best_len, best_disp

    def stage_sort_loop(x):
        return cand_loop(stage_sort(x))

    def stage_full(x):
        return C.hash_best_match(x, n, hash_bits=hb, num_cands=nc, cap=cap)

    def timeit(name, fn):
        @jax.jit
        def run(zero, c):
            s = jnp.int32(0)
            acc = zero
            for _ in range(reps):
                outs = fn(c + s)
                acc = zero
                for leaf in jax.tree_util.tree_leaves(outs):
                    acc = acc + jnp.sum(leaf.astype(jnp.int32))
                s = (acc & 1).astype(jnp.int32) * zero
            return acc

        z = jnp.int32(0)
        r = run(z, d_c)
        jax.block_until_ready(r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(run(z, d_c))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name:12s} {best*1e3:8.2f} ms   {nbytes/best/1e9:6.3f} GB/s")
        return best

    def stage_sort_bitonic(x):
        key, shifted = build(x)
        from tpucomp.kernels.sort_pallas import bitonic_sort_rows
        return bitonic_sort_rows((key, *shifted))

    t_sort = timeit("sort9", stage_sort)
    timeit("sort9_bit", stage_sort_bitonic)
    t_sl = timeit("sort+loop", stage_sort_loop)
    t_full = timeit("full", stage_full)
    print(f"# loop ~= {1e3*(t_sl - t_sort):.2f} ms, "
          f"unsort ~= {1e3*(t_full - t_sl):.2f} ms")


if __name__ == "__main__":
    main()
