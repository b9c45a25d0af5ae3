"""Stage-level profile of the LZNT1 ENCODE pipeline (chained reps).

Stages: run matcher, hash candidates (the sort pair), match lengths
(the fill_gather), greedy commit, and the full encode (token/flag
assembly ~= full - the rest).

    python benchmarks/profile_lz_enc.py [corpus_mb] [batch] [reps]
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
    from tpucomp.codecs import lznt1 as lz
    from tpucomp.codecs.lznt1_expose import encode_batch_impl
    from tpucomp.config import DEFAULT as CFG
    from tpucomp.kernels.common import (
        greedy_commit, hash_candidates, le_words, multi_matchlens,
        run_matchlens)

    data = silesia_like(corpus_mb << 20)
    n = lz.CHUNK
    nchunks = min(N, -(-len(data) // n))
    chunks = np.zeros((nchunks, n), np.int32)
    arr = np.frombuffer(data[: nchunks * n], np.uint8)
    flat = chunks.reshape(-1)
    flat[: len(arr)] = arr
    chunks = flat.reshape(nchunks, n)
    clen = np.full(nchunks, n, np.int32)
    d_c, d_l = jnp.asarray(chunks), jnp.asarray(clen)
    nbytes = nchunks * n
    print(f"# {nchunks} chunks of {n} ({nbytes >> 20} MB), reps={reps}")

    def stage_runs(c, s):
        return run_matchlens(c + s, CFG.match.run_disps)

    def stage_hash(c, s):
        return hash_candidates(c + s, hash_bits=CFG.match.hash_bits,
                               num_cands=CFG.match.num_candidates)

    def stage_mlens(c, s):
        w = le_words(c + s)
        cands = hash_candidates(c + s, hash_bits=CFG.match.hash_bits,
                                num_cands=CFG.match.num_candidates)
        return multi_matchlens(w, cands, [cc >= 0 for cc in cands], n,
                               cap=CFG.match.cap)

    def stage_commit(c, l, s):
        ml = run_matchlens(c + s, (1,))[0]
        return greedy_commit(ml >= 3, jnp.maximum(ml, 3),
                             jnp.arange(n)[None, :] < l[:, None])

    def stage_full(c, l, s):
        return encode_batch_impl(c + s, l)[1]

    def timeit(name, fn, *args):
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

        z = jnp.int32(0)
        r = run(z, *args)
        jax.block_until_ready(r)
        _ = np.asarray(r)
        t0 = time.perf_counter()
        r = run(z, *args)
        _ = np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:10s} {dt * 1e3:9.2f} ms   {nbytes / dt / 1e9:7.3f} GB/s",
              flush=True)

    timeit("runs", stage_runs, d_c)
    timeit("hash", stage_hash, d_c)
    timeit("mlens", stage_mlens, d_c)
    timeit("commit", stage_commit, d_c, d_l)
    timeit("full", stage_full, d_c, d_l)


if __name__ == "__main__":
    main()
