"""Stage-level profile of the XH ENCODE pipeline (chained in-jit reps).

Stages: candidate scoring (runs + hash + match lengths), greedy commit,
Huffman tables (histogram/lengths/codes/per-symbol lookup), and the full
encode (assembly ~= full - the rest).

    python benchmarks/profile_xh_enc.py [corpus_mb] [reps]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.corpus import silesia_like
    from tpucomp.codecs import xpress_huff as xh
    from tpucomp.kernels.common import (
        greedy_commit, hash_candidates, histogram_matmul, le_words,
        multi_matchlens, mxu_gather_rows, run_matchlens)
    from tpucomp.kernels.huffman import (
        canonical_from_lengths, huffman_code_lengths)

    data = silesia_like(corpus_mb << 20)
    U = xh.BLOCK
    units_b = [data[i : i + U] for i in range(0, len(data), U)]
    N = max(8, len(units_b))
    ub = np.zeros((N, U), np.int32)
    ul = np.zeros(N, np.int32)
    for i, u in enumerate(units_b):
        a = np.frombuffer(u, np.uint8)
        ub[i, : len(a)] = a
        ul[i] = len(a)
    d_u, d_l = jnp.asarray(ub), jnp.asarray(ul)
    nbytes = len(data)
    print(f"# corpus {corpus_mb} MB, N={N} blocks of {U}")

    MIN_MATCH = xh.MIN_MATCH

    def stage_cands(units, ulen, s):
        units = units + s
        N_, n = units.shape
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                               (N_, n))
        best_len = jnp.zeros((N_, n), jnp.int32)
        best_disp = jnp.ones((N_, n), jnp.int32)

        def consider(length, disp, cond):
            nonlocal best_len, best_disp
            better = cond & (length > best_len)
            best_len = jnp.where(better, length, best_len)
            best_disp = jnp.where(better, disp, best_disp)

        for d, ml in zip(xh._RUN_DISPS, run_matchlens(units, xh._RUN_DISPS)):
            consider(ml, jnp.full((N_, n), d, jnp.int32), ml >= MIN_MATCH)
        w = le_words(units)
        cands = hash_candidates(units, num_cands=3)
        cvalids = [c >= 0 for c in cands]
        mls = multi_matchlens(w, cands, cvalids, n, cap=32)
        for cand, valid, ml in zip(cands, cvalids, mls):
            consider(ml, pos - cand, valid & (ml >= MIN_MATCH))
        return best_len, best_disp

    def stage_commit(units, ulen, best_len, best_disp, s):
        best_len = best_len + s
        N_, n = units.shape
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                               (N_, n))
        in_len = ulen[:, None]
        best_len = jnp.minimum(best_len, in_len - pos)
        is_match = (best_len >= MIN_MATCH) & (pos + MIN_MATCH <= in_len)
        next_bl = jnp.concatenate(
            [best_len[:, 1:], jnp.zeros((N_, 1), jnp.int32)], axis=1)
        is_match = is_match & ~(next_bl > best_len)
        committed = greedy_commit(is_match, best_len, pos < in_len)
        tok_copy = committed & is_match
        L = best_len - MIN_MATCH
        obc = 31 - lax.clz(jnp.maximum(best_disp, 1))
        lh = jnp.minimum(L, 15)
        sym = jnp.where(tok_copy, 256 | (obc << 4) | lh, units)
        sym = jnp.where(committed, sym, xh.NUM_SYMBOLS)
        return sym

    def stage_tables(sym, s):
        sym = sym + s
        freqs = histogram_matmul(sym, xh.NUM_SYMBOLS)
        lengths = huffman_code_lengths(freqs)
        codes, _, _, _ = canonical_from_lengths(lengths)
        packed_tbl = (codes << 5) | lengths
        return mxu_gather_rows(
            packed_tbl, jnp.minimum(sym, xh.NUM_SYMBOLS - 1), nbits=20)

    def stage_full(units, ulen, s):
        return xh._encode_impl(units + s, ulen, U)

    def timeit(name, fn, *args):
        # PYTHON-UNROLLED reps: fori-wrapped variants compile
        # pathologically slowly through the remote AOT helper
        @jax.jit
        def run(zero, *a):
            sal = jnp.int32(0)
            for _ in range(reps):
                out = fn(*a, sal)
                acc = zero
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.min(leaf).astype(jnp.int32)
                sal = acc * zero
            return sal

        z = jnp.int32(0)
        r = run(z, *args)
        jax.block_until_ready(r)
        _ = np.asarray(r)
        t0 = time.perf_counter()
        r = run(z, *args)
        _ = np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:10s} {dt * 1e3:9.2f} ms   {nbytes / dt / 1e9:7.3f} GB/s")
        return jax.jit(fn)(*args, jnp.int32(0))

    bl, bd = timeit("cands", stage_cands, d_u, d_l)
    sym = timeit("commit", stage_commit, d_u, d_l, bl, bd)
    timeit("tables", stage_tables, sym)
    timeit("full", stage_full, d_u, d_l)


if __name__ == "__main__":
    main()
