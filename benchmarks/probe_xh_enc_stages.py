"""Per-stage compile probe for the XH encoder at a given batch width.

The remote AOT compile helper has hung on the full [N=256, 64 KiB]
encode program; this compiles each pipeline stage separately to find
which one scales badly.  Usage: python benchmarks/probe_xh_enc_stages.py [N]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from tpucomp.codecs import xpress_huff as xh
from tpucomp.kernels.common import (
    fill_records_delta,
    greedy_commit,
    hash_candidates,
    histogram_matmul,
    le_words,
    multi_matchlens,
    mxu_gather_rows,
    place_monotone,
    run_matchlens,
    scatter_sorted_or,
)
from tpucomp.kernels.huffman import canonical_from_lengths, huffman_code_lengths


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = xh.BLOCK
    WMAX = n + 8
    PB = 2 * n + 16

    def timed(name, fn, *args):
        t0 = time.time()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        print(f"{name:12s} compile+run {time.time() - t0:8.1f}s", flush=True)

    units = jnp.zeros((N, n), jnp.int32)
    ib = jnp.zeros((N, n), jnp.int32)
    bb = jnp.zeros((N, n), jnp.int32)

    timed("runml", lambda u: run_matchlens(u, (1, 2, 3)), units)
    timed("hashcand", lambda u: hash_candidates(u, num_cands=3), units)

    def mml(u):
        w = le_words(u)
        cands = hash_candidates(u, num_cands=3)
        return multi_matchlens(w, cands, [c >= 0 for c in cands], n, cap=32)

    timed("matchlens", mml, units)
    timed("commit", lambda a, b: greedy_commit(a != 0, b + 3, a >= 0), ib, bb)
    timed("histo", lambda s: histogram_matmul(s, 512), ib)

    def huff(s):
        f = histogram_matmul(s, 512)
        lens = huffman_code_lengths(f)
        codes, _, _, _ = canonical_from_lengths(lens)
        return mxu_gather_rows((codes << 5) | lens,
                               jnp.minimum(s, 511), nbits=20)

    timed("huffman", huff, ib)
    timed("sortedor", lambda k, v: scatter_sorted_or(
        jnp.cumsum(k & 1, axis=1), (v, v & 255, v >> 8), WMAX), ib, bb)
    timed("filldelta", lambda k, v: fill_records_delta(
        jnp.cumsum(k & 1, axis=1), v & 0xFFFF, WMAX), ib, bb)
    timed("placebody", lambda k, v: place_monotone(
        (k & 1) == 0, jnp.cumsum(k & 3, axis=1), (v & 255, v >> 8), PB),
        ib, bb)


if __name__ == "__main__":
    main()
