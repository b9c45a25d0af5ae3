"""Micro-benchmarks: anatomy of Pallas step cost + decode-tail stage costs.

MEASUREMENT DISCIPLINE: the axon tunnel elides repeated identical
dispatches (see bench.py) — every timed function takes a runtime salt
that perturbs its inputs, and each rep's salt depends on the previous
rep's output, forcing real sequential executions.  ~35 ms dispatch RTT
rides on each rep; report both raw and RTT-adjusted.

Run: python benchmarks/micro_pallas.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

RTT_EST = None  # measured from the dispatch floor


def salted(name, fn, args, reps=4):
    """fn(*args, salt) -> array(s); salt threads rep-to-rep."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    salt = jnp.int32(0)
    r = f(*args, salt)
    jax.block_until_ready(r)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _i in range(reps):
        r = f(*args, salt)
        salt = jnp.min(jax.tree_util.tree_leaves(r)[0].ravel()[:1]) * 0
    jax.block_until_ready((r, salt))
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / reps
    adj = dt - (RTT_EST or 0)
    print(f"{name:34s} {dt * 1e3:9.3f} ms   (-rtt {adj * 1e3:8.3f} ms)")
    return dt


def main():
    global RTT_EST
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # dispatch floor first: sets RTT_EST
    RTT_EST = salted("dispatch floor (1 add)",
                     lambda a, s: a + 1 + s,
                     (jnp.ones((8, 128), jnp.int32),))

    # resolve shape: NR = 58 * 128 segments, SL = 8, T = 8, S = 512 steps
    SL, T, S, RCH, W = 8, 8, 512, 128, 512
    NL = T * SL
    v = jnp.ones((S, NL, 128), jnp.int32)

    def build(body_kind):
        def kernel(v_ref, out_ref, win_ref):
            @pl.when(pl.program_id(1) == 0)
            def _init():
                win_ref[...] = jnp.zeros((W, SL, 128), jnp.int32)

            def step(k, acc):
                x = v_ref[k]
                if body_kind == "adds":
                    for _ in range(8):
                        acc = acc + x
                elif body_kind == "store":
                    j = pl.program_id(1) * RCH + k
                    acc = acc + x
                    win_ref[j % W] = acc
                elif body_kind == "onehot":
                    j = pl.program_id(1) * RCH + k
                    widx = (acc + x) & (W - 1)
                    nearval = jnp.zeros((SL, 128), jnp.int32)
                    iota_c = lax.broadcasted_iota(jnp.int32, (RCH, 1, 1), 0)
                    for c4 in range(W // RCH):
                        oh = (widx[None] - c4 * RCH) == iota_c
                        nearval = nearval + jnp.sum(
                            jnp.where(oh, win_ref[c4 * RCH:(c4 + 1) * RCH], 0),
                            axis=0)
                    acc = nearval
                    win_ref[j % W] = acc
                out_ref[k] = acc
                return acc

            lax.fori_loop(0, RCH, step, jnp.zeros((SL, 128), jnp.int32))

        return pl.pallas_call(
            kernel,
            grid=(T, S // RCH),
            in_specs=[pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((S, NL, 128), jnp.int32),
            scratch_shapes=[pltpu.VMEM((W, SL, 128), jnp.int32)],
        )

    for kind in ("adds", "store", "onehot"):
        call = build(kind)
        salted(f"pallas {kind} (512 steps, T=8)",
               lambda a, s, call=call: call(a + s), (v,))

    # far-round MXU gather at tail shape: [58, 65536] table, U queries
    from tpucomp.kernels.common import mxu_gather_rows
    N, U = 58, 65536
    data = jnp.ones((N, U), jnp.int32)
    idx = jnp.zeros((N, U), jnp.int32)
    salted("mxu_gather 58x64K q=64K",
           lambda d, i, s: mxu_gather_rows(d + s, i), (data, idx))

    # tables stage pieces
    from tpucomp.kernels.huffman import (
        canonical_from_lengths, rank_to_symbol_table)
    lengths = jnp.full((N, 512), 9, jnp.int32)
    salted("canonical_from_lengths",
           lambda L, s: canonical_from_lengths(L + s * 0)[0], (lengths,))
    salted("rank_to_symbol_table",
           lambda L, s: rank_to_symbol_table(L + s * 0), (lengths,))

    # one lax.sort reference point at raw-fill scale
    from tpucomp.kernels.common import sort_rows
    R = 164480
    rp = jnp.ones((N, R), jnp.int32)
    salted("sort_rows 58x164K 2-plane",
           lambda a, s: sort_rows((a + s, a))[0], (rp,))

    # delta-matmul fill prototype cost: one-hot row/lane construction +
    # 4 plane matmuls at [58, U=64K] from R=33K records
    Rk = 32768

    def delta_fill(pos, dval, s):
        pos = pos + s * 0
        NR_, R_ = pos.shape
        Urow = U // 128
        ohr = (pos[:, :, None] >> 7) == jnp.arange(Urow, dtype=jnp.int32)[None, None, :]
        ohl = (pos[:, :, None] & 127) == jnp.arange(128, dtype=jnp.int32)[None, None, :]
        out = jnp.zeros((NR_, Urow, 128), jnp.int32)
        ohrb = ohr.astype(jnp.bfloat16)
        for b in range(3):
            plane = ((dval >> (8 * b)) & 0xFF).astype(jnp.bfloat16)
            tmp = jnp.where(ohl, plane[:, :, None], 0.0).astype(jnp.bfloat16)
            g = lax.dot_general(ohrb, tmp, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
            out = out + (g.astype(jnp.int32) << (8 * b))
        return jnp.cumsum(out.reshape(NR_, U), axis=1)

    pos_r = jnp.arange(Rk, dtype=jnp.int32)[None, :].repeat(N, 0) * 2 % U
    dval_r = jnp.ones((N, Rk), jnp.int32)
    salted("delta-matmul fill 58xR33K->64K", delta_fill, (pos_r, dval_r))


if __name__ == "__main__":
    main()
