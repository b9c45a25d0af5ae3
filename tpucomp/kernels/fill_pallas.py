"""Fused Pallas record-fill: dedupe + compact + delta-expand + cumsum
in VMEM.

kernels/common._fill_expand runs the same pipeline as ~66 XLA passes of
roll+select over HBM-resident [N, R]/[N, U] arrays — every pass streams
the batch through HBM, and the fill measured 95 ms of the 463 ms XH
decode e2e (r4 profile, N=462 x 64 KiB).  Here each row-block stays
resident in VMEM across ALL passes: traffic collapses to one read +
one write and the log-depth passes run at VPU speed.

Semantics are exactly kernels/common.fill_records_delta2 (the decode
paths' contract; see _fill_expand's docstring): non-decreasing record
positions, adjacent-duplicate last-wins, values mod ring, overflow flag
for rows exceeding ``keep`` real records.  One difference, documented:
records beyond ``keep`` are still FILLED here (the XLA form drops
them); both only matter on overflow rows, which are err-flagged and
whose bytes are don't-cares.  Reference decompressor role: the
per-format token-fill loops of SURVEY.md §3.2/3.4.

Everything runs at ONE width U (inputs pre-padded on the XLA side):
uniform shapes keep the Mosaic program small — four fori_loops of
dynamic-shift passes (pltpu.roll) instead of ~66 unrolled XLA passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8  # rows per grid step (Pallas TPU block sublane granule; ~6
# live [RB, 64K] i32 arrays ~12 MB VMEM — fits the ~16 MB core)

V_RING = 1 << 22  # value ring (fill_records_delta2 contract)
P_RING = 1 << 17  # position ring


def _shl(x, sh, fill):
    """Shift row left along lanes by (dynamic) sh, filling the tail.
    pltpu.roll requires non-negative shifts: left by sh == right by
    W - sh (cyclic)."""
    cols = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    W = x.shape[1]
    return jnp.where(cols < W - sh, pltpu.roll(x, W - sh, 1), fill)


def _shr(x, sh, fill):
    cols = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(cols >= sh, pltpu.roll(x, sh, 1), fill)


UNROLL = True  # static loop bounds -> static pltpu.roll shifts (a
# dynamic lane-rotate costs several times a static shift on the VPU;
# the unrolled Mosaic program is ~3*17 pass bodies and still compiles)


def _loop(nb, body, init):
    if UNROLL:
        st = init
        for b in range(nb):
            st = body(b, st)
        return st
    return lax.fori_loop(0, nb, body, init)


def _build_kernel(U, keep, nb):
    def kernel(pos_ref, val_ref, vf_ref, pf_ref, ovf_ref):
        pos = pos_ref[...]  # [RB, U]
        val = val_ref[...]
        real = (pos >= 0) & (pos < U)
        nxt_pos = _shl(pos, 1, -1)
        nxt_real = _shl(real.astype(jnp.int32), 1, 0) != 0
        last = real & ~(nxt_real & (nxt_pos == pos))

        # rem_i = #non-last entries before i (exclusive prefix sum)
        e = (~last).astype(jnp.int32)

        def psum_body(b, x):
            return x + _shr(x, jnp.left_shift(1, b), 0)

        inc = _loop(nb, psum_body, e)
        rem = jnp.where(last, inc - e, -1)
        cnt = U - jnp.max(inc, axis=1, keepdims=True)
        ovf_ref[...] = jnp.broadcast_to(
            (cnt > keep).astype(jnp.int32), ovf_ref.shape)

        # stable left-compaction, LSB->MSB (common.compact_monotone)
        def compact_body(b, st):
            rem, pos, val = st
            sh = jnp.left_shift(1, b)
            rem_s = _shl(rem, sh, -1)
            move_in = (rem_s >= 0) & ((rem_s & sh) != 0)
            stay = (rem >= 0) & ((rem & sh) == 0)

            def mv(o):
                return jnp.where(move_in, _shl(o, sh, 0),
                                 jnp.where(stay, o, 0))

            rem2 = jnp.where(move_in, rem_s - sh,
                             jnp.where(stay, rem, -1))
            return rem2, mv(pos), mv(val)

        rem, k, v = _loop(nb, compact_body, (rem, pos, val))
        okay = rem >= 0

        # per-record deltas (mod ring) + expand shift
        pv = _shr(jnp.where(okay, v, 0), 1, 0)
        pp = _shr(jnp.where(okay, k, 0), 1, 0)
        dv = jnp.where(okay, (v - pv) & (V_RING - 1), 0)
        dp = jnp.where(okay, (k - pp) & (P_RING - 1), 0)
        cols = lax.broadcasted_iota(jnp.int32, k.shape, 1)
        rem2 = jnp.where(okay, k - cols, -1)

        # expand MSB->LSB (common.expand_monotone)
        def expand_body(i, st):
            rem, dv, dp = st
            sh = jnp.left_shift(1, nb - 1 - i)
            rem_s = _shr(rem, sh, -1)
            move_in = (rem_s >= 0) & ((rem_s & sh) != 0)
            stay = (rem >= 0) & ((rem & sh) == 0)

            def mv(o):
                return jnp.where(move_in, _shr(o, sh, 0),
                                 jnp.where(stay, o, 0))

            rem2 = jnp.where(move_in, rem_s - sh,
                             jnp.where(stay, rem, -1))
            return rem2, mv(dv), mv(dp)

        rem2, dv, dp = _loop(nb, expand_body, (rem2, dv, dp))

        # inclusive prefix sums reconstruct the piecewise-constant fill
        def csum_body(b, st):
            dv, dp = st
            sh = jnp.left_shift(1, b)
            return dv + _shr(dv, sh, 0), dp + _shr(dp, sh, 0)

        dv, dp = _loop(nb, csum_body, (dv, dp))
        vf_ref[...] = dv & (V_RING - 1)
        pf_ref[...] = dp & (P_RING - 1)

    return kernel


@functools.lru_cache(maxsize=None)
def _call(NP, U, keep, interpret):
    nb = max(1, (U - 1).bit_length())
    kernel = _build_kernel(U, keep, nb)
    spec = pl.BlockSpec((RB, U), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NP // RB,),
        in_specs=[spec, spec],
        out_specs=[
            spec,
            spec,
            pl.BlockSpec((RB, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, U), jnp.int32),
            jax.ShapeDtypeStruct((NP, U), jnp.int32),
            jax.ShapeDtypeStruct((NP, 128), jnp.int32),
        ],
        # outputs reuse the input VMEM windows, and the scoped-vmem
        # budget is raised past the 16 MB default (the kernel's working
        # set measured 16.01 MB; v5e VMEM is far larger)
        input_output_aliases={0: 0, 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=bool(interpret),
    )


def fill_records_delta2_fused(rec_pos, rec_val, U, keep, interpret=False):
    """Drop-in for kernels/common.fill_records_delta2 (same contract;
    see module docstring for the one overflow-row difference).
    Requires U % 128 == 0 and record count R <= U after dedupe (true
    for every decode stream: positions strictly increase below U)."""
    N, R = rec_pos.shape
    assert U % 128 == 0
    NP = -(-N // RB) * RB
    if R < U:
        rec_pos = jnp.pad(rec_pos, ((0, 0), (0, U - R)),
                          constant_values=-1)
        rec_val = jnp.pad(rec_val, ((0, 0), (0, U - R)))
    elif R > U:
        # compaction would need R slots; streams bound real records by
        # U, but slots may exceed it — fall back upstream in that case
        raise ValueError("fused fill requires R <= U")
    pp = jnp.pad(rec_pos, ((0, NP - N), (0, 0)), constant_values=-1)
    vp = jnp.pad(rec_val, ((0, NP - N), (0, 0)))
    vf, pf, ovf = _call(NP, U, min(keep, U), interpret)(pp, vp)
    return vf[:N], pf[:N], ovf[:N, 0]
