"""Pallas TPU kernel for LZ copy-chain resolution (near window).

Same two-stage scheme as kernels/common.resolve_copies ([MS-XCA] §2.x
overlapping-copy semantics; the per-format back-copy loops of the
reference decompressors): a forward walk over output positions carrying
the already-resolved near values — near sources resolve via an in-VMEM
select; far sources become FAR_TAG pointers resolved afterwards by XLA
sort-gather pointer-doubling rounds (kernels.common._far_rounds).

The key layout decision: rows are cut into SEG-byte segments and the
segments become extra VPU lanes.  The walk is then SEG sequential steps
(not U): for a 64 KiB block batch that's 128x fewer steps at 128x more
lanes — the VPU runs full tiles instead of idling on a serial scan.
Sources before the segment start are tagged far exactly like sources
beyond the window were in the row-sequential form, and the existing
doubling rounds absorb them (each round halves every chain, so
convergence is log2(depth) regardless of hop distance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import FAR_TAG, _far_rounds

RCH = 128  # positions per grid chunk
SEG = 512  # segment length = near window (one lane per segment)


def _mk(c):
    return c.astype(jnp.int32)


KU = 8  # positions per step (group): the window one-hot reduces run
# over [RCH, KU, SL, 128] tensors — ~KU x fewer loop iterations at the
# same reduce work, and the larger tensors keep the VPU fed (the
# per-position form measured 4.4x over its compute bound)


def _build_kernel(W, SL):
    def kernel(base_ref, v_ref, out_ref, win_ref):
        c = pl.program_id(1)
        base = base_ref[0]

        @pl.when(c == 0)
        def _init():
            win_ref[...] = jnp.zeros((W, SL, 128), jnp.int32)

        def step(k, _):
            j0 = c * RCH + k * KU  # group start (segment-local)
            v = v_ref[pl.ds(k * KU, KU)]  # [KU, SL, 128]
            # packed: litv(9) | disp(17) | is_copy(1<<26)
            iscp = _mk((v >> 26) & 1)
            d = (v >> 9) & 0x1FFFF
            lv = v & 0x1FF
            jj = j0 + lax.broadcasted_iota(jnp.int32, (KU, 1, 1), 0)
            near = iscp * _mk(d <= jj)  # in-segment source
            ingrp = near * _mk(jj - d >= j0)  # source inside this group
            winh = near * (1 - ingrp)
            widx = winh * (jj - d)
            # chunked one-hot reduces: a vector reduce runs ~3 ns/row
            # vs ~28 ns/row for a ref-load + select loop (the parse
            # kernel's table scan), but a single [512, ...] axis-0
            # reduction hangs the Mosaic compile — 128-row chunks do not
            nearval = jnp.zeros((KU, SL, 128), jnp.int32)
            iota_c = lax.broadcasted_iota(jnp.int32, (RCH, 1, 1, 1), 0)
            for c4 in range(W // RCH):
                oh = (widx[None] - c4 * RCH) == iota_c
                nearval = nearval + jnp.sum(
                    jnp.where(oh,
                              win_ref[c4 * RCH:(c4 + 1) * RCH][:, None],
                              0),
                    axis=0)
            farptr = FAR_TAG | jnp.maximum(base + jj - d, 0)
            vals = lv + iscp * (
                nearval + (1 - winh) * (farptr - nearval) - lv)
            # in-group sources (d reaches into this KU-group): tiny
            # sequential unroll — position g reads group value g - d.
            # Arithmetic select instead of .at[].set (Mosaic has no
            # scatter lowering) and int masks (no bool-vector selects).
            giota = lax.broadcasted_iota(jnp.int32, (KU, 1, 1), 0)
            for g in range(1, KU):
                ohg = _mk((jj[g, 0, 0] - d[g]) == (j0 + giota))
                bval = jnp.sum(ohg * vals, axis=0)
                upd = _mk(giota == g) * ingrp[g][None]
                vals = vals + upd * (bval[None] - vals)
            win_ref[pl.ds(j0 % W, KU)] = vals
            out_ref[pl.ds(k * KU, KU)] = vals
            return 0

        lax.fori_loop(0, RCH // KU, step, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _resolve_call(W, SL, T, S, interpret):
    C = S // RCH
    NL = T * SL
    return pl.pallas_call(
        _build_kernel(W, SL),
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, NL, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((W, SL, 128), jnp.int32)],
        interpret=bool(interpret),
    )


def resolve_copies(is_copy, disp, litv, window=SEG, interpret=False,
                   fast=False, max_hop=None):
    """Drop-in for kernels/common.resolve_copies (segment-lane near scan
    in Pallas, pointer-doubling far rounds in XLA).  U must be a
    multiple of 128."""
    N, U = is_copy.shape
    S = min(window, U)
    nseg = U // S
    assert U % S == 0
    NR = N * nseg  # lanes: one per segment, block-major
    # SL must reach 8 whenever multiple lane tiles exist (Pallas TPU
    # requires block minor-2 dims divisible by (8, 128) unless equal to
    # the array dims), and full (8,128) tiles load/store efficiently
    SL = min(8, -(-NR // 128))
    T = -(-NR // (SL * 128))
    NL = T * SL

    # clamp corrupt disps to the 17-bit field; such rows are already
    # err-flagged upstream and their bytes are don't-cares
    v = ((litv & 0x1FF)
         | (jnp.where(is_copy, jnp.minimum(disp, 0x1FFFF), 0) << 9)
         | jnp.where(is_copy, 1 << 26, 0))
    v = v.reshape(NR, S)
    v = jnp.pad(v, ((0, NL * 128 - NR), (0, 0)))
    v = v.T.reshape(S, NL, 128)
    base = jnp.tile(
        jnp.arange(nseg, dtype=jnp.int32) * S, (N,))
    base = jnp.pad(base, (0, NL * 128 - NR)).reshape(1, NL, 128)

    out = _resolve_call(S, SL, T, S, interpret)(base, v)
    out = out.transpose(1, 2, 0).reshape(NL * 128, S)[:NR].reshape(N, U)
    return _far_rounds(out, U, S, fast=fast, interpret=interpret,
                       max_hop=max_hop)
