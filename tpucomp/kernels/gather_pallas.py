"""Fused Pallas row-gather: one-hot matmul + lane select in VMEM.

``mxu_gather_rows`` (kernels.common) evaluates gather-as-matmul in XLA:
per query chunk it materializes the [Q, 128] plane-dot output to HBM and
lane-selects it with a masked reduce — measured r3, the HBM round-trip
of those intermediates (~1 GB per dense far round at N=462/U=64 KiB)
costs more than the MACs.  This kernel keeps the whole per-(rows, chunk)
pipeline in VMEM: build the transposed row-tile one-hot (queries stay
lanes-major — no relayouts anywhere), contract it against the bit-plane
tiles on the MXU with an lhs-transposed dot, select the sublane, and
accumulate byte planes — only the [N, K] table, indices and results
touch HBM.

Semantics match mxu_gather_rows exactly: out[n, q] = data[n, idx[n, q]]
masked to ``nbits``, out-of-range idx reads 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

QCHUNK = 1024  # queries per grid step
RB = 8  # rows per grid step (block sublane granule)


def _kernel(nplanes, R, data_ref, idx_ref, out_ref):
    idx8 = idx_ref[...]  # [RB, QCHUNK] int32, queries lanes-major
    iota_r = lax.broadcasted_iota(jnp.int32, (R, QCHUNK), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (128, QCHUNK), 0)
    rows = []
    for rr in range(RB):
        q = idx8[rr : rr + 1]  # [1, QCHUNK]
        ohrT = (iota_r == (q >> 7)).astype(jnp.bfloat16)  # [R, QCHUNK]
        ohl = iota_s == (q & 127)  # [128, QCHUNK]
        val = jnp.zeros((1, QCHUNK), jnp.int32)
        for b in range(nplanes):
            plane = (lax.shift_right_logical(data_ref[rr], 8 * b)
                     & 0xFF).astype(jnp.bfloat16)  # [R, 128]
            # S[l, q] = sum_r plane[r, l] * ohrT[r, q]  (lhs-transposed
            # matmul: both operands contract on their sublane axis)
            s = lax.dot_general(
                plane, ohrT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [128, QCHUNK]
            byte = jnp.sum(jnp.where(ohl, s, 0.0), axis=0,
                           keepdims=True).astype(jnp.int32)
            val = val | (byte << (8 * b))
        rows.append(val)
    out_ref[...] = jnp.concatenate(rows, axis=0)


@functools.lru_cache(maxsize=None)
def _call(NP, R, QP, nplanes, interpret):
    kernel = functools.partial(_kernel, nplanes, R)
    return pl.pallas_call(
        kernel,
        grid=(NP // RB, QP // QCHUNK),
        in_specs=[
            pl.BlockSpec((RB, R, 128), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, QCHUNK), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, QCHUNK), lambda i, c: (i, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NP, QP), jnp.int32),
        interpret=bool(interpret),
    )


def gather_rows_fused(data, idx, nbits=32, interpret=False):
    """out[n, q] = data[n, idx[n, q]] & ((1<<nbits)-1); OOR idx -> 0."""
    N, K = data.shape
    Q = idx.shape[1]
    R = -(-K // 128)
    nplanes = min(4, -(-nbits // 8))
    QP = -(-Q // QCHUNK) * QCHUNK
    NP = -(-N // RB) * RB
    d3 = jnp.pad(data, ((0, NP - N), (0, R * 128 - K))).reshape(
        NP, R, 128)
    ip = jnp.pad(idx, ((0, NP - N), (0, QP - Q)))

    # OOR guard: send out-of-range queries to the padded zero region
    # when it exists, else flag-select zero on the host side
    if R * 128 > K:
        out = _call(NP, R, QP, nplanes, interpret)(
            d3, jnp.where((ip >= 0) & (ip < K), ip, K))
    else:
        ok = (ip >= 0) & (ip < K)
        out = jnp.where(
            ok, _call(NP, R, QP, nplanes, interpret)(
                d3, jnp.where(ok, ip, 0)), 0)
    return out[:N, :Q]
