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


def _probe_kernel(R, QC, RBP, data_ref, idx1_ref, idx2_ref, out1_ref,
                  out2_ref):
    """Pair-packed single-plane probe gather (see probe_gather_pairs).

    Probe entries are 0..256 — every value exactly representable in
    bfloat16 — so ONE dot fetches them; two queries ride one one-hot
    column (scales 1 and 1024: 256 + 1024*256 < 2^24 stays f32-exact).
    A pair hitting the same table ROW would sum scales on one cell
    (1025: not bf16-exact), so the second query's one-hot is masked
    there and its value is read from the low half instead (both lanes
    then come from the same fetched row, which is exact)."""
    # NOTE (r5, measured): this kernel runs at ~52% of MXU peak and is
    # tiling-INSENSITIVE (QC 512..2048 x RB 8..16 all within 2% on the
    # dev chip) — the loss is structural: the one-hot build is ~4M VPU
    # element-ops per row-iter vs ~0.7us of MXU dot, roughly 1:1 when
    # not perfectly overlapped.  An int16 one-hot build (half the VPU
    # width) fails to compile on current Mosaic (Invalid relayout for
    # broadcast i1 rows: sub-32-bit mixed layouts), so i32 stays.
    iota_r = lax.broadcasted_iota(jnp.int32, (R, QC), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (128, QC), 0)
    o1 = []
    o2 = []
    for rr in range(RBP):
        q1 = idx1_ref[rr : rr + 1]  # [1, QCHUNK]
        q2 = idx2_ref[rr : rr + 1]
        r1, r2 = q1 >> 7, q2 >> 7
        samerow = r1 == r2
        ohT = ((iota_r == r1).astype(jnp.bfloat16)
               + jnp.where(samerow, 0.0, 1024.0).astype(jnp.bfloat16)
               * (iota_r == r2).astype(jnp.bfloat16))  # [R, QCHUNK]
        plane = data_ref[rr].astype(jnp.bfloat16)  # [R, 128], entries 0..256
        s = lax.dot_general(
            plane, ohT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [128, QCHUNK]
        s1 = jnp.sum(jnp.where(iota_s == (q1 & 127), s, 0.0), axis=0,
                     keepdims=True).astype(jnp.int32)
        s2 = jnp.sum(jnp.where(iota_s == (q2 & 127), s, 0.0), axis=0,
                     keepdims=True).astype(jnp.int32)
        o1.append(s1 & 1023)
        o2.append(jnp.where(samerow, s2 & 1023, s2 >> 10))
    out1_ref[...] = jnp.concatenate(o1, axis=0)
    out2_ref[...] = jnp.concatenate(o2, axis=0)


@functools.lru_cache(maxsize=None)
def _probe_call(NP, R, QP, interpret, QC=None, RBP=None):
    QC = QC or QCHUNK
    RBP = RBP or RB
    kernel = functools.partial(_probe_kernel, R, QC, RBP)
    return pl.pallas_call(
        kernel,
        grid=(NP // RBP, QP // QC),
        in_specs=[
            pl.BlockSpec((RBP, R, 128), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBP, QC), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBP, QC), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RBP, QC), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RBP, QC), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NP, QP), jnp.int32),
            jax.ShapeDtypeStruct((NP, QP), jnp.int32),
        ],
        interpret=bool(interpret),
    )


def probe_gather_pairs(probe, idx1, idx2, interpret=False, qc=None,
                       rb=None):
    """out_k[n, q] = probe[n, idx_k[n, q]] for k in {1, 2}, at HALF the
    one-hot matmul cost of two separate single-plane gathers.

    ``probe`` entries MUST be in [0, 256] (one bf16-exact plane; 256 is
    the caller's "still live" sentinel).  Out-of-range idx fetches 0.
    """
    qc = qc or QCHUNK
    rb = rb or RB
    N, K = probe.shape
    Q = idx1.shape[1]
    R = -(-K // 128)
    QP = -(-Q // qc) * qc
    NP = -(-N // rb) * rb
    d3 = jnp.pad(probe, ((0, NP - N), (0, R * 128 - K))).reshape(NP, R, 128)
    oor = K if R * 128 > K else -1  # padded zero column, else flag-select
    outs = []
    ins = []
    for idx in (idx1, idx2):
        ip = jnp.pad(idx, ((0, NP - N), (0, QP - Q)))
        ok = (ip >= 0) & (ip < K)
        ins.append((jnp.where(ok, ip, oor if oor >= 0 else 0), ok))
    o1, o2 = _probe_call(NP, R, QP, interpret, qc, rb)(
        d3, ins[0][0], ins[1][0])
    for o, (_, ok) in zip((o1, o2), ins):
        outs.append(o[:N, :Q] if oor >= 0 else
                    jnp.where(ok, o, 0)[:N, :Q])
    return outs[0], outs[1]


def _g18_kernel(R, data_ref, idx1_ref, idx2_ref, out1_ref, out2_ref):
    """Pair-packed 18-bit gather (see gather18_pairs): the 18-bit state
    rides THREE 6-bit bf16 planes (values 0..63, exactly
    representable), two queries per one-hot column at scales 1 and
    1024 (63 + 1024*63 < 2^24 stays f32-exact).  Same-row pairs mask
    the second scale and read both lanes from the low half."""
    iota_r = lax.broadcasted_iota(jnp.int32, (R, QCHUNK), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (128, QCHUNK), 0)
    o1 = []
    o2 = []
    for rr in range(RB):
        q1 = idx1_ref[rr : rr + 1]  # [1, QCHUNK]
        q2 = idx2_ref[rr : rr + 1]
        r1, r2 = q1 >> 7, q2 >> 7
        samerow = r1 == r2
        ohT = ((iota_r == r1).astype(jnp.bfloat16)
               + jnp.where(samerow, 0.0, 1024.0).astype(jnp.bfloat16)
               * (iota_r == r2).astype(jnp.bfloat16))  # [R, QCHUNK]
        l1 = iota_s == (q1 & 127)
        l2 = iota_s == (q2 & 127)
        v1 = jnp.zeros((1, QCHUNK), jnp.int32)
        v2 = jnp.zeros((1, QCHUNK), jnp.int32)
        for b in range(3):
            plane = (lax.shift_right_logical(data_ref[rr], 6 * b)
                     & 0x3F).astype(jnp.bfloat16)  # [R, 128], 0..63
            s = lax.dot_general(
                plane, ohT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [128, QCHUNK]
            s1 = jnp.sum(jnp.where(l1, s, 0.0), axis=0,
                         keepdims=True).astype(jnp.int32)
            s2 = jnp.sum(jnp.where(l2, s, 0.0), axis=0,
                         keepdims=True).astype(jnp.int32)
            v1 = v1 | ((s1 & 1023) << (6 * b))
            v2 = v2 | (jnp.where(samerow, s2 & 1023, s2 >> 10)
                       << (6 * b))
        o1.append(v1)
        o2.append(v2)
    out1_ref[...] = jnp.concatenate(o1, axis=0)
    out2_ref[...] = jnp.concatenate(o2, axis=0)


def _g18s_kernel(R, data_ref, idx_ref, out_ref):
    """Stacked-plane single-query 18-bit gather (see gather18_pairs for
    the pair variant): the 3 six-bit planes stack along the CONTRACTION
    axis with scales 1/64/4096 baked into the one-hot, so one dot of
    contraction depth 3R returns the full 18-bit value
    (63*(1 + 64 + 4096)*scale-sum < 2^24 keeps f32 exact... the sum per
    query is v0 + 64*v1 + 4096*v2 < 2^18).  At small K the pair
    variant's dots are only R deep (R = K/128 = 32 at the 4 KiB
    segment level — a quarter of the MXU's 128 systolic depth); this
    form is 3R deep at 2x the MACs, which wins below ~16 K."""
    iota_r = lax.broadcasted_iota(jnp.int32, (3 * R, QCHUNK), 0)
    iota_s = lax.broadcasted_iota(jnp.int32, (128, QCHUNK), 0)
    scale = jnp.where(iota_r < R, 1.0,
                      jnp.where(iota_r < 2 * R, 64.0, 4096.0)
                      ).astype(jnp.bfloat16)
    outs = []
    for rr in range(RB):
        q = idx_ref[rr : rr + 1]  # [1, QCHUNK]
        ohT = ((lax.rem(iota_r, R) == (q >> 7)).astype(jnp.bfloat16)
               * scale)  # [3R, QCHUNK]
        d = data_ref[rr]
        planes = jnp.concatenate(
            [(lax.shift_right_logical(d, 6 * b) & 0x3F).astype(
                jnp.bfloat16) for b in range(3)], axis=0)  # [3R, 128]
        s = lax.dot_general(
            planes, ohT, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [128, QCHUNK]
        v = jnp.sum(jnp.where(iota_s == (q & 127), s, 0.0), axis=0,
                    keepdims=True).astype(jnp.int32)
        outs.append(v)
    out_ref[...] = jnp.concatenate(outs, axis=0)


@functools.lru_cache(maxsize=None)
def _g18s_call(NP, R, QP, interpret):
    kernel = functools.partial(_g18s_kernel, R)
    spec_q = pl.BlockSpec((RB, QCHUNK), lambda i, c: (i, c),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NP // RB, QP // QCHUNK),
        in_specs=[
            pl.BlockSpec((RB, R, 128), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q,
        ],
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((NP, QP), jnp.int32),
        interpret=bool(interpret),
    )


def gather18_stacked(data, idx, interpret=False):
    """out[n, q] = data[n, idx[n, q]] for 18-bit table values; the
    small-K fast form (see _g18s_kernel).  OOR idx fetches 0."""
    N, K = data.shape
    Q = idx.shape[1]
    R = -(-K // 128)
    QP = -(-Q // QCHUNK) * QCHUNK
    NP = -(-N // RB) * RB
    d3 = jnp.pad(data, ((0, NP - N), (0, R * 128 - K))).reshape(
        NP, R, 128)
    ip = jnp.pad(idx, ((0, NP - N), (0, QP - Q)))
    oor = K if R * 128 > K else -1
    ok = (ip >= 0) & (ip < K)
    ipc = jnp.where(ok, ip, oor if oor >= 0 else 0)
    out = _g18s_call(NP, R, QP, interpret)(d3, ipc)
    return (out[:N, :Q] if oor >= 0 else
            jnp.where(ok, out, 0)[:N, :Q])


@functools.lru_cache(maxsize=None)
def _g18_call(NP, R, QP, interpret):
    kernel = functools.partial(_g18_kernel, R)
    spec_q = pl.BlockSpec((RB, QCHUNK), lambda i, c: (i, c),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NP // RB, QP // QCHUNK),
        in_specs=[
            pl.BlockSpec((RB, R, 128), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            spec_q, spec_q,
        ],
        out_specs=[spec_q, spec_q],
        out_shape=[
            jax.ShapeDtypeStruct((NP, QP), jnp.int32),
            jax.ShapeDtypeStruct((NP, QP), jnp.int32),
        ],
        interpret=bool(interpret),
    )


def gather18_pairs(data, idx1, idx2, interpret=False):
    """out_k[n, q] = data[n, idx_k[n, q]] for k in {1, 2}, for 18-bit
    table values (0 <= v < 2^18) at HALF the one-hot matmul cost of two
    separate 3-plane gathers — the pointer-doubling fetch of the far
    levels (6-bit planes at scales 1/1024 instead of byte planes; the
    one-hot build is also shared across the 3 plane-dots).
    Out-of-range idx fetches 0."""
    N, K = data.shape
    Q = idx1.shape[1]
    R = -(-K // 128)
    QP = -(-Q // QCHUNK) * QCHUNK
    NP = -(-N // RB) * RB
    d3 = jnp.pad(data, ((0, NP - N), (0, R * 128 - K))).reshape(
        NP, R, 128)
    oor = K if R * 128 > K else -1
    ins = []
    for idx in (idx1, idx2):
        ip = jnp.pad(idx, ((0, NP - N), (0, QP - Q)))
        ok = (ip >= 0) & (ip < K)
        ins.append((jnp.where(ok, ip, oor if oor >= 0 else 0), ok))
    o1, o2 = _g18_call(NP, R, QP, interpret)(d3, ins[0][0], ins[1][0])
    outs = []
    for o, (_, ok) in zip((o1, o2), ins):
        outs.append(o[:N, :Q] if oor >= 0 else
                    jnp.where(ok, o, 0)[:N, :Q])
    return outs[0], outs[1]


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
