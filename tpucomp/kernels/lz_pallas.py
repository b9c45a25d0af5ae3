"""Pallas TPU kernels for the LZ encode path.

greedy_commit: the token-selection cursor walk (reference parity: the
greedy parse loop of the per-format compressors, SURVEY.md §2 rows 3-5)
is inherently sequential per lane but only ~8 VPU ops per position; the
XLA K-unrolled lax.scan (kernels/common.greedy_commit) still pays
dispatch overhead on n/K steps.  Here the whole walk runs in-kernel:
one fori_loop step per position on (SL, 128) lane tiles, commit bits
packed 32 per int32 output word.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RCH = 256  # positions per grid chunk (multiple of 32: bit packing)

_B_MATCH = 1 << 20  # packed-input flag bits (blen < 2^18)
_B_OK = 1 << 21


def _mk(c):
    return c.astype(jnp.int32)


def _build_kernel(SL, layout):
    """``layout``: additionally emit, per position, the running token
    count AFTER the position (t_after) and the committed data bytes
    BEFORE it (data_before) — the stream-layout prefix sums the LZNT1
    assembler needs (its fused XLA commit+layout scan cost ~30 ms of a
    54 ms encode at N=2048; the in-kernel walk is ~4 extra VPU ops)."""

    def kernel(v_ref, out_ref, *rest):
        if layout:
            ta_ref, db_ref, st_ref = rest
        else:
            (st_ref,) = rest
        nst = 4 if layout else 2
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            st_ref[...] = jnp.zeros((nst, SL, 128), jnp.int32)

        def step(k, carry):
            nc, acc, tcnt, db = carry
            v = v_ref[k]
            pos = c * RCH + k
            blen = v & (_B_MATCH - 1)
            is_m = _mk((v & _B_MATCH) != 0)
            ok = _mk((v & _B_OK) != 0)
            commit = _mk(nc == pos) * ok
            adv = 1 + is_m * (blen - 1)
            nc = nc + commit * (pos + adv - nc)
            acc = acc | (commit << (k & 31))
            out_ref[k >> 5] = acc  # last write per word wins
            acc = acc * _mk((k & 31) != 31)
            if layout:
                db_ref[k] = db
                tcnt = tcnt + commit
                db = db + commit + commit * is_m  # 2 bytes if copy else 1
                ta_ref[k] = tcnt
            return nc, acc, tcnt, db

        carry0 = (st_ref[0], st_ref[1],
                  st_ref[2] if layout else jnp.zeros((SL, 128), jnp.int32),
                  st_ref[3] if layout else jnp.zeros((SL, 128), jnp.int32))
        nc, acc, tcnt, db = lax.fori_loop(0, RCH, step, carry0)
        st_ref[0] = nc
        st_ref[1] = acc
        if layout:
            st_ref[2] = tcnt
            st_ref[3] = db

    return kernel


@functools.lru_cache(maxsize=None)
def _commit_call(SL, T, npad, layout, interpret):
    C = npad // RCH
    NL = T * SL
    out_specs = [
        pl.BlockSpec((RCH // 32, SL, 128), lambda i, c: (c, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [jax.ShapeDtypeStruct((npad // 32, NL, 128), jnp.int32)]
    if layout:
        for _ in range(2):
            out_specs.append(
                pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((npad, NL, 128), jnp.int32))
    return pl.pallas_call(
        _build_kernel(SL, layout),
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((4 if layout else 2, SL, 128),
                                   jnp.int32)],
        interpret=bool(interpret),
    )


def _pack_walk_input(is_match, best_len, okpos, NL, npad):
    N, n = is_match.shape
    v = (jnp.minimum(best_len, _B_MATCH - 1)
         | jnp.where(is_match, _B_MATCH, 0)
         | jnp.where(okpos, _B_OK, 0))
    v = jnp.pad(v, ((0, NL * 128 - N), (0, npad - n)))
    return v.T.reshape(npad, NL, 128)


def _unpack_bits(packed, N, n, npad, NL):
    words = packed.transpose(1, 2, 0).reshape(NL * 128, npad // 32)[:N]
    shifts = jnp.arange(32, dtype=jnp.int32)[None, None, :]
    bits = (words[:, :, None] >> shifts) & 1
    return bits.reshape(N, npad)[:, :n] != 0


def greedy_commit(is_match, best_len, okpos, interpret=False):
    """Drop-in for kernels/common.greedy_commit (bool [N, n] result)."""
    N, n = is_match.shape
    # SL must reach 8 whenever multiple lane tiles exist (Pallas TPU
    # requires block minor-2 dims divisible by (8, 128) unless equal to
    # the array dims), and full (8,128) tiles load/store efficiently
    SL = min(8, -(-N // 128))
    T = -(-N // (SL * 128))
    NL = T * SL
    npad = -(-n // RCH) * RCH
    v = _pack_walk_input(is_match, best_len, okpos, NL, npad)
    [packed] = _commit_call(SL, T, npad, False, interpret)(v)
    return _unpack_bits(packed, N, n, npad, NL)


def greedy_commit_layout(is_match, best_len, okpos, interpret=False):
    """greedy_commit + the LZNT1 stream-layout prefix sums.

    Returns (committed bool [N, n], t_after [N, n], data_before [N, n]):
    t_after = committed tokens up to AND including the position;
    data_before = data bytes (2/copy, 1/literal) of commits strictly
    before it — matching the fused XLA commit+layout scan in
    codecs/lznt1.encode_batch."""
    N, n = is_match.shape
    SL = min(8, -(-N // 128))
    T = -(-N // (SL * 128))
    NL = T * SL
    npad = -(-n // RCH) * RCH
    v = _pack_walk_input(is_match, best_len, okpos, NL, npad)
    packed, ta, db = _commit_call(SL, T, npad, True, interpret)(v)

    def unlane(x):  # [npad, NL, 128] -> [N, n]
        return x.transpose(1, 2, 0).reshape(NL * 128, npad)[:N, :n]

    return _unpack_bits(packed, N, n, npad, NL), unlane(ta), unlane(db)
