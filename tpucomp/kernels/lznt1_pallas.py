"""Pallas TPU kernel for the LZNT1 decode parse scan.

1:1 port of the flag/token byte machine in ``codecs/lznt1.decode_batch``
([MS-XCA] §2.5; reference parity ``src/lznt1_decompress.cpp``, SURVEY.md
§2 row 3 — mount unavailable).  The XLA scan pays per-op dispatch
overhead on ~40 small [N] ops per byte step; compiled as straight-line
vector code the step is a couple dozen VPU ops on (SL, 128) lane tiles.

At most one token completes per byte step, so the record stream is ONE
packed int32 plane: 0 = no record, else ``((val << 16) | pos) + 1`` with
val = literal byte or COPY14 | disp (disp <= 4096 fits 13 bits).
Record positions are strictly increasing per lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_MATCH = 3
_COPY14 = 1 << 14  # in-kernel packed tag (disp <= 4096 -> 13 bits)
SENT = 1 << 28

_M_FLAG, _M_TOK, _M_HI = 0, 1, 2

RCH = 128

_NSTATE = 6
(_S_P, _S_MODE, _S_FLAGS, _S_NF, _S_PLO, _S_ERR) = range(_NSTATE)


def _mk(c):
    return c.astype(jnp.int32)


def _sel(m, a, b):
    return b + m * (a - b)


def _build_kernel(U, SL):
    def kernel(meta_ref, body_ref, rec_ref, fin_ref, st_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            st_ref[...] = jnp.zeros((_NSTATE, SL, 128), jnp.int32)
            fin_ref[...] = jnp.zeros((2, SL, 128), jnp.int32)

        plen = meta_ref[0]
        is_comp = meta_ref[1]

        def step(k, carry):
            p, mode, flags, nflags, pend_lo, err = carry
            s = c * RCH + k
            b = (body_ref[k >> 2] >> ((k & 3) * 8)) & 0xFF
            active = is_comp * _mk(s < plen) * _mk(p < U)

            is_flag = active * _mk(mode == _M_FLAG)
            is_tok = active * _mk(mode == _M_TOK)
            is_hi = active * _mk(mode == _M_HI)

            flags = _sel(is_flag, b, flags)
            nflags = _sel(is_flag, jnp.int32(8), nflags)

            bit = flags & 1
            is_lit = is_tok * _mk(bit == 0)
            is_lo = is_tok * _mk(bit == 1)

            # copy token split depends on current output position p
            # ([MS-XCA] §2.5: shift length bits to displacement as p grows)
            tok = pend_lo | (b << 8)
            q = jnp.maximum(p - 1, 0)
            bl = 32 - lax.clz(q)
            d_shift = 12 - jnp.maximum(bl - 4, 0)
            l_mask = jnp.left_shift(1, d_shift) - 1
            length = (tok & l_mask) + MIN_MATCH
            disp = lax.shift_right_logical(tok, d_shift) + 1
            err = err | (is_hi * (_mk(disp > p) | _mk(p + length > U)))

            rec_new = is_lit | is_hi
            rval = _sel(is_lit, b, _COPY14 | disp)
            rec_ref[k] = rec_new * (((rval << 16) | p) + 1)
            p = jnp.minimum(p + is_lit + is_hi * length, U)

            pend_lo = _sel(is_lo, b, pend_lo)
            # the flag bit is consumed when the token STARTS (literal or
            # lo byte), mirroring codecs/lznt1.decode_batch
            took_bit = is_lit | is_lo
            flags = _sel(took_bit, lax.shift_right_logical(flags, 1), flags)
            nflags = nflags - took_bit

            mode2 = (
                is_flag * _M_TOK
                + is_lit * _sel(_mk(nflags == 0), jnp.int32(_M_FLAG),
                                jnp.int32(_M_TOK))
                + is_lo * _M_HI
                + is_hi * _sel(_mk(nflags == 0), jnp.int32(_M_FLAG),
                               jnp.int32(_M_TOK))
                + (1 - active) * mode
            )
            return p, mode2, flags, nflags, pend_lo, err

        carry0 = tuple(st_ref[v] for v in range(_NSTATE))
        carry = lax.fori_loop(0, RCH, step, carry0)
        for v in range(_NSTATE):
            st_ref[v] = carry[v]

        @pl.when(c == pl.num_programs(1) - 1)
        def _fin():
            fin_ref[0] = carry[_S_P]
            # stream ended mid-token (lo byte without hi) is an error
            fin_ref[1] = carry[_S_ERR] | (
                is_comp * _mk(carry[_S_MODE] == _M_HI))

    return kernel


@functools.lru_cache(maxsize=None)
def _parse_call(U, SL, T, S4, interpret):
    Stot = S4 * 4
    C = Stot // RCH
    NL = T * SL
    kernel = _build_kernel(U, SL)
    return pl.pallas_call(
        kernel,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((2, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RCH // 4, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((RCH, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Stot, NL, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, NL, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((_NSTATE, SL, 128), jnp.int32)],
        interpret=bool(interpret),
    )


def parse_records(payload, plen, is_comp, U, interpret=False):
    """Parse a batch of LZNT1 chunk payloads into token records.

    Returns (rec_pos [N, R], rec_val [N, R], p_final [N], err [N] int32);
    rec_val uses codecs/lznt1's _COPY_BIT tag; empty slots key SENT.
    """
    N, P = payload.shape
    SL = min(8, -(-N // 128))
    T = -(-N // (SL * 128))
    NL = T * SL
    S4 = -(-P // RCH) * (RCH // 4)
    Stot = S4 * 4

    def lanes(x, rows):
        x = jnp.pad(x, ((0, NL * 128 - N), (0, 0)))
        return x.T.reshape(rows, NL, 128)

    bpad = jnp.pad(payload, ((0, 0), (0, Stot - P)))
    body4 = (bpad[:, 0::4] | (bpad[:, 1::4] << 8) | (bpad[:, 2::4] << 16)
             | (bpad[:, 3::4] << 24))
    body4 = lanes(body4, S4)
    meta = lanes(
        jnp.stack([plen, is_comp.astype(jnp.int32)], axis=1), 2)

    call = _parse_call(U, SL, T, S4, interpret)
    rec, fin = call(meta, body4)

    rec = rec.transpose(1, 2, 0).reshape(NL * 128, Stot)[:N]
    valid = rec != 0
    ru = rec - 1
    rec_pos = jnp.where(valid, ru & 0xFFFF, SENT)
    rv = lax.shift_right_logical(ru, 16)
    is_copy = (rv & _COPY14) != 0
    # codecs/lznt1._COPY_BIT (kept local: no codecs->kernels cycle)
    rec_val = jnp.where(is_copy, (1 << 20) | (rv & (_COPY14 - 1)), rv)

    fin2 = fin.reshape(2, NL * 128)[:, :N]
    return rec_pos, rec_val, fin2[0], fin2[1]
