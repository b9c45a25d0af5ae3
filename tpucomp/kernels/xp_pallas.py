"""Pallas TPU kernel for the plain-Xpress decode parse scan.

1:1 port of the 14-state byte-per-step machine in
``codecs/xpress._decode_impl`` ([MS-XCA] §2.3-2.4; reference parity
``src/xpress_decompress.cpp``, SURVEY.md §2 row 4 — mount unavailable).
The XLA scan pays per-op dispatch overhead on ~80 small [N] ops per
step; compiled as straight-line vector code the step is a few dozen
VPU ops on (SL, 128) lane tiles.

At most one token completes per byte step, so the record stream is ONE
packed int32 plane: 0 = no record, else ``((val << 16) | pos) + 1``
with val = literal byte or COPY_BIT14 | offset (offset <= 8192 fits 14
bits).  Record positions are strictly increasing per lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_MATCH = 3
_COPY_BIT = 1 << 20  # codecs/xpress record tag (post-unpack)
_COPY14 = 1 << 14  # in-kernel packed tag (off <= 8192 -> 14 bits)
SENT = 1 << 28

# modes (mirrors codecs/xpress)
_M_F0, _M_F1, _M_F2, _M_F3 = 0, 1, 2, 3
_M_TOK, _M_HI, _M_NIB, _M_ESC = 4, 5, 6, 7
_M_U16_0, _M_U16_1 = 8, 9
_M_U32_0, _M_U32_1, _M_U32_2, _M_U32_3 = 10, 11, 12, 13

RCH = 128

_NSTATE = 9
(_S_P, _S_MODE, _S_FLAGS, _S_NF, _S_PLO, _S_PLEN, _S_NHAVE, _S_NVAL,
 _S_ERR) = range(_NSTATE)


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
        olen = meta_ref[1]

        def step(k, carry):
            (p, mode, flags, nflags, pend_lo, pend_len, nib_have, nib_val,
             err) = carry
            s = c * RCH + k
            b = (body_ref[k >> 2] >> ((k & 3) * 8)) & 0xFF
            active = _mk(s < plen) * _mk(p < olen)

            is_f = active * _mk(mode <= _M_F3)
            is_tok = active * _mk(mode == _M_TOK)
            is_hi = active * _mk(mode == _M_HI)
            is_nib = active * _mk(mode == _M_NIB)
            is_esc = active * _mk(mode == _M_ESC)
            is_u16a = active * _mk(mode == _M_U16_0)
            is_u16b = active * _mk(mode == _M_U16_1)
            is_u32nd = active * _mk(mode >= _M_U32_0) * _mk(mode < _M_U32_3)
            is_u32d = active * _mk(mode == _M_U32_3)

            flags = _sel(is_f, flags | (b << ((mode & 3) * 8)), flags)
            f_done = active * _mk(mode == _M_F3)
            nflags = _sel(f_done, jnp.int32(32), nflags)

            bit = (flags >> 31) & 1
            is_lit = is_tok * _mk(bit == 0)
            is_lo = is_tok * _mk(bit == 1)

            tok = pend_lo | (b << 8)
            L0 = tok & 7
            hi_short = is_hi * _mk(L0 < 7)
            hi_esc = is_hi * _mk(L0 == 7)
            use_stored = hi_esc * nib_have
            stored_lt15 = use_stored * _mk(nib_val < 15)
            stored_esc = use_stored * _mk(nib_val == 15)
            need_nib = hi_esc * (1 - nib_have)

            nib_lo = b & 0xF
            nib_done = is_nib * _mk(nib_lo < 15)
            nib_esc = is_nib * _mk(nib_lo == 15)

            esc_done = is_esc * _mk(b < 255)
            esc_u16 = is_esc * _mk(b == 255)
            u16v = pend_len | (b << 8)
            u16_zero = is_u16b * _mk(u16v == 0)
            u16_done = is_u16b * _mk(u16v != 0)
            u32v = pend_len | (b << 24)
            u32_done = is_u32d

            m_len = (
                hi_short * (L0 + MIN_MATCH)
                + stored_lt15 * (nib_val + 7 + MIN_MATCH)
                + nib_done * (nib_lo + 7 + MIN_MATCH)
                + esc_done * (b + 22 + MIN_MATCH)
                + u16_done * (u16v + MIN_MATCH)
                + u32_done * (u32v + MIN_MATCH)
            )
            m_done = (hi_short | stored_lt15 | nib_done | esc_done
                      | u16_done | u32_done)
            err = (err | (u16_done * _mk(u16v < 22))
                   | (u32_done * _mk(u32v < 22)))

            nib_have = _sel(is_nib, jnp.int32(1),
                            _sel(use_stored, jnp.int32(0), nib_have))
            nib_val = _sel(is_nib, b >> 4, nib_val)

            pend_lo = _sel(is_lo, b, _sel(is_hi, tok, pend_lo))
            m_off = (pend_lo >> 3) + 1

            pend_len = _sel(
                is_u16a | (active * _mk(mode == _M_U32_0)), b,
                _sel(
                    active * _mk(mode == _M_U32_1), pend_len | (b << 8),
                    _sel(active * _mk(mode == _M_U32_2),
                         pend_len | (b << 16), pend_len),
                ),
            )

            err = err | (m_done * (_mk(m_off > p) | _mk(p + m_len > olen)))
            rec_new = is_lit | m_done
            rval = _sel(is_lit, b, _COPY14 | m_off)
            rec_ref[k] = rec_new * (((rval << 16) | p) + 1)
            p = jnp.minimum(p + is_lit + m_done * m_len, U)

            flags = _sel(rec_new, flags << 1, flags)
            nflags = nflags - rec_new

            mode2 = (
                is_f * _sel(f_done, jnp.int32(_M_TOK), mode + 1)
                + is_lit * _M_TOK
                + is_lo * _M_HI
                + need_nib * _M_NIB
                + (stored_esc | nib_esc) * _M_ESC
                + esc_u16 * _M_U16_0
                + is_u16a * _M_U16_1
                + u16_zero * _M_U32_0
                + is_u32nd * (mode + 1)
                + m_done * _M_TOK
                + (1 - active) * mode
            )
            fresh = rec_new * _mk(nflags == 0) * _mk(mode2 == _M_TOK)
            mode2 = mode2 * (1 - fresh)
            flags = flags * _mk(mode2 != _M_F0)

            return (p, mode2, flags, nflags, pend_lo, pend_len, nib_have,
                    nib_val, err)

        carry0 = tuple(st_ref[v] for v in range(_NSTATE))
        carry = lax.fori_loop(0, RCH, step, carry0)
        for v in range(_NSTATE):
            st_ref[v] = carry[v]

        @pl.when(c == pl.num_programs(1) - 1)
        def _fin():
            fin_ref[0] = carry[_S_P]
            fin_ref[1] = carry[_S_ERR]

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


def parse_records(payload, plen, out_len, U, interpret=False):
    """Parse a batch of Xpress unit payloads into token records.

    Returns (rec_pos [N, R], rec_val [N, R], p_final [N], err [N] int32);
    rec_val uses codecs/xpress's _COPY_BIT tag; empty slots key SENT.
    """
    N, P = payload.shape
    # SL must reach 8 whenever multiple lane tiles exist (Pallas TPU
    # requires block minor-2 dims divisible by (8, 128) unless equal to
    # the array dims), and full (8,128) tiles load/store efficiently
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
    meta = lanes(jnp.stack([plen, out_len], axis=1), 2)

    call = _parse_call(U, SL, T, S4, interpret)
    rec, fin = call(meta, body4)

    rec = rec.transpose(1, 2, 0).reshape(NL * 128, Stot)[:N]
    valid = rec != 0
    ru = rec - 1
    rec_pos = jnp.where(valid, ru & 0xFFFF, SENT)
    rv = lax.shift_right_logical(ru, 16)
    is_copy = (rv & _COPY14) != 0
    rec_val = jnp.where(is_copy, _COPY_BIT | (rv & (_COPY14 - 1)), rv)

    fin2 = fin.reshape(2, NL * 128)[:, :N]
    return rec_pos, rec_val, fin2[0], fin2[1]
