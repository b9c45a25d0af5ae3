"""Pallas TPU kernel for the Xpress-Huffman decode parse scan.

Replaces the XLA ``lax.scan`` in ``codecs/xpress_huff._decode_impl`` on
TPU.  The scan body is ~150 small [N]-shaped ops whose per-op dispatch
overhead dominates (measured ~260 us/step on the dev chip); in Pallas the
same state machine compiles to straight-line VLIW vector code on
(SL, 128)-shaped lane tiles, so per-step cost is actual ALU work.

Semantics are a 1:1 port of the XLA scan (same [MS-XCA] §2.1-2.2 reader
discipline; reference parity ``src/xpress_huff_decompress.cpp``,
SURVEY.md §2 row 5 — mount unavailable), with three TPU-motivated
refinements that are exact-equivalent:

* level find: canonical scaled limits LIM15[l] = lim[l] << (15-l) tile
  the 15-bit code space by construction (LIM15[l-1] == FC15[l] from the
  canonical recurrence, for ANY length table), so the matching level is
  ``1 + sum_l [peek15 >= LIM15[l]]`` and validity is the single compare
  ``peek15 < LIM15[15]``.
* rank -> symbol: the [512] per-lane table is packed 3 symbols (9 bit
  each) per int32 and scanned with compare-selects; the scan length R3
  is bucketed by the batch's max used-symbol count.
* records: instead of snapshotting (rpos, rval) after every record
  point (2*SS+1 slot pairs/step), the kernel emits two packed planes —
  match records and literal records, SS slots each, ``0`` = empty,
  else ``((payload << 16) | pos) + 1`` — exploiting that a pre-loop
  escape completion and substep-0's offset completion are mutually
  exclusive (an escape completion clears ``pend``).  Record positions
  are strictly increasing per lane, so slot order never matters to the
  downstream fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MIN_MATCH = 3
MAX_CODE_LEN = 15
NUM_SYMBOLS = 512
_COPY_BIT = 1 << 20
SENT = 1 << 28  # invalid-record fill key (sorts after every query)

# byte-role modes / pending states (mirrors codecs/xpress_huff)
_M_W0, _M_W1, _M_EB = 0, 1, 2
_M_E16A, _M_E16B = 3, 4
_M_E32A, _M_E32B, _M_E32C, _M_E32D = 5, 6, 7, 8
_P_NONE, _P_OFFSET, _P_ESC = 0, 1, 2

RCH = 64  # scan steps per grid chunk (multiple of 4: byte packing)

# Compacted records kept per chunk: the kernel left-compacts each
# chunk's 2*SS*RCH slot stream in VMEM before writing it out, so the
# HBM record stream (and the host fill's compaction traffic, ~45% of
# r3 decode time) shrinks ~4.4x.  Sound bound: every record maps to a
# unique symbol consuming >= mcl bits; bits available in a chunk are
# <= 31 carried + 16 per refill (<= RCH/2 refills) = 543; plus <= 1
# carried pending completion => ceil(543/mcl) + 2, rounded up to a
# multiple of 8.  Keyed by SUBSTEPS (the host's mcl bucket,
# codecs.xpress_huff._BUCKET_MCL).
KEEP_CHUNK = {3: 80, 5: 144, 9: 288, 17: 560}

# state rows in the VMEM scratch carry
_NSTATE = 11
(_S_P, _S_MODE, _S_PEND, _S_BITBUF, _S_BITCNT, _S_LOW, _S_OBC, _S_LH,
 _S_OFF, _S_ACC, _S_ERR) = range(_NSTATE)


def _mk(c):
    return c.astype(jnp.int32)


def _sel(m, a, b):  # m in {0,1}: m ? a : b
    return b + m * (a - b)


def _build_kernel(U, SS, R3, SL, KC):
    """Kernel body for unit size U, SS substeps, R3 packed rank chunks,
    SL sublanes (SL*128 block-lanes per tile), KC kept records/chunk."""

    def kernel(meta_ref, lvl_ref, sym3_ref, body_ref, recp_ref, recv_ref,
               fin_ref, st_ref, comb_ref, rem_ref):
        c = pl.program_id(1)

        @pl.when(c == 0)
        def _init():
            st_ref[...] = jnp.zeros((_NSTATE, SL, 128), jnp.int32)
            fin_ref[...] = jnp.zeros((2, SL, 128), jnp.int32)

        blen = meta_ref[0]
        olen = meta_ref[1]
        lim15_top = lvl_ref[MAX_CODE_LEN]  # LIM15[15]

        def decode_symbol(bitbuf):
            """(sym, code_len, found-mask) from the top 15 window bits."""
            peek15 = (bitbuf >> 17) & 0x7FFF
            # level and rank-base in ONE pass: level = 1 + sum of
            # [peek15 >= LIM15[l]] and rbf telescopes on the same
            # predicates (rbf[level] = rbf[1] + sum_{l<level} drbf[l];
            # row 16 = rbf[1], rows 16+l = drbf[l] = rbf[l+1]-rbf[l])
            level = jnp.ones((SL, 128), jnp.int32)
            rbf = lvl_ref[16]
            for l in range(1, MAX_CODE_LEN):
                pred = _mk(peek15 >= lvl_ref[l])
                level = level + pred
                rbf = rbf + pred * lvl_ref[16 + l]
            found = _mk(peek15 < lim15_top)
            rank = (rbf + (peek15 >> (15 - level))) * found
            rdiv = (rank * 21846) >> 16  # exact rank // 3 for rank < 512
            rmod = rank - rdiv * 3
            # one 3D masked reduce over the packed table (a per-row
            # ref-load + select loop costs ~28 ns/row in Mosaic — ~400 ms
            # per 16K-step batch; this form runs at VPU speed)
            iota_r = lax.broadcasted_iota(jnp.int32, (R3, 1, 1), 0)
            oh = rdiv[None] == iota_r
            packed = jnp.sum(jnp.where(oh, sym3_ref[...], 0), axis=0)
            sym = (packed >> (rmod * 9)) & 0x1FF
            return sym, level, found

        def step(k, carry):
            (p, mode, pend, bitbuf, bitcount, lowbyte, obc_p, lh_p, off_p,
             len_acc, err) = carry
            s = c * RCH + k
            b = (body_ref[k >> 2] >> ((k & 3) * 8)) & 0xFF
            active = _mk(s < blen) * _mk(p < olen)

            is_w0 = active * _mk(mode == _M_W0)
            is_w1 = active * _mk(mode == _M_W1)
            is_eb = active * _mk(mode == _M_EB)
            is_e16a = active * _mk(mode == _M_E16A)
            is_e16b = active * _mk(mode == _M_E16B)
            is_e32nd = active * _mk(mode >= _M_E32A) * _mk(mode < _M_E32D)
            is_e32d = active * _mk(mode == _M_E32D)

            lowbyte = _sel(is_w0, b, lowbyte)
            len_acc = _sel(
                is_e16a | (active * _mk(mode == _M_E32A)), b,
                _sel(
                    active * _mk(mode == _M_E32B), len_acc | (b << 8),
                    _sel(active * _mk(mode == _M_E32C),
                         len_acc | (b << 16), len_acc),
                ),
            )

            word = lowbyte | (b << 8)
            bitbuf = _sel(is_w1, bitbuf | (word << (16 - bitcount)), bitbuf)
            bitcount = bitcount + is_w1 * 16

            eb_done = is_eb * _mk(b < 255)
            eb_more = is_eb * _mk(b == 255)
            u16v = len_acc | (b << 8)
            e16_zero = is_e16b * _mk(u16v == 0)
            e16_done = is_e16b * _mk(u16v != 0)
            u32v = len_acc | (b << 24)
            e32_done = is_e32d
            esc_len = (
                eb_done * (b + 15 + MIN_MATCH)
                + e16_done * (u16v + MIN_MATCH)
                + e32_done * (u32v + MIN_MATCH)
            )
            esc_match = eb_done | e16_done | e32_done
            err = err | (esc_match * (_mk(off_p > p) | _mk(p + esc_len > olen)))
            # match record: ((off - 1) << 16 | pos) + 1 (0 = empty)
            m_slot0 = esc_match * ((((off_p - 1) << 16) | p) + 1)
            p = _sel(esc_match, jnp.minimum(p + esc_len, U), p)

            mode = (
                is_w0 * _M_W1
                + eb_more * _M_E16A
                + is_e16a * _M_E16B
                + e16_zero * _M_E32A
                + is_e32nd * (mode + 1)
                + (1 - active) * mode
            )
            pend = pend * (1 - esc_match)

            can_work = active * (esc_match | (is_w1 * _mk(s >= 3)))
            work = can_work
            for j in range(SS):
                # 1) pending offset bits
                do_off = work * _mk(pend == _P_OFFSET) * _mk(bitcount >= obc_p)
                obc_c = jnp.maximum(obc_p, 1)
                raw = (bitbuf >> (32 - obc_c)) & (jnp.left_shift(1, obc_c) - 1)
                raw = raw * _mk(obc_p > 0)
                offv = jnp.left_shift(1, obc_p) | raw
                bitbuf = _sel(do_off, bitbuf << obc_p, bitbuf)
                bitcount = bitcount - do_off * obc_p
                short = do_off * _mk(lh_p < 15)
                mlen = lh_p + MIN_MATCH
                err = err | (short * (_mk(offv > p) | _mk(p + mlen > olen)))
                m_val = short * ((((offv - 1) << 16) | p) + 1)
                if j == 0:
                    m_val = m_val + m_slot0  # exclusive with do_off
                comb_ref[k * (2 * SS) + 2 * j] = m_val
                p = _sel(short, jnp.minimum(p + mlen, U), p)
                off_p = _sel(do_off, offv, off_p)
                pend = _sel(short, jnp.int32(_P_NONE),
                            _sel(do_off, jnp.int32(_P_ESC), pend))
                # 2) fresh symbol
                do_sym = (work * _mk(pend == _P_NONE) * _mk(bitcount >= 16)
                          * _mk(p < olen))
                if j >= 2:
                    # late substeps fire only on short-code bursts; skip
                    # the level-find + rank->symbol scan (the dominant
                    # per-step cost) when NO lane in the tile can decode
                    sym, slen, found = lax.cond(
                        jnp.any(do_sym != 0),
                        lambda bb: decode_symbol(bb),
                        lambda bb: (jnp.zeros((SL, 128), jnp.int32),
                                    jnp.zeros((SL, 128), jnp.int32),
                                    jnp.zeros((SL, 128), jnp.int32)),
                        bitbuf)
                else:
                    sym, slen, found = decode_symbol(bitbuf)
                do_sym = do_sym * found
                bitbuf = _sel(do_sym, bitbuf << slen, bitbuf)
                bitcount = bitcount - do_sym * slen
                is_lit = do_sym * _mk(sym < 256)
                comb_ref[k * (2 * SS) + 2 * j + 1] = (
                    is_lit * (((sym << 16) | p) + 1))
                p = p + is_lit
                is_m = do_sym * _mk(sym >= 256)
                msym = sym - 256
                obc_p = _sel(is_m, msym >> 4, obc_p)
                lh_p = _sel(is_m, msym & 0xF, lh_p)
                pend = _sel(is_m, jnp.int32(_P_OFFSET), pend)
                work = work * _mk(p < olen)

            leftover = (
                can_work
                * _mk(p < olen)
                * (
                    (_mk(pend == _P_NONE) * _mk(bitcount >= 16))
                    | (_mk(pend == _P_OFFSET) * _mk(bitcount >= obc_p))
                )
            )
            err = err | leftover

            need_refill = _mk(bitcount < 16)
            mode = _sel(
                can_work,
                _sel(_mk(pend == _P_ESC) * (1 - need_refill),
                     jnp.int32(_M_EB), jnp.int32(_M_W0)),
                mode,
            )
            return (p, mode, pend, bitbuf, bitcount, lowbyte, obc_p, lh_p,
                    off_p, len_acc, err)

        carry0 = tuple(st_ref[v] for v in range(_NSTATE))
        carry = lax.fori_loop(0, RCH, step, carry0)

        # ---- in-VMEM chunk compaction of the record slots ----
        # The chunk's 2*SS*RCH slot stream (m/l pairs, chronological:
        # per substep the offset-completion precedes the fresh literal)
        # left-compacts per lane with monotone power-of-2 shift passes
        # (collision-free: shifts non-decreasing); the first KC slots
        # are kept — slots are ~90% empty and KC is a sound per-chunk
        # bound (see KEEP_CHUNK), so valid streams never overflow;
        # overflow flags err instead of desyncing.  Passes STAGE through
        # the comb/rem scratch refs: a value-only form kept every
        # unrolled pass's temporaries on the Mosaic stack and blew the
        # 16 MB scoped-vmem limit.  Slot parity (m=even) rides rem's
        # bit 30 through the shifts (move subtractions never borrow
        # into it: move requires the subtracted bit set).
        W = RCH * SS * 2

        def shl(x, sh, fill):
            return jnp.concatenate(
                [x[sh:], jnp.full((sh, SL, 128), fill, jnp.int32)], axis=0)

        comb = comb_ref[...]
        e = (comb == 0).astype(jnp.int32)
        # inclusive log-shift prefix sum (jnp.cumsum has no Mosaic
        # lowering); non-empty entries contribute 0, so inclusive ==
        # "#empties strictly before" for them
        rem_ref[...] = e
        sh = 1
        while sh < W:
            cum = rem_ref[...]
            rem_ref[...] = cum + jnp.concatenate(
                [jnp.zeros((sh, SL, 128), jnp.int32), cum[: W - sh]],
                axis=0)
            sh *= 2
        par = lax.broadcasted_iota(jnp.int32, (W, SL, 128), 0) & 1
        rem_ref[...] = jnp.where(
            comb == 0, -1, rem_ref[...] | (par << 30))

        nb = max(1, (W - 1).bit_length())
        for b in range(nb):
            sh = 1 << b
            rem = rem_ref[...]
            comb = comb_ref[...]
            rem_s = shl(rem, sh, -1)
            move_in = (rem_s >= 0) & ((rem_s & sh) != 0)
            stay = (rem >= 0) & ((rem & sh) == 0)
            comb_ref[...] = jnp.where(
                move_in, shl(comb, sh, 0), jnp.where(stay, comb, 0))
            rem_ref[...] = jnp.where(
                move_in, rem_s - sh, jnp.where(stay, rem, -1))
        rem = rem_ref[:KC]
        comb = comb_ref[:KC]
        valid = rem >= 0
        raw = comb - 1
        pos = raw & 0xFFFF
        payload = lax.shift_right_logical(raw, 16)
        # 17-bit combined value: match = (1<<16)|(off-1), literal = sym
        val = jnp.where(((rem >> 30) & 1) == 0, (1 << 16) + payload, payload)
        ovf = jnp.any(rem_ref[KC:] >= 0, axis=0).astype(jnp.int32)
        err_out = carry[_S_ERR] | ovf
        recp_ref[...] = jnp.where(valid, pos, SENT)
        recv_ref[...] = jnp.where(valid, val, 0)

        for v in range(_NSTATE):
            st_ref[v] = carry[v] if v != _S_ERR else err_out

        @pl.when(c == pl.num_programs(1) - 1)
        def _fin():
            fin_ref[0] = carry[_S_P]
            fin_ref[1] = err_out

    return kernel


@functools.lru_cache(maxsize=None)
def _parse_call(U, SS, R3, SL, T, S4, interpret):
    """Cached pallas_call builder (all-static config)."""
    Stot = S4 * 4
    C = Stot // RCH
    NL = T * SL
    KC = KEEP_CHUNK[SS]
    kernel = _build_kernel(U, SS, R3, SL, KC)
    return pl.pallas_call(
        kernel,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((2, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((32, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R3, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((RCH // 4, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((KC, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KC, SL, 128), lambda i, c: (c, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, SL, 128), lambda i, c: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((C * KC, NL, 128), jnp.int32),
            jax.ShapeDtypeStruct((C * KC, NL, 128), jnp.int32),
            jax.ShapeDtypeStruct((2, NL, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_NSTATE, SL, 128), jnp.int32),
            pltpu.VMEM((RCH * SS * 2, SL, 128), jnp.int32),
            pltpu.VMEM((RCH * SS * 2, SL, 128), jnp.int32),
        ],
        interpret=bool(interpret),
    )


def parse_records(body, blen, out_len, fc, br, lim, sym_by_rank, U,
                  substeps, rank_cap=NUM_SYMBOLS, interpret=False):
    """Run the parse kernel over a batch of single-block XH bodies.

    Args:
      body: [N, Pb] int32 payload bytes after the 256-byte table prefix.
      blen/out_len: [N] int32 body byte length / uncompressed length.
      fc/br/lim: [N, 16] canonical level tables (kernels.huffman).
      sym_by_rank: [N, 512] canonical rank -> symbol.
      U, substeps, rank_cap: static (rank_cap >= the batch's max
        used-symbol count; host quantizes it to bound kernel variants).

    Returns (rec_pos [N, R], rec_val [N, R], p_final [N], err [N] int32)
    compatible with the XLA scan's record stream (keys SENT = empty).
    """
    N, Pb = body.shape
    SS = substeps
    R3 = -(-rank_cap // 3)
    # SL capped at 4: the chunk-compaction scratch/stack at SL=8 blows
    # the 16 MB scoped-vmem limit (parse cost is per-step, ~flat in SL
    # at measured batch sizes — r3 profile ran SL=4)
    SL = min(4, -(-N // 128))
    T = -(-N // (SL * 128))
    NL = T * SL
    S4 = -(-Pb // RCH) * (RCH // 4)
    Stot = S4 * 4

    lvl_iota = jnp.arange(MAX_CODE_LEN + 1, dtype=jnp.int32)[None, :]
    lim15 = jnp.left_shift(lim, MAX_CODE_LEN - lvl_iota)
    rbf = br - fc
    # rows 16..30: rbf[1] then telescoping deltas drbf[l] = rbf[l+1] -
    # rbf[l] (the kernel accumulates rbf on the level-find predicates)
    drbf = jnp.concatenate(
        [rbf[:, 1:2], rbf[:, 2:] - rbf[:, 1:-1],
         jnp.zeros((N, 1), jnp.int32)], axis=1)
    lvl = jnp.concatenate([lim15, drbf], axis=1)  # [N, 32]

    sympad = sym_by_rank[:, :rank_cap]
    if R3 * 3 > rank_cap:
        sympad = jnp.pad(sympad, ((0, 0), (0, R3 * 3 - rank_cap)))
    sym3 = (sympad[:, 0::3] | (sympad[:, 1::3] << 9)
            | (sympad[:, 2::3] << 18))  # [N, R3]

    def lanes(x, rows):
        """[N, rows] -> [rows, NL, 128] tile layout."""
        x = jnp.pad(x, ((0, NL * 128 - N), (0, 0)))
        return x.T.reshape(rows, NL, 128)

    bpad = jnp.pad(body, ((0, 0), (0, Stot - Pb)))
    body4 = (bpad[:, 0::4] | (bpad[:, 1::4] << 8) | (bpad[:, 2::4] << 16)
             | (bpad[:, 3::4] << 24))
    body4 = lanes(body4, S4)
    meta = lanes(jnp.stack([blen, out_len], axis=1), 2)
    lvl_t = lanes(lvl, 32)
    sym3_t = lanes(sym3, R3)

    call = _parse_call(U, SS, R3, SL, T, S4, interpret)
    recp, recv, fin = call(meta, lvl_t, sym3_t, body4)

    def unlane(x):  # [R, NL, 128] -> [N, R]
        return x.transpose(1, 2, 0).reshape(NL * 128, x.shape[0])[:N]

    # records arrive CHUNK-COMPACTED (KEEP_CHUNK slots per 64-step
    # chunk, chronological, SENT-keyed empties between chunks): the
    # kernel's in-VMEM compaction already dropped ~90% empty slots, so
    # the host fill's compact pass runs ~4.4x narrower
    rec_pos = unlane(recp)
    v = unlane(recv)
    is_m = v >= (1 << 16)
    rec_val = jnp.where(is_m, _COPY_BIT | (v - (1 << 16) + 1), v)

    fin2 = fin.reshape(2, NL * 128)[:, :N]
    return rec_pos, rec_val, fin2[0], fin2[1]
