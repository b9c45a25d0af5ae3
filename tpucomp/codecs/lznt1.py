"""LZNT1 TPU codec — chunk-parallel encode/decode in pure-JAX/XLA.

Capability parity: reference ``src/lznt1_compress.cpp`` /
``src/lznt1_decompress.cpp`` + ``LZNT1Dictionary.h`` (SURVEY.md §2 rows 3,
7; mount unavailable — format per [MS-XCA] §2.5, SURVEY.md §8.1).

TPU-first design — this is NOT a translation of the reference's sequential
byte loops (SURVEY.md §7 "hard parts"):

* Batch layout ``[n_chunks, 4096]``: VPU lanes run across the chunk batch;
  every sequential structure is a *lockstep* loop whose per-step work is a
  handful of vectorized gathers/scatters over the batch.
* Decode: one lockstep step per 8-token flag group (≤512 steps, early
  exit).  Tokens emit O(1) scatters (literal byte / copy-coverage marks);
  the variable-length overlapping copies are NEVER expanded byte-by-byte —
  a cummax recovers each position's governing copy token and 12 rounds of
  pointer doubling (``ptr = ptr[ptr]``; chains strictly decrease) resolve
  every byte to its originating literal in O(log 4096) row-wise gathers.
* Encode: match candidates come from (a) exact run-length matchers for
  small displacements (flip-cummax trick, vectorized RLE) and (b) a
  sort-based positional hash table (argsort by (hash, pos); neighbors in
  sort order are the most recent same-hash candidates), scored 4 bytes per
  word-compare.  The greedy parse is committed in O(log n) by jump-pointer
  doubling over ``f(p) = p + step(p)`` instead of a sequential scan; token
  bytes, flag bytes and bit positions all come from cumsums + scatters.

The same compiled functions run on CPU (tests) and TPU (bench).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..errors import DataError
from ..util import pad_rows, rows_to_bytes

CHUNK = 4096
MIN_MATCH = 3
# Compressed payload bound: 4096 literals + 512 flag bytes.
MAX_PAYLOAD = CHUNK + CHUNK // 8
# Input payload pad (gather slack for the unconditional 2-byte token reads).
PAYLOAD_PAD = MAX_PAYLOAD + 8

_DOUBLING_STEPS = 12  # ceil(log2(CHUNK))


def _dsplit(p):
    """Vectorized LZNT1 (l_mask, d_shift) for output position(s) ``p``.

    Spec loop ``q=p-1; while q>=0x10: shift`` ≡ ``s = max(0, bitlen(q)-4)``.
    """
    q = jnp.maximum(p - 1, 0)
    bl = 32 - lax.clz(q.astype(jnp.int32))
    s = jnp.maximum(bl - 4, 0)
    d_shift = 12 - s
    l_mask = jnp.left_shift(1, d_shift) - 1
    return l_mask, d_shift


# Static per-position split tables (host-side constants).
_POS = np.arange(CHUNK)
_Q = np.maximum(_POS - 1, 0)
_BL = np.zeros(CHUNK, np.int32)
for _b in range(13):
    _BL[_Q >= (1 << _b)] = _b + 1
_SHIFTS = np.maximum(_BL - 4, 0)
L_MASK_TABLE = ((1 << (12 - _SHIFTS)) - 1).astype(np.int32)  # max len-3 at pos
D_SHIFT_TABLE = (12 - _SHIFTS).astype(np.int32)


# --------------------------------------------------------------------------
# Decode
# --------------------------------------------------------------------------


@jax.jit
def decode_batch(payload, plen, is_comp):
    """Decode a batch of LZNT1 chunk payloads (headers already stripped).

    Args:
      payload: [N, PAYLOAD_PAD] int32 — per-chunk payload bytes, zero-padded.
      plen:    [N] int32 — true payload byte length.
      is_comp: [N] bool — compressed flag from each chunk header.

    Returns:
      out:     [N, CHUNK] int32 decoded bytes
      out_len: [N] int32 decoded length per chunk
      err:     [N] bool malformed-stream flag
    """
    N, P = payload.shape
    rows = jnp.arange(N)

    def gather_byte(idx):
        return payload[rows, jnp.clip(idx, 0, P - 1)]

    lit = jnp.zeros((N, CHUNK), jnp.int32)
    lit_mask = jnp.zeros((N, CHUNK), jnp.bool_)
    cov_start = jnp.full((N, CHUNK), -1, jnp.int32)
    cov_disp = jnp.ones((N, CHUNK), jnp.int32)
    state0 = (
        jnp.zeros(N, jnp.int32),  # i: payload read index
        jnp.zeros(N, jnp.int32),  # p: output position
        lit,
        lit_mask,
        cov_start,
        cov_disp,
        jnp.zeros(N, jnp.bool_),  # err
    )

    def cond(state):
        i, p, *_ = state
        return jnp.any(is_comp & (i < plen) & (p < CHUNK))

    def body(state):
        i, p, lit, lit_mask, cov_start, cov_disp, err = state
        active = is_comp & (i < plen) & (p < CHUNK)
        flags = jnp.where(active, gather_byte(i), 0)
        i = jnp.where(active, i + 1, i)
        for k in range(8):  # unrolled tokens of this flag group
            tok_active = active & (i < plen) & (p < CHUNK)
            is_copy = ((flags >> k) & 1) == 1
            lo = gather_byte(i)
            hi = gather_byte(i + 1)
            tok = lo | (hi << 8)
            l_mask, d_shift = _dsplit(p)
            length = (tok & l_mask) + MIN_MATCH
            disp = (tok >> d_shift) + 1
            do_copy = tok_active & is_copy
            do_lit = tok_active & ~is_copy
            err = err | (do_copy & ((disp > p) | (p + length > CHUNK)))
            err = err | (do_copy & (i + 2 > plen))
            lit = lit.at[rows, jnp.where(do_lit, p, CHUNK)].set(lo, mode="drop")
            lit_mask = lit_mask.at[rows, jnp.where(do_lit, p, CHUNK)].set(
                True, mode="drop"
            )
            cpos = jnp.where(do_copy, p, CHUNK)
            cov_start = cov_start.at[rows, cpos].set(p, mode="drop")
            cov_disp = cov_disp.at[rows, cpos].set(disp, mode="drop")
            adv = jnp.where(do_copy, jnp.minimum(length, CHUNK - p), 1)
            p = jnp.where(tok_active, p + adv, p)
            i = jnp.where(tok_active, i + jnp.where(is_copy, 2, 1), i)
        return (i, p, lit, lit_mask, cov_start, cov_disp, err)

    i, p, lit, lit_mask, cov_start, cov_disp, err = lax.while_loop(
        cond, body, state0
    )

    # --- expand copy coverage + resolve chains by pointer doubling ---
    pos = jnp.arange(CHUNK)[None, :]
    g = lax.cummax(cov_start, axis=1)  # governing copy start per position
    disp_g = jnp.take_along_axis(cov_disp, jnp.clip(g, 0, CHUNK - 1), axis=1)
    in_range = pos < p[:, None]
    copy_cov = in_range & ~lit_mask & (g >= 0)
    src = jnp.where(copy_cov, pos - disp_g, -1)
    ptr = jnp.where(src >= 0, src, pos)
    for _ in range(_DOUBLING_STEPS):
        ptr = jnp.take_along_axis(ptr, ptr, axis=1)
    out_comp = jnp.take_along_axis(lit, ptr, axis=1)
    out = jnp.where(is_comp[:, None], out_comp, payload[:, :CHUNK])
    out = jnp.where(
        jnp.arange(CHUNK)[None, :] < jnp.where(is_comp, p, plen)[:, None], out, 0
    )
    out_len = jnp.where(is_comp, p, jnp.minimum(plen, CHUNK))
    return out, out_len, err


# --------------------------------------------------------------------------
# Encode
# --------------------------------------------------------------------------

_HASH_BITS = 13
_NUM_HASH_CANDS = 2  # previous same-hash positions tried per position
_CAP = 16  # capped match-measure depth for hash candidates (words of 4)
_RUN_DISPS = (1, 2, 3)  # exact-length small displacements (RLE and períods)


def _run_matchlen(x, d):
    """Exact match length at every position for fixed displacement ``d``:
    length of the equal-run of x[p]==x[p-d] starting at p (0 where p<d)."""
    N, n = x.shape
    eq = jnp.concatenate(
        [jnp.zeros((N, d), jnp.bool_), x[:, d:] == x[:, :-d]], axis=1
    )
    pos = jnp.arange(n)[None, :]
    z = jnp.where(eq, n, pos)  # positions of zeros (n = +inf sentinel)
    nxt0 = jnp.flip(lax.cummin(jnp.flip(z, axis=1), axis=1), axis=1)
    return jnp.where(eq, 0, 0) + (nxt0 - pos)  # run length from p


def _word_at(x, idx, rows):
    """Little-endian 4-byte word of x at per-row byte index (clipped)."""
    N, n = x.shape
    i = jnp.clip(idx, 0, n - 4)
    b0 = x[rows, i]
    b1 = x[rows, i + 1]
    b2 = x[rows, i + 2]
    b3 = x[rows, i + 3]
    return b0 | (b1 << 8) | (b2 << 16) | (b3 << 24)


def _capped_matchlen(x, cand, valid):
    """Match length (capped at _CAP) of x[p..] vs x[cand..], vectorized.

    Word-compare trick: 4 bytes per gather; the first differing word's
    leading equal bytes come from counting trailing zero bytes of the XOR
    (little-endian ⇒ low byte is the first byte).
    """
    N, n = x.shape
    rows = jnp.arange(N)[:, None]
    pos = jnp.arange(n)[None, :]
    total = jnp.zeros_like(cand)
    alive = valid
    for t in range(_CAP // 4):
        wa = _word_at(x, pos + 4 * t, rows)
        wb = _word_at(x, cand + 4 * t, rows)
        v = wa ^ wb
        # bytes of agreement in this word: 4 if equal, else index of first
        # mismatching byte = trailing-zero-bit-count // 8
        tz = 32 - lax.clz(v & -v) - 1  # undefined for v==0; masked below
        agree = jnp.where(v == 0, 4, tz >> 3)
        # _word_at clips its window at n-4, which would mis-align the
        # compare for tail positions — never credit bytes from a clipped
        # window (costs ≤3 tail bytes of match length; always safe).
        clipped = (pos + 4 * t) > (n - 4)
        agree = jnp.where(clipped, 0, agree)
        total = total + jnp.where(alive, agree, 0)
        alive = alive & (v == 0) & ~clipped
    return jnp.where(valid, total, 0)


def _hash_candidates(x, rows2d):
    """Per-position most-recent same-hash candidate positions via argsort.

    Sorting (hash, pos) groups equal hashes with positions ascending; the
    K entries preceding p in sort order with equal hash are exactly the K
    most recent earlier positions with the same 3-byte hash.
    """
    N, n = x.shape
    b0 = x
    b1 = jnp.roll(x, -1, axis=1)
    b2 = jnp.roll(x, -2, axis=1)
    tri = (b0 | (b1 << 8) | (b2 << 16)).astype(jnp.uint32)
    h = ((tri * jnp.uint32(0x9E3779B1)) >> jnp.uint32(32 - _HASH_BITS)).astype(
        jnp.int32
    )
    key = h * n + jnp.arange(n)[None, :]
    order = jnp.argsort(key, axis=1)  # positions sorted by (hash, pos)
    h_sorted = jnp.take_along_axis(h, order, axis=1)
    cands = []
    for k in range(1, _NUM_HASH_CANDS + 1):
        prev = jnp.roll(order, k, axis=1)
        prev_h = jnp.roll(h_sorted, k, axis=1)
        idx = jnp.arange(n)[None, :]
        ok = (idx >= k) & (prev_h == h_sorted)
        cand_sorted = jnp.where(ok, prev, -1)
        # scatter back to position order
        cand = jnp.zeros_like(cand_sorted)
        cand = cand.at[rows2d, order].set(cand_sorted)
        cands.append(cand)
    return cands


@jax.jit
def encode_batch(chunks, clen):
    """Encode a batch of ≤4096-byte chunks into LZNT1 token payloads.

    Args:
      chunks: [N, CHUNK] int32 — chunk bytes, zero-padded.
      clen:   [N] int32 — true chunk length.

    Returns:
      payload: [N, MAX_PAYLOAD] int32 token/flag bytes
      plen:    [N] int32 payload length (host applies the stored-raw
               fallback when plen >= clen)
    """
    N, n = chunks.shape
    rows2d = jnp.broadcast_to(jnp.arange(N)[:, None], (N, n))
    pos = jnp.arange(n)[None, :]
    in_len = clen[:, None]

    l_mask = jnp.asarray(L_MASK_TABLE)[None, :]
    d_shift = jnp.asarray(D_SHIFT_TABLE)[None, :]

    # ---- candidate scoring ----
    best_len = jnp.zeros((N, n), jnp.int32)
    best_disp = jnp.ones((N, n), jnp.int32)

    def consider(length, disp, cond):
        nonlocal best_len, best_disp
        better = cond & (length > best_len)
        best_len = jnp.where(better, length, best_len)
        best_disp = jnp.where(better, disp, best_disp)

    for d in _RUN_DISPS:
        ml = _run_matchlen(chunks, d)
        consider(ml, jnp.full((N, n), d, jnp.int32), ml >= MIN_MATCH)

    for cand in _hash_candidates(chunks, rows2d):
        valid = cand >= 0
        ml = _capped_matchlen(chunks, jnp.maximum(cand, 0), valid)
        consider(ml, pos - cand, valid & (ml >= MIN_MATCH))

    # clip to format + chunk limits
    max_here = jnp.minimum(l_mask + MIN_MATCH, in_len - pos)
    best_len = jnp.minimum(best_len, max_here)
    is_match = (best_len >= MIN_MATCH) & (pos + MIN_MATCH <= in_len)

    # ---- greedy commit by jump-pointer doubling ----
    step = jnp.where(is_match, best_len, 1)
    f = jnp.minimum(pos + step, n)  # successor position
    f = jnp.concatenate([f, jnp.full((N, 1), n, jnp.int32)], axis=1)  # f[n]=n
    committed = jnp.zeros((N, n + 1), jnp.int32).at[:, 0].set(1)
    rows_ext = jnp.broadcast_to(jnp.arange(N)[:, None], (N, n + 1))
    J = f
    for _ in range(_DOUBLING_STEPS):
        committed = committed.at[rows_ext, J].max(committed)
        J = jnp.take_along_axis(J, J, axis=1)
    committed = committed[:, :n] == 1

    emitted = committed & (pos < in_len)
    tok_copy = emitted & is_match
    # ---- token stream layout (cumsums + scatters) ----
    t_idx = jnp.cumsum(emitted.astype(jnp.int32), axis=1) - 1  # token index
    grp = t_idx >> 3
    bit = t_idx & 7
    sz = jnp.where(emitted, jnp.where(tok_copy, 2, 1), 0)
    data_before = jnp.cumsum(sz, axis=1) - sz  # exclusive prefix of sizes
    off = jnp.where(emitted, (grp + 1) + data_before, MAX_PAYLOAD)

    payload = jnp.zeros((N, MAX_PAYLOAD + 2), jnp.int32)
    rowsN = rows2d
    tokv = jnp.left_shift(best_disp - 1, d_shift) | (best_len - MIN_MATCH)
    lit_b = chunks
    b0 = jnp.where(tok_copy, tokv & 0xFF, lit_b)
    payload = payload.at[rowsN, jnp.where(emitted, off, MAX_PAYLOAD + 1)].set(
        b0, mode="drop"
    )
    payload = payload.at[
        rowsN, jnp.where(tok_copy, off + 1, MAX_PAYLOAD + 1)
    ].set(tokv >> 8, mode="drop")
    # flag bytes: group g's flag byte sits just before its first token
    NGROUPS = n // 8 + 2
    first_in_grp = emitted & (bit == 0)
    fpos_by_g = jnp.zeros((N, NGROUPS), jnp.int32)
    fpos_by_g = fpos_by_g.at[
        rowsN, jnp.where(first_in_grp, grp, NGROUPS - 1)
    ].set(off - 1, mode="drop")
    fb = jnp.take_along_axis(fpos_by_g, jnp.clip(grp, 0, NGROUPS - 1), axis=1)
    flag_contrib = jnp.where(tok_copy, jnp.left_shift(1, bit), 0)
    payload = payload.at[
        rowsN, jnp.where(emitted, fb, MAX_PAYLOAD + 1)
    ].add(flag_contrib, mode="drop")

    plen = jnp.max(jnp.where(emitted, off + sz, 0), axis=1)
    return payload[:, :MAX_PAYLOAD], plen


# --------------------------------------------------------------------------
# Host wrappers (bytes <-> batches), registered as the "tpu" backend
# --------------------------------------------------------------------------


def split_stream(data: bytes):
    """Sequential header scan of an LZNT1 stream → per-chunk payload table.

    O(#chunks) host work; foreign streams only.  Batch jobs produced by
    this codec keep a manifest instead (tpucomp.dist) and skip the scan.
    """
    payloads, comps = [], []
    i, nb = 0, len(data)
    while i + 2 <= nb:
        header = data[i] | (data[i + 1] << 8)
        i += 2
        if header == 0:
            break
        size = (header & 0xFFF) + 1
        if i + size > nb:
            raise DataError("LZNT1: chunk payload extends past end of input")
        payloads.append(data[i : i + size])
        comps.append(bool(header & 0x8000))
        i += size
    return payloads, comps


def _pad_batch(n, mult=256):
    return max(mult, -(-n // mult) * mult)


def decompress(data: bytes, out_len=None) -> bytes:
    """One-shot LZNT1 decode on device (chunk-parallel)."""
    data = bytes(data)
    if not data:
        return b""
    payloads, comps = split_stream(data)
    if not payloads:
        return b""
    N = _pad_batch(len(payloads))
    payload = np.zeros((N, PAYLOAD_PAD), np.int32)
    plen = np.zeros(N, np.int32)
    is_comp = np.zeros(N, bool)
    for k, (pl, cp) in enumerate(zip(payloads, comps)):
        a = np.frombuffer(pl, np.uint8)
        payload[k, : len(a)] = a
        plen[k] = len(a)
        is_comp[k] = cp
    out, out_lens, err = decode_batch(
        jnp.asarray(payload), jnp.asarray(plen), jnp.asarray(is_comp)
    )
    out = np.asarray(out)
    out_lens = np.asarray(out_lens)
    if np.asarray(err)[: len(payloads)].any():
        raise DataError("LZNT1: malformed stream")
    result = rows_to_bytes(out[: len(payloads)], out_lens[: len(payloads)])
    if out_len is not None:
        if len(result) < out_len:
            raise DataError("LZNT1: stream ended before out_len bytes")
        result = result[:out_len]
    return result


def compress(data: bytes) -> bytes:
    """One-shot LZNT1 encode on device (chunk-parallel, stored-raw fallback)."""
    data = bytes(data)
    if not data:
        return b""
    nchunks = -(-len(data) // CHUNK)
    N = _pad_batch(nchunks)
    chunks = np.zeros((N, CHUNK), np.int32)
    clen = np.zeros(N, np.int32)
    arr = np.frombuffer(data, np.uint8)
    for k in range(nchunks):
        c = arr[k * CHUNK : (k + 1) * CHUNK]
        chunks[k, : len(c)] = c
        clen[k] = len(c)
    payload, plen = encode_batch(jnp.asarray(chunks), jnp.asarray(clen))
    payload = np.asarray(payload)
    plen = np.asarray(plen)
    out = bytearray()
    for k in range(nchunks):
        pl = int(plen[k])
        cl = int(clen[k])
        if pl < cl:
            header = 0xB000 | (pl - 1)
            out += header.to_bytes(2, "little")
            out += payload[k, :pl].astype(np.uint8).tobytes()
        else:
            header = 0x3000 | (cl - 1)
            out += header.to_bytes(2, "little")
            out += data[k * CHUNK : k * CHUNK + cl]
    return bytes(out)


def max_compressed_size(n: int) -> int:
    nchunks = (n + CHUNK - 1) // CHUNK
    return n + 2 * max(nchunks, 1) + 2
