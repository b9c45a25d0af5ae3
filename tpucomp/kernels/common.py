"""Shared match-finding and search primitives for the TPU codecs.

Reference-parity note: these subsume the reference's shared LZ77
dictionary / match-finder templates (``include/mscomp/Dictionary.h``,
SURVEY.md §2 row 7; mount unavailable) — redesigned for a machine with no
hardware gather/scatter: hash chains become a sort, match scoring becomes
word-wide compares, run detection becomes a reverse scan.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def searchsorted_rows(keys, queries, side="right", steps=None):
    """Row-wise binary search over per-row sorted ``keys``.

    Returns, per query, the number of keys <= query (side='right') or
    < query (side='left').  Implemented as unrolled one-shot gathers —
    the scatter-free inverse of "place record at position".
    """
    M = keys.shape[1]
    if steps is None:
        # search interval is [0, M] inclusive -> M+1 states need
        # ceil(log2(M+1)) halvings
        steps = max(1, M.bit_length())
    lo = jnp.zeros_like(queries)
    hi = jnp.full_like(queries, M)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(keys, jnp.minimum(mid, M - 1), axis=1)
        go_right = (v <= queries) if side == "right" else (v < queries)
        go_right = go_right & (mid < M)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


def le_words(x):
    """w[p] = little-endian 4-byte word starting at byte p (tail wraps;
    callers must exclude wrapped lanes)."""
    return (
        x
        | (jnp.roll(x, -1, axis=1) << 8)
        | (jnp.roll(x, -2, axis=1) << 16)
        | (jnp.roll(x, -3, axis=1) << 24)
    )


def hash_candidates(x, hash_bits=13, num_cands=2, pos_bits=None):
    """Per-position most-recent same-3-byte-hash candidate positions.

    Sort-based hash chains, scatter-free: sort (hash<<pos_bits | pos);
    equal-hash neighbors in sort order are the most recent earlier
    same-hash positions; a second sort keyed on position restores position
    order (the inverse permutation, gather-side).  Returns ``num_cands``
    arrays of candidate positions (-1 where none).
    """
    N, n = x.shape
    if pos_bits is None:
        pos_bits = max(1, (n - 1).bit_length())
    tri = (
        x | (jnp.roll(x, -1, axis=1) << 8) | (jnp.roll(x, -2, axis=1) << 16)
    ).astype(jnp.uint32)
    h = ((tri * jnp.uint32(0x9E3779B1)) >> jnp.uint32(32 - hash_bits)).astype(
        jnp.int32
    )
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (N, n))
    key = (h << pos_bits) | pos
    skey, spos = lax.sort((key, pos), dimension=1, num_keys=1)
    sh = skey >> pos_bits
    idx = jnp.arange(n, dtype=jnp.int32)[None, :]
    cands_sorted = []
    for k in range(1, num_cands + 1):
        prev_pos = jnp.roll(spos, k, axis=1)
        prev_h = jnp.roll(sh, k, axis=1)
        ok = (idx >= k) & (prev_h == sh)
        cands_sorted.append(jnp.where(ok, prev_pos, -1))
    out = lax.sort((spos, *cands_sorted), dimension=1, num_keys=1)
    return out[1:]


def capped_matchlen(w, cand, valid, n, cap=16):
    """Match length (≤ cap) of each row vs itself at candidate positions.

    ``w`` is the le_words() view; 4 bytes per one-shot gather; XOR +
    count-trailing-zeros finds the first differing byte (little-endian ⇒
    low byte is the first byte).  Windows clipped at the row tail earn no
    credit (always safe: the measured prefix is verified equal).
    """
    pos = jnp.arange(n, dtype=jnp.int32)[None, :]
    total = jnp.zeros_like(cand)
    alive = valid
    for tword in range(cap // 4):
        off = 4 * tword
        wa = jnp.roll(w, -off, axis=1)  # w[pos + off]: uniform shift
        wb = jnp.take_along_axis(w, jnp.clip(cand + off, 0, n - 1), axis=1)
        v = wa ^ wb
        tz = 32 - lax.clz(v & -v) - 1  # masked below where v == 0
        agree = jnp.where(v == 0, 4, tz >> 3)
        clipped = (pos + off) > (n - 4)
        agree = jnp.where(clipped, 0, agree)
        total = total + jnp.where(alive, agree, 0)
        alive = alive & (v == 0) & ~clipped
    return jnp.where(valid, total, 0)


def run_matchlens(x, disps):
    """Exact match lengths for fixed small displacements, all at once.

    For each d in ``disps``: ml_d[p] = length of the run of
    x[q] == x[q-d] starting at q = p (0 where p < d).  One reverse scan
    with len(disps) operands.  Catches RLE and short periods exactly —
    including arbitrarily long runs the capped hash scorer would truncate.
    """
    N, n = x.shape
    eqs = []
    for d in disps:
        eq = jnp.concatenate(
            [jnp.zeros((N, d), jnp.bool_), x[:, d:] == x[:, :-d]], axis=1
        )
        eqs.append(eq.T)  # step-major

    def rev_step(carry, eq_cols):
        new = tuple(
            jnp.where(eq_cols[i], carry[i] + 1, 0) for i in range(len(eqs))
        )
        return new, new

    zr = tuple(jnp.zeros(N, jnp.int32) for _ in eqs)
    _, runs_T = lax.scan(rev_step, zr, tuple(eqs), reverse=True)
    return [r.T for r in runs_T]
