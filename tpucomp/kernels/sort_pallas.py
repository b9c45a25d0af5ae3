"""Pallas VMEM-resident bitonic row sort (single key + payload planes).

The encoders' sort-hash match finder is sort-bound: lax.sort over
[N, 4096] measured 8.2 ms for 2 planes / 16.0 ms with the 8 compare-word
payload planes (dev v5e, 8 MB batch) — ~95 % of LZNT1 encode e2e.  A
bitonic network is a fixed data-independent schedule of compare-exchange
stages (sum_{k<=log U} k = 78 stages at U=4096), each stage two CYCLIC
lane-rotates + selects: partner lane i^j is reached by roll(+-j), and
because bit_j(i) decides which direction is selected, the wrapped-around
lanes are never selected — no edge masking at all.

All planes ride one [RB*P, U] array (planes stacked along sublanes), so
a stage is 2 rolls + 2 selects on the stacked array + compares on the
key rows: the Mosaic program stays ~5 ops/stage regardless of payload
count, and rows stay VMEM-resident across all stages (the lax.sort
form streams HBM per merge pass).

NOT a stable sort: ties between equal keys can land in either order.
Every call site must therefore carry a UNIQUE key (the match finder's
key embeds the position in its low bits; the un-sort keys are a
permutation).  Reference role: the hash-chain dictionary build of
SURVEY.md §2 row 7, reshaped for a vector machine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RB = 8  # rows per grid step


def _build_kernel(U, P, nstages_dummy=None):
    def kernel(*refs):
        in_refs, out_refs = refs[:P], refs[P:]
        x = jnp.concatenate([r[...] for r in in_refs], axis=0)  # [P*RB, U]
        cols = lax.broadcasted_iota(jnp.int32, (RB, U), 1)
        colsP = lax.broadcasted_iota(jnp.int32, (P * RB, U), 1)
        k = 2
        while k <= U:
            j = k // 2
            while j >= 1:
                # partner lane i^j: lanes with bit_j clear read i+j
                # (roll left), others read i-j (roll right); cyclic
                # wrap lands only on never-selected lanes
                bitj = (colsP & j) != 0
                px = jnp.where(bitj, pltpu.roll(x, j, 1),
                               pltpu.roll(x, U - j, 1))
                key = x[:RB]
                pk = px[:RB]
                # exchange iff the partner's key belongs at this lane:
                # (am-low-lane == ascending-block) -> take the smaller
                # (pk < key), else the larger.  am-low == asc reduces to
                # bit_j(i) == bit_k(i); integer bit extraction because
                # Mosaic cannot compare two i1 vectors (trunci i8->i1).
                # (cols & k) == 0 for every lane when k == U: the final
                # merge is all-ascending with no special case.
                lgj, lgk = j.bit_length() - 1, k.bit_length() - 1
                same = (((cols >> lgj) ^ (cols >> lgk)) & 1) == 0
                # int32 branches: Mosaic cannot select between two i1
                # vectors (trunci i8->i1)
                take = jnp.where(same, (pk < key).astype(jnp.int32),
                                 (pk > key).astype(jnp.int32))
                x = jnp.where(jnp.tile(take, (P, 1)) != 0, px, x)
                j //= 2
            k *= 2
        for p, r in enumerate(out_refs):
            r[...] = x[p * RB:(p + 1) * RB]

    return kernel


@functools.lru_cache(maxsize=None)
def _call(NP, U, P, interpret):
    kernel = _build_kernel(U, P)
    spec = pl.BlockSpec((RB, U), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(NP // RB,),
        in_specs=[spec] * P,
        out_specs=[spec] * P,
        out_shape=[jax.ShapeDtypeStruct((NP, U), jnp.int32)] * P,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=bool(interpret),
    )


def bitonic_sort_rows(operands, interpret=False):
    """Ascending sort of each row by operands[0] (UNIQUE keys required —
    see module docstring), payload planes permuted along.  U must be a
    power of two (the formats' unit sizes are); int32 planes."""
    ops = tuple(operands)
    N, U = ops[0].shape
    assert U & (U - 1) == 0, U
    P = len(ops)
    NP = -(-N // RB) * RB
    # rows are padded with the key plane's own values — padding rows
    # sort independently and are dropped
    padded = [jnp.pad(o, ((0, NP - N), (0, 0))) for o in ops]
    outs = _call(NP, U, P, interpret)(*padded)
    return tuple(o[:N] for o in outs)
