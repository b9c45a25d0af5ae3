"""Stage-level profile of the XH decode pipeline on the current backend.

Set TPUCOMP_PROFILE_RESOLVED=1 to profile the archive fast path
(offset-resolved native streams + fast_resolve decode).

Splits decode wall time into: parse kernel (Pallas scan), record fill
(fill_records_dense), copy resolve (resolve_pallas / XLA), so perf work
targets the real bottleneck.  Run on the dev chip:

    python benchmarks/profile_xh.py [corpus_mb] [reps]
"""

import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    corpus_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from benchmarks.corpus import silesia_like
    from tpucomp.codecs import xpress_huff as xh
    from tpucomp.kernels import xh_pallas
    from tpucomp.kernels.huffman import (
        canonical_from_lengths,
        rank_to_symbol_table,
    )
    from tpucomp.kernels.common import fill_records_delta2
    from tpucomp.util import pallas_mode

    data = silesia_like(corpus_mb << 20)
    U = xh.BLOCK
    units = [data[i : i + U] for i in range(0, len(data), U)]
    # native-encoded foreign streams (mirrors bench.py stage_xh_decode;
    # the TPU encoder's streams profile identically and cost minutes)
    from tpucomp import _native

    resolved = os.environ.get("TPUCOMP_PROFILE_RESOLVED", "0") == "1"
    enc = _native.xh_compress_resolved if resolved else _native.xh_compress
    streams = [enc(u) for u in units]
    print(f"# resolved-profile streams: {resolved}")
    mode = pallas_mode("TPUCOMP_XH_PALLAS")
    print(f"# corpus {corpus_mb} MB, {len(units)} blocks, mode={mode}")

    # majority bucket (mirror bench.py)
    from collections import Counter

    def bucket_of(s):
        return (
            xh._substeps_for(xh._min_code_len([s])),
            max(1024, -(-(len(s) - 256) // 8192) * 8192),
            xh._rank_cap(s) if mode else xh.NUM_SYMBOLS,
        )

    per_b = [bucket_of(s) for s in streams]
    b_major = Counter(per_b).most_common(1)[0][0]
    ss, _, rc = b_major
    sel = [i for i, b in enumerate(per_b) if b == b_major][:512]
    sel_bytes = sum(len(units[i]) for i in sel)
    max_body = max(len(streams[i]) for i in sel) - 256
    bb = max(1024, -(-max_body // 8192) * 8192)
    P = min(xh.max_payload(U), 256 + bb + 16)
    N = max(8, len(sel))
    payload = np.zeros((N, P), np.int32)
    plen = np.zeros(N, np.int32)
    olen = np.zeros(N, np.int32)
    for k, i in enumerate(sel):
        a = np.frombuffer(streams[i], np.uint8)
        payload[k, : len(a)] = a
        plen[k] = len(a)
        olen[k] = len(units[i])
    d_pay = jnp.asarray(payload)
    d_plen = jnp.asarray(plen)
    d_olen = jnp.asarray(olen)
    print(f"# majority bucket: ss={ss} rank_cap={rc} P={P} N={N} "
          f"({sel_bytes / (1 << 20):.1f} MB)")

    # ---- stage functions (each takes a salt that perturbs an input:
    # the axon tunnel elides repeated identical dispatches, so unsalted
    # reps time ~RTT only — see bench.py) ----
    def stage_tables(pay, s):
        lengths = xh._unpack_table(pay + s)
        _, fc, br, lim = canonical_from_lengths(lengths)
        sym = rank_to_symbol_table(lengths)
        return fc, br, lim, sym

    def stage_parse(pay, pl, ol, fc, br, lim, sym, s):
        return xh_pallas.parse_records(
            pay[:, 256:], pl - 256, ol + s, fc, br, lim, sym, U, ss,
            rank_cap=rc, interpret=(mode == "interpret"))

    def stage_fill(rec_pos, rec_val, s):
        keep = min(U, (8 * (P - 256)) // ss + 8)
        keep = -(-keep // 128) * 128
        vf, pf, _ = fill_records_delta2(rec_pos + s, rec_val, U, keep=keep)
        return vf, pf

    def stage_resolve(vt, ol, s):
        vpack, tokpos = vt
        from jax import lax as jlax

        j = jnp.arange(U, dtype=jnp.int32)[None, :]
        vpack = vpack + s
        is_copy_j = (vpack & xh._COPY_BIT) != 0
        disp_j = vpack & (xh._COPY_BIT - 1)
        rel = j - tokpos
        dispc = jnp.maximum(disp_j, 1)
        disp_j = jnp.where(
            is_copy_j & (rel >= dispc), rel - jlax.rem(rel, dispc), disp_j)
        litv = jnp.where(is_copy_j, 0, vpack & 0x1FF)
        if mode is not None and U % 128 == 0:
            from tpucomp.kernels import resolve_pallas

            out = resolve_pallas.resolve_copies(
                is_copy_j, disp_j, litv, interpret=(mode == "interpret"))
        else:
            from tpucomp.kernels.common import resolve_copies_wide

            out = resolve_copies_wide(is_copy_j, disp_j, litv)
        return jnp.where(j < ol[:, None], out, 0)

    def timeit(name, fn, *args):
        # in-jit chained reps: ONE dispatch runs `reps` true executions
        # (opaque runtime-zero salt defeats both loop hoisting and the
        # tunnel's identical-dispatch elision; per-dispatch tunnel
        # overhead is 50-200 ms, far above most stages).  Reps are
        # PYTHON-UNROLLED: fori-wrapping compiles pathologically slowly
        # through the remote AOT helper at batch widths.
        @jax.jit
        def run(zero, *a):
            s = jnp.int32(0)
            for _ in range(reps):
                out = fn(*a, s)
                # full reduce over EVERY leaf: a narrower dependency
                # would let XLA dead-code-eliminate sibling outputs
                acc = zero
                for leaf in jax.tree_util.tree_leaves(out):
                    acc = acc + jnp.min(leaf).astype(jnp.int32)
                s = acc * zero
            return s

        z = jnp.int32(0)
        r = run(z, *args)
        jax.block_until_ready(r)
        _ = np.asarray(r)
        t0 = time.perf_counter()
        r = run(z, *args)
        _ = np.asarray(r)
        dt = (time.perf_counter() - t0) / reps
        gbps = sel_bytes / dt / 1e9
        print(f"{name:12s} {dt * 1e3:9.2f} ms   {gbps:7.3f} GB/s")
        return jax.jit(fn)(*args, jnp.int32(0))

    fc, br, lim, sym = timeit("tables", stage_tables, d_pay)
    rec_pos, rec_val, p_final, errk = timeit(
        "parse", stage_parse, d_pay, d_plen, d_olen, fc, br, lim, sym)
    print(f"# record slots/row: {rec_pos.shape[1]}  "
          f"nonempty: {int(np.asarray((rec_pos < (1 << 28)).sum(axis=1)).max())} max")
    vt = timeit("fill", stage_fill, rec_pos, rec_val)
    timeit("resolve", stage_resolve, vt, d_olen)

    # ---- resolve sub-stages: near scan vs far rounds + tag census
    # (inputs are post-FOLD, matching the real path) ----
    from tpucomp.kernels.common import FAR_TAG, _far_rounds
    from tpucomp.kernels import resolve_pallas

    def mkinputs(vt):
        vpack, tokpos = vt
        from jax import lax as jlax

        j = jnp.arange(U, dtype=jnp.int32)[None, :]
        is_copy_j = (vpack & xh._COPY_BIT) != 0
        disp_j = vpack & (xh._COPY_BIT - 1)
        rel = j - tokpos
        dispc = jnp.maximum(disp_j, 1)
        disp_j = jnp.where(
            is_copy_j & (rel >= dispc), rel - jlax.rem(rel, dispc), disp_j)
        litv = jnp.where(is_copy_j, 0, vpack & 0x1FF)
        return is_copy_j, disp_j, litv

    def stage_near(vt, s):
        vpack, tokpos = vt
        ic, dj, lv = mkinputs((vpack + s, tokpos))
        N_, U_ = ic.shape
        S = resolve_pallas.SEG
        NR = N_ * (U_ // S)
        SL = min(8, -(-NR // 128))
        T = -(-NR // (SL * 128))
        NL = T * SL
        v = ((lv & 0x1FF)
             | (jnp.where(ic, jnp.minimum(dj, 0x1FFFF), 0) << 9)
             | jnp.where(ic, 1 << 26, 0))
        v = v.reshape(NR, S)
        v = jnp.pad(v, ((0, NL * 128 - NR), (0, 0))).T.reshape(S, NL, 128)
        base = jnp.tile(jnp.arange(U_ // S, dtype=jnp.int32) * S, (N_,))
        base = jnp.pad(base, (0, NL * 128 - NR)).reshape(1, NL, 128)
        outk = resolve_pallas._resolve_call(S, SL, T, S, False)(base, v)
        return outk.transpose(1, 2, 0).reshape(NL * 128, S)[:NR].reshape(N_, U_)

    tagged0 = timeit("near", stage_near, vt)

    def stage_far(tg, s):
        return _far_rounds(tg + s, U, resolve_pallas.SEG)

    timeit("far", stage_far, tagged0)
    # tag census at each far level
    t0 = np.asarray((tagged0 & FAR_TAG) != 0)
    print(f"# tags after near: {int(t0.sum())} / {t0.size} "
          f"({100 * t0.sum() / t0.size:.1f}%)")
    src0 = np.asarray(tagged0 & (FAR_TAG - 1))
    jj = np.arange(U)[None, :]
    for S in (4096, 16384):
        cross = t0 & ((jj // S) != (src0 // S))
        print(f"# tags crossing {S}-segments: {int(cross.sum())}")

    # far sub-levels, timed + tag flow
    from tpucomp.kernels.common import _far_level_segmented

    def lvl_4k(tg, s):
        return _far_level_segmented(tg + s, U, 4096, cap=8)

    def lvl_16k(tg, s):
        return _far_level_segmented(tg + s, U, 16384, cap=6)

    def lvl_final(tg, s):
        return _far_level_segmented(tg + s, U, U)

    from tpucomp.kernels.common import _far_probe_round

    if resolved:
        def probe2(tg, s):
            o = _far_probe_round(tg + s, U)
            return _far_probe_round(o, U)

        afterp = timeit("far:probe2", probe2, tagged0)
        tp = np.asarray((afterp & FAR_TAG) != 0)
        print(f"# tags after probe2: {int(tp.sum())} "
              f"(max/row {int(tp.sum(axis=1).max())})")

    after4k = timeit("far:4k", lvl_4k, tagged0)
    t1 = np.asarray((after4k & FAR_TAG) != 0)
    print(f"# tags after 4k level: {int(t1.sum())} "
          f"(max/row {int(t1.sum(axis=1).max())})")
    after16k = timeit("far:16k", lvl_16k, after4k)
    t2 = np.asarray((after16k & FAR_TAG) != 0)
    print(f"# tags after 16k level: {int(t2.sum())} "
          f"(max/row {int(t2.sum(axis=1).max())})")
    timeit("far:final", lvl_final, after16k)

    # end-to-end for reference
    def e2e(pay, pl, ol, s):
        return xh._decode_impl(pay, pl, ol + s, U, ss, mode, rc,
                               fast_resolve=resolved)[0]

    timeit("end2end", e2e, d_pay, d_plen, d_olen)


if __name__ == "__main__":
    main()
