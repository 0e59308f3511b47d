"""BM25 posting-scan design-space microbench (ROADMAP round-4 item).

The 1M-posting Zipf-heavy scan costs ~22 ms on v5e through the default
XLA blocked path and ~25 ms through the 1024-block aligned Pallas path —
far above the ~40 us a bandwidth-bound read of 16 MB would take, so the
cost is gather/grid-step overhead, not bytes. This bench isolates the
candidates before any engine wiring (measure-first, per ROADMAP):

  segsum        segment_sum alone (the per-doc reduction floor)
  xla4          current default: 4-plane vmapped dynamic_slice, BLOCK=1024
  xla4_big      same, BLOCK=8192 (fewer, larger slices)
  xla_packed    2-plane: docs i32 + (tf | lens<<16) u32, idf from plan
  pl1024        current opt-in Pallas aligned scan (4 planes)
  plB<big>      Pallas aligned scan, larger BLOCK (fewer grid steps)
  plB<big>p     Pallas larger BLOCK + packed 2-plane + per-block idf

All variants are validated against the reference dense scorer before
timing. Run on the real chip:

    python benchmarks/bm25_scan_bench.py [--iters 20] [--postings 1000000]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from orama_core_tpu.ops import bm25 as bm25_ops
from orama_core_tpu.ops.bm25 import B, BLOCK, K1


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- plans
def plan_unaligned(p_lo, p_len, block, nb):
    starts = np.zeros(nb, np.int32)
    valid = np.zeros(nb, np.int32)
    b = 0
    for lo, ln in zip(p_lo, p_len):
        off = 0
        while off < ln and b < nb:
            starts[b] = lo + off
            valid[b] = min(block, ln - off)
            off += block
            b += 1
    return starts, valid


def plan_aligned(p_lo, p_len, p_ni, block, nb):
    blk_idx = np.zeros(nb, np.int32)
    lo_off = np.zeros(nb, np.int32)
    hi_off = np.zeros(nb, np.int32)
    ni_b = np.zeros(nb, np.float32)
    b = 0
    for lo, ln, ni in zip(p_lo, p_len, p_ni):
        if ln <= 0:
            continue
        hi = lo + ln
        for blk in range(lo // block, (hi - 1) // block + 1):
            if b >= nb:
                return blk_idx, lo_off, hi_off, ni_b
            blk_idx[b] = blk
            lo_off[b] = max(lo - blk * block, 0)
            hi_off[b] = min(hi - blk * block, block)
            ni_b[b] = ni
            b += 1
    return blk_idx, lo_off, hi_off, ni_b


# ------------------------------------------------------- pallas kernels
def mk_pallas4(block):
    sub, lane = 8, block // 8

    def kern(sb_ref, lo_ref, hi_ref, par_ref,
             docs_ref, tf_ref, ni_ref, plens_ref,
             contrib_ref, docs_out_ref):
        i = pl.program_id(0)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, sub, lane), 1) * lane \
            + jax.lax.broadcasted_iota(jnp.int32, (1, sub, lane), 2)
        valid = ((j >= lo_ref[i]) & (j < hi_ref[i])).astype(jnp.float32)
        boost, avgdl, nfd = par_ref[0, 0], par_ref[0, 1], par_ref[0, 2]
        tf = tf_ref[:]
        ni = ni_ref[:]
        lens = plens_ref[:]
        idf = jnp.log1p(jnp.maximum((nfd - ni + 0.5) / (ni + 0.5), 0.0))
        den = tf + K1 * (1.0 - B + B * lens / jnp.maximum(avgdl, 1e-9))
        contrib_ref[:] = (
            idf * boost * tf * (K1 + 1.0) / jnp.maximum(den, 1e-9) * valid
        )
        docs_out_ref[:] = docs_ref[:]

    @functools.partial(jax.jit, static_argnames=("n_docs", "n_blocks"))
    def run(post_docs, post_tf, post_ni, post_lens,
            block_idx, lo_off, hi_off, boost, avgdl, nfd,
            n_docs, n_blocks):
        p = post_docs.shape[0]
        rows = p // block
        d2 = post_docs.reshape(rows, sub, lane)
        t2 = post_tf.reshape(rows, sub, lane)
        n2 = post_ni.reshape(rows, sub, lane)
        l2 = post_lens.reshape(rows, sub, lane)
        params = jnp.stack([boost, avgdl, nfd, jnp.float32(0.0)]).reshape(1, 4)

        def pspec():
            return pl.BlockSpec((1, sub, lane),
                                lambda i, sb, lo, hi: (sb[i], 0, 0))

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i, sb, lo, hi: (0, 0)),
                pspec(), pspec(), pspec(), pspec(),
            ],
            out_specs=[
                pl.BlockSpec((1, sub, lane), lambda i, sb, lo, hi: (i, 0, 0)),
                pl.BlockSpec((1, sub, lane), lambda i, sb, lo, hi: (i, 0, 0)),
            ],
        )
        contrib, docs_o = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, sub, lane), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, sub, lane), jnp.int32),
            ],
        )(block_idx, lo_off, hi_off, params, d2, t2, n2, l2)
        return jax.ops.segment_sum(
            contrib.reshape(-1), docs_o.reshape(-1), num_segments=n_docs
        )

    return run


def mk_pallas_packed(block):
    """2-plane scan: docs i32 + (tf | lens<<16) u32; idf per plan block."""
    sub, lane = 8, block // 8

    def kern(sb_ref, lo_ref, hi_ref, ni_ref, par_ref,
             docs_ref, packed_ref,
             contrib_ref, docs_out_ref):
        i = pl.program_id(0)
        j = jax.lax.broadcasted_iota(jnp.int32, (1, sub, lane), 1) * lane \
            + jax.lax.broadcasted_iota(jnp.int32, (1, sub, lane), 2)
        valid = ((j >= lo_ref[i]) & (j < hi_ref[i])).astype(jnp.float32)
        boost, avgdl, nfd = par_ref[0, 0], par_ref[0, 1], par_ref[0, 2]
        packed = packed_ref[:]
        tf = jnp.bitwise_and(packed, 0xFFFF).astype(jnp.float32)
        lens = jax.lax.shift_right_logical(packed, 16).astype(jnp.float32)
        ni = ni_ref[i].astype(jnp.float32)
        idf = jnp.log1p(jnp.maximum((nfd - ni + 0.5) / (ni + 0.5), 0.0))
        den = tf + K1 * (1.0 - B + B * lens / jnp.maximum(avgdl, 1e-9))
        contrib_ref[:] = (
            idf * boost * tf * (K1 + 1.0) / jnp.maximum(den, 1e-9) * valid
        )
        docs_out_ref[:] = docs_ref[:]

    @functools.partial(jax.jit, static_argnames=("n_docs", "n_blocks"))
    def run(post_docs, post_packed, block_idx, lo_off, hi_off, ni_b,
            boost, avgdl, nfd, n_docs, n_blocks):
        p = post_docs.shape[0]
        rows = p // block
        d2 = post_docs.reshape(rows, sub, lane)
        p2 = post_packed.reshape(rows, sub, lane)
        params = jnp.stack([boost, avgdl, nfd, jnp.float32(0.0)]).reshape(1, 4)

        def pspec():
            return pl.BlockSpec((1, sub, lane),
                                lambda i, sb, lo, hi, ni: (sb[i], 0, 0))

        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((1, 4), lambda i, sb, lo, hi, ni: (0, 0)),
                pspec(), pspec(),
            ],
            out_specs=[
                pl.BlockSpec((1, sub, lane),
                             lambda i, sb, lo, hi, ni: (i, 0, 0)),
                pl.BlockSpec((1, sub, lane),
                             lambda i, sb, lo, hi, ni: (i, 0, 0)),
            ],
        )
        contrib, docs_o = pl.pallas_call(
            kern, grid_spec=gs,
            out_shape=[
                jax.ShapeDtypeStruct((n_blocks, sub, lane), jnp.float32),
                jax.ShapeDtypeStruct((n_blocks, sub, lane), jnp.int32),
            ],
        )(block_idx, lo_off, hi_off, ni_b, params, d2, p2)
        return jax.ops.segment_sum(
            contrib.reshape(-1), docs_o.reshape(-1), num_segments=n_docs
        )

    return run


def mk_xla_blocked(block):
    @functools.partial(jax.jit, static_argnames=("n_docs", "n_blocks"))
    def run(post_docs, post_tf, post_ni, post_lens, starts, valid_n,
            boost, avgdl, nfd, n_docs, n_blocks):
        def slice_blocks(arr):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(arr, (s,), (block,))
            )(starts)

        docs = slice_blocks(post_docs)
        tf = slice_blocks(post_tf)
        ni = slice_blocks(post_ni)
        lens = slice_blocks(post_lens)
        inb = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, block), 1)
        valid = (inb < valid_n[:, None]).astype(jnp.float32)
        idf = jnp.log1p(jnp.maximum((nfd - ni + 0.5) / (ni + 0.5), 0.0))
        den = tf + K1 * (1.0 - B + B * lens / jnp.maximum(avgdl, 1e-9))
        contrib = idf * boost * tf * (K1 + 1.0) / jnp.maximum(den, 1e-9)
        contrib = contrib * valid
        return jax.ops.segment_sum(
            contrib.reshape(-1), docs.reshape(-1), num_segments=n_docs
        )

    return run


def mk_xla_packed(block):
    @functools.partial(jax.jit, static_argnames=("n_docs", "n_blocks"))
    def run(combined, starts, valid_n, idf_b, boost, avgdl,
            n_docs, n_blocks):
        # combined: int32[P, 2] — col 0 docs, col 1 tf|lens<<16
        def slice_blocks(arr):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(arr, (s, 0), (block, 2))
            )(starts)

        both = slice_blocks(combined)           # [nb, block, 2]
        docs = both[:, :, 0]
        packed = both[:, :, 1]
        tf = jnp.bitwise_and(packed, 0xFFFF).astype(jnp.float32)
        lens = jax.lax.shift_right_logical(packed, 16).astype(jnp.float32)
        inb = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, block), 1)
        valid = (inb < valid_n[:, None]).astype(jnp.float32)
        den = tf + K1 * (1.0 - B + B * lens / jnp.maximum(avgdl, 1e-9))
        contrib = (
            idf_b[:, None] * boost * tf * (K1 + 1.0)
            / jnp.maximum(den, 1e-9) * valid
        )
        return jax.ops.segment_sum(
            contrib.reshape(-1), docs.reshape(-1), num_segments=n_docs
        )

    return run


# ----------------------------------------------------------------- main
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--postings", type=int, default=1_000_000)
    ap.add_argument("--docs", type=int, default=1_048_576)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    n_docs = args.docs
    rng = np.random.default_rng(0)

    # Zipf-heavy term mix summing to ~args.postings
    dfs = []
    df = max(args.postings // 2, 1)
    while sum(dfs) + df // 2 < args.postings and df >= 1024:
        dfs.append(df)
        df //= 2
    log(f"terms: {len(dfs)} dfs={dfs} total={sum(dfs)}")

    lens_by_doc = rng.integers(8, 100, n_docs).astype(np.int32)
    docs_l, tf_l, ni_l, lens_l = [], [], [], []
    p_lo, p_len, p_ni = [], [], []
    off = 0
    for df in dfs:
        ids = np.sort(rng.permutation(n_docs)[:df]).astype(np.int32)
        tf = rng.integers(1, 6, df).astype(np.int32)
        docs_l.append(ids)
        tf_l.append(tf)
        ni_l.append(np.full(df, df, np.float32))
        lens_l.append(lens_by_doc[ids].astype(np.float32))
        p_lo.append(off)
        p_len.append(df)
        p_ni.append(float(df))
        off += df

    big_block = 8192
    p_total = off
    p_pad = -(-p_total // big_block) * big_block
    post_docs = np.zeros(p_pad, np.int32)
    post_tf = np.zeros(p_pad, np.float32)
    post_ni = np.ones(p_pad, np.float32)
    post_lens = np.ones(p_pad, np.float32)
    post_docs[:p_total] = np.concatenate(docs_l)
    post_tf[:p_total] = np.concatenate(tf_l).astype(np.float32)
    post_ni[:p_total] = np.concatenate(ni_l)
    post_lens[:p_total] = np.concatenate(lens_l)
    packed_np = (
        post_tf.astype(np.int64).astype(np.uint32)
        | (post_lens.astype(np.int64).astype(np.uint32) << np.uint32(16))
    ).astype(np.int32)
    combined_np = np.stack([post_docs, packed_np], axis=1)  # [P, 2]

    avgdl = np.float32(lens_by_doc.mean())
    nfd = np.float32(n_docs)
    boost = np.float32(1.0)

    # oracle
    def oracle():
        out = np.zeros(n_docs, np.float64)
        idf_t = {df: np.log1p(max((n_docs - df + 0.5) / (df + 0.5), 0.0))
                 for df in dfs}
        for lo, ln, df in zip(p_lo, p_len, p_ni):
            d = post_docs[lo:lo + ln]
            t = post_tf[lo:lo + ln].astype(np.float64)
            ln_d = post_lens[lo:lo + ln].astype(np.float64)
            den = t + K1 * (1.0 - B + B * ln_d / avgdl)
            np.add.at(out, d, idf_t[int(df)] * t * (K1 + 1.0) / den)
        return out.astype(np.float32)

    ref = oracle()

    dev = jax.devices()[0]
    put = lambda x, dt=None: jax.device_put(
        jnp.asarray(x, dt) if dt else jnp.asarray(x), dev)
    d_docs = put(post_docs)
    d_tf = put(post_tf)
    d_ni = put(post_ni)
    d_lens = put(post_lens)
    d_comb = put(combined_np)
    d_packed = put(packed_np)
    j_boost, j_avgdl, j_nfd = (
        jnp.float32(boost), jnp.float32(avgdl), jnp.float32(nfd))

    results = {}

    def timed(name, fn, *xs):
        t0 = time.time()
        out = fn(*xs)
        out.block_until_ready()
        log(f"  [{name}] compile+first: {time.time()-t0:.1f}s")
        err = float(np.max(np.abs(np.asarray(out) - ref)))
        rel = err / max(float(np.max(ref)), 1e-9)

        # All iterations inside ONE dispatch (the relay costs ~100+ ms per
        # dispatch); the optimization_barrier ties the inputs to the loop
        # carry so XLA's loop-invariant code motion cannot hoist the
        # gathers/pallas_call out of the loop.
        R = args.iters

        @jax.jit
        def loop(ys):
            def body(_, c):
                s, zs = c
                s, zs = jax.lax.optimization_barrier((s, zs))
                return (s + fn(*zs)[0], zs)
            return jax.lax.fori_loop(
                0, R, body, (jnp.float32(0.0), ys))[0]

        s = loop(xs)
        s.block_until_ready()
        t0 = time.time()
        s = loop(xs)
        s.block_until_ready()
        dt = (time.time() - t0) / R * 1e3
        log(f"  [{name}] {dt:.2f} ms  max-rel-err {rel:.2e}")
        results[name] = {"ms": round(dt, 3), "rel_err": float(f"{rel:.3e}")}
        return dt

    # segment_sum floor
    contrib0 = put(rng.standard_normal(p_pad).astype(np.float32))
    f_seg = jax.jit(functools.partial(
        jax.ops.segment_sum, num_segments=n_docs))
    timed("segsum", f_seg, contrib0, d_docs)
    results["segsum"]["rel_err"] = 0.0  # not a scorer; err vs ref meaningless

    # current default XLA blocked (1024)
    nb1 = -(-p_total // BLOCK) * 1 + len(dfs)
    st1, va1 = plan_unaligned(p_lo, p_len, BLOCK, nb1)
    f_x4 = mk_xla_blocked(BLOCK)
    timed("xla4_1024",
          lambda *xs: f_x4(*xs, n_docs=n_docs, n_blocks=nb1),
          d_docs, d_tf, d_ni, d_lens, put(st1), put(va1),
          j_boost, j_avgdl, j_nfd)

    # XLA blocked, big block
    nbB = -(-p_total // big_block) + len(dfs)
    stB, vaB = plan_unaligned(p_lo, p_len, big_block, nbB)
    f_x4b = mk_xla_blocked(big_block)
    timed(f"xla4_{big_block}",
          lambda *xs: f_x4b(*xs, n_docs=n_docs, n_blocks=nbB),
          d_docs, d_tf, d_ni, d_lens, put(stB), put(vaB),
          j_boost, j_avgdl, j_nfd)

    # XLA packed (1024 + big)
    for blk, nb, st, va in ((BLOCK, nb1, st1, va1),
                            (big_block, nbB, stB, vaB)):
        idf_b = np.zeros(nb, np.float32)
        b = 0
        for lo, ln, dfv in zip(p_lo, p_len, p_ni):
            offp = 0
            while offp < ln and b < nb:
                idf_b[b] = np.log1p(
                    max((n_docs - dfv + 0.5) / (dfv + 0.5), 0.0))
                offp += blk
                b += 1
        f_xp = mk_xla_packed(blk)
        timed(f"xla_packed_{blk}",
              lambda *xs, _f=f_xp, _nb=nb: _f(
                  *xs, n_docs=n_docs, n_blocks=_nb),
              d_comb, put(st), put(va), put(idf_b), j_boost, j_avgdl)

    # Pallas aligned, 4-plane: 1024 (current opt-in) and big blocks
    for blk in (BLOCK, 4096, big_block):
        nb = sum((ln + blk - 1) // blk + 1 for ln in p_len)
        bi, lo_o, hi_o, ni_b = plan_aligned(p_lo, p_len, p_ni, blk, nb)
        f_p4 = mk_pallas4(blk)
        timed(f"pl4_{blk}",
              lambda *xs, _f=f_p4, _nb=nb: _f(
                  *xs, n_docs=n_docs, n_blocks=_nb),
              d_docs, d_tf, d_ni, d_lens,
              put(bi), put(lo_o), put(hi_o), j_boost, j_avgdl, j_nfd)

        ni_i32 = ni_b.astype(np.int32)
        f_pp = mk_pallas_packed(blk)
        timed(f"plp_{blk}",
              lambda *xs, _f=f_pp, _nb=nb: _f(
                  *xs, n_docs=n_docs, n_blocks=_nb),
              d_docs, d_packed, put(bi), put(lo_o), put(hi_o), put(ni_i32),
              j_boost, j_avgdl, j_nfd)

    print(json.dumps({
        "bench": "bm25_scan",
        "postings": p_total,
        "docs": n_docs,
        "backend": jax.default_backend(),
        "results": results,
    }))


if __name__ == "__main__":
    main()
