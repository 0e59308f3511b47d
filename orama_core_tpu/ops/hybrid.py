"""Fused hybrid serving program: one XLA dispatch per query.

The general hybrid path issues separate program chains for the filter
mask, BM25, the vector matmul, fusion, and top-k — each dispatch costs a
host->device round trip (~50 ms through a remote-device relay), so a 1M
hybrid query paid ~3x the vector-only latency (BENCH_NOTES r2: 111 ms vs
32 ms p50). This module fuses the whole pipeline

    (number filter mask ->) blocked BM25 (-> phrase boost) ->
    vector matmul -> RRF/minmax fusion -> top-k + count

into ONE jitted program per shape family (capacity bucket x block budget
x k bucket x fusion x phrase x filter kind), so serving is one dispatch +
one fetch. The constituent kernels are the exact single-purpose kernels
(ops/bm25.py, ops/vector.py, ops/filters.py, ops/fusion.py) called
inside one trace — results are bit-identical to the unfused path.

Replaces the reference's sequential hybrid join (collection.rs:730-772).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import bm25 as bm25_ops
from . import filters as filter_ops
from . import vector as vector_ops
from .fusion import minmax_fuse, rrf_fuse


def _field_fulltext_score(
    fargs, fstat, *, n_docs, bm25_pallas, interpret
):
    """One string field's dense BM25 scores inside a fused trace: blocked
    posting scan (XLA or Pallas) + optional dense Zipf-head rows +
    optional phrase multiplier. ``fstat`` is the per-field statics
    (n_blocks, phrase, dense, ph_windowed, ph_W, ph_wsub); ``fargs`` the
    per-field array bundle:

      post_docs/tf/ni/lens      committed postings (cache: string_arrays)
      b_starts, b_valid         int32[n_blocks] unaligned plan (XLA scan)
      ba_idx, ba_lo, ba_hi      int32[n_blocks] aligned plan (Pallas scan)
      bm25_boost                f32[] (1.0 when phrase: boost rides the
                                phrase kernel instead)
      avgdl, nfd                f32[] shared global info (committed +
                                uncommitted, collection.rs:930-951)
      dense_rows, d_sel, d_w    Zipf-head dense g rows + selection
                                (cache: dense_term_rows; dummies unless
                                dense — see ops/bm25.py dense section)
      ph_docs/poss/terms        doc-major position stream (cache:
                                phrase_docmajor/windowed_arrays)
      ph_bounds                 per-doc CSR (cumsum reduction only)
      ph_wbase                  per-block window base (windowed only)
      ph_spans, ph_boost        matched term-id ranges + user boost
    """
    (
        post_docs, post_tf, post_ni, post_lens, b_starts, b_valid,
        ba_idx, ba_lo, ba_hi, bm25_boost, avgdl, nfd,
        dense_rows, d_sel, d_w,
        ph_docs, ph_poss, ph_terms, ph_bounds, ph_wbase, ph_spans, ph_boost,
    ) = fargs
    n_blocks, phrase, dense, ph_windowed, ph_W, ph_wsub = fstat
    if bm25_pallas:
        # DMA-aligned block gathers (the vmapped dynamic_slice path
        # reads at ~0.4 GB/s on TPU — see bm25_scores_blocked_pallas)
        ft = bm25_ops.bm25_scores_blocked_pallas(
            post_docs, post_tf, post_ni, post_lens,
            ba_idx, ba_lo, ba_hi,
            bm25_boost, avgdl, nfd,
            n_docs=n_docs, n_blocks=n_blocks, interpret=interpret,
        )
    else:
        ft = bm25_ops.bm25_scores_blocked(
            post_docs, post_tf, post_ni, post_lens, b_starts, b_valid,
            bm25_boost, avgdl, nfd, n_docs=n_docs, n_blocks=n_blocks,
        )
    if dense:
        # heavy-term scores from commit-static dense g rows; added
        # BEFORE the phrase multiplier, exactly like the scan's
        # contribution for those terms would be
        ft = ft + bm25_ops.dense_rows_contrib(
            dense_rows, d_sel, d_w, bm25_boost
        )
    if phrase:
        if ph_windowed:
            ft = ft * bm25_ops.phrase_boost_docmajor_windowed(
                ph_docs, ph_poss, ph_terms, ph_wbase, ph_spans,
                ph_boost, n_docs=n_docs, W=ph_W, wsub=ph_wsub,
                interpret=interpret,
            )
        else:
            ft = ft * bm25_ops.phrase_boost_docmajor(
                ph_docs, ph_poss, ph_terms, ph_bounds, ph_spans,
                ph_boost, n_docs=n_docs,
            )
    return ft


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_docs", "k", "fusion", "nf", "masked", "mode", "bm25_pallas",
        "field_statics", "u_ft", "u_vec", "interpret",
    ),
)
def hybrid_fused_topk_mf(
    # tuple of per-field array bundles — each laid out exactly like
    # hybrid_fused_topk's leading args (_field_fulltext_score's fargs);
    # empty tuple when mode == "vector"
    fields,
    # live freshness-window contributions, host-merged across fields
    # (padded scatter pairs; dummies unless u_ft/u_vec). String window
    # scores already include boost + idf (no phrase in the window —
    # uncommitted/string.rs:124-193); vector window scores are summed
    # relu-cosines. Both are added UNMASKED and masked in-trace, which
    # distributes identically to the multi-dispatch path's host-side
    # mask skip.
    u_ft_idx, u_ft_vals,
    u_vec_idx, u_vec_vals,
    # committed vectors (device cache: vector_arrays)
    vecs, vec_docs, vec_valid, query,
    # masks/filters
    alive_mask,
    nf_vals, nf_docs, nf_valid,
    nf_lo, nf_hi, nf_lx, nf_hx,
    *,
    n_docs: int,
    k: int,
    fusion: str,       # "rrf" | "minmax"
    nf: str,           # "none" | "range" | "eq"
    masked: bool,      # multiply by the mask (where-filters or deletes)
    mode: str,         # "hybrid" | "fulltext" | "vector"
    bm25_pallas: bool,
    # tuple of per-field statics (n_blocks, phrase, dense, ph_windowed,
    # ph_W, ph_wsub), parallel to ``fields``
    field_statics,
    u_ft: bool,        # string freshness window present
    u_vec: bool,       # vector freshness window present
    interpret: bool = False,
):
    """Multi-string-field fused serving with live freshness windows: the
    whole query — per-field BM25 (+dense rows, +phrase) summed across
    fields, host-scattered window contributions, filter mask, vector
    matmul, fusion, top-k — in ONE dispatch. Bit-identical to the
    multi-dispatch chain (search_fulltext's per-field loop +
    _scatter_add_scores window merge; the reference's per-field loop is
    collection.rs:903-955)."""
    if nf == "range":
        m = filter_ops.number_range_mask(
            nf_vals, nf_docs, nf_valid, nf_lo, nf_hi, nf_lx, nf_hx,
            n_docs=n_docs,
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    elif nf == "eq":
        m = filter_ops.number_eq_mask(
            nf_vals, nf_docs, nf_valid, nf_lo, n_docs=n_docs
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    else:
        mask = alive_mask
    if mode != "vector":
        ft = jnp.zeros((n_docs,), jnp.float32)
        for fargs, fstat in zip(fields, field_statics):
            ft = ft + _field_fulltext_score(
                fargs, fstat, n_docs=n_docs, bm25_pallas=bm25_pallas,
                interpret=interpret,
            )
        if u_ft:
            ft = ft.at[u_ft_idx].add(u_ft_vals)
        if masked:
            ft = ft * mask
    if mode != "fulltext":
        q8 = jnp.zeros((8, query.shape[0]), query.dtype).at[0].set(query)
        sims8 = jnp.dot(
            vecs, q8.T.astype(vecs.dtype), preferred_element_type=jnp.float32
        )                                                   # [P, 8]
        sims = jnp.maximum(sims8[:, 0], 0.0) * vec_valid
        vec = jax.ops.segment_sum(sims, vec_docs, num_segments=n_docs)
        if u_vec:
            vec = vec.at[u_vec_idx].add(u_vec_vals)
        vec = vec * mask
    if mode == "fulltext":
        fused = ft
    elif mode == "vector":
        fused = vec
    else:
        if fusion == "rrf":
            # candidate-exact RRF: no dense argsorts (31.6 -> ~5 ms at 1M)
            from .fusion import rrf_candidate_count, rrf_fuse_topk

            return rrf_fuse_topk(ft, vec, k, rrf_candidate_count(k))
        fused = minmax_fuse(ft, vec)
    vals, idx = jax.lax.top_k(fused, k)
    count = jnp.sum(fused > 0).astype(jnp.int32)
    return vals, idx.astype(jnp.int32), count



@functools.partial(
    jax.jit,
    static_argnames=(
        "n_docs", "k", "fusion", "nf", "masked", "mode", "g_budget",
    ),
)
def hybrid_fused_topk_batch(
    # committed postings CSR (device cache: string_arrays; dummies when
    # mode == "vector")
    term_starts, post_docs, post_tf, post_ni, post_lens, pos_starts, positions,
    spans_b,                    # int32[B, MAXTOK, 2] per-row token spans
    field_boost, avgdl, nfd,    # f32[] global info
    # committed vectors (dummies when mode == "fulltext")
    vecs, vec_docs, vec_valid, queries,   # queries f32[B, D] normalized
    # masks/filters (shared by the whole batch — the batcher keys on them)
    alive_mask,
    nf_vals, nf_docs, nf_valid,
    nf_lo, nf_hi, nf_lx, nf_hx,
    *,
    n_docs: int,
    k: int,
    fusion: str,       # "rrf" | "minmax"
    nf: str,           # "none" | "range" | "eq"
    masked: bool,
    mode: str,         # "hybrid" | "fulltext" | "vector"
    g_budget: int,     # static posting budget for the whole group
):
    """Batched one-dispatch serving program (the micro-batcher's B>1 shape
    families): per-row span BM25 + one corpus matmul for all B queries +
    fusion + top-k, a single XLA dispatch per posting-bucket group. Rows
    are non-phrase by construction (read_side._batchable routes phrase
    queries to the single-query docmajor kernel). Results are
    row-for-row identical to the separate batch kernels
    (bm25_scores_from_spans_batch / brute_force_scores_batch + vmapped
    fusion + top_k): the constituent kernels are called inside one trace.

    Returns (vals f32[B, k], ids int32[B, k], counts int32[B]).
    """
    if nf == "range":
        m = filter_ops.number_range_mask(
            nf_vals, nf_docs, nf_valid, nf_lo, nf_hi, nf_lx, nf_hx,
            n_docs=n_docs,
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    elif nf == "eq":
        m = filter_ops.number_eq_mask(
            nf_vals, nf_docs, nf_valid, nf_lo, n_docs=n_docs
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    else:
        mask = alive_mask
    if mode != "vector":
        ft = bm25_ops.bm25_scores_from_spans_batch(
            term_starts, post_docs, post_tf, post_ni, post_lens,
            pos_starts, positions,
            spans_b, field_boost, mask, avgdl, nfd,
            n_docs=n_docs, g_budget=g_budget, pp_budget=1, phrase=False,
            masked=masked,
        )                                                   # [B, n_docs]
    if mode != "fulltext":
        vec = vector_ops.brute_force_scores_batch(
            vecs, vec_docs, vec_valid, queries, mask, n_docs=n_docs
        )                                                   # [B, n_docs]
    if mode == "fulltext":
        fused = ft
    elif mode == "vector":
        fused = vec
    else:
        if fusion == "rrf":
            # candidate-exact RRF per row; lax.map (not vmap) keeps the
            # [2c, n_docs] rank-compare intermediate per-row instead of
            # materializing a [B, 2c, n_docs] batch of them
            from .fusion import rrf_candidate_count, rrf_fuse_topk

            cand = rrf_candidate_count(k)
            vals, idx, counts = jax.lax.map(
                lambda fv: rrf_fuse_topk(fv[0], fv[1], k, cand), (ft, vec)
            )
            return vals, idx.astype(jnp.int32), counts.astype(jnp.int32)
        fused = jax.vmap(minmax_fuse)(ft, vec)
    vals, idx = jax.lax.top_k(fused, k)
    counts = jnp.sum(fused > 0, axis=-1).astype(jnp.int32)
    return vals, idx.astype(jnp.int32), counts
