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
from . import facets as facet_ops
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
      ph_bits                   commit-static group bits (windowed only)
      ph_spans, ph_boost        matched term-id ranges + user boost
    """
    (
        post_docs, post_tf, post_ni, post_lens, b_starts, b_valid,
        ba_idx, ba_lo, ba_hi, bm25_boost, avgdl, nfd,
        dense_rows, d_sel, d_w,
        ph_docs, ph_poss, ph_terms, ph_bounds, ph_wbase, ph_bits,
        ph_spans, ph_boost,
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
                interpret=interpret, bits=ph_bits,
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
        "n_docs", "k", "fusion", "filters", "facets", "masked", "mode",
        "bm25_pallas", "field_statics", "u_ft_n", "u_vec_n", "qdim",
        "interpret",
    ),
)
def hybrid_fused_topk_mf(
    # packed per-query staging: every SMALL host-built array (block plans,
    # phrase spans, dense selections, scalars, the query vector, window
    # scatter pairs) rides in ONE int32 + ONE float32 buffer, unpacked
    # in-trace at static offsets. Through a remote-device relay each
    # host->device transfer costs ~1.3 ms; the unpacked layout shipped
    # ~30 small arrays per query (~40 ms of pure transfer), the packed
    # one ships 2.
    ints, flts,
    # tuple of per-field DEVICE-CACHED arrays (no per-query transfers):
    # (post_docs, post_tf, post_ni, post_lens, dense_rows|None,
    #  ph_docs|None, ph_poss|None, ph_terms|None, ph_bounds|None,
    #  ph_wbase|None, ph_bits|None) — None prunes the subtree from the
    # jit signature
    fields,
    # committed vectors (device cache: vector_arrays; None in fulltext)
    vecs, vec_docs, vec_valid,
    # masks/filters (device-resident): alive mask + one device tuple per
    # filter — (vals, docs, valid) for number, (true_mask, has_mask) for
    # bool, (ids, docs, valid) for keyword
    alive_mask,
    filter_cols,
    # facet device columns, parallel to the ``facets`` static: (vals,
    # docs, valid) for number, (ids, docs, valid) for keyword,
    # (true_mask, has_mask) for bool — all commit-static device caches
    facet_cols=(),
    *,
    n_docs: int,
    k: int,
    fusion: str,       # "rrf" | "minmax"
    # tuple of (kind, n_wanted) per filter — kind in
    # ("range", "eq", "bool", "keyword"); n_wanted only for keyword
    filters,
    # tuple of (kind, n) per facet — ("number", n_ranges_padded) |
    # ("keyword", n_values) | ("bool", 0); counts ride the return value
    facets=(),
    masked: bool,      # multiply by the mask (where-filters or deletes)
    mode: str,         # "hybrid" | "fulltext" | "vector"
    bm25_pallas: bool,
    # tuple of per-field statics, parallel to ``fields``:
    # (n_blocks, phrase, dense, ph_windowed, ph_W, ph_wsub, n_sp, n_dsel)
    field_statics,
    u_ft_n: int,       # string freshness-window scatter length (0 = none)
    u_vec_n: int,      # vector freshness-window scatter length (0 = none)
    qdim: int,         # query vector length in flts (0 in fulltext)
    interpret: bool = False,
):
    """Multi-string-field fused serving with live freshness windows: the
    whole query — per-field BM25 (+dense rows, +phrase) summed across
    fields, host-scattered window contributions, filter mask, vector
    matmul, fusion, top-k — in ONE dispatch + TWO small uploads.
    Bit-identical to the multi-dispatch chain (search_fulltext's
    per-field loop + _scatter_add_scores window merge; the reference's
    per-field loop is collection.rs:903-955).

    Staging layout (all lengths static via field_statics/u_*_n/qdim):
      ints: per field [plan: 3*nb aligned (Pallas) | 2*nb unaligned],
            [spans n_sp*2 if phrase], [d_sel n_dsel if dense];
            then [u_ft_idx u_ft_n], [u_vec_idx u_vec_n]
      flts: per field [bm25_boost, avgdl, nfd, ph_boost],
            [d_w n_dsel if dense];
            then per filter [lo, hi, lx, hx] (range/eq) | [want] (bool)
            | [wanted ids n_wanted, pad -1] (keyword);
            then per number facet [lows n, highs n] (pad ranges are
            [+inf, -inf] so they count zero and drop host-side);
            then [query qdim], [u_ft_vals u_ft_n], [u_vec_vals u_vec_n]

    Facets (the reference recomputes filters per facet,
    collection.rs:1004-1126; here they are segment reductions over the
    in-trace matched mask): the 4th return element is one int32 count
    array per ``facets`` entry — [n_ranges] (number), [n_values]
    (keyword), [2] = (true, false) (bool). The matched mask is
    (ft > 0) | (vec > 0) on the post-mask scores, exactly
    facet_ops.matched_mask of the multi-dispatch path's dense scores in
    every mode/fusion (RRF and minmax both zero unmatched docs).

    Window-merge semantics: string window scores already include boost +
    idf (no phrase in the window — uncommitted/string.rs:124-193); vector
    window scores are summed relu-cosines. Both are added UNMASKED and
    masked in-trace, which distributes identically to the multi-dispatch
    path's host-side mask skip."""
    ic = [0]
    fc = [0]

    def take_i(n):
        v = jax.lax.slice(ints, (ic[0],), (ic[0] + n,))
        ic[0] += n
        return v

    def take_f(n):
        v = jax.lax.slice(flts, (fc[0],), (fc[0] + n,))
        fc[0] += n
        return v

    z1 = jnp.zeros(1, jnp.int32)
    per_field = []
    for (fdev, fstat) in zip(fields, field_statics):
        nb, phrase, dense, ph_windowed, ph_W, ph_wsub, n_sp, n_dsel = fstat
        (post_docs, post_tf, post_ni, post_lens, dense_rows,
         ph_docs, ph_poss, ph_terms, ph_bounds, ph_wbase, ph_bits) = fdev
        if bm25_pallas:
            ba_idx, ba_lo, ba_hi = take_i(nb), take_i(nb), take_i(nb)
            b_starts = b_valid = z1
        else:
            b_starts, b_valid = take_i(nb), take_i(nb)
            ba_idx = ba_lo = ba_hi = z1
        ph_spans = (
            take_i(n_sp * 2).reshape(n_sp, 2)
            if phrase else jnp.zeros((1, 2), jnp.int32)
        )
        d_sel = take_i(n_dsel) if dense else z1
        per_field.append((
            post_docs, post_tf, post_ni, post_lens,
            b_starts, b_valid, ba_idx, ba_lo, ba_hi,
            dense_rows, d_sel, ph_spans,
            ph_docs, ph_poss, ph_terms, ph_bounds, ph_wbase, ph_bits,
        ))
    u_ft_idx = take_i(u_ft_n) if u_ft_n else None
    u_vec_idx = take_i(u_vec_n) if u_vec_n else None

    flt_field = []
    for fstat in field_statics:
        dense, n_dsel = fstat[2], fstat[7]
        scalars = take_f(4)
        d_w = take_f(n_dsel) if dense else jnp.zeros(1, jnp.float32)
        flt_field.append((scalars, d_w))
    filter_params = []
    for kind, n_wanted in filters:
        if kind in ("range", "eq"):
            filter_params.append(take_f(4))
        elif kind == "bool":
            filter_params.append(take_f(1))
        else:  # keyword
            filter_params.append(take_f(n_wanted))
    facet_params = []
    for kind, n in facets:
        facet_params.append(
            (take_f(n), take_f(n)) if kind == "number" else None
        )
    query = take_f(qdim) if qdim else None
    u_ft_vals = take_f(u_ft_n) if u_ft_n else None
    u_vec_vals = take_f(u_vec_n) if u_vec_n else None

    mask = alive_mask
    for (kind, _nw), cols, fp in zip(filters, filter_cols, filter_params):
        if kind == "range":
            m = filter_ops.number_range_mask(
                cols[0], cols[1], cols[2],
                fp[0], fp[1], fp[2] > 0, fp[3] > 0, n_docs=n_docs,
            )
        elif kind == "eq":
            m = filter_ops.number_eq_mask(
                cols[0], cols[1], cols[2], fp[0], n_docs=n_docs
            )
        elif kind == "bool":
            true_mask, has_mask = cols
            m = jnp.where(
                fp[0] > 0, true_mask, has_mask * (1.0 - true_mask)
            )
        else:  # keyword value-set
            m = filter_ops.value_set_mask(
                cols[0], cols[1], cols[2], fp, n_docs=n_docs
            )
        mask = filter_ops.combine_masks(mask, m)
    if mode != "vector":
        ft = jnp.zeros((n_docs,), jnp.float32)
        for pf, fstat, (scalars, d_w) in zip(
            per_field, field_statics, flt_field
        ):
            nb, phrase, dense, ph_windowed, ph_W, ph_wsub, n_sp, n_dsel = (
                fstat
            )
            (post_docs, post_tf, post_ni, post_lens,
             b_starts, b_valid, ba_idx, ba_lo, ba_hi,
             dense_rows, d_sel, ph_spans,
             ph_docs, ph_poss, ph_terms, ph_bounds, ph_wbase, ph_bits) = pf
            fargs = (
                post_docs, post_tf, post_ni, post_lens, b_starts, b_valid,
                ba_idx, ba_lo, ba_hi,
                scalars[0], scalars[1], scalars[2],
                dense_rows, d_sel, d_w,
                ph_docs, ph_poss, ph_terms, ph_bounds, ph_wbase, ph_bits,
                ph_spans, scalars[3],
            )
            ft = ft + _field_fulltext_score(
                fargs, (nb, phrase, dense, ph_windowed, ph_W, ph_wsub),
                n_docs=n_docs, bm25_pallas=bm25_pallas, interpret=interpret,
            )
        if u_ft_n:
            ft = ft.at[u_ft_idx].add(u_ft_vals)
        if masked:
            ft = ft * mask
    if mode != "fulltext":
        q8 = jnp.zeros((8, qdim), jnp.float32).at[0].set(query)
        sims8 = jnp.dot(
            vecs, q8.T.astype(vecs.dtype), preferred_element_type=jnp.float32
        )                                                   # [P, 8]
        sims = jnp.maximum(sims8[:, 0], 0.0) * vec_valid
        vec = jax.ops.segment_sum(sims, vec_docs, num_segments=n_docs)
        if u_vec_n:
            vec = vec.at[u_vec_idx].add(u_vec_vals)
        vec = vec * mask
    def facet_counts(matched):
        outs = []
        for (kind, n), cols, fp in zip(facets, facet_cols, facet_params):
            if kind == "number":
                outs.append(facet_ops.number_facet_counts(
                    cols[0], cols[1], cols[2], fp[0], fp[1], matched,
                    n_docs=n_docs,
                ))
            elif kind == "keyword":
                outs.append(facet_ops.keyword_facet_counts(
                    cols[0], cols[1], cols[2], matched, n_values=n
                ))
            else:  # bool
                outs.append(facet_ops.bool_facet_counts(
                    cols[0], cols[1], matched
                ))
        return tuple(outs)

    if mode == "fulltext":
        fused = ft
        matched = (ft > 0)
    elif mode == "vector":
        fused = vec
        matched = (vec > 0)
    else:
        matched = (ft > 0) | (vec > 0)
        if fusion == "rrf":
            # candidate-exact RRF: no dense argsorts (31.6 -> ~5 ms at 1M)
            from .fusion import rrf_candidate_count, rrf_fuse_topk

            vals, idx, count = rrf_fuse_topk(
                ft, vec, k, rrf_candidate_count(k)
            )
            return vals, idx, count, facet_counts(matched.astype(jnp.float32))
        fused = minmax_fuse(ft, vec)
    vals, idx = jax.lax.top_k(fused, k)
    count = jnp.sum(fused > 0).astype(jnp.int32)
    return (
        vals, idx.astype(jnp.int32), count,
        facet_counts(matched.astype(jnp.float32)),
    )


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
