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
        "vmode", "v_statics", "interpret",
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
    # committed vector layout: "exact" scores via the full bf16 matmul
    # (vecs/vec_docs/vec_valid); the ANN modes ride their own committed
    # structures through ``v_ann`` and scatter candidate scores into the
    # dense array — exactly _committed_vector_scores' dispatch
    # (engine/collection_read.py), called inside this trace
    vmode: str = "exact",   # "exact" | "int8" | "ivf_pq" | "ivf" | "pq"
    # per-mode statics: ivf_pq (nprobe, cand_k, expand, residual) |
    # ivf (nprobe, cand_k) | pq (cand_k,) | int8/exact ()
    v_statics: tuple = (),
    # per-mode device-cache tuple (None when exact; see the engine's
    # _fused_vector_args for the layouts)
    v_ann=None,
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
        if kind in ("range", "eq", "range_dense", "eq_dense"):
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
        if kind == "range_dense":
            m = filter_ops.number_range_mask_dense(
                cols[0], fp[0], fp[1], fp[2] > 0, fp[3] > 0
            )
        elif kind == "eq_dense":
            m = filter_ops.number_eq_mask_dense(cols[0], fp[0])
        elif kind == "range":
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
        elif kind == "keyword_dense":
            m = filter_ops.value_set_mask_dense(cols[0], fp)
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
        if vmode == "exact":
            q8 = jnp.zeros((8, qdim), jnp.float32).at[0].set(query)
            sims8 = jnp.dot(
                vecs, q8.T.astype(vecs.dtype),
                preferred_element_type=jnp.float32,
            )                                               # [P, 8]
            sims = jnp.maximum(sims8[:, 0], 0.0) * vec_valid
            if v_statics and v_statics[0]:
                # identity prefix (one vector per doc, insertion order —
                # the common committed layout, detected commit-static):
                # row i IS doc i, so the [P]->[n_docs] segment scatter is
                # a pad/slice. Scatter at 1M->1M costs ~10 ms device-side;
                # this is free. Padding rows are vec_valid-zeroed.
                p = sims.shape[0]
                vec = (
                    sims[:n_docs] if p >= n_docs
                    else jnp.pad(sims, (0, n_docs - p))
                )
            else:
                vec = jax.ops.segment_sum(
                    sims, vec_docs, num_segments=n_docs
                )
        elif vmode == "int8":
            from . import quant as quant_ops

            codes, scales, v_docs, v_valid = v_ann
            # mask rides in-trace below (mask is {0,1}: applying it here
            # AND after the window add is idempotent)
            vec = quant_ops.int8_brute_force_scores(
                codes, scales, v_docs, v_valid, query, mask, n_docs=n_docs
            )
        elif vmode == "ivf_pq":
            from . import ivf as ivf_ops

            codes, books, fvecs, cents, lists, lens, v_docs, rot = v_ann
            nprobe, cand_k, expand, residual = v_statics
            sims, rows = ivf_ops.ivf_pq_search(
                codes, books, fvecs, cents, lists, lens, query[None, :],
                nprobe=nprobe, k=cand_k, expand=expand,
                residual=residual, rotation=rot,
            )
            vec = jnp.zeros((n_docs,), jnp.float32).at[v_docs[rows[0]]].add(
                jnp.maximum(sims[0], 0.0)
            )
        elif vmode == "ivf":
            from . import ivf as ivf_ops

            fvecs, cents, lists, lens, v_docs = v_ann
            nprobe, cand_k = v_statics
            sims, rows = ivf_ops.ivf_search(
                fvecs, cents, lists, lens, query[None, :],
                nprobe=nprobe, k=cand_k,
            )
            vec = jnp.zeros((n_docs,), jnp.float32).at[v_docs[rows[0]]].add(
                jnp.maximum(sims[0], 0.0)
            )
        else:  # "pq"
            from . import pq as pq_ops

            codes, books, fvecs, v_docs, v_valid, rot = v_ann
            (cand_k,) = v_statics
            sims, rows = pq_ops.pq_topk_rerank(
                codes, books, fvecs, v_valid, query[None, :],
                k=cand_k, expand=1, rotation=rot,
            )
            vec = jnp.zeros((n_docs,), jnp.float32).at[v_docs[rows[0]]].add(
                jnp.maximum(sims[0], 0.0)
            )
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
    from .fusion import dense_topk

    vals, idx = dense_topk(fused, k)  # tiered above c*1024 docs
    count = jnp.sum(fused > 0).astype(jnp.int32)
    return (
        vals, idx.astype(jnp.int32), count,
        facet_counts(matched.astype(jnp.float32)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_docs", "k", "fusion", "nf", "masked", "mode", "n_blocks", "b",
        "qdim", "dense", "bm25_pallas", "vec_identity", "interpret",
    ),
)
def hybrid_fused_topk_batch(
    # packed per-batch staging (ONE int32 + ONE float32 upload — see
    # hybrid_fused_topk_mf for why):
    #   ints: [plan: 3*nb aligned (Pallas) | 2*nb unaligned], [row_id nb]
    #         (mode != "vector" only)
    #   flts: [boost, avgdl, nfd], [nf lo, hi, lx, hx if nf != none],
    #         [W b*H row-major if dense], [queries b*qdim if mode !=
    #         fulltext]
    ints, flts,
    # committed postings planes (device cache: string_arrays; dummies
    # when mode == "vector")
    post_docs, post_tf, post_ni, post_lens,
    # Zipf-head dense g rows [H, n_docs] (cache: dense_term_rows; dummy
    # when not dense)
    dense_rows,
    # committed vectors (dummies when mode == "fulltext")
    vecs, vec_docs, vec_valid,
    # masks/filters (shared by the whole batch — the batcher keys on them)
    alive_mask,
    nf_vals, nf_docs, nf_valid,
    *,
    n_docs: int,
    k: int,
    fusion: str,       # "rrf" | "minmax"
    nf: str,           # "none" | "range" | "eq"
    masked: bool,
    mode: str,         # "hybrid" | "fulltext" | "vector"
    n_blocks: int,     # combined block-plan bucket for the WHOLE batch
    b: int,            # padded batch rows
    qdim: int,         # query vector length (0 when mode == "fulltext")
    dense: bool,       # Zipf-head dense rows ride a [b, H] weight matmul
    bm25_pallas: bool,
    vec_identity: bool = False,  # vec_docs is an identity prefix
    interpret: bool = False,
):
    """Batched one-dispatch serving with the SAME fast primitives as the
    single-query fused program: ONE combined aligned block plan across all
    rows (each block carries a row id; the scan output scatters into
    [b * n_docs] segments in one pass — total work is the batch's total
    real blocks, never a per-row budget times b), Zipf-head terms as a
    [b, H] @ [H, n_docs] MXU matmul of per-row idf weights against the
    commit-static dense rows, one corpus matmul for all b query vectors,
    per-row fusion + top-k. Replaces the span-gather batch program whose
    fine-grained gathers ran at ~0.4 GB/s and inverted the throughput
    story at 1M docs (batch-32 fulltext served 10.4 QPS vs 27.5
    sequential — VERDICT r4). Rows are non-phrase by construction
    (read_side._batchable routes phrase queries to the single-query
    docmajor kernel).

    Returns (vals f32[b, k], ids int32[b, k], counts int32[b]).
    """
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

    scalars = take_f(3)
    boost, avgdl, nfd = scalars[0], scalars[1], scalars[2]
    if nf == "range_dense":
        fp = take_f(4)
        m = filter_ops.number_range_mask_dense(
            nf_vals, fp[0], fp[1], fp[2] > 0, fp[3] > 0
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    elif nf == "eq_dense":
        fp = take_f(4)
        m = filter_ops.number_eq_mask_dense(nf_vals, fp[0])
        mask = filter_ops.combine_masks(alive_mask, m)
    elif nf == "range":
        fp = take_f(4)
        m = filter_ops.number_range_mask(
            nf_vals, nf_docs, nf_valid, fp[0], fp[1], fp[2] > 0, fp[3] > 0,
            n_docs=n_docs,
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    elif nf == "eq":
        fp = take_f(4)
        m = filter_ops.number_eq_mask(
            nf_vals, nf_docs, nf_valid, fp[0], n_docs=n_docs
        )
        mask = filter_ops.combine_masks(alive_mask, m)
    else:
        mask = alive_mask
    if mode != "vector":
        if bm25_pallas:
            ba_idx, ba_lo, ba_hi = (
                take_i(n_blocks), take_i(n_blocks), take_i(n_blocks)
            )
            row_id = take_i(n_blocks)
            contrib, docs_o = bm25_ops.bm25_blocked_contrib_pallas(
                post_docs, post_tf, post_ni, post_lens,
                ba_idx, ba_lo, ba_hi, boost, avgdl, nfd,
                n_blocks=n_blocks, interpret=interpret,
            )
        else:
            b_starts, b_valid = take_i(n_blocks), take_i(n_blocks)
            row_id = take_i(n_blocks)
            contrib, docs_o = bm25_ops.bm25_blocked_contrib(
                post_docs, post_tf, post_ni, post_lens, b_starts, b_valid,
                boost, avgdl, nfd, n_blocks=n_blocks,
            )
        # pad blocks carry zero contrib and row_id 0: they scatter zeros
        seg = docs_o.reshape(n_blocks, -1) + row_id[:, None] * n_docs
        ft = jax.ops.segment_sum(
            contrib.reshape(-1), seg.reshape(-1), num_segments=b * n_docs
        ).reshape(b, n_docs)
        if dense:
            h = dense_rows.shape[0]
            w = take_f(b * h).reshape(b, h)
            ft = ft + boost * jnp.dot(
                w, dense_rows, preferred_element_type=jnp.float32
            )
        if masked:
            ft = ft * mask[None, :]
    if mode != "fulltext":
        queries = take_f(b * qdim).reshape(b, qdim)
        vec = vector_ops.brute_force_scores_batch(
            vecs, vec_docs, vec_valid, queries, mask, n_docs=n_docs,
            identity=vec_identity,
        )                                                   # [b, n_docs]
    if mode == "fulltext":
        fused = ft
    elif mode == "vector":
        fused = vec
    else:
        if fusion == "rrf":
            # candidate-exact RRF: batched candidate top-k, per-row rank
            # compare (ops/fusion.rrf_fuse_topk_batch)
            from .fusion import rrf_candidate_count, rrf_fuse_topk_batch

            vals, idx, counts = rrf_fuse_topk_batch(
                ft, vec, k, rrf_candidate_count(k)
            )
            return vals, idx.astype(jnp.int32), counts.astype(jnp.int32)
        fused = jax.vmap(minmax_fuse)(ft, vec)
    from .fusion import dense_topk

    vals, idx = dense_topk(fused, k)  # same selector as the single path
    counts = jnp.sum(fused > 0, axis=-1).astype(jnp.int32)
    return vals, idx.astype(jnp.int32), counts
