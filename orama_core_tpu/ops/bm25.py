"""BM25 scoring over CSR-packed posting lists — the device hot path.

TPU-native replacement for the reference's per-posting scoring loops
(`committed/string.rs:302-479`, `dto/bm25.rs:53-71`). The inverted index is
packed as flat arrays in HBM:

    post_docs : int32[P]   document id of each posting
    post_tf   : float32[P] term frequency (occurrences in the field)
    doc_lens  : float32[Npad] field length per document (0 => doc lacks field)

A query resolves (host-side, via the sorted term dictionary) to a flat
``gather_idx`` of posting slots plus a per-slot ``idf`` (the idf of the term
the slot belongs to, with the BM25 idf ``ln1p((N - ni + 0.5)/(ni + 0.5))``
precomputed on host — it is O(#matched terms), tiny). The device then:

    gather postings -> compute BM25 -> scatter-add into dense scores[Npad]

Dense per-doc score arrays are the core layout decision: filters become
multiplicative masks, facets become masked segment-sums, hybrid fusion is
elementwise — everything composes without hash maps (SURVEY.md §7).

Scoring matches the reference formula exactly (k=1.2, b=0.75):
    idf * tf * (k + 1) / (tf + k * (1 - b + b * len/avgdl))
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

K1 = 1.2
B = 0.75


@functools.partial(jax.jit, static_argnames=("n_docs",), donate_argnums=())
def bm25_scores(
    post_docs: jax.Array,      # int32[P] full posting array (device-resident)
    post_tf: jax.Array,        # float32[P]
    doc_lens: jax.Array,       # float32[Npad]
    gather_idx: jax.Array,     # int32[G] posting slots to score (padded)
    idf: jax.Array,            # float32[G] idf of the owning term (0 => pad)
    boost_by_doc: jax.Array,   # float32[Npad] per-doc boost (phrase/user)
    filter_mask: jax.Array,    # float32[Npad] 1.0 = keep (filters ∧ alive)
    avgdl: jax.Array,          # float32[] average field length
    n_docs: int,
) -> jax.Array:
    """Returns float32[n_docs] accumulated BM25 scores."""
    docs = post_docs[gather_idx]
    tf = post_tf[gather_idx]
    lens = doc_lens[docs]
    denom = tf + K1 * (1.0 - B + B * lens / jnp.maximum(avgdl, 1e-9))
    contrib = idf * tf * (K1 + 1.0) / jnp.maximum(denom, 1e-9)
    contrib = contrib * filter_mask[docs] * boost_by_doc[docs]
    # segment_sum, not scatter-add: XLA's TPU scatter with duplicate indices
    # serializes (~283 ms at 4M->1M); segment_sum runs at ~34 ms (8x)
    return jax.ops.segment_sum(contrib, docs, num_segments=n_docs)


@functools.partial(jax.jit, static_argnames=("n_docs",))
def phrase_boost_by_doc(
    pos_docs: jax.Array,    # int32[Gp] doc id of each matched (doc, position)
    pos_vals: jax.Array,    # int32[Gp] position value (pad slots: doc=n_docs-1? no: valid flag)
    valid: jax.Array,       # float32[Gp] 1.0 for real entries
    user_boost: jax.Array,  # float32[] field-level user boost
    n_docs: int,
) -> jax.Array:
    """Per-doc phrase boost for multi-token queries.

    Mirrors `search_with_phrase_match` (committed/string.rs:367-479): for each
    candidate doc, let ``anyorder`` = number of *distinct* positions covered by
    any query term and ``sequences`` = number of adjacent (+1) pairs among
    those positions; the boost applied to every BM25 contribution of that doc
    is ``anyorder + 2*sequences + user_boost``.

    (The reference's window filter `(second - first) < 1` can never fire on
    deduped sorted positions — an upstream no-op bug; the intended `== 1`
    adjacency is implemented here.)

    Device algorithm: lexicographic sort of (doc, pos) pairs, neighbor
    compares for dedup/adjacency, scatter-add segment counts. Sorting keeps
    everything static-shape — no hash sets.
    """
    # Push padding entries to the end of the sort order.
    big = jnp.int32(2**30)
    docs_k = jnp.where(valid > 0, pos_docs, big)
    pos_k = jnp.where(valid > 0, pos_vals, big)
    docs_s, pos_s = jax.lax.sort((docs_k, pos_k), num_keys=2)

    same_doc = docs_s[1:] == docs_s[:-1]
    dup = same_doc & (pos_s[1:] == pos_s[:-1])
    adj = same_doc & (pos_s[1:] == pos_s[:-1] + 1)

    is_real = (docs_s < big).astype(jnp.float32)
    # distinct positions: first occurrence of each (doc, pos)
    distinct = jnp.concatenate(
        [is_real[:1], jnp.logical_not(dup).astype(jnp.float32) * is_real[1:]]
    )
    safe_docs = jnp.where(docs_s < big, docs_s, 0)
    anyorder = jax.ops.segment_sum(
        distinct * (docs_s < big), safe_docs, num_segments=n_docs
    )
    seq = jax.ops.segment_sum(
        adj.astype(jnp.float32), safe_docs[1:], num_segments=n_docs
    )

    matched = anyorder > 0
    boost = jnp.where(matched, anyorder + 2.0 * seq + user_boost, 0.0)
    # Docs with no positional match keep plain user boost (single-term terms
    # can still score them); matched docs get the phrase boost.
    return jnp.where(matched, boost, user_boost)


@functools.partial(
    jax.jit,
    static_argnames=("n_docs", "g_budget", "pp_budget", "phrase", "masked"),
)
def bm25_scores_from_spans(
    term_starts: jax.Array,    # int32[T+1] CSR offsets (device-resident)
    post_docs: jax.Array,      # int32[Ppad]
    post_tf: jax.Array,        # float32[Ppad]
    post_ni: jax.Array,        # float32[Ppad] owning term's doc-frequency
    post_lens: jax.Array,      # float32[Ppad] owning doc's field length
    pos_starts: jax.Array,     # int32[Ppad+1] (phrase only; pass post slice)
    positions: jax.Array,      # int32[PPpad]  (phrase only)
    spans: jax.Array,          # int32[MAXTOK, 2] term-id [lo, hi) per token
    field_boost: jax.Array,    # float32[]
    filter_mask: jax.Array,    # float32[Npad]
    avgdl: jax.Array,          # float32[]
    n_field_docs: jax.Array,   # float32[] N for idf
    n_docs: int,
    g_budget: int,             # static posting budget (host picks bucket)
    pp_budget: int,            # static positions budget (phrase only)
    phrase: bool,
    masked: bool = True,       # False => skip the filter gather entirely
    phrase_spans: "jax.Array" = None,  # int32[MAXTOK, 2]: spans whose
    # positions feed the phrase boost (surface spans only — stems score
    # BM25 but never drive adjacency); defaults to ``spans``
) -> jax.Array:
    """Span-resolved BM25: the host ships only per-token term-id ranges
    (prefix search on the sorted dictionary gives *contiguous* spans).

    Per-posting ``ni`` (term doc-frequency) and ``post_lens`` (doc field
    length) are precomputed at commit — they are commit-static, while N and
    avgdl (which mix in the uncommitted window, collection.rs:930-951) stay
    runtime scalars, so scoring is exact. This removes the query-time
    searchsorted (~430 ms at a 4.2M budget) and the random doc_lens gather
    (~250 ms) measured on v5e; what remains is near-contiguous gathers +
    one segment_sum."""
    p_lo = term_starts[spans[:, 0]]
    p_hi = term_starts[spans[:, 1]]
    lens = (p_hi - p_lo).astype(jnp.int32)              # [MAXTOK]
    offs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lens)[:-1]])
    total = jnp.sum(lens)
    # gather_idx[j] = p_lo[k] + (j - offs[k]) for the k owning output slot j
    shift = jnp.repeat(p_lo - offs, lens, total_repeat_length=g_budget)
    gather_idx = shift + jnp.arange(g_budget, dtype=jnp.int32)
    valid = (jnp.arange(g_budget) < total).astype(jnp.float32)
    gather_idx = jnp.clip(gather_idx, 0, post_docs.shape[0] - 1)

    ni = post_ni[gather_idx]
    idf = jnp.log1p(
        jnp.maximum((n_field_docs - ni + 0.5) / (ni + 0.5), 0.0)
    ) * valid

    if phrase:
        # positions of a token's postings are contiguous too: use the same
        # span trick in position space for the phrase-boost inputs
        if phrase_spans is None:
            ph_p_lo, ph_p_hi = p_lo, p_hi
        else:
            ph_p_lo = term_starts[phrase_spans[:, 0]]
            ph_p_hi = term_starts[phrase_spans[:, 1]]
        pp_lo = pos_starts[ph_p_lo]
        pp_hi = pos_starts[ph_p_hi]
        plens = (pp_hi - pp_lo).astype(jnp.int32)
        poffs = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(plens)[:-1]])
        ptotal = jnp.sum(plens)
        pshift = jnp.repeat(pp_lo - poffs, plens, total_repeat_length=pp_budget)
        p_idx = pshift + jnp.arange(pp_budget, dtype=jnp.int32)
        p_valid = (jnp.arange(pp_budget) < ptotal).astype(jnp.float32)
        p_idx = jnp.clip(p_idx, 0, positions.shape[0] - 1)
        owning_post = (
            jnp.searchsorted(pos_starts, p_idx, side="right").astype(jnp.int32) - 1
        )
        p_doc = post_docs[jnp.clip(owning_post, 0, post_docs.shape[0] - 1)]
        boost_by_doc = phrase_boost_by_doc(
            p_doc, positions[p_idx], p_valid, field_boost, n_docs
        )
        docs = post_docs[gather_idx]
        tf = post_tf[gather_idx]
        lens_g = post_lens[gather_idx]
        denom = tf + K1 * (1.0 - B + B * lens_g / jnp.maximum(avgdl, 1e-9))
        contrib = idf * tf * (K1 + 1.0) / jnp.maximum(denom, 1e-9)
        contrib = contrib * boost_by_doc[docs]
        if masked:
            contrib = contrib * filter_mask[docs]
        return jax.ops.segment_sum(contrib, docs, num_segments=n_docs)

    docs = post_docs[gather_idx]
    tf = post_tf[gather_idx]
    lens_g = post_lens[gather_idx]
    denom = tf + K1 * (1.0 - B + B * lens_g / jnp.maximum(avgdl, 1e-9))
    contrib = idf * field_boost * tf * (K1 + 1.0) / jnp.maximum(denom, 1e-9)
    if masked:
        contrib = contrib * filter_mask[docs]
    return jax.ops.segment_sum(contrib, docs, num_segments=n_docs)


@functools.partial(
    jax.jit,
    static_argnames=("n_docs", "g_budget", "pp_budget", "phrase", "masked"),
)
def bm25_scores_from_spans_batch(
    term_starts, post_docs, post_tf, post_ni, post_lens, pos_starts, positions,
    spans_b,        # int32[B, MAXTOK, 2]
    field_boost, filter_mask, avgdl, n_field_docs,
    n_docs: int, g_budget: int, pp_budget: int, phrase: bool,
    masked: bool = True,
    phrase_spans_b=None,  # int32[B, MAXTOK, 2] surface-only spans (phrase)
):
    """[B, n_docs] — vmapped span scoring for coalesced query batches
    (server/batcher.py): index arrays broadcast, spans vary per query."""
    if phrase_spans_b is None:
        return jax.vmap(
            lambda spans: bm25_scores_from_spans(
                term_starts, post_docs, post_tf, post_ni, post_lens,
                pos_starts, positions,
                spans, field_boost, filter_mask, avgdl, n_field_docs,
                n_docs=n_docs, g_budget=g_budget, pp_budget=pp_budget,
                phrase=phrase, masked=masked,
            )
        )(spans_b)
    return jax.vmap(
        lambda spans, ph_spans: bm25_scores_from_spans(
            term_starts, post_docs, post_tf, post_ni, post_lens,
            pos_starts, positions,
            spans, field_boost, filter_mask, avgdl, n_field_docs,
            n_docs=n_docs, g_budget=g_budget, pp_budget=pp_budget,
            phrase=phrase, masked=masked, phrase_spans=ph_spans,
        )
    )(spans_b, phrase_spans_b)


BLOCK = 1024  # posting block for the sliced scoring path

# Static block-count buckets for the scan plans. The scan reads (and pays
# for) the WHOLE bucket, so ladder tightness is scan efficiency: the old
# x16 ladder (16, 256, 4096, 65536) made a 1M-posting query (~1000 blocks)
# scan a 4096-block bucket — 4.2x the real work, the dominant share of the
# measured 22 ms BM25 stage at 1M. x2 steps from 1024 up cap the waste at
# 2x exactly where scans are big enough to matter; below 1024 blocks the
# scan is a few ms and fewer program variants win.
PLAN_BUCKETS = (16, 64, 256, 1024, 2048, 4096, 8192, 16384, 32768, 65536)


def build_block_plan(p_lo, p_len, n_blocks_budget: int):
    """Host: align each token's posting span to BLOCK multiples and emit
    per-block (source start, valid length). Tiny arrays — O(blocks) ints.

    Returns (block_starts int32[nb], block_valid int32[nb]) padded to
    ``n_blocks_budget`` (pad blocks have valid 0 and start 0)."""
    import numpy as np

    starts = np.zeros(n_blocks_budget, np.int32)
    valid = np.zeros(n_blocks_budget, np.int32)
    b = 0
    for lo, ln in zip(p_lo, p_len):
        off = 0
        while off < ln and b < n_blocks_budget:
            starts[b] = lo + off
            valid[b] = min(BLOCK, ln - off)
            off += BLOCK
            b += 1
    return starts, valid


def build_block_plan_aligned(p_lo, p_len, n_blocks_budget: int):
    """BLOCK-aligned plan: each emitted block is a whole aligned BLOCK of
    the posting space (block index, not element offset), with the valid
    span given as in-block [lo_off, hi_off). Alignment lets a Pallas
    kernel DMA the block via a scalar-prefetched BlockSpec index (the
    vmapped unaligned dynamic_slice lowers to an XLA gather running at
    ~0.4 GB/s on TPU — the dominant cost of large BM25 scans).

    Returns (block_idx int32[nb], lo_off int32[nb], hi_off int32[nb]);
    pad blocks have hi_off == 0. Costs at most 1 extra block per span vs
    the unaligned plan."""
    import numpy as np

    blk_idx = np.zeros(n_blocks_budget, np.int32)
    lo_off = np.zeros(n_blocks_budget, np.int32)
    hi_off = np.zeros(n_blocks_budget, np.int32)
    b = 0
    for lo, ln in zip(p_lo, p_len):
        if ln <= 0:
            continue
        hi = lo + ln
        for blk in range(lo // BLOCK, (hi - 1) // BLOCK + 1):
            if b >= n_blocks_budget:
                return blk_idx, lo_off, hi_off
            blk_idx[b] = blk
            lo_off[b] = max(lo - blk * BLOCK, 0)
            hi_off[b] = min(hi - blk * BLOCK, BLOCK)
            b += 1
    return blk_idx, lo_off, hi_off


def aligned_blocks_needed(p_len_list) -> int:
    """Upper bound on aligned-plan blocks (one extra per span)."""
    return sum((ln + BLOCK - 1) // BLOCK + 1 for ln in p_len_list if ln > 0)


# TPU tiling: a (1, BLOCK) block fails the (8, 128) sublane/lane rule, so
# blocks are shaped (1, 8, BLOCK // 8) — sublane 8, lane BLOCK/8 (128 at
# BLOCK=1024).
_SUB8 = 8
_LANE = BLOCK // _SUB8


def _bm25_gather_kernel(
    sb_ref, lo_ref, hi_ref,            # scalar prefetch: plan
    par_ref,                           # [1, 4] f32: boost, avgdl, nfd
    docs_ref, tf_ref, ni_ref, plens_ref,   # [1, 8, BLOCK//8] planes
    contrib_ref, docs_out_ref,         # [1, 8, BLOCK//8] outputs
):
    import jax

    i = pl.program_id(0)
    # flat in-block position from (sublane, lane): row-major reshape order
    j = jax.lax.broadcasted_iota(
        jnp.int32, (1, _SUB8, _LANE), 1
    ) * _LANE + jax.lax.broadcasted_iota(jnp.int32, (1, _SUB8, _LANE), 2)
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


def bm25_blocked_contrib_pallas(
    post_docs: jax.Array,      # int32[Ppad], Ppad % BLOCK == 0
    post_tf: jax.Array,        # float32[Ppad]
    post_ni: jax.Array,        # float32[Ppad]
    post_lens: jax.Array,      # float32[Ppad]
    block_idx: jax.Array,      # int32[nb] aligned plan (block units)
    lo_off: jax.Array,         # int32[nb]
    hi_off: jax.Array,         # int32[nb]
    field_boost: jax.Array,    # float32[]
    avgdl: jax.Array,          # float32[]
    n_field_docs: jax.Array,   # float32[]
    n_blocks: int,
    interpret: bool = False,
):
    """The Pallas block-gather scan WITHOUT the per-doc reduction: returns
    (contrib f32[nb, 8, BLOCK//8], docs int32[nb, 8, BLOCK//8]) so callers
    choose the segment space — bm25_scores_blocked_pallas reduces into
    [n_docs]; the batched serving program offsets docs by a per-block row
    id and reduces the whole batch into [B * n_docs] in one pass
    (trace-only helper; callers jit)."""
    from jax.experimental import pallas as _pl
    from jax.experimental.pallas import tpu as _pltpu

    p = post_docs.shape[0]
    assert p % BLOCK == 0, "pad posting arrays to a BLOCK multiple"
    rows = p // BLOCK
    d2 = post_docs.reshape(rows, _SUB8, _LANE)
    t2 = post_tf.reshape(rows, _SUB8, _LANE)
    n2 = post_ni.reshape(rows, _SUB8, _LANE)
    l2 = post_lens.reshape(rows, _SUB8, _LANE)
    params = jnp.stack(
        [field_boost, avgdl, n_field_docs, jnp.float32(0.0)]
    ).reshape(1, 4)

    def plane_spec():
        return _pl.BlockSpec(
            (1, _SUB8, _LANE), lambda i, sb, lo, hi: (sb[i], 0, 0)
        )

    grid_spec = _pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_blocks,),
        in_specs=[
            _pl.BlockSpec((1, 4), lambda i, sb, lo, hi: (0, 0)),
            plane_spec(), plane_spec(), plane_spec(), plane_spec(),
        ],
        out_specs=[
            _pl.BlockSpec(
                (1, _SUB8, _LANE), lambda i, sb, lo, hi: (i, 0, 0)
            ),
            _pl.BlockSpec(
                (1, _SUB8, _LANE), lambda i, sb, lo, hi: (i, 0, 0)
            ),
        ],
    )
    return _pl.pallas_call(
        _bm25_gather_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, _SUB8, _LANE), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, _SUB8, _LANE), jnp.int32),
        ],
        interpret=interpret,
    )(block_idx, lo_off, hi_off, params, d2, t2, n2, l2)


@functools.partial(
    jax.jit, static_argnames=("n_docs", "n_blocks", "interpret")
)
def bm25_scores_blocked_pallas(
    post_docs: jax.Array,      # int32[Ppad], Ppad % BLOCK == 0
    post_tf: jax.Array,        # float32[Ppad]
    post_ni: jax.Array,        # float32[Ppad]
    post_lens: jax.Array,      # float32[Ppad]
    block_idx: jax.Array,      # int32[nb] aligned plan (block units)
    lo_off: jax.Array,         # int32[nb]
    hi_off: jax.Array,         # int32[nb]
    field_boost: jax.Array,    # float32[]
    avgdl: jax.Array,          # float32[]
    n_field_docs: jax.Array,   # float32[]
    n_docs: int,
    n_blocks: int,
    interpret: bool = False,
) -> jax.Array:
    """BM25 posting scan with Pallas block gathers: the plan's block
    indices are scalar-prefetched, so each grid step DMAs its BLOCK at
    full bandwidth instead of XLA's fine-grained gather (measured ~23 ms
    for a 1M-posting scan via vmapped dynamic_slice vs ~ bandwidth-bound
    here). The per-doc reduction stays an XLA segment_sum (cheap: ~4 ms
    at 1M). Same contract as bm25_scores_blocked."""
    contrib, docs_o = bm25_blocked_contrib_pallas(
        post_docs, post_tf, post_ni, post_lens,
        block_idx, lo_off, hi_off,
        field_boost, avgdl, n_field_docs,
        n_blocks=n_blocks, interpret=interpret,
    )
    return jax.ops.segment_sum(
        contrib.reshape(-1), docs_o.reshape(-1), num_segments=n_docs
    )


def bm25_blocked_contrib(
    post_docs: jax.Array,      # int32[Ppad]
    post_tf: jax.Array,        # float32[Ppad]
    post_ni: jax.Array,        # float32[Ppad]
    post_lens: jax.Array,      # float32[Ppad]
    block_starts: jax.Array,   # int32[nb]
    block_valid: jax.Array,    # int32[nb]
    field_boost: jax.Array,    # float32[]
    avgdl: jax.Array,          # float32[]
    n_field_docs: jax.Array,   # float32[]
    n_blocks: int,
):
    """The block-sliced scan WITHOUT the per-doc reduction: returns
    (contrib f32[nb, BLOCK], docs int32[nb, BLOCK]) — see
    bm25_blocked_contrib_pallas for why callers pick the segment space
    (trace-only helper; callers jit)."""

    def slice_blocks(arr):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(arr, (s,), (BLOCK,))
        )(block_starts)  # [nb, BLOCK]

    docs = slice_blocks(post_docs)
    tf = slice_blocks(post_tf)
    ni = slice_blocks(post_ni)
    lens = slice_blocks(post_lens)
    inblock = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, BLOCK), 1)
    valid = (inblock < block_valid[:, None]).astype(jnp.float32)

    idf = jnp.log1p(
        jnp.maximum((n_field_docs - ni + 0.5) / (ni + 0.5), 0.0)
    )
    denom = tf + K1 * (1.0 - B + B * lens / jnp.maximum(avgdl, 1e-9))
    contrib = idf * field_boost * tf * (K1 + 1.0) / jnp.maximum(denom, 1e-9)
    return contrib * valid, docs


@functools.partial(jax.jit, static_argnames=("n_docs", "n_blocks"))
def bm25_scores_blocked(
    post_docs: jax.Array,      # int32[Ppad]
    post_tf: jax.Array,        # float32[Ppad]
    post_ni: jax.Array,        # float32[Ppad]
    post_lens: jax.Array,      # float32[Ppad]
    block_starts: jax.Array,   # int32[nb]
    block_valid: jax.Array,    # int32[nb]
    field_boost: jax.Array,    # float32[]
    avgdl: jax.Array,          # float32[]
    n_field_docs: jax.Array,   # float32[]
    n_docs: int,
    n_blocks: int,
) -> jax.Array:
    """Block-sliced BM25: posting spans are read as whole contiguous BLOCK
    slices (vmapped dynamic_slice => XLA gather with a BLOCK slice size —
    coarse sequential HBM reads) instead of per-element gathers. Measured
    on v5e this removes the ~380 ms of fine-grained gather a 4M-posting
    query pays in the span-gather path."""
    contrib, docs = bm25_blocked_contrib(
        post_docs, post_tf, post_ni, post_lens, block_starts, block_valid,
        field_boost, avgdl, n_field_docs, n_blocks=n_blocks,
    )
    # per-doc factors (filter mask, phrase boost) distribute over the sum:
    # callers multiply the dense result instead of gathering per posting
    return jax.ops.segment_sum(
        contrib.reshape(-1), docs.reshape(-1), num_segments=n_docs
    )


@functools.partial(jax.jit, static_argnames=("n_docs", "n_blocks"))
def phrase_boost_blocked(
    positions: jax.Array,      # int32[PPpad]
    pos_docs: jax.Array,       # int32[PPpad] owning doc per position (commit-static)
    pblock_starts: jax.Array,  # int32[nb] block plan over position space
    pblock_valid: jax.Array,   # int32[nb]
    user_boost: jax.Array,     # float32[]
    n_docs: int,
    n_blocks: int,
) -> jax.Array:
    """Blocked-read variant of phrase_boost_by_doc: position spans per token
    are contiguous, so (position, owning-doc) stream in as whole BLOCKs."""

    def slice_blocks(arr):
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(arr, (s,), (BLOCK,))
        )(pblock_starts)

    pos = slice_blocks(positions).reshape(-1)
    docs = slice_blocks(pos_docs).reshape(-1)
    inblock = jax.lax.broadcasted_iota(jnp.int32, (n_blocks, BLOCK), 1)
    valid = (inblock < pblock_valid[:, None]).astype(jnp.float32).reshape(-1)
    return phrase_boost_by_doc(docs, pos, valid, user_boost, n_docs)


PAD_DOC = 2**31 - 1  # sorts last; marks padding rows


def _phrase_group_flags(docs, poss, terms, spans):
    """Per-position phrase counters over the doc-major stream (shared by
    the cumsum and windowed reductions): ``anyc[e]`` is 1 at the first
    member of a (doc, pos) group containing a matched term, ``seqc[e]`` is
    1 when that group additionally follows a matched group at pos-1.
    Returns (anyc f32[PP], seqc f32[PP]); all the group logic is bounded
    shift-compares (group size <= 2 — tokenizer emits original + at most
    one distinct stem)."""
    pp = docs.shape[0]
    valid = docs < PAD_DOC

    # spans.shape[0] is static — unroll so XLA fuses the ORs into one pass
    matched = jnp.zeros((pp,), bool)
    for j in range(spans.shape[0]):
        matched = matched | ((terms >= spans[j, 0]) & (terms < spans[j, 1]))
    matched = matched & valid

    def shift_r(a, n, fill):
        return jnp.concatenate([jnp.full((n,), fill, a.dtype), a[:-n]])

    prev_doc = shift_r(docs, 1, -1)
    prev_pos = shift_r(poss, 1, -9)
    first = ((docs != prev_doc) | (poss != prev_pos)) & valid
    adj_key = (docs == prev_doc) & (poss == prev_pos + 1)

    next_doc = jnp.concatenate([docs[1:], jnp.full((1,), -2, docs.dtype)])
    next_pos = jnp.concatenate([poss[1:], jnp.full((1,), -9, poss.dtype)])
    next_same = (next_doc == docs) & (next_pos == poss)
    m_next = jnp.concatenate([matched[1:], jnp.zeros((1,), bool)])
    grp_any = matched | (next_same & m_next)    # at first: any match in my group

    m_prev = shift_r(matched, 1, False)
    m_prev2 = shift_r(matched, 2, False)
    first_prev = shift_r(first, 1, True)
    # previous group is {i-1} or {i-2, i-1} (group size <= 2)
    prev_grp_matched = m_prev | (~first_prev & m_prev2)

    anyc = (first & grp_any).astype(jnp.float32)
    seqc = (first & adj_key & grp_any & prev_grp_matched).astype(jnp.float32)
    return anyc, seqc


@jax.jit
def phrase_static_bits(docs: jax.Array, poss: jax.Array) -> jax.Array:
    """Commit-static per-position flag bits over the doc-major stream:
    bit 1 = first member of its (doc, pos) group, bit 2 = group follows
    pos-1 in the same doc, bit 4 = next element shares this (doc, pos),
    bit 8 = valid (not PAD). Query-time flags then touch only ``terms``
    (one matched pass + three 1-byte shifts) instead of re-deriving the
    group structure from three int32 streams on every query
    (measured 4.9 ms -> ~2 ms at 20M positions on v5e)."""
    valid = docs < PAD_DOC

    def shift_r(a, n, fill):
        return jnp.concatenate([jnp.full((n,), fill, a.dtype), a[:-n]])

    prev_doc = shift_r(docs, 1, -1)
    prev_pos = shift_r(poss, 1, -9)
    first = ((docs != prev_doc) | (poss != prev_pos)) & valid
    adj_key = (docs == prev_doc) & (poss == prev_pos + 1)
    next_doc = jnp.concatenate([docs[1:], jnp.full((1,), -2, docs.dtype)])
    next_pos = jnp.concatenate([poss[1:], jnp.full((1,), -9, poss.dtype)])
    next_same = (next_doc == docs) & (next_pos == poss)
    return (
        first.astype(jnp.uint8)
        + adj_key.astype(jnp.uint8) * 2
        + next_same.astype(jnp.uint8) * 4
        + valid.astype(jnp.uint8) * 8
    )


def _phrase_group_flags_bits(bits, terms, spans):
    """_phrase_group_flags from the commit-static bit stream: identical
    outputs, but the only query-dependent pass is the matched compare
    over ``terms`` plus three byte-wide shifts."""
    pp = terms.shape[0]
    valid = (bits & 8) > 0
    matched = jnp.zeros((pp,), bool)
    for j in range(spans.shape[0]):
        matched = matched | ((terms >= spans[j, 0]) & (terms < spans[j, 1]))
    matched = matched & valid

    def shift_r(a, n, fill):
        return jnp.concatenate([jnp.full((n,), fill, a.dtype), a[:-n]])

    first = (bits & 1) > 0
    adj_key = (bits & 2) > 0
    next_same = (bits & 4) > 0
    m_next = jnp.concatenate([matched[1:], jnp.zeros((1,), bool)])
    grp_any = matched | (next_same & m_next)
    m_prev = shift_r(matched, 1, False)
    m_prev2 = shift_r(matched, 2, False)
    first_prev = shift_r(first, 1, True)
    prev_grp_matched = m_prev | (~first_prev & m_prev2)
    anyc = (first & grp_any).astype(jnp.float32)
    seqc = (first & adj_key & grp_any & prev_grp_matched).astype(jnp.float32)
    return anyc, seqc


@functools.partial(jax.jit, static_argnames=("n_docs",))
def phrase_boost_docmajor(
    docs: jax.Array,        # int32[PPpad] owning doc per position, SORTED by (doc, pos); pad = PAD_DOC
    poss: jax.Array,        # int32[PPpad] position values (same order)
    terms: jax.Array,       # int32[PPpad] owning term id per position (same order)
    doc_bounds: jax.Array,  # int32[n_docs+1] CSR of each doc's run in the stream
    spans: jax.Array,       # int32[MAXTOK, 2] matched term-id ranges (pad: lo==hi)
    user_boost: jax.Array,  # float32[]
    n_docs: int,
) -> jax.Array:
    """Sort-free phrase boost over the commit-static doc-major position
    stream (VERDICT r1 item 5: the query-time (doc,pos) sort — ~100-200 ms
    at the 4M-pair bucket — replaced by one sort PER COMMIT plus a few
    bandwidth-bound scans per query).

    The stream holds EVERY position of the field sorted by (doc, pos); a
    query marks positions whose owning term falls in any matched span, then
    counts per doc: ``anyorder`` = (doc,pos) groups with >= 1 matched member
    (stem + original share a position — a group), ``sequences`` = adjacent
    matched groups at pos+1. Same semantics as phrase_boost_by_doc.

    A (doc, pos) group has AT MOST 2 members — the tokenizer emits the
    original term plus one stem only when it differs
    (nlp/tokenizer.py::tokenize_and_stem) — so all group logic is bounded
    shift-compares instead of cummax/cummin scans; the only scans left are
    the two counting cumsums read back through the per-doc CSR bounds.
    Measured at 1M docs / 20M positions on v5e: the scan formulation cost
    332 ms/query; this one is bandwidth-bound. One compiled program per
    commit, independent of query shape."""
    anyc, seqc = _phrase_group_flags(docs, poss, terms, spans)
    csa = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(anyc)])
    css = jnp.concatenate([jnp.zeros(1, jnp.float32), jnp.cumsum(seqc)])
    # doc bounds are contiguous (hi[d] == lo[d+1]), so ONE pair-gather at
    # the n_docs+1 boundary points + diff replaces four separate gathers —
    # XLA's TPU gather is the dominant stage cost (42 -> 21 ms at 1M docs)
    both = jnp.stack([csa, css], axis=-1)       # [PP+1, 2]
    at_bounds = both[doc_bounds]                # [n_docs+1, 2]
    d = jnp.diff(at_bounds, axis=0)
    anyorder = d[:, 0]                          # [n_docs]
    seq = d[:, 1]
    return jnp.where(anyorder > 0, anyorder + 2.0 * seq + user_boost, user_boost)


# ---------------------------------------------------------------------------
# Windowed phrase reduction (round-4 replacement for the cumsum + bounds-
# gather per-doc assembly in phrase_boost_docmajor).
#
# The doc-major stream is sorted by doc, so a block of _PH_PB consecutive
# positions spans only a small, COMMIT-STATIC range of doc ids (~PB/avgdl).
# That turns the per-doc reduction into dense window arithmetic:
#
#   stage 1  bin each 128-position sub-run into its own tiny doc window
#            (sub-run doc range <= Wsub) via an all-pairs compare — VPU
#            work is PP x Wsub instead of PP x n_docs;
#   stage 2  shift the 16 sub-run windows into the block's page-aligned
#            2W window (another small compare-sum) — both stages live in
#            VMEM inside one Pallas kernel, no scatter, no 20M cumsum,
#            no random gather;
#   stage 3  (XLA) combine the [nb, 2W] block windows into [n_docs] with
#            a page one-hot matmul — rows are W-aligned by construction,
#            so the combine is a well-shaped [P, nb2] x [nb2, 2W] MXU
#            matmul instead of a 1M-element scatter.
#
# Exactness: all counts are small integers accumulated in f32; the one-hot
# operands are 0/1. Degenerate corpora (a block spanning > W_CAP docs,
# i.e. very short documents) fall back to phrase_boost_docmajor — the
# cache layer decides per commit (phrase_window_meta returns None).
# Replaces the same reference behavior (committed/string.rs:367-479).
# ---------------------------------------------------------------------------

_PH_PB = 2048              # positions per Pallas grid block
_PH_SUB = 16               # sub-runs per block
_PH_SUBLEN = _PH_PB // _PH_SUB   # 128 (one lane tile)
_PH_W_CAP = 1024           # fall back beyond this block window
_PH_WSUB_CAP = 256


def phrase_window_meta(doc_bounds, pp: int, pp_pad: int):
    """Host: per-block aligned window bases + static window widths for the
    windowed phrase kernel, derived from the per-doc CSR ``doc_bounds``
    (``doc_bounds[d]`` = first stream slot of doc d; the sorted doc column
    itself is never materialized on host — owning doc of slot p is
    ``searchsorted(bounds, p, 'right') - 1``).

    Returns (w_base int32[nb] — W-aligned, 0 for all-pad blocks; W; Wsub)
    or None when the corpus is too doc-dense for the windowed path
    (W > _PH_W_CAP or Wsub > _PH_WSUB_CAP)."""
    import numpy as np

    if pp_pad % (_PH_PB * _PH_GRP) != 0 or pp <= 0:
        return None
    nb = pp_pad // _PH_PB

    def doc_of(p):
        return np.searchsorted(doc_bounds, p, side="right") - 1

    starts = np.arange(nb, dtype=np.int64) * _PH_PB
    live = starts < pp
    ends = np.minimum(starts + _PH_PB, pp) - 1
    first = np.where(live, doc_of(np.minimum(starts, pp - 1)), 0)
    last = np.where(live, doc_of(ends), 0)
    rng = (last - first + 1) * live
    W = int(rng.max()) if nb else 1
    W = max(((W + 127) // 128) * 128, 128)
    if W > _PH_W_CAP:
        return None

    nsub = pp_pad // _PH_SUBLEN
    s_starts = np.arange(nsub, dtype=np.int64) * _PH_SUBLEN
    s_live = s_starts < pp
    s_ends = np.minimum(s_starts + _PH_SUBLEN, pp) - 1
    s_first = np.where(s_live, doc_of(np.minimum(s_starts, pp - 1)), 0)
    s_last = np.where(s_live, doc_of(s_ends), 0)
    s_rng = (s_last - s_first + 1) * s_live
    wsub = int(s_rng.max()) if nsub else 1
    wsub = max(((wsub + 7) // 8) * 8, 8)
    if wsub > _PH_WSUB_CAP:
        return None
    # stage-2 compare lives in VMEM as (_PH_SUB*wsub, 2W) f32 — bound it
    if _PH_SUB * wsub * 2 * W * 4 > 4 * 1024 * 1024:
        return None

    w_base = ((first // W) * W * live).astype(np.int32)
    return w_base, W, wsub


# stream blocks handled per Pallas grid step: the output tile becomes a
# legal (8, 2W) block (sublane 8, lane 128k) without any sublane/lane
# reshape — Mosaic rejects shape casts that merge sublanes into lanes
# ("infer-vector-layout: unsupported shape cast"), so every kernel value
# is built in its final 3D layout from broadcasted iotas.
_PH_GRP = 8


# anyc/seqc ride ONE f32 as packed = anyc + _PH_PACK * seqc through both
# kernel stages: per-(block, window-lane) sums stay <= _PH_PB in each
# field, so max packed sum = 2048 + 4096*2048 < 2^24 — exact in f32.
# Halves the kernel's input streams and its stage-1/2 compute vs separate
# any/seq passes; the split happens right after the kernel, before the
# page combine (whose per-doc totals could overflow the 4096 field).
_PH_PACK = 4096.0


def _phrase_window_kernel(W: int, wsub: int):
    def kernel(wb_ref, docs_ref, pk_ref, pk_out):
        i = pl.program_id(0)
        wi3 = jax.lax.broadcasted_iota(
            jnp.int32, (_PH_SUB, wsub, _PH_SUBLEN), 1
        )
        wi2 = jax.lax.broadcasted_iota(jnp.int32, (_PH_SUB, wsub, 2 * W), 1)
        vi2 = jax.lax.broadcasted_iota(jnp.int32, (_PH_SUB, wsub, 2 * W), 2)
        for j in range(_PH_GRP):             # static unroll
            wb = wb_ref[i * _PH_GRP + j]
            rel3 = (docs_ref[j] - wb)[:, None, :]   # (SUB, 1, SUBLEN)
            # sorted stream => first doc of the sub-run is the min
            off3 = jnp.min(rel3, axis=2, keepdims=True)  # (SUB, 1, 1)
            # stage 1: bin each sub-run into its [off, off+wsub) window.
            # Pad elements have rel huge => rel-off >= wsub (or the whole
            # sub-run is pad: rel-off == 0 but contribs are 0).
            eq3 = (rel3 - off3) == wi3       # (SUB, wsub, SUBLEN)
            mini = jnp.sum(
                jnp.where(eq3, pk_ref[j][:, None, :], 0.0),
                axis=2, keepdims=True,
            )                                # (SUB, wsub, 1)
            # stage 2: shift sub-run windows into the block's 2W window:
            # target lane v = off + w  <=>  v - w == off. off for all-pad
            # sub-runs is huge and never matches v in [0, 2W).
            eq2 = (vi2 - wi2) == off3        # (SUB, wsub, 2W)
            pk_out[j, :] = jnp.sum(
                jnp.where(eq2, mini, 0.0), axis=(0, 1)
            )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_docs", "W", "wsub", "interpret", "combine")
)
def phrase_boost_docmajor_windowed(
    docs: jax.Array,        # int32[PPpad] sorted by (doc, pos); pad = PAD_DOC
    poss: jax.Array,        # int32[PPpad] (ignored when bits is given)
    terms: jax.Array,       # int32[PPpad]
    w_base: jax.Array,      # int32[nb] per-block W-aligned window base
    spans: jax.Array,       # int32[MAXTOK, 2] matched term-id ranges
    user_boost: jax.Array,  # float32[]
    n_docs: int,
    W: int,
    wsub: int,
    interpret: bool = False,
    bits: Optional[jax.Array] = None,  # commit-static phrase_static_bits
    # page combine: "segsum" (default — the row-wise segment reduction
    # measured 10.1 vs 11.1 ms for the chunked one-hot matmul at 19M
    # positions on v5e, bit-exact) | "onehot" (kept for comparison)
    combine: str = "segsum",
) -> jax.Array:
    """Windowed phrase boost: same contract (and bit-identical result) as
    phrase_boost_docmajor, with the per-doc assembly done by the Pallas
    window kernel + page one-hot matmul (module comment above)."""
    from jax.experimental.pallas import tpu as _pltpu

    pp = docs.shape[0]
    assert pp % (_PH_PB * _PH_GRP) == 0, (
        "pad the phrase stream to a _PH_PB*_PH_GRP multiple"
    )
    nb = pp // _PH_PB
    if bits is not None:
        anyc, seqc = _phrase_group_flags_bits(bits, terms, spans)
    else:
        anyc, seqc = _phrase_group_flags(docs, poss, terms, spans)
    packed = anyc + _PH_PACK * seqc  # fused by XLA into the flags pass

    d3 = docs.reshape(nb, _PH_SUB, _PH_SUBLEN)
    p3 = packed.reshape(nb, _PH_SUB, _PH_SUBLEN)

    def plane(i, wb):
        return (i, 0, 0)

    grid_spec = _pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb // _PH_GRP,),
        in_specs=[
            pl.BlockSpec((_PH_GRP, _PH_SUB, _PH_SUBLEN), plane),
            pl.BlockSpec((_PH_GRP, _PH_SUB, _PH_SUBLEN), plane),
        ],
        out_specs=[
            pl.BlockSpec((_PH_GRP, 2 * W), lambda i, wb: (i, 0)),
        ],
    )
    (win_p,) = pl.pallas_call(
        _phrase_window_kernel(W, wsub),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nb, 2 * W), jnp.float32),
        ],
        interpret=interpret,
    )(w_base, d3, p3)
    # split the packed per-block windows (exact: integer-valued f32)
    win_s = jnp.floor(win_p / _PH_PACK)
    win_a = win_p - _PH_PACK * win_s

    # stage 3: page combine. Each block's 2W window covers exactly pages
    # (w_base/W, w_base/W + 1); rows are page-aligned by construction, so
    # the combine is a one-hot matmul (well-shaped for the MXU) instead of
    # a scatter into [n_docs].
    n_pages = -(-n_docs // W) + 2
    pages = w_base // jnp.int32(W)
    rows = jnp.concatenate([win_a[:, :W], win_a[:, W:],
                            win_s[:, :W], win_s[:, W:]], axis=1)
    rows = rows.reshape(nb, 4, W)
    row_pages = jnp.stack(
        [pages, pages + 1, pages, pages + 1], axis=1
    )                                        # (nb, 4)
    # channel tag rides the one-hot so anyorder/seq separate after the
    # matmul: target row = page * 2 + (0 for any, 1 for seq)
    chan = jnp.asarray([0, 0, 1, 1], jnp.int32)[None, :]
    tgt_rows = (row_pages * 2 + chan).reshape(nb * 4)
    flat = rows.reshape(nb * 4, W)

    if combine == "segsum":
        # the target pages are commit-static AND nondecreasing in stream
        # order (w_base is monotone over the doc-major stream), so the
        # combine is a row-wise segment reduction — no (chunk, n_pages)
        # one-hot materialization, no MXU pass over mostly-zero rows
        out_pages = jax.ops.segment_sum(
            flat, tgt_rows, num_segments=2 * n_pages + 1
        )                                    # (2*n_pages+1, W)
    else:
        chunk = 2048
        n_rows = nb * 4
        pad_rows = -(-n_rows // chunk) * chunk
        if pad_rows != n_rows:
            tgt_rows = jnp.concatenate(
                [tgt_rows,
                 jnp.full((pad_rows - n_rows,), 2 * n_pages, jnp.int32)]
            )
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad_rows - n_rows, W), jnp.float32)]
            )
        page_ids = jnp.arange(2 * n_pages + 1, dtype=jnp.int32)

        def chunk_sum(args):
            tr, fr = args
            oh = (tr[:, None] == page_ids[None, :]).astype(jnp.float32)
            return jnp.einsum(
                "cp,cw->pw", oh, fr, preferred_element_type=jnp.float32
            )

        parts = jax.lax.map(
            chunk_sum,
            (
                tgt_rows.reshape(-1, chunk),
                flat.reshape(-1, chunk, W),
            ),
        )
        out_pages = jnp.sum(parts, axis=0)   # (2*n_pages+1, W)
    anyorder = out_pages[0::2, :][:n_pages].reshape(-1)[:n_docs]
    seq = out_pages[1::2, :][:n_pages].reshape(-1)[:n_docs]
    return jnp.where(
        anyorder > 0, anyorder + 2.0 * seq + user_boost, user_boost
    )


def idf_from_counts(ni, n_docs_with_field):
    """Host-side idf (numpy or jnp): ln1p((N - ni + 0.5) / (ni + 0.5))."""
    import numpy as np

    ni = np.asarray(ni, dtype=np.float64)
    return np.log1p((n_docs_with_field - ni + 0.5) / (ni + 0.5)).astype(np.float32)


# ---------------------------------------------------------------------------
# Dense per-term score rows for Zipf-head terms.
#
# The per-doc reduction of the posting scan is an XLA TPU scatter-add at
# ~10 ns/posting no matter how the gathers are arranged — the measured
# floor of the whole 1M-posting scan (benchmarks/segsum_bench.py:
# segment_sum alone 9.9 ms; sorted/unique hints do not help). But the
# per-posting BM25 factor g(tf, len) = tf(k1+1)/(tf + k1(1-b+b len/avgdl))
# is COMMIT-STATIC — only idf and the field boost are query-dependent, and
# both are per-term scalars. So the few head terms that dominate posting
# volume are precomputed at commit as dense [cap] g rows; at query time a
# heavy term costs one weighted dense row-add (pure HBM bandwidth) and
# only the light-term tail pays the scatter. Measured on v5e at the
# Zipf-heavy 1M-posting mix: 9.9 ms -> 2.3 ms with 3 dense terms
# (exact: rel err 6.7e-8). The reference's CPU engine has no analog —
# its per-posting loop (committed/string.rs:302-479) IS the scatter.
# ---------------------------------------------------------------------------


def build_dense_term_rows(
    term_starts, post_docs, post_tf, doc_lens_dense,
    cap: int, avgdl: float, budget: int, df_ratio: int,
):
    """Host (numpy): pick heavy terms and build their dense g rows.

    Heavy = posting-span width >= max(cap // df_ratio, 8), top ``budget``
    by width. Rows embed avgdl (cache key must include it) but NOT idf or
    boost — those stay query-time scalars so DFS stat overrides and boosts
    keep working. Returns (rows float32[H, cap], row_by_term {t: row}) or
    None when nothing qualifies.
    """
    import numpy as np

    if budget <= 0 or len(term_starts) < 2:
        return None
    spans = np.diff(term_starts)
    thresh = max(cap // max(df_ratio, 1), 8)
    heavy = np.nonzero(spans >= thresh)[0]
    if heavy.size == 0:
        return None
    if heavy.size > budget:
        heavy = heavy[np.argsort(spans[heavy], kind="stable")[::-1][:budget]]
        heavy.sort()
    rows = np.zeros((len(heavy), cap), np.float32)
    for r, t in enumerate(heavy):
        lo, hi = int(term_starts[t]), int(term_starts[t + 1])
        docs = post_docs[lo:hi]
        tf = post_tf[lo:hi].astype(np.float32)
        lens = doc_lens_dense[docs]
        den = tf + K1 * (1.0 - B + B * lens / max(float(avgdl), 1e-9))
        rows[r, docs] = tf * (K1 + 1.0) / np.maximum(den, 1e-9)
    return rows, {int(t): r for r, t in enumerate(heavy)}


def split_spans_dense(
    token_spans, term_starts, row_by_term, term_df, n_for_idf,
):
    """Host: split token term-spans into light posting subspans + heavy rows.

    Each heavy term inside a span owns a contiguous posting run; the
    light remainder becomes posting subspans for the blocked scan, and the
    heavy term contributes (row index, idf) for the dense row-sum. A term
    matched by several spans (surface + stem, repeated tokens) is emitted
    once per span — additive, exactly like the scan scoring its run once
    per span. Returns (p_lo, p_len, sel_rows, sel_idf).
    """
    import math

    p_lo: list = []
    p_len: list = []
    sel: list = []
    w: list = []
    for lo, hi in token_spans:
        cur = int(term_starts[lo])
        for t in range(lo, hi):
            r = row_by_term.get(t)
            if r is None:
                continue
            t_lo, t_hi = int(term_starts[t]), int(term_starts[t + 1])
            if t_lo > cur:
                p_lo.append(cur)
                p_len.append(t_lo - cur)
            cur = t_hi
            ni = float(term_df[t])
            w.append(
                math.log1p(max((n_for_idf - ni + 0.5) / (ni + 0.5), 0.0))
            )
            sel.append(r)
        end = int(term_starts[hi])
        if end > cur:
            p_lo.append(cur)
            p_len.append(end - cur)
    return p_lo, p_len, sel, w


DENSE_SEL_BUCKETS = (2, 8, 32)


def pad_dense_sel(sel, w, buckets=DENSE_SEL_BUCKETS):
    """Pad (sel, w) to a bucketed length; pads select row 0 with weight 0.

    Callers must fall back to the plain scan when len(sel) exceeds the
    largest bucket (raise here rather than silently truncate scores)."""
    import numpy as np

    n = len(sel)
    if n > buckets[-1]:
        raise ValueError(f"dense selection {n} exceeds bucket {buckets[-1]}")
    hb = next(b for b in buckets if b >= n)
    sel_a = np.zeros(hb, np.int32)
    w_a = np.zeros(hb, np.float32)
    sel_a[:n] = sel
    w_a[:n] = w
    return sel_a, w_a


def dense_rows_contrib(rows, sel, w, boost):
    """Device: boost * sum_h w[h] * rows[sel[h]] — the heavy-term scores.

    Traceable (used inside the fused program) and jit-safe standalone."""
    return boost * jnp.einsum(
        "h,hd->d", w, jnp.take(rows, sel, axis=0)
    )


dense_rows_contrib_jit = jax.jit(dense_rows_contrib)
