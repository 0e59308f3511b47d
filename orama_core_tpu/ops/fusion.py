"""Hybrid score fusion on dense per-doc score arrays.

The reference min-max normalizes full-text and vector score maps over their
union and sums (`collection.rs:750-772`). On dense arrays (scores >= 0,
unmatched == 0) the union-min is 0, so min-max reduces to dividing by the
global max — one elementwise pass.

RRF (reciprocal rank fusion, k=60) is offered as the default fusion
(BASELINE.md): rank-based fusion is scale-free, which matters because BM25
and cosine live on very different scales. Ranks come from a full argsort —
O(N log N) on device, still tiny next to the scoring matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

RRF_K = 60.0


@jax.jit
def minmax_fuse(ft_scores: jax.Array, vec_scores: jax.Array) -> jax.Array:
    m = jnp.maximum(jnp.max(ft_scores), jnp.max(vec_scores))
    m = jnp.maximum(m, 1e-9)
    return (ft_scores + vec_scores) / m


@jax.jit
def _rrf_of(scores: jax.Array) -> jax.Array:
    # rank 0 = best. argsort of descending scores -> order; invert to ranks.
    n = scores.shape[0]
    order = jnp.argsort(-scores)
    ranks = jnp.zeros((n,), dtype=jnp.float32).at[order].set(
        jnp.arange(n, dtype=jnp.float32)
    )
    return jnp.where(scores > 0, 1.0 / (RRF_K + ranks + 1.0), 0.0)


@jax.jit
def rrf_fuse(ft_scores: jax.Array, vec_scores: jax.Array) -> jax.Array:
    return _rrf_of(ft_scores) + _rrf_of(vec_scores)


def rrf_candidate_count(k: int) -> int:
    """Smallest provably-exact per-modality candidate budget for
    rrf_fuse_topk, bucket-padded (same bound as the sharded merge,
    parallel/sharded_engine.rrf_candidate_count): a doc outside both
    top-``cand`` lists has fused <= 2/(61+cand), and at least k docs with
    a modality rank < (cand-61)/2 >= k beat that."""
    need = 2 * k + 64
    for b in (128, 256, 512, 1024):
        if need <= b:
            return b
    return need


_TIER_SUB = 1024


def _tiered_topk(scores: jax.Array, c: int):
    """Exact-containment top-c over dense scores via block-max tiering
    (the pallas_knn argument: every doc with modality rank < c lives in
    a block whose max ranks within the top-c block maxes, modulo exact
    score ties at the c-th block boundary — which the RRF candidate
    bound absorbs: an excluded boundary-tie doc has rank >= c by the
    tie-stable rank definition, so its fused contribution can never
    displace the true top-k). One cheap [.., nb] reduce + two small
    top_ks replace a full [.., n] top_k (k=128 at n=1M dominated the
    batched hybrid program). Flat top_k below 4 blocks or odd n.
    Accepts [n] or [B, n]; returns indices int32 like lax.top_k."""
    n = scores.shape[-1]
    if n % _TIER_SUB or n <= 4 * _TIER_SUB or c >= n // _TIER_SUB:
        return jax.lax.top_k(scores, c)[1].astype(jnp.int32)
    squeeze = scores.ndim == 1
    s = scores[None, :] if squeeze else scores
    b = s.shape[0]
    nb = n // _TIER_SUB
    blocks = s.reshape(b, nb, _TIER_SUB)
    bmax = jnp.max(blocks, axis=2)                       # [B, nb]
    _, bidx = jax.lax.top_k(bmax, c)                     # [B, c]
    cand = jnp.take_along_axis(
        blocks, bidx[:, :, None], axis=1
    ).reshape(b, c * _TIER_SUB)                          # [B, c*SUB]
    _, ci = jax.lax.top_k(cand, c)
    gi = (
        jnp.take_along_axis(bidx, ci // _TIER_SUB, axis=1) * _TIER_SUB
        + ci % _TIER_SUB
    ).astype(jnp.int32)
    return gi[0] if squeeze else gi


def dense_topk(scores: jax.Array, k: int):
    """(vals, idx) top-k over dense scores via _tiered_topk — the shared
    final-selection primitive of the fused serving programs ([n] single
    and [B, n] batched use the SAME selector, so path parity is
    structural). Returns vals sorted descending like lax.top_k."""
    idx = _tiered_topk(scores, k)
    return jnp.take_along_axis(scores, idx, axis=-1), idx


@functools.partial(jax.jit, static_argnames=("k", "cand"))
def rrf_fuse_topk_batch(
    ft_scores: jax.Array, vec_scores: jax.Array, k: int, cand: int
):
    """Row-wise exact RRF top-k over [B, n] score batches — the batched
    serving program's fusion stage. Everything runs BATCHED across rows:
    candidate top-k as one [B, n] top_k per modality, and the rank
    compare-and-count as a fori_loop over n-chunks with a bounded
    [B, 2c, CH] intermediate (the full [B, 2c, n] broadcast would be
    gigabytes; a per-row lax.map serializes B ~[2c, n] passes and was
    the batched-hybrid bottleneck). Row-for-row identical to
    rrf_fuse_topk: same candidate set, same stable-tie rank definition,
    same dedup."""
    b, n = ft_scores.shape
    c = min(cand, n)
    fi = _tiered_topk(ft_scores, c)
    vi = _tiered_topk(vec_scores, c)
    g = jnp.concatenate([fi, vi], axis=1)                        # [b, 2c]
    ft_g = jnp.take_along_axis(ft_scores, g, axis=1)
    vec_g = jnp.take_along_axis(vec_scores, g, axis=1)

    # engine capacities are doc_capacity_step (8192) multiples, so the
    # chunked path always engages there; the unchunked fallback is for
    # small/odd direct-call shapes only (its [b, 2c, n] broadcast must
    # never see a large n)
    ch = next(
        (c_ for c_ in (4096, 2048, 1024, 512, 256, 128) if n % c_ == 0),
        None,
    )

    def ranks_of(scores, s_g):
        # rank = #{s' > s} + #{s' == s and id' < id} (argsort-stable
        # ties). Accumulate in int32 and cast ONCE at the end — per-chunk
        # f32 accumulation loses integer exactness above 2^24 docs and
        # would break batched-vs-sequential parity on 30M-doc corpora.
        if ch is None:  # tiny/odd n: one unchunked pass
            ids = jnp.arange(n, dtype=jnp.int32)
            better = (scores[:, None, :] > s_g[:, :, None]) | (
                (scores[:, None, :] == s_g[:, :, None])
                & (ids[None, None, :] < g[:, :, None])
            )
            return jnp.sum(better, axis=2).astype(jnp.float32)

        def body(ci, acc):
            sc = jax.lax.dynamic_slice(scores, (0, ci * ch), (b, ch))
            idxc = ci * ch + jnp.arange(ch, dtype=jnp.int32)
            better = (sc[:, None, :] > s_g[:, :, None]) | (
                (sc[:, None, :] == s_g[:, :, None])
                & (idxc[None, None, :] < g[:, :, None])
            )
            return acc + jnp.sum(better, axis=2, dtype=jnp.int32)

        return jax.lax.fori_loop(
            0, n // ch, body, jnp.zeros((b, 2 * c), jnp.int32)
        ).astype(jnp.float32)

    r_ft = ranks_of(ft_scores, ft_g)
    r_vec = ranks_of(vec_scores, vec_g)
    fused = jnp.where(
        ft_g > 0, 1.0 / (RRF_K + r_ft + 1.0), 0.0
    ) + jnp.where(vec_g > 0, 1.0 / (RRF_K + r_vec + 1.0), 0.0)
    order = jnp.argsort(g, axis=1)
    g_s = jnp.take_along_axis(g, order, axis=1)
    f_s = jnp.take_along_axis(fused, order, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), g_s[:, 1:] == g_s[:, :-1]], axis=1
    )
    f_s = jnp.where(dup, -jnp.inf, f_s)
    v, ix = jax.lax.top_k(f_s, k)
    counts = jnp.sum(
        (ft_scores > 0) | (vec_scores > 0), axis=1
    ).astype(jnp.int32)
    return (
        jnp.maximum(v, 0.0),
        jnp.take_along_axis(g_s, ix, axis=1),
        counts,
    )


@functools.partial(jax.jit, static_argnames=("k", "cand"))
def rrf_fuse_topk(ft_scores: jax.Array, vec_scores: jax.Array, k: int, cand: int):
    """Exact RRF top-k WITHOUT the two dense argsorts (31.6 ms at 1M on
    v5e vs ~5 ms for this formulation): propose top-``cand`` docs per
    modality, compute their EXACT global ranks by compare-and-count
    (reproducing _rrf_of's argsort tie order: lower index wins ties),
    fuse, dedup, top-k. Returns (values f32[k], ids int32[k], count =
    #docs matched by either modality)."""
    n = ft_scores.shape[0]
    c = min(cand, n)
    ids = jnp.arange(n, dtype=jnp.int32)

    fi = _tiered_topk(ft_scores, c)
    vi = _tiered_topk(vec_scores, c)
    g = jnp.concatenate([fi, vi])                       # [2c]
    # each candidate needs BOTH modalities' contributions
    ft_g = ft_scores[g]
    vec_g = vec_scores[g]

    def rank_of(scores, s_g, g_ids):
        # rank = #{s' > s} + #{s' == s and id' < id} (argsort-stable ties)
        better = (scores[None, :] > s_g[:, None]) | (
            (scores[None, :] == s_g[:, None]) & (ids[None, :] < g_ids[:, None])
        )
        return jnp.sum(better, axis=1).astype(jnp.float32)

    r_ft = rank_of(ft_scores, ft_g, g)
    r_vec = rank_of(vec_scores, vec_g, g)
    fused = jnp.where(ft_g > 0, 1.0 / (RRF_K + r_ft + 1.0), 0.0) + jnp.where(
        vec_g > 0, 1.0 / (RRF_K + r_vec + 1.0), 0.0
    )
    # dedup docs proposed by both modalities (identical fused values)
    order = jnp.argsort(g)
    g_s = g[order]
    f_s = fused[order]
    dup = jnp.concatenate([jnp.zeros(1, bool), g_s[1:] == g_s[:-1]])
    f_s = jnp.where(dup, -jnp.inf, f_s)
    v, ix = jax.lax.top_k(f_s, k)
    count = jnp.sum((ft_scores > 0) | (vec_scores > 0)).astype(jnp.int32)
    return jnp.maximum(v, 0.0), g_s[ix], count
