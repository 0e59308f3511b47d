"""Sharded serving path: shard_map programs for the engine's mesh mode.

With ``tpu.mesh_shape`` configured, every committed structure lives as
per-shard packed arrays over the mesh's ``data`` axis (shard-local doc-id
spaces: doc ``d`` is owned by shard ``d // local_cap`` at local id
``d % local_cap``). Queries run as shard_map programs that score locally
with the SAME kernels as single-chip (ops/bm25.py, ops/vector.py,
ops/filters.py) and merge per-shard top-k candidates with one all-gather —
per-query cross-device traffic is O(shards * k), independent of corpus size
(the reference's per-field search loop, collection.rs:684-781, as a sharded
kernel; SURVEY.md §7 "Multi-node").

Dense [cap] arrays (filter masks, per-field scores, fused scores) exist
only as shard-local [local_cap] slices: intermediates between programs are
jax.Arrays with NamedSharding(P("data")) — they never replicate.

Program factories are lru_cached on (mesh, static shapes): each distinct
shape bucket compiles once and is reused across queries/collections.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import bm25 as bm25_ops
from ..ops import filters as filter_ops
from ..ops import quant as quant_ops
from ..ops import vector as vector_ops
from .mesh import DATA_AXIS

RRF_K = 60.0


# one definition of the row-sharded layout for the whole package
from .mesh import data_sharding  # noqa: E402,F401


def shard_count(mesh: Mesh) -> int:
    return mesh.shape[DATA_AXIS]


# --- committed scoring -------------------------------------------------------


@functools.lru_cache(maxsize=None)
def blocked_bm25(mesh: Mesh, n_local_docs: int, n_blocks: int, masked: bool):
    """(stacked posting arrays [S, Ppad], block plan [S, nb], scalars,
    mask [cap]) -> BM25 scores [cap] (sharded). The local body is the
    single-chip blocked kernel verbatim."""

    def local(docs, tf, ni, plens, b_starts, b_valid, boost, avgdl, nfd, mask):
        raw = bm25_ops.bm25_scores_blocked(
            docs[0], tf[0], ni[0], plens[0], b_starts[0], b_valid[0],
            boost, avgdl, nfd, n_docs=n_local_docs, n_blocks=n_blocks,
        )
        if masked:
            raw = raw * mask
        return raw

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(DATA_AXIS),
            ),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def blocked_phrase_boost(mesh: Mesh, n_local_docs: int, n_blocks: int):
    """(positions [S, PPpad], pos_docs [S, PPpad], plan [S, nb], boost) ->
    per-doc phrase boost [cap] (sharded). A doc's positions live only on its
    owning shard, so the boost is shard-local."""

    def local(pos, pos_docs, pb_starts, pb_valid, user_boost):
        return bm25_ops.phrase_boost_blocked(
            pos[0], pos_docs[0], pb_starts[0], pb_valid[0], user_boost,
            n_docs=n_local_docs, n_blocks=n_blocks,
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def vector_scores(mesh: Mesh, n_local_docs: int):
    """(vecs [S, Pl, D], vec_docs(local) [S, Pl], valid [S, Pl], query [D],
    mask [cap]) -> sum-of-relu-cos scores [cap] (sharded)."""

    def local(vecs, vec_docs, valid, query, mask):
        return vector_ops.brute_force_scores(
            vecs[0], vec_docs[0], valid[0], query, mask, n_docs=n_local_docs
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def vector_scores_int8(mesh: Mesh, n_local_docs: int):
    def local(codes, scales, vec_docs, valid, query, mask):
        return quant_ops.int8_brute_force_scores(
            codes[0], scales[0], vec_docs[0], valid[0], query, mask,
            n_docs=n_local_docs,
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),
                P(), P(DATA_AXIS),
            ),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def vector_topk_fast(
    mesh: Mesh,
    n_local_docs: int,
    k: int,
    block_rows: int,
    m_max: int,
    n_valid: int,
    multivec: bool,
    interpret: bool,
):
    """Mesh counterpart of the single-device Pallas kNN fast path: each
    shard runs the fused top-k kernel on its LOCAL rows (never building a
    dense [cap] score array), ids globalize by shard offset, and the
    O(S*k) all-gather merge + psum'd exact match count replicate out —
    the same serving shape as topk_with_count but with kernel-side
    candidate generation. Multi-vector shards use the segment-aware
    kernel (per-shard row layouts stay doc-ascending: the stable shard
    partition preserves the committed order, and pad rows sit at
    local_cap-1 with zero vectors). Requires: exact index, no filters/
    facets/deletes, empty uncommitted windows (callers fall back to the
    dense sharded pipeline otherwise)."""
    from ..ops import pallas_knn as pk

    kk = min(k, n_valid)

    def local(vecs, rowdocs, rowstarts, query):
        q = query[None, :].astype(vecs.dtype)
        if multivec:
            vals, docs, cnt = pk.knn_topk_multivec_with_count(
                vecs[0], rowdocs[0], rowstarts[0], q, k=kk,
                block_rows=block_rows, m_max=m_max, n_valid=n_valid,
                n_docs=n_local_docs, interpret=interpret,
            )
        else:
            vals, rows, cnt = pk.knn_topk_with_count(
                vecs[0], q, k=kk, block_rows=block_rows,
                n_valid=n_valid, interpret=interpret,
            )
            docs = rowdocs[0][rows]
        vals, docs, cnt = vals[0], docs[0], cnt[0]
        shard = jax.lax.axis_index(DATA_AXIS)
        g = docs.astype(jnp.int32) + shard * n_local_docs
        v_all = jax.lax.all_gather(vals, DATA_AXIS, tiled=True)  # [S*kk]
        g_all = jax.lax.all_gather(g, DATA_AXIS, tiled=True)
        vf, ix = jax.lax.top_k(v_all, kk)
        count = jax.lax.psum(cnt, DATA_AXIS)
        return vf, g_all[ix], count

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def ivfpq_scores(
    mesh: Mesh,
    n_local_docs: int,
    nprobe: int,
    cand_k: int,
    expand: int,
    residual: bool,
):
    """Sharded IVF-PQ serving program (BASELINE config 5's mesh path):
    every shard probes the SAME global centroids, ADC-scans its own slice
    of the probed clusters' members, exact-reranks its top candidates, and
    scatters them into its dense local score slice — the downstream
    pipeline (hybrid fusion, top-k merge, facets) is unchanged. The union
    of per-shard candidate sets contains the single-device candidate set
    (a row's local ADC rank is never worse than its global rank), so
    recall is >= the replicated path at the same nprobe/expand.

    Replaces the reference's HNSW (committed/vector.rs:36-236) at
    beyond-HBM scale: partitions + compression instead of graph hops."""
    from ..ops import ivf as ivf_ops

    def local(codes, books, vecs, cents, lists, lens, docs, rot, query, mask):
        kk = min(cand_k, nprobe * lists.shape[2])
        sims, rows = ivf_ops.ivf_pq_search(
            codes[0], books, vecs[0], cents, lists[0], lens[0],
            query[None, :], nprobe=nprobe, k=kk, expand=expand,
            residual=residual, rotation=rot,
        )
        d = docs[0][rows[0]]
        contrib = jnp.maximum(sims[0], 0.0)  # -inf pads -> 0 contribution
        scores = jnp.zeros((n_local_docs,), jnp.float32).at[d].add(contrib)
        return scores * mask

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS), P(), P(DATA_AXIS), P(), P(DATA_AXIS),
                P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(DATA_AXIS),
            ),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


# --- filters ------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def number_range_mask(mesh: Mesh, n_local_docs: int):
    def local(vals, docs, valid, lo, hi, lx, hx):
        return filter_ops.number_range_mask(
            vals[0], docs[0], valid[0], lo, hi, lx, hx, n_docs=n_local_docs
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(), P(), P(),
            ),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def number_eq_mask(mesh: Mesh, n_local_docs: int):
    def local(vals, docs, valid, value):
        return filter_ops.number_eq_mask(
            vals[0], docs[0], valid[0], value, n_docs=n_local_docs
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def keyword_set_mask(mesh: Mesh, n_local_docs: int):
    """Sharded keyword eq/in filter over per-shard (value-id, doc) columns
    (filters.value_set_mask per shard; masks stay shard-local)."""

    def local(ids, docs, valid, wanted):
        return filter_ops.value_set_mask(
            ids[0], docs[0], valid[0], wanted, n_docs=n_local_docs
        )

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


# --- facets --------------------------------------------------------------------
#
# Facet counts are masked reductions (ops/facets.py) over doc-disjoint
# shards: each shard reduces its local columns against its local matched
# slice, then one psum merges the counts — O(values) cross-device bytes
# per facet, never a dense gather (reference recomputes filters instead,
# collection.rs:1004-1126).


@functools.lru_cache(maxsize=None)
def number_facet_counts(mesh: Mesh, n_local_docs: int, n_ranges: int):
    from ..ops import facets as facet_ops

    def local(vals, docs, valid, lows, highs, matched):
        c = facet_ops.number_facet_counts(
            vals[0], docs[0], valid[0], lows, highs, matched,
            n_docs=n_local_docs,
        )
        return jax.lax.psum(c, DATA_AXIS)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(), P(),
                P(DATA_AXIS),
            ),
            out_specs=P(),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def keyword_facet_counts(mesh: Mesh, n_local_docs: int, n_values: int):
    from ..ops import facets as facet_ops

    def local(ids, docs, valid, matched):
        c = facet_ops.keyword_facet_counts(
            ids[0], docs[0], valid[0], matched, n_values=n_values
        )
        return jax.lax.psum(c, DATA_AXIS)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def bool_facet_counts(mesh: Mesh, n_local_docs: int):
    from ..ops import facets as facet_ops

    def local(true_mask, has_mask, matched):
        c = facet_ops.bool_facet_counts(true_mask, has_mask, matched)
        return jax.lax.psum(c, DATA_AXIS)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(),
            check_vma=False,
        )
    )


# --- host-window overlay -------------------------------------------------------


@functools.lru_cache(maxsize=None)
def scatter_add(mesh: Mesh, n_local_docs: int):
    """Scatter (global doc ids, values) into a sharded dense array: each
    shard applies only the entries it owns. idx/vals are small replicated
    host arrays (the uncommitted window), so no O(cap) traffic."""

    def local(scores, idx, vals):
        shard = jax.lax.axis_index(DATA_AXIS)
        li = idx - shard * n_local_docs
        own = (li >= 0) & (li < n_local_docs)
        li = jnp.clip(li, 0, n_local_docs - 1)
        return scores.at[li].add(jnp.where(own, vals, 0.0))

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(), P()),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )


# --- top-k merges ---------------------------------------------------------------


def _local_topk_merge(scores, k: int, n_local_docs: int):
    """Inside shard_map: local top-k -> all-gather k-per-shard -> re-top-k.
    Tie behavior matches a global lax.top_k (lower global id wins): gathered
    blocks are in shard order and top_k is stable over positions."""
    kk = min(k, n_local_docs)
    shard = jax.lax.axis_index(DATA_AXIS)
    v, i = jax.lax.top_k(scores, kk)
    g = i.astype(jnp.int32) + shard * n_local_docs
    v_all = jax.lax.all_gather(v, DATA_AXIS, tiled=True)   # [S*kk]
    g_all = jax.lax.all_gather(g, DATA_AXIS, tiled=True)
    vf, ix = jax.lax.top_k(v_all, k)
    return vf, g_all[ix]


@functools.lru_cache(maxsize=None)
def topk_with_count(mesh: Mesh, k: int, n_local_docs: int):
    """Sharded counterpart of ops/topk.topk_with_count: (scores [cap]
    sharded) -> (values [k], global ids [k], matched count) replicated."""

    def local(scores):
        vf, gf = _local_topk_merge(scores, k, n_local_docs)
        count = jax.lax.psum(jnp.sum(scores > 0).astype(jnp.int32), DATA_AXIS)
        return vf, gf, count

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS),),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def minmax_topk(mesh: Mesh, k: int, n_local_docs: int):
    """Hybrid min-max fusion + top-k: fused = (ft + vec) / max(max ft,
    max vec) (collection.rs:750-772 on dense arrays) — monotone in ft+vec,
    so per-shard top-k of the sum merges exactly."""

    def local(ft, vec):
        m = jax.lax.pmax(
            jnp.maximum(jnp.max(ft), jnp.max(vec)), DATA_AXIS
        )
        m = jnp.maximum(m, 1e-9)
        fused = (ft + vec) / m
        vf, gf = _local_topk_merge(fused, k, n_local_docs)
        count = jax.lax.psum(jnp.sum(fused > 0).astype(jnp.int32), DATA_AXIS)
        return vf, gf, count

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def rrf_topk(mesh: Mesh, k: int, cand: int, n_local_docs: int):
    """Hybrid RRF fusion + top-k without a global argsort.

    RRF needs GLOBAL ranks. Each shard proposes its top-``cand`` docs per
    modality; the union (all-gathered, O(S*cand)) provably contains the true
    fused top-k when cand >= 2k + 61: a doc outside both global top-cand
    lists has fused <= 2/(61+cand), and at least k docs with a modality rank
    < (cand-61)/2 >= k beat that (or fewer than k docs match at all, in
    which case every matched doc is already a candidate).

    Exact global ranks for candidates are computed by counting, reproducing
    the replicated path's stable argsort (ops/fusion._rrf_of) bit-for-bit:
    rank(d) = #{s' > s} + #{s' == s and gid' < gid}, summed over shards.
    """

    def local(ft, vec):
        shard = jax.lax.axis_index(DATA_AXIS)
        gids_local = (
            jnp.arange(n_local_docs, dtype=jnp.int32) + shard * n_local_docs
        )
        cc = min(cand, n_local_docs)

        def propose(scores):
            v, i = jax.lax.top_k(scores, cc)
            g = i.astype(jnp.int32) + shard * n_local_docs
            return jax.lax.all_gather(g, DATA_AXIS, tiled=True)  # [S*cc]

        g_cand = jnp.concatenate([propose(ft), propose(vec)])    # [2*S*cc]

        def values_at(scores, g):
            li = g - shard * n_local_docs
            own = (li >= 0) & (li < n_local_docs)
            li = jnp.clip(li, 0, n_local_docs - 1)
            return jax.lax.psum(
                jnp.where(own, scores[li], 0.0), DATA_AXIS
            )

        ft_c = values_at(ft, g_cand)
        vec_c = values_at(vec, g_cand)

        def ranks_of(scores, cand_scores):
            # [local_cap, n_cand] compare-and-count; psum -> exact global rank
            better = (scores[:, None] > cand_scores[None, :]) | (
                (scores[:, None] == cand_scores[None, :])
                & (gids_local[:, None] < g_cand[None, :])
            )
            return jax.lax.psum(
                jnp.sum(better, axis=0).astype(jnp.float32), DATA_AXIS
            )

        r_ft = ranks_of(ft, ft_c)
        r_vec = ranks_of(vec, vec_c)
        fused = jnp.where(ft_c > 0, 1.0 / (RRF_K + r_ft + 1.0), 0.0) + jnp.where(
            vec_c > 0, 1.0 / (RRF_K + r_vec + 1.0), 0.0
        )
        # dedup docs proposed by both modalities (identical fused scores):
        # sort by gid, kill repeats, then top-k over fused
        order = jnp.argsort(g_cand)
        g_s = g_cand[order]
        f_s = fused[order]
        dup = jnp.concatenate(
            [jnp.zeros(1, bool), g_s[1:] == g_s[:-1]]
        )
        f_s = jnp.where(dup, -jnp.inf, f_s)
        vf, ix = jax.lax.top_k(f_s, k)
        gf = g_s[ix]
        vf = jnp.maximum(vf, 0.0)  # pad slots (-inf) -> 0 = unmatched
        count = jax.lax.psum(
            jnp.sum((ft > 0) | (vec > 0)).astype(jnp.int32), DATA_AXIS
        )
        return vf, gf, count

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def gather_values(mesh: Mesh, n_local_docs: int):
    """Fetch values of a sharded dense array at (few) global doc ids —
    used to evaluate the filter mask at the uncommitted window's docs
    without pulling the whole mask to host. O(n_idx) traffic."""

    def local(arr, idx):
        shard = jax.lax.axis_index(DATA_AXIS)
        li = idx - shard * n_local_docs
        own = (li >= 0) & (li < n_local_docs)
        li = jnp.clip(li, 0, n_local_docs - 1)
        return jax.lax.psum(jnp.where(own, arr[li], 0.0), DATA_AXIS)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(DATA_AXIS), P()),
            out_specs=P(),
            check_vma=False,
        )
    )


# Exactness-critical bound shared with the fused single-chip path — ONE
# definition so the proof constant (2k+64, bucket ladder) can never drift.
from ..ops.fusion import rrf_candidate_count  # noqa: E402,F401
