"""Document-sharded search over a device mesh.

The scale-out story (SURVEY.md §7 "Multi-node"): every query runs on all
document shards simultaneously under `shard_map`; each shard scores its
local slice (same kernels as single-chip — ops/bm25.py, ops/vector.py),
takes a local top-k, and the k-per-shard candidates are all-gathered over
ICI and re-topped. Communication per query is O(shards * k), independent of
corpus size.

Shard-local doc ids are ``local_id + shard * shard_cap`` so global ids
reconstruct without a lookup table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import bm25 as bm25_ops
from ..ops import fusion as fusion_ops
from .mesh import DATA_AXIS


def sharded_vector_topk(mesh: Mesh, k: int, shard_cap: int):
    """Build a jitted sharded exact-kNN: (vecs, vec_docs, valid, query) ->
    (global top-k scores, global doc ids).

    vecs: [S*Pl, D] sharded on dim 0; query: [D] replicated.
    """

    def local(vecs, vec_docs, valid, query):
        # [Pl, D] local slice
        sims = jnp.dot(vecs, query.astype(vecs.dtype), preferred_element_type=jnp.float32)
        sims = jnp.where(valid > 0, sims, -jnp.inf)
        shard = jax.lax.axis_index(DATA_AXIS)
        v, i = jax.lax.top_k(sims, k)
        gids = vec_docs[i] + shard * shard_cap
        # all-gather the k candidates from every shard (rides ICI)
        v_all = jax.lax.all_gather(v, DATA_AXIS, tiled=True)      # [S*k]
        g_all = jax.lax.all_gather(gids, DATA_AXIS, tiled=True)   # [S*k]
        vf, idx = jax.lax.top_k(v_all, k)
        return vf, g_all[idx]

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by the final all-gather+top_k
    )
    return jax.jit(mapped)


def sharded_int8_topk(mesh: Mesh, k: int, shard_cap: int):
    """Compressed-corpus variant of sharded_vector_topk (BASELINE config 5:
    int8 vectors at scale, document-sharded, all-gather top-k merge): each
    shard scores its int8 slice on the MXU (int32 accumulation), rescales
    by its per-row scales, local top-k, merge over ICI."""

    def local(codes, scales, vec_docs, valid, query):
        q_absmax = jnp.maximum(jnp.max(jnp.abs(query)), 1e-9)
        q_scale = q_absmax / 127.0
        q8 = jnp.clip(jnp.round(query / q_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            codes, q8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        sims = acc.astype(jnp.float32) * scales * q_scale
        sims = jnp.where(valid > 0, sims, -jnp.inf)
        shard = jax.lax.axis_index(DATA_AXIS)
        v, i = jax.lax.top_k(sims, k)
        gids = vec_docs[i] + shard * shard_cap
        v_all = jax.lax.all_gather(v, DATA_AXIS, tiled=True)
        g_all = jax.lax.all_gather(gids, DATA_AXIS, tiled=True)
        vf, idx = jax.lax.top_k(v_all, k)
        return vf, g_all[idx]

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated by the final all-gather+top_k
    )
    return jax.jit(mapped)


def sharded_hybrid_step(mesh: Mesh, k: int, shard_cap: int, n_local_docs: int):
    """Full hybrid query step over the mesh: per-shard BM25 (CSR scatter) +
    vector matmul + RRF fusion + local top-k + all-gather merge.

    This is the multi-chip "step" the driver dry-runs: it exercises the data
    axis with real collectives end-to-end.
    """

    def local(
        post_docs, post_tf, doc_lens, g_idx, g_idf,
        vecs, vec_docs, vec_valid, query, filter_mask, avgdl,
    ):
        ft = bm25_ops.bm25_scores(
            post_docs, post_tf, doc_lens, g_idx, g_idf,
            jnp.ones((n_local_docs,), jnp.float32), filter_mask, avgdl,
            n_docs=n_local_docs,
        )
        sims = jnp.dot(vecs, query.astype(vecs.dtype), preferred_element_type=jnp.float32)
        sims = jnp.maximum(sims, 0.0) * vec_valid
        vs = jax.ops.segment_sum(sims, vec_docs, num_segments=n_local_docs)
        vs = vs * filter_mask
        fused = fusion_ops.rrf_fuse(ft, vs)
        shard = jax.lax.axis_index(DATA_AXIS)
        v, i = jax.lax.top_k(fused, k)
        gids = i + shard * shard_cap
        v_all = jax.lax.all_gather(v, DATA_AXIS, tiled=True)
        g_all = jax.lax.all_gather(gids, DATA_AXIS, tiled=True)
        vf, idx = jax.lax.top_k(v_all, k)
        return vf, g_all[idx]

    mapped = jax.shard_map(
        local,
        mesh=mesh,
        check_vma=False,  # outputs are replicated by the final all-gather+top_k
        in_specs=(
            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),  # postings, tf, doc_lens
            P(DATA_AXIS), P(DATA_AXIS),                # gather idx, idf (per shard)
            P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS),  # vecs, vec_docs, valid
            P(), P(DATA_AXIS), P(),                    # query, filter, avgdl
        ),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped)
