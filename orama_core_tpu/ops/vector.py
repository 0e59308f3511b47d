"""Vector scoring: MXU-batched similarity matmuls + per-doc accumulation.

TPU-native replacement for the reference's HNSW (`committed/vector.rs`) and
brute-force scan (`uncommitted/vector.rs`). Vectors are packed as one
row-major matrix in HBM (bf16 by default) with a parallel ``vec_docs`` map
(several vectors may belong to one document — chunked long docs). A query
batch is one ``[Q, D] x [D, P]`` matmul on the MXU; per-document scores are
segment-accumulated (the reference sums multi-vector scores per doc:
uncommitted/vector.rs:44-56).

Scores are cosine similarities (vectors stored L2-normalized), clamped at 0
— a monotone, scale-stable replacement for the reference's 1/distance score
(which is unbounded near duplicates and mixes Manhattan/Euclidean between
its committed/uncommitted paths)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_docs", "identity"))
def brute_force_scores(
    vecs: jax.Array,         # bf16/f32[P, D] L2-normalized vectors
    vec_docs: jax.Array,     # int32[P] owning doc of each vector
    vec_valid: jax.Array,    # float32[P] 1.0 = real row
    query: jax.Array,        # f32[D] L2-normalized query
    filter_mask: jax.Array,  # float32[Npad]
    n_docs: int,
    identity: bool = False,  # vec_docs is an identity prefix (commit-static)
) -> jax.Array:
    """float32[n_docs]: sum of relu(cos) over each doc's vectors. With
    ``identity`` (row i IS doc i — one vector per doc in insertion
    order), the segment scatter collapses to a pad/slice."""
    sims = jnp.dot(
        vecs, query.astype(vecs.dtype), preferred_element_type=jnp.float32
    )
    sims = jnp.maximum(sims, 0.0) * vec_valid
    if identity:
        p = sims.shape[0]
        scores = (
            sims[:n_docs] if p >= n_docs else jnp.pad(sims, (0, n_docs - p))
        )
    else:
        scores = jax.ops.segment_sum(sims, vec_docs, num_segments=n_docs)
    return scores * filter_mask


@functools.partial(jax.jit, static_argnames=("n_docs", "identity"))
def brute_force_scores_batch(
    vecs: jax.Array,         # [P, D] normalized
    vec_docs: jax.Array,     # int32[P]
    vec_valid: jax.Array,    # float32[P]
    queries: jax.Array,      # f32[B, D] normalized
    filter_mask: jax.Array,  # float32[Npad]
    n_docs: int,
    identity: bool = False,  # vec_docs is an identity prefix (commit-static)
) -> jax.Array:
    """float32[B, n_docs] — the micro-batched serving path: one matmul for
    the whole query batch (HBM corpus read amortized across B queries).
    With ``identity`` (one vector per doc in insertion order — the common
    committed layout), the B per-row segment scatters collapse to a
    pad/slice."""
    sims = jnp.dot(
        queries.astype(vecs.dtype), vecs.T, preferred_element_type=jnp.float32
    )  # [B, P]
    sims = jnp.maximum(sims, 0.0) * vec_valid[None, :]
    if identity:
        p = sims.shape[1]
        scores = (
            sims[:, :n_docs] if p >= n_docs
            else jnp.pad(sims, ((0, 0), (0, n_docs - p)))
        )
    else:
        scores = jax.vmap(
            lambda row: jax.ops.segment_sum(row, vec_docs, num_segments=n_docs)
        )(sims)
    return scores * filter_mask[None, :]


@functools.partial(jax.jit, static_argnames=("k",))
def batched_topk_sims(
    vecs: jax.Array,     # [P, D]
    queries: jax.Array,  # [Q, D]
    vec_valid: jax.Array,
    k: int,
):
    """Batched exact top-k over raw vector rows (benchmark/recall harness)."""
    sims = jnp.dot(
        queries.astype(vecs.dtype), vecs.T, preferred_element_type=jnp.float32
    )
    sims = jnp.where(vec_valid[None, :] > 0, sims, -jnp.inf)
    return jax.lax.top_k(sims, k)


def normalize_rows(x):
    """Host/device L2 row normalization with zero-row safety."""
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, 1e-12)


@functools.partial(jax.jit, static_argnames=("n_docs",))
def selective_scores(
    vecs: jax.Array,        # [P, D] normalized corpus (full, on device)
    rows: jax.Array,        # int32[Rpad] vector-row ids of the candidates
    row_docs: jax.Array,    # int32[Rpad] owning doc per row (pad -> doc 0)
    row_valid: jax.Array,   # float32[Rpad] 1.0 = real row
    query: jax.Array,       # f32[D] normalized
    n_docs: int,
) -> jax.Array:
    """Gather-then-score fast path for selective filters (SURVEY §7
    "filter selectivity"): score only the filter-surviving docs' vector
    rows instead of the full-corpus matmul-then-mask. Same semantics as
    brute_force_scores restricted to the candidate set."""
    vr = vecs[rows]                                          # [R, D]
    sims = jnp.dot(
        vr, query.astype(vr.dtype), preferred_element_type=jnp.float32
    )
    sims = jnp.maximum(sims, 0.0) * row_valid
    return jnp.zeros((n_docs,), jnp.float32).at[row_docs].add(sims)


@functools.partial(jax.jit, static_argnames=("n_docs",))
def selective_scores_batch(
    vecs: jax.Array,
    rows: jax.Array,
    row_docs: jax.Array,
    row_valid: jax.Array,
    queries: jax.Array,     # f32[B, D] normalized
    n_docs: int,
) -> jax.Array:
    """[B, n_docs] batch variant of selective_scores (shared candidate
    set — the micro-batcher keys on the filter, so a group shares it)."""
    vr = vecs[rows]
    sims = jnp.dot(
        queries.astype(vr.dtype), vr.T, preferred_element_type=jnp.float32
    )  # [B, R]
    sims = jnp.maximum(sims, 0.0) * row_valid[None, :]
    return jax.vmap(
        lambda s: jnp.zeros((n_docs,), jnp.float32).at[row_docs].add(s)
    )(sims)
