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
