"""Facet counting as masked reductions.

The reference recomputes each facet bucket as a filter and intersects with
the scored set (`collection.rs:1004-1126`). Here the "scored set" is already
a dense matched mask, so each bucket count is

    count = sum(bucket_mask * matched_mask)

one fused reduction per bucket; all buckets of one facet batch into a single
[R, N] masked segment-sum."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def matched_mask(scores: jax.Array) -> jax.Array:
    return (scores > 0).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_docs",))
def number_facet_counts(
    num_vals: jax.Array,    # float32[V]
    num_docs: jax.Array,    # int32[V]
    num_valid: jax.Array,   # bool[V]
    lows: jax.Array,        # float32[R]
    highs: jax.Array,       # float32[R]
    matched: jax.Array,     # float32[Npad]
    n_docs: int,
) -> jax.Array:
    """int32[R]: docs matched per [low, high] bucket (inclusive bounds,
    mirroring NumberFilter::Between used by facets)."""
    in_range = (
        (num_vals[None, :] >= lows[:, None])
        & (num_vals[None, :] <= highs[:, None])
        & num_valid[None, :]
    ).astype(jnp.float32)  # [R, V]
    mask = jax.vmap(
        lambda row: jnp.maximum(
            jax.ops.segment_max(row, num_docs, num_segments=n_docs), 0.0
        )
    )(in_range)
    return jnp.sum(mask * matched[None, :], axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_values",))
def keyword_facet_counts(
    ids: jax.Array,      # float32[V] interned value ids (keyword_index.py)
    docs: jax.Array,     # int32[V]
    valid: jax.Array,    # bool[V]
    matched: jax.Array,  # float32[Npad]
    n_values: int,
) -> jax.Array:
    """int32[n_values]: matched docs per distinct keyword value — one
    segment-sum keyed by value id (a doc contributes once per value; the
    write path dedups values within a doc)."""
    contrib = matched[docs] * valid.astype(jnp.float32)
    return jax.ops.segment_sum(
        contrib, ids.astype(jnp.int32), num_segments=n_values
    ).astype(jnp.int32)


@jax.jit
def bool_facet_counts(
    true_mask: jax.Array,   # float32[Npad] docs where field == true
    has_mask: jax.Array,    # float32[Npad] docs that have the field
    matched: jax.Array,     # float32[Npad]
) -> jax.Array:
    """int32[2]: (count_true, count_false) among matched docs."""
    t = jnp.sum(true_mask * matched)
    f = jnp.sum((has_mask - true_mask) * matched)
    return jnp.stack([t, f]).astype(jnp.int32)
