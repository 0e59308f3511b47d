"""Top-k selection over dense score arrays.

Replaces the reference's `CappedHeap` bounded min-heap (`capped_heap.rs`).
On TPU the idiomatic form is `jax.lax.top_k` over the dense score array —
XLA lowers it to a partial sort that lives entirely in registers/VMEM; for
sharded meshes each shard takes a local top-k and the k-per-shard results
are all-gathered and re-topped (see parallel/sharded_search.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("k",))
def topk(scores: jax.Array, k: int):
    """(values f32[k], indices int32[k]) sorted descending.

    Entries with score <= 0 are unmatched; callers trim them host-side
    (values are returned as-is so the caller can count matches)."""
    vals, idx = jax.lax.top_k(scores, k)
    return vals, idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def topk_with_count(scores: jax.Array, k: int):
    vals, idx = jax.lax.top_k(scores, k)
    count = jnp.sum(scores > 0).astype(jnp.int32)
    return vals, idx.astype(jnp.int32), count
