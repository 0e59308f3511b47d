"""Metadata filters as dense device masks.

The reference evaluates filters into ``HashSet<DocumentId>`` and intersects
sets (`collection.rs:797-869`, paged range scans in `committed/number.rs`).
Here a filter is a dense float mask over the padded doc space, computed with
static-shape vector compares + scatter — masks compose by elementwise
multiply and fuse straight into the scoring kernels.

Number index layout: values sorted ascending, ``num_vals f32[V]`` with the
owning ``num_docs int32[V]``. A range filter is a vectorized compare over V
(bandwidth-bound, no dynamic shapes) scattered with max into the doc space.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("n_docs",))
def number_range_mask(
    num_vals: jax.Array,   # float32[V] (sorted; order irrelevant to the math)
    num_docs: jax.Array,   # int32[V]
    num_valid: jax.Array,  # bool[V]
    low: jax.Array,        # float32[] inclusive unless made exclusive by caller
    high: jax.Array,       # float32[]
    low_excl: jax.Array,   # bool[]
    high_excl: jax.Array,  # bool[]
    n_docs: int,
) -> jax.Array:
    ge = jnp.where(low_excl, num_vals > low, num_vals >= low)
    le = jnp.where(high_excl, num_vals < high, num_vals <= high)
    in_range = (ge & le & num_valid).astype(jnp.float32)
    return jnp.maximum(
        jax.ops.segment_max(in_range, num_docs, num_segments=n_docs), 0.0
    )


@jax.jit
def number_range_mask_dense(
    vals_by_doc: jax.Array,  # f32[n_docs], NaN where the doc has no value
    low: jax.Array,
    high: jax.Array,
    low_excl: jax.Array,
    high_excl: jax.Array,
) -> jax.Array:
    """Doc-major range mask — the single-value-per-doc common case. The
    committed column re-indexed BY DOC at device-cache build makes the
    filter a pure elementwise compare: no [V]->[n_docs] segment scatter
    (segment_max at 1M->1M measured ~30+ ms device-side in the fused
    program — the whole r4 'filtered hybrid +35 ms' delta). NaN fill
    for valueless docs: every compare is False, so no has-mask needed."""
    ge = jnp.where(low_excl, vals_by_doc > low, vals_by_doc >= low)
    le = jnp.where(high_excl, vals_by_doc < high, vals_by_doc <= high)
    return (ge & le).astype(jnp.float32)


@jax.jit
def number_eq_mask_dense(vals_by_doc: jax.Array, value: jax.Array) -> jax.Array:
    return (vals_by_doc == value).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("n_docs",))
def number_eq_mask(
    num_vals: jax.Array,
    num_docs: jax.Array,
    num_valid: jax.Array,
    value: jax.Array,
    n_docs: int,
) -> jax.Array:
    eq = ((num_vals == value) & num_valid).astype(jnp.float32)
    return jnp.maximum(
        jax.ops.segment_max(eq, num_docs, num_segments=n_docs), 0.0
    )


@functools.partial(jax.jit, static_argnames=("n_docs",))
def value_set_mask(
    vals: jax.Array,      # float32[V] interned keyword value ids
    docs: jax.Array,      # int32[V]
    valid: jax.Array,     # bool[V]
    wanted: jax.Array,    # float32[K] wanted value ids (pad with -1)
    n_docs: int,
) -> jax.Array:
    """Keyword eq/in filter: docs whose value id is in `wanted`
    (keyword_index.py layout; same segment-max shape as the number masks)."""
    hit = jnp.any(vals[None, :] == wanted[:, None], axis=0) & valid
    return jnp.maximum(
        jax.ops.segment_max(hit.astype(jnp.float32), docs, num_segments=n_docs), 0.0
    )


@jax.jit
def value_set_mask_dense(
    plane: jax.Array,   # float32[n_docs] value id per doc (-2 = no value)
    wanted: jax.Array,  # float32[K] wanted value ids (pad with -1)
) -> jax.Array:
    """Doc-major keyword eq/in filter — the single-value-per-doc common
    case (same dense-plane treatment as number_range_mask_dense: the
    committed column re-indexed BY DOC at device-cache build replaces
    the [V]->[n_docs] segment_max scatter with an elementwise compare).
    The -2 fill for valueless docs matches neither real ids (>= 0) nor
    the -1 pad of ``wanted``."""
    return jnp.any(
        plane[:, None] == wanted[None, :], axis=1
    ).astype(jnp.float32)


@jax.jit
def combine_masks(a: jax.Array, b: jax.Array) -> jax.Array:
    """Filter intersection == elementwise multiply of {0,1} masks."""
    return a * b
