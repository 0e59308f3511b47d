"""Int8 vector compression — the TPU-idiomatic replacement for the
reference's vestigial product-quantization demo (`bin/embeddings/pq.rs`).

Per-vector symmetric int8: v_q = round(127 * v / max|v|), scale = max|v|/127.
Scoring is a pure int8 MXU matmul (int32 accumulation) rescaled by the
per-vector scales — 4x less HBM traffic than f32, ~2x less than bf16, with
recall@10 ≈ 1.0 on normalized embeddings. PQ (ops/pq.py) adds the higher-
compression option."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@jax.jit
def quantize_int8(vecs: jax.Array):
    """[P, D] f32 -> (codes int8[P, D], scales f32[P])."""
    absmax = jnp.max(jnp.abs(vecs), axis=-1)
    scale = jnp.maximum(absmax, 1e-9) / 127.0
    codes = jnp.clip(jnp.round(vecs / scale[:, None]), -127, 127).astype(jnp.int8)
    return codes, scale.astype(jnp.float32)


@jax.jit
def dequantize_int8(codes: jax.Array, scales: jax.Array) -> jax.Array:
    return codes.astype(jnp.float32) * scales[:, None]


@functools.partial(jax.jit, static_argnames=("n_docs",))
def int8_brute_force_scores(
    codes: jax.Array,        # int8[P, D]
    scales: jax.Array,       # f32[P]
    vec_docs: jax.Array,     # int32[P]
    vec_valid: jax.Array,    # f32[P]
    query: jax.Array,        # f32[D] (quantized on the fly)
    filter_mask: jax.Array,  # f32[Npad]
    n_docs: int,
) -> jax.Array:
    """Same contract as ops.vector.brute_force_scores, int8 storage."""
    q_absmax = jnp.maximum(jnp.max(jnp.abs(query)), 1e-9)
    q_scale = q_absmax / 127.0
    q8 = jnp.clip(jnp.round(query / q_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        codes, q8,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sims = acc.astype(jnp.float32) * scales * q_scale
    sims = jnp.maximum(sims, 0.0) * vec_valid
    scores = jax.ops.segment_sum(sims, vec_docs, num_segments=n_docs)
    return scores * filter_mask


@functools.partial(jax.jit, static_argnames=("k",))
def int8_topk_sims(codes, scales, vec_valid, queries, k: int):
    """Batched int8 exact top-k (bench/recall harness)."""
    q_absmax = jnp.maximum(jnp.max(jnp.abs(queries), axis=-1, keepdims=True), 1e-9)
    q_scale = q_absmax / 127.0
    q8 = jnp.clip(jnp.round(queries / q_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q8, codes,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    sims = acc.astype(jnp.float32) * scales[None, :] * q_scale
    sims = jnp.where(vec_valid[None, :] > 0, sims, -jnp.inf)
    return jax.lax.top_k(sims, k)
