"""Synthetic benchmark corpora via a counter-based integer-hash RNG.

NOT jax.random/threefry: the threefry program's first-use load through the
axon dev relay measured 90-290 s (vs 0.9 s for a plain elementwise program
of the same output size) and dominated the r02 "cold start" regression
(BENCH_NOTES.md). Irwin-Hall (sum of 4 hashed uniforms) is plenty normal
for benchmark direction vectors; rows are L2-normalized anyway.

Shared by bench.py and benchmarks/* so the corpus definition can never
drift between the driver headline and the tuning harnesses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hashed_unit_corpus(n_pad: int, d: int, salt, dtype=jnp.bfloat16):
    """[n_pad, d] L2-normalized pseudo-random rows, deterministic in
    (n_pad, d, salt). ``salt`` is a jnp.uint32 scalar (traceable)."""
    idx = jax.lax.broadcasted_iota(
        jnp.uint32, (n_pad, d), 0
    ) * jnp.uint32(d) + jax.lax.broadcasted_iota(jnp.uint32, (n_pad, d), 1)
    v = jnp.zeros((n_pad, d), jnp.float32)
    for s in (1, 2, 3, 4):  # Irwin-Hall(4) ~ N(0, 1/3): normal enough
        x = idx * jnp.uint32(2654435761) + salt * jnp.uint32(s)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(2246822519)
        x = x ^ (x >> 13)
        x = x * jnp.uint32(3266489917)
        x = x ^ (x >> 16)
        v = v + x.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
    v = v - 2.0
    n = jnp.sqrt(jnp.sum(v * v, -1, keepdims=True))
    return (v / jnp.maximum(n, 1e-9)).astype(dtype)
