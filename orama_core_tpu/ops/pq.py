"""Product quantization with asymmetric-distance (ADC) scoring.

Supersedes the reference's disabled PQ demo (`bin/embeddings/pq.rs` +
`pq_bench.rs`, which trained a `reductive` PQ offline): here training,
encoding and scoring are all device programs.

- Train: D is split into M subspaces of D/M dims; spherical k-means per
  subspace (vmapped — M trainings run as one batched program).
- Encode: per subspace argmax against its codebook -> uint8 codes [P, M].
  32x compression at D=768, M=96 vs f32.
- Score (ADC): per query build the [M, 256] table of subquery·centroid dot
  products (tiny matmul), then score = sum_m LUT[m, code[p, m]] — a gather
  + segment sum, batched over queries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ivf import kmeans


@functools.partial(jax.jit, static_argnames=("m", "n_codes", "iters"))
def pq_train(
    vecs: jax.Array,  # [P, D]
    key: jax.Array,
    m: int,
    n_codes: int = 256,
    iters: int = 10,
) -> jax.Array:
    """[M, n_codes, D/M] codebooks (one spherical k-means per subspace)."""
    p, d = vecs.shape
    sub = vecs.reshape(p, m, d // m).transpose(1, 0, 2)  # [M, P, ds]
    keys = jax.random.split(key, m)
    return jax.vmap(
        lambda v, k: kmeans(v, k, n_codes, iters, spherical=False)
    )(sub, keys)


@jax.jit
def pq_encode(vecs: jax.Array, codebooks: jax.Array) -> jax.Array:
    """[P, M] uint8 codes: nearest centroid per subspace (dot-product metric,
    consistent with the cosine scoring of normalized corpus vectors)."""
    p, d = vecs.shape
    m = codebooks.shape[0]
    sub = vecs.reshape(p, m, d // m).transpose(1, 0, 2)           # [M, P, ds]
    sims = jnp.einsum(
        "mpd,mcd->mpc", sub, codebooks, preferred_element_type=jnp.float32
    )
    # Euclidean nearest centroid: argmin |v - c|² = argmax (v·c - |c|²/2)
    sims = sims - 0.5 * jnp.sum(codebooks**2, axis=-1)[:, None, :]
    return jnp.argmax(sims, axis=-1).astype(jnp.uint8).T          # [P, M]


@functools.partial(jax.jit, static_argnames=("k",))
def pq_topk(
    codes: jax.Array,      # uint8[P, M]
    codebooks: jax.Array,  # [M, C, ds]
    vec_valid: jax.Array,  # f32[P]
    queries: jax.Array,    # [Q, D]
    k: int,
):
    """Batched ADC top-k: (scores [Q, k], row ids [Q, k])."""
    q, d = queries.shape
    m, c, ds = codebooks.shape
    qsub = queries.reshape(q, m, ds).transpose(1, 0, 2)           # [M, Q, ds]
    lut = jnp.einsum(
        "mqd,mcd->qmc", qsub, codebooks, preferred_element_type=jnp.float32
    )                                                             # [Q, M, C]
    # ADC: scores[q, p] = sum_m lut[q, m, codes[p, m]]. Never materialize
    # [Q, P, M] — scan over subspaces with a [Q, P] accumulator (one [Q, P]
    # gather per subspace; a fused Pallas LUT kernel is the next step).
    codes_i = codes.astype(jnp.int32).T                           # [M, P]
    lut_m_major = lut.transpose(1, 0, 2)                          # [M, Q, C]

    def body(acc, inputs):
        lut_m, code_m = inputs                                    # [Q, C], [P]
        return acc + lut_m[:, code_m], None

    acc0 = jnp.zeros((q, codes.shape[0]), jnp.float32)
    scores, _ = jax.lax.scan(body, acc0, (lut_m_major, codes_i))
    scores = jnp.where(vec_valid[None, :] > 0, scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


@functools.partial(jax.jit, static_argnames=("k", "expand"))
def pq_topk_rerank(
    codes: jax.Array,      # uint8[P, M]
    codebooks: jax.Array,  # [M, C, ds]
    vecs: jax.Array,       # [P, D] full-precision (bf16 ok) for reranking
    vec_valid: jax.Array,
    queries: jax.Array,    # [Q, D]
    k: int,
    expand: int = 10,
):
    """Two-stage search: ADC generates k*expand candidates, exact dot
    products rerank them — the standard PQ serving shape (candidate
    generation is bandwidth-cheap on codes; rerank touches only
    k*expand full rows)."""
    cand_k = min(k * expand, codes.shape[0])
    _, cand = pq_topk(codes, codebooks, vec_valid, queries, cand_k)  # [Q, ck]
    cand_vecs = vecs[cand]                                           # [Q, ck, D]
    sims = jnp.einsum(
        "qd,qcd->qc", queries.astype(cand_vecs.dtype), cand_vecs,
        preferred_element_type=jnp.float32,
    )
    v, i = jax.lax.top_k(sims, k)
    return v, jnp.take_along_axis(cand, i, axis=1)


@jax.jit
def residuals(vecs: jax.Array, cents: jax.Array, assign: jax.Array) -> jax.Array:
    """v - cents[cluster(v)] — what residual IVF-PQ quantizes. Training and
    encoding both run on these; scoring adds back q·cents[cluster] per
    probed cluster (ops/ivf.ivf_pq_search residual=True)."""
    return vecs - cents[assign]


def pq_compression_ratio(d: int, m: int, dtype_bytes: int = 4) -> float:
    return (d * dtype_bytes) / m
