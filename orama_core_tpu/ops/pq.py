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
    rotation: jax.Array = None,  # [D, D] OPQ basis (codes live in v @ R)
):
    """Batched ADC top-k: (scores [Q, k], row ids [Q, k])."""
    if rotation is not None:
        queries = jnp.dot(
            queries, rotation.astype(queries.dtype),
            preferred_element_type=jnp.float32,
        ).astype(queries.dtype)
    q, d = queries.shape
    m, c, ds = codebooks.shape
    qsub = queries.reshape(q, m, ds).transpose(1, 0, 2)           # [M, Q, ds]
    lut = jnp.einsum(
        "mqd,mcd->qmc", qsub, codebooks, preferred_element_type=jnp.float32
    )                                                             # [Q, M, C]
    # ADC: scores[q, p] = sum_m lut[q, m, codes[p, m]]. Gather-free
    # compare-accumulate: fori over the C code values — the membership
    # mask (codes == b) is QUERY-INDEPENDENT, so each step is one
    # [P, M] @ [M, Q] MXU matmul against the LUT column. TPU
    # take_along_axis moves ~100M gathered elements/s; this formulation
    # measured 5.6x faster end-to-end at 4M docs
    # (benchmarks/pq_100m_bench.py --adc compare vs scan).
    lut_m_major = lut.transpose(1, 0, 2)                          # [M, Q, C]

    # bf16 operands on TPU (eq is exact 0/1, the LUT rounds to ~3 decimal
    # digits — noise next to PQ quantization error), f32 accumulate: the
    # formulation the 5.6x receipt benchmarked; f32 operands double the
    # bandwidth and halve the MXU rate. The CPU backend lacks
    # BF16xBF16=F32 dots, so tests trace the f32 variant.
    op_dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def b_body(bv, acc):
        eq = (codes == bv.astype(codes.dtype)).astype(op_dt)
        lutb = jax.lax.dynamic_slice(
            lut_m_major, (0, 0, bv), (m, q, 1)
        )[:, :, 0].astype(op_dt)                                  # [M, Q]
        return acc + jnp.dot(
            eq, lutb, preferred_element_type=jnp.float32
        ).T                                                       # [Q, P]

    scores = jax.lax.fori_loop(
        0, c, b_body, jnp.zeros((q, codes.shape[0]), jnp.float32)
    )
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
    rotation: jax.Array = None,  # [D, D] OPQ basis for the ADC stage
):
    """Two-stage search: ADC generates k*expand candidates, exact dot
    products rerank them — the standard PQ serving shape (candidate
    generation is bandwidth-cheap on codes; rerank touches only
    k*expand full rows). Rerank uses the UNrotated query against the
    stored full-precision rows."""
    cand_k = min(k * expand, codes.shape[0])
    _, cand = pq_topk(
        codes, codebooks, vec_valid, queries, cand_k, rotation=rotation
    )  # [Q, ck]
    cand_vecs = vecs[cand]                                           # [Q, ck, D]
    sims = jnp.einsum(
        "qd,qcd->qc", queries.astype(cand_vecs.dtype), cand_vecs,
        preferred_element_type=jnp.float32,
    )
    v, i = jax.lax.top_k(sims, k)
    return v, jnp.take_along_axis(cand, i, axis=1)


@jax.jit
def pq_reconstruct(codes: jax.Array, codebooks: jax.Array) -> jax.Array:
    """[P, D] quantizer reconstruction: concat each subspace's chosen
    centroid (what ADC implicitly scores against)."""
    m, c, ds = codebooks.shape
    parts = jnp.take_along_axis(
        codebooks[:, None, :, :],                    # [M, 1, C, ds]
        codes.T[:, :, None, None].astype(jnp.int32), # [M, P, 1, 1]
        axis=2,
    )[:, :, 0, :]                                    # [M, P, ds]
    return parts.transpose(1, 0, 2).reshape(codes.shape[0], m * ds)


def choose_rotation(vecs: jax.Array, m: int, key, n_codes: int = 256):
    """Data-driven OPQ decision: train trial codebooks raw vs PCA-balanced
    on a sample and keep the basis with the lower HELD-OUT reconstruction
    error (exactly what ADC accuracy depends on; orthonormal rotations
    leave the error comparable across bases). Measured both ways on
    synthetic corpora: rotation wins on sparse/lexical-style embeddings
    (+3-4 recall pts) and LOSES badly when the raw basis carries strong
    intra-subspace correlation that PCA destroys (-19 pts on a mixed
    decaying spectrum) — so neither default is safe; measure per corpus.
    Returns the [D, D] rotation or None."""
    import numpy as np

    n = vecs.shape[0]
    n_tr = min(n, 16_384)
    n_ho = min(max(n - n_tr, 0), 4_096)
    if n_ho < 256:  # tiny corpora: hold out a slice of the training rows
        n_tr = max(1, (n * 3) // 4)
        n_ho = n - n_tr
    if n_ho <= 0 or m <= 1:
        return None
    train, hold = vecs[:n_tr], vecs[n_tr : n_tr + n_ho]
    rot = jnp.asarray(opq_rotation(train, m))

    def held_out_mse(tr, ho):
        books = pq_train(tr, key, m=m, n_codes=n_codes)
        recon = pq_reconstruct(pq_encode(ho, books), books)
        return float(jnp.mean((ho - recon) ** 2))

    raw = held_out_mse(train, hold)
    rotated = held_out_mse(
        jnp.dot(train, rot, preferred_element_type=jnp.float32),
        jnp.dot(hold, rot, preferred_element_type=jnp.float32),
    )
    return np.asarray(rot) if rotated < raw else None


def opq_rotation(vecs: jax.Array, m: int) -> "np.ndarray":
    """Parametric OPQ rotation (Ge et al., CVPR'13 eigenvalue allocation):
    an orthonormal R [D, D] such that quantizing ``v @ R`` balances
    variance across the M subspaces.

    Plain PQ quantizes axis-aligned slices of the raw basis; on real
    embeddings (and on IVF residuals) variance is anisotropic and
    correlated ACROSS slice boundaries, so some subspaces carry most of
    the quantization-relevant energy while their codebooks have the same
    256 codes as the starved ones. PCA decorrelates; the greedy allocation
    assigns eigen-directions (descending variance) to the subspace with
    the smallest log-variance product, balancing per-subspace information.
    One eigh + a greedy pass — no alternating optimization; recovers most
    of full OPQ's gain. ADC stays exact in the rotated basis because R is
    orthonormal: q·r = (qR)·(rR)."""
    import numpy as np

    v = jnp.asarray(vecs, jnp.float32)
    mean = jnp.mean(v, axis=0, keepdims=True)
    vc = v - mean
    cov = np.asarray(
        jnp.dot(vc.T, vc, preferred_element_type=jnp.float32)
    ) / max(v.shape[0], 1)
    w, u = np.linalg.eigh(cov)             # ascending eigenvalues
    order = np.argsort(w)[::-1]
    w, u = w[order], u[:, order]
    d = cov.shape[0]
    ds = d // m
    buckets: list = [[] for _ in range(m)]
    sums = np.zeros(m)
    for i in range(d):
        free = [b for b in range(m) if len(buckets[b]) < ds]
        b = min(free, key=lambda b: sums[b])
        buckets[b].append(i)
        sums[b] += float(np.log(max(w[i], 1e-12)))
    perm = [i for b in range(m) for i in buckets[b]]
    return np.ascontiguousarray(u[:, perm], dtype=np.float32)  # v @ R


@jax.jit
def residuals(vecs: jax.Array, cents: jax.Array, assign: jax.Array) -> jax.Array:
    """v - cents[cluster(v)] — what residual IVF-PQ quantizes. Training and
    encoding both run on these; scoring adds back q·cents[cluster] per
    probed cluster (ops/ivf.ivf_pq_search residual=True)."""
    return vecs - cents[assign]


def pq_compression_ratio(d: int, m: int, dtype_bytes: int = 4) -> float:
    return (d * dtype_bytes) / m
