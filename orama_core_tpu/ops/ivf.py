"""IVF (inverted-file) partitioned ANN search.

Replaces the reference's HNSW graph (`committed/vector.rs`, hora crate) —
graph traversal is a pointer-chasing workload that maps terribly onto the
MXU, while IVF is all matmuls (SURVEY.md §7): k-means centroids cluster the
corpus; a query scores the centroid matrix (one small matmul), picks
``nprobe`` clusters, and scans only their members (gathered into a padded
[nprobe, cluster_cap, D] block — static shapes, MXU-batched).

Recall is tunable via nprobe with a brute-force fallback as ground truth
(BASELINE.md config 3: recall@10 >= 0.95)."""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters", "spherical"))
def kmeans(
    vecs: jax.Array,  # [P, D]
    key: jax.Array,
    n_clusters: int,
    iters: int = 10,
    spherical: bool = True,
) -> jax.Array:
    """Lloyd iterations, all MXU. ``spherical=True`` (IVF over normalized
    corpus): assign by max cosine, centroids re-normalized. ``spherical=
    False`` (PQ subspace codebooks): Euclidean assignment
    (argmax v·c - |c|²/2), centroids are plain means — minimizing
    reconstruction error, which is what ADC accuracy depends on."""
    p = vecs.shape[0]
    idx = jax.random.choice(key, p, (n_clusters,), replace=p < n_clusters)
    cents = vecs[idx].astype(jnp.float32)

    def step(cents, _):
        sims = jnp.dot(vecs, cents.T, preferred_element_type=jnp.float32)  # [P, C]
        if not spherical:
            sims = sims - 0.5 * jnp.sum(cents**2, axis=-1)[None, :]
        assign = jnp.argmax(sims, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)      # [P, C]
        sums = jnp.dot(onehot.T, vecs.astype(jnp.float32))                  # [C, D]
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        if spherical:
            norm = jnp.linalg.norm(new, axis=-1, keepdims=True)
            new = new / jnp.maximum(norm, 1e-9)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    return cents


@jax.jit
def assign_clusters(vecs: jax.Array, cents: jax.Array) -> jax.Array:
    sims = jnp.dot(vecs, cents.T.astype(vecs.dtype), preferred_element_type=jnp.float32)
    return jnp.argmax(sims, axis=1).astype(jnp.int32)


def assign_clusters_chunked(
    vecs: jax.Array, cents: jax.Array, chunk: int = 1_000_000
):
    """Row-chunked assignment: the [P, C] similarity matrix of a 10M corpus
    would not fit HBM in one piece."""
    import numpy as np

    out = np.zeros(vecs.shape[0], dtype=np.int32)
    for i in range(0, vecs.shape[0], chunk):
        out[i : i + chunk] = np.asarray(
            assign_clusters(vecs[i : i + chunk], cents)
        )
    return out


def build_ivf_lists(
    assign: np.ndarray, n_clusters: int, cap_quantile: float = 0.98
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host: pack member row-ids per cluster into a padded [C, cap] table.

    cap is the quantile of cluster sizes rounded up to 128 (static shape);
    overflow rows spill into their next-best cluster is NOT done — they are
    appended round-robin to clusters with space, keeping exactness of
    membership (every row appears once). Returns (lists, list_lens, cap)."""
    counts = np.bincount(assign, minlength=n_clusters)
    cap = int(np.quantile(counts, cap_quantile)) if len(counts) else 1
    cap = max(int(np.ceil(max(cap, counts.max() if counts.size else 1) / 128)) * 128, 128)
    lists = np.zeros((n_clusters, cap), dtype=np.int32)
    lens = np.zeros(n_clusters, dtype=np.int32)
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(n_clusters))
    ends = np.searchsorted(sorted_assign, np.arange(n_clusters), side="right")
    for c in range(n_clusters):
        members = order[starts[c] : ends[c]]
        n = min(len(members), cap)
        lists[c, :n] = members[:n]
        lens[c] = n
        # overflow beyond cap spills to the globally least-full clusters
        for m in members[cap:]:
            t = int(np.argmin(lens))
            if lens[t] >= cap:
                raise ValueError("IVF capacity exhausted; raise cap_quantile")
            lists[t, lens[t]] = m
            lens[t] += 1
    return lists, lens, cap


@functools.partial(jax.jit, static_argnames=("nprobe", "k"))
def ivf_search(
    vecs: jax.Array,       # [P, D] corpus (bf16/f32)
    cents: jax.Array,      # [C, D]
    lists: jax.Array,      # int32[C, cap]
    list_lens: jax.Array,  # int32[C]
    queries: jax.Array,    # [Q, D]
    nprobe: int,
    k: int,
):
    """Batched IVF kNN: (scores [Q, k], row_ids [Q, k])."""
    csims = jnp.dot(
        queries, cents.T.astype(queries.dtype), preferred_element_type=jnp.float32
    )  # [Q, C]
    _, probe = jax.lax.top_k(csims, nprobe)                # [Q, nprobe]
    cand = lists[probe]                                    # [Q, nprobe, cap]
    cand_lens = list_lens[probe]                           # [Q, nprobe]
    cap = lists.shape[1]
    cand_flat = cand.reshape(queries.shape[0], nprobe * cap)
    cand_vecs = vecs[cand_flat]                            # [Q, nprobe*cap, D]
    sims = jnp.einsum(
        "qd,qnd->qn", queries.astype(cand_vecs.dtype), cand_vecs,
        preferred_element_type=jnp.float32,
    )
    pos = jax.lax.broadcasted_iota(jnp.int32, (nprobe, cap), 1)
    valid = (pos[None] < cand_lens[:, :, None]).reshape(
        queries.shape[0], nprobe * cap
    )
    sims = jnp.where(valid, sims, -jnp.inf)
    v, i = jax.lax.top_k(sims, k)
    return v, jnp.take_along_axis(cand_flat, i, axis=1)


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "expand", "residual"))
def ivf_pq_search(
    codes: jax.Array,      # uint8[P, M] PQ codes (the scan reads these, not vecs)
    codebooks: jax.Array,  # [M, C, ds]
    vecs: jax.Array,       # [P, D] full-precision rows (rerank only)
    cents: jax.Array,      # [Cl, D] IVF centroids
    lists: jax.Array,      # int32[Cl, cap]
    list_lens: jax.Array,  # int32[Cl]
    queries: jax.Array,    # [Q, D]
    nprobe: int,
    k: int,
    expand: int = 10,
    residual: bool = False,
):
    """IVF + PQ + exact rerank (VERDICT r1 item 10; the engine's scale
    vector mode): probe ``nprobe`` clusters, score their members by PQ ADC
    (bandwidth: M bytes/row instead of 2-4*D), take k*expand candidates,
    rerank those rows exactly. Returns (scores [Q, k], row ids [Q, k]).

    ``residual=True`` is the FAISS-style IVF-PQ variant: codes quantize
    ``v - cents[cluster(v)]`` and the ADC score adds the query-centroid
    dot of the candidate's probed cluster. At scale this matters a lot:
    flat PQ wastes its capacity re-encoding the cluster's shared
    component, and its quantization noise swamps the within-cluster
    margins that decide the top-k (measured: recall@10 0.35 flat vs
    >0.95 residual at 30M, benchmarks/pq_100m_bench.py).

    Replaces the reference's HNSW recall/speed trade (committed/vector.rs:
    36-236) with a partition+compression trade that keeps the MXU busy."""
    q_n = queries.shape[0]
    cap = lists.shape[1]
    csims = jnp.dot(
        queries, cents.T.astype(queries.dtype), preferred_element_type=jnp.float32
    )
    probe_sims, probe = jax.lax.top_k(csims, nprobe)        # [Q, nprobe]
    cand_flat = lists[probe].reshape(q_n, nprobe * cap)     # [Q, N]
    cand_lens = list_lens[probe]                            # [Q, nprobe]
    pos = jax.lax.broadcasted_iota(jnp.int32, (nprobe, cap), 1)
    valid = (pos[None] < cand_lens[:, :, None]).reshape(q_n, nprobe * cap)

    # ADC over candidates: per-subspace LUT gather, [Q, N] accumulator
    m, c, ds = codebooks.shape
    qsub = queries.reshape(q_n, m, ds).transpose(1, 0, 2)   # [M, Q, ds]
    lut = jnp.einsum(
        "mqd,mcd->mqc", qsub, codebooks, preferred_element_type=jnp.float32
    )                                                       # [M, Q, C]
    # gather candidate codes ONCE as uint8 (int32 would 4x the block);
    # cast per-subspace inside the scan
    codes_cand = codes[cand_flat]                           # uint8[Q, N, M]

    def body(acc, inputs):
        lut_m, code_m = inputs                              # [Q, C], [Q, N]
        return acc + jnp.take_along_axis(lut_m, code_m.astype(jnp.int32), axis=1), None

    acc0 = jnp.zeros((q_n, nprobe * cap), jnp.float32)
    adc, _ = jax.lax.scan(
        body, acc0, (lut, codes_cand.transpose(2, 0, 1))
    )
    if residual:
        # score = q . cents[cluster] + q . residual — the candidate's
        # cluster IS its probe slot, so the offset broadcasts per slot
        # (no per-candidate gather)
        adc = adc + jnp.repeat(probe_sims, cap, axis=1)
    adc = jnp.where(valid, adc, -jnp.inf)
    ck = min(k * expand, nprobe * cap)
    _, ci = jax.lax.top_k(adc, ck)                          # [Q, ck]
    rows = jnp.take_along_axis(cand_flat, ci, axis=1)
    # exact rerank on full-precision rows
    cand_vecs = vecs[rows]                                  # [Q, ck, D]
    sims = jnp.einsum(
        "qd,qcd->qc", queries.astype(cand_vecs.dtype), cand_vecs,
        preferred_element_type=jnp.float32,
    )
    sims = jnp.where(
        jnp.take_along_axis(valid, ci, axis=1), sims, -jnp.inf
    )
    v, i = jax.lax.top_k(sims, k)
    return v, jnp.take_along_axis(rows, i, axis=1)


def ivf_recall_at_k(vecs_np, cents, lists, lens, queries_np, nprobe, k=10) -> float:
    """Host harness: recall vs exact brute force (tuning helper)."""
    v, ids = ivf_search(
        jnp.asarray(vecs_np), cents, jnp.asarray(lists), jnp.asarray(lens),
        jnp.asarray(queries_np), nprobe, k,
    )
    exact = np.argsort(-(queries_np @ vecs_np.T), axis=1)[:, :k]
    got = np.asarray(ids)
    return float(
        np.mean([len(set(got[q]) & set(exact[q])) / k for q in range(len(queries_np))])
    )
