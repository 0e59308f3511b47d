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


@functools.partial(jax.jit, static_argnames=("iters", "spherical"))
def kmeans_refine(
    vecs: jax.Array,   # [P, D]
    cents: jax.Array,  # [C, D] initial centroids (e.g. after a skew split)
    iters: int = 3,
    spherical: bool = True,
) -> jax.Array:
    """Lloyd iterations from GIVEN centroids (kmeans inits internally)."""
    n_clusters = cents.shape[0]
    cents = cents.astype(jnp.float32)

    def step(cents, _):
        sims = jnp.dot(vecs, cents.T, preferred_element_type=jnp.float32)
        if not spherical:
            sims = sims - 0.5 * jnp.sum(cents**2, axis=-1)[None, :]
        assign = jnp.argmax(sims, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=jnp.float32)
        sums = jnp.dot(onehot.T, vecs.astype(jnp.float32))
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = jnp.where(counts > 0, sums / jnp.maximum(counts, 1.0), cents)
        if spherical:
            norm = jnp.linalg.norm(new, axis=-1, keepdims=True)
            new = new / jnp.maximum(norm, 1e-9)
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    return cents


def split_skewed(
    vecs: jax.Array,
    cents: jax.Array,
    assign: np.ndarray,
    target: int,
    rng: np.random.Generator,
    rounds: int = 3,
    refine_iters: int = 0,
) -> Tuple[jax.Array, np.ndarray]:
    """Bound the largest cluster: the list table pads to the max cluster
    size (no spilling — the residual-ADC invariant), so one giant cluster
    inflates the [Q, nprobe*cap, D] candidate block for EVERY query.
    Each oversized cluster's centroid is replaced by two symmetric children
    straddling it along the direction of a far member, then membership is
    reassigned GLOBALLY (it must stay the global argmax). refine_iters
    defaults to 0: Lloyd actively RE-COLLAPSES a split isotropic cap (the
    normalized half-cap means drift back to the center — measured 1624/1572
    decaying to 873/2246 in 3 iterations), while the raw bisector split is
    balanced by construction. Exact duplicates cannot be split — rounds
    that make no progress stop."""
    v_host = np.asarray(vecs, np.float32)
    for _ in range(rounds):
        counts = np.bincount(assign, minlength=int(cents.shape[0]))
        big = np.where(counts > target)[0]
        if big.size == 0:
            break
        # Reflect-split each oversized cluster: REPLACE its centroid by two
        # children straddling the center (c ± (m - c), m = a far member of a
        # sample). Seeding a member alongside the center cannot split a
        # spherical cap — the center has the higher dot to almost every cap
        # point, so the seed captures nothing.
        c_host = np.array(cents, np.float32)  # writable copy
        appended = []
        for ci in big:
            members = np.where(assign == ci)[0]
            sample = members if len(members) <= 4096 else rng.choice(
                members, 4096, replace=False
            )
            sims = v_host[sample] @ c_host[ci]
            m = v_host[sample[int(np.argmin(sims))]]
            delta = m - c_host[ci]
            # SYMMETRIC children: project the split direction perpendicular
            # to c, else normalization tilts one child back toward the
            # center and it recaptures the whole cap (measured: the
            # asymmetric child took 3112/3000 blob rows, the other 147)
            delta = delta - float(delta @ c_host[ci]) * c_host[ci]
            if float(np.linalg.norm(delta)) < 1e-7:
                continue  # exact duplicates: nothing to split
            a = c_host[ci] + 0.5 * delta
            b = c_host[ci] - 0.5 * delta
            a /= max(float(np.linalg.norm(a)), 1e-9)
            b /= max(float(np.linalg.norm(b)), 1e-9)
            c_host[ci] = a
            appended.append(b)
        if not appended:
            break
        cents = jnp.asarray(
            np.concatenate([c_host, np.stack(appended)]), jnp.float32
        )
        if refine_iters > 0:
            cents = kmeans_refine(vecs, cents, iters=refine_iters)
        new_assign = assign_clusters_chunked(vecs, cents)
        new_counts = np.bincount(new_assign, minlength=int(cents.shape[0]))
        no_progress = new_counts.max() >= counts.max()
        assign = new_assign
        if no_progress:
            break
    return cents, assign


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
    assign: np.ndarray, n_clusters: int
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Host: pack member row-ids per cluster into a padded [C, cap] table.

    cap = LARGEST cluster size rounded up to 128 (static shape). Every row
    sits in exactly its argmax cluster — an invariant residual IVF-PQ
    depends on: the ADC score adds the probed cluster's centroid dot, so a
    row "spilled" into another cluster's list would be scored against the
    wrong centroid. Skew (one giant cluster inflating cap, and with it the
    [Q, nprobe*cap, D] candidate block) is handled UPSTREAM by
    vector_index.build_ivf's split-and-refine rounds, not by spilling."""
    counts = np.bincount(assign, minlength=n_clusters)
    cap = int(counts.max()) if counts.size else 1
    cap = max(int(np.ceil(cap / 128)) * 128, 128)
    lists = np.zeros((n_clusters, cap), dtype=np.int32)
    lens = np.zeros(n_clusters, dtype=np.int32)
    order = np.argsort(assign, kind="stable")
    sorted_assign = assign[order]
    starts = np.searchsorted(sorted_assign, np.arange(n_clusters))
    ends = np.searchsorted(sorted_assign, np.arange(n_clusters), side="right")
    for c in range(n_clusters):
        members = order[starts[c] : ends[c]]
        lists[c, : len(members)] = members
        lens[c] = len(members)
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
    rotation: jax.Array = None,  # [D, D] OPQ basis: codes quantize
    # (residual @ R); only the ADC LUT needs the rotated query — the
    # centroid probe and the exact rerank stay in the raw basis
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
    q_adc = queries
    if rotation is not None:
        q_adc = jnp.dot(
            queries, rotation.astype(queries.dtype),
            preferred_element_type=jnp.float32,
        ).astype(queries.dtype)
    qsub = q_adc.reshape(q_n, m, ds).transpose(1, 0, 2)     # [M, Q, ds]
    lut = jnp.einsum(
        "mqd,mcd->mqc", qsub, codebooks, preferred_element_type=jnp.float32
    )                                                       # [M, Q, C]
    # gather candidate codes ONCE as uint8 (int32 would 4x the block)
    codes_cand = codes[cand_flat]                           # uint8[Q, N, M]

    # ADC via gather-free compare-accumulate: fori over the C code
    # values; each step is a vector compare + per-query [N, M] @ [M]
    # matvec against the LUT column (take_along_axis moves ~100M
    # gathered elements/s on TPU — measured 5.6x end-to-end in
    # benchmarks/pq_100m_bench.py --adc compare vs scan)
    # bf16 operands on TPU, f32 accumulate — the benchmarked formulation
    # (see ops/pq.pq_topk); CPU lacks BF16xBF16=F32 dots
    op_dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    def b_body(bv, acc):
        eq = (codes_cand == bv.astype(codes_cand.dtype)).astype(
            op_dt
        )                                                   # [Q, N, M]
        lutb = jax.lax.dynamic_slice(
            lut, (0, 0, bv), (m, q_n, 1)
        )[:, :, 0].T.astype(op_dt)                          # [Q, M]
        return acc + jnp.einsum(
            "qnm,qm->qn", eq, lutb, preferred_element_type=jnp.float32
        )

    adc = jax.lax.fori_loop(
        0, c, b_body, jnp.zeros((q_n, nprobe * cap), jnp.float32)
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
