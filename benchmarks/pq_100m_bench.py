"""BASELINE config 5 at 100M vectors on ONE chip: IVF + PQ ADC + exact
rerank, recall@10 vs exact ground truth.

The trick that makes 100M-with-exact-rerank fit in 16 GB HBM: each corpus
row is a pure function of its row id (per-row PRNG key -> mixture mode +
noise). Only the PQ codes (100M x 48 uint8 = 4.8 GB) and the IVF lists
are resident; the exact-rerank stage *regenerates* candidate rows from
their ids. Ground truth is computed by a full exact scan during the build
pass (rows are generated chunk-by-chunk and discarded).

The sharded (mesh) variant of this workload is validated on the virtual
8-device mesh in tests/test_parallel.py + tests/test_engine_mesh.py; this
script measures the per-chip numbers that set the mesh's QPS ceiling.

    python benchmarks/pq_100m_bench.py [--docs 100000000]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--modes", type=int, default=4000)
    ap.add_argument("--clusters", type=int, default=4096)
    ap.add_argument("--pq-m", type=int, default=48)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--expand", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=1_000_000)
    ap.add_argument("--train-sample", type=int, default=262_144)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass

    import jax.numpy as jnp

    from orama_core_tpu.ops import ivf
    from orama_core_tpu.ops.pq import pq_train

    N, D, M, QB, K = args.docs, args.dim, args.pq_m, args.queries, 10
    CHUNK = min(args.chunk, N)
    while N % CHUNK:
        CHUNK //= 2
    N_CHUNKS = N // CHUNK
    CL = args.clusters
    log(
        f"device {jax.devices()[0]}; {N}x{D} as PQ{M} codes "
        f"({N*M/1e9:.1f} GB resident), {args.modes} modes, {CL} IVF lists"
    )

    key = jax.random.PRNGKey(7)
    modes = jax.random.normal(jax.random.PRNGKey(1), (args.modes, D), jnp.float32)
    modes = modes / jnp.linalg.norm(modes, axis=-1, keepdims=True)

    # -- corpus row as a pure function of row id ---------------------------
    # Rows [0, QB*NPLANT) are PLANTED true neighbors: perturbations of the
    # QB query-base rows (the last QB regular rows). This gives each query
    # an unambiguous ground-truth top-10 (cos ~0.99 vs the ~0.94 same-mode
    # background) — without planting, a Gaussian-mixture corpus makes the
    # top-10 boundary a near-tie (~1e-3 gaps) that no compressed index (or
    # meaningful benchmark) can resolve.
    NPLANT = 10

    def _base_vec(i):  # un-normalized mixture row
        k = jax.random.fold_in(key, i)
        kw, kn = jax.random.split(k)
        which = jax.random.randint(kw, (), 0, args.modes)
        noise = jax.random.normal(kn, (D,), jnp.float32)
        return modes[which] + (0.25 / np.sqrt(D)) * noise

    def row_vecs(ids):  # int32[B] -> f32[B, D], unit-norm
        def one(i):
            reg = _base_vec(i)
            src = _base_vec(N - QB + i // NPLANT)
            src = src / jnp.linalg.norm(src)
            kp = jax.random.fold_in(jax.random.PRNGKey(13), i)
            pert = src + (0.12 / np.sqrt(D)) * jax.random.normal(kp, (D,), jnp.float32)
            return jnp.where(i < QB * NPLANT, pert, reg)

        v = jax.vmap(one)(ids)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    # -- train IVF centroids + RESIDUAL PQ codebooks on a sample -----------
    # Residual encoding (FAISS IVF-PQ): quantize v - cents[cluster(v)].
    # Flat PQ at this density measured recall@10 = 0.35 — its noise swamps
    # the within-cluster margins; residual PQ spends all its bits on them.
    t0 = time.time()
    sample = row_vecs(jnp.arange(args.train_sample, dtype=jnp.int32))
    cents = ivf.kmeans(sample, jax.random.PRNGKey(2), CL, iters=8)
    s_assign = jnp.argmax(
        jnp.dot(sample, cents.T, preferred_element_type=jnp.float32), axis=-1
    )
    books = pq_train(sample - cents[s_assign], jax.random.PRNGKey(3), m=M, iters=8)
    books_neg = 0.5 * jnp.sum(books**2, axis=-1)  # [M, 256] encode bias
    _ = np.asarray(books[0, 0, 0])
    log(f"residual PQ codebooks + {CL} IVF centroids trained in {time.time()-t0:.1f}s")

    # queries: perturbations of the QB query-base rows (ids N-QB .. N-1)
    qk = jax.random.PRNGKey(11)
    queries = row_vecs(jnp.arange(N - QB, N, dtype=jnp.int32))
    queries = queries + (0.05 / np.sqrt(D)) * jax.random.normal(
        jax.random.fold_in(qk, 1), (QB, D), jnp.float32
    )
    queries = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True)

    # -- build pass: per-chunk dispatches (compiled once, relay-safe) -------
    # A single whole-corpus program needs multi-GB loop carries; the dev
    # relay wedges above ~8 GB of live allocations and un-aliased carries
    # double the footprint. Per-chunk outputs are ~52 MB; the device work
    # queue keeps everything async with one sync at the end.
    SLAB = 65_536  # inner slab for the [slab, CL] assign matmul
    while CHUNK % SLAB:
        SLAB //= 2

    # Four small programs instead of one (each compiles independently —
    # the relay's compile time grows sharply and unpredictably with
    # program size; a modest fused generator once outlived a 50-minute
    # run before producing a single chunk).
    @jax.jit
    def gen_rows(ci):
        ids = ci * CHUNK + jnp.arange(CHUNK, dtype=jnp.int32)
        return row_vecs(ids)                               # [CHUNK, D] f32

    @jax.jit
    def assign_rows(v, cents_):
        def slab_assign(si, acc):
            s = jax.lax.dynamic_slice(v, (si * SLAB, 0), (SLAB, D))
            sims = jnp.dot(
                s.astype(jnp.bfloat16),
                cents_.T.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return jax.lax.dynamic_update_slice(
                acc, jnp.argmax(sims, axis=-1).astype(jnp.int32), (si * SLAB,)
            )

        return jax.lax.fori_loop(
            0, CHUNK // SLAB, slab_assign, jnp.zeros((CHUNK,), jnp.int32)
        )

    @jax.jit
    def encode_rows(v, books_, books_neg_):
        sub = v.reshape(CHUNK, M, D // M)

        def enc_body(mi, acc):
            sims = jnp.dot(
                sub[:, mi, :], books_[mi].T, preferred_element_type=jnp.float32
            ) - books_neg_[mi][None, :]
            return acc.at[:, mi].set(jnp.argmax(sims, axis=-1).astype(jnp.uint8))

        return jax.lax.fori_loop(0, M, enc_body, jnp.zeros((CHUNK, M), jnp.uint8))

    @jax.jit
    def gt_chunk(v, queries_):
        sims = jnp.dot(
            queries_.astype(jnp.bfloat16),
            v.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jax.lax.top_k(sims, K)

    @jax.jit
    def residual_rows(v, cents_, assign):
        return v - cents_[assign]

    def build_chunk(ci, cents_, books_, books_neg_, queries_):
        v = gen_rows(ci)
        assign = assign_rows(v, cents_)
        codes = encode_rows(residual_rows(v, cents_, assign), books_, books_neg_)
        cv, cidx = gt_chunk(v, queries_)
        return codes, assign, cv, cidx

    @jax.jit
    def gt_merge(gt_v, gt_i, cv, cidx, off):
        gt_v2 = jnp.concatenate([gt_v, cv], axis=1)
        gt_i2 = jnp.concatenate([gt_i, cidx + off], axis=1)
        mv, mi_ = jax.lax.top_k(gt_v2, K)
        return mv, jnp.take_along_axis(gt_i2, mi_, axis=1)

    t0 = time.time()
    code_chunks, assign_chunks = [], []
    gt_v = jnp.full((QB, K), -jnp.inf, jnp.float32)
    gt_i = jnp.zeros((QB, K), jnp.int32)
    for ci in range(N_CHUNKS):
        codes_c, assign_c, cv, cidx = build_chunk(
            jnp.int32(ci), cents, books, books_neg, queries
        )
        code_chunks.append(codes_c)
        assign_chunks.append(assign_c)
        gt_v, gt_i = gt_merge(gt_v, gt_i, cv, cidx, jnp.int32(ci * CHUNK))
        if ci == 0:
            _ = np.asarray(cv[0, 0])  # surface compile problems early
            log(f"chunk 0 (compile+run) in {time.time()-t0:.1f}s")
    gt = np.asarray(gt_i)
    log(
        f"build (codes + assignments + exact GT over {N_CHUNKS} chunks) "
        f"in {time.time()-t0:.1f}s — {N/(time.time()-t0):,.0f} rows/s"
    )
    codes = jnp.concatenate(code_chunks, axis=0)
    assign = jnp.concatenate(assign_chunks, axis=0)
    del code_chunks, assign_chunks
    _ = np.asarray(assign[0])
    log("codes/assignments consolidated")

    # -- IVF lists: counts -> cap -> scatter sorted ids --------------------
    t0 = time.time()

    @jax.jit
    def list_counts(assign_):
        return jnp.zeros((CL,), jnp.int32).at[assign_].add(1)

    counts = list_counts(assign)
    cap = int(np.asarray(jnp.max(counts)))
    cap = ((cap + 127) // 128) * 128
    log(f"max list len {cap} ({N/CL:,.0f} avg)")

    @jax.jit
    def build_lists(assign_):
        order = jnp.argsort(assign_)                       # row ids by cluster
        sorted_cl = assign_[order]
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
        )
        rank = jnp.arange(N, dtype=jnp.int32) - offsets[sorted_cl]
        lists = jnp.zeros((CL, cap), jnp.int32)
        return lists.at[sorted_cl, rank].set(order.astype(jnp.int32))

    lists = build_lists(assign)
    _ = np.asarray(lists[0, 0])
    log(f"IVF lists built in {time.time()-t0:.1f}s")
    del assign

    # -- search: probe -> ADC -> exact rerank on REGENERATED rows ----------
    @functools.partial(jax.jit, static_argnames=("nprobe", "k", "expand"))
    def search(codes_, books_, cents_, lists_, counts_, q, nprobe, k, expand):
        csims = jnp.dot(q, cents_.T, preferred_element_type=jnp.float32)
        probe_sims, probe = jax.lax.top_k(csims, nprobe)   # [Q, nprobe]
        cand = lists_[probe].reshape(QB, nprobe * cap)
        cand_lens = counts_[probe]
        pos = jax.lax.broadcasted_iota(jnp.int32, (nprobe, cap), 1)
        valid = (pos[None] < cand_lens[:, :, None]).reshape(QB, nprobe * cap)

        m, c, ds = books_.shape
        qsub = q.reshape(QB, m, ds).transpose(1, 0, 2)
        lut = jnp.einsum(
            "mqd,mcd->mqc", qsub, books_, preferred_element_type=jnp.float32
        )
        # gather candidate codes ONCE as uint8 (int32 here would 4x the
        # materialized candidate block); cast per-subspace inside the scan
        ccodes = codes_[cand]                              # uint8[Q, NC, M]

        def body(acc, inputs):
            lut_m, code_m = inputs
            return acc + jnp.take_along_axis(lut_m, code_m.astype(jnp.int32), axis=1), None

        adc, _ = jax.lax.scan(
            body,
            jnp.zeros((QB, nprobe * cap), jnp.float32),
            (lut, ccodes.transpose(2, 0, 1)),
        )
        # residual scoring: add back q·cents[cluster] (cluster == probe slot)
        adc = adc + jnp.repeat(probe_sims, cap, axis=1)
        adc = jnp.where(valid, adc, -jnp.inf)
        ck = k * expand
        _, ci_ = jax.lax.top_k(adc, ck)
        rows = jnp.take_along_axis(cand, ci_, axis=1)       # [Q, ck]
        rvalid = jnp.take_along_axis(valid, ci_, axis=1)
        # exact rerank: regenerate candidate rows from ids
        rv = row_vecs(rows.reshape(-1)).reshape(QB, ck, D)
        sims = jnp.einsum("qd,qcd->qc", q, rv, preferred_element_type=jnp.float32)
        sims = jnp.where(rvalid, sims, -jnp.inf)
        v, i = jax.lax.top_k(sims, k)
        return v, jnp.take_along_axis(rows, i, axis=1)

    t0 = time.time()
    _, ids = search(
        codes, books, cents, lists, counts, queries,
        args.nprobe, K, args.expand,
    )
    ids_np = np.asarray(ids)
    log(f"first search (compile+run) in {time.time()-t0:.1f}s")

    recall = float(
        np.mean([len(set(ids_np[i]) & set(gt[i])) / K for i in range(QB)])
    )

    ITERS = 20
    t0 = time.time()
    carry = queries
    for _ in range(ITERS):
        v, _ = search(
            codes, books, cents, lists, counts, carry, args.nprobe, K, args.expand
        )
        # dependency chain without reshaping the query batch
        carry = queries + 0.0 * jnp.mean(v)
    _ = np.asarray(carry[0, 0])
    dt = time.time() - t0
    qps = QB * ITERS / dt
    log(f"{ITERS} x {QB} queries in {dt:.2f}s; recall@10={recall:.4f}")
    print(
        json.dumps(
            {
                "metric": f"ivf_pq_rerank_qps_{N//1_000_000}Mx{D}_top10",
                "value": round(qps, 1),
                "unit": "qps",
                "recall_at_10": round(recall, 4),
                "nprobe": args.nprobe,
                "expand": args.expand,
                "resident_gb": round(N * M / 1e9 + CL * cap * 4 / 1e9, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
