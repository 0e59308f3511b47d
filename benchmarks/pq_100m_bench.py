"""BASELINE config 5 at 100M vectors on ONE chip: IVF + residual PQ ADC +
exact rerank, recall@10 vs exact ground truth.

What makes 100M-with-exact-rerank fit in 16 GB HBM:
- each corpus row is a pure function of its row id (per-row PRNG key ->
  mixture mode + noise); the exact-rerank stage REGENERATES candidate
  rows from ids, so only PQ codes + IVF lists are resident;
- the codes (100M x 48 uint8 = 4.8 GB) live as GROUPED CHUNK ARRAYS
  ([16, 1M, 48] stacks), never one contiguous buffer — the int8_30m
  lesson: the relay wedges on multi-GB single allocations and un-aliased
  donations, but dozens of <=2 GB independent arrays are fine;
- IVF lists are CHUNK-LOCAL ([4096, capL] per 1M-row chunk, stacked per
  group): no global 100M argsort, no global [CL, cap] table; the search
  probes the same nprobe clusters in every chunk and merges per-group
  top-ck via a fori_loop carry (the full_scan pattern).

Ground truth is computed by a full exact scan during the build pass
(rows are generated chunk-by-chunk and discarded).

The sharded (mesh) variant of this workload is validated on the virtual
8-device mesh in tests/test_parallel.py + tests/test_engine_mesh.py and
benchmarks/sharded_ivfpq_bench.py; this script measures the per-chip
numbers that set the mesh's QPS ceiling.

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
    ap.add_argument("--group", type=int, default=16, help="chunks per group")
    ap.add_argument("--train-sample", type=int, default=262_144)
    ap.add_argument(
        "--packed", action="store_true",
        help="store codes int32-packed (4 u8/word): the ADC candidate "
        "gather moves 4x fewer elements — TPU gather cost scales with "
        "element count, not bytes",
    )
    ap.add_argument(
        "--adc", choices=("scan", "compare"), default="compare",
        help="ADC formulation: 'scan' = M take_along_axis table lookups "
        "(gather-bound, ~100M gathered elements/s on TPU); 'compare' = "
        "fori over the 256 code values, each a vector compare + batched "
        "[NC,M]@[M] matvec — no gathers, MXU/VPU-bound. Measured at 4M: "
        "31.9 -> 178.3 QPS (5.6x), identical recall; packed+compare is "
        "slower (the in-loop unpack outweighs the gather saving)",
    )
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
    GROUP = min(args.group, N_CHUNKS)
    while N_CHUNKS % GROUP:
        GROUP -= 1
    N_GROUPS = N_CHUNKS // GROUP
    CL = args.clusters
    log(
        f"device {jax.devices()[0]}; {N}x{D} as PQ{M} codes "
        f"({N*M/1e9:.1f} GB in {N_GROUPS} groups of {GROUP}x{CHUNK}), "
        f"{args.modes} modes, {CL} chunk-local lists"
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

    # -- build pass: per-chunk programs, stacked into per-group arrays -----
    SLAB = 65_536  # inner slab for the [slab, CL] assign matmul
    while CHUNK % SLAB:
        SLAB //= 2

    # Small independent programs (each compiles separately — the relay's
    # compile time grows sharply and unpredictably with program size).
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
    def encode_rows(v, cents_, assign, books_, books_neg_):
        sub = (v - cents_[assign]).reshape(CHUNK, M, D // M)

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
    def chunk_counts(assign):
        return jnp.zeros((CL,), jnp.int32).at[assign].add(1)

    def make_local_lists(capl):
        @jax.jit
        def local_lists(assign):
            """Chunk-local IVF lists: [CL, capl] local row ids + lens."""
            counts = chunk_counts(assign)
            order = jnp.argsort(assign)              # local rows by cluster
            sorted_cl = assign[order]
            offsets = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(counts)[:-1].astype(jnp.int32)]
            )
            rank = jnp.arange(CHUNK, dtype=jnp.int32) - offsets[sorted_cl]
            lists = jnp.zeros((CL, capl), jnp.int32).at[
                sorted_cl, jnp.minimum(rank, capl - 1)
            ].set(order.astype(jnp.int32))
            return lists, jnp.minimum(counts, capl), jnp.max(counts)

        return local_lists

    @jax.jit
    def gt_merge(gt_v, gt_i, cv, cidx, off):
        gt_v2 = jnp.concatenate([gt_v, cv], axis=1)
        gt_i2 = jnp.concatenate([gt_i, cidx + off], axis=1)
        mv, mi_ = jax.lax.top_k(gt_v2, K)
        return mv, jnp.take_along_axis(gt_i2, mi_, axis=1)

    t0 = time.time()
    code_groups, list_groups, len_groups = [], [], []
    cur_codes, cur_lists, cur_lens = [], [], []
    gt_v = jnp.full((QB, K), -jnp.inf, jnp.float32)
    gt_i = jnp.zeros((QB, K), jnp.int32)
    worst_len = jnp.int32(0)
    CAPL = None
    local_lists = None
    @jax.jit
    def pack_codes(codes_u8):
        return jax.lax.bitcast_convert_type(
            codes_u8.reshape(CHUNK, M // 4, 4), jnp.int32
        )

    for ci in range(N_CHUNKS):
        v = gen_rows(jnp.int32(ci))
        assign = assign_rows(v, cents)
        codes_c = encode_rows(v, cents, assign, books, books_neg)
        if args.packed:
            codes_c = pack_codes(codes_c)
        cv, cidx = gt_chunk(v, queries)
        if CAPL is None:
            # data-driven local list capacity: chunks are iid (same
            # generator), so chunk 0's max list x1.5 bounds the rest;
            # the worst_len assert below still guards the tail
            m0 = int(np.asarray(jnp.max(chunk_counts(assign))))
            CAPL = -(-int(m0 * 1.5 + 32) // 128) * 128
            local_lists = make_local_lists(CAPL)
            log(f"chunk-local list cap {CAPL} (chunk-0 max {m0})")
        lists_c, lens_c, maxlen = local_lists(assign)
        worst_len = jnp.maximum(worst_len, maxlen)
        del v
        gt_v, gt_i = gt_merge(gt_v, gt_i, cv, cidx, jnp.int32(ci * CHUNK))
        cur_codes.append(codes_c)
        cur_lists.append(lists_c)
        cur_lens.append(lens_c)
        if ci == 0:
            log(f"chunk 0 (compile+run) in {time.time()-t0:.1f}s")
        if len(cur_codes) == GROUP:
            code_groups.append(jnp.stack(cur_codes))   # [GROUP, CHUNK, M]
            list_groups.append(jnp.stack(cur_lists))   # [GROUP, CL, CAPL]
            len_groups.append(jnp.stack(cur_lens))     # [GROUP, CL]
            cur_codes, cur_lists, cur_lens = [], [], []
            _ = np.asarray(code_groups[-1][0, 0, 0])   # sync: bound memory
            el = time.time() - t0
            done = (ci + 1) * CHUNK
            log(f"  group {len(code_groups)}/{N_GROUPS} resident "
                f"({done/1e6:.0f}M rows, {el:.0f}s, {done/el:,.0f} rows/s)")
    gt = np.asarray(gt_i)
    wl = int(np.asarray(worst_len))
    assert wl <= CAPL, f"IVF local list overflow: {wl} > {CAPL}"
    log(
        f"build (codes + local lists + exact GT over {N_CHUNKS} chunks) "
        f"in {time.time()-t0:.1f}s — {N/(time.time()-t0):,.0f} rows/s; "
        f"worst local list {wl}/{CAPL}"
    )

    # -- search: shared probe -> per-group chunk-local ADC -> global merge --
    @jax.jit
    def probe_queries(q, cents_):
        csims = jnp.dot(q, cents_.T, preferred_element_type=jnp.float32)
        probe_sims, probe = jax.lax.top_k(csims, args.nprobe)  # [Q, nprobe]
        return probe, probe_sims

    @jax.jit
    def query_lut(q, books_):
        m, c, ds = books_.shape
        qsub = q.reshape(QB, m, ds).transpose(1, 0, 2)
        return jnp.einsum(
            "mqd,mcd->mqc", qsub, books_, preferred_element_type=jnp.float32
        )                                                  # [M, QB, 256]

    NC = args.nprobe * CAPL
    CK = K * args.expand

    @jax.jit
    def search_group(codes_g, lists_g, lens_g, probe, probe_sims, lut,
                     best_v, best_i, base):
        """ADC over one group's chunk-local lists; merges [QB, CK] bests."""
        pos = jax.lax.broadcasted_iota(jnp.int32, (args.nprobe, CAPL), 1)

        def body(gi, carry):
            bv, bi = carry
            cand = lists_g[gi][probe].reshape(QB, NC)       # local row ids
            clens = lens_g[gi][probe]                       # [QB, nprobe]
            valid = (pos[None] < clens[:, :, None]).reshape(QB, NC)
            if args.packed:                     # gather i32 words, unpack
                cw = codes_g[gi][cand]                      # i32[QB,NC,M/4]
                ccodes = jax.lax.bitcast_convert_type(
                    cw, jnp.uint8
                ).reshape(QB, NC, M)
            else:
                ccodes = codes_g[gi][cand]                  # uint8[QB, NC, M]

            if args.adc == "compare":
                def b_body(bv, acc):
                    eq = (ccodes == bv.astype(ccodes.dtype)).astype(
                        jnp.bfloat16
                    )                                       # [QB, NC, M]
                    lb = jax.lax.dynamic_slice(
                        lut, (0, 0, bv), (M, QB, 1)
                    )[:, :, 0].T.astype(jnp.bfloat16)       # [QB, M]
                    return acc + jnp.einsum(
                        "qnm,qm->qn", eq, lb,
                        preferred_element_type=jnp.float32,
                    )

                adc = jax.lax.fori_loop(
                    0, 256, b_body, jnp.zeros((QB, NC), jnp.float32)
                )
            else:
                def adc_body(acc, inputs):
                    lut_m, code_m = inputs
                    return acc + jnp.take_along_axis(
                        lut_m, code_m.astype(jnp.int32), axis=1
                    ), None

                adc, _ = jax.lax.scan(
                    adc_body,
                    jnp.zeros((QB, NC), jnp.float32),
                    (lut, ccodes.transpose(2, 0, 1)),
                )
            # residual scoring: add back q·cents[cluster] (probe slot)
            adc = adc + jnp.repeat(probe_sims, CAPL, axis=1)
            adc = jnp.where(valid, adc, -jnp.inf)
            v, ci_ = jax.lax.top_k(adc, CK)
            rows = jnp.take_along_axis(cand, ci_, axis=1) + base + gi * CHUNK
            bv2 = jnp.concatenate([bv, v], axis=1)
            bi2 = jnp.concatenate([bi, rows], axis=1)
            mv, mi_ = jax.lax.top_k(bv2, CK)
            return mv, jnp.take_along_axis(bi2, mi_, axis=1)

        return jax.lax.fori_loop(0, GROUP, body, (best_v, best_i))

    @jax.jit
    def rerank(q, rows, row_v):
        sims = jnp.einsum(
            "qd,qcd->qc", q, row_v, preferred_element_type=jnp.float32
        )
        v, i = jax.lax.top_k(sims, K)
        return v, jnp.take_along_axis(rows, i, axis=1)

    def full_search(q):
        probe, probe_sims = probe_queries(q, cents)
        lut = query_lut(q, books)
        bv = jnp.full((QB, CK), -jnp.inf, jnp.float32)
        bi = jnp.zeros((QB, CK), jnp.int32)
        for g in range(N_GROUPS):
            bv, bi = search_group(
                code_groups[g], list_groups[g], len_groups[g],
                probe, probe_sims, lut, bv, bi,
                jnp.int32(g * GROUP * CHUNK),
            )
        row_v = row_vecs(bi.reshape(-1)).reshape(QB, CK, D)
        return rerank(q, bi, row_v)

    t0 = time.time()
    _, ids = full_search(queries)
    ids_np = np.asarray(ids)
    log(f"first search (compile+run) in {time.time()-t0:.1f}s")

    recall = float(
        np.mean([len(set(ids_np[i]) & set(gt[i])) / K for i in range(QB)])
    )

    ITERS = 20
    t0 = time.time()
    carry = queries
    for _ in range(ITERS):
        v, _ = full_search(carry)
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
                "resident_gb": round(
                    N * M / 1e9 + N_CHUNKS * CL * (CAPL + 1) * 4 / 1e9, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
