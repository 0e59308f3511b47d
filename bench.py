"""Benchmark: exact vector search (brute-force cosine top-10) on one chip.

BASELINE.md config 2: "exact brute-force cosine top-10 over 1M x 768-d
embeddings (single chip)". The reference engine does this on CPU
(uncommitted/vector.rs brute-force scan; HNSW is approximate). Baseline here
is a numpy f32 matmul+argpartition on this host's CPU over the same data —
the honest stand-in for the Rust engine's per-query scan (BASELINE.md:
"measured, not copied").

Prints ONE JSON line on stdout:
  {"metric": ..., "value": QPS, "unit": "qps", "vs_baseline": speedup}
Details (recall@10 of the bf16 path vs f32 ground truth, timings) on stderr.

Measurement notes:
- The corpus is always an explicit jit argument: a closure capture would
  embed 1.5 GB as an HLO constant and stall the axon remote-compile tunnel.
- The timed loop is a dependency chain closed by one host fetch — under the
  axon relay, block_until_ready alone is not a reliable sync point.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import os

    import jax

    # Remote TPU compiles through the axon tunnel are slow; persist compiled
    # programs so repeat bench runs skip them entirely.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never a requirement
        log(f"compilation cache unavailable: {e}")

    import jax.numpy as jnp

    from orama_core_tpu.ops.pallas_knn import knn_topk

    N, D, K, QB, ITERS = 1_000_000, 768, 10, 64, 50
    BN = 2048
    N_PAD = ((N + BN - 1) // BN) * BN

    dev = jax.devices()[0]
    log(f"device: {dev}")

    # The axon dev relay pays a large, VARIABLE (90-400 s measured)
    # one-time session-establishment cost on the FIRST program execution
    # of a process — unrelated to this engine (a 1-element add pays it
    # too; r02's "373.9 s cold start" was this). Flush it explicitly so
    # the cold-start numbers below measure THIS repo's compiles/caches —
    # what a deployment with a local TPU would see.
    t0 = time.time()
    _ = np.asarray(jnp.ones(8) + 1.0)
    log(f"relay session establish (not an engine cost): {time.time()-t0:.1f}s")

    t0 = time.time()

    # Synthetic corpus via a counter-based integer-hash RNG, NOT
    # jax.random/threefry (90-290 s first-use load through the relay —
    # see utils/benchgen.py, shared with benchmarks/*).
    from orama_core_tpu.utils.benchgen import hashed_unit_corpus

    @jax.jit
    def make_corpus(salt):
        return hashed_unit_corpus(N_PAD, D, salt)

    vecs = make_corpus(jnp.uint32(1))  # rows >= N are padding, masked
    _ = np.asarray(vecs[0, 0])  # sync: splits corpus-gen from search timing
    log(f"corpus generated+synced: {time.time()-t0:.1f}s")
    q_np = np.random.default_rng(7).standard_normal((QB, D)).astype(np.float32)
    q_np /= np.linalg.norm(q_np, axis=-1, keepdims=True)
    queries = jnp.asarray(q_np)
    q_bf16 = queries.astype(jnp.bfloat16)

    # Headline path: fused Pallas matmul+top-k (similarities never touch HBM)
    def pallas_search(corpus, q):
        return knn_topk(corpus, q, k=K, block_rows=BN, n_valid=N)

    @jax.jit
    def chain_step(corpus, q, carry):
        vv, _ = pallas_search(corpus, q + carry.astype(q.dtype) * 0)
        return jnp.max(vv)

    @jax.jit
    def exact_f32(corpus, q):
        sims = jnp.dot(
            q, corpus.T.astype(jnp.float32), preferred_element_type=jnp.float32
        )
        return jax.lax.top_k(sims, K)

    v, i = pallas_search(vecs, q_bf16)
    bf16_idx = np.asarray(i)  # host fetch = true sync
    log(f"corpus + first search (compile+run+sync): {time.time()-t0:.1f}s")

    # warm the chain program, then time the chained loop
    c = np.asarray(chain_step(vecs, q_bf16, jnp.float32(0.0)))
    t0 = time.time()
    carry = jnp.float32(0.0)
    for _ in range(ITERS):
        carry = chain_step(vecs, q_bf16, carry)
    _ = np.asarray(carry)
    dt = time.time() - t0
    qps = QB * ITERS / dt
    log(f"tpu (pallas fused): {ITERS} x {QB} queries in {dt:.3f}s -> "
        f"{qps:.1f} QPS ({dt/ITERS*1e3:.2f} ms per {QB}-query batch)")

    # saturated-serving batch (engine default batch_max=256): the 64-query
    # matmul fills half an MXU output tile, so QPS/chip ~doubles at 256
    QB_BIG = 256
    q_big = jnp.asarray(
        np.random.default_rng(11).standard_normal((QB_BIG, D)), jnp.bfloat16
    )
    try:
        _ = np.asarray(chain_step(vecs, q_big, jnp.float32(0.0)))
        t0 = time.time()
        carry = jnp.float32(0.0)
        for _ in range(ITERS):
            carry = chain_step(vecs, q_big, carry)
        _ = np.asarray(carry)
        dt_big = time.time() - t0
        qps_big = QB_BIG * ITERS / dt_big
        log(f"tpu (pallas fused, batch {QB_BIG}): {qps_big:.1f} QPS "
            f"({dt_big/ITERS*1e3:.2f} ms per batch)")
    except Exception as e:
        log(f"batch-{QB_BIG} path skipped: {e!r}")
        qps_big = qps

    # int8 fused kernel (half the HBM traffic of bf16)
    try:
        from orama_core_tpu.ops.pallas_knn import knn_topk_int8
        from orama_core_tpu.ops.quant import quantize_int8

        codes, scales = quantize_int8(vecs.astype(jnp.float32))

        @jax.jit
        def chain_int8(c, s, q, carry):
            vv, _ = knn_topk_int8(
                c, s, q + carry * 0.0, k=K, block_rows=BN,
                n_valid=N,
            )
            return jnp.max(vv)

        _ = np.asarray(chain_int8(codes, scales, queries, jnp.float32(0.0)))
        t0 = time.time()
        carry = jnp.float32(0.0)
        for _ in range(ITERS):
            carry = chain_int8(codes, scales, queries, carry)
        _ = np.asarray(carry)
        dt8 = time.time() - t0
        log(f"tpu (pallas int8): {QB*ITERS/dt8:.1f} QPS "
            f"({dt8/ITERS*1e3:.2f} ms per batch)")
    except Exception as e:
        log(f"int8 kernel path skipped: {e!r}")

    # recall@10 of the bf16 path vs f32 ground truth on a query subset
    sub = 8
    _, gt_idx = exact_f32(vecs[:N], queries[:sub])
    gt = np.asarray(gt_idx)
    recall = np.mean(
        [len(set(bf16_idx[r]) & set(gt[r])) / K for r in range(sub)]
    )
    log(f"recall@{K} (bf16 vs f32 exact): {recall:.4f}")

    # CPU numpy baseline at FULL corpus size (the host has 125 GB RAM; the
    # corpus is regenerated host-side rather than pulled 3 GB through the
    # relay — the baseline measures the same shape/dtype workload, not the
    # same values). Falls back to slice-scaling only if allocation fails.
    q_np = np.asarray(queries[:8], dtype=np.float32)
    try:
        rng = np.random.default_rng(0)
        v_np = rng.standard_normal((N, D), dtype=np.float32)
        t0 = time.time()
        reps = 2
        for _ in range(reps):
            sims = q_np @ v_np.T
            np.argpartition(-sims, K, axis=1)[:, :K]
        cpu_qps = 8 / ((time.time() - t0) / reps)
        log(f"cpu numpy baseline (direct, {N}x{D}): {cpu_qps:.2f} QPS")
        del v_np
    except MemoryError:
        SLICE = 50_000
        v_np = np.asarray(vecs[:SLICE], dtype=np.float32)
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            sims = q_np @ v_np.T
            np.argpartition(-sims, K, axis=1)[:, :K]
        cpu_dt_slice = (time.time() - t0) / reps
        cpu_qps = 8 / (cpu_dt_slice * (N / SLICE))
        log(f"cpu numpy baseline (scaled from {SLICE}): {cpu_qps:.2f} QPS")

    # headline = saturated-serving throughput (engine-default 256-query
    # micro-batches); the batch-64 figure above stays in the log for
    # round-over-round comparability
    best = max(qps, qps_big)
    print(
        json.dumps(
            {
                "metric": "exact_vector_search_qps_1Mx768_top10",
                "value": round(best, 1),
                "unit": "qps",
                "vs_baseline": round(best / max(cpu_qps, 1e-9), 1),
            }
        ),
        flush=True,
    )

    # Engine-serving metrics at 1M docs (VERDICT r4 next #6: the driver
    # record must capture the serving story, not just the kernel
    # headline). Additional JSON lines; failures here never cost the
    # headline above.
    try:
        engine_serving_metrics()
    except Exception as e:  # noqa: BLE001 — relay faults, OOM, etc.
        import traceback

        log(f"engine serving metrics skipped: {e!r}")
        traceback.print_exc(file=sys.stderr)


def engine_serving_metrics() -> None:
    """Sequential p50 + batched QPS of the full CollectionReader path on
    the 1M synthetic corpus (benchmarks/hybrid_1m_bench.py), printed as
    extra one-line JSON metrics."""
    import os

    import jax

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "benchmarks"),
    )
    from hybrid_1m_bench import build_synthetic_reader

    from orama_core_tpu.models.ai_service import AIService
    from orama_core_tpu.types import SearchParams

    reader = build_synthetic_reader(1_000_000, 50_000, 20, 384)
    ai = AIService()
    rng = np.random.default_rng(42)

    def rand_term(n_words=1):
        ids = (rng.pareto(1.2, n_words) * 50).astype(int) % 50_000
        return " ".join(f"term{t:06d}" for t in ids)

    def p50_ms(mode, n=32, **extra):
        params = [
            SearchParams.from_json({"term": rand_term(), "mode": mode, **extra})
            for _ in range(n)
        ]
        for p in params:  # warm every plan-size bucket
            reader.search(p, ai)
        lat = []
        for p in params:
            t0 = time.time()
            reader.search(p, ai)
            lat.append(time.time() - t0)
        lat.sort()
        return lat[len(lat) // 2] * 1e3

    def batched_qps(mode, n=64, bs=32):
        params = [
            SearchParams.from_json({"term": rand_term(), "mode": mode})
            for _ in range(n)
        ]
        batches = [params[i : i + bs] for i in range(0, n, bs)]
        for b in batches:
            reader.search_batch(b, ai)
        t0 = time.time()
        done = 0
        for b in batches:
            done += len(reader.search_batch(b, ai))
        return done / (time.time() - t0)

    for metric, value, unit in (
        ("bm25_seq_p50_1m", p50_ms("fulltext"), "ms"),
        ("hybrid_rrf_seq_p50_1m", p50_ms("hybrid"), "ms"),
        ("bm25_batched_qps_1m", batched_qps("fulltext"), "qps"),
        ("hybrid_batched_qps_1m", batched_qps("hybrid"), "qps"),
    ):
        log(f"{metric}: {value:.1f} {unit}")
        print(
            json.dumps(
                {"metric": metric, "value": round(value, 1), "unit": unit}
            ),
            flush=True,
        )


if __name__ == "__main__":
    # The axon dev relay occasionally drops a session mid-run ("Broken
    # pipe" on remote_compile) and its TPU worker sometimes goes down
    # entirely for minutes ("Unable to initialize backend 'axon'") —
    # both observed in r3. The driver runs this file ONCE per round, so
    # escalating in-process retries protect the round's headline: worker
    # restarts need minutes, not seconds. Retries reuse the warmed
    # compilation cache, so they are cheap once the backend is back.
    import time as _t
    import traceback

    for attempt, delay in enumerate((30, 120, 300, 600), start=1):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001 — any relay/worker fault
            log(f"bench attempt {attempt} failed ({e!r}); "
                f"retrying in {delay} s")
            traceback.print_exc(file=sys.stderr)
            _t.sleep(delay)
    else:
        main()  # final attempt propagates its failure
