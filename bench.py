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
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    N, D, K, QB, ITERS = 1_000_000, 768, 10, 64, 10

    dev = jax.devices()[0]
    log(f"device: {dev}")

    t0 = time.time()
    key = jax.random.PRNGKey(0)
    kv, kq = jax.random.split(key)

    @jax.jit
    def make_corpus(k):
        v = jax.random.normal(k, (N, D), jnp.bfloat16)
        n = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, -1, keepdims=True))
        return (v.astype(jnp.float32) / jnp.maximum(n, 1e-9)).astype(jnp.bfloat16)

    vecs = make_corpus(kv)
    vecs.block_until_ready()
    log(f"corpus built on device in {time.time()-t0:.1f}s "
        f"({vecs.nbytes/1e9:.2f} GB bf16)")

    queries = jax.random.normal(kq, (QB, D), jnp.float32)
    queries = queries / jnp.linalg.norm(queries, axis=-1, keepdims=True)

    @jax.jit
    def search(q):
        sims = jnp.dot(
            q.astype(jnp.bfloat16), vecs.T, preferred_element_type=jnp.float32
        )
        return jax.lax.top_k(sims, K)

    t0 = time.time()
    v, i = search(queries)
    v.block_until_ready()
    log(f"first call (compile+run): {time.time()-t0:.1f}s")

    t0 = time.time()
    for _ in range(ITERS):
        v, i = search(queries)
    v.block_until_ready()
    dt = time.time() - t0
    qps = QB * ITERS / dt
    log(f"tpu: {ITERS} x {QB} queries in {dt:.3f}s -> {qps:.1f} QPS")

    # recall@10 of the bf16 path vs f32 ground truth on a query subset
    sub = 8
    gt_sims = jnp.dot(
        queries[:sub], vecs.T.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    _, gt_idx = jax.lax.top_k(gt_sims, K)
    got = np.asarray(i[:sub])
    gt = np.asarray(gt_idx)
    recall = np.mean(
        [len(set(got[r]) & set(gt[r])) / K for r in range(sub)]
    )
    log(f"recall@{K} (bf16 vs f32 exact): {recall:.4f}")

    # CPU numpy baseline on a slice, scaled linearly to N
    SLICE = 50_000
    v_np = np.asarray(vecs[:SLICE], dtype=np.float32)
    q_np = np.asarray(queries[:8], dtype=np.float32)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        sims = q_np @ v_np.T
        np.argpartition(-sims, K, axis=1)[:, :K]
    cpu_dt_slice = (time.time() - t0) / reps
    cpu_qps = 8 / (cpu_dt_slice * (N / SLICE))
    log(f"cpu numpy baseline (scaled from {SLICE}): {cpu_qps:.2f} QPS")

    print(
        json.dumps(
            {
                "metric": "exact_vector_search_qps_1Mx768_top10",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / max(cpu_qps, 1e-9), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
