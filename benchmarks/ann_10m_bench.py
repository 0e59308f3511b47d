"""ANN at 10M vectors (BASELINE.md config 3): IVF recall@10 vs exact ground
truth, with a QPS sweep over nprobe. Target: recall@10 >= 0.95.

The 10M x 384 bf16 corpus (7.4 GB) is synthesized on-device as a Gaussian
mixture (realistic clustered embeddings; uniform random is IVF's
pathological case and unrepresentative of real encoders).

    python benchmarks/ann_10m_bench.py [--docs 10000000] [--clusters 1024]
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
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--modes", type=int, default=2000)
    ap.add_argument("--clusters", type=int, default=1024)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--train-sample", type=int, default=500_000)
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

    N, D = args.docs, args.dim
    log(f"device {jax.devices()[0]}; corpus {N}x{D} bf16 "
        f"({N*D*2/1e9:.1f} GB), {args.modes} mixture modes")

    key = jax.random.PRNGKey(0)
    k_modes, k_which, k_noise, k_q = jax.random.split(key, 4)

    @jax.jit
    def make_modes(k):
        m = jax.random.normal(k, (args.modes, D), jnp.float32)
        return m / jnp.linalg.norm(m, axis=-1, keepdims=True)

    modes = make_modes(k_modes)

    CHUNK = 1_000_000

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_chunk(buf, modes, kw, kn, start):
        which = jax.random.randint(kw, (CHUNK,), 0, args.modes)
        noise = jax.random.normal(kn, (CHUNK, D), jnp.float32)
        # noise scaled so its *norm* is ~0.25 of the unit mode vector
        # (an unscaled 0.25*N(0,I) at D=384 has norm ~5 — pure noise)
        v = modes[which] + (0.25 / np.sqrt(D)) * noise
        v = (v / jnp.linalg.norm(v, axis=-1, keepdims=True)).astype(jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, v, (start, 0))

    t0 = time.time()
    assert N % CHUNK == 0
    vecs = jnp.zeros((N, D), jnp.bfloat16)
    for ci in range(N // CHUNK):
        kw, kn = jax.random.split(jax.random.fold_in(k_which, ci))
        vecs = fill_chunk(vecs, modes, kw, kn, ci * CHUNK)
    _ = np.asarray(vecs[0, 0])
    log(f"corpus built (chunked) in {time.time()-t0:.1f}s")

    # queries = perturbed corpus points (near-duplicate retrieval regime)
    @jax.jit
    def make_queries(vecs, k):
        kq1, kq2 = jax.random.split(k)
        idx = jax.random.randint(kq1, (args.queries,), 0, N)
        q = vecs[idx].astype(jnp.float32)
        q = q + (0.05 / np.sqrt(D)) * jax.random.normal(
            kq2, (args.queries, D), jnp.float32
        )
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)

    queries = make_queries(vecs, k_q)

    # exact ground truth
    @jax.jit
    def exact_topk(vecs, q):
        sims = jnp.dot(q.astype(jnp.bfloat16), vecs.T, preferred_element_type=jnp.float32)
        return jax.lax.top_k(sims, 10)

    t0 = time.time()
    _, gt_idx = exact_topk(vecs, queries)
    gt = np.asarray(gt_idx)
    log(f"exact ground truth in {time.time()-t0:.1f}s")

    # IVF train on a sample, assign all, pack lists
    t0 = time.time()
    sample = vecs[: args.train_sample].astype(jnp.float32)
    cents = ivf.kmeans(sample, jax.random.PRNGKey(1), args.clusters, iters=8)
    log(f"kmeans ({args.clusters} clusters on {args.train_sample} sample) "
        f"in {time.time()-t0:.1f}s")
    t0 = time.time()
    assign = ivf.assign_clusters_chunked(vecs, cents)
    lists, lens, cap = ivf.build_ivf_lists(assign, args.clusters)
    log(f"assign+pack in {time.time()-t0:.1f}s (cluster cap {cap})")

    lists_d = jnp.asarray(lists)
    lens_d = jnp.asarray(lens)
    report = {"docs": N, "clusters": args.clusters, "cluster_cap": int(cap)}
    mem_budget = 1_500_000_000  # bytes for the [qc, nprobe*cap, D] gather
    for nprobe in (8, 16, 32, 64):
        qc = max(1, min(args.queries, mem_budget // (nprobe * cap * D * 2)))
        def run_all(qs):
            outs = []
            for i in range(0, qs.shape[0], qc):
                v, ids = ivf.ivf_search(
                    vecs, cents, lists_d, lens_d, qs[i : i + qc], nprobe, 10
                )
                outs.append(ids)
            return jnp.concatenate(outs), v

        t0 = time.time()
        ids_all, v = run_all(queries)
        got = np.asarray(ids_all)
        dt_first = time.time() - t0
        recall = float(
            np.mean([len(set(got[r]) & set(gt[r])) / 10 for r in range(len(gt))])
        )
        # throughput: repeat with dependency chain
        t0 = time.time()
        reps = 5
        carry = jnp.float32(0.0)
        for _ in range(reps):
            ids_all, v = run_all(queries + carry * 0)
            carry = jnp.max(v)
        _ = np.asarray(carry)
        qps = args.queries * reps / (time.time() - t0)
        report[f"recall_at10_nprobe{nprobe}"] = round(recall, 4)
        report[f"qps_nprobe{nprobe}"] = round(qps, 1)
        log(f"nprobe={nprobe}: recall@10={recall:.4f}, {qps:.0f} QPS "
            f"(qchunk {qc}, first call {dt_first:.1f}s)")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
