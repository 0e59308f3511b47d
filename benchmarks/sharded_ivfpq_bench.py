"""BASELINE config 5, full shape: IVF-PQ compressed vectors sharded over a
mesh, served through the ENGINE's shard_map path (collection_read.
_vector_scores_sharded -> sharded_engine.ivfpq_scores), recall@10 vs the
exact single-device path.

Every shard probes the same global centroids and ADC-scans its slice of
the probed clusters (sharded_ivfpq_arrays re-derives per-shard member
lists), so the merged candidate set contains the single-device candidate
set — recall is >= the replicated ivf_pq path at equal nprobe/expand.

CPU-mesh wall time is not a TPU number (one host core emulates 8 devices);
the per-chip ceiling comes from benchmarks/pq_100m_bench.py. This harness
is the end-to-end proof BASELINE config 5 runs through the engine mesh
path (VERDICT r2 item 1).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/sharded_ivfpq_bench.py [--docs 200000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--nprobe", type=int, default=64)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        log("need XLA_FLAGS=--xla_force_host_platform_device_count=8")
        sys.exit(1)

    import numpy as np

    from orama_core_tpu.config import TpuConfig
    from orama_core_tpu.engine.collection_read import CollectionReader
    from orama_core_tpu.oplog import (
        CreateFieldOp, IndexEmbeddingOp, InsertDocumentOp,
    )
    from orama_core_tpu.types import SearchParams, TypedField, ValueType

    rng = np.random.default_rng(0)
    modes = rng.standard_normal((256, args.dim)).astype(np.float32)
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    which = rng.integers(0, 256, args.docs)
    vecs = modes[which] + 0.25 / np.sqrt(args.dim) * rng.standard_normal(
        (args.docs, args.dim)
    ).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def mk(mesh_shape, mode):
        cfg = TpuConfig(
            mesh_shape=mesh_shape,
            vector_index=mode,
            ivf_threshold=10_000,
            ivf_nprobe=args.nprobe,
            ivf_autotune=False,
        )
        r = CollectionReader("c", "rk", None, cfg)
        r.apply(CreateFieldOp(
            "c",
            TypedField(name="emb", field_id=0, type=ValueType.EMBEDDING,
                       model="fake-small"),
        ))
        t0 = time.time()
        for i in range(args.docs):
            r.apply(InsertDocumentOp("c", i, {"id": str(i)}))
            r.apply(IndexEmbeddingOp("c", i, 0, (tuple(map(float, vecs[i])),)))
            if i and i % 100_000 == 0:
                log(f"  ingest {i}")
        log(f"ingested {args.docs} in {time.time() - t0:.1f}s")
        t0 = time.time()
        r.commit(tempfile.mkdtemp(), 1)
        log(f"commit (incl. IVF+PQ build) in {time.time() - t0:.1f}s")
        return r

    single = mk((), "exact")
    sharded = mk((8, 1), "ivf_pq")

    qv = vecs[rng.integers(0, args.docs, args.queries)] + (
        0.05 / np.sqrt(args.dim)
    ) * rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    qv /= np.linalg.norm(qv, axis=1, keepdims=True)

    def run(reader):
        out = []
        t0 = time.time()
        for i in range(args.queries):
            p = SearchParams.from_json({
                "mode": "vector",
                "vector": [float(x) for x in qv[i]],
                "limit": 10,
            })
            ranked, _, _ = reader.search(p, ai_service=None)
            out.append([d for d, _ in ranked])
        return out, time.time() - t0

    assert sharded._use_sharded(SearchParams.from_json(
        {"mode": "vector", "vector": [0.0] * args.dim}
    )), "ivf_pq must ride the mesh path"
    gt, dt_s = run(single)
    got, dt_sh = run(sharded)
    recall = float(np.mean(
        [len(set(a) & set(b)) / 10.0 for a, b in zip(gt, got)]
    ))
    log(f"single exact: {dt_s:.1f}s; sharded ivf_pq: {dt_sh:.1f}s")
    print(json.dumps({
        "metric": f"sharded_ivfpq_recall_at_10_{args.docs // 1000}k_8dev",
        "value": round(recall, 4),
        "unit": "recall",
        "docs": args.docs,
        "queries": args.queries,
        "nprobe": args.nprobe,
        "note": "engine shard_map IVF-PQ path, virtual 8-device CPU mesh",
    }))


if __name__ == "__main__":
    main()
