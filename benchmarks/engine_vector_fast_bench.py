"""Engine-level vector fast path on hardware: a 1M x 384 synthetic reader
served through CollectionReader.search with the fused kNN kernel
(collection_read._search_vector_topk_fast), vs the dense scorer.

    python benchmarks/engine_vector_fast_bench.py [--docs 1000000]

Measured round 2 (v5e through the dev relay): p50 34.3 ms vs 72 ms dense;
top docs identical, scores within 2e-4 (cross-kernel bf16 rounding),
counts within a few per 500k (boundary-zero cosines).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "benchmarks")
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--multivec", action="store_true",
        help="chunked-docs corpus (1-3 rows/doc) through the segment-aware "
             "kernel, with dense-path agreement (VERDICT r2 item 5)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass

    from hybrid_1m_bench import build_synthetic_reader
    from orama_core_tpu.models.ai_service import AIService
    from orama_core_tpu.types import SearchParams

    if args.multivec:
        _run_multivec(args)
        return

    reader = build_synthetic_reader(args.docs, 5_000, 4, args.dim)
    if args.cpu:
        reader.cfg._test_force_fast_path = True  # interpret mode (slow)
    ai = AIService()
    p = SearchParams.from_json({"term": "warm", "mode": "vector"})
    assert reader._vector_fast_field(p) is not None, "fast path must engage"

    report = {}
    for label, use_pallas in (("fast", True), ("dense", False)):
        reader.cfg.use_pallas = use_pallas
        reader.search(p, ai)  # warm this path's programs
        lat = []
        for i in range(args.queries):
            t0 = time.time()
            reader.search(
                SearchParams.from_json({"term": f"q{i}", "mode": "vector"}), ai
            )
            lat.append(time.time() - t0)
        lat.sort()
        report[f"vector_{label}_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 1)
        print(
            f"{label}: p50 {report[f'vector_{label}_p50_ms']} ms "
            f"(p90 {lat[int(len(lat)*0.9)]*1e3:.1f} ms)",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(report))


def _run_multivec(args) -> None:
    """Chunked corpus: n_docs docs x 1-3 chunk rows, planted relevance.
    Measures fast vs dense p50 AND pins top-10 agreement + count parity —
    the flagship serving optimization stays on for the flagship
    long-context feature (VERDICT r2 item 5)."""
    import tempfile
    import time as _t

    import numpy as np

    from orama_core_tpu.config import TpuConfig
    from orama_core_tpu.engine.collection_read import CollectionReader
    from orama_core_tpu.oplog import (
        CreateFieldOp, IndexEmbeddingOp, InsertDocumentOp,
    )
    from orama_core_tpu.types import SearchParams, TypedField, ValueType

    n_docs, d = args.docs, args.dim
    model = {128: "fake-small", 384: "fake-base"}.get(d)
    assert model, f"--dim {d}: use 128 or 384 (fake model dims)"

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    modes = rng.standard_normal((256, d)).astype(np.float32)
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    centers = modes[rng.integers(0, 256, n_docs)] + (
        0.25 / np.sqrt(d)
    ) * rng.standard_normal((n_docs, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    cfg = TpuConfig()
    if args.cpu:
        cfg._test_force_fast_path = True
    reader = CollectionReader("mv", "rk", None, cfg)
    reader.apply(CreateFieldOp(
        "mv", TypedField(0, "emb", ValueType.EMBEDDING, model=model)
    ))
    t0 = _t.time()
    n_rows = 0
    for i in range(n_docs):
        reader.apply(InsertDocumentOp("mv", i, {"id": str(i)}))
        nch = 1 + (i % 3)
        n_rows += nch
        chunks = centers[i] + (0.12 / np.sqrt(d)) * rng.standard_normal(
            (nch, d)
        ).astype(np.float32)
        chunks /= np.linalg.norm(chunks, axis=1, keepdims=True)
        reader.apply(IndexEmbeddingOp(
            "mv", i, 0, tuple(tuple(float(x) for x in c) for c in chunks)
        ))
        if i and i % 100_000 == 0:
            log(f"  ingest {i}")
    log(f"ingested {n_docs} docs / {n_rows} chunk rows in {_t.time()-t0:.1f}s")
    reader.commit(tempfile.mkdtemp(), 1)

    qs = centers[rng.integers(0, n_docs, args.queries)] + (
        0.05 / np.sqrt(d)
    ) * rng.standard_normal((args.queries, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    bodies = [
        SearchParams.from_json({
            "mode": "vector", "vector": [float(x) for x in qs[i]],
            "limit": 10,
        })
        for i in range(args.queries)
    ]
    assert reader._vector_fast_field(bodies[0]) is not None, "must engage"

    report = {"multivec_docs": n_docs, "chunk_rows": n_rows}
    results = {}
    for label, use_pallas in (("fast", True), ("dense", False)):
        reader.cfg.use_pallas = use_pallas
        reader.search(bodies[0], None)  # warm
        lat, out = [], []
        for p in bodies:
            t0 = _t.time()
            ranked, count, _ = reader.search(p, None)
            lat.append(_t.time() - t0)
            out.append((ranked, count))
        lat.sort()
        results[label] = out
        report[f"multivec_{label}_p50_ms"] = round(lat[len(lat) // 2] * 1e3, 1)
        log(f"{label}: p50 {report[f'multivec_{label}_p50_ms']} ms")
    agree = cnt_dev = 0.0
    for (rf, cf), (rd, cd) in zip(results["fast"], results["dense"]):
        agree += len({x for x, _ in rf} & {x for x, _ in rd}) / 10
        cnt_dev = max(cnt_dev, abs(cf - cd) / max(cd, 1))
    report["multivec_top10_agreement"] = round(agree / len(bodies), 4)
    report["multivec_max_count_dev"] = round(cnt_dev, 5)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
