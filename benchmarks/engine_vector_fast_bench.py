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


if __name__ == "__main__":
    main()
