"""Fused one-dispatch serving for ANN collections: measured QPS gain
(VERDICT r4 next #4's receipt). A 1M-doc IVF-PQ collection serves
vector / hybrid / filtered-hybrid queries through hybrid_fused_topk_mf
(ANN kernels called in-trace) vs the forced multi-dispatch chain
(`_hybrid_fused_eligible -> None` — the same kernels, dispatch by
dispatch). Parity is pinned in tests/test_fused_ann.py; this measures
the serving-rate difference on the real chip.

    python benchmarks/ann_fused_bench.py [--docs 1000000]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--terms", type=int, default=50_000)
    ap.add_argument("--avg-postings", type=int, default=20)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--queries", type=int, default=32)
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

    reader = build_synthetic_reader(
        args.docs, args.terms, args.avg_postings, args.dim
    )
    reader.cfg.vector_index = "ivf_pq"
    c = reader._vector[1].committed
    t0 = time.time()
    c.build_ivf()
    c.build_pq()
    log(
        f"IVF+PQ built at {args.docs} rows in {time.time()-t0:.1f}s "
        f"(clusters {c.ivf_cents.shape[0]}, M {c.pq_codes.shape[1]})"
    )
    ai = AIService()
    rng = np.random.default_rng(42)

    def rand_term():
        t = int((rng.pareto(1.2) * 50)) % args.terms
        return f"term{t:06d}"

    shapes = {
        "vector": lambda: {"term": rand_term(), "mode": "vector"},
        "hybrid": lambda: {"term": rand_term(), "mode": "hybrid"},
        "hybrid_filtered": lambda: {
            "term": rand_term(), "mode": "hybrid",
            "where": {"price": {"lte": 50}},
        },
    }

    def measure(tag):
        out = {}
        for label, gen in shapes.items():
            params = [
                SearchParams.from_json(gen()) for _ in range(args.queries)
            ]
            for p in params:  # warm every plan bucket
                reader.search(p, ai)
            t0 = time.time()
            for p in params:
                reader.search(p, ai)
            dt = time.time() - t0
            out[label] = args.queries / dt
            log(f"{tag} {label}: {out[label]:.1f} QPS "
                f"({dt/args.queries*1e3:.1f} ms/query)")
        return out

    fused = measure("fused")
    # force the multi-dispatch chain (the r4-and-earlier serving shape)
    reader._hybrid_fused_eligible = lambda _p: None
    multi = measure("multi-dispatch")

    report = {"metric": "ann_fused_serving_1m", "docs": args.docs}
    for label in shapes:
        report[label + "_fused_qps"] = round(fused[label], 1)
        report[label + "_multi_qps"] = round(multi[label], 1)
        report[label + "_speedup"] = round(fused[label] / multi[label], 2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
