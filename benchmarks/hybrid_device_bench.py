"""Device-side latency of the FULL fused engine program at 1M docs.

VERDICT r4 weak #2: the ~45-50 ms "co-located hybrid p50" was relay-RTT
arithmetic, not a measurement, and the +35 ms filtered-hybrid delta
(114.7 vs 79.5 ms through the relay) was never decomposed. This bench
measures true device ms/query for the exact program serving runs
(ops/hybrid.hybrid_fused_topk_mf with the engine-built staging buffers):

1. drive CollectionReader.search once per shape with a spy that captures
   the precise (args, statics) handed to hybrid_fused_topk_mf;
2. re-run the program R times INSIDE one jit (fori_loop +
   optimization_barrier, the phrase_bench technique) so the relay RTT and
   host staging cost are excluded;
3. report device ms/query for bm25 / vector / hybrid-rrf / hybrid+filter,
   plus the host-staging ms (single-dispatch wall time minus device time).

Run on the real chip:

    python benchmarks/hybrid_device_bench.py [--docs 1000000]

Prints one JSON object to stdout. Reference bar: the hybrid fusion loop
collection.rs:730-772 (sequential scorer joins, CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--terms", type=int, default=50_000)
    ap.add_argument("--avg-postings", type=int, default=20)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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
    from orama_core_tpu.ops import hybrid as hybrid_ops
    from orama_core_tpu.types import SearchParams

    reader = build_synthetic_reader(
        args.docs, args.terms, args.avg_postings, args.dim
    )
    ai = AIService()

    # a mid-frequency 1-token term: representative of the Pareto query mix
    term = "term000040"
    # vector-only mode rides the Pallas kNN fast path (receipted by
    # bench.py / knn benches), not hybrid_fused_topk_mf — the hybrid
    # shapes below include the vector half in-trace
    shapes = {
        "bm25": {"term": term, "mode": "fulltext"},
        "hybrid_rrf": {"term": term, "mode": "hybrid"},
        "hybrid_filtered": {
            "term": term, "mode": "hybrid",
            "where": {"price": {"lte": 50}},
        },
    }

    R = args.iters
    report = {}
    orig = hybrid_ops.hybrid_fused_topk_mf
    for label, body in shapes.items():
        captured = {}

        def spy(*a, **kw):
            captured["a"] = a
            captured["kw"] = kw
            return orig(*a, **kw)

        hybrid_ops.hybrid_fused_topk_mf = spy
        try:
            p = SearchParams.from_json(body)
            t0 = time.time()
            reader.search(p, ai)  # warm (compile) + capture staging
            first_s = time.time() - t0
            assert captured, f"{label}: query did not take the fused path"
            t0 = time.time()
            reader.search(p, ai)
            wall_single = time.time() - t0
        finally:
            hybrid_ops.hybrid_fused_topk_mf = orig

        a, kw = captured["a"], captured["kw"]
        ints0, flts0 = a[0], a[1]
        rest = a[2:]

        # the staging planes (postings, dense rows, the 1.5 GB vector
        # matrix) MUST be jit arguments — closure-captured they become
        # HLO constants and the remote-compile request blows the relay's
        # body-size limit (HTTP 413)
        @jax.jit
        def loop(ints, flts, *planes):
            def iter_body(_, c):
                acc, zi, zf = c
                zi, zf = jax.lax.optimization_barrier((zi, zf))
                vals, _idx, _count, _fouts = orig(zi, zf, *planes, **kw)
                return (acc + vals[0], zi, zf)

            return jax.lax.fori_loop(
                0, R, iter_body, (jnp.float32(0.0), ints, flts)
            )[0]

        _ = np.asarray(loop(ints0, flts0, *rest))  # compile + run
        t0 = time.time()
        _ = np.asarray(loop(ints0, flts0, *rest))  # fetch = reliable sync
        dev_ms = (time.time() - t0) / R * 1e3
        report[label + "_device_ms"] = round(dev_ms, 2)
        report[label + "_wall_single_ms"] = round(wall_single * 1e3, 1)
        log(
            f"{label}: device {dev_ms:.1f} ms/query | single-dispatch wall "
            f"{wall_single*1e3:.0f} ms (first {first_s:.1f}s)"
        )

    report["filtered_delta_device_ms"] = round(
        report["hybrid_filtered_device_ms"] - report["hybrid_rrf_device_ms"],
        2,
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
