"""Engine-path overhead, isolated from device/relay time (VERDICT r1
weak-item 6: the 17k-QPS kernel vs ~4-12 QPS engine gap was attributed to
the dev relay without a co-located measurement).

Three numbers on the same corpus, co-located CPU backend (device == host,
no relay in the loop):

1. full engine search p50 (parse -> orchestrate -> kernels -> top-k ->
   doc fetch)
2. engine with the device-scoring seam stubbed (search_scores returns a
   cached device array): pure host-path cost per query
3. raw kernel-only p50 on the same shapes

(1) - (2) ~= device time; (2) is the engine's own overhead. If (2) is
single-digit ms, the engine path is not the production bottleneck — the
relay is.

    python benchmarks/engine_overhead_bench.py [--docs 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000)
    ap.add_argument("--queries", type=int, default=300)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from benchmarks.engine_bench import synth_docs
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.types import SearchParams

    import tempfile

    cfg = OramaxConfig()
    d = tempfile.mkdtemp()
    cfg.writer_side.data_dir = d + "/w"
    cfg.reader_side.data_dir = d + "/r"
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection("master", "c1", "rk", "wk")
    docs = synth_docs(args.docs)
    t0 = time.time()
    for i in range(0, len(docs), 1000):
        e.write_side.write("c1", docs[i : i + 1000], "wk")
        e.flush()
    e.commit()
    log(f"indexed+committed {args.docs} docs in {time.time()-t0:.1f}s")

    reader = e.read_side.collections["c1"]
    import random

    random.seed(3)
    terms = [
        " ".join(random.choice(docs)["title"].split()[:2]) for _ in range(64)
    ]
    bodies = [SearchParams.from_json({"term": t}) for t in terms]

    def percentiles(samples):
        s = sorted(samples)
        return {
            "p50_ms": round(1e3 * s[len(s) // 2], 3),
            "p90_ms": round(1e3 * s[int(len(s) * 0.9)], 3),
        }

    # 1) full engine path
    for b in bodies:
        e.read_side.search("c1", b, "rk")  # warm every shape bucket
    lat = []
    for i in range(args.queries):
        b = bodies[i % len(bodies)]
        t0 = time.time()
        e.read_side.search("c1", b, "rk")
        lat.append(time.time() - t0)
    full = percentiles(lat)
    log(f"full engine: {full}")

    # 2) host path only: stub the device-scoring seam with a cached array
    cached_scores = reader.search_scores(bodies[0], e.ai)
    cached_scores.block_until_ready()
    orig = reader.search_scores
    reader.search_scores = lambda params, ai: cached_scores
    lat = []
    for i in range(args.queries):
        b = bodies[i % len(bodies)]
        t0 = time.time()
        e.read_side.search("c1", b, "rk")
        lat.append(time.time() - t0)
    reader.search_scores = orig
    host = percentiles(lat)
    log(f"host path (scoring stubbed): {host}")

    # 3) kernel only (score + topk + fetch), no engine orchestration
    import orama_core_tpu.ops.topk as topk_ops

    lat = []
    for i in range(args.queries):
        b = bodies[i % len(bodies)]
        t0 = time.time()
        s = orig(b, e.ai)
        jax.device_get(topk_ops.topk_with_count(s, 10))
        lat.append(time.time() - t0)
    kernel = percentiles(lat)
    log(f"kernel+topk+fetch: {kernel}")

    print(
        json.dumps(
            {
                "metric": "engine_host_overhead_p50",
                "value": round(host["p50_ms"], 3),
                "unit": "ms",
                "full_engine": full,
                "host_only": host,
                "kernel_only": kernel,
                "docs": args.docs,
            }
        )
    )
    e.close()


if __name__ == "__main__":
    main()
