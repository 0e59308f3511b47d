"""Engine-level benchmarks: index build docs/sec, BM25 QPS, hybrid QPS.

BASELINE.md configs 1 and 4 (100k-passage full-text with boosts; hybrid
BM25+vector with filters and RRF at 1M docs is approximated at the largest
size this 1-core host can index in reasonable time). Run on the real chip:

    python benchmarks/engine_bench.py [--docs 100000] [--queries 200]

Prints a JSON report to stdout (one object, multiple metrics) and progress
to stderr. This is the tuning harness; the driver-facing single-line bench
stays bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


WORDS = (
    "search engine vector database index query token embed rank score "
    "document passage neural transformer attention matrix kernel compile "
    "shard mesh tensor batch cache memory bandwidth latency throughput "
    "recall precision filter facet hybrid fusion quantize cluster partition "
    "solar wind energy turbine panel recipe flour sugar bake cake quantum "
    "computing physics electron photon laser crystal polymer enzyme protein"
).split()


def synth_docs(n: int, seed: int = 0):
    rng = random.Random(seed)
    docs = []
    for i in range(n):
        body = " ".join(rng.choices(WORDS, k=rng.randint(8, 40)))
        docs.append(
            {
                "id": str(i),
                "title": " ".join(rng.choices(WORDS, k=5)),
                "body": body,
                "price": rng.uniform(0, 100),
                "in_stock": rng.random() > 0.3,
            }
        )
    return docs


def synth_queries(n: int, seed: int = 1):
    rng = random.Random(seed)
    return [" ".join(rng.choices(WORDS, k=rng.randint(1, 3))) for _ in range(n)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--cpu", action="store_true", help="force CPU jax")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import os

        import jax

        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        )
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
        except Exception:
            pass

    import tempfile

    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.types import SearchParams

    report = {}
    cfg = OramaxConfig()
    d = tempfile.mkdtemp()
    cfg.writer_side.data_dir = d + "/w"
    cfg.reader_side.data_dir = d + "/r"
    cfg.writer_side.commit_interval_sec = 1e9
    cfg.reader_side.commit_interval_sec = 1e9
    # Background pump on: realistic write path (writer + op pump + embedding
    # loop run concurrently, as in production).
    engine = build_orama(cfg, start_background=True)
    engine.write_side.create_collection("master", "bench", "rk", "wk")

    docs = synth_docs(args.docs)
    log(f"indexing {len(docs)} docs ...")
    t0 = time.time()
    bs = 500
    for i in range(0, len(docs), bs):
        engine.write_side.write("bench", docs[i : i + bs], "wk")
        if (i // bs) % 40 == 0 and i:
            log(f"  {i}/{len(docs)} ({i/(time.time()-t0):.0f} docs/s)")
    # wait until the read side has caught up (ops + embeddings applied)
    def caught_up():
        try:
            n = engine.read_side.count_documents("bench")
        except KeyError:
            return False
        return engine.write_side.pending_embeddings() == 0 and n >= len(docs)

    while not caught_up():
        time.sleep(0.05)
    engine.flush()  # finalize any embedding ops still in the channel
    index_dt = time.time() - t0
    report["index_docs_per_sec"] = round(len(docs) / index_dt, 1)
    log(f"index build: {index_dt:.1f}s -> {report['index_docs_per_sec']} docs/s")

    t0 = time.time()
    engine.commit()
    report["commit_sec"] = round(time.time() - t0, 2)
    log(f"commit: {report['commit_sec']}s")

    queries = synth_queries(args.queries)

    def run(mode, label, **extra):
        params = [
            SearchParams.from_json({"term": q, "mode": mode, **extra})
            for q in queries
        ]
        # warm compile: one full untimed pass so EVERY plan-size bucket the
        # query set hits is compiled before timing (queries of different
        # posting volume land in different PLAN_BUCKETS shape families —
        # warming only params[0] left compiles inside the timed loop, which
        # dominated the r3 TPU bm25 number)
        for p in params:
            engine.read_side.search("bench", p, "rk", with_documents=False)
        t0 = time.time()
        total_hits = 0
        for p in params:
            r = engine.read_side.search("bench", p, "rk", with_documents=False)
            total_hits += len(r.hits)
        dt = time.time() - t0
        qps = len(params) / dt
        report[label] = round(qps, 1)
        log(f"{label}: {dt:.2f}s -> {qps:.1f} QPS (avg hits {total_hits/len(params):.1f})")

    run("fulltext", "bm25_qps")
    run("fulltext", "bm25_boosted_filtered_qps",
        boost={"title": 2.0}, where={"price": {"lte": 50}})
    run("vector", "vector_qps")
    run("hybrid", "hybrid_rrf_qps")
    run("hybrid", "hybrid_filtered_qps", where={"in_stock": True})
    # faceted serving: fused in-trace counting vs the multi-dispatch
    # chain (scores program + per-facet reduction dispatches)
    facets = {
        "price": {"ranges": [{"to": 25}, {"from": 25, "to": 50},
                             {"from": 50}]},
        "in_stock": {"true": True, "false": True},
    }
    run("hybrid", "hybrid_faceted_qps", facets=facets)
    reader = engine.read_side._reader("bench")
    orig_elig = reader._hybrid_fused_eligible
    reader._hybrid_fused_eligible = lambda p: None
    run("hybrid", "hybrid_faceted_multidispatch_qps", facets=facets)
    reader._hybrid_fused_eligible = orig_elig

    engine.close()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
