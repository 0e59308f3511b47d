"""End-to-end HTTP serving benchmark: concurrent clients -> stdlib
threading server -> micro-batcher -> fused device programs.

Quantifies what a DEPLOYMENT sees — the gap between kernel QPS
(bench.py's 59.8k at batch 256) and served QPS including HTTP parsing,
auth, batching latency, and JSON encoding. BASELINE.md's north star is
"QPS/chip at recall@10"; this harness is the serving-side receipt.

    python benchmarks/http_serving_bench.py --docs 100000 --clients 64 \
        --requests 2000 --mode vector

CPU smoke (tiny): JAX_PLATFORMS=cpu python benchmarks/http_serving_bench.py \
        --docs 500 --clients 8 --requests 200
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--clients", type=int, default=64)
    ap.add_argument("--requests", type=int, default=2000)
    ap.add_argument("--mode", default="vector",
                    choices=("vector", "fulltext", "hybrid"))
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import tempfile

    import numpy as np

    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.server.http import WebServer

    cfg = OramaxConfig()
    d = tempfile.mkdtemp()
    cfg.writer_side.data_dir = d + "/w"
    cfg.reader_side.data_dir = d + "/r"
    cfg.http.port = 0
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(
        "master", "c", "rk", "wk", embedding_model="fake-small"
    )
    e.flush()

    WORDS = ("solar wind panel turbine quantum photon tensor kernel "
             "index query search vector hybrid filter facet").split()
    rng = np.random.default_rng(7)
    t0 = time.time()
    B = 2000
    for lo in range(0, args.docs, B):
        docs = [
            {
                "id": str(i),
                "title": " ".join(rng.choice(WORDS, size=6)),
                "price": float(i % 100),
            }
            for i in range(lo, min(lo + B, args.docs))
        ]
        e.write_side.write("c", docs, "wk")
        e.flush()
    e.commit()
    log(f"indexed {args.docs} docs in {time.time()-t0:.1f}s")

    srv = WebServer(e)
    srv.start_background()
    base = f"http://127.0.0.1:{srv.port}"
    log(f"serving on {base}")

    bodies = []
    for i in range(64):
        term = " ".join(rng.choice(WORDS, size=2))
        b = {"term": term, "mode": args.mode, "limit": 10}
        bodies.append(json.dumps(b).encode())

    # warm every program shape once before timing: distinct terms hit
    # different posting buckets -> distinct compiled programs, and a cold
    # persistent cache otherwise pays those compiles inside the timed
    # window (measured: p99 19.9 s cold vs 1.24 s warm, BENCH_NOTES r4)
    t0 = time.time()
    for body in bodies:
        req = urllib.request.Request(
            base + "/v1/collections/c/search", data=body,
            headers={"Content-Type": "application/json",
                     "Authorization": "Bearer rk"}, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            r.read()
    log(f"warmed {len(bodies)} shapes in {time.time()-t0:.1f}s")

    lat: list = []
    errors: list = []
    lock = threading.Lock()
    n_total = args.requests
    counter = {"i": 0}

    def worker():
        while True:
            with lock:
                i = counter["i"]
                if i >= n_total:
                    return
                counter["i"] = i + 1
            body = bodies[i % len(bodies)]
            rq = urllib.request.Request(
                base + "/v1/collections/c/search", data=body,
                headers={"Content-Type": "application/json",
                         "Authorization": "Bearer rk"}, method="POST")
            t = time.time()
            try:
                with urllib.request.urlopen(rq, timeout=600) as resp:
                    resp.read()
            except Exception as ex:  # count, don't kill the worker
                tag = type(ex).__name__
                code = getattr(ex, "code", None)
                if code:
                    tag = f"{tag}:{code}"
                with lock:
                    errors.append(tag)
                continue
            dt = time.time() - t
            with lock:
                lat.append(dt)

    threads = [threading.Thread(target=worker) for _ in range(args.clients)]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.time() - t0
    lat.sort()
    ok = len(lat)
    qps = ok / wall  # successes only — failures must not inflate QPS
    p50 = lat[ok // 2] * 1e3 if ok else 0.0
    p99 = lat[int(ok * 0.99)] * 1e3 if ok else 0.0
    out = {
        "metric": f"http_serving_{args.mode}_qps",
        "docs": args.docs,
        "clients": args.clients,
        "qps": round(qps, 1),
        "p50_ms": round(p50, 2),
        "p99_ms": round(p99, 2),
        "ok": ok,
        "errors": len(errors),
        "error_types": dict(
            (t2, errors.count(t2)) for t2 in sorted(set(errors))
        ),
    }
    log(f"{qps:.1f} QPS  p50 {p50:.1f} ms  p99 {p99:.1f} ms "
        f"({ok}/{n_total} ok, {len(errors)} errors, "
        f"{args.clients} clients)")
    print(json.dumps(out))
    srv.stop()


if __name__ == "__main__":
    main()
