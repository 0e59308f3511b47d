#!/usr/bin/env python
"""Warm the persistent JAX compilation cache (.jax_cache/) for serving.

The cache is a build artifact, NOT source — it is gitignored and this
script regenerates it.  Run once after deploying to a new machine (or
after a JAX upgrade, which invalidates the keys):

    python scripts/warm_cache.py [--docs 2000] [--cache-dir .jax_cache]

It builds a small representative collection (string + number + bool
fields + auto-embedded vectors), commits it, and drives
CollectionReader.warmup (orama_core_tpu/engine/collection_read.py) so
the common query-shape program family (fulltext/vector/hybrid x phrase
x filters x facets) compiles and lands in the on-disk cache.  Engine
serving then never pays a first-query jit.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--cache-dir", default=None)
    args = ap.parse_args()

    import jax

    cache = args.cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    d = tempfile.mkdtemp()
    cfg.writer_side.data_dir = d + "/w"
    cfg.reader_side.data_dir = d + "/r"
    cfg.writer_side.commit_interval_sec = 1e9
    cfg.reader_side.commit_interval_sec = 1e9
    engine = build_orama(cfg, start_background=True)
    engine.write_side.create_collection("master", "warm", "rk", "wk")
    docs = []
    for i in range(args.docs):
        docs.append(
            {
                "id": f"d{i}",
                "title": f"warm document {i} alpha beta",
                "body": f"gamma delta epsilon {i % 97} content body",
                "price": float(i % 100),
                "in_stock": bool(i % 2),
            }
        )
    bs = 500
    for i in range(0, len(docs), bs):
        engine.write_side.write("warm", docs[i : i + bs], "wk")
    while engine.write_side.pending_embeddings() or (
        engine.read_side.count_documents("warm") < len(docs)
    ):
        time.sleep(0.05)
    engine.flush()
    engine.commit()
    reader = engine.read_side._reader("warm")
    t0 = time.perf_counter()
    n = reader.warmup(engine.read_side.ai)
    dt = time.perf_counter() - t0
    engine.close()
    print(f"warmed {n} query-shape programs in {dt:.1f}s -> {cache}")
    blobs = len([f for f in os.listdir(cache) if f.endswith("-cache")])
    print(f"cache now holds {blobs} compiled programs")


if __name__ == "__main__":
    main()
