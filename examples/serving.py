"""Serving-oriented example: micro-batching, raw-vector queries,
selective filters, and the fused vector fast path.

    JAX_PLATFORMS=cpu python examples/serving.py

On a TPU host, drop JAX_PLATFORMS and the vector path serves from the
fused kNN kernel (engine p50 ~32 ms at 1M docs through a dev relay;
2-5 ms co-located).
"""
import os
import sys

# the image's sitecustomize may pre-register a TPU backend; honor the
# JAX_PLATFORMS env var explicitly (env alone cannot switch after that)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import tempfile
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

cfg = OramaxConfig()
workdir = tempfile.mkdtemp()
cfg.writer_side.data_dir = os.path.join(workdir, "writer")
cfg.reader_side.data_dir = os.path.join(workdir, "reader")
# coalesce concurrent queries into one device call (batch_max=256 fills
# the MXU; ~2.3x per-chip QPS on saturated vector workloads)
cfg.tpu.query_batching = True
cfg.tpu.batch_wait_ms = 5.0

engine = build_orama(cfg, start_background=False)
engine.write_side.create_collection(
    "master", "products", read_api_key="rk", write_api_key="wk"
)
engine.write_side.write(
    "products",
    [
        {"id": f"p{i}", "title": t, "price": 10.0 * (i + 1), "in_stock": i % 2 == 0}
        for i, t in enumerate(
            ["red running shoes", "blue walking shoes", "trail backpack",
             "carbon road bike", "wool hiking socks", "waterproof jacket"]
        )
    ],
    "wk",
)
engine.flush()
engine.commit()

# concurrent queries coalesce in the micro-batcher
results = {}
def q(i, body):
    res = engine.read_side.search("products", SearchParams.from_json(body), "rk")
    results[i] = [h.id for h in res.hits]

threads = [
    threading.Thread(target=q, args=(i, b))
    for i, b in enumerate(
        [
            {"term": "shoes", "mode": "vector"},
            {"term": "bike", "mode": "vector"},
            {"term": "jacket", "mode": "vector"},
        ]
    )
]
[t.start() for t in threads]
[t.join() for t in threads]
print("batched vector results:", results)

# selective filter: candidates are listed host-side from the sorted
# price column; the vector path scores only the survivors
res = engine.read_side.search(
    "products",
    SearchParams.from_json(
        {"term": "shoes", "mode": "hybrid", "where": {"price": {"lte": 20}}}
    ),
    "rk",
)
print("filtered hybrid:", [(h.id, round(h.score, 3)) for h in res.hits])

# bring-your-own-embedding: query with a raw vector (skips the model)
model = next(
    f.model for f in engine.read_side._reader("products").fields.values() if f.model
)
raw = [float(x) for x in engine.read_side.ai.embed_passage(model, ["red running shoes"])[0]]
res = engine.read_side.search(
    "products",
    SearchParams.from_json({"mode": "vector", "vector": raw}),
    "rk",
)
print("raw-vector query:", [h.id for h in res.hits][:1])

engine.close()
