"""Minimal end-to-end example: build the engine, index, search all modes.

    JAX_PLATFORMS=cpu python examples/quickstart.py
"""
import os
import sys

# the image's sitecustomize may pre-register a TPU backend; honor the
# JAX_PLATFORMS env var explicitly (env alone cannot switch after that)
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

cfg = OramaxConfig()
workdir = tempfile.mkdtemp()
cfg.writer_side.data_dir = os.path.join(workdir, "writer")
cfg.reader_side.data_dir = os.path.join(workdir, "reader")

engine = build_orama(cfg, start_background=False)
engine.write_side.create_collection(
    "master", "products", read_api_key="rk", write_api_key="wk"
)
engine.write_side.write(
    "products",
    [
        {"id": "p1", "title": "Red running shoes", "price": 59.9, "in_stock": True},
        {"id": "p2", "title": "Blue walking shoes", "price": 39.9, "in_stock": True},
        {"id": "p3", "title": "Trail running backpack", "price": 89.0, "in_stock": False},
    ],
    "wk",
)
engine.flush()

for body in (
    {"term": "running shoes"},
    {"term": "running shoes", "mode": "vector"},
    {"term": "running shoes", "mode": "hybrid", "where": {"price": {"lt": 70}}},
    {"term": "", "facets": {"in_stock": {"true": True, "false": True}}},
):
    res = engine.read_side.search("products", SearchParams.from_json(body), "rk")
    print(body, "->", [(h.id, round(h.score, 3)) for h in res.hits],
          res.facets["in_stock"].values if res.facets else "")

engine.commit()
engine.close()
print("data persisted under", workdir)
