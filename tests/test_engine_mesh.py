"""Engine-level mesh sharding: the same collection/search code runs SPMD
when tpu.mesh_shape is configured (virtual 8-device CPU mesh)."""

import numpy as np
import pytest
import jax

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"

DOCS = [
    {"id": str(i), "body": body, "price": i * 10}
    for i, body in enumerate(
        [
            "solar panels convert sunlight",
            "wind turbines spin in the breeze",
            "bake a chocolate cake",
            "quantum computing with qubits",
            "solar and wind renewable energy",
        ]
    )
]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_matches_single_device(tmp_path):
    def make(mesh_shape, sub):
        cfg = OramaxConfig()
        cfg.writer_side.data_dir = str(tmp_path / sub / "w")
        cfg.reader_side.data_dir = str(tmp_path / sub / "r")
        cfg.writer_side.commit_interval_sec = 3600
        cfg.reader_side.commit_interval_sec = 3600
        cfg.tpu.mesh_shape = mesh_shape
        e = build_orama(cfg, start_background=False)
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        e.write_side.write("c", DOCS, WRITE)
        e.flush()
        e.commit()  # committed structures land on the (sharded) device cache
        return e

    single = make((), "single")
    sharded = make((8, 1), "sharded")
    try:
        for body in (
            {"term": "solar energy", "mode": "hybrid"},
            {"term": "wind", "mode": "vector"},
            {"term": "cake chocolate"},
            {"term": "solar", "where": {"price": {"gte": 20}}},
        ):
            p = SearchParams.from_json(body)
            r1 = single.read_side.search("c", p, READ)
            r2 = sharded.read_side.search("c", p, READ)
            assert [h.id for h in r1.hits] == [h.id for h in r2.hits], body
            for h1, h2 in zip(r1.hits, r2.hits):
                assert abs(h1.score - h2.score) < 1e-4, body
    finally:
        single.close()
        sharded.close()
