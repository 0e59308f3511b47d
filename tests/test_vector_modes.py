"""Engine-level tests of the vector scoring modes (exact / int8 / ivf)."""

import numpy as np
import pytest

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"


def _engine(tmp_path, mode, **tpu_kw):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    cfg.tpu.vector_index = mode
    for k, v in tpu_kw.items():
        setattr(cfg.tpu, k, v)
    return build_orama(cfg, start_background=False)


DOCS = [
    {"id": str(i), "body": text}
    for i, text in enumerate(
        [
            "solar panels convert sunlight into electricity",
            "wind turbines generate power from moving air",
            "the recipe needs flour sugar and eggs",
            "bake the cake at 180 degrees",
            "photovoltaic cells and renewable energy",
        ]
    )
]


@pytest.mark.parametrize("mode", ["exact", "int8"])
def test_vector_mode_ranking(tmp_path, mode):
    e = _engine(tmp_path / mode, mode)
    try:
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        e.write_side.write("c", DOCS, WRITE)
        e.flush()
        e.commit()  # move vectors into the committed (device) path
        res = e.read_side.search(
            "c", SearchParams.from_json({"term": "solar sunlight electricity", "mode": "vector"}), READ
        )
        assert res.hits[0].id == "0"
    finally:
        e.close()


def test_pq_mode_builds_and_searches(tmp_path):
    e = _engine(tmp_path, "pq", ivf_threshold=1)
    try:
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        e.write_side.write("c", DOCS, WRITE)
        e.flush()
        e.commit()
        reader = e.read_side.collections["c"]
        vf = next(iter(reader._vector.values()))
        assert vf.committed.has_pq
        assert vf.committed.pq_codes.dtype.name == "uint8"
        res = e.read_side.search(
            "c",
            SearchParams.from_json(
                {"term": "solar sunlight electricity", "mode": "vector"}
            ),
            READ,
        )
        # exact rerank restores precision on top of coarse ADC candidates
        assert res.hits[0].id == "0"
        e.commit()
    finally:
        e.close()
    e2 = build_orama(e.cfg, start_background=False)
    try:
        vf = next(iter(e2.read_side.collections["c"]._vector.values()))
        assert vf.committed.has_pq  # persisted + reloaded
    finally:
        e2.close()


def test_ivf_mode_builds_and_searches(tmp_path):
    # tiny threshold so the 5-doc corpus gets an IVF structure
    e = _engine(tmp_path, "ivf", ivf_threshold=1, ivf_nprobe=4)
    try:
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        e.write_side.write("c", DOCS, WRITE)
        e.flush()
        e.commit()
        reader = e.read_side.collections["c"]
        vf = next(iter(reader._vector.values()))
        assert vf.committed.has_ivf
        res = e.read_side.search(
            "c", SearchParams.from_json({"term": "wind turbines power", "mode": "vector"}), READ
        )
        assert res.hits[0].id == "1"
        # persistence round-trips the IVF state
        e.commit()
    finally:
        e.close()
    e2 = build_orama(e.cfg, start_background=False)
    try:
        reader = e2.read_side.collections["c"]
        vf = next(iter(reader._vector.values()))
        assert vf.committed.has_ivf
        res = e2.read_side.search(
            "c", SearchParams.from_json({"term": "wind turbines power", "mode": "vector"}), READ
        )
        assert res.hits[0].id == "1"
    finally:
        e2.close()
