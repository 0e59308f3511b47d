"""Batch memory-cap chunking: oversized coalesced batches split into
bucket-aligned chunks and still return correct per-query results."""

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"


def test_chunked_batch_matches_sequential(tmp_path, monkeypatch):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    e = build_orama(cfg, start_background=False)
    try:
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        docs = [
            {"id": str(i), "body": f"shared token plus unique{i}"}
            for i in range(30)
        ]
        e.write_side.write("c", docs, WRITE)
        e.flush()
        e.commit()
        reader = e.read_side.collections["c"]
        # force the cap low enough that a 12-query batch must chunk
        monkeypatch.setattr(
            type(reader), "_BATCH_SLOT_BUDGET", 4 * 1024, raising=True
        )
        params = [
            SearchParams.from_json({"term": f"unique{i} shared"})
            for i in range(12)
        ]
        batched = reader.search_batch(params, e.read_side.ai)
        assert len(batched) == 12
        for p, (ranked, count) in zip(params, batched):
            seq_ranked, seq_count, _ = reader.search(p, e.read_side.ai)
            assert [d for d, _ in ranked] == [d for d, _ in seq_ranked], p.term
            assert count == seq_count
    finally:
        e.close()
