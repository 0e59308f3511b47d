"""Query micro-batching tests: coalescing, group isolation, parity with the
unbatched path."""

import threading

import pytest

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.server.batcher import MicroBatcher
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"


def test_microbatcher_coalesces_and_distributes():
    calls = []

    def run(key, payloads):
        calls.append((key, list(payloads)))
        return [p * 2 for p in payloads]

    b = MicroBatcher(run, max_batch=8, max_wait_ms=20)
    results = {}

    def worker(i):
        results[i] = b.submit(("k",), i)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=5)
    b.stop()
    assert results == {i: i * 2 for i in range(5)}
    # all five should land in very few batches (>=1 coalesced group)
    assert sum(len(p) for _, p in calls) == 5
    assert len(calls) <= 3


def test_microbatcher_propagates_errors():
    def run(key, payloads):
        raise RuntimeError("boom")

    b = MicroBatcher(run, max_batch=4, max_wait_ms=1)
    with pytest.raises(RuntimeError):
        b.submit(("k",), 1)
    b.stop()


def test_batched_vector_search_matches_unbatched(tmp_path):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    cfg.tpu.query_batching = True
    cfg.tpu.batch_wait_ms = 10.0
    engine = build_orama(cfg, start_background=False)
    try:
        engine.write_side.create_collection(MASTER, "c", READ, WRITE)
        engine.write_side.write(
            "c",
            [
                {"id": "1", "body": "solar power and renewable energy"},
                {"id": "2", "body": "chocolate cake recipe"},
                {"id": "3", "body": "wind power turbines energy"},
            ],
            WRITE,
        )
        engine.flush()
        engine.commit()

        params = SearchParams.from_json({"term": "renewable energy", "mode": "vector"})
        batched = engine.read_side.search("c", params, READ)

        cfg2 = OramaxConfig.from_dict({})  # batching off
        reader = engine.read_side.collections["c"]
        ranked, count, _ = reader.search(params, engine.read_side.ai)
        assert [h.id for h in batched.hits] == [
            str(engine.read_side.doc_storage["c"].get(d)["id"]) for d, _ in ranked
        ]
        assert batched.count == count

        # concurrent submits from several threads coalesce correctly
        outs = {}

        def q(i, term):
            outs[i] = engine.read_side.search(
                "c", SearchParams.from_json({"term": term, "mode": "vector"}), READ
            )

        threads = [
            threading.Thread(target=q, args=(i, t))
            for i, t in enumerate(["solar energy", "cake recipe", "wind turbines"])
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert outs[0].hits[0].id == "1"
        assert outs[1].hits[0].id == "2"
        assert outs[2].hits[0].id == "3"
    finally:
        engine.close()


def test_batched_fulltext_and_hybrid_match_unbatched(tmp_path):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    cfg.tpu.query_batching = True
    cfg.tpu.batch_wait_ms = 5.0
    engine = build_orama(cfg, start_background=False)
    try:
        engine.write_side.create_collection(MASTER, "c", READ, WRITE)
        engine.write_side.write(
            "c",
            [
                {"id": "1", "body": "machine learning on accelerators", "price": 5},
                {"id": "2", "body": "machine tools in the workshop", "price": 15},
                {"id": "3", "body": "gardening tips for spring", "price": 25},
            ],
            WRITE,
        )
        engine.flush()
        engine.commit()
        reader = engine.read_side.collections["c"]

        for body in (
            {"term": "machine learning"},
            {"term": "machine", "where": {"price": {"lt": 20}}},
            {"term": "gardening spring", "mode": "hybrid"},
        ):
            p = SearchParams.from_json(body)
            batched = engine.read_side.search("c", p, READ)       # via batcher
            ranked, count, _ = reader.search(p, engine.read_side.ai)  # direct
            got = [(h.id, round(h.score, 4)) for h in batched.hits]
            want = [
                (
                    engine.read_side.doc_storage["c"].get(d)["id"],
                    round(s, 4),
                )
                for d, s in ranked
            ]
            assert got == want, body
            assert batched.count == count, body
    finally:
        engine.close()
