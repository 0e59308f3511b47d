"""Batched one-dispatch fused serving (ops/hybrid.hybrid_fused_topk_batch):
row-for-row parity with the single-query path across modes, fusions, and
the fused number filter (ROADMAP round-3 perf item: the micro-batcher's
B>1 shape families ride the fused program)."""

import pytest

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"

DOCS = [
    "solar panels convert sunlight into power",
    "wind turbines spin in the breeze",
    "bake a chocolate cake for dessert",
    "quantum computing with qubits",
    "solar and wind renewable energy mix",
    "the power grid balances supply",
    "solar power for the home",
    "wind power auctions set records",
    "dessert recipes with chocolate",
    "grid scale batteries store solar power",
]


@pytest.fixture()
def engine(tmp_path):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.tpu.query_batching = False
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write(
        "c",
        [{"id": str(i), "body": t, "price": i} for i, t in enumerate(DOCS)],
        WRITE,
    )
    e.flush()
    e.commit()
    yield e
    e.close()


def _batch_vs_single(reader, ai, bodies, monkeypatch, expect_fused=True):
    params = [SearchParams.from_json(dict(b)) for b in bodies]
    calls = []
    orig = reader._search_batch_hybrid_fused

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(reader, "_search_batch_hybrid_fused", spy)
    got = reader.search_batch(params, ai)
    if expect_fused:
        assert calls, "batched fused path did not engage"
    for p, (ranked_b, count_b) in zip(params, got):
        ranked_s, count_s, _ = reader.search(p, ai)
        assert count_b == count_s, p.term
        assert [d for d, _ in ranked_b] == [d for d, _ in ranked_s], p.term
        for (_, s1), (_, s2) in zip(ranked_b, ranked_s):
            assert abs(s1 - s2) < 1e-6, p.term


def test_batch_fused_hybrid_rrf_parity(engine, monkeypatch):
    reader = engine.read_side._reader("c")
    # mixed posting weights land rows in different bucket groups; mixed
    # limits exercise the shared-k top-k with per-row truncation
    bodies = [
        {"term": "solar", "mode": "hybrid"},
        {"term": "wind", "mode": "hybrid", "limit": 3},
        {"term": "chocolate", "mode": "hybrid", "limit": 7},
        {"term": "power", "mode": "hybrid"},
        {"term": "qubits", "mode": "hybrid", "limit": 2},
    ]
    _batch_vs_single(reader, engine.read_side.ai, bodies, monkeypatch)


def test_batch_fused_hybrid_minmax_parity(engine, monkeypatch):
    reader = engine.read_side._reader("c")
    bodies = [
        {"term": "solar", "mode": "hybrid", "fusion": "minmax"},
        {"term": "grid", "mode": "hybrid", "fusion": "minmax"},
        {"term": "dessert", "mode": "hybrid", "fusion": "minmax"},
    ]
    _batch_vs_single(reader, engine.read_side.ai, bodies, monkeypatch)


def test_batch_fused_fulltext_parity(engine, monkeypatch):
    reader = engine.read_side._reader("c")
    bodies = [
        {"term": "solar", "mode": "fulltext"},
        {"term": "power", "mode": "fulltext"},
        {"term": "zzz-no-match", "mode": "fulltext"},  # zero-span row
        {"term": "breeze", "mode": "fulltext"},
    ]
    _batch_vs_single(reader, engine.read_side.ai, bodies, monkeypatch)


def test_batch_fused_filtered_parity(engine, monkeypatch):
    reader = engine.read_side._reader("c")
    ai = engine.read_side.ai
    # shared number-range filter (the batcher keys on the filter)
    bodies = [
        {"term": "solar", "mode": "hybrid", "where": {"price": {"gte": 4}}},
        {"term": "power", "mode": "hybrid", "where": {"price": {"gte": 4}}},
    ]
    _batch_vs_single(reader, ai, bodies, monkeypatch)
    # eq filter + filtered vector mode (the unfiltered vector batch
    # belongs to the Pallas fast path, not the fused program)
    bodies = [
        {"term": "solar energy", "mode": "vector",
         "where": {"price": {"lte": 6}}},
        {"term": "chocolate cake", "mode": "vector",
         "where": {"price": {"lte": 6}}},
        {"term": "wind turbines", "mode": "vector",
         "where": {"price": {"lte": 6}}},
    ]
    _batch_vs_single(reader, ai, bodies, monkeypatch)


def test_batch_fused_survives_deletes(engine, monkeypatch):
    engine.write_side.delete_documents("c", ["1", "6"], WRITE)
    engine.flush()
    engine.commit()
    reader = engine.read_side._reader("c")
    bodies = [
        {"term": "solar", "mode": "hybrid"},
        {"term": "wind", "mode": "hybrid"},
    ]
    _batch_vs_single(reader, engine.read_side.ai, bodies, monkeypatch)


def test_batch_fused_pallas_plan_parity(tmp_path, monkeypatch):
    """The combined aligned block plan (Pallas interpret on CPU) must be
    row-for-row identical to the single-query fused path, which builds
    per-query aligned plans."""
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.tpu.query_batching = False
    e = build_orama(cfg, start_background=False)
    try:
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        e.write_side.write(
            "c",
            [{"id": str(i), "body": t, "price": i}
             for i, t in enumerate(DOCS)],
            WRITE,
        )
        e.flush()
        e.commit()
        reader = e.read_side._reader("c")
        reader.cfg._test_force_fast_path = True
        _batch_vs_single(reader, e.read_side.ai, [
            {"term": "solar", "mode": "fulltext"},
            {"term": "power", "mode": "fulltext"},
            {"term": "zzz-no-match", "mode": "fulltext"},
        ], monkeypatch)
        _batch_vs_single(reader, e.read_side.ai, [
            {"term": "wind", "mode": "hybrid"},
            {"term": "chocolate", "mode": "hybrid", "limit": 3},
        ], monkeypatch)
    finally:
        e.close()


def test_batch_fused_dense_rows_parity(tmp_path, monkeypatch):
    """Zipf-head terms ride the [b, H] weight matmul against the dense
    rows in the batched program — scores must match the single-query
    path (which uses dense_rows_contrib) to f32 round-off."""
    import numpy as np

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.tpu.query_batching = False
    # df_ratio huge so 'common' qualifies as heavy despite the small
    # padded capacity (threshold max(cap // ratio, 8) = 8 docs)
    cfg.tpu.bm25_dense_df_ratio = 10**6
    e = build_orama(cfg, start_background=False)
    try:
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        rng = np.random.default_rng(7)
        vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        docs = []
        for i in range(48):
            words = ["common"] * int(rng.integers(1, 4)) + list(
                rng.choice(vocab, size=int(rng.integers(2, 5)))
            )
            rng.shuffle(words)
            docs.append({"id": str(i), "body": " ".join(words)})
        e.write_side.write("c", docs, WRITE)
        e.flush()
        e.commit()
        reader = e.read_side._reader("c")
        # the head term must actually have a dense row for this test to
        # exercise the W @ dense_rows half
        sf = reader._string[
            next(fid for fid, f in reader.fields.items() if f.name == "body")
        ]
        gi = sf.committed.global_info()
        rows, by_term = reader._device.dense_term_rows(
            sf.committed, reader.capacity, gi.avgdl
        )
        assert rows is not None and by_term, "corpus did not trigger dense rows"
        bodies = [
            {"term": "common", "mode": "fulltext"},
            {"term": "alpha", "mode": "fulltext"},
            {"term": "common", "mode": "fulltext", "limit": 5},
            {"term": "gamma", "mode": "fulltext"},
        ]
        _batch_vs_single(reader, e.read_side.ai, bodies, monkeypatch)
    finally:
        e.close()


def test_batch_fused_chunk_partition(engine, monkeypatch):
    """A batch larger than the memory chunk must partition into several
    dispatches with correct row routing (forced tiny _BATCH_DENSE_SLOTS)."""
    reader = engine.read_side._reader("c")
    monkeypatch.setattr(
        type(reader), "_BATCH_DENSE_SLOTS", reader.capacity * 4
    )
    bodies = [
        {"term": t, "mode": "fulltext"}
        for t in ("solar", "wind", "power", "grid", "chocolate",
                  "dessert", "qubits", "breeze", "batteries", "records")
    ]
    _batch_vs_single(reader, engine.read_side.ai, bodies, monkeypatch)


def test_batch_fused_ineligible_falls_back(engine, monkeypatch):
    """An uncommitted window disables the fused batch (committed-only
    program) — results must still be correct through the fallback."""
    engine.write_side.write(
        "c", [{"id": "99", "body": "fresh solar news", "price": 99}], WRITE
    )
    engine.flush()  # window, no commit
    reader = engine.read_side._reader("c")
    bodies = [
        {"term": "solar", "mode": "fulltext"},
        {"term": "wind", "mode": "fulltext"},
    ]
    _batch_vs_single(
        reader, engine.read_side.ai, bodies, monkeypatch, expect_fused=False
    )
