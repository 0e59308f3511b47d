import pytest

from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.oplog import (
    InsertDocumentOp,
    channel,
)
from orama_core_tpu.types import (
    BoolFilter,
    NumberFilter,
    SearchParams,
    parse_facet,
    parse_filter,
)


def test_channel_offsets_monotonic():
    tx, rx = channel(100)
    for i in range(5):
        tx.send(InsertDocumentOp("c", i, {"id": str(i)}))
    ops = rx.drain()
    assert [s.offset.value for s in ops] == [1, 2, 3, 4, 5]
    assert tx.offset == 5


def test_send_many_preserves_order_and_offsets():
    """send_many chunks ops into <=64-op queue items; drain must flatten
    back to the exact send order with contiguous offsets, interleaving
    correctly with single send()s."""
    tx, rx = channel(100)
    tx.send(InsertDocumentOp("c", 0, {}))
    last = tx.send_many(
        [InsertDocumentOp("c", i, {}) for i in range(1, 150)]
    )
    tx.send(InsertDocumentOp("c", 150, {}))
    assert last.value == 150
    ops = rx.drain()
    assert [s.offset.value for s in ops] == list(range(1, 152))
    assert [s.op.doc_id for s in ops] == list(range(151))
    assert tx.send_many([]).value == tx.offset  # empty batch is a no-op


def test_send_many_concurrent_writers_no_interleave_within_batch():
    """Two threads sending batches concurrently: every batch's ops must
    stay contiguous in offset order (stamping and publish happen under
    one sender lock), and all offsets are a permutation of 1..N."""
    import threading

    tx, rx = channel(10_000)

    def writer(base):
        for b in range(10):
            tx.send_many(
                [InsertDocumentOp("c", base + b * 10 + i, {}) for i in range(10)]
            )

    threads = [threading.Thread(target=writer, args=(k * 1000,)) for k in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    ops = rx.drain()
    assert [s.offset.value for s in ops] == list(range(1, 201))
    # within each 10-op batch the doc ids are consecutive (no interleave)
    for i in range(0, 200, 10):
        ids = [s.op.doc_id for s in ops[i : i + 10]]
        assert ids == list(range(ids[0], ids[0] + 10))


def test_channel_offset_restore():
    tx, _ = channel(10)
    tx.set_offset(41)
    off = tx.send(InsertDocumentOp("c", 0, {}))
    assert off.value == 42


def test_search_params_from_json_defaults():
    p = SearchParams.from_json({"term": "hello"})
    assert p.term == "hello"
    assert p.mode.value == "fulltext"
    assert p.limit == 10
    assert p.properties is None


def test_search_params_filters_and_facets():
    p = SearchParams.from_json(
        {
            "term": "x",
            "mode": "hybrid",
            "limit": 3,
            "where": {"price": {"gte": 10}, "ok": True},
            "facets": {
                "price": {"ranges": [{"from": 0, "to": 10}]},
                "ok": {"true": True, "false": False},
            },
            "boost": {"title": 2.0},
        }
    )
    assert isinstance(p.where["price"], NumberFilter)
    assert p.where["price"].op == "gte"
    assert isinstance(p.where["ok"], BoolFilter)
    assert p.boost["title"] == 2.0
    nf = p.facets["price"]
    assert nf.ranges[0].key == "0-10"


def test_parse_filter_between():
    f = parse_filter({"between": [1, 5]})
    assert f.op == "between" and f.value == (1, 5)


def test_parse_filter_rejects_unknown_op():
    with pytest.raises(ValueError):
        parse_filter({"almost": 3})


def test_parse_facet_bool():
    f = parse_facet({"true": True, "false": True})
    assert f.true and f.false


def test_config_env_override(monkeypatch):
    cfg = OramaxConfig.load(
        path=None,
        env={
            "ORAMAX_http__port": "9090",
            "ORAMAX_writer_side__master_api_key": "secret",
            "ORAMAX_tpu__use_pallas": "false",
        },
    )
    assert cfg.http.port == 9090
    assert cfg.writer_side.master_api_key == "secret"
    assert cfg.tpu.use_pallas is False


def test_config_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        """
http:
  port: 1234
reader_side:
  commit_interval_sec: 5.0
tpu:
  mesh_shape: [4, 2]
"""
    )
    cfg = OramaxConfig.load(path=str(p), env={})
    assert cfg.http.port == 1234
    assert cfg.reader_side.commit_interval_sec == 5.0
    assert cfg.tpu.mesh_shape == (4, 2)


def test_env_numeric_api_key_stays_string():
    """ORAMAX_writer_side__master_api_key=123456 must compare equal to the
    '123456' Bearer header — int-coercion made every admin request 401."""
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig.load(
        path=None,
        env={
            "ORAMAX_writer_side__master_api_key": "123456",
            "ORAMAX_writer_side__insert_batch_commit_size": "77",
            "ORAMAX_ai__backend": "fake",
        },
    )
    assert cfg.writer_side.master_api_key == "123456"  # str, not int
    assert cfg.writer_side.insert_batch_commit_size == 77  # ints still coerce
    assert cfg.ai.backend == "fake"


def test_party_planner_tolerates_malformed_plans():
    """LLM plans are untrusted: bare step strings are accepted, anything
    else is dropped (never an AttributeError that kills the SSE stream)."""
    from orama_core_tpu.engine.answer import PartyPlanner

    class _Stub:
        pass

    p = PartyPlanner.__new__(PartyPlanner)

    class _AI:
        def chat(self, role, prompt, context=""):
            return ('{"actions": ["OPTIMIZE_QUERY", 42, {"step": "GIVE_REPLY",'
                    ' "description": "d"}, {"nostep": 1}, "NOT_AN_ACTION"]}')

    p.ai = _AI()
    steps = p.plan("q")
    assert [s["step"] for s in steps] == ["OPTIMIZE_QUERY", "GIVE_REPLY"]

    class _AI2:
        def chat(self, role, prompt, context=""):
            return '{"actions": "GIVE_REPLY"}'  # not a list

    p.ai = _AI2()
    steps = p.plan("q")  # falls back to the default plan
    assert steps[-1]["step"] == "GIVE_REPLY" and len(steps) == 3


def test_party_planner_threads_conversation(tmp_path):
    """run() must fold body['messages'] history into the LLM steps (it was
    accepted and silently dropped)."""
    import jax
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.engine.answer import PartyPlanner

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    e = build_orama(cfg, start_background=False)
    try:
        e.write_side.create_collection("master", "c", "rk", "wk")
        e.write_side.write("c", [{"id": "1", "body": "context doc"}], "wk")
        e.flush()
        planner = PartyPlanner(e.read_side)
        seen = []
        real_chat = planner.ai.chat

        def spy(role, prompt, context=""):
            seen.append((role, prompt))
            return real_chat(role, prompt, context)

        planner.ai = type("AI", (), {
            "chat": staticmethod(spy),
            "chat_stream": staticmethod(
                lambda role, prompt, context="": iter(
                    [seen.append((role, prompt)) or "ok"]
                )
            ),
        })()
        conv = [{"role": "user", "content": "earlier turn about llamas"}]
        list(planner.run("c", "and the second one?", conversation=conv,
                         skip_auth=True))
        llm_prompts = [pr for role, pr in seen if role.startswith("pp:")]
        assert llm_prompts and all("llamas" in pr for pr in llm_prompts)
    finally:
        e.close()


def test_document_storage_readd_invalidates_cache(tmp_path):
    from orama_core_tpu.engine.document_storage import DocumentStorage

    ds = DocumentStorage(str(tmp_path))
    ds.add_document(5, {"id": "a", "v": 1})
    ds.commit()
    assert ds.get(5)["v"] == 1          # populates the read cache
    ds.add_document(5, {"id": "a", "v": 2})
    ds.commit()
    assert ds.get(5)["v"] == 2, "stale cached committed version served"


def test_document_storage_compacts_garbage_segments(tmp_path):
    """Deleted/updated docs leave dead lines; once most lines are dead and
    segments piled up, commit must rewrite live docs into one segment and
    GC the old files (one commit later)."""
    import os

    from orama_core_tpu.engine.document_storage import DocumentStorage

    ds = DocumentStorage(str(tmp_path))
    for batch in range(8):
        for i in range(20):
            ds.add_document(batch * 20 + i, {"id": str(batch * 20 + i), "b": batch})
        ds.commit()
    assert len(ds._segments) == 8
    ds.delete_documents(range(0, 140))  # 140/160 dead
    ds.commit()                          # folds deletes -> compaction fires
    assert len(ds._segments) == 1, ds._segments
    assert ds.count_committed() == 20
    assert ds.get(150)["b"] == 7 and ds.get(5) is None
    ds.commit()  # deferred GC removes retired segment files
    on_disk = [n for n in os.listdir(tmp_path) if n.startswith("segment-")]
    assert len(on_disk) == 1, on_disk
    # reload sees the compacted layout
    ds2 = DocumentStorage(str(tmp_path))
    assert ds2.count_committed() == 20
    assert ds2.get(150)["b"] == 7


def test_document_storage_commit_race_keeps_newer_write(tmp_path):
    """An add_document landing between commit's snapshot and its pop must
    survive to the next commit (identity-guarded pop)."""
    from orama_core_tpu.engine.document_storage import DocumentStorage

    ds = DocumentStorage(str(tmp_path))
    v1 = {"id": "x", "v": 1}
    ds.add_document(1, v1)
    orig_write = ds._write_segment

    def racing_write(docs, seg_idx):
        ds.add_document(1, {"id": "x", "v": 2})  # races the commit
        return orig_write(docs, seg_idx)

    ds._write_segment = racing_write
    ds.commit()
    assert ds.uncommitted_count() == 1, "newer write must not be discarded"
    ds._write_segment = orig_write
    ds.commit()
    assert ds.get(1)["v"] == 2


def test_document_storage_cache_bounded(tmp_path):
    from orama_core_tpu.engine.document_storage import DocumentStorage

    ds = DocumentStorage(str(tmp_path))
    ds.CACHE_MAX = 10
    for i in range(50):
        ds.add_document(i, {"id": str(i)})
    ds.commit()
    for i in range(50):
        assert ds.get(i) is not None
    assert len(ds._cache) <= 10


def test_read_npz_tolerates_corrupt_archives(tmp_path):
    import numpy as np

    from orama_core_tpu.utils import atomic_write_npz, read_npz

    p = tmp_path / "x.npz"
    atomic_write_npz(str(p), {"a": np.arange(4)})
    assert read_npz(str(p))["a"].tolist() == [0, 1, 2, 3]
    p.write_bytes(p.read_bytes()[:20])  # truncate -> BadZipFile
    assert read_npz(str(p)) is None
    p.write_bytes(b"")                  # empty -> EOFError
    assert read_npz(str(p)) is None
    assert read_npz(str(tmp_path / "missing.npz")) is None


def test_channel_pending_counts_ops_not_chunks():
    """pending()/pending_ops() must report ops, not queue items: send_many
    enqueues <=64-op chunks, so qsize() undercounts channel depth."""
    tx, rx = channel(1000)
    tx.send_many([InsertDocumentOp("c", i, {}) for i in range(150)])
    tx.send(InsertDocumentOp("c", 150, {}))
    assert tx.pending() == 151
    assert rx.pending_ops() == 151
    first = rx.recv()  # one chunk (64 ops)
    assert isinstance(first, list) and len(first) == 64
    assert rx.pending_ops() == 151 - 64
    rx.drain()
    assert rx.pending_ops() == 0 and tx.pending() == 0
