"""WAL durability: the uncommitted window survives a crash (an improvement
over the reference's volatile channel, SURVEY.md §5)."""

import json

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"


def _cfg(tmp_path, wal=True):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    cfg.writer_side.wal_enabled = wal
    return cfg


def test_uncommitted_window_survives_crash(tmp_path):
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "durable hello"}], WRITE)
    e.flush()
    # "crash": no commit, no clean close — just drop the engine
    del e

    e2 = build_orama(cfg, start_background=False)
    res = e2.read_side.search("c", SearchParams.from_json({"term": "durable"}), READ)
    assert res.count == 1
    assert res.hits[0].document["t"] == "durable hello"
    e2.close()


def test_wal_replays_only_beyond_committed_offset(tmp_path):
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "first"}], WRITE)
    e.commit()   # committed + WAL truncated
    e.write_side.write("c", [{"id": "2", "t": "second"}], WRITE)
    e.flush()    # durable but uncommitted
    del e

    e2 = build_orama(cfg, start_background=False)
    res = e2.read_side.search(
        "c", SearchParams.from_json({"term": "first second"}), READ
    )
    assert {h.id for h in res.hits} == {"1", "2"}
    assert e2.read_side.count_documents("c") == 2
    # offsets continue past the replayed window (no duplicate offsets)
    off_before = e2.write_side.op_sender.offset
    e2.write_side.write("c", [{"id": "3", "t": "third"}], WRITE)
    assert e2.write_side.op_sender.offset > off_before
    e2.flush()
    assert e2.read_side.count_documents("c") == 3
    e2.close()


def test_deletes_survive_crash(tmp_path):
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write(
        "c", [{"id": "1", "t": "keep me"}, {"id": "2", "t": "delete me"}], WRITE
    )
    e.commit()
    e.write_side.delete_documents("c", ["2"], WRITE)
    e.flush()  # delete durable in WAL, not committed
    del e

    e2 = build_orama(cfg, start_background=False)
    res = e2.read_side.search(
        "c", SearchParams.from_json({"term": "keep delete"}), READ
    )
    assert {h.id for h in res.hits} == {"1"}
    e2.close()


def test_torn_wal_tail_tolerated(tmp_path):
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "solid"}], WRITE)
    e.flush()
    del e
    # simulate a crash mid-append: garbage half-line at the tail
    wal_path = tmp_path / "w" / "oplog.wal"
    with open(wal_path, "ab") as f:
        f.write(b'{"o": 999, "t": "Inser')
    e2 = build_orama(cfg, start_background=False)
    res = e2.read_side.search("c", SearchParams.from_json({"term": "solid"}), READ)
    assert res.count == 1
    e2.close()


def test_without_wal_window_is_volatile(tmp_path):
    """Reference semantics when disabled (documented behavior)."""
    cfg = _cfg(tmp_path, wal=False)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "ephemeral"}], WRITE)
    e.flush()
    del e
    e2 = build_orama(cfg, start_background=False)
    assert "c" not in e2.read_side.collections
    e2.close()


def test_stale_write_info_does_not_regress_offsets(tmp_path):
    """Read side truncates the WAL at each commit; if the write side's
    info.json is stale (write-side commit never ran), the sender counter on
    reload must still clear every offset the read side already applied —
    otherwise replay/truncation break (double-replay or skipped ops)."""
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "one"}], WRITE)
    e.flush()
    e.commit()  # both sides persisted at offset X
    e.write_side.write("c", [{"id": "2", "t": "two"}], WRITE)
    e.flush()
    applied = e.read_side._applied_offset
    # read-side commit only: truncates the WAL; write-side info.json is now
    # STALE (still at offset X < applied)
    e.read_side.commit()
    del e

    e2 = build_orama(cfg, start_background=False)
    # the sender must resume past everything the read side applied
    assert e2.write_side.op_sender.offset >= applied
    e2.write_side.write("c", [{"id": "3", "t": "three"}], WRITE)
    e2.flush()
    assert e2.read_side.count_documents("c") == 3
    res = e2.read_side.search("c", SearchParams.from_json({"term": "three"}), READ)
    assert {h.id for h in res.hits} == {"3"}
    e2.close()


def test_wal_fsynced_before_ack(tmp_path):
    """Acknowledged inserts must be ON DISK (not just in userspace buffers)
    when write() returns — read the WAL file from a separate handle."""
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "acked"}], WRITE)
    with open(e.wal.path, "rb") as f:
        raw = f.read()
    assert b"acked" in raw  # durable at acknowledge time, before any flush()
    e.close()


def test_replay_restores_write_side_counters(tmp_path):
    """Crash after an fsync-acked write but before the write side's
    interval commit: replay must also restore next_doc_id and the doc-id
    map, or the next insert REUSES a dense id and silently merges its
    postings into a surviving document's."""
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "one"}], WRITE)
    e.flush()
    e.commit()  # write-side dump: next_doc_id=1
    e.write_side.write("c", [{"id": "2", "t": "two"}], WRITE)
    e.flush()   # acked in the WAL; write-side dump now stale
    del e

    e2 = build_orama(cfg, start_background=False)
    w = e2.write_side.collections["c"]
    assert w.next_doc_id == 2
    assert w.doc_id_by_user_id == {"1": 0, "2": 1}
    e2.write_side.write("c", [{"id": "3", "t": "three"}], WRITE)
    e2.flush()
    for term, want in [("one", {"1"}), ("two", {"2"}), ("three", {"3"})]:
        res = e2.read_side.search(
            "c", SearchParams.from_json({"term": term}), READ
        )
        assert {h.id for h in res.hits} == want, (term, res.hits)
    e2.close()


def test_replay_reconstructs_uncommitted_collection(tmp_path):
    """A collection created after the last write-side commit must be
    writable after a crash: the CreateCollectionOp in the WAL carries the
    write key, and field registry/doc map rebuild from the replayed ops."""
    from orama_core_tpu.types import ApiKeyError

    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c2", "rk2", "wk2")
    e.write_side.write("c2", [{"id": "x", "t": "fresh"}], "wk2")
    e.flush()
    del e  # crash: NO commit ever ran

    e2 = build_orama(cfg, start_background=False)
    w = e2.write_side.collections["c2"]
    assert set(w.fields) == {"___orama_auto_embedding", "t"}
    e2.write_side.write("c2", [{"id": "y", "t": "glacier"}], "wk2")
    e2.flush()
    res = e2.read_side.search(
        "c2", SearchParams.from_json({"term": "fresh glacier"}), "rk2"
    )
    assert {h.id for h in res.hits} == {"x", "y"}
    import pytest

    with pytest.raises(ApiKeyError):
        e2.write_side.write("c2", [{"id": "z"}], "WRONG")
    e2.close()


def test_concurrent_senders_keep_wal_in_offset_order(tmp_path):
    """OperationSender.send publishes (queue + WAL) under the offset lock:
    concurrent senders must never interleave out of offset order, or a
    commit between two out-of-order applies truncates an unapplied op."""
    import threading

    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)

    def writer(tag):
        for i in range(30):
            e.write_side.write("c", [{"id": f"{tag}-{i}", "t": f"w {tag}"}], WRITE)

    ts = [threading.Thread(target=writer, args=(t,)) for t in ("a", "b", "c")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    offsets = []
    with open(e.wal.path, "rb") as f:
        for raw in f:
            offsets.append(json.loads(raw)["o"])
    assert offsets == sorted(offsets)
    assert len(offsets) == len(set(offsets))
    e.flush()
    assert e.read_side.count_documents("c") == 90
    e.close()


def test_torn_tail_repaired_before_append(tmp_path):
    """A crash mid-append leaves a partial line; the next boot must
    truncate it BEFORE appending, or the next record merges into one
    unparseable line and replay/truncation silently drop everything
    after it (review finding)."""
    import os

    from orama_core_tpu import oplog
    from orama_core_tpu.wal import WriteAheadLog

    wd = str(tmp_path / "wal")
    w = WriteAheadLog(wd)
    w.append(oplog.StampedOp(oplog.Offset(1), oplog.InsertDocumentOp("c", 0, "0")))
    w.append(oplog.StampedOp(oplog.Offset(2), oplog.InsertDocumentOp("c", 1, "1")))
    w.sync()
    w.close()
    with open(os.path.join(wd, "oplog.wal"), "ab") as f:
        f.write(b'{"o": 3, "t": "InsertDocum')  # torn mid-append
    w2 = WriteAheadLog(wd)
    w2.append(oplog.StampedOp(oplog.Offset(3), oplog.InsertDocumentOp("c", 2, "2")))
    w2.sync()
    assert [s.offset.value for s in w2.replay(0)] == [1, 2, 3]
    # truncation after the repair keeps the tail intact too
    w2.truncate_through(1)
    assert [s.offset.value for s in w2.replay(0)] == [2, 3]
    w2.close()


def test_crash_between_pointer_swap_and_offset_write_is_idempotent(tmp_path):
    """A crash after the per-collection generation pointer swap but
    before the read-side info.json write re-delivers already-folded ops
    on replay; application must skip them (review finding: double-apply
    doubled doc_count and duplicated window postings)."""
    import os

    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": str(i), "t": f"solar doc{i}"} for i in range(4)], WRITE)
    e.flush()
    e.commit()
    # simulate the torn-commit window: reader generations + WAL reflect
    # the commit, but the read-side offset file reverts to pre-commit
    info_path = os.path.join(cfg.reader_side.data_dir, "info.json")
    info = json.loads(open(info_path).read())
    wal_path = os.path.join(cfg.writer_side.data_dir, "oplog.wal")
    wal_backup = open(wal_path, "rb").read()
    e.close()
    info["offset"] = 0
    open(info_path, "w").write(json.dumps(info))
    open(wal_path, "wb").write(wal_backup if wal_backup else b"")
    # rebuild a WAL containing the pre-commit window so replay re-delivers
    from orama_core_tpu import oplog
    from orama_core_tpu.wal import WriteAheadLog

    w = WriteAheadLog(cfg.writer_side.data_dir)
    for i in range(4):
        w.append(oplog.StampedOp(
            oplog.Offset(i + 1),
            oplog.InsertDocumentOp(
                "c", i, {"id": str(i), "t": f"solar doc{i}"}
            ),
        ))
    w.sync()
    w.close()

    e2 = build_orama(cfg, start_background=False)
    reader = e2.read_side._reader("c")
    assert reader.doc_count == 4, reader.doc_count  # not doubled
    res = e2.read_side.search("c", SearchParams.from_json({"term": "solar"}), READ)
    assert res.count == 4
    e2.close()


def test_read_commit_keeps_write_dump_fresh_before_truncation(tmp_path):
    """WAL entries are the only way absorb_replayed restores next_doc_id
    after a crash; the read-side commit must therefore persist the
    write-side dump before truncating (review finding: a crash after an
    independent read commit regressed next_doc_id and reused doc ids)."""
    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write(
        "c", [{"id": str(i), "t": f"solar doc{i}"} for i in range(5)], WRITE
    )
    e.flush()
    # read-side commit only (what the background interval does): it
    # truncates the WAL — the write dump must be persisted first
    e.read_side.commit()
    del e  # crash: write_side.commit() never ran explicitly

    e2 = build_orama(cfg, start_background=False)
    ids = e2.write_side.write("c", [{"id": "new", "t": "fresh"}], WRITE)
    e2.flush()
    assert ids == ["new"]
    reader = e2.read_side._reader("c")
    # the new doc must NOT have reused a dense id of a survivor
    assert reader.doc_count == 6, reader.doc_count
    res = e2.read_side.search("c", SearchParams.from_json({"term": "solar"}), READ)
    assert res.count == 5
    e2.close()


def test_delete_send_failure_keeps_mapping(tmp_path):
    """A failed delete send must leave the user-id mapping intact so the
    client's retry works (review finding: popping first left ghost docs
    searchable but undeletable)."""
    import pytest

    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "ghost candidate"}], WRITE)
    e.flush()
    orig = e.write_side.op_sender.send

    def boom(op):
        raise RuntimeError("channel full")

    e.write_side.op_sender.send = boom
    with pytest.raises(RuntimeError):
        e.write_side.delete_documents("c", ["1"], WRITE)
    e.write_side.op_sender.send = orig
    # retry succeeds: the mapping survived the failed send
    assert e.write_side.delete_documents("c", ["1"], WRITE) == 1
    e.flush()
    res = e.read_side.search("c", SearchParams.from_json({"term": "ghost"}), READ)
    assert res.count == 0
    e.close()


def test_embedding_batch_requeued_on_backend_failure(tmp_path):
    """A transient embedding-backend failure must re-queue the drained
    requests, not silently drop them (review finding: those docs would
    never get vectors)."""
    import pytest

    cfg = _cfg(tmp_path)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", [{"id": "1", "t": "embed me"}], WRITE)
    calls = {"n": 0}
    orig = e.ai.embed_passage

    def flaky(model, texts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("backend down")
        return orig(model, texts)

    e.ai.embed_passage = flaky
    with pytest.raises(RuntimeError):
        e.write_side.process_embeddings()
    # the requests were re-queued: the retry drains them successfully
    assert e.write_side.process_embeddings() >= 1
    e.ai.embed_passage = orig
    e.flush()
    res = e.read_side.search(
        "c", SearchParams.from_json({"term": "embed me", "mode": "vector"}), READ
    )
    assert res.count >= 1
    e.close()
