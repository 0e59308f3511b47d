"""Concurrency invariants — the reference's deliberate design point: commits
exclude op application but never searches (commit_insert_mutex,
collection.rs:69,198,614; tested upstream by
test_read_commit_should_not_block_search, tests.rs:1372)."""

import threading
import time

from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "read-key", "write-key"


def test_commit_does_not_block_search(tmp_engine):
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.flush()
    docs = [
        {"id": str(i), "body": f"document number {i} about topic {i % 7}"}
        for i in range(300)
    ]
    tmp_engine.write_side.write("c", docs, WRITE)
    tmp_engine.flush()

    errors = []
    results = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                r = tmp_engine.read_side.search(
                    "c", SearchParams.from_json({"term": "document topic"}), READ
                )
                results.append(r.count)
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    # run several commits while searches hammer the collection
    for _ in range(3):
        tmp_engine.commit()
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not errors, errors
    assert results and all(c == 300 for c in results), set(results)


def test_concurrent_writes_and_searches(tmp_engine):
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.flush()
    errors = []

    def writer(base):
        try:
            for i in range(10):
                tmp_engine.write_side.write(
                    "c", [{"id": f"{base}-{i}", "body": f"payload {base} {i}"}], WRITE
                )
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(b,)) for b in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=20)
    tmp_engine.flush()
    assert not errors, errors
    r = tmp_engine.read_side.search(
        "c", SearchParams.from_json({"term": "payload", "limit": 50}), READ
    )
    assert r.count == 40


def test_deletes_commits_and_searches_race(tmp_engine):
    """Hammer search while deletes + commits fold tombstones: the commit
    REBINDS the deleted set (in-flight searches keep their snapshot) — a
    mutating clear() would crash np.fromiter mid-iteration, and a stale
    mask would resurrect deleted docs. Every search must see only alive
    docs' ids and never raise."""
    cid = "race"
    tmp_engine.write_side.create_collection(MASTER, cid, READ, WRITE)
    tmp_engine.write_side.write(
        cid,
        [{"id": str(i), "body": f"word{i} shared corpus"} for i in range(120)],
        WRITE,
    )
    tmp_engine.flush()
    tmp_engine.commit()

    errors = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                res = tmp_engine.read_side.search(
                    cid, SearchParams.from_json(
                        {"term": "shared", "limit": 50}), READ
                )
                for h in res.hits:
                    int(h.id)
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=searcher) for _ in range(3)]
    for t in threads:
        t.start()
    try:
        # interleave deletes, writes and commits
        for i in range(0, 60, 10):
            tmp_engine.write_side.delete_documents(
                cid, [str(j) for j in range(i, i + 10)], WRITE
            )
            tmp_engine.flush()
            if i % 20 == 0:
                tmp_engine.commit()
            reader = tmp_engine.read_side.collections[cid]
        tmp_engine.commit()
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=30)
    assert not errors, errors
    reader = tmp_engine.read_side.collections[cid]
    assert reader.deleted == set()
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "shared", "limit": 200}), READ
    )
    assert {int(h.id) for h in res.hits} == set(range(60, 120))
    assert res.count == 60


def test_search_during_ingest_never_crashes(tmp_engine):
    """Lock-free searches iterate the uncommitted window while inserts
    mutate it; without the window's internal lock this raised
    RuntimeError('dictionary changed size during iteration') within ~1 s
    (review finding, reproduced)."""
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.flush()
    tmp_engine.write_side.write(
        "c", [{"id": "seed", "body": "document zero topic"}], WRITE
    )
    tmp_engine.flush()
    errors = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                tmp_engine.read_side.search(
                    "c",
                    SearchParams.from_json({"term": "document topic"}),
                    READ,
                )
            except Exception as e:
                errors.append(e)
                return

    def writer():
        i = 0
        t0 = time.time()
        while time.time() - t0 < 3.0 and not errors:
            tmp_engine.write_side.write(
                "c",
                [{"id": f"d{i}", "body": f"document number {i} topic {i%7}"}],
                WRITE,
            )
            tmp_engine.flush()
            i += 1

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    wt = threading.Thread(target=writer)
    for t in threads:
        t.start()
    wt.start()
    wt.join()
    stop.set()
    for t in threads:
        t.join(timeout=10)
    assert not errors, errors
