"""Robustness features: snapshot GC, HTTP load shedding (503 +
Retry-After), SSE comment keepalives."""

import json
import os
import threading
import time
import urllib.error
import urllib.request

import pytest

MASTER, READ, WRITE = "master", "read-key", "write-key"


def _gen_dirs(engine, cid="c1"):
    d = os.path.join(engine.cfg.reader_side.data_dir, "collections", cid)
    return sorted(n for n in os.listdir(d) if n.startswith("gen-"))


def test_snapshot_gc_prunes_old_generations(tmp_engine):
    tmp_engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    tmp_engine.flush()
    for i in range(4):
        tmp_engine.write_side.write(
            "c1", [{"id": str(i), "title": f"doc {i} cat"}], WRITE
        )
        tmp_engine.commit()
    gens = _gen_dirs(tmp_engine)
    assert len(gens) <= 2, gens  # keep_generations default
    # the surviving generation is loadable
    from orama_core_tpu import build_orama
    from orama_core_tpu.types import SearchParams

    cfg = tmp_engine.cfg
    tmp_engine.close()
    e2 = build_orama(cfg, start_background=False)
    r = e2.read_side.search("c1", SearchParams.from_json({"term": "cat"}), READ)
    assert r.count == 4
    e2.close()


def test_snapshot_gc_disabled(tmp_engine):
    tmp_engine.cfg.reader_side.keep_generations = 0
    tmp_engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    tmp_engine.flush()
    for i in range(3):
        tmp_engine.write_side.write(
            "c1", [{"id": str(i), "title": f"doc {i}"}], WRITE
        )
        tmp_engine.commit()
    assert len(_gen_dirs(tmp_engine)) == 3


@pytest.fixture()
def server(tmp_engine):
    from orama_core_tpu.config import HttpConfig
    from orama_core_tpu.server.http import WebServer

    tmp_engine.cfg.http = HttpConfig(
        host="127.0.0.1", port=0, max_in_flight=1, sse_keepalive_sec=0.5
    )
    ws = WebServer(tmp_engine, tmp_engine.cfg.http)
    ws.start_background()
    yield tmp_engine, f"http://127.0.0.1:{ws.port}"
    ws.stop()


def _post(url, body, bearer, timeout=10):
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json", "Authorization": f"Bearer {bearer}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read() or b"null")


def test_load_shedding_503(server):
    engine, base = server
    engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    engine.flush()
    engine.write_side.write("c1", [{"id": "1", "title": "hello"}], WRITE)
    engine.flush()

    started, release = threading.Event(), threading.Event()
    orig = engine.read_side.search

    def slow(*a, **k):
        started.set()
        release.wait(10)
        return orig(*a, **k)

    engine.read_side.search = slow
    try:
        t = threading.Thread(
            target=lambda: _post(
                base + "/v1/collections/c1/search", {"term": "hello"}, READ, 30
            ),
            daemon=True,
        )
        t.start()
        assert started.wait(5)
        # slot is held -> the second heavy request is shed
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/v1/collections/c1/search", {"term": "hello"}, READ)
        assert ei.value.code == 503
        assert ei.value.headers.get("Retry-After") == "1"
        # light routes are never shed
        req = urllib.request.Request(base + "/health")
        with urllib.request.urlopen(req, timeout=5) as r:
            assert r.status == 200
    finally:
        release.set()
        engine.read_side.search = orig
        t.join(timeout=30)
    # slot released -> heavy requests flow again (retry: the held request
    # may still be draining under a loaded test process)
    deadline = time.time() + 20
    while True:
        try:
            status, _ = _post(base + "/v1/collections/c1/search", {"term": "hello"}, READ)
            break
        except urllib.error.HTTPError as e:
            if e.code != 503 or time.time() > deadline:
                raise
            time.sleep(0.2)
    assert status == 200


def test_sse_keepalive_comments(server, monkeypatch):
    engine, base = server
    engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    engine.flush()

    def slow_events(*a, **k):
        yield {"type": "start"}
        time.sleep(1.3)  # > sse_keepalive_sec=0.5 -> at least one keepalive
        yield {"type": "end"}

    import orama_core_tpu.server.http as http_mod

    # the answer route imports answer_events lazily from engine.answer
    import orama_core_tpu.engine.answer as answer_mod

    monkeypatch.setattr(answer_mod, "answer_events", slow_events)

    req = urllib.request.Request(
        base + "/v1/collections/c1/answer",
        data=json.dumps({"query": "hi"}).encode(),
        headers={"Content-Type": "application/json", "Authorization": f"Bearer {READ}"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=15) as r:
        raw = r.read().decode()
    assert "keepalive" in raw
    assert '"type": "start"' in raw and '"type": "end"' in raw


def test_type_mismatched_values_are_ignored_not_errors(tmp_engine):
    """A document carrying a string where the schema inferred a number (or
    a non-bool in a bool field) must not abort the write batch: the
    mismatched value is ignored, the rest of the document still indexes
    (reference fields.rs:183-189, 236-243)."""
    from orama_core_tpu.types import SearchParams

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write(
        "c",
        [{"id": "1", "title": "first doc", "price": 10.0, "flag": True}],
        "wk",
    )
    # doc 2: price is a string, flag is a number — both ignored, title indexes
    e.write_side.write(
        "c",
        [{"id": "2", "title": "second doc", "price": "", "flag": 3.5}],
        "wk",
    )
    e.flush()
    res = e.read_side.search(
        "c", SearchParams.from_json({"term": "second"}), "rk"
    )
    assert [h.id for h in res.hits] == ["2"]
    # the mismatched values did not land in the number/bool indexes
    res = e.read_side.search(
        "c",
        SearchParams.from_json({"term": "doc", "where": {"price": {"gte": 0}}}),
        "rk",
    )
    assert {h.id for h in res.hits} == {"1"}
    res = e.read_side.search(
        "c",
        SearchParams.from_json({"term": "doc", "where": {"flag": True}}),
        "rk",
    )
    assert {h.id for h in res.hits} == {"1"}


def test_deleted_docs_stay_dead_after_restart(tmp_path):
    """Deletions are folded into committed generations, so the manifest's
    'deleted' list is empty post-commit — the cumulative 'dead' list must
    restore the alive mask on load, or match-all queries resurrect
    deleted ids with missing documents (review finding)."""
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.types import SearchParams

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write(
        "c", [{"id": str(i), "t": f"solar doc{i}"} for i in range(6)], "wk"
    )
    e.flush()
    e.commit()
    e.write_side.delete_documents("c", ["3"], "wk")
    e.flush()
    e.commit()
    e.close()

    e2 = build_orama(cfg, start_background=False)
    r = e2.read_side.search("c", SearchParams.from_json({"term": ""}), "rk")
    ids = [h.id for h in r.hits]
    assert r.count == 5 and "3" not in ids, (r.count, ids)
    reader = e2.read_side._reader("c")
    assert reader.doc_count == 5
    e2.close()


def test_malformed_bodies_are_400_not_500(server):
    """Missing required body fields are the client's error: 400, never a
    paged 500 (review finding: KeyError fell through to 'internal
    error')."""
    engine, base = server
    for path, body in (
        ("/v1/collections/create", {}),
        ("/v1/collections/nope/delete", {}),
    ):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + path, body, "master")
        assert ei.value.code in (400, 404), (path, ei.value.code)
        assert ei.value.code != 500


def test_oversized_body_rejected_413(server):
    engine, base = server
    req = urllib.request.Request(
        base + "/v1/collections/create",
        data=b"x",  # tiny actual body; the declared length is the attack
        headers={
            "Content-Type": "application/json",
            "Content-Length": str(10**12),
            "Authorization": "Bearer master",
        },
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=5)
    assert ei.value.code == 413


def test_cors_preflight_authorizes_bearer(server):
    """The Fetch spec excludes Authorization from the '*' wildcard — it
    must be listed explicitly (review finding)."""
    engine, base = server
    req = urllib.request.Request(base + "/health", method="OPTIONS")
    with urllib.request.urlopen(req, timeout=5) as r:
        allow = r.headers.get("Access-Control-Allow-Headers", "")
        methods = r.headers.get("Access-Control-Allow-Methods", "")
    assert "Authorization" in allow
    assert "POST" in methods


def test_metrics_route_labels_are_templated(server):
    """Per-document paths must collapse to :doc in the route label or the
    counter leaks one entry per distinct document id (review finding)."""
    engine, base = server
    engine.write_side.create_collection("master", "cm", "rk", "wk")
    engine.write_side.write("cm", [{"id": "a", "t": "x"}], "wk")
    engine.flush()
    for doc in ("a", "b", "zzz"):
        req = urllib.request.Request(
            base + f"/v1/collections/cm/documents/{doc}",
            headers={"Authorization": "Bearer rk"},
        )
        try:
            urllib.request.urlopen(req, timeout=5).read()
        except urllib.error.HTTPError:
            pass
    from orama_core_tpu.server.metrics import REGISTRY

    text = REGISTRY.expose_text()
    assert 'route="/v1/collections/:id/documents/:doc"' in text
    assert "/documents/zzz" not in text
