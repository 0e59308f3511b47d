"""HTTP API tests — counterpart of the reference's hurl E2E suite
(`tests/search.rs`: boot a real WebServer + fake AI, drive over HTTP)."""

import json
import threading
import urllib.request
import urllib.error

import pytest


@pytest.fixture()
def server(tmp_engine):
    from orama_core_tpu.server.http import WebServer
    from orama_core_tpu.config import HttpConfig

    ws = WebServer(tmp_engine, HttpConfig(host="127.0.0.1", port=0))
    ws.start_background()
    yield tmp_engine, f"http://127.0.0.1:{ws.port}"
    ws.stop()


def _req(url, method="GET", body=None, bearer=None):
    headers = {"Content-Type": "application/json"}
    if bearer:
        headers["Authorization"] = f"Bearer {bearer}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            raw = r.read() or b"null"
            try:
                return r.status, json.loads(raw)
            except json.JSONDecodeError:
                return r.status, raw.decode()
    except urllib.error.HTTPError as e:
        payload = e.read()
        try:
            return e.code, json.loads(payload)
        except json.JSONDecodeError:
            return e.code, payload.decode()


def _setup_collection(engine, base):
    status, _ = _req(
        base + "/v1/collections/create",
        "POST",
        {"id": "c1", "read_api_key": "rk", "write_api_key": "wk"},
        bearer="master",
    )
    assert status == 201
    status, out = _req(
        base + "/v1/collections/c1/insert",
        "POST",
        [
            {"id": "1", "title": "hello tpu world", "price": 3},
            {"id": "2", "title": "another document", "price": 9},
        ],
        bearer="wk",
    )
    assert status == 200 and out["inserted"] == 2
    engine.flush()


def test_health_and_root(server):
    engine, base = server
    status, _ = _req(base + "/health")
    assert status == 200
    status, out = _req(base + "/")
    assert status == 200 and "message" in out


def test_openapi(server):
    _, base = server
    status, spec = _req(base + "/openapi.json")
    assert status == 200
    assert "/v1/collections/{id}/search" in spec["paths"]


def test_crud_and_search_over_http(server):
    engine, base = server
    _setup_collection(engine, base)

    status, cols = _req(base + "/v1/collections", bearer="master")
    assert status == 200 and cols[0]["id"] == "c1"
    assert cols[0]["document_count"] == 2

    status, col = _req(base + "/v1/collections/c1", bearer="master")
    assert status == 200 and col["fields"]["title"] == "string"

    status, res = _req(
        base + "/v1/collections/c1/search?api-key=rk",
        "POST",
        {"term": "hello"},
    )
    assert status == 200
    assert res["count"] == 1
    assert res["hits"][0]["id"] == "1"
    assert res["hits"][0]["document"]["title"] == "hello tpu world"

    # filters through the full HTTP path
    status, res = _req(
        base + "/v1/collections/c1/search?api-key=rk",
        "POST",
        {"term": "hello another document", "where": {"price": {"gt": 5}}},
    )
    assert status == 200
    assert [h["id"] for h in res["hits"]] == ["2"]

    # raw client vector (reference TODO, dto.rs:196-201): querying with a
    # doc's own passage embedding must return that doc; bad dims -> 400
    model = next(
        f.model
        for f in engine.read_side._reader("c1").fields.values()
        if f.model
    )
    raw = [
        float(x)
        for x in engine.read_side.ai.embed_passage(model, ["hello tpu world"])[0]
    ]
    status, res = _req(
        base + "/v1/collections/c1/search?api-key=rk",
        "POST",
        {"mode": "vector", "vector": raw},
    )
    assert status == 200 and res["hits"][0]["id"] == "1"
    status, _ = _req(
        base + "/v1/collections/c1/search?api-key=rk",
        "POST",
        {"mode": "vector", "vector": [1.0, 2.0]},
    )
    assert status == 400


def test_document_get_and_delete(server):
    engine, base = server
    _setup_collection(engine, base)
    status, doc = _req(base + "/v1/collections/c1/documents/1?api-key=rk")
    assert status == 200 and doc["title"] == "hello tpu world"

    status, out = _req(
        base + "/v1/collections/c1/delete", "POST", {"ids": ["1"]}, bearer="wk"
    )
    assert status == 200 and out["deleted"] == 1
    engine.flush()
    status, res = _req(
        base + "/v1/collections/c1/search?api-key=rk", "POST", {"term": "hello"}
    )
    assert res["count"] == 0


def test_auth_failures(server):
    engine, base = server
    _setup_collection(engine, base)
    status, _ = _req(base + "/v1/collections", bearer="wrong")
    assert status == 401
    status, _ = _req(
        base + "/v1/collections/c1/search?api-key=bad", "POST", {"term": "x"}
    )
    assert status == 401
    status, _ = _req(
        base + "/v1/collections/c1/insert", "POST", [{"id": "x"}], bearer="bad"
    )
    assert status == 401


def test_404s(server):
    engine, base = server
    status, _ = _req(base + "/nope")
    assert status == 404
    status, _ = _req(
        base + "/v1/collections/ghost/search?api-key=rk", "POST", {"term": "x"}
    )
    assert status == 404


def test_bad_body(server):
    engine, base = server
    _setup_collection(engine, base)
    status, out = _req(
        base + "/v1/collections/c1/search?api-key=rk", "POST", {"term": "x", "mode": "??"}
    )
    assert status == 400


def test_metrics_endpoint(server):
    engine, base = server
    _setup_collection(engine, base)
    _req(base + "/v1/collections/c1/search?api-key=rk", "POST", {"term": "hello"})
    req = urllib.request.Request(base + "/metrics")
    with urllib.request.urlopen(req, timeout=10) as r:
        text = r.read().decode()
    assert "reader_search_elapsed_sec" in text
    assert "http_requests_total" in text


def test_actions_execute(server):
    engine, base = server
    _setup_collection(engine, base)
    status, res = _req(
        base + "/v1/c1/actions/execute?api-key=rk",
        "POST",
        {"name": "search", "context": json.dumps({"term": "hello"})},
    )
    assert status == 200 and res["count"] == 1
    status, out = _req(
        base + "/v1/c1/actions/execute?api-key=rk",
        "POST",
        {"name": "dance", "context": "{}"},
    )
    assert status == 422


def test_answer_sse(server):
    engine, base = server
    _setup_collection(engine, base)
    req = urllib.request.Request(
        base + "/v1/collections/c1/answer?api-key=rk",
        data=json.dumps({"query": "hello tpu"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        events = []
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
    types = [e["type"] for e in events]
    assert types[0] == "acknowledgement"
    assert "optimized-query" in types
    assert "sources" in types
    assert "answer_chunk" in types
    final_chunks = [e for e in events if e["type"] == "answer_chunk"]
    assert final_chunks[-1]["message"]["is_final"] is True
    sources = next(e for e in events if e["type"] == "sources")
    assert sources["message"]["count"] >= 1


def test_planned_answer_sse(server):
    engine, base = server
    _setup_collection(engine, base)
    req = urllib.request.Request(
        base + "/v1/collections/c1/planned_answer?api-key=rk",
        data=json.dumps({"query": "tell me about tpu"}).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        events = []
        for line in r:
            line = line.decode().strip()
            if line.startswith("data: "):
                events.append(json.loads(line[6:]))
    # the plan itself streams first, then each executed step
    payloads = [json.loads(e["message"]) for e in events]
    actions = [p["action"] for p in payloads]
    assert actions[0] == "ACTION_PLAN"  # reference label, party_planner.py:112
    assert "PERFORM_ORAMA_SEARCH" in actions
    assert "GIVE_REPLY" in actions
    search_step = next(p for p in payloads if p["action"] == "PERFORM_ORAMA_SEARCH")
    assert "hits" in json.loads(search_step["result"])


def test_hooks_api(server):
    engine, base = server
    _setup_collection(engine, base)
    code = "function selectEmbeddingProperties(doc) { return ['title']; }"
    status, _ = _req(
        base + "/v1/collections/c1/hooks/create",
        "POST",
        {"name": "selectEmbeddingProperties", "code": code},
        bearer="wk",
    )
    assert status == 200
    status, hooks = _req(base + "/v1/collections/c1/hooks/list", bearer="wk")
    assert status == 200 and "selectEmbeddingProperties" in hooks
    # fetch one hook (reference: GET /v1/{id}/hooks/get, hooks.rs:68-99)
    status, one = _req(
        base + "/v1/collections/c1/hooks/get?name=selectEmbeddingProperties",
        bearer="wk",
    )
    assert status == 200 and one["code"] == code
    status, _ = _req(base + "/v1/collections/c1/hooks/get?name=nope", bearer="wk")
    assert status == 404
    # reference path shapes: /v1/{collection_id}/hooks/* without the
    # "collections" segment, and "remove" (hooks.rs:68,101,137)
    status, one = _req(
        base + "/v1/c1/hooks/get?name=selectEmbeddingProperties", bearer="wk"
    )
    assert status == 200 and one["code"] == code
    status, hooks = _req(base + "/v1/c1/hooks/list", bearer="wk")
    assert status == 200 and "selectEmbeddingProperties" in hooks
    # inserting with the hook routes embedding input through 'title' only
    status, _ = _req(
        base + "/v1/collections/c1/insert",
        "POST",
        [{"id": "3", "title": "hooked doc", "body": "ignored for embedding"}],
        bearer="wk",
    )
    assert status == 200
    engine.flush()
    status, _ = _req(
        base + "/v1/c1/hooks/remove",
        "POST",
        {"name": "selectEmbeddingProperties"},
        bearer="wk",
    )
    assert status == 200


def test_sse_pump_exits_on_client_disconnect(server, monkeypatch):
    """When an SSE client disconnects mid-stream, the pump thread must not
    stay blocked on the full queue forever (ADVICE r2: it leaked a thread
    and kept the in-flight generation alive under client churn)."""
    import socket
    import time

    engine, base = server
    _setup_collection(engine, base)

    state = {"closed": False, "produced": 0}

    def endless_events(*a, **kw):
        try:
            while True:
                state["produced"] += 1
                yield {"type": "answer_chunk", "message": {"text": "x" * 512}}
        finally:
            state["closed"] = True

    from orama_core_tpu.server import http as http_mod

    monkeypatch.setattr(
        "orama_core_tpu.engine.answer.answer_events", endless_events
    )

    host, port = base[len("http://"):].split(":")
    s = socket.create_connection((host, int(port)), timeout=10)
    body = json.dumps({"query": "hi"}).encode()
    s.sendall(
        b"POST /v1/collections/c1/answer?api-key=rk HTTP/1.1\r\n"
        b"Host: x\r\nContent-Type: application/json\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    s.recv(4096)  # read a bit of the stream, then vanish
    s.close()

    deadline = time.time() + 15
    while not state["closed"] and time.time() < deadline:
        time.sleep(0.2)
    assert state["closed"], "pump thread still alive after client disconnect"
    # generator stopped promptly — not still producing unboundedly
    p = state["produced"]
    time.sleep(1.0)
    assert state["produced"] == p


def test_document_fetch_is_cqrs_safe(server):
    """GET /documents/{user_id} must resolve entirely read-side: it keeps
    working with the write side's collection registry emptied (the sides
    may run as separate processes — reference operation.rs:119-133)."""
    engine, base = server
    _setup_collection(engine, base)

    saved = dict(engine.write_side.collections)
    engine.write_side.collections.clear()
    try:
        status, doc = _req(base + "/v1/collections/c1/documents/1?api-key=rk")
        assert status == 200 and doc["title"] == "hello tpu world"
        status, _ = _req(base + "/v1/collections/c1/documents/ghost?api-key=rk")
        assert status == 404
    finally:
        engine.write_side.collections.update(saved)

    # survives commit + reload (map persists in the doc-storage manifest)
    engine.commit()
    status, doc = _req(base + "/v1/collections/c1/documents/2?api-key=rk")
    assert status == 200 and doc["title"] == "another document"


def test_malformed_bodies_never_500(server):
    """Fuzz the write/search routes with hostile payloads: every response
    must be a clean 4xx JSON error — never a 500 or a hang (client input
    must not reach an unhandled exception)."""
    engine, base = server
    hostile = [
        b"not json at all",
        b"[",
        b'{"term": ',
        b"null",
        b'"just a string"',
        b"[]",
        b'{"term": {"nested": "object"}}',
        b'{"term": "x", "mode": "warp-drive"}',
        b'{"term": "x", "limit": "many"}',
        b'{"term": "x", "limit": -5}',
        b'{"term": "x", "where": {"price": {"gt": "soon"}}}',
        b'{"term": "x", "where": {"price": "flat"}}',
        b'{"term": "x", "properties": 7}',
        b'{"term": "x", "facets": {"price": []}}',
        b'{"vector": "not-a-list", "mode": "vector"}',
        b'{"term": "x", "boost": {"title": "big"}}',
        ('{"term": "' + "x" * 100000 + '"}').encode(),
        b'{"term": "\xc3"}'[:12],  # truncated utf-8
    ]
    import urllib.error
    import urllib.request

    for body in hostile:
        for path, bearer in (
            ("/v1/collections/c1/search?api-key=rk", None),
            ("/v1/collections/c1/insert", "wk"),
        ):
            req = urllib.request.Request(
                base + path, data=body,
                headers={
                    "Content-Type": "application/json",
                    **({"Authorization": f"Bearer {bearer}"} if bearer else {}),
                },
            )
            try:
                with urllib.request.urlopen(req, timeout=30) as r:
                    status = r.status
            except urllib.error.HTTPError as e:
                status = e.code
            assert 200 <= status < 500, (status, body[:60], path)
