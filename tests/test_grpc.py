"""gRPC AI-service seam tests (reference: service.proto:5-106 + the tonic
client in src/ai/mod.rs): an in-process AIService exposed over gRPC, a
RemoteAIService consuming it, and a full engine running with the remote
backend so auto-embeddings travel over the wire."""

import numpy as np
import pytest

grpc = pytest.importorskip("grpc")

from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.models.ai_service import AIService
from orama_core_tpu.rpc import RemoteAIService, serve_ai
from orama_core_tpu.rpc import ai_service_pb2 as pb
from orama_core_tpu.rpc.stubs import ENUM_TO_MODEL, MODEL_TO_ENUM
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "read-key", "write-key"


@pytest.fixture(scope="module")
def backend():
    ai = AIService()  # fake backend: deterministic hash-projection embedder
    server, port = serve_ai(ai, port=0)
    client = RemoteAIService(f"127.0.0.1:{port}")
    yield ai, client
    client.close()
    server.stop(grace=0)


def test_embed_roundtrip_matches_inprocess(backend):
    ai, client = backend
    texts = ["the cat sat", "quantum computing", ""]
    remote = client.embed_query("fake-small", texts)
    local = ai.embed_query("fake-small", texts)
    assert remote.shape == local.shape == (3, 128)
    np.testing.assert_allclose(remote, local, rtol=1e-6)
    # passage intent takes the other prefix path
    rp = client.embed_passage("fake-base", ["doc body"])
    lp = ai.embed_passage("fake-base", ["doc body"])
    np.testing.assert_allclose(rp, lp, rtol=1e-6)


def test_embed_empty_input(backend):
    _, client = backend
    out = client.embed_query("fake-small", [])
    assert out.shape[0] == 0


def test_model_enum_mapping_bijective():
    assert set(ENUM_TO_MODEL.values()) == set(MODEL_TO_ENUM.keys())
    assert MODEL_TO_ENUM["bge-small"] == pb.BGESmall
    assert ENUM_TO_MODEL[pb.MultilingualE5Large] == "multilingual-e5-large"


def test_chat_and_stream(backend):
    ai, client = backend
    full = client.chat("answer", "What is a cat?", context="cats are animals")
    assert isinstance(full, str) and full
    chunks = list(client.chat_stream("answer", "What is a cat?"))
    assert chunks and "".join(chunks)


def test_health(backend):
    _, client = backend
    h = client.check_health()
    assert h["status"] == "ok"
    assert h["backend"].startswith("remote:")


def test_health_unreachable():
    dead = RemoteAIService("127.0.0.1:1", timeout_s=0.5)
    h = dead.check_health()
    assert h["status"] == "error"
    dead.close()


def test_planned_answer_unimplemented_without_planner(backend):
    _, client = backend
    with pytest.raises(grpc.RpcError) as ei:
        list(client.planned_answer("q", "c1"))
    assert ei.value.code() == grpc.StatusCode.UNIMPLEMENTED


def test_engine_exposes_grpc_sidecar(tmp_path):
    """ai.grpc_port: the engine doubles as a model sidecar — embeddings and
    PlannedAnswer served over the wire (reference ai_server role)."""
    import json

    from orama_core_tpu import build_orama

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "writer")
    cfg.reader_side.data_dir = str(tmp_path / "reader")
    cfg.writer_side.commit_interval_sec = 3600.0
    cfg.reader_side.commit_interval_sec = 3600.0
    cfg.ai.grpc_port = 0
    engine = build_orama(cfg, start_background=False)
    client = RemoteAIService(f"127.0.0.1:{engine.grpc_port}")
    try:
        engine.write_side.create_collection(
            MASTER, "c1", read_api_key=READ, write_api_key=WRITE
        )
        engine.flush()
        engine.write_side.write(
            "c1", [{"id": "1", "title": "the cat sat on the mat"}], WRITE
        )
        engine.flush()
        out = client.embed_query("fake-small", ["hello"])
        assert out.shape == (1, 128)
        events = list(client.planned_answer("tell me about cats", "c1"))
        assert events[-1][1] is True  # finished marker
        actions = [json.loads(d)["action"] for d, fin in events if d]
        assert "ACTION_PLAN" in actions and "GIVE_REPLY" in actions
    finally:
        client.close()
        engine.close()


def test_engine_with_remote_backend(tmp_path, backend):
    """Full engine with ai.remote_url: auto-embeddings travel over gRPC and
    vector search works end-to-end."""
    from orama_core_tpu import build_orama

    _, client = backend
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "writer")
    cfg.reader_side.data_dir = str(tmp_path / "reader")
    cfg.writer_side.commit_interval_sec = 3600.0
    cfg.reader_side.commit_interval_sec = 3600.0
    cfg.ai.remote_url = client.url
    engine = build_orama(cfg, start_background=False)
    try:
        assert type(engine.ai).__name__ == "RemoteAIService"
        engine.write_side.create_collection(
            MASTER, "c1", read_api_key=READ, write_api_key=WRITE,
            embedding_model="fake-small",
        )
        engine.flush()
        engine.write_side.write(
            "c1",
            [
                {"id": "1", "title": "the cat sat on the mat"},
                {"id": "2", "title": "quantum computing explained"},
            ],
            WRITE,
        )
        engine.flush()
        res = engine.read_side.search(
            "c1",
            SearchParams.from_json({"term": "cat sat mat", "mode": "vector"}),
            READ,
        )
        assert res.count >= 1
        assert res.hits[0].id == "1"
    finally:
        engine.close()
