"""Answer pipeline with the real JAX decoder backend (random weights): the
full RAG loop — optimize query via LLM decode, hybrid search, stream —
exercises generate()/KV-cache inside the engine, not just canned fakes."""

import pytest

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.engine.answer import answer_events

MASTER, READ, WRITE = "master", "rk", "wk"


def test_answer_pipeline_with_jax_llm(tmp_path):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    cfg.ai.backend = "jax"
    cfg.ai.llm_model = "jax-tiny"        # random-weight decoder
    cfg.ai.embedding_model = "fake-small"  # embeddings stay deterministic
    engine = build_orama(cfg, start_background=False)
    try:
        engine.write_side.create_collection(MASTER, "c", READ, WRITE)
        engine.write_side.write(
            "c", [{"id": "1", "body": "the answer engine test document"}], WRITE
        )
        engine.flush()
        events = list(
            answer_events(engine.read_side, "c", "what is this?", skip_auth=True)
        )
        types = [e["type"] for e in events]
        assert types[0] == "acknowledgement"
        assert "optimized-query" in types
        assert "sources" in types
        # the decoder generated *something* and the stream terminated
        chunks = [e for e in events if e["type"] == "answer_chunk"]
        assert chunks and chunks[-1]["message"]["is_final"] is True
        assert "error" not in types
    finally:
        engine.close()


def _fake_engine(tmp_path):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    engine = build_orama(cfg, start_background=False)
    engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    engine.write_side.write(
        "c", [{"id": "1", "body": "party planner streaming test doc"}], WRITE
    )
    engine.flush()
    return engine


def test_party_planner_streams_create_code_chunks(tmp_path):
    """A streams=True action (CREATE_CODE) must emit one message per LLM
    chunk plus a terminal accumulated message (reference streams each
    chunk, party_planner.py:98-133)."""
    from orama_core_tpu.engine.answer import PartyPlanner

    engine = _fake_engine(tmp_path)
    try:
        planner = PartyPlanner(engine.read_side)
        planner.plan = lambda q: [
            {"step": "CREATE_CODE", "description": "write a long example "
             "function that frobnicates widgets thoroughly and carefully"},
            {"step": "GIVE_REPLY", "description": "reply"},
        ]
        events = list(planner.run("c", "make me code for frobnicating "
                                  "widgets in a loop with retries",
                                  skip_auth=True))
        cc = [e for e in events if e["action"] == "CREATE_CODE"]
        # multiple chunk messages + one terminal message with done=True
        assert len(cc) >= 3
        assert cc[-1].get("done") is True
        assert all("done" not in e for e in cc[:-1])
        # terminal message decodes the {"code": ...} JSON contract
        assert cc[-1]["result"].startswith("// generated")
        assert "".join(e["result"] for e in cc[:-1]).strip().startswith("{")
    finally:
        engine.close()


def test_party_planner_optimize_query_feeds_search(tmp_path):
    """PERFORM_ORAMA_SEARCH consumes the decoded OPTIMIZE_QUERY result
    (reference _execute_orama_search, party_planner.py:59-77)."""
    from orama_core_tpu.engine.answer import PartyPlanner

    engine = _fake_engine(tmp_path)
    try:
        planner = PartyPlanner(engine.read_side)
        events = list(
            planner.run("c", "party planner streaming", skip_auth=True)
        )
        actions = [e["action"] for e in events]
        assert actions[0] == "ACTION_PLAN"
        opt = next(e for e in events if e["action"] == "OPTIMIZE_QUERY")
        # decoded payload, not the raw {"query": ...} JSON envelope
        assert not opt["result"].strip().startswith("{")
        search = next(
            e for e in events if e["action"] == "PERFORM_ORAMA_SEARCH"
        )
        import json as _json

        assert _json.loads(search["result"])["count"] >= 1
    finally:
        engine.close()


def test_query_translator_json_contract():
    """google_query_translator replies {"query": ...} (reference
    prompts/main.py:43-49) and parse_query_json tolerates both the
    contract and plain-text replies."""
    import json as _json

    from orama_core_tpu.engine.answer import (
        decode_action_result,
        parse_query_json,
    )
    from orama_core_tpu.models.fake import FakeLLM

    raw = FakeLLM().chat("google_query_translator", "What is a TPU?")
    assert _json.loads(raw)["query"]  # fake honors the wire contract
    assert parse_query_json(raw) == _json.loads(raw)["query"]
    assert parse_query_json("plain text reply") == "plain text reply"
    assert parse_query_json('prose {"query": "x"} prose') == "x"
    assert decode_action_result("GENERATE_QUERIES", '{"queries": ["a"]}') == '["a"]'
    assert decode_action_result("CREATE_CODE", "not json") == "not json"
