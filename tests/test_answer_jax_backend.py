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
