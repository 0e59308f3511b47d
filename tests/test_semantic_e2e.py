"""Semantic end-to-end proof with TRAINED weights (VERDICT r3 item 7 /
r4 next #5): vector search must rank by MEANING — cross-vocabulary
queries (no token overlap with the target document) retrieve the
topically right passages.

Two checkpoint tiers feed the same assertions:

1. An operator-prepared REAL checkpoint (BGE-small) — the production
   route; the image is zero-egress, so scripts/prepare_checkpoint.py
   documents the one-command download on a networked machine:

       ORAMAX_EMBED_CHECKPOINT=/ckpts/bge-small python -m pytest \
           tests/test_semantic_e2e.py -v

2. The IN-IMAGE trained tiny contrastive encoder
   (scripts/train_tiny_encoder.py -> tests/assets/tiny-semantic): a
   2-layer BERT-schema model trained on synthetic topic-cluster
   paraphrase pairs whose positives share (usually) zero tokens — it
   learns word-level topical semantics, which is exactly what these
   cross-vocabulary probes require. With it committed, the assertions
   execute un-skipped in the zero-egress CI.

Checkpoint discovery order: $ORAMAX_EMBED_CHECKPOINT, /ckpts/bge-small,
~/ckpts/bge-small, then the repo-local trained tier. Reference
capability being matched: the fastembed default models the reference
serves out of the box
(/root/reference/src/ai_server/src/embeddings/models.py:18-76).
"""

import os

import pytest

from orama_core_tpu.types import SearchParams


def _find_checkpoint():
    cands = [os.environ.get("ORAMAX_EMBED_CHECKPOINT")]
    cands += ["/ckpts/bge-small", os.path.expanduser("~/ckpts/bge-small")]
    cands.append(
        os.path.join(os.path.dirname(__file__), "assets", "tiny-semantic")
    )
    for c in cands:
        if c and os.path.isdir(c) and os.path.exists(
            os.path.join(c, "config.json")
        ):
            return c
    return None


CKPT = _find_checkpoint()

# applies to the real-weights tests only — test_checkpoint_path_mechanics
# below runs everywhere
needs_real_weights = pytest.mark.skipif(
    CKPT is None,
    reason="no trained embedding checkpoint on disk (run "
    "scripts/train_tiny_encoder.py, or set ORAMAX_EMBED_CHECKPOINT — "
    "see scripts/prepare_checkpoint.py for the real-BGE route)",
)

MASTER = "master"
READ = "rk"
WRITE = "wk"

# Deliberately cross-vocabulary: the query shares no informative token
# with its target passage, so lexical signals (BM25, the hashed lexical
# fallback embedder) cannot solve it — only trained semantics can.
PASSAGES = {
    "baking": "Combine the flour, sugar and butter, then leave the tin "
    "in a hot oven for forty minutes.",
    "astronomy": "The telescope's mirror gathers faint light from "
    "galaxies billions of parsecs away.",
    "football": "The striker volleyed the cross into the top corner "
    "just before the final whistle.",
    "medicine": "The physician prescribed antibiotics after the blood "
    "test confirmed a bacterial infection.",
}
QUERIES = {
    "baking": "how do I make a cake",
    "astronomy": "observing distant stars at night",
    "football": "an exciting soccer goal",
    "medicine": "treatment for an illness caused by germs",
}


@pytest.fixture()
def engine(tmp_path):
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.ai.backend = "jax"
    cfg.ai.embedding_model = "bge-small"
    # collections embed with the WRITER side's default model — without
    # this the auto-embedding field silently registers fake-small and the
    # checkpoint never runs
    cfg.writer_side.default_embedding_model = "bge-small"
    cfg.ai.embedding_checkpoint_path = CKPT
    e = build_orama(cfg, start_background=False)
    try:
        yield e
    finally:
        e.close()


@needs_real_weights
def test_real_weights_loaded_not_fallback(engine):
    """The checkpoint must load through hf_loader (a schema failure would
    silently serve the lexical tier and void the semantic assertions)."""
    ai = engine.read_side.ai
    emb = ai._embedder("bge-small")
    from orama_core_tpu.models.lexical import LexicalEmbedder

    assert not isinstance(emb, LexicalEmbedder), (
        f"checkpoint at {CKPT} fell back to the lexical tier — "
        "run scripts/prepare_checkpoint.py to validate it"
    )


@needs_real_weights
def test_semantic_ranking_end_to_end(engine):
    """Ingest -> embed (auto-embedding pipeline) -> commit -> vector
    search: every cross-vocabulary query must rank its own topic first."""
    e = engine
    e.write_side.create_collection(MASTER, "sem", READ, WRITE)
    e.flush()
    docs = [
        {"id": topic, "body": text} for topic, text in PASSAGES.items()
    ]
    # pad the corpus so ranking above chance is meaningful
    for i in range(20):
        docs.append(
            {"id": f"noise{i}", "body": f"miscellaneous filler entry {i}"}
        )
    e.write_side.write("sem", docs, WRITE)
    e.flush()
    e.commit()
    for topic, q in QUERIES.items():
        r = e.read_side.search(
            "sem",
            SearchParams.from_json({"term": q, "mode": "vector", "limit": 3}),
            READ,
        )
        assert r.hits, q
        assert r.hits[0].id == topic, (
            q,
            [(h.id, round(h.score, 3)) for h in r.hits],
        )


@needs_real_weights
def test_semantic_hybrid_beats_mismatched_lexical(engine):
    """Hybrid fusion with real embeddings: a query whose tokens match the
    WRONG document lexically must still surface the semantically right
    one in the top-2 via the vector leg."""
    e = engine
    e.write_side.create_collection(MASTER, "hyb", READ, WRITE)
    e.flush()
    e.write_side.write("hyb", [
        {"id": "right", "body": PASSAGES["baking"]},
        # lexical decoy: contains the query's surface tokens
        {"id": "decoy", "body": "make cake make cake make a cake word"},
    ] + [
        {"id": f"n{i}", "body": f"unrelated filler {i}"} for i in range(10)
    ], WRITE)
    e.flush()
    e.commit()
    r = e.read_side.search(
        "hyb",
        SearchParams.from_json(
            {"term": "how do I make a cake", "mode": "hybrid", "limit": 3}
        ),
        READ,
    )
    assert {h.id for h in r.hits[:2]} >= {"right"}, [
        (h.id, round(h.score, 3)) for h in r.hits
    ]


def test_checkpoint_path_mechanics(tmp_path, monkeypatch):
    """NOT skipped: a schema-exact (random-weight) checkpoint constructed
    locally must flow through the same fixture wiring the opt-in tests
    use — engine builds, the transformer (not the lexical tier) embeds,
    vector search executes. Guards the opt-in path against bitrot in the
    zero-egress CI where real weights never exist."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(0)
    ckpt = tmp_path / "bge-small"
    cfg_hf = BertConfig(
        vocab_size=200, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=96, hidden_act="gelu",
        layer_norm_eps=1e-12, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    BertModel(cfg_hf).eval().save_pretrained(ckpt, safe_serialization=True)
    vocab = ckpt / "vocab.txt"
    toks = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(190)
    ] + ["cake", "flour", "oven", "star", "goal"]
    vocab.write_text("\n".join(toks[:200]))
    BertTokenizerFast(vocab_file=str(vocab)).save_pretrained(ckpt)

    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.models.lexical import LexicalEmbedder

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.ai.backend = "jax"
    cfg.ai.embedding_model = "bge-small"
    cfg.writer_side.default_embedding_model = "bge-small"
    cfg.ai.embedding_checkpoint_path = str(ckpt)
    e = build_orama(cfg, start_background=False)
    try:
        assert not isinstance(
            e.read_side.ai._embedder("bge-small"), LexicalEmbedder
        )
        e.write_side.create_collection(MASTER, "m", READ, WRITE)
        e.flush()
        e.write_side.write(
            "m", [{"id": "a", "body": "cake flour oven"},
                  {"id": "b", "body": "star goal"}], WRITE,
        )
        e.flush()
        e.commit()
        r = e.read_side.search(
            "m",
            SearchParams.from_json(
                {"term": "cake", "mode": "vector", "limit": 2}
            ),
            READ,
        )
        assert len(r.hits) >= 1  # random weights: any ranking, real path
    finally:
        e.close()
