"""Out-of-box embedding tier (VERDICT r2 missing #3): the lexical
random-indexing embedder and the AIService fallback ladder — a fresh
zero-checkpoint deployment must embed with a *meaningful* (lexical) signal,
never random transformer weights; a dropped checkpoint must actually be
loaded (config stanza in scripts/prepare_checkpoint.py)."""

import numpy as np
import pytest

from orama_core_tpu.config import AiConfig
from orama_core_tpu.models.ai_service import AIService
from orama_core_tpu.models.lexical import LexicalEmbedder


def _cos(a, b):
    return float(np.dot(a, b))


class TestLexicalEmbedder:
    def test_lexical_overlap_ranks_above_unrelated(self):
        e = LexicalEmbedder(384)
        q, rel, un = e.embed(
            [
                "how to tune tpu matmul performance",
                "guide to tuning matmul kernels for tpu performance",
                "recipe for sourdough bread with rye flour",
            ]
        )
        assert _cos(q, rel) > _cos(q, un) + 0.2

    def test_char_ngrams_bridge_inflections(self):
        # no shared whole word token ("tokenizer" vs "tokenizers",
        # "multilingual" vs "multilingually") — n-grams must carry signal
        e = LexicalEmbedder(384)
        q, rel, un = e.embed(
            ["tokenizers multilingually", "tokenizer multilingual", "horse racing odds"]
        )
        assert _cos(q, rel) > _cos(q, un) + 0.2

    def test_deterministic_across_instances(self):
        a = LexicalEmbedder(256).embed(["déjà vu — ein Beispieltext", ""])
        b = LexicalEmbedder(256).embed(["déjà vu — ein Beispieltext", ""])
        np.testing.assert_array_equal(a, b)
        assert np.allclose(np.linalg.norm(a[0]), 1.0, atol=1e-5)
        assert np.all(a[1] == 0)  # empty text -> zero vector

    def test_unicode_word_extraction(self):
        # unicode \w tokenization: CJK and Cyrillic both produce features
        e = LexicalEmbedder(128)
        out = e.embed(["машинное обучение", "機械学習"])
        assert np.linalg.norm(out, axis=1).min() > 0.99


class TestAIServiceFallbackLadder:
    def test_jax_backend_without_checkpoint_uses_lexical(self):
        svc = AIService(AiConfig(backend="jax", embedding_model="bge-small"))
        assert isinstance(svc._embedder("bge-small"), LexicalEmbedder)
        out = svc.embed_query("bge-small", ["red shoes"])
        assert out.shape == (1, 384)

    def test_lexical_registry_models_work_on_any_backend(self):
        svc = AIService(AiConfig(backend="fake"))
        assert isinstance(svc._embedder("lexical-small"), LexicalEmbedder)
        assert svc.embed_passage("lexical-base", ["x"]).shape == (1, 768)

    def test_jax_prefixed_models_keep_random_init_encoder(self):
        from orama_core_tpu.models.encoder import JaxEncoderEmbedder

        svc = AIService(AiConfig(backend="jax"))
        assert isinstance(svc._embedder("jax-minilm"), JaxEncoderEmbedder)


def _bert_checkpoint(tmp_path, name, vocab_size=30, with_tokenizer=True):
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(0)
    cfg_hf = BertConfig(
        vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=64, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    ckpt = tmp_path / name
    BertModel(cfg_hf).eval().save_pretrained(ckpt, safe_serialization=True)
    if with_tokenizer:
        vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world"]
        vocab += [f"tok{i}" for i in range(vocab_size - len(vocab))]
        vf = tmp_path / f"{name}-vocab.txt"
        vf.write_text("\n".join(vocab))
        BertTokenizerFast(vocab_file=str(vf)).save_pretrained(ckpt)
    return ckpt


def test_checkpoint_path_loads_into_ai_service(tmp_path):
    """embedding_checkpoint_path with a per-model subdir: AIService must run
    the real transformer forward on the loaded weights (bit-equal to calling
    encode() on the hf_loader output directly)."""
    import dataclasses

    import jax.numpy as jnp

    from orama_core_tpu.models import encoder as enc
    from orama_core_tpu.models.encoder import JaxEncoderEmbedder
    from orama_core_tpu.models.hf_loader import load_encoder_checkpoint

    ckpt = _bert_checkpoint(tmp_path, "bge-small")
    svc = AIService(
        AiConfig(
            backend="jax",
            embedding_model="bge-small",
            embedding_checkpoint_path=str(tmp_path),
        )
    )
    e = svc._embedder("bge-small")
    assert isinstance(e, JaxEncoderEmbedder), "checkpoint must be wired in"
    got = svc.embed_query("bge-small", ["hello world"])
    assert got.shape == (1, 32)  # checkpoint dim wins over registry dim

    cfg, params = load_encoder_checkpoint(str(ckpt))
    ids, mask = e.tokenizer([
        "Represent this sentence for searching relevant passages: hello world"
    ])
    gold = np.asarray(
        enc.encode(params, dataclasses.replace(cfg, dtype=cfg.dtype),
                   jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, gold, atol=1e-5)


def test_checkpoint_without_tokenizer_falls_back_to_lexical(tmp_path):
    """Pretrained weights paired with the hash tokenizer would embed
    confident noise — AIService must refuse and use the lexical tier."""
    _bert_checkpoint(tmp_path, "bge-small", with_tokenizer=False)
    svc = AIService(
        AiConfig(
            backend="jax",
            embedding_model="bge-small",
            embedding_checkpoint_path=str(tmp_path),
        )
    )
    assert isinstance(svc._embedder("bge-small"), LexicalEmbedder)


def test_foreign_checkpoint_schema_degrades_to_lexical(tmp_path):
    """A checkpoint whose tensors don't match the BERT-family schema must
    return None from the loader (module contract) and degrade to lexical —
    not raise KeyError on every embed call."""
    import json as _json

    ckpt = tmp_path / "bge-small"
    ckpt.mkdir()
    (ckpt / "config.json").write_text(_json.dumps({
        "vocab_size": 10, "hidden_size": 8, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 16,
        "max_position_embeddings": 16,
    }))
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    # roberta-style tensor names: schema mismatch
    save_file(
        {"roberta.embeddings.word_embeddings.weight": torch.zeros(10, 8)},
        str(ckpt / "model.safetensors"),
    )
    from orama_core_tpu.models.hf_loader import load_encoder_checkpoint

    assert load_encoder_checkpoint(str(ckpt)) is None
    svc = AIService(
        AiConfig(
            backend="jax",
            embedding_model="bge-small",
            embedding_checkpoint_path=str(tmp_path),
        )
    )
    assert isinstance(svc._embedder("bge-small"), LexicalEmbedder)
    assert svc.embed_query("bge-small", ["x"]).shape == (1, 384)


def test_checkpoint_tokenizer_used_when_present(tmp_path):
    """A checkpoint dir carrying tokenizer files must tokenize with the HF
    vocab (ids bounded by it), not the hash tokenizer."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import BertConfig, BertModel, BertTokenizerFast

    torch.manual_seed(1)
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "hello", "world", "##s"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab))
    ckpt = tmp_path / "ck"
    cfg_hf = BertConfig(
        vocab_size=len(vocab), hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32,
    )
    BertModel(cfg_hf).eval().save_pretrained(ckpt, safe_serialization=True)
    BertTokenizerFast(vocab_file=str(vf)).save_pretrained(ckpt)

    from orama_core_tpu.models.hf_loader import load_encoder_tokenizer

    tok = load_encoder_tokenizer(str(ckpt), max_len=32)
    assert tok is not None
    ids, mask = tok(["hello worlds"])
    assert ids.max() < len(vocab)
    # [CLS] hello world ##s [SEP]
    assert int(mask.sum()) == 5
