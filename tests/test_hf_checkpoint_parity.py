"""Real-weights path proof (VERDICT r1 item 4): construct schema-exact HF
checkpoints locally (the exact tensor name/shape layout BGE-small and
Qwen2.5 ship with — reference embeddings/models.py:18-76,
service/models.py:15-192), load them through models/hf_loader.py, and
verify numerical parity of the JAX forward passes against the HF
transformers implementations on the same weights."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _bge_small_schema_config(tmp):
    """BertConfig with BGE-small-en-v1.5's exact schema (scaled-down dims).

    BGE-small: BertModel — vocab 30522, hidden 384, layers 12, heads 12,
    intermediate 1536, max_pos 512, gelu, LN eps 1e-12. The test uses small
    dims with the SAME field names and tensor layout.
    """
    from transformers import BertConfig

    return BertConfig(
        vocab_size=1031,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=96,
        hidden_act="gelu",
        layer_norm_eps=1e-12,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )


def test_encoder_checkpoint_parity(tmp_path):
    """encode() on loaded weights == transformers BertModel mean-pool
    (the reference's embed_alternative pooling, embeddings.py:35-47)."""
    import dataclasses

    import jax.numpy as jnp
    from transformers import BertModel

    from orama_core_tpu.models import encoder as enc
    from orama_core_tpu.models.hf_loader import load_encoder_checkpoint

    torch.manual_seed(0)
    cfg_hf = _bge_small_schema_config(tmp_path)
    model = BertModel(cfg_hf).eval()
    ckpt = tmp_path / "bge-small-schema"
    model.save_pretrained(ckpt, safe_serialization=True)
    names = set(model.state_dict().keys())
    # schema check: the exact BGE/BERT tensor names the loader consumes
    assert "embeddings.word_embeddings.weight" in names
    assert "encoder.layer.0.attention.self.query.weight" in names
    assert "encoder.layer.0.output.LayerNorm.bias" in names

    loaded = load_encoder_checkpoint(str(ckpt))
    assert loaded is not None, "schema-exact checkpoint must load"
    cfg, params = loaded
    assert cfg.hidden == 64 and cfg.layers == 3 and cfg.heads == 4
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)  # fp32 for parity

    rng = np.random.default_rng(1)
    ids = rng.integers(1, 1031, (3, 17)).astype(np.int64)
    mask = np.ones((3, 17), np.float32)
    mask[1, 12:] = 0.0
    mask[2, 5:] = 0.0

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).last_hidden_state.numpy()
    denom = np.maximum(mask.sum(-1, keepdims=True), 1.0)
    gold = (out * mask[:, :, None]).sum(1) / denom
    gold = gold / np.maximum(np.linalg.norm(gold, axis=-1, keepdims=True), 1e-12)

    got = np.asarray(
        enc.encode(params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(mask))
    )
    assert np.allclose(got, gold, atol=2e-4), np.abs(got - gold).max()


def test_llm_checkpoint_parity(tmp_path):
    """forward() logits on loaded weights == transformers Qwen2ForCausalLM
    (q/k/v biases, GQA, rotary, RMSNorm eps from config)."""
    import dataclasses

    import jax.numpy as jnp
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from orama_core_tpu.models import llm as jllm
    from orama_core_tpu.models.hf_loader import load_llm_checkpoint

    torch.manual_seed(0)
    cfg_hf = Qwen2Config(
        vocab_size=523,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        max_position_embeddings=256,
        rope_theta=10_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attention_dropout=0.0,
    )
    model = Qwen2ForCausalLM(cfg_hf).eval()
    ckpt = tmp_path / "qwen-schema"
    model.save_pretrained(ckpt, safe_serialization=True)
    names = set(model.state_dict().keys())
    assert "model.layers.0.self_attn.q_proj.bias" in names  # Qwen2 qkv bias
    assert "model.layers.0.mlp.gate_proj.weight" in names

    loaded = load_llm_checkpoint(str(ckpt))
    assert loaded is not None
    cfg, params, _tok = loaded
    assert cfg.kv_heads == 2 and cfg.heads == 4
    assert "bq" in params["layers"][0], "Qwen2 attention biases must load"
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)

    rng = np.random.default_rng(2)
    ids = rng.integers(1, 523, (2, 11)).astype(np.int64)
    with torch.no_grad():
        gold = model(input_ids=torch.tensor(ids)).logits.numpy()

    positions = np.broadcast_to(np.arange(11, dtype=np.int32), (2, 11))
    got, _ = jllm.forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(positions),
        None, jnp.int32(0),
    )
    got = np.asarray(got)
    assert got.shape == gold.shape
    # compare normalized logits (softmax-invariant shift tolerance)
    assert np.allclose(got, gold, atol=5e-3), np.abs(got - gold).max()
    # argmax (greedy decode) must agree everywhere
    assert np.array_equal(got.argmax(-1), gold.argmax(-1))


def test_llm_checkpoint_parity_tied_embeddings(tmp_path):
    """Qwen2.5-class checkpoints tie lm_head to embed_tokens — the loader
    must fall back to the transposed embedding matrix."""
    import dataclasses

    import jax.numpy as jnp
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from orama_core_tpu.models import llm as jllm
    from orama_core_tpu.models.hf_loader import load_llm_checkpoint

    torch.manual_seed(3)
    cfg_hf = Qwen2Config(
        vocab_size=300, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, num_key_value_heads=1, intermediate_size=64,
        max_position_embeddings=128, tie_word_embeddings=True,
    )
    model = Qwen2ForCausalLM(cfg_hf).eval()
    ckpt = tmp_path / "qwen-tied"
    model.save_pretrained(ckpt, safe_serialization=True)
    loaded = load_llm_checkpoint(str(ckpt))
    assert loaded is not None
    cfg, params, _ = loaded
    cfg = dataclasses.replace(cfg, dtype=jnp.float32)
    ids = np.arange(1, 8)[None, :].astype(np.int64)
    with torch.no_grad():
        gold = model(input_ids=torch.tensor(ids)).logits.numpy()
    pos = np.arange(7, dtype=np.int32)[None, :]
    got, _ = jllm.forward(
        params, cfg, jnp.asarray(ids, jnp.int32), jnp.asarray(pos),
        None, jnp.int32(0),
    )
    assert np.allclose(np.asarray(got), gold, atol=5e-3)
