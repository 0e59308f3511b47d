"""Load HuggingFace checkpoints from local disk into JAX param pytrees.

The reference downloads ONNX/torch models at runtime (fastembed,
AutoModelForCausalLM); this environment is zero-egress, so loading is gated
on a *local* checkpoint directory. Weight conversion is torch(cpu) ->
numpy -> jnp; mappings cover the BERT encoder family (BGE/E5/MiniLM) and
the Qwen2/LLaMA decoder family.

Everything degrades gracefully: absent/partial checkpoints return None and
callers keep their random-init params (the engine stays functional; only
retrieval quality changes).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np


def _load_state_dict(path: str) -> Optional[Dict[str, np.ndarray]]:
    try:
        import torch

        candidates = [
            os.path.join(path, "pytorch_model.bin"),
            os.path.join(path, "model.safetensors"),
        ]
        for c in candidates:
            if os.path.exists(c):
                if c.endswith(".safetensors"):
                    from safetensors.torch import load_file

                    sd = load_file(c)
                else:
                    sd = torch.load(c, map_location="cpu", weights_only=True)
                return {k: v.to(torch.float32).numpy() for k, v in sd.items()}
    except Exception:
        return None
    return None


def load_encoder_checkpoint(path: str):
    """BERT-family -> (EncoderConfig, params) or None (per the module
    contract, a partial/foreign checkpoint — e.g. RoBERTa tensor names or a
    truncated config — returns None rather than raising mid-serve)."""
    try:
        return _load_encoder_checkpoint(path)
    except (KeyError, ValueError, TypeError) as e:
        import logging

        logging.getLogger("oramax.ai").warning(
            "encoder checkpoint at %s does not match the BERT-family "
            "schema (%s) — ignoring it", path, e,
        )
        return None


def _load_encoder_checkpoint(path: str):
    import jax.numpy as jnp

    from .encoder import EncoderConfig

    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        hf = json.load(f)
    sd = _load_state_dict(path)
    if sd is None:
        return None
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""
    cfg = EncoderConfig(
        vocab_size=hf["vocab_size"],
        hidden=hf["hidden_size"],
        layers=hf["num_hidden_layers"],
        heads=hf["num_attention_heads"],
        mlp=hf["intermediate_size"],
        max_len=hf["max_position_embeddings"],
        out_dim=hf["hidden_size"],
    )

    def g(name):
        return jnp.asarray(sd[prefix + name])

    params: Dict[str, Any] = {
        "tok_emb": g("embeddings.word_embeddings.weight"),
        "pos_emb": g("embeddings.position_embeddings.weight"),
        "emb_ln": {
            "g": g("embeddings.LayerNorm.weight"),
            "b": g("embeddings.LayerNorm.bias"),
        },
        "layers": [],
    }
    # token_type embeddings fold into tok_emb (single segment)
    tt = prefix + "embeddings.token_type_embeddings.weight"
    if tt in sd:
        params["pos_emb"] = params["pos_emb"] + jnp.asarray(sd[tt][0])[None, :]
    for i in range(cfg.layers):
        lp = f"encoder.layer.{i}."

        def d(sub):
            return {
                "w": g(lp + sub + ".weight").T,
                "b": g(lp + sub + ".bias"),
            }

        params["layers"].append(
            {
                "q": d("attention.self.query"),
                "k": d("attention.self.key"),
                "v": d("attention.self.value"),
                "o": d("attention.output.dense"),
                "ln1": {
                    "g": g(lp + "attention.output.LayerNorm.weight"),
                    "b": g(lp + "attention.output.LayerNorm.bias"),
                },
                "up": d("intermediate.dense"),
                "down": d("output.dense"),
                "ln2": {
                    "g": g(lp + "output.LayerNorm.weight"),
                    "b": g(lp + "output.LayerNorm.bias"),
                },
            }
        )
    return cfg, params


def load_encoder_tokenizer(path: str, max_len: int):
    """HF tokenizer (local files only) wrapped to the engine's
    ``texts -> (ids, mask)`` contract with pow2 length buckets (bounds
    recompiles the same way HashTokenizer does). Returns None when the
    checkpoint directory carries no tokenizer files."""
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path, local_files_only=True)
    except Exception:
        return None

    class _HFEncoderTok:
        def __call__(self, texts):
            enc = tok(
                list(texts),
                truncation=True,
                max_length=max_len,
                add_special_tokens=True,
            )["input_ids"]
            l = max(8, max((len(r) for r in enc), default=1))
            l = min(1 << (l - 1).bit_length(), max_len)
            ids = np.zeros((len(enc), l), np.int32)
            mask = np.zeros((len(enc), l), np.float32)
            for i, r in enumerate(enc):
                n = min(len(r), l)
                ids[i, :n] = r[:n]
                mask[i, :n] = 1.0
            return ids, mask

    return _HFEncoderTok()


def load_llm_checkpoint(path: str):
    """Qwen2/LLaMA-family -> (LlmConfig, params, tokenizer) or None (same
    graceful-degradation contract as the encoder loader)."""
    try:
        return _load_llm_checkpoint(path)
    except (KeyError, ValueError, TypeError) as e:
        import logging

        logging.getLogger("oramax.ai").warning(
            "LLM checkpoint at %s does not match the Qwen2/LLaMA-family "
            "schema (%s) — ignoring it", path, e,
        )
        return None


def _load_llm_checkpoint(path: str):
    import jax.numpy as jnp

    from .llm import LlmConfig

    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        return None
    with open(cfg_path) as f:
        hf = json.load(f)
    sd = _load_state_dict(path)
    if sd is None:
        return None
    cfg = LlmConfig(
        vocab_size=hf["vocab_size"],
        hidden=hf["hidden_size"],
        layers=hf["num_hidden_layers"],
        heads=hf["num_attention_heads"],
        kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
        mlp=hf["intermediate_size"],
        max_len=min(hf.get("max_position_embeddings", 2048), 4096),
        rope_theta=hf.get("rope_theta", 10_000.0),
        rms_eps=hf.get("rms_norm_eps", 1e-6),
    )

    def g(name):
        return jnp.asarray(sd[name])

    params: Dict[str, Any] = {
        "tok_emb": g("model.embed_tokens.weight"),
        "out_norm": g("model.norm.weight"),
        "lm_head": (
            g("lm_head.weight").T
            if "lm_head.weight" in sd
            else g("model.embed_tokens.weight").T
        ),
        "layers": [],
    }
    for i in range(cfg.layers):
        lp = f"model.layers.{i}."
        layer = {
            "ln1": g(lp + "input_layernorm.weight"),
            "wq": g(lp + "self_attn.q_proj.weight").T,
            "wk": g(lp + "self_attn.k_proj.weight").T,
            "wv": g(lp + "self_attn.v_proj.weight").T,
            "wo": g(lp + "self_attn.o_proj.weight").T,
            "ln2": g(lp + "post_attention_layernorm.weight"),
            "w_gate": g(lp + "mlp.gate_proj.weight").T,
            "w_up": g(lp + "mlp.up_proj.weight").T,
            "w_down": g(lp + "mlp.down_proj.weight").T,
        }
        # Qwen2 carries q/k/v biases (service/models.py's Qwen2.5 default)
        if lp + "self_attn.q_proj.bias" in sd:
            layer["bq"] = g(lp + "self_attn.q_proj.bias")
            layer["bk"] = g(lp + "self_attn.k_proj.bias")
            layer["bv"] = g(lp + "self_attn.v_proj.bias")
        params["layers"].append(layer)
    tokenizer = None
    try:
        from transformers import AutoTokenizer

        tok = AutoTokenizer.from_pretrained(path, local_files_only=True)

        class _HFTok:
            BOS = tok.bos_token_id or 0
            EOS = tok.eos_token_id or 0
            vocab_size = cfg.vocab_size

            def encode(self, text):
                return tok.encode(text)

            def decode(self, ids):
                return tok.decode([int(i) for i in ids], skip_special_tokens=True)

        tokenizer = _HFTok()
    except Exception:
        from .llm import ByteTokenizer

        tokenizer = ByteTokenizer()
    return cfg, params, tokenizer
