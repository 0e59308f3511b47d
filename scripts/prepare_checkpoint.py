#!/usr/bin/env python
"""Validate a local HuggingFace checkpoint for use with orama_core_tpu.

This environment is zero-egress, so checkpoints are prepared elsewhere and
dropped on local disk. On a machine WITH network access:

    pip install -U "huggingface_hub[cli]"
    hf download BAAI/bge-small-en-v1.5 --local-dir /ckpts/bge-small
    hf download Qwen/Qwen2.5-3B-Instruct --local-dir /ckpts/qwen2.5-3b

then point the engine at the directory:

    ai:
      backend: jax
      embedding_model: bge-small
      embedding_checkpoint_path: /ckpts    # dir of per-model subdirs
                                           # (or one checkpoint dir)
      # hf_model_path: /ckpts/qwen2.5-3b   # answer-model (LLM) checkpoint

Without a checkpoint, bge/e5 models serve the deterministic *lexical*
embedder (models/lexical.py) — a real ranking signal out of the box, not
random transformer weights.

This script verifies the directory loads through models/hf_loader.py
(exact tensor schema: reference embeddings/models.py:18-76 for the encoder
family, service/models.py:15-192 for Qwen-family LLMs), runs one smoke
forward on CPU, and prints the config stanza.

Usage:  python scripts/prepare_checkpoint.py /path/to/checkpoint
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(path: str) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    cfg_path = os.path.join(path, "config.json")
    if not os.path.exists(cfg_path):
        print(f"FAIL: no config.json in {path}")
        return 1
    with open(cfg_path) as f:
        hf = json.load(f)
    archs = hf.get("architectures", [])
    arch = archs[0] if archs else hf.get("model_type", "?")
    print(f"architecture: {arch}")

    is_decoder = any(
        a in str(arch).lower() for a in ("causallm", "qwen", "llama")
    )
    if is_decoder:
        from orama_core_tpu.models.hf_loader import load_llm_checkpoint
        from orama_core_tpu.models import llm as jllm

        loaded = load_llm_checkpoint(path)
        if loaded is None:
            print("FAIL: decoder checkpoint did not load (missing weights?)")
            return 1
        cfg, params, tok = loaded
        print(
            f"loaded decoder: hidden={cfg.hidden} layers={cfg.layers} "
            f"heads={cfg.heads}/{cfg.kv_heads} vocab={cfg.vocab_size} "
            f"biases={'yes' if 'bq' in params['layers'][0] else 'no'} "
            f"tokenizer={type(tok).__name__}"
        )
        ids = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
        pos = jnp.asarray(np.arange(8)[None, :], jnp.int32)
        logits, _ = jllm.forward(params, cfg, ids, pos, None, jnp.int32(0))
        print(f"smoke forward ok: logits {logits.shape}")
        print("\nconfig.yaml stanza:\n  ai:\n    backend: jax\n"
              f"    llm_model: {os.path.basename(path)}\n"
              f"    hf_model_path: {os.path.abspath(path)}")
    else:
        from orama_core_tpu.models.hf_loader import load_encoder_checkpoint
        from orama_core_tpu.models import encoder as enc

        loaded = load_encoder_checkpoint(path)
        if loaded is None:
            print("FAIL: encoder checkpoint did not load (missing weights?)")
            return 1
        cfg, params = loaded
        print(
            f"loaded encoder: hidden={cfg.hidden} layers={cfg.layers} "
            f"heads={cfg.heads} vocab={cfg.vocab_size} out_dim={cfg.out_dim}"
        )
        ids = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
        mask = jnp.ones((1, 8), jnp.float32)
        out = enc.encode(params, cfg, ids, mask)
        n = float(jnp.linalg.norm(out[0]))
        print(f"smoke forward ok: embedding {out.shape}, L2 norm {n:.4f}")
        print("\nconfig.yaml stanza:\n  ai:\n    backend: jax\n"
              f"    embedding_model: {os.path.basename(path)}\n"
              f"    embedding_checkpoint_path: {os.path.abspath(path)}")
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
