"""JAX transformer encoder — the in-process embedding model.

Replaces the reference's ONNX-Runtime/fastembed sidecar models
(`ai_server/src/embeddings/embeddings.py`: BGE / multilingual-E5 class
encoders with mean pooling) with a TPU-native forward pass: a BERT-family
bidirectional encoder in pure functional JAX (params as a pytree), bf16
matmuls on the MXU, mean-pool + L2 normalize — jitted once and shared with
the search kernels on the same chips.

Tensor-parallel ready: `param_specs` places attention heads and MLP hidden
on the ``model`` mesh axis; activations stay replicated per shard_map rules
(contributions are psum-reduced by XLA through the sharded matmuls).

Weights: random (hash-tokenizer) by default — retrieval-quality weights load
from HF safetensors via models/hf_loader.py when a local checkpoint exists.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from .registry import model_info


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    vocab_size: int = 30522
    hidden: int = 384
    layers: int = 6
    heads: int = 12
    mlp: int = 1536
    max_len: int = 512
    out_dim: int = 384  # embedding dim (== hidden unless projected)
    dtype: Any = jnp.bfloat16


MINILM = EncoderConfig()  # MiniLM-L6-class: the "jax-minilm" registry entry


def init_params(rng: jax.Array, cfg: EncoderConfig) -> Dict[str, Any]:
    k = iter(jax.random.split(rng, 6 + cfg.layers * 10))
    s = 0.02

    def dense(key, i, o):
        return {
            "w": jax.random.normal(key, (i, o), jnp.float32) * s,
            "b": jnp.zeros((o,), jnp.float32),
        }

    params: Dict[str, Any] = {
        "tok_emb": jax.random.normal(next(k), (cfg.vocab_size, cfg.hidden), jnp.float32) * s,
        "pos_emb": jax.random.normal(next(k), (cfg.max_len, cfg.hidden), jnp.float32) * s,
        "emb_ln": {"g": jnp.ones((cfg.hidden,)), "b": jnp.zeros((cfg.hidden,))},
        "layers": [],
    }
    for _ in range(cfg.layers):
        params["layers"].append(
            {
                "q": dense(next(k), cfg.hidden, cfg.hidden),
                "k": dense(next(k), cfg.hidden, cfg.hidden),
                "v": dense(next(k), cfg.hidden, cfg.hidden),
                "o": dense(next(k), cfg.hidden, cfg.hidden),
                "ln1": {"g": jnp.ones((cfg.hidden,)), "b": jnp.zeros((cfg.hidden,))},
                "up": dense(next(k), cfg.hidden, cfg.mlp),
                "down": dense(next(k), cfg.mlp, cfg.hidden),
                "ln2": {"g": jnp.ones((cfg.hidden,)), "b": jnp.zeros((cfg.hidden,))},
            }
        )
    if cfg.out_dim != cfg.hidden:
        params["proj"] = dense(next(k), cfg.hidden, cfg.out_dim)
    return params


def param_specs(cfg: EncoderConfig) -> Dict[str, Any]:
    """PartitionSpecs for tensor parallelism over the ``model`` axis:
    column-split QKV/up, row-split O/down (Megatron layout) — XLA inserts the
    psum on the row-parallel matmuls."""
    col = {"w": P(None, "model"), "b": P("model")}
    row = {"w": P("model", None), "b": P()}
    ln = {"g": P(), "b": P()}
    layer = {
        "q": col, "k": col, "v": col, "o": row,
        "ln1": ln, "up": col, "down": row, "ln2": ln,
    }
    specs: Dict[str, Any] = {
        "tok_emb": P(),
        "pos_emb": P(),
        "emb_ln": ln,
        "layers": [layer for _ in range(cfg.layers)],
    }
    if cfg.out_dim != cfg.hidden:
        specs["proj"] = {"w": P(), "b": P()}
    return specs


def _ln(x, p, eps=1e-12):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _dense(x, p, dtype):
    return jnp.dot(x, p["w"].astype(dtype), preferred_element_type=jnp.float32) + p["b"]


def encode(
    params: Dict[str, Any],
    cfg: EncoderConfig,
    ids: jax.Array,    # int32[B, L]
    mask: jax.Array,   # float32[B, L] 1 = real token
) -> jax.Array:
    """[B, out_dim] L2-normalized mean-pooled embeddings."""
    dt = cfg.dtype
    b, l = ids.shape
    x = params["tok_emb"][ids] + params["pos_emb"][:l][None, :, :]
    x = _ln(x, params["emb_ln"]).astype(dt)
    attn_bias = (1.0 - mask[:, None, None, :]) * -1e9  # [B,1,1,L]
    hd = cfg.hidden // cfg.heads
    for layer in params["layers"]:
        q = _dense(x, layer["q"], dt).reshape(b, l, cfg.heads, hd)
        k = _dense(x, layer["k"], dt).reshape(b, l, cfg.heads, hd)
        v = _dense(x, layer["v"], dt).reshape(b, l, cfg.heads, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        w = jax.nn.softmax(logits + attn_bias, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w.astype(dt), v).reshape(b, l, cfg.hidden)
        x = _ln(x.astype(jnp.float32) + _dense(ctx.astype(dt), layer["o"], dt), layer["ln1"]).astype(dt)
        # BERT-family uses exact (erf) gelu — approximate=True diverges from
        # real BGE/E5 checkpoints
        h = jax.nn.gelu(_dense(x, layer["up"], dt), approximate=False).astype(dt)
        x = _ln(x.astype(jnp.float32) + _dense(h, layer["down"], dt), layer["ln2"]).astype(dt)
    x = x.astype(jnp.float32)
    if "proj" in params:
        x = _dense(x, params["proj"], jnp.float32)
    denom = jnp.maximum(jnp.sum(mask, -1, keepdims=True), 1.0)
    pooled = jnp.sum(x * mask[:, :, None], axis=1) / denom
    return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


class HashTokenizer:
    """Deterministic wordpiece-free tokenizer: word -> blake2b bucket.

    Used with random weights (compile/perf paths, tests). With HF weights the
    matching HF tokenizer is used instead (models/hf_loader.py)."""

    def __init__(self, vocab_size: int, max_len: int) -> None:
        self.vocab_size = vocab_size
        self.max_len = max_len
        self._cache: Dict[str, int] = {}

    def _bucket(self, w: str) -> int:
        b = self._cache.get(w)
        if b is None:
            h = int.from_bytes(hashlib.blake2b(w.encode(), digest_size=4).digest(), "big")
            b = 1 + (h % (self.vocab_size - 2))  # 0 = pad
            self._cache[w] = b
        return b

    def __call__(self, texts: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
        rows = [[self._bucket(w) for w in t.lower().split()[: self.max_len]] for t in texts]
        l = max(8, max((len(r) for r in rows), default=1))
        l = min(1 << (l - 1).bit_length(), self.max_len)  # pow2 length buckets
        ids = np.zeros((len(texts), l), np.int32)
        mask = np.zeros((len(texts), l), np.float32)
        for i, r in enumerate(rows):
            n = min(len(r), l)
            ids[i, :n] = r[:n]
            mask[i, :n] = 1.0
        return ids, mask


class JaxEncoderEmbedder:
    """AIService backend: tokenizer + jitted encoder forward."""

    def __init__(
        self,
        model_name: str,
        cfg: Optional[EncoderConfig] = None,
        params=None,
        tokenizer=None,
    ) -> None:
        info = model_info(model_name)
        self.cfg = cfg or dataclasses.replace(
            MINILM, hidden=max(info.dim, 128), out_dim=info.dim,
            mlp=4 * max(info.dim, 128),
            heads=max(info.dim, 128) // 32,
        )
        self.tokenizer = tokenizer or HashTokenizer(self.cfg.vocab_size, self.cfg.max_len)
        self.params = params if params is not None else init_params(
            jax.random.PRNGKey(0), self.cfg
        )
        self._fwd = jax.jit(functools.partial(encode, cfg=self.cfg))

    def embed(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.cfg.out_dim), np.float32)
        ids, mask = self.tokenizer(texts)
        out = self._fwd(self.params, ids=jnp.asarray(ids), mask=jnp.asarray(mask))
        return np.asarray(out, dtype=np.float32)
