"""JAX decoder-only LLM: the TPU-native answer model.

Replaces the reference's torch/transformers sidecar LLM
(`ai_server/src/service/models.py`: Qwen2.5-3B-Instruct via
AutoModelForCausalLM + TextIteratorStreamer) with an in-process functional
JAX decoder: Qwen/LLaMA-family architecture (RMSNorm, rotary embeddings,
SwiGLU MLP, grouped-query attention), greedy decode under `lax.while_loop`
with a static-shape KV cache — one compiled program per (prompt bucket,
max_new) pair.

Weights: random by default (exercises the full decode machinery; tests &
perf paths) — real checkpoints load via models/hf_loader.py when present
on disk. Tokenization: byte-level fallback (reversible, no vocab files);
HF tokenizer when a checkpoint is loaded.

Tensor-parallel: `param_specs` shards attention heads and MLP hidden over
the ``model`` mesh axis (Megatron column/row split, like the encoder).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class LlmConfig:
    vocab_size: int = 512        # byte-level default: 256 bytes + specials
    hidden: int = 256
    layers: int = 4
    heads: int = 8
    kv_heads: int = 4
    mlp: int = 1024
    max_len: int = 1024
    rope_theta: float = 10_000.0
    rms_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads


TINY = LlmConfig()


def init_params(rng: jax.Array, cfg: LlmConfig) -> Dict[str, Any]:
    n_keys = 3 + cfg.layers * 7
    keys = iter(jax.random.split(rng, n_keys))
    s = 0.02

    def mat(key, i, o):
        return jax.random.normal(key, (i, o), jnp.float32) * s

    hd = cfg.head_dim
    params: Dict[str, Any] = {
        "tok_emb": mat(next(keys), cfg.vocab_size, cfg.hidden),
        "out_norm": jnp.ones((cfg.hidden,)),
        "lm_head": mat(next(keys), cfg.hidden, cfg.vocab_size),
        "layers": [],
    }
    for _ in range(cfg.layers):
        params["layers"].append(
            {
                "ln1": jnp.ones((cfg.hidden,)),
                "wq": mat(next(keys), cfg.hidden, cfg.heads * hd),
                "wk": mat(next(keys), cfg.hidden, cfg.kv_heads * hd),
                "wv": mat(next(keys), cfg.hidden, cfg.kv_heads * hd),
                "wo": mat(next(keys), cfg.heads * hd, cfg.hidden),
                "ln2": jnp.ones((cfg.hidden,)),
                "w_gate": mat(next(keys), cfg.hidden, cfg.mlp),
                "w_up": mat(next(keys), cfg.hidden, cfg.mlp),
                "w_down": mat(next(keys), cfg.mlp, cfg.hidden),
            }
        )
    return params


def param_specs(cfg: LlmConfig, with_bias: bool = False) -> Dict[str, Any]:
    col = P(None, "model")
    row = P("model", None)
    layer = {
        "ln1": P(), "wq": col, "wk": col, "wv": col, "wo": row,
        "ln2": P(), "w_gate": col, "w_up": col, "w_down": row,
    }
    if with_bias:
        layer = dict(layer, bq=P("model"), bk=P("model"), bv=P("model"))
    return {
        "tok_emb": P(),
        "out_norm": P(),
        "lm_head": P(),
        "layers": [layer for _ in range(cfg.layers)],
    }


def _rms(x, g, eps=1e-6):
    var = jnp.mean(x.astype(jnp.float32) ** 2, -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * g.astype(x.dtype)


def _rope(x, positions, theta):
    # x: [B, T, H, hd]
    hd = x.shape[-1]
    half = hd // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[:, :, None].astype(jnp.float32) * freqs[None, None, :]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


def forward(
    params: Dict[str, Any],
    cfg: LlmConfig,
    ids: jax.Array,        # int32[B, T]
    positions: jax.Array,  # int32[B, T]
    kv_cache: Optional[List[Tuple[jax.Array, jax.Array]]],
    cache_len: jax.Array,  # int32[] tokens already in cache
):
    """Returns (logits [B, T, V], new_kv_cache). With a cache, keys/values
    are written at [cache_len, cache_len+T) and attention spans the full
    cache with position masking."""
    dt = cfg.dtype
    b, t = ids.shape
    hd = cfg.head_dim
    x = params["tok_emb"][ids].astype(dt)
    new_kv: List[Tuple[jax.Array, jax.Array]] = []
    rep = cfg.heads // cfg.kv_heads

    # Cache layout: (per-layer kv list, positions int32[B, max_len]). The
    # positions array records each written slot's TOKEN position per row —
    # slot index alone is wrong the moment a batch has unequal prompt
    # lengths (a short row's kv lands at the batch-wide slot while its
    # query position is row-local; a slot-causal mask then hides the
    # token's own history and exposes pad kv). Unwritten slots hold
    # _POS_UNWRITTEN and can never pass the causal test.
    if kv_cache is not None:
        kv_list, pos_cache = kv_cache
        pos_cache = jax.lax.dynamic_update_slice(
            pos_cache, positions, (0, cache_len)
        )
    else:
        kv_list, pos_cache = None, None

    for li, layer in enumerate(params["layers"]):
        h = _rms(x, layer["ln1"], cfg.rms_eps)
        q = h @ layer["wq"].astype(dt)
        k = h @ layer["wk"].astype(dt)
        v = h @ layer["wv"].astype(dt)
        # Qwen2-family attention projections carry biases (q/k/v only)
        if "bq" in layer:
            q = q + layer["bq"].astype(dt)
            k = k + layer["bk"].astype(dt)
            v = v + layer["bv"].astype(dt)
        q = q.reshape(b, t, cfg.heads, hd)
        k = k.reshape(b, t, cfg.kv_heads, hd)
        v = v.reshape(b, t, cfg.kv_heads, hd)
        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        if kv_list is not None:
            ck, cv = kv_list[li]  # [B, max_len, KVH, hd]
            ck = jax.lax.dynamic_update_slice(ck, k, (0, cache_len, 0, 0))
            cv = jax.lax.dynamic_update_slice(cv, v, (0, cache_len, 0, 0))
            new_kv.append((ck, cv))
            k_all, v_all = ck, cv
            kv_positions = pos_cache  # [B, max_len] per-row position values
        else:
            k_all, v_all = k, v
            kv_positions = positions
            new_kv.append((k, v))

        k_rep = jnp.repeat(k_all, rep, axis=2)
        v_rep = jnp.repeat(v_all, rep, axis=2)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k_rep, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        # causal mask over per-row kv POSITION VALUES: unwritten slots (and
        # prompt pads, which callers tag _POS_UNWRITTEN) can never pass
        causal = kv_positions[:, None, :] <= positions[:, :, None]  # [B, T, K]
        mask = causal[:, None, :, :]
        logits = jnp.where(mask, logits, -1e9)
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v_rep).reshape(b, t, -1)
        x = x + ctx @ layer["wo"].astype(dt)

        h = _rms(x, layer["ln2"], cfg.rms_eps)
        gate = jax.nn.silu(h @ layer["w_gate"].astype(dt))
        up = h @ layer["w_up"].astype(dt)
        x = x + (gate * up) @ layer["w_down"].astype(dt)

    x = _rms(x, params["out_norm"], cfg.rms_eps)
    logits = (x.astype(jnp.float32)) @ params["lm_head"]
    if kv_list is not None:
        return logits, (new_kv, pos_cache)
    return logits, new_kv


_POS_UNWRITTEN = jnp.int32(2**30)


def make_cache(cfg: LlmConfig, batch: int):
    """(per-layer kv list, per-row slot-position array) — see forward()."""
    shape = (batch, cfg.max_len, cfg.kv_heads, cfg.head_dim)
    kv = [
        (jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
        for _ in range(cfg.layers)
    ]
    pos = jnp.full((batch, cfg.max_len), _POS_UNWRITTEN, jnp.int32)
    return kv, pos


@functools.partial(jax.jit, static_argnames=("cfg", "max_new", "temperature"))
def generate(
    params, cfg: LlmConfig, prompt_ids: jax.Array, prompt_len: jax.Array,
    max_new: int, eos_id: int, temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
):
    """Decode: prefill the padded prompt, then one-token steps under
    `lax.while_loop` with the static KV cache. Returns int32[B, max_new].

    temperature <= 0 is greedy argmax; otherwise softmax sampling at the
    given temperature (the reference serves temperature=0.1 sampling,
    service/models.py:100,117,146)."""
    b, pt = prompt_ids.shape
    if rng is None:
        rng = jax.random.PRNGKey(0)
    cache = make_cache(cfg, b)
    # right-pad slots get _POS_UNWRITTEN so no later query can attend a pad
    # token's kv (rows with shorter prompts than the padded width)
    arange_pt = jnp.arange(pt, dtype=jnp.int32)[None, :]
    positions = jnp.where(
        arange_pt < prompt_len[:, None], arange_pt, _POS_UNWRITTEN
    )
    logits, cache = forward(params, cfg, prompt_ids, positions, cache, jnp.int32(0))
    # logits at the last real prompt token
    last = logits[jnp.arange(b), prompt_len - 1]

    def pick(key, lg):
        if temperature and temperature > 0:
            return jax.random.categorical(key, lg / temperature, -1).astype(
                jnp.int32
            )
        return jnp.argmax(lg, -1).astype(jnp.int32)

    rng, k0 = jax.random.split(rng)
    first_tok = pick(k0, last)

    # init with EOS, not zeros: when decode finishes early the tail slots
    # must decode to nothing (zeros decoded as NUL bytes / '!' tokens)
    out = jnp.full((b, max_new), eos_id, jnp.int32)
    out = out.at[:, 0].set(first_tok)

    def cond(state):
        i, _, _, done, _ = state
        return (i < max_new - 1) & jnp.logical_not(jnp.all(done))

    def body(state):
        i, out, cache, done, rng = state
        tok = out[:, i][:, None]
        # per-row rotary position; the kv SLOT is the batch-uniform pt+i —
        # the pos-tracked cache (forward) reconciles the two
        pos = (prompt_len + i)[:, None].astype(jnp.int32)
        logits, cache = forward(params, cfg, tok, pos, cache, pt + i)
        rng, k = jax.random.split(rng)
        nxt = pick(k, logits[:, 0])
        nxt = jnp.where(done, eos_id, nxt)
        out = out.at[:, i + 1].set(nxt)
        done = done | (nxt == eos_id)
        return i + 1, out, cache, done, rng

    done0 = first_tok == eos_id
    _, out, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), out, cache, done0, rng)
    )
    return out


class ByteTokenizer:
    """Reversible byte-level tokenizer (ids 0..255 = bytes; 256 = BOS,
    257 = EOS). Lets the decode machinery run with random weights and no
    vocab files."""

    BOS, EOS = 256, 257
    vocab_size = 512

    def encode(self, text: str) -> List[int]:
        return [self.BOS] + list(text.encode("utf-8"))

    def decode(self, ids) -> str:
        data = bytes(int(i) for i in ids if int(i) < 256)
        return data.decode("utf-8", errors="replace")


class JaxChatLLM:
    """AIService chat backend over the JAX decoder, with the reference's
    per-role prompt framing (prompts/main.py)."""

    def __init__(
        self,
        model_name: str = "jax-tiny",
        hf_path: Optional[str] = None,
        temperature: float = 0.0,
    ):
        self.cfg = TINY
        self.temperature = float(temperature)
        self.tokenizer = ByteTokenizer()
        self.params = init_params(jax.random.PRNGKey(0), self.cfg)
        if hf_path:
            from .hf_loader import load_llm_checkpoint

            loaded = load_llm_checkpoint(hf_path)
            if loaded is not None:
                self.cfg, self.params, self.tokenizer = loaded

    def _generate_text(self, prompt: str, max_new: int = 64) -> str:
        from .prompts import render

        ids = self.tokenizer.encode(prompt)[-(self.cfg.max_len - max_new):]
        pt = max(8, 1 << (len(ids) - 1).bit_length())
        pt = min(pt, self.cfg.max_len - max_new)
        padded = np.zeros((1, pt), np.int32)
        padded[0, : len(ids)] = ids[:pt]
        out = generate(
            self.params, self.cfg,
            jnp.asarray(padded), jnp.asarray([min(len(ids), pt)], jnp.int32),
            max_new=max_new, eos_id=self.tokenizer.EOS,
            temperature=self.temperature,
            rng=jax.random.PRNGKey(np.random.randint(0, 2**31 - 1))
            if self.temperature > 0 else None,
        )
        return self.tokenizer.decode(np.asarray(out)[0])

    def chat(self, role: str, prompt: str, context: str = "") -> str:
        from .prompts import render

        return self._generate_text(render(role, prompt, context))

    def chat_stream(self, role: str, prompt: str, context: str = "") -> Iterator[str]:
        text = self.chat(role, prompt, context)
        for i in range(0, len(text), 16):
            yield text[i : i + 16]
