"""Decoder LLM machinery tests (KV-cache decode correctness + chat seam)."""

import numpy as np
import jax
import jax.numpy as jnp

from orama_core_tpu.models import llm


def _tiny_cfg():
    return llm.LlmConfig(
        vocab_size=64, hidden=32, layers=2, heads=4, kv_heads=2, mlp=64,
        max_len=64, dtype=jnp.float32,
    )


def test_forward_shapes():
    cfg = _tiny_cfg()
    params = llm.init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    pos = jnp.arange(4, dtype=jnp.int32)[None, :]
    logits, cache = llm.forward(params, cfg, ids, pos, None, jnp.int32(0))
    assert logits.shape == (1, 4, 64)


def test_cached_decode_matches_full_forward():
    """Token-by-token decode with the KV cache must produce the same greedy
    continuation as rerunning the full sequence each step."""
    cfg = _tiny_cfg()
    params = llm.init_params(jax.random.PRNGKey(1), cfg)
    prompt = [1, 5, 9, 2]

    # reference: no cache, grow the sequence, argmax each step
    seq = list(prompt)
    for _ in range(6):
        ids = jnp.asarray([seq], jnp.int32)
        pos = jnp.arange(len(seq), dtype=jnp.int32)[None, :]
        logits, _ = llm.forward(params, cfg, ids, pos, None, jnp.int32(0))
        seq.append(int(jnp.argmax(logits[0, -1])))
    expected = seq[len(prompt):]

    # cached path via generate() (prompt padded to 8)
    padded = np.zeros((1, 8), np.int32)
    padded[0, : len(prompt)] = prompt
    out = llm.generate(
        params, cfg, jnp.asarray(padded), jnp.asarray([len(prompt)], jnp.int32),
        max_new=6, eos_id=63,
    )
    got = np.asarray(out)[0].tolist()
    # compare until either hits eos
    for e, g in zip(expected, got):
        assert e == g, (expected, got)
        if e == 63:
            break


def test_generate_stops_at_eos():
    cfg = _tiny_cfg()
    params = llm.init_params(jax.random.PRNGKey(2), cfg)
    padded = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    out = llm.generate(
        params, cfg, padded, jnp.asarray([2], jnp.int32), max_new=8, eos_id=0
    )
    assert out.shape == (1, 8)


def test_byte_tokenizer_roundtrip():
    t = llm.ByteTokenizer()
    ids = t.encode("héllo!")
    assert ids[0] == t.BOS
    assert t.decode(ids[1:]) == "héllo!"


def test_jax_chat_llm_end_to_end():
    chat = llm.JaxChatLLM()
    out = chat.chat("google_query_translator", "what is a TPU?")
    assert isinstance(out, str)
    chunks = list(chat.chat_stream("answer", "hi", context="ctx"))
    assert "".join(chunks) == chat.chat("answer", "hi", context="ctx")


def test_generate_temperature_sampling():
    """temperature > 0 samples (reference serves temperature=0.1,
    service/models.py:100); temperature=0 stays greedy-deterministic."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from orama_core_tpu.models.llm import LlmConfig, generate, init_params

    cfg = LlmConfig(vocab_size=64, hidden=32, layers=1, heads=4, kv_heads=2,
                    mlp=64, max_len=64)
    params = init_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.arange(1, 9)[None, :], jnp.int32)
    plen = jnp.asarray([8], jnp.int32)
    g1 = generate(params, cfg, ids, plen, max_new=16, eos_id=63)
    g2 = generate(params, cfg, ids, plen, max_new=16, eos_id=63)
    assert (np.asarray(g1) == np.asarray(g2)).all()  # greedy deterministic
    # two different rng keys at high temperature should (overwhelmingly)
    # produce different continuations
    s1 = generate(params, cfg, ids, plen, max_new=16, eos_id=63,
                  temperature=1.5, rng=jax.random.PRNGKey(1))
    s2 = generate(params, cfg, ids, plen, max_new=16, eos_id=63,
                  temperature=1.5, rng=jax.random.PRNGKey(2))
    assert not (np.asarray(s1) == np.asarray(s2)).all()
    # same key => same sample (reproducible)
    s3 = generate(params, cfg, ids, plen, max_new=16, eos_id=63,
                  temperature=1.5, rng=jax.random.PRNGKey(1))
    assert (np.asarray(s1) == np.asarray(s3)).all()
