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


def test_batched_generate_matches_per_row():
    """Batched generate() with UNEQUAL prompt lengths must produce exactly
    what each row produces alone (greedy): the kv cache tracks per-row
    positions, so a short row's decode history is neither hidden by the
    batch-wide slot index nor polluted by pad kv."""
    cfg = _tiny_cfg()
    params = llm.init_params(jax.random.PRNGKey(4), cfg)
    prompts = [[1, 5, 9, 2, 7, 3], [4, 8]]  # lengths 6 and 2
    pt, max_new, eos = 8, 6, 63

    # reference: each row alone
    solo = []
    for p in prompts:
        padded = np.zeros((1, pt), np.int32)
        padded[0, : len(p)] = p
        out = llm.generate(
            params, cfg, jnp.asarray(padded),
            jnp.asarray([len(p)], jnp.int32), max_new=max_new, eos_id=eos,
        )
        solo.append(np.asarray(out)[0].tolist())

    # batched with unequal lengths
    padded = np.zeros((2, pt), np.int32)
    for r, p in enumerate(prompts):
        padded[r, : len(p)] = p
    out = llm.generate(
        params, cfg, jnp.asarray(padded),
        jnp.asarray([len(p) for p in prompts], jnp.int32),
        max_new=max_new, eos_id=eos,
    )
    got = np.asarray(out).tolist()
    for r in range(2):
        exp = solo[r]
        for e, g in zip(exp, got[r]):
            assert e == g, (r, exp, got[r])
            if e == eos:
                break


def test_generate_tail_is_eos_not_zeros():
    """Early EOS must leave EOS (decoded to nothing), never token id 0
    (NUL bytes / '!' in real vocabs) in the tail."""
    cfg = _tiny_cfg()
    params = llm.init_params(jax.random.PRNGKey(5), cfg)
    padded = jnp.asarray([[1, 2, 0, 0]], jnp.int32)
    out = llm.generate(
        params, cfg, padded, jnp.asarray([2], jnp.int32),
        max_new=8, eos_id=63,
    )
    row = np.asarray(out)[0].tolist()
    if 63 in row:
        first = row.index(63)
        assert all(t == 63 for t in row[first:]), row
