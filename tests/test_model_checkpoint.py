import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orama_core_tpu.models import encoder as enc
from orama_core_tpu.models import checkpoint as ckpt


def test_encoder_params_roundtrip(tmp_path):
    cfg = enc.EncoderConfig(
        vocab_size=64, hidden=32, layers=1, heads=4, mlp=64, max_len=16,
        out_dim=32, dtype=jnp.float32,
    )
    params = enc.init_params(jax.random.PRNGKey(0), cfg)
    path = tmp_path / "ckpt"
    ckpt.save_params(str(path), params)
    restored = ckpt.load_params(str(path), like=enc.init_params(jax.random.PRNGKey(1), cfg))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored params produce identical embeddings
    ids = jnp.asarray([[1, 2, 3, 0]], jnp.int32)
    mask = jnp.asarray([[1.0, 1.0, 1.0, 0.0]], jnp.float32)
    out1 = enc.encode(params, cfg, ids, mask)
    out2 = enc.encode(restored, cfg, ids, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-6)
