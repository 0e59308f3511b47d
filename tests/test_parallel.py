"""Mesh-sharded search tests on the virtual 8-device CPU mesh — the
multi-node test strategy the reference lacks (SURVEY.md §4: "mesh-size-
parameterized tests that run the same sharded code on 1 host")."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from orama_core_tpu.parallel.mesh import make_mesh
from orama_core_tpu.parallel.sharded_search import (
    sharded_hybrid_step,
    sharded_vector_topk,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh((8,), ("data",))


def test_sharded_vector_topk_matches_dense(mesh8):
    S, PL, D, K = 8, 16, 8, 5
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((S * PL, D)).astype(np.float32)
    vec_docs = np.tile(np.arange(PL, dtype=np.int32), S)
    valid = np.ones(S * PL, np.float32)
    q = rng.standard_normal(D).astype(np.float32)

    knn = sharded_vector_topk(mesh8, K, shard_cap=PL)
    v, gids = knn(jnp.asarray(vecs), jnp.asarray(vec_docs), jnp.asarray(valid), jnp.asarray(q))

    # dense reference: global ids are row + shard*PL since vec_docs tiles 0..PL
    sims = vecs @ q
    order = np.argsort(-sims)[:K]
    np.testing.assert_allclose(np.sort(np.asarray(v)), np.sort(sims[order]), rtol=1e-5)
    assert set(np.asarray(gids).tolist()) == set(order.tolist())


def test_sharded_int8_topk_matches_f32(mesh8):
    from orama_core_tpu.ops.quant import quantize_int8
    from orama_core_tpu.parallel.sharded_search import sharded_int8_topk

    S, PL, D, K = 8, 16, 32, 5
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((S * PL, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    codes, scales = quantize_int8(jnp.asarray(vecs))
    vec_docs = np.tile(np.arange(PL, dtype=np.int32), S)
    valid = np.ones(S * PL, np.float32)
    q = rng.standard_normal(D).astype(np.float32)

    knn = sharded_int8_topk(mesh8, K, shard_cap=PL)
    v, gids = knn(codes, scales, jnp.asarray(vec_docs), jnp.asarray(valid), jnp.asarray(q))

    sims = vecs @ q
    order = np.argsort(-sims)[:K]
    got = set(np.asarray(gids).tolist())
    # int8 rounding can flip near-ties at the boundary; require >=4/5 overlap
    assert len(got & set(order.tolist())) >= K - 1


def test_sharded_hybrid_step_runs(mesh8):
    S, LD, LP, LV, D, K = 8, 32, 64, 32, 16, 4
    rng = np.random.default_rng(1)
    step = sharded_hybrid_step(mesh8, K, shard_cap=LD, n_local_docs=LD)
    vals, ids = step(
        jnp.asarray(rng.integers(0, LD, S * LP), jnp.int32),
        jnp.asarray(rng.uniform(1, 3, S * LP), jnp.float32),
        jnp.asarray(rng.uniform(5, 50, S * LD), jnp.float32),
        jnp.asarray(rng.integers(0, LP, S * 16), jnp.int32),
        jnp.asarray(rng.uniform(0.1, 2, S * 16), jnp.float32),
        jnp.asarray(rng.standard_normal((S * LV, D)), jnp.float32),
        jnp.asarray(rng.integers(0, LD, S * LV), jnp.int32),
        jnp.ones(S * LV, jnp.float32),
        jnp.asarray(rng.standard_normal(D), jnp.float32),
        jnp.ones(S * LD, jnp.float32),
        jnp.float32(20.0),
    )
    assert vals.shape == (K,)
    assert ids.shape == (K,)
    v = np.asarray(vals)
    assert (np.diff(v) <= 1e-6).all()  # sorted descending
    assert (np.asarray(ids) >= 0).all() and (np.asarray(ids) < S * LD).all()


def test_encoder_tp_matches_single_device(mesh8):
    from orama_core_tpu.models import encoder as enc
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh((4, 2), ("data", "model"))
    cfg = enc.EncoderConfig(
        vocab_size=128, hidden=64, layers=2, heads=4, mlp=128, max_len=16,
        out_dim=64, dtype=jnp.float32,
    )
    params = enc.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 128, (8, 16)), jnp.int32)
    mask = jnp.ones((8, 16), jnp.float32)

    ref = enc.encode(params, cfg, ids, mask)

    specs = enc.param_specs(cfg)
    sp = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data", None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", None)))
    out = jax.jit(lambda p, i, m: enc.encode(p, cfg, i, m))(sp, ids_s, mask_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
