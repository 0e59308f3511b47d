"""Fused kNN (sub-block-max + exact rescore) vs dense reference
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orama_core_tpu.ops.pallas_knn import knn_topk


@pytest.mark.parametrize(
    "n,d,q,k,bn,sub",
    [
        (8192, 128, 8, 4, 512, 128),   # pallas phase-1 path
        (4096, 64, 16, 3, 256, 128),   # pallas phase-1 path, smaller blocks
        (1024, 128, 8, 10, 256, 256),  # dense fallback (k*sub*4 >= n)
    ],
)
def test_knn_topk_matches_dense(n, d, q, k, bn, sub):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    vals, idx = knn_topk(
        jnp.asarray(vecs), jnp.asarray(queries), k=k, block_rows=bn,
        sub_rows=sub, interpret=True,
    )
    sims = queries @ vecs.T
    ref_idx = np.argsort(-sims, axis=1)[:, :k]
    got_v = np.asarray(vals)
    got_i = np.asarray(idx)
    for r in range(q):
        np.testing.assert_allclose(
            got_v[r], np.sort(sims[r])[::-1][:k], rtol=1e-5
        )
        # indices may differ on exact ties; compare via score values
        np.testing.assert_allclose(
            sims[r, got_i[r]], sims[r, ref_idx[r]], rtol=1e-5
        )


def test_knn_topk_padding_mask():
    """Padding rows (>= n_valid) must never be selected, including when a
    sub-block straddles the valid/padding boundary."""
    rng = np.random.default_rng(7)
    n_valid, n_pad, d, q, k = 5000, 8192, 64, 4, 5
    vecs = np.full((n_pad, d), 10.0, np.float32)  # poisoned padding
    vecs[:n_valid] = rng.standard_normal((n_valid, d)).astype(np.float32)
    queries = rng.standard_normal((q, d)).astype(np.float32)
    vals, idx = knn_topk(
        jnp.asarray(vecs), jnp.asarray(queries), k=k, block_rows=512,
        sub_rows=128, interpret=True, n_valid=n_valid,
    )
    assert (np.asarray(idx) < n_valid).all()
    sims = queries @ vecs[:n_valid].T
    for r in range(q):
        np.testing.assert_allclose(
            np.asarray(vals)[r], np.sort(sims[r])[::-1][:k], rtol=1e-5
        )


def test_knn_topk_int8_matches_dense():
    from orama_core_tpu.ops.pallas_knn import knn_topk_int8
    from orama_core_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(3)
    n, d, q, k, bn = 8192, 64, 8, 4, 512
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    codes, scales = quantize_int8(jnp.asarray(vecs))
    queries = rng.standard_normal((q, d)).astype(np.float32)
    vals, idx = knn_topk_int8(
        codes, scales, jnp.asarray(queries), k=k, block_rows=bn,
        sub_rows=128, interpret=True,
    )
    sims = queries @ vecs.T
    ref_idx = np.argsort(-sims, axis=1)[:, :k]
    got = np.asarray(idx)
    recall = np.mean(
        [len(set(got[r]) & set(ref_idx[r])) / k for r in range(q)]
    )
    assert recall >= 0.9, recall
    # returned values approximate the true sims of the returned rows
    v = np.asarray(vals)
    for r in range(q):
        np.testing.assert_allclose(v[r], sims[r, got[r]], atol=0.05)


def test_knn_topk_descending_order():
    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((4096, 32)).astype(np.float32)
    queries = rng.standard_normal((4, 32)).astype(np.float32)
    vals, _ = knn_topk(
        jnp.asarray(vecs), jnp.asarray(queries), k=8, block_rows=256,
        sub_rows=128, interpret=True,
    )
    v = np.asarray(vals)
    assert (np.diff(v, axis=1) <= 1e-6).all()


def test_knn_topk_with_count_matches_dense():
    from orama_core_tpu.ops.pallas_knn import knn_topk_with_count

    rng = np.random.default_rng(11)
    n_valid, n, d, q, k = 7000, 8192, 64, 8, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs[n_valid:] = 50.0  # poisoned padding: must not count or rank
    queries = rng.standard_normal((q, d)).astype(np.float32)
    vals, idx, cnt = knn_topk_with_count(
        jnp.asarray(vecs), jnp.asarray(queries), k=k, block_rows=512,
        sub_rows=64, interpret=True, n_valid=n_valid,
    )
    sims = queries @ vecs[:n_valid].T
    np.testing.assert_array_equal(
        np.asarray(cnt), (sims > 0).sum(axis=1).astype(np.int32)
    )
    for r in range(q):
        np.testing.assert_allclose(
            np.asarray(vals)[r], np.sort(sims[r])[::-1][:k], rtol=1e-5
        )
    assert (np.asarray(idx) < n_valid).all()


def test_knn_topk_int8_with_count_matches_dense():
    from orama_core_tpu.ops.pallas_knn import knn_topk_int8_with_count
    from orama_core_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(17)
    n_valid, n, d, q, k = 7000, 8192, 64, 8, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    codes, scales = quantize_int8(jnp.asarray(vecs))
    queries = rng.standard_normal((q, d)).astype(np.float32)
    vals, idx, cnt = knn_topk_int8_with_count(
        codes, scales, jnp.asarray(queries), k=k, block_rows=512,
        sub_rows=64, interpret=True, n_valid=n_valid,
    )
    # the oracle uses the same quantized arithmetic the kernel scores with
    q_absmax = np.maximum(np.abs(queries).max(axis=1, keepdims=True), 1e-9)
    q_scale = q_absmax / 127.0
    q8 = np.clip(np.round(queries / q_scale), -127, 127)
    sims = (q8 @ np.asarray(codes[:n_valid]).T.astype(np.float64)) * \
        np.asarray(scales[:n_valid])[None, :] * q_scale
    np.testing.assert_array_equal(
        np.asarray(cnt), (sims > 0).sum(axis=1).astype(np.int32)
    )
    ref_idx = np.argsort(-sims, axis=1)[:, :k]
    got = np.asarray(idx)
    for r in range(q):
        assert (got[r] < n_valid).all()
        overlap = len(set(got[r]) & set(ref_idx[r])) / k
        assert overlap >= 0.8, (r, got[r], ref_idx[r])


def test_bm25_pallas_block_gather_matches_xla():
    """The DMA-aligned Pallas BM25 scan (bm25_scores_blocked_pallas) must
    reproduce the XLA blocked scan bit-for-bit on unaligned spans."""
    import jax
    import jax.numpy as jnp

    from orama_core_tpu.ops.bm25 import (
        aligned_blocks_needed,
        bm25_scores_blocked,
        bm25_scores_blocked_pallas,
        build_block_plan,
        build_block_plan_aligned,
    )

    rng = np.random.default_rng(0)
    CAP, P = 4096, 8192
    docs = rng.integers(0, CAP, P).astype(np.int32)
    tf = rng.uniform(1, 4, P).astype(np.float32)
    ni = np.full(P, 37.0, np.float32)
    plens = rng.uniform(5, 60, P).astype(np.float32)
    spans = [(3, 700), (1000, 1537), (2048, 2560), (5000, 5003)]
    p_lo = [a for a, b in spans]
    p_len = [b - a for a, b in spans]
    nb = 64
    assert aligned_blocks_needed(p_len) <= nb
    bs, bv = build_block_plan(p_lo, p_len, nb)
    ref = bm25_scores_blocked(
        jnp.asarray(docs), jnp.asarray(tf), jnp.asarray(ni),
        jnp.asarray(plens), jnp.asarray(bs), jnp.asarray(bv),
        jnp.float32(1.3), jnp.float32(30.0), jnp.float32(10000.0),
        n_docs=CAP, n_blocks=nb,
    )
    sb, lo, hi = build_block_plan_aligned(p_lo, p_len, nb)
    out = bm25_scores_blocked_pallas(
        jnp.asarray(docs), jnp.asarray(tf), jnp.asarray(ni),
        jnp.asarray(plens), jnp.asarray(sb), jnp.asarray(lo),
        jnp.asarray(hi), jnp.float32(1.3), jnp.float32(30.0),
        jnp.float32(10000.0), n_docs=CAP, n_blocks=nb, interpret=True,
    )
    r, o = jax.device_get((ref, out))
    assert np.allclose(r, o, atol=1e-5)


def test_knn_topk_multivec_exact_order():
    """The segmented phase-1 metric (per-sub-block max of the inclusive
    relu-sum scan) + predecessor gather makes the multi-vector kernel's
    top-k EXACT, not approximate: a doc whose chunks are individually
    mediocre but collectively strong (sum scoring) must rank above
    single-chunk docs with one stronger row — the case the old per-row
    max metric missed."""
    from orama_core_tpu.ops.pallas_knn import knn_topk_multivec_with_count

    rng = np.random.default_rng(23)
    d = 64
    docs, vecs = [], []
    for i in range(2500):
        nch = 1 + (i % 4)
        v = rng.standard_normal((nch, d)).astype(np.float32)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        vecs.append(v)
        docs += [i] * nch
    # adversarial doc: 4 medium chunks summing above every single row
    q0 = rng.standard_normal(d).astype(np.float32)
    q0 /= np.linalg.norm(q0)
    spread = 0.55 * q0 + 0.85 * rng.standard_normal((4, d)).astype(np.float32)
    spread /= np.linalg.norm(spread, axis=1, keepdims=True)
    vecs[103] = spread.astype(np.float32)  # doc 103 has 4 chunk rows
    vecs = np.concatenate(vecs)
    docs = np.array(docs, np.int32)
    n = len(docs)
    p_l = ((n + 511) // 512) * 512
    vecs = np.concatenate([vecs, np.zeros((p_l - n, d), np.float32)])
    docs_p = np.concatenate([docs, np.full(p_l - n, 2499, np.int32)])
    starts = np.zeros(2501, np.int32)
    starts[1:] = np.cumsum(np.bincount(docs, minlength=2500))

    queries = np.stack([q0] + [
        x / np.linalg.norm(x)
        for x in rng.standard_normal((3, d)).astype(np.float32)
    ]).astype(np.float32)
    vals, dk, cnt = knn_topk_multivec_with_count(
        jnp.asarray(vecs), jnp.asarray(docs_p), jnp.asarray(starts),
        jnp.asarray(queries), k=10, block_rows=512, m_max=4,
        n_valid=p_l, n_docs=2500, interpret=True,
    )
    sims = np.maximum(vecs[:n] @ queries.T, 0.0)            # [n, Q]
    for r in range(len(queries)):
        seg = np.zeros(2500)
        np.add.at(seg, docs, sims[:, r])
        oracle = np.argsort(-seg)[:10]
        np.testing.assert_array_equal(np.asarray(dk)[r], oracle)
        np.testing.assert_allclose(
            np.asarray(vals)[r], seg[oracle], rtol=1e-4, atol=1e-5
        )
        assert abs(int(cnt[r]) - int((seg > 0).sum())) <= 1


def test_tiered_subblock_topk_exact():
    """The recursive block-max selection must return EXACTLY the same
    id set as a plain top-k over the table — including non-divisible
    group sizes, the small-table fallback, and duplicate values."""
    import jax.numpy as jnp
    from orama_core_tpu.ops.pallas_knn import _tiered_subblock_topk

    rng = np.random.default_rng(31)
    for n, qn, k in ((1000, 8, 10), (4096, 16, 5), (513, 8, 12),
                     (129, 8, 3), (40960, 8, 17)):
        x = rng.standard_normal((n, qn)).astype(np.float32)
        # inject duplicates to exercise tie handling
        x[n // 3] = x[n // 2]
        ids = np.asarray(_tiered_subblock_topk(jnp.asarray(x), k))
        vals = np.sort(x, axis=0)[::-1][: min(k, n)]
        for q in range(qn):
            got = np.sort(x[ids[:, q] if ids.ndim == 1 else ids[q], q])[::-1]
            np.testing.assert_allclose(got, vals[:, q], rtol=0, atol=0,
                                       err_msg=f"n={n} q={q}")


def test_knn_topk_int8_xla_streams_chunks():
    """knn_topk_int8_xla_with_count must stream phase 1 in chunk_rows
    slices (the engine serves int8 corpora near HBM capacity — a
    materialized [Q, N] product is an OOM at 30M rows) and stay exact vs
    the quantized oracle regardless of the chunking."""
    from orama_core_tpu.ops.pallas_knn import knn_topk_int8_xla_with_count
    from orama_core_tpu.ops.quant import quantize_int8

    rng = np.random.default_rng(23)
    n_valid, n, d, q, k = 7900, 8192, 64, 8, 5
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    codes, scales = quantize_int8(jnp.asarray(vecs))
    queries = rng.standard_normal((q, d)).astype(np.float32)

    # oracle: same quantized arithmetic
    q_absmax = np.maximum(np.abs(queries).max(axis=1, keepdims=True), 1e-9)
    q_scale = q_absmax / 127.0
    q8 = np.clip(np.round(queries / q_scale), -127, 127)
    sims = (q8 @ np.asarray(codes[:n_valid]).T.astype(np.float64)) * \
        np.asarray(scales[:n_valid])[None, :] * q_scale
    ref_cnt = (sims > 0).sum(axis=1).astype(np.int32)
    ref_idx = np.argsort(-sims, axis=1)[:, :k]

    outs = {}
    for chunk_rows in (1024, 4096, 1 << 19):  # 8, 2, and 1 chunk(s)
        vals, idx, cnt = knn_topk_int8_xla_with_count(
            codes, scales, jnp.asarray(queries), k=k, n_valid=n_valid,
            chunk_rows=chunk_rows,
        )
        np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)
        got = np.asarray(idx)
        for r in range(q):
            assert (got[r] < n_valid).all()
            overlap = len(set(got[r]) & set(ref_idx[r])) / k
            assert overlap >= 0.8, (chunk_rows, r)
        outs[chunk_rows] = (np.asarray(vals), got)
    # chunking must not change results at all
    for c in (1024, 4096):
        np.testing.assert_array_equal(outs[c][1], outs[1 << 19][1])
        np.testing.assert_allclose(outs[c][0], outs[1 << 19][0], rtol=1e-6)
