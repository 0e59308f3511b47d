import numpy as np
import jax.numpy as jnp

from orama_core_tpu.ops import bm25, facets, filters, fusion, topk, vector


def test_bm25_matches_reference_value():
    # Reference unit test (dto/bm25.rs:123-135): tf=5, len=100, avgdl=100,
    # N=10, ni=5 => score 1.2297773
    idf = bm25.idf_from_counts([5], 10.0)
    post_docs = jnp.array([3], dtype=jnp.int32)
    post_tf = jnp.array([5.0], dtype=jnp.float32)
    doc_lens = jnp.zeros(8, jnp.float32).at[3].set(100.0)
    scores = bm25.bm25_scores(
        post_docs,
        post_tf,
        doc_lens,
        gather_idx=jnp.array([0], dtype=jnp.int32),
        idf=jnp.array(idf),
        boost_by_doc=jnp.ones(8, jnp.float32),
        filter_mask=jnp.ones(8, jnp.float32),
        avgdl=jnp.float32(100.0),
        n_docs=8,
    )
    np.testing.assert_allclose(float(scores[3]), 1.2297773, rtol=1e-5)
    assert float(jnp.sum(scores)) == float(scores[3])  # only doc 3 scored


def test_bm25_accumulates_terms_and_applies_mask():
    # two postings for doc 1, one for doc 2; doc 2 filtered out
    post_docs = jnp.array([1, 1, 2], dtype=jnp.int32)
    post_tf = jnp.array([1.0, 2.0, 5.0], dtype=jnp.float32)
    doc_lens = jnp.array([0, 10, 10, 0], dtype=jnp.float32)
    idf = jnp.array([0.5, 0.7, 0.9], dtype=jnp.float32)
    mask = jnp.array([1, 1, 0, 1], dtype=jnp.float32)
    scores = bm25.bm25_scores(
        post_docs,
        post_tf,
        doc_lens,
        gather_idx=jnp.arange(3, dtype=jnp.int32),
        idf=idf,
        boost_by_doc=jnp.ones(4, jnp.float32),
        filter_mask=mask,
        avgdl=jnp.float32(10.0),
        n_docs=4,
    )
    assert float(scores[2]) == 0.0
    assert float(scores[1]) > 0.0
    assert float(scores[0]) == 0.0


def test_phrase_boost_adjacency_and_dedup():
    # doc 0: positions {2, 3, 3, 7} -> distinct {2,3,7}, one adjacency (2,3)
    # boost = anyorder(3) + 2*seq(1) + user(1) = 6
    pos_docs = jnp.array([0, 0, 0, 0, 5], dtype=jnp.int32)
    pos_vals = jnp.array([3, 2, 3, 7, 1], dtype=jnp.int32)
    valid = jnp.array([1, 1, 1, 1, 0], dtype=jnp.float32)
    boost = bm25.phrase_boost_by_doc(
        pos_docs, pos_vals, valid, jnp.float32(1.0), n_docs=8
    )
    assert float(boost[0]) == 6.0
    # unmatched docs keep the plain user boost
    assert float(boost[5]) == 1.0
    assert float(boost[7]) == 1.0


def test_vector_brute_force_multi_vector_sum():
    # doc 0 has two identical unit vectors, doc 1 orthogonal
    vecs = jnp.array(
        [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=jnp.float32
    )
    vec_docs = jnp.array([0, 0, 1], dtype=jnp.int32)
    valid = jnp.ones(3, jnp.float32)
    q = jnp.array([1.0, 0.0], dtype=jnp.float32)
    scores = vector.brute_force_scores(
        vecs, vec_docs, valid, q, jnp.ones(4, jnp.float32), n_docs=4
    )
    np.testing.assert_allclose(float(scores[0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(scores[1]), 0.0, atol=1e-6)


def test_number_range_mask_bounds():
    vals = jnp.array([1.0, 2.0, 3.0, 4.0], dtype=jnp.float32)
    docs = jnp.array([0, 1, 2, 3], dtype=jnp.int32)
    valid = jnp.ones(4, dtype=bool)
    m = filters.number_range_mask(
        vals, docs, valid,
        jnp.float32(2.0), jnp.float32(4.0),
        jnp.array(True), jnp.array(False),  # (2, 4]
        n_docs=6,
    )
    assert m.tolist() == [0.0, 0.0, 1.0, 1.0, 0.0, 0.0]


def test_number_eq_mask():
    vals = jnp.array([1.0, 2.0, 2.0], dtype=jnp.float32)
    docs = jnp.array([0, 1, 2], dtype=jnp.int32)
    valid = jnp.ones(3, dtype=bool)
    m = filters.number_eq_mask(vals, docs, valid, jnp.float32(2.0), n_docs=4)
    assert m.tolist() == [0.0, 1.0, 1.0, 0.0]


def test_fusion_minmax():
    ft = jnp.array([2.0, 0.0, 1.0], dtype=jnp.float32)
    vec = jnp.array([0.0, 4.0, 1.0], dtype=jnp.float32)
    fused = fusion.minmax_fuse(ft, vec)
    np.testing.assert_allclose(np.asarray(fused), [0.5, 1.0, 0.5], rtol=1e-6)


def test_fusion_rrf_prefers_doc_ranked_high_in_both():
    ft = jnp.array([3.0, 2.0, 1.0, 0.0], dtype=jnp.float32)
    vec = jnp.array([1.0, 3.0, 2.0, 0.0], dtype=jnp.float32)
    fused = np.asarray(fusion.rrf_fuse(ft, vec))
    assert fused[1] == fused.max()  # ranks (2nd, 1st)
    assert fused[3] == 0.0  # unmatched contributes nothing


def test_facet_counts():
    vals = jnp.array([1.0, 5.0, 9.0], dtype=jnp.float32)
    docs = jnp.array([0, 1, 2], dtype=jnp.int32)
    valid = jnp.ones(3, dtype=bool)
    matched = jnp.array([1.0, 1.0, 0.0, 0.0], dtype=jnp.float32)
    counts = facets.number_facet_counts(
        vals, docs, valid,
        lows=jnp.array([0.0, 4.0], dtype=jnp.float32),
        highs=jnp.array([4.0, 10.0], dtype=jnp.float32),
        matched=matched,
        n_docs=4,
    )
    assert counts.tolist() == [1, 1]


def test_bool_facet_counts():
    true_mask = jnp.array([1.0, 0.0, 1.0, 0.0], dtype=jnp.float32)
    has_mask = jnp.array([1.0, 1.0, 1.0, 0.0], dtype=jnp.float32)
    matched = jnp.array([1.0, 1.0, 0.0, 1.0], dtype=jnp.float32)
    out = facets.bool_facet_counts(true_mask, has_mask, matched)
    assert out.tolist() == [1, 1]


def test_topk():
    scores = jnp.array([0.1, 3.0, 0.0, 2.0], dtype=jnp.float32)
    vals, idx, count = topk.topk_with_count(scores, 3)
    assert idx.tolist() == [1, 3, 0]
    assert int(count) == 3


def test_phrase_docmajor_matches_sort_kernel():
    """The sort-free doc-major phrase kernel must reproduce
    phrase_boost_by_doc exactly on random corpora (dups from stem/original
    shared positions, multi-term spans, adjacency chains).

    The generator mirrors the builder invariant the kernel's bounded-group
    logic relies on (collection_write.py:275-278 via tokenize_and_stem): a
    (doc, pos) carries the original term plus AT MOST one distinct stem —
    never more than 2 stream entries."""
    import numpy as np
    import jax.numpy as jnp
    import jax

    from orama_core_tpu.ops import bm25 as b

    rng = np.random.default_rng(9)
    n_docs, n_terms = 40, 25
    # per-doc token sequences: position p emits original term o and, half
    # the time, a distinct stem term s (o and s drawn from disjoint halves
    # so a pair never collides) — exactly the builder's stream shape
    entries = []  # (doc, pos, term)
    for d in range(n_docs):
        for p in range(int(rng.integers(3, 12))):
            o = int(rng.integers(0, n_terms // 2))
            entries.append((d, p, o))
            if rng.random() < 0.5:
                s = int(rng.integers(n_terms // 2, n_terms))
                entries.append((d, p, s))
    pos_doc = np.asarray([e[0] for e in entries], np.int64)
    positions = np.asarray([e[1] for e in entries], np.int64)
    pos_term = np.asarray([e[2] for e in entries], np.int32)

    spans = np.zeros((32, 2), np.int32)
    spans[0] = (2, 5)     # multi-term span (prefix expansion)
    spans[1] = (7, 8)
    spans[2] = (11, 14)

    # gold: the sort-based kernel over matched positions only
    m = ((pos_term >= 2) & (pos_term < 5)) | (pos_term == 7) | (
        (pos_term >= 11) & (pos_term < 14)
    )
    gold = np.asarray(
        b.phrase_boost_by_doc(
            jnp.asarray(pos_doc[m], jnp.int32),
            jnp.asarray(positions[m], jnp.int32),
            jnp.ones(int(m.sum()), jnp.float32),
            jnp.float32(1.5),
            n_docs=n_docs,
        )
    )

    # doc-major stream over ALL positions
    order = np.lexsort((positions, pos_doc))
    d_col = np.full(512, b.PAD_DOC, np.int32)
    p_col = np.zeros(512, np.int32)
    t_col = np.zeros(512, np.int32)
    d_col[: len(positions)] = pos_doc[order]
    p_col[: len(positions)] = positions[order]
    t_col[: len(positions)] = pos_term[order]
    counts = np.bincount(pos_doc, minlength=n_docs)
    bounds = np.zeros(n_docs + 1, np.int32)
    np.cumsum(counts, out=bounds[1:])
    got = np.asarray(
        b.phrase_boost_docmajor(
            jnp.asarray(d_col), jnp.asarray(p_col), jnp.asarray(t_col),
            jnp.asarray(bounds), jnp.asarray(spans), jnp.float32(1.5),
            n_docs=n_docs,
        )
    )
    assert np.allclose(got, gold), np.nonzero(got != gold)


def test_rrf_fuse_topk_matches_dense_argsort():
    """Candidate-exact RRF (ops/fusion.rrf_fuse_topk) must reproduce the
    dense argsort formulation bit-for-bit — values, ids, tie order —
    including heavy ties and zero-score (unmatched) docs."""
    import jax

    from orama_core_tpu.ops.fusion import (
        rrf_candidate_count,
        rrf_fuse,
        rrf_fuse_topk,
    )

    rng = np.random.default_rng(0)
    n, k = 5000, 10
    for trial in range(5):
        ft = rng.uniform(0, 3, n).astype(np.float32)
        vec = rng.uniform(0, 1, n).astype(np.float32)
        ft[rng.random(n) < 0.6] = 0.0       # most docs unmatched
        vec[rng.random(n) < 0.6] = 0.0
        ft = np.round(ft, 1)                # force score ties
        dense = rrf_fuse(jnp.asarray(ft), jnp.asarray(vec))
        dv, di = jax.lax.top_k(dense, k)
        cv, ci, cnt = rrf_fuse_topk(
            jnp.asarray(ft), jnp.asarray(vec), k, rrf_candidate_count(k)
        )
        dv, di, cv, ci, cnt = jax.device_get((dv, di, cv, ci, cnt))
        assert list(di) == list(ci), trial
        assert np.allclose(dv, cv, atol=1e-7), trial
        assert int(cnt) == int(np.sum((ft > 0) | (vec > 0))), trial


def test_phrase_windowed_matches_docmajor():
    """The windowed phrase kernel (Pallas window binning + page one-hot
    matmul, ops/bm25.phrase_boost_docmajor_windowed) must reproduce
    phrase_boost_docmajor exactly: random corpora across doc-length
    regimes (tiny docs stress the window widths, a giant doc spans
    multiple blocks), multi-term spans, stem/original duplicate
    positions, PAD tail in every block shape."""
    import numpy as np
    import jax.numpy as jnp

    from orama_core_tpu.ops import bm25 as b

    for seed, lo_len, hi_len, n_docs in [
        (1, 3, 12, 800),      # mid docs, several blocks
        (2, 2, 6, 1200),      # short docs: wide doc windows
        (3, 40, 90, 120),     # long docs: narrow windows
    ]:
        rng = np.random.default_rng(seed)
        entries = []
        for d in range(n_docs):
            for p in range(int(rng.integers(lo_len, hi_len + 1))):
                o = int(rng.integers(0, 12))
                entries.append((d, p, o))
                if rng.random() < 0.4:
                    entries.append((d, p, int(rng.integers(12, 25))))
        if seed == 3:
            # one giant doc spanning multiple 2048-position blocks
            for p in range(5000):
                entries.append((n_docs, p, int(rng.integers(0, 25))))
            n_docs += 1
        pos_doc = np.asarray([e[0] for e in entries], np.int64)
        positions = np.asarray([e[1] for e in entries], np.int64)
        pos_term = np.asarray([e[2] for e in entries], np.int32)

        spans = np.zeros((4, 2), np.int32)
        spans[0] = (2, 5)
        spans[1] = (7, 8)
        spans[2] = (13, 16)

        pp = len(entries)
        pp_pad = -(-pp // (b._PH_PB * b._PH_GRP)) * (b._PH_PB * b._PH_GRP)
        order = np.lexsort((positions, pos_doc))
        d_col = np.full(pp_pad, b.PAD_DOC, np.int32)
        p_col = np.zeros(pp_pad, np.int32)
        t_col = np.zeros(pp_pad, np.int32)
        d_col[:pp] = pos_doc[order]
        p_col[:pp] = positions[order]
        t_col[:pp] = pos_term[order]
        counts = np.bincount(pos_doc, minlength=n_docs)
        bounds = np.zeros(n_docs + 1, np.int64)
        np.cumsum(counts, out=bounds[1:])

        meta = b.phrase_window_meta(bounds, pp, pp_pad)
        assert meta is not None, seed
        w_base, W, wsub = meta

        ref = np.asarray(
            b.phrase_boost_docmajor(
                jnp.asarray(d_col), jnp.asarray(p_col), jnp.asarray(t_col),
                jnp.asarray(bounds, jnp.int32), jnp.asarray(spans),
                jnp.float32(2.0), n_docs=n_docs,
            )
        )
        got = np.asarray(
            b.phrase_boost_docmajor_windowed(
                jnp.asarray(d_col), jnp.asarray(p_col), jnp.asarray(t_col),
                jnp.asarray(w_base), jnp.asarray(spans), jnp.float32(2.0),
                n_docs=n_docs, W=W, wsub=wsub, interpret=True,
            )
        )
        bad = np.nonzero(got != ref)[0]
        assert bad.size == 0, (seed, bad[:10], got[bad[:5]], ref[bad[:5]])

        # commit-static bits variant: identical again
        bits = b.phrase_static_bits(jnp.asarray(d_col), jnp.asarray(p_col))
        got2 = np.asarray(
            b.phrase_boost_docmajor_windowed(
                jnp.asarray(d_col), jnp.asarray(p_col), jnp.asarray(t_col),
                jnp.asarray(w_base), jnp.asarray(spans), jnp.float32(2.0),
                n_docs=n_docs, W=W, wsub=wsub, interpret=True, bits=bits,
            )
        )
        bad2 = np.nonzero(got2 != ref)[0]
        assert bad2.size == 0, (seed, bad2[:10])

        # segment-sum page combine: identical again
        got3 = np.asarray(
            b.phrase_boost_docmajor_windowed(
                jnp.asarray(d_col), jnp.asarray(p_col), jnp.asarray(t_col),
                jnp.asarray(w_base), jnp.asarray(spans), jnp.float32(2.0),
                n_docs=n_docs, W=W, wsub=wsub, interpret=True, bits=bits,
                combine="segsum",
            )
        )
        bad3 = np.nonzero(got3 != ref)[0]
        assert bad3.size == 0, (seed, bad3[:10])


def test_phrase_window_meta_degenerate_fallback():
    """Corpora of one-token docs make every block span ~2048 docs — the
    meta helper must signal fallback (None) instead of emitting windows
    the kernel's VMEM budget cannot hold."""
    import numpy as np

    from orama_core_tpu.ops import bm25 as b

    n_docs = 6000  # one position each
    bounds = np.arange(n_docs + 1, dtype=np.int64)
    pp = n_docs
    pp_pad = -(-pp // (b._PH_PB * b._PH_GRP)) * (b._PH_PB * b._PH_GRP)
    assert b.phrase_window_meta(bounds, pp, pp_pad) is None


def test_rrf_fuse_topk_batch_matches_single_rowwise():
    """The fully-batched chunked rank count (rrf_fuse_topk_batch) must be
    row-for-row bit-identical to the single-query rrf_fuse_topk —
    including exact score ties (argsort-stable: lower index wins) and
    both the chunked (n % 1024 == 0) and unchunked (odd n) paths."""
    import jax.numpy as jnp

    from orama_core_tpu.ops.fusion import (
        rrf_candidate_count,
        rrf_fuse_topk,
        rrf_fuse_topk_batch,
    )

    rng = np.random.default_rng(7)
    k = 10
    c = rrf_candidate_count(k)
    for n in (1000, 4096):
        ft = (rng.random((6, n)) * (rng.random((6, n)) < 0.1)).astype(
            np.float32
        )
        vec = (rng.random((6, n)) * (rng.random((6, n)) < 0.2)).astype(
            np.float32
        )
        ft[:, 5] = ft[:, 50] = 0.5   # exact ties across doc ids
        vec[:, 7] = vec[:, 70] = 0.25
        bv, bi, bc = rrf_fuse_topk_batch(
            jnp.asarray(ft), jnp.asarray(vec), k, c
        )
        for r in range(6):
            sv, si, sc = rrf_fuse_topk(
                jnp.asarray(ft[r]), jnp.asarray(vec[r]), k, c
            )
            np.testing.assert_array_equal(np.asarray(bi[r]), np.asarray(si))
            np.testing.assert_allclose(np.asarray(bv[r]), np.asarray(sv))
            assert int(bc[r]) == int(sc)


def test_tiered_topk_matches_flat():
    """Block-max tiered candidate selection must return the same
    candidate set as a flat top_k (tie-free data), in both [n] and
    [B, n] shapes, at a size where tiering actually engages
    (n // 1024 blocks > c)."""
    import jax
    import jax.numpy as jnp

    from orama_core_tpu.ops.fusion import _tiered_topk

    rng = np.random.default_rng(3)
    n, c = 16384, 6
    s1 = rng.random(n).astype(np.float32)
    flat = np.asarray(jax.lax.top_k(jnp.asarray(s1), c)[1])
    tiered = np.asarray(_tiered_topk(jnp.asarray(s1), c))
    assert set(flat.tolist()) == set(tiered.tolist())
    sb = rng.random((4, n)).astype(np.float32)
    flat_b = np.asarray(jax.lax.top_k(jnp.asarray(sb), c)[1])
    tiered_b = np.asarray(_tiered_topk(jnp.asarray(sb), c))
    for r in range(4):
        assert set(flat_b[r].tolist()) == set(tiered_b[r].tolist())


def test_rrf_fuse_topk_tiered_matches_dense_oracle_large():
    """rrf_fuse_topk with the tiered candidate selector engaged
    (n=262144 > c*1024) must still reproduce the dense argsort oracle."""
    import jax.numpy as jnp

    from orama_core_tpu.ops.fusion import (
        rrf_candidate_count,
        rrf_fuse,
        rrf_fuse_topk,
    )

    rng = np.random.default_rng(11)
    n, k = 262_144, 10
    ft = (rng.random(n) * (rng.random(n) < 0.01)).astype(np.float32)
    vec = (rng.random(n) * (rng.random(n) < 0.02)).astype(np.float32)
    dense = np.asarray(rrf_fuse(jnp.asarray(ft), jnp.asarray(vec)))
    want = np.argsort(-dense, kind="stable")[:k]
    cv, ci, _ = rrf_fuse_topk(
        jnp.asarray(ft), jnp.asarray(vec), k, rrf_candidate_count(k)
    )
    np.testing.assert_array_equal(np.asarray(ci), want)
    np.testing.assert_allclose(np.asarray(cv), dense[want], rtol=1e-6)
