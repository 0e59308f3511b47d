"""Fast smoke tests for the canonical fused serving shape, collected first
(``aa`` prefix) so a broken default path fails within seconds of the suite
starting, not 24 s in.

Round-3 postmortem: a half-landed feature broke the single-query fused
program (one string field, committed-only — `_hybrid_fused_eligible`,
collection_read.py) and the first failure only surfaced deep in a batching
test. These tests pin:

1. the canonical shape end-to-end (one string field -> commit -> term
   search) AND that it actually took the fused one-dispatch path;
2. bit-parity of the dense Zipf-head-term rows (ops/bm25.py dense section)
   against the plain blocked scan, at both the ops and the engine level.

Reference bar: committed/string.rs:302-479 (the committed BM25 loop the
fused program replaces).
"""

import numpy as np
import pytest

from orama_core_tpu.types import SearchParams

MASTER = "master"
READ = "read-key"
WRITE = "write-key"


def _engine(tmp_path, tag, **tpu_overrides):
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / f"w-{tag}")
    cfg.reader_side.data_dir = str(tmp_path / f"r-{tag}")
    cfg.writer_side.insert_batch_commit_size = 10_000_000
    cfg.reader_side.insert_batch_commit_size = 10_000_000
    cfg.writer_side.commit_interval_sec = 3600.0
    cfg.reader_side.commit_interval_sec = 3600.0
    cfg.ai.backend = "fake"
    for k, v in tpu_overrides.items():
        setattr(cfg.tpu, k, v)
    return build_orama(cfg, start_background=False)


def _seed(engine, docs, cid="c1"):
    engine.write_side.create_collection(
        MASTER, cid, read_api_key=READ, write_api_key=WRITE
    )
    engine.flush()
    engine.write_side.write(cid, docs, WRITE)
    engine.flush()
    engine.commit()
    return cid


def test_fused_canonical_shape_smoke(tmp_path, monkeypatch):
    """One string field -> commit -> {"term": ...}: the steady-state query
    every deployment serves. Must return ranked hits AND ride the fused
    single-dispatch program."""
    engine = _engine(tmp_path, "smoke")
    try:
        cid = _seed(
            engine,
            [
                {"id": "a", "body": "the cat sat on the mat"},
                {"id": "b", "body": "a dog chased the cat and the cat ran"},
                {"id": "c", "body": "quantum computing explained"},
            ],
        )
        reader = engine.read_side._reader(cid)
        calls = []
        orig = reader._search_hybrid_fused

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(reader, "_search_hybrid_fused", spy)
        res = engine.read_side.search(
            cid, SearchParams.from_json({"term": "cat"}), READ
        )
        assert [h.id for h in res.hits] == ["b", "a"]
        assert res.count == 2
        assert calls, "canonical shape did not take the fused path"

        # multi-token (phrase-boosted) flavor of the same shape
        res = engine.read_side.search(
            cid, SearchParams.from_json({"term": "cat sat"}), READ
        )
        assert res.hits and res.hits[0].id == "a"
    finally:
        engine.close()


def _dense_corpus():
    # "common" is the Zipf head (every doc); rare terms discriminate.
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = []
    for i in range(48):
        words = ["common"] * int(rng.integers(1, 4)) + list(
            rng.choice(vocab, size=int(rng.integers(2, 5)))
        )
        rng.shuffle(words)
        docs.append({"id": str(i), "body": " ".join(words)})
    return docs


@pytest.mark.parametrize(
    "term", ["common", "common alpha", "beta common gamma"]
)
def test_dense_rows_engine_parity(tmp_path, term):
    """Same corpus, same queries: engine with dense head-term rows enabled
    must score identically (f32 round-off) to the plain blocked scan.
    df_ratio is set huge so 'common' qualifies as heavy despite the small
    padded capacity (threshold max(cap // ratio, 8) = 8 docs)."""
    e_dense = _engine(
        tmp_path, "dense", bm25_dense_terms=16, bm25_dense_df_ratio=10**6
    )
    e_scan = _engine(tmp_path, "scan", bm25_dense_terms=0)
    try:
        docs = _dense_corpus()
        cid_d = _seed(e_dense, docs)
        cid_s = _seed(e_scan, docs)

        # prove the dense split actually engages in the dense engine
        reader = e_dense.read_side._reader(cid_d)
        rows, row_by_term = reader._device.dense_term_rows(
            reader._string[
                next(
                    fid
                    for fid, f in reader.fields.items()
                    if f.type.name == "STRING"
                )
            ].committed,
            reader.capacity,
            1.0,
        )
        assert rows is not None and len(row_by_term) >= 1

        p = SearchParams.from_json({"term": term, "limit": 32})
        r_d = e_dense.read_side.search(cid_d, p, READ)
        r_s = e_scan.read_side.search(cid_s, p, READ)
        assert [h.id for h in r_d.hits] == [h.id for h in r_s.hits]
        np.testing.assert_allclose(
            [h.score for h in r_d.hits],
            [h.score for h in r_s.hits],
            rtol=2e-5,
        )
        assert r_d.count == r_s.count
    finally:
        e_dense.close()
        e_scan.close()


def test_dense_rows_ops_parity():
    """Ops-level bit-parity: splitting a query's spans into heavy dense
    rows + light scan subspans reproduces the full scan's scores."""
    import jax.numpy as jnp

    from orama_core_tpu.ops.bm25 import (
        K1,
        B,
        build_dense_term_rows,
        dense_rows_contrib,
        pad_dense_sel,
        split_spans_dense,
    )

    rng = np.random.default_rng(3)
    n_docs, n_terms = 64, 12
    # term 0 is heavy (posting in every doc); others sparse
    post = []
    term_starts = [0]
    for t in range(n_terms):
        docs = (
            np.arange(n_docs)
            if t == 0
            else np.sort(
                rng.choice(n_docs, size=int(rng.integers(2, 7)), replace=False)
            )
        )
        for d in docs:
            post.append((d, float(rng.integers(1, 4))))
        term_starts.append(len(post))
    term_starts = np.asarray(term_starts, np.int64)
    post_docs = np.asarray([p[0] for p in post], np.int32)
    post_tf = np.asarray([p[1] for p in post], np.float32)
    doc_lens = rng.integers(4, 30, size=n_docs).astype(np.float32)
    avgdl = float(doc_lens.mean())
    df = np.diff(term_starts).astype(np.float64)

    built = build_dense_term_rows(
        term_starts, post_docs, post_tf, doc_lens,
        cap=n_docs, avgdl=avgdl, budget=4, df_ratio=2,
    )
    assert built is not None
    rows, row_by_term = built
    assert 0 in row_by_term

    spans = [(0, 2), (5, 8)]  # span 1 contains the heavy term

    def scan_scores(p_lo, p_len):
        out = np.zeros(n_docs, np.float64)
        for lo, ln in zip(p_lo, p_len):
            for j in range(lo, lo + ln):
                d, tf = int(post_docs[j]), float(post_tf[j])
                t = int(np.searchsorted(term_starts, j, side="right") - 1)
                ni = df[t]
                idf = np.log1p(max((n_docs - ni + 0.5) / (ni + 0.5), 0.0))
                den = tf + K1 * (1 - B + B * doc_lens[d] / avgdl)
                out[d] += idf * tf * (K1 + 1.0) / den
        return out

    full = scan_scores(
        [int(term_starts[lo]) for lo, hi in spans],
        [int(term_starts[hi] - term_starts[lo]) for lo, hi in spans],
    )
    p_lo, p_len, sel, w = split_spans_dense(
        spans, term_starts, row_by_term, df, float(n_docs)
    )
    assert sel, "heavy term not selected"
    sel_a, w_a = pad_dense_sel(sel, w)
    split = scan_scores(p_lo, p_len) + np.asarray(
        dense_rows_contrib(
            jnp.asarray(rows), jnp.asarray(sel_a), jnp.asarray(w_a),
            jnp.float32(1.0),
        )
    )
    np.testing.assert_allclose(split, full, rtol=2e-6, atol=1e-7)


def test_phrase_windowed_engine_parity(tmp_path):
    """Multi-token (phrase) queries through BOTH serving paths must score
    identically with the windowed phrase reduction and the cumsum
    fallback. Forces the fast-path gate so the windowed kernel runs (in
    interpret mode) on CPU."""
    import numpy as np

    rng = np.random.default_rng(11)
    vocab = ["cat", "dog", "mat", "sat", "ran", "bird", "tree", "sky"]
    docs = []
    for i in range(260):  # >1024 positions so the stream pads to >=2048
        words = list(rng.choice(vocab, size=int(rng.integers(4, 12))))
        if i % 3 == 0:
            words[1:3] = ["cat", "sat"]  # guaranteed adjacency
        docs.append({"id": str(i), "body": " ".join(words)})

    e_win = _engine(tmp_path, "win", phrase_windowed=True)
    e_ref = _engine(tmp_path, "ref", phrase_windowed=False)
    try:
        cid_w = _seed(e_win, docs)
        cid_r = _seed(e_ref, docs)
        rd_w = e_win.read_side._reader(cid_w)
        rd_r = e_ref.read_side._reader(cid_r)
        rd_w.cfg._test_force_fast_path = True
        rd_r.cfg._test_force_fast_path = True
        # prove the windowed cache actually engages
        sfid = next(
            fid for fid, f in rd_w.fields.items() if f.type.name == "STRING"
        )
        win = rd_w._device.phrase_windowed_arrays(
            rd_w._string[sfid].committed, rd_w.capacity
        )
        assert win[0] is not None, "windowed meta unavailable on this corpus"

        def compare(term):
            p = SearchParams.from_json({"term": term, "limit": 40})
            r_w = e_win.read_side.search(cid_w, p, READ)
            r_r = e_ref.read_side.search(cid_r, p, READ)
            assert [h.id for h in r_w.hits] == [h.id for h in r_r.hits], term
            np.testing.assert_allclose(
                [h.score for h in r_w.hits],
                [h.score for h in r_r.hits],
                rtol=2e-6,
            )

        for term in ("cat sat", "sat mat", "dog ran tree"):
            compare(term)  # fused single-dispatch path

        # a live uncommitted doc disqualifies the fused path — the same
        # queries now exercise the multi-dispatch committed scan (where
        # the windowed kernel also runs) + host window merge
        for e, cid in ((e_win, cid_w), (e_ref, cid_r)):
            e.write_side.write(
                cid, [{"id": "live", "body": "cat sat sky"}], WRITE
            )
            e.flush()
        for term in ("cat sat", "sat mat"):
            compare(term)
    finally:
        e_win.close()
        e_ref.close()


def test_multifield_live_window_fused_parity(tmp_path):
    """Title+body collections with a live freshness window — the
    reference's default multi-field shape (collection.rs:903-955) — must
    serve through the ONE-dispatch fused program (hybrid_fused_topk_mf)
    with scores identical to the multi-dispatch chain, across fulltext /
    hybrid / filtered modes, boosts, and phrase terms."""
    import jax
    import numpy as np

    from orama_core_tpu.ops import topk as topk_ops

    engine = _engine(tmp_path, "mf")
    try:
        rng = np.random.default_rng(3)
        vocab = ["solar", "wind", "panel", "turbine", "cake", "flour",
                 "quantum", "laser"]
        docs = []
        for i in range(80):
            docs.append({
                "id": str(i),
                "title": " ".join(rng.choice(vocab, size=3)),
                "body": " ".join(rng.choice(vocab, size=10)),
                "price": float(i % 10),
            })
        cid = _seed(engine, docs)
        # live window on both string fields + the vector field
        engine.write_side.write(cid, [
            # no "price": the number filter leg requires an empty number
            # window (eligibility keeps filters committed-only)
            {"id": "w1", "title": "solar wind", "body": "solar panel wind"},
            {"id": "w2", "title": "cake", "body": "flour cake quantum"},
        ], WRITE)
        engine.flush()

        reader = engine.read_side._reader(cid)
        ai = engine.read_side.ai
        for body in (
            {"term": "solar", "mode": "fulltext"},
            {"term": "solar wind", "mode": "fulltext"},     # phrase
            {"term": "cake", "mode": "fulltext",
             "boost": {"title": 3.0}},
            {"term": "solar panel", "mode": "hybrid"},
            {"term": "quantum", "mode": "hybrid",
             "where": {"price": {"lte": 5}}},
            {"term": "wind", "mode": "fulltext",
             "properties": ["title"]},
        ):
            p = SearchParams.from_json(dict(body, limit=64))
            helig = reader._hybrid_fused_eligible(p)
            assert helig is not None, body
            mode, sfids, vfid, nf, _facs, live = helig
            assert live, body
            if "properties" not in body and mode != "vector":
                assert len(sfids) == 2, body
            ranked_f, count_f, _ = reader._search_hybrid_fused(
                p, ai, *helig
            )
            scores = reader.search_scores(p, ai)
            vals, idx, count = jax.device_get(
                topk_ops.topk_with_count(scores, 64)
            )
            ranked = [
                (int(d), float(s)) for d, s in zip(idx, vals) if s > 0.0
            ]
            assert count_f == int(count), body
            assert [d for d, _ in ranked_f] == [d for d, _ in ranked], body
            np.testing.assert_allclose(
                [s for _, s in ranked_f], [s for _, s in ranked],
                rtol=2e-5, err_msg=str(body),
            )

        # end-to-end: the serving layer actually takes the fused path
        calls = []
        orig = reader._search_hybrid_fused

        def spy(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        reader._search_hybrid_fused = spy
        res = engine.read_side.search(
            cid, SearchParams.from_json({"term": "solar wind"}), READ
        )
        assert calls and res.count > 0
        assert any(h.id == "w1" for h in res.hits)  # window doc surfaced
    finally:
        engine.close()


def test_fused_filter_kinds_parity(tmp_path):
    """Bool, keyword (eq/in), and multi-predicate filters are fused-
    eligible (committed-only) and must score identically to the
    multi-dispatch mask chain."""
    import jax
    import numpy as np

    from orama_core_tpu.ops import topk as topk_ops

    engine = _engine(tmp_path, "filt")
    try:
        rng = np.random.default_rng(5)
        vocab = ["solar", "wind", "panel", "cake"]
        colors = ["red", "green", "blue"]
        docs = []
        for i in range(60):
            docs.append({
                "id": str(i),
                "body": " ".join(rng.choice(vocab, size=8)),
                "price": float(i % 10),
                "in_stock": bool(i % 3),
                "color": colors[i % 3],
            })
        cid = _seed(engine, docs)
        reader = engine.read_side._reader(cid)
        ai = engine.read_side.ai
        for where in (
            {"in_stock": True},
            {"in_stock": False},
            {"color": "red"},
            {"color": {"in": ["green", "blue"]}},
            {"color": "no-such-color"},
            {"price": {"between": [3, 7]}},
            {"price": {"lt": 8}, "in_stock": True, "color": "blue"},
        ):
            p = SearchParams.from_json(
                {"term": "solar", "where": where, "limit": 64}
            )
            helig = reader._hybrid_fused_eligible(p)
            assert helig is not None, where
            assert len(helig[3]) == len(where), where
            ranked_f, count_f, _ = reader._search_hybrid_fused(p, ai, *helig)
            scores = reader.search_scores(p, ai)
            vals, idx, count = jax.device_get(
                topk_ops.topk_with_count(scores, 64)
            )
            ranked = [
                (int(d), float(s)) for d, s in zip(idx, vals) if s > 0.0
            ]
            assert count_f == int(count), where
            assert [d for d, _ in ranked_f] == [d for d, _ in ranked], where
            np.testing.assert_allclose(
                [s for _, s in ranked_f], [s for _, s in ranked],
                rtol=2e-5, err_msg=str(where),
            )
        # a live uncommitted value on a filtered field falls back
        engine.write_side.write(
            cid, [{"id": "w", "body": "solar", "in_stock": True}], WRITE
        )
        engine.flush()
        p = SearchParams.from_json({"term": "solar", "where": {"in_stock": True}})
        assert reader._hybrid_fused_eligible(p) is None
        r = engine.read_side.search(cid, p, READ)  # multi-dispatch, correct
        assert r.count >= 1
    finally:
        engine.close()
