"""End-to-end engine tests — the counterpart of the reference's
`src/tests.rs` integration suite (19 tokio tests over build_orama with a
fake AI server): insert → search (fulltext/vector/hybrid), ranking order,
limit, filters, facets, commit + reload, deletes."""

import pytest

from orama_core_tpu.types import SearchParams

MASTER = "master"
READ = "read-key"
WRITE = "write-key"


def _create(engine, cid="c1", **kw):
    engine.write_side.create_collection(
        MASTER, cid, read_api_key=READ, write_api_key=WRITE, **kw
    )
    engine.flush()
    return cid


DOCS = [
    {"id": "1", "title": "The cat sat on the mat", "price": 10, "in_stock": True},
    {"id": "2", "title": "A dog chased the cat", "price": 25, "in_stock": False},
    {"id": "3", "title": "Quantum computing explained", "price": 50, "in_stock": True},
    {"id": "4", "title": "Dogs are loyal animals", "price": 5, "in_stock": True},
]


def _seed(engine, cid="c1"):
    engine.write_side.write(cid, DOCS, WRITE)
    engine.flush()


def test_simple_fulltext_search(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "cat"}), READ
    )
    assert res.count == 2
    ids = {h.id for h in res.hits}
    assert ids == {"1", "2"}
    assert res.hits[0].document["title"] in (DOCS[0]["title"], DOCS[1]["title"])


def test_ranking_tf(tmp_engine):
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": "a", "body": "apple"},
            {"id": "b", "body": "apple apple apple"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "apple"}), READ
    )
    assert [h.id for h in res.hits] == ["b", "a"]  # higher tf first


def test_limit(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "cat dog", "limit": 1}), READ
    )
    assert len(res.hits) == 1
    assert res.count >= 2


def test_number_filters(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    for where, expected in [
        ({"price": {"gt": 20}}, {"2", "3"}),
        ({"price": {"lte": 10}}, {"1", "4"}),
        ({"price": {"eq": 50}}, {"3"}),
        ({"price": {"between": [5, 25]}}, {"1", "2", "4"}),
    ]:
        res = tmp_engine.read_side.search(
            cid, SearchParams.from_json({"term": "", "mode": "vector", "where": where}), READ
        )
        # vector search with empty term yields nothing; use fulltext over all
        res = tmp_engine.read_side.search(
            cid,
            SearchParams.from_json(
                {"term": "cat dog quantum animals computing", "where": where}
            ),
            READ,
        )
        assert {h.id for h in res.hits} == expected, where


def test_bool_filter(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    res = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json(
            {"term": "cat dog quantum animals computing", "where": {"in_stock": True}}
        ),
        READ,
    )
    assert {h.id for h in res.hits} == {"1", "3", "4"}


def test_facets(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    res = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json(
            {
                "term": "cat dog quantum animals computing",
                "facets": {
                    "price": {"ranges": [{"from": 0, "to": 20}, {"from": 20, "to": 100}]},
                    "in_stock": {"true": True, "false": True},
                },
            }
        ),
        READ,
    )
    assert res.facets is not None
    assert res.facets["price"].values == {"0-20": 2, "20-100": 2}
    assert res.facets["in_stock"].values == {"true": 3, "false": 1}


def test_vector_search_finds_similar(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "cat mat", "mode": "vector", "limit": 2}), READ
    )
    assert res.count >= 1
    assert res.hits[0].id == "1"  # doc 1 shares tokens "cat" and "mat"


def test_hybrid_search(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "loyal dog", "mode": "hybrid"}), READ
    )
    # RRF can tie docs with mirrored (1st,2nd)/(2nd,1st) ranks — require the
    # right top-2 set; magnitude-sensitive minmax below pins the winner.
    assert {h.id for h in res.hits[:2]} == {"2", "4"}
    res_minmax = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json({"term": "loyal dog", "mode": "hybrid", "fusion": "minmax"}),
        READ,
    )
    assert res_minmax.hits[0].id == "4"


def test_field_boost(tmp_engine):
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": "t", "title": "jax rocks", "body": "something else entirely"},
            {"id": "b", "title": "unrelated words", "body": "jax rocks jax rocks"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "jax", "boost": {"title": 10.0}}), READ
    )
    assert res.hits[0].id == "t"


def test_properties_restrict_search(tmp_engine):
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": "t", "title": "needle here", "body": "hay"},
            {"id": "b", "title": "hay", "body": "needle here too"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json({"term": "needle", "properties": ["title"]}),
        READ,
    )
    assert {h.id for h in res.hits} == {"t"}


def test_delete_documents(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    n = tmp_engine.write_side.delete_documents(cid, ["1"], WRITE)
    assert n == 1
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "cat"}), READ
    )
    assert {h.id for h in res.hits} == {"2"}
    assert tmp_engine.read_side.count_documents(cid) == 3


def test_upsert_same_id(tmp_engine):
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(cid, [{"id": "x", "body": "old content"}], WRITE)
    tmp_engine.flush()
    tmp_engine.write_side.write(cid, [{"id": "x", "body": "new content"}], WRITE)
    tmp_engine.flush()
    res = tmp_engine.read_side.search(cid, SearchParams.from_json({"term": "old"}), READ)
    assert res.count == 0
    res = tmp_engine.read_side.search(cid, SearchParams.from_json({"term": "new"}), READ)
    assert [h.id for h in res.hits] == ["x"]
    assert tmp_engine.read_side.count_documents(cid) == 1


def test_commit_then_search_same_scores(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    params = SearchParams.from_json({"term": "cat"})
    before = tmp_engine.read_side.search(cid, params, READ)
    tmp_engine.commit()
    after = tmp_engine.read_side.search(cid, params, READ)
    assert [h.id for h in before.hits] == [h.id for h in after.hits]
    for hb, ha in zip(before.hits, after.hits):
        assert abs(hb.score - ha.score) < 1e-4


def test_search_mixes_committed_and_uncommitted(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    tmp_engine.commit()
    tmp_engine.write_side.write(
        cid, [{"id": "5", "title": "another cat appears", "price": 7}], WRITE
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(cid, SearchParams.from_json({"term": "cat"}), READ)
    assert {h.id for h in res.hits} == {"1", "2", "5"}
    # filters across segments: price <= 10 matches committed doc 1 + fresh doc 5
    res = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json({"term": "cat", "where": {"price": {"lte": 10}}}),
        READ,
    )
    assert {h.id for h in res.hits} == {"1", "5"}


def test_commit_and_reload(tmp_path):
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "writer")
    cfg.reader_side.data_dir = str(tmp_path / "reader")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600

    engine = build_orama(cfg, start_background=False)
    engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    engine.flush()
    engine.write_side.write("c1", DOCS, WRITE)
    engine.flush()
    params = SearchParams.from_json({"term": "cat", "mode": "hybrid"})
    before = engine.read_side.search("c1", params, READ)
    engine.commit()
    engine.close()

    engine2 = build_orama(cfg, start_background=False)
    after = engine2.read_side.search("c1", params, READ)
    assert [h.id for h in after.hits] == [h.id for h in before.hits]
    for hb, ha in zip(before.hits, after.hits):
        assert abs(hb.score - ha.score) < 1e-4
    # writer state restored too: upsert keeps working
    assert engine2.write_side.collections["c1"].document_count == 4
    engine2.close()


def test_api_key_checks(tmp_engine):
    cid = _create(tmp_engine)
    _seed(tmp_engine)
    from orama_core_tpu.types import ApiKeyError

    with pytest.raises(ApiKeyError):
        tmp_engine.read_side.search(cid, SearchParams.from_json({"term": "x"}), "wrong")
    with pytest.raises(ApiKeyError):
        tmp_engine.write_side.write(cid, [{"id": "z"}], "wrong")
    with pytest.raises(ApiKeyError):
        tmp_engine.write_side.create_collection("wrong", "c2", "r", "w")


def test_generated_ids(tmp_engine):
    cid = _create(tmp_engine)
    ids = tmp_engine.write_side.write(cid, [{"body": "no id here"}], WRITE)
    assert len(ids) == 1 and ids[0]
    tmp_engine.flush()
    res = tmp_engine.read_side.search(cid, SearchParams.from_json({"term": "body"}), READ)
    assert res.hits == [] or res.hits[0].id == ids[0]


def test_phrase_multiterm_ranking(tmp_engine):
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": "seq", "body": "machine learning is great"},
            {"id": "sep", "body": "machine tools and deep learning"},
            {"id": "one", "body": "machine parts catalog"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    tmp_engine.commit()  # phrase boost applies to the committed segment
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "machine learning"}), READ
    )
    ids = [h.id for h in res.hits]
    # both-term docs outrank the single-term doc; adjacency wins overall
    assert ids[0] == "seq"
    assert set(ids[:2]) == {"seq", "sep"}


def test_raw_vector_query(tmp_engine):
    """{"mode": "vector", "vector": [...]} scores with the client's own
    embedding — the reference's acknowledged TODO (dto.rs:196-201).
    Covers the uncommitted window, the committed segment, and errors."""
    import numpy as np
    import pytest as _pytest

    cid = _create(tmp_engine)
    _seed(tmp_engine)
    ai = tmp_engine.read_side.ai
    model = tmp_engine.read_side._reader(cid).fields[
        next(
            fid
            for fid, f in tmp_engine.read_side._reader(cid).fields.items()
            if f.model
        )
    ].model
    # query with doc 3's own passage embedding — it must win
    target = ai.embed_passage(model, ["Quantum computing explained"])[0]
    body = {"mode": "vector", "vector": [float(x) for x in target]}
    res = tmp_engine.read_side.search(cid, SearchParams.from_json(body), READ)
    assert res.hits and res.hits[0].id == "3"
    # committed segment behaves the same
    tmp_engine.commit()
    res2 = tmp_engine.read_side.search(cid, SearchParams.from_json(body), READ)
    assert res2.hits and res2.hits[0].id == "3"
    # dimension mismatch is a clear error
    with _pytest.raises(ValueError, match="dimension"):
        tmp_engine.read_side.search(
            cid,
            SearchParams.from_json({"mode": "vector", "vector": [1.0, 2.0]}),
            READ,
        )
    # vector only makes sense in vector mode
    with _pytest.raises(ValueError, match="vector"):
        SearchParams.from_json({"term": "x", "vector": [1.0]})
    with _pytest.raises(ValueError, match="number list"):
        SearchParams.from_json({"mode": "vector", "vector": ["a"]})


def test_selective_filter_vector_path_matches_dense(tmp_engine):
    """SURVEY §7 "filter selectivity": with a selective filter the vector
    path gathers only the surviving docs' rows. Results must be IDENTICAL
    to the dense matmul-then-mask path across modes, segments, bool
    combinations, and deletes."""
    import numpy as np

    cid = _create(tmp_engine)
    _seed(tmp_engine)
    reader = tmp_engine.read_side._reader(cid)

    def run_all(selective_max):
        reader.cfg.selective_filter_max = selective_max
        out = []
        for body in (
            {"term": "cat", "mode": "vector", "where": {"price": {"lte": 25}}},
            {"term": "dog", "mode": "hybrid", "where": {"price": {"gt": 4}}},
            {"term": "dog", "mode": "hybrid",
             "where": {"price": {"between": [5, 25]}, "in_stock": True}},
            {"term": "quantum", "mode": "vector",
             "where": {"in_stock": True}},          # bool-only -> dense
        ):
            r = tmp_engine.read_side.search(
                cid, SearchParams.from_json(dict(body)), READ
            )
            out.append([(h.id, round(h.score, 5)) for h in r.hits])
        return out

    # uncommitted window
    dense = run_all(0)
    sel = run_all(10_000)
    assert dense == sel, (dense, sel)
    # sanity: the selective path actually engages for the number filters
    cand = reader._filter_candidates(
        SearchParams.from_json(
            {"term": "x", "where": {"price": {"lte": 25}}}
        ).where
    )
    assert cand is not None and set(cand.tolist()) == {0, 1, 3}
    # committed segment + a delete
    tmp_engine.commit()
    tmp_engine.write_side.delete_documents(cid, ["1"], WRITE)
    tmp_engine.flush()
    dense = run_all(0)
    sel = run_all(10_000)
    assert dense == sel, (dense, sel)


def test_hybrid_fused_single_dispatch_parity(tmp_path):
    """The one-dispatch fused hybrid program (ops/hybrid.py) must be
    bit-identical to the multi-dispatch path it replaces — same kernels,
    one trace (VERDICT r2 item 2). Covers rrf/minmax, phrase, and the
    fused number filter (range + eq)."""
    import jax

    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.ops import topk as topk_ops
    from orama_core_tpu.types import SearchParams

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.tpu.query_batching = False
    e = build_orama(cfg, start_background=False)
    try:
        e.write_side.create_collection("master", "c", "rk", "wk")
        docs = [
            {"id": str(i), "body": t, "price": i}
            for i, t in enumerate([
                "solar panels convert sunlight into power",
                "wind turbines spin in the breeze",
                "bake a chocolate cake for dessert",
                "quantum computing with qubits",
                "solar and wind renewable energy mix",
                "the power grid balances supply",
            ])
        ]
        e.write_side.write("c", docs, "wk")
        e.flush()
        e.commit()
        reader = e.read_side._reader("c")
        ai = e.read_side.ai
        for body in (
            {"term": "solar power", "mode": "hybrid"},          # phrase
            {"term": "solar", "mode": "hybrid"},
            {"term": "wind", "mode": "hybrid", "fusion": "minmax"},
            {"term": "solar energy", "mode": "hybrid",
             "where": {"price": {"gte": 2}}},
            {"term": "power", "mode": "hybrid",
             "where": {"price": {"eq": 0}}},
            # fulltext + filtered-vector ride the same one-dispatch program
            {"term": "solar", "mode": "fulltext"},
            {"term": "solar wind", "mode": "fulltext"},         # phrase
            {"term": "solar", "mode": "fulltext",
             "where": {"price": {"gte": 2}}},
            {"term": "solar energy", "mode": "vector",
             "where": {"price": {"lte": 3}}},
        ):
            p = SearchParams.from_json(dict(body))
            helig = reader._hybrid_fused_eligible(p)
            assert helig is not None, body
            ranked_f, count_f, _ = reader._search_hybrid_fused(p, ai, *helig)
            scores = reader.search_scores(p, ai)
            vals, idx, count = jax.device_get(
                topk_ops.topk_with_count(scores, min(p.limit, reader.capacity))
            )
            ranked = [
                (int(d), float(s)) for d, s in zip(idx, vals) if s > 0.0
            ]
            assert count_f == int(count), body
            assert [d for d, _ in ranked_f] == [d for d, _ in ranked], body
            for (_, s1), (_, s2) in zip(ranked_f, ranked):
                assert abs(s1 - s2) < 1e-6, body
        # committed-only facets are fused-eligible since r4 (counted
        # in-trace); deep parity lives in tests/test_fused_facets.py
        p = SearchParams.from_json(
            {"term": "solar", "mode": "hybrid",
             "facets": {"price": {"ranges": [{"from": 0, "to": 9}]}}}
        )
        helig = reader._hybrid_fused_eligible(p)
        assert helig is not None and len(helig[4]) == 1
        e.write_side.write("c", [{"id": "9", "body": "fresh solar", "price": 9}], "wk")
        e.flush()
        p = SearchParams.from_json({"term": "solar", "mode": "hybrid"})
        # live windows are fused-served since r4: host-merged scatter pairs
        # ride the one-dispatch program (parity vs the multi-dispatch chain)
        helig = reader._hybrid_fused_eligible(p)
        assert helig is not None and helig[5] is True
        ranked_f, count_f, _ = reader._search_hybrid_fused(p, ai, *helig)
        scores = reader.search_scores(p, ai)
        vals, idx, count = jax.device_get(
            topk_ops.topk_with_count(scores, min(p.limit, reader.capacity))
        )
        ranked = [(int(d), float(s)) for d, s in zip(idx, vals) if s > 0.0]
        assert count_f == int(count)
        assert [d for d, _ in ranked_f] == [d for d, _ in ranked]
        for (_, s1), (_, s2) in zip(ranked_f, ranked):
            assert abs(s1 - s2) < 1e-5
        r = e.read_side.search("c", p, "rk")
        assert r.count >= 1
    finally:
        e.close()


def test_stem_matches_never_drive_phrase_boost(tmp_engine):
    """query_expansion contract: stems add BM25 recall but never phrase
    adjacency. A multi-token query whose surface tokens match nothing
    (pure stem recall) must score as plain additive BM25 — equal to the
    sum of its single-token queries — with NO positional boost from the
    stem-matched positions (which are adjacent in the document)."""
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": "1", "body": "jumping running"},
            {"id": "2", "body": "unrelated filler text"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    # commit so the committed (device) phrase path serves the query
    tmp_engine.commit()

    def score(term):
        res = tmp_engine.read_side.search(
            cid, SearchParams.from_json({"term": term, "mode": "fulltext"}),
            READ,
        )
        return {h.id: h.score for h in res.hits}

    # surface tokens "jumps"/"runs" are NOT prefixes of "jumping"/"running";
    # only the stem expansion (jump/run) matches — recall works...
    multi = score("jumps runs")
    assert "1" in multi and "2" not in multi
    # ...but the phrase boost must be neutral: exactly additive BM25
    a, b = score("jumps"), score("runs")
    assert multi["1"] == pytest.approx(a["1"] + b["1"], rel=1e-5)


def test_deleted_tombstones_age_out_at_commit(tmp_engine):
    """Deletions fold into the committed generation at commit; keeping the
    tombstone set cumulative made EVERY later commit re-merge and rewrite
    every field forever, and 65+ lifetime deletes permanently disabled the
    vector fast path (eligibility checks len(deleted))."""
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [{"id": str(i), "body": f"word{i} common"} for i in range(8)],
        WRITE,
    )
    tmp_engine.flush()
    tmp_engine.write_side.delete_documents(cid, ["3"], WRITE)
    tmp_engine.flush()
    reader = tmp_engine.read_side.collections[cid]
    assert reader.deleted, "tombstone present before commit"
    tmp_engine.commit()
    assert reader.deleted == set(), "tombstones must fold at commit"
    # deleted doc stays gone (fold is in the committed arrays)
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "word3"}), READ
    )
    assert res.count == 0
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "common"}), READ
    )
    assert res.count == 7
    # a no-op commit must not rebuild the committed generations
    fid = next(iter(reader._string))
    before = reader._string[fid].committed
    tmp_engine.commit()
    assert reader._string[fid].committed is before, (
        "empty commit rewrote a committed generation"
    )


def test_hits_carry_user_ids_without_documents(tmp_engine):
    """with_documents=False must still return USER ids (from the storage's
    in-memory uid map), not dense internal ids."""
    from orama_core_tpu.types import SearchParams

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write("c", [{"id": "doc-abc", "t": "running dogs"}], "wk")
    e.flush()
    r = e.read_side.search(
        "c", SearchParams.from_json({"term": "running"}), "rk",
        with_documents=False,
    )
    assert [h.id for h in r.hits] == ["doc-abc"]
    assert r.hits[0].document is None
    e.commit()
    # committed + reloaded uid map still resolves
    r = e.read_side.search(
        "c", SearchParams.from_json({"term": "running"}), "rk",
        with_documents=False,
    )
    assert [h.id for h in r.hits] == ["doc-abc"]


def test_offset_paginates_all_modes(tmp_engine):
    """offset skips ranked hits globally: page k of limit L equals the
    [k*L, (k+1)*L) slice of the full ranking — the parameter the
    reference's docs promise but its dto never implemented
    (search-documents.mdx:42 vs dto.rs:249)."""
    from orama_core_tpu.types import SearchParams

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write(
        "c",
        [{"id": f"d{i:02d}", "t": "common " + ("hot " * (20 - i))} for i in range(20)],
        "wk",
    )
    e.flush()
    for mode in ("fulltext", "hybrid"):
        full = e.read_side.search(
            "c", SearchParams.from_json({"term": "common hot", "mode": mode, "limit": 20}),
            "rk", with_documents=False,
        )
        for off in (0, 3, 7, 18, 25):
            page = e.read_side.search(
                "c",
                SearchParams.from_json(
                    {"term": "common hot", "mode": mode, "limit": 5, "offset": off}
                ),
                "rk", with_documents=False,
            )
            assert [h.id for h in page.hits] == [h.id for h in full.hits][off : off + 5], (mode, off)
            assert page.count == full.count
    # committed path too
    e.commit()
    full = e.read_side.search(
        "c", SearchParams.from_json({"term": "common hot", "limit": 20}),
        "rk", with_documents=False,
    )
    page = e.read_side.search(
        "c", SearchParams.from_json({"term": "common hot", "limit": 5, "offset": 10}),
        "rk", with_documents=False,
    )
    assert [h.id for h in page.hits] == [h.id for h in full.hits][10:15]
    import pytest

    with pytest.raises(ValueError):
        SearchParams.from_json({"term": "x", "offset": -1})


def test_open_ended_facet_ranges(tmp_engine):
    """{"from": 1000} (no "to") per the reference's docs: open-ended
    ranges count everything past the bound; missing "from" means -inf.
    Previously raised KeyError (HTTP 500)."""
    from orama_core_tpu.types import SearchParams

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write(
        "c", [{"id": str(i), "t": "item", "price": float(i * 100)} for i in range(12)],
        "wk",
    )
    e.flush()
    r = e.read_side.search(
        "c",
        SearchParams.from_json({
            "term": "item",
            "facets": {"price": {"ranges": [
                {"from": 0, "to": 500}, {"from": 1000}, {"to": 200},
            ]}},
        }),
        "rk", with_documents=False,
    )
    vals = r.facets["price"].values
    assert vals["0-500"] == 6          # 0..500 inclusive
    assert vals["1000-inf"] == 2       # 1000, 1100
    assert vals["-inf-200"] == 3       # 0, 100, 200


def test_list_valued_embedding_sources_join_not_repr(tmp_path):
    """A list-valued source field must contribute its joined values to
    the embedding text, not the Python list repr (review finding)."""
    from orama_core_tpu.engine.collection_write import CollectionWriter

    w = CollectionWriter(
        "c", None, "rk", "wk",
        embedding_model="fake-small", embedding_sources=("tags", "title"),
    )
    w.assign_doc_id("1")
    ops, emb_reqs = w.process_document(
        0, {"id": "1", "title": "solar", "tags": ["red", "blue"]}
    )
    assert emb_reqs, "expected an embedding request"
    text = emb_reqs[0].text
    assert "[" not in text and "'" not in text, text
    assert "red" in text and "blue" in text and "solar" in text
