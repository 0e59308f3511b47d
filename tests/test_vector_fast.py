"""The fused top-k kNN kernel serving pure vector queries directly
(collection_read._search_vector_topk_fast) must be result-identical to
the dense score path, including the match count, for single and batched
queries; ineligible shapes (filters, multi-vector docs, uncommitted
windows) must fall back."""

import numpy as np
import jax.numpy as jnp
import pytest

from orama_core_tpu.config import TpuConfig
from orama_core_tpu.engine.collection_read import CollectionReader
from orama_core_tpu.index import CommittedVectorIndex, UncommittedVectorIndex
from orama_core_tpu.models.ai_service import AIService
from orama_core_tpu.oplog import CreateFieldOp
from orama_core_tpu.types import SearchParams, TypedField, ValueType

N, D = 8192, 128  # fake-small model dim


def make_reader(multi_vec=False):
    rng = np.random.default_rng(5)
    n = N
    vecs = rng.standard_normal((n, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vec_docs = np.arange(n, dtype=np.int32)
    if multi_vec:
        vec_docs[1] = 0  # doc 0 owns two vectors
    reader = CollectionReader("vfast", "rk", None, TpuConfig())
    reader._apply_locked(
        CreateFieldOp(
            "vfast",
            TypedField(0, "embedding", ValueType.EMBEDDING, model="fake-small"),
        )
    )
    reader.max_doc_id = n - 1
    reader._alive = np.ones(reader.capacity, dtype=np.float32)
    reader._alive[n:] = 0.0
    reader.doc_count = n
    reader._vector[0].committed = CommittedVectorIndex(
        dimension=D, vecs=vecs, vec_docs=vec_docs
    )
    reader._vector[0].uncommitted = UncommittedVectorIndex(D)
    # the fused path requires the TPU backend in production (interpret
    # mode on CPU is far slower than dense); tests opt in explicitly
    reader.cfg._test_force_fast_path = True
    return reader


def run(reader, body):
    return reader.search(SearchParams.from_json(dict(body)), AIService())


def test_fast_path_matches_dense_single_and_batched():
    reader = make_reader()
    ai = AIService()
    bodies = [
        {"term": "solar energy", "mode": "vector", "limit": 7},
        {"term": "quantum", "mode": "vector"},
    ]
    fast, dense = [], []
    fast_b = reader.search_batch(
        [SearchParams.from_json(dict(b)) for b in bodies], ai
    )
    for b in bodies:
        assert reader._vector_fast_field(
            SearchParams.from_json(dict(b))
        ) == 0
        ranked, count, _ = run(reader, b)
        fast.append((ranked, count))
    reader.cfg.use_pallas = False  # force the dense path
    for b in bodies:
        assert reader._vector_fast_field(SearchParams.from_json(dict(b))) is None
        ranked, count, _ = run(reader, b)
        dense.append((ranked, count))
    for (rf, cf), (rd, cd) in zip(fast, dense):
        assert cf == cd
        assert [d for d, _ in rf] == [d for d, _ in rd]
        for (_, sf), (_, sd) in zip(rf, rd):
            assert abs(sf - sd) < 1e-4
    for (rf, cf), (rd, cd) in zip(fast_b, dense):
        assert cf == cd
        assert [d for d, _ in rf] == [d for d, _ in rd]


def test_fast_path_with_freshness_window_matches_dense():
    """A live uncommitted window host-merges over the kernel's committed
    top-k — results and counts must equal the dense path's."""
    ai = AIService()
    r = make_reader()
    # window docs beyond the committed id range (insert-only, no deletes)
    qvec = ai.embed_query("fake-small", ["fresh stuff"])[0]
    qn = qvec / np.linalg.norm(qvec)
    r._vector[0].uncommitted.insert(N + 1, [qn])        # exact match: wins
    r._vector[0].uncommitted.insert(N + 2, [-qn])       # negative: no match
    r.max_doc_id = N + 2                                # window extends capacity
    r._alive = np.ones(r.capacity, dtype=np.float32)
    p = SearchParams.from_json({"term": "fresh stuff", "mode": "vector"})
    assert r._vector_fast_field(p) == 0
    fast_ranked, fast_count, _ = r.search(p, ai)
    r.cfg.use_pallas = False
    dense_ranked, dense_count, _ = r.search(p, ai)
    assert fast_count == dense_count
    assert [d for d, _ in fast_ranked] == [d for d, _ in dense_ranked]
    assert fast_ranked[0][0] == N + 1  # the fresh exact match ranks first
    for (_, sf), (_, sd) in zip(fast_ranked, dense_ranked):
        assert abs(sf - sd) < 1e-4


def test_fast_path_with_tombstones_matches_dense():
    """A small delete window is corrected host-side: deleted docs drop
    from the kernel's top-k and from the match count, exactly."""
    ai = AIService()
    r = make_reader()
    p = SearchParams.from_json({"term": "some query", "mode": "vector", "limit": 6})
    # find the dense top docs, then delete the top two
    ranked0, _, _ = r.search(p, ai)
    victims = {ranked0[0][0], ranked0[1][0]}
    from orama_core_tpu.oplog import DeleteDocumentsOp
    r.apply(DeleteDocumentsOp("vfast", tuple(victims)))
    assert r._vector_fast_field(p) == 0  # still eligible (small tombstone set)
    fast_ranked, fast_count, _ = r.search(p, ai)
    r.cfg.use_pallas = False
    dense_ranked, dense_count, _ = r.search(p, ai)
    assert fast_count == dense_count
    assert [d for d, _ in fast_ranked] == [d for d, _ in dense_ranked]
    assert not victims & {d for d, _ in fast_ranked}
    assert len(fast_ranked) == 6  # over-fetch kept the limit filled


def test_fast_path_ineligibility():
    ai = AIService()
    p = SearchParams.from_json({"term": "x", "mode": "vector"})
    # multi-vector docs now ride the segment-aware kernel (round 3) —
    # eligible when rows are doc-ascending and the index is exact
    assert make_reader(multi_vec=True)._vector_fast_field(p) is not None
    # ...but NOT in int8 mode (no multivec int8 kernel)
    r_mv = make_reader(multi_vec=True)
    r_mv.cfg.vector_index = "int8"
    assert r_mv._vector_fast_field(p) is None
    # ...and not for non-ascending row layouts
    r_shuf = make_reader(multi_vec=True)
    c = r_shuf._vector[0].committed
    c.vec_docs = c.vec_docs[::-1].copy()
    assert r_shuf._vector_fast_field(p) is None
    # filters / facets / fulltext -> dense
    r2 = make_reader()
    assert r2._vector_fast_field(
        SearchParams.from_json(
            {"term": "x", "mode": "vector", "where": {"f": True}}
        )
    ) is None
    assert r2._vector_fast_field(SearchParams.from_json({"term": "x"})) is None
    # non-exact vector index -> dense
    r2.cfg.vector_index = "ivf"
    assert r2._vector_fast_field(p) is None


def test_review_regressions():
    """Round-2 review findings: raw-vector queries must not batch, bool
    lists are rejected as vectors, deep limits fall back to dense."""
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.engine.read_side import ReadSide

    cfg = OramaxConfig()
    cfg.tpu.query_batching = True
    rs = ReadSide.__new__(ReadSide)
    rs._batcher = object()
    rs.tpu_cfg = cfg.tpu

    def mk(body):
        return SearchParams.from_json(body)

    assert rs._batchable(mk({"term": "x", "mode": "vector"}))
    assert not rs._batchable(
        mk({"term": "x", "mode": "vector", "vector": [1.0] * 4})
    )
    # non-exact vector index must not batch vector/hybrid queries
    cfg.tpu.vector_index = "int8"
    assert not rs._batchable(mk({"term": "x", "mode": "vector"}))
    assert rs._batchable(mk({"term": "x", "mode": "fulltext"}))
    cfg.tpu.vector_index = "exact"

    with pytest.raises(ValueError, match="number list"):
        SearchParams.from_json({"mode": "vector", "vector": [True, False]})

    # deep pagination is ineligible for the fused path
    r = make_reader()
    assert r._vector_fast_field(
        SearchParams.from_json({"term": "x", "mode": "vector", "limit": 500})
    ) is None


def test_fast_path_int8_mode_matches_dense():
    """vector_index='int8' (capacity mode) also serves from the fused
    kernel; results must match the int8 dense scorer."""
    ai = AIService()
    r = make_reader()
    r.cfg.vector_index = "int8"
    p = SearchParams.from_json({"term": "capacity mode", "mode": "vector"})
    assert r._vector_fast_field(p) == 0
    fast_ranked, fast_count, _ = r.search(p, ai)
    r.cfg.use_pallas = False
    dense_ranked, dense_count, _ = r.search(p, ai)
    assert fast_count == dense_count
    assert [d for d, _ in fast_ranked] == [d for d, _ in dense_ranked]
    for (_, sf), (_, sd) in zip(fast_ranked, dense_ranked):
        assert abs(sf - sd) < 1e-4


def _make_chunked_reader(force_fast, n_docs=6000, seed=0):
    """Planted-relevance corpus (cf. sharded_int8_bench) with 1-3 chunk
    rows per doc, committed via ops so the layout is doc-ascending."""
    import tempfile

    from orama_core_tpu.oplog import IndexEmbeddingOp, InsertDocumentOp

    rng = np.random.default_rng(seed)
    modes = rng.standard_normal((256, D)).astype(np.float32)
    modes /= np.linalg.norm(modes, axis=1, keepdims=True)
    centers = modes[rng.integers(0, 256, n_docs)] + (
        0.25 / np.sqrt(D)
    ) * rng.standard_normal((n_docs, D)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cfg = TpuConfig()
    if force_fast:
        cfg._test_force_fast_path = True
    r = CollectionReader("mv", "rk", None, cfg)
    r.apply(CreateFieldOp(
        "mv", TypedField(0, "emb", ValueType.EMBEDDING, model="fake-small")
    ))
    for i in range(n_docs):
        r.apply(InsertDocumentOp("mv", i, {"id": str(i)}))
        nch = 1 + (i % 3)
        chunks = centers[i] + (0.12 / np.sqrt(D)) * rng.standard_normal(
            (nch, D)
        ).astype(np.float32)
        chunks /= np.linalg.norm(chunks, axis=1, keepdims=True)
        r.apply(IndexEmbeddingOp(
            "mv", i, 0, tuple(tuple(float(x) for x in c) for c in chunks)
        ))
    r.commit(tempfile.mkdtemp(), 1)
    return r, centers, rng


def test_multivec_fast_path_matches_dense():
    """VERDICT r2 item 5: chunked (multi-vector) docs keep the fused fast
    path — the segment-aware kernel aggregates by doc (sum of relu cos)
    with EXACT doc-level match counts, and agrees with the dense path on
    planted-relevance data."""
    fast, centers, rng = _make_chunked_reader(True)
    dense, _, _ = _make_chunked_reader(False)
    n_docs = len(centers)
    qs = centers[rng.integers(0, n_docs, 8)] + (
        0.05 / np.sqrt(D)
    ) * rng.standard_normal((8, D)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    agree = 0.0
    for i in range(8):
        p = SearchParams.from_json({
            "mode": "vector", "vector": [float(x) for x in qs[i]],
            "limit": 10,
        })
        assert fast._vector_fast_field(p) is not None, "must engage"
        rf, cf, _ = fast.search(p, None)
        rd, cd, _ = dense.search(p, None)
        assert rf[0][0] == rd[0][0]
        agree += len({d for d, _ in rf} & {d for d, _ in rd}) / 10
        for (df_, sf_), (dd_, sd_) in zip(rf, rd):
            if df_ == dd_:
                assert abs(sf_ - sd_) < 1e-3
        # exact doc-level count (small slack for float-sign flips at ~0)
        assert abs(cf - cd) <= max(3, int(0.002 * max(cd, 1))), (cf, cd)
    assert agree / 8 >= 0.95, agree / 8


def test_multivec_fast_path_with_tombstones():
    from orama_core_tpu.oplog import DeleteDocumentsOp

    fast, centers, rng = _make_chunked_reader(True, seed=1)
    dense, _, _ = _make_chunked_reader(False, seed=1)
    for r in (fast, dense):
        r.apply(DeleteDocumentsOp("mv", (7, 8, 9)))
    q = centers[7] / np.linalg.norm(centers[7])
    p = SearchParams.from_json({
        "mode": "vector", "vector": [float(x) for x in q], "limit": 10
    })
    rf, cf, _ = fast.search(p, None)
    rd, cd, _ = dense.search(p, None)
    got = [d for d, _ in rf]
    assert 7 not in got and 8 not in got and 9 not in got
    assert rf[0][0] == rd[0][0]
    assert abs(cf - cd) <= max(3, int(0.002 * max(cd, 1))), (cf, cd)


def test_fast_path_dedups_reinserted_doc():
    """Delete-then-reinsert reuses the doc id (write-side upsert): the
    committed kernel results and the freshness window then both contain
    the id, and the merge must sum per doc — the dense path's
    scatter-add semantics — not emit duplicate hits (review finding)."""
    import jax

    from orama_core_tpu.oplog import (
        DeleteDocumentsOp,
        IndexEmbeddingOp,
        InsertDocumentOp,
    )

    reader = make_reader()
    ai = AIService()
    q = "solar energy"
    p = SearchParams.from_json({"term": q, "mode": "vector", "limit": 10})
    fid = reader._vector_fast_field(p)
    assert fid is not None
    base_ranked, _ = reader._search_vector_topk_fast(p, ai, fid)
    target = base_ranked[0][0]  # a doc the committed kernel ranks first
    # delete + re-insert it with a fresh window vector for the SAME id
    reader._apply_locked(DeleteDocumentsOp("vfast", (target,)))
    reader._apply_locked(InsertDocumentOp("vfast", target, {"id": str(target)}))
    new_vec = np.asarray(ai.embed_query("fake-small", [q]))[0]
    new_vec = (new_vec / np.linalg.norm(new_vec)).tolist()
    reader._apply_locked(
        IndexEmbeddingOp("vfast", target, 0, (tuple(new_vec),))
    )
    fid = reader._vector_fast_field(p)
    assert fid is not None, "window/delete should stay fast-path eligible"
    ranked, count = reader._search_vector_topk_fast(p, ai, fid)
    ids = [d for d, _ in ranked]
    assert len(ids) == len(set(ids)), f"duplicate hits: {ids}"
    assert target in ids
    # parity with the dense path's distinct-match count
    scores = reader.search_scores(p, ai)
    dense_count = int(jax.device_get(jnp.sum(scores > 0)))
    assert count == dense_count, (count, dense_count)
