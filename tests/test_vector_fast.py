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
    # multi-vector docs -> dense
    assert make_reader(multi_vec=True)._vector_fast_field(p) is None
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
