"""Engine-level mesh sharding: the same collection/search code runs SPMD
when tpu.mesh_shape is configured (virtual 8-device CPU mesh)."""

import numpy as np
import pytest
import jax

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"

DOCS = [
    {
        "id": str(i),
        "body": body,
        "price": i * 10,
        "tag": "green" if "solar" in body or "wind" in body else "other",
        "active": i % 2 == 0,
    }
    for i, body in enumerate(
        [
            "solar panels convert sunlight",
            "wind turbines spin in the breeze",
            "bake a chocolate cake",
            "quantum computing with qubits",
            "solar and wind renewable energy",
        ]
    )
]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_engine_matches_single_device(tmp_path):
    def make(mesh_shape, sub):
        cfg = OramaxConfig()
        cfg.writer_side.data_dir = str(tmp_path / sub / "w")
        cfg.reader_side.data_dir = str(tmp_path / sub / "r")
        cfg.writer_side.commit_interval_sec = 3600
        cfg.reader_side.commit_interval_sec = 3600
        cfg.tpu.mesh_shape = mesh_shape
        e = build_orama(cfg, start_background=False)
        e.write_side.create_collection(MASTER, "c", READ, WRITE)
        e.write_side.write("c", DOCS, WRITE)
        e.flush()
        e.commit()  # committed structures land on the (sharded) device cache
        return e

    single = make((), "single")
    sharded = make((8, 1), "sharded")
    try:
        FACETS = {
            "price": {"ranges": [{"from": 0, "to": 15}, {"from": 15, "to": 50}]},
            "tag": {"limit": 10},
            "active": {"true": True, "false": True},
        }
        for body in (
            {"term": "solar energy", "mode": "hybrid"},
            {"term": "wind", "mode": "vector"},
            {"term": "cake chocolate"},
            {"term": "solar", "where": {"price": {"gte": 20}}},
            # facets run ON the mesh path now (VERDICT r2 item 3) —
            # parity across all three facet kinds and all modes
            {"term": "solar", "facets": FACETS},
            {"term": "solar wind", "mode": "hybrid", "facets": FACETS},
            {"term": "energy", "mode": "vector", "facets": FACETS},
            {"term": "", "where": {"price": {"lte": 40}}, "facets": FACETS},
        ):
            p = SearchParams.from_json(body)
            r1 = single.read_side.search("c", p, READ)
            r2 = sharded.read_side.search("c", p, READ)
            assert [h.id for h in r1.hits] == [h.id for h in r2.hits], body
            for h1, h2 in zip(r1.hits, r2.hits):
                assert abs(h1.score - h2.score) < 1e-4, body
            if "facets" in body:
                assert r1.facets is not None and r2.facets is not None, body
                assert set(r1.facets) == set(r2.facets), body
                for k in r1.facets:
                    assert r1.facets[k].values == r2.facets[k].values, (body, k)
                    assert r1.facets[k].count == r2.facets[k].count, (body, k)
        # live uncommitted window on top of the committed generation:
        # the sharded facet overlay reads the matched mask only at the
        # window's doc ids (gather_values), never a dense host pull
        fresh = [
            {"id": "9", "body": "fresh solar farm", "price": 12,
             "tag": "green", "active": True},
        ]
        for e in (single, sharded):
            e.write_side.write("c", fresh, WRITE)
            e.flush()
        p = SearchParams.from_json({"term": "solar", "facets": FACETS})
        r1 = single.read_side.search("c", p, READ)
        r2 = sharded.read_side.search("c", p, READ)
        assert [h.id for h in r1.hits] == [h.id for h in r2.hits]
        for k in r1.facets:
            assert r1.facets[k].values == r2.facets[k].values, k

        # raw client vector query through the shard_map path
        model = next(
            f.model
            for f in single.read_side._reader("c").fields.values()
            if f.model
        )
        raw = [float(x) for x in single.read_side.ai.embed_query(model, ["wind"])[0]]
        p = SearchParams.from_json({"mode": "vector", "vector": raw})
        r1 = single.read_side.search("c", p, READ)
        r2 = sharded.read_side.search("c", p, READ)
        assert r1.hits and [h.id for h in r1.hits] == [h.id for h in r2.hits]
    finally:
        single.close()
        sharded.close()


def _apply_corpus(reader, n_docs, rng, committed_frac=0.6):
    """Drive a CollectionReader with synthetic ops (bypasses the write side —
    both readers get identical ops, which is what sharding changes).
    Commits after committed_frac of the docs, leaving a live uncommitted
    window on top of the committed generation. Returns the commit dir."""
    from orama_core_tpu.oplog import (
        CreateFieldOp, DeleteDocumentsOp, IndexEmbeddingOp, IndexNumberOp,
        IndexStringOp, InsertDocumentOp,
    )
    from orama_core_tpu.types import TypedField, ValueType

    D = 128
    vocab = [f"w{i:04d}" for i in range(1500)]
    zipf = rng.zipf(1.3, size=n_docs * 8) % len(vocab)
    reader.apply(CreateFieldOp("c", TypedField(0, "body", ValueType.STRING)))
    reader.apply(CreateFieldOp("c", TypedField(1, "price", ValueType.NUMBER)))
    reader.apply(
        CreateFieldOp(
            "c", TypedField(2, "emb", ValueType.EMBEDDING, model="fake-small")
        )
    )
    cut = int(n_docs * committed_frac)
    for i in range(n_docs):
        reader.apply(InsertDocumentOp("c", i, {"id": str(i)}))
        toks = zipf[i * 8:(i + 1) * 8]
        terms = {}
        for pos, t in enumerate(toks):
            terms.setdefault(vocab[t], []).append(pos)
        reader.apply(
            IndexStringOp("c", i, 0, len(toks),
                          {k: tuple(v) for k, v in terms.items()})
        )
        reader.apply(IndexNumberOp("c", i, 1, float(i % 1000)))
        v = np.sin(np.arange(D, dtype=np.float32) * (1 + i % 97) * 0.1)
        v /= np.linalg.norm(v)
        reader.apply(IndexEmbeddingOp("c", i, 2, (tuple(float(x) for x in v),)))
        if i == cut:
            # delete a slice, then commit: committed gen + tombstones
            reader.apply(
                DeleteDocumentsOp("c", tuple(range(100, 160)))
            )
    return cut


class _StubAI:
    """Deterministic query embedder (dim matches 'fake-small')."""

    def embed_query(self, model, texts):
        out = []
        for t in texts:
            v = np.sin(np.arange(128, dtype=np.float32) * (1 + len(t)) * 0.07)
            out.append(v / np.linalg.norm(v))
        return np.stack(out)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_reader_matches_single_device_100k(tmp_path):
    """VERDICT r1 item 3 'done' criterion: >=100k docs, 20+ terms, full
    equivalence between the shard_map serving path and the single-device
    path — mixed committed/uncommitted window, deletes, filters, all modes
    and fusions. Also asserts the committed dense intermediates are sharded
    (per-query cross-device traffic O(shards*k), not O(cap))."""
    from orama_core_tpu.config import TpuConfig
    from orama_core_tpu.engine.collection_read import CollectionReader

    N = 100_000
    single = CollectionReader("c", "rk", None, TpuConfig())
    sharded = CollectionReader(
        "c", "rk", None, TpuConfig(mesh_shape=(8, 1))
    )
    rng1 = np.random.default_rng(3)
    rng2 = np.random.default_rng(3)
    cut = _apply_corpus(single, N, rng1)
    _apply_corpus(sharded, N, rng2)
    # commit both at the same point: replay is identical, so commit now
    # (after all ops) AND we inserted deletes mid-stream; to get a true
    # mixed window, re-apply the tail as uncommitted after committing.
    # Simpler: commit now, then add a fresh uncommitted tail.
    single.commit(str(tmp_path / "s"), offset=1)
    sharded.commit(str(tmp_path / "m"), offset=1)
    from orama_core_tpu.oplog import IndexStringOp, InsertDocumentOp

    for reader in (single, sharded):
        for j in range(N, N + 500):
            reader.apply(InsertDocumentOp("c", j, {"id": str(j)}))
            reader.apply(
                IndexStringOp(
                    "c", j, 0, 3,
                    {"w0001": (0,), "w0002": (1,), "fresh": (2,)},
                )
            )

    ai = _StubAI()
    queries = [{"term": f"w{i:04d}"} for i in (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)]
    queries += [{"term": "w0001 w0002"}, {"term": "fresh"}]
    queries += [{"term": f"w{i:04d}", "mode": "vector"} for i in (1, 7)]
    queries += [
        {"term": "w0001 w0003", "mode": "hybrid"},
        {"term": "w0002", "mode": "hybrid", "fusion": "minmax"},
        {"term": "w0004", "where": {"price": {"between": [250, 700]}}},
        {"term": "w0005", "where": {"price": {"eq": 123}}},
        {"term": "", "where": {"price": {"lt": 10}}},
        {"term": "w0006", "limit": 25},
        {"term": "w001"},          # prefix span over 10 terms
        {"term": "w0007 w0008 w0009"},
    ]
    assert len(queries) >= 22
    for body in queries:
        p = SearchParams.from_json(dict(body))
        r1, c1, _ = single.search(p, ai)
        r2, c2, _ = sharded.search(p, ai)
        assert c1 == c2, (body, c1, c2)
        assert [d for d, _ in r1] == [d for d, _ in r2], body
        for (d1, s1), (d2, s2) in zip(r1, r2):
            assert abs(s1 - s2) < 1e-3 * max(1.0, abs(s1)), (body, d1, s1, s2)

    # dense committed intermediates must be sharded over the data axis
    mask = sharded._filter_mask_sharded({})
    ft = sharded._fulltext_scores_sharded("w0001", None, {}, mask, True)
    from jax.sharding import NamedSharding

    assert isinstance(ft.sharding, NamedSharding)
    assert ft.sharding.spec[0] == "data", ft.sharding
    assert not ft.sharding.is_fully_replicated


def test_sharded_raw_vector_dim_mismatch_raises(tmp_path):
    """A malformed client vector must raise the same dimension error on
    the mesh path as on the single-device path (review finding: it was a
    silent empty result)."""
    import pytest

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.tpu.mesh_shape = (8, 1)
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write("c", DOCS, WRITE)
    e.flush()
    e.commit()
    try:
        with pytest.raises(ValueError, match="dimension"):
            e.read_side.search(
                "c",
                SearchParams.from_json({"mode": "vector", "vector": [1.0, 2.0]}),
                READ,
            )
    finally:
        e.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ivfpq_engine_recall(tmp_path):
    """BASELINE config 5's mesh path: vector_index=ivf_pq runs through the
    engine's shard_map serving path (no replicated fallback) at
    recall@10 >= 0.95 vs exact brute force, and is never worse than the
    single-device ivf_pq path (its candidate set is a superset)."""
    from orama_core_tpu.config import TpuConfig
    from orama_core_tpu.engine.collection_read import CollectionReader
    from orama_core_tpu.oplog import (
        CreateFieldOp, IndexEmbeddingOp, InsertDocumentOp,
    )
    from orama_core_tpu.types import TypedField, ValueType

    N, D, CENTERS = 20_000, 128, 64
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((CENTERS, D)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, CENTERS, N)
    vecs = centers[assign] + 0.25 * rng.standard_normal((N, D)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    def make(mesh_shape):
        cfg = TpuConfig(
            mesh_shape=mesh_shape,
            vector_index="ivf_pq",
            ivf_threshold=1_000,
            ivf_nprobe=64,
            ivf_autotune=False,
        )
        r = CollectionReader("c", "rk", None, cfg)
        r.apply(CreateFieldOp(
            "c", TypedField(0, "emb", ValueType.EMBEDDING, model="fake-small")
        ))
        for i in range(N):
            r.apply(InsertDocumentOp("c", i, {"id": str(i)}))
            r.apply(IndexEmbeddingOp(
                "c", i, 0, (tuple(float(x) for x in vecs[i]),)
            ))
        return r

    single = make(())
    sharded = make((8, 1))
    single.commit(str(tmp_path / "s"), offset=1)
    sharded.commit(str(tmp_path / "m"), offset=1)
    assert sharded._use_sharded(
        SearchParams.from_json({"mode": "vector", "vector": [0.0] * D})
    ), "ivf_pq must ride the mesh path, not fall back"

    Q, K = 20, 10
    queries = centers[rng.integers(0, CENTERS, Q)] + 0.25 * rng.standard_normal(
        (Q, D)
    ).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    exact = np.argsort(-(queries @ vecs.T), axis=1)[:, :K]

    hits_sh = hits_sg = 0
    for q in range(Q):
        p = SearchParams.from_json(
            {"mode": "vector", "vector": [float(x) for x in queries[q]],
             "limit": K}
        )
        r_sh, _, _ = sharded.search(p, ai_service=None)
        r_sg, _, _ = single.search(p, ai_service=None)
        hits_sh += len({d for d, _ in r_sh} & set(exact[q]))
        hits_sg += len({d for d, _ in r_sg} & set(exact[q]))
    recall_sh = hits_sh / (Q * K)
    recall_sg = hits_sg / (Q * K)
    assert recall_sh >= 0.95, (recall_sh, recall_sg)
    assert recall_sh >= recall_sg - 1e-9, (recall_sh, recall_sg)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("multivec", [False, True])
def test_sharded_vector_fast_path_matches_dense(tmp_path, multivec):
    """The mesh vector fast path (per-shard fused Pallas top-k + O(S*k)
    merge, parallel/sharded_engine.vector_topk_fast) must be
    result-identical to the dense sharded pipeline — ranking, scores,
    and match count (count may differ by 1 at sim~0 float boundaries) —
    for single- and multi-vector corpora."""
    from orama_core_tpu.config import TpuConfig
    from orama_core_tpu.engine.collection_read import CollectionReader
    from orama_core_tpu.oplog import (
        CreateFieldOp, IndexEmbeddingOp, InsertDocumentOp,
    )
    from orama_core_tpu.types import TypedField, ValueType

    D, N = 128, 12000

    def build(force, sub):
        r = CollectionReader("c", "rk", None, TpuConfig(mesh_shape=(8, 1)))
        r.cfg._test_force_fast_path = force
        r.apply(
            CreateFieldOp(
                "c", TypedField(0, "emb", ValueType.EMBEDDING,
                                model="fake-small")
            )
        )
        rng = np.random.default_rng(7)
        for i in range(N):
            r.apply(InsertDocumentOp("c", i, {"id": str(i)}))
            nch = 1 + (i % 3) if multivec else 1
            vs = rng.standard_normal((nch, D)).astype(np.float32)
            vs /= np.linalg.norm(vs, axis=1, keepdims=True)
            r.apply(
                IndexEmbeddingOp(
                    "c", i, 0,
                    tuple(tuple(float(x) for x in v) for v in vs),
                )
            )
        r.commit(str(tmp_path / sub), offset=1)
        return r

    ai = _StubAI()
    fast, dense = build(True, "f"), build(False, "d")
    from orama_core_tpu.server import metrics as m

    before = m.VECTOR_PATH.get(path="fast_sharded")
    for body in (
        {"term": "solar", "mode": "vector"},
        {"term": "wind energy", "mode": "vector", "limit": 25},
    ):
        r1, c1, _ = fast.search(SearchParams.from_json(dict(body)), ai)
        r2, c2, _ = dense.search(SearchParams.from_json(dict(body)), ai)
        assert [d for d, _ in r1] == [d for d, _ in r2], body
        for (d1, s1), (d2, s2) in zip(r1, r2):
            assert abs(s1 - s2) < 1e-3 * max(1.0, abs(s1)), (body, d1)
        assert abs(c1 - c2) <= 1, (body, c1, c2)
    assert m.VECTOR_PATH.get(path="fast_sharded") == before + 2

    # ineligible shapes fall back to the dense sharded pipeline
    p = SearchParams.from_json(
        {"term": "solar", "mode": "vector",
         "where": {"price": {"gte": 0}}}
    )
    assert fast._sharded_vector_fast(p, ai) is None


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fast_path_rejects_wrong_dim_vector(tmp_path):
    """A wrong-dimension raw query vector must raise the same clean
    ValueError as every other vector path — not an opaque shard_map/Mosaic
    shape error (engine mesh deployments receive client vectors)."""
    from orama_core_tpu.config import TpuConfig
    from orama_core_tpu.engine.collection_read import CollectionReader
    from orama_core_tpu.oplog import (
        CreateFieldOp, IndexEmbeddingOp, InsertDocumentOp,
    )
    from orama_core_tpu.types import TypedField, ValueType

    D, N = 128, 4096
    r = CollectionReader("c", "rk", None, TpuConfig(mesh_shape=(8, 1)))
    r.cfg._test_force_fast_path = True
    r.apply(
        CreateFieldOp(
            "c", TypedField(0, "emb", ValueType.EMBEDDING, model="fake-small")
        )
    )
    rng = np.random.default_rng(11)
    for i in range(N):
        r.apply(InsertDocumentOp("c", i, {"id": str(i)}))
        v = rng.standard_normal(D).astype(np.float32)
        r.apply(IndexEmbeddingOp("c", i, 0, (tuple(float(x) for x in v),)))
    r.commit(str(tmp_path / "c"), offset=1)

    bad = SearchParams.from_json(
        {"mode": "vector", "vector": [0.5] * 64, "limit": 5}
    )
    with pytest.raises(ValueError, match="dimension 64"):
        r.search(bad, ai_service=None)
