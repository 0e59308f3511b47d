"""Fused in-trace facets: the one-dispatch serving program counts facets
as segment reductions over the matched mask (ops/hybrid.py), with results
identical to the multi-dispatch path's compute_facets (the reference
recomputes filters per facet, collection.rs:1004-1126). Covers number /
term (keyword) / bool facets x fulltext / hybrid(rrf, minmax) / vector
modes x fused filters, plus the fallback cases (live windows on a facet
field, bad facet fields still raising)."""

import jax
import numpy as np
import pytest

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.ops import topk as topk_ops
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "rk", "wk"

DOCS = [
    ("solar panels convert sunlight into power", 10, "green", True),
    ("wind turbines spin in the breeze", 25, "white", True),
    ("bake a chocolate cake for dessert", 7, "brown", False),
    ("quantum computing with qubits", 99, "silver", False),
    ("solar and wind renewable energy mix", 40, "green", True),
    ("the power grid balances supply", 55, "grey", False),
    ("solar power for the home", 12, "green", True),
    ("wind power auctions set records", 33, "white", False),
    ("dessert recipes with chocolate", 5, "brown", True),
    ("grid scale batteries store solar power", 61, "grey", True),
]

FACETS_ALL = {
    "price": {"ranges": [
        {"from": 0, "to": 20}, {"from": 20, "to": 50}, {"from": 50},
    ]},
    "color": {"limit": 3},
    "in_stock": {"true": True, "false": True},
}


@pytest.fixture()
def engine(tmp_path):
    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.tpu.query_batching = False
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.write_side.write(
        "c",
        [
            {"id": str(i), "body": t, "price": p, "color": c, "in_stock": s}
            for i, (t, p, c, s) in enumerate(DOCS)
        ],
        WRITE,
    )
    e.flush()
    e.commit()
    yield e
    e.close()


def _facets_json(fr):
    return {k: v.to_json() for k, v in (fr or {}).items()}


def _assert_parity(reader, ai, body):
    p = SearchParams.from_json(dict(body, limit=64))
    helig = reader._hybrid_fused_eligible(p)
    assert helig is not None, body
    assert len(helig[4]) == len(p.facets), body
    ranked_f, count_f, facets_f = reader._search_hybrid_fused(p, ai, *helig)
    scores = reader.search_scores(p, ai)
    facets_m = reader.compute_facets(scores, p.facets)
    vals, idx, count = jax.device_get(
        topk_ops.topk_with_count(scores, min(64, reader.capacity))
    )
    ranked = [(int(d), float(s)) for d, s in zip(idx, vals) if s > 0.0]
    assert count_f == int(count), body
    assert [d for d, _ in ranked_f] == [d for d, _ in ranked], body
    np.testing.assert_allclose(
        [s for _, s in ranked_f], [s for _, s in ranked],
        rtol=2e-5, err_msg=str(body),
    )
    assert _facets_json(facets_f) == _facets_json(facets_m), body
    return facets_f


def test_fused_facets_parity_all_kinds_and_modes(engine):
    reader = engine.read_side._reader("c")
    ai = engine.read_side.ai
    for body in (
        {"term": "solar", "mode": "fulltext", "facets": FACETS_ALL},
        {"term": "solar power", "mode": "fulltext",     # phrase
         "facets": FACETS_ALL},
        {"term": "wind", "mode": "hybrid", "facets": FACETS_ALL},
        {"term": "wind", "mode": "hybrid", "fusion": "minmax",
         "facets": FACETS_ALL},
        {"term": "power grid", "mode": "vector",
         "where": {"price": {"gte": 1}},                # fused-eligible vec
         "facets": FACETS_ALL},
        # facets compose with fused filters: counts respect the mask
        {"term": "solar", "mode": "fulltext",
         "where": {"in_stock": True, "price": {"lte": 50}},
         "facets": FACETS_ALL},
        # single-kind facet requests
        {"term": "chocolate", "facets": {"color": {}}},
        {"term": "power", "facets": {"in_stock": {"true": True}}},
        {"term": "power",
         "facets": {"price": {"ranges": [{"to": 30}, {"from": 30}]}}},
    ):
        _assert_parity(reader, ai, body)


def test_fused_facet_values_are_correct(engine):
    """Ground-truth check, independent of the multi-dispatch path: 'solar'
    matches docs 0, 4, 6, 9 (prices 10/40/12/61; colors green x3, grey x1;
    in_stock all true)."""
    reader = engine.read_side._reader("c")
    ai = engine.read_side.ai
    facets = _assert_parity(
        reader, ai, {"term": "solar", "mode": "fulltext",
                     "facets": FACETS_ALL},
    )
    price = facets["price"].values
    assert price == {"0-20": 2, "20-50": 1, "50-inf": 1}
    assert facets["color"].values == {"green": 3, "grey": 1}
    assert facets["color"].count == 2
    assert facets["in_stock"].values == {"true": 4, "false": 0}


def test_fused_facets_through_public_search(engine):
    """The engine-level search response carries the fused facet payload
    with the same shape as the multi-dispatch path (server contract)."""
    p = SearchParams.from_json(
        {"term": "solar", "mode": "hybrid", "facets": FACETS_ALL}
    )
    reader = engine.read_side._reader("c")
    assert reader._hybrid_fused_eligible(p) is not None
    r = engine.read_side.search("c", p, READ)
    assert r.facets is not None
    assert r.facets["color"].values["green"] >= 1
    assert set(r.facets["price"].values) == {"0-20", "20-50", "50-inf"}


def test_fused_facets_fallback_and_errors(engine):
    reader = engine.read_side._reader("c")
    # a live uncommitted value on a facet field falls back to multi-dispatch
    engine.write_side.write(
        "c", [{"id": "w", "body": "fresh solar", "price": 3,
               "color": "green", "in_stock": True}], WRITE,
    )
    engine.flush()
    p = SearchParams.from_json(
        {"term": "solar", "facets": {"price": {"ranges": [{"to": 50}]}}}
    )
    assert reader._hybrid_fused_eligible(p) is None
    r = engine.read_side.search("c", p, READ)  # multi-dispatch, correct
    assert r.facets["price"].values["-inf-50"] >= 3
    engine.commit()
    # unknown facet field: eligibility defers so the user error surfaces
    p = SearchParams.from_json({"term": "solar", "facets": {"nope": {}}})
    assert reader._hybrid_fused_eligible(p) is None
    with pytest.raises(ValueError):
        engine.read_side.search("c", p, READ)
    # facet/field type mismatch: same contract
    p = SearchParams.from_json(
        {"term": "solar",
         "facets": {"color": {"ranges": [{"from": 0, "to": 1}]}}}
    )
    assert reader._hybrid_fused_eligible(p) is None
    with pytest.raises(ValueError):
        engine.read_side.search("c", p, READ)


def test_fused_facets_after_delete(engine):
    """Deletes shrink the matched mask: facet counts exclude tombstoned
    docs on the fused path exactly as on the multi-dispatch path."""
    reader = engine.read_side._reader("c")
    ai = engine.read_side.ai
    engine.write_side.delete_documents("c", ["0", "6"], WRITE)
    engine.flush()
    facets = _assert_parity(
        reader, ai, {"term": "solar", "mode": "fulltext",
                     "facets": FACETS_ALL},
    )
    # docs 4 and 9 remain: prices 40, 61; colors green, grey
    assert facets["price"].values == {"0-20": 0, "20-50": 1, "50-inf": 1}
    assert facets["color"].values == {"green": 1, "grey": 1}
