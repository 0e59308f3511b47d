"""String-equality filters and term facets over keyword columns
(reference roadmap items, implemented here; index/keyword_index.py).
Covers: uncommitted, committed, mixed windows, arrays, in-filters,
deletes, persistence, facet ordering/limits, mesh-mode parity."""

import jax
import pytest

from orama_core_tpu.types import SearchParams, StringFilter, parse_filter

MASTER, READ, WRITE = "master", "read-key", "write-key"

DOCS = [
    {"id": "1", "title": "red leather shoe", "color": "red", "price": 10},
    {"id": "2", "title": "blue canvas shoe", "color": "blue", "price": 20},
    {"id": "3", "title": "red wool hat", "color": "red", "price": 30},
    {"id": "4", "title": "green cap hat", "color": "green", "price": 40},
    {"id": "5", "title": "red silk scarf", "color": "red", "price": 50},
    {"id": "6", "title": "multi tone shoe", "color": ["red", "blue"], "price": 60},
]


def _setup(engine):
    engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    engine.flush()
    engine.write_side.write("c1", DOCS, WRITE)
    engine.flush()


def _search(engine, body):
    return engine.read_side.search("c1", SearchParams.from_json(body), READ)


def test_parse_string_filters():
    assert parse_filter("red") == StringFilter("eq", "red")
    assert parse_filter({"eq": "red"}) == StringFilter("eq", "red")
    assert parse_filter({"in": ["a", "b"]}) == StringFilter("in", ("a", "b"))
    from orama_core_tpu.types import NumberFilter

    assert isinstance(parse_filter({"eq": 3}), NumberFilter)


def test_eq_filter_uncommitted(tmp_engine):
    _setup(tmp_engine)
    res = _search(tmp_engine, {"term": "shoe", "where": {"color": "red"}})
    assert {h.id for h in res.hits} == {"1", "6"}


def test_eq_filter_committed(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    res = _search(tmp_engine, {"term": "shoe", "where": {"color": "red"}})
    assert {h.id for h in res.hits} == {"1", "6"}
    res = _search(tmp_engine, {"term": "hat", "where": {"color": {"eq": "green"}}})
    assert {h.id for h in res.hits} == {"4"}


def test_in_filter_mixed_window(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    tmp_engine.write_side.write(
        "c1", [{"id": "7", "title": "purple shoe", "color": "purple", "price": 5}], WRITE
    )
    tmp_engine.flush()
    res = _search(
        tmp_engine, {"term": "shoe", "where": {"color": {"in": ["purple", "blue"]}}}
    )
    assert {h.id for h in res.hits} == {"2", "6", "7"}


def test_unknown_value_matches_nothing(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    res = _search(tmp_engine, {"term": "shoe", "where": {"color": "chartreuse"}})
    assert res.count == 0


def test_string_filter_on_nonstring_field_rejected(tmp_engine):
    _setup(tmp_engine)
    with pytest.raises(ValueError):
        _search(tmp_engine, {"term": "shoe", "where": {"price": "red"}})


def test_filter_composes_with_number(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    res = _search(
        tmp_engine,
        {"term": "red", "where": {"color": "red", "price": {"lt": 35}}},
    )
    assert {h.id for h in res.hits} == {"1", "3"}


def test_delete_then_filter(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    tmp_engine.write_side.delete_documents("c1", ["1"], WRITE)
    tmp_engine.flush()
    res = _search(tmp_engine, {"term": "shoe", "where": {"color": "red"}})
    assert {h.id for h in res.hits} == {"6"}
    tmp_engine.commit()  # fold the delete into the committed column
    res = _search(tmp_engine, {"term": "shoe", "where": {"color": "red"}})
    assert {h.id for h in res.hits} == {"6"}


def test_term_facet(tmp_engine):
    _setup(tmp_engine)
    res = _search(tmp_engine, {"term": "red", "facets": {"color": {}}})
    # matched docs: 1, 3, 5, 6 (all have "red"; 6 also "blue")
    assert res.facets["color"].values == {"red": 4, "blue": 1}
    assert res.facets["color"].count == 2


def test_term_facet_committed_and_limit(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    res = _search(tmp_engine, {"term": "shoe hat scarf cap", "facets": {"color": {"limit": 2}}})
    # counts: red 4 (docs 1,3,5,6), blue 2 (2,6), green 1 (4)
    assert res.facets["color"].count == 3  # distinct values
    assert list(res.facets["color"].values.items()) == [("red", 4), ("blue", 2)]


def test_term_facet_mixed_window(tmp_engine):
    _setup(tmp_engine)
    tmp_engine.commit()
    tmp_engine.write_side.write(
        "c1", [{"id": "8", "title": "red velvet shoe", "color": "red", "price": 1}], WRITE
    )
    tmp_engine.flush()
    res = _search(tmp_engine, {"term": "shoe", "facets": {"color": {}}})
    assert res.facets["color"].values["red"] == 3  # docs 1, 6, 8


def test_persistence_roundtrip(tmp_engine):
    from orama_core_tpu import build_orama

    _setup(tmp_engine)
    tmp_engine.commit()
    cfg = tmp_engine.cfg
    tmp_engine.close()
    e2 = build_orama(cfg, start_background=False)
    res = e2.read_side.search(
        "c1",
        SearchParams.from_json({"term": "shoe", "where": {"color": "red"}}),
        READ,
    )
    assert {h.id for h in res.hits} == {"1", "6"}
    res = e2.read_side.search(
        "c1", SearchParams.from_json({"term": "red", "facets": {"color": {}}}), READ
    )
    assert res.facets["color"].values["red"] == 4
    e2.close()


def test_long_values_ignored(tmp_engine):
    tmp_engine.write_side.create_collection(
        MASTER, "c1", read_api_key=READ, write_api_key=WRITE
    )
    tmp_engine.flush()
    long_val = "x" * 500
    tmp_engine.write_side.write(
        "c1", [{"id": "1", "title": "short doc", "note": long_val}], WRITE
    )
    tmp_engine.flush()
    res = _search(tmp_engine, {"term": "short", "where": {"note": long_val}})
    assert res.count == 0  # ignore_above guard


@pytest.fixture()
def mesh_engine(tmp_path):
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "mw")
    cfg.reader_side.data_dir = str(tmp_path / "mr")
    cfg.writer_side.commit_interval_sec = 3600.0
    cfg.reader_side.commit_interval_sec = 3600.0
    cfg.tpu.mesh_shape = (8, 1)
    e = build_orama(cfg, start_background=False)
    yield e
    e.close()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_keyword_filter_mesh_mode(mesh_engine):
    """Keyword filters through the sharded (mesh) serving path."""
    _setup(mesh_engine)
    mesh_engine.commit()
    res = _search(mesh_engine, {"term": "shoe", "where": {"color": "red"}})
    assert {h.id for h in res.hits} == {"1", "6"}
    res = _search(
        mesh_engine, {"term": "shoe", "where": {"color": {"in": ["blue", "green"]}}}
    )
    assert {h.id for h in res.hits} == {"2", "6"}


def test_keyword_intern_cardinality_guard(monkeypatch):
    """Value ids ride float32 device columns; interning past 2^24 would
    silently collide ids, so merge refuses instead (ADVICE r2)."""
    import pytest

    from orama_core_tpu.index import keyword_index as ki

    monkeypatch.setattr(ki, "MAX_INTERNED", 4)
    unc = ki.UncommittedKeywordIndex()
    for i in range(6):
        unc.insert(i, [f"value-{i}"])
    with pytest.raises(ValueError, match="distinct values"):
        ki.CommittedKeywordIndex.empty().merge(unc)


def test_facet_shape_field_type_mismatch_is_400_not_500(tmp_engine):
    """A bool/number/string-shaped facet on a field of another type must
    raise ValueError (HTTP 400), not KeyError (500). Found by the search
    execution fuzzer."""
    import pytest

    from orama_core_tpu.types import SearchParams

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write(
        "c", [{"id": "1", "title": "words here", "price": 5.0, "live": True}], "wk"
    )
    e.flush()
    cases = [
        {"title": {"true": True, "false": True}},     # bool facet on string
        {"title": {"ranges": [{"from": 0, "to": 9}]}},  # number facet on string
        {"price": {"true": True, "false": True}},     # bool facet on number
        {"live": {"ranges": [{"from": 0, "to": 9}]}},   # number facet on bool
        {"price": {}},                                  # string facet on number
    ]
    for facets in cases:
        p = SearchParams.from_json({"term": "words", "facets": facets})
        with pytest.raises(ValueError):
            e.read_side.search("c", p, "rk", with_documents=False)
