"""Behavior-parity tests mirroring specific reference integration tests
(src/tests.rs) beyond the basics covered in test_engine.py."""

import pytest

from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "read-key", "write-key"


def _create(engine, cid="c1"):
    engine.write_side.create_collection(MASTER, cid, READ, WRITE)
    engine.flush()
    return cid


def test_facets_should_be_scoped_to_term(tmp_engine):
    """tests.rs:827 test_facets_should_based_on_term: facet counts include
    only documents matching the search term."""
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": "1", "text": "text", "bool": True, "number": 1},
            {"id": "2", "text": "text text", "bool": False, "number": 2},
            {"id": "3", "text": "another", "bool": True, "number": 1},
        ],
        WRITE,
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json(
            {
                "term": "text",
                "facets": {
                    "bool": {"true": True, "false": True},
                    "number": {"ranges": [{"from": 0, "to": 10}]},
                },
            }
        ),
        READ,
    )
    assert res.facets["bool"].values == {"true": 1, "false": 1}
    assert res.facets["number"].values == {"0-10": 2}


def test_handle_bool_filter_only_results(tmp_engine):
    """tests.rs:1063 test_handle_bool: bool filters pick exactly the
    matching docs."""
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [
            {"id": f"doc{i}", "text": "doc", "bool": i % 2 == 1}
            for i in range(1, 6)
        ],
        WRITE,
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid,
        SearchParams.from_json({"term": "doc", "where": {"bool": True}}),
        READ,
    )
    assert {h.id for h in res.hits} == {"doc1", "doc3", "doc5"}


def test_empty_term_returns_all_documents(tmp_engine):
    """tests.rs:916 test_empty_term documents the *intended* behavior
    ('we should return all documents') which the reference doesn't
    implement; this engine does."""
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(
        cid,
        [{"id": str(i), "text": f"word{i}"} for i in range(5)],
        WRITE,
    )
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": "", "limit": 10}), READ
    )
    assert res.count == 5
    assert {h.id for h in res.hits} == {str(i) for i in range(5)}
    # still respects filters and deletes
    tmp_engine.write_side.delete_documents(cid, ["0"], WRITE)
    tmp_engine.flush()
    res = tmp_engine.read_side.search(
        cid, SearchParams.from_json({"term": ""}), READ
    )
    assert res.count == 4


def test_filter_on_unknown_field_error_message(tmp_engine):
    """tests.rs:154: exact error wording."""
    cid = _create(tmp_engine)
    tmp_engine.write_side.write(cid, [{"id": "1", "name": "John Doe"}], WRITE)
    tmp_engine.flush()
    with pytest.raises(ValueError) as e:
        tmp_engine.read_side.search(
            cid,
            SearchParams.from_json({"term": "Doe", "where": {"unknown_field": {"eq": 1}}}),
            READ,
        )
    assert 'Cannot filter by "unknown_field": unknown field' in str(e.value)


def test_collection_id_already_exists(tmp_engine):
    """tests.rs:328."""
    cid = _create(tmp_engine)
    with pytest.raises(ValueError):
        tmp_engine.write_side.create_collection(MASTER, cid, READ, WRITE)


def test_get_collections(tmp_engine):
    """tests.rs:355."""
    _create(tmp_engine, "a1")
    _create(tmp_engine, "a2")
    cols = tmp_engine.write_side.list_collections(MASTER)
    assert {c["id"] for c in cols} == {"a1", "a2"}


def test_commit_and_load2_incremental(tmp_path):
    """tests.rs:1156 test_commit_and_load2: commit, add more docs, commit
    again, reload — both generations' docs searchable."""
    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    cfg.writer_side.commit_interval_sec = 3600
    cfg.reader_side.commit_interval_sec = 3600
    e = build_orama(cfg, start_background=False)
    e.write_side.create_collection(MASTER, "c", READ, WRITE)
    e.flush()
    e.write_side.write("c", [{"id": "1", "t": "first generation doc"}], WRITE)
    e.flush()
    e.commit()
    e.write_side.write("c", [{"id": "2", "t": "second generation doc"}], WRITE)
    e.flush()
    e.commit()
    e.close()

    e2 = build_orama(cfg, start_background=False)
    res = e2.read_side.search(
        "c", SearchParams.from_json({"term": "generation"}), READ
    )
    assert {h.id for h in res.hits} == {"1", "2"}
    e2.close()
