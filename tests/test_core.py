import pytest

from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.oplog import (
    InsertDocumentOp,
    channel,
)
from orama_core_tpu.types import (
    BoolFilter,
    NumberFilter,
    SearchParams,
    parse_facet,
    parse_filter,
)


def test_channel_offsets_monotonic():
    tx, rx = channel(100)
    for i in range(5):
        tx.send(InsertDocumentOp("c", i, {"id": str(i)}))
    ops = rx.drain()
    assert [s.offset.value for s in ops] == [1, 2, 3, 4, 5]
    assert tx.offset == 5


def test_channel_offset_restore():
    tx, _ = channel(10)
    tx.set_offset(41)
    off = tx.send(InsertDocumentOp("c", 0, {}))
    assert off.value == 42


def test_search_params_from_json_defaults():
    p = SearchParams.from_json({"term": "hello"})
    assert p.term == "hello"
    assert p.mode.value == "fulltext"
    assert p.limit == 10
    assert p.properties is None


def test_search_params_filters_and_facets():
    p = SearchParams.from_json(
        {
            "term": "x",
            "mode": "hybrid",
            "limit": 3,
            "where": {"price": {"gte": 10}, "ok": True},
            "facets": {
                "price": {"ranges": [{"from": 0, "to": 10}]},
                "ok": {"true": True, "false": False},
            },
            "boost": {"title": 2.0},
        }
    )
    assert isinstance(p.where["price"], NumberFilter)
    assert p.where["price"].op == "gte"
    assert isinstance(p.where["ok"], BoolFilter)
    assert p.boost["title"] == 2.0
    nf = p.facets["price"]
    assert nf.ranges[0].key == "0-10"


def test_parse_filter_between():
    f = parse_filter({"between": [1, 5]})
    assert f.op == "between" and f.value == (1, 5)


def test_parse_filter_rejects_unknown_op():
    with pytest.raises(ValueError):
        parse_filter({"almost": 3})


def test_parse_facet_bool():
    f = parse_facet({"true": True, "false": True})
    assert f.true and f.false


def test_config_env_override(monkeypatch):
    cfg = OramaxConfig.load(
        path=None,
        env={
            "ORAMAX_http__port": "9090",
            "ORAMAX_writer_side__master_api_key": "secret",
            "ORAMAX_tpu__use_pallas": "false",
        },
    )
    assert cfg.http.port == 9090
    assert cfg.writer_side.master_api_key == "secret"
    assert cfg.tpu.use_pallas is False


def test_config_yaml(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        """
http:
  port: 1234
reader_side:
  commit_interval_sec: 5.0
tpu:
  mesh_shape: [4, 2]
"""
    )
    cfg = OramaxConfig.load(path=str(p), env={})
    assert cfg.http.port == 1234
    assert cfg.reader_side.commit_interval_sec == 5.0
    assert cfg.tpu.mesh_shape == (4, 2)
