import logging

from orama_core_tpu.server import metrics as m
from orama_core_tpu.utils import tracing


def test_counter_and_labels():
    c = m.Counter("test_counter_x", "help")
    c.inc(collection="a")
    c.inc(2, collection="a")
    c.inc(collection="b")
    text = "\n".join(c.expose())
    assert 'test_counter_x{collection="a"} 3.0' in text
    assert 'test_counter_x{collection="b"} 1.0' in text


def test_histogram_exposition():
    h = m.Histogram("test_hist_x", "help", buckets=(0.1, 1.0))
    h.observe(0.05)
    h.observe(0.5)
    h.observe(5.0)
    text = "\n".join(h.expose())
    assert 'test_hist_x_bucket{le="0.1"} 1' in text
    assert 'test_hist_x_bucket{le="1.0"} 2' in text
    assert 'test_hist_x_bucket{le="+Inf"} 3' in text
    assert "test_hist_x_count 3" in text


def test_histogram_timer():
    h = m.Histogram("test_timer_x", "help")
    with h.time(op="x"):
        pass
    assert "test_timer_x_count" in "\n".join(h.expose())


def test_registry_exposes_inventory():
    text = m.REGISTRY.expose_text()
    for name in (
        "reader_search_elapsed_sec",
        "writer_add_document_counter",
        "operation_gauge",
        "embedding_request_gauge",
        "commit_elapsed_sec",
    ):
        assert name in text, name


def test_engine_emits_metrics(tmp_engine):
    tmp_engine.write_side.create_collection("master", "mx", "r", "w")
    tmp_engine.write_side.write("mx", [{"id": "1", "t": "hello metrics"}], "w")
    tmp_engine.flush()
    tmp_engine.commit()
    text = m.REGISTRY.expose_text()
    assert 'writer_add_document_counter{collection="mx"} 1.0' in text
    assert 'commit_elapsed_sec_count{side="write"}' in text


def test_span_records_and_nests(caplog):
    tracing.configure()
    with caplog.at_level(logging.DEBUG, logger="oramax"):
        with tracing.span("outer", a=1):
            assert tracing.current_span() == "outer"
            with tracing.span("inner"):
                assert tracing.current_span() == "inner"
    closes = [r for r in caplog.records if "span close" in r.getMessage()]
    assert len(closes) == 2
    inner = closes[0].fields
    assert inner["span"] == "inner" and inner["parent"] == "outer"
    assert "elapsed_ms" in inner


def test_log_levels(caplog):
    tracing.configure()
    with caplog.at_level(logging.INFO, logger="oramax"):
        tracing.log("info", "hello", key="v")
    assert any("hello" in r.getMessage() for r in caplog.records)
