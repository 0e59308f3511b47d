"""Sandboxed mini-JS interpreter (engine/minijs.py) — the bundled JS engine
tier replacing the reference's embedded V8 (js/deno.rs:29-101; VERDICT r1
item 9): dynamic selectEmbeddingProperties hooks run with NO node binary."""

import pytest

from orama_core_tpu.engine.minijs import MiniJsError, run_hook

FN = "selectEmbeddingProperties"


def run(code, doc):
    return run_hook(code, FN, doc)


def test_dynamic_property_selection():
    code = """
    function selectEmbeddingProperties(doc) {
      if (doc.kind === 'product') {
        return ['title', 'description'];
      }
      return ['body'];
    }
    """
    assert run(code, {"kind": "product"}) == ["title", "description"]
    assert run(code, {"kind": "post"}) == ["body"]


def test_arrow_function_and_template_literal():
    code = """
    const selectEmbeddingProperties = (doc) =>
      `${doc.title ?? ''} ${doc.summary ?? doc.body ?? ''}`.trim();
    """
    assert run(code, {"title": "Solar", "summary": "Panels"}) == "Solar Panels"
    assert run(code, {"body": "fallback"}) == "fallback"


def test_array_methods_and_member_access():
    code = """
    function selectEmbeddingProperties(doc) {
      const fields = Object.keys(doc).filter((k) => typeof doc[k] === 'string');
      return fields.filter((k) => !k.startsWith('_'));
    }
    """
    doc = {"title": "a", "_internal": "x", "price": 3, "body": "b"}
    assert run(code, doc) == ["title", "body"]


def test_string_building_with_concat_and_join():
    code = """
    function selectEmbeddingProperties(doc) {
      const parts = [doc.name, doc.brand].filter((x) => x != null);
      return parts.join(' - ').toLowerCase();
    }
    """
    assert run(code, {"name": "Widget", "brand": "ACME"}) == "widget - acme"
    assert run(code, {"name": "Widget"}) == "widget"


def test_nested_access_ternary_arith():
    code = """
    function selectEmbeddingProperties(doc) {
      const lvl = doc.meta?.level ?? 0;
      return lvl * 2 + 1 > 3 ? ['deep'] : ['shallow'];
    }
    """
    assert run(code, {"meta": {"level": 5}}) == ["deep"]
    assert run(code, {}) == ["shallow"]


def test_null_return_means_no_override():
    code = "function selectEmbeddingProperties(doc) { return null; }"
    assert run(code, {}) is None


def test_runaway_hook_hits_step_budget():
    code = """
    function loop(x) { return loop(x + 1); }
    function selectEmbeddingProperties(doc) { return loop(0); }
    """
    with pytest.raises(MiniJsError):
        run(code, {})


def test_no_host_access_identifiers():
    for snippet in (
        "function selectEmbeddingProperties(d) { return require('fs'); }",
        "function selectEmbeddingProperties(d) { return process.env.HOME; }",
        "function selectEmbeddingProperties(d) { return globalThis.x; }",
    ):
        with pytest.raises(MiniJsError):
            run(snippet, {})


def test_dynamic_hook_through_engine_without_node(tmp_path):
    """End-to-end: a NON-constant hook drives embedding-input selection in
    the write path with no node binary (VERDICT 'done' criterion)."""
    import shutil

    assert shutil.which("node") is None  # this image has no node

    from orama_core_tpu import build_orama
    from orama_core_tpu.config import OramaxConfig
    from orama_core_tpu.engine.hooks import SELECT_EMBEDDING_PROPERTIES

    cfg = OramaxConfig()
    cfg.writer_side.data_dir = str(tmp_path / "w")
    cfg.reader_side.data_dir = str(tmp_path / "r")
    e = build_orama(cfg, start_background=False)
    try:
        e.write_side.create_collection("master", "c", "rk", "wk")
        e.hooks.insert_hook(
            "c",
            SELECT_EMBEDDING_PROPERTIES,
            """
            function selectEmbeddingProperties(doc) {
              if (doc.kind === 'code') { return ['snippet']; }
              return ['title'];
            }
            """,
        )
        out = e.hooks.eval(
            "c", SELECT_EMBEDDING_PROPERTIES, {"kind": "code", "snippet": "x"}
        )
        assert out == ["snippet"]
        out2 = e.hooks.eval(
            "c", SELECT_EMBEDDING_PROPERTIES, {"kind": "doc", "title": "t"}
        )
        assert out2 == ["title"]
        # the write path consumes the hook without error
        e.write_side.write(
            "c", [{"id": "1", "kind": "code", "snippet": "let x = 1"}], "wk"
        )
        e.flush()
    finally:
        e.close()
