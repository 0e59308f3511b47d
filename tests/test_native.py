"""Native C++ runtime tests: tokenizer parity with the Python pipeline and
CSR packing parity with the Python merge."""

import numpy as np
import pytest

from orama_core_tpu import native
from orama_core_tpu.nlp import TextParser

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_tokenizer_matches_python():
    p = TextParser("en")
    texts = [
        "The quick brown Fox jumped over the lazy dogs!",
        "Running runners ran relational conditionals",
        "café élève Ñandú",
        "hello, world... hello again",
        "",
        "the and of",  # all stop words
    ]
    for t in texts:
        assert native.tokenize_and_stem_en(t) == p.tokenize_and_stem(t), t


def test_native_builder_matches_python_merge():
    from orama_core_tpu.index import CommittedStringIndex, UncommittedStringIndex

    docs = {
        0: (2, {"apple": [0], "banana": [1]}),
        1: (3, {"apple": [0, 1], "cherry": [2]}),
        2: (1, {"banana": [0]}),
    }
    # python path
    unc = UncommittedStringIndex()
    for d, (fl, terms) in docs.items():
        unc.insert(d, fl, terms)
    py = CommittedStringIndex.empty().merge(unc, capacity=8)

    # native path
    b = native.NativePostingBuilder()
    for d, (fl, terms) in docs.items():
        b.insert(d, fl, list(terms.items()))
    terms, term_starts, post_docs, post_tf, pos_starts, positions, n_docs, total_len = b.pack()

    assert terms == py.term_dict.terms
    assert term_starts.tolist() == py.term_starts.tolist()
    assert post_docs.tolist() == py.post_docs.tolist()
    assert post_tf.tolist() == py.post_tf.tolist()
    assert pos_starts.tolist() == py.pos_starts.tolist()
    assert positions.tolist() == py.positions.tolist()
    assert n_docs == py.n_docs_with_field
    assert total_len == py.total_len


def test_native_tokenizer_positions():
    out = native.tokenize_and_stem_en("cats chase cats")
    # "cats" at positions 0 and 2, stem "cat" attached to each
    assert out[0] == ("cats", ["cat"])
    assert out[1][0] == "chase"
    assert out[2] == ("cats", ["cat"])


def test_native_gate_routes_divergent_text_to_python(tmp_engine):
    """Docs whose text the native EN tokenizer would tokenize differently
    from the Python QUERY-side pipeline (ß splits, Vietnamese stays
    unfolded, em-dash joins words) must be indexed via the Python path —
    otherwise their terms are unreachable by any query."""
    from orama_core_tpu import native
    from orama_core_tpu.types import SearchParams

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    assert native.en_safe("plain ascii text")
    assert native.en_safe("café élève")       # agreement verified by probe
    for t in ("straße", "Nguyễn", "a—b"):
        assert not native.en_safe(t), t

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    e.write_side.write(
        "c",
        [
            {"id": "1", "body": "die straße nach Nguyễn"},
            {"id": "2", "body": "plain ascii document"},
        ],
        "wk",
    )
    e.flush()
    for term, want in (("straße", "1"), ("Nguyễn", "1"), ("plain", "2")):
        res = e.read_side.search(
            "c", SearchParams.from_json({"term": term, "mode": "fulltext"}),
            "rk",
        )
        assert {h.id for h in res.hits} == {want}, (term, res.hits)
    # committed path too
    e.commit()
    res = e.read_side.search(
        "c", SearchParams.from_json({"term": "straße"}), "rk"
    )
    assert {h.id for h in res.hits} == {"1"}


def test_native_index_docs_batch_matches_single():
    """index_docs_en (one ctypes call per batch) must agree exactly with
    per-doc index_doc_en across empty docs, stop-word-only docs, repeats,
    and multi-term position groups."""
    import random

    rng = random.Random(7)
    words = (
        "search engine vector index the and running runner ran café "
        "hello world quick brown fox"
    ).split()
    texts = [
        " ".join(rng.choices(words, k=rng.randint(0, 30))) for _ in range(200)
    ]
    texts += ["", "   ", "the and of", "hello hello hello", texts[0]]
    single = [native.index_doc_en(t) for t in texts]
    assert native.index_docs_en(texts) == single
    assert native.index_docs_en([]) == []


def test_prepare_native_terms_used_by_write(tmp_engine):
    """The write batch pre-pass must produce identical index state to the
    per-doc native path (same op payloads -> same search results)."""
    from orama_core_tpu.types import SearchParams

    e = tmp_engine
    e.write_side.create_collection("master", "c", "rk", "wk")
    docs = [
        {"id": "1", "title": "search engines", "body": "the quick brown fox"},
        {"id": "2", "title": "vector databases", "body": "fox ran quickly"},
        {"id": "3", "title": "straße", "body": "non-native-safe text ß"},
    ]
    c = e.write_side._collection("c")
    prepared = c.prepare_native_terms(docs)
    assert prepared is not None
    # native-eligible texts are present; the ß text is excluded (en_safe gate)
    assert "the quick brown fox" in prepared
    assert all("ß" not in k for k in prepared)
    terms, flen = prepared["the quick brown fox"]
    # "the" is a stop word: quick(0) brown(1) fox(2) -> field length 3
    assert flen == 3 and "quick" in terms and "fox" in terms
    # end-to-end: batch write (uses the pre-pass) matches expectations
    e.write_side.write("c", docs, "wk")
    e.flush()
    for term, want in (("quick", {"1", "2"}), ("straße", {"3"})):
        res = e.read_side.search(
            "c", SearchParams.from_json({"term": term, "mode": "fulltext"}), "rk"
        )
        assert {h.id for h in res.hits} == want, (term, res.hits)
