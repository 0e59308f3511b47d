from orama_core_tpu.nlp import (
    Chunker,
    TextParser,
    approx_token_count,
    fold_diacritics,
    porter_stem,
)


def test_tokenize_basic():
    p = TextParser("en")
    assert p.tokenize("The quick brown fox!") == ["quick", "brown", "fox"]


def test_tokenize_stop_words_removed():
    p = TextParser("en")
    assert "the" not in p.tokenize("the and of")
    assert p.tokenize("the and of") == []


def test_tokenize_diacritics_folded():
    p = TextParser("fr")
    toks = p.tokenize("café élève")
    assert toks == ["cafe", "eleve"]


def test_fold_diacritics():
    assert fold_diacritics("àéîõü") == "aeiou"


def test_tokenize_and_stem_positions():
    p = TextParser("en")
    out = p.tokenize_and_stem("running dogs")
    # each entry: (original, [stem]) with stem omitted when identical
    assert out[0][0] == "running" and out[0][1] == ["run"]
    assert out[1][0] == "dogs" and out[1][1] == ["dog"]


def test_porter_stemmer_classics():
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "sing": "sing",
        "conflated": "conflat",
        "happy": "happi",
        "relational": "relat",
        "conditional": "condit",
        "rational": "ration",
        "triplicate": "triplic",
        "formative": "form",
        "formalize": "formal",
        "revival": "reviv",
        "allowance": "allow",
        "inference": "infer",
        "probate": "probat",
        "controll": "control",
        "roll": "roll",
    }
    for word, stem in cases.items():
        assert porter_stem(word) == stem, (word, porter_stem(word), stem)


def test_light_stemmers_collapse_inflections():
    from orama_core_tpu.nlp.stemmer import get_stemmer

    cases = {
        "fr": [("chanteurs", "chanteuse"), ("nations", "nation")],
        "es": [("gatos", "gato"), ("rapidos", "rapida")],
        "de": [("kindern", "kinder"), ("schnellen", "schnelle")],
        "it": [("gatti", "gatto"), ("nazioni", "nazione")],
        "pt": [("gatos", "gato"), ("rapidas", "rapido")],
    }
    for locale, pairs in cases.items():
        stem = get_stemmer(locale)
        assert stem is not None, locale
        for a, b in pairs:
            sa, sb = stem(a), stem(b)
            # both inflections reduce toward a shared prefix stem
            assert sa[:3] == sb[:3], (locale, a, b, sa, sb)
            assert len(sa) < len(a), (locale, a, sa)


def test_stemmed_search_cross_inflection(tmp_engine):
    tmp_engine.write_side.create_collection(
        "master", "es", "r", "w", language="es"
    )
    tmp_engine.write_side.write(
        "es", [{"id": "1", "t": "los gatos negros"}], "w"
    )
    tmp_engine.flush()
    from orama_core_tpu.types import SearchParams

    res = tmp_engine.read_side.search(
        "es", SearchParams.from_json({"term": "gato"}), "r"
    )
    assert res.count == 1  # singular query matches plural doc via stem


def test_cjk_tokenize():
    p = TextParser("zh")
    assert p.tokenize("你好世界 hello") == ["你", "好", "世", "界", "hello"]


def test_chunker_short_text_is_single_chunk():
    c = Chunker(max_tokens=128)
    assert c.chunk_text("hello world") == ["hello world"]


def test_chunker_splits_long_text():
    c = Chunker(max_tokens=10)
    text = ". ".join(f"sentence number {i} is here" for i in range(20)) + "."
    chunks = c.chunk_text(text)
    assert len(chunks) > 1
    for ch in chunks:
        assert approx_token_count(ch) <= 15  # small tolerance over budget


def test_chunker_markdown_heading_boundaries():
    c = Chunker(max_tokens=50)
    md = "# Title\nintro text\n\n## Section\nbody text"
    chunks = c.chunk_markdown(md)
    assert any(ch.startswith("# Title") for ch in chunks)
    assert any(ch.startswith("## Section") for ch in chunks)
