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
    # 你/好 are in the zh stop-word table (reference stop_words/zh.txt);
    # remaining characters tokenize per-char
    assert p.tokenize("你好世界 hello") == ["世", "界", "hello"]


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


def test_snowball_stemmer_vectors():
    """Snowball-correct stemming for the reference's stemmer locales
    (nlp/mod.rs:35-108) — golden vectors from the canonical Snowball
    algorithms (VERDICT r1 item 8)."""
    from orama_core_tpu.nlp.stemmer import get_stemmer

    vectors = {
        "fr": {"continuation": "continu", "majestueusement": "majestu",
               "chanterions": "chant", "mangeaient": "mang",
               "nationale": "national"},
        "de": {"aufgabe": "aufgab", "häuser": "haus", "kategorie": "kategori"},
        "es": {"corriendo": "corr", "nacionalidad": "nacional",
               "cantaría": "cant", "rápidamente": "rapid"},
        "it": {"abbandonata": "abbandon", "nazionalizzazione": "nazionalizz",
               "parlando": "parl", "bellissimo": "bellissim"},
        "pt": {"nacionalidade": "nacional", "correndo": "corr",
               "bonitas": "bonit"},
        "en": {"running": "run", "generously": "generous",
               "nationalization": "nation", "flies": "fli"},
        "ru": {"бегающий": "бега", "национальность": "национальн"},
        "nl": {"lichamelijkheden": "licham", "opgave": "opgav"},
        "sv": {"klokaste": "klok", "intressantare": "intressant"},
    }
    for locale, cases in vectors.items():
        stem = get_stemmer(locale)
        assert stem is not None, locale
        for word, expected in cases.items():
            assert stem(word) == expected, (locale, word, stem(word), expected)


def test_stop_word_tables_cover_reference_locales():
    """33 locales have non-empty tables (reference build.rs:6-76)."""
    from orama_core_tpu.nlp.stop_words import stop_words

    locales = (
        "ar bg da de el en es et fi fr ga hi hu hy id it jp ko lt ne nl no "
        "pt ro ru sa sl sr sv ta tr uk zh"
    ).split()
    assert len(locales) == 33
    for loc in locales:
        if loc == "sa":
            continue  # the reference's sa.txt is itself empty
        assert len(stop_words(loc)) > 0, loc
    # spot checks
    assert "le" in stop_words("fr")
    assert "और" in stop_words("hi") or len(stop_words("hi")) > 50
    assert "og" in stop_words("da")


def test_non_en_bm25_oracle_french(tmp_engine):
    """BM25 oracle in a non-EN locale: the French pipeline (stop words +
    Snowball stemming) must produce reference-formula scores end-to-end."""
    import math

    from orama_core_tpu.nlp import TextParser
    from orama_core_tpu.types import SearchParams

    docs = {
        "1": "les chanteurs chanterions une continuation majestueusement",
        "2": "nous mangeaient la continuation nationale",
        "3": "le chat dort sur la table",
        "4": "chanteront demain une chanson nationale",
    }
    tmp_engine.write_side.create_collection(
        "master", "c", "rk", "wk", language="fr"
    )
    tmp_engine.write_side.write(
        "c", [{"id": k, "body": v} for k, v in docs.items()], "wk"
    )
    tmp_engine.flush()

    parser = TextParser("fr")

    def oracle(q, q_stems, k1=1.2, b=0.75):
        postings, doc_lens = {}, {}
        for doc_id, text in docs.items():
            data = parser.tokenize_and_stem(text)
            doc_lens[doc_id] = len(data)
            for pos, (orig, stems) in enumerate(data):
                for t in [orig] + stems:
                    postings.setdefault(t, {}).setdefault(doc_id, 0)
                    postings[t][doc_id] += 1
        n = len(doc_lens)
        avgdl = sum(doc_lens.values()) / n
        scores = {}
        for term, dd in postings.items():
            # engine semantics: surface-token PREFIX match plus the
            # query stems matched EXACTLY (query_expansion docstring)
            if not term.startswith(q) and term not in q_stems:
                continue
            ni = len(dd)
            idf = math.log1p((n - ni + 0.5) / (ni + 0.5))
            for doc_id, tf in dd.items():
                dl = doc_lens[doc_id]
                denom = tf + k1 * (1 - b + b * dl / avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (k1 + 1) / denom
        return scores

    for stage in ("uncommitted", "committed"):
        for q_raw in ("continuation", "chanterions", "nationale"):
            q = parser.tokenize(q_raw)[0]
            q_stems = {s for _, ss in parser.tokenize_and_stem(q_raw)
                       for s in ss}
            expected = oracle(q, q_stems)
            res = tmp_engine.read_side.search(
                "c", SearchParams.from_json({"term": q_raw, "limit": 10}), "rk"
            )
            got = {h.id: h.score for h in res.hits}
            assert set(got) == set(expected), (stage, q_raw, got, expected)
            for doc_id, s in expected.items():
                assert abs(got[doc_id] - s) < 1e-3, (stage, q_raw, doc_id)
        tmp_engine.commit()


def test_extra_stemmer_turkish_families():
    """TR/EL/TA stemmers (no NLTK Snowball port exists — implemented from
    the published algorithm structure, stemmer_extra.py). What BM25 needs
    is CONSISTENT conflation: every inflection of a family must land on
    one stem. Vectors are hand-derived and lock current behavior."""
    from orama_core_tpu.nlp.stemmer_extra import turkish_stem

    families = [
        ["kitap", "kitabı", "kitaplar", "kitapları", "kitaba",
         "kitaplarımızdan"],
        ["ev", "evler", "eve", "evde", "evlerinden", "evlerimizde",
         "evdeki", "evini"],
        ["araba", "arabalar", "arabayı", "arabada"],
        ["kedi", "kedisi", "kedisini"],
        ["öğrenci", "öğrenciler", "öğrenciyiz"],
        ["okul", "okulda", "okuldan"],
        ["sokak", "sokakta", "sokaktaki"],
        ["deniz", "denizde"],
        ["öğretmen", "öğretmenim", "öğretmensiniz"],
        ["kapı", "kapıyı", "kapısında"],
    ]
    for fam in families:
        stems = {turkish_stem(w) for w in fam}
        assert len(stems) == 1, (fam, stems)
    # exact spot checks (incl. devoicing restore and the -ki chain)
    assert turkish_stem("kitabı") == "kitap"
    assert turkish_stem("ağacı") == "ağaç"
    assert turkish_stem("sokaktaki") == "sokak"
    assert turkish_stem("güzeldir") == "güzel"
    assert turkish_stem("doktormuş") == "doktor"
    # lexical -ki words don't lose the ki (the final-vowel accusative
    # strip still applies, consistently with their inflections)
    assert turkish_stem("eski") == turkish_stem("eskiler") == "esk"


def test_extra_stemmer_greek_tamil():
    from orama_core_tpu.nlp.stemmer_extra import greek_stem, tamil_stem

    # Greek: noun/verb/-μα/diminutive families conflate; tonos folded
    assert greek_stem("άνθρωπος") == greek_stem("ανθρώπου") == \
        greek_stem("άνθρωποι") == greek_stem("ανθρώπων") == "ανθρωπ"
    assert greek_stem("θάλασσες") == greek_stem("θάλασσα")
    # final sigma normalization
    assert greek_stem("λόγος") == greek_stem("λόγοι")
    # -μα extended-stem nouns (rule 21 folds ματα/ματων/ματοσ to μα,
    # then the final-ending pass strips the α — the full algorithm's
    # behavior, replacing the light stemmer's stop-at-μα)
    assert greek_stem("σώμα") == greek_stem("σώματα") == \
        greek_stem("σωμάτων") == greek_stem("σώματος") == "σωμ"
    # verb person endings incl. passive aorist
    assert greek_stem("γράφω") == greek_stem("γράφουμε") == \
        greek_stem("γράφετε") == "γραφ"
    assert greek_stem("αγαπήθηκα") == greek_stem("αγαπήθηκαν")
    # Tamil: plural + case endings strip
    assert tamil_stem("புத்தகங்கள்") == tamil_stem("புத்தகங்களில்")
    assert tamil_stem("மரங்களை") == tamil_stem("மரங்கள்")


def test_greek_full_ntais_structure():
    """Full-algorithm behaviors the light stemmer could not produce:
    rule-0 irregulars, re-append exception sets, oblique/nominative
    conflation across rules, and the documented -ικ deviation."""
    from orama_core_tpu.nlp.stemmer_extra import greek_stem

    # rule 0: irregular oblique stems (incl. a 3-letter member)
    assert greek_stem("φως") == greek_stem("φώτα") == \
        greek_stem("φώτων") == "φω"
    assert greek_stem("κρέας") == greek_stem("κρέατα") == "κρε"
    assert greek_stem("καθεστώς") == greek_stem("καθεστώτα") == "καθεστ"
    # rule 1 re-append: kinship -αδ- plurals keep αδ
    assert greek_stem("γιαγιάδες") == "γιαγιαδ"
    assert greek_stem("ομάδες") == "ομ"  # not in the exception set
    # rule 5 vowel condition: ι kept after a vowel stem
    assert greek_stem("σχολείο") == greek_stem("σχολείου") == "σχολει"
    assert greek_stem("βιβλίο") == greek_stem("βιβλία") == "βιβλ"
    # -ικ conflation deviation: exceptions keep ικ on BOTH paths
    assert greek_stem("ελληνικά") == greek_stem("ελληνικός") == "ελλην"
    assert greek_stem("φυσικά") == greek_stem("φυσικός") == "φυσικ"
    # genitive plural -ων (final-ending list)
    assert greek_stem("δρόμων") == greek_stem("δρόμος") == "δρομ"
    # comparatives (rule 22)
    assert greek_stem("γρηγορότερος") == "γρηγορ"
    # passive aorist + imperfect verb families
    assert greek_stem("μίλησα") == greek_stem("μιλήσαμε") == "μιλ"


def test_indic_tokenization_keeps_words_whole():
    """Combining marks are not \\w, so a bare [^\\w]+ split fragments
    Tamil/Devanagari words at their vowel signs — the reference's own
    per-locale classes have the same bug (locales.rs:233 TA excludes
    U+0BBE..U+0BCD). The split pattern and fold_diacritics must keep
    Indic orthography intact while still folding Latin/Greek accents."""
    from orama_core_tpu.nlp.tokenizer import fold_diacritics, get_parser

    ta = get_parser("ta")
    assert ta.tokenize("மரத்தில் பறவை") == [
        "மரத்தில்", "பறவை"
    ]
    hi = get_parser("hi")
    assert hi.tokenize("किताबें अच्छी") == [
        "किताबें", "अच्छी"
    ]
    assert fold_diacritics("மரம்") == "மரம்"
    assert fold_diacritics("café") == "cafe"
    assert fold_diacritics("ώρα") == "ωρα"


def test_query_stem_expansion_cross_inflection(tmp_engine):
    """The reference's query path resolves only surface-token prefixes
    (collection.rs:928), so a query inflection that is not a surface
    prefix of the indexed form misses. The engine adds exact-stem
    resolution (collection_read.query_expansion): ΕΛΛΗΝΙΚΑ finds
    ΕΛΛΗΝΙΚΟΣ via the shared stem, both uncommitted and committed."""
    from orama_core_tpu.types import SearchParams

    tmp_engine.write_side.create_collection(
        "master", "el", "rk", "wk", language="el"
    )
    tmp_engine.write_side.write("el", [
        {"id": "1", "title": "ελληνικός πολιτισμός"},
        {"id": "2", "title": "τα ελληνικά νησιά"},
    ], "wk")
    tmp_engine.flush()
    for stage in ("uncommitted", "committed"):
        r = tmp_engine.read_side.search(
            "el", SearchParams.from_json({"term": "ελληνικά"}), "rk"
        )
        ids = sorted(h.id for h in r.hits)
        assert ids == ["1", "2"], (stage, ids)
        # the same-inflection doc ranks first (surface + stem match)
        assert r.hits[0].id == "2", (stage, [(h.id, h.score) for h in r.hits])
        tmp_engine.commit()


def test_tamil_snowball_structure():
    """Oblique-stem restoration and outermost-first stripping the flat
    suffix list could not produce."""
    from orama_core_tpu.nlp.stemmer_extra import tamil_stem

    # -am nouns: nasal-assimilated plural and த்த- oblique restore ம்
    assert tamil_stem("மரம்") == tamil_stem("மரங்கள்") == \
        tamil_stem("மரத்தில்") == tamil_stem("மரங்களை")
    # geminating -u nouns: வீடு -> வீட்டில்
    assert tamil_stem("வீடு") == tamil_stem("வீட்டில்") == \
        tamil_stem("வீடுகள்")
    assert tamil_stem("ஆறு") == tamil_stem("ஆற்றில்")
    # case + plural stacked (outermost stripped first)
    assert tamil_stem("புத்தகம்") == \
        tamil_stem("புத்தகங்களில்")
    # verb tense endings conflate person/gender
    assert tamil_stem("படிக்கிறான்") == \
        tamil_stem("படிக்கிறாள்")


def test_get_stemmer_covers_all_reference_stemmer_locales():
    """All 17 reference stemmer locales (nlp/mod.rs:36-104) now resolve
    to a real stemmer — 14 NLTK Snowball + TR/EL/TA from stemmer_extra."""
    from orama_core_tpu.nlp.stemmer import get_stemmer

    locales = ["ar", "da", "de", "en", "el", "es", "fr", "hu", "it", "nl",
               "no", "pt", "ro", "ru", "sv", "ta", "tr"]
    for loc in locales:
        fn = get_stemmer(loc)
        assert fn is not None, loc
        assert isinstance(fn("test"), str), loc


def test_khmer_words_stay_whole():
    """Khmer (an abugida whose dependent vowels and coeng subscripts are
    combining marks) must tokenize whole words — the same fragmentation
    bug fixed for Tamil/Devanagari applies to the U+1780 block."""
    from orama_core_tpu.nlp.tokenizer import TextParser, fold_diacritics

    p = TextParser("km")
    assert p.tokenize("សៀវភៅ សម្រាប់ កុមារ") == ["សៀវភៅ", "សម្រាប់", "កុមារ"]
    # coeng (ccc=9 combining) is orthography and survives the fold
    assert fold_diacritics("សម្រាប់") == "សម្រាប់"


def test_full_language_names_accepted():
    """The reference's FromStr (and its own docs) accept full names like
    "english"/"french" alongside ISO codes (locales.rs:124-157)."""
    from orama_core_tpu.nlp import get_parser, normalize_locale

    assert normalize_locale("english") == "en"
    assert normalize_locale("FRENCH") == "fr"
    assert normalize_locale("chinese") == "zh"
    assert get_parser("english").tokenize_and_stem("running")[0][1] == ["run"]
    import pytest

    with pytest.raises(ValueError):
        normalize_locale("klingon")
