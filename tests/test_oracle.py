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


def _oracle_bm25(docs_tokens, query_token, k1=1.2, b=0.75):
    """Single-field, single-token BM25 with prefix expansion over ALL terms
    (incl. stems, which share positions with their originals)."""
    # term -> doc -> tf  (match engine: original + stem at same positions)
    parser = TextParser("en")
    postings = {}
    doc_lens = {}
    for doc_id, text in docs_tokens.items():
        data = parser.tokenize_and_stem(text)
        doc_lens[doc_id] = len(data)
        for pos, (orig, stems) in enumerate(data):
            for t in [orig] + stems:
                postings.setdefault(t, {}).setdefault(doc_id, 0)
                postings[t][doc_id] += 1
    n = len(doc_lens)
    avgdl = sum(doc_lens.values()) / max(n, 1)
    scores = {}
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

    def check(stage):
        for q in queries:
            expected = _oracle_bm25(docs, q)
            res = tmp_engine.read_side.search(
                "c", SearchParams.from_json({"term": q, "limit": 30}), READ
            )
            got = {h.id: h.score for h in res.hits}
            assert set(got) == set(expected), (stage, q, got, expected)
            for doc_id, s in expected.items():
                assert abs(got[doc_id] - s) < 1e-3, (stage, q, doc_id)

    check("uncommitted")   # host-window scoring path
    tmp_engine.commit()
    check("committed")     # device span-resolved CSR path
