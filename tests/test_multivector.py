"""Long-document chunking -> multi-vector docs (SURVEY §5 long-context)."""

from orama_core_tpu.types import SearchParams

MASTER, READ, WRITE = "master", "read-key", "write-key"


def test_long_doc_gets_multiple_vectors(tmp_engine):
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.flush()
    long_body = " ".join(
        f"segment {i} about renewable solar energy systems" for i in range(400)
    )
    tmp_engine.write_side.write(
        "c",
        [
            {"id": "long", "body": long_body},
            {"id": "short", "body": "one short note about cooking"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    reader = tmp_engine.read_side.collections["c"]
    vf = next(iter(reader._vector.values()))
    per_doc = {}
    for doc_id, m in vf.uncommitted.entries:
        per_doc[doc_id] = per_doc.get(doc_id, 0) + len(m)
    counts = sorted(per_doc.values())
    assert counts[0] == 1          # short doc: one vector
    assert counts[-1] > 1          # long doc: chunked into several
    # bounded by the token budget: ~ceil(doc_tokens / model budget) chunks
    # (chunks never overflow the budget — they used to pack up to ~2x)
    from orama_core_tpu.models.registry import model_info
    from orama_core_tpu.nlp import approx_token_count

    budget = model_info("fake-small").max_input_tokens
    assert counts[-1] <= -(-approx_token_count(long_body) // budget) + 1

    # multi-vector doc still searchable (scores sum across chunks)
    res = tmp_engine.read_side.search(
        "c", SearchParams.from_json({"term": "solar energy", "mode": "vector"}), READ
    )
    assert res.hits[0].id == "long"

    # survives commit (vectors merge into the packed committed matrix)
    tmp_engine.commit()
    res = tmp_engine.read_side.search(
        "c", SearchParams.from_json({"term": "solar energy", "mode": "vector"}), READ
    )
    assert res.hits[0].id == "long"


def test_10k_token_doc_retrievable_by_tail_chunk(tmp_engine):
    """VERDICT r2 item 10 'done' criterion: a ~10k-token doc auto-chunks
    into N vectors and content that exists ONLY in the tail chunk still
    retrieves the doc (the tail's embedding carries the signal; a
    truncating pipeline would lose it)."""
    tmp_engine.write_side.create_collection(MASTER, "c", READ, WRITE)
    tmp_engine.flush()
    head = " ".join(
        f"filler paragraph {i} about miscellaneous office logistics"
        for i in range(1400)
    )  # ~9.8k tokens of filler
    tail = (
        "zyxwult quorblatt flembar is the secret launch codename "
        "zyxwult quorblatt flembar"
    )
    tmp_engine.write_side.write(
        "c",
        [
            {"id": "long", "body": head + " " + tail},
            {"id": "other", "body": "a short note about office logistics"},
        ],
        WRITE,
    )
    tmp_engine.flush()
    reader = tmp_engine.read_side.collections["c"]
    vf = next(iter(reader._vector.values()))
    n_vecs = sum(len(m) for d, m in vf.uncommitted.entries)
    assert n_vecs > 2  # long doc chunked into several vectors

    res = tmp_engine.read_side.search(
        "c",
        SearchParams.from_json(
            {"term": "zyxwult quorblatt flembar", "mode": "vector"}
        ),
        READ,
    )
    assert res.hits and res.hits[0].id == "long"
    # and after commit (packed committed matrix keeps every chunk row)
    tmp_engine.commit()
    res = tmp_engine.read_side.search(
        "c",
        SearchParams.from_json(
            {"term": "zyxwult quorblatt flembar", "mode": "vector"}
        ),
        READ,
    )
    assert res.hits and res.hits[0].id == "long"
