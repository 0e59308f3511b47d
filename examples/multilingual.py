"""Multilingual search example: per-locale analysis pipelines and
query-side stem expansion.

Demonstrates three locales where surface-prefix matching alone (the
reference's query behavior, collection.rs:928) would miss, and how the
engine's exact-stem expansion recovers them:

- Greek: ΕΛΛΗΝΙΚΑ finds ΕΛΛΗΝΙΚΟΣ via the shared Ntais stem
- Tamil:  மரம் finds both the oblique (மரத்தில்)
  and the plural (மரங்கள்)
- Turkish: kitabı (accusative, devoiced b) finds kitap

Run: JAX_PLATFORMS=cpu python examples/multilingual.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from orama_core_tpu import build_orama
from orama_core_tpu.config import OramaxConfig
from orama_core_tpu.types import SearchParams

MASTER = "master"  # OramaxConfig default master key


def main() -> None:
    cfg = OramaxConfig()
    d = tempfile.mkdtemp()
    cfg.writer_side.data_dir = d + "/w"
    cfg.reader_side.data_dir = d + "/r"
    e = build_orama(cfg, start_background=False)

    corpora = {
        "el": [
            {"id": "1", "title": "τα σώματα των ανθρώπων"},
            {"id": "2", "title": "ελληνικός πολιτισμός"},
            {"id": "3", "title": "η ελληνική θάλασσα"},
        ],
        "ta": [
            {"id": "1", "title": "மரத்தில் பறவை"},
            {"id": "2", "title": "மரங்கள் வளரும்"},
        ],
        "tr": [
            {"id": "1", "title": "kitap okudum"},
            {"id": "2", "title": "kitaplar masada"},
        ],
    }
    for loc, docs in corpora.items():
        e.write_side.create_collection(
            MASTER, loc, f"r-{loc}", f"w-{loc}", language=loc
        )
        e.write_side.write(loc, docs, f"w-{loc}")
    e.flush()

    queries = {
        "el": ["σώμα", "ελληνικά"],
        "ta": ["மரம்"],
        "tr": ["kitabı"],
    }
    for loc, terms in queries.items():
        for t in terms:
            r = e.read_side.search(
                loc, SearchParams.from_json({"term": t}), f"r-{loc}"
            )
            ids = [h.id for h in r.hits]
            print(f"[{loc}] {t!r:>14} -> {r.count} hits {ids}")
    e.commit()
    # committed path produces the same matches
    r = e.read_side.search(
        "el", SearchParams.from_json({"term": "ελληνικά"}), "r-el"
    )
    assert r.count >= 1, "committed stem expansion must still match"
    print("committed-path expansion OK")


if __name__ == "__main__":
    main()
