"""Vector field index: packed normalized matrix + doc map.

Replaces the reference's HNSW graph (`committed/vector.rs`, hora crate) and
brute-force uncommitted scan (`uncommitted/vector.rs`). Committed vectors
live as one row-major [P, D] matrix (bf16 on device) with ``vec_docs``
mapping rows to documents (multi-vector docs supported, as in the reference
where a doc stores ``Vec<Vec<f32>>``). Exact search is an MXU matmul +
segment accumulation (ops/vector.py); IVF/PQ acceleration layers on top of
the same layout (ops/ivf.py, ops/pq.py)."""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    return (m / np.maximum(n, 1e-12)).astype(np.float32)


class UncommittedVectorIndex:
    def __init__(self, dimension: int) -> None:
        self.dimension = dimension
        self.entries: List[Tuple[int, np.ndarray]] = []  # (doc, [k, D] normalized)

    @property
    def is_empty(self) -> bool:
        return not self.entries

    def insert(self, doc_id: int, vectors: Sequence[Sequence[float]]) -> None:
        m = np.asarray(vectors, dtype=np.float32)
        if m.ndim == 1:
            m = m[None, :]
        if m.shape[-1] != self.dimension:
            raise ValueError(
                f"vector dim {m.shape[-1]} != field dim {self.dimension}"
            )
        self.entries.append((doc_id, _normalize(m)))

    def remove_docs(self, doc_ids: Set[int]) -> None:
        self.entries = [(d, m) for d, m in self.entries if d not in doc_ids]

    def search(
        self,
        query: np.ndarray,
        filter_mask: Optional[np.ndarray],
        deleted: Optional[Set[int]],
        out: Dict[int, float],
    ) -> None:
        """Host brute-force over the freshness window (small by construction).
        Scores: sum of relu(cosine) over the doc's vectors (the reference
        sums per-vector scores too, uncommitted/vector.rs:44-56)."""
        q = query.astype(np.float32)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        for doc_id, m in self.entries:
            if deleted and doc_id in deleted:
                continue
            if filter_mask is not None and filter_mask[doc_id] == 0:
                continue
            sims = m @ q
            s = float(np.maximum(sims, 0.0).sum())
            if s > 0.0:
                out[doc_id] = out.get(doc_id, 0.0) + s


@dataclasses.dataclass
class CommittedVectorIndex:
    dimension: int
    vecs: np.ndarray      # float32[P, D] normalized (bf16 cast on device)
    vec_docs: np.ndarray  # int32[P]

    @staticmethod
    def empty(dimension: int) -> "CommittedVectorIndex":
        return CommittedVectorIndex(
            dimension=dimension,
            vecs=np.zeros((0, dimension), dtype=np.float32),
            vec_docs=np.zeros(0, dtype=np.int32),
        )

    @property
    def n_vectors(self) -> int:
        return len(self.vec_docs)

    @property
    def is_empty(self) -> bool:
        return self.n_vectors == 0

    def merge(
        self, uncommitted: UncommittedVectorIndex, deleted: Optional[Set[int]] = None
    ) -> "CommittedVectorIndex":
        deleted = deleted or set()
        keep = (
            ~np.isin(self.vec_docs, list(deleted))
            if deleted and len(self.vec_docs)
            else slice(None)
        )
        parts_v = [self.vecs[keep]]
        parts_d = [self.vec_docs[keep]]
        for doc_id, m in uncommitted.entries:
            if doc_id in deleted:
                continue
            parts_v.append(m)
            parts_d.append(np.full(len(m), doc_id, dtype=np.int32))
        vecs = np.concatenate(parts_v) if parts_v else np.zeros((0, self.dimension), np.float32)
        docs = np.concatenate(parts_d) if parts_d else np.zeros(0, np.int32)
        return CommittedVectorIndex(
            dimension=self.dimension, vecs=vecs.astype(np.float32), vec_docs=docs.astype(np.int32)
        )

    def to_arrays(self) -> Dict[str, np.ndarray]:
        return {
            "vecs": self.vecs,
            "vec_docs": self.vec_docs,
            "dim": np.asarray([self.dimension], dtype=np.int64),
        }

    @staticmethod
    def from_arrays(arrays: Dict[str, np.ndarray]) -> "CommittedVectorIndex":
        return CommittedVectorIndex(
            dimension=int(arrays["dim"][0]),
            vecs=arrays["vecs"].astype(np.float32),
            vec_docs=arrays["vec_docs"].astype(np.int32),
        )
