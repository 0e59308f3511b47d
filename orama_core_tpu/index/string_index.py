"""Full-text (BM25) field index: uncommitted host buffers + committed CSR.

Mirrors the committed/uncommitted split of the reference
(`uncommitted/string.rs`, `committed/string.rs`) with a TPU-native layout:

- **Uncommitted**: plain host dicts (term -> doc -> positions) — the
  freshness window between commits (the reference's radix trie). Searched on
  host (windows are small by construction); folded into CSR at commit.
- **Committed**: immutable CSR arrays over a sorted term dictionary —
  term id ranges from prefix search are contiguous, so each query token maps
  to ONE flat posting span scored by the device kernel (ops/bm25.py).

Both segments share GlobalInfo (total docs-with-field, total length) so BM25
accumulates identically to the reference (`collection.rs:930-951`).

Deviations from the reference (deliberate, documented):
- doc "field length" is the token count and total length accumulates once
  per document (the reference stores max position as the length,
  uncommitted/string.rs:87-93, and adds the length once per *term*,
  :103 — both upstream quirks).
- committed phrase adjacency counts `second - first == 1` (the reference's
  `< 1` window can never fire on deduped sorted positions).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

import numpy as np

from ..utils import bucket_pad, flatten_ranges
from .term_dict import TermDict


@dataclasses.dataclass
class GlobalInfo:
    total_documents: int = 0
    total_document_length: int = 0

    def __add__(self, other: "GlobalInfo") -> "GlobalInfo":
        return GlobalInfo(
            self.total_documents + other.total_documents,
            self.total_document_length + other.total_document_length,
        )

    @property
    def avgdl(self) -> float:
        if self.total_documents == 0:
            return 1.0
        return self.total_document_length / self.total_documents


K1 = 1.2
B = 0.75


class UncommittedStringIndex:
    """Host-side freshness window for one text field."""

    def __init__(self) -> None:
        # term -> doc_id -> positions (list, append order)
        self.terms: Dict[str, Dict[int, List[int]]] = {}
        self.doc_lens: Dict[int, int] = {}
        self.total_len = 0
        self._sorted_terms: Optional[List[str]] = None

    def __len__(self) -> int:
        return len(self.doc_lens)

    @property
    def is_empty(self) -> bool:
        return not self.doc_lens

    def global_info(self) -> GlobalInfo:
        return GlobalInfo(len(self.doc_lens), self.total_len)

    def insert(self, doc_id: int, field_length: int, terms: Dict[str, Sequence[int]]) -> None:
        if doc_id not in self.doc_lens:
            self.doc_lens[doc_id] = field_length
            self.total_len += field_length
        new_term = False
        for term, positions in terms.items():
            bucket = self.terms.get(term)
            if bucket is None:
                bucket = self.terms[term] = {}
                new_term = True
            bucket.setdefault(doc_id, []).extend(positions)
        if new_term:
            self._sorted_terms = None

    def remove_docs(self, doc_ids: Set[int]) -> None:
        for doc_id in doc_ids:
            if doc_id in self.doc_lens:
                self.total_len -= self.doc_lens.pop(doc_id)
        for term in list(self.terms):
            bucket = self.terms[term]
            for d in doc_ids:
                bucket.pop(d, None)
            if not bucket:
                del self.terms[term]
                self._sorted_terms = None

    def _sorted(self) -> List[str]:
        if self._sorted_terms is None:
            self._sorted_terms = sorted(self.terms)
        return self._sorted_terms

    def prefix_terms(self, prefix: str) -> List[str]:
        import bisect

        st = self._sorted()
        lo = bisect.bisect_left(st, prefix)
        hi = bisect.bisect_left(st, prefix + "\U0010ffff")
        return st[lo:hi]

    def search(
        self,
        tokens: Sequence[str],
        boost: float,
        global_info: GlobalInfo,
        filter_mask: Optional[np.ndarray],
        deleted: Optional[Set[int]],
        out: Dict[int, float],
    ) -> None:
        """BM25 host scoring, accumulated into ``out`` (doc -> score).

        Matches uncommitted/string.rs:124-193: prefix-expanded term match,
        ni from this segment only, avgdl/N from the shared global info, no
        phrase boost in the uncommitted window."""
        if not self.terms:
            return
        avgdl = max(global_info.avgdl, 1e-9)
        n = float(global_info.total_documents)
        for token in tokens:
            for term in self.prefix_terms(token):
                postings = self.terms[term]
                ni = len(postings)
                idf = float(np.log1p((n - ni + 0.5) / (ni + 0.5)))
                for doc_id, positions in postings.items():
                    if deleted and doc_id in deleted:
                        continue
                    if filter_mask is not None and filter_mask[doc_id] == 0:
                        continue
                    dl = self.doc_lens.get(doc_id)
                    if dl is None:
                        continue
                    tf = float(len(positions))
                    denom = tf + K1 * (1.0 - B + B * dl / avgdl)
                    out[doc_id] = out.get(doc_id, 0.0) + boost * idf * tf * (K1 + 1.0) / denom

    def iter_sorted(self) -> Iterable[Tuple[str, Dict[int, List[int]]]]:
        for term in self._sorted():
            yield term, self.terms[term]


@dataclasses.dataclass
class CommittedStringIndex:
    """Immutable CSR generation for one text field (host-authoritative copy;
    device arrays are created/cached by the engine's DeviceIndexCache).

    Layout (SURVEY.md §7): postings of term ``t`` occupy
    ``[term_starts[t], term_starts[t+1])`` in the flat posting arrays; the
    positions of posting ``p`` occupy ``[pos_starts[p], pos_starts[p+1])``.
    Terms are sorted, so a prefix's postings form one contiguous span.
    """

    term_dict: TermDict
    term_starts: np.ndarray   # int64[T+1]
    post_docs: np.ndarray     # int32[P]
    post_tf: np.ndarray       # float32[P]
    pos_starts: np.ndarray    # int64[P+1]
    positions: np.ndarray     # int32[PP]
    doc_lens_dense: np.ndarray  # float32[cap] (0 => doc lacks field)
    n_docs_with_field: int
    total_len: int

    @staticmethod
    def empty(capacity: int = 0) -> "CommittedStringIndex":
        return CommittedStringIndex(
            term_dict=TermDict([]),
            term_starts=np.zeros(1, dtype=np.int64),
            post_docs=np.zeros(0, dtype=np.int32),
            post_tf=np.zeros(0, dtype=np.float32),
            pos_starts=np.zeros(1, dtype=np.int64),
            positions=np.zeros(0, dtype=np.int32),
            doc_lens_dense=np.zeros(capacity, dtype=np.float32),
            n_docs_with_field=0,
            total_len=0,
        )

    @property
    def n_terms(self) -> int:
        return len(self.term_dict)

    @property
    def n_postings(self) -> int:
        return len(self.post_docs)

    def global_info(self) -> GlobalInfo:
        return GlobalInfo(self.n_docs_with_field, self.total_len)

    # -- query resolution (host, O(tokens * log T)) ---------------------------

    def resolve_tokens(self, tokens: Sequence[str]) -> "ResolvedQuery":
        """Map query tokens to posting spans + per-posting idf weights."""
        spans: List[Tuple[int, int]] = []  # contiguous [lo, hi) posting spans
        term_ranges: List[Tuple[int, int]] = []
        for token in tokens:
            t_lo, t_hi = self.term_dict.prefix_range(token)
            if t_hi <= t_lo:
                continue
            term_ranges.append((t_lo, t_hi))
            spans.append(
                (int(self.term_starts[t_lo]), int(self.term_starts[t_hi]))
            )
        if not spans:
            return ResolvedQuery.empty()

        n = float(self.n_docs_with_field)
        gather_parts: List[np.ndarray] = []
        idf_parts: List[np.ndarray] = []
        for (t_lo, t_hi), (p_lo, p_hi) in zip(term_ranges, spans):
            starts = self.term_starts[t_lo : t_hi + 1]
            lens = np.diff(starts)
            ni = lens.astype(np.float64)
            with np.errstate(divide="ignore"):
                idf_t = np.log1p(
                    np.maximum((n - ni + 0.5) / (ni + 0.5), 0.0)
                ).astype(np.float32)
            idf_t = np.where(ni > 0, idf_t, 0.0).astype(np.float32)
            gather_parts.append(np.arange(p_lo, p_hi, dtype=np.int64))
            idf_parts.append(np.repeat(idf_t, lens))
        gather_idx = np.concatenate(gather_parts)
        idf = np.concatenate(idf_parts)
        return ResolvedQuery(gather_idx=gather_idx, idf=idf)

    def resolve_positions(self, gather_idx: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """(pos_gather_idx, pos_doc) for the phrase kernel: indices into the
        flat positions array + owning doc per position."""
        if len(gather_idx) == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int32)
        starts = self.pos_starts[gather_idx]
        lens = self.pos_starts[gather_idx + 1] - starts
        flat = flatten_ranges(starts, lens)
        docs = np.repeat(self.post_docs[gather_idx], lens)
        return flat, docs

    # -- merge (commit path) --------------------------------------------------

    def merge(
        self,
        uncommitted: UncommittedStringIndex,
        capacity: int,
        deleted: Optional[Set[int]] = None,
        uncommitted_doc_lens: Optional[Dict[int, int]] = None,
    ) -> "CommittedStringIndex":
        """Fold the uncommitted window (minus deletions) into a new immutable
        generation — the reference's MergedIterator commit
        (committed/string.rs:91-189) as a sorted-dict merge + array repack."""
        deleted = deleted or set()

        # Bulk-load fast path: first commit of a fresh collection packs the
        # whole window through the native C++ builder (no per-term Python).
        if self.n_terms == 0 and not deleted:
            native_packed = _native_pack(uncommitted, capacity)
            if native_packed is not None:
                return native_packed

        # 1. merged term dictionary
        new_dict, remap_a, remap_b = TermDict.merge(
            self.term_dict, uncommitted.terms.keys()
        )
        t_new = len(new_dict)

        # postings per new term id: (docs, tfs, positions-per-posting)
        doc_parts: List[np.ndarray] = []
        tf_parts: List[np.ndarray] = []
        pos_len_parts: List[np.ndarray] = []
        pos_parts: List[np.ndarray] = []
        term_counts = np.zeros(t_new, dtype=np.int64)

        # committed side, filtered for deletions
        committed_by_new: Dict[int, int] = {new_id: old_id for old_id, new_id in enumerate(remap_a)}
        unc_terms_sorted = sorted(uncommitted.terms)
        unc_by_new: Dict[int, str] = {
            new_id: term for term, new_id in zip(unc_terms_sorted, remap_b)
        }

        del_arr: Optional[np.ndarray] = None
        if deleted:
            del_arr = np.zeros(capacity, dtype=bool)
            del_arr[list(deleted)] = True

        for new_id in range(t_new):
            docs_list: List[np.ndarray] = []
            tfs_list: List[np.ndarray] = []
            plens_list: List[np.ndarray] = []
            ppos_list: List[np.ndarray] = []

            old_id = committed_by_new.get(new_id)
            if old_id is not None:
                lo, hi = int(self.term_starts[old_id]), int(self.term_starts[old_id + 1])
                docs = self.post_docs[lo:hi]
                keep = None
                if del_arr is not None:
                    keep = ~del_arr[docs]
                if keep is None or keep.all():
                    docs_k = docs
                    tfs_k = self.post_tf[lo:hi]
                    starts = self.pos_starts[lo:hi]
                    lens = self.pos_starts[lo + 1 : hi + 1] - starts
                    flat = flatten_ranges(starts, lens)
                    docs_list.append(docs_k)
                    tfs_list.append(tfs_k)
                    plens_list.append(lens)
                    ppos_list.append(self.positions[flat])
                elif keep.any():
                    docs_k = docs[keep]
                    starts = self.pos_starts[lo:hi][keep]
                    lens = (self.pos_starts[lo + 1 : hi + 1] - self.pos_starts[lo:hi])[keep]
                    flat = flatten_ranges(starts, lens)
                    docs_list.append(docs_k)
                    tfs_list.append(self.post_tf[lo:hi][keep])
                    plens_list.append(lens)
                    ppos_list.append(self.positions[flat])

            term = unc_by_new.get(new_id)
            if term is not None:
                bucket = uncommitted.terms[term]
                u_docs = [d for d in sorted(bucket) if d not in deleted]
                if u_docs:
                    docs_list.append(np.asarray(u_docs, dtype=np.int32))
                    tfs_list.append(
                        np.asarray([len(bucket[d]) for d in u_docs], dtype=np.float32)
                    )
                    plens_list.append(
                        np.asarray([len(bucket[d]) for d in u_docs], dtype=np.int64)
                    )
                    ppos_list.append(
                        np.concatenate(
                            [np.asarray(sorted(bucket[d]), dtype=np.int32) for d in u_docs]
                        )
                        if u_docs
                        else np.zeros(0, np.int32)
                    )

            if docs_list:
                doc_parts.append(np.concatenate(docs_list))
                tf_parts.append(np.concatenate(tfs_list))
                pos_len_parts.append(np.concatenate(plens_list))
                pos_parts.append(np.concatenate(ppos_list))
                term_counts[new_id] = len(doc_parts[-1])

        post_docs = (
            np.concatenate(doc_parts) if doc_parts else np.zeros(0, np.int32)
        ).astype(np.int32)
        post_tf = (
            np.concatenate(tf_parts) if tf_parts else np.zeros(0, np.float32)
        ).astype(np.float32)
        pos_lens = (
            np.concatenate(pos_len_parts) if pos_len_parts else np.zeros(0, np.int64)
        )
        positions = (
            np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.int32)
        ).astype(np.int32)

        term_starts = np.zeros(t_new + 1, dtype=np.int64)
        np.cumsum(term_counts, out=term_starts[1:])
        pos_starts = np.zeros(len(post_docs) + 1, dtype=np.int64)
        np.cumsum(pos_lens, out=pos_starts[1:])

        # dense doc lens over the (possibly grown) capacity
        doc_lens = np.zeros(capacity, dtype=np.float32)
        ncap = min(len(self.doc_lens_dense), capacity)
        doc_lens[:ncap] = self.doc_lens_dense[:ncap]
        for doc_id, dl in uncommitted.doc_lens.items():
            doc_lens[doc_id] = dl
        if deleted:
            doc_lens[list(deleted)] = 0.0

        n_docs = int(np.count_nonzero(doc_lens))
        total_len = int(doc_lens.sum())

        # prune empty terms to keep the dictionary tight
        keep_terms = term_counts > 0
        if not keep_terms.all():
            kept_ids = np.nonzero(keep_terms)[0]
            new_terms = [new_dict.terms[i] for i in kept_ids]
            new_starts = np.zeros(len(kept_ids) + 1, dtype=np.int64)
            np.cumsum(term_counts[kept_ids], out=new_starts[1:])
            # postings are already laid out in term order; removing empty
            # terms does not move any posting data
            td = TermDict.__new__(TermDict)
            td.terms = new_terms
            new_dict = td
            term_starts = new_starts

        return CommittedStringIndex(
            term_dict=new_dict,
            term_starts=term_starts,
            post_docs=post_docs,
            post_tf=post_tf,
            pos_starts=pos_starts,
            positions=positions,
            doc_lens_dense=doc_lens,
            n_docs_with_field=n_docs,
            total_len=total_len,
        )

    # -- persistence ----------------------------------------------------------

    def to_arrays(self) -> Dict[str, np.ndarray]:
        return {
            "terms": np.asarray(self.term_dict.terms, dtype=np.str_),
            "term_starts": self.term_starts,
            "post_docs": self.post_docs,
            "post_tf": self.post_tf,
            "pos_starts": self.pos_starts,
            "positions": self.positions,
            "doc_lens_dense": self.doc_lens_dense,
            "scalars": np.asarray([self.n_docs_with_field, self.total_len], dtype=np.int64),
        }

    @staticmethod
    def from_arrays(arrays: Dict[str, np.ndarray]) -> "CommittedStringIndex":
        td = TermDict.__new__(TermDict)
        td.terms = [str(t) for t in arrays["terms"]]
        return CommittedStringIndex(
            term_dict=td,
            term_starts=arrays["term_starts"].astype(np.int64),
            post_docs=arrays["post_docs"].astype(np.int32),
            post_tf=arrays["post_tf"].astype(np.float32),
            pos_starts=arrays["pos_starts"].astype(np.int64),
            positions=arrays["positions"].astype(np.int32),
            doc_lens_dense=arrays["doc_lens_dense"].astype(np.float32),
            n_docs_with_field=int(arrays["scalars"][0]),
            total_len=int(arrays["scalars"][1]),
        )


def _native_pack(
    uncommitted: UncommittedStringIndex, capacity: int
) -> Optional["CommittedStringIndex"]:
    try:
        from .. import native
    except ImportError:
        return None
    if not native.available():
        return None
    b = native.NativePostingBuilder()
    for doc_id, dl in uncommitted.doc_lens.items():
        b.insert(doc_id, dl, [])
    for term, bucket in uncommitted.terms.items():
        for doc_id, positions in bucket.items():
            b.insert(doc_id, uncommitted.doc_lens.get(doc_id, 0), [(term, positions)])
    terms, term_starts, post_docs, post_tf, pos_starts, positions, n_docs, total_len = b.pack()
    doc_lens = np.zeros(capacity, dtype=np.float32)
    for doc_id, dl in uncommitted.doc_lens.items():
        doc_lens[doc_id] = dl
    td = TermDict.__new__(TermDict)
    td.terms = terms
    return CommittedStringIndex(
        term_dict=td,
        term_starts=term_starts,
        post_docs=post_docs,
        post_tf=post_tf,
        pos_starts=pos_starts,
        positions=positions,
        doc_lens_dense=doc_lens,
        n_docs_with_field=n_docs,
        total_len=total_len,
    )


@dataclasses.dataclass
class ResolvedQuery:
    gather_idx: np.ndarray  # int64[G]
    idf: np.ndarray         # float32[G]

    @staticmethod
    def empty() -> "ResolvedQuery":
        return ResolvedQuery(np.zeros(0, np.int64), np.zeros(0, np.float32))

    @property
    def is_empty(self) -> bool:
        return len(self.gather_idx) == 0

    def padded(self, steps) -> Tuple[np.ndarray, np.ndarray]:
        """Bucket-pad (gather_idx, idf); pad slots carry idf 0 => no-op."""
        g = len(self.gather_idx)
        gp = bucket_pad(max(g, 1), steps)
        gather = np.zeros(gp, dtype=np.int32)
        gather[:g] = self.gather_idx
        idf = np.zeros(gp, dtype=np.float32)
        idf[:g] = self.idf
        return gather, idf
