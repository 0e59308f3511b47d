"""Raw document storage: uncommitted dict → committed JSONL segments.

Counterpart of the reference's `DocumentStorage`
(`sides/read/document_storage.rs`): uncommitted docs live in memory and are
drained to disk at commit; reads go through an in-memory cache; torn/missing
files yield ``None`` rather than errors (document_storage.rs:75-86).

Layout decision: segment files (JSONL + offset index), not one-file-per-doc
— this host runs on few cores and millions of tiny files would bottleneck
commit; a segment is one sequential write + one fsync.
"""

from __future__ import annotations

import json
import os
import threading
from typing import Any, Dict, Iterable, List, Optional, Set

from ..utils import atomic_write_bytes, atomic_write_json, ensure_dir, read_json


class DocumentStorage:
    def __init__(self, data_dir: str) -> None:
        self.data_dir = ensure_dir(data_dir)
        self._lock = threading.RLock()
        self._uncommitted: Dict[int, Dict[str, Any]] = {}
        self._cache: Dict[int, Dict[str, Any]] = {}
        # doc_id -> (segment, byte offset); loaded from manifest
        self._committed_where: Dict[int, List[int]] = {}
        self._segments: List[str] = []
        self._deleted: Set[int] = set()
        # user id ("id" field) -> dense doc id, maintained from the op
        # stream so doc-fetch-by-user-id never reaches into the write side
        # (CQRS: the sides may run as separate processes, operation.rs:119)
        self._by_uid: Dict[str, int] = {}
        self._uid_of: Dict[int, str] = {}
        self.load()

    # -- write path -----------------------------------------------------------

    def add_document(self, doc_id: int, doc: Dict[str, Any]) -> None:
        with self._lock:
            self._uncommitted[doc_id] = doc
            self._deleted.discard(doc_id)
            uid = doc.get("id")
            if isinstance(uid, str) and uid:
                self._by_uid[uid] = doc_id
                self._uid_of[doc_id] = uid

    def delete_documents(self, doc_ids: Iterable[int]) -> None:
        with self._lock:
            for d in doc_ids:
                self._uncommitted.pop(d, None)
                self._cache.pop(d, None)
                self._deleted.add(d)
                uid = self._uid_of.pop(d, None)
                # a re-insert may already have remapped the uid to its new
                # doc id; only drop the mapping if it still points at d
                if uid is not None and self._by_uid.get(uid) == d:
                    del self._by_uid[uid]

    # -- read path ------------------------------------------------------------

    def get(self, doc_id: int) -> Optional[Dict[str, Any]]:
        with self._lock:
            if doc_id in self._deleted:
                return None
            doc = self._uncommitted.get(doc_id)
            if doc is not None:
                return doc
            doc = self._cache.get(doc_id)
            if doc is not None:
                return doc
            where = self._committed_where.get(doc_id)
        if where is None:
            return None
        seg_idx, offset = where
        path = os.path.join(self.data_dir, self._segments[seg_idx])
        try:
            with open(path, "rb") as f:
                f.seek(offset)
                line = f.readline()
            doc = json.loads(line)
        except (OSError, json.JSONDecodeError):
            return None  # torn write tolerance
        with self._lock:
            self._cache[doc_id] = doc
        return doc

    def get_many(self, doc_ids: Iterable[int]) -> List[Optional[Dict[str, Any]]]:
        return [self.get(d) for d in doc_ids]

    def doc_id_of(self, user_id: str) -> Optional[int]:
        with self._lock:
            return self._by_uid.get(user_id)

    def get_by_user_id(self, user_id: str) -> Optional[Dict[str, Any]]:
        doc_id = self.doc_id_of(user_id)
        return self.get(doc_id) if doc_id is not None else None

    # -- commit / load --------------------------------------------------------

    def commit(self) -> None:
        with self._lock:
            pending = dict(self._uncommitted)
            deleted = set(self._deleted)
        if pending:
            seg_name = f"segment-{len(self._segments):06d}.jsonl"
            lines: List[bytes] = []
            offsets: Dict[int, int] = {}
            pos = 0
            for doc_id, doc in pending.items():
                b = json.dumps(doc, ensure_ascii=False).encode("utf-8") + b"\n"
                offsets[doc_id] = pos
                pos += len(b)
                lines.append(b)
            atomic_write_bytes(os.path.join(self.data_dir, seg_name), b"".join(lines))
            with self._lock:
                seg_idx = len(self._segments)
                self._segments.append(seg_name)
                for doc_id, off in offsets.items():
                    self._committed_where[doc_id] = [seg_idx, off]
                for doc_id in pending:
                    self._uncommitted.pop(doc_id, None)
        with self._lock:
            for d in deleted:
                self._committed_where.pop(d, None)
            self._deleted -= deleted
            manifest = {
                "segments": self._segments,
                "where": {str(k): v for k, v in self._committed_where.items()},
                "by_uid": {
                    u: d
                    for u, d in self._by_uid.items()
                    if d in self._committed_where
                },
            }
        atomic_write_json(os.path.join(self.data_dir, "manifest.json"), manifest)

    def load(self) -> None:
        manifest = read_json(os.path.join(self.data_dir, "manifest.json"))
        if not manifest:
            return
        with self._lock:
            self._segments = list(manifest.get("segments", []))
            self._committed_where = {
                int(k): v for k, v in manifest.get("where", {}).items()
            }
            self._by_uid = {
                str(u): int(d) for u, d in manifest.get("by_uid", {}).items()
            }
            self._uid_of = {d: u for u, d in self._by_uid.items()}

    def count_committed(self) -> int:
        with self._lock:
            return len(self._committed_where)

    def uncommitted_count(self) -> int:
        with self._lock:
            return len(self._uncommitted)
