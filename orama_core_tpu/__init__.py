"""orama_core_tpu — a TPU-native index-and-query engine.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
OramaCore (reference: oramasearch/orama-core): full-text BM25 search,
vector + hybrid search, filters/facets, automatic embeddings, answer
engine, persistence, HTTP API — with the scoring core running as device
kernels over packed CSR/matrix layouts and document-sharded meshes.

`build_orama` / `start` mirror the reference's assembly entry points
(`lib.rs:65-160`): construct AI service + write side + read side, wire the
op channel, optionally spawn the background loops (op pump, embedding loop,
commit intervals).
"""

from __future__ import annotations

import threading
import time
from typing import Optional

from .config import OramaxConfig
from .oplog import channel
from .engine import ReadSide, WriteSide
from .models.ai_service import AIService

__version__ = "0.1.0"


class Orama:
    """The assembled engine (the reference's (WriteSide, ReadSide) pair)."""

    def __init__(self, cfg: OramaxConfig, start_background: bool = True) -> None:
        self.cfg = cfg
        if cfg.ai.remote_url:
            from .rpc import RemoteAIService

            self.ai = RemoteAIService(cfg.ai.remote_url)
        else:
            self.ai = AIService(cfg.ai)
        self._grpc_server = None
        tx, rx = channel(cfg.writer_side.channel_capacity)
        from .engine.hooks import HooksRuntime
        import os as _os

        self.hooks = HooksRuntime(_os.path.join(cfg.writer_side.data_dir, "hooks"))
        self.write_side = WriteSide(cfg.writer_side, tx, self.ai, hooks=self.hooks)
        self.read_side = ReadSide(cfg.reader_side, rx, self.ai, cfg.tpu)
        self.wal = None
        if cfg.writer_side.wal_enabled:
            from .wal import WriteAheadLog

            self.wal = WriteAheadLog(cfg.writer_side.data_dir)
            tx.wal = self.wal
            self.read_side.wal = self.wal
            self.read_side.wal_pre_truncate = self.write_side.commit
            # crash recovery: replay the durable window beyond the last
            # committed read-side offset (closes the reference's volatile-
            # channel gap, SURVEY.md §5)
            replayed = self.wal.replay(self.read_side._applied_offset)
            for stamped in replayed:
                self.read_side.apply(stamped)
                # keep the WRITE side's doc-id map / field registry in step
                # (its own dump may be staler than the acked WAL window)
                self.write_side.absorb_replayed(stamped)
            # The sender counter must clear EVERY offset the read side has
            # ever applied, not just what survives in the WAL — the read side
            # truncates the WAL at each commit, so after a crash with a stale
            # write-side info.json, wal.last_offset alone would reuse offsets
            # the read side already consumed (regressing _applied_offset and
            # breaking subsequent replay/truncation).
            tx.set_offset(
                max(tx.offset, self.wal.last_offset, self.read_side._applied_offset)
            )
        # model sidecar server LAST: it serves PlannedAnswer against
        # read_side — starting it earlier exposed a window where an eager
        # client RPC hit an AttributeError mid-construction
        if cfg.ai.grpc_port is not None and not cfg.ai.remote_url:
            from .rpc import serve_ai

            def _planner(text, collection_id, messages):
                # serve PlannedAnswer like the reference sidecar does
                # (ai_server planned_answer); engine-side steps run here
                import json as _json

                from .engine.answer import PartyPlanner

                for ev in PartyPlanner(self.read_side).run(
                    collection_id, text, conversation=messages, skip_auth=True
                ):
                    yield _json.dumps(ev), False
                yield "", True

            self._grpc_server, self.grpc_port = serve_ai(
                self.ai, port=cfg.ai.grpc_port, planner=_planner,
                host=cfg.ai.grpc_host,
            )
        self._stop = threading.Event()
        self._threads = []
        if start_background:
            self._spawn_background()

    # -- background loops (reference: lib.rs:93-99, write/mod.rs:158-179) -----

    def _spawn_background(self) -> None:
        from .utils import tracing

        def pump_loop():
            # the reference op-pump panics on error (lib.rs:96 "OUCH!");
            # here failures are logged loudly and the loop survives — a
            # poisoned op must not silently kill ingestion forever
            while not self._stop.is_set():
                try:
                    n = self.read_side.pump(timeout=0.05)
                    if self.read_side.should_commit:
                        self.read_side.commit()
                except Exception as e:
                    tracing.log("error", f"op pump error (op dropped): {e!r}")
                    n = 0
                if n == 0:
                    time.sleep(0.01)

        def embedding_loop():
            while not self._stop.is_set():
                try:
                    n = self.write_side.process_embeddings()
                except Exception as e:
                    tracing.log("error", f"embedding loop error: {e!r}")
                    n = 0
                    time.sleep(0.5)  # back off on a failing model backend
                if n == 0:
                    time.sleep(0.02)

        def commit_loop():
            last_w = last_r = time.monotonic()
            while not self._stop.is_set():
                now = time.monotonic()
                if now - last_w >= self.cfg.writer_side.commit_interval_sec:
                    try:
                        self.write_side.commit()
                    except Exception:
                        pass  # log-and-continue (reference write/mod.rs:174-176)
                    last_w = now
                if now - last_r >= self.cfg.reader_side.commit_interval_sec:
                    try:
                        # idle guard: an interval commit with nothing
                        # applied since the last one would re-serialize
                        # every field's full committed index (hundreds of
                        # MB of npz + fsync at 1M docs) for no change
                        if self.read_side._ops_since_commit > 0:
                            self.read_side.commit()
                    except Exception:
                        pass
                    last_r = now
                time.sleep(0.2)

        for fn in (pump_loop, embedding_loop, commit_loop):
            t = threading.Thread(target=fn, daemon=True, name=fn.__name__)
            t.start()
            self._threads.append(t)

    # -- synchronous control for tests / batch ingest -------------------------

    def flush(self) -> None:
        """Make all writes visible to search: drain embeddings + apply ops."""
        self.write_side.drain_embeddings()
        self.read_side.pump()
        if self.wal is not None:
            self.wal.sync()

    def commit(self) -> None:
        """Commit both sides (reference: WriteSide::commit + ReadSide::commit)."""
        self.flush()
        self.write_side.commit()
        self.read_side.commit()

    def close(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=2.0)
        if self._grpc_server is not None:
            self._grpc_server.stop(grace=1.0)
        if hasattr(self.ai, "close"):
            self.ai.close()


def build_orama(cfg: Optional[OramaxConfig] = None, start_background: bool = True) -> Orama:
    return Orama(cfg or OramaxConfig(), start_background=start_background)


def start(cfg: Optional[OramaxConfig] = None) -> None:
    """Boot the full server (blocks): engine + HTTP API + metrics
    (reference: lib.rs:65-91 + WebServer::start)."""
    cfg = cfg or OramaxConfig.load()
    orama = build_orama(cfg, start_background=True)
    from .server.http import serve

    serve(orama, cfg.http)
