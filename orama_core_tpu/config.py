"""Configuration: YAML file + ``ORAMACORE_``-style env overrides.

Mirrors the reference's config surface (`config.yaml:1-81`,
`bin/oramacore.rs:12-32`, `lib.rs:56-63`) with TPU-specific additions
(mesh shape, device dtypes, kernel knobs). Env vars use the prefix
``ORAMAX_`` and ``__``-separated paths, e.g.
``ORAMAX_writer_side__master_api_key=...``.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

try:
    import yaml
except Exception:  # pragma: no cover
    yaml = None

ENV_PREFIX = "ORAMAX_"


@dataclasses.dataclass
class HttpConfig:
    host: str = "127.0.0.1"
    port: int = 8080
    allow_cors: bool = True
    with_prometheus: bool = True
    # Load shedding: concurrent heavy requests (search/answer/insert)
    # beyond this get 503 + Retry-After instead of queueing unboundedly.
    max_in_flight: int = 64
    # TCP listen backlog (socketserver defaults to 5, which resets
    # connections under concurrent client bursts instead of queueing
    # them toward the load shedder's clean 503).
    listen_backlog: int = 128
    # SSE answer streams shed from their own pool: they hold a slot for
    # a full LLM generation, so sharing max_in_flight would let a few
    # streams starve every millisecond search.
    max_sse_streams: int = 32
    # Reject request bodies larger than this with 413 before allocating
    # (Content-Length is attacker-controlled).
    max_body_bytes: int = 64 * 1024 * 1024
    # SSE comment-keepalive interval for answer streams (seconds); keeps
    # idle proxies from dropping long-running generations.
    sse_keepalive_sec: float = 15.0


@dataclasses.dataclass
class LogConfig:
    level: str = "info"
    file_path: Optional[str] = None


@dataclasses.dataclass
class WriterSideConfig:
    data_dir: str = "./.data/writer"
    master_api_key: str = "master"
    # Queue capacity of the op log channel (reference: lib.rs:123 => 10_000)
    channel_capacity: int = 10_000
    # Commit after this many ops (reference: insert_batch_commit_size)
    insert_batch_commit_size: int = 5_000
    # Seconds between background commits (reference default 60s)
    commit_interval_sec: float = 60.0
    default_embedding_model: str = "fake-small"
    embedding_queue_limit: int = 10_000
    # Durable op log: append ops to a WAL before the channel so the
    # uncommitted window survives crashes (off = reference semantics)
    wal_enabled: bool = False


@dataclasses.dataclass
class ReaderSideConfig:
    data_dir: str = "./.data/reader"
    insert_batch_commit_size: int = 10_000
    commit_interval_sec: float = 60.0
    # Snapshot GC: generations kept on disk after a pointer swap (the
    # current one plus keep_generations-1 predecessors; older gen-* dirs
    # are pruned). 0 disables pruning.
    keep_generations: int = 2


@dataclasses.dataclass
class AiConfig:
    """Embedding + LLM config (reference `ai_server:` yaml section).

    ``backend``:
      - "fake": deterministic hash-projection embedder (tests/CI; plays the
        role of the reference's in-process fake AI server, test_utils.rs:96-133)
      - "jax": in-process JAX encoder forward (the TPU-native replacement for
        the reference's Python gRPC sidecar + ONNX runtime)
    """

    backend: str = "fake"
    embedding_model: str = "fake-small"
    llm_model: str = "fake-llm"
    # sampling temperature for chat decode; 0 = greedy (deterministic).
    # The reference serves temperature=0.1 (service/models.py:100)
    llm_temperature: float = 0.0
    hf_model_path: Optional[str] = None  # load real weights if given
    # Encoder checkpoints: one checkpoint dir, or a dir of per-model subdirs
    # (see scripts/prepare_checkpoint.py). Absent -> pretrained-family models
    # (bge/e5) serve the deterministic lexical fallback (models/lexical.py).
    embedding_checkpoint_path: Optional[str] = None
    max_batch_size: int = 64
    # Remote model backend: when set (host:port), the engine consumes models
    # over gRPC (rpc/client.py) instead of running them in-process —
    # the reference's GPU-sidecar deployment shape (src/ai/mod.rs:42-199).
    remote_url: Optional[str] = None
    # When set, also EXPOSE this process's in-process models over gRPC so
    # remote engines can use this box as a model sidecar (rpc/server.py).
    grpc_port: Optional[int] = None
    # Bind address for that sidecar listener: default loopback; set
    # "0.0.0.0" for the documented remote-sidecar deployment
    grpc_host: str = "127.0.0.1"


@dataclasses.dataclass
class TpuConfig:
    """TPU/mesh execution knobs (no counterpart in the reference)."""

    # Mesh axis sizes; data axis shards documents, model axis shards the
    # embedding model (tensor parallel). () => single device.
    mesh_shape: Tuple[int, ...] = ()
    mesh_axis_names: Tuple[str, ...] = ("data", "model")
    vector_dtype: str = "bfloat16"
    score_dtype: str = "float32"
    # Pad document capacity to multiples of this (static-shape buckets)
    doc_capacity_step: int = 8192
    # Few, coarse buckets: each (bucket-combination, capacity) pair is one
    # compiled program; padded-slot compute is ~free next to a recompile
    posting_bucket_steps: Tuple[int, ...] = (1024, 16384, 262144, 4194304)
    # Scan-budget buckets for the batched span path: unlike the array
    # paddings above, the kernel READS the whole budget, so a x16 ladder
    # made a ~1M-posting row scan 4.2M slots. x4 steps cap the waste at 4x
    # while keeping batch coalescing (rows group by budget)
    budget_bucket_steps: Tuple[int, ...] = (
        1024, 16384, 65536, 262144, 1048576, 4194304,
    )
    use_pallas: bool = True
    # Vector scoring path: "exact" (bf16 matmul), "int8" (quantized matmul),
    # "ivf" (clustered candidates above ivf_threshold, exact below),
    # "pq" (ADC + exact rerank), "ivf_pq" (IVF partitions + PQ candidate
    # scan + exact rerank — the scale mode)
    vector_index: str = "exact"
    # int8 fast-path phase 1: "xla" (XLA's int8 MXU matmul + reduce —
    # measured faster on v5e: 693.8 vs 668.3 QPS at 10Mx384, and its dot
    # lowers ~1.4x faster than the Mosaic in-kernel dot) or "pallas"
    # (streaming kernel, minimum HBM traffic — may win on HBM-poorer
    # chips). Compare per chip: benchmarks/int8_30m_bench.py --phase1
    int8_phase1: str = "xla"
    # BM25 posting scan in the fused program: the Pallas DMA-aligned
    # block-gather variant (ops/bm25.bm25_scores_blocked_pallas). Measured
    # 10.5 ms vs 15.2 ms for the XLA blocked scan at 1M postings on v5e
    # once per-dispatch relay noise is amortized inside one program
    # (benchmarks/bm25_scan_bench.py) — the earlier "parity" reading was
    # dispatch-bound. Both paths sit on the segment_sum floor (~10.1 ms);
    # see benchmarks/segsum_bench.py. Applied on TPU backends only
    # (collection_read gates on backend); harmless elsewhere.
    bm25_pallas: bool = True
    # Dense per-term score rows for Zipf-head terms: the posting scan's
    # per-doc scatter costs ~10 ns/posting on TPU no matter how gathers
    # are arranged (benchmarks/segsum_bench.py), so terms whose posting
    # span is >= n_docs/bm25_dense_df_ratio are precomputed at commit as
    # dense g(tf,len) rows — query-time heavy-term scoring is a weighted
    # dense row-sum (HBM bandwidth) and only the light tail pays the
    # scatter: 9.9 -> 2.3 ms on the 1M-posting Zipf mix. Exact (idf and
    # boosts stay query-time scalars). Memory: up to
    # bm25_dense_terms * capacity * 4 B per string field.
    bm25_dense_terms: int = 16      # max dense rows per field (0 disables)
    bm25_dense_df_ratio: int = 16   # df >= n_docs/ratio qualifies
    # Windowed phrase reduction (ops/bm25.phrase_boost_docmajor_windowed):
    # the doc-major stream is sorted by doc, so per-doc phrase counts
    # reduce via commit-static block windows (Pallas VPU binning + page
    # one-hot MXU matmul) instead of a 20M-element cumsum + 1M random
    # bounds-gather. Exact; falls back to the cumsum kernel on corpora
    # whose blocks span too many docs (phrase_window_meta -> None).
    # Applied on TPU backends only (collection_read gates on backend).
    phrase_windowed: bool = True
    ivf_threshold: int = 50_000
    ivf_nprobe: int = 16
    ivf_candidate_expand: int = 8
    # autotune nprobe at commit against brute-force ground truth until
    # recall@10 >= target (index/vector_index.tune_nprobe)
    ivf_autotune: bool = True
    # Parametric-OPQ rotation for PQ codebooks: "auto" (default) trains
    # trial codebooks raw vs PCA-balanced and keeps the basis with the
    # lower held-out reconstruction error (ops/pq.choose_rotation) —
    # measured +3-4 recall pts on lexical-style embeddings, -19 pts on a
    # mixed decaying spectrum, so neither fixed default is safe. "on"
    # forces the rotation, "off" disables. Serving cost when on: one
    # [Q, D] x [D, D] matmul per batch.
    pq_rotation: str = "auto"
    ivf_autotune_target: float = 0.95
    # Selective-filter fast path (SURVEY §7 "filter selectivity"): when a
    # query's filters match at most this many docs (computable host-side
    # from the sorted filter columns), the vector path gathers just those
    # docs' vector rows and scores them, instead of the full-corpus
    # matmul-then-mask. 0 disables.
    selective_filter_max: int = 2048
    # Serving micro-batching: coalesce concurrent vector queries into one
    # batched device call (server/batcher.py). 256 ~doubles per-chip QPS
    # over 64 on the fused kNN kernel (the 64-query matmul fills half an
    # MXU output tile; measured 21k -> 47k QPS at 1M x 768) at ~5.5 ms
    # device time per batch.
    query_batching: bool = False
    batch_max: int = 256
    batch_wait_ms: float = 2.0
    # how long a caller waits on its coalesced result; must cover a
    # worst-case first compile (minutes through a dev relay)
    batch_submit_timeout_s: float = 120.0


@dataclasses.dataclass
class OramaxConfig:
    http: HttpConfig = dataclasses.field(default_factory=HttpConfig)
    log: LogConfig = dataclasses.field(default_factory=LogConfig)
    writer_side: WriterSideConfig = dataclasses.field(default_factory=WriterSideConfig)
    reader_side: ReaderSideConfig = dataclasses.field(default_factory=ReaderSideConfig)
    ai: AiConfig = dataclasses.field(default_factory=AiConfig)
    tpu: TpuConfig = dataclasses.field(default_factory=TpuConfig)

    @staticmethod
    def load(path: Optional[str] = None, env: Optional[Dict[str, str]] = None) -> "OramaxConfig":
        data: Dict[str, Any] = {}
        path = path or os.environ.get("CONFIG_PATH")
        if path and os.path.exists(path):
            if yaml is None:
                raise RuntimeError("pyyaml unavailable; cannot read config file")
            with open(path, "r", encoding="utf-8") as f:
                data = yaml.safe_load(f) or {}
        env = dict(os.environ if env is None else env)
        for key, value in env.items():
            if not key.startswith(ENV_PREFIX):
                continue
            parts = key[len(ENV_PREFIX):].split("__")
            node = data
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = _coerce(value)
        return OramaxConfig.from_dict(data)

    @staticmethod
    def from_dict(data: Dict[str, Any]) -> "OramaxConfig":
        cfg = OramaxConfig()
        for section_name, section_cls in (
            ("http", HttpConfig),
            ("log", LogConfig),
            ("writer_side", WriterSideConfig),
            ("reader_side", ReaderSideConfig),
            ("ai", AiConfig),
            ("tpu", TpuConfig),
        ):
            section_data = data.get(section_name) or {}
            section = getattr(cfg, section_name)
            for f in dataclasses.fields(section_cls):
                if f.name in section_data:
                    v = section_data[f.name]
                    if isinstance(getattr(section, f.name), tuple) and isinstance(v, list):
                        v = tuple(v)
                    # numeric-LOOKING values targeting str fields stay str:
                    # ORAMAX_writer_side__master_api_key=123456 (or a bare
                    # YAML `master_api_key: 123456`) must compare equal to
                    # the "123456" Bearer header, not fail auth as int
                    if isinstance(v, (int, float)) and not isinstance(v, bool):
                        ft = str(f.type)
                        if "str" in ft and "int" not in ft and "float" not in ft:
                            v = str(v)
                    setattr(section, f.name, v)
        return cfg


def _coerce(v: str) -> Any:
    low = v.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        pass
    return v
