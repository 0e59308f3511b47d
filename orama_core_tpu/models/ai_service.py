"""AI service: embeddings + chat, in-process.

Replaces the reference's gRPC client/server pair (`src/ai/mod.rs` tonic
client + `src/ai_server/` Python sidecar): on TPU the embedding model runs
*in-process* as a JAX forward pass sharing the device with the search
kernels — no serialization boundary on the query hot path. The service
keeps the same seam (embed with query/passage intent, chat, chat_stream) so
a remote backend could be swapped in.

Backends:
- "fake": deterministic hash-projection embedder + canned LLM (tests/CI)
- "jax":  models/encoder.py transformer encoder (random or HF-loaded
          weights) and models/llm.py decoder for chat
"""

from __future__ import annotations

import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import AiConfig
from .fake import FakeEmbedder, FakeLLM
from .registry import model_info


class AIService:
    def __init__(self, cfg: Optional[AiConfig] = None) -> None:
        self.cfg = cfg or AiConfig()
        self._lock = threading.Lock()
        self._embedders: Dict[str, object] = {}
        self._llm: Optional[object] = None

    # -- embeddings -----------------------------------------------------------

    def _embedder(self, model: str):
        with self._lock:
            e = self._embedders.get(model)
            if e is None:
                info = model_info(model)
                if self.cfg.backend == "jax" and not model.startswith("fake"):
                    from .encoder import JaxEncoderEmbedder

                    e = JaxEncoderEmbedder(model)
                else:
                    e = FakeEmbedder(info.dim)
                self._embedders[model] = e
            return e

    def embed_query(self, model: str, texts: Sequence[str]) -> np.ndarray:
        """[len(texts), dim] float32 (intent prefix per model registry;
        reference: GetEmbedding with intent=query, models.py:57-61)."""
        info = model_info(model)
        prefixed = [info.query_prefix + t for t in texts]
        return self._embed_batched(model, prefixed)

    def embed_passage(self, model: str, texts: Sequence[str]) -> np.ndarray:
        info = model_info(model)
        prefixed = [info.passage_prefix + t for t in texts]
        return self._embed_batched(model, prefixed)

    def _embed_batched(self, model: str, texts: Sequence[str]) -> np.ndarray:
        e = self._embedder(model)
        bs = max(1, self.cfg.max_batch_size)
        outs: List[np.ndarray] = []
        for i in range(0, len(texts), bs):
            outs.append(e.embed(texts[i : i + bs]))
        if not outs:
            return np.zeros((0, model_info(model).dim), dtype=np.float32)
        return np.concatenate(outs, axis=0)

    def check_health(self) -> Dict[str, str]:
        """Liveness probe (reference: gRPC CheckHealth, grpc/server.py:26-35):
        runs one tiny embedding forward through the active backend."""
        try:
            out = self.embed_query(self.cfg.embedding_model, ["ping"])
            ok = out.shape[0] == 1 and bool(np.isfinite(out).all())
            return {"status": "ok" if ok else "degraded", "backend": self.cfg.backend}
        except Exception as e:
            return {"status": "error", "backend": self.cfg.backend, "error": str(e)}

    # -- chat -----------------------------------------------------------------

    def _get_llm(self):
        with self._lock:
            if self._llm is None:
                if self.cfg.backend == "jax" and self.cfg.llm_model != "fake-llm":
                    from .llm import JaxChatLLM

                    self._llm = JaxChatLLM(
                        self.cfg.llm_model,
                        self.cfg.hf_model_path,
                        temperature=getattr(self.cfg, "llm_temperature", 0.0),
                    )
                else:
                    self._llm = FakeLLM()
            return self._llm

    def chat(self, role: str, prompt: str, context: str = "") -> str:
        return self._get_llm().chat(role, prompt, context)

    def chat_stream(self, role: str, prompt: str, context: str = "") -> Iterator[str]:
        return self._get_llm().chat_stream(role, prompt, context)
