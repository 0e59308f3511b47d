"""gRPC seam for remote model backends (reference: src/ai_server/service.proto).

- ``serve_ai(ai, host, port)``: expose an in-process AIService over gRPC.
- ``RemoteAIService(url)``: consume a remote LLMService as the engine's
  model backend (config ``ai.remote_url``).

Regenerate messages after editing ai_service.proto:
    cd orama_core_tpu/rpc && protoc --python_out=. ai_service.proto
"""

from .client import RemoteAIService
from .server import serve_ai

__all__ = ["RemoteAIService", "serve_ai"]
