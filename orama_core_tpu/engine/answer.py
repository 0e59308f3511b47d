"""Answer engine: RAG answer + multi-step "Party Planner" agent.

Counterparts:
- ``answer_events`` mirrors `answer_v0` (`web_server/api/collection/
  answer.rs:134-273`): optimize query via LLM -> hybrid search (limit 5) ->
  emit sources -> stream the answer as chunks. Event shapes match the
  reference's SseMessage enum (answer.rs:33-46): acknowledgement /
  optimizing-query / optimized-query / sources / answer_chunk / error.
- ``PartyPlanner`` mirrors the Python sidecar's agent
  (`ai_server/src/actions/party_planner.py`, `prompts/party_planner_
  actions.py`): the LLM emits a JSON action plan; ORAMACORE-side steps run
  against the read side directly (in-process — no HTTP back-call needed),
  PYTHON-side steps run through the LLM; each step streams a JSON message.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Iterator, List, Optional

from ..types import SearchParams
from ..utils import tracing

ANSWER_SEARCH_LIMIT = 5


@dataclasses.dataclass(frozen=True)
class ActionSpec:
    name: str
    side: str          # "python" (LLM) | "oramacore" (engine)
    returns: str       # "text" | "json"
    streams: bool


# Registry mirroring party_planner_actions.py:34-178
ACTIONS: Dict[str, ActionSpec] = {
    a.name: a
    for a in [
        ActionSpec("OPTIMIZE_QUERY", "python", "text", False),
        ActionSpec("GENERATE_QUERIES", "python", "text", False),
        ActionSpec("PERFORM_ORAMA_SEARCH", "oramacore", "json", False),
        ActionSpec("DESCRIBE_INPUT_CODE", "python", "text", True),
        ActionSpec("IMPROVE_INPUT", "python", "text", True),
        ActionSpec("CREATE_CODE", "python", "text", True),
        ActionSpec("ASK_FOLLOWUP", "python", "text", True),
        ActionSpec("GIVE_REPLY", "python", "text", True),
    ]
}


def _sse(type_: str, message: Any) -> Dict[str, Any]:
    return {"type": type_, "message": message}


def _context_from_hits(result) -> str:
    parts: List[str] = []
    for h in result.hits:
        if h.document:
            parts.append(json.dumps(h.document, ensure_ascii=False))
    return "\n".join(parts)


def answer_events(
    read_side,
    collection_id: str,
    query: str,
    conversation: Optional[List[Dict[str, str]]] = None,
    read_api_key: Optional[str] = None,
    skip_auth: bool = False,
) -> Iterator[Dict[str, Any]]:
    """The answer_v0 pipeline as a stream of SSE-message dicts."""
    ai = read_side.ai
    with tracing.span("answer", collection=collection_id):
        yield _sse("acknowledgement", "Acknowledged")
        try:
            yield _sse("optimizing-query", query)
            optimized = ai.chat("google_query_translator", query)
            yield _sse("optimized-query", optimized)

            params = SearchParams.from_json(
                {"term": optimized, "mode": "hybrid", "limit": ANSWER_SEARCH_LIMIT}
            )
            result = read_side.search(
                collection_id, params, read_api_key, skip_auth=skip_auth
            )
            yield _sse("sources", result.to_json())

            context = _context_from_hits(result)
            history = ""
            for m in conversation or []:
                history += f"{m.get('role', 'user')}: {m.get('content', '')}\n"
            prompt = (history + "user: " + query).strip()
            for chunk in ai.chat_stream("answer", prompt, context):
                yield _sse("answer_chunk", {"text": chunk, "is_final": False})
            yield _sse("answer_chunk", {"text": "", "is_final": True})
        except Exception as e:  # stream errors to the client, don't drop SSE
            yield _sse("error", f"Error during streaming: {e}")


class PartyPlanner:
    """LLM-planned multi-step agent (party_planner.py:109-139)."""

    def __init__(self, read_side) -> None:
        self.read_side = read_side
        self.ai = read_side.ai

    def plan(self, query: str) -> List[Dict[str, str]]:
        raw = self.ai.chat("party_planner", query)
        try:
            data = json.loads(raw)
            actions = data.get("actions", [])
        except (json.JSONDecodeError, AttributeError):
            actions = []
        valid = [a for a in actions if a.get("step") in ACTIONS]
        if not valid:
            valid = [
                {"step": "OPTIMIZE_QUERY", "description": "optimize the query"},
                {"step": "PERFORM_ORAMA_SEARCH", "description": "search"},
                {"step": "GIVE_REPLY", "description": "reply"},
            ]
        return valid

    def run(
        self,
        collection_id: str,
        query: str,
        conversation: Optional[List[Dict[str, str]]] = None,
        read_api_key: Optional[str] = None,
        skip_auth: bool = False,
    ) -> Iterator[Dict[str, Any]]:
        steps = self.plan(query)
        yield {"action": "PLAN", "result": json.dumps({"actions": steps})}
        current = query
        context = ""
        for step in steps:
            name = step["step"]
            spec = ACTIONS[name]
            if spec.side == "oramacore":
                if name == "PERFORM_ORAMA_SEARCH":
                    params = SearchParams.from_json(
                        {"term": current, "mode": "hybrid", "limit": ANSWER_SEARCH_LIMIT}
                    )
                    result = self.read_side.search(
                        collection_id, params, read_api_key, skip_auth=skip_auth
                    )
                    context = _context_from_hits(result)
                    yield {"action": name, "result": json.dumps(result.to_json())}
                continue
            role = {
                "OPTIMIZE_QUERY": "google_query_translator",
                "GENERATE_QUERIES": "google_query_translator",
                "GIVE_REPLY": "answer",
                "ASK_FOLLOWUP": "answer",
                "IMPROVE_INPUT": "answer",
                "CREATE_CODE": "answer",
                "DESCRIBE_INPUT_CODE": "answer",
            }.get(name, "answer")
            out = self.ai.chat(role, current, context)
            if name in ("OPTIMIZE_QUERY", "GENERATE_QUERIES", "IMPROVE_INPUT"):
                current = out
            yield {"action": name, "result": out}
