"""Per-role prompt templates for the answer engine.

Mirrors the roles of the reference's prompt module
(`ai_server/src/prompts/main.py`: answer, google_query_translator/
"optimize query", party_planner — each a system+user template pair).
Templates are original text with the same functional contracts."""

from __future__ import annotations

from typing import Dict

_TEMPLATES: Dict[str, str] = {
    "answer": (
        "You are a helpful search assistant. Use ONLY the provided context "
        "to answer. If the context is insufficient, say so briefly.\n"
        "### Context\n{context}\n### Question\n{prompt}\n### Answer\n"
    ),
    "google_query_translator": (
        "Rewrite the user's question as a short keyword search query. "
        "Reply with the query only, no punctuation.\n"
        "Question: {prompt}\nQuery:"
    ),
    "party_planner": (
        "Plan the steps to answer the user's request. Reply with JSON "
        '{{"actions": [{{"step": NAME, "description": TEXT}}]}} using steps '
        "from: OPTIMIZE_QUERY, GENERATE_QUERIES, PERFORM_ORAMA_SEARCH, "
        "DESCRIBE_INPUT_CODE, IMPROVE_INPUT, CREATE_CODE, ASK_FOLLOWUP, "
        "GIVE_REPLY.\nRequest: {prompt}\nJSON:"
    ),
    "autoquery": (
        "Convert the natural-language request into a JSON search-params "
        'object {{"term": ..., "mode": ...}}.\nRequest: {prompt}\nJSON:'
    ),
}


def render(role: str, prompt: str, context: str = "") -> str:
    template = _TEMPLATES.get(role)
    if template is None:
        template = "{prompt}"
    return template.format(prompt=prompt, context=context)
