"""Function/tool calling for /v1/chat/completions.

Reference parity: entrypoints/openai/serving_chat.py:32-76
(`maybe_serialize_tool_calls`, tool_calls filtering/serialization). The
reference leans on each model's chat template; here the contract is
explicit and model-agnostic:

* tools are rendered into a system preamble listing each function's
  JSON schema, instructing the model to emit
  ``<tool_call>{"name": ..., "arguments": {...}}</tool_call>``
  (the Hermes/Qwen wire convention — what Qwen-class checkpoints are
  trained on, so the same prompt works with and without a chat
  template);
* tokenizers whose chat template accepts a ``tools=`` kwarg get the
  tools natively and skip the preamble;
* model output is scanned for ``<tool_call>`` blocks which become
  OpenAI ``tool_calls`` entries with ``finish_reason="tool_calls"``.
"""

from __future__ import annotations

import json
from typing import Any, Optional

from vllm_omni_tpu.utils import random_uuid

TOOL_OPEN = "<tool_call>"
TOOL_CLOSE = "</tool_call>"


def render_tool_preamble(tools: list[dict[str, Any]],
                         tool_choice: Any = None) -> str:
    """System-message preamble describing the tools (fallback for
    tokenizers without native tools support in their chat template)."""
    lines = [
        "# Tools",
        "You may call one or more functions to assist with the user "
        "query.",
        "You are provided with function signatures within <tools>"
        "</tools> XML tags:",
        "<tools>",
    ]
    for t in tools:
        fn = t.get("function", t)
        lines.append(json.dumps(
            {"type": "function", "function": fn}, ensure_ascii=False))
    lines.append("</tools>")
    lines.append(
        "For each function call, return a json object with function "
        "name and arguments within <tool_call></tool_call> XML tags:")
    lines.append('<tool_call>\n{"name": <function-name>, "arguments": '
                 '<args-json-object>}\n</tool_call>')
    forced = forced_tool_name(tool_choice)
    if forced:
        lines.append(f"You MUST call the function {forced!r} now.")
    return "\n".join(lines)


def forced_tool_name(tool_choice: Any) -> Optional[str]:
    if isinstance(tool_choice, dict):
        return (tool_choice.get("function") or {}).get("name")
    return None


def tools_active(tools: Optional[list], tool_choice: Any) -> bool:
    return bool(tools) and tool_choice != "none"


def parse_tool_calls(text: str) -> tuple[str, list[dict[str, Any]]]:
    """Split generated text into (content, tool_calls). Malformed blocks
    (unparseable JSON) are left in the content untouched."""
    calls: list[dict[str, Any]] = []
    content_parts: list[str] = []
    pos = 0
    while True:
        start = text.find(TOOL_OPEN, pos)
        if start < 0:
            content_parts.append(text[pos:])
            break
        end = text.find(TOOL_CLOSE, start)
        if end < 0:
            # unterminated block (length-capped): try to parse the tail
            body = text[start + len(TOOL_OPEN):]
            parsed = _try_parse(body)
            if parsed is not None:
                content_parts.append(text[pos:start])
                calls.append(parsed)
            else:
                content_parts.append(text[pos:])
            break
        body = text[start + len(TOOL_OPEN):end]
        parsed = _try_parse(body)
        content_parts.append(text[pos:start])
        if parsed is not None:
            calls.append(parsed)
        else:
            content_parts.append(text[start:end + len(TOOL_CLOSE)])
        pos = end + len(TOOL_CLOSE)
    content = "".join(content_parts).strip()
    return content, calls


def _try_parse(body: str) -> Optional[dict[str, Any]]:
    try:
        obj = json.loads(body.strip())
    except (ValueError, TypeError):
        return None
    if not isinstance(obj, dict) or "name" not in obj:
        return None
    args = obj.get("arguments", {})
    return {
        "id": f"call_{random_uuid()[:24]}",
        "type": "function",
        "function": {
            "name": str(obj["name"]),
            "arguments": json.dumps(args, ensure_ascii=False)
            if not isinstance(args, str) else args,
        },
    }


def safe_stream_len(text: str) -> int:
    """How much of ``text`` can stream as content without leaking a
    (possibly partial) tool-call block: stops at the first TOOL_OPEN and
    holds back any tail that is a prefix of TOOL_OPEN."""
    start = text.find(TOOL_OPEN)
    if start >= 0:
        return start
    for k in range(min(len(TOOL_OPEN) - 1, len(text)), 0, -1):
        if text.endswith(TOOL_OPEN[:k]):
            return len(text) - k
    return len(text)
