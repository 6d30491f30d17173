"""Tool/function-calling protocol units (reference
serving_chat.py:32-76 tool_calls serialization)."""

import json

from vllm_omni_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, make_chat_response)
from vllm_omni_tpu.entrypoints.openai.tools import (
    forced_tool_name, parse_tool_calls, render_tool_preamble,
    safe_stream_len, tools_active)

WEATHER_TOOL = {
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Get current weather",
        "parameters": {
            "type": "object",
            "properties": {"city": {"type": "string"}},
            "required": ["city"],
        },
    },
}


def test_parse_single_tool_call():
    text = ('Let me check.\n<tool_call>\n{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}\n</tool_call>')
    content, calls = parse_tool_calls(text)
    assert content == "Let me check."
    assert len(calls) == 1
    c = calls[0]
    assert c["type"] == "function"
    assert c["function"]["name"] == "get_weather"
    assert json.loads(c["function"]["arguments"]) == {"city": "Paris"}
    assert c["id"].startswith("call_")


def test_parse_multiple_and_malformed():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>not json</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    content, calls = parse_tool_calls(text)
    assert [c["function"]["name"] for c in calls] == ["a", "b"]
    assert "not json" in content  # malformed block left as content


def test_parse_unterminated_block():
    text = '<tool_call>{"name": "a", "arguments": {}}'
    content, calls = parse_tool_calls(text)
    assert len(calls) == 1 and content == ""


def test_no_tool_calls_passthrough():
    content, calls = parse_tool_calls("plain answer")
    assert content == "plain answer" and calls == []


def test_safe_stream_len_holds_back_partial_sentinel():
    assert safe_stream_len("hello ") == 6
    assert safe_stream_len("hello <tool") == 6
    assert safe_stream_len("hello <tool_call>{") == 6
    assert safe_stream_len("answer<") == 6
    assert safe_stream_len("a < b") == 5  # lone '<' mid-text: '< ' not a prefix


def test_render_preamble_and_forced_choice():
    pre = render_tool_preamble(
        [WEATHER_TOOL], tool_choice={"type": "function",
                                     "function": {"name": "get_weather"}})
    assert "get_weather" in pre and "<tools>" in pre
    assert "MUST call" in pre
    assert forced_tool_name({"function": {"name": "x"}}) == "x"
    assert forced_tool_name("auto") is None
    assert tools_active([WEATHER_TOOL], "none") is False
    assert tools_active([WEATHER_TOOL], "auto") is True
    assert tools_active(None, "auto") is False


def test_chat_response_with_tool_calls():
    calls = [{"id": "call_1", "type": "function",
              "function": {"name": "f", "arguments": "{}"}}]
    resp = make_chat_response("r", "m", "", "stop", 1, 2,
                              tool_calls=calls)
    choice = resp["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    assert choice["message"]["tool_calls"] == calls
    assert choice["message"]["content"] is None


def test_request_maps_response_format_and_logit_bias():
    req = ChatCompletionRequest(
        messages=[{"role": "user", "content": "hi"}],
        response_format={"type": "json_object"},
        logit_bias={"5": -10.0})
    sp = req.to_sampling_params()
    assert sp.guided == "json"
    assert sp.logit_bias == {5: -10.0}
    req2 = ChatCompletionRequest(
        messages=[{"role": "user", "content": "hi"}])
    assert req2.to_sampling_params().guided is None
