"""OpenAI-compatible request/response schemas.

Reference parity: entrypoints/openai/protocol/ (pydantic models for chat
completions with multimodal extensions, image generations, speech).
"""

from __future__ import annotations

import time
from typing import Any, Optional, Union

from pydantic import BaseModel, Field

from vllm_omni_tpu.utils import random_uuid


class ChatMessage(BaseModel):
    role: str
    content: Union[str, list[dict[str, Any]], None] = None
    # assistant messages echoing earlier tool calls / tool results
    # (reference serving_chat.py tool_calls round trip)
    tool_calls: Optional[list[dict[str, Any]]] = None
    tool_call_id: Optional[str] = None
    name: Optional[str] = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: list[ChatMessage]
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    n: int = 1
    stream: bool = False
    stop: Union[str, list[str], None] = None
    seed: Optional[int] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    ignore_eos: bool = False
    # OpenAI logit_bias: token id (string key) → additive bias
    logit_bias: Optional[dict[str, float]] = None
    # {"type": "json_object"} → grammar-masked decoding (core/guided.py);
    # "json_schema" is accepted and constrained to valid JSON (the
    # schema itself is advisory via the prompt, not token-masked)
    response_format: Optional[dict[str, Any]] = None
    # function/tool calling (reference serving_chat.py:32-76)
    tools: Optional[list[dict[str, Any]]] = None
    tool_choice: Union[str, dict[str, Any], None] = None
    # omni extension: requested output modalities (reference serving_chat
    # multimodal outputs)
    modalities: list[str] = Field(default_factory=lambda: ["text"])

    def to_sampling_params(self):
        from vllm_omni_tpu.core.sampling_params import SamplingParams

        stop = self.stop
        if isinstance(stop, str):
            stop = [stop]
        guided = None
        if self.response_format and self.response_format.get("type") in (
                "json_object", "json_schema"):
            guided = "json"
        return SamplingParams(
            max_tokens=self.max_tokens or self.max_completion_tokens or 128,
            temperature=self.temperature, top_p=self.top_p,
            top_k=self.top_k, stop=tuple(stop or ()), seed=self.seed,
            presence_penalty=self.presence_penalty,
            frequency_penalty=self.frequency_penalty,
            repetition_penalty=self.repetition_penalty,
            ignore_eos=self.ignore_eos,
            logit_bias={int(k): float(v)
                        for k, v in (self.logit_bias or {}).items()},
            guided=guided)


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: Union[str, list[int], list[str], list[list[int]]]
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    stream: bool = False
    stop: Union[str, list[str], None] = None
    seed: Optional[int] = None
    ignore_eos: bool = False
    n: int = 1  # choices (non-streaming): n concurrent generations
    # OpenAI logprobs: chosen-token logprobs are returned (top-k
    # alternatives beyond the sampled token are not captured)
    logprobs: Optional[int] = None

    def to_sampling_params(self):
        from vllm_omni_tpu.core.sampling_params import SamplingParams

        stop = self.stop
        if isinstance(stop, str):
            stop = [stop]
        return SamplingParams(max_tokens=self.max_tokens,
                              temperature=self.temperature,
                              top_p=self.top_p, stop=tuple(stop or ()),
                              seed=self.seed, ignore_eos=self.ignore_eos,
                              logprobs=self.logprobs)


class ImageGenerationRequest(BaseModel):
    model: str = ""
    prompt: str
    negative_prompt: Optional[str] = None
    n: int = 1
    size: str = "1024x1024"
    steps: int = 50
    guidance_scale: float = 3.5
    seed: Optional[int] = None
    response_format: str = "b64_json"

    def to_diffusion_params(self):
        from vllm_omni_tpu.core.sampling_params import \
            DiffusionSamplingParams

        w, h = (int(x) for x in self.size.split("x"))
        return DiffusionSamplingParams(
            num_inference_steps=self.steps, height=h, width=w,
            guidance_scale=self.guidance_scale, seed=self.seed,
            negative_prompt=self.negative_prompt, output_type="np")


class SpeechRequest(BaseModel):
    model: str = ""
    input: str
    voice: str = "default"
    response_format: str = "wav"  # wav | pcm | b64_json
    speed: float = 1.0
    # omni extensions (reference serving_speech): sentence chunking for
    # long inputs + per-chunk synthesis cache
    max_chunk_chars: int = 300
    use_cache: bool = True


class SpeechBatchRequest(BaseModel):
    """POST /v1/audio/speech/batch (reference api_server.py:977)."""

    model: str = ""
    inputs: list[str]
    voice: str = "default"
    response_format: str = "b64_json"
    speed: float = 1.0
    max_chunk_chars: int = 300
    use_cache: bool = True


class ImageEditRequest(BaseModel):
    """POST /v1/images/edits (reference api_server.py:1405) — img2img:
    base image + prompt + strength, JSON body with b64 PNG (the
    reference accepts multipart; JSON keeps the same fields)."""

    model: str = ""
    image: str  # b64-encoded PNG/JPEG
    prompt: str
    negative_prompt: Optional[str] = None
    n: int = 1
    size: Optional[str] = None  # defaults to the input image size
    steps: int = 50
    strength: float = 0.6
    guidance_scale: float = 3.5
    seed: Optional[int] = None
    response_format: str = "b64_json"


def make_chat_response(rid: str, model: str, text: str,
                       finish_reason: Optional[str],
                       prompt_tokens: int, completion_tokens: int,
                       multimodal: Optional[dict] = None,
                       tool_calls: Optional[list] = None) -> dict:
    message: dict[str, Any] = {"role": "assistant", "content": text}
    if multimodal:
        message["multimodal"] = multimodal
    if tool_calls:
        message["tool_calls"] = tool_calls
        message["content"] = text or None
        finish_reason = "tool_calls"
    return {
        "id": f"chatcmpl-{rid}",
        "object": "chat.completion",
        "created": int(time.time()),
        "model": model,
        "choices": [{
            "index": 0,
            "message": message,
            "finish_reason": finish_reason,
        }],
        "usage": {
            "prompt_tokens": prompt_tokens,
            "completion_tokens": completion_tokens,
            "total_tokens": prompt_tokens + completion_tokens,
        },
    }


def make_chat_chunk(rid: str, model: str, delta_text: str,
                    finish_reason: Optional[str] = None,
                    extra_delta: Optional[dict] = None) -> dict:
    delta: dict[str, Any] = {}
    if delta_text:
        delta["content"] = delta_text
    if extra_delta:
        delta.update(extra_delta)
    return {
        "id": f"chatcmpl-{rid}",
        "object": "chat.completion.chunk",
        "created": int(time.time()),
        "model": model,
        "choices": [{"index": 0, "delta": delta,
                     "finish_reason": finish_reason}],
    }
