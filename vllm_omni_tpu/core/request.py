"""Request lifecycle types.

Reference parity: vllm_omni/request.py (`OmniRequest`), plus the
WAITING_FOR_CHUNK status the reference patches into vLLM's RequestStatus
(vllm_omni/patch.py:103) for async_chunk streaming. We define the enum
cleanly from day 1 (SURVEY.md §7 "no monkey-patching").
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.core.sampling_params import (DiffusionSamplingParams,
                                                SamplingParams)


class RequestStatus(enum.Enum):
    WAITING = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    # async_chunk: request is alive but blocked until the upstream stage
    # delivers its next input chunk (reference patch.py:103)
    WAITING_FOR_CHUNK = enum.auto()
    # KV/hidden-state extraction still in flight; don't free pages yet
    # (reference: core/sched/omni_ar_scheduler.py:64-67 deferred stop)
    WAITING_FOR_TRANSFER = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH_CAPPED = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_ERROR = enum.auto()

    @property
    def is_finished(self) -> bool:
        return self in _FINISHED

    @property
    def finish_reason(self) -> Optional[str]:
        return {
            RequestStatus.FINISHED_STOPPED: "stop",
            RequestStatus.FINISHED_LENGTH_CAPPED: "length",
            RequestStatus.FINISHED_ABORTED: "abort",
            RequestStatus.FINISHED_ERROR: "error",
        }.get(self)


_FINISHED = {
    RequestStatus.FINISHED_STOPPED,
    RequestStatus.FINISHED_LENGTH_CAPPED,
    RequestStatus.FINISHED_ABORTED,
    RequestStatus.FINISHED_ERROR,
}


@dataclass
class Request:
    """One in-flight AR generation request inside a stage engine."""

    request_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    arrival_time: float = field(default_factory=time.monotonic)
    # inputs beyond token ids --------------------------------------------
    prompt_embeds: Any = None  # [T, H] array — embeddings-as-prompt stages
    # with prompt_embeds: per-token bool mask of which positions take the
    # provided embeds (multimodal placeholder fusion); None = all
    embeds_token_mask: Any = None
    # M-RoPE: [3, T_prompt] (time/height/width) position ids for the
    # prompt, and the offset decode positions carry (max_id+1 -
    # prompt_len) — reference: vLLM MRotaryEmbedding semantics
    mrope_positions: Any = None
    mrope_delta: int = 0
    # payload carried across stages (hidden states, codec codes, ...)
    additional_information: dict[str, Any] = field(default_factory=dict)
    # multimodal encoder inputs (features already preprocessed host-side)
    mm_inputs: dict[str, Any] = field(default_factory=dict)
    # streaming input (resumable TTS text): more prompt chunks may arrive
    # (reference: async_omni_engine.py:965 resumable add_request)
    resumable: bool = False
    # guided decoding (sampling_params.guided): host-side grammar
    # session producing per-step logit masks (core/guided.py)
    guided_state: Any = None
    # state ---------------------------------------------------------------
    status: RequestStatus = RequestStatus.WAITING
    output_token_ids: list[int] = field(default_factory=list)
    # chosen-token logprobs, populated when sampling_params.logprobs
    # is requested (OpenAI completions logprobs surface)
    output_logprobs: list[float] = field(default_factory=list)
    num_computed_tokens: int = 0  # prompt tokens already prefilled
    page_ids: list[int] = field(default_factory=list)  # KV pages owned
    error: Optional[str] = None
    # metrics
    first_token_time: Optional[float] = None
    finish_time: Optional[float] = None

    def __post_init__(self) -> None:
        if not self.prompt_token_ids and self.prompt_embeds is None:
            raise ValueError("request needs prompt_token_ids or prompt_embeds")

    # -- derived ----------------------------------------------------------
    @property
    def num_prompt_tokens(self) -> int:
        if self.prompt_embeds is not None and not self.prompt_token_ids:
            return int(self.prompt_embeds.shape[0])
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def is_finished(self) -> bool:
        return self.status.is_finished

    @property
    def prefill_done(self) -> bool:
        return self.num_computed_tokens >= self.num_prompt_tokens

    def all_token_ids(self) -> list[int]:
        return list(self.prompt_token_ids) + self.output_token_ids

    def append_output_token(self, token_id: int,
                            logprob: float = None) -> None:
        if self.first_token_time is None:
            self.first_token_time = time.monotonic()
        self.output_token_ids.append(token_id)
        if logprob is not None:
            self.output_logprobs.append(float(logprob))
        if self.guided_state is not None:
            self.guided_state.advance(token_id)

    def extend_prompt(self, token_ids: list[int]) -> None:
        """Streaming input: append a new prompt chunk (resumable TTS)."""
        if not self.resumable:
            raise ValueError("extend_prompt on a non-resumable request")
        self.prompt_token_ids.extend(token_ids)


@dataclass
class DiffusionRequest:
    """One diffusion-stage request (reference: diffusion engine request in
    diffusion/diffusion_engine.py / sched/)."""

    request_id: str
    prompt: Any  # str | list[str] | dict with embeds
    params: DiffusionSamplingParams
    negative_prompt: Any = None
    additional_information: dict[str, Any] = field(default_factory=dict)
    arrival_time: float = field(default_factory=time.monotonic)
    status: RequestStatus = RequestStatus.WAITING
    # step-mode state (denoise progress lives host-side; device code is one
    # fixed-shape step — SURVEY.md §7 hard parts)
    step_index: int = 0
    step_state: Any = None  # opaque pipeline state between steps
    error: Optional[str] = None

    @property
    def is_finished(self) -> bool:
        return self.status.is_finished
