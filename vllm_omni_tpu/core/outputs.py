"""Output types spanning AR + diffusion stages.

Reference parity: vllm_omni/outputs.py (`OmniRequestOutput` :58,
`OmniModelRunnerOutput` :39) and diffusion/data.py (`DiffusionOutput` :743).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class CompletionOutput:
    """One sampled completion for a request."""

    index: int
    text: str
    token_ids: list[int]
    finish_reason: Optional[str] = None
    logprobs: Optional[list[dict[int, float]]] = None
    hidden_states: Any = None  # [T, H] when requested for stage handoff


@dataclass
class RequestOutput:
    """What the engine returns per request tick / finish.

    Covers the union of reference OmniRequestOutput fields: text outputs,
    multimodal outputs (images / audio chunks), per-stage timing.
    """

    request_id: str
    prompt_token_ids: list[int] = field(default_factory=list)
    outputs: list[CompletionOutput] = field(default_factory=list)
    finished: bool = False
    # which pipeline stage produced this output
    stage_id: int = 0
    final_output_type: str = "text"  # text | image | audio | video | latent
    # multimodal payloads keyed by modality ("image": PIL/ndarray,
    # "audio": {"data": ndarray, "sample_rate": int}, ...)
    multimodal_output: dict[str, Any] = field(default_factory=dict)
    # inter-stage payload (reference: additional_information rides along)
    additional_information: dict[str, Any] = field(default_factory=dict)
    # metrics (reference: outputs.py:97 stage_durations)
    stage_durations: dict[str, float] = field(default_factory=dict)
    metrics: dict[str, float] = field(default_factory=dict)
    error: Optional[str] = None


@dataclass
class ModelRunnerOutput:
    """Per-step output of the AR model runner — device results pulled to
    host (reference: outputs.py:39 OmniModelRunnerOutput)."""

    req_ids: list[str]
    sampled_token_ids: list[int]
    # per-request final-layer hidden state rows for handoff, only when the
    # request asked for them
    hidden_states: dict[str, Any] = field(default_factory=dict)
    logprobs: dict[str, Any] = field(default_factory=dict)


@dataclass
class DiffusionOutput:
    """Result of a diffusion stage (reference: diffusion/data.py:743)."""

    request_id: str
    images: Any = None  # [N, H, W, C] uint8 / PIL list
    latents: Any = None
    audio: Any = None
    video: Any = None
    finished: bool = True
    step_index: int = 0
    num_steps: int = 0
    stage_durations: dict[str, float] = field(default_factory=dict)
    error: Optional[str] = None
