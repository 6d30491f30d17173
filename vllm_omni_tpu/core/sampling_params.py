"""Request-level sampling parameters.

Reference parity: vllm_omni/inputs/data.py (`OmniSamplingParams`,
`OmniDiffusionSamplingParams` :174). We own these types outright (the
reference subclasses vLLM's SamplingParams; we have no upstream).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


@dataclass
class SamplingParams:
    """Sampling controls for AR (LLM) stages."""

    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1  # -1 = disabled
    min_p: float = 0.0  # filter tokens below min_p * max_prob
    # token id → additive logit bias (OpenAI logit_bias)
    logit_bias: dict[int, float] = field(default_factory=dict)
    # constrained decoding: "json" masks tokens to the JSON grammar
    # (OpenAI response_format json_object; core/guided.py)
    guided: Optional[str] = None
    min_tokens: int = 0
    repetition_penalty: float = 1.0
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    stop: Sequence[str] = ()
    stop_token_ids: Sequence[int] = ()
    seed: Optional[int] = None
    ignore_eos: bool = False
    logprobs: Optional[int] = None
    detokenize: bool = True
    # PD disaggregation: keep KV pages pinned after finish so the KV
    # transfer manager can extract them (reference deferred stop,
    # omni_ar_scheduler.py:64-67); release via engine.release_transfer
    pin_kv: bool = False
    # omni: request the final per-token hidden states for next-stage handoff
    # (reference: worker/gpu_ar_model_runner.py returns hidden states in
    # OmniModelRunnerOutput, outputs.py:39)
    return_hidden_states: bool = False
    # free-form payload that rides along the whole pipeline (reference:
    # `additional_information` in inputs/data.py)
    extra_args: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1.0:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError("top_k must be -1 (off) or >= 1")
        if not 0 <= self.min_p <= 1:
            raise ValueError("min_p must be in [0, 1]")
        if self.max_tokens < 1:
            raise ValueError("max_tokens must be >= 1")
        if self.guided not in (None, "json"):
            raise ValueError("guided must be None or 'json'")

    @property
    def greedy(self) -> bool:
        return self.temperature == 0.0


@dataclass
class DiffusionSamplingParams:
    """Per-request knobs for diffusion (DiT) stages (reference:
    inputs/data.py:174 OmniDiffusionSamplingParams)."""

    num_inference_steps: int = 50
    guidance_scale: float = 3.5
    true_cfg_scale: float = 1.0
    negative_prompt: Optional[str] = None
    height: int = 1024
    width: int = 1024
    num_frames: int = 1  # >1 for video pipelines
    fps: int = 16
    seed: Optional[int] = None
    num_outputs_per_prompt: int = 1
    output_type: str = "pil"  # pil | latent | np
    extra_args: dict[str, Any] = field(default_factory=dict)

    @property
    def use_cfg(self) -> bool:
        return self.guidance_scale > 1.0 or self.true_cfg_scale > 1.0
