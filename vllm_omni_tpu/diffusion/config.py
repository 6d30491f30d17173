"""Diffusion stage configuration (reference: diffusion/data.py
OmniDiffusionConfig :353, DiffusionParallelConfig :35, TransformerConfig
:193)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.config.engine import ParallelConfig


@dataclass
class DiTConfig:
    """Transformer geometry for an MMDiT-style denoiser (Qwen-Image /
    Flux class: joint text+image token stream, AdaLN-Zero modulation —
    reference models/qwen_image/transformer_qwen_image.py)."""

    hidden_size: int = 1024
    num_layers: int = 8
    num_heads: int = 16
    head_dim: int = 64
    mlp_ratio: float = 4.0
    latent_channels: int = 16
    patch_size: int = 2
    text_dim: int = 1024  # incoming text-embedding width
    axes_dims_rope: tuple[int, ...] = (8, 28, 28)  # (t, h, w) freq split
    guidance_embeds: bool = False
    # "auto" = flash/XLA by hardware; "int8" = SageAttention-role
    # quantized attention (per-token int8 Q/K, s8×s8 QK^T on the MXU
    # int path — reference diffusion/attention/backends/sage_attn.py:27)
    attention_backend: str = "auto"
    # MoE DiT (HunyuanImage3 class, reference diffusion/models/
    # hunyuan_image3 — MoE transformer blocks with routed expert FFNs;
    # EP = expert dim sharded over the mesh). 0 experts = dense.
    num_experts: int = 0
    num_experts_per_tok: int = 2

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def patch_dim(self) -> int:
        return self.latent_channels * self.patch_size ** 2


@dataclass
class CacheAccelConfig:
    """Cache-based denoise acceleration (reference: TeaCache
    cache/teacache/, 1.5-2.0x, docs/design/feature/teacache.md:23).

    TPU-native twist: the skip decision runs ON DEVICE under lax.cond
    inside the jitted step — the denoise loop never syncs to host. State
    (previous modulated input, previous velocity, accumulated rel-L1)
    rides as device arrays between steps.
    """

    # "tea_cache": reuse the last computed velocity on skipped steps.
    # "taylor_seer": first-order Taylor extrapolation of the velocity
    # across skipped steps (reference cache-dit/TaylorSeer backend,
    # cache/cache_dit_backend.py:25) — same on-device rel-L1 skip
    # criterion, better prediction on trending velocities.
    backend: str = "none"  # "none" | "tea_cache" | "taylor_seer"
    rel_l1_thresh: float = 0.25
    # polynomial rescale of the raw rel-L1 (reference per-model
    # coefficient_estimator); highest degree first
    coefficients: tuple[float, ...] = (1.0, 0.0)

    def __post_init__(self) -> None:
        if self.backend not in ("none", "tea_cache", "taylor_seer"):
            raise ValueError(f"unknown cache backend {self.backend!r}")

    @property
    def enabled(self) -> bool:
        return self.backend in ("tea_cache", "taylor_seer")


@dataclass
class DiffusionConfig:
    """Everything one diffusion stage needs (subset of the reference's
    OmniDiffusionConfig; grows with features)."""

    model: str = "dummy"  # local diffusers dir | "dummy" (random init)
    dtype: str = "bfloat16"
    quantization: Optional[str] = None  # fp8 denoiser path
    dit: DiTConfig = field(default_factory=DiTConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    vae_scale_factor: int = 8
    vae_latent_channels: int = 16
    # scheduler
    num_train_timesteps: int = 1000
    flow_shift: float = 3.0
    use_dynamic_shifting: bool = False
    cache: CacheAccelConfig = field(default_factory=CacheAccelConfig)
    # host offload: "none" | "model" — model-level keeps the VAE in host
    # RAM while the DiT denoises and stages it to HBM only for decode
    # (reference offloader model-level mode, data.py:405-410 encoder↔DiT
    # GPU mutual exclusion)
    offload: str = "none"
    # execution
    scheduler_mode: str = "request"  # request | step
    enforce_eager: bool = False
    # resolution buckets (one compiled program per bucket)
    resolution_buckets: tuple[tuple[int, int], ...] = (
        (256, 256), (512, 512), (1024, 1024))
    seed: int = 0
    hf_overrides: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if isinstance(self.dit, dict):
            self.dit = DiTConfig(**self.dit)
        if isinstance(self.parallel, dict):
            self.parallel = ParallelConfig(**self.parallel)
        if isinstance(self.cache, dict):
            self.cache = CacheAccelConfig(**self.cache)
        if self.scheduler_mode not in ("request", "step"):
            raise ValueError(f"bad scheduler_mode {self.scheduler_mode!r}")
        # YAML gives lists; normalize so bucket membership checks work
        self.resolution_buckets = tuple(
            tuple(b) for b in self.resolution_buckets)
