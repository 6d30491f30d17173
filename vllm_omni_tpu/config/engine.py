"""Engine-level configuration.

Reference parity: vllm_omni/config/model.py:61 (OmniModelConfig),
engine/arg_utils.py:90 (OmniEngineArgs), diffusion/data.py:35
(DiffusionParallelConfig). TPU-first differences: parallelism is expressed
as a jax.sharding.Mesh axis layout, KV cache as paged HBM arrays with
static page counts, and compilation buckets replace CUDA-graph capture.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.utils import cdiv


@dataclass
class ModelConfig:
    """Which model to run and how to quantize it."""

    model: str  # HF repo id or local path
    dtype: str = "bfloat16"
    # weight quantization: None | "int8" | "int4" | "fp8"
    quantization: Optional[str] = None
    quant_group_size: int = 128  # for int4 grouped scales
    # fused qkv / gate_up projection layout (single weight stream + one
    # activation quant per block) — auto-disabled by the engine when
    # tp > 1, where a contiguous column split would mix q/k/v
    fused_qkv: bool = True
    # int8 weights + per-token int8 activations on the native s8×s8 MXU
    # dot (measured 83.4% of HBM speed-of-light vs 78.5% upcast,
    # benchmarks/layer_variants.py); applies when quantization="int8"
    # and the fused layout is active. ppl delta recorded in PPL_r02.json.
    int8_w8a8: bool = True
    # quantize lm_head with the weight scheme (reference excludes it;
    # we gate on measured ppl delta — see benchmarks/ppl_eval.py)
    quantize_lm_head: bool = False
    kv_cache_dtype: str = "auto"  # auto | bfloat16 | fp8 | int8
    max_model_len: int = 4096
    trust_remote_code: bool = False
    tokenizer: Optional[str] = None
    revision: Optional[str] = None
    seed: int = 0
    # architecture override (reference: hf_config_name in stage YAMLs)
    hf_config_name: Optional[str] = None
    hf_overrides: dict[str, Any] = field(default_factory=dict)
    # multimodal encoders for this stage (omni thinker): e.g.
    # {"audio": {...AudioEncoderConfig kwargs}, "vision": {...},
    #  "audio_token_id": N, "image_token_id": M}
    mm_encoders: dict[str, Any] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.quantization not in (None, "int8", "int4", "fp8"):
            raise ValueError(f"unknown quantization {self.quantization!r}")
        if self.kv_cache_dtype not in ("auto", "bfloat16", "fp8", "int8"):
            raise ValueError(f"unknown kv_cache_dtype {self.kv_cache_dtype!r}")


@dataclass
class CacheConfig:
    """Paged KV cache layout.

    KV lives in HBM as [num_pages, page_size, num_kv_heads, head_dim] per
    layer (per K and V). Pages are the continuous-batching allocation unit
    (reference: upstream vLLM paged KV; SURVEY.md §2.9 row 1).
    """

    page_size: int = 16  # tokens per page
    num_pages: Optional[int] = None  # None = derive from memory fraction
    memory_fraction: float = 0.7  # HBM fraction for KV when num_pages=None
    # host-side swap space (pages preempted to host RAM)
    swap_space_bytes: int = 0

    def pages_for(self, num_tokens: int) -> int:
        return cdiv(num_tokens, self.page_size)


@dataclass
class SchedulerConfig:
    """Continuous-batching scheduler limits (reference: vLLM scheduler args
    in stage YAMLs, e.g. max_num_batched_tokens qwen3_omni_moe.yaml:25)."""

    max_num_seqs: int = 64  # decode batch bucket (max running requests)
    max_num_batched_tokens: int = 2048  # per-step token budget (chunked prefill)
    max_queue_len: int = 4096
    # "ar" = autoregressive decode loop; "generation" = single-shot feed
    # all tokens at once (reference: OmniGenerationScheduler,
    # core/sched/omni_generation_scheduler.py:28)
    mode: str = "ar"
    enable_prefix_caching: bool = False
    # multi-step decode: chain up to this many decode iterations inside
    # one jitted program (host syncs once per chain — replaces the
    # reference's CUDA-graph decode capture; stop checks lag by <= this
    # many tokens)
    multi_step: int = 8
    # speculative decoding (n-gram prompt lookup): propose up to
    # spec_gamma tokens from repeated context n-grams and verify them in
    # ONE forward — multiplies tokens per weight pass exactly where
    # small-batch decode is MXU-pass-latency-bound
    # (docs/design/performance.md). 0 disables. Greedy requests only.
    spec_gamma: int = 0
    spec_ngram: int = 2
    # async chain pipelining: launch decode chain N+1 (from the
    # device-resident carry) BEFORE pulling chain N's sampled ids, so
    # the host round-trip + scheduling overlap device compute (the
    # reference gets this from vLLM v1 async scheduling; on a
    # high-latency dispatch path it is worth one RTT per chain). Output
    # delivery lags one chain; overshoot past a stop is discarded.
    async_chains: bool = True
    # static compilation buckets
    multi_step_buckets: tuple[int, ...] = (1, 2, 4, 8, 16)
    decode_bs_buckets: tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64)
    prefill_token_buckets: tuple[int, ...] = (16, 32, 64, 128, 256, 512,
                                              1024, 2048)

    def __post_init__(self) -> None:
        if self.mode not in ("ar", "generation"):
            raise ValueError(f"unknown scheduler mode {self.mode!r}")
        self.multi_step_buckets = tuple(
            b for b in sorted(set(self.multi_step_buckets))
            if b <= self.multi_step) or (1,)
        self.decode_bs_buckets = tuple(
            b for b in sorted(set(self.decode_bs_buckets))
            if b <= self.max_num_seqs) or (self.max_num_seqs,)
        if self.decode_bs_buckets[-1] < self.max_num_seqs:
            self.decode_bs_buckets = self.decode_bs_buckets + (self.max_num_seqs,)
        self.prefill_token_buckets = tuple(
            b for b in sorted(set(self.prefill_token_buckets))
            if b <= self.max_num_batched_tokens) or (self.max_num_batched_tokens,)
        if self.prefill_token_buckets[-1] < self.max_num_batched_tokens:
            self.prefill_token_buckets = self.prefill_token_buckets + (
                self.max_num_batched_tokens,)


@dataclass
class ParallelConfig:
    """Mesh layout for one stage.

    The reference composes dp × cfg × sp(ulysses×ring) × pp × tp via
    hand-rolled rank generators (diffusion/distributed/parallel_state.py:676).
    On TPU this collapses to a jax.sharding.Mesh with named axes; XLA
    inserts the collectives (SURVEY.md §7 "what we do differently").
    """

    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    # diffusion-side extra axes
    cfg_parallel_size: int = 1  # 1 | 2 | 3 (reference data.py:99-101)
    ulysses_degree: int = 1
    ring_degree: int = 1
    # DiT pipeline parallelism: transformer layer groups spread over a
    # "pp" mesh axis, activations hand off via ppermute in a GPipe
    # schedule over batch rows (reference PipeFusion-style PP,
    # group_coordinator.py:549)
    pipeline_parallel_size: int = 1
    expert_parallel: bool = False

    @property
    def sequence_parallel_size(self) -> int:
        return self.ulysses_degree * self.ring_degree

    @property
    def world_size(self) -> int:
        return (self.data_parallel_size * self.cfg_parallel_size *
                self.sequence_parallel_size * self.tensor_parallel_size *
                self.pipeline_parallel_size)

    def mesh_shape(self) -> dict[str, int]:
        """Ordered axis name → size. Order puts TP innermost so its
        collectives ride the fastest ICI links."""
        return {
            "dp": self.data_parallel_size,
            "cfg": self.cfg_parallel_size,
            "pp": self.pipeline_parallel_size,
            "ring": self.ring_degree,
            "ulysses": self.ulysses_degree,
            "tp": self.tensor_parallel_size,
        }


@dataclass
class EngineConfig:
    """Everything one stage engine needs."""

    model: ModelConfig
    cache: CacheConfig = field(default_factory=CacheConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    enforce_eager: bool = False  # skip jit (debug)

    @classmethod
    def from_kwargs(cls, model: str, **kwargs: Any) -> "EngineConfig":
        mc_fields = {f for f in ModelConfig.__dataclass_fields__}
        cc_fields = {f for f in CacheConfig.__dataclass_fields__}
        sc_fields = {f for f in SchedulerConfig.__dataclass_fields__}
        pc_fields = {f for f in ParallelConfig.__dataclass_fields__}
        mc, cc, sc, pc, rest = {}, {}, {}, {}, {}
        for k, v in kwargs.items():
            if k in mc_fields:
                mc[k] = v
            elif k in cc_fields:
                cc[k] = v
            elif k in sc_fields:
                sc[k] = v
            elif k in pc_fields:
                pc[k] = v
            else:
                rest[k] = v
        if rest:
            raise TypeError(f"unknown engine args: {sorted(rest)}")
        return cls(
            model=ModelConfig(model=model, **mc),
            cache=CacheConfig(**cc),
            scheduler=SchedulerConfig(**sc),
            parallel=ParallelConfig(**pc),
        )
