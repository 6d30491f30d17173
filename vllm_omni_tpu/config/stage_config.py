"""Pipeline / stage configuration.

Reference parity: vllm_omni/config/stage_config.py (StageConfig :52,
ModelPipeline :154, StageConfigFactory :224) and the 37 YAMLs under
model_executor/stage_configs/. A pipeline is a DAG of stages; each stage is
an AR ("llm"), non-AR one-shot ("generation") or diffusion stage, declares
its input edges (`engine_input_source`), the processor gluing previous-stage
outputs into its prompt (`custom_process_input_func`, dotted path), its
device allocation, and whether it produces a user-facing output.

TPU mapping: `runtime.devices` selects a chip subset of the local topology
(or a mesh over them); each stage owns its own jax mesh.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import yaml


def resolve_dotted(path: str) -> Callable:
    """Resolve "pkg.mod.fn" → callable (reference: stage_config custom
    process input func resolution)."""
    mod_name, _, attr = path.rpartition(".")
    if not mod_name:
        raise ValueError(f"not a dotted path: {path!r}")
    mod = importlib.import_module(mod_name)
    return getattr(mod, attr)


@dataclass
class StageRuntime:
    """Where the stage runs."""

    devices: str = "all"  # "all" | "0" | "0,1" — local chip indices
    # multi-host: address of the host group that runs this stage (future)
    host: Optional[str] = None

    def device_indices(self, total: int) -> list[int]:
        if self.devices in ("all", "", None):
            return list(range(total))
        return [int(x) for x in str(self.devices).split(",")]


@dataclass
class StageConfig:
    stage_id: int
    stage_type: str  # "llm" | "diffusion"
    engine_args: dict[str, Any] = field(default_factory=dict)
    runtime: StageRuntime = field(default_factory=StageRuntime)
    # edges: ids of stages whose outputs feed this stage (empty = source)
    engine_input_source: list[int] = field(default_factory=list)
    custom_process_input_func: Optional[str] = None
    # final-stage output hook (hidden states → waveform/image etc.;
    # reference: per-model post-process registry diffusion/registry.py:344)
    custom_process_output_func: Optional[str] = None
    final_output: bool = False
    final_output_type: str = "text"  # text | latent | audio | image | video
    is_comprehension: bool = False
    default_sampling_params: dict[str, Any] = field(default_factory=dict)
    # async_chunk streaming on the edge into this stage (reference:
    # async_chunk_design.md): upstream sends chunks of `chunk_frames`
    async_chunk: bool = False
    chunk_frames: int = 25
    # after the first chunk, grow the chunk size geometrically up to
    # chunk_frames_max (0 → 4×chunk_frames; 1.0 growth → fixed size).
    # Keeps TTFP (small first chunk) while cutting per-chunk dispatch +
    # prefill overhead on later chunks — the reference's dynamic
    # initial chunk, async_chunk_design.md:28-33 / batch decode win :51
    chunk_frames_growth: float = 2.0
    chunk_frames_max: int = 0
    # cache this stage's finished outputs keyed by (prompt tokens,
    # params) and replay them for identical requests — the reference
    # OmniTensorPrefixCache role (core/prefix_cache.py:14, inter-stage
    # hidden-state reuse). Only sound for deterministic stages
    # (greedy / generation mode); off by default.
    cache_outputs: bool = False
    cache_outputs_capacity: int = 64

    def __post_init__(self) -> None:
        if self.stage_type not in ("llm", "diffusion"):
            raise ValueError(f"unknown stage_type {self.stage_type!r}")
        if isinstance(self.runtime, dict):
            self.runtime = StageRuntime(**self.runtime)

    def resolve_input_processor(self) -> Optional[Callable]:
        if self.custom_process_input_func is None:
            return None
        return resolve_dotted(self.custom_process_input_func)

    def resolve_output_processor(self) -> Optional[Callable]:
        if self.custom_process_output_func is None:
            return None
        return resolve_dotted(self.custom_process_output_func)


@dataclass
class ModelPipeline:
    """Validated DAG of stages (reference: stage_config.py:154
    ModelPipeline, validate_pipeline :182)."""

    stages: list[StageConfig]
    async_chunk: bool = False

    def __post_init__(self) -> None:
        self.validate()

    def validate(self) -> None:
        ids = [s.stage_id for s in self.stages]
        if ids != sorted(ids) or len(set(ids)) != len(ids):
            raise ValueError(f"stage ids must be unique & ordered, got {ids}")
        id_set = set(ids)
        for s in self.stages:
            for src in s.engine_input_source:
                if src not in id_set:
                    raise ValueError(
                        f"stage {s.stage_id} reads from unknown stage {src}")
                if src >= s.stage_id:
                    raise ValueError(
                        f"stage {s.stage_id} reads from later stage {src} "
                        "(cycles not allowed)")
        if not any(s.final_output for s in self.stages):
            # default: last stage is final
            self.stages[-1].final_output = True

    @property
    def num_stages(self) -> int:
        return len(self.stages)

    def stage(self, stage_id: int) -> StageConfig:
        for s in self.stages:
            if s.stage_id == stage_id:
                return s
        raise KeyError(stage_id)

    def consumers_of(self, stage_id: int) -> list[StageConfig]:
        return [s for s in self.stages if stage_id in s.engine_input_source]

    def final_stage_for(self, modality: str) -> StageConfig:
        """Modality → final stage resolution (reference:
        entrypoints/omni_base.py:172 _compute_final_stage_id)."""
        matches = [s for s in self.stages
                   if s.final_output and s.final_output_type == modality]
        if matches:
            return matches[-1]
        finals = [s for s in self.stages if s.final_output]
        return finals[-1]

    def final_stages(self) -> list[StageConfig]:
        return [s for s in self.stages if s.final_output]


def _apply_overrides(stage: dict[str, Any],
                     overrides: dict[str, Any]) -> None:
    """CLI/engine-arg overrides onto a stage dict (reference:
    stage_config.py:84-106 runtime_overrides)."""
    for k, v in overrides.items():
        if k == "engine_args":
            stage.setdefault("engine_args", {}).update(v)
        else:
            stage[k] = v


def load_stage_configs(path_or_dict: Any,
                       overrides: Optional[dict[int, dict]] = None
                       ) -> ModelPipeline:
    """Load a pipeline from a YAML path / string / dict (reference:
    entrypoints/utils.py load_and_resolve_stage_configs)."""
    if isinstance(path_or_dict, dict):
        raw = path_or_dict
    else:
        import os as _os

        text = str(path_or_dict)
        if "\n" not in text and (text.endswith((".yaml", ".yml", ".json"))
                                 or _os.path.isfile(text)):
            with open(text) as f:
                raw = yaml.safe_load(f)  # YAML is a JSON superset
        else:
            raw = yaml.safe_load(text)
    if not isinstance(raw, dict) or "stage_args" not in raw:
        raise ValueError("stage config must be a mapping with 'stage_args'")
    async_chunk = bool(raw.get("async_chunk", False))
    stages = []
    for sd in raw["stage_args"]:
        sd = dict(sd)
        if overrides and sd.get("stage_id") in overrides:
            _apply_overrides(sd, overrides[sd["stage_id"]])
        known = set(StageConfig.__dataclass_fields__)
        extra = {k: v for k, v in sd.items() if k not in known}
        sd = {k: v for k, v in sd.items() if k in known}
        if extra:
            sd.setdefault("engine_args", {}).update(extra)
        stages.append(StageConfig(**sd))
    return ModelPipeline(stages=stages, async_chunk=async_chunk)


def single_stage_pipeline(stage_type: str = "llm",
                          **engine_args: Any) -> ModelPipeline:
    """Pipeline with one stage — the common plain-LLM / plain-T2I case."""
    return ModelPipeline(stages=[
        StageConfig(stage_id=0, stage_type=stage_type,
                    engine_args=engine_args, final_output=True,
                    final_output_type="text" if stage_type == "llm"
                    else "image")
    ])
