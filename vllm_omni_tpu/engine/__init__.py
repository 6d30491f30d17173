"""Engines & orchestration (reference: vllm_omni/engine/).

`EngineCore` is the per-stage engine (reference: StageEngineCoreProc's
wrapped vLLM EngineCoreProc, stage_engine_core_proc.py:41, except we own
the engine outright). Higher layers (orchestrator, stage clients) build on
it.
"""

from vllm_omni_tpu.engine.core import EngineCore

__all__ = ["EngineCore"]
