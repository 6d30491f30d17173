"""`Omni` — synchronous offline generation API.

Reference parity: entrypoints/omni.py:24 (`Omni.generate` :61) over
OmniBase (omni_base.py:68). For single-stage LLM pipelines this drives
EngineCore directly; multi-stage pipelines route through the orchestrator
(engine/orchestrator.py) once stages > 1.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Union

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.config.stage_config import (ModelPipeline,
                                               load_stage_configs,
                                               single_stage_pipeline)
from vllm_omni_tpu.core.outputs import RequestOutput
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.tokenizer import get_tokenizer

logger = init_logger(__name__)

PromptType = Union[str, list[int], dict]


class Omni:
    """Synchronous offline entrypoint.

    Omni(model="/path/to/model").generate(["hello"], sampling_params)
    """

    def __init__(self, model: str,
                 stage_configs: Optional[Any] = None,
                 **engine_args: Any) -> None:
        if stage_configs is not None:
            self.pipeline = stage_configs if isinstance(
                stage_configs, ModelPipeline) else load_stage_configs(
                    stage_configs)
        else:
            self.pipeline = single_stage_pipeline("llm", model=model,
                                                  **engine_args)
        stage0_args = self.pipeline.stages[0].engine_args or {}
        if self.pipeline.num_stages > 1 or \
                self.pipeline.stages[0].stage_type == "diffusion" or \
                stage0_args.get("process_isolation") or \
                stage0_args.get("placement") == "remote":
            from vllm_omni_tpu.engine.orchestrator import PipelineRunner

            self._multi = PipelineRunner(self.pipeline, default_model=model)
            self.engine = None
            self.tokenizer = self._multi.tokenizer
        else:
            self._multi = None
            stage = self.pipeline.stages[0]
            args = dict(stage.engine_args)
            args.setdefault("model", model)
            config = EngineConfig.from_kwargs(**args)
            self.tokenizer = get_tokenizer(
                config.model.tokenizer or config.model.model,
                config.model.trust_remote_code)
            self.engine = EngineCore(config, tokenizer=self.tokenizer)

    # -- API ----------------------------------------------------------------
    def generate(self, prompts: Union[PromptType, Sequence[PromptType]],
                 sampling_params: Union[SamplingParams,
                                        Sequence[SamplingParams], None]
                 = None) -> list[RequestOutput]:
        single = isinstance(prompts, (str, dict)) or (
            isinstance(prompts, list) and prompts
            and isinstance(prompts[0], int))
        if single:
            prompts = [prompts]
        n = len(prompts)
        from vllm_omni_tpu.core.sampling_params import \
            DiffusionSamplingParams

        if sampling_params is None:
            # None → stage defaults govern (an explicit SamplingParams()
            # would override them with global defaults)
            params_list = [None] * n
        elif isinstance(sampling_params,
                        (SamplingParams, DiffusionSamplingParams)):
            params_list = [sampling_params] * n
        else:
            params_list = list(sampling_params)
            if len(params_list) != n:
                raise ValueError("len(sampling_params) != len(prompts)")

        if self._multi is not None:
            return self._multi.generate(prompts, params_list)

        order: list[str] = []
        stage_defaults = self.pipeline.stages[0].default_sampling_params
        for prompt, params in zip(prompts, params_list):
            token_ids = self._tokenize(prompt)
            if params is None and stage_defaults:
                params = SamplingParams(**stage_defaults)
            kwargs = {}
            if isinstance(prompt, dict) and prompt.get("mm_inputs"):
                kwargs["mm_inputs"] = prompt["mm_inputs"]
            rid = self.engine.add_request(token_ids, params, **kwargs)
            order.append(rid)
        finals: dict[str, RequestOutput] = {}
        while self.engine.has_unfinished():
            for out in self.engine.step():
                if out.finished:
                    finals[out.request_id] = out
        return [finals[rid] for rid in order]

    def _tokenize(self, prompt: PromptType) -> list[int]:
        if isinstance(prompt, dict):
            if "prompt_token_ids" in prompt:
                return list(prompt["prompt_token_ids"])
            prompt = prompt.get("prompt", "")
        if isinstance(prompt, str):
            if self.tokenizer is None:
                raise ValueError(
                    "string prompt given but no tokenizer available; pass "
                    "prompt_token_ids")
            return self.tokenizer.encode(prompt)
        return list(prompt)  # already token ids
