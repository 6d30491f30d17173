"""`AsyncOmni` — async streaming client.

Reference parity: entrypoints/async_omni.py:43 (`generate` :156, abort
:502-559). The pipeline steps in a dedicated background thread (the
reference's Orchestrator background-thread asyncio loop,
orchestrator.py:108); outputs fan into per-request asyncio queues via
call_soon_threadsafe — the janus-queue pattern without the dependency.
"""

from __future__ import annotations

import asyncio
import threading
import time
from typing import Any, AsyncGenerator, Optional, Union

from vllm_omni_tpu.config.stage_config import (ModelPipeline,
                                               load_stage_configs,
                                               single_stage_pipeline)
from vllm_omni_tpu.core.outputs import RequestOutput
from vllm_omni_tpu.core.sampling_params import (DiffusionSamplingParams,
                                                SamplingParams)
from vllm_omni_tpu.engine.orchestrator import PipelineRunner
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.utils import random_uuid

logger = init_logger(__name__)


class EngineDeadError(RuntimeError):
    pass


class AsyncOmni:
    def __init__(self, model: str, stage_configs: Optional[Any] = None,
                 **engine_args: Any) -> None:
        if stage_configs is not None:
            pipeline = stage_configs if isinstance(
                stage_configs, ModelPipeline) else load_stage_configs(
                    stage_configs)
        else:
            pipeline = single_stage_pipeline("llm", model=model,
                                             **engine_args)
        self.runner = PipelineRunner(pipeline, default_model=model)
        self.tokenizer = self.runner.tokenizer
        self.runner.on_stream = self._emit
        self._lock = threading.Lock()
        self._queues: dict[str, tuple[asyncio.AbstractEventLoop,
                                      asyncio.Queue]] = {}
        self._dead: Optional[BaseException] = None
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="omni-engine-loop")
        self._thread.start()

    # -- engine thread ------------------------------------------------------
    def _run(self) -> None:
        try:
            while not self._stop:
                with self._lock:
                    busy = self.runner.has_unfinished()
                    if busy:
                        for out in self.runner.step():
                            self._emit(out)
                if not busy:
                    time.sleep(0.002)
        except BaseException as e:  # engine death → fail all waiters
            logger.exception("engine loop died")
            self._dead = e
            for loop, q in list(self._queues.values()):
                loop.call_soon_threadsafe(q.put_nowait, e)

    def _emit(self, out: RequestOutput) -> None:
        entry = self._queues.get(out.request_id)
        if entry is None:
            return
        loop, q = entry
        loop.call_soon_threadsafe(q.put_nowait, out)

    # -- client API ---------------------------------------------------------
    def is_alive(self) -> bool:
        return self._dead is None and self._thread.is_alive()

    async def generate(
        self, prompt: Union[str, list[int], dict],
        sampling_params: Union[SamplingParams, DiffusionSamplingParams,
                               None] = None,
        request_id: Optional[str] = None, modality: str = "text",
        resumable: bool = False, **submit_kwargs: Any,
    ) -> AsyncGenerator[RequestOutput, None]:
        """Async stream of RequestOutputs; the last one has
        finished=True. resumable=True opens a streaming-input request —
        feed further prompt chunks with `feed_input` (live TTS,
        reference async_omni.py:279)."""
        if self._dead is not None:
            raise EngineDeadError(str(self._dead))
        rid = request_id or random_uuid()
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        self._queues[rid] = (loop, q)
        try:
            sp, dp = None, None  # None → stage defaults govern
            if isinstance(sampling_params, SamplingParams):
                sp = sampling_params
            elif isinstance(sampling_params, DiffusionSamplingParams):
                dp = sampling_params
            src_is_diffusion = all(
                s.stage_type == "diffusion"
                for s in self.runner.pipeline.stages
                if not s.engine_input_source)
            with self._lock:
                if src_is_diffusion:
                    self.runner.submit([], sp, rid, modality=modality,
                                       diffusion_params=dp, prompt=prompt,
                                       **submit_kwargs)
                else:
                    token_ids = self.runner._tokenize(prompt)
                    if isinstance(prompt, dict) and \
                            prompt.get("mm_inputs") and \
                            "mm_inputs" not in submit_kwargs:
                        submit_kwargs["mm_inputs"] = prompt["mm_inputs"]
                    self.runner.submit(token_ids, sp, rid,
                                       modality=modality,
                                       diffusion_params=dp,
                                       resumable=resumable,
                                       **submit_kwargs)
            while True:
                out = await q.get()
                if isinstance(out, BaseException):
                    raise EngineDeadError(str(out))
                yield out
                if out.finished:
                    return
        finally:
            self._queues.pop(rid, None)

    async def abort(self, request_id: str) -> bool:
        with self._lock:
            return self.runner.abort(request_id)

    async def collective_rpc(self, method: str, *args: Any,
                             stage_ids=None, **kwargs: Any) -> dict:
        """Fan an RPC out to every stage engine (reference
        async_omni.py:502) — e.g. sleep/wake_up for RL rollout engines."""
        with self._lock:
            return self.runner.collective_rpc(method, *args,
                                              stage_ids=stage_ids,
                                              **kwargs)

    async def feed_input(self, request_id: str,
                         prompt: Union[str, list[int]],
                         final: bool = False) -> None:
        """Streaming input: append a chunk to a resumable request."""
        token_ids = self.runner._tokenize(prompt) if prompt else []
        with self._lock:
            self.runner.feed_input(request_id, token_ids, final=final)

    def shutdown(self) -> None:
        self._stop = True
        self._thread.join(timeout=5)
        self.runner.shutdown()

    # context manager sugar
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.shutdown()
