"""DiffusionEngine: front door of a diffusion stage.

Reference parity: diffusion/diffusion_engine.py:65 (`step` :107,
`make_engine` :325) + the two scheduler modes (sched/request_scheduler.py
:19 whole-request; sched/step_scheduler.py:30 one denoise step per tick,
preemptible — docs/design/feature/diffusion_step_execution.md).
"""

from __future__ import annotations

import time
from collections import deque

import numpy as np
from typing import Optional

from vllm_omni_tpu.core.outputs import DiffusionOutput
from vllm_omni_tpu.core.request import DiffusionRequest, RequestStatus
from vllm_omni_tpu.diffusion.config import DiffusionConfig
from vllm_omni_tpu.diffusion.pipeline import DiffusionPipeline
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class DiffusionEngine:
    def __init__(self, config: DiffusionConfig) -> None:
        self.config = config
        t0 = time.monotonic()
        self.pipeline = DiffusionPipeline(config)
        self.waiting: deque[DiffusionRequest] = deque()
        self.running: Optional[DiffusionRequest] = None  # step mode
        self._all: dict[str, DiffusionRequest] = {}
        logger.info("diffusion engine up in %.1fs (%d layers, mode=%s)",
                    time.monotonic() - t0, config.dit.num_layers,
                    config.scheduler_mode)

    # -- requests -----------------------------------------------------------
    def add_request(self, req: DiffusionRequest) -> None:
        self._all[req.request_id] = req
        req.status = RequestStatus.WAITING
        self.waiting.append(req)

    def abort_request(self, request_id: str) -> bool:
        req = self._all.get(request_id)
        if req is None or req.is_finished:
            return False
        req.status = RequestStatus.FINISHED_ABORTED
        try:
            self.waiting.remove(req)
        except ValueError:
            pass
        if self.running is req:
            self.running = None
        return True

    def has_unfinished(self) -> bool:
        return bool(self.waiting) or self.running is not None

    # -- stepping -----------------------------------------------------------
    def step(self) -> list[DiffusionOutput]:
        """Request mode: run one whole request to completion. Step mode:
        tick exactly one denoise step of the active request (preemption
        points between ticks)."""
        if self.config.scheduler_mode == "request":
            return self._step_request_mode()
        return self._step_step_mode()

    def _step_request_mode(self) -> list[DiffusionOutput]:
        if not self.waiting:
            return []
        req = self.waiting.popleft()
        req.status = RequestStatus.RUNNING
        try:
            t0 = time.monotonic()
            images, state = self.pipeline.run(req)
            req.status = RequestStatus.FINISHED_STOPPED
            is_video = req.params.num_frames > 1
            from vllm_omni_tpu.diffusion.pipeline import (
                AUDIO_LATENT_FAMILIES)

            is_audio = self.pipeline.family in AUDIO_LATENT_FAMILIES
            audio = getattr(state, "audio_latents", None)
            if is_audio:  # audio-only family: `images` IS the latent audio
                audio, images, is_video = images, None, False
            return [DiffusionOutput(
                request_id=req.request_id,
                images=None if is_video else images,
                video=images if is_video else None,
                # joint AV families (LTX2) denoise an audio latent
                # stream alongside the video — hand it downstream raw
                audio=None if audio is None else np.asarray(audio),
                finished=True,
                step_index=state.step_index, num_steps=state.num_steps,
                stage_durations={"denoise_s": time.monotonic() - t0})]
        except Exception as e:  # per-request error isolation
            logger.exception("diffusion request %s failed", req.request_id)
            req.status = RequestStatus.FINISHED_ERROR
            return [DiffusionOutput(request_id=req.request_id,
                                    finished=True, error=str(e))]

    def _step_step_mode(self) -> list[DiffusionOutput]:
        if self.running is None:
            if not self.waiting:
                return []
            self.running = self.waiting.popleft()
            self.running.status = RequestStatus.RUNNING
            self.running.step_state = self.pipeline.prepare(self.running)
        req = self.running
        state = req.step_state
        try:
            self.pipeline.denoise_step(state)
            req.step_index = state.step_index
            if not state.done:
                return [DiffusionOutput(
                    request_id=req.request_id, finished=False,
                    step_index=state.step_index,
                    num_steps=state.num_steps)]
            images = self.pipeline.post_decode(state,
                                               req.params.output_type)
            req.status = RequestStatus.FINISHED_STOPPED
            self.running = None
            is_video = req.params.num_frames > 1
            from vllm_omni_tpu.diffusion.pipeline import (
                AUDIO_LATENT_FAMILIES)

            if self.pipeline.family in AUDIO_LATENT_FAMILIES:
                return [DiffusionOutput(
                    request_id=req.request_id, audio=images,
                    finished=True, step_index=state.step_index,
                    num_steps=state.num_steps,
                    stage_durations={
                        "denoise_s": time.monotonic() - state.t_start})]
            return [DiffusionOutput(
                request_id=req.request_id,
                images=None if is_video else images,
                video=images if is_video else None, finished=True,
                step_index=state.step_index, num_steps=state.num_steps,
                stage_durations={
                    "denoise_s": time.monotonic() - state.t_start})]
        except Exception as e:
            logger.exception("diffusion step failed for %s",
                             req.request_id)
            req.status = RequestStatus.FINISHED_ERROR
            self.running = None
            return [DiffusionOutput(request_id=req.request_id,
                                    finished=True, error=str(e))]

    # -- offline convenience -------------------------------------------------
    def generate(self, reqs: list[DiffusionRequest]
                 ) -> list[DiffusionOutput]:
        for r in reqs:
            self.add_request(r)
        finals: dict[str, DiffusionOutput] = {}
        while self.has_unfinished():
            for out in self.step():
                if out.finished:
                    finals[out.request_id] = out
        return [finals[r.request_id] for r in reqs]
