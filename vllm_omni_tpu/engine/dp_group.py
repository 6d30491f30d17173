"""Data-parallel engine replica group with load-balanced dispatch.

Reference parity: DPLBStageEngineCoreClient
(stage_engine_core_client.py:371) — N replicas of one stage, requests
routed by queue depth. On TPU each replica owns a disjoint chip subset
(its own mesh; TP inside a replica composes via the replica's mesh).
"""

from __future__ import annotations

from typing import Any, Optional

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.outputs import RequestOutput
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.parallel import make_mesh

logger = init_logger(__name__)


class DPEngineGroup:
    """N EngineCore replicas behind one add_request/step interface."""

    def __init__(self, config: EngineConfig, replicas: int,
                 devices: Optional[list[list]] = None,
                 tokenizer: Any = None) -> None:
        if replicas < 1:
            raise ValueError("replicas must be >= 1")
        self.engines: list[EngineCore] = []
        self._route: dict[str, int] = {}  # request_id → replica
        for i in range(replicas):
            mesh = None
            if devices is not None:
                dev = devices[i]
                tp = len(dev)
                mesh = make_mesh((1, tp), ("dp", "tp"), devices=dev)
            self.engines.append(EngineCore(config, mesh=mesh,
                                           tokenizer=tokenizer))

    # -- routing ------------------------------------------------------------
    def _pick(self) -> int:
        """Least-loaded replica (reference load balancing by queue
        length, distributed/omni_coordinator/load_balancer.py:82)."""
        loads = [e.scheduler.num_unfinished for e in self.engines]
        return loads.index(min(loads))

    def add_request(self, prompt_token_ids: list[int],
                    sampling_params: Optional[SamplingParams] = None,
                    request_id: Optional[str] = None,
                    **kwargs: Any) -> str:
        idx = self._pick()
        rid = self.engines[idx].add_request(
            prompt_token_ids, sampling_params, request_id=request_id,
            **kwargs)
        self._route[rid] = idx
        return rid

    def abort_request(self, request_id: str) -> bool:
        idx = self._route.get(request_id)
        if idx is not None:
            return self.engines[idx].abort_request(request_id)
        return any(e.abort_request(request_id) for e in self.engines)

    def notify_chunk(self, request_id: str, token_ids: list[int],
                     final: bool = False) -> None:
        idx = self._route.get(request_id)
        if idx is None:
            raise KeyError(request_id)
        self.engines[idx].notify_chunk(request_id, token_ids, final)

    def has_unfinished(self) -> bool:
        return any(e.has_unfinished() for e in self.engines)

    def step(self) -> list[RequestOutput]:
        outs: list[RequestOutput] = []
        for e in self.engines:
            if e.has_unfinished():
                outs.extend(e.step())
        for o in outs:
            if o.finished:
                self._route.pop(o.request_id, None)
        return outs

    @property
    def queue_lengths(self) -> list[int]:
        return [e.scheduler.num_unfinished for e in self.engines]
