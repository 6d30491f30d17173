"""Process-isolated diffusion stage engines.

Reference parity: StageDiffusionProc (diffusion/stage_diffusion_proc.py:42)
+ StageDiffusionClient (stage_diffusion_client.py:55): the diffusion
engine runs in its own process with its own JAX runtime, requests and
outputs ride the same ZMQ PUSH/PULL + msgpack/raw-bytes codec as LLM
stage procs. A DiT OOM/crash no longer takes the orchestrator down:
死亡 is detected on every client step and pending requests get
per-request error outputs (reference stage death handling,
engine/stage_init_utils.py cleanup).

Enable per diffusion stage with `process_isolation: true`.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import threading
import time
from typing import Any, Optional

import numpy as np
import zmq

from vllm_omni_tpu.core.outputs import DiffusionOutput
from vllm_omni_tpu.distributed.serialization import (decode_payload,
                                                     encode_payload)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def _diffusion_proc_main(config_kwargs: dict, ctrl_addr: str,
                         out_addr: str, platform: Optional[str]) -> None:
    import os

    if platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        os.environ["OMNI_TPU_PLATFORM"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion import DiffusionConfig, DiffusionEngine

    ctx = zmq.Context()
    ctrl = ctx.socket(zmq.PULL)
    ctrl.connect(ctrl_addr)
    out = ctx.socket(zmq.PUSH)
    out.connect(out_addr)

    engine = DiffusionEngine(DiffusionConfig(**config_kwargs))
    out.send(encode_payload({"type": "ready"}))

    running = True
    while running:
        timeout = 0 if engine.has_unfinished() else 50
        while ctrl.poll(timeout):
            msg = decode_payload(ctrl.recv())
            kind = msg["type"]
            if kind == "add":
                try:
                    engine.add_request(DiffusionRequest(
                        request_id=msg["request_id"],
                        prompt=msg.get("prompt", ""),
                        params=DiffusionSamplingParams(**msg["params"]),
                        negative_prompt=msg.get("negative_prompt"),
                        additional_information=msg.get(
                            "additional_information") or {}))
                except Exception as e:
                    out.send(encode_payload({
                        "type": "output",
                        "request_id": msg["request_id"],
                        "error": str(e)}))
            elif kind == "abort":
                engine.abort_request(msg["request_id"])
                out.send(encode_payload({
                    "type": "output", "request_id": msg["request_id"],
                    "error": "aborted"}))
            elif kind == "shutdown":
                running = False
                break
            timeout = 0
        if not running:
            break
        if engine.has_unfinished():
            for o in engine.step():
                out.send(encode_payload(_diff_output_to_wire(o)))
        else:
            time.sleep(0.002)
    ctrl.close(0)
    out.close(0)
    ctx.term()


def _diff_output_to_wire(o: DiffusionOutput) -> dict:
    return {
        "type": "output",
        "request_id": o.request_id,
        "finished": o.finished,
        "error": o.error,
        "images": np.asarray(o.images) if o.images is not None else None,
        "latents": np.asarray(o.latents)
        if o.latents is not None else None,
        "audio": np.asarray(o.audio) if o.audio is not None else None,
        "video": np.asarray(o.video) if o.video is not None else None,
        "step_index": o.step_index,
        "num_steps": o.num_steps,
        "stage_durations": dict(o.stage_durations),
    }


def _diff_output_from_wire(msg: dict) -> DiffusionOutput:
    return DiffusionOutput(
        request_id=msg["request_id"],
        images=msg.get("images"), latents=msg.get("latents"),
        audio=msg.get("audio"), video=msg.get("video"),
        finished=bool(msg.get("finished", True)),
        step_index=msg.get("step_index", 0),
        num_steps=msg.get("num_steps", 0),
        stage_durations=msg.get("stage_durations") or {},
        error=msg.get("error"))


class DiffusionProcClient:
    """Orchestrator-side handle to a process-isolated diffusion engine —
    same surface as an in-proc DiffusionEngine for _StageHandle."""

    def __init__(self, config_kwargs: dict,
                 platform: Optional[str] = None,
                 startup_timeout_s: float = 600.0,
                 max_restarts: int = 3) -> None:
        self.ctx = zmq.Context.instance()
        self.ctrl = self.ctx.socket(zmq.PUSH)
        cport = self.ctrl.bind_to_random_port("tcp://127.0.0.1")
        self.out = self.ctx.socket(zmq.PULL)
        oport = self.out.bind_to_random_port("tcp://127.0.0.1")
        self._inflight: set[str] = set()
        self._lock = threading.Lock()
        self._dead = False
        self._spawn_args = (config_kwargs, f"tcp://127.0.0.1:{cport}",
                            f"tcp://127.0.0.1:{oport}", platform)
        self._restarts_left = max_restarts
        self.proc = self._spawn()
        if not self.out.poll(int(startup_timeout_s * 1000)):
            self.shutdown()
            raise TimeoutError("diffusion stage proc did not become ready")
        ready = decode_payload(self.out.recv())
        assert ready.get("type") == "ready"

    def _spawn(self):
        mp_ctx = mp.get_context("spawn")
        proc = mp_ctx.Process(target=_diffusion_proc_main,
                              args=self._spawn_args, daemon=True)
        proc.start()
        return proc

    def _check_proc_death(self) -> list[DiffusionOutput]:
        """Detect a dead proc, error its in-flight requests, respawn
        (elastic recovery — beyond the reference, whose dead stage kills
        the engine). MUST run before any blocking ZMQ send: a PUSH with
        zero peers blocks forever; the respawned proc connects its
        sockets before model bring-up, unblocking queued sends."""
        if self._dead or self.proc is None or self.proc.is_alive():
            return []
        code = self.proc.exitcode
        with self._lock:
            dead = list(self._inflight)
            self._inflight.clear()
        if dead:
            logger.error("diffusion stage proc died (exit %s) with %d "
                         "requests in flight", code, len(dead))
        outs = [DiffusionOutput(
            request_id=rid, finished=True,
            error=f"diffusion stage process died (exit {code})")
            for rid in dead]
        if self._restarts_left > 0:
            self._restarts_left -= 1
            logger.warning("respawning diffusion stage proc (%d "
                           "restarts left)", self._restarts_left)
            self.proc = self._spawn()
        else:
            self._dead = True
        return outs

    def add_request(self, req) -> None:
        self._pending_errors = getattr(self, "_pending_errors", [])
        self._pending_errors.extend(self._check_proc_death())
        if self._dead:
            raise RuntimeError("diffusion stage proc is dead")
        with self._lock:
            self._inflight.add(req.request_id)
        self.ctrl.send(encode_payload({
            "type": "add", "request_id": req.request_id,
            "prompt": req.prompt,
            "params": dataclasses.asdict(req.params),
            "negative_prompt": req.negative_prompt,
            "additional_information": req.additional_information,
        }))

    def abort_request(self, request_id: str) -> bool:
        hit = request_id in self._inflight
        self._pending_errors = getattr(self, "_pending_errors", [])
        self._pending_errors.extend(self._check_proc_death())
        if not self._dead:
            self.ctrl.send(encode_payload({"type": "abort",
                                           "request_id": request_id}))
        return hit

    def has_unfinished(self) -> bool:
        return bool(self._inflight or
                    getattr(self, "_pending_errors", []))

    def step(self) -> list[DiffusionOutput]:
        outs: list[DiffusionOutput] = list(
            getattr(self, "_pending_errors", []))
        if outs:
            self._pending_errors = []
        while self.out.poll(0):
            msg = decode_payload(self.out.recv())
            if msg.get("type") != "output":
                continue
            o = _diff_output_from_wire(msg)
            if o.finished or o.error:
                with self._lock:
                    self._inflight.discard(o.request_id)
            outs.append(o)
        if self._inflight:
            outs.extend(self._check_proc_death())
        return outs

    def shutdown(self) -> None:
        try:
            self.ctrl.send(encode_payload({"type": "shutdown"}),
                           flags=zmq.NOBLOCK)
        except Exception:
            pass
        if self.proc.is_alive():
            self.proc.join(timeout=5)
        if self.proc.is_alive():
            self.proc.terminate()
            self.proc.join(timeout=2)
        self.ctrl.close(0)
        self.out.close(0)
