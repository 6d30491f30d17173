"""Process-isolated stage engines.

Reference parity: StageEngineCoreProc (stage_engine_core_proc.py:41 — a
subprocess wrapping the engine busy loop) + StageEngineCoreClient
(stage_engine_core_client.py:30 — ZMQ client in the orchestrator
process). Control messages ride ZMQ PUSH/PULL with the msgpack+raw-bytes
payload codec (distributed/serialization.py); each stage proc owns its
own JAX runtime (and, on hardware, its own chip subset via
JAX visible-device env).

Enable per stage with `process_isolation: true` in engine_args.
"""

from __future__ import annotations

import dataclasses
import multiprocessing as mp
import threading
import time
from typing import Any, Optional

import zmq

from vllm_omni_tpu.core.outputs import CompletionOutput, RequestOutput
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.distributed.serialization import (decode_payload,
                                                     encode_payload)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


# ---------------------------------------------------------------------------
# Subprocess side
# ---------------------------------------------------------------------------


def _stage_proc_main(engine_kwargs: dict, ctrl_addr: str, out_addr: str,
                     platform: Optional[str], visible_devices:
                     Optional[str], on_ready=None) -> None:
    import os

    if visible_devices is not None:
        os.environ["JAX_VISIBLE_DEVICES"] = visible_devices
    if platform == "cpu":
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=8")
        os.environ["OMNI_TPU_PLATFORM"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.engine.core import EngineCore

    ctx = zmq.Context()
    ctrl = ctx.socket(zmq.PULL)
    ctrl.connect(ctrl_addr)
    out = ctx.socket(zmq.PUSH)
    out.connect(out_addr)

    engine = EngineCore(EngineConfig.from_kwargs(**engine_kwargs))
    out.send(encode_payload({"type": "ready"}))
    if on_ready is not None:
        on_ready()

    running = True
    while running:
        # drain control messages (non-blocking when engine is busy)
        timeout = 0 if engine.has_unfinished() else 50
        while ctrl.poll(timeout):
            msg = decode_payload(ctrl.recv())
            kind = msg["type"]
            if kind == "add":
                sp = SamplingParams(**msg["sampling_params"])
                try:
                    engine.add_request(
                        list(msg.get("prompt_token_ids") or []), sp,
                        request_id=msg["request_id"],
                        **{k: v for k, v in msg.get("kwargs", {}).items()})
                except Exception as e:
                    out.send(encode_payload({
                        "type": "output",
                        "request_id": msg["request_id"],
                        "finished": True, "error": str(e)}))
            elif kind == "chunk":
                engine.notify_chunk(msg["request_id"],
                                    list(msg.get("token_ids") or []),
                                    final=bool(msg.get("final")))
            elif kind == "abort":
                engine.abort_request(msg["request_id"])
                out.send(encode_payload({
                    "type": "output", "request_id": msg["request_id"],
                    "finished": True, "error": "aborted"}))
            elif kind == "shutdown":
                running = False
                break
            timeout = 0
        if not running:
            break
        if engine.has_unfinished():
            for o in engine.step():
                out.send(encode_payload(_output_to_wire(o)))
        else:
            time.sleep(0.002)
    ctrl.close(0)
    out.close(0)
    ctx.term()


def _output_to_wire(o: RequestOutput) -> dict:
    comp = o.outputs[0] if o.outputs else None
    return {
        "type": "output",
        "request_id": o.request_id,
        "finished": o.finished,
        "error": o.error,
        "token_ids": list(comp.token_ids) if comp else [],
        "text": comp.text if comp else "",
        "finish_reason": comp.finish_reason if comp else None,
        "hidden_states": comp.hidden_states if comp is not None and
        comp.hidden_states is not None else None,
        # [[token, lp], ...] pairs: msgpack decode rejects int map keys
        # (strict_map_key), so the dict form cannot cross the wire
        "logprobs": [[int(k), float(v)] for d in comp.logprobs
                     for k, v in d.items()]
        if comp is not None and comp.logprobs else None,
        "additional_information": o.additional_information,
        "metrics": o.metrics,
    }


def _output_from_wire(msg: dict) -> RequestOutput:
    lps = msg.get("logprobs")
    comp = CompletionOutput(
        index=0, text=msg.get("text", ""),
        token_ids=list(msg.get("token_ids") or []),
        finish_reason=msg.get("finish_reason"),
        hidden_states=msg.get("hidden_states"),
        logprobs=[{int(t): lp} for t, lp in lps] if lps else None)
    return RequestOutput(
        request_id=msg["request_id"], outputs=[comp],
        finished=bool(msg.get("finished")), error=msg.get("error"),
        additional_information=msg.get("additional_information") or {},
        metrics=msg.get("metrics") or {})


# ---------------------------------------------------------------------------
# Client side
# ---------------------------------------------------------------------------


class StageProcClient:
    """Orchestrator-side handle to a process-isolated stage engine.
    Same surface as an in-proc EngineCore for PipelineRunner."""

    def __init__(self, engine_kwargs: dict,
                 platform: Optional[str] = None,
                 visible_devices: Optional[str] = None,
                 startup_timeout_s: float = 300.0,
                 max_restarts: int = 3) -> None:
        self.ctx = zmq.Context.instance()
        self.ctrl = self.ctx.socket(zmq.PUSH)
        cport = self.ctrl.bind_to_random_port("tcp://127.0.0.1")
        self.out = self.ctx.socket(zmq.PULL)
        oport = self.out.bind_to_random_port("tcp://127.0.0.1")
        self._inflight: set[str] = set()
        self._lock = threading.Lock()
        # elastic recovery (beyond the reference, which lets a dead
        # stage kill the engine — SURVEY §5.3): the ZMQ binds live on
        # this side, so a respawned proc reconnects to the same
        # endpoints and drains any control messages queued while down
        self._spawn_args = (engine_kwargs, f"tcp://127.0.0.1:{cport}",
                            f"tcp://127.0.0.1:{oport}", platform,
                            visible_devices)
        self._restarts_left = max_restarts
        self.proc = self._spawn()
        if not self.out.poll(int(startup_timeout_s * 1000)):
            self.shutdown()
            raise TimeoutError("stage proc did not become ready")
        ready = decode_payload(self.out.recv())
        assert ready.get("type") == "ready"

    def _spawn(self):
        mp_ctx = mp.get_context("spawn")
        proc = mp_ctx.Process(target=_stage_proc_main,
                              args=self._spawn_args, daemon=True)
        proc.start()
        return proc

    def _check_proc_death(self) -> list[RequestOutput]:
        """Detect a dead proc, error its in-flight requests, and respawn
        (elastic recovery). MUST run before any blocking ZMQ send: a
        PUSH socket with zero connected peers blocks forever, so sending
        to a dead proc without first triggering the respawn hangs the
        orchestrator (the respawned proc connects its sockets before
        engine bring-up, unblocking queued sends promptly)."""
        if getattr(self, "_dead", False) or self.proc is None or \
                self.proc.is_alive():
            return []
        code = self.proc.exitcode
        with self._lock:
            dead = list(self._inflight)
            self._inflight.clear()
        if dead:
            logger.error("stage proc died (exit %s) with %d requests "
                         "in flight", code, len(dead))
        outs = [RequestOutput(
            request_id=rid, outputs=[CompletionOutput(
                index=0, text="", token_ids=[])],
            finished=True, error=f"stage process died (exit {code})")
            for rid in dead]
        if self._spawn_args is not None and self._restarts_left > 0:
            self._restarts_left -= 1
            logger.warning("respawning stage proc (%d restarts left)",
                           self._restarts_left)
            self.proc = self._spawn()
        else:
            self._dead = True
        return outs

    # EngineCore-compatible surface ------------------------------------------
    def add_request(self, prompt_token_ids, sampling_params=None,
                    request_id: Optional[str] = None,
                    **kwargs: Any) -> str:
        from vllm_omni_tpu.utils import random_uuid

        self._pending_errors = getattr(self, "_pending_errors", [])
        self._pending_errors.extend(self._check_proc_death())
        rid = request_id or random_uuid()
        sp = sampling_params or SamplingParams()
        if getattr(self, "_dead", False):
            self._pending_errors.append(RequestOutput(
                request_id=rid, outputs=[CompletionOutput(
                    index=0, text="", token_ids=[])],
                finished=True, error="stage process is dead"))
            return rid
        with self._lock:
            self._inflight.add(rid)
        self.ctrl.send(encode_payload({
            "type": "add", "request_id": rid,
            "prompt_token_ids": list(prompt_token_ids or []),
            "sampling_params": dataclasses.asdict(sp),
            "kwargs": kwargs,
        }))
        return rid

    def notify_chunk(self, request_id: str, token_ids, final=False):
        self._pending_errors = getattr(self, "_pending_errors", [])
        self._pending_errors.extend(self._check_proc_death())
        if getattr(self, "_dead", False):
            return
        self.ctrl.send(encode_payload({
            "type": "chunk", "request_id": request_id,
            "token_ids": list(token_ids or []), "final": final}))

    def abort_request(self, request_id: str) -> bool:
        hit = request_id in self._inflight
        self._pending_errors = getattr(self, "_pending_errors", [])
        self._pending_errors.extend(self._check_proc_death())
        if getattr(self, "_dead", False):
            return hit
        self.ctrl.send(encode_payload({"type": "abort",
                                       "request_id": request_id}))
        return hit

    def has_unfinished(self) -> bool:
        return bool(self._inflight or
                    getattr(self, "_pending_errors", []))

    def step(self) -> list[RequestOutput]:
        """Drain whatever outputs the stage proc has pushed (the proc
        steps itself — this never blocks). A dead proc converts every
        in-flight request into an error output instead of hanging the
        pipeline (reference cleanup_failed_stage_initialization,
        engine/stage_init_utils.py)."""
        outs: list[RequestOutput] = list(
            getattr(self, "_pending_errors", []))
        if outs:
            self._pending_errors = []
        while self.out.poll(0):
            msg = decode_payload(self.out.recv())
            if msg.get("type") != "output":
                continue
            o = _output_from_wire(msg)
            if o.finished:
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
        self.proc.join(timeout=5)
        if self.proc.is_alive():
            self.proc.terminate()
            self.proc.join(timeout=2)
        self.ctrl.close(0)
        self.out.close(0)


class RemoteStageClient(StageProcClient):
    """Stage engine on ANOTHER host (reference multi-node startup,
    stage_engine_startup.py:102-599): instead of spawning a subprocess,
    pre-bind the control/output endpoints on a routable interface,
    publish them through the OmniMasterServer, and wait for a
    `remote_stage` worker to claim the stage and send READY. The wire
    protocol afterwards is identical to a local stage proc."""

    def __init__(self, engine_kwargs: dict, master, stage_id: int,
                 platform: Optional[str] = None,
                 startup_timeout_s: float = 600.0,
                 defer_wait: bool = False) -> None:
        from vllm_omni_tpu.engine.master import routable_host_ip

        self.ctx = zmq.Context.instance()
        self.ctrl = self.ctx.socket(zmq.PUSH)
        cport = self.ctrl.bind_to_random_port("tcp://0.0.0.0")
        self.out = self.ctx.socket(zmq.PULL)
        oport = self.out.bind_to_random_port("tcp://0.0.0.0")
        self._inflight = set()
        self._lock = threading.Lock()
        self.proc = None  # lives on another host
        self._spawn_args = None  # no local respawn for remote workers
        self._restarts_left = 0
        self.stage_id = stage_id
        self._master = master
        self._timeout_s = startup_timeout_s
        host = routable_host_ip()
        master.register_stage(stage_id, {
            "engine_kwargs": engine_kwargs,
            "ctrl_addr": f"tcp://{host}:{cport}",
            "out_addr": f"tcp://{host}:{oport}",
            "platform": platform,
        })
        if not defer_wait:
            self.wait_handshake()

    def wait_handshake(self) -> None:
        """Block until a remote_stage worker claims this stage and sends
        READY (all remote stages register first so workers bring up in
        parallel — reference connect_remote_engine_cores)."""
        if not self.out.poll(int(self._timeout_s * 1000)):
            raise TimeoutError(
                f"remote stage {self.stage_id} did not connect/handshake "
                f"within {self._timeout_s}s (master status: "
                f"{self._master.status(self.stage_id)})")
        ready = decode_payload(self.out.recv())
        assert ready.get("type") == "ready"
        logger.info("remote stage %d connected and ready", self.stage_id)

    def shutdown(self) -> None:
        try:
            self.ctrl.send(encode_payload({"type": "shutdown"}),
                           flags=zmq.NOBLOCK)
        except Exception:
            pass
        self.ctrl.close(0)
        self.out.close(0)
