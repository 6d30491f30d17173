"""Multi-node stage startup: master registration server + remote stage
workers.

Reference parity: `OmniMasterServer` (engine/stage_engine_startup.py:102
— pre-allocates ZMQ addresses per stage, runs a TCP registration server
so stages launched on OTHER hosts fetch their config and handshake, then
`connect_remote_engine_cores` waits for readiness).

TPU-first shape: a stage is one JAX process (its own chips); the
orchestrator host runs `OmniMasterServer`, pre-binds each remote stage's
control/output ZMQ endpoints on a routable interface, and publishes
{stage_id → engine_kwargs + endpoint addresses}. A worker host runs

    python -m vllm_omni_tpu.engine.remote_stage --master tcp://HOST:PORT

which claims a stage (optionally a specific --stage-id), builds the
engine, connects back to the pre-bound endpoints, and sends the READY
handshake — from there the wire protocol is identical to local
process-isolated stages (stage_proc._stage_proc_main).
"""

from __future__ import annotations

import json
import socket
import threading
import time
from typing import Any, Optional

import zmq

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def routable_host_ip() -> str:
    """Best-effort routable IP of this host (for advertised ZMQ
    endpoints). Override with OMNI_TPU_HOST_IP."""
    import os

    ip = os.environ.get("OMNI_TPU_HOST_IP")
    if ip:
        return ip
    try:
        # UDP connect doesn't send packets; picks the egress interface
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("8.8.8.8", 80))
        ip = s.getsockname()[0]
        s.close()
        return ip
    except OSError:
        return "127.0.0.1"


class OmniMasterServer:
    """ZMQ REP registration server for remote stage workers.

    Protocol (JSON):
      {"type": "fetch", "stage_id": N | null}  → {"ok", "stage_id",
          "spec": {engine_kwargs, ctrl_addr, out_addr, platform}} or
          {"ok": false, "error"}  (stage marked claimed on success)
      {"type": "ready", "stage_id": N}         → {"ok": true}
      {"type": "list"}                          → {"stages": {id: status}}
    """

    def __init__(self, host: str = "0.0.0.0", port: int = 0) -> None:
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.REP)
        if port == 0:
            port = self.sock.bind_to_random_port(f"tcp://{host}")
        else:
            self.sock.bind(f"tcp://{host}:{port}")
        self.port = port
        self.addr = f"tcp://{routable_host_ip()}:{port}"
        self._stages: dict[int, dict[str, Any]] = {}
        self._status: dict[int, str] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        logger.info("OmniMasterServer listening on %s", self.addr)

    def register_stage(self, stage_id: int, spec: dict[str, Any]) -> None:
        """Publish a stage for a remote worker to claim. spec holds
        engine_kwargs + pre-bound ctrl/out ZMQ addresses."""
        with self._lock:
            self._stages[stage_id] = spec
            self._status[stage_id] = "waiting"

    def status(self, stage_id: int) -> str:
        with self._lock:
            return self._status.get(stage_id, "unknown")

    def wait_ready(self, stage_id: int, timeout_s: float = 600.0) -> bool:
        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout_s:
            if self.status(stage_id) == "ready":
                return True
            time.sleep(0.05)
        return False

    def _serve(self) -> None:
        poller = zmq.Poller()
        poller.register(self.sock, zmq.POLLIN)
        while not self._stop.is_set():
            if not dict(poller.poll(100)):
                continue
            try:
                msg = json.loads(self.sock.recv())
            except Exception:
                self.sock.send(b'{"ok": false, "error": "bad request"}')
                continue
            self.sock.send(json.dumps(self._handle(msg)).encode())

    def _handle(self, msg: dict) -> dict:
        kind = msg.get("type")
        with self._lock:
            if kind == "fetch":
                want = msg.get("stage_id")
                for sid, spec in self._stages.items():
                    if self._status[sid] != "waiting":
                        continue
                    if want is not None and sid != want:
                        continue
                    self._status[sid] = "claimed"
                    return {"ok": True, "stage_id": sid, "spec": spec}
                return {"ok": False,
                        "error": f"no unclaimed stage (want={want})"}
            if kind == "ready":
                sid = msg.get("stage_id")
                if sid in self._status:
                    self._status[sid] = "ready"
                    return {"ok": True}
                return {"ok": False, "error": f"unknown stage {sid}"}
            if kind == "list":
                return {"stages": dict(self._status)}
        return {"ok": False, "error": f"unknown type {kind!r}"}

    def shutdown(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self.sock.close(0)


def fetch_assignment(master_addr: str, stage_id: Optional[int] = None,
                     timeout_s: float = 60.0,
                     poll_s: float = 1.0) -> tuple[int, dict]:
    """Worker side: claim a stage from the master (polls until one is
    published or timeout)."""
    ctx = zmq.Context.instance()
    t0 = time.monotonic()
    while True:
        sock = ctx.socket(zmq.REQ)
        sock.setsockopt(zmq.LINGER, 0)
        sock.connect(master_addr)
        sock.send(json.dumps(
            {"type": "fetch", "stage_id": stage_id}).encode())
        if sock.poll(int(timeout_s * 1000)):
            resp = json.loads(sock.recv())
            sock.close(0)
            if resp.get("ok"):
                return resp["stage_id"], resp["spec"]
        else:
            sock.close(0)
            raise TimeoutError(f"master {master_addr} unreachable")
        if time.monotonic() - t0 > timeout_s:
            raise TimeoutError(
                f"no stage assignment from {master_addr}: "
                f"{resp.get('error')}")
        time.sleep(poll_s)


def notify_ready(master_addr: str, stage_id: int) -> None:
    ctx = zmq.Context.instance()
    sock = ctx.socket(zmq.REQ)
    sock.setsockopt(zmq.LINGER, 0)
    sock.connect(master_addr)
    sock.send(json.dumps({"type": "ready", "stage_id": stage_id}).encode())
    sock.poll(10_000)
    try:
        sock.recv(zmq.NOBLOCK)
    except zmq.ZMQError:
        pass
    sock.close(0)
