"""Service coordinator: instance registry, heartbeats, load balancing.

Reference parity: distributed/omni_coordinator/ (OmniCoordinator ZMQ
ROUTER registry omni_coordinator.py:19; stage/hub clients :214/:164;
heartbeat-timeout → ERROR and dropped from the published list :132-157;
load_balancer.py:82 picks by queue length).

Wire protocol: msgpack over ZMQ — ROUTER/DEALER for
register/heartbeat/list, PUB/SUB for instance-list pushes.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import msgpack
import zmq

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

HEARTBEAT_INTERVAL_S = 2.0
HEARTBEAT_TIMEOUT_S = 6.0


@dataclass
class InstanceInfo:
    instance_id: str
    endpoint: str  # how clients reach this engine (http addr etc.)
    stage_id: int = 0
    queue_len: int = 0
    status: str = "READY"  # READY | ERROR
    last_heartbeat: float = field(default_factory=time.monotonic)
    meta: dict[str, Any] = field(default_factory=dict)

    def to_wire(self) -> dict:
        return {"instance_id": self.instance_id, "endpoint": self.endpoint,
                "stage_id": self.stage_id, "queue_len": self.queue_len,
                "status": self.status, "meta": self.meta}


class Coordinator:
    """ROUTER registry + PUB instance broadcaster."""

    def __init__(self, bind_addr: str = "tcp://127.0.0.1:0",
                 pub_addr: str = "tcp://127.0.0.1:0") -> None:
        self.ctx = zmq.Context.instance()
        self.router = self.ctx.socket(zmq.ROUTER)
        port = self.router.bind_to_random_port("tcp://127.0.0.1") \
            if bind_addr.endswith(":0") else self.router.bind(bind_addr)
        self.addr = f"tcp://127.0.0.1:{port}" if bind_addr.endswith(":0") \
            else bind_addr
        self.pub = self.ctx.socket(zmq.PUB)
        pport = self.pub.bind_to_random_port("tcp://127.0.0.1") \
            if pub_addr.endswith(":0") else self.pub.bind(pub_addr)
        self.pub_addr = f"tcp://127.0.0.1:{pport}" \
            if pub_addr.endswith(":0") else pub_addr
        self.instances: dict[str, InstanceInfo] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        poller = zmq.Poller()
        poller.register(self.router, zmq.POLLIN)
        last_sweep = time.monotonic()
        while not self._stop.is_set():
            events = dict(poller.poll(timeout=200))
            if self.router in events:
                ident, _, raw = self.router.recv_multipart()
                msg = msgpack.unpackb(raw, raw=False)
                reply = self._handle(msg)
                self.router.send_multipart(
                    [ident, b"", msgpack.packb(reply)])
            now = time.monotonic()
            if now - last_sweep > 1.0:
                self._sweep(now)
                last_sweep = now

    def _handle(self, msg: dict) -> dict:
        kind = msg.get("type")
        with self._lock:
            if kind == "register":
                info = InstanceInfo(
                    instance_id=msg["instance_id"],
                    endpoint=msg.get("endpoint", ""),
                    stage_id=msg.get("stage_id", 0),
                    meta=msg.get("meta", {}))
                self.instances[info.instance_id] = info
                logger.info("registered instance %s", info.instance_id)
                self._publish()
                return {"ok": True}
            if kind == "heartbeat":
                inst = self.instances.get(msg["instance_id"])
                if inst is None:
                    return {"ok": False, "error": "unknown instance"}
                inst.last_heartbeat = time.monotonic()
                inst.queue_len = msg.get("queue_len", 0)
                if inst.status == "ERROR":
                    inst.status = "READY"
                    self._publish()
                return {"ok": True}
            if kind == "deregister":
                self.instances.pop(msg["instance_id"], None)
                self._publish()
                return {"ok": True}
            if kind == "list":
                return {"ok": True, "instances": [
                    i.to_wire() for i in self.instances.values()
                    if i.status == "READY"]}
        return {"ok": False, "error": f"unknown type {kind!r}"}

    def _sweep(self, now: float) -> None:
        with self._lock:
            changed = False
            for inst in self.instances.values():
                if inst.status == "READY" and \
                        now - inst.last_heartbeat > HEARTBEAT_TIMEOUT_S:
                    inst.status = "ERROR"
                    changed = True
                    logger.warning("instance %s missed heartbeats → ERROR",
                                   inst.instance_id)
            if changed:
                self._publish()

    def _publish(self) -> None:
        live = [i.to_wire() for i in self.instances.values()
                if i.status == "READY"]
        self.pub.send_multipart(
            [b"instances", msgpack.packb(live)])

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)
        self.router.close(0)
        self.pub.close(0)


class StageCoordClient:
    """Engine-side client: register + background heartbeats (reference
    omni_coord_client_for_stage.py:214)."""

    def __init__(self, coord_addr: str, instance_id: str,
                 endpoint: str = "", stage_id: int = 0,
                 queue_len_fn=None) -> None:
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.DEALER)
        self.sock.connect(coord_addr)
        self.instance_id = instance_id
        self.queue_len_fn = queue_len_fn or (lambda: 0)
        self._rpc({"type": "register", "instance_id": instance_id,
                   "endpoint": endpoint, "stage_id": stage_id})
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._beat, daemon=True)
        self._thread.start()

    def _rpc(self, msg: dict, timeout_ms: int = 2000) -> dict:
        self.sock.send_multipart([b"", msgpack.packb(msg)])
        if self.sock.poll(timeout_ms):
            _, raw = self.sock.recv_multipart()
            return msgpack.unpackb(raw, raw=False)
        raise TimeoutError("coordinator rpc timed out")

    def _beat(self) -> None:
        while not self._stop.wait(HEARTBEAT_INTERVAL_S):
            try:
                self._rpc({"type": "heartbeat",
                           "instance_id": self.instance_id,
                           "queue_len": int(self.queue_len_fn())})
            except Exception:
                logger.warning("heartbeat failed", exc_info=True)

    def close(self) -> None:
        self._stop.set()
        try:
            self._rpc({"type": "deregister",
                       "instance_id": self.instance_id}, timeout_ms=500)
        except Exception:
            pass
        self._thread.join(timeout=3)
        self.sock.close(0)


class HubClient:
    """Consumer-side client: query live instances, pick by least queue
    length (reference hub client + load_balancer.py:82)."""

    def __init__(self, coord_addr: str) -> None:
        self.ctx = zmq.Context.instance()
        self.sock = self.ctx.socket(zmq.DEALER)
        self.sock.connect(coord_addr)

    def list_instances(self, stage_id: Optional[int] = None
                       ) -> list[dict]:
        self.sock.send_multipart(
            [b"", msgpack.packb({"type": "list"})])
        if not self.sock.poll(2000):
            raise TimeoutError("coordinator rpc timed out")
        _, raw = self.sock.recv_multipart()
        out = msgpack.unpackb(raw, raw=False)["instances"]
        if stage_id is not None:
            out = [i for i in out if i["stage_id"] == stage_id]
        return out

    def pick(self, stage_id: Optional[int] = None) -> Optional[dict]:
        """Least-loaded READY instance."""
        insts = self.list_instances(stage_id)
        if not insts:
            return None
        return min(insts, key=lambda i: i["queue_len"])

    def close(self) -> None:
        self.sock.close(0)
