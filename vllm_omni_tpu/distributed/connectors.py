"""Inter-stage data connectors.

Reference parity: omni_connectors/connectors/base.py:12 (OmniConnectorBase
ABC: put/get/cleanup/health/close + supports_raw_data), shm_connector.py:17
(SharedMemoryConnector), factory.py:24 (name registry). Mooncake-RDMA's
role (cross-node) maps to a DCN/gRPC connector in a later milestone — the
interface is identical by design.
"""

from __future__ import annotations

import threading
from abc import ABC, abstractmethod
from multiprocessing import shared_memory
from typing import Any, Callable, Optional

from vllm_omni_tpu.distributed.serialization import (decode_payload,
                                                     encode_payload)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class ConnectorBase(ABC):
    """put/get of named payloads along a stage edge."""

    supports_raw_data = False

    @abstractmethod
    def put(self, from_stage: int, to_stage: int, key: str,
            data: Any) -> tuple[bool, int, dict]:
        """→ (ok, nbytes, metadata for the receiving side)."""

    @abstractmethod
    def get(self, from_stage: int, to_stage: int, key: str,
            metadata: Optional[dict] = None) -> tuple[Any, int]:
        """→ (payload, nbytes); raises KeyError if absent."""

    def cleanup(self, from_stage: int, to_stage: int, key: str) -> None:
        pass

    def health(self) -> bool:
        return True

    def close(self) -> None:
        pass

    @staticmethod
    def edge_key(from_stage: int, to_stage: int, key: str) -> str:
        return f"s{from_stage}-s{to_stage}/{key}"


class InProcConnector(ConnectorBase):
    """Same-process stages (the round-1 execution model): payloads pass
    by reference — zero copies, zero serialization."""

    supports_raw_data = True

    def __init__(self) -> None:
        self._store: dict[str, Any] = {}
        self._lock = threading.Lock()

    def put(self, from_stage, to_stage, key, data):
        with self._lock:
            self._store[self.edge_key(from_stage, to_stage, key)] = data
        return True, 0, {}

    def get(self, from_stage, to_stage, key, metadata=None):
        with self._lock:
            return self._store[self.edge_key(from_stage, to_stage,
                                             key)], 0

    def cleanup(self, from_stage, to_stage, key):
        with self._lock:
            self._store.pop(self.edge_key(from_stage, to_stage, key), None)

    def close(self):
        self._store.clear()


class SharedMemoryConnector(ConnectorBase):
    """Single-node cross-process transport over POSIX shm segments
    (reference shm_connector.py:17). Payloads serialize via the
    header+raw-bytes codec; metadata carries the segment name."""

    def __init__(self, prefix: str = "omni") -> None:
        self.prefix = prefix
        self._segments: dict[str, shared_memory.SharedMemory] = {}
        self._lock = threading.Lock()

    def _seg_name(self, ek: str) -> str:
        import hashlib

        h = hashlib.md5(ek.encode()).hexdigest()[:24]
        return f"{self.prefix}_{h}"

    def put(self, from_stage, to_stage, key, data):
        blob = encode_payload(data)
        name = self._seg_name(self.edge_key(from_stage, to_stage, key))
        with self._lock:
            old = self._segments.pop(name, None)
            if old is not None:
                old.close()
                try:
                    old.unlink()
                except FileNotFoundError:
                    pass
            try:
                seg = shared_memory.SharedMemory(name=name, create=True,
                                                 size=len(blob))
            except FileExistsError:
                # stale segment from a previous crashed process/run with
                # the same deterministic name — reclaim it
                stale = shared_memory.SharedMemory(name=name)
                stale.close()
                stale.unlink()
                seg = shared_memory.SharedMemory(name=name, create=True,
                                                 size=len(blob))
            # payload first, magic last: a concurrent reader only trusts
            # the segment once the magic bytes appear
            seg.buf[5:len(blob)] = blob[5:]
            seg.buf[:5] = blob[:5]
            self._segments[name] = seg
        return True, len(blob), {"segment": name, "nbytes": len(blob)}

    def get(self, from_stage, to_stage, key, metadata=None):
        name = (metadata or {}).get("segment") or self._seg_name(
            self.edge_key(from_stage, to_stage, key))
        try:
            seg = shared_memory.SharedMemory(name=name)
        except FileNotFoundError:
            raise KeyError(name) from None
        except ValueError:
            # writer created the segment but hasn't sized it yet (race
            # between shm_open and ftruncate) — treat as not-ready
            raise KeyError(name) from None
        try:
            nbytes = (metadata or {}).get("nbytes", seg.size)
            payload = decode_payload(bytes(seg.buf[:nbytes]))
        except AssertionError:
            # magic not present yet — writer still copying → not-ready
            raise KeyError(name) from None
        finally:
            seg.close()
        return payload, nbytes

    def cleanup(self, from_stage, to_stage, key):
        name = self._seg_name(self.edge_key(from_stage, to_stage, key))
        with self._lock:
            seg = self._segments.pop(name, None)
        if seg is not None:
            seg.close()
            try:
                seg.unlink()
            except FileNotFoundError:
                pass

    def close(self):
        with self._lock:
            for seg in self._segments.values():
                seg.close()
                try:
                    seg.unlink()
                except FileNotFoundError:
                    pass
            self._segments.clear()


class ConnectorFactory:
    """Name → constructor registry with lazy backend imports
    (reference factory.py:24 — name→constructor, lazy imports)."""

    _registry: dict[str, Callable[..., ConnectorBase]] = {}
    _lazy = {
        "tcp": "vllm_omni_tpu.distributed.tcp_connector",
        "kv_store": "vllm_omni_tpu.distributed.kv_store_connector",
        "redis": "vllm_omni_tpu.distributed.kv_store_connector",
    }

    @classmethod
    def register(cls, name: str,
                 ctor: Callable[..., ConnectorBase]) -> None:
        cls._registry[name] = ctor

    @classmethod
    def create(cls, name: str, **kwargs: Any) -> ConnectorBase:
        if name not in cls._registry and name in cls._lazy:
            import importlib

            importlib.import_module(cls._lazy[name])
        if name not in cls._registry:
            raise ValueError(
                f"unknown connector {name!r}; have {sorted(cls._registry)}")
        return cls._registry[name](**kwargs)


ConnectorFactory.register("inproc", InProcConnector)
ConnectorFactory.register("shm", SharedMemoryConnector)
