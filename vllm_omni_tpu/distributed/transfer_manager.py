"""Per-request payload transfer between stages.

Reference parity: OmniKVTransferManager (kv_transfer_manager.py:274):
extract → serialize → connector.put on the producer; connector.get →
re-inject on the consumer; retry with backoff (:931); chunked/async
streaming via the chunk adapter (transfer_adapter/chunk_transfer_adapter
.py) — here the chunk path is the `put_chunk`/`iter_chunks` pair used by
async_chunk stage edges.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Iterator, Optional

from vllm_omni_tpu.distributed.connectors import ConnectorBase
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class TransferManager:
    def __init__(self, connector: ConnectorBase, retries: int = 3,
                 retry_delay_s: float = 0.05) -> None:
        self.connector = connector
        self.retries = retries
        self.retry_delay_s = retry_delay_s
        self._chunk_counts: dict[str, int] = {}
        self._lock = threading.Lock()
        # transfer stats per edge (reference: TransferEdgeStats stats.py:59)
        self.tx_bytes: dict[tuple[int, int], int] = {}
        self.rx_bytes: dict[tuple[int, int], int] = {}

    # -- whole payloads ------------------------------------------------------
    def send(self, from_stage: int, to_stage: int, request_id: str,
             payload: dict[str, Any]) -> dict:
        ok, nbytes, meta = self.connector.put(from_stage, to_stage,
                                              request_id, payload)
        if not ok:
            raise RuntimeError(f"connector put failed for {request_id}")
        edge = (from_stage, to_stage)
        self.tx_bytes[edge] = self.tx_bytes.get(edge, 0) + nbytes
        return meta

    def receive(self, from_stage: int, to_stage: int, request_id: str,
                metadata: Optional[dict] = None) -> Any:
        last: Optional[Exception] = None
        for attempt in range(self.retries):
            try:
                payload, nbytes = self.connector.get(
                    from_stage, to_stage, request_id, metadata)
                edge = (from_stage, to_stage)
                self.rx_bytes[edge] = self.rx_bytes.get(edge, 0) + nbytes
                return payload
            except KeyError as e:  # not there yet — retry w/ backoff
                last = e
                time.sleep(self.retry_delay_s * (attempt + 1))
        raise TimeoutError(
            f"payload {request_id} (s{from_stage}->s{to_stage}) never "
            f"arrived") from last

    def release(self, from_stage: int, to_stage: int,
                request_id: str) -> None:
        self.connector.cleanup(from_stage, to_stage, request_id)

    # -- chunk streaming (async_chunk edges) ---------------------------------
    def put_chunk(self, from_stage: int, to_stage: int, request_id: str,
                  chunk: Any, final: bool = False) -> int:
        """Append one chunk; returns its index. The consumer polls
        `get_chunk` / `iter_chunks`."""
        with self._lock:
            idx = self._chunk_counts.get(request_id, 0)
            self._chunk_counts[request_id] = idx + 1
        self.connector.put(from_stage, to_stage,
                           f"{request_id}/chunk{idx}",
                           {"data": chunk, "final": final})
        return idx

    def get_chunk(self, from_stage: int, to_stage: int, request_id: str,
                  idx: int, timeout_s: float = 30.0) -> tuple[Any, bool]:
        """→ (chunk, final); blocks with backoff until available."""
        deadline = time.monotonic() + timeout_s
        delay = self.retry_delay_s
        while True:
            try:
                payload, _ = self.connector.get(
                    from_stage, to_stage, f"{request_id}/chunk{idx}")
                return payload["data"], bool(payload["final"])
            except KeyError:
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"chunk {idx} of {request_id} timed out")
                time.sleep(delay)
                delay = min(delay * 2, 0.25)

    def iter_chunks(self, from_stage: int, to_stage: int,
                    request_id: str,
                    timeout_s: float = 30.0) -> Iterator[Any]:
        idx = 0
        while True:
            chunk, final = self.get_chunk(from_stage, to_stage,
                                          request_id, idx, timeout_s)
            yield chunk
            self.connector.cleanup(from_stage, to_stage,
                                   f"{request_id}/chunk{idx}")
            idx += 1
            if final:
                return
