"""Cross-host TCP connector.

Reference parity: the Mooncake store/transfer-engine connectors
(mooncake_store_connector.py:22, mooncake_transfer_engine_connector.py:223)
— the cross-node stage-handoff data plane. On TPU pods, cross-host
*intra-stage* traffic rides ICI/DCN inside XLA; this connector carries
*inter-stage* payloads between hosts (D2H → TCP → H2D), same put/get
surface as every other connector.

Wire: length-prefixed frames; payloads are the standard msgpack-header +
raw-bytes codec. Each connector instance runs a registry server; `put`
stores locally and hands out `{"addr": ...}` metadata; a remote `get`
streams the blob over a fresh connection.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Any, Optional

from vllm_omni_tpu.distributed.connectors import ConnectorBase
from vllm_omni_tpu.distributed.serialization import (decode_payload,
                                                     encode_payload)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def _send_frame(sock: socket.socket, data: bytes) -> None:
    sock.sendall(struct.pack("<Q", len(data)) + data)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        buf.extend(chunk)
    return bytes(buf)


def _recv_frame(sock: socket.socket) -> bytes:
    (n,) = struct.unpack("<Q", _recv_exact(sock, 8))
    return _recv_exact(sock, n)


class TcpConnector(ConnectorBase):
    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._store: dict[str, bytes] = {}
        self._lock = threading.Lock()
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(16)
        self.addr = f"{host}:{self._srv.getsockname()[1]}"
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    # -- server -------------------------------------------------------------
    def _serve(self) -> None:
        self._srv.settimeout(0.25)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            threading.Thread(target=self._handle, args=(conn,),
                             daemon=True).start()

    def _handle(self, conn: socket.socket) -> None:
        try:
            with conn:
                req = _recv_frame(conn).decode()
                op, _, key = req.partition(" ")
                with self._lock:
                    blob = self._store.get(key)
                if op == "GET":
                    if blob is None:
                        _send_frame(conn, b"MISS")
                    else:
                        _send_frame(conn, b"HIT" + blob)
                elif op == "DEL":
                    with self._lock:
                        self._store.pop(key, None)
                    _send_frame(conn, b"OK")
        except Exception:
            logger.debug("tcp connector handler error", exc_info=True)

    # -- connector API -------------------------------------------------------
    def put(self, from_stage, to_stage, key, data):
        blob = encode_payload(data)
        ek = self.edge_key(from_stage, to_stage, key)
        with self._lock:
            self._store[ek] = blob
        return True, len(blob), {"addr": self.addr}

    def get(self, from_stage, to_stage, key, metadata: Optional[dict] =
            None):
        ek = self.edge_key(from_stage, to_stage, key)
        addr = (metadata or {}).get("addr")
        if addr is None or addr == self.addr:
            with self._lock:
                blob = self._store.get(ek)
            if blob is None:
                raise KeyError(ek)
            return decode_payload(blob), len(blob)
        host, _, port = addr.rpartition(":")
        with socket.create_connection((host, int(port)), timeout=30) as s:
            _send_frame(s, f"GET {ek}".encode())
            resp = _recv_frame(s)
        if resp[:4] == b"MISS":
            raise KeyError(ek)
        blob = resp[3:]
        return decode_payload(blob), len(blob)

    def cleanup(self, from_stage, to_stage, key):
        ek = self.edge_key(from_stage, to_stage, key)
        with self._lock:
            self._store.pop(ek, None)

    def close(self):
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        self._thread.join(timeout=2)
        self._store.clear()


from vllm_omni_tpu.distributed.connectors import \
    ConnectorFactory  # noqa: E402

ConnectorFactory.register("tcp", TcpConnector)
