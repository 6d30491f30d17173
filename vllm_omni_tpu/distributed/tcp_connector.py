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
from vllm_omni_tpu.distributed.serialization import (
    decode_payload, encode_payload_parts)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def _send_frame(sock: socket.socket, *parts) -> None:
    """Length-prefixed frame; scatter-gather send — no payload copy
    (the reference's Mooncake RDMA path avoids staging copies the same
    way; on TPU hosts the data plane is DCN TCP).

    sendmsg may send PARTIALLY (returns bytes sent; e.g. a signal lands
    after a partial copy) and caps the iovec count (Linux UIO_MAXIOV =
    1024), so loop over the remaining byte-views until drained."""
    views = [memoryview(struct.pack("<Q",
                                    sum(len(p) for p in parts)))]
    views += [memoryview(p).cast("B") if not isinstance(p, memoryview)
              else p.cast("B") for p in parts]
    while views:
        sent = sock.sendmsg(views[:1000])
        while sent:
            if sent >= len(views[0]):
                sent -= len(views[0])
                views.pop(0)
            else:
                views[0] = views[0][sent:]
                sent = 0


def _recv_exact(sock: socket.socket, n: int) -> bytearray:
    """recv_into a preallocated buffer — one allocation, zero copies."""
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], n - got)
        if not r:
            raise ConnectionError("peer closed mid-frame")
        got += r
    return buf


def _recv_frame(sock: socket.socket) -> bytearray:
    (n,) = struct.unpack("<Q", bytes(_recv_exact(sock, 8)))
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
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY,
                                1)
                conn.setsockopt(socket.SOL_SOCKET, socket.SO_SNDBUF,
                                1 << 22)
                req = bytes(_recv_frame(conn)).decode()
                op, _, key = req.partition(" ")
                with self._lock:
                    parts = self._store.get(key)
                if op == "GET":
                    if parts is None:
                        _send_frame(conn, b"MISS")
                    else:
                        # status frame, then the payload parts as one
                        # scatter-gathered frame (no concat copies)
                        _send_frame(conn, b"HIT")
                        _send_frame(conn, *parts)
                elif op == "DEL":
                    with self._lock:
                        self._store.pop(key, None)
                    _send_frame(conn, b"OK")
        except Exception:
            logger.debug("tcp connector handler error", exc_info=True)

    # -- connector API -------------------------------------------------------
    def put(self, from_stage, to_stage, key, data):
        # zero-copy: parts are memoryviews over the source tensors
        # (scatter-gathered on the wire); nothing is joined on put
        parts = encode_payload_parts(data)
        nbytes = sum(len(p) for p in parts)
        ek = self.edge_key(from_stage, to_stage, key)
        with self._lock:
            self._store[ek] = parts
        return True, nbytes, {"addr": self.addr}

    def get(self, from_stage, to_stage, key, metadata: Optional[dict] =
            None):
        ek = self.edge_key(from_stage, to_stage, key)
        addr = (metadata or {}).get("addr")
        if addr is None or addr == self.addr:
            with self._lock:
                parts = self._store.get(ek)
            if parts is None:
                raise KeyError(ek)
            blob = b"".join(parts)
            return decode_payload(blob), len(blob)
        host, _, port = addr.rpartition(":")
        with socket.create_connection((host, int(port)), timeout=30) as s:
            s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 1 << 22)
            _send_frame(s, f"GET {ek}".encode())
            status = bytes(_recv_frame(s))
            if status == b"MISS":
                raise KeyError(ek)
            blob = _recv_frame(s)
        return decode_payload(memoryview(blob)), len(blob)

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
