"""External key-value-store connector (RESP protocol).

Third store-backed transport beside shm and tcp — the reference's
vendor-store connector role (omni_connectors/connectors/
yuanrong_connector.py:19 — etcd-backed datasystem client;
mooncake_store_connector.py:22 — master + metadata server). Instead of
binding to one vendor's client library, this backend speaks RESP2 (the
Redis wire protocol) over a plain socket, so any Redis-compatible
store — redis, valkey, keydb, dragonfly, or the bundled
``MiniRespServer`` — can serve the inter-stage payload store with zero
extra dependencies.

Wire mapping: `put` → SET <edge_key> <payload-bytes> (payloads ride
the shared msgpack+tensor codec, distributed/serialization.py);
`get` → GET; `cleanup` → DEL; `health` → PING. Values are opaque
binary-safe bulk strings, so tensor payloads need no escaping.

``MiniRespServer`` is a ~100-line threaded RESP2 subset
(PING/SET/GET/DEL/EXISTS/FLUSHALL) used when no external store is
deployed and by the tests — the role the reference fills by running a
Mooncake master process next to the stages.
"""

from __future__ import annotations

import socket
import threading
from typing import Any, Optional

from vllm_omni_tpu.distributed.connectors import (ConnectorBase,
                                                  ConnectorFactory)
from vllm_omni_tpu.distributed.serialization import (decode_payload,
                                                     encode_payload)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


# --------------------------------------------------------------------------
# RESP2 client
# --------------------------------------------------------------------------


def _encode_command(*parts: bytes) -> bytes:
    out = [b"*%d\r\n" % len(parts)]
    for p in parts:
        out.append(b"$%d\r\n" % len(p))
        out.append(p)
        out.append(b"\r\n")
    return b"".join(out)


class _Reader:
    """Buffered reader over a socket for RESP framing."""

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.buf = bytearray()

    def _fill(self) -> None:
        chunk = self.sock.recv(65536)
        if not chunk:
            raise ConnectionError("store closed the connection")
        self.buf.extend(chunk)

    def read_line(self) -> bytes:
        while True:
            i = self.buf.find(b"\r\n")
            if i >= 0:
                line = bytes(self.buf[:i])
                del self.buf[:i + 2]
                return line
            self._fill()

    def read_exact(self, n: int) -> bytes:
        while len(self.buf) < n + 2:  # payload + trailing \r\n
            self._fill()
        data = bytes(self.buf[:n])
        del self.buf[:n + 2]
        return data


class RespClient:
    """Minimal RESP2 client: enough for a payload store."""

    def __init__(self, host: str, port: int,
                 timeout: float = 30.0) -> None:
        self.sock = socket.create_connection((host, port),
                                             timeout=timeout)
        self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.reader = _Reader(self.sock)
        self.lock = threading.Lock()

    def command(self, *parts) -> Any:
        enc = [p if isinstance(p, bytes) else str(p).encode()
               for p in parts]
        with self.lock:
            self.sock.sendall(_encode_command(*enc))
            return self._read_reply()

    def _read_reply(self) -> Any:
        line = self.reader.read_line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest.decode()
        if kind == b"-":
            raise RuntimeError(f"store error: {rest.decode()}")
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            if n < 0:
                return None
            return self.reader.read_exact(n)
        if kind == b"*":
            n = int(rest)
            if n < 0:
                return None
            return [self._read_reply() for _ in range(n)]
        raise RuntimeError(f"unexpected RESP reply {line!r}")

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


# --------------------------------------------------------------------------
# Connector
# --------------------------------------------------------------------------


class KVStoreConnector(ConnectorBase):
    """Inter-stage payloads through any Redis-compatible store.

    ``host``/``port`` point at an external store; with ``serve=True``
    (default when no host is given) a bundled ``MiniRespServer`` starts
    in-process — single-node default that still exercises the full
    store wire path, like the reference's co-located mooncake master.
    ``ttl_s`` > 0 sets a per-key expiry so orphaned payloads from dead
    requests don't accumulate (the reference stores lease the same
    way)."""

    def __init__(self, host: Optional[str] = None, port: int = 6379,
                 serve: Optional[bool] = None, ttl_s: float = 0.0,
                 prefix: str = "omni") -> None:
        self.prefix = prefix
        self.ttl_s = float(ttl_s)
        self._server: Optional[MiniRespServer] = None
        if serve is None:
            serve = host is None
        if serve:
            self._server = MiniRespServer(host or "127.0.0.1", 0)
            self._server.start()
            host, port = self._server.address
        assert host is not None
        self.client = RespClient(host, port)
        self.address = (host, port)

    def _k(self, from_stage: int, to_stage: int, key: str) -> bytes:
        return f"{self.prefix}/{self.edge_key(from_stage, to_stage, key)}" \
            .encode()

    def put(self, from_stage, to_stage, key, data):
        blob = encode_payload({"payload": data})
        k = self._k(from_stage, to_stage, key)
        if self.ttl_s > 0:
            reply = self.client.command(b"SET", k, blob, b"PX",
                                        int(self.ttl_s * 1000))
        else:
            reply = self.client.command(b"SET", k, blob)
        ok = reply == "OK"
        return ok, len(blob), {"store": "resp", "addr": self.address}

    def get(self, from_stage, to_stage, key, metadata=None):
        blob = self.client.command(b"GET",
                                   self._k(from_stage, to_stage, key))
        if blob is None:
            raise KeyError(self.edge_key(from_stage, to_stage, key))
        return decode_payload(blob)["payload"], len(blob)

    def cleanup(self, from_stage, to_stage, key):
        try:
            self.client.command(b"DEL",
                                self._k(from_stage, to_stage, key))
        except (RuntimeError, ConnectionError, OSError):
            pass

    def health(self) -> bool:
        try:
            return self.client.command(b"PING") == "PONG"
        except (RuntimeError, ConnectionError, OSError):
            return False

    def close(self) -> None:
        self.client.close()
        if self._server is not None:
            self._server.stop()


# --------------------------------------------------------------------------
# Bundled store (RESP2 subset)
# --------------------------------------------------------------------------


class MiniRespServer:
    """Threaded RESP2 subset: PING, SET (with PX/EX), GET, DEL, EXISTS,
    FLUSHALL. One dict + lock — the single-node payload-store role."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((host, port))
        self._sock.listen(16)
        self.address = self._sock.getsockname()
        self._store: dict[bytes, tuple[bytes, float]] = {}
        self._lock = threading.Lock()
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._running = True
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()

    def _accept_loop(self) -> None:
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve_conn, args=(conn,),
                             daemon=True).start()

    def _serve_conn(self, conn: socket.socket) -> None:
        import time

        reader = _Reader(conn)
        try:
            while self._running:
                line = reader.read_line()
                if not line.startswith(b"*"):
                    conn.sendall(b"-ERR protocol\r\n")
                    return
                n = int(line[1:])
                parts = []
                for _ in range(n):
                    hdr = reader.read_line()
                    parts.append(reader.read_exact(int(hdr[1:])))
                cmd = parts[0].upper()
                now = time.monotonic()
                if cmd == b"PING":
                    conn.sendall(b"+PONG\r\n")
                elif cmd == b"SET":
                    exp = float("inf")
                    i = 3
                    while i < len(parts):
                        opt = parts[i].upper()
                        if opt == b"PX" and i + 1 < len(parts):
                            exp = now + int(parts[i + 1]) / 1000.0
                            i += 2
                        elif opt == b"EX" and i + 1 < len(parts):
                            exp = now + int(parts[i + 1])
                            i += 2
                        else:
                            i += 1
                    with self._lock:
                        self._store[bytes(parts[1])] = (bytes(parts[2]),
                                                        exp)
                    conn.sendall(b"+OK\r\n")
                elif cmd == b"GET":
                    with self._lock:
                        item = self._store.get(bytes(parts[1]))
                        if item is not None and item[1] < now:
                            del self._store[bytes(parts[1])]
                            item = None
                    if item is None:
                        conn.sendall(b"$-1\r\n")
                    else:
                        conn.sendall(b"$%d\r\n" % len(item[0]) +
                                     item[0] + b"\r\n")
                elif cmd == b"DEL":
                    removed = 0
                    with self._lock:
                        for k in parts[1:]:
                            removed += self._store.pop(bytes(k),
                                                       None) is not None
                    conn.sendall(b":%d\r\n" % removed)
                elif cmd == b"EXISTS":
                    with self._lock:
                        hit = sum(bytes(k) in self._store
                                  for k in parts[1:])
                    conn.sendall(b":%d\r\n" % hit)
                elif cmd == b"FLUSHALL":
                    with self._lock:
                        self._store.clear()
                    conn.sendall(b"+OK\r\n")
                else:
                    conn.sendall(b"-ERR unknown command\r\n")
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def stop(self) -> None:
        self._running = False
        try:
            self._sock.close()
        except OSError:
            pass


ConnectorFactory.register("kv_store", KVStoreConnector)
ConnectorFactory.register("redis", KVStoreConnector)
