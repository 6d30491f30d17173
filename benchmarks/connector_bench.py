"""Connector data-plane throughput at real stage-handoff payload sizes.

Reference parity: the Mooncake transfer engine is the reference's fast
cross-node path (distributed/omni_connectors/
mooncake_transfer_engine_connector.py — RDMA with a registered-memory
pool); its role here is the TCP connector + shm connector. This
benchmark produces the throughput evidence at the payload sizes real
pipelines ship:

  - thinker→talker hidden states: seq×hidden×f32 (e.g. 1024×2048×4 = 8 MB)
  - PD-disaggregation KV: layers×2×seq×hkv×d×bf16 (8B-class, 2k ctx
    ≈ 268 MB)
  - talker→code2wav codec chunk: 25 frames × hidden (~100 KB)

Usage: python benchmarks/connector_bench.py [--out CONNECTOR_BENCH.json]
Pure host benchmark (loopback TCP + POSIX shm) — no TPU needed; on real
deployments the same wire format rides DCN.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from vllm_omni_tpu.distributed.connectors import (  # noqa: E402
    SharedMemoryConnector)
from vllm_omni_tpu.distributed.serialization import (  # noqa: E402
    decode_payload, encode_payload)
from vllm_omni_tpu.distributed.tcp_connector import (  # noqa: E402
    TcpConnector)

PAYLOADS = {
    "codec_chunk_100KB": (25, 1024),
    "hidden_states_8MB": (1024, 2048),
    "kv_prefill_268MB": (32 * 2 * 8, 2048 * 128 // 8),  # reshaped 8B KV
}


def bench_connector(writer, reader, payload: np.ndarray, iters: int = 8
                    ) -> dict[str, float]:
    """writer.put on one connector instance, reader.get on ANOTHER
    (metadata carries the writer's address) — the cross-process path
    real stage handoff takes; a same-instance get would short-circuit
    to a dict lookup and measure nothing."""
    nbytes = payload.nbytes
    _, _, meta = writer.put(0, 1, "warm", payload)
    reader.get(0, 1, "warm", metadata=meta)
    writer.cleanup(0, 1, "warm")
    metas = []
    t_put = t_get = 0.0
    for i in range(iters):
        t0 = time.perf_counter()
        _, _, meta = writer.put(0, 1, f"k{i}", payload)
        t_put += time.perf_counter() - t0
        metas.append(meta)
    for i in range(iters):
        t0 = time.perf_counter()
        out, _ = reader.get(0, 1, f"k{i}", metadata=metas[i])
        t_get += time.perf_counter() - t0
        assert np.asarray(out).nbytes == nbytes
        writer.cleanup(0, 1, f"k{i}")
    return {"put_GBps": nbytes * iters / t_put / 1e9,
            "get_GBps": nbytes * iters / t_get / 1e9,
            # edge bandwidth a pipeline stage actually sees (put is
            # zero-copy view registration; the wire cost lands on get)
            "edge_GBps": nbytes * iters / (t_put + t_get) / 1e9,
            "roundtrip_ms": (t_put + t_get) / iters * 1e3}


def bench_serialization(payload: np.ndarray, iters: int = 8
                        ) -> dict[str, float]:
    t_ser = t_de = 0.0
    for _ in range(iters):
        t0 = time.perf_counter()
        blob = encode_payload({"x": payload})
        t_ser += time.perf_counter() - t0
        t0 = time.perf_counter()
        decode_payload(blob)
        t_de += time.perf_counter() - t0
    n = payload.nbytes
    return {"serialize_GBps": n * iters / t_ser / 1e9,
            "deserialize_GBps": n * iters / t_de / 1e9}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    results: dict[str, dict] = {}
    for name, shape in PAYLOADS.items():
        payload = rng.standard_normal(shape).astype(np.float32)
        row: dict[str, dict] = {"nbytes": payload.nbytes}
        tcp_w, tcp_r = TcpConnector(), TcpConnector()
        try:
            row["tcp_loopback"] = bench_connector(tcp_w, tcp_r, payload,
                                                  args.iters)
        finally:
            tcp_w.close()
            tcp_r.close()
        pre = f"bench{os.getpid()}"
        shm_w = SharedMemoryConnector(prefix=pre)
        shm_r = SharedMemoryConnector(prefix=pre)
        try:
            row["shm"] = bench_connector(shm_w, shm_r, payload,
                                         args.iters)
        finally:
            shm_w.close()
            shm_r.close()
        row["codec"] = bench_serialization(payload, args.iters)
        results[name] = row
        print(f"{name} ({payload.nbytes/1e6:.1f} MB): "
              f"tcp put {row['tcp_loopback']['put_GBps']:.2f} GB/s "
              f"get {row['tcp_loopback']['get_GBps']:.2f} GB/s | "
              f"shm put {row['shm']['put_GBps']:.2f} "
              f"get {row['shm']['get_GBps']:.2f} | codec ser "
              f"{row['codec']['serialize_GBps']:.2f} de "
              f"{row['codec']['deserialize_GBps']:.2f}", flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
