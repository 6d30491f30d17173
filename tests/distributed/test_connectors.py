"""Connector + serialization tests (reference:
tests/distributed/omni_connectors/)."""

import numpy as np
import pytest

from vllm_omni_tpu.distributed.connectors import (ConnectorFactory,
                                                  InProcConnector,
                                                  SharedMemoryConnector)
from vllm_omni_tpu.distributed.serialization import (decode_payload,
                                                     encode_payload)
from vllm_omni_tpu.distributed.transfer_manager import TransferManager


def test_serialization_roundtrip():
    import ml_dtypes

    payload = {
        "hidden": np.arange(24, dtype=np.float32).reshape(2, 12),
        "bf16": np.ones((3, 4), ml_dtypes.bfloat16),
        "ids": [1, 2, 3],
        "nested": {"text": "hello", "arr": np.zeros((2,), np.int8)},
        "scalar": 3.5,
    }
    out = decode_payload(encode_payload(payload))
    np.testing.assert_array_equal(out["hidden"], payload["hidden"])
    assert out["bf16"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        out["bf16"].astype(np.float32), np.ones((3, 4), np.float32))
    assert out["ids"] == [1, 2, 3]
    assert out["nested"]["text"] == "hello"
    assert out["scalar"] == 3.5


def test_serialization_jax_arrays():
    import jax.numpy as jnp

    out = decode_payload(encode_payload({"x": jnp.arange(6).reshape(2, 3)}))
    np.testing.assert_array_equal(out["x"], np.arange(6).reshape(2, 3))


@pytest.mark.parametrize("ctor", [InProcConnector, SharedMemoryConnector],
                         ids=["inproc", "shm"])
def test_connector_put_get_cleanup(ctor):
    conn = ctor()
    try:
        data = {"h": np.random.default_rng(0).standard_normal((4, 8))}
        ok, size, meta = conn.put(0, 1, "req1", data)
        assert ok
        got, _ = conn.get(0, 1, "req1", meta)
        np.testing.assert_array_equal(got["h"], data["h"])
        conn.cleanup(0, 1, "req1")
        with pytest.raises(KeyError):
            conn.get(0, 1, "req1", meta)
        assert conn.health()
    finally:
        conn.close()


def test_factory():
    conn = ConnectorFactory.create("inproc")
    assert isinstance(conn, InProcConnector)
    with pytest.raises(ValueError):
        ConnectorFactory.create("mooncake")


def test_transfer_manager_retry_and_stats():
    conn = InProcConnector()
    tm = TransferManager(conn, retries=3, retry_delay_s=0.01)
    with pytest.raises(TimeoutError):
        tm.receive(0, 1, "missing")
    meta = tm.send(0, 1, "r1", {"x": np.ones(4)})
    got = tm.receive(0, 1, "r1", meta)
    np.testing.assert_array_equal(got["x"], np.ones(4))
    assert tm.rx_bytes[(0, 1)] == tm.tx_bytes[(0, 1)] == 0  # inproc: by ref
    tm.release(0, 1, "r1")


def test_chunk_streaming():
    """async_chunk edge: producer streams chunks, consumer iterates
    (reference: chunk adapter, talker→code2wav 25-frame chunks)."""
    import threading

    conn = SharedMemoryConnector()
    tm = TransferManager(conn)
    chunks_in = [np.full((5,), i, np.float32) for i in range(4)]

    def producer():
        for i, c in enumerate(chunks_in):
            tm.put_chunk(1, 2, "req", c, final=(i == len(chunks_in) - 1))

    t = threading.Thread(target=producer)
    t.start()
    got = list(tm.iter_chunks(1, 2, "req", timeout_s=5))
    t.join()
    assert len(got) == 4
    for i, c in enumerate(got):
        np.testing.assert_array_equal(c, chunks_in[i])
    conn.close()


def test_tcp_connector_cross_instance():
    """Cross-host path: producer's connector serves, consumer's fetches
    over TCP with the metadata addr (the Mooncake role)."""
    from vllm_omni_tpu.distributed.tcp_connector import TcpConnector

    a = TcpConnector()
    b = TcpConnector()
    try:
        data = {"kv": np.random.default_rng(1).standard_normal(
            (2, 4, 8)).astype(np.float32), "ids": [1, 2, 3]}
        ok, size, meta = a.put(0, 1, "reqX", data)
        assert ok and size > 0 and meta["addr"] == a.addr
        got, n = b.get(0, 1, "reqX", meta)
        np.testing.assert_array_equal(got["kv"], data["kv"])
        assert got["ids"] == [1, 2, 3]
        # local fast path on the producer side
        got2, _ = a.get(0, 1, "reqX", meta)
        np.testing.assert_array_equal(got2["kv"], data["kv"])
        a.cleanup(0, 1, "reqX")
        with pytest.raises(KeyError):
            b.get(0, 1, "reqX", meta)
    finally:
        a.close()
        b.close()


def test_tcp_pd_disaggregation():
    """PD disaggregation over the TCP data plane between two engines
    (cross-host shape of tests/engine/test_kv_transfer.py)."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.distributed.tcp_connector import TcpConnector
    from vllm_omni_tpu.distributed.transfer_manager import TransferManager
    from vllm_omni_tpu.engine.core import EngineCore

    hf = {"architectures": ["Qwen3ForCausalLM"], "vocab_size": 128,
          "hidden_size": 32, "intermediate_size": 64,
          "num_hidden_layers": 2, "num_attention_heads": 2,
          "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0}

    def engine():
        return EngineCore(EngineConfig.from_kwargs(
            model="dummy", hf_overrides=hf, dtype="float32",
            max_model_len=128, num_pages=32, page_size=16,
            max_num_seqs=2, max_num_batched_tokens=64))

    def drain(eng):
        finals = {}
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    finals[o.request_id] = o
        return finals

    prompt = list(range(1, 25))
    pre, dec = engine(), engine()
    rid = pre.add_request(list(prompt), SamplingParams(
        max_tokens=1, temperature=0.0, ignore_eos=True, pin_kv=True))
    drain(pre)
    conn_a, conn_b = TcpConnector(), TcpConnector()
    try:
        meta = TransferManager(conn_a).send(0, 1, rid,
                                            pre.extract_request_kv(rid))
        received = TransferManager(conn_b).receive(0, 1, rid, meta)
        rid2 = dec.inject_request_kv(received, SamplingParams(
            max_tokens=8, temperature=0.0, ignore_eos=True))
        toks = drain(dec)[rid2].outputs[0].token_ids
        # single-engine reference
        ref_eng = engine()
        rref = ref_eng.add_request(list(prompt), SamplingParams(
            max_tokens=8, temperature=0.0, ignore_eos=True))
        ref = drain(ref_eng)[rref].outputs[0].token_ids
        assert toks == ref
    finally:
        conn_a.close()
        conn_b.close()


def test_kv_store_connector_roundtrip_ttl_and_shared_store():
    """Third store-backed transport (reference Yuanrong/Mooncake-store
    role): payloads through a RESP-protocol store — any
    Redis-compatible server, here the bundled MiniRespServer. Two
    connector instances share ONE store (the external-store topology);
    keys lease out via ttl."""
    import time

    from vllm_omni_tpu.distributed.kv_store_connector import (
        KVStoreConnector)

    a = KVStoreConnector()  # bundles a store
    host, port = a.address
    b = KVStoreConnector(host=host, port=port)  # external-store client
    try:
        assert a.health() and b.health()
        data = {"kv": np.random.default_rng(2).standard_normal(
            (3, 5, 8)).astype(np.float32), "meta": {"n": 7}}
        ok, size, meta = a.put(0, 1, "reqY", data)
        assert ok and size > 0 and meta["store"] == "resp"
        got, n = b.get(0, 1, "reqY")
        assert n == size
        np.testing.assert_array_equal(got["kv"], data["kv"])
        assert got["meta"] == {"n": 7}
        a.cleanup(0, 1, "reqY")
        with pytest.raises(KeyError):
            b.get(0, 1, "reqY")

        # TTL lease: the key expires on its own
        c = KVStoreConnector(host=host, port=port, ttl_s=0.1)
        c.put(0, 1, "lease", {"x": 1})
        got, _ = c.get(0, 1, "lease")
        assert got == {"x": 1}
        time.sleep(0.25)
        with pytest.raises(KeyError):
            c.get(0, 1, "lease")
        c.close()
    finally:
        b.close()
        a.close()


def test_kv_store_factory_and_transfer_manager():
    from vllm_omni_tpu.distributed.kv_store_connector import (
        KVStoreConnector)

    conn = ConnectorFactory.create("kv_store")
    assert isinstance(conn, KVStoreConnector)
    try:
        tm = TransferManager(conn)
        payload = {"hidden": np.ones((2, 6), np.float32)}
        tm.send(0, 1, "rq", payload)
        got = tm.receive(0, 1, "rq")
        np.testing.assert_array_equal(got["hidden"], payload["hidden"])
    finally:
        conn.close()
