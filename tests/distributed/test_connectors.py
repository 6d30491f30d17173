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
