"""Tensor payload codec: nested dicts of arrays ↔ header + raw bytes.

Reference parity: omni_connectors/utils/serialization.py:342
(OmniSerializer / msgpack encoder-decoder) and KVCacheTransferData's
header+raw-bytes wire format (kv_transfer_manager.py:89-267). One
msgpack header describes every tensor (key path, dtype, shape, offset);
tensor bytes are concatenated raw — zero-copy views on decode.

bfloat16 rides as uint16 with a dtype tag (numpy has no bf16).
"""

from __future__ import annotations

from typing import Any, Union

import msgpack
import numpy as np

MAGIC = b"OMNI1"


def _flatten(obj: Any, prefix: str, tensors: list, tree: Any):
    """Replace arrays in a nested structure with placeholder indices."""
    if isinstance(obj, np.ndarray):
        tensors.append(obj)
        return {"__tensor__": len(tensors) - 1}
    if hasattr(obj, "__array__") and not isinstance(
            obj, (str, bytes, int, float, bool)):
        # jax arrays and friends
        tensors.append(np.asarray(obj))
        return {"__tensor__": len(tensors) - 1}
    if isinstance(obj, dict):
        return {k: _flatten(v, prefix + "." + str(k), tensors, tree)
                for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_flatten(v, f"{prefix}[{i}]", tensors, tree)
                for i, v in enumerate(obj)]
    return obj


def _dtype_tag(dt: np.dtype) -> str:
    return str(dt)


def encode_payload_parts(obj: Any) -> list:
    """Nested dict/list structure with numpy/jax arrays → list of
    buffers [prefix, tensor0, tensor1, ...]. Tensor buffers are
    memoryviews over the (contiguous) source arrays — ZERO copies; the
    transport scatter-gathers them (sendmsg / writev), the Mooncake-
    RDMA-role move. b"".join(parts) is the single-blob form."""
    tensors: list[np.ndarray] = []
    tree = _flatten(obj, "", tensors, None)
    metas = []
    bufs = []
    offset = 0
    for t in tensors:
        dt = _dtype_tag(t.dtype)
        if t.dtype.name == "bfloat16":  # ml_dtypes bf16 → raw uint16
            raw = t.view(np.uint16) if isinstance(t, np.ndarray) else t
            raw = np.ascontiguousarray(raw)
            dt = "bfloat16"
            b = memoryview(raw).cast("B")  # flat byte view, no copy
        else:
            b = memoryview(np.ascontiguousarray(t)).cast("B")
        metas.append({"dtype": dt, "shape": list(t.shape),
                      "offset": offset, "nbytes": len(b)})
        bufs.append(b)
        offset += len(b)
    header = msgpack.packb({"tree": tree, "tensors": metas},
                           use_bin_type=True)
    return [b"".join([MAGIC, len(header).to_bytes(8, "little"),
                      header])] + bufs


def encode_payload(obj: Any) -> bytes:
    """Nested dict/list structure with numpy/jax arrays → bytes."""
    return b"".join(encode_payload_parts(obj))


def decode_payload(data: Union[bytes, memoryview]) -> Any:
    view = memoryview(data)
    assert bytes(view[:5]) == MAGIC, "bad payload magic"
    hlen = int.from_bytes(view[5:13], "little")
    header = msgpack.unpackb(bytes(view[13:13 + hlen]), raw=False)
    base = 13 + hlen
    tensors = []
    for m in header["tensors"]:
        start = base + m["offset"]
        raw = view[start:start + m["nbytes"]]
        if m["dtype"] == "bfloat16":
            import ml_dtypes

            arr = np.frombuffer(raw, np.uint16).view(
                ml_dtypes.bfloat16).reshape(m["shape"])
        else:
            arr = np.frombuffer(raw, np.dtype(m["dtype"])).reshape(
                m["shape"])
        tensors.append(arr)

    def rebuild(node: Any) -> Any:
        if isinstance(node, dict):
            if "__tensor__" in node and len(node) == 1:
                return tensors[node["__tensor__"]]
            return {k: rebuild(v) for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v) for v in node]
        return node

    return rebuild(header["tree"])
