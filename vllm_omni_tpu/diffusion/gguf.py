"""GGUF checkpoint reader/writer (no external gguf dependency).

Reference parity: diffusion/model_loader/gguf_adapters/ — the reference
loads community GGUF conversions of DiT transformers (city96-style,
which keep the original diffusers tensor names) through llama.cpp's
`gguf` package. This environment ships no gguf library, so the binary
format (GGUF v3, little-endian) is implemented directly:

    header:  u32 magic 'GGUF' | u32 version | u64 n_tensors | u64 n_kv
    kv:      string key | u32 type | value      (string = u64 len+bytes)
    tensor:  string name | u32 n_dims | u64 ne[n_dims] | u32 ggml_type
             | u64 offset (relative to the aligned data section)
    data:    starts at align(header_end, general.alignment [32])

Supported ggml tensor types: F32, F16, BF16 and the two block-quantized
formats community DiT conversions actually use — Q8_0 (f16 scale + 32
int8 per block) and Q4_0 (f16 scale + 16 nibble-packed bytes per
block). Blocks run along ne[0] (the innermost / last numpy axis).
"""

from __future__ import annotations

import struct
from typing import Any, Iterator, Optional

import numpy as np

MAGIC = 0x46554747  # 'GGUF' little-endian
ALIGN_KEY = "general.alignment"

# ggml tensor types
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q8_0 = 8
GGML_BF16 = 30

_Q8_BLOCK = 32
_Q8_BYTES = 2 + 32  # f16 scale + 32 int8
_Q4_BLOCK = 32
_Q4_BYTES = 2 + 16  # f16 scale + 16 nibble-packed bytes

# metadata value types
_T_U8, _T_I8, _T_U16, _T_I16, _T_U32, _T_I32, _T_F32, _T_BOOL, \
    _T_STR, _T_ARR, _T_U64, _T_I64, _T_F64 = range(13)

_SCALAR_FMT = {_T_U8: "<B", _T_I8: "<b", _T_U16: "<H", _T_I16: "<h",
               _T_U32: "<I", _T_I32: "<i", _T_F32: "<f", _T_BOOL: "<?",
               _T_U64: "<Q", _T_I64: "<q", _T_F64: "<d"}


class _Reader:
    def __init__(self, data: memoryview) -> None:
        self.d = data
        self.pos = 0

    def take(self, fmt: str):
        v = struct.unpack_from(fmt, self.d, self.pos)[0]
        self.pos += struct.calcsize(fmt)
        return v

    def string(self) -> str:
        n = self.take("<Q")
        s = bytes(self.d[self.pos:self.pos + n]).decode("utf-8")
        self.pos += n
        return s

    def value(self, vtype: int) -> Any:
        if vtype == _T_STR:
            return self.string()
        if vtype == _T_ARR:
            etype = self.take("<I")
            count = self.take("<Q")
            return [self.value(etype) for _ in range(count)]
        return self.take(_SCALAR_FMT[vtype])


def _dequant_q8_0(raw: np.ndarray, n: int) -> np.ndarray:
    blocks = raw.reshape(-1, _Q8_BYTES)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)  # [B,1]
    q = blocks[:, 2:].view(np.int8).astype(np.float32)  # [B, 32]
    return (q * d).reshape(-1)[:n]


def _dequant_q4_0(raw: np.ndarray, n: int) -> np.ndarray:
    blocks = raw.reshape(-1, _Q4_BYTES)
    d = blocks[:, :2].copy().view(np.float16).astype(np.float32)
    qs = blocks[:, 2:]  # [B, 16] packed
    lo = (qs & 0x0F).astype(np.int8) - 8  # elements 0..15
    hi = (qs >> 4).astype(np.int8) - 8  # elements 16..31
    out = np.concatenate([lo, hi], axis=1).astype(np.float32) * d
    return out.reshape(-1)[:n]


def read_gguf(path: str) -> tuple[dict[str, Any], dict[str, np.ndarray]]:
    """→ (metadata, {tensor_name: np.ndarray float32/float16}).
    Quantized tensors are dequantized to float32."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    r = _Reader(buf)
    if r.take("<I") != MAGIC:
        raise ValueError(f"{path}: not a GGUF file")
    version = r.take("<I")
    if version not in (2, 3):
        raise ValueError(f"{path}: unsupported GGUF version {version}")
    n_tensors = r.take("<Q")
    n_kv = r.take("<Q")
    meta: dict[str, Any] = {}
    for _ in range(n_kv):
        key = r.string()
        vtype = r.take("<I")
        meta[key] = r.value(vtype)
    infos = []
    for _ in range(n_tensors):
        name = r.string()
        n_dims = r.take("<I")
        ne = [r.take("<Q") for _ in range(n_dims)]
        ttype = r.take("<I")
        offset = r.take("<Q")
        infos.append((name, ne, ttype, offset))
    align = int(meta.get(ALIGN_KEY, 32))
    data_start = (r.pos + align - 1) // align * align
    tensors: dict[str, np.ndarray] = {}
    for name, ne, ttype, offset in infos:
        n = 1
        for x in ne:
            n *= x
        shape = tuple(reversed(ne))  # ne[0] is fastest-varying
        start = data_start + offset
        if ttype == GGML_F32:
            arr = np.frombuffer(buf, np.float32, n, start).reshape(shape)
        elif ttype == GGML_F16:
            arr = np.frombuffer(buf, np.float16, n, start).reshape(shape)
        elif ttype == GGML_BF16:
            raw = np.frombuffer(buf, np.uint16, n, start)
            arr = (raw.astype(np.uint32) << 16).view(np.float32) \
                .reshape(shape)
        elif ttype == GGML_Q8_0:
            nb = -(-n // _Q8_BLOCK)
            raw = np.frombuffer(buf, np.uint8, nb * _Q8_BYTES, start)
            arr = _dequant_q8_0(raw, n).reshape(shape)
        elif ttype == GGML_Q4_0:
            nb = -(-n // _Q4_BLOCK)
            raw = np.frombuffer(buf, np.uint8, nb * _Q4_BYTES, start)
            arr = _dequant_q4_0(raw, n).reshape(shape)
        else:
            raise ValueError(
                f"{path}: tensor {name!r} has unsupported ggml type "
                f"{ttype}")
        tensors[name] = arr
    return meta, tensors


# ---------------------------------------------------------------------------
# Writer (tools + tests; also the quantize-on-export path)
# ---------------------------------------------------------------------------


def _quant_q8_0(x: np.ndarray) -> bytes:
    flat = np.ascontiguousarray(x, np.float32).reshape(-1)
    if flat.size % _Q8_BLOCK:
        raise ValueError("Q8_0 needs size % 32 == 0")
    blocks = flat.reshape(-1, _Q8_BLOCK)
    amax = np.abs(blocks).max(axis=1, keepdims=True)
    d = (amax / 127.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    q = np.clip(np.rint(blocks / df), -127, 127).astype(np.int8)
    out = np.empty((blocks.shape[0], _Q8_BYTES), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = q.view(np.uint8)
    return out.tobytes()


def _quant_q4_0(x: np.ndarray) -> bytes:
    flat = np.ascontiguousarray(x, np.float32).reshape(-1)
    if flat.size % _Q4_BLOCK:
        raise ValueError("Q4_0 needs size % 32 == 0")
    blocks = flat.reshape(-1, _Q4_BLOCK)
    # ggml convention: d = signed max / -8 so the extreme maps to 0
    idx = np.abs(blocks).argmax(axis=1)
    smax = blocks[np.arange(len(blocks)), idx]
    d = (smax / -8.0).astype(np.float16)
    df = d.astype(np.float32)
    df[df == 0] = 1.0
    q = np.clip(np.rint(blocks / df[:, None]) + 8, 0, 15).astype(np.uint8)
    packed = (q[:, :16] | (q[:, 16:] << 4)).astype(np.uint8)
    out = np.empty((blocks.shape[0], _Q4_BYTES), np.uint8)
    out[:, :2] = d.view(np.uint8).reshape(-1, 2)
    out[:, 2:] = packed
    return out.tobytes()


def _enc_string(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _enc_value(v: Any) -> bytes:
    if isinstance(v, bool):
        return struct.pack("<I", _T_BOOL) + struct.pack("<?", v)
    if isinstance(v, int):
        return struct.pack("<I", _T_U32 if 0 <= v < 2 ** 32 else _T_I64) \
            + struct.pack("<I" if 0 <= v < 2 ** 32 else "<q", v)
    if isinstance(v, float):
        return struct.pack("<I", _T_F32) + struct.pack("<f", v)
    if isinstance(v, str):
        return struct.pack("<I", _T_STR) + _enc_string(v)
    raise TypeError(f"unsupported metadata value {v!r}")


def write_gguf(path: str, tensors: dict[str, np.ndarray],
               metadata: Optional[dict[str, Any]] = None,
               quant: Optional[str] = None, align: int = 32) -> None:
    """quant: None (keep dtype: f32/f16/bf16-as-f32) | 'q8_0' | 'q4_0'
    (2D+ tensors whose inner dim divides 32 quantize; rest stay f32)."""
    metadata = dict(metadata or {})
    metadata[ALIGN_KEY] = align
    blobs: list[bytes] = []
    infos: list[tuple[str, list, int, int]] = []
    offset = 0
    for name, arr in tensors.items():
        a = np.asarray(arr)
        ne = list(reversed(a.shape))  # ne[0] fastest-varying
        qt = quant if (quant and a.ndim >= 2 and
                       a.shape[-1] % 32 == 0) else None
        if qt == "q8_0":
            blob, ttype = _quant_q8_0(a), GGML_Q8_0
        elif qt == "q4_0":
            blob, ttype = _quant_q4_0(a), GGML_Q4_0
        elif a.dtype == np.float16:
            blob, ttype = a.astype("<f2").tobytes(), GGML_F16
        else:
            blob, ttype = a.astype("<f4").tobytes(), GGML_F32
        pad = (-offset) % align
        offset += pad
        blobs.append(b"\x00" * pad + blob)
        infos.append((name, ne, ttype, offset))
        offset += len(blob)
    out = [struct.pack("<IIQQ", MAGIC, 3, len(infos), len(metadata))]
    for k, v in metadata.items():
        out.append(_enc_string(k))
        out.append(_enc_value(v))
    for name, ne, ttype, off in infos:
        out.append(_enc_string(name))
        out.append(struct.pack("<I", len(ne)))
        out.extend(struct.pack("<Q", x) for x in ne)
        out.append(struct.pack("<IQ", ttype, off))
    header = b"".join(out)
    pad = (-len(header)) % align
    with open(path, "wb") as f:
        f.write(header)
        f.write(b"\x00" * pad)
        for b in blobs:
            f.write(b)


def iter_gguf_tensors(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Loader-facing shim matching iter_component_tensors' contract."""
    _, tensors = read_gguf(path)
    yield from tensors.items()
