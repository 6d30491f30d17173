"""GGUF reader/writer (reference gguf_adapters role): binary round-trip,
block-quant dequant accuracy, and a qwen_image transformer loaded from a
GGUF shard producing the same params as the safetensors path."""

import json
import shutil

import numpy as np
import pytest

from vllm_omni_tpu.diffusion.gguf import (GGML_F16, GGML_F32, GGML_Q4_0,
                                          GGML_Q8_0, read_gguf,
                                          write_gguf)


def test_roundtrip_f32_f16_and_metadata(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.standard_normal((4, 64)).astype(np.float32),
        "b.bias": rng.standard_normal((7,)).astype(np.float32),
        "c.half": rng.standard_normal((3, 32)).astype(np.float16),
    }
    p = str(tmp_path / "m.gguf")
    write_gguf(p, tensors, metadata={"general.name": "tiny",
                                     "custom.flag": True,
                                     "custom.count": 3})
    meta, out = read_gguf(p)
    assert meta["general.name"] == "tiny"
    assert meta["custom.flag"] is True and meta["custom.count"] == 3
    assert set(out) == set(tensors)
    for k in tensors:
        assert out[k].shape == tensors[k].shape, k
        np.testing.assert_allclose(out[k].astype(np.float32),
                                   tensors[k].astype(np.float32),
                                   rtol=1e-3, atol=1e-3)


def test_q8_0_quant_accuracy(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 128)).astype(np.float32)
    p = str(tmp_path / "q8.gguf")
    write_gguf(p, {"w": x}, quant="q8_0")
    _, out = read_gguf(p)
    assert out["w"].shape == x.shape
    # 8-bit block quant: ~1% of block amax
    err = np.abs(out["w"] - x).max()
    assert err < np.abs(x).max() * 0.02, err


def test_q4_0_quant_accuracy(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((8, 64)).astype(np.float32)
    p = str(tmp_path / "q4.gguf")
    write_gguf(p, {"w": x}, quant="q4_0")
    _, out = read_gguf(p)
    err = np.abs(out["w"] - x).max()
    assert err < np.abs(x).max() * 0.2, err  # 4-bit: coarse but bounded
    # odd-inner-dim tensors stay f32 under quant
    write_gguf(p, {"w": x, "v": x[:, :31]}, quant="q4_0")
    _, out = read_gguf(p)
    np.testing.assert_array_equal(out["v"], x[:, :31])


def test_alignment_and_reversed_dims(tmp_path):
    """ne[] is fastest-varying-first: a [2, 3] numpy array stores as
    ne=[3, 2]; offsets respect general.alignment."""
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    p = str(tmp_path / "dims.gguf")
    write_gguf(p, {"x": x}, align=64)
    meta, out = read_gguf(p)
    assert meta["general.alignment"] == 64
    np.testing.assert_array_equal(out["x"], x)


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "bad.gguf"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError, match="not a GGUF"):
        read_gguf(str(p))


def test_unsupported_type_rejected(tmp_path):
    import struct

    # hand-craft a header announcing ggml type 99
    body = struct.pack("<IIQQ", 0x46554747, 3, 1, 0)
    name = b"t"
    body += struct.pack("<Q", len(name)) + name
    body += struct.pack("<I", 1) + struct.pack("<Q", 32)
    body += struct.pack("<IQ", 99, 0)
    pad = (-len(body)) % 32
    p = tmp_path / "u.gguf"
    p.write_bytes(body + b"\x00" * pad + b"\x00" * 128)
    with pytest.raises(ValueError, match="unsupported ggml type"):
        read_gguf(str(p))


def test_qwen_image_loads_from_gguf(tmp_path):
    """Convert the tiny diffusers checkpoint to one GGUF shard; the
    transformer must load with identical params to the safetensors
    path (community conversions keep diffusers tensor names)."""
    from safetensors import safe_open

    from tests.diffusion.test_qwen_image_loader import TINY, \
        _tiny_state_dict
    from vllm_omni_tpu.diffusion.loader import load_transformer

    # safetensors variant
    st_root = tmp_path / "st"
    (st_root / "transformer").mkdir(parents=True)
    with open(st_root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "QwenImageTransformer2DModel",
                   **TINY}, f)
    sd = _tiny_state_dict()
    from safetensors.torch import save_file

    save_file(sd, str(st_root / "transformer" /
                      "diffusion_pytorch_model.safetensors"))
    fam_st, cfg_st, params_st = load_transformer(str(st_root))

    # gguf variant of the same tensors
    gg_root = tmp_path / "gg"
    shutil.copytree(st_root, gg_root)
    stf = str(gg_root / "transformer" /
              "diffusion_pytorch_model.safetensors")
    tensors = {}
    with safe_open(stf, framework="numpy") as st:
        for name in st.keys():
            tensors[name] = st.get_tensor(name)
    import os

    os.unlink(stf)
    write_gguf(str(gg_root / "transformer" / "model.gguf"), tensors)
    fam_gg, cfg_gg, params_gg = load_transformer(str(gg_root))

    assert fam_gg == fam_st and cfg_gg == cfg_st
    import jax

    leaves_st = jax.tree.leaves(params_st)
    leaves_gg = jax.tree.leaves(params_gg)
    assert len(leaves_st) == len(leaves_gg)
    for a, b in zip(leaves_st, leaves_gg):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=2e-3, atol=2e-3)
