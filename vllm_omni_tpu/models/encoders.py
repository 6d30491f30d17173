"""Multimodal input encoders: audio (mel → features) and vision (ViT).

Reference parity: the audio/vision towers of the omni AR families
(model_executor/models/qwen2_5_omni, qwen3_omni — whisper-style audio
encoder with conv subsampling; ViT vision tower). Pure functions over
param pytrees like the decoder; encoders run as one-shot jit programs at
request-add time (no KV cache — full bidirectional attention on the MXU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import layer_norm

Params = dict


@dataclass(frozen=True)
class AudioEncoderConfig:
    n_mels: int = 128
    hidden_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    output_dim: int = 1024  # thinker hidden size
    max_frames: int = 3000  # mel frames (whisper: 30 s)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class VisionEncoderConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    output_dim: int = 1024
    # spatial merge: 2x2 patch groups fuse into one output token
    # (qwen-vl style)
    merge_size: int = 2

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _encoder_block(layer: Params, x: jnp.ndarray, num_heads: int
                   ) -> jnp.ndarray:
    b, t, h = x.shape
    d = h // num_heads
    y = layer_norm(x, layer["ln1_w"], layer["ln1_b"])
    q = linear(y, layer["q_proj"]).reshape(b, t, num_heads, d)
    k = linear(y, layer["k_proj"]).reshape(b, t, num_heads, d)
    v = linear(y, layer["v_proj"]).reshape(b, t, num_heads, d)
    from vllm_omni_tpu.ops.flash_attention import flash_attention

    attn = flash_attention(q, k, v, scale=d ** -0.5, causal=False)
    x = x + linear(attn.reshape(b, t, h), layer["o_proj"])
    y = layer_norm(x, layer["ln2_w"], layer["ln2_b"])
    y = linear(y, layer["fc1"])
    y = jax.nn.gelu(y.astype(jnp.float32)).astype(x.dtype)
    return x + linear(y, layer["fc2"])


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


def audio_encoder_forward(params: Params, cfg: AudioEncoderConfig,
                          mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, n_mels] → features [B, T//4, output_dim].

    Whisper-style stem: two stride-2 1D convs (4x subsample) + GELU, then
    bidirectional transformer blocks, then projection into the thinker's
    embedding space.
    """
    x = mel
    for name, stride in (("conv1", 2), ("conv2", 2)):
        p = params[name]  # w [k, cin, cout]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), window_strides=(stride,),
            padding="SAME", dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = jax.nn.gelu((x + p["b"]).astype(jnp.float32)).astype(x.dtype)
    t = x.shape[1]
    pos = params["pos_embed"][:t]
    x = x + pos.astype(x.dtype)
    for layer in params["layers"]:
        x = _encoder_block(layer, x, cfg.num_heads)
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"])
    return linear(x, params["proj"])


def init_audio_encoder(cfg: AudioEncoderConfig, key,
                       dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 8))
    h = cfg.hidden_size

    def lin(k_in, n_out):
        return {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                        jnp.float32) *
                      k_in ** -0.5).astype(dtype),
                "b": jnp.zeros((n_out,), dtype)}

    def conv1d(k, cin, cout):
        return {"w": (jax.random.normal(next(keys), (k, cin, cout),
                                        jnp.float32) *
                      (k * cin) ** -0.5).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    params: Params = {
        "conv1": conv1d(3, cfg.n_mels, h),
        "conv2": conv1d(3, h, h),
        "pos_embed": (jax.random.normal(
            next(keys), (cfg.max_frames // 4 + 1, h), jnp.float32) *
            0.02).astype(dtype),
        "layers": [],
        "ln_post_w": jnp.ones((h,), dtype),
        "ln_post_b": jnp.zeros((h,), dtype),
        "proj": lin(h, cfg.output_dim),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "ln1_w": jnp.ones((h,), dtype), "ln1_b": jnp.zeros((h,), dtype),
            "ln2_w": jnp.ones((h,), dtype), "ln2_b": jnp.zeros((h,), dtype),
            "q_proj": lin(h, h), "k_proj": lin(h, h),
            "v_proj": lin(h, h), "o_proj": lin(h, h),
            "fc1": lin(h, 4 * h), "fc2": lin(4 * h, h),
        })
    return params


# ---------------------------------------------------------------------------
# Vision
# ---------------------------------------------------------------------------


def vision_encoder_forward(params: Params, cfg: VisionEncoderConfig,
                           pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, H, W, 3] → features [B, N/(merge²), output_dim]."""
    p = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["w"].astype(pixels.dtype),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(pixels.dtype)
    b, gh, gw, h = x.shape
    x = x.reshape(b, gh * gw, h) + params["pos_embed"][:gh * gw].astype(
        pixels.dtype)
    for layer in params["layers"]:
        x = _encoder_block(layer, x, cfg.num_heads)
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"])
    # 2x2 spatial merge → 4h wide tokens → project to output_dim
    m = cfg.merge_size
    x = x.reshape(b, gh // m, m, gw // m, m, h)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, (gh // m) * (gw // m), m * m * h)
    return linear(x, params["merge_proj"])


def init_vision_encoder(cfg: VisionEncoderConfig, key,
                        dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 6))
    h = cfg.hidden_size

    def lin(k_in, n_out):
        return {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                        jnp.float32) *
                      k_in ** -0.5).astype(dtype),
                "b": jnp.zeros((n_out,), dtype)}

    p = cfg.patch_size
    params: Params = {
        "patch_embed": {"w": (jax.random.normal(
            next(keys), (p, p, 3, h), jnp.float32) *
            (p * p * 3) ** -0.5).astype(dtype)},
        "pos_embed": (jax.random.normal(
            next(keys), (cfg.num_patches, h), jnp.float32) *
            0.02).astype(dtype),
        "layers": [],
        "ln_post_w": jnp.ones((h,), dtype),
        "ln_post_b": jnp.zeros((h,), dtype),
        "merge_proj": lin(cfg.merge_size ** 2 * h, cfg.output_dim),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "ln1_w": jnp.ones((h,), dtype), "ln1_b": jnp.zeros((h,), dtype),
            "ln2_w": jnp.ones((h,), dtype), "ln2_b": jnp.zeros((h,), dtype),
            "q_proj": lin(h, h), "k_proj": lin(h, h),
            "v_proj": lin(h, h), "o_proj": lin(h, h),
            "fc1": lin(h, 4 * h), "fc2": lin(4 * h, h),
        })
    return params
