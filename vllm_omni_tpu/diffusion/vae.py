"""Latent VAE decoder/encoder (NHWC conv, XLA-native).

Reference parity: the diffusers AutoencoderKL the reference pipelines call
for `_decode_latents` (pipeline_qwen_image.py:797) and the VAE patch
parallelism (vae_patch_parallel.py:348 — here: spatial sharding of the
input latents over the mesh makes XLA halo-exchange the conv, same effect,
zero bespoke code).

Structure (decoder): conv_in → N upsample stages (resnet + nearest 2× +
conv) → groupnorm → silu → conv_out. Geometry matches an 8× VAE with
channel schedule [512, 256, 128] so real checkpoints can map onto it
later; random init serves numerics-free benchmarks now.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Params = dict


def conv2d(x: jnp.ndarray, p: Params, stride: int = 1) -> jnp.ndarray:
    """NHWC conv with SAME padding; weights [kh, kw, cin, cout]."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding="SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def group_norm(x: jnp.ndarray, p: Params, groups: int = 32,
               eps: float = 1e-6) -> jnp.ndarray:
    b, h, w, c = x.shape
    g = min(groups, c)
    orig = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"] + p["shift"]).astype(orig)


def _resnet(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    h = conv2d(jax.nn.silu(group_norm(x, p["norm1"]).astype(
        jnp.float32)).astype(x.dtype), p["conv1"])
    h = conv2d(jax.nn.silu(group_norm(h, p["norm2"]).astype(
        jnp.float32)).astype(x.dtype), p["conv2"])
    if "skip" in p:
        x = conv2d(x, p["skip"])
    return x + h


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def vae_decode(params: Params, latents: jnp.ndarray,
               scaling_factor: float = 1.0,
               shift_factor: float = 0.0) -> jnp.ndarray:
    """latents [B, h, w, C] → images [B, 8h, 8w, 3] in [-1, 1]."""
    x = latents / scaling_factor + shift_factor
    x = conv2d(x, params["conv_in"])
    for stage in params["stages"]:
        x = _resnet(x, stage["res"])
        x = upsample2x(x)
        x = conv2d(x, stage["conv_up"])
    x = jax.nn.silu(group_norm(x, params["norm_out"]).astype(
        jnp.float32)).astype(x.dtype)
    return jnp.tanh(conv2d(x, params["conv_out"]).astype(jnp.float32))


def vae_encode(params: Params, images: jnp.ndarray, key,
               scaling_factor: float = 1.0) -> jnp.ndarray:
    """images [B, H, W, 3] → latent sample [B, H/8, W/8, C] (stride-2
    convs; diagonal-gaussian sample)."""
    x = images
    for stage in params["down"]:
        x = conv2d(x, stage["conv"], stride=2)
        x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    moments = conv2d(x, params["conv_moments"])
    mean, logvar = jnp.split(moments, 2, axis=-1)
    std = jnp.exp(0.5 * jnp.clip(logvar, -30, 20))
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return (mean + std * eps) * scaling_factor


def _conv_init(key, kh, kw, cin, cout, dtype):
    fan = kh * kw * cin
    return {"w": (jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) *
                  fan ** -0.5).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _norm_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "shift": jnp.zeros((c,), dtype)}


def init_vae_params(key, latent_channels: int = 16,
                    channels: tuple[int, ...] = (256, 128, 64),
                    dtype=jnp.bfloat16) -> Params:
    """Decoder (+ tiny encoder) with len(channels) upsample stages →
    2**len(channels)× spatial scale."""
    keys = iter(jax.random.split(key, len(channels) * 6 + 8))
    params: Params = {
        "conv_in": _conv_init(next(keys), 3, 3, latent_channels,
                              channels[0], dtype),
        "stages": [],
        "norm_out": _norm_init(channels[-1], dtype),
        "conv_out": _conv_init(next(keys), 3, 3, channels[-1], 3, dtype),
        "down": [],
    }
    cin = channels[0]
    for c in channels:
        res = {
            "norm1": _norm_init(cin, dtype),
            "conv1": _conv_init(next(keys), 3, 3, cin, c, dtype),
            "norm2": _norm_init(c, dtype),
            "conv2": _conv_init(next(keys), 3, 3, c, c, dtype),
        }
        if cin != c:
            res["skip"] = _conv_init(next(keys), 1, 1, cin, c, dtype)
        params["stages"].append({
            "res": res,
            "conv_up": _conv_init(next(keys), 3, 3, c, c, dtype),
        })
        cin = c
    # encoder: stride-2 conv stack mirroring the decoder depth
    ein = 3
    for c in reversed(channels):
        params["down"].append(
            {"conv": _conv_init(next(keys), 3, 3, ein, c, dtype)})
        ein = c
    params["conv_moments"] = _conv_init(next(keys), 3, 3, ein,
                                        2 * latent_channels, dtype)
    return params
