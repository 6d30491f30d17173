"""Wan-style 3D causal VAE with real checkpoint geometry.

Reference parity: AutoencoderKLQwenImage
(diffusion/models/qwen_image/autoencoder_kl_qwenimage.py:667) and the
diffusers AutoencoderKLWan the wan2_2 pipelines decode through — the two
share one architecture: causal 3D convs (front-padded 2 in time),
channel-L2 RMS norms (`gamma` tensors), a single-head per-frame spatial
mid attention, and Resample blocks whose spatial conv halves channels on
the way up.

TPU-first: the reference streams frames through the decoder with a
feat_cache of per-conv temporal tails (frame-by-frame chunks,
autoencoder_kl_qwenimage.py:629-665). On TPU one fixed-shape program
over the FULL sequence is both simpler and faster: a causal conv over
the whole time axis is mathematically identical to the cached streaming
form, and the streaming `upsample3d` first-frame special case ("Rep"
marker: frame 0 bypasses the time conv, which then runs over the
sequence with frame 0 zeroed) is reproduced exactly with one
concatenate. Parity is asserted against a torch oracle that implements
the reference's cached frame-by-frame semantics
(tests/diffusion/test_vae_wan.py).

Layouts: activations NTHWC; conv weights [kt, kh, kw, cin, cout]
(torch Conv3d [o,i,kt,kh,kw] transposed on load).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict


@dataclass
class VAEWanConfig:
    """Mirrors vae/config.json of AutoencoderKLWan /
    AutoencoderKLQwenImage (base_dim 96, z_dim 16, dim_mult [1,2,4,4],
    temperal_downsample [F,T,T] for both shipped checkpoints)."""

    base_dim: int = 96
    z_dim: int = 16
    dim_mult: tuple = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: tuple = ()
    temperal_downsample: tuple = (False, True, True)
    input_channels: int = 3
    latents_mean: Optional[tuple] = None
    latents_std: Optional[tuple] = None

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.dim_mult) - 1)

    @property
    def temporal_upsample(self) -> tuple:
        return tuple(reversed(self.temperal_downsample))

    @classmethod
    def from_json(cls, cfg: dict) -> "VAEWanConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        for k in ("dim_mult", "attn_scales", "temperal_downsample",
                  "latents_mean", "latents_std"):
            if kw.get(k) is not None:
                kw[k] = tuple(kw[k])
        return cls(**kw)


# ---------------------------------------------------------------------------
# primitives (NTHWC)
# ---------------------------------------------------------------------------


def _causal_conv3d(x: jnp.ndarray, p: Params,
                   t_stride: int = 1) -> jnp.ndarray:
    """Causal 3D conv: time front-padded by 2·((kt−1)//2) like the
    reference's CausalConv3d (padding moved entirely to the front);
    spatial SAME."""
    w = p["w"].astype(x.dtype)
    kt, kh, kw = w.shape[:3]
    pt = kt - 1  # reference: 2 * (kt // 2) for odd kt
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(t_stride, 1, 1),
        padding=((pt, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _rms_norm(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """F.normalize(x, dim=channel) · √C · gamma — channel-last here."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    c = x.shape[-1]
    norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + 1e-12
    return (xf / norm * (c ** 0.5) *
            p["gamma"].astype(jnp.float32)).astype(orig)


def _silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _resnet(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    # reference order: shortcut FIRST on raw x, then norm/act/conv x2
    h = x
    if "skip" in p:
        h = _causal_conv3d(x, p["skip"])
    y = _causal_conv3d(_silu(_rms_norm(x, p["norm1"])), p["conv1"])
    y = _causal_conv3d(_silu(_rms_norm(y, p["norm2"])), p["conv2"])
    return y + h


def _attention(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Per-frame single-head spatial attention (QwenImageAttentionBlock:
    RMS norm → 1x1 qkv conv → SDPA over h·w → 1x1 proj → residual)."""
    b, t, h, w, c = x.shape
    res = x
    xn = _rms_norm(x, p["norm"]).reshape(b * t, h * w, c)
    qkv = xn @ p["qkv"]["w"].astype(xn.dtype) + \
        p["qkv"]["b"].astype(xn.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scores = (q.astype(jnp.float32) @
              k.astype(jnp.float32).swapaxes(-1, -2)) * (c ** -0.5)
    o = jax.nn.softmax(scores, axis=-1).astype(v.dtype) @ v
    o = o @ p["proj"]["w"].astype(o.dtype) + p["proj"]["b"].astype(o.dtype)
    return res + o.reshape(b, t, h, w, c)


def _mid(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    x = _resnet(x, p["res"][0])
    x = _attention(x, p["attn"])
    return _resnet(x, p["res"][1])


def _spatial_conv(x: jnp.ndarray, p: Params, stride: int = 1,
                  padding="SAME") -> jnp.ndarray:
    """Per-frame 2D conv: fold time into batch."""
    b, t, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c), p["w"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    y = y + p["b"].astype(x.dtype)
    return y.reshape(b, t, *y.shape[1:])


def _upsample_block(x: jnp.ndarray, p: Params, mode: str) -> jnp.ndarray:
    if mode == "upsample3d" and x.shape[1] > 1:
        # streaming equivalence (module docstring): frame 0 bypasses;
        # the time conv runs causally over [0, f1, .., f_{t-1}], its
        # outputs at positions ≥1 interleave to two frames each
        b, t, h, w, c = x.shape
        seq = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, 1:]], 1)
        y = _causal_conv3d(seq, p["time_conv"])[:, 1:]  # [b,t-1,h,w,2c]
        y = y.reshape(b, t - 1, h, w, 2, c).transpose(0, 1, 4, 2, 3, 5)
        y = y.reshape(b, 2 * (t - 1), h, w, c)
        x = jnp.concatenate([x[:, :1], y], axis=1)
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :],
                         (b, t, h, 2, w, 2, c))
    x = x.reshape(b, t, 2 * h, 2 * w, c)
    return _spatial_conv(x, p["conv"])


def _downsample_block(x: jnp.ndarray, p: Params, mode: str) -> jnp.ndarray:
    # spatial: asymmetric (0,1,0,1) zero-pad + stride-2 conv
    b, t, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
    x = _spatial_conv(xp, p["conv"], stride=2, padding="VALID")
    if mode == "downsample3d" and x.shape[1] > 1:
        # frame 0 bypasses; stride-2 kernel-3 windows [f0,f1,f2],
        # [f2,f3,f4], … (streaming: cache carries the window overlap)
        head = x[:, :1]
        y = jax.lax.conv_general_dilated(
            x, p["time_conv"]["w"].astype(x.dtype),
            window_strides=(2, 1, 1),
            padding=((0, 0), (0, 0), (0, 0)),
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        y = y + p["time_conv"]["b"].astype(x.dtype)
        x = jnp.concatenate([head, y], axis=1)
    return x


# ---------------------------------------------------------------------------
# decode / encode
# ---------------------------------------------------------------------------


def wan_decode(params: Params, cfg: VAEWanConfig,
               latents: jnp.ndarray) -> jnp.ndarray:
    """DiT-space latents [B, t, h, w, z] → video [B, T, H, W, 3].
    Un-normalizes with latents_mean/std first (reference
    pipeline_qwen_image.py:813-822: z·std + mean), then post_quant_conv
    → decoder. Pass t=1 for images."""
    z = latents.astype(jnp.float32)
    if cfg.latents_std is not None:
        std = jnp.asarray(cfg.latents_std, jnp.float32)
        mean = jnp.asarray(cfg.latents_mean, jnp.float32)
        z = z * std + mean
    x = z.astype(latents.dtype)
    x = _causal_conv3d(x, params["post_quant_conv"])
    d = params["decoder"]
    x = _causal_conv3d(x, d["conv_in"])
    x = _mid(x, d["mid"])
    n_up = len(cfg.dim_mult) - 1
    for i, blk in enumerate(d["up"]):
        for r in blk["res"]:
            x = _resnet(x, r)
        if i < n_up:
            mode = "upsample3d" if cfg.temporal_upsample[i] \
                else "upsample2d"
            x = _upsample_block(x, blk["upsampler"], mode)
    x = _silu(_rms_norm(x, d["norm_out"]))
    out = _causal_conv3d(x, d["conv_out"]).astype(jnp.float32)
    # reference _decode clamps (autoencoder_kl_qwenimage.py:858)
    return jnp.clip(out, -1.0, 1.0)


def wan_encode(params: Params, cfg: VAEWanConfig, video: jnp.ndarray,
               key=None, sample: bool = True) -> jnp.ndarray:
    """video [B, T, H, W, 3] → DiT-space latents [B, t, h, w, z]
    (moments → optional gaussian sample → (z − mean)/std)."""
    e = params["encoder"]
    x = _causal_conv3d(video, e["conv_in"])
    for item in e["down"]:
        kind, p = item
        if kind == "res":
            x = _resnet(x, p)
        else:
            x = _downsample_block(x, p, kind)
    x = _mid(x, e["mid"])
    x = _silu(_rms_norm(x, e["norm_out"]))
    moments = _causal_conv3d(x, e["conv_out"])
    moments = _causal_conv3d(moments, params["quant_conv"])
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    if sample and key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape,
                                              jnp.float32)
    z = mean
    if cfg.latents_std is not None:
        z = (z - jnp.asarray(cfg.latents_mean, jnp.float32)) / \
            jnp.asarray(cfg.latents_std, jnp.float32)
    return z.astype(video.dtype)


# ---------------------------------------------------------------------------
# init + checkpoint assignment
# ---------------------------------------------------------------------------


def _conv3_slot(cin: int, cout: int, kt: int, ks: int, dtype) -> Params:
    return {"w": jnp.zeros((kt, ks, ks, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _conv2_slot(cin: int, cout: int, k: int, dtype) -> Params:
    return {"w": jnp.zeros((k, k, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _gamma_slot(c: int, dtype) -> Params:
    return {"gamma": jnp.ones((c,), dtype)}


def _lin_slot(cin: int, cout: int, dtype) -> Params:
    return {"w": jnp.zeros((cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _resnet_slot(cin: int, cout: int, dtype) -> Params:
    p = {"norm1": _gamma_slot(cin, dtype),
         "conv1": _conv3_slot(cin, cout, 3, 3, dtype),
         "norm2": _gamma_slot(cout, dtype),
         "conv2": _conv3_slot(cout, cout, 3, 3, dtype)}
    if cin != cout:
        p["skip"] = _conv3_slot(cin, cout, 1, 1, dtype)
    return p


def _mid_slot(c: int, dtype) -> Params:
    return {"res": [_resnet_slot(c, c, dtype), _resnet_slot(c, c, dtype)],
            "attn": {"norm": _gamma_slot(c, dtype),
                     "qkv": _lin_slot(c, 3 * c, dtype),
                     "proj": _lin_slot(c, c, dtype)}}


def init_wan_vae_params(cfg: VAEWanConfig, dtype=jnp.bfloat16) -> Params:
    if cfg.attn_scales:
        raise NotImplementedError(
            "attn_scales blocks unused by shipped wan/qwen_image VAEs")
    dm = cfg.dim_mult
    # decoder dims: [last, reversed...]·base (reference Decoder3d :587)
    ddims = [cfg.base_dim * u for u in (dm[-1],) + tuple(reversed(dm))]
    dec: Params = {
        "conv_in": _conv3_slot(cfg.z_dim, ddims[0], 3, 3, dtype),
        "mid": _mid_slot(ddims[0], dtype),
        "up": [],
        "norm_out": _gamma_slot(ddims[-1], dtype),
        "conv_out": _conv3_slot(ddims[-1], cfg.input_channels, 3, 3,
                                dtype),
    }
    n_up = len(dm) - 1
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i > 0:
            cin //= 2  # previous Resample halved channels
        blk: Params = {"res": []}
        cur = cin
        for _ in range(cfg.num_res_blocks + 1):
            blk["res"].append(_resnet_slot(cur, cout, dtype))
            cur = cout
        if i < n_up:
            up = {"conv": _conv2_slot(cout, cout // 2, 3, dtype)}
            if cfg.temporal_upsample[i]:
                up["time_conv"] = _conv3_slot(cout, 2 * cout, 3, 1,
                                              dtype)
            blk["upsampler"] = up
        dec["up"].append(blk)
    # encoder: flat down_blocks list (reference Encoder3d :416-429)
    edims = [cfg.base_dim * u for u in (1,) + tuple(dm)]
    enc: Params = {
        "conv_in": _conv3_slot(cfg.input_channels, edims[0], 3, 3,
                               dtype),
        "down": [],
        "mid": _mid_slot(edims[-1], dtype),
        "norm_out": _gamma_slot(edims[-1], dtype),
        "conv_out": _conv3_slot(edims[-1], 2 * cfg.z_dim, 3, 3, dtype),
    }
    for i, (cin, cout) in enumerate(zip(edims[:-1], edims[1:])):
        cur = cin
        for _ in range(cfg.num_res_blocks):
            enc["down"].append(("res", _resnet_slot(cur, cout, dtype)))
            cur = cout
        if i < len(dm) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] \
                else "downsample2d"
            dn = {"conv": _conv2_slot(cout, cout, 3, dtype)}
            if mode == "downsample3d":
                dn["time_conv"] = _conv3_slot(cout, cout, 3, 1, dtype)
            enc["down"].append((mode, dn))
    return {"decoder": dec, "encoder": enc,
            "quant_conv": _conv3_slot(2 * cfg.z_dim, 2 * cfg.z_dim, 1, 1,
                                      dtype),
            "post_quant_conv": _conv3_slot(cfg.z_dim, cfg.z_dim, 1, 1,
                                           dtype)}


def _put(slot: Params, kind: str, leaf: str, arr, dtype) -> bool:
    """kind: conv3 | conv2 | lin | gamma."""
    import numpy as np

    arr = np.asarray(arr)
    if kind == "gamma":
        tgt = "gamma"
        arr = arr.reshape(-1)
    elif leaf == "bias":
        tgt = "b"
    else:
        tgt = "w"
        if kind == "conv3":
            arr = arr.transpose(2, 3, 4, 1, 0)  # [o,i,kt,kh,kw]→THWIO
        elif kind == "conv2":
            # Resample 2D convs and 1x1 attn convs store [o,i,kh,kw]
            arr = arr.transpose(2, 3, 1, 0)
        else:
            arr = arr.reshape(arr.shape[0], -1).T  # 1x1 conv → linear
    if tgt not in slot or tuple(slot[tgt].shape) != tuple(arr.shape):
        return False
    slot[tgt] = jnp.asarray(arr, dtype)
    return True


def _assign_resnet(blk: Params, rest: list, arr, dtype) -> bool:
    mod, leaf = rest[0], rest[1]
    if mod in ("norm1", "norm2"):
        return _put(blk[mod], "gamma", leaf, arr, dtype)
    if mod in ("conv1", "conv2"):
        return _put(blk[mod], "conv3", leaf, arr, dtype)
    if mod == "conv_shortcut" and "skip" in blk:
        return _put(blk["skip"], "conv3", leaf, arr, dtype)
    return False


def _assign_attn(attn: Params, rest: list, arr, dtype) -> bool:
    mod, leaf = rest[0], rest[1]
    if mod == "norm":
        return _put(attn["norm"], "gamma", leaf, arr, dtype)
    if mod == "to_qkv":
        return _put(attn["qkv"], "lin", leaf, arr, dtype)
    if mod == "proj":
        return _put(attn["proj"], "lin", leaf, arr, dtype)
    return False


def _assign_resample(up: Params, rest: list, arr, dtype) -> bool:
    # names: resample.1.{weight,bias} (Sequential idx 1 = the conv) or
    # time_conv.{weight,bias}
    if rest[0] == "resample":
        return _put(up["conv"], "conv2", rest[-1], arr, dtype)
    if rest[0] == "time_conv" and "time_conv" in up:
        return _put(up["time_conv"], "conv3", rest[-1], arr, dtype)
    return False


def assign_wan_vae_tensor(params: Params, name: str, arr: Any,
                          dtype=jnp.bfloat16) -> bool:
    parts = name.split(".")
    if parts[0] in ("quant_conv", "post_quant_conv"):
        return _put(params[parts[0]], "conv3", parts[1], arr, dtype)
    if parts[0] not in ("encoder", "decoder"):
        return False
    tree = params[parts[0]]
    rest = parts[1:]
    if rest[0] in ("conv_in", "conv_out"):
        return _put(tree[rest[0]], "conv3", rest[1], arr, dtype)
    if rest[0] == "norm_out":
        return _put(tree["norm_out"], "gamma", rest[1], arr, dtype)
    if rest[0] == "mid_block":
        if rest[1] == "resnets":
            return _assign_resnet(tree["mid"]["res"][int(rest[2])],
                                  rest[3:], arr, dtype)
        if rest[1] == "attentions":
            return _assign_attn(tree["mid"]["attn"], rest[3:], arr,
                                dtype)
        return False
    if parts[0] == "decoder" and rest[0] == "up_blocks":
        blk = tree["up"][int(rest[1])]
        if rest[2] == "resnets":
            return _assign_resnet(blk["res"][int(rest[3])], rest[4:],
                                  arr, dtype)
        if rest[2] == "upsamplers" and "upsampler" in blk:
            return _assign_resample(blk["upsampler"], rest[4:], arr,
                                    dtype)
        return False
    if parts[0] == "encoder" and rest[0] == "down_blocks":
        kind, p = tree["down"][int(rest[1])]
        if kind == "res":
            return _assign_resnet(p, rest[2:], arr, dtype)
        return _assign_resample(p, rest[2:], arr, dtype)
    return False
