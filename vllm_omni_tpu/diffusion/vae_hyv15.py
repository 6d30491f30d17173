"""AutoencoderKLHunyuanVideo15 — HunyuanVideo 1.5 causal 3D VAE
decoder in JAX.

Reference parity: the reference pipeline decodes HunyuanVideo15 latents
through diffusers' AutoencoderKLHunyuanVideo15
(models/hunyuan_video/pipeline_hunyuan_video_1_5.py:113, decode at
:520-521 after dividing by config.scaling_factor; defaults there:
spatial 16×, temporal 4×, latent 32ch).

Architecture spec (HunyuanVideo causal-VAE lineage):
* causal 3D convs: time padding (k−1, 0) REPLICATE (frame t never sees
  t+1), symmetric spatial zero pad — diffusers
  HunyuanVideoCausalConv3d semantics;
* resnet: GroupNorm(32) → silu → conv1 → GroupNorm → silu → conv2
  (+1×1 conv shortcut on width change);
* mid block: resnet → single-head attention over the flattened
  spatio-temporal token grid (GroupNorm pre-norm, q/k/v/proj linears)
  → resnet;
* up block: resnets then nearest-neighbour upsample (×2 spatial,
  optionally ×2 temporal where the FIRST frame upsamples spatially
  only — keeps the causal "k·ratio+1" frame count) followed by a
  causal conv;
* tail: GroupNorm → silu → conv_out.

Which up blocks upsample is config-driven (`spatial_up`/`temporal_up`
flags derived from spatial/temporal_compression_ratio: spatial in all
but the final block, temporal in the earliest log2(ratio) blocks).

TPU-first: channels-last NDHWC, fp32 GroupNorm statistics, one jitted
decode per latent bucket. Numeric oracle:
tests/diffusion/test_vae_hyv15.py implements the same spec in torch
with diffusers-layout tensor names.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

_DN = ("NDHWC", "DHWIO", "NDHWC")


@dataclass
class VAEHYV15Config:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: tuple = (128, 256, 512, 1024, 1024)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 1.0
    spatial_compression_ratio: int = 16
    temporal_compression_ratio: int = 4
    mid_block_add_attention: bool = True

    @property
    def decoder_widths(self) -> tuple:
        return tuple(reversed(self.block_out_channels))

    @property
    def up_flags(self) -> list:
        """[(spatial_up, temporal_up)] per decoder up block."""
        widths = self.decoder_widths
        n = len(widths)
        n_sp = int(math.log2(self.spatial_compression_ratio))
        n_tp = int(math.log2(self.temporal_compression_ratio))
        flags = []
        for i in range(n):
            sp = i < n_sp
            tp = i < n_tp
            flags.append((sp, tp))
        return flags

    @property
    def down_flags(self) -> list:
        """[(spatial_down, temporal_down)] per encoder down block —
        the mirror of up_flags: spatial in the first log2(ratio)
        blocks, temporal in the DEEPEST of those (the decoder upsamples
        temporally in its earliest = deepest blocks)."""
        n = len(self.block_out_channels)
        n_sp = int(math.log2(self.spatial_compression_ratio))
        n_tp = int(math.log2(self.temporal_compression_ratio))
        return [(j < n_sp, n_sp - n_tp <= j < n_sp) for j in range(n)]

    @classmethod
    def from_json(cls, cfg: dict[str, Any]) -> "VAEHYV15Config":
        keep = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in cfg.items() if k in keep}
        for k, v in list(kw.items()):
            if isinstance(v, list):
                kw[k] = tuple(v)
        return cls(**kw)


# ---------------------------------------------------------------------------
# ops (channels-last [B, F, H, W, C])
# ---------------------------------------------------------------------------


def _causal_conv3d(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Replicate time pad (k−1 front), zero spatial pad."""
    kt, kh, kw = p["w"].shape[:3]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def _group_norm(x: jnp.ndarray, p: Params, groups: int,
                eps: float = 1e-6) -> jnp.ndarray:
    b, c = x.shape[0], x.shape[-1]
    g = min(groups, c)
    spatial = x.shape[1:-1]
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(
        b, *spatial, c)
    return (xf * p["scale"].astype(jnp.float32) +
            p["shift"].astype(jnp.float32)).astype(x.dtype)


def _resnet(x: jnp.ndarray, p: Params, groups: int) -> jnp.ndarray:
    h = jax.nn.silu(_group_norm(x, p["norm1"], groups).astype(
        jnp.float32)).astype(x.dtype)
    h = _causal_conv3d(h, p["conv1"])
    h = jax.nn.silu(_group_norm(h, p["norm2"], groups).astype(
        jnp.float32)).astype(x.dtype)
    h = _causal_conv3d(h, p["conv2"])
    sc = _causal_conv3d(x, p["conv_shortcut"]) \
        if "conv_shortcut" in p else x
    return sc + h


def _mid_attention(x: jnp.ndarray, p: Params, groups: int
                   ) -> jnp.ndarray:
    """Single-head attention over the flattened (F·H·W) grid."""
    b, f, h, w, c = x.shape
    hn = _group_norm(x, p["group_norm"], groups).reshape(b, -1, c)

    def lin(v, q):
        return v @ q["w"].astype(v.dtype) + q["b"].astype(v.dtype)

    q = lin(hn, p["to_q"]).astype(jnp.float32)
    k = lin(hn, p["to_k"]).astype(jnp.float32)
    v = lin(hn, p["to_v"]).astype(jnp.float32)
    att = jax.nn.softmax(q @ k.transpose(0, 2, 1) * (c ** -0.5),
                         axis=-1)
    o = (att @ v).astype(x.dtype)
    o = lin(o, p["to_out"])
    return x + o.reshape(b, f, h, w, c)


def _upsample(x: jnp.ndarray, p: Params, spatial: bool,
              temporal: bool) -> jnp.ndarray:
    """Nearest-neighbour ×2; with temporal upsampling the FIRST frame
    stays single (causal frame count), then a causal conv."""
    b, f, h, w, c = x.shape
    if spatial:
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
    if temporal:
        if f > 1:
            first, rest = x[:, :1], x[:, 1:]
            rest = jnp.repeat(rest, 2, axis=1)
            x = jnp.concatenate([first, rest], axis=1)
    return _causal_conv3d(x, p["conv"])


def _causal_downsample(x: jnp.ndarray, p: Params, spatial: bool,
                       temporal: bool) -> jnp.ndarray:
    """Strided causal conv (HunyuanVideo DownsampleCausal3D lineage):
    spatial zero pad (0, 1) each trailing edge then stride 2 unpadded;
    time front-REPLICATE (k−1) then stride 2 → F frames encode to
    ceil(F/2) (a single i2v frame stays a single latent frame)."""
    kt, kh, kw = p["w"].shape[:3]
    st = 2 if temporal else 1
    ss = 2 if spatial else 1
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    pad_h = (0, max(kh - ss, 0)) if spatial else (kh // 2, kh // 2)
    pad_w = (0, max(kw - ss, 0)) if spatial else (kw // 2, kw // 2)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(st, ss, ss),
        padding=[(0, 0), pad_h, pad_w], dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def hyv15_vae_decode(params: Params, cfg: VAEHYV15Config,
                     latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B, F, H, W, C_lat] channels-last, already divided by
    scaling_factor (pipeline_hunyuan_video_1_5.py:520) → video
    [B, (F−1)·t_ratio+1, H·s, W·s, 3] in [-1, 1]."""
    dec = params["decoder"]
    g = cfg.norm_num_groups
    x = latents
    if "post_quant_conv" in params:
        x = _causal_conv3d(x, params["post_quant_conv"])
    x = _causal_conv3d(x, dec["conv_in"])
    x = _resnet(x, dec["mid_resnet1"], g)
    if "mid_attn" in dec:
        x = _mid_attention(x, dec["mid_attn"], g)
    x = _resnet(x, dec["mid_resnet2"], g)
    for blk, (sp, tp) in zip(dec["up_blocks"], cfg.up_flags):
        for r in blk["resnets"]:
            x = _resnet(x, r, g)
        if "upsampler" in blk:
            x = _upsample(x, blk["upsampler"], sp, tp)
    x = jax.nn.silu(_group_norm(x, dec["norm_out"], g).astype(
        jnp.float32)).astype(x.dtype)
    return _causal_conv3d(x, dec["conv_out"])


def hyv15_vae_encode(params: Params, cfg: VAEHYV15Config,
                     video: jnp.ndarray, key=None,
                     sample: bool = False) -> jnp.ndarray:
    """video [B, F, H, W, 3] in [-1, 1] → latents
    [B, ceil(F/t_ratio... causal), H/s, W/s, C_lat]. Default argmax
    (posterior mean — reference i2v retrieve_latents sample_mode=
    "argmax", pipeline_hunyuan_video_1_5_i2v.py:372). NOTE: the i2v
    conditioning path multiplies by scaling_factor at the CALL site
    (:373 image_latents · scaling_factor)."""
    enc = params["encoder"]
    g = cfg.norm_num_groups
    x = _causal_conv3d(video, enc["conv_in"])
    for blk, (sp, tp) in zip(enc["down_blocks"], cfg.down_flags):
        for r in blk["resnets"]:
            x = _resnet(x, r, g)
        if "downsampler" in blk:
            x = _causal_downsample(x, blk["downsampler"], sp, tp)
    x = _resnet(x, enc["mid_resnet1"], g)
    if "mid_attn" in enc:
        x = _mid_attention(x, enc["mid_attn"], g)
    x = _resnet(x, enc["mid_resnet2"], g)
    x = jax.nn.silu(_group_norm(x, enc["norm_out"], g).astype(
        jnp.float32)).astype(x.dtype)
    moments = _causal_conv3d(x, enc["conv_out"])
    if "quant_conv" in params:
        moments = _causal_conv3d(moments, params["quant_conv"])
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    if sample and key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape,
                                              jnp.float32)
    return mean.astype(video.dtype)


# ---------------------------------------------------------------------------
# init + tensor mapping
# ---------------------------------------------------------------------------


def init_hyv15_vae_params(cfg: VAEHYV15Config, dtype=jnp.bfloat16,
                          with_encoder: bool = False) -> Params:
    def conv(k, cin, cout):
        return {"w": jnp.zeros((k, k, k, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def norm(c):
        return {"scale": jnp.ones((c,), dtype),
                "shift": jnp.zeros((c,), dtype)}

    def lin(c):
        return {"w": jnp.zeros((c, c), dtype),
                "b": jnp.zeros((c,), dtype)}

    def resnet(cin, cout):
        r = {"norm1": norm(cin), "conv1": conv(3, cin, cout),
             "norm2": norm(cout), "conv2": conv(3, cout, cout)}
        if cin != cout:
            r["conv_shortcut"] = {
                "w": jnp.zeros((1, 1, 1, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}
        return r

    widths = cfg.decoder_widths
    dec: Params = {
        "conv_in": conv(3, cfg.latent_channels, widths[0]),
        "mid_resnet1": resnet(widths[0], widths[0]),
        "mid_resnet2": resnet(widths[0], widths[0]),
        "up_blocks": [],
        "norm_out": norm(widths[-1]),
        "conv_out": conv(3, widths[-1], cfg.out_channels),
    }
    if cfg.mid_block_add_attention:
        dec["mid_attn"] = {"group_norm": norm(widths[0]),
                           "to_q": lin(widths[0]),
                           "to_k": lin(widths[0]),
                           "to_v": lin(widths[0]),
                           "to_out": lin(widths[0])}
    flags = cfg.up_flags
    for i in range(len(widths)):
        cin = widths[i]
        cout = widths[min(i + 1, len(widths) - 1)]
        resnets = []
        for j in range(cfg.layers_per_block + 1):
            resnets.append(resnet(cin if j == 0 else cout, cout))
        blk: Params = {"resnets": resnets}
        sp, tp = flags[i]
        if sp or tp:
            blk["upsampler"] = {"conv": conv(3, cout, cout)}
        dec["up_blocks"].append(blk)
    params: Params = {"decoder": dec}
    if with_encoder:
        ew = cfg.block_out_channels
        enc: Params = {
            "conv_in": conv(3, cfg.in_channels, ew[0]),
            "down_blocks": [],
            "mid_resnet1": resnet(ew[-1], ew[-1]),
            "mid_resnet2": resnet(ew[-1], ew[-1]),
            "norm_out": norm(ew[-1]),
            "conv_out": conv(3, ew[-1], 2 * cfg.latent_channels),
        }
        if cfg.mid_block_add_attention:
            enc["mid_attn"] = {"group_norm": norm(ew[-1]),
                               "to_q": lin(ew[-1]),
                               "to_k": lin(ew[-1]),
                               "to_v": lin(ew[-1]),
                               "to_out": lin(ew[-1])}
        for j, (sp, tp) in enumerate(cfg.down_flags):
            cin = ew[max(j - 1, 0)]
            cout = ew[j]
            resnets = [resnet(cin if r == 0 else cout, cout)
                       for r in range(cfg.layers_per_block)]
            blk = {"resnets": resnets}
            if sp or tp:
                blk["downsampler"] = conv(3, cout, cout)
            enc["down_blocks"].append(blk)
        params["encoder"] = enc
    return params


def assign_hyv15_vae_tensor(params: Params, name: str, value,
                            dtype) -> bool:
    """diffusers tensor name → slot (decoder.*; causal convs nest
    under `<name>.conv.*`)."""
    v = np.asarray(value)

    def put_conv(slot, leaf):
        if leaf == "weight":
            slot["w"] = jnp.asarray(v.transpose(2, 3, 4, 1, 0), dtype)
        elif leaf == "bias":
            slot["b"] = jnp.asarray(v, dtype)
        else:
            return False
        return True

    def put_norm(slot, leaf):
        if leaf == "weight":
            slot["scale"] = jnp.asarray(v, dtype)
        elif leaf == "bias":
            slot["shift"] = jnp.asarray(v, dtype)
        else:
            return False
        return True

    def put_lin(slot, leaf):
        if leaf == "weight":
            slot["w"] = jnp.asarray(v.T, dtype)
        elif leaf == "bias":
            slot["b"] = jnp.asarray(v, dtype)
        else:
            return False
        return True

    def resnet_slot(r, rest):
        if rest[0] in ("conv1", "conv2", "conv_shortcut"):
            if rest[0] == "conv_shortcut" and "conv_shortcut" not in r:
                return False
            return put_conv(r[rest[0]], rest[-1])
        if rest[0] in ("norm1", "norm2"):
            return put_norm(r[rest[0]], rest[-1])
        return False

    parts = name.split(".")
    if parts[0] in ("post_quant_conv", "quant_conv"):
        slot = params.setdefault(parts[0], {})
        return put_conv(slot, parts[-1])
    if parts[0] == "encoder":
        if "encoder" not in params:
            return False
        enc = params["encoder"]
        rest = parts[1:]
        if rest[0] == "conv_in":
            return put_conv(enc["conv_in"], rest[-1])
        if rest[0] == "conv_out":
            return put_conv(enc["conv_out"], rest[-1])
        if rest[0] == "norm_out":
            return put_norm(enc["norm_out"], rest[-1])
        if rest[0] == "mid_block":
            sub = rest[1:]
            if sub[0] == "resnets":
                i = int(sub[1])
                tgt = enc["mid_resnet1"] if i == 0 else \
                    enc["mid_resnet2"]
                return resnet_slot(tgt, sub[2:])
            if sub[0] == "attentions" and "mid_attn" in enc:
                a = enc["mid_attn"]
                s2 = sub[2:]
                if s2[0] == "group_norm":
                    return put_norm(a["group_norm"], s2[-1])
                if s2[0] in ("to_q", "to_k", "to_v", "to_out"):
                    return put_lin(a[s2[0]], s2[-1])
            return False
        if rest[0] == "down_blocks":
            i = int(rest[1])
            if i >= len(enc["down_blocks"]):
                return False
            blk = enc["down_blocks"][i]
            sub = rest[2:]
            if sub[0] == "resnets":
                j = int(sub[1])
                if j >= len(blk["resnets"]):
                    return False
                return resnet_slot(blk["resnets"][j], sub[2:])
            if sub[0] == "downsamplers":
                if "downsampler" not in blk:
                    return False
                return put_conv(blk["downsampler"], sub[-1])
            return False
        return False
    if parts[0] != "decoder":
        return False
    parts = parts[1:]
    dec = params["decoder"]
    if parts[0] == "conv_in":
        return put_conv(dec["conv_in"], parts[-1])
    if parts[0] == "conv_out":
        return put_conv(dec["conv_out"], parts[-1])
    if parts[0] == "norm_out":
        return put_norm(dec["norm_out"], parts[-1])
    if parts[0] == "mid_block":
        rest = parts[1:]
        if rest[0] == "resnets":
            i = int(rest[1])
            tgt = dec["mid_resnet1"] if i == 0 else dec["mid_resnet2"]
            return resnet_slot(tgt, rest[2:])
        if rest[0] == "attentions" and "mid_attn" in dec:
            a = dec["mid_attn"]
            sub = rest[2:]
            if sub[0] == "group_norm":
                return put_norm(a["group_norm"], sub[-1])
            if sub[0] in ("to_q", "to_k", "to_v"):
                return put_lin(a[sub[0]], sub[-1])
            if sub[0] == "to_out":
                return put_lin(a["to_out"], sub[-1])
        return False
    if parts[0] == "up_blocks":
        i = int(parts[1])
        if i >= len(dec["up_blocks"]):
            return False
        blk = dec["up_blocks"][i]
        rest = parts[2:]
        if rest[0] == "resnets":
            j = int(rest[1])
            if j >= len(blk["resnets"]):
                return False
            return resnet_slot(blk["resnets"][j], rest[2:])
        if rest[0] == "upsamplers":
            if "upsampler" not in blk:
                return False
            return put_conv(blk["upsampler"]["conv"], rest[-1])
        return False
    return False
