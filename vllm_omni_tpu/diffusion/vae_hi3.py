"""HunyuanImage3 AutoencoderKLConv3D decoder (DC-AE shortcut style).

Reference: /root/reference/vllm_omni/diffusion/models/hunyuan_image3/
autoencoder.py — Decoder:300-384: conv_in plus a channel-repeat
shortcut of z (:365), GN32→swish→conv3 ResnetBlocks (:145), a
single-head full-attention mid block over the (f,h,w) token grid
(:113), UpsampleDCAE pixel-shuffle upsamplers whose shortcut
repeat-interleaves channels before the same shuffle (:198-213), GN32
tail. Temporal upsample fires on levels < log2(ffactor_temporal)
(images: ffactor_temporal == 1 → never), spatial on levels <
log2(ffactor_spatial). Channel-last [B, F, H, W, C] throughout
(XLA-native 3D convs)."""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


@dataclass
class HI3VaeConfig:
    latent_channels: int = 32
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512, 1024, 1024)
    layers_per_block: int = 2
    ffactor_spatial: int = 16
    ffactor_temporal: int = 1
    upsample_match_channel: bool = True

    @classmethod
    def from_json(cls, vae: dict) -> "HI3VaeConfig":
        return cls(
            latent_channels=vae.get("latent_channels", 32),
            out_channels=vae.get("out_channels", 3),
            block_out_channels=tuple(vae.get(
                "block_out_channels",
                (128, 256, 512, 512, 1024, 1024))),
            layers_per_block=vae.get("layers_per_block", 2),
            ffactor_spatial=vae.get("ffactor_spatial", 16),
            ffactor_temporal=vae.get("ffactor_temporal", 1),
            upsample_match_channel=vae.get("upsample_match_channel",
                                           True),
        )

    def level_plan(self) -> list:
        """Per level: (block_in→block_out channels ×(n+1) resblocks,
        upsample target or None, temporal flag). Mirrors Decoder
        __init__ :322-351 (decoder iterates block_out_channels in
        ORDER; channels flow block_in → ch)."""
        plan = []
        block_in = self.block_out_channels[0]
        n_lv = len(self.block_out_channels)
        for i, ch in enumerate(self.block_out_channels):
            res = []
            for _ in range(self.layers_per_block + 1):
                res.append((block_in, ch))
                block_in = ch
            sp = i < math.log2(self.ffactor_spatial)
            tp = i < math.log2(max(self.ffactor_temporal, 1))
            up = None
            if sp or tp:
                assert i < n_lv - 1
                up_out = self.block_out_channels[i + 1] if \
                    self.upsample_match_channel else block_in
                up = (block_in, up_out, tp)
                block_in = up_out
            plan.append((res, up))
        return plan

    @property
    def tail_channels(self) -> int:
        plan = self.level_plan()
        res, up = plan[-1]
        return up[1] if up is not None else res[-1][1]


def _gn32(x, w, b, eps=1e-6):
    """GroupNorm(32) over channel-last [..., C]."""
    c = x.shape[-1]
    g = 32 if c % 32 == 0 and c >= 32 else c
    shp = x.shape
    xf = x.astype(jnp.float32).reshape(shp[0], -1, g, c // g)
    mu = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(shp)
    return (xf * w.astype(jnp.float32) +
            b.astype(jnp.float32)).astype(x.dtype)


def _swish(x):
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _conv3(x, p, k=3):
    """[B, F, H, W, C]; kernel jax [kt, kh, kw, I, O]; symmetric
    padding (k−1)//2."""
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1, 1, 1),
        padding=[(pad, pad)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out + p["b"]


def _resblock(x, p, eps=1e-6):
    h = _conv3(_swish(_gn32(x, p["norm1_w"], p["norm1_b"], eps)),
               p["conv1"])
    h = _conv3(_swish(_gn32(h, p["norm2_w"], p["norm2_b"], eps)),
               p["conv2"])
    if "nin" in p:
        x = _conv3(x, p["nin"], k=1)
    return x + h


def _attnblock(x, p, eps=1e-6):
    b, f, hh, ww, c = x.shape
    h = _gn32(x, p["norm_w"], p["norm_b"], eps)
    q = (_conv3(h, p["q"], k=1)).reshape(b, -1, c)
    k = (_conv3(h, p["k"], k=1)).reshape(b, -1, c)
    v = (_conv3(h, p["v"], k=1)).reshape(b, -1, c)
    sc = jnp.einsum("bqc,bkc->bqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * (c ** -0.5)
    pr = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bqk,bkc->bqc", pr.astype(v.dtype), v).reshape(
        b, f, hh, ww, c)
    return x + _conv3(o, p["proj_out"], k=1)


def _upsample_dcae(x, p, c_out: int, temporal: bool):
    """conv to c_out·factor then shuffle '(r1 r2 r3 c) → c (f r1)
    (h r2) (w r3)'; shortcut repeat-interleaves channels first."""
    r1 = 2 if temporal else 1
    factor = r1 * 4
    b, f, hh, ww, c_in = x.shape
    h = _conv3(x, p["conv"])  # [..., c_out·factor]

    def shuffle(t, cc):
        t = t.reshape(b, f, hh, ww, r1, 2, 2, cc)
        t = t.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return t.reshape(b, f * r1, hh * 2, ww * 2, cc)

    h = shuffle(h, c_out)
    repeats = factor * c_out // c_in
    sc = jnp.repeat(x, repeats, axis=-1)
    sc = shuffle(sc, c_out)
    return h + sc


def hi3_vae_decode(params: Params, cfg: HI3VaeConfig,
                   lat: jnp.ndarray) -> jnp.ndarray:
    """latents [B, h, w, C] (or [B, f, h, w, C]) → RGB [-1, 1] same
    layout upsampled by ffactor_spatial (Decoder.forward :359-384)."""
    squeeze = lat.ndim == 4
    if squeeze:
        lat = lat[:, None]
    dtype = params["conv_in"]["w"].dtype
    z = lat.astype(dtype)
    block0 = cfg.block_out_channels[0]
    h = _conv3(z, params["conv_in"]) + jnp.repeat(
        z, block0 // cfg.latent_channels, axis=-1)
    h = _resblock(h, params["mid_block_1"])
    h = _attnblock(h, params["mid_attn"])
    h = _resblock(h, params["mid_block_2"])
    for res_ps, up_p, up_meta in params["up"]:
        for rp in res_ps:
            h = _resblock(h, rp)
        if up_p is not None:
            c_out, temporal = up_meta
            h = _upsample_dcae(h, up_p, c_out, temporal)
    h = _conv3(_swish(_gn32(h, params["norm_out_w"],
                            params["norm_out_b"])),
               params["conv_out"])
    out = h.astype(jnp.float32)
    return out[:, 0] if squeeze else out


# ---------------------------------------------------------------------------
# init + assignment (decoder.* naming of AutoencoderKLConv3D)
# ---------------------------------------------------------------------------


def _conv_init(cin, cout, k, dtype):
    return {"w": jnp.zeros((k, k, k, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _res_init(cin, cout, dtype):
    p = {"norm1_w": jnp.ones((cin,), dtype),
         "norm1_b": jnp.zeros((cin,), dtype),
         "conv1": _conv_init(cin, cout, 3, dtype),
         "norm2_w": jnp.ones((cout,), dtype),
         "norm2_b": jnp.zeros((cout,), dtype),
         "conv2": _conv_init(cout, cout, 3, dtype)}
    if cin != cout:
        p["nin"] = _conv_init(cin, cout, 1, dtype)
    return p


def init_hi3_vae_decoder(cfg: HI3VaeConfig, dtype=jnp.float32
                         ) -> Params:
    block0 = cfg.block_out_channels[0]
    plan = cfg.level_plan()
    up = []
    for res, u in plan:
        res_ps = [_res_init(ci, co, dtype) for ci, co in res]
        if u is None:
            up.append((res_ps, None, None))
        else:
            cin, cout, tp = u
            factor = (2 if tp else 1) * 4
            up.append((res_ps,
                       {"conv": _conv_init(cin, cout * factor, 3,
                                           dtype)},
                       (cout, tp)))
    return {
        "conv_in": _conv_init(cfg.latent_channels, block0, 3, dtype),
        "mid_block_1": _res_init(block0, block0, dtype),
        "mid_attn": {
            "norm_w": jnp.ones((block0,), dtype),
            "norm_b": jnp.zeros((block0,), dtype),
            "q": _conv_init(block0, block0, 1, dtype),
            "k": _conv_init(block0, block0, 1, dtype),
            "v": _conv_init(block0, block0, 1, dtype),
            "proj_out": _conv_init(block0, block0, 1, dtype),
        },
        "mid_block_2": _res_init(block0, block0, dtype),
        "up": up,
        "norm_out_w": jnp.ones((cfg.tail_channels,), dtype),
        "norm_out_b": jnp.zeros((cfg.tail_channels,), dtype),
        "conv_out": _conv_init(cfg.tail_channels, cfg.out_channels, 3,
                               dtype),
    }


def assign_hi3_vae_tensor(params: Params, name: str, arr,
                          dtype=jnp.float32) -> bool:
    """'decoder.'-relative AutoencoderKLConv3D names. torch Conv3d
    [O, I, kt, kh, kw] → [kt, kh, kw, I, O]."""
    a = np.asarray(arr)
    parts = name.split(".")
    if parts[0] == "decoder":
        parts = parts[1:]
    if not parts:
        return False

    def put_conv(slot):
        if parts[-1] == "weight":
            if a.ndim != 5 or slot["w"].shape != (
                    a.shape[2], a.shape[3], a.shape[4], a.shape[1],
                    a.shape[0]):
                return False  # foreign geometry (e.g. 2D stub VAEs)
            slot["w"] = jnp.asarray(a.transpose(2, 3, 4, 1, 0), dtype)
        else:
            if slot["b"].shape != a.shape:
                return False
            slot["b"] = jnp.asarray(a, dtype)
        return True

    def put_res(p):
        sub = parts[-2]
        if sub in ("norm1", "norm2"):
            key = sub + ("_w" if parts[-1] == "weight" else "_b")
            p[key] = jnp.asarray(a, dtype)
            return True
        if sub == "conv1":
            return put_conv(p["conv1"])
        if sub == "conv2":
            return put_conv(p["conv2"])
        if sub == "nin_shortcut":
            if "nin" not in p:
                return False
            return put_conv(p["nin"])
        return False

    if parts[0] in ("conv_in", "conv_out"):
        return put_conv(params[parts[0]])
    if parts[0] == "norm_out":
        key = "norm_out_w" if parts[-1] == "weight" else "norm_out_b"
        params[key] = jnp.asarray(a, dtype)
        return True
    if parts[0] == "mid":
        if parts[1] in ("block_1", "block_2"):
            return put_res(params["mid_" + parts[1]])
        if parts[1] == "attn_1":
            p = params["mid_attn"]
            if parts[2] == "norm":
                key = "norm_w" if parts[-1] == "weight" else "norm_b"
                p[key] = jnp.asarray(a, dtype)
                return True
            if parts[2] in ("q", "k", "v", "proj_out"):
                return put_conv(p[parts[2]])
        return False
    if parts[0] == "up":
        level = int(parts[1])
        res_ps, up_p, _meta = params["up"][level]
        if parts[2] == "block":
            return put_res(res_ps[int(parts[3])])
        if parts[2] == "upsample" and up_p is not None:
            return put_conv(up_p["conv"])
        return False
    return False
