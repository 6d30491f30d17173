"""AutoencoderKL with real checkpoint geometry (diffusers 2D VAE).

Reference parity: the diffusers `AutoencoderKL` every 2D image family in
the reference decodes through — flux (pipeline_flux.py `vae`), sd3,
z_image, longcat, ovis, omnigen2, glm_image, nextstep (the reference
builds these via `AutoencoderKL.from_pretrained` on the pipeline's
`vae/` subfolder; vllm_omni/diffusion/model_loader/diffusers_loader.py).

TPU-first: a pure function over a param pytree in NHWC (XLA's preferred
conv layout on TPU); bf16 weights with fp32 GroupNorm statistics. The
structure is the stock diffusers graph:

encoder: conv_in → DownEncoderBlock2D × N (resnets ×layers_per_block,
  stride-2 downsampler with (0,1,0,1) asymmetric pad on all but the
  last) → mid (resnet, 1-head spatial attention, resnet) → groupnorm →
  silu → conv_out (→ 2·z moments) [→ quant_conv]
decoder: [post_quant_conv →] conv_in → mid → UpDecoderBlock2D × N
  (resnets ×(layers_per_block+1), nearest-2× + conv upsampler on all
  but the last) → groupnorm → silu → conv_out

Tensor names map 1:1 from the diffusers checkpoint (assign_kl_tensor);
torch conv [out,in,kh,kw] → HWIO, Linear [out,in] → [in,out].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

Params = dict


@dataclass
class VAEKLConfig:
    """Mirrors the vae/config.json of an AutoencoderKL component."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    shift_factor: Optional[float] = None
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    mid_block_add_attention: bool = True

    @property
    def spatial_scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def from_json(cls, cfg: dict) -> "VAEKLConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if "block_out_channels" in kw:
            kw["block_out_channels"] = tuple(kw["block_out_channels"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# primitives (NHWC)
# ---------------------------------------------------------------------------


def _conv(x: jnp.ndarray, p: Params, stride: int = 1,
          padding="SAME") -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _group_norm(x: jnp.ndarray, p: Params, groups: int,
                eps: float = 1e-6) -> jnp.ndarray:
    b, h, w, c = x.shape
    g = min(groups, c)
    orig = x.dtype
    xf = x.astype(jnp.float32).reshape(b, h, w, g, c // g)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    return (xf * p["scale"].astype(jnp.float32) +
            p["shift"].astype(jnp.float32)).astype(orig)


def _silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)


def _resnet(x: jnp.ndarray, p: Params, groups: int) -> jnp.ndarray:
    h = _conv(_silu(_group_norm(x, p["norm1"], groups)), p["conv1"])
    h = _conv(_silu(_group_norm(h, p["norm2"], groups)), p["conv2"])
    if "skip" in p:
        x = _conv(x, p["skip"])
    return x + h


def _mid_attention(x: jnp.ndarray, p: Params, groups: int) -> jnp.ndarray:
    """Single-head spatial self-attention over the h·w token grid
    (diffusers UNetMidBlock2D Attention: heads = channels /
    attention_head_dim = 1 for every shipped KL VAE)."""
    b, h, w, c = x.shape
    res = x
    xn = _group_norm(x, p["norm"], groups).reshape(b, h * w, c)
    q = xn @ p["q"]["w"].astype(xn.dtype) + p["q"]["b"].astype(xn.dtype)
    k = xn @ p["k"]["w"].astype(xn.dtype) + p["k"]["b"].astype(xn.dtype)
    v = xn @ p["v"]["w"].astype(xn.dtype) + p["v"]["b"].astype(xn.dtype)
    scores = (q.astype(jnp.float32) @ k.astype(jnp.float32).swapaxes(
        -1, -2)) * (c ** -0.5)
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = attn @ v
    o = o @ p["o"]["w"].astype(o.dtype) + p["o"]["b"].astype(o.dtype)
    return res + o.reshape(b, h, w, c)


def _mid(x: jnp.ndarray, p: Params, groups: int) -> jnp.ndarray:
    x = _resnet(x, p["res"][0], groups)
    if "attn" in p:
        x = _mid_attention(x, p["attn"], groups)
    return _resnet(x, p["res"][1], groups)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# decode / encode
# ---------------------------------------------------------------------------


def kl_decode(params: Params, cfg: VAEKLConfig,
              latents: jnp.ndarray) -> jnp.ndarray:
    """DiT-space latents [B, h, w, z] → images [B, H, W, 3] in [-1, 1].
    Applies the diffusers unscaling z/σ + shift before the decoder."""
    z = latents.astype(jnp.float32) / cfg.scaling_factor
    if cfg.shift_factor:
        z = z + cfg.shift_factor
    x = z.astype(latents.dtype)
    if "post_quant_conv" in params:
        x = _conv(x, params["post_quant_conv"])
    d = params["decoder"]
    g = cfg.norm_num_groups
    x = _conv(x, d["conv_in"])
    x = _mid(x, d["mid"], g)
    for blk in d["up"]:
        for r in blk["res"]:
            x = _resnet(x, r, g)
        if "upconv" in blk:
            x = _conv(_upsample2x(x), blk["upconv"])
    x = _silu(_group_norm(x, d["norm_out"], g))
    return _conv(x, d["conv_out"]).astype(jnp.float32)


def kl_encode(params: Params, cfg: VAEKLConfig, images: jnp.ndarray,
              key=None, sample: bool = True) -> jnp.ndarray:
    """images [B, H, W, 3] in [-1,1] → DiT-space latents [B, h, w, z]
    (diagonal-gaussian sample, then (z − shift)·σ scaling)."""
    e = params["encoder"]
    g = cfg.norm_num_groups
    x = _conv(images, e["conv_in"])
    for blk in e["down"]:
        for r in blk["res"]:
            x = _resnet(x, r, g)
        if "downconv" in blk:
            # diffusers Downsample2D: asymmetric (0,1,0,1) pad, stride 2
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = _conv(x, blk["downconv"], stride=2, padding="VALID")
    x = _mid(x, e["mid"], g)
    x = _silu(_group_norm(x, e["norm_out"], g))
    moments = _conv(x, e["conv_out"])
    if "quant_conv" in params:
        moments = _conv(moments, params["quant_conv"])
    mean, logvar = jnp.split(moments.astype(jnp.float32), 2, axis=-1)
    if sample and key is not None:
        std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
        mean = mean + std * jax.random.normal(key, mean.shape, jnp.float32)
    z = mean
    if cfg.shift_factor:
        z = z - cfg.shift_factor
    return (z * cfg.scaling_factor).astype(images.dtype)


# ---------------------------------------------------------------------------
# init + checkpoint assignment
# ---------------------------------------------------------------------------


def _conv_slot(cin: int, cout: int, k: int, dtype) -> Params:
    return {"w": jnp.zeros((k, k, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _norm_slot(c: int, dtype) -> Params:
    return {"scale": jnp.ones((c,), dtype), "shift": jnp.zeros((c,), dtype)}


def _lin_slot(cin: int, cout: int, dtype) -> Params:
    return {"w": jnp.zeros((cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _resnet_slot(cin: int, cout: int, dtype) -> Params:
    p = {"norm1": _norm_slot(cin, dtype),
         "conv1": _conv_slot(cin, cout, 3, dtype),
         "norm2": _norm_slot(cout, dtype),
         "conv2": _conv_slot(cout, cout, 3, dtype)}
    if cin != cout:
        p["skip"] = _conv_slot(cin, cout, 1, dtype)
    return p


def _mid_slot(c: int, dtype, add_attention: bool) -> Params:
    p: Params = {"res": [_resnet_slot(c, c, dtype),
                         _resnet_slot(c, c, dtype)]}
    if add_attention:
        p["attn"] = {"norm": _norm_slot(c, dtype),
                     "q": _lin_slot(c, c, dtype),
                     "k": _lin_slot(c, c, dtype),
                     "v": _lin_slot(c, c, dtype),
                     "o": _lin_slot(c, c, dtype)}
    return p


def init_kl_params(cfg: VAEKLConfig, dtype=jnp.bfloat16) -> Params:
    boc = cfg.block_out_channels
    rboc = tuple(reversed(boc))
    dec: Params = {
        "conv_in": _conv_slot(cfg.latent_channels, rboc[0], 3, dtype),
        "mid": _mid_slot(rboc[0], dtype, cfg.mid_block_add_attention),
        "up": [],
        "norm_out": _norm_slot(rboc[-1], dtype),
        "conv_out": _conv_slot(rboc[-1], cfg.out_channels, 3, dtype),
    }
    prev = rboc[0]
    for i, c in enumerate(rboc):
        blk: Params = {"res": []}
        for j in range(cfg.layers_per_block + 1):
            blk["res"].append(_resnet_slot(prev if j == 0 else c, c,
                                           dtype))
        if i < len(rboc) - 1:
            blk["upconv"] = _conv_slot(c, c, 3, dtype)
        dec["up"].append(blk)
        prev = c
    enc: Params = {
        "conv_in": _conv_slot(cfg.in_channels, boc[0], 3, dtype),
        "down": [],
        "mid": _mid_slot(boc[-1], dtype, cfg.mid_block_add_attention),
        "norm_out": _norm_slot(boc[-1], dtype),
        "conv_out": _conv_slot(boc[-1], 2 * cfg.latent_channels, 3,
                               dtype),
    }
    prev = boc[0]
    for i, c in enumerate(boc):
        blk = {"res": []}
        for j in range(cfg.layers_per_block):
            blk["res"].append(_resnet_slot(prev if j == 0 else c, c,
                                           dtype))
        if i < len(boc) - 1:
            blk["downconv"] = _conv_slot(c, c, 3, dtype)
        enc["down"].append(blk)
        prev = c
    params: Params = {"decoder": dec, "encoder": enc}
    if cfg.use_quant_conv:
        params["quant_conv"] = _conv_slot(2 * cfg.latent_channels,
                                          2 * cfg.latent_channels, 1,
                                          dtype)
    if cfg.use_post_quant_conv:
        params["post_quant_conv"] = _conv_slot(cfg.latent_channels,
                                               cfg.latent_channels, 1,
                                               dtype)
    return params


_RES_MAP = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
            "conv2": "conv2", "conv_shortcut": "skip"}
_ATTN_MAP = {"group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v",
             "to_out.0": "o"}


def _put(slot: Params, kind: str, leaf: str, arr, dtype) -> bool:
    """kind: conv | norm | lin; leaf: weight | bias."""
    import numpy as np

    arr = np.asarray(arr)
    if kind == "norm":
        tgt = "scale" if leaf == "weight" else "shift"
    elif leaf == "bias":
        tgt = "b"
    else:
        tgt = "w"
        if kind == "conv":
            arr = arr.transpose(2, 3, 1, 0)  # [o,i,kh,kw] → HWIO
        else:
            arr = arr.T  # Linear [o,i] → [i,o]
    if tgt not in slot or tuple(slot[tgt].shape) != tuple(arr.shape):
        return False
    slot[tgt] = jnp.asarray(arr, dtype)
    return True


def _assign_resnet(blk: Params, rest: str, arr, dtype) -> bool:
    mod, leaf = rest.rsplit(".", 1)
    tgt = _RES_MAP.get(mod)
    if tgt is None:
        return False
    kind = "norm" if mod.startswith("norm") else "conv"
    return _put(blk[tgt] if tgt != "skip" else blk.setdefault(
        "skip", {"w": jnp.zeros(
            (1, 1, arr.shape[1], arr.shape[0]) if arr.ndim == 4
            else arr.shape, dtype),
            "b": jnp.zeros((arr.shape[0],), dtype)}),
        kind, leaf, arr, dtype)


def assign_kl_tensor(params: Params, name: str, arr: Any,
                     dtype=jnp.bfloat16) -> bool:
    """Map one diffusers AutoencoderKL tensor into the pytree. Returns
    False for names this VAE doesn't own (caller collects/reports)."""
    parts = name.split(".")
    if parts[0] in ("quant_conv", "post_quant_conv"):
        if parts[0] not in params:
            return False
        return _put(params[parts[0]], "conv", parts[1], arr, dtype)
    if parts[0] not in ("encoder", "decoder"):
        return False
    tree = params[parts[0]]
    rest = parts[1:]
    if rest[0] == "conv_in" or rest[0] == "conv_out":
        return _put(tree[rest[0]], "conv", rest[1], arr, dtype)
    if rest[0] == "conv_norm_out":
        return _put(tree["norm_out"], "norm", rest[1], arr, dtype)
    if rest[0] == "mid_block":
        if rest[1] == "resnets":
            return _assign_resnet(tree["mid"]["res"][int(rest[2])],
                                  ".".join(rest[3:]), arr, dtype)
        if rest[1] == "attentions" and "attn" in tree["mid"]:
            mod = ".".join(rest[3:-1])
            tgt = _ATTN_MAP.get(mod)
            if tgt is None:
                return False
            kind = "norm" if tgt == "norm" else "lin"
            return _put(tree["mid"]["attn"][tgt], kind, rest[-1], arr,
                        dtype)
        return False
    if rest[0] in ("up_blocks", "down_blocks"):
        side = "up" if rest[0] == "up_blocks" else "down"
        blk = tree[side][int(rest[1])]
        if rest[2] == "resnets":
            return _assign_resnet(blk["res"][int(rest[3])],
                                  ".".join(rest[4:]), arr, dtype)
        if rest[2] in ("upsamplers", "downsamplers"):
            key = "upconv" if side == "up" else "downconv"
            if key not in blk:
                return False
            return _put(blk[key], "conv", rest[-1], arr, dtype)
    return False
