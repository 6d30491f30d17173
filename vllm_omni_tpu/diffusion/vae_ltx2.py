"""AutoencoderKLLTX2Video — LTX-2 causal 3D video VAE decoder in JAX.

Reference parity: the reference pipeline decodes video latents through
diffusers' AutoencoderKLLTX2Video (models/ltx2/pipeline_ltx2.py:195,
decode at :1137 with optional timestep conditioning), denormalizing
per-channel with the checkpoint's latents_mean/latents_std buffers
(:1099 _denormalize_latents). The LTX2 latent-upsample second stage
re-encodes through the same class (pipeline_ltx2_latent_upsample.py).

Architecture spec (LTX-Video VAE lineage the LTX2 class extends):
* causal 3D convs: TIME padding replicates the first frame forward
  (frame t never sees t+1), spatial padding symmetric; checkpoints
  nest each kernel under `<name>.conv.*`;
* resnet: affine-free RMSNorm → [AdaLN] → swish → conv1 → RMSNorm →
  [AdaLN] → swish → conv2 (+1×1 conv shortcut on width change). With
  timestep conditioning each resnet owns `scale_shift_table` [4, C]
  added to the BLOCK's time embedding (4·C wide);
* per-block time embedder (mid + each up block): 256-dim sinusoidal
  [cos|sin] of t·1000 → linear → silu → linear to 4·C
  (PixArtAlphaCombinedTimestepSizeEmbeddings names:
  `time_embedder.timestep_embedder.linear_{1,2}`);
* upsampler: conv W_in → W_out·f³ → depth-to-space over (t, h, w) →
  drop the first (f−1) frames (keeps the causal "k·ratio+1" frame
  count); optional residual depth-to-space of the channel-repeated
  input;
* tail: affine-free RMSNorm (+ decoder-level `scale_shift_table`
  [2, C] with a 2·C time embedder when conditioned) → swish →
  conv_out → spatial unpatchify (patch_size, patch_size_t).

TPU-first: channels-last NDHWC (conv3d lowers to XLA
ConvGeneralDilated with lane-major channels), fp32 norm statistics,
one jitted decode per latent bucket.

Unsupported-config guards raise loudly (decoder_inject_noise) rather
than decode wrong. Numeric oracle: tests/diffusion/test_vae_ltx2.py
implements the same spec in torch with diffusers-layout tensor names.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

_DN = ("NDHWC", "DHWIO", "NDHWC")


@dataclass
class VAELTX2Config:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    decoder_block_out_channels: tuple = (256, 512, 1024)
    decoder_layers_per_block: tuple = (5, 5, 5, 5)
    decoder_spatio_temporal_scaling: tuple = (True, True, True)
    decoder_inject_noise: tuple = (False, False, False, False)
    upsample_residual: tuple = (True, True, True)
    upsample_factor: tuple = (2, 2, 2)
    timestep_conditioning: bool = False
    patch_size: int = 4
    patch_size_t: int = 1
    resnet_norm_eps: float = 1e-6
    scaling_factor: float = 1.0

    @property
    def spatial_ratio(self) -> int:
        r = self.patch_size
        for s, f in zip(self.decoder_spatio_temporal_scaling,
                        self.upsample_factor):
            if s:
                r *= int(f)
        return r

    @property
    def temporal_ratio(self) -> int:
        r = self.patch_size_t
        for s, f in zip(self.decoder_spatio_temporal_scaling,
                        self.upsample_factor):
            if s:
                r *= int(f)
        return r

    @property
    def widths(self) -> tuple:
        """Stage widths decoder-order: widest first."""
        return tuple(reversed(self.decoder_block_out_channels))

    @classmethod
    def from_json(cls, cfg: dict[str, Any]) -> "VAELTX2Config":
        keep = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in cfg.items() if k in keep}
        for k, v in list(kw.items()):
            if isinstance(v, list):
                kw[k] = tuple(v)
        return cls(**kw)


# ---------------------------------------------------------------------------
# ops (channels-last [B, F, H, W, C])
# ---------------------------------------------------------------------------


def _causal_conv3d(x: jnp.ndarray, p: Params,
                   stride=(1, 1, 1)) -> jnp.ndarray:
    kt, kh, kw = p["w"].shape[:3]
    if kt > 1:
        front = jnp.repeat(x[:, :1], kt - 1, axis=1)
        x = jnp.concatenate([front, x], axis=1)
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride,
        padding=[(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def _rms_norm_nf(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _sinusoidal(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """get_timestep_embedding(flip_sin_to_cos=True, shift=0): [cos|sin]."""
    half = dim // 2
    freqs = jnp.exp(
        -np.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _time_embed(p: Params, t: jnp.ndarray) -> jnp.ndarray:
    """t (σ units) → [B, dim_out] fp32; sinusoids taken at t·1000."""
    e = _sinusoidal(t * 1000.0, p["linear_1"]["w"].shape[0])
    e = e @ p["linear_1"]["w"].astype(jnp.float32) + \
        p["linear_1"]["b"].astype(jnp.float32)
    e = jax.nn.silu(e)
    return e @ p["linear_2"]["w"].astype(jnp.float32) + \
        p["linear_2"]["b"].astype(jnp.float32)


def _resnet(x: jnp.ndarray, p: Params, eps: float,
            temb: Optional[jnp.ndarray]) -> jnp.ndarray:
    """temb [B, 4C] — this BLOCK's time embedding (pre scale_shift)."""
    h = _rms_norm_nf(x, eps)
    mod = None
    if temb is not None and "scale_shift_table" in p:
        c = x.shape[-1]
        tab = p["scale_shift_table"].astype(jnp.float32)  # [4, C]
        mod = tab[None] + temb.reshape(-1, 4, c)
        h = (h.astype(jnp.float32) *
             (1.0 + mod[:, 1][:, None, None, None]) +
             mod[:, 0][:, None, None, None]).astype(x.dtype)
    h = _causal_conv3d(
        jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype), p["conv1"])
    h2 = _rms_norm_nf(h, eps)
    if mod is not None:
        h2 = (h2.astype(jnp.float32) *
              (1.0 + mod[:, 3][:, None, None, None]) +
              mod[:, 2][:, None, None, None]).astype(x.dtype)
    h2 = _causal_conv3d(
        jax.nn.silu(h2.astype(jnp.float32)).astype(x.dtype), p["conv2"])
    sc = _causal_conv3d(x, p["conv_shortcut"]) \
        if "conv_shortcut" in p else x
    return sc + h2


def _depth_to_space(x: jnp.ndarray, st: int, sh: int,
                    sw: int) -> jnp.ndarray:
    """Channel unroll matches torch NCDHW reshape(B, C', st, sh, sw):
    the output channel is the SLOWEST group of the packed dim."""
    b, f, h, w, c = x.shape
    co = c // (st * sh * sw)
    x = x.reshape(b, f, h, w, co, st, sh, sw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, f * st, h * sh, w * sw, co)


def _upsampler(x: jnp.ndarray, p: Params, f: int,
               residual: bool) -> jnp.ndarray:
    out = _causal_conv3d(x, p)
    out = _depth_to_space(out, f, f, f)
    if residual:
        # shuffle the INPUT first, then channel-tile up to the output
        # width (LTXVideoUpsampler3d residual: pixel-shuffle →
        # .repeat(1, f³/upscale, 1, 1, 1))
        res = _depth_to_space(x, f, f, f)
        rep = out.shape[-1] // res.shape[-1]
        res = jnp.tile(res, (1, 1, 1, 1, rep))
        out = out + res
    if f > 1:
        out = out[:, f - 1:]
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def ltx2_vae_decode(params: Params, cfg: VAELTX2Config,
                    latents: jnp.ndarray,
                    timestep: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """latents [B, F, H, W, C_lat] channels-last, ALREADY denormalized
    (denormalize_ltx2_latents) → video [B, F', H·r, W·r, 3] in [-1, 1]
    with F' = (F−1)·temporal_ratio + 1 (patch_size_t=1)."""
    dec = params["decoder"]
    if cfg.timestep_conditioning and timestep is None:
        timestep = jnp.zeros((latents.shape[0],), jnp.float32)
    x = _causal_conv3d(latents, dec["conv_in"])
    mid_t = _time_embed(dec["mid_time_embedder"], timestep) \
        if cfg.timestep_conditioning else None
    for r in dec["mid_resnets"]:
        x = _resnet(x, r, cfg.resnet_norm_eps, mid_t)
    for i, blk in enumerate(dec["up_blocks"]):
        if "upsampler" in blk:
            x = _upsampler(x, blk["upsampler"],
                           int(cfg.upsample_factor[i]),
                           bool(cfg.upsample_residual[i]))
        blk_t = _time_embed(blk["time_embedder"], timestep) \
            if cfg.timestep_conditioning else None
        for r in blk["resnets"]:
            x = _resnet(x, r, cfg.resnet_norm_eps, blk_t)
    h = _rms_norm_nf(x, cfg.resnet_norm_eps)
    if cfg.timestep_conditioning:
        c = x.shape[-1]
        tail = _time_embed(dec["time_embedder"], timestep)  # [B, 2C]
        m = dec["scale_shift_table"].astype(jnp.float32)[None] + \
            tail.reshape(-1, 2, c)
        h = (h.astype(jnp.float32) *
             (1.0 + m[:, 1][:, None, None, None]) +
             m[:, 0][:, None, None, None]).astype(x.dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    out = _causal_conv3d(h, dec["conv_out"])
    p, pt = cfg.patch_size, cfg.patch_size_t
    if p > 1 or pt > 1:
        out = _depth_to_space(out, pt, p, p)
    return out


def denormalize_ltx2_latents(latents: jnp.ndarray, params: Params,
                             scaling_factor: float) -> jnp.ndarray:
    """latents · std / scaling_factor + mean per channel (reference
    pipeline_ltx2.py:514 _denormalize_latents; mean/std are checkpoint
    buffers)."""
    mean = params["latents_mean"].astype(jnp.float32)
    std = params["latents_std"].astype(jnp.float32)
    return (latents.astype(jnp.float32) * std / scaling_factor +
            mean).astype(latents.dtype)


# ---------------------------------------------------------------------------
# LTX2 latent upsampler (the two-stage pipeline's REAL second model —
# reference pipeline_ltx2_latent_upsample.py LTX2LatentUpsamplerModel,
# consumed by LTX2TwoStagesPipeline: stage-1 latents upsample ×2
# spatially before the 3-step distilled refinement pass,
# pipeline_ltx2.py:1258-1304)
# ---------------------------------------------------------------------------


@dataclass
class LTX2UpsamplerConfig:
    in_channels: int = 128
    mid_channels: int = 512
    num_blocks_per_stage: int = 4
    spatial_upsample: bool = True
    temporal_upsample: bool = False

    @classmethod
    def from_json(cls, cfg: dict[str, Any]) -> "LTX2UpsamplerConfig":
        keep = set(cls.__dataclass_fields__)
        return cls(**{k: v for k, v in cfg.items() if k in keep})


def _group_norm(x: jnp.ndarray, p: Params, groups: int = 32,
                eps: float = 1e-5) -> jnp.ndarray:
    b = x.shape[0]
    c = x.shape[-1]
    g = min(groups, c)
    spatial = x.shape[1:-1]
    xf = x.astype(jnp.float32).reshape(b, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, *spatial, c)
    return (xf * p["scale"].astype(jnp.float32) +
            p["shift"].astype(jnp.float32)).astype(x.dtype)


def _conv3d_same(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Plain (non-causal) 3³ conv, symmetric replicate-free zero pad."""
    kt, kh, kw = p["w"].shape[:3]
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(kt // 2, kt // 2), (kh // 2, kh // 2),
                 (kw // 2, kw // 2)],
        dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


def _up_resblock(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    h = _conv3d_same(x, p["conv1"])
    h = jax.nn.silu(_group_norm(h, p["norm1"]).astype(jnp.float32)
                    ).astype(x.dtype)
    h = _conv3d_same(h, p["conv2"])
    h = _group_norm(h, p["norm2"])
    return x + h


def ltx2_latent_upsample(params: Params, cfg: LTX2UpsamplerConfig,
                         latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B, F, H, W, C] (UNnormalized — reference
    pipeline_ltx2_latent_upsample.py:97 'operates on the unnormalized
    latents') → [B, F, 2H, 2W, C] (spatial ×2; temporal_upsample adds
    the time axis when enabled)."""
    x = _conv3d_same(latents, params["initial_conv"])
    x = jax.nn.silu(_group_norm(x, params["initial_norm"]).astype(
        jnp.float32)).astype(latents.dtype)
    for r in params["res_blocks"]:
        x = _up_resblock(x, r)
    if cfg.temporal_upsample:
        x = _conv3d_same(x, params["upsampler"])
        x = _depth_to_space(x, 2, 2, 2)
        x = x[:, 1:]
    elif cfg.spatial_upsample:
        x = _conv3d_same(x, params["upsampler"])
        x = _depth_to_space(x, 1, 2, 2)
    for r in params["post_upsample_res_blocks"]:
        x = _up_resblock(x, r)
    return _conv3d_same(x, params["final_conv"])


def init_ltx2_upsampler_params(cfg: LTX2UpsamplerConfig,
                               dtype=jnp.bfloat16) -> Params:
    def conv(cin, cout, k=3):
        return {"w": jnp.zeros((k, k, k, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def norm(c):
        return {"scale": jnp.ones((c,), dtype),
                "shift": jnp.zeros((c,), dtype)}

    def res(c):
        return {"conv1": conv(c, c), "norm1": norm(c),
                "conv2": conv(c, c), "norm2": norm(c)}

    m = cfg.mid_channels
    factor = 8 if cfg.temporal_upsample else 4
    return {
        "initial_conv": conv(cfg.in_channels, m),
        "initial_norm": norm(m),
        "res_blocks": [res(m) for _ in range(cfg.num_blocks_per_stage)],
        "upsampler": conv(m, m * factor),
        "post_upsample_res_blocks": [
            res(m) for _ in range(cfg.num_blocks_per_stage)],
        "final_conv": conv(m, cfg.in_channels),
    }


def assign_ltx2_upsampler_tensor(params: Params, name: str, value,
                                 dtype) -> bool:
    v = np.asarray(value)
    parts = name.split(".")

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

    if parts[0] in ("initial_conv", "final_conv"):
        return put_conv(params[parts[0]], parts[-1])
    if parts[0] == "initial_norm":
        return put_norm(params["initial_norm"], parts[-1])
    if parts[0] == "upsampler":
        # Sequential: upsampler.0 = the pre-shuffle conv
        return put_conv(params["upsampler"], parts[-1])
    if parts[0] in ("res_blocks", "post_upsample_res_blocks"):
        i = int(parts[1])
        if i >= len(params[parts[0]]):
            return False
        r = params[parts[0]][i]
        if parts[2] in ("conv1", "conv2"):
            return put_conv(r[parts[2]], parts[-1])
        if parts[2] in ("norm1", "norm2"):
            return put_norm(r[parts[2]], parts[-1])
    return False


# ---------------------------------------------------------------------------
# init + tensor mapping
# ---------------------------------------------------------------------------


def init_ltx2_vae_params(cfg: VAELTX2Config,
                         dtype=jnp.bfloat16) -> Params:
    """Zero-init decoder skeleton sized from the config; weights must
    come from a checkpoint (random video decode stays the generic
    tier's job)."""
    if any(cfg.decoder_inject_noise):
        raise NotImplementedError(
            "decoder_inject_noise not supported; refusing to decode "
            "approximately")

    def conv(k, cin, cout):
        return {"w": jnp.zeros((k, k, k, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def embedder(cout):
        return {"linear_1": {"w": jnp.zeros((256, cout), dtype),
                             "b": jnp.zeros((cout,), dtype)},
                "linear_2": {"w": jnp.zeros((cout, cout), dtype),
                             "b": jnp.zeros((cout,), dtype)}}

    def resnet(c):
        r = {"conv1": conv(3, c, c), "conv2": conv(3, c, c)}
        if cfg.timestep_conditioning:
            r["scale_shift_table"] = jnp.zeros((4, c), dtype)
        return r

    widths = cfg.widths
    lpb = cfg.decoder_layers_per_block
    dec: Params = {
        "conv_in": conv(3, cfg.latent_channels, widths[0]),
        "mid_resnets": [resnet(widths[0]) for _ in range(lpb[0])],
        "up_blocks": [],
        "conv_out": conv(3, widths[-1],
                         cfg.out_channels * cfg.patch_size ** 2 *
                         cfg.patch_size_t),
    }
    if cfg.timestep_conditioning:
        dec["mid_time_embedder"] = embedder(4 * widths[0])
        dec["time_embedder"] = embedder(2 * widths[-1])
        dec["scale_shift_table"] = jnp.zeros((2, widths[-1]), dtype)
    for i, scaling in enumerate(cfg.decoder_spatio_temporal_scaling):
        cin = widths[i]
        cout = widths[min(i + 1, len(widths) - 1)]
        blk: Params = {"resnets": [resnet(cout)
                                   for _ in range(lpb[i + 1])]}
        if scaling:
            f = int(cfg.upsample_factor[i])
            blk["upsampler"] = conv(3, cin, cout * f * f * f)
        if cfg.timestep_conditioning:
            blk["time_embedder"] = embedder(4 * cout)
        dec["up_blocks"].append(blk)
    return {"decoder": dec,
            "latents_mean": jnp.zeros((cfg.latent_channels,), dtype),
            "latents_std": jnp.ones((cfg.latent_channels,), dtype)}


def assign_ltx2_vae_tensor(params: Params, name: str, value,
                           dtype) -> bool:
    """diffusers tensor name → slot. Causal-conv kernels nest under
    `<name>.conv.*`; torch conv3d [out, in, kt, kh, kw] lands
    [kt, kh, kw, in, out]; linear [out, in] lands [in, out]."""
    v = np.asarray(value)

    def put_conv(slot: dict, leaf: str) -> bool:
        if leaf == "weight":
            slot["w"] = jnp.asarray(v.transpose(2, 3, 4, 1, 0), dtype)
        elif leaf == "bias":
            slot["b"] = jnp.asarray(v, dtype)
        else:
            return False
        return True

    def put_embedder(emb, rest: list) -> bool:
        if emb is None:  # config says no timestep conditioning —
            return False  # surplus embedder tensors log as unmapped
        sub = [p for p in rest if p not in ("timestep_embedder", "emb")]
        if sub and sub[0] in ("linear_1", "linear_2"):
            tgt = emb[sub[0]]
            if sub[-1] == "weight":
                tgt["w"] = jnp.asarray(v.T, dtype)
            elif sub[-1] == "bias":
                tgt["b"] = jnp.asarray(v, dtype)
            else:
                return False
            return True
        return False

    def resnet_slot(r: dict, rest: list) -> bool:
        if rest[0] in ("conv1", "conv2", "conv_shortcut"):
            if rest[0] == "conv_shortcut" and "conv_shortcut" not in r:
                return False
            return put_conv(r[rest[0]], rest[-1])
        if rest[0] == "scale_shift_table":
            if "scale_shift_table" not in r:
                return False
            r["scale_shift_table"] = jnp.asarray(v, dtype)
            return True
        return False

    if name in ("latents_mean", "latents_std"):
        params[name] = jnp.asarray(v.reshape(-1), dtype)
        return True
    parts = name.split(".")
    if parts[0] != "decoder":
        return False  # encoder wired separately if/when i2v needs it
    parts = parts[1:]
    dec = params["decoder"]
    if parts[0] == "conv_in":
        return put_conv(dec["conv_in"], parts[-1])
    if parts[0] == "conv_out":
        return put_conv(dec["conv_out"], parts[-1])
    if parts[0] == "scale_shift_table":
        if "scale_shift_table" not in dec:
            return False
        dec["scale_shift_table"] = jnp.asarray(v, dtype)
        return True
    if parts[0] == "time_embedder":
        return put_embedder(dec.get("time_embedder"), parts[1:])
    if parts[0] == "mid_block":
        if parts[1] == "resnets":
            i = int(parts[2])
            if i >= len(dec["mid_resnets"]):
                return False
            return resnet_slot(dec["mid_resnets"][i], parts[3:])
        if parts[1] == "time_embedder":
            return put_embedder(dec.get("mid_time_embedder"), parts[2:])
        return False
    if parts[0] == "up_blocks":
        i = int(parts[1])
        if i >= len(dec["up_blocks"]):
            return False
        blk = dec["up_blocks"][i]
        rest = parts[2:]
        if rest[0] == "upsamplers":
            if "upsampler" not in blk:
                return False
            return put_conv(blk["upsampler"], rest[-1])
        if rest[0] == "time_embedder":
            return put_embedder(blk.get("time_embedder"), rest[1:])
        if rest[0] == "resnets":
            j = int(rest[1])
            if j >= len(blk["resnets"]):
                return False
            return resnet_slot(blk["resnets"][j], rest[2:])
        return False
    return False
