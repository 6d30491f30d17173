"""HunyuanImage3: unified AR+diffusion MoE transformer (text-to-image).

Reference: /root/reference/vllm_omni/diffusion/models/hunyuan_image3/
(6,310 LoC — the reference's largest diffusion family). The model is a
HunYuan MoE *decoder* (the same backbone this repo already loads for the
AR side, models/weights.py `HunYuanMoEV1ForCausalLM`) that denoises an
image inside its token stream: the t2i sequence is
``[bos, text…, <boi>, <ratio>, <timestep>, <img>×N, <eoi>(=last)]``
where the N ``<img>`` positions carry UNet-patch-embedded latents
conditioned on the flow time, the ``<timestep>`` position carries a
timestep embedding, text attends causally, the image block attends
fully to itself (pipeline_hunyuan_image3.py
_prepare_attention_mask_for_generation), image positions use a centered
2D RoPE (hunyuan_image3_transformer.py build_2d_rope:249) and the
velocity is read back from the image positions through a UNet upsampler
(ragged_final_layer).

TPU-first design — two jitted programs instead of the reference's
HF-generate loop with an in-layer ImageKVCacheManager
(hunyuan_image3_transformer.py:845):

* ``hi3_forward_first``: one forward over the full static stream;
  returns the velocity AND the per-layer text-prefix K/V stacked as
  ``[L, B, T_text, hkv, d]`` (the reference caches text K/V inside each
  attention module; here the cache is an explicit jit output so the
  denoise loop stays functional).
* ``hi3_forward_step``: steps 2..n run only ``[<timestep>, <img>×N]``
  rows against the cached text K/V — exactly the reference's
  ``first_step=False`` path (forward_call: cat([timestep_emb,
  image_emb])). The trailing <eoi> token is masked out of every later
  step in the reference (model.forward asserts it is never attended),
  so it is simply not cached here.

Numerics follow the reference module order: RoPE is applied BEFORE the
per-head qk RMSNorm (HunYuanAttention.forward — note this is the
opposite order from the qwen-class blocks in models/decoder.py), rope
runs in float32 and casts back to bf16, and the MoE block is softmax
top-k routing with renorm plus an always-on GATED shared MLP
(HunYuanSparseMoeBlock with HunYuanMLP shared_mlp).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import (DecoderConfig, _dense_mlp,
                                          _moe_mlp, linear, rms_norm)

logger = init_logger(__name__)

Params = dict


@dataclass
class HI3Config:
    """Geometry of one HunyuanImage3 checkpoint (root config.json — the
    VAE config is EMBEDDED under its ``vae`` key, reference
    pipeline_hunyuan_image3.py:99 AutoencoderKLConv3D.from_config)."""

    decoder: DecoderConfig
    patch_size: int = 1
    patch_embed_hidden_dim: int = 1024
    vae_latent_channels: int = 32
    vae_downsample: int = 16  # spatial pixels per latent
    vae_scaling_factor: float = 1.0
    vae_shift_factor: float = 0.0
    rope_theta: float = 10000.0
    moe_layer_num_skipped: int = 0
    # special token ids (generation_config / tokenizer special map;
    # only their *positions* matter to the math)
    bos_token_id: int = 1
    eos_token_id: int = 2
    pad_token_id: int = 0
    boi_token_id: int = 4
    eoi_token_id: int = 5
    image_token_id: int = 6
    timestep_token_id: int = 7
    freq_size: int = 256  # TimestepEmbedder frequency_embedding_size

    @classmethod
    def from_json(cls, hf: dict) -> "HI3Config":
        from vllm_omni_tpu.models.weights import hf_config_to_decoder_config

        dec = hf_config_to_decoder_config(
            dict(hf, architectures=["HunYuanMoEV1ForCausalLM"]))
        vae = hf.get("vae") or {}
        # downsample = product of spatial stride factors; HunyuanImage3's
        # conv3d VAE uses ffactor_spatial (16 for the released model)
        down = vae.get("ffactor_spatial") or vae.get(
            "spatial_compression_ratio") or 16
        special = hf.get("special_token_ids") or {}
        return cls(
            decoder=dec,
            patch_size=hf.get("patch_size", 1),
            patch_embed_hidden_dim=hf.get("patch_embed_hidden_dim", 1024),
            vae_latent_channels=vae.get("latent_channels", 32),
            vae_downsample=int(down),
            vae_scaling_factor=vae.get("scaling_factor", 1.0) or 1.0,
            vae_shift_factor=vae.get("shift_factor", 0.0) or 0.0,
            rope_theta=hf.get("rope_theta", 10000.0),
            moe_layer_num_skipped=hf.get("moe_layer_num_skipped", 0),
            bos_token_id=hf.get("bos_token_id", 1),
            eos_token_id=hf.get("eos_token_id", 2),
            pad_token_id=hf.get("pad_token_id", 0) or 0,
            boi_token_id=special.get("boi", hf.get("boi_token_id", 4)),
            eoi_token_id=special.get("eoi", hf.get("eoi_token_id", 5)),
            image_token_id=special.get("image",
                                       hf.get("image_token_id", 6)),
            timestep_token_id=special.get(
                "timestep", hf.get("timestep_token_id", 7)),
        )


# ---------------------------------------------------------------------------
# small modules: TimestepEmbedder, ResBlock, UNetDown/Up (patch_size=1)
# ---------------------------------------------------------------------------


def timestep_sinusoid(t: jnp.ndarray, dim: int,
                      max_period: float = 10000.0) -> jnp.ndarray:
    """[B] → [B, dim] (reference timestep_embedding: cos|sin halves)."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def tembed_apply(p: Params, t: jnp.ndarray, freq_size: int
                 ) -> jnp.ndarray:
    """TimestepEmbedder: sinusoid → Linear → GELU → Linear."""
    h = linear(timestep_sinusoid(t, freq_size).astype(p["l1"]["w"].dtype),
               p["l1"])
    return linear(jax.nn.gelu(h.astype(jnp.float32),
                              approximate=False).astype(h.dtype), p["l2"])


def _group_norm(x: jnp.ndarray, p: Params, groups: int = 32,
                eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm over channels, NHWC (reference normalization():180 =
    nn.GroupNorm(32, C))."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, h, w, c)
    return (xf * p["scale"].astype(jnp.float32) +
            p["shift"].astype(jnp.float32)).astype(x.dtype)


def _conv3x3(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """NHWC 3x3 same conv; weights stored HWIO."""
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), p["w"].astype(jnp.float32), (1, 1),
        "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (out + p["b"].astype(jnp.float32)).astype(x.dtype)


def _conv1x1(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    out = jnp.einsum("bhwc,co->bhwo", x.astype(jnp.float32),
                     p["w"].astype(jnp.float32))
    return (out + p["b"].astype(jnp.float32)).astype(x.dtype)


def resblock_apply(p: Params, x: jnp.ndarray, emb: jnp.ndarray
                   ) -> jnp.ndarray:
    """Reference ResBlock (:2931): GN→SiLU→conv, adaptive GN with
    (1+scale, shift) from SiLU(Linear(emb)), GN→SiLU→zero-conv,
    + skip (1x1 conv when channels change)."""
    h = _group_norm(x, p["in_norm"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _conv3x3(h, p["in_conv"])
    eo = linear(jax.nn.silu(emb.astype(jnp.float32)).astype(emb.dtype),
                p["emb"])  # [B, 2*out]
    c = h.shape[-1]
    scale, shift = eo[:, :c], eo[:, c:]
    h = _group_norm(h, p["out_norm"])
    h = (h.astype(jnp.float32) *
         (1.0 + scale.astype(jnp.float32))[:, None, None, :] +
         shift.astype(jnp.float32)[:, None, None, :]).astype(x.dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _conv3x3(h, p["out_conv"])
    skip = x
    if "skip" in p:
        skip = _conv1x1(x, p["skip"])
    return skip + h


def unet_down(p: Params, lat: jnp.ndarray, temb: jnp.ndarray
              ) -> jnp.ndarray:
    """latents [B, h, w, C] → image tokens [B, h*w, hidden] (UNetDown
    :3024, patch_size=1: conv3x3 then one ResBlock)."""
    x = _conv3x3(lat, p["conv_in"])
    x = resblock_apply(p["res"], x, temb)
    b, h, w, c = x.shape
    return x.reshape(b, h * w, c)


def unet_up(p: Params, tokens: jnp.ndarray, temb: jnp.ndarray,
            h_tok: int, w_tok: int) -> jnp.ndarray:
    """image hidden [B, N, D] → velocity [B, h, w, C_latent] (UNetUp
    :3077 with out_norm: ResBlock then GN→SiLU→conv3x3)."""
    b, n, d = tokens.shape
    x = tokens.reshape(b, h_tok, w_tok, d)
    x = resblock_apply(p["res"], x, temb)
    x = _group_norm(x, p["out_norm"])
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    return _conv3x3(x, p["out_conv"])


# ---------------------------------------------------------------------------
# 2D RoPE (build_2d_rope :249) — frequencies alternate (y, x)
# ---------------------------------------------------------------------------


def hi3_rope(cfg: HI3Config, pre_len: int, h_tok: int, w_tok: int,
             tail_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [S, d/2] for ``[pre, img(h×w), tail]`` where ``pre``
    covers everything before the image block (prompt + <timestep>).
    Pre/tail positions are sequential (y == x); image positions form a
    centered grid starting at the image's sequence offset L: beta_y =
    L + (w·h − h)/2, beta_x = L + (w·h − w)/2."""
    d = cfg.decoder.head_dim
    theta = 1.0 / (cfg.rope_theta ** (
        np.arange(0, d, 2, dtype=np.float32) / d))  # [d/2]
    theta = theta.reshape(-1, 2)  # [(d/4), (y,x)]
    L = pre_len
    n = h_tok * w_tok
    y = [np.arange(L, dtype=np.float32)]
    x = [np.arange(L, dtype=np.float32)]
    beta_y = L + (n - h_tok) / 2.0
    beta_x = L + (n - w_tok) / 2.0
    gy = np.linspace(beta_y, beta_y + h_tok, h_tok + 1,
                     dtype=np.float32)[:h_tok]
    gx = np.linspace(beta_x, beta_x + w_tok, w_tok + 1,
                     dtype=np.float32)[:w_tok]
    grid = np.meshgrid(gy, gx, indexing="ij")
    y.append(grid[0].reshape(-1))
    x.append(grid[1].reshape(-1))
    y.append(np.arange(L + n, L + n + tail_len, dtype=np.float32))
    x.append(np.arange(L + n, L + n + tail_len, dtype=np.float32))
    pos = np.stack([np.concatenate(y), np.concatenate(x)],
                   axis=1)  # [S, 2]
    idx = (pos[:, None, :] * theta[None]).reshape(pos.shape[0], -1)
    return jnp.asarray(np.cos(idx)), jnp.asarray(np.sin(idx))


def _apply_rope_neox(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
                     ) -> jnp.ndarray:
    """x [B, T, H, D], cos/sin [T, D/2] — NeoX half rotation in f32
    (reference HunYuanRotary2DEmbedder: rope in float32 → bf16)."""
    xf = x.astype(jnp.float32)
    c = jnp.concatenate([cos, cos], axis=-1)[None, :, None, :]
    s = jnp.concatenate([sin, sin], axis=-1)[None, :, None, :]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


# ---------------------------------------------------------------------------
# transformer core (mixed causal/full attention over the stream)
# ---------------------------------------------------------------------------


def _hi3_attention(layer: Params, cfg: HI3Config, x: jnp.ndarray,
                   cos: jnp.ndarray, sin: jnp.ndarray,
                   mask: jnp.ndarray,
                   kv_prefix: Optional[tuple] = None,
                   want_kv: bool = False, mesh=None):
    """One attention block. mask [B, Tq, Tk] bool (True = attend).
    kv_prefix: optional cached (k, v) [B, Tc, hkv, d] prepended to this
    call's keys. Returns (out, (k, v) of THIS call's rows | None)."""
    dec = cfg.decoder
    b, t, _ = x.shape
    d = dec.head_dim
    q = linear(x, layer["q_proj"]).reshape(b, t, dec.num_heads, d)
    k = linear(x, layer["k_proj"]).reshape(b, t, dec.num_kv_heads, d)
    v = linear(x, layer["v_proj"]).reshape(b, t, dec.num_kv_heads, d)
    # reference order: rope FIRST, per-head RMSNorm AFTER
    # (HunYuanAttention.forward :1652)
    q = _apply_rope_neox(q, cos, sin)
    k = _apply_rope_neox(k, cos, sin)
    if dec.qk_norm:
        q = rms_norm(q, layer["q_norm"], dec.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], dec.rms_norm_eps)
    new_kv = (k, v) if want_kv else None
    if kv_prefix is not None:
        k = jnp.concatenate([kv_prefix[0].astype(k.dtype), k], axis=1)
        v = jnp.concatenate([kv_prefix[1].astype(v.dtype), v], axis=1)
    g = dec.num_heads // dec.num_kv_heads
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        kr.astype(jnp.float32)) * (d ** -0.5)
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(vr.dtype), vr)
    out = linear(o.reshape(b, t, dec.num_heads * d), layer["o_proj"])
    return out, new_kv


def _hi3_blocks(params: Params, cfg: HI3Config, x: jnp.ndarray,
                cos: jnp.ndarray, sin: jnp.ndarray, mask: jnp.ndarray,
                kv_prefix: Optional[list] = None,
                want_kv: bool = False, kv_slice=None, mesh=None):
    """Run all decoder layers. kv_prefix: per-layer cached (k, v) list.
    want_kv + kv_slice (start, length): collect k/v rows of that slice
    per layer. Returns (hidden_normed, collected_kv | None)."""
    dec = cfg.decoder
    collected = [] if want_kv else None
    for i, layer in enumerate(params["layers"]):
        h = rms_norm(x, layer["input_norm"], dec.rms_norm_eps)
        att, kv = _hi3_attention(
            layer, cfg, h, cos, sin, mask,
            kv_prefix=kv_prefix[i] if kv_prefix is not None else None,
            want_kv=want_kv, mesh=mesh)
        if want_kv:
            s0, sl = kv_slice
            collected.append((
                jax.lax.dynamic_slice_in_dim(kv[0], s0, sl, axis=1),
                jax.lax.dynamic_slice_in_dim(kv[1], s0, sl, axis=1)))
        x = x + att
        h = rms_norm(x, layer["post_norm"], dec.rms_norm_eps)
        if dec.is_moe and i >= cfg.moe_layer_num_skipped:
            mlp_out = _moe_mlp(layer, dec, h)
        else:
            mlp_out = _dense_mlp(layer, h)
        x = x + mlp_out
    x = rms_norm(x, params["final_norm"], dec.rms_norm_eps)
    return x, collected


def hi3_first_step_mask(prompt_len: int, n_img: int, tail_len: int,
                        valid: Optional[np.ndarray] = None
                        ) -> np.ndarray:
    """[B, S, S] bool: causal + full attention inside the image block
    (reference _prepare_attention_mask_for_generation:655 — image slice
    EXCLUDES the <timestep> token). valid [B, S]: False = padding row
    (masked out as key)."""
    s = prompt_len + 1 + n_img + tail_len
    m = np.tril(np.ones((s, s), bool))
    i0 = prompt_len + 1
    m[i0:i0 + n_img, i0:i0 + n_img] = True
    if valid is None:
        return m[None]
    out = np.repeat(m[None], valid.shape[0], axis=0)
    out &= valid[:, None, :]
    return out


def hi3_step_mask(prompt_len: int, n_img: int,
                  valid: Optional[np.ndarray] = None) -> np.ndarray:
    """[B, 1+N, Tc+1+N] for later steps: query rows = [<timestep>,
    img×N]; keys = [cached text (Tc=prompt_len), timestep, img×N].
    Timestep attends text+itself; image rows attend everything except
    nothing (full over text+timestep+img)."""
    tq = 1 + n_img
    tk = prompt_len + tq
    m = np.ones((tq, tk), bool)
    m[0, prompt_len + 1:] = False  # timestep row: not the image block
    if valid is None:
        return m[None]
    out = np.repeat(m[None], valid.shape[0], axis=0)
    out &= valid[:, None, :prompt_len + tq]
    return out


def hi3_forward_first(params: Params, cfg: HI3Config,
                      ids: jnp.ndarray, latents: jnp.ndarray,
                      t: jnp.ndarray, mask: jnp.ndarray,
                      cos: jnp.ndarray, sin: jnp.ndarray,
                      prompt_len: int, h_tok: int, w_tok: int,
                      mesh=None):
    """First denoise step over the full stream.

    ids [B, S] with the image block at [prompt_len+1, prompt_len+1+N)
    and <timestep> at prompt_len. latents [B, h, w, C]. t [B] flow time
    in TRAIN units (σ·1000, reference scheduler timesteps). Returns
    (velocity [B, h, w, C], text_kv: list per layer of (k, v)
    [B, prompt_len, hkv, d])."""
    n = h_tok * w_tok
    x = jnp.take(params["embed"], ids, axis=0)
    t_emb = tembed_apply(params["time_embed"], t, cfg.freq_size)
    img_tokens = unet_down(params["patch_embed"], latents, t_emb)
    x = jax.lax.dynamic_update_slice_in_dim(
        x, img_tokens.astype(x.dtype), prompt_len + 1, axis=1)
    ts_tok = tembed_apply(params["timestep_emb"], t, cfg.freq_size)
    x = jax.lax.dynamic_update_slice_in_dim(
        x, ts_tok[:, None].astype(x.dtype), prompt_len, axis=1)
    hidden, text_kv = _hi3_blocks(params, cfg, x, cos, sin, mask,
                                  want_kv=True,
                                  kv_slice=(0, prompt_len), mesh=mesh)
    img_h = jax.lax.dynamic_slice_in_dim(hidden, prompt_len + 1, n,
                                         axis=1)
    t_emb2 = tembed_apply(params["time_embed_2"], t, cfg.freq_size)
    vel = unet_up(params["final_layer"], img_h, t_emb2, h_tok, w_tok)
    return vel, text_kv


def hi3_forward_step(params: Params, cfg: HI3Config, text_kv: list,
                     latents: jnp.ndarray, t: jnp.ndarray,
                     mask: jnp.ndarray, cos: jnp.ndarray,
                     sin: jnp.ndarray, h_tok: int, w_tok: int,
                     mesh=None):
    """Steps 2..n: only [<timestep>, img×N] rows, cached text K/V
    (reference forward_call else-branch: cat([timestep_emb, image_emb])
    + ImageKVCacheManager._update_image_kv_caches)."""
    t_emb = tembed_apply(params["time_embed"], t, cfg.freq_size)
    img_tokens = unet_down(params["patch_embed"], latents, t_emb)
    ts_tok = tembed_apply(params["timestep_emb"], t, cfg.freq_size)
    x = jnp.concatenate([ts_tok[:, None].astype(img_tokens.dtype),
                         img_tokens], axis=1)
    hidden, _ = _hi3_blocks(params, cfg, x, cos, sin, mask,
                            kv_prefix=text_kv, mesh=mesh)
    t_emb2 = tembed_apply(params["time_embed_2"], t, cfg.freq_size)
    return unet_up(params["final_layer"], hidden[:, 1:], t_emb2,
                   h_tok, w_tok)


# ---------------------------------------------------------------------------
# params: init + checkpoint tensor mapping
# ---------------------------------------------------------------------------


def _lin_init(cin: int, cout: int, dtype, bias: bool = True) -> Params:
    p = {"w": jnp.zeros((cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _conv_init(cin: int, cout: int, k: int, dtype) -> Params:
    if k == 1:
        return {"w": jnp.zeros((cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}
    return {"w": jnp.zeros((k, k, cin, cout), dtype),
            "b": jnp.zeros((cout,), dtype)}


def _norm_init(c: int, dtype) -> Params:
    return {"scale": jnp.ones((c,), dtype),
            "shift": jnp.zeros((c,), dtype)}


def _resblock_init(cin: int, cout: int, emb: int, dtype) -> Params:
    p = {"in_norm": _norm_init(cin, dtype),
         "in_conv": _conv_init(cin, cout, 3, dtype),
         "emb": _lin_init(emb, 2 * cout, dtype),
         "out_norm": _norm_init(cout, dtype),
         "out_conv": _conv_init(cout, cout, 3, dtype)}
    if cin != cout:
        p["skip"] = _conv_init(cin, cout, 1, dtype)
    return p


def _tembed_init(hidden: int, out: int, freq: int, dtype) -> Params:
    return {"l1": _lin_init(freq, hidden, dtype),
            "l2": _lin_init(hidden, out, dtype)}


def init_hi3_params(cfg: HI3Config, dtype=jnp.bfloat16) -> Params:
    """Pytree skeleton; backbone tensors stream in incrementally via
    assign_hi3_tensor → models/weights._assign (same layout the AR
    loader builds: q/k/v/o, router, experts stacks, gated shared_mlp);
    the image modules are pre-shaped here."""
    params: Params = {"layers": [dict() for _ in
                                 range(cfg.decoder.num_layers)]}
    hs = cfg.decoder.hidden_size
    hc = cfg.patch_embed_hidden_dim
    lc = cfg.vae_latent_channels
    fq = cfg.freq_size
    if cfg.patch_size != 1:
        raise ValueError(
            "hunyuan_image3 patch_size>1 uses resampling ResBlocks the "
            "released checkpoint does not exercise (reference ResBlock "
            ":2983 h_upd/x_upd are Identity); only patch_size=1 is wired")
    params["patch_embed"] = {
        "conv_in": _conv_init(lc, hc, 3, dtype),
        "res": _resblock_init(hc, hs, hs, dtype),
    }
    params["final_layer"] = {
        "res": _resblock_init(hs, hc, hs, dtype),
        "out_norm": _norm_init(hc, dtype),
        "out_conv": _conv_init(hc, lc, 3, dtype),
    }
    params["time_embed"] = _tembed_init(hs, hs, fq, dtype)
    params["time_embed_2"] = _tembed_init(hs, hs, fq, dtype)
    params["timestep_emb"] = _tembed_init(hs, hs, fq, dtype)
    return params


def _assign_conv(slot: Params, leaf: str, arr: np.ndarray, dtype) -> bool:
    if leaf == "bias":
        slot["b"] = jnp.asarray(arr, dtype)
        return True
    if arr.ndim == 4:  # torch OIHW → HWIO
        slot["w"] = jnp.asarray(arr.transpose(2, 3, 1, 0), dtype)
    else:  # 1x1 conv collapsed to linear [O, I] → [I, O]
        slot["w"] = jnp.asarray(arr.reshape(arr.shape[0], -1).T, dtype)
    return True


_TE_MAP = {"mlp.0": "l1", "mlp.2": "l2", "0": "l1", "2": "l2"}

# ResBlock torch Sequential indices → our slots (reference ResBlock:
# in_layers = [GN, SiLU, conv], out_layers = [GN, SiLU, Dropout, conv])
_RES_IN = {"0": "in_norm", "2": "in_conv"}
_RES_OUT = {"0": "out_norm", "3": "out_conv"}


def _assign_resblock(slot: Params, rest: list[str], arr, dtype) -> bool:
    mod, idx, leaf = rest[0], rest[1], rest[-1]
    if mod == "in_layers" and idx in _RES_IN:
        tgt = _RES_IN[idx]
    elif mod == "out_layers" and idx in _RES_OUT:
        tgt = _RES_OUT[idx]
    elif mod == "emb_layers" and idx == "1":
        tgt = "emb"
    elif mod == "skip_connection":
        tgt = "skip"
        if "skip" not in slot:
            return False
    else:
        return False
    if "norm" in tgt:
        slot[tgt]["scale" if leaf == "weight" else "shift"] = \
            jnp.asarray(arr, dtype)
        return True
    if "conv" in tgt or tgt == "skip":
        if arr.ndim == 1:
            slot[tgt]["b"] = jnp.asarray(arr, dtype)
            return True
        if tgt == "skip" and arr.shape[-1] == 1:  # 1x1 OIHW
            slot[tgt]["w"] = jnp.asarray(
                arr[:, :, 0, 0].T, dtype)
            return True
        return _assign_conv(slot[tgt], "weight", arr, dtype)
    # linear emb layer: torch [out, in]
    if leaf == "weight":
        slot[tgt]["w"] = jnp.asarray(arr.T, dtype)
    else:
        slot[tgt]["b"] = jnp.asarray(arr, dtype)
    return True


def _split_fused_qkv(arr: np.ndarray, dec: DecoderConfig
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HunYuan-fused qkv weight [hkv·(g+2)·d, hidden] interleaved per
    kv group (reference HunyuanImage3Model._split_qkv_weight:1947)."""
    g = dec.num_heads // dec.num_kv_heads
    d = dec.head_dim
    qkv = arr.reshape(dec.num_kv_heads, g + 2, d, -1)
    q = qkv[:, :g].reshape(-1, qkv.shape[-1])
    k = qkv[:, g:g + 1].reshape(-1, qkv.shape[-1])
    v = qkv[:, g + 1:].reshape(-1, qkv.shape[-1])
    return q, k, v


def assign_hi3_tensor(params: Params, name: str, arr, cfg: HI3Config,
                      dtype) -> bool:
    """Route one checkpoint tensor. Backbone tensors
    (model.embed_tokens/model.layers.*/model.norm) go through the AR
    loader's mapping (models/weights._assign — the layout the HunYuan
    AR parity test already covers); HunYuan-fused qkv_proj /
    gate_and_up_proj spellings are split here first (reference
    load_weights split_params_mapping:2001). Image-module tensors are
    mapped below. vae.*/vision_model.*/vision_aligner.*/lm_head are
    intentionally skipped (VAE handled separately; the vision tower is
    only for image-conditioned modes)."""
    from vllm_omni_tpu.models.weights import _assign

    parts = name.split(".")
    head = parts[0]
    if head == "model":
        # model.wte ↔ embed_tokens, model.ln_f ↔ norm (both spellings
        # appear; pipeline_hunyuan_image3.py:144 lists model.wte)
        if parts[1] == "wte":
            name = "model.embed_tokens." + ".".join(parts[2:])
        elif parts[1] == "ln_f":
            name = "model.norm." + ".".join(parts[2:])
        dec = cfg.decoder
        if ".self_attn.qkv_proj.weight" in name:
            q, k, v = _split_fused_qkv(arr, dec)
            base = name.replace(".qkv_proj.weight", "")
            return (_assign(params, f"{base}.q_proj.weight", q, dtype,
                            dec) and
                    _assign(params, f"{base}.k_proj.weight", k, dtype,
                            dec) and
                    _assign(params, f"{base}.v_proj.weight", v, dtype,
                            dec))
        if ".gate_and_up_proj.weight" in name:
            # fused [up; gate] stacked on dim 0 (reference
            # expert_weights_remapping: up=chunk 0, gate=chunk 1)
            half = arr.shape[0] // 2
            up, gate = arr[:half], arr[half:]
            return (_assign(params, name.replace(
                ".gate_and_up_proj.", ".up_proj."), up, dtype, dec) and
                _assign(params, name.replace(
                    ".gate_and_up_proj.", ".gate_proj."), gate, dtype,
                    dec))
        return _assign(params, name, arr, dtype, dec)
    if head in ("vae", "vision_model", "vision_aligner", "lm_head"):
        return False
    if head in ("time_embed", "time_embed_2", "timestep_emb"):
        slot = params[head]
        key = ".".join(parts[1:-1])
        tgt = _TE_MAP.get(key)
        if tgt is None:
            return False
        if parts[-1] == "weight":
            slot[tgt]["w"] = jnp.asarray(arr.T, dtype)
        else:
            slot[tgt]["b"] = jnp.asarray(arr, dtype)
        return True
    if head == "patch_embed":
        # UNetDown.model = [conv, ResBlock]
        if parts[1] == "model" and parts[2] == "0":
            return _assign_conv(params["patch_embed"]["conv_in"],
                                parts[-1], arr, dtype)
        if parts[1] == "model" and parts[2] == "1":
            return _assign_resblock(params["patch_embed"]["res"],
                                    parts[3:], arr, dtype)
        return False
    if head == "final_layer":
        # UNetUp.model = [ResBlock, Sequential(GN, SiLU, conv)]
        if parts[1] == "model" and parts[2] == "0":
            return _assign_resblock(params["final_layer"]["res"],
                                    parts[3:], arr, dtype)
        if parts[1] == "model" and parts[2] == "1":
            idx = parts[3]
            if idx == "0":
                params["final_layer"]["out_norm"][
                    "scale" if parts[-1] == "weight" else "shift"] = \
                    jnp.asarray(arr, dtype)
                return True
            if idx == "2":
                return _assign_conv(params["final_layer"]["out_conv"],
                                    parts[-1], arr, dtype)
        return False
    return False


def hi3_param_shardings(params: Params):
    """Mesh specs: the MoE backbone reuses the AR decoder's TP/EP
    layout (models/decoder.param_shardings — experts shard over "tp"
    when expert-parallel, heads otherwise); the small UNet/timestep
    modules replicate."""
    from jax.sharding import PartitionSpec as P

    from vllm_omni_tpu.models.decoder import param_shardings

    image_keys = ("patch_embed", "final_layer", "time_embed",
                  "time_embed_2", "timestep_emb")
    backbone = {k: v for k, v in params.items() if k not in image_keys}
    specs = dict(param_shardings(backbone))
    for k in image_keys:
        if k in params:
            specs[k] = jax.tree.map(lambda _: P(), params[k])
    return specs


# ---------------------------------------------------------------------------
# checkpoint dir detection + loading
# ---------------------------------------------------------------------------


def is_hunyuan_image3_dir(path: str) -> bool:
    import json
    import os

    cfg_path = os.path.join(str(path), "config.json")
    if not os.path.isfile(cfg_path):
        return False
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return False
    archs = cfg.get("architectures") or []
    return any("HunyuanImage3" in a for a in archs) or (
        cfg.get("model_type") == "Hunyuan" and "vae" in cfg)


def load_hunyuan_image3(path: str, dtype=jnp.bfloat16
                        ) -> tuple[HI3Config, Params]:
    import json
    import os

    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import (_collect_safetensor_files,
                                              _finalize_experts)

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = HI3Config.from_json(hf)
    params = init_hi3_params(cfg, dtype)
    # real conv3d VAE decoder (vae.decoder.* tensors; diffusion/
    # vae_hi3.py AutoencoderKLConv3D geometry)
    from vllm_omni_tpu.diffusion.vae_hi3 import (HI3VaeConfig,
                                                 assign_hi3_vae_tensor,
                                                 init_hi3_vae_decoder)

    vae_cfg = HI3VaeConfig.from_json(hf.get("vae") or {})
    vae_params = init_hi3_vae_decoder(vae_cfg, dtype=jnp.float32)
    vae_loaded, vae_failed = 0, 0
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:  # bf16 stored raw
                    arr = np.asarray(
                        jnp.asarray(arr).view(jnp.bfloat16))
                if name.startswith("vae.decoder."):
                    if assign_hi3_vae_tensor(
                            vae_params, name[len("vae."):], arr):
                        vae_loaded += 1
                    else:
                        vae_failed += 1
                    continue
                if assign_hi3_tensor(params, name, arr, cfg, dtype):
                    loaded += 1
                else:
                    skipped.append(name)
    if vae_loaded and not vae_failed:
        # ride on the config object (NOT the params pytree — the
        # backbone shardings/jit map over params)
        cfg.vae_decoder_params = vae_params
        cfg.vae_cfg = vae_cfg
        logger.info("hunyuan_image3: conv3d VAE decoder loaded "
                    "(%d tensors)", vae_loaded)
    elif vae_failed:
        logger.warning("hunyuan_image3: %d vae tensors did not match "
                       "the AutoencoderKLConv3D geometry — latent "
                       "preview decode", vae_failed)
    if loaded == 0:
        raise ValueError(f"no hunyuan_image3 tensors mapped from {path}")
    _finalize_experts(params, cfg.decoder)
    interesting = [n for n in skipped if not n.startswith(
        ("vae.", "vision_model.", "vision_aligner.", "lm_head."))]
    if interesting:
        logger.warning("hunyuan_image3: %d unmapped tensors, e.g. %s",
                       len(interesting), interesting[:6])
    logger.info("hunyuan_image3: %d tensors loaded", loaded)
    return cfg, params


# ---------------------------------------------------------------------------
# runner (pipeline._runner protocol: prepare / denoise_step /
# post_decode)
# ---------------------------------------------------------------------------


@dataclass
class HI3State:
    latents: Any  # [B, h, w, C]
    text_kv: Any  # per-layer list of (k, v) after the first step
    ids: Any
    sigmas: np.ndarray
    prompt_len: int
    h_tok: int
    w_tok: int
    use_cfg: bool
    guidance_scale: float
    first_mask: Any
    step_mask: Any
    cos: Any
    sin: Any
    step_index: int = 0
    t_start: float = field(default_factory=lambda: 0.0)

    @property
    def num_steps(self) -> int:
        return len(self.sigmas) - 1

    @property
    def done(self) -> bool:
        return self.step_index >= self.num_steps


class HunyuanImage3Runner:
    """Flow-match t2i loop: first step caches text KV on device; later
    steps run only the image stream (reference pipeline sampling loop
    hunyuan_image3_transformer.py:2598 with ImageKVCacheManager)."""

    decode_via_vae = False  # conv3d VAE is not the shared KL class

    TEXT_BUCKET = 64

    def __init__(self, cfg: HI3Config, params: Params,
                 num_train_timesteps: int = 1000,
                 flow_shift: float = 5.0, mesh=None) -> None:
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.num_train_timesteps = num_train_timesteps
        self.flow_shift = flow_shift
        self.tokenizer = None
        self._first = jax.jit(
            functools.partial(hi3_forward_first, cfg=cfg, mesh=mesh),
            static_argnames=("prompt_len", "h_tok", "w_tok"))
        self._step = jax.jit(
            functools.partial(hi3_forward_step, cfg=cfg, mesh=mesh),
            static_argnames=("h_tok", "w_tok"))

    # -- tokenization --------------------------------------------------------
    def _prompt_ids(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text)["input_ids"])
        # dummy tier: stable byte hash into the non-special vocab
        lo = max(self.cfg.timestep_token_id + 1, 8)
        span = max(self.cfg.decoder.vocab_size - lo, 1)
        data = text.encode() or b"\0"
        return [lo + (b * 2654435761 + i) % span
                for i, b in enumerate(data)]

    def _build_stream(self, text: str, n_img: int, plen: int
                      ) -> tuple[np.ndarray, np.ndarray]:
        """→ (ids [S], valid [S]) with a FIXED prompt region of
        ``plen`` positions. Layout (encode_sequence :223, t2i template
        "text-gen_image"): [bos, text…, boi, <pad…>, timestep, img×N,
        eoi] — padding sits inside the prompt region (masked out as
        keys) so every CFG row shares one static geometry."""
        c = self.cfg
        head = [c.bos_token_id] + self._prompt_ids(text) + \
            [c.boi_token_id]
        if len(head) > plen:
            head = head[:plen - 1] + [c.boi_token_id]
        valid = [True] * len(head) + [False] * (plen - len(head))
        head = head + [c.pad_token_id] * (plen - len(head))
        ids = head + [c.timestep_token_id] + \
            [c.image_token_id] * n_img + [c.eoi_token_id]
        valid += [True] * (1 + n_img + 1)
        return np.asarray(ids, np.int32), np.asarray(valid, bool)

    def prepare(self, req, num_steps: Optional[int] = None,
                seed: int = 0) -> HI3State:
        import time as _time

        p = req.params
        c = self.cfg
        steps = num_steps or p.num_inference_steps or 50
        down = c.vae_downsample
        h_tok = max(p.height // down, 1)
        w_tok = max(p.width // down, 1)
        n = h_tok * w_tok
        text = str(req.prompt) if not isinstance(req.prompt, dict) \
            else str(req.prompt.get("text", ""))
        use_cfg = bool(p.guidance_scale and p.guidance_scale > 1.0)
        neg = req.negative_prompt or p.negative_prompt or ""
        # both CFG rows share one static prompt region: the max prompt
        # padded up to the bucket
        plen_max = max(len(self._prompt_ids(text)),
                       len(self._prompt_ids(neg)) if use_cfg else 0) + 2
        plen = -(-plen_max // self.TEXT_BUCKET) * self.TEXT_BUCKET
        rows = [self._build_stream(text, n, plen)]
        if use_cfg:
            rows.append(self._build_stream(neg, n, plen))
        ids = np.stack([r[0] for r in rows])
        valid = np.stack([r[1] for r in rows])
        first_mask = hi3_first_step_mask(plen, n, 1, valid)
        step_mask = hi3_step_mask(plen, n, valid)
        cos, sin = hi3_rope(c, plen + 1, h_tok, w_tok, 1)
        key = jax.random.PRNGKey(p.seed if p.seed is not None else seed)
        lat = jax.random.normal(
            key, (1, h_tok, w_tok, c.vae_latent_channels), jnp.float32)
        sig = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
        sh = self.flow_shift
        sig[:-1] = sh * sig[:-1] / (1 + (sh - 1) * sig[:-1])
        return HI3State(
            latents=lat.astype(jnp.bfloat16), text_kv=None,
            ids=jnp.asarray(ids), sigmas=sig, prompt_len=plen,
            h_tok=h_tok, w_tok=w_tok, use_cfg=use_cfg,
            guidance_scale=float(p.guidance_scale or 1.0),
            first_mask=jnp.asarray(first_mask),
            step_mask=jnp.asarray(step_mask),
            cos=cos, sin=sin, t_start=_time.monotonic())

    def denoise_step(self, state: HI3State) -> None:
        c = self.cfg
        i = state.step_index
        sigma = float(state.sigmas[i])
        sigma_next = float(state.sigmas[i + 1])
        t_train = sigma * self.num_train_timesteps
        b = 2 if state.use_cfg else 1
        lat_in = jnp.concatenate([state.latents] * b, axis=0)
        tt = jnp.full((b,), t_train, jnp.float32)
        if state.text_kv is None:
            vel, state.text_kv = self._first(
                self.params, ids=state.ids, latents=lat_in, t=tt,
                mask=state.first_mask, cos=state.cos, sin=state.sin,
                prompt_len=state.prompt_len, h_tok=state.h_tok,
                w_tok=state.w_tok)
        else:
            n = state.h_tok * state.w_tok
            # step rows use [timestep, image] rope rows
            cos_s = jnp.concatenate(
                [state.cos[state.prompt_len:state.prompt_len + 1],
                 state.cos[state.prompt_len + 1:
                           state.prompt_len + 1 + n]], axis=0)
            sin_s = jnp.concatenate(
                [state.sin[state.prompt_len:state.prompt_len + 1],
                 state.sin[state.prompt_len + 1:
                           state.prompt_len + 1 + n]], axis=0)
            vel = self._step(
                self.params, text_kv=state.text_kv, latents=lat_in,
                t=tt, mask=state.step_mask, cos=cos_s, sin=sin_s,
                h_tok=state.h_tok, w_tok=state.w_tok)
        v = vel.astype(jnp.float32)
        if state.use_cfg:
            v = v[1:] + state.guidance_scale * (v[:1] - v[1:])
        state.latents = (state.latents.astype(jnp.float32) +
                         (sigma_next - sigma) * v).astype(
            state.latents.dtype)
        del c
        state.step_index += 1

    def post_decode(self, state: HI3State, output_type: str = "np"):
        lat = np.asarray(state.latents, np.float32)
        if output_type == "latent":
            return lat
        c = self.cfg
        lat = lat / c.vae_scaling_factor + c.vae_shift_factor
        if getattr(c, "vae_decoder_params", None) is not None:
            # real AutoencoderKLConv3D decode (vae_hi3.py)
            from vllm_omni_tpu.diffusion.vae_hi3 import hi3_vae_decode

            img = np.asarray(hi3_vae_decode(
                c.vae_decoder_params, c.vae_cfg,
                jnp.asarray(lat)), np.float32)
            return np.clip(img * 0.5 + 0.5, 0.0, 1.0)
        # no VAE tensors in the checkpoint — normalized latent preview
        # keeps the e2e path exercisable (dummy tier)
        x = lat[..., :3]
        lo, hi = x.min(), x.max()
        img = (x - lo) / max(hi - lo, 1e-6)
        img = np.repeat(np.repeat(img, c.vae_downsample, axis=1),
                        c.vae_downsample, axis=2)
        return np.clip(img, 0.0, 1.0)
