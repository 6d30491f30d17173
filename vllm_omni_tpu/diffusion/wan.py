"""Wan2.2 video DiT (WanTransformer3DModel) with real checkpoint
geometry.

Reference parity: diffusion/models/wan2_2/wan2_2_transformer.py
(WanTransformer3DModel :703 — WanTransformerBlock :615 with
self-attention + text cross-attention + per-block scale_shift_table
modulation, WanRotaryPosEmbed 3D rope :155, WanTimeTextImageEmbedding
:259, Conv3d patch embedding) and the diffusers checkpoint naming its
load_weights (:969) consumes.

Geometry quirks that differ from the Flux/QwenImage MMDiTs:
* QK RMSNorm runs over the FULL inner dim BEFORE the head split
  (reference norm_q/norm_k on tp_inner_dim :385 — under TP the
  reference needs DistributedRMSNorm; under XLA SPMD the full-dim norm
  just works);
* modulation = per-block ``scale_shift_table`` [6, D] ADDED to the
  broadcast timestep projection, chunk order (shift, scale, gate,
  c_shift, c_scale, c_gate);
* cross-attention has NO gate and its pre-norm is an AFFINE LayerNorm
  (cross_attn_norm=True);
* patch embedding is a stride=kernel Conv3d — features ordered
  (c, pt, ph, pw); the OUTPUT unpatchify orders (pt, ph, pw, c)
  (reference forward :958-962) — the two layouts are different;
* timesteps enter in train-timestep units: flow-match t ∈ [0,1] is
  scaled ×num_train_timesteps here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import (_constrain, _layer_norm_nb,
                                         apply_rope_interleaved)
from vllm_omni_tpu.diffusion.qwen_image import _qwen_timestep_embedding
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class WanConfig:
    """Mirrors the transformer's diffusers config.json
    (WanTransformer3DModel.__init__: Wan2.2-T2V-A14B = 40 heads × 128,
    40 layers, ffn 13824, text_dim 4096 (umt5-xxl), patch (1, 2, 2))."""

    patch_size: tuple[int, int, int] = (1, 2, 2)
    num_attention_heads: int = 40
    attention_head_dim: int = 128
    in_channels: int = 16
    out_channels: int = 16
    text_dim: int = 4096
    freq_dim: int = 256
    ffn_dim: int = 13824
    num_layers: int = 40
    cross_attn_norm: bool = True
    eps: float = 1e-6
    image_dim: Optional[int] = None  # I2V image-embed tower (not wired)
    added_kv_proj_dim: Optional[int] = None
    rope_max_seq_len: int = 1024
    num_train_timesteps: int = 1000
    # VACE (WanVACETransformer3DModel, reference
    # wan2_2_vace_transformer.py:66): conditioning blocks whose hints
    # inject into the main blocks listed in vace_layers; context =
    # [inactive|reactive latents (2·z_dim), 8x8-stride mask (64)] ch
    vace_layers: Optional[tuple] = None
    vace_in_channels: int = 96

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    # pipeline-facing aliases (DiffusionPipeline reads these generically)
    @property
    def joint_attention_dim(self) -> int:
        return self.text_dim

    @property
    def pack_factor(self) -> int:
        return self.patch_size[1]  # spatial patch for latent bucketing

    @classmethod
    def from_json(cls, cfg: dict) -> "WanConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "patch_size" in kw:
            kw["patch_size"] = tuple(kw["patch_size"])
        if kw.get("vace_layers") is not None:
            kw["vace_layers"] = tuple(kw["vace_layers"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# 3D rope (WanRotaryPosEmbed :155)
# ---------------------------------------------------------------------------


def wan_rope(cfg: WanConfig, f_tokens: int, h_tokens: int, w_tokens: int
             ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [F'·H'·W', head_dim//2], sequence order (f, h, w)
    row-major, plain 0-based positions per axis. Axis dims:
    t = hd - 2·(hd//3), h = w = hd//3 (reference split_sizes :210)."""
    hd = cfg.attention_head_dim
    d_h = d_w = hd // 3
    d_t = hd - 2 * d_h

    def axis_freqs(n: int, dim: int) -> np.ndarray:
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                 / dim))
        return np.arange(n, dtype=np.float64)[:, None] * inv[None, :]

    ft = np.broadcast_to(
        axis_freqs(f_tokens, d_t)[:, None, None, :],
        (f_tokens, h_tokens, w_tokens, d_t // 2))
    fh = np.broadcast_to(
        axis_freqs(h_tokens, d_h)[None, :, None, :],
        (f_tokens, h_tokens, w_tokens, d_h // 2))
    fw = np.broadcast_to(
        axis_freqs(w_tokens, d_w)[None, None, :, :],
        (f_tokens, h_tokens, w_tokens, d_w // 2))
    freqs = np.concatenate([ft.reshape(-1, d_t // 2),
                            fh.reshape(-1, d_h // 2),
                            fw.reshape(-1, d_w // 2)], axis=-1)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Packing (Conv3d stride=kernel ≡ patchify + linear)
# ---------------------------------------------------------------------------


def wan_pack_latents(lat: jnp.ndarray, p: tuple[int, int, int]
                     ) -> jnp.ndarray:
    """[B, F, H, W, C] → [B, (F/pt)(H/ph)(W/pw), C·pt·ph·pw] with the
    Conv3d weight feature order (c, pt, ph, pw)."""
    b, f, h, w, c = lat.shape
    pt, ph, pw = p
    x = lat.reshape(b, f // pt, pt, h // ph, ph, w // pw, pw, c)
    # → [B, F', H', W', C, pt, ph, pw]
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw),
                     c * pt * ph * pw)


def wan_unpack_latents(x: jnp.ndarray, f: int, h: int, w: int,
                       p: tuple[int, int, int], c_out: int) -> jnp.ndarray:
    """Inverse of the OUTPUT layout (reference :958-962: features are
    (pt, ph, pw, c) with c innermost) → [B, F, H, W, C]."""
    b, s, _ = x.shape
    pt, ph, pw = p
    x = x.reshape(b, f // pt, h // ph, w // pw, pt, ph, pw, c_out)
    # → [B, F', pt, H', ph, W', pw, C]
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, f, h, w, c_out)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _full_dim_rms(x: jnp.ndarray, weight: jnp.ndarray,
                  eps: float) -> jnp.ndarray:
    """RMSNorm over the full inner dim (pre-head-split, :385)."""
    return rms_norm(x, weight, eps=eps)


def _attend(q, k, v, hd, mesh, kv_is_text=False):
    b, s, nh, _ = q.shape
    scale = hd ** -0.5
    if mesh is None:
        from vllm_omni_tpu.ops.flash_attention import flash_attention

        o = flash_attention(q, k, v, scale=scale)
    else:
        head_spec = P("cfg", None, ("ulysses", "tp"), None)
        q = _constrain(q, mesh, head_spec)
        k = _constrain(k, mesh, head_spec)
        v = _constrain(v, mesh, head_spec)
        o = mha_xla(q, k, v, scale=scale, causal=False)
        spec_out = P("cfg", None if kv_is_text else "ulysses", None, None)
        o = _constrain(o, mesh, spec_out)
    return o.reshape(b, s, nh * hd)


def wan_block(blk: Params, cfg: WanConfig, x: jnp.ndarray,
              txt: jnp.ndarray, tproj: jnp.ndarray, cos: jnp.ndarray,
              sin: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """WanTransformerBlock :615. x [B, S, D], txt [B, Tt, D] (already
    projected), tproj [B, 6, D]."""
    b, s, hs = x.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    if tproj.ndim == 4:
        # TI2V expand_timesteps: per-patch modulation [B, S, 6, D]
        # (pipeline_wan2_2_i2v.py:537 temp_ts per latent patch)
        mod = (blk["scale_shift_table"][None, None] +
               tproj).astype(jnp.float32)
        sh1, sc1, g1 = mod[:, :, 0], mod[:, :, 1], mod[:, :, 2]
        sh2, sc2, g2 = mod[:, :, 3], mod[:, :, 4], mod[:, :, 5]

        def bc(v):
            return v  # already [B, S, D]
    else:
        mod = (blk["scale_shift_table"][None] + tproj).astype(
            jnp.float32)
        sh1, sc1, g1 = mod[:, 0], mod[:, 1], mod[:, 2]
        sh2, sc2, g2 = mod[:, 3], mod[:, 4], mod[:, 5]

        def bc(v):
            return v[:, None, :]

    def ada(v, shift, scale):
        return (_layer_norm_nb(v.astype(jnp.float32), cfg.eps) *
                (1.0 + bc(scale)) + bc(shift)).astype(v.dtype)

    # 1. self-attention (rope, gated)
    a1 = blk["attn1"]
    xn = ada(x, sh1, sc1)
    q = _full_dim_rms(linear(xn, a1["to_q"]), a1["norm_q"], cfg.eps)
    k = _full_dim_rms(linear(xn, a1["to_k"]), a1["norm_k"], cfg.eps)
    v = linear(xn, a1["to_v"])
    q = apply_rope_interleaved(q.reshape(b, s, nh, hd), cos, sin)
    k = apply_rope_interleaved(k.reshape(b, s, nh, hd), cos, sin)
    o = _attend(q, k, v.reshape(b, s, nh, hd), hd, mesh)
    x = x + (bc(g1) *
             linear(o, a1["to_out"]).astype(jnp.float32)).astype(x.dtype)

    # 2. cross-attention (affine pre-norm, ungated)
    a2 = blk["attn2"]
    if cfg.cross_attn_norm:
        xn2 = _layer_norm_nb(x.astype(jnp.float32), cfg.eps) \
            * blk["norm2"]["w"] + blk["norm2"]["b"]
        xn2 = xn2.astype(x.dtype)
    else:
        xn2 = x
    tt = txt.shape[1]
    q = _full_dim_rms(linear(xn2, a2["to_q"]), a2["norm_q"], cfg.eps)
    k = _full_dim_rms(linear(txt, a2["to_k"]), a2["norm_k"], cfg.eps)
    v = linear(txt, a2["to_v"])
    o = _attend(q.reshape(b, s, nh, hd), k.reshape(b, tt, nh, hd),
                v.reshape(b, tt, nh, hd), hd, mesh, kv_is_text=True)
    x = x + linear(o, a2["to_out"])

    # 3. ffn (gated)
    xn3 = ada(x, sh2, sc2)
    h = linear(xn3, blk["ffn"]["net0"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
        x.dtype)
    ff = linear(h, blk["ffn"]["net2"])
    return x + (bc(g2) *
                ff.astype(jnp.float32)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def wan_forward(params: Params, cfg: WanConfig, latents: jnp.ndarray,
                text_states: jnp.ndarray, timesteps: jnp.ndarray,
                mesh=None, vace_context: Optional[jnp.ndarray] = None,
                vace_scale: float = 1.0) -> jnp.ndarray:
    """latents [B, F, H, W, C] (or [B, H, W, C] → F=1), text_states
    [B, Tt, text_dim] (umt5), timesteps [B] flow-match t ∈ [0,1]
    (scaled to train-timestep units internally) → velocity, same shape
    as latents.

    vace_context [B, F, H, W, vace_in_channels] (latent-space
    conditioning: inactive|reactive latents + 8×8-stride mask): runs
    the per-region VACE context blocks (reference
    wan2_2_vace_transformer.py:150 — block 0 proj_in + hidden add,
    each block's proj_out hint injected into the main block listed in
    cfg.vace_layers, scaled by vace_scale)."""
    squeeze_f = latents.ndim == 4
    if squeeze_f:
        latents = latents[:, None]
    b, f, h, w, c = latents.shape

    x, (txt, tproj), temb, (cos, sin) = wan_prolog(
        params, cfg, latents, text_states, timesteps, mesh=mesh)

    hints = None
    if vace_context is not None and "vace_blocks" in params:
        if vace_context.ndim == 4:
            vace_context = vace_context[:, None]
        dtype = params["proj_out"]["w"].dtype
        ctrl = wan_pack_latents(vace_context.astype(dtype),
                                cfg.patch_size)
        ctrl = linear(ctrl, params["vace_patch_embedding"])
        # align to the latent token count (reference embed_vace_context
        # zero-pads the flattened embeds to seq_len)
        if ctrl.shape[1] < x.shape[1]:
            ctrl = jnp.pad(ctrl, ((0, 0),
                                  (0, x.shape[1] - ctrl.shape[1]),
                                  (0, 0)))
        elif ctrl.shape[1] > x.shape[1]:
            ctrl = ctrl[:, :x.shape[1]]
        hints = []
        for j, vb in enumerate(params["vace_blocks"]):
            if j == 0:
                ctrl = linear(ctrl, vb["proj_in"]) + x
            ctrl = wan_block(vb, cfg, ctrl, txt, tproj, cos, sin,
                             mesh=mesh)
            hints.append(linear(ctrl, vb["proj_out"]))

    if mesh is not None and mesh.shape.get("pp", 1) > 1:
        from vllm_omni_tpu.diffusion.dit import (gpipe_blocks,
                                                 stack_layers)

        stacked = params.get("blocks_stacked")
        if stacked is None:
            stacked = stack_layers(params["blocks"])

        if hints is not None:
            # Thread the per-region hints through the GPipe schedule:
            # the hint stack rides row_consts (sliced per microbatch),
            # and two per-layer leaves in the stacked pytree select
            # which hint (if any) each main block adds — scale 0 at
            # non-VACE layers makes the add a no-op without branching
            # inside the scan body.
            n_layers = len(params["blocks"])
            mapping = {li: vi for vi, li in
                       enumerate(cfg.vace_layers or ())}
            stacked = dict(stacked)
            stacked["_vace_idx"] = jnp.array(
                [mapping.get(i, 0) for i in range(n_layers)], jnp.int32)
            stacked["_vace_scale"] = jnp.array(
                [vace_scale if i in mapping else 0.0
                 for i in range(n_layers)], jnp.float32)
            hint_stack = jnp.stack(hints, axis=1)  # [B, n_vace, S, D]

            def body(layer, carry, rows, shared):
                y = wan_block(layer, cfg, carry, rows[0], rows[1],
                              shared[0], shared[1], mesh=None)
                hint = jax.lax.dynamic_index_in_dim(
                    rows[2], layer["_vace_idx"], axis=1, keepdims=False)
                return (y.astype(jnp.float32) +
                        hint.astype(jnp.float32) *
                        layer["_vace_scale"]).astype(y.dtype)

            x = gpipe_blocks(stacked, body, x, (txt, tproj, hint_stack),
                             (cos, sin), mesh)
        else:
            def body(layer, carry, rows, shared):
                return wan_block(layer, cfg, carry, rows[0], rows[1],
                                 shared[0], shared[1], mesh=None)

            x = gpipe_blocks(stacked, body, x, (txt, tproj), (cos, sin),
                             mesh)
    else:
        mapping = {li: vi for vi, li in
                   enumerate(cfg.vace_layers or ())}
        for i, blk in enumerate(params["blocks"]):
            x = wan_block(blk, cfg, x, txt, tproj, cos, sin, mesh=mesh)
            if hints is not None and i in mapping:
                x = (x.astype(jnp.float32) +
                     hints[mapping[i]].astype(jnp.float32) *
                     vace_scale).astype(x.dtype)

    out = wan_epilog(params, cfg, x, temb, f, h, w)
    return out[:, 0] if squeeze_f else out


def wan_prolog(params: Params, cfg: WanConfig, latents: jnp.ndarray,
               text_states: jnp.ndarray, timesteps: jnp.ndarray,
               mesh=None):
    """Embedding + conditioning stage → (x carry, (txt, tproj) per-row
    consts, temb, (cos, sin)). latents must already be [B, F, H, W, C].
    The unit boundary the layerwise offloader and the PP GPipe body
    share with the plain forward."""
    b, f, h, w, c = latents.shape
    pt, ph, pw = cfg.patch_size
    dtype = params["proj_out"]["w"].dtype

    x = wan_pack_latents(latents.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embedding"])
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    # condition embedder (:259): temb for the final norm, tproj [B,6,D]
    # for block modulation, projected text. TI2V expand_timesteps:
    # timesteps [B, S_patches] → per-patch temb/tproj
    # (pipeline_wan2_2_i2v.py:533-537)
    ce = params["condition_embedder"]
    per_patch = timesteps.ndim == 2
    t_train = timesteps.astype(jnp.float32) * cfg.num_train_timesteps
    e = _qwen_timestep_embedding(t_train.reshape(-1), dim=cfg.freq_dim,
                                 scale=1.0).astype(dtype)
    e = linear(e, ce["time_embedder"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, ce["time_embedder"]["linear_2"])
    tproj = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                   ce["time_proj"])
    if per_patch:
        s_pat = timesteps.shape[1]
        temb = temb.reshape(b, s_pat, cfg.inner_dim)
        tproj = tproj.reshape(b, s_pat, 6, cfg.inner_dim)
    else:
        tproj = tproj.reshape(b, 6, cfg.inner_dim)

    txt = linear(text_states.astype(dtype), ce["text_embedder"]["linear_1"])
    txt = jax.nn.gelu(txt.astype(jnp.float32),
                      approximate=True).astype(dtype)
    txt = linear(txt, ce["text_embedder"]["linear_2"])

    cos, sin = wan_rope(cfg, f // pt, h // ph, w // pw)
    return x, (txt, tproj), temb, (cos, sin)


def wan_epilog(params: Params, cfg: WanConfig, x: jnp.ndarray,
               temb: jnp.ndarray, f: int, h: int, w: int
               ) -> jnp.ndarray:
    """Final AdaLN + unpack back to [B, F, H, W, C]."""
    dtype = params["proj_out"]["w"].dtype
    per_patch = temb.ndim == 3
    # final AdaLN: (scale_shift_table [2, D] + temb) → (shift, scale)
    if per_patch:
        fin = (params["scale_shift_table"][None, None] +
               temb[:, :, None, :]).astype(jnp.float32)
        shift, scale = fin[:, :, 0], fin[:, :, 1]
        out = (_layer_norm_nb(x.astype(jnp.float32), cfg.eps) *
               (1.0 + scale) + shift).astype(dtype)
    else:
        fin = (params["scale_shift_table"][None] +
               temb[:, None, :]).astype(jnp.float32)
        shift, scale = fin[:, 0], fin[:, 1]
        out = (_layer_norm_nb(x.astype(jnp.float32), cfg.eps) *
               (1.0 + scale[:, None, :]) +
               shift[:, None, :]).astype(dtype)
    out = linear(out, params["proj_out"])
    return wan_unpack_latents(out, f, h, w, cfg.patch_size,
                              cfg.out_channels)


def wan_modulated_input(params: Params, cfg: WanConfig,
                        latents: jnp.ndarray,
                        timesteps: jnp.ndarray) -> jnp.ndarray:
    """TeaCache probe: block-0 self-attention-modulated patch embedding
    (scale_shift_table rows 0/1 + time projection — the reference
    teacache extractor's modulated-input signal for Wan). timesteps [B]
    flow-match σ ∈ [0,1], like wan_forward."""
    if latents.ndim == 4:
        latents = latents[:, None]
    dtype = params["proj_out"]["w"].dtype
    x = wan_pack_latents(latents.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embedding"])
    ce = params["condition_embedder"]
    t_train = timesteps.astype(jnp.float32) * cfg.num_train_timesteps
    e = _qwen_timestep_embedding(t_train.reshape(-1), dim=cfg.freq_dim,
                                 scale=1.0).astype(dtype)
    e = linear(e, ce["time_embedder"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, ce["time_embedder"]["linear_2"])
    tproj = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                   ce["time_proj"]).reshape(x.shape[0], 6, cfg.inner_dim)
    mod = (params["blocks"][0]["scale_shift_table"][None] +
           tproj).astype(jnp.float32)
    sh1, sc1 = mod[:, 0], mod[:, 1]
    return (_layer_norm_nb(x.astype(jnp.float32), cfg.eps) *
            (1.0 + sc1[:, None, :]) + sh1[:, None, :])


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def _init_wan_block(keys, cfg: WanConfig, dtype) -> Params:
    hs = cfg.inner_dim
    blk = {
        "scale_shift_table": (jax.random.normal(
            next(keys), (6, hs), jnp.float32) *
            hs ** -0.5).astype(dtype),
        "attn1": {
            "to_q": _lin(next(keys), hs, hs, dtype),
            "to_k": _lin(next(keys), hs, hs, dtype),
            "to_v": _lin(next(keys), hs, hs, dtype),
            "to_out": _lin(next(keys), hs, hs, dtype),
            "norm_q": jnp.ones((hs,), dtype),
            "norm_k": jnp.ones((hs,), dtype),
        },
        "attn2": {
            "to_q": _lin(next(keys), hs, hs, dtype),
            "to_k": _lin(next(keys), hs, hs, dtype),
            "to_v": _lin(next(keys), hs, hs, dtype),
            "to_out": _lin(next(keys), hs, hs, dtype),
            "norm_q": jnp.ones((hs,), dtype),
            "norm_k": jnp.ones((hs,), dtype),
        },
        "ffn": {"net0": _lin(next(keys), hs, cfg.ffn_dim, dtype),
                "net2": _lin(next(keys), cfg.ffn_dim, hs, dtype)},
    }
    if cfg.cross_attn_norm:
        blk["norm2"] = {"w": jnp.ones((hs,), dtype),
                        "b": jnp.zeros((hs,), dtype)}
    return blk


def init_wan_params(cfg: WanConfig, key: jax.Array,
                    dtype=jnp.bfloat16) -> Params:
    n_vace = len(cfg.vace_layers or ())
    keys = iter(jax.random.split(
        key, (cfg.num_layers + n_vace) * 16 + 16))
    hs = cfg.inner_dim
    pin = cfg.in_channels * cfg.patch_size[0] * cfg.patch_size[1] * \
        cfg.patch_size[2]
    pout = cfg.out_channels * cfg.patch_size[0] * cfg.patch_size[1] * \
        cfg.patch_size[2]
    params: Params = {
        "patch_embedding": _lin(next(keys), pin, hs, dtype),
        "condition_embedder": {
            "time_embedder": {
                "linear_1": _lin(next(keys), cfg.freq_dim, hs, dtype),
                "linear_2": _lin(next(keys), hs, hs, dtype)},
            "time_proj": _lin(next(keys), hs, 6 * hs, dtype, scale=0.02),
            "text_embedder": {
                "linear_1": _lin(next(keys), cfg.text_dim, hs, dtype),
                "linear_2": _lin(next(keys), hs, hs, dtype)},
        },
        "scale_shift_table": (jax.random.normal(
            next(keys), (2, hs), jnp.float32) * hs ** -0.5).astype(dtype),
        "proj_out": _lin(next(keys), hs, pout, dtype),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append(_init_wan_block(keys, cfg, dtype))
    if n_vace:
        vin = cfg.vace_in_channels * cfg.patch_size[0] * \
            cfg.patch_size[1] * cfg.patch_size[2]
        params["vace_patch_embedding"] = _lin(next(keys), vin, hs, dtype)
        params["vace_blocks"] = []
        for j in range(n_vace):
            vb = _init_wan_block(keys, cfg, dtype)
            if j == 0:
                vb["proj_in"] = _lin(next(keys), hs, hs, dtype)
            vb["proj_out"] = _lin(next(keys), hs, hs, dtype)
            params["vace_blocks"].append(vb)
    return params


def wan_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/mlp-in column-split, out/mlp-out row-split.
    Full-dim QK norms replicate (global stats are exact under XLA SPMD;
    the reference needs DistributedRMSNorm for the same math :67)."""
    col = {"to_q", "to_k", "to_v", "net0"}
    row = {"to_out", "net2"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        if "blocks_stacked" in names:
            # PP: stacked [L, ...] leaves shard their layer axis over
            # "pp" (layer groups per rank; dit.gpipe_blocks)
            return P("pp")
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_wan_tensor(params: Params, name: str, value, dtype) -> bool:
    """Map one diffusers-format tensor (WanTransformer3DModel naming,
    reference load_weights :969) into the pytree. Conv3d patch weights
    [O, C, pt, ph, pw] flatten to [C·pt·ph·pw, O]; torch Linear [out,
    in] transposes to [in, out]."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    def block_slot(blk: dict, rest: list) -> bool:
        if rest[0] == "scale_shift_table":
            blk["scale_shift_table"] = jnp.asarray(
                value).reshape(6, -1).astype(dtype)
            return True
        if rest[0] in ("attn1", "attn2"):
            a = blk[rest[0]]
            if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v"):
                put(a[rest[1]], "w" if rest[2] == "weight" else "b",
                    value)
                return True
            if rest[1] == "to_out":  # ModuleList: attn.to_out.0.weight
                leaf = rest[3] if rest[2] == "0" else rest[2]
                put(a["to_out"], "w" if leaf == "weight" else "b", value)
                return True
            return False
        if rest[0] == "norm2" and "norm2" in blk:
            blk["norm2"]["w" if rest[1] == "weight" else "b"] = b(value)
            return True
        if rest[0] == "ffn" and rest[1] == "net":
            if rest[2] == "0":  # net.0.proj.{weight,bias}
                put(blk["ffn"]["net0"],
                    "w" if rest[4] == "weight" else "b", value)
                return True
            if rest[2] == "2":
                put(blk["ffn"]["net2"],
                    "w" if rest[3] == "weight" else "b", value)
                return True
        return False

    parts = name.split(".")
    if parts[0] in ("patch_embedding", "vace_patch_embedding"):
        if parts[0] not in params:
            return False
        if parts[1] == "weight":
            o = value.shape[0]
            params[parts[0]]["w"] = jnp.asarray(
                _np.ascontiguousarray(
                    value.reshape(o, -1).T)).astype(dtype)
        else:
            params[parts[0]]["b"] = b(value)
        return True
    if parts[0] == "vace_blocks":
        if "vace_blocks" not in params:
            return False
        vb = params["vace_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] in ("proj_in", "proj_out"):
            if rest[0] not in vb:
                return False
            put(vb[rest[0]], "w" if rest[1] == "weight" else "b", value)
            return True
        return block_slot(vb, rest)
    if parts[0] == "condition_embedder":
        ce = params["condition_embedder"]
        if parts[1] in ("time_embedder", "text_embedder"):
            slot = ce[parts[1]].get(parts[2])
            if slot is None:
                return False
            put(slot, "w" if parts[3] == "weight" else "b", value)
            return True
        if parts[1] == "time_proj":
            put(ce["time_proj"], "w" if parts[2] == "weight" else "b",
                value)
            return True
        return False
    if parts[0] == "scale_shift_table":
        params["scale_shift_table"] = jnp.asarray(
            value).reshape(2, -1).astype(dtype)
        return True
    if parts[0] == "proj_out" and len(parts) == 2:
        put(params["proj_out"], "w" if parts[1] == "weight" else "b",
            value)
        return True
    if parts[0] != "blocks":
        return False
    return block_slot(params["blocks"][int(parts[1])], parts[2:])
