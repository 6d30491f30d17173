"""LTX-2 audio-video transformer with real checkpoint geometry.

Reference parity: diffusion/models/ltx2/ltx2_transformer.py
(LTX2VideoTransformer3DModel :1237 — per block: video+audio
self-attention with interleaved rope applied to the FLAT projection,
video/audio↔text cross-attention, audio→video and video→audio
cross-attention with per-layer scale_shift tables added to global
AdaLN-Single modulation, separate FFs; LTX2AdaLayerNormSingle :133
PixArt-style timestep modulation; LTX2AudioVideoRotaryPosEmbed :970
patch-boundary-midpoint rope normalized by base extents) and the
diffusers checkpoint naming its load_weights (:1779) consumes (we keep
to_q/to_k/to_v separate — the reference fuses to_qkv at load).

TPU-first like flux.py/sd3.py: pure functions over a param pytree keyed
by diffusers module names; one jitted program per resolution bucket.

Architecture notes kept straight:
* qk norm is rms ACROSS the whole projection (not per head), with
  affine weights, applied BEFORE rope and before the head split;
* rope freqs: theta**linspace(0,1,dim/(2·ndims)) · π/2 on
  (2·coord/base - 1), interleave-repeated, front-padded with
  cos=1/sin=0 when dim % (2·ndims) != 0; coords are the midpoints of
  [start,end) patch boundaries in PIXEL/second space (causal VAE
  offset on the time axis, time scaled by 1/fps);
* a2v/v2a attention runs at AUDIO inner width regardless of the query
  modality; their q/k rope is the 1-D time-only variant at
  audio_cross_attention_dim;
* modulation: global per-timestep AdaLN-Single params PLUS per-layer
  learned tables (6 self/ff, 4+1 cross); output layer has its own
  2-entry table against the pre-linear embedded timestep.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.models.decoder import linear

Params = dict


@dataclass
class LTX2Config:
    in_channels: int = 128
    out_channels: int = 128
    patch_size: int = 1
    patch_size_t: int = 1
    num_attention_heads: int = 32
    attention_head_dim: int = 128
    cross_attention_dim: int = 4096
    vae_scale_factors: tuple = (8, 32, 32)
    pos_embed_max_pos: int = 20
    base_height: int = 2048
    base_width: int = 2048
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_patch_size: int = 1
    audio_patch_size_t: int = 1
    audio_num_attention_heads: int = 32
    audio_attention_head_dim: int = 64
    audio_cross_attention_dim: int = 2048
    audio_scale_factor: int = 4
    audio_pos_embed_max_pos: int = 20
    audio_sampling_rate: int = 16000
    audio_hop_length: int = 160
    num_layers: int = 48
    caption_channels: int = 3840
    rope_theta: float = 10000.0
    causal_offset: int = 1
    timestep_scale_multiplier: float = 1000.0
    cross_attn_timestep_scale_multiplier: float = 1000.0
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def audio_inner_dim(self) -> int:
        return self.audio_num_attention_heads * self.audio_attention_head_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "LTX2Config":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        for k in ("out_channels", "audio_out_channels"):
            if kw.get(k) is None:
                kw.pop(k, None)
        if "vae_scale_factors" in kw:
            kw["vae_scale_factors"] = tuple(kw["vae_scale_factors"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (LTX2AudioVideoRotaryPosEmbed :970)
# ---------------------------------------------------------------------------


def ltx2_video_coords(cfg: LTX2Config, num_frames: int, height: int,
                      width: int, fps: float = 24.0) -> np.ndarray:
    """Latent grid → pixel-space patch-boundary MIDPOINTS [3, N]:
    (time/fps seconds with the causal-VAE first-frame offset, pixel row,
    pixel col)."""
    sf_t, sf_h, sf_w = cfg.vae_scale_factors
    gf = np.arange(0, num_frames, cfg.patch_size_t, dtype=np.float64)
    gh = np.arange(0, height, cfg.patch_size, dtype=np.float64)
    gw = np.arange(0, width, cfg.patch_size, dtype=np.float64)
    f, h, w = (g.reshape(-1) for g in np.meshgrid(gf, gh, gw,
                                                  indexing="ij"))
    # time axis: causal-VAE offset + clamp, then seconds
    t0 = np.clip(f * sf_t + cfg.causal_offset - sf_t, 0, None) / fps
    t1 = np.clip((f + cfg.patch_size_t) * sf_t + cfg.causal_offset -
                 sf_t, 0, None) / fps
    mids = [(t0 + t1) / 2.0,
            (h + cfg.patch_size / 2.0) * sf_h,
            (w + cfg.patch_size / 2.0) * sf_w]
    return np.stack(mids)  # [3, N]


def ltx2_audio_coords(cfg: LTX2Config, num_frames: int) -> np.ndarray:
    """Audio latent frames → second-space boundary midpoints [1, N]."""
    sf = cfg.audio_scale_factor
    gf = np.arange(0, num_frames, cfg.audio_patch_size_t,
                   dtype=np.float64)
    s = np.clip(gf * sf + cfg.causal_offset - sf, 0, None)
    e = np.clip((gf + cfg.audio_patch_size_t) * sf +
                cfg.causal_offset - sf, 0, None)
    sec = cfg.audio_hop_length / cfg.audio_sampling_rate
    return np.stack([(s * sec + e * sec) / 2.0])  # [1, N]


def ltx2_rope(coords: np.ndarray, dim: int, max_positions: tuple,
              theta: float = 10000.0) -> tuple[jnp.ndarray, jnp.ndarray]:
    """coords [ndims, N] midpoints → interleaved (cos, sin) [N, dim].
    freqs = (2·coord/base − 1) · theta^linspace(0,1,dim/(2·ndims)) · π/2
    per axis, axes concatenated, repeat_interleave(2), front-padded
    with identity rotation when dim % (2·ndims) != 0."""
    ndims, n = coords.shape
    per = dim // (2 * ndims)
    pow_idx = theta ** np.linspace(0.0, 1.0, per, dtype=np.float64)
    base_f = pow_idx * np.pi / 2.0
    grid = np.stack([coords[i] / max_positions[i] for i in range(ndims)],
                    axis=-1)  # [N, ndims]
    freqs = (grid[:, :, None] * 2 - 1) * base_f[None, None, :]
    freqs = np.swapaxes(freqs, 1, 2).reshape(n, ndims * per)
    cos = np.repeat(np.cos(freqs), 2, axis=-1)
    sin = np.repeat(np.sin(freqs), 2, axis=-1)
    pad = dim % (2 * ndims)
    if pad:
        cos = np.concatenate([np.ones((n, pad)), cos], axis=-1)
        sin = np.concatenate([np.zeros((n, pad)), sin], axis=-1)
    return (jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32))


def _apply_rope_flat(x: jnp.ndarray, rope) -> jnp.ndarray:
    """Interleaved rope on the FLAT [B, T, C] projection (reference
    apply_interleaved_rotary_emb :64)."""
    if rope is None:
        return x
    cos, sin = rope
    b, t, c = x.shape
    xr = x.astype(jnp.float32).reshape(b, t, c // 2, 2)
    rot = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(b, t, c)
    return (x.astype(jnp.float32) * cos[None] +
            rot * sin[None]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Norms / embedders
# ---------------------------------------------------------------------------


def _rms_nw(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Weightless rms norm (block norms: elementwise_affine=False)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) +
                               eps)).astype(x.dtype)


def _rms_w(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Affine rms across the WHOLE last dim (qk 'rms_norm_across_heads')."""
    return _rms_nw(x, eps) * w.astype(x.dtype)


def _ln_nb(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, -1, keepdims=True)
    var = jnp.var(xf, -1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _sinusoid_256(t: jnp.ndarray) -> jnp.ndarray:
    """diffusers Timesteps(256, flip_sin_to_cos=True,
    downscale_freq_shift=0): [cos | sin] of t·10000^(-i/128). The
    caller pre-scales t by timestep_scale_multiplier."""
    half = 128
    freqs = jnp.exp(-jnp.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _ada_single(slot: Params, t: jnp.ndarray, dtype):
    """LTX2AdaLayerNormSingle: PixArt timestep embedding → silu →
    linear(num_mod·dim). Returns (mod, embedded_timestep), both [B, *]."""
    e = linear(_sinusoid_256(t).astype(dtype), slot["emb"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    e = linear(e, slot["emb"]["linear_2"])
    mod = linear(jax.nn.silu(e.astype(jnp.float32)).astype(dtype),
                 slot["linear"])
    return mod, e


def _caption_proj(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
    """PixArtAlphaTextProjection: linear_1 → gelu(tanh) → linear_2."""
    h = linear(x, slot["linear_1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return linear(h, slot["linear_2"])


def _ff(x: jnp.ndarray, slot: Params) -> jnp.ndarray:
    h = linear(x, slot["net0"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return linear(h, slot["net2"])


def _attend(att: Params, cfg: LTX2Config, q_in, kv_in, heads, q_rope,
            k_rope, eps):
    """One LTX2Attention: project, rms-across-heads, flat rope, attend,
    out-project."""
    b, tq = q_in.shape[0], q_in.shape[1]
    tk = kv_in.shape[1]
    q = linear(q_in, att["to_q"])
    k = linear(kv_in, att["to_k"])
    v = linear(kv_in, att["to_v"])
    q = _rms_w(q, att["norm_q"], eps)
    k = _rms_w(k, att["norm_k"], eps)
    q = _apply_rope_flat(q, q_rope)
    k = _apply_rope_flat(k, k_rope if k_rope is not None else q_rope)
    hd = q.shape[-1] // heads
    from vllm_omni_tpu.ops.attention import mha_xla

    o = mha_xla(q.reshape(b, tq, heads, hd), k.reshape(b, tk, heads, hd),
                v.reshape(b, tk, heads, hd), scale=hd ** -0.5)
    return linear(o.reshape(b, tq, heads * hd), att["to_out"])


# ---------------------------------------------------------------------------
# Block (LTX2VideoTransformerBlock :670)
# ---------------------------------------------------------------------------


def _table_mod(table: jnp.ndarray, temb: jnp.ndarray, n: int):
    """per-layer table [n, D] + global temb [B, n·D] → n chunks
    [B, 1, D] (temb may be per-token [B, T, n·D] → [B, T, D] chunks)."""
    if temb.ndim == 2:
        temb = temb[:, None, :]
    b, t, _ = temb.shape
    vals = table[None, None] + temb.reshape(b, t, n, -1)
    return [vals[:, :, i] for i in range(n)]


def ltx2_block(blk: Params, cfg: LTX2Config, vid, aud, txt, atxt, temb,
               temb_a, ca_ss, ca_ss_a, ca_gate, ca_gate_a, v_rope,
               a_rope, cav_rope, caa_rope):
    eps = cfg.eps
    nh, anh = cfg.num_attention_heads, cfg.audio_num_attention_heads

    # 1. self-attention
    sh, sc, g, sh2, sc2, g2 = _table_mod(blk["scale_shift_table"], temb, 6)
    h = _rms_nw(vid, eps) * (1 + sc) + sh
    vid = vid + g * _attend(blk["attn1"], cfg, h, h, nh, v_rope, None,
                            eps)
    ash, asc, ag, ash2, asc2, ag2 = _table_mod(
        blk["audio_scale_shift_table"], temb_a, 6)
    ha = _rms_nw(aud, eps) * (1 + asc) + ash
    aud = aud + ag * _attend(blk["audio_attn1"], cfg, ha, ha, anh,
                             a_rope, None, eps)

    # 2. text cross-attention (no modulation, no rope)
    vid = vid + _attend(blk["attn2"], cfg, _rms_nw(vid, eps), txt, nh,
                        None, None, eps)
    aud = aud + _attend(blk["audio_attn2"], cfg, _rms_nw(aud, eps), atxt,
                        anh, None, None, eps)

    # 3. a2v / v2a cross-attention (audio-width heads, time-only rope)
    hv = _rms_nw(vid, eps)
    ha = _rms_nw(aud, eps)
    va2v_sc, va2v_sh, vv2a_sc, vv2a_sh = _table_mod(
        blk["video_ca_table"][:4], ca_ss, 4)
    (a2v_gate,) = _table_mod(blk["video_ca_table"][4:], ca_gate, 1)
    aa2v_sc, aa2v_sh, av2a_sc, av2a_sh = _table_mod(
        blk["audio_ca_table"][:4], ca_ss_a, 4)
    (v2a_gate,) = _table_mod(blk["audio_ca_table"][4:], ca_gate_a, 1)

    q_v = hv * (1 + va2v_sc) + va2v_sh
    kv_a = ha * (1 + aa2v_sc) + aa2v_sh
    vid = vid + a2v_gate * _attend(blk["audio_to_video_attn"], cfg, q_v,
                                   kv_a, anh, cav_rope, caa_rope, eps)
    q_a = ha * (1 + av2a_sc) + av2a_sh
    kv_v = hv * (1 + vv2a_sc) + vv2a_sh
    aud = aud + v2a_gate * _attend(blk["video_to_audio_attn"], cfg, q_a,
                                   kv_v, anh, caa_rope, cav_rope, eps)

    # 4. feedforward
    h = _rms_nw(vid, eps) * (1 + sc2) + sh2
    vid = vid + g2 * _ff(h, blk["ff"])
    ha = _rms_nw(aud, eps) * (1 + asc2) + ash2
    aud = aud + ag2 * _ff(ha, blk["audio_ff"])
    return vid, aud


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def ltx2_forward(params: Params, cfg: LTX2Config, video: jnp.ndarray,
                 audio: jnp.ndarray, text_states: jnp.ndarray,
                 audio_text_states: jnp.ndarray, timesteps: jnp.ndarray,
                 video_dims: tuple, audio_num_frames: int,
                 fps: float = 24.0, mesh=None):
    """video [B, Tv, in_channels] (patchified latents, Tv = f·h·w at
    patch 1), audio [B, Ta, audio_in_channels], text_states
    [B, Tt, caption_channels] (+ the audio text variant), timesteps [B]
    flow-match t ∈ [0,1] (scaled by timestep_scale_multiplier inside),
    video_dims = (frames, height, width) of the latent grid →
    (video velocity [B, Tv, out_channels], audio velocity
    [B, Ta, audio_out_channels])."""
    del mesh
    b = video.shape[0]
    f, h, w = video_dims
    t_scaled = timesteps.astype(jnp.float32) * cfg.timestep_scale_multiplier
    gate_factor = (cfg.cross_attn_timestep_scale_multiplier /
                   cfg.timestep_scale_multiplier)

    vcoords = ltx2_video_coords(cfg, f, h, w, fps)
    acoords = ltx2_audio_coords(cfg, audio_num_frames)
    v_rope = ltx2_rope(vcoords, cfg.inner_dim,
                       (cfg.pos_embed_max_pos, cfg.base_height,
                        cfg.base_width), cfg.rope_theta)
    a_rope = ltx2_rope(acoords, cfg.audio_inner_dim,
                       (cfg.audio_pos_embed_max_pos,), cfg.rope_theta)
    ca_max = max(cfg.pos_embed_max_pos, cfg.audio_pos_embed_max_pos)
    cav_rope = ltx2_rope(vcoords[:1], cfg.audio_cross_attention_dim,
                         (ca_max,), cfg.rope_theta)
    caa_rope = ltx2_rope(acoords[:1], cfg.audio_cross_attention_dim,
                         (ca_max,), cfg.rope_theta)

    vid = linear(video, params["proj_in"])
    aud = linear(audio, params["audio_proj_in"])
    dtype = vid.dtype

    temb, emb_t = _ada_single(params["time_embed"], t_scaled, dtype)
    temb_a, emb_ta = _ada_single(params["audio_time_embed"], t_scaled,
                                 dtype)
    ca_ss, _ = _ada_single(params["av_video_scale_shift"], t_scaled,
                           dtype)
    ca_ss_a, _ = _ada_single(params["av_audio_scale_shift"], t_scaled,
                             dtype)
    ca_gate, _ = _ada_single(params["av_video_a2v_gate"],
                             t_scaled * gate_factor, dtype)
    ca_gate_a, _ = _ada_single(params["av_audio_v2a_gate"],
                               t_scaled * gate_factor, dtype)

    txt = _caption_proj(params["caption_projection"], text_states)
    atxt = _caption_proj(params["audio_caption_projection"],
                         audio_text_states)

    for blk in params["blocks"]:
        vid, aud = ltx2_block(blk, cfg, vid, aud, txt, atxt, temb,
                              temb_a, ca_ss, ca_ss_a, ca_gate, ca_gate_a,
                              v_rope, a_rope, cav_rope, caa_rope)

    # output modulation: table [2, D] + the PRE-linear embedded
    # timestep broadcast across both entries (reference :1761 —
    # scale_shift_table[None, None] + embedded_timestep[:, :, None])
    def out_mod(table, emb):
        if emb.ndim == 2:
            emb = emb[:, None, :]
        return (table[0][None, None] + emb, table[1][None, None] + emb)

    sh_o, sc_o = out_mod(params["scale_shift_table"], emb_t)
    vid = _ln_nb(vid, 1e-6) * (1 + sc_o) + sh_o
    vid = linear(vid, params["proj_out"])
    sha_o, sca_o = out_mod(params["audio_scale_shift_table"], emb_ta)
    aud = _ln_nb(aud, 1e-6) * (1 + sca_o) + sha_o
    aud = linear(aud, params["audio_proj_out"])
    return vid, aud


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def _attn_slot(keys, q_dim, kv_dim, inner, out_dim, dtype):
    return {
        "to_q": _lin(next(keys), q_dim, inner, dtype),
        "to_k": _lin(next(keys), kv_dim, inner, dtype),
        "to_v": _lin(next(keys), kv_dim, inner, dtype),
        "to_out": _lin(next(keys), inner, out_dim, dtype),
        "norm_q": jnp.ones((inner,), dtype),
        "norm_k": jnp.ones((inner,), dtype),
    }


def _ada_slot(keys, dim, n_mod, dtype):
    return {
        "emb": {"linear_1": _lin(next(keys), 256, dim, dtype),
                "linear_2": _lin(next(keys), dim, dim, dtype)},
        "linear": _lin(next(keys), dim, n_mod * dim, dtype, scale=0.02),
    }


def init_ltx2_params(cfg: LTX2Config, key: jax.Array,
                     dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 40 + 40))
    hs, ahs = cfg.inner_dim, cfg.audio_inner_dim
    cap = cfg.caption_channels
    params: Params = {
        "proj_in": _lin(next(keys), cfg.in_channels, hs, dtype),
        "audio_proj_in": _lin(next(keys), cfg.audio_in_channels, ahs,
                              dtype),
        "caption_projection": {
            "linear_1": _lin(next(keys), cap, hs, dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype)},
        "audio_caption_projection": {
            "linear_1": _lin(next(keys), cap, ahs, dtype),
            "linear_2": _lin(next(keys), ahs, ahs, dtype)},
        "time_embed": _ada_slot(keys, hs, 6, dtype),
        "audio_time_embed": _ada_slot(keys, ahs, 6, dtype),
        "av_video_scale_shift": _ada_slot(keys, hs, 4, dtype),
        "av_audio_scale_shift": _ada_slot(keys, ahs, 4, dtype),
        "av_video_a2v_gate": _ada_slot(keys, hs, 1, dtype),
        "av_audio_v2a_gate": _ada_slot(keys, ahs, 1, dtype),
        "scale_shift_table": (jax.random.normal(
            next(keys), (2, hs), jnp.float32) / hs ** 0.5).astype(dtype),
        "audio_scale_shift_table": (jax.random.normal(
            next(keys), (2, ahs), jnp.float32) / ahs ** 0.5).astype(dtype),
        "proj_out": _lin(next(keys), hs, cfg.out_channels, dtype),
        "audio_proj_out": _lin(next(keys), ahs, cfg.audio_out_channels,
                               dtype),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "attn1": _attn_slot(keys, hs, hs, hs, hs, dtype),
            "audio_attn1": _attn_slot(keys, ahs, ahs, ahs, ahs, dtype),
            "attn2": _attn_slot(keys, hs, cfg.cross_attention_dim, hs,
                                hs, dtype),
            "audio_attn2": _attn_slot(keys, ahs,
                                      cfg.audio_cross_attention_dim,
                                      ahs, ahs, dtype),
            "audio_to_video_attn": _attn_slot(keys, hs, ahs, ahs, hs,
                                              dtype),
            "video_to_audio_attn": _attn_slot(keys, ahs, hs, ahs, ahs,
                                              dtype),
            "ff": {"net0": _lin(next(keys), hs, 4 * hs, dtype),
                   "net2": _lin(next(keys), 4 * hs, hs, dtype)},
            "audio_ff": {"net0": _lin(next(keys), ahs, 4 * ahs, dtype),
                         "net2": _lin(next(keys), 4 * ahs, ahs, dtype)},
            "scale_shift_table": (jax.random.normal(
                next(keys), (6, hs), jnp.float32) / hs ** 0.5
            ).astype(dtype),
            "audio_scale_shift_table": (jax.random.normal(
                next(keys), (6, ahs), jnp.float32) / ahs ** 0.5
            ).astype(dtype),
            "video_ca_table": jax.random.normal(
                next(keys), (5, hs), jnp.float32).astype(dtype),
            "audio_ca_table": jax.random.normal(
                next(keys), (5, ahs), jnp.float32).astype(dtype),
        })
    return params


def ltx2_param_shardings(params: Params) -> Params:
    """TP over "tp": attention/mlp in-projections column-split, out
    row-split; everything else replicates. NOTE: the qk rms norm is
    across the whole projection — under tp>1 it would need a psum of
    the squared sum (reference TensorParallelRMSNorm), so v1 keeps
    attention replicated and shards only the FFs."""
    col = {"net0"}
    row = {"net2"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


_TOP_LINEAR = {
    "proj_in": "proj_in", "audio_proj_in": "audio_proj_in",
    "proj_out": "proj_out", "audio_proj_out": "audio_proj_out",
}
_ADA_SLOTS = {
    "time_embed": "time_embed", "audio_time_embed": "audio_time_embed",
    "av_cross_attn_video_scale_shift": "av_video_scale_shift",
    "av_cross_attn_audio_scale_shift": "av_audio_scale_shift",
    "av_cross_attn_video_a2v_gate": "av_video_a2v_gate",
    "av_cross_attn_audio_v2a_gate": "av_audio_v2a_gate",
}
_BLOCK_TABLES = {
    "scale_shift_table": "scale_shift_table",
    "audio_scale_shift_table": "audio_scale_shift_table",
    "video_a2v_cross_attn_scale_shift_table": "video_ca_table",
    "audio_a2v_cross_attn_scale_shift_table": "audio_ca_table",
}
_ATTNS = {"attn1", "audio_attn1", "attn2", "audio_attn2",
          "audio_to_video_attn", "video_to_audio_attn"}


def assign_ltx2_tensor(params: Params, name: str, value, dtype) -> bool:
    """Map one diffusers-format tensor (LTX2VideoTransformer3DModel
    naming, reference load_weights :1779 — we keep q/k/v separate).
    Torch Linear [out, in] transposes. Returns False if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    parts = name.split(".")
    if parts[0] in _TOP_LINEAR and len(parts) == 2:
        put(params[_TOP_LINEAR[parts[0]]],
            "w" if parts[1] == "weight" else "b", value)
        return True
    if parts[0] in ("scale_shift_table", "audio_scale_shift_table") \
            and len(parts) == 1:
        params[parts[0]] = b(value)
        return True
    if parts[0] in ("caption_projection", "audio_caption_projection"):
        slot = params[parts[0]].get(parts[1])
        if slot is None:
            return False
        put(slot, "w" if parts[2] == "weight" else "b", value)
        return True
    if parts[0] in _ADA_SLOTS:
        slot = params[_ADA_SLOTS[parts[0]]]
        if parts[1] == "linear":
            put(slot["linear"], "w" if parts[2] == "weight" else "b",
                value)
            return True
        if parts[1] == "emb" and parts[2] == "timestep_embedder":
            put(slot["emb"][parts[3]],
                "w" if parts[4] == "weight" else "b", value)
            return True
        return False
    if parts[0] != "transformer_blocks":
        return False
    blk = params["blocks"][int(parts[1])]
    rest = parts[2:]
    if rest[0] in _BLOCK_TABLES and len(rest) == 1:
        blk[_BLOCK_TABLES[rest[0]]] = b(value)
        return True
    if rest[0] in _ATTNS:
        a = blk[rest[0]]
        if rest[1] in ("to_q", "to_k", "to_v"):
            put(a[rest[1]], "w" if rest[2] == "weight" else "b", value)
            return True
        if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
            a[rest[1]] = b(value)
            return True
        if rest[1] == "to_out":
            leaf = rest[3] if rest[2] == "0" else rest[2]
            put(a["to_out"], "w" if leaf == "weight" else "b", value)
            return True
        return False
    if rest[0] in ("ff", "audio_ff") and rest[1] == "net":
        mlp = blk[rest[0]]
        if rest[2] == "0":  # net.0.proj.{weight,bias}
            put(mlp["net0"], "w" if rest[4] == "weight" else "b", value)
            return True
        if rest[2] == "2":
            put(mlp["net2"], "w" if rest[3] == "weight" else "b", value)
            return True
    return False
