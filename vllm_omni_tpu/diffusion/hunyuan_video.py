"""HunyuanVideo-1.5 video DiT with real checkpoint geometry.

Reference parity: diffusion/models/hunyuan_video/
hunyuan_video_15_transformer.py (HunyuanVideo15Transformer3DModel :533 —
54 dual-stream blocks :465, token-refiner context embedder :227, ByT5
projection :275, image projection :294, 3-source context reordering
:675-718) and pipeline_hunyuan_video_1_5.py (65-channel model input =
[latent, cond_latent, mask] :458, scheduler timesteps in train units).

TPU-first like flux.py: a pure function over a param pytree keyed by
the diffusers module names, one jitted program per resolution bucket.

Differences vs Flux worth keeping straight (reference :312-318):
* RoPE applies ONLY to the video stream's q/k BEFORE concatenation with
  the context stream (Flux ropes the concatenated joint stream);
* joint-stream order is [video; context] (Flux is [txt; img]);
* the context stream is built from THREE sources — token-refined MLLM
  states, ByT5 byte-level states, vision semantic tokens — each tagged
  with a learned cond_type embedding, then reordered so valid tokens
  pack to the front: [img?, byt5?, mllm?, pad...] (:675);
* attention carries a key-validity mask over the context tokens;
* the context embedder is a 2-layer self-attention "token refiner"
  conditioned on (timestep, masked-mean pooled text) rather than a
  single linear.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import (_constrain, _layer_norm_nb,
                                         apply_rope_interleaved)
from vllm_omni_tpu.diffusion.qwen_image import (_ada_norm, _ff,
                                                _mod_chunks,
                                                _qwen_timestep_embedding)
from vllm_omni_tpu.diffusion.wan import wan_pack_latents
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class HunyuanVideoConfig:
    """Mirrors the transformer's diffusers config.json
    (HunyuanVideo15Transformer3DModel.__init__ defaults :550: 54 layers,
    16 heads × 128, in 65 = 32 latent + 32 cond + 1 mask, MLLM text
    3584, ByT5 1472, vision 1152, rope theta 256 over (16, 56, 56))."""

    in_channels: int = 65
    out_channels: int = 32
    num_attention_heads: int = 16
    attention_head_dim: int = 128
    num_layers: int = 54
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    patch_size: int = 1
    patch_size_t: int = 1
    text_embed_dim: int = 3584
    text_embed_2_dim: int = 1472
    image_embed_dim: int = 1152
    rope_theta: float = 256.0
    rope_axes_dim: tuple[int, int, int] = (16, 56, 56)
    use_meanflow: bool = False
    num_train_timesteps: int = 1000  # scheduler units for the sin embed
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def joint_attention_dim(self) -> int:
        return self.text_embed_dim

    @property
    def pack_factor(self) -> int:
        return self.patch_size

    @property
    def latent_channels(self) -> int:
        # model input = [latent, cond_latent, mask] (pipeline :458)
        return (self.in_channels - 1) // 2

    @classmethod
    def from_json(cls, cfg: dict) -> "HunyuanVideoConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "rope_axes_dim" in kw:
            kw["rope_axes_dim"] = tuple(kw["rope_axes_dim"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (HunyuanVideo15RotaryPosEmbed :93 — video tokens only)
# ---------------------------------------------------------------------------


def hunyuan_video_rope(cfg: HunyuanVideoConfig, f_tokens: int,
                       h_tokens: int, w_tokens: int
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [Tv, head_dim//2]: per-axis plain grid positions, dims
    split per rope_axes_dim, theta 256 (:101-121)."""
    d_t, d_h, d_w = cfg.rope_axes_dim
    assert d_t + d_h + d_w == cfg.attention_head_dim

    def axis_freqs(pos: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (cfg.rope_theta **
                     (np.arange(0, dim, 2, dtype=np.float64) / dim))
        return pos.astype(np.float64)[:, None] * inv[None, :]

    gf, gh, gw = np.meshgrid(np.arange(f_tokens), np.arange(h_tokens),
                             np.arange(w_tokens), indexing="ij")
    freqs = np.concatenate([axis_freqs(gf.reshape(-1), d_t),
                            axis_freqs(gh.reshape(-1), d_h),
                            axis_freqs(gw.reshape(-1), d_w)], axis=-1)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Context towers
# ---------------------------------------------------------------------------


def _silu_mlp(slot: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    h = linear(x.astype(dtype), slot["linear_1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(dtype)
    return linear(h, slot["linear_2"])


def _ln_affine(x: jnp.ndarray, slot: Params, eps: float) -> jnp.ndarray:
    return _layer_norm_nb(x, eps) * slot["w"] + slot["b"]


def _refiner_block(blk: Params, cfg: HunyuanVideoConfig, x: jnp.ndarray,
                   temb: jnp.ndarray, mask: Optional[jnp.ndarray]
                   ) -> jnp.ndarray:
    """HunyuanVideo15IndividualTokenRefinerBlock :124 — plain LN + biased
    self-attention + linear-silu FF, both gated by AdaNorm(temb)."""
    b, s, hs = x.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    a = blk["attn"]
    xn = _ln_affine(x, blk["norm1"], cfg.eps)
    q = linear(xn, a["to_q"]).reshape(b, s, nh, hd)
    k = linear(xn, a["to_k"]).reshape(b, s, nh, hd)
    v = linear(xn, a["to_v"]).reshape(b, s, nh, hd)
    o = mha_xla(q, k, v, scale=hd ** -0.5, key_mask=mask)
    attn_out = linear(o.reshape(b, s, hs), a["to_out"])

    # AdaNorm :50 — silu(temb) → linear → (gate_msa, gate_mlp)
    g = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype),
               blk["norm_out"])
    gate_msa, gate_mlp = g[:, None, :hs], g[:, None, hs:]
    x = x + attn_out * gate_msa

    h = linear(_ln_affine(x, blk["norm2"], cfg.eps), blk["ff"]["net0"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return x + linear(h, blk["ff"]["net2"]) * gate_mlp


def _token_refiner(params: Params, cfg: HunyuanVideoConfig,
                   text_states: jnp.ndarray, t_train: jnp.ndarray,
                   mask: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    """HunyuanVideo15TokenRefiner :227 — temb = timestep embed +
    silu-MLP of the masked-mean pooled raw text, proj_in, N blocks."""
    ce = params["context_embedder"]
    if mask is None:
        pooled = jnp.mean(text_states, axis=1)
    else:
        mf = mask.astype(jnp.float32)[..., None]
        pooled = ((text_states.astype(jnp.float32) * mf).sum(axis=1) /
                  jnp.maximum(mf.sum(axis=1), 1e-6)).astype(dtype)
    tte = ce["time_text_embed"]
    temb = _silu_mlp(tte["timestep_embedder"],
                     _qwen_timestep_embedding(t_train, scale=1.0), dtype)
    # PixArtAlphaTextProjection(act="silu"): linear_1 → silu → linear_2
    temb = temb + _silu_mlp(tte["text_embedder"], pooled, dtype)
    x = linear(text_states.astype(dtype), ce["proj_in"])
    for blk in ce["refiner_blocks"]:
        x = _refiner_block(blk, cfg, x, temb, mask)
    return x


def _byt5_projection(params: Params, x: jnp.ndarray, eps: float,
                     dtype) -> jnp.ndarray:
    """HunyuanVideo15ByT5TextProjection :275 — LN → 3 linears with GELU
    between the first two pairs."""
    ce2 = params["context_embedder_2"]
    h = _ln_affine(x.astype(dtype), ce2["norm"], eps)
    h = linear(h, ce2["linear_1"])
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(dtype)
    h = linear(h, ce2["linear_2"])
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(dtype)
    return linear(h, ce2["linear_3"])


def _image_projection(params: Params, x: jnp.ndarray, eps: float,
                      dtype) -> jnp.ndarray:
    """HunyuanVideo15ImageProjection :294 — LN → linear → GELU → linear
    → LN."""
    ie = params["image_embedder"]
    h = _ln_affine(x.astype(dtype), ie["norm_in"], eps)
    h = linear(h, ie["linear_1"])
    h = jax.nn.gelu(h.astype(jnp.float32)).astype(dtype)
    h = linear(h, ie["linear_2"])
    return _ln_affine(h, ie["norm_out"], eps)


def _reorder_context(streams: list[jnp.ndarray],
                     masks: list[jnp.ndarray]
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reference :675-718: pack [valid img, valid byt5, valid mllm,
    invalid img (raw), zeros...] preserving source order within each
    class. A static-shape argsort gather: sort key = class·S + position
    (strictly increasing inside a class, so ordering is exact)."""
    n = len(streams)
    embs, msks, cats = [], [], []
    for i, (e, m) in enumerate(zip(streams, masks)):
        if i != 0:  # invalid text embeddings zero; invalid image kept raw
            e = e * m[..., None].astype(e.dtype)
        embs.append(e)
        msks.append(m)
        cats.append(jnp.where(m, i, n + i))
    e = jnp.concatenate(embs, axis=1)
    m = jnp.concatenate(msks, axis=1)
    c = jnp.concatenate(cats, axis=1)
    s = e.shape[1]
    order = jnp.argsort(c * s + jnp.arange(s)[None, :], axis=1)
    e = jnp.take_along_axis(e, order[..., None], axis=1)
    m = jnp.take_along_axis(m, order, axis=1)
    return e, m


# ---------------------------------------------------------------------------
# Main dual-stream block (:465)
# ---------------------------------------------------------------------------


def hunyuan_video_block(blk: Params, cfg: HunyuanVideoConfig,
                        vid: jnp.ndarray, ctx: jnp.ndarray,
                        temb: jnp.ndarray, cos: jnp.ndarray,
                        sin: jnp.ndarray,
                        ctx_mask: Optional[jnp.ndarray] = None,
                        mesh=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """AdaLN-Zero modulated joint attention; RoPE on the VIDEO q/k only,
    joint order [video; ctx] (:433), per-stream gelu MLPs."""
    hs = cfg.inner_dim
    b, tv, _ = vid.shape
    tc = ctx.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(vid.dtype)
    vid_m1, vid_m2 = _mod_chunks(linear(silu_t, blk["norm1"]), hs)
    ctx_m1, ctx_m2 = _mod_chunks(linear(silu_t, blk["norm1_context"]), hs)

    vid_h = _ada_norm(vid, vid_m1[0], vid_m1[1], cfg.eps)
    ctx_h = _ada_norm(ctx, ctx_m1[0], ctx_m1[1], cfg.eps)

    a = blk["attn"]
    vq = rms_norm(linear(vid_h, a["to_q"]).reshape(b, tv, nh, hd),
                  a["norm_q"], eps=cfg.eps)
    vk = rms_norm(linear(vid_h, a["to_k"]).reshape(b, tv, nh, hd),
                  a["norm_k"], eps=cfg.eps)
    vv = linear(vid_h, a["to_v"]).reshape(b, tv, nh, hd)
    vq = apply_rope_interleaved(vq, cos, sin)
    vk = apply_rope_interleaved(vk, cos, sin)

    cq = rms_norm(linear(ctx_h, a["add_q_proj"]).reshape(b, tc, nh, hd),
                  a["norm_added_q"], eps=cfg.eps)
    ck = rms_norm(linear(ctx_h, a["add_k_proj"]).reshape(b, tc, nh, hd),
                  a["norm_added_k"], eps=cfg.eps)
    cv = linear(ctx_h, a["add_v_proj"]).reshape(b, tc, nh, hd)

    q = jnp.concatenate([vq, cq], axis=1)
    k = jnp.concatenate([vk, ck], axis=1)
    v = jnp.concatenate([vv, cv], axis=1)
    key_mask = None
    if ctx_mask is not None:
        key_mask = jnp.concatenate(
            [jnp.ones((b, tv), bool), ctx_mask.astype(bool)], axis=1)
    if mesh is not None:
        head_spec = P("cfg", None, ("ulysses", "tp"), None)
        q = _constrain(q, mesh, head_spec)
        k = _constrain(k, mesh, head_spec)
        v = _constrain(v, mesh, head_spec)
    o = mha_xla(q, k, v, scale=hd ** -0.5, key_mask=key_mask)
    if mesh is not None:
        o = _constrain(o, mesh, P("cfg", "ulysses", None, None))
    o = o.reshape(b, tv + tc, nh * hd)

    vid = vid + vid_m1[2][:, None, :] * linear(o[:, :tv], a["to_out"])
    ctx = ctx + ctx_m1[2][:, None, :] * linear(o[:, tv:], a["to_add_out"])

    vid_h2 = _ada_norm(vid, vid_m2[0], vid_m2[1], cfg.eps)
    vid = vid + vid_m2[2][:, None, :] * _ff(vid_h2, blk["ff"])
    ctx_h2 = _ada_norm(ctx, ctx_m2[0], ctx_m2[1], cfg.eps)
    ctx = ctx + ctx_m2[2][:, None, :] * _ff(ctx_h2, blk["ff_context"])
    return vid, ctx


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def hunyuan_video_forward(params: Params, cfg: HunyuanVideoConfig,
                          latents: jnp.ndarray,
                          text_states: jnp.ndarray,
                          timesteps: jnp.ndarray,
                          text_mask: Optional[jnp.ndarray] = None,
                          text_states_2: Optional[jnp.ndarray] = None,
                          text_mask_2: Optional[jnp.ndarray] = None,
                          image_embeds: Optional[jnp.ndarray] = None,
                          image_embeds_mask: Optional[jnp.ndarray] = None,
                          cond_latents: Optional[jnp.ndarray] = None,
                          cond_mask: Optional[jnp.ndarray] = None,
                          timestep_r: Optional[jnp.ndarray] = None,
                          mesh=None) -> jnp.ndarray:
    """latents [B, F, H, W, C_lat] (or [B, H, W, C] → F=1), text_states
    [B, Tt, text_embed_dim] (MLLM), timesteps [B] flow-match t ∈ [0,1]
    (scaled to scheduler train units internally, pipeline :459).
    text_states_2 (ByT5) and image_embeds (vision tokens) default to
    zero/absent (T2V — reference zeroes them, :656-663). cond_latents +
    cond_mask default to zeros (T2V, pipeline :358-362) → the 65-channel
    model input. Returns velocity [B, F, H, W, out_channels]."""
    squeeze_f = latents.ndim == 4
    if squeeze_f:
        latents = latents[:, None]
    b, f, h, w, c = latents.shape
    pt, ps = cfg.patch_size_t, cfg.patch_size
    dtype = params["proj_out"]["w"].dtype
    latents = latents.astype(dtype)

    if cond_latents is None:
        cond_latents = jnp.zeros_like(latents)
    if cond_mask is None:
        cond_mask = jnp.zeros(latents.shape[:-1] + (1,), dtype)
    x_in = jnp.concatenate([latents, cond_latents.astype(dtype),
                            cond_mask.astype(dtype)], axis=-1)

    x = wan_pack_latents(x_in, (pt, ps, ps))  # conv3d feature order
    x = linear(x, params["x_embedder"])
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    t_train = timesteps.astype(jnp.float32) * cfg.num_train_timesteps
    te = params["time_embed"]
    temb = _silu_mlp(te["timestep_embedder"],
                     _qwen_timestep_embedding(t_train, scale=1.0), dtype)
    if cfg.use_meanflow and "timestep_embedder_r" in te:
        tr = (timestep_r if timestep_r is not None
              else jnp.zeros_like(timesteps))
        tr_train = tr.astype(jnp.float32) * cfg.num_train_timesteps
        temb = temb + _silu_mlp(
            te["timestep_embedder_r"],
            _qwen_timestep_embedding(tr_train, scale=1.0), dtype)

    # Three context sources, each tagged with cond_type_embed (:639-673)
    ct = params["cond_type_embed"].astype(dtype)  # [3, inner]
    mllm = _token_refiner(params, cfg, text_states, t_train, text_mask,
                          dtype) + ct[0]
    if text_mask is None:
        text_mask = jnp.ones(text_states.shape[:2], bool)
    if text_states_2 is None:
        text_states_2 = jnp.zeros((b, 0, cfg.text_embed_2_dim), dtype)
        text_mask_2 = jnp.zeros((b, 0), bool)
    elif text_mask_2 is None:
        text_mask_2 = jnp.ones(text_states_2.shape[:2], bool)
    byt5 = _byt5_projection(params, text_states_2, cfg.eps, dtype) + ct[1]
    if image_embeds is None:
        image_embeds = jnp.zeros((b, 0, cfg.image_embed_dim), dtype)
        image_embeds_mask = jnp.zeros((b, 0), bool)
    img_tok = _image_projection(params, image_embeds, cfg.eps, dtype)
    if image_embeds_mask is None:
        # reference fallback :655-663 detects T2V by an all-zeros check
        # (data-dependent in torch); the serving path passes None for
        # T2V (zero-length tokens above) or an explicit mask for i2v —
        # so a present-but-maskless call means all tokens are valid.
        image_embeds_mask = jnp.ones(image_embeds.shape[:2], bool)
    img_tok = img_tok + ct[2]  # invalid image tokens stay RAW (:696)

    ctx, ctx_mask = _reorder_context(
        [img_tok, byt5, mllm],
        [image_embeds_mask.astype(bool), text_mask_2.astype(bool),
         text_mask.astype(bool)])

    cos, sin = hunyuan_video_rope(cfg, f // pt, h // ps, w // ps)

    for blk in params["blocks"]:
        x, ctx = hunyuan_video_block(blk, cfg, x, ctx, temb, cos, sin,
                                     ctx_mask=ctx_mask, mesh=mesh)

    # AdaLayerNormContinuous (scale chunked first, like flux :608)
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                 params["norm_out"])
    hs = cfg.inner_dim
    out = _ada_norm(x, fin[:, hs:], fin[:, :hs], cfg.eps)
    out = linear(out, params["proj_out"])

    # unpatchify :732-736 — output features ordered (c, pt, ph, pw),
    # channel OUTERMOST (reference permutes to NCFHW)
    oc = cfg.out_channels
    out = out.reshape(b, f // pt, h // ps, w // ps, oc, pt, ps, ps)
    out = out.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    out = out.reshape(b, f, h, w, oc)
    return out[:, 0] if squeeze_f else out


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def _ln_slot(n, dtype):
    return {"w": jnp.ones((n,), dtype), "b": jnp.zeros((n,), dtype)}


def init_hunyuan_video_params(cfg: HunyuanVideoConfig, key: jax.Array,
                              dtype=jnp.bfloat16) -> Params:
    n_keys = (cfg.num_layers * 16 + cfg.num_refiner_layers * 8 + 24)
    keys = iter(jax.random.split(key, n_keys))
    hs = cfg.inner_dim
    hd = cfg.attention_head_dim
    mlp = int(hs * cfg.mlp_ratio)
    pin = cfg.in_channels * cfg.patch_size_t * cfg.patch_size ** 2
    pout = cfg.out_channels * cfg.patch_size_t * cfg.patch_size ** 2
    te = {"timestep_embedder": {"linear_1": _lin(next(keys), 256, hs,
                                                 dtype),
                                "linear_2": _lin(next(keys), hs, hs,
                                                 dtype)}}
    if cfg.use_meanflow:
        te["timestep_embedder_r"] = {
            "linear_1": _lin(next(keys), 256, hs, dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype)}
    params: Params = {
        "x_embedder": _lin(next(keys), pin, hs, dtype),
        "image_embedder": {
            "norm_in": _ln_slot(cfg.image_embed_dim, dtype),
            "linear_1": _lin(next(keys), cfg.image_embed_dim,
                             cfg.image_embed_dim, dtype),
            "linear_2": _lin(next(keys), cfg.image_embed_dim, hs, dtype),
            "norm_out": _ln_slot(hs, dtype),
        },
        "context_embedder": {
            "time_text_embed": {
                "timestep_embedder": {
                    "linear_1": _lin(next(keys), 256, hs, dtype),
                    "linear_2": _lin(next(keys), hs, hs, dtype)},
                "text_embedder": {
                    "linear_1": _lin(next(keys), cfg.text_embed_dim, hs,
                                     dtype),
                    "linear_2": _lin(next(keys), hs, hs, dtype)},
            },
            "proj_in": _lin(next(keys), cfg.text_embed_dim, hs, dtype),
            "refiner_blocks": [],
        },
        "context_embedder_2": {
            "norm": _ln_slot(cfg.text_embed_2_dim, dtype),
            "linear_1": _lin(next(keys), cfg.text_embed_2_dim, 2048,
                             dtype),
            "linear_2": _lin(next(keys), 2048, 2048, dtype),
            "linear_3": _lin(next(keys), 2048, hs, dtype),
        },
        "time_embed": te,
        "cond_type_embed": (jax.random.normal(
            next(keys), (3, hs), jnp.float32) * 0.02).astype(dtype),
        "norm_out": _lin(next(keys), hs, 2 * hs, dtype, scale=0.02),
        "proj_out": _lin(next(keys), hs, pout, dtype),
        "blocks": [],
    }
    for _ in range(cfg.num_refiner_layers):
        params["context_embedder"]["refiner_blocks"].append({
            "norm1": _ln_slot(hs, dtype),
            "attn": {"to_q": _lin(next(keys), hs, hs, dtype),
                     "to_k": _lin(next(keys), hs, hs, dtype),
                     "to_v": _lin(next(keys), hs, hs, dtype),
                     "to_out": _lin(next(keys), hs, hs, dtype)},
            "norm2": _ln_slot(hs, dtype),
            "ff": {"net0": _lin(next(keys), hs, mlp, dtype),
                   "net2": _lin(next(keys), mlp, hs, dtype)},
            "norm_out": _lin(next(keys), hs, 2 * hs, dtype, scale=0.02),
        })
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "norm1": _lin(next(keys), hs, 6 * hs, dtype, scale=0.02),
            "norm1_context": _lin(next(keys), hs, 6 * hs, dtype,
                                  scale=0.02),
            "attn": {
                "to_q": _lin(next(keys), hs, hs, dtype),
                "to_k": _lin(next(keys), hs, hs, dtype),
                "to_v": _lin(next(keys), hs, hs, dtype),
                "add_q_proj": _lin(next(keys), hs, hs, dtype),
                "add_k_proj": _lin(next(keys), hs, hs, dtype),
                "add_v_proj": _lin(next(keys), hs, hs, dtype),
                "to_out": _lin(next(keys), hs, hs, dtype),
                "to_add_out": _lin(next(keys), hs, hs, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
                "norm_added_q": jnp.ones((hd,), dtype),
                "norm_added_k": jnp.ones((hd,), dtype),
            },
            "ff": {"net0": _lin(next(keys), hs, mlp, dtype),
                   "net2": _lin(next(keys), mlp, hs, dtype)},
            "ff_context": {"net0": _lin(next(keys), hs, mlp, dtype),
                           "net2": _lin(next(keys), mlp, hs, dtype)},
        })
    return params


def hunyuan_video_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/mlp-in column-split, out/mlp-out row-split —
    the reference TPs exactly these (QKVParallelLinear /
    RowParallelLinear, :344-381); everything else replicates."""
    col = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
           "add_v_proj", "net0"}
    row = {"to_out", "to_add_out", "net2"}

    def walk(path: tuple, leaf) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_hunyuan_video_tensor(params: Params, name: str, value,
                                dtype) -> bool:
    """Map one diffusers-format tensor (HunyuanVideo15Transformer3DModel
    naming, reference load_weights :743) into the pytree. Torch Linear
    weights [out, in] transpose to [in, out]; the Conv3d x_embedder
    flattens (c, pt, ph, pw). Returns False if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    def put_lin(slot: dict, which: str, v) -> bool:
        put(slot, "w" if which == "weight" else "b", v)
        return True

    def put_ln(slot: dict, which: str, v) -> bool:
        slot["w" if which == "weight" else "b"] = b(v)
        return True

    parts = name.split(".")
    if parts[0] == "x_embedder":  # x_embedder.proj.{weight,bias}
        if parts[-1] == "weight":
            o = value.shape[0]
            params["x_embedder"]["w"] = jnp.asarray(
                _np.ascontiguousarray(value.reshape(o, -1).T)).astype(
                    dtype)
        else:
            params["x_embedder"]["b"] = b(value)
        return True
    if parts[0] == "cond_type_embed" and parts[1] == "weight":
        params["cond_type_embed"] = b(value)
        return True
    if parts[0] == "image_embedder":
        ie = params["image_embedder"]
        if parts[1] in ("norm_in", "norm_out"):
            return put_ln(ie[parts[1]], parts[2], value)
        if parts[1] in ("linear_1", "linear_2"):
            return put_lin(ie[parts[1]], parts[2], value)
        return False
    if parts[0] == "context_embedder_2":
        ce2 = params["context_embedder_2"]
        if parts[1] == "norm":
            return put_ln(ce2["norm"], parts[2], value)
        if parts[1] in ("linear_1", "linear_2", "linear_3"):
            return put_lin(ce2[parts[1]], parts[2], value)
        return False
    if parts[0] == "time_embed":
        te = params["time_embed"]
        if parts[1] in ("timestep_embedder", "timestep_embedder_r"):
            slot = te.get(parts[1], {}).get(parts[2])
            if slot is None:
                return False
            return put_lin(slot, parts[3], value)
        return False
    if parts[0] == "context_embedder":
        ce = params["context_embedder"]
        if parts[1] == "time_text_embed":
            slot = ce["time_text_embed"].get(parts[2], {}).get(parts[3])
            if slot is None:
                return False
            return put_lin(slot, parts[4], value)
        if parts[1] == "proj_in":
            return put_lin(ce["proj_in"], parts[2], value)
        if parts[1] == "token_refiner" and parts[2] == "refiner_blocks":
            blk = ce["refiner_blocks"][int(parts[3])]
            rest = parts[4:]
            if rest[0] in ("norm1", "norm2"):
                return put_ln(blk[rest[0]], rest[1], value)
            if rest[0] == "attn":
                a = blk["attn"]
                if rest[1] in ("to_q", "to_k", "to_v"):
                    return put_lin(a[rest[1]], rest[2], value)
                if rest[1] == "to_out":
                    leaf = rest[3] if rest[2] == "0" else rest[2]
                    return put_lin(a["to_out"], leaf, value)
                return False
            if rest[0] == "ff" and rest[1] == "net":
                if rest[2] == "0":  # net.0.proj.{weight,bias}
                    return put_lin(blk["ff"]["net0"], rest[4], value)
                if rest[2] == "2":
                    return put_lin(blk["ff"]["net2"], rest[3], value)
                return False
            if rest[0] == "norm_out" and rest[1] == "linear":
                return put_lin(blk["norm_out"], rest[2], value)
        return False
    if parts[:2] == ["norm_out", "linear"]:
        return put_lin(params["norm_out"], parts[2], value)
    if parts[0] == "proj_out":
        return put_lin(params["proj_out"], parts[1], value)
    if parts[0] == "transformer_blocks":
        blk = params["blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] in ("norm1", "norm1_context") and rest[1] == "linear":
            return put_lin(blk[rest[0]], rest[2], value)
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k", "norm_added_q",
                           "norm_added_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v", "add_q_proj",
                           "add_k_proj", "add_v_proj", "to_add_out"):
                return put_lin(a[rest[1]], rest[2], value)
            if rest[1] == "to_out":
                leaf = rest[3] if rest[2] == "0" else rest[2]
                return put_lin(a["to_out"], leaf, value)
            return False
        if rest[0] in ("ff", "ff_context") and rest[1] == "net":
            mlp = blk[rest[0]]
            if rest[2] == "0":
                return put_lin(mlp["net0"], rest[4], value)
            if rest[2] == "2":
                return put_lin(mlp["net2"], rest[3], value)
        return False
    return False
