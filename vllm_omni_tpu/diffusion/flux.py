"""Flux MMDiT (double-stream + single-stream) with real checkpoint
geometry.

Reference parity: diffusion/models/flux/flux_transformer.py
(FluxTransformer2DModel :479 — 19 dual-stream FluxTransformerBlock :280
+ 38 FluxSingleTransformerBlock :371, FluxPosEmbed :449,
CombinedTimestepGuidanceTextProjEmbeddings for the guidance-distilled
variant, AdaLayerNormZero/ZeroSingle/Continuous modulation) and the
diffusers checkpoint naming its load_weights (:710) consumes.

TPU-first like qwen_image.py: a pure function over a param pytree keyed
by the diffusers module names; one jitted program per resolution bucket;
heads shard on "tp", the joint sequence on "ulysses".

Differences vs QwenImage worth keeping straight:
* rope ids are PLAIN grid positions — txt tokens all-zero ids, image
  rows/cols from 0 (QwenEmbedRope centers them and offsets text);
* temb adds a pooled CLIP projection and (guidance-distilled variant) a
  guidance embedding — timestep AND guidance are scaled x1000;
* after the dual-stream blocks the streams CONCATENATE and run through
  single-stream blocks (attn ∥ mlp, fused output projection);
* no txt_norm; context_embedder/x_embedder instead of txt_in/img_in.
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
from vllm_omni_tpu.diffusion.qwen_image import (_ada_norm, _ff,
                                                _mod_chunks,
                                                _qwen_timestep_embedding,
                                                pack_latents,
                                                unpack_latents)
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class FluxConfig:
    """Mirrors the transformer's diffusers config.json
    (FluxTransformer2DModel.__init__ defaults: 19+38 layers, 24 heads ×
    128, joint_attention_dim 4096, pooled_projection_dim 768,
    guidance_embeds True for -dev/-schnell-distilled)."""

    patch_size: int = 1  # diffusers config value; packing is 2x2 in the
    # pipeline (pack_factor below), matching FluxPipeline._pack_latents
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768
    guidance_embeds: bool = True
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)
    theta: float = 10000.0
    eps: float = 1e-6

    pack_factor: int = 2

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "FluxConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (FluxPosEmbed :449 — plain positions, txt ids zero)
# ---------------------------------------------------------------------------


def flux_rope(cfg: FluxConfig, h_tokens: int, w_tokens: int,
              txt_len: int, ref_hw=None
              ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint-stream cos/sin [Ttxt+Tvis(+Tref), head_dim//2], stream
    order [txt; img; ref]. ids = (frame=0, row, col) for image tokens,
    (0,0,0) for every text token (diffusers FluxPipeline
    txt_ids=zeros). ref_hw = (h2, w2) token grid of a Kontext
    reference image appended with frame coordinate 1
    (pipeline_flux_kontext.py:427 `image_ids[..., 0] = 1`)."""
    d_t, d_h, d_w = cfg.axes_dims_rope
    assert d_t + d_h + d_w == cfg.attention_head_dim

    def axis_freqs(pos: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (cfg.theta ** (np.arange(0, dim, 2, dtype=np.float64)
                                   / dim))
        return pos.astype(np.float64)[:, None] * inv[None, :]

    def grid(h, w, frame):
        rows = np.repeat(np.arange(h, dtype=np.float64), w)
        cols = np.tile(np.arange(w, dtype=np.float64), h)
        fr = np.full_like(rows, float(frame))
        return np.concatenate([axis_freqs(fr, d_t),
                               axis_freqs(rows, d_h),
                               axis_freqs(cols, d_w)], axis=-1)

    vis = grid(h_tokens, w_tokens, 0)
    zt = np.zeros((txt_len,), np.float64)
    txt = np.concatenate([axis_freqs(zt, d_t), axis_freqs(zt, d_h),
                          axis_freqs(zt, d_w)], axis=-1)
    parts = [txt, vis]
    if ref_hw is not None:
        parts.append(grid(ref_hw[0], ref_hw[1], 1))
    freqs = np.concatenate(parts, axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Conditioning (CombinedTimestep[Guidance]TextProjEmbeddings)
# ---------------------------------------------------------------------------


def flux_time_embed(params: Params, cfg: FluxConfig, t: jnp.ndarray,
                    pooled: jnp.ndarray,
                    guidance: Optional[jnp.ndarray], dtype) -> jnp.ndarray:
    """temb [B, inner] = timestep_embedder(sin(t·1000)) [+
    guidance_embedder(sin(g·1000))] + text_embedder(pooled)."""

    def mlp(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = linear(x.astype(dtype), slot["linear_1"])
        h = jax.nn.silu(h.astype(jnp.float32)).astype(dtype)
        return linear(h, slot["linear_2"])

    te = params["time_embed"]
    emb = mlp(te["timestep_embedder"],
              _qwen_timestep_embedding(t, scale=1000.0))
    if cfg.guidance_embeds:
        g = guidance if guidance is not None else jnp.zeros_like(t)
        emb = emb + mlp(te["guidance_embedder"],
                        _qwen_timestep_embedding(g, scale=1000.0))
    emb = emb + mlp(te["text_embedder"], pooled)
    return emb


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _joint_attention(att: Params, cfg: FluxConfig, img_h, txt_h, cos, sin,
                     mesh):
    """Shared by the dual-stream block: project both streams, concat
    [txt; img], rope, attend. Returns [B, Tt+Tv, inner]."""
    b, tv, _ = img_h.shape
    tt = txt_h.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim

    def qkv(x, p_q, p_k, p_v, n_tok):
        q = linear(x, p_q).reshape(b, n_tok, nh, hd)
        k = linear(x, p_k).reshape(b, n_tok, nh, hd)
        v = linear(x, p_v).reshape(b, n_tok, nh, hd)
        return q, k, v

    iq, ik, iv = qkv(img_h, att["to_q"], att["to_k"], att["to_v"], tv)
    tq, tk, tvv = qkv(txt_h, att["add_q_proj"], att["add_k_proj"],
                      att["add_v_proj"], tt)
    iq = rms_norm(iq, att["norm_q"], eps=cfg.eps)
    ik = rms_norm(ik, att["norm_k"], eps=cfg.eps)
    tq = rms_norm(tq, att["norm_added_q"], eps=cfg.eps)
    tk = rms_norm(tk, att["norm_added_k"], eps=cfg.eps)
    q = jnp.concatenate([tq, iq], axis=1)
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([tvv, iv], axis=1)
    return _rope_attend(q, k, v, cos, sin, hd, mesh)


def _rope_attend(q, k, v, cos, sin, hd, mesh):
    b, s, nh, _ = q.shape
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
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
        o = _constrain(o, mesh, P("cfg", "ulysses", None, None))
    return o.reshape(b, s, nh * hd)


def flux_double_block(blk: Params, cfg: FluxConfig, img: jnp.ndarray,
                      txt: jnp.ndarray, temb: jnp.ndarray,
                      cos: jnp.ndarray, sin: jnp.ndarray, mesh=None
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FluxTransformerBlock :280 — AdaLN-Zero modulated joint attention
    + per-stream gelu MLPs. Returns (img', txt')."""
    hs = cfg.inner_dim
    tt = txt.shape[1]
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)
    img_m1, img_m2 = _mod_chunks(linear(silu_t, blk["norm1"]), hs)
    txt_m1, txt_m2 = _mod_chunks(linear(silu_t, blk["norm1_context"]), hs)

    img_h = _ada_norm(img, img_m1[0], img_m1[1], cfg.eps)
    txt_h = _ada_norm(txt, txt_m1[0], txt_m1[1], cfg.eps)
    o = _joint_attention(blk["attn"], cfg, img_h, txt_h, cos, sin, mesh)
    img = img + img_m1[2][:, None, :] * linear(o[:, tt:],
                                               blk["attn"]["to_out"])
    txt = txt + txt_m1[2][:, None, :] * linear(o[:, :tt],
                                               blk["attn"]["to_add_out"])

    img_h2 = _ada_norm(img, img_m2[0], img_m2[1], cfg.eps)
    img = img + img_m2[2][:, None, :] * _ff(img_h2, blk["ff"])
    txt_h2 = _ada_norm(txt, txt_m2[0], txt_m2[1], cfg.eps)
    txt = txt + txt_m2[2][:, None, :] * _ff(txt_h2, blk["ff_context"])
    return img, txt


def flux_single_block(blk: Params, cfg: FluxConfig, x: jnp.ndarray,
                      temb: jnp.ndarray, cos: jnp.ndarray,
                      sin: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """FluxSingleTransformerBlock :371 — x is the CONCATENATED
    [txt; img] stream. attn (no out-proj) ∥ mlp, fused proj_out, single
    gate."""
    b, s, hs = x.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype)
    mod = linear(silu_t, blk["norm"])  # [B, 3H]: shift, scale, gate
    m = mod.reshape(b, 3, hs)
    shift, scale, gate = m[:, 0], m[:, 1], m[:, 2]

    xh = _layer_norm_nb(x, cfg.eps) * (1.0 + scale[:, None, :]) \
        + shift[:, None, :]
    att = blk["attn"]
    q = linear(xh, att["to_q"]).reshape(b, s, nh, hd)
    k = linear(xh, att["to_k"]).reshape(b, s, nh, hd)
    v = linear(xh, att["to_v"]).reshape(b, s, nh, hd)
    q = rms_norm(q, att["norm_q"], eps=cfg.eps)
    k = rms_norm(k, att["norm_k"], eps=cfg.eps)
    attn_out = _rope_attend(q, k, v, cos, sin, hd, mesh)

    mlp = linear(xh, blk["proj_mlp"])
    mlp = jax.nn.gelu(mlp.astype(jnp.float32),
                      approximate=True).astype(x.dtype)
    fused = jnp.concatenate([attn_out, mlp], axis=-1)
    return x + gate[:, None, :] * linear(fused, blk["proj_out"])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def flux_forward(params: Params, cfg: FluxConfig, latents: jnp.ndarray,
                 text_states: jnp.ndarray, timesteps: jnp.ndarray,
                 pooled: Optional[jnp.ndarray] = None,
                 guidance: Optional[jnp.ndarray] = None,
                 ref_latents: Optional[jnp.ndarray] = None,
                 mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent] (unpacked), text_states
    [B, Tt, joint_attention_dim] (T5), timesteps [B] (flow-match
    t ∈ [0,1]), pooled [B, pooled_projection_dim] (CLIP — zeros when the
    serving path has no CLIP tower), guidance [B] (distilled guidance
    scale), ref_latents [B, H2, W2, C] (Kontext reference image,
    appended to the image stream with frame-1 rope ids and dropped from
    the prediction — pipeline_flux_kontext.py:653,681)
    → velocity prediction, same shape as latents."""
    b, h, w, c = latents.shape
    p = cfg.pack_factor
    (img, txt), temb, (cos, sin), n_target = flux_prolog(
        params, cfg, latents, text_states, timesteps, pooled=pooled,
        guidance=guidance, ref_latents=ref_latents, mesh=mesh)

    for blk in params["double_blocks"]:
        img, txt = flux_double_block(blk, cfg, img, txt, temb, cos, sin,
                                     mesh=mesh)
    x = jnp.concatenate([txt, img], axis=1)
    for blk in params["single_blocks"]:
        x = flux_single_block(blk, cfg, x, temb, cos, sin, mesh=mesh)

    return flux_epilog(params, cfg, x, temb, text_states.shape[1], h,
                       w, n_target)


def flux_prolog(params: Params, cfg: FluxConfig, latents: jnp.ndarray,
                text_states: jnp.ndarray, timesteps: jnp.ndarray,
                pooled: Optional[jnp.ndarray] = None,
                guidance: Optional[jnp.ndarray] = None,
                ref_latents: Optional[jnp.ndarray] = None, mesh=None):
    """Embedding + conditioning stage → ((img, txt) carry, temb,
    (cos, sin), n_target) — the unit boundary the layerwise offloader
    shares with the plain forward."""
    b, h, w, c = latents.shape
    p = cfg.pack_factor
    img = pack_latents(latents, p)  # channel-major, matches _pack_latents
    n_target = img.shape[1]
    ref_hw = None
    if ref_latents is not None:
        ref_hw = (ref_latents.shape[1] // p, ref_latents.shape[2] // p)
        img = jnp.concatenate([img, pack_latents(ref_latents, p)],
                              axis=1)
    img = linear(img, params["x_embedder"])
    txt = linear(text_states, params["context_embedder"])
    img = _constrain(img, mesh, P("cfg", "ulysses", None))

    if pooled is None:
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), img.dtype)
    temb = flux_time_embed(params, cfg, timesteps, pooled, guidance,
                           img.dtype)
    cos, sin = flux_rope(cfg, h // p, w // p, text_states.shape[1],
                         ref_hw=ref_hw)
    return (img, txt), temb, (cos, sin), n_target


def flux_epilog(params: Params, cfg: FluxConfig, x: jnp.ndarray,
                temb: jnp.ndarray, text_len: int, h: int, w: int,
                n_target: int) -> jnp.ndarray:
    """Final AdaLN + projection; x = the joint [txt; img] stream."""
    img = x[:, text_len:]
    # AdaLayerNormContinuous (scale chunked FIRST — same as qwen_image)
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["norm_out"])
    hs = cfg.inner_dim
    scale_o, shift_o = fin[:, :hs], fin[:, hs:]
    out = _ada_norm(img, shift_o, scale_o, cfg.eps)
    out = linear(out, params["proj_out"])
    if out.shape[1] != n_target:
        out = out[:, :n_target]  # reference tokens carry no prediction
    return unpack_latents(out, h, w, cfg.pack_factor)


def flux_modulated_input(params: Params, cfg: FluxConfig,
                         latents: jnp.ndarray, timesteps: jnp.ndarray,
                         pooled: Optional[jnp.ndarray] = None,
                         guidance: Optional[jnp.ndarray] = None
                         ) -> jnp.ndarray:
    """TeaCache probe: first double block's img-stream AdaLN-modulated
    embedding (reference teacache extractor registry role,
    cache/teacache/extractors.py — modulated input of block 0)."""
    b = latents.shape[0]
    img = linear(pack_latents(latents, cfg.pack_factor),
                 params["x_embedder"])
    if pooled is None:
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), img.dtype)
    temb = flux_time_embed(params, cfg, timesteps, pooled, guidance,
                           img.dtype)
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)
    blk = params["double_blocks"][0]
    m1, _ = _mod_chunks(linear(silu_t, blk["norm1"]), cfg.inner_dim)
    return _ada_norm(img, m1[0], m1[1], cfg.eps).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def init_flux_params(cfg: FluxConfig, key: jax.Array,
                     dtype=jnp.bfloat16) -> Params:
    n_keys = (cfg.num_layers * 16 + cfg.num_single_layers * 8 + 12)
    keys = iter(jax.random.split(key, n_keys))
    hs = cfg.inner_dim
    qk = hs
    mlp = hs * 4
    hd = cfg.attention_head_dim
    te = {
        "timestep_embedder": {"linear_1": _lin(next(keys), 256, hs, dtype),
                              "linear_2": _lin(next(keys), hs, hs, dtype)},
        "text_embedder": {
            "linear_1": _lin(next(keys), cfg.pooled_projection_dim, hs,
                             dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype)},
    }
    if cfg.guidance_embeds:
        te["guidance_embedder"] = {
            "linear_1": _lin(next(keys), 256, hs, dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype)}
    params: Params = {
        "x_embedder": _lin(next(keys), cfg.in_channels, hs, dtype),
        "context_embedder": _lin(next(keys), cfg.joint_attention_dim, hs,
                                 dtype),
        "time_embed": te,
        "norm_out": _lin(next(keys), hs, 2 * hs, dtype, scale=0.02),
        "proj_out": _lin(next(keys), hs,
                         cfg.patch_size ** 2 * cfg.out_channels, dtype),
        "double_blocks": [],
        "single_blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["double_blocks"].append({
            "norm1": _lin(next(keys), hs, 6 * hs, dtype, scale=0.02),
            "norm1_context": _lin(next(keys), hs, 6 * hs, dtype,
                                  scale=0.02),
            "attn": {
                "to_q": _lin(next(keys), hs, qk, dtype),
                "to_k": _lin(next(keys), hs, qk, dtype),
                "to_v": _lin(next(keys), hs, qk, dtype),
                "add_q_proj": _lin(next(keys), hs, qk, dtype),
                "add_k_proj": _lin(next(keys), hs, qk, dtype),
                "add_v_proj": _lin(next(keys), hs, qk, dtype),
                "to_out": _lin(next(keys), qk, hs, dtype),
                "to_add_out": _lin(next(keys), qk, hs, dtype),
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
    for _ in range(cfg.num_single_layers):
        params["single_blocks"].append({
            "norm": _lin(next(keys), hs, 3 * hs, dtype, scale=0.02),
            "attn": {
                "to_q": _lin(next(keys), hs, qk, dtype),
                "to_k": _lin(next(keys), hs, qk, dtype),
                "to_v": _lin(next(keys), hs, qk, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
            },
            "proj_mlp": _lin(next(keys), hs, mlp, dtype),
            "proj_out": _lin(next(keys), hs + mlp, hs, dtype),
        })
    return params


def flux_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/mlp-in column-split, out/mlp-out row-split;
    modulation + embedders replicate (reference keeps dual-stream blocks
    and modulation unquantized/full-precision for the same
    sensitivity reasons, flux_transformer.py:568-570)."""
    col = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
           "add_v_proj", "net0", "proj_mlp"}
    row = {"to_out", "to_add_out", "net2"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        # single-block proj_out consumes [attn | mlp] where only the mlp
        # half is column-sharded — replicate it (cheap: 5H·H per block)
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_flux_tensor(params: Params, name: str, value, dtype) -> bool:
    """Map one diffusers-format tensor (FluxTransformer2DModel naming,
    reference load_weights :710) into the pytree. Torch Linear weights
    [out, in] transpose to [in, out]. Returns False if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    parts = name.split(".")
    simple = {"x_embedder", "context_embedder", "proj_out"}
    if parts[0] in simple and len(parts) == 2:
        put(params[parts[0]], "w" if parts[1] == "weight" else "b", value)
        return True
    if parts[0] == "time_text_embed":
        slot = params["time_embed"].get(parts[1])
        if slot is None or parts[2] not in slot:
            return False
        put(slot[parts[2]], "w" if parts[3] == "weight" else "b", value)
        return True
    if parts[:2] == ["norm_out", "linear"]:
        put(params["norm_out"], "w" if parts[2] == "weight" else "b",
            value)
        return True
    if parts[0] == "transformer_blocks":
        blk = params["double_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] in ("norm1", "norm1_context") and rest[1] == "linear":
            put(blk[rest[0]], "w" if rest[2] == "weight" else "b", value)
            return True
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k", "norm_added_q",
                           "norm_added_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v", "add_q_proj",
                           "add_k_proj", "add_v_proj", "to_add_out"):
                put(a[rest[1]], "w" if rest[2] == "weight" else "b",
                    value)
                return True
            if rest[1] == "to_out":  # ModuleList: attn.to_out.0.weight
                leaf = rest[3] if rest[2] == "0" else rest[2]
                put(a["to_out"], "w" if leaf == "weight" else "b", value)
                return True
            return False
        if rest[0] in ("ff", "ff_context") and rest[1] == "net":
            mlp = blk[rest[0]]
            if rest[2] == "0":  # net.0.proj.{weight,bias}
                put(mlp["net0"], "w" if rest[4] == "weight" else "b",
                    value)
                return True
            if rest[2] == "2":
                put(mlp["net2"], "w" if rest[3] == "weight" else "b",
                    value)
                return True
        return False
    if parts[0] == "single_transformer_blocks":
        blk = params["single_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "norm" and rest[1] == "linear":
            put(blk["norm"], "w" if rest[2] == "weight" else "b", value)
            return True
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v"):
                put(a[rest[1]], "w" if rest[2] == "weight" else "b",
                    value)
                return True
            return False
        if rest[0] in ("proj_mlp", "proj_out"):
            put(blk[rest[0]], "w" if rest[1] == "weight" else "b", value)
            return True
    return False
