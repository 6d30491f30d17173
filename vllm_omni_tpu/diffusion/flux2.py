"""Flux2 MMDiT (double-stream + single-stream) with real checkpoint
geometry — serves BOTH the Flux2Pipeline and Flux2KleinPipeline
families (same Flux2Transformer2DModel class, reference
diffusion/models/flux2/flux2_transformer.py:550 and
flux2_klein/flux2_klein_transformer.py:737).

Reference parity anchors: Flux2TransformerBlock :383 (LN-no-affine +
GLOBAL shared modulation, joint attention with per-head RMS q/k norms,
SwiGLU FF linear_in/linear_out), Flux2SingleTransformerBlock :323
(fused to_qkv_mlp_proj, attn ∥ SwiGLU-mlp, fused to_out),
Flux2PosEmbed :465 (4 rope axes, theta 2000, GPT-J interleaved pairs —
rope.py rotate_half(interleaved=True)), Flux2TimestepGuidanceEmbeddings
:495 (t and guidance ×1000 sinusoids), Flux2Modulation :531,
pipeline_flux2.py _prepare_latent_ids :477 (image ids (0,h,w,0)) and
_prepare_text_ids :457 (text ids (0,0,0,pos)).

Differences vs flux.py (Flux1) worth keeping straight:
* modulation is computed ONCE from temb and shared by every block
  (double_stream_modulation_img/txt with 2 (shift,scale,gate) sets,
  single_stream_modulation with 1) — not per-block adaLN linears;
* every linear is bias-free;
* FFs are SwiGLU (silu(x1)·x2, gate = FIRST half) instead of gelu;
* rope has FOUR axes and text tokens take positions on the 4th axis
  (Flux1 text ids are all-zero);
* no pooled-CLIP text_embedder in the time embed.

TPU-first like the sibling modules: a pure function over a param pytree
keyed by the diffusers module names; heads shard on "tp", the joint
sequence on "ulysses".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain, _layer_norm_nb
from vllm_omni_tpu.diffusion.flux import _rope_attend
from vllm_omni_tpu.diffusion.qwen_image import (_qwen_timestep_embedding,
                                                pack_latents,
                                                unpack_latents)
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class Flux2Config:
    """Mirrors the transformer's diffusers config.json
    (Flux2Transformer2DModel.__init__ defaults :563: 8 double + 48
    single layers, 48 heads × 128, joint_attention_dim 15360 (stacked
    Mistral hidden states), rope theta 2000 over 4 axes)."""

    patch_size: int = 1  # diffusers config value; packing is 2x2 in the
    # pipeline (pack_factor below), matching Flux2Pipeline._pack_latents
    in_channels: int = 128
    out_channels: int = 128
    num_layers: int = 8
    num_single_layers: int = 48
    attention_head_dim: int = 128
    num_attention_heads: int = 48
    joint_attention_dim: int = 15360
    timestep_guidance_channels: int = 256
    mlp_ratio: float = 3.0
    axes_dims_rope: tuple = (32, 32, 32, 32)
    rope_theta: float = 2000.0
    eps: float = 1e-6
    guidance_embeds: bool = True

    pack_factor: int = 2

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def mlp_hidden(self) -> int:
        return int(self.inner_dim * self.mlp_ratio)

    @classmethod
    def from_json(cls, cfg: dict) -> "Flux2Config":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (Flux2PosEmbed :465 — 4 axes; image ids (0, row, col, 0), text
# ids (0, 0, 0, position); joint stream order [txt; img])
# ---------------------------------------------------------------------------


def flux2_rope(cfg: Flux2Config, h_tokens: int, w_tokens: int,
               txt_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint-stream cos/sin [Ttxt+Tvis, head_dim//2]."""
    dims = cfg.axes_dims_rope
    assert sum(dims) == cfg.attention_head_dim

    def axis_freqs(pos: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (cfg.rope_theta **
                     (np.arange(0, dim, 2, dtype=np.float64) / dim))
        return pos.astype(np.float64)[:, None] * inv[None, :]

    rows = np.repeat(np.arange(h_tokens, dtype=np.float64), w_tokens)
    cols = np.tile(np.arange(w_tokens, dtype=np.float64), h_tokens)
    zv = np.zeros_like(rows)
    vis = np.concatenate([axis_freqs(zv, dims[0]),
                          axis_freqs(rows, dims[1]),
                          axis_freqs(cols, dims[2]),
                          axis_freqs(zv, dims[3])], axis=-1)
    zt = np.zeros((txt_len,), np.float64)
    seq = np.arange(txt_len, dtype=np.float64)
    txt = np.concatenate([axis_freqs(zt, dims[0]),
                          axis_freqs(zt, dims[1]),
                          axis_freqs(zt, dims[2]),
                          axis_freqs(seq, dims[3])], axis=-1)
    freqs = np.concatenate([txt, vis], axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Conditioning
# ---------------------------------------------------------------------------


def _mlp_nb(slot: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    h = linear(x.astype(dtype), slot["linear_1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(dtype)
    return linear(h, slot["linear_2"])


def flux2_time_embed(params: Params, cfg: Flux2Config, t: jnp.ndarray,
                     guidance: Optional[jnp.ndarray], dtype
                     ) -> jnp.ndarray:
    """temb [B, inner] = timestep_embedder(sin(t·1000)) [+
    guidance_embedder(sin(g·1000))] (reference forward :672-676)."""
    te = params["time_guidance_embed"]
    nch = cfg.timestep_guidance_channels
    emb = _mlp_nb(te["timestep_embedder"],
                  _qwen_timestep_embedding(t, dim=nch, scale=1000.0),
                  dtype)
    if cfg.guidance_embeds:
        g = guidance if guidance is not None else jnp.zeros_like(t)
        emb = emb + _mlp_nb(te["guidance_embedder"],
                            _qwen_timestep_embedding(g, dim=nch,
                                                     scale=1000.0),
                            dtype)
    return emb


def _modulation(slot: Params, temb: jnp.ndarray, sets: int
                ) -> list[tuple]:
    """Flux2Modulation :531 — linear(silu(temb)) chunked into `sets`
    (shift, scale, gate) triples, each [B, 1, hs]."""
    mod = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype),
                 slot)
    b = mod.shape[0]
    hs = mod.shape[-1] // (3 * sets)
    mod = mod.reshape(b, 1, 3 * sets, hs)
    return [(mod[:, :, 3 * i], mod[:, :, 3 * i + 1], mod[:, :, 3 * i + 2])
            for i in range(sets)]


def _swiglu(x: jnp.ndarray) -> jnp.ndarray:
    """Flux2SwiGLU :31 — silu(x1)·x2, gate is the FIRST half."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(x1.astype(jnp.float32)).astype(x.dtype) * x2


def _ff(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
    return linear(_swiglu(linear(x, slot["linear_in"])),
                  slot["linear_out"])


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def flux2_double_block(blk: Params, cfg: Flux2Config, img: jnp.ndarray,
                       txt: jnp.ndarray, mod_img: list, mod_txt: list,
                       cos: jnp.ndarray, sin: jnp.ndarray, mesh=None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Flux2TransformerBlock :383 — globally-modulated joint attention +
    per-stream SwiGLU FFs. Returns (img', txt')."""
    b, tv, hs = img.shape
    tt = txt.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    (i_shift, i_scale, i_gate), (i_shift2, i_scale2, i_gate2) = mod_img
    (t_shift, t_scale, t_gate), (t_shift2, t_scale2, t_gate2) = mod_txt

    img_h = _layer_norm_nb(img, cfg.eps) * (1.0 + i_scale) + i_shift
    txt_h = _layer_norm_nb(txt, cfg.eps) * (1.0 + t_scale) + t_shift

    att = blk["attn"]

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
    o = _rope_attend(q, k, v, cos, sin, hd, mesh)

    img = img + i_gate * linear(o[:, tt:], att["to_out"])
    txt = txt + t_gate * linear(o[:, :tt], att["to_add_out"])

    img_h2 = _layer_norm_nb(img, cfg.eps) * (1.0 + i_scale2) + i_shift2
    img = img + i_gate2 * _ff(blk["ff"], img_h2)
    txt_h2 = _layer_norm_nb(txt, cfg.eps) * (1.0 + t_scale2) + t_shift2
    txt = txt + t_gate2 * _ff(blk["ff_context"], txt_h2)
    return img, txt


def flux2_single_block(blk: Params, cfg: Flux2Config, x: jnp.ndarray,
                       mod: tuple, cos: jnp.ndarray, sin: jnp.ndarray,
                       mesh=None) -> jnp.ndarray:
    """Flux2SingleTransformerBlock :323 — x is the CONCATENATED
    [txt; img] stream. One fused to_qkv_mlp_proj feeds attention ∥
    SwiGLU-mlp; fused to_out; single shared gate."""
    b, s, hs = x.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    shift, scale, gate = mod

    xh = _layer_norm_nb(x, cfg.eps) * (1.0 + scale) + shift
    att = blk["attn"]
    h = linear(xh, att["to_qkv_mlp_proj"])
    q = h[..., :hs].reshape(b, s, nh, hd)
    k = h[..., hs:2 * hs].reshape(b, s, nh, hd)
    v = h[..., 2 * hs:3 * hs].reshape(b, s, nh, hd)
    q = rms_norm(q, att["norm_q"], eps=cfg.eps)
    k = rms_norm(k, att["norm_k"], eps=cfg.eps)
    attn_out = _rope_attend(q, k, v, cos, sin, hd, mesh)
    mlp = _swiglu(h[..., 3 * hs:])
    fused = jnp.concatenate([attn_out, mlp], axis=-1)
    return x + gate * linear(fused, att["to_out"])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def flux2_forward(params: Params, cfg: Flux2Config, latents: jnp.ndarray,
                  text_states: jnp.ndarray, timesteps: jnp.ndarray,
                  guidance: Optional[jnp.ndarray] = None,
                  mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent] (unpacked), text_states
    [B, Tt, joint_attention_dim] (stacked Mistral hidden states),
    timesteps [B] (flow-match σ ∈ [0,1]), guidance [B] (distilled
    guidance scale, raw — scaled ×1000 inside like the reference)
    → velocity prediction, same shape as latents."""
    b, h, w, c = latents.shape
    p = cfg.pack_factor
    img = pack_latents(latents, p)  # channel-major, matches _pack_latents
    img = linear(img, params["x_embedder"])
    txt = linear(text_states, params["context_embedder"])
    img = _constrain(img, mesh, P("cfg", "ulysses", None))

    temb = flux2_time_embed(params, cfg, timesteps, guidance, img.dtype)
    mod_img = _modulation(params["double_stream_modulation_img"], temb, 2)
    mod_txt = _modulation(params["double_stream_modulation_txt"], temb, 2)
    mod_single = _modulation(params["single_stream_modulation"], temb,
                             1)[0]
    cos, sin = flux2_rope(cfg, h // p, w // p, text_states.shape[1])

    for blk in params["double_blocks"]:
        img, txt = flux2_double_block(blk, cfg, img, txt, mod_img,
                                      mod_txt, cos, sin, mesh=mesh)
    x = jnp.concatenate([txt, img], axis=1)
    for blk in params["single_blocks"]:
        x = flux2_single_block(blk, cfg, x, mod_single, cos, sin,
                               mesh=mesh)
    img = x[:, txt.shape[1]:]

    # AdaLayerNormContinuous (scale chunked FIRST), bias-free
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["norm_out"])
    hs = cfg.inner_dim
    scale_o, shift_o = fin[:, None, :hs], fin[:, None, hs:]
    out = _layer_norm_nb(img, cfg.eps) * (1.0 + scale_o) + shift_o
    out = linear(out, params["proj_out"])
    return unpack_latents(out, h, w, p)


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin_nb(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype)}


def init_flux2_params(cfg: Flux2Config, key: jax.Array,
                      dtype=jnp.bfloat16) -> Params:
    n_keys = (cfg.num_layers * 12 + cfg.num_single_layers * 4 + 12)
    keys = iter(jax.random.split(key, n_keys))
    hs = cfg.inner_dim
    mh = cfg.mlp_hidden
    hd = cfg.attention_head_dim
    nch = cfg.timestep_guidance_channels
    te = {"timestep_embedder": {
        "linear_1": _lin_nb(next(keys), nch, hs, dtype),
        "linear_2": _lin_nb(next(keys), hs, hs, dtype)}}
    if cfg.guidance_embeds:
        te["guidance_embedder"] = {
            "linear_1": _lin_nb(next(keys), nch, hs, dtype),
            "linear_2": _lin_nb(next(keys), hs, hs, dtype)}
    params: Params = {
        "time_guidance_embed": te,
        "double_stream_modulation_img": _lin_nb(next(keys), hs, 6 * hs,
                                                dtype, scale=0.02),
        "double_stream_modulation_txt": _lin_nb(next(keys), hs, 6 * hs,
                                                dtype, scale=0.02),
        "single_stream_modulation": _lin_nb(next(keys), hs, 3 * hs,
                                            dtype, scale=0.02),
        "x_embedder": _lin_nb(next(keys), cfg.in_channels, hs, dtype),
        "context_embedder": _lin_nb(next(keys), cfg.joint_attention_dim,
                                    hs, dtype),
        "norm_out": _lin_nb(next(keys), hs, 2 * hs, dtype, scale=0.02),
        "proj_out": _lin_nb(next(keys), hs,
                            cfg.patch_size ** 2 * cfg.out_channels,
                            dtype),
        "double_blocks": [],
        "single_blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["double_blocks"].append({
            "attn": {
                "to_q": _lin_nb(next(keys), hs, hs, dtype),
                "to_k": _lin_nb(next(keys), hs, hs, dtype),
                "to_v": _lin_nb(next(keys), hs, hs, dtype),
                "add_q_proj": _lin_nb(next(keys), hs, hs, dtype),
                "add_k_proj": _lin_nb(next(keys), hs, hs, dtype),
                "add_v_proj": _lin_nb(next(keys), hs, hs, dtype),
                "to_out": _lin_nb(next(keys), hs, hs, dtype),
                "to_add_out": _lin_nb(next(keys), hs, hs, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
                "norm_added_q": jnp.ones((hd,), dtype),
                "norm_added_k": jnp.ones((hd,), dtype),
            },
            "ff": {"linear_in": _lin_nb(next(keys), hs, 2 * mh, dtype),
                   "linear_out": _lin_nb(next(keys), mh, hs, dtype)},
            "ff_context": {
                "linear_in": _lin_nb(next(keys), hs, 2 * mh, dtype),
                "linear_out": _lin_nb(next(keys), mh, hs, dtype)},
        })
    for _ in range(cfg.num_single_layers):
        params["single_blocks"].append({
            "attn": {
                "to_qkv_mlp_proj": _lin_nb(next(keys), hs,
                                           3 * hs + 2 * mh, dtype),
                "to_out": _lin_nb(next(keys), hs + mh, hs, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
            },
        })
    return params


def flux2_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/ff-in/fused-in column-split, out/ff-out
    row-split; global modulation + embedders replicate."""
    col = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
           "add_v_proj", "linear_in", "to_qkv_mlp_proj"}
    row = {"to_out", "to_add_out", "linear_out"}

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


def assign_flux2_tensor(params: Params, name: str, value, dtype) -> bool:
    """Map one diffusers-format tensor (Flux2Transformer2DModel naming,
    reference load_weights :735 — fused to_qkv shards come in as
    separate to_q/to_k/to_v names) into the pytree. Torch Linear
    weights [out, in] transpose to [in, out]. Returns False if
    unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    parts = name.split(".")
    simple = {"x_embedder", "context_embedder", "proj_out"}
    if parts[0] in simple and len(parts) == 2 and parts[1] == "weight":
        put(params[parts[0]], "w", value)
        return True
    if parts[0] == "time_guidance_embed":
        slot = params["time_guidance_embed"].get(parts[1])
        if slot is None or parts[2] not in slot:
            return False
        put(slot[parts[2]], "w" if parts[3] == "weight" else "b", value)
        return True
    mods = {"double_stream_modulation_img", "double_stream_modulation_txt",
            "single_stream_modulation"}
    if parts[0] in mods and parts[1] == "linear" and parts[2] == "weight":
        put(params[parts[0]], "w", value)
        return True
    if parts[:2] == ["norm_out", "linear"] and parts[2] == "weight":
        put(params["norm_out"], "w", value)
        return True
    if parts[0] == "transformer_blocks":
        blk = params["double_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k", "norm_added_q",
                           "norm_added_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v", "add_q_proj",
                           "add_k_proj", "add_v_proj", "to_add_out") \
                    and rest[2] == "weight":
                put(a[rest[1]], "w", value)
                return True
            if rest[1] == "to_out":  # ModuleList: attn.to_out.0.weight
                leaf = rest[3] if rest[2] == "0" else rest[2]
                if leaf == "weight":
                    put(a["to_out"], "w", value)
                    return True
            return False
        if rest[0] in ("ff", "ff_context") and \
                rest[1] in ("linear_in", "linear_out") and \
                rest[2] == "weight":
            put(blk[rest[0]][rest[1]], "w", value)
            return True
        return False
    if parts[0] == "single_transformer_blocks":
        blk = params["single_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_qkv_mlp_proj", "to_out") and \
                    rest[2] == "weight":
                put(a[rest[1]], "w", value)
                return True
    return False


def flux2_modulated_input(params: Params, cfg: Flux2Config,
                          latents: jnp.ndarray, timesteps: jnp.ndarray,
                          guidance: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """TeaCache probe: block-0 img-stream modulated embedding
    (reference cache/teacache/extractors.py:895-903
    extract_flux2_context — (1+scale)·norm1(hidden)+shift from the
    GLOBAL double_stream_modulation_img set 0). Cheap: one packing
    matmul + time embed + one modulation linear."""
    img = linear(pack_latents(latents, cfg.pack_factor),
                 params["x_embedder"])
    temb = flux2_time_embed(params, cfg, timesteps, guidance, img.dtype)
    shift, scale, _ = _modulation(
        params["double_stream_modulation_img"], temb, 2)[0]
    return (_layer_norm_nb(img, cfg.eps) * (1.0 + scale) +
            shift).astype(jnp.float32)
