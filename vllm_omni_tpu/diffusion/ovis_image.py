"""Ovis-Image MMDiT (double + single stream) with real checkpoint
geometry.

Reference parity: diffusion/models/ovis_image/ovis_image_transformer.py
(OvisImageTransformer2DModel :340 — 6 dual + 27 single blocks of
24×128; biased projections throughout; RMSNorm(joint_attention_dim) on
the context BEFORE context_embedder :396; diffusers-SwiGLU FFs
(hidden·silu(gate), gate = SECOND half) in the dual blocks :236 and the
single-block mlp :174; AdaLayerNormZero/ZeroSingle modulation;
per-head RMS q/k norms at eps 1e-6) and pipeline_ovis_image.py
(text ids (0, i, i) :293-295 — positions on BOTH spatial axes, unlike
flux's all-zero text ids; flux-style channel-major 2x2 packing :360;
standard uncond + s·(cond-uncond) CFG via combine_cfg_noise).

TPU-first like flux.py: pure function over a diffusers-named param
pytree; heads shard on "tp", the joint sequence on "ulysses".
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain, _layer_norm_nb
from vllm_omni_tpu.diffusion.flux import _rope_attend
from vllm_omni_tpu.diffusion.qwen_image import (_ada_norm, _mod_chunks,
                                                _qwen_timestep_embedding,
                                                pack_latents,
                                                unpack_latents)
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class OvisImageConfig:
    """Mirrors the transformer's diffusers config.json
    (OvisImageTransformer2DModel.__init__ :371)."""

    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 6
    num_single_layers: int = 27
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 2048
    axes_dims_rope: tuple = (16, 56, 56)
    theta: float = 10000.0
    eps: float = 1e-6

    pack_factor: int = 2

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "OvisImageConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope — text token i at (0, i, i); image (0, row, col); [txt; img]
# ---------------------------------------------------------------------------


def ovis_rope(cfg: OvisImageConfig, h_tokens: int, w_tokens: int,
              txt_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    d_t, d_h, d_w = cfg.axes_dims_rope
    assert d_t + d_h + d_w == cfg.attention_head_dim

    def axis_freqs(pos: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (cfg.theta ** (np.arange(0, dim, 2, dtype=np.float64)
                                   / dim))
        return pos.astype(np.float64)[:, None] * inv[None, :]

    rows = np.repeat(np.arange(h_tokens, dtype=np.float64), w_tokens)
    cols = np.tile(np.arange(w_tokens, dtype=np.float64), h_tokens)
    zeros_vis = np.zeros_like(rows)
    vis = np.concatenate([axis_freqs(zeros_vis, d_t),
                          axis_freqs(rows, d_h),
                          axis_freqs(cols, d_w)], axis=-1)
    seq = np.arange(txt_len, dtype=np.float64)
    zt = np.zeros((txt_len,), np.float64)
    txt = np.concatenate([axis_freqs(zt, d_t), axis_freqs(seq, d_h),
                          axis_freqs(seq, d_w)], axis=-1)
    freqs = np.concatenate([txt, vis], axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _swiglu_ff(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
    """diffusers FeedForward(activation_fn="swiglu"): net.0.proj →
    (hidden, gate) halves → hidden·silu(gate) → net.2."""
    h = linear(x, slot["net0"])
    inner = h.shape[-1] // 2
    hid, gate = h[..., :inner], h[..., inner:]
    return linear(hid * jax.nn.silu(gate.astype(jnp.float32)).astype(
        x.dtype), slot["net2"])


def ovis_double_block(blk: Params, cfg: OvisImageConfig,
                      img: jnp.ndarray, txt: jnp.ndarray,
                      temb: jnp.ndarray, cos: jnp.ndarray,
                      sin: jnp.ndarray, mesh=None
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """OvisImageTransformerBlock :224 — AdaLN-Zero joint attention +
    per-stream SwiGLU FFs."""
    hs = cfg.inner_dim
    b, tv, _ = img.shape
    tt = txt.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)
    img_m1, img_m2 = _mod_chunks(linear(silu_t, blk["norm1"]), hs)
    txt_m1, txt_m2 = _mod_chunks(linear(silu_t, blk["norm1_context"]),
                                 hs)

    img_h = _ada_norm(img, img_m1[0], img_m1[1], cfg.eps)
    txt_h = _ada_norm(txt, txt_m1[0], txt_m1[1], cfg.eps)
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

    img = img + img_m1[2][:, None, :] * linear(o[:, tt:], att["to_out"])
    txt = txt + txt_m1[2][:, None, :] * linear(o[:, :tt],
                                               att["to_add_out"])
    img_h2 = _ada_norm(img, img_m2[0], img_m2[1], cfg.eps)
    img = img + img_m2[2][:, None, :] * _swiglu_ff(blk["ff"], img_h2)
    txt_h2 = _ada_norm(txt, txt_m2[0], txt_m2[1], cfg.eps)
    txt = txt + txt_m2[2][:, None, :] * _swiglu_ff(blk["ff_context"],
                                                   txt_h2)
    return img, txt


def ovis_single_block(blk: Params, cfg: OvisImageConfig, x: jnp.ndarray,
                      temb: jnp.ndarray, cos: jnp.ndarray,
                      sin: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """OvisImageSingleTransformerBlock :169 — x is the CONCATENATED
    [txt; img] stream. attn (pre-only) ∥ SwiGLU-mlp (silu(gate)·hidden,
    gate = SECOND split of proj_mlp), fused proj_out, single gate."""
    b, s, hs = x.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype)
    mod = linear(silu_t, blk["norm"]).reshape(b, 3, hs)
    shift, scale, gate = mod[:, 0], mod[:, 1], mod[:, 2]

    xh = _layer_norm_nb(x, cfg.eps) * (1.0 + scale[:, None, :]) \
        + shift[:, None, :]
    att = blk["attn"]
    q = linear(xh, att["to_q"]).reshape(b, s, nh, hd)
    k = linear(xh, att["to_k"]).reshape(b, s, nh, hd)
    v = linear(xh, att["to_v"]).reshape(b, s, nh, hd)
    q = rms_norm(q, att["norm_q"], eps=cfg.eps)
    k = rms_norm(k, att["norm_k"], eps=cfg.eps)
    attn_out = _rope_attend(q, k, v, cos, sin, hd, mesh)

    h = linear(xh, blk["proj_mlp"])
    inner = h.shape[-1] // 2
    mlp = h[..., :inner] * jax.nn.silu(
        h[..., inner:].astype(jnp.float32)).astype(x.dtype)
    fused = jnp.concatenate([attn_out, mlp], axis=-1)
    return x + gate[:, None, :] * linear(fused, blk["proj_out"])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def ovis_image_forward(params: Params, cfg: OvisImageConfig,
                       latents: jnp.ndarray, text_states: jnp.ndarray,
                       timesteps: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent] (unpacked), text_states
    [B, Tt, joint_attention_dim] (Ovis MLLM hidden states), timesteps
    [B] (flow-match σ ∈ [0,1], ×1000 inside like the reference :459)
    → velocity prediction, same shape as latents."""
    b, h, w, c = latents.shape
    p = cfg.pack_factor
    img = pack_latents(latents, p)
    img = linear(img, params["x_embedder"])
    txt = rms_norm(text_states, params["context_embedder_norm"],
                   eps=1e-6)
    txt = linear(txt.astype(img.dtype), params["context_embedder"])
    img = _constrain(img, mesh, P("cfg", "ulysses", None))

    e = _qwen_timestep_embedding(timesteps, scale=1000.0).astype(
        img.dtype)
    e = linear(e, params["timestep_embedder"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(img.dtype)
    temb = linear(e, params["timestep_embedder"]["linear_2"])

    cos, sin = ovis_rope(cfg, h // p, w // p, text_states.shape[1])

    for blk in params["double_blocks"]:
        img, txt = ovis_double_block(blk, cfg, img, txt, temb, cos, sin,
                                     mesh=mesh)
    x = jnp.concatenate([txt, img], axis=1)
    for blk in params["single_blocks"]:
        x = ovis_single_block(blk, cfg, x, temb, cos, sin, mesh=mesh)
    img = x[:, txt.shape[1]:]

    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["norm_out"])
    hs = cfg.inner_dim
    scale_o, shift_o = fin[:, :hs], fin[:, hs:]
    out = _ada_norm(img, shift_o, scale_o, cfg.eps)
    out = linear(out, params["proj_out"])
    return unpack_latents(out, h, w, p)


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def init_ovis_image_params(cfg: OvisImageConfig, key: jax.Array,
                           dtype=jnp.bfloat16) -> Params:
    n_keys = (cfg.num_layers * 14 + cfg.num_single_layers * 8 + 10)
    keys = iter(jax.random.split(key, n_keys))
    hs = cfg.inner_dim
    mlp = hs * 4
    hd = cfg.attention_head_dim
    params: Params = {
        "x_embedder": _lin(next(keys), cfg.in_channels, hs, dtype),
        "context_embedder_norm": jnp.ones((cfg.joint_attention_dim,),
                                          dtype),
        "context_embedder": _lin(next(keys), cfg.joint_attention_dim,
                                 hs, dtype),
        "timestep_embedder": {
            "linear_1": _lin(next(keys), 256, hs, dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype)},
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
            "ff": {"net0": _lin(next(keys), hs, 2 * mlp, dtype),
                   "net2": _lin(next(keys), mlp, hs, dtype)},
            "ff_context": {"net0": _lin(next(keys), hs, 2 * mlp, dtype),
                           "net2": _lin(next(keys), mlp, hs, dtype)},
        })
    for _ in range(cfg.num_single_layers):
        params["single_blocks"].append({
            "norm": _lin(next(keys), hs, 3 * hs, dtype, scale=0.02),
            "attn": {
                "to_q": _lin(next(keys), hs, hs, dtype),
                "to_k": _lin(next(keys), hs, hs, dtype),
                "to_v": _lin(next(keys), hs, hs, dtype),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
            },
            "proj_mlp": _lin(next(keys), hs, 2 * mlp, dtype),
            "proj_out": _lin(next(keys), hs + mlp, hs, dtype),
        })
    return params


def ovis_image_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/ff-in column-split, out/ff-out row-split."""
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
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_ovis_image_tensor(params: Params, name: str, value,
                             dtype) -> bool:
    """Map one diffusers-format tensor (OvisImageTransformer2DModel
    naming, reference load_weights :509 — separate to_q/to_k/to_v and
    add_*_proj names). Torch Linear [out, in] transposes. Returns False
    if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    parts = name.split(".")
    simple = {"x_embedder", "context_embedder", "proj_out"}
    if parts[0] in simple and len(parts) == 2:
        return put(params[parts[0]],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[0] == "context_embedder_norm" and parts[1] == "weight":
        params["context_embedder_norm"] = b(value)
        return True
    if parts[0] == "timestep_embedder":
        slot = params["timestep_embedder"].get(parts[1])
        if slot is None:
            return False
        return put(slot, "w" if parts[2] == "weight" else "b", value)
    if parts[:2] == ["norm_out", "linear"]:
        return put(params["norm_out"],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] == "transformer_blocks":
        blk = params["double_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] in ("norm1", "norm1_context") and rest[1] == "linear":
            return put(blk[rest[0]],
                       "w" if rest[2] == "weight" else "b", value)
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k", "norm_added_q",
                           "norm_added_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v", "add_q_proj",
                           "add_k_proj", "add_v_proj", "to_add_out"):
                return put(a[rest[1]],
                           "w" if rest[2] == "weight" else "b", value)
            if rest[1] == "to_out":
                leaf = rest[3] if rest[2] == "0" else rest[2]
                return put(a["to_out"],
                           "w" if leaf == "weight" else "b", value)
            return False
        if rest[0] in ("ff", "ff_context") and rest[1] == "net":
            mlp = blk[rest[0]]
            if rest[2] == "0":
                return put(mlp["net0"],
                           "w" if rest[4] == "weight" else "b", value)
            if rest[2] == "2":
                return put(mlp["net2"],
                           "w" if rest[3] == "weight" else "b", value)
        return False
    if parts[0] == "single_transformer_blocks":
        blk = params["single_blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "norm" and rest[1] == "linear":
            return put(blk["norm"],
                       "w" if rest[2] == "weight" else "b", value)
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v"):
                return put(a[rest[1]],
                           "w" if rest[2] == "weight" else "b", value)
            return False
        if rest[0] in ("proj_mlp", "proj_out"):
            return put(blk[rest[0]],
                       "w" if rest[1] == "weight" else "b", value)
    return False
