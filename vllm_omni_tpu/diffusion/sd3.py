"""SD3 / SD3.5 MMDiT with real checkpoint geometry.

Reference parity: diffusion/models/sd3/sd3_transformer.py
(SD3Transformer2DModel :384 — SD3TransformerBlock :244 joint blocks with
AdaLayerNormZero, last block context_pre_only with
AdaLayerNormContinuous, SD3.5's dual_attention_layers adding a second
image-only self-attention under SD35AdaLayerNormZeroX, PatchEmbed with a
cropped learned positional table, CombinedTimestepTextProjEmbeddings)
and the diffusers checkpoint naming its load_weights (:512) consumes.

TPU-first like flux.py: a pure function over a param pytree keyed by
diffusers module names; one jitted program per resolution bucket; heads
shard on "tp", the joint sequence on "ulysses".

Differences vs Flux worth keeping straight:
* NO rope — position comes from a learned pos_embed table cropped
  around its center (diffusers PatchEmbed.cropped_pos_embed);
* the patch embed is a conv (kernel == stride == patch_size), i.e. a
  linear over CHANNEL-MAJOR (c, ph, pw) patch vectors — but the output
  unpatchify is PATCH-MAJOR (ph, pw, c) (diffusers einsum nhwpqc→nchpwq);
* qk norms are optional (SD3.0: none; SD3.5: rms_norm);
* every block is dual-stream; only the LAST drops the text stream
  (context_pre_only) through an AdaLayerNormContinuous context norm;
* no guidance embedding (CFG is classic two-pass).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain, _layer_norm_nb
from vllm_omni_tpu.diffusion.qwen_image import (_ada_norm, _ff,
                                                _mod_chunks,
                                                _qwen_timestep_embedding,
                                                pack_latents)
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class SD3Config:
    """Mirrors the transformer's diffusers config.json
    (SD3Transformer2DModel: 24 layers x 24 heads x 64 for medium,
    38 x 38 x 64 for 3.5-large; dual_attention_layers 0..12 on
    3.5-medium)."""

    sample_size: int = 128
    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    caption_projection_dim: int = 1536
    pooled_projection_dim: int = 2048
    pos_embed_max_size: int = 192
    dual_attention_layers: tuple = ()
    qk_norm: Optional[str] = None
    eps: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "SD3Config":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "dual_attention_layers" in kw:
            kw["dual_attention_layers"] = tuple(
                kw["dual_attention_layers"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Patch embed (diffusers PatchEmbed: conv + center-cropped pos table)
# ---------------------------------------------------------------------------


def sd3_patch_embed(params: Params, cfg: SD3Config,
                    latents: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] → [B, (H/p)(W/p), inner] + cropped pos_embed. The
    conv (kernel==stride==p) is a linear over channel-major patch
    vectors; pos_embed stores a [max², inner] table cropped around its
    CENTER for the actual token grid (PatchEmbed.cropped_pos_embed)."""
    p = cfg.patch_size
    b, h, w, _ = latents.shape
    ht, wt = h // p, w // p
    x = pack_latents(latents, p)  # channel-major (c, ph, pw)
    x = linear(x, params["patch_embed"])
    m = cfg.pos_embed_max_size
    table = params["pos_embed_table"].reshape(m, m, cfg.inner_dim)
    top = (m - ht) // 2
    left = (m - wt) // 2
    pos = table[top:top + ht, left:left + wt].reshape(1, ht * wt,
                                                      cfg.inner_dim)
    return x + pos.astype(x.dtype)


def sd3_time_embed(params: Params, t: jnp.ndarray, pooled: jnp.ndarray,
                   dtype) -> jnp.ndarray:
    """CombinedTimestepTextProjEmbeddings: timestep_embedder(sin(t·1000))
    + text_embedder(pooled CLIP)."""

    def mlp(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
        h = linear(x.astype(dtype), slot["linear_1"])
        h = jax.nn.silu(h.astype(jnp.float32)).astype(dtype)
        return linear(h, slot["linear_2"])

    te = params["time_embed"]
    return mlp(te["timestep_embedder"],
               _qwen_timestep_embedding(t, scale=1000.0)) + \
        mlp(te["text_embedder"], pooled)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _attend(q, k, v, hd, mesh):
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
        o = _constrain(o, mesh, P("cfg", "ulysses", None, None))
    return o.reshape(b, s, nh * hd)


def _proj_qkv(att: Params, cfg: SD3Config, x, n_tok, prefix=""):
    b = x.shape[0]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    names = (("add_q_proj", "add_k_proj", "add_v_proj", "norm_added_q",
              "norm_added_k") if prefix == "add" else
             ("to_q", "to_k", "to_v", "norm_q", "norm_k"))
    q = linear(x, att[names[0]]).reshape(b, n_tok, nh, hd)
    k = linear(x, att[names[1]]).reshape(b, n_tok, nh, hd)
    v = linear(x, att[names[2]]).reshape(b, n_tok, nh, hd)
    if cfg.qk_norm == "rms_norm":
        q = rms_norm(q, att[names[3]], eps=cfg.eps)
        k = rms_norm(k, att[names[4]], eps=cfg.eps)
    return q, k, v


def sd3_block(blk: Params, cfg: SD3Config, img: jnp.ndarray,
              txt: Optional[jnp.ndarray], temb: jnp.ndarray,
              context_pre_only: bool, dual: bool, mesh=None):
    """SD3TransformerBlock :244. Returns (img', txt' or None)."""
    hs = cfg.inner_dim
    b, tv, _ = img.shape
    tt = txt.shape[1]
    hd = cfg.attention_head_dim
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)

    imod = linear(silu_t, blk["norm1"])
    if dual:
        m = imod.reshape(b, 9, hs)
        img_m1 = (m[:, 0], m[:, 1], m[:, 2])
        img_m2 = (m[:, 3], m[:, 4], m[:, 5])
        img_m3 = (m[:, 6], m[:, 7], m[:, 8])  # attn2 modulation
    else:
        img_m1, img_m2 = _mod_chunks(imod, hs)
        img_m3 = None
    img_h = _ada_norm(img, img_m1[0], img_m1[1], cfg.eps)

    if context_pre_only:
        # AdaLayerNormContinuous: scale chunked FIRST
        cmod = linear(silu_t, blk["norm1_context"])
        scale_c, shift_c = cmod[:, :hs], cmod[:, hs:]
        txt_h = _ada_norm(txt, shift_c, scale_c, cfg.eps)
        txt_m1 = txt_m2 = None
    else:
        txt_m1, txt_m2 = _mod_chunks(linear(silu_t, blk["norm1_context"]),
                                     hs)
        txt_h = _ada_norm(txt, txt_m1[0], txt_m1[1], cfg.eps)

    att = blk["attn"]
    iq, ik, iv = _proj_qkv(att, cfg, img_h, tv)
    tq, tk, tvv = _proj_qkv(att, cfg, txt_h, tt, prefix="add")
    q = jnp.concatenate([tq, iq], axis=1)
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([tvv, iv], axis=1)
    o = _attend(q, k, v, hd, mesh)
    img = img + img_m1[2][:, None, :] * linear(o[:, tt:], att["to_out"])

    if dual:
        img_h2 = _ada_norm(img, img_m3[0], img_m3[1], cfg.eps)
        a2 = blk["attn2"]
        q2, k2, v2 = _proj_qkv(a2, cfg, img_h2, tv)
        o2 = _attend(q2, k2, v2, hd, mesh)
        img = img + img_m3[2][:, None, :] * linear(o2, a2["to_out"])

    img_h2 = _ada_norm(img, img_m2[0], img_m2[1], cfg.eps)
    img = img + img_m2[2][:, None, :] * _ff(img_h2, blk["ff"])

    if context_pre_only:
        return img, None
    txt = txt + txt_m1[2][:, None, :] * linear(o[:, :tt],
                                               att["to_add_out"])
    txt_h2 = _ada_norm(txt, txt_m2[0], txt_m2[1], cfg.eps)
    txt = txt + txt_m2[2][:, None, :] * _ff(txt_h2, blk["ff_context"])
    return img, txt


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def sd3_forward(params: Params, cfg: SD3Config, latents: jnp.ndarray,
                text_states: jnp.ndarray, timesteps: jnp.ndarray,
                pooled: Optional[jnp.ndarray] = None,
                mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent], text_states
    [B, Tt, joint_attention_dim] (CLIP+T5 concat), timesteps [B]
    (flow-match t ∈ [0,1]), pooled [B, pooled_projection_dim] (CLIP
    pooled — zeros when the serving path has no CLIP tower) → velocity
    prediction, same shape as latents."""
    b, h, w, c = latents.shape
    p = cfg.patch_size
    img = sd3_patch_embed(params, cfg, latents)
    img = _constrain(img, mesh, P("cfg", "ulysses", None))
    txt = linear(text_states, params["context_embedder"])
    if pooled is None:
        pooled = jnp.zeros((b, cfg.pooled_projection_dim), img.dtype)
    temb = sd3_time_embed(params, timesteps, pooled, img.dtype)

    n = cfg.num_layers
    for i, blk in enumerate(params["blocks"]):
        img, txt = sd3_block(blk, cfg, img, txt, temb,
                             context_pre_only=(i == n - 1),
                             dual=(i in cfg.dual_attention_layers),
                             mesh=mesh)

    hs = cfg.inner_dim
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["norm_out"])
    scale_o, shift_o = fin[:, :hs], fin[:, hs:]
    out = _ada_norm(img, shift_o, scale_o, cfg.eps)
    out = linear(out, params["proj_out"])
    # diffusers unpatchify is PATCH-major (nhwpqc→nchpwq), unlike the
    # channel-major input packing
    ht, wt = h // p, w // p
    oc = cfg.out_channels
    out = out.reshape(b, ht, wt, p, p, oc)
    out = out.transpose(0, 1, 3, 2, 4, 5)  # [B, ht, p, wt, p, C]
    return out.reshape(b, h, w, oc)


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def _attn_slot(keys, cfg, dtype, added: bool):
    hs, hd = cfg.inner_dim, cfg.attention_head_dim
    slot = {
        "to_q": _lin(next(keys), hs, hs, dtype),
        "to_k": _lin(next(keys), hs, hs, dtype),
        "to_v": _lin(next(keys), hs, hs, dtype),
        "to_out": _lin(next(keys), hs, hs, dtype),
    }
    if cfg.qk_norm == "rms_norm":
        slot["norm_q"] = jnp.ones((hd,), dtype)
        slot["norm_k"] = jnp.ones((hd,), dtype)
    if added:
        slot["add_q_proj"] = _lin(next(keys), hs, hs, dtype)
        slot["add_k_proj"] = _lin(next(keys), hs, hs, dtype)
        slot["add_v_proj"] = _lin(next(keys), hs, hs, dtype)
        if cfg.qk_norm == "rms_norm":
            slot["norm_added_q"] = jnp.ones((hd,), dtype)
            slot["norm_added_k"] = jnp.ones((hd,), dtype)
    return slot


def init_sd3_params(cfg: SD3Config, key: jax.Array,
                    dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 24 + 12))
    hs = cfg.inner_dim
    mlp = hs * 4
    p = cfg.patch_size
    params: Params = {
        "patch_embed": _lin(next(keys), cfg.in_channels * p * p, hs,
                            dtype),
        "pos_embed_table": (jax.random.normal(
            next(keys), (cfg.pos_embed_max_size ** 2, hs), jnp.float32)
            * 0.02).astype(dtype),
        "context_embedder": _lin(next(keys), cfg.joint_attention_dim,
                                 cfg.caption_projection_dim, dtype),
        "time_embed": {
            "timestep_embedder": {
                "linear_1": _lin(next(keys), 256, hs, dtype),
                "linear_2": _lin(next(keys), hs, hs, dtype)},
            "text_embedder": {
                "linear_1": _lin(next(keys), cfg.pooled_projection_dim,
                                 hs, dtype),
                "linear_2": _lin(next(keys), hs, hs, dtype)},
        },
        "norm_out": _lin(next(keys), hs, 2 * hs, dtype, scale=0.02),
        "proj_out": _lin(next(keys), hs, p * p * cfg.out_channels, dtype),
        "blocks": [],
    }
    n = cfg.num_layers
    for i in range(n):
        last = i == n - 1
        dual = i in cfg.dual_attention_layers
        blk = {
            "norm1": _lin(next(keys), hs, (9 if dual else 6) * hs, dtype,
                          scale=0.02),
            "norm1_context": _lin(next(keys), hs,
                                  (2 if last else 6) * hs, dtype,
                                  scale=0.02),
            "attn": _attn_slot(keys, cfg, dtype, added=True),
            "ff": {"net0": _lin(next(keys), hs, mlp, dtype),
                   "net2": _lin(next(keys), mlp, hs, dtype)},
        }
        if not last:
            blk["attn"]["to_add_out"] = _lin(next(keys), hs, hs, dtype)
            blk["ff_context"] = {"net0": _lin(next(keys), hs, mlp, dtype),
                                 "net2": _lin(next(keys), mlp, hs, dtype)}
        if dual:
            blk["attn2"] = _attn_slot(keys, cfg, dtype, added=False)
        params["blocks"].append(blk)
    return params


def sd3_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/mlp-in column-split, out/mlp-out row-split;
    modulation, embedders and the pos table replicate."""
    col = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
           "add_v_proj", "net0"}
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


def assign_sd3_tensor(params: Params, name: str, value, dtype) -> bool:
    """Map one diffusers-format tensor (SD3Transformer2DModel naming,
    reference load_weights :512) into the pytree. Conv patch weights
    [D, C, p, p] flatten channel-major; torch Linear [out, in]
    transposes. Returns False if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    parts = name.split(".")
    if parts[0] == "pos_embed":
        if parts[1] == "proj":
            if parts[2] == "weight":  # [D, C, p, p] → [C·p·p, D]
                d = value.shape[0]
                params["patch_embed"]["w"] = jnp.asarray(
                    _np.ascontiguousarray(
                        value.reshape(d, -1).T)).astype(dtype)
            else:
                params["patch_embed"]["b"] = b(value)
            return True
        if parts[1] == "pos_embed":  # buffer [1, max², D]
            params["pos_embed_table"] = jnp.asarray(
                value.reshape(value.shape[-2], value.shape[-1])
            ).astype(dtype)
            return True
        return False
    if parts[0] == "context_embedder" and len(parts) == 2:
        put(params["context_embedder"],
            "w" if parts[1] == "weight" else "b", value)
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
    if parts[0] == "proj_out" and len(parts) == 2:
        put(params["proj_out"], "w" if parts[1] == "weight" else "b",
            value)
        return True
    if parts[0] != "transformer_blocks":
        return False
    blk = params["blocks"][int(parts[1])]
    rest = parts[2:]
    if rest[0] in ("norm1", "norm1_context") and rest[1] == "linear":
        put(blk[rest[0]], "w" if rest[2] == "weight" else "b", value)
        return True
    if rest[0] in ("attn", "attn2"):
        a = blk.get(rest[0])
        if a is None:
            return False
        if rest[1] in ("norm_q", "norm_k", "norm_added_q",
                       "norm_added_k") and rest[2] == "weight":
            if rest[1] not in a:
                return False
            a[rest[1]] = b(value)
            return True
        if rest[1] in ("to_q", "to_k", "to_v", "add_q_proj",
                       "add_k_proj", "add_v_proj", "to_add_out"):
            if rest[1] not in a:
                return False
            put(a[rest[1]], "w" if rest[2] == "weight" else "b", value)
            return True
        if rest[1] == "to_out":  # ModuleList: attn.to_out.0.weight
            leaf = rest[3] if rest[2] == "0" else rest[2]
            put(a["to_out"], "w" if leaf == "weight" else "b", value)
            return True
        return False
    if rest[0] in ("ff", "ff_context") and rest[1] == "net":
        mlp = blk.get(rest[0])
        if mlp is None:
            return False
        if rest[2] == "0":  # net.0.proj.{weight,bias}
            put(mlp["net0"], "w" if rest[4] == "weight" else "b", value)
            return True
        if rest[2] == "2":
            put(mlp["net2"], "w" if rest[3] == "weight" else "b", value)
            return True
    return False
