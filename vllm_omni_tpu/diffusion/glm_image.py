"""GLM-Image DiT with real checkpoint geometry.

Reference parity: diffusion/models/glm_image/glm_image_transformer.py
(GlmImageTransformer2DModel :843 — CogView-lineage joint text+image
blocks: a single 12-chunk AdaLN linear with NO preceding SiLU :227
modulating both streams (interleaved img/ctx chunk order), per-head
LayerNorm (not RMS) q/k norms :486, 2D rope with duplicated-halves
tables applied to IMAGE tokens only :573, a SHARED FF applied to both
streams :833, prior-VQ-token conditioning added to the patch embedding
:1029 with CFG via per-row prior drop (pipeline :505-506), SDXL-like
target-size/crop conditioning, and a no-SiLU scale-first final AdaLN
:276). Pipeline timestep convention :515: t_model = σ·1000 − 1.

Serving notes: glyph text states and AR prior tokens ride in from the
upstream GLM-Image AR stage (models/registry.py glm_image family);
absent priors fall back to dropped-prior rows (the reference's uncond
branch semantics).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain, _layer_norm_nb
from vllm_omni_tpu.diffusion.qwen_image import _qwen_timestep_embedding
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla

Params = dict


@dataclass
class GlmImageConfig:
    """Mirrors the transformer's diffusers config.json
    (GlmImageTransformer2DModel :879: 64 heads × 40, time_embed 512,
    condition_dim 256, glyph text_embed_dim per checkpoint)."""

    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    num_layers: int = 28
    num_attention_heads: int = 64
    attention_head_dim: int = 40
    time_embed_dim: int = 512
    condition_dim: int = 256
    prior_vq_quantizer_codebook_size: int = 16384
    text_embed_dim: int = 1472
    eps: float = 1e-5

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
    def pooled_projection_dim(self) -> int:
        return 2 * 2 * self.condition_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "GlmImageConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        return cls(**kw)


def glm_image_rope(cfg: GlmImageConfig, h_tokens: int, w_tokens: int
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [H'·W', head_dim] — per-axis half-frequency tables
    concatenated [h|w] then duplicated (:128-166); applied with the
    NeoX-halves rotation (use_real_unbind_dim=-2)."""
    d = cfg.attention_head_dim
    dh = dw = d // 2

    def inv(dim):
        return 1.0 / (10000.0 ** (np.arange(0, dim, 2,
                                            dtype=np.float64)[:dim // 2]
                                  / dim))

    fh = np.arange(h_tokens, dtype=np.float64)[:, None] * inv(dh)[None]
    fw = np.arange(w_tokens, dtype=np.float64)[:, None] * inv(dw)[None]
    fh = np.broadcast_to(fh[:, None, :], (h_tokens, w_tokens, dh // 2))
    fw = np.broadcast_to(fw[None, :, :], (h_tokens, w_tokens, dw // 2))
    freqs = np.concatenate([fh, fw], axis=-1).reshape(
        h_tokens * w_tokens, -1)
    freqs = np.concatenate([freqs, freqs], axis=-1)  # [S, D]
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


def _apply_rope_halves(x: jnp.ndarray, cos: jnp.ndarray,
                       sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, D]; cos/sin [S, D] duplicated halves; rotation
    splits x into halves (diffusers use_real_unbind_dim=-2)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    out = xf * cos[None, :, None, :] + rot * sin[None, :, None, :]
    return out.astype(orig)


def _ln_head(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """per-head no-affine LayerNorm (:486)."""
    return _layer_norm_nb(x, eps)


def _ff(slot: Params, x: jnp.ndarray, act: str) -> jnp.ndarray:
    h = linear(x, slot["net0"])
    if act == "gelu_tanh":
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=True).astype(x.dtype)
    elif act == "gelu":
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=False).astype(x.dtype)
    else:  # linear-silu
        h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return linear(h, slot["net2"])


def glm_image_block(blk: Params, cfg: GlmImageConfig, x: jnp.ndarray,
                    ctx: jnp.ndarray, temb: jnp.ndarray,
                    cos: jnp.ndarray, sin: jnp.ndarray, mesh=None
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """GlmImageTransformerBlock :745. Returns (img', ctx')."""
    eps = cfg.eps
    b, sv, hs = x.shape
    tt = ctx.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim

    # 12-chunk AdaLN, NO silu, interleaved img/ctx order (:241)
    mod = linear(temb, blk["norm1"]).reshape(b, 1, 12, hs)
    (sh_msa, c_sh_msa, sc_msa, c_sc_msa, g_msa, c_g_msa,
     sh_mlp, c_sh_mlp, sc_mlp, c_sc_mlp, g_mlp, c_g_mlp) = [
        mod[:, :, i] for i in range(12)]

    xn = _layer_norm_nb(x, eps) * (1.0 + sc_msa) + sh_msa
    cn = _layer_norm_nb(ctx, eps) * (1.0 + c_sc_msa) + c_sh_msa

    a = blk["attn1"]
    joint = jnp.concatenate([cn, xn], axis=1)  # text FIRST (:551)
    s = tt + sv
    q = linear(joint, a["to_q"]).reshape(b, s, nh, hd)
    k = linear(joint, a["to_k"]).reshape(b, s, nh, hd)
    v = linear(joint, a["to_v"]).reshape(b, s, nh, hd)
    q = _ln_head(q, eps)
    k = _ln_head(k, eps)
    # rope on IMAGE tokens only
    qi = _apply_rope_halves(q[:, tt:], cos, sin)
    ki = _apply_rope_halves(k[:, tt:], cos, sin)
    q = jnp.concatenate([q[:, :tt], qi], axis=1)
    k = jnp.concatenate([k[:, :tt], ki], axis=1)
    if mesh is not None:
        q = _constrain(q, mesh, P("cfg", None, ("ulysses", "tp"), None))
    o = mha_xla(q, k, v, scale=hd ** -0.5)
    o = linear(o.reshape(b, s, nh * hd), a["to_out"])
    x = x + o[:, tt:] * g_msa
    ctx = ctx + o[:, :tt] * c_g_msa

    xn2 = _layer_norm_nb(x, eps) * (1.0 + sc_mlp) + sh_mlp
    cn2 = _layer_norm_nb(ctx, eps) * (1.0 + c_sc_mlp) + c_sh_mlp
    # the FF is SHARED between streams (:833-836)
    x = x + _ff(blk["ff"], xn2, "gelu_tanh") * g_mlp
    ctx = ctx + _ff(blk["ff"], cn2, "gelu_tanh") * c_g_mlp
    return x, ctx


def glm_image_forward(params: Params, cfg: GlmImageConfig,
                      latents: jnp.ndarray, text_states: jnp.ndarray,
                      timesteps: jnp.ndarray,
                      prior_token_id: Optional[jnp.ndarray] = None,
                      prior_token_drop: Optional[jnp.ndarray] = None,
                      target_size: Optional[jnp.ndarray] = None,
                      crop_coords: Optional[jnp.ndarray] = None,
                      mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent], text_states
    [B, Tt, text_embed_dim] (glyph encoder), timesteps [B] in the
    REFERENCE model convention (σ·1000 − 1, pipeline :515 — the
    serving wrapper converts), prior_token_id [B, H'·W'] AR VQ tokens
    (zeros when absent), prior_token_drop [B] bool (True = CFG-dropped
    prior row) → velocity, same shape as latents."""
    b, h, w, c = latents.shape
    p = cfg.patch_size
    dtype = params["proj_out"]["w"].dtype
    hp, wp = h // p, w // p
    n_img = hp * wp

    ctx = _ff(params["glyph_projector"], text_states.astype(dtype),
              "gelu")

    if prior_token_id is None:
        prior_token_id = jnp.zeros((b, n_img), jnp.int32)
        prior_token_drop = jnp.ones((b,), bool)
    if prior_token_drop is None:
        prior_token_drop = jnp.zeros((b,), bool)
    prior = params["prior_token_embedding"][prior_token_id].astype(dtype)
    prior = prior * (1.0 - prior_token_drop[:, None, None].astype(
        jnp.float32)).astype(dtype)
    prior = _ff(params["prior_projector"], prior, "linear-silu")

    # GlmImageImageProjector :120 flattens (c, ph, pw) channel-SLOWEST
    x = _pack_glm(latents.astype(dtype), p)
    x = linear(x, params["image_projector"]) + prior
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    # GlmImageCombinedTimestepSizeEmbeddings (CogView lineage): sin/cos
    # projections of the timestep and of each size/crop scalar, then
    # two MLPs summed
    tc = params["time_condition_embed"]
    e = _qwen_timestep_embedding(timesteps, dim=cfg.time_embed_dim,
                                 scale=1.0).astype(dtype)
    e = linear(e, tc["timestep_embedder"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, tc["timestep_embedder"]["linear_2"])
    if target_size is None:
        target_size = jnp.broadcast_to(
            jnp.asarray([h * 8, w * 8], jnp.float32)[None], (b, 2))
    if crop_coords is None:
        crop_coords = jnp.zeros((b, 2), jnp.float32)
    conds = jnp.concatenate([target_size, crop_coords], axis=1)  # [B,4]
    ce = _qwen_timestep_embedding(conds.reshape(-1),
                                  dim=cfg.condition_dim,
                                  scale=1.0).astype(dtype)
    ce = ce.reshape(b, 4 * cfg.condition_dim)
    ce = linear(ce, tc["condition_embedder"]["linear_1"])
    ce = jax.nn.silu(ce.astype(jnp.float32)).astype(dtype)
    temb = temb + linear(ce, tc["condition_embedder"]["linear_2"])

    cos, sin = glm_image_rope(cfg, hp, wp)
    for blk in params["blocks"]:
        x, ctx = glm_image_block(blk, cfg, x, ctx, temb, cos, sin,
                                 mesh=mesh)

    # final AdaLN: NO silu, scale chunked FIRST (:276)
    fin = linear(temb, params["norm_out"])
    hs = cfg.inner_dim
    scale_o, shift_o = fin[:, None, :hs], fin[:, None, hs:]
    out = _layer_norm_nb(x, cfg.eps) * (1.0 + scale_o) + shift_o
    out = linear(out, params["proj_out"])
    return _unpack_glm(out, h, w, p, cfg.out_channels)


def _pack_glm(latents: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, H'W', C·p·p], features (c, ph, pw) with c
    SLOWEST (GlmImageImageProjector :120 permute(0,2,4,1,3,5))."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H', W', C, ph, pw]
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def _unpack_glm(tokens: jnp.ndarray, h: int, w: int, p: int,
                c: int) -> jnp.ndarray:
    """Inverse of the OUTPUT layout (:1091 permute(0,3,1,4,2,5):
    features (c, ph, pw))."""
    b = tokens.shape[0]
    x = tokens.reshape(b, h // p, w // p, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, bias=True, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    slot = {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype)}
    if bias:
        slot["b"] = jnp.zeros((n_out,), dtype)
    return slot


def init_glm_image_params(cfg: GlmImageConfig, key: jax.Array,
                          dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 16))
    hs = cfg.inner_dim
    ffn = hs * 4
    tok = cfg.in_channels * cfg.patch_size ** 2
    params: Params = {
        "image_projector": _lin(next(keys), tok, hs, dtype),
        "glyph_projector": {
            "net0": _lin(next(keys), cfg.text_embed_dim, hs, dtype),
            "net2": _lin(next(keys), hs, hs, dtype)},
        "prior_token_embedding": (jax.random.normal(
            next(keys), (cfg.prior_vq_quantizer_codebook_size, hs),
            jnp.float32) * 0.02).astype(dtype),
        "prior_projector": {
            "net0": _lin(next(keys), hs, hs, dtype),
            "net2": _lin(next(keys), hs, hs, dtype)},
        "time_condition_embed": {
            "timestep_embedder": {
                "linear_1": _lin(next(keys), cfg.time_embed_dim,
                                 cfg.time_embed_dim, dtype),
                "linear_2": _lin(next(keys), cfg.time_embed_dim,
                                 cfg.time_embed_dim, dtype)},
            "condition_embedder": {
                "linear_1": _lin(next(keys), cfg.pooled_projection_dim,
                                 cfg.time_embed_dim, dtype),
                "linear_2": _lin(next(keys), cfg.time_embed_dim,
                                 cfg.time_embed_dim, dtype)}},
        "norm_out": _lin(next(keys), cfg.time_embed_dim, 2 * hs, dtype,
                         scale=0.02),
        "proj_out": _lin(next(keys), hs,
                         cfg.patch_size ** 2 * cfg.out_channels, dtype),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "norm1": _lin(next(keys), cfg.time_embed_dim, 12 * hs,
                          dtype, scale=0.02),
            "attn1": {"to_q": _lin(next(keys), hs, hs, dtype),
                      "to_k": _lin(next(keys), hs, hs, dtype),
                      "to_v": _lin(next(keys), hs, hs, dtype),
                      "to_out": _lin(next(keys), hs, hs, dtype)},
            "ff": {"net0": _lin(next(keys), hs, ffn, dtype),
                   "net2": _lin(next(keys), ffn, hs, dtype)},
        })
    return params


def glm_image_param_shardings(params: Params) -> Params:
    col = {"to_q", "to_k", "to_v", "net0"}
    row = {"to_out", "net2"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        gparent = names[-3] if len(names) >= 3 else ""
        if gparent in ("attn1", "ff") or parent in ("attn1", "ff"):
            if parent in col:
                return P(None, "tp") if leaf_name == "w" else P("tp")
            if parent in row:
                return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_glm_image_tensor(params: Params, name: str, value,
                            dtype) -> bool:
    """Map one diffusers-format tensor (GlmImageTransformer2DModel
    naming, reference load_weights :1097 — separate to_q/to_k/to_v,
    ff.net.0/.net.2 ColumnParallelGELU Linears)."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    def put_ff(slot: dict, rest, v) -> bool:
        if rest[0] == "net" and rest[1] in ("0", "2"):
            leaf = "w" if rest[2] == "weight" else "b"
            return put(slot["net0" if rest[1] == "0" else "net2"],
                       leaf, v)
        return False

    parts = name.split(".")
    if parts[0] == "image_projector" and parts[1] == "proj":
        return put(params["image_projector"],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] in ("glyph_projector", "prior_projector"):
        return put_ff(params[parts[0]], parts[1:], value)
    if name == "prior_token_embedding.weight":
        params["prior_token_embedding"] = jnp.asarray(value).astype(
            dtype)
        return True
    if parts[0] == "time_condition_embed":
        slot = params["time_condition_embed"].get(parts[1], {})
        if parts[2] in slot:
            return put(slot[parts[2]],
                       "w" if parts[3] == "weight" else "b", value)
        return False
    if parts[:2] == ["norm_out", "linear"]:
        return put(params["norm_out"],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] == "proj_out" and len(parts) == 2:
        return put(params["proj_out"],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[0] == "transformer_blocks":
        blk = params["blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "norm1" and rest[1] == "linear":
            return put(blk["norm1"],
                       "w" if rest[2] == "weight" else "b", value)
        if rest[0] == "attn1":
            a = blk["attn1"]
            if rest[1] in ("to_q", "to_k", "to_v"):
                return put(a[rest[1]],
                           "w" if rest[2] == "weight" else "b", value)
            if rest[1] == "to_out":
                leaf = rest[3] if rest[2] == "0" else rest[2]
                return put(a["to_out"],
                           "w" if leaf == "weight" else "b", value)
            return False
        if rest[0] == "ff":
            return put_ff(blk["ff"], rest[1:], value)
    return False
