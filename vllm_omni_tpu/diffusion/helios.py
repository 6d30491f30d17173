"""Helios video DiT with real checkpoint geometry.

Reference parity: diffusion/models/helios/helios_transformer.py
(HeliosTransformer3DModel :571 — a Wan2.2-architecture video DiT
extended with streaming history: multi-term memory patch embedders
:669, per-token timestep broadcast, history key amplification :359 and
guidance cross-attention. With no history (the T2V serving path,
pipeline_helios.py :693) every extension degenerates to exactly the
Wan block math, so this module reuses wan.py's block over the same
param layout and owns only the config, the explicit rope dims
(HeliosRotaryPosEmbed :156 — config rope_dim instead of Wan's derived
split, frame indices 0..F-1 for a single chunk), the
HeliosOutputNorm head (:247 — scale_shift_table lives UNDER norm_out
in the checkpoint) and the name mapping (ffn.net.0 is a plain Linear,
not Wan's net.0.proj; history-only tensors patch_short/mid/long and
history_key_scale are mapped and parked).

The rope application (apply_rotary_emb_helios :53 — adjacent-pair
rotation against repeat_interleaved tables) is byte-identical to
dit.apply_rope_interleaved with half-width per-axis tables.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain, _layer_norm_nb
from vllm_omni_tpu.diffusion.qwen_image import _qwen_timestep_embedding
from vllm_omni_tpu.diffusion.wan import (wan_block, wan_pack_latents,
                                         wan_param_shardings,
                                         wan_unpack_latents)
from vllm_omni_tpu.models.decoder import linear

Params = dict


@dataclass
class HeliosConfig:
    """Mirrors the transformer's diffusers config.json
    (HeliosTransformer3DModel.__init__ :603: 40 layers of 40×128,
    ffn 13824, rope (44, 42, 42) at theta 10000)."""

    patch_size: tuple = (1, 2, 2)
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
    rope_dim: tuple = (44, 42, 42)
    rope_theta: float = 10000.0
    guidance_cross_attn: bool = True
    zero_history_timestep: bool = True
    has_multi_term_memory_patch: bool = True
    is_amplify_history: bool = False
    num_train_timesteps: int = 1000

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def joint_attention_dim(self) -> int:
        return self.text_dim

    @property
    def pack_factor(self) -> int:
        return self.patch_size[1]

    @classmethod
    def from_json(cls, cfg: dict) -> "HeliosConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        for t in ("patch_size", "rope_dim"):
            if t in kw:
                kw[t] = tuple(kw[t])
        return cls(**kw)


def helios_rope(cfg: HeliosConfig, f_tokens: int, h_tokens: int,
                w_tokens: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [F'·H'·W', head_dim//2], (f, h, w) row-major; explicit
    config rope_dim and theta; single-chunk frame indices 0..F'-1."""
    d_t, d_h, d_w = cfg.rope_dim

    def axis_freqs(n: int, dim: int) -> np.ndarray:
        inv = 1.0 / (cfg.rope_theta **
                     (np.arange(0, dim, 2, dtype=np.float64) / dim))
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


def helios_forward(params: Params, cfg: HeliosConfig,
                   latents: jnp.ndarray, text_states: jnp.ndarray,
                   timesteps: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """latents [B, F, H, W, C] (or [B, H, W, C] → F=1), text_states
    [B, Tt, text_dim] (umt5), timesteps [B] flow-match σ ∈ [0,1]
    (scaled to train-timestep units internally, matching the pipeline's
    raw scheduler timesteps) → velocity, same shape as latents."""
    squeeze_f = latents.ndim == 4
    if squeeze_f:
        latents = latents[:, None]
    b, f, h, w, c = latents.shape
    pt, ph, pw = cfg.patch_size
    dtype = params["proj_out"]["w"].dtype

    x = wan_pack_latents(latents.astype(dtype), cfg.patch_size)
    x = linear(x, params["patch_embedding"])
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    ce = params["condition_embedder"]
    t_train = timesteps.astype(jnp.float32) * cfg.num_train_timesteps
    e = _qwen_timestep_embedding(t_train, dim=cfg.freq_dim,
                                 scale=1.0).astype(dtype)
    e = linear(e, ce["time_embedder"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, ce["time_embedder"]["linear_2"])
    tproj = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                   ce["time_proj"])
    tproj = tproj.reshape(b, 6, cfg.inner_dim)

    txt = linear(text_states.astype(dtype),
                 ce["text_embedder"]["linear_1"])
    txt = jax.nn.gelu(txt.astype(jnp.float32),
                      approximate=True).astype(dtype)
    txt = linear(txt, ce["text_embedder"]["linear_2"])

    cos, sin = helios_rope(cfg, f // pt, h // ph, w // pw)

    for blk in params["blocks"]:
        x = wan_block(blk, cfg, x, txt, tproj, cos, sin, mesh=mesh)

    # HeliosOutputNorm :247 — per-token temb collapses to Wan's head
    # for a single chunk
    fin = (params["norm_out_scale_shift_table"][None] +
           temb[:, None, :]).astype(jnp.float32)
    shift, scale = fin[:, 0], fin[:, 1]
    out = (_layer_norm_nb(x.astype(jnp.float32), cfg.eps) *
           (1.0 + scale[:, None, :]) + shift[:, None, :]).astype(dtype)
    out = linear(out, params["proj_out"])
    out = wan_unpack_latents(out, f, h, w, cfg.patch_size,
                             cfg.out_channels)
    return out[:, 0] if squeeze_f else out


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def init_helios_params(cfg: HeliosConfig, key: jax.Array,
                       dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 16 + 16))
    hs = cfg.inner_dim
    pt, ph, pw = cfg.patch_size
    pin = cfg.in_channels * pt * ph * pw
    pout = cfg.out_channels * pt * ph * pw
    params: Params = {
        "patch_embedding": _lin(next(keys), pin, hs, dtype),
        "condition_embedder": {
            "time_embedder": {
                "linear_1": _lin(next(keys), cfg.freq_dim, hs, dtype),
                "linear_2": _lin(next(keys), hs, hs, dtype)},
            "time_proj": _lin(next(keys), hs, 6 * hs, dtype,
                              scale=0.02),
            "text_embedder": {
                "linear_1": _lin(next(keys), cfg.text_dim, hs, dtype),
                "linear_2": _lin(next(keys), hs, hs, dtype)},
        },
        "norm_out_scale_shift_table": (jax.random.normal(
            next(keys), (2, hs), jnp.float32) * hs ** -0.5).astype(
            dtype),
        "proj_out": _lin(next(keys), hs, pout, dtype),
        "blocks": [],
        # history-only tensors (multi-term memory patches, key
        # amplification) — loaded for checkpoint completeness, unused
        # on the single-chunk path
        "history": {},
    }
    if cfg.has_multi_term_memory_patch:
        for nm, k in (("patch_short", (1, 2, 2)), ("patch_mid",
                                                   (2, 4, 4)),
                      ("patch_long", (4, 8, 8))):
            params["history"][nm] = _lin(
                next(keys), cfg.in_channels * k[0] * k[1] * k[2], hs,
                dtype)
    for _ in range(cfg.num_layers):
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
        if cfg.is_amplify_history:
            blk["history_key_scale"] = jnp.ones(
                (cfg.num_attention_heads,), dtype)
        params["blocks"].append(blk)
    return params


def helios_param_shardings(params: Params) -> Params:
    return wan_param_shardings(params)


def assign_helios_tensor(params: Params, name: str, value,
                         dtype) -> bool:
    """Map one diffusers-format tensor (HeliosTransformer3DModel naming,
    reference load_weights :885 — ffn.net.0 plain Linear, to_out.0
    ModuleList, norm_out.scale_shift_table)."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    def put_conv3d(slot: dict, leaf: str, v) -> bool:
        if leaf == "w":
            o = v.shape[0]
            slot["w"] = jnp.asarray(
                _np.ascontiguousarray(v.reshape(o, -1).T)).astype(dtype)
        else:
            slot["b"] = b(v)
        return True

    parts = name.split(".")
    if parts[0] == "patch_embedding":
        return put_conv3d(params["patch_embedding"],
                          "w" if parts[1] == "weight" else "b", value)
    if parts[0] in ("patch_short", "patch_mid", "patch_long"):
        slot = params["history"].setdefault(parts[0], {})
        return put_conv3d(slot, "w" if parts[1] == "weight" else "b",
                          value)
    if parts[0] == "condition_embedder":
        ce = params["condition_embedder"]
        if parts[1] in ("time_embedder", "text_embedder"):
            slot = ce[parts[1]].get(parts[2])
            if slot is None:
                return False
            return put(slot, "w" if parts[3] == "weight" else "b",
                       value)
        if parts[1] == "time_proj":
            return put(ce["time_proj"],
                       "w" if parts[2] == "weight" else "b", value)
        return False
    if parts[:2] == ["norm_out", "scale_shift_table"]:
        params["norm_out_scale_shift_table"] = jnp.asarray(
            value).reshape(2, -1).astype(dtype)
        return True
    if parts[0] == "proj_out" and len(parts) == 2:
        return put(params["proj_out"],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[0] != "blocks":
        return False
    blk = params["blocks"][int(parts[1])]
    rest = parts[2:]
    if rest[0] == "scale_shift_table":
        blk["scale_shift_table"] = jnp.asarray(
            value).reshape(6, -1).astype(dtype)
        return True
    if rest[0] in ("attn1", "attn2"):
        a = blk[rest[0]]
        if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
            a[rest[1]] = b(value)
            return True
        if rest[1] == "history_key_scale":
            blk["history_key_scale"] = b(value)
            return True
        if rest[1] in ("to_q", "to_k", "to_v"):
            return put(a[rest[1]],
                       "w" if rest[2] == "weight" else "b", value)
        if rest[1] == "to_out":
            leaf = rest[3] if rest[2] == "0" else rest[2]
            return put(a["to_out"], "w" if leaf == "weight" else "b",
                       value)
        return False
    if rest[0] == "norm2" and "norm2" in blk:
        blk["norm2"]["w" if rest[1] == "weight" else "b"] = b(value)
        return True
    if rest[0] == "ffn" and rest[1] == "net":
        slot = {"0": "net0", "2": "net2"}.get(rest[2])
        if slot is None:
            return False
        return put(blk["ffn"][slot],
                   "w" if rest[3] == "weight" else "b", value)
    return False
