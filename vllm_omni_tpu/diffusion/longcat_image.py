"""LongCat-Image MMDiT with real checkpoint geometry.

Reference parity: diffusion/models/longcat_image/
longcat_image_transformer.py (LongCatImageTransformer2DModel :577 —
flux-architecture dual+single stream blocks with flux-style checkpoint
naming :728-757 (.to_out.0, .ff.net.0.proj/.net.2), but NO pooled-CLIP
or guidance embedding: time_embed carries only the timestep embedder
:427) and pipeline_longcat_image.py (text ids (0, i, i)
prepare_pos_ids :113 — positions on both spatial axes like Ovis;
CFG renormalization cfg_normalize_function :467 — the combined
prediction is rescaled per-token by ‖cond‖/‖comb‖ clamped to ≤1).

The block math is IDENTICAL to Flux1 (AdaLN-Zero, joint attention with
per-head RMS q/k norms, gelu-tanh FFs, parallel single blocks), so this
module reuses flux.py's block functions over the same param layout and
only owns the conditioning head, rope ids and name mapping.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain
from vllm_omni_tpu.diffusion.flux import (flux_double_block,
                                          flux_single_block,
                                          flux_param_shardings)
from vllm_omni_tpu.diffusion.ovis_image import ovis_rope
from vllm_omni_tpu.diffusion.qwen_image import (_ada_norm,
                                                _qwen_timestep_embedding,
                                                pack_latents,
                                                unpack_latents)
from vllm_omni_tpu.models.decoder import linear

Params = dict


@dataclass
class LongCatImageConfig:
    """Mirrors the transformer's diffusers config.json
    (model_config consumed at :604)."""

    patch_size: int = 1
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 19
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096
    pooled_projection_dim: int = 768  # present in config, unused
    axes_dims_rope: tuple = (16, 56, 56)
    theta: float = 10000.0
    eps: float = 1e-6

    pack_factor: int = 2

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "LongCatImageConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


def longcat_image_forward(params: Params, cfg: LongCatImageConfig,
                          latents: jnp.ndarray,
                          text_states: jnp.ndarray,
                          timesteps: jnp.ndarray, mesh=None
                          ) -> jnp.ndarray:
    """latents [B, H, W, C_latent], text_states
    [B, Tt, joint_attention_dim], timesteps [B] (flow-match σ ∈ [0,1],
    ×1000 inside like the reference :686) → velocity prediction."""
    b, h, w, c = latents.shape
    p = cfg.pack_factor
    img = pack_latents(latents, p)
    img = linear(img, params["x_embedder"])
    txt = linear(text_states.astype(img.dtype),
                 params["context_embedder"])
    img = _constrain(img, mesh, P("cfg", "ulysses", None))

    # LongCatImageTimestepEmbeddings :427 — timestep only
    e = _qwen_timestep_embedding(timesteps, scale=1000.0).astype(
        img.dtype)
    te = params["time_embed"]["timestep_embedder"]
    e = linear(e, te["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(img.dtype)
    temb = linear(e, te["linear_2"])

    # text ids (0, i, i), image ids (0, row, col) — same layout as
    # ovis_rope (duck-typed on axes_dims_rope/theta/attention_head_dim)
    cos, sin = ovis_rope(cfg, h // p, w // p, text_states.shape[1])

    for blk in params["double_blocks"]:
        img, txt = flux_double_block(blk, cfg, img, txt, temb, cos, sin,
                                     mesh=mesh)
    x = jnp.concatenate([txt, img], axis=1)
    for blk in params["single_blocks"]:
        x = flux_single_block(blk, cfg, x, temb, cos, sin, mesh=mesh)
    img = x[:, txt.shape[1]:]

    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["norm_out"])
    hs = cfg.inner_dim
    scale_o, shift_o = fin[:, :hs], fin[:, hs:]
    out = _ada_norm(img, shift_o, scale_o, cfg.eps)
    out = linear(out, params["proj_out"])
    return unpack_latents(out, h, w, p)


def cfg_renormalize(v_cond: jnp.ndarray, v_comb: jnp.ndarray,
                    renorm_min: float = 0.0) -> jnp.ndarray:
    """pipeline_longcat_image.py cfg_normalize_function :467 — rescale
    the combined prediction per-token so its norm never exceeds the
    conditional branch's."""
    cond_norm = jnp.linalg.norm(v_cond, axis=-1, keepdims=True)
    comb_norm = jnp.linalg.norm(v_comb, axis=-1, keepdims=True)
    scale = jnp.clip(cond_norm / (comb_norm + 1e-8), renorm_min, 1.0)
    return v_comb * scale


def init_longcat_image_params(cfg: LongCatImageConfig, key: jax.Array,
                              dtype=jnp.bfloat16) -> Params:
    """Same layout as flux minus pooled/guidance embedders (reusable by
    flux block functions)."""
    from vllm_omni_tpu.diffusion.flux import FluxConfig, init_flux_params

    fcfg = FluxConfig(
        patch_size=cfg.patch_size, in_channels=cfg.in_channels,
        out_channels=cfg.out_channels, num_layers=cfg.num_layers,
        num_single_layers=cfg.num_single_layers,
        attention_head_dim=cfg.attention_head_dim,
        num_attention_heads=cfg.num_attention_heads,
        joint_attention_dim=cfg.joint_attention_dim,
        guidance_embeds=False, axes_dims_rope=cfg.axes_dims_rope)
    params = init_flux_params(fcfg, key, dtype)
    te = params.pop("time_embed")
    del te["text_embedder"]  # longcat has no pooled-CLIP embedder
    params["time_embed"] = {"timestep_embedder": te["timestep_embedder"]}
    return params


def longcat_image_param_shardings(params: Params) -> Params:
    return flux_param_shardings(params)


def assign_longcat_image_tensor(params: Params, name: str, value,
                                dtype) -> bool:
    """Flux-style checkpoint naming (reference load_weights :728 maps
    .to_out.0/.ff.net.* itself) with time_embed.timestep_embedder
    instead of flux's time_text_embed."""
    from vllm_omni_tpu.diffusion.flux import assign_flux_tensor

    parts = name.split(".")
    if parts[0] == "time_embed":
        if parts[1] != "timestep_embedder":
            return False
        slot = params["time_embed"]["timestep_embedder"].get(parts[2])
        if slot is None:
            return False
        import numpy as _np

        if parts[3] == "weight":
            slot["w"] = jnp.asarray(
                _np.ascontiguousarray(value.T)).astype(dtype)
        else:
            slot["b"] = jnp.asarray(value).astype(dtype)
        return True
    return assign_flux_tensor(params, name, value, dtype)
