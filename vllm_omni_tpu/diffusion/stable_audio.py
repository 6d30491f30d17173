"""Stable Audio Open DiT with real checkpoint geometry.

Reference parity: diffusion/models/stable_audio/
stable_audio_transformer.py (StableAudioDiTModel :360 — 24 cross-attn
DiT blocks :286 over 1D audio latents, Gaussian-Fourier time embedding
:58, duration/global conditioning prepended as one token :522-534,
partial NeoX rope over head_dim//2 :24) and pipeline_stable_audio.py
(rope length L+1 :525).

TPU-first like the other families: a pure function over a param pytree
keyed by the diffusers module names. Latents ride channel-last
[B, L, C] (the reference's [B, C, L] transposes at the conv edges).

Scheduler note: the reference serves this family with a cosine
DPM-solver; our serving path drives every family with the shared
flow-match Euler scheduler — the transformer forward (what this module
implements) is schedule-agnostic, taking the raw timestep value.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import _constrain
from vllm_omni_tpu.diffusion.hunyuan_video import _ln_affine
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla

Params = dict


@dataclass
class StableAudioConfig:
    """Mirrors the transformer's diffusers config.json
    (StableAudioDiTModel.__init__ defaults :380: 24 layers, 24 heads ×
    64, GQA kv 12, audio latent 64ch, T5 cross 768, duration-global
    1536)."""

    sample_size: int = 1024
    in_channels: int = 64
    out_channels: int = 64
    num_layers: int = 24
    attention_head_dim: int = 64
    num_attention_heads: int = 24
    num_key_value_attention_heads: int = 12
    cross_attention_dim: int = 768
    time_proj_dim: int = 256
    global_states_input_dim: int = 1536
    cross_attention_input_dim: int = 768
    # audio latent rate for serving-path duration → frames (Oobleck VAE:
    # 44.1 kHz / 2048-sample hops)
    sampling_rate: int = 44100
    hop_length: int = 2048
    eps: float = 1e-5  # torch LayerNorm default

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def joint_attention_dim(self) -> int:
        return self.cross_attention_input_dim

    @property
    def pack_factor(self) -> int:
        return 1

    @property
    def patch_size(self) -> int:
        return 1

    @property
    def rotary_dim(self) -> int:
        return self.attention_head_dim // 2

    @classmethod
    def from_json(cls, cfg: dict) -> "StableAudioConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (pipeline :525 — 1D positions over L+1 incl. the global token,
# rotating only the first head_dim//2 dims, NeoX halves)
# ---------------------------------------------------------------------------


def stable_audio_rope(cfg: StableAudioConfig, seq_len: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [S, rotary_dim] — get_1d_rotary_pos_embed(use_real=True,
    repeat_interleave_real=False): each is the half-frequencies tiled
    twice along the last dim."""
    rd = cfg.rotary_dim
    inv = 1.0 / (10000.0 ** (np.arange(0, rd, 2, dtype=np.float64) / rd))
    freqs = np.arange(seq_len, dtype=np.float64)[:, None] * inv[None, :]
    cos = np.concatenate([np.cos(freqs), np.cos(freqs)], axis=-1)
    sin = np.concatenate([np.sin(freqs), np.sin(freqs)], axis=-1)
    return (jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32))


def _apply_partial_rope(x: jnp.ndarray, cos: jnp.ndarray,
                        sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, S, H, D]: rotate the first rotary_dim dims (NeoX halves —
    reference apply_rotary_emb_stable_audio :24), pass the rest."""
    rd = cos.shape[-1]
    orig = x.dtype
    x_rot = x[..., :rd].astype(jnp.float32)
    half = rd // 2
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = (x_rot * c + rotated * s).astype(orig)
    return jnp.concatenate([out, x[..., rd:]], axis=-1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _silu_mlp2(slot: Params, x: jnp.ndarray, dtype) -> jnp.ndarray:
    h = linear(x.astype(dtype), slot["linear_1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(dtype)
    return linear(h, slot["linear_2"])


def stable_audio_block(blk: Params, cfg: StableAudioConfig,
                       x: jnp.ndarray, ctx: jnp.ndarray,
                       cos: jnp.ndarray, sin: jnp.ndarray,
                       ctx_mask: Optional[jnp.ndarray] = None,
                       mesh=None) -> jnp.ndarray:
    """StableAudioDiTBlock :286 — pre-LN self-attn (partial rope) →
    GQA cross-attn → SwiGLU FF, all residual."""
    b, s, hs = x.shape
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    nkv = cfg.num_key_value_attention_heads

    a1 = blk["attn1"]
    xn = _ln_affine(x, blk["norm1"], cfg.eps)
    q = linear(xn, a1["to_q"]).reshape(b, s, nh, hd)
    k = linear(xn, a1["to_k"]).reshape(b, s, nh, hd)
    v = linear(xn, a1["to_v"]).reshape(b, s, nh, hd)
    q = _apply_partial_rope(q, cos, sin)
    k = _apply_partial_rope(k, cos, sin)
    if mesh is not None:
        spec = P("cfg", None, ("ulysses", "tp"), None)
        q, k, v = (_constrain(t, mesh, spec) for t in (q, k, v))
    o = mha_xla(q, k, v, scale=hd ** -0.5)
    x = x + linear(o.reshape(b, s, nh * hd), a1["to_out"])

    a2 = blk["attn2"]
    tc = ctx.shape[1]
    xn = _ln_affine(x, blk["norm2"], cfg.eps)
    q = linear(xn, a2["to_q"]).reshape(b, s, nh, hd)
    k = linear(ctx, a2["to_k"]).reshape(b, tc, nkv, hd)
    v = linear(ctx, a2["to_v"]).reshape(b, tc, nkv, hd)
    o = mha_xla(q, k, v, scale=hd ** -0.5, key_mask=ctx_mask)
    x = x + linear(o.reshape(b, s, nh * hd), a2["to_out"])

    # SwiGLU FF (:250): net.0.proj → (hidden, gate) → hidden·silu(gate)
    xn = _ln_affine(x, blk["norm3"], cfg.eps)
    h = linear(xn, blk["ff"]["net0"])
    inner = h.shape[-1] // 2
    h = h[..., :inner] * jax.nn.silu(
        h[..., inner:].astype(jnp.float32)).astype(x.dtype)
    return x + linear(h, blk["ff"]["net2"])


def stable_audio_forward(params: Params, cfg: StableAudioConfig,
                         latents: jnp.ndarray,
                         text_states: jnp.ndarray,
                         timesteps: jnp.ndarray,
                         global_states: Optional[jnp.ndarray] = None,
                         text_mask: Optional[jnp.ndarray] = None,
                         mesh=None) -> jnp.ndarray:
    """latents [B, L, in_channels] (channel-last), text_states
    [B, Tt, cross_attention_input_dim] (T5), timesteps [B] (raw
    scheduler value — the Fourier features take it as-is, :519),
    global_states [B, 1, global_states_input_dim] (duration embedding;
    zeros when the serving path has no duration encoder — global_proj
    is bias-free so zeros contribute nothing) → prediction, same shape
    as latents."""
    b, L, c = latents.shape
    dtype = params["proj_out"]["w"].dtype
    x = latents.astype(dtype)

    # cross-attn input projection (linear → silu → linear, bias-free)
    ctx = _silu_mlp2(params["cross_attention_proj"], text_states, dtype)

    if global_states is None:
        global_states = jnp.zeros((b, 1, cfg.global_states_input_dim),
                                  dtype)
    g = _silu_mlp2(params["global_proj"], global_states, dtype)

    # Gaussian Fourier features (:58): [cos(2π·t·w) | sin(2π·t·w)]
    tproj = 2.0 * jnp.pi * timesteps.astype(jnp.float32)[:, None] * \
        params["time_proj_weight"].astype(jnp.float32)[None, :]
    t_feat = jnp.concatenate([jnp.cos(tproj), jnp.sin(tproj)], axis=-1)
    temb = _silu_mlp2(params["timestep_proj"], t_feat, dtype)
    g = g + temb[:, None, :]

    # preprocess conv (k=1, bias-free, residual) then proj_in
    x = x + linear(x, params["preprocess_conv"])
    x = linear(x, params["proj_in"])
    x = jnp.concatenate([g, x], axis=1)  # prepend global token
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    cos, sin = stable_audio_rope(cfg, L + 1)
    for blk in params["blocks"]:
        x = stable_audio_block(blk, cfg, x, ctx, cos, sin,
                               ctx_mask=text_mask, mesh=mesh)

    out = linear(x, params["proj_out"])[:, 1:]  # drop the global token
    return out + linear(out, params["postprocess_conv"])


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, bias=True, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    slot = {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype)}
    if bias:  # bias-free slots OMIT the key (linear() checks "b" in p)
        slot["b"] = jnp.zeros((n_out,), dtype)
    return slot


def _ln_slot(n, dtype):
    return {"w": jnp.ones((n,), dtype), "b": jnp.zeros((n,), dtype)}


def init_stable_audio_params(cfg: StableAudioConfig, key: jax.Array,
                             dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 12 + 16))
    hs = cfg.inner_dim
    kv = cfg.num_key_value_attention_heads * cfg.attention_head_dim
    params: Params = {
        "time_proj_weight": jax.random.normal(
            next(keys), (cfg.time_proj_dim // 2,), jnp.float32),
        "timestep_proj": {
            "linear_1": _lin(next(keys), cfg.time_proj_dim, hs, dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype)},
        "global_proj": {
            "linear_1": _lin(next(keys), cfg.global_states_input_dim,
                             hs, dtype, bias=False),
            "linear_2": _lin(next(keys), hs, hs, dtype, bias=False)},
        "cross_attention_proj": {
            "linear_1": _lin(next(keys), cfg.cross_attention_input_dim,
                             cfg.cross_attention_dim, dtype, bias=False),
            "linear_2": _lin(next(keys), cfg.cross_attention_dim,
                             cfg.cross_attention_dim, dtype,
                             bias=False)},
        "preprocess_conv": _lin(next(keys), cfg.in_channels,
                                cfg.in_channels, dtype, bias=False,
                                scale=0.02),
        "proj_in": _lin(next(keys), cfg.in_channels, hs, dtype,
                        bias=False),
        "proj_out": _lin(next(keys), hs, cfg.out_channels, dtype,
                         bias=False),
        "postprocess_conv": _lin(next(keys), cfg.out_channels,
                                 cfg.out_channels, dtype, bias=False,
                                 scale=0.02),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "norm1": _ln_slot(hs, dtype),
            "attn1": {"to_q": _lin(next(keys), hs, hs, dtype,
                                   bias=False),
                      "to_k": _lin(next(keys), hs, hs, dtype,
                                   bias=False),
                      "to_v": _lin(next(keys), hs, hs, dtype,
                                   bias=False),
                      "to_out": _lin(next(keys), hs, hs, dtype,
                                     bias=False)},
            "norm2": _ln_slot(hs, dtype),
            "attn2": {"to_q": _lin(next(keys), hs, hs, dtype,
                                   bias=False),
                      "to_k": _lin(next(keys), cfg.cross_attention_dim,
                                   kv, dtype, bias=False),
                      "to_v": _lin(next(keys), cfg.cross_attention_dim,
                                   kv, dtype, bias=False),
                      "to_out": _lin(next(keys), hs, hs, dtype,
                                     bias=False)},
            "norm3": _ln_slot(hs, dtype),
            "ff": {"net0": _lin(next(keys), hs, 8 * hs, dtype),
                   "net2": _lin(next(keys), 4 * hs, hs, dtype)},
        })
    return params


def stable_audio_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/ff-in column-split, out/ff-out row-split."""
    col = {"to_q", "to_k", "to_v", "net0"}
    row = {"to_out", "net2"}

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


def assign_stable_audio_tensor(params: Params, name: str, value,
                               dtype) -> bool:
    """Map one diffusers-format tensor (StableAudioDiTModel naming —
    reference load_weights :568 accepts both ``linear_N`` and
    index-based Sequential names for the projection MLPs) into the
    pytree. Torch Linear [out, in] transposes; k=1 Conv1d [out, in, 1]
    squeezes then transposes. Returns False if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    # Sequential index → named slot (.0 → linear_1, .2 → linear_2)
    idx_map = {"0": "linear_1", "2": "linear_2",
               "linear_1": "linear_1", "linear_2": "linear_2"}

    parts = name.split(".")
    if name == "time_proj.weight":
        params["time_proj_weight"] = jnp.asarray(value).astype(
            jnp.float32)
        return True
    if parts[0] in ("timestep_proj", "global_proj",
                    "cross_attention_proj"):
        slot_name = idx_map.get(parts[1])
        if slot_name is None:
            return False
        return put(params[parts[0]][slot_name],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] in ("preprocess_conv", "postprocess_conv") and \
            parts[1] == "weight":
        params[parts[0]]["w"] = jnp.asarray(
            _np.ascontiguousarray(value[:, :, 0].T)).astype(dtype)
        return True
    if parts[0] in ("proj_in", "proj_out") and parts[1] == "weight":
        return put(params[parts[0]], "w", value)
    if parts[0] == "transformer_blocks":
        blk = params["blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] in ("norm1", "norm2", "norm3"):
            blk[rest[0]]["w" if rest[1] == "weight" else "b"] = b(value)
            return True
        if rest[0] in ("attn1", "attn2"):
            a = blk[rest[0]]
            if rest[1] in ("to_q", "to_k", "to_v"):
                return put(a[rest[1]], "w", value)
            if rest[1] == "to_out":
                leaf = rest[3] if rest[2] == "0" else rest[2]
                return put(a["to_out"], "w" if leaf == "weight" else "b",
                           value)
            return False
        if rest[0] == "ff" and rest[1] == "net":
            if rest[2] == "0":  # net.0.proj.{weight,bias}
                return put(blk["ff"]["net0"],
                           "w" if rest[4] == "weight" else "b", value)
            if rest[2] == "2":
                return put(blk["ff"]["net2"],
                           "w" if rest[3] == "weight" else "b", value)
    return False


def stable_audio_modulated_input(params: Params, cfg: StableAudioConfig,
                                 latents: jnp.ndarray,
                                 timesteps: jnp.ndarray) -> jnp.ndarray:
    """TeaCache probe: block-0 norm1 over the [temb-token; proj_in(x)]
    stream (reference extractors.py:770-784
    extract_stable_audio_context — the prepended global+time token
    carries the timestep signal through the plain LayerNorm)."""
    b = latents.shape[0]
    dtype = params["proj_out"]["w"].dtype
    x = latents.astype(dtype)
    tproj = 2.0 * jnp.pi * timesteps.astype(jnp.float32)[:, None] * \
        params["time_proj_weight"].astype(jnp.float32)[None, :]
    t_feat = jnp.concatenate([jnp.cos(tproj), jnp.sin(tproj)], axis=-1)
    temb = _silu_mlp2(params["timestep_proj"], t_feat, dtype)
    g = temb[:, None, :]
    x = x + linear(x, params["preprocess_conv"])
    x = linear(x, params["proj_in"])
    x = jnp.concatenate([g, x], axis=1)
    return _ln_affine(x, params["blocks"][0]["norm1"],
                      cfg.eps).astype(jnp.float32)
