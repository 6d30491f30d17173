"""BAGEL: unified Qwen2 Mixture-of-Transformers any-to-any model —
text-to-image serving path with real checkpoint geometry.

Reference: /root/reference/vllm_omni/diffusion/models/bagel/
(bagel_transformer.py 2,483 LoC + pipeline_bagel.py 941). The model is
a Qwen2 decoder whose every layer carries TWO parameter sets
("und" understanding vs "gen" VAE-token experts — PackedAttentionMoT
:279, Qwen2MoTDecoderLayer :632): text tokens always route through the
und projections/norms/MLP; latent-patch tokens route through the
*_moe_gen twins. Generation denoises flow-matching latents INSIDE the
token stream: the gen query block is ``[<start_of_image>, vae×N,
<end_of_image>]`` attending non-causally to the cached text KV plus
itself, with every gen token sharing ONE rope position
(prepare_vae_latent: packed_position_ids all equal) while 2D sincos
position embeddings (+ timestep embedding) ride the vae inputs
(Bagel.forward_single_branch). Velocity = llm2vae(hidden at vae
positions); Euler x ← x − v·dt over shift-warped descending timesteps
(generate_image :1770-1773). CFG runs a second branch against a
DIFFERENT KV cache (the context WITHOUT the prompt text) and combines
with norm-renormalized guidance (_combine_cfg, "global" default).

TPU-first design (the hunyuan_image3 two-program pattern): the text
prefill is one jitted causal "und" forward that RETURNS the per-layer
post-rope K/V as an explicit output; each denoise step is one jitted
"gen" forward over the fixed-size stream with the cached text K/V as
arguments — no in-layer cache objects, no packed varlen bookkeeping
(batch 1 serving; CFG branches are separate fixed-shape calls rather
than packed rows).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import linear

logger = init_logger(__name__)

Params = dict


@dataclass
class BagelConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    rope_theta: float = 1e6
    rms_norm_eps: float = 1e-6
    latent_patch_size: int = 2
    max_latent_size: int = 64
    latent_channels: int = 16
    vae_downsample: int = 8
    timestep_shift: float = 3.0
    # special ids (new_token_ids; positions are what matters)
    start_of_image: int = 151652
    end_of_image: int = 151653

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.latent_patch_size ** 2 * self.latent_channels

    @property
    def latent_downsample(self) -> int:
        return self.vae_downsample * self.latent_patch_size

    @classmethod
    def from_json(cls, hf: dict) -> "BagelConfig":
        llm = hf.get("llm_config") or hf
        vae = hf.get("vae_config") or {}
        tok = hf.get("new_token_ids") or {}
        return cls(
            vocab_size=llm.get("vocab_size", 152064),
            hidden_size=llm.get("hidden_size", 3584),
            intermediate_size=llm.get("intermediate_size", 18944),
            num_layers=llm.get("num_hidden_layers", 28),
            num_heads=llm.get("num_attention_heads", 28),
            num_kv_heads=llm.get("num_key_value_heads", 4),
            rope_theta=llm.get("rope_theta", 1e6),
            rms_norm_eps=llm.get("rms_norm_eps", 1e-6),
            latent_patch_size=hf.get("latent_patch_size", 2),
            max_latent_size=hf.get("max_latent_size", 64),
            latent_channels=vae.get("z_channels", 16),
            vae_downsample=vae.get("downsample", 8),
            timestep_shift=hf.get("timestep_shift", 3.0),
            start_of_image=tok.get("start_of_image", 151652),
            end_of_image=tok.get("end_of_image", 151653),
        )


def is_bagel_dir(path: str) -> bool:
    cfg_path = os.path.join(str(path), "config.json")
    if not os.path.isfile(cfg_path):
        return False
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return False
    archs = cfg.get("architectures") or []
    return cfg.get("model_type") == "bagel" or any(
        "Bagel" in a for a in archs)


# ---------------------------------------------------------------------------
# small pieces
# ---------------------------------------------------------------------------


def _rms(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32)).astype(x.dtype)


def _rope_cos_sin(positions: np.ndarray, dim: int, theta: float):
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = np.asarray(positions, np.float64)[:, None] * inv[None]
    emb = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(emb), jnp.float32),
            jnp.asarray(np.sin(emb), jnp.float32))


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """x [T, H, D] NeoX half rotation (f32 — BagelRotaryEmbedding)."""
    xf = x.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return xf * c + rot * s


def timestep_embed(p: Params, t: jnp.ndarray, dim: int = 256
                   ) -> jnp.ndarray:
    """Bagel TimestepEmbedder (:1013): sinusoid → Linear → SiLU →
    Linear."""
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    e = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = linear(e.astype(p["l1"]["w"].dtype), p["l1"])
    return linear(jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype),
                  p["l2"])


def sincos_pos_table(max_side: int, dim: int) -> np.ndarray:
    """get_2d_sincos_pos_embed (:968): [max_side², dim], h-half then
    w-half, each [sin | cos]. Grid built with w varying FIRST
    (np.meshgrid(grid_w, grid_h))."""

    def one_d(pos):
        omega = np.arange(dim // 4, dtype=np.float64) / (dim / 4.0)
        omega = 1.0 / 10000.0 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(max_side, dtype=np.float32)
    grid_w = np.arange(max_side, dtype=np.float32)
    gw, gh = np.meshgrid(grid_w, grid_h)
    emb = np.concatenate([one_d(gw), one_d(gh)], axis=1)
    return emb.astype(np.float32)


def flattened_pos_ids(h_tok: int, w_tok: int, max_side: int
                      ) -> np.ndarray:
    rows = np.arange(h_tok)[:, None] * max_side + np.arange(w_tok)[None]
    return rows.reshape(-1).astype(np.int32)


def patchify_latent(lat: jnp.ndarray, p: int) -> jnp.ndarray:
    """[h, w, C] → [N, p²·C] (reference patchify :54 — channel-last
    rows of each p×p patch, c innermost per pixel? No: reference
    einsum 'nchpwq->nhwpqc' then flatten p*q*c)."""
    h, w, c = lat.shape
    x = lat.reshape(h // p, p, w // p, p, c)
    x = x.transpose(0, 2, 1, 3, 4)  # h', w', p, q, c
    return x.reshape((h // p) * (w // p), p * p * c)


def unpatchify_latent(x: jnp.ndarray, h_tok: int, w_tok: int, p: int,
                      c: int) -> jnp.ndarray:
    x = x.reshape(h_tok, w_tok, p, p, c)
    x = x.transpose(0, 2, 1, 3, 4)
    return x.reshape(h_tok * p, w_tok * p, c)


# ---------------------------------------------------------------------------
# transformer core
# ---------------------------------------------------------------------------


def _qkv(layer: Params, which: str, x: jnp.ndarray, cfg: BagelConfig):
    d = cfg.head_dim
    t = x.shape[0]
    sfx = "" if which == "und" else "_moe_gen"
    q = linear(x, layer["q_proj" + sfx]).reshape(t, cfg.num_heads, d)
    k = linear(x, layer["k_proj" + sfx]).reshape(t, cfg.num_kv_heads, d)
    v = linear(x, layer["v_proj" + sfx]).reshape(t, cfg.num_kv_heads, d)
    q = _rms(q, layer["q_norm" + sfx], cfg.rms_norm_eps)
    k = _rms(k, layer["k_norm" + sfx], cfg.rms_norm_eps)
    return q, k, v


def _attend(q, k, v, cfg: BagelConfig, mask: Optional[jnp.ndarray]):
    """q [Tq, H, D], k/v [Tk, hkv, D], mask [Tq, Tk] bool or None
    (full)."""
    g = cfg.num_heads // cfg.num_kv_heads
    kr = jnp.repeat(k, g, axis=1)
    vr = jnp.repeat(v, g, axis=1)
    sc = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                    kr.astype(jnp.float32)) * (cfg.head_dim ** -0.5)
    if mask is not None:
        sc = jnp.where(mask[None], sc, -1e30)
    pr = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", pr.astype(vr.dtype), vr)
    return o.reshape(q.shape[0], cfg.num_heads * cfg.head_dim)


def _mlp(layer: Params, which: str, x: jnp.ndarray) -> jnp.ndarray:
    sfx = "" if which == "und" else "_moe_gen"
    gate = linear(x, layer["gate_proj" + sfx])
    up = linear(x, layer["up_proj" + sfx])
    return linear(jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype)
                  * up, layer["down_proj" + sfx])


def bagel_prefill_text(params: Params, cfg: BagelConfig,
                       ids: jnp.ndarray, positions: np.ndarray,
                       prev_kv: Optional[list] = None) -> list:
    """Causal "und" forward over text ids [T]; returns per-layer
    (k, v) [T, hkv, d] post-rope (reference forward_cache_update_text
    + update_past_key_values=True). prev_kv: already-cached context
    the new text attends to (appended in cache order)."""
    t = ids.shape[0]
    x = jnp.take(params["embed"], ids, axis=0)
    cos, sin = _rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((t, t), bool))
    out_kv = []
    for i, layer in enumerate(params["layers"]):
        h = _rms(x, layer["input_norm"], cfg.rms_norm_eps)
        q, k, v = _qkv(layer, "und", h, cfg)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin).astype(x.dtype)
        q = q.astype(x.dtype)
        if prev_kv is not None:
            pk, pv = prev_kv[i]
            k_all = jnp.concatenate([pk.astype(k.dtype), k], axis=0)
            v_all = jnp.concatenate([pv.astype(v.dtype), v], axis=0)
            tp = pk.shape[0]
            mask = jnp.concatenate(
                [jnp.ones((t, tp), bool), causal], axis=1)
        else:
            k_all, v_all, mask = k, v, causal
        out_kv.append((k, v))
        att = _attend(q, k_all, v_all, cfg, mask)
        x = x + linear(att, layer["o_proj"])
        h = _rms(x, layer["post_norm"], cfg.rms_norm_eps)
        x = x + _mlp(layer, "und", h)
    return out_kv


def bagel_denoise_forward(params: Params, cfg: BagelConfig,
                          x_t: jnp.ndarray, t: jnp.ndarray,
                          pos_ids: jnp.ndarray, rope_pos: float,
                          text_kv: Optional[list]) -> jnp.ndarray:
    """One gen forward: x_t [N, patch_dim] latent patches, t [1] flow
    time, pos_ids [N] flattened 2D ids, rope_pos = the ONE rope
    position every gen token shares, text_kv = cached prompt K/V per
    layer (None → no context, the cfg-text branch of a bare run).
    → velocity [N, patch_dim]."""
    n = x_t.shape[0]
    dtype = params["embed"].dtype
    som = params["embed"][cfg.start_of_image]
    eoi = params["embed"][cfg.end_of_image]
    temb = timestep_embed(params["time_embedder"], t)[0]
    pos_e = jnp.take(params["latent_pos_embed"], pos_ids, axis=0)
    vae_in = (linear(x_t.astype(dtype), params["vae2llm"]) +
              temb.astype(dtype) + pos_e.astype(dtype))
    x = jnp.concatenate([som[None], vae_in, eoi[None]], axis=0)
    s = n + 2
    is_text = jnp.zeros((s,), bool).at[0].set(True).at[s - 1].set(True)
    # every gen token shares ONE rope position (prepare_vae_latent
    # :1564 packed_position_ids = [curr_position_id] * (N+2)) — the
    # cos/sin rows are trace-time constants.
    inv = 1.0 / (cfg.rope_theta ** (
        np.arange(0, cfg.head_dim, 2, dtype=np.float64) / cfg.head_dim))
    ang = np.float64(rope_pos) * inv
    emb = np.concatenate([ang, ang])
    cos = jnp.broadcast_to(jnp.asarray(np.cos(emb), jnp.float32),
                           (s, cfg.head_dim))
    sin = jnp.broadcast_to(jnp.asarray(np.sin(emb), jnp.float32),
                           (s, cfg.head_dim))

    def routed(fn_und, fn_gen, v):
        return jnp.where(is_text[:, None], fn_und(v), fn_gen(v))

    for i, layer in enumerate(params["layers"]):
        h = routed(
            lambda v: _rms(v, layer["input_norm"], cfg.rms_norm_eps),
            lambda v: _rms(v, layer["input_norm_moe_gen"],
                           cfg.rms_norm_eps), x)
        qu, ku, vu = _qkv(layer, "und", h, cfg)
        qg, kg, vg = _qkv(layer, "gen", h, cfg)
        q = jnp.where(is_text[:, None, None], qu, qg)
        k = jnp.where(is_text[:, None, None], ku, kg)
        v = jnp.where(is_text[:, None, None], vu, vg)
        q = _apply_rope(q, cos, sin).astype(x.dtype)
        k = _apply_rope(k, cos, sin).astype(x.dtype)
        if text_kv is not None:
            pk, pv = text_kv[i]
            k_all = jnp.concatenate([pk.astype(k.dtype), k], axis=0)
            v_all = jnp.concatenate([pv.astype(v.dtype), v], axis=0)
        else:
            k_all, v_all = k, v
        att = _attend(q, k_all, v_all, cfg, None)  # non-causal, full
        att = routed(lambda v: linear(v, layer["o_proj"]),
                     lambda v: linear(v, layer["o_proj_moe_gen"]), att)
        x = x + att
        h = routed(
            lambda v: _rms(v, layer["post_norm"], cfg.rms_norm_eps),
            lambda v: _rms(v, layer["post_norm_moe_gen"],
                           cfg.rms_norm_eps), x)
        x = x + routed(lambda v: _mlp(layer, "und", v),
                       lambda v: _mlp(layer, "gen", v), h)
    x = routed(lambda v: _rms(v, params["final_norm"],
                              cfg.rms_norm_eps),
               lambda v: _rms(v, params["final_norm_moe_gen"],
                              cfg.rms_norm_eps), x)
    return linear(x[1:n + 1], params["llm2vae"]).astype(jnp.float32)


def bagel_combine_cfg(v_cond: jnp.ndarray, v_uncond: jnp.ndarray,
                      scale: float, renorm_type: str = "global",
                      renorm_min: float = 0.0) -> jnp.ndarray:
    """_combine_cfg (text branch only; img branch rides the same
    formula when wired)."""
    v = v_uncond + scale * (v_cond - v_uncond)
    if renorm_type == "global":
        n_c = jnp.linalg.norm(v_cond)
        n_v = jnp.linalg.norm(v)
    elif renorm_type in ("channel", "text_channel"):
        n_c = jnp.linalg.norm(v_cond, axis=-1, keepdims=True)
        n_v = jnp.linalg.norm(v, axis=-1, keepdims=True)
    else:
        return v
    s = jnp.clip(n_c / (n_v + 1e-8), renorm_min, 1.0)
    return v * s


# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def _lin_init(cin, cout, dtype, bias=False):
    p = {"w": jnp.zeros((cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_bagel_params(cfg: BagelConfig, dtype=jnp.bfloat16) -> Params:
    d = cfg.head_dim
    hs, im = cfg.hidden_size, cfg.intermediate_size

    def expert(sfx):
        return {
            "q_proj" + sfx: _lin_init(hs, cfg.num_heads * d, dtype,
                                      True),
            "k_proj" + sfx: _lin_init(hs, cfg.num_kv_heads * d, dtype,
                                      True),
            "v_proj" + sfx: _lin_init(hs, cfg.num_kv_heads * d, dtype,
                                      True),
            "o_proj" + sfx: _lin_init(cfg.num_heads * d, hs, dtype),
            "q_norm" + sfx: jnp.ones((d,), dtype),
            "k_norm" + sfx: jnp.ones((d,), dtype),
            "gate_proj" + sfx: _lin_init(hs, im, dtype),
            "up_proj" + sfx: _lin_init(hs, im, dtype),
            "down_proj" + sfx: _lin_init(im, hs, dtype),
            "input_norm" + sfx: jnp.ones((hs,), dtype),
            "post_norm" + sfx: jnp.ones((hs,), dtype),
        }

    layers = [dict(**expert(""), **expert("_moe_gen"))
              for _ in range(cfg.num_layers)]
    return {
        "embed": jnp.zeros((cfg.vocab_size, hs), dtype),
        "layers": layers,
        "final_norm": jnp.ones((hs,), dtype),
        "final_norm_moe_gen": jnp.ones((hs,), dtype),
        "time_embedder": {"l1": _lin_init(256, hs, dtype, True),
                          "l2": _lin_init(hs, hs, dtype, True)},
        "vae2llm": _lin_init(cfg.patch_dim, hs, dtype, True),
        "llm2vae": _lin_init(hs, cfg.patch_dim, dtype, True),
        "latent_pos_embed": jnp.asarray(
            sincos_pos_table(cfg.max_latent_size, hs), dtype),
    }


_LAYER_LIN = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
              "up_proj", "down_proj"}
_TE_IDX = {"0": "l1", "2": "l2"}


def assign_bagel_tensor(params: Params, name: str, arr, cfg: BagelConfig,
                        dtype) -> bool:
    """Bagel HF naming: language_model.model.* backbone (split q/k/v
    with bias + *_moe_gen twins; fused qkv_proj / gate_up_proj
    spellings also accepted), top-level time_embedder.mlp.{0,2},
    vae2llm/llm2vae, latent_pos_embed.pos_embed. vit_model/connector/
    vit_pos_embed (understanding vision tower) and the standalone VAE
    are skipped for the t2i serving graph."""
    arr = np.asarray(arr) if not hasattr(arr, "dtype") or \
        not str(arr.dtype).startswith("bfloat16") else arr
    parts = name.split(".")
    if parts[0] in ("vit_model", "connector", "vit_pos_embed", "vae",
                    "ae"):
        return False
    if parts[0] == "time_embedder":
        tgt = _TE_IDX.get(parts[2])
        if tgt is None:
            return False
        slot = params["time_embedder"][tgt]
        if parts[-1] == "weight":
            slot["w"] = jnp.asarray(arr.T, dtype)
        else:
            slot["b"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] in ("vae2llm", "llm2vae"):
        slot = params[parts[0]]
        if parts[-1] == "weight":
            slot["w"] = jnp.asarray(arr.T, dtype)
        else:
            slot["b"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] == "latent_pos_embed":
        params["latent_pos_embed"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] == "language_model":
        parts = parts[1:]
    if parts[0] == "lm_head":
        return True  # text head unused on the t2i path (consumed)
    if parts[0] == "model":
        parts = parts[1:]
    if parts[:2] == ["embed_tokens", "weight"]:
        params["embed"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] == "norm_moe_gen":
        params["final_norm_moe_gen"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] == "norm":
        params["final_norm"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] != "layers":
        return False
    layer = params["layers"][int(parts[1])]
    rest = parts[2:]
    leaf = rest[-1]

    def put_lin(key, a):
        slot = layer[key]
        if leaf == "weight":
            slot["w"] = jnp.asarray(np.asarray(a).T, dtype)
        else:
            slot["b"] = jnp.asarray(a, dtype)
        return True

    if rest[0] == "self_attn":
        mod = rest[1]
        sfx = "_moe_gen" if mod.endswith("_moe_gen") else ""
        base = mod[:-len("_moe_gen")] if sfx else mod
        if base in ("q_norm", "k_norm"):
            layer[base + sfx] = jnp.asarray(arr, dtype)
            return True
        if base == "qkv_proj":
            # fused contiguous [q; k; v] stacking (vLLM export layout)
            d = cfg.head_dim
            qn = cfg.num_heads * d
            kn = cfg.num_kv_heads * d
            a = np.asarray(arr)
            return (put_lin_split(layer, "q_proj" + sfx, a[:qn], leaf,
                                  dtype) and
                    put_lin_split(layer, "k_proj" + sfx,
                                  a[qn:qn + kn], leaf, dtype) and
                    put_lin_split(layer, "v_proj" + sfx,
                                  a[qn + kn:], leaf, dtype))
        if base in _LAYER_LIN:
            return put_lin(base + sfx, arr)
        return False
    if rest[0] in ("mlp", "mlp_moe_gen"):
        sfx = "_moe_gen" if rest[0] == "mlp_moe_gen" else ""
        base = rest[1]
        if base == "gate_up_proj":
            a = np.asarray(arr)
            half = a.shape[0] // 2
            return (put_lin_split(layer, "gate_proj" + sfx, a[:half],
                                  leaf, dtype) and
                    put_lin_split(layer, "up_proj" + sfx, a[half:],
                                  leaf, dtype))
        if base in ("gate_proj", "up_proj", "down_proj"):
            return put_lin(base + sfx, arr)
        return False
    norm_map = {"input_layernorm": "input_norm",
                "input_layernorm_moe_gen": "input_norm_moe_gen",
                "post_attention_layernorm": "post_norm",
                "post_attention_layernorm_moe_gen":
                    "post_norm_moe_gen"}
    if rest[0] in norm_map and leaf == "weight":
        layer[norm_map[rest[0]]] = jnp.asarray(arr, dtype)
        return True
    return False


def put_lin_split(layer: Params, key: str, a, leaf: str, dtype) -> bool:
    slot = layer[key]
    if leaf == "weight":
        slot["w"] = jnp.asarray(np.asarray(a).T, dtype)
    else:
        slot["b"] = jnp.asarray(a, dtype)
    return True


def load_bagel(path: str, dtype=jnp.bfloat16
               ) -> tuple[BagelConfig, Params]:
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import _collect_safetensor_files

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = BagelConfig.from_json(hf)
    params = init_bagel_params(cfg, dtype)
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                if assign_bagel_tensor(params, name, arr, cfg, dtype):
                    loaded += 1
                elif not name.startswith(("vit_model.", "connector.",
                                          "vit_pos_embed.", "vae.",
                                          "ae.")):
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no bagel tensors mapped from {path}")
    if skipped:
        logger.warning("bagel: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("bagel: %d tensors loaded (%d MoT layers)", loaded,
                cfg.num_layers)
    return cfg, params


def bagel_param_shardings(params: Params):
    """Mesh specs (tensor-parallel over "tp"): both expert sets shard
    like a Qwen2 decoder — column-parallel q/k/v/gate/up, row-parallel
    o/down; embeds/norms/aux replicate. XLA inserts the psum on the
    row-parallel outputs."""
    from jax.sharding import PartitionSpec as P

    col = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    row = {"o_proj", "down_proj"}

    def layer_spec(layer):
        out = {}
        for k, v in layer.items():
            base = k[:-len("_moe_gen")] if k.endswith("_moe_gen") else k
            if base in col:
                out[k] = {"w": P(None, "tp")}
                if "b" in v:
                    out[k]["b"] = P("tp")
            elif base in row:
                out[k] = {"w": P("tp", None)}
                if "b" in v:
                    out[k]["b"] = P(None)
            else:
                out[k] = jax.tree.map(lambda _: P(), v)
        return out

    specs = {k: jax.tree.map(lambda _: P(), v)
             for k, v in params.items() if k != "layers"}
    specs["layers"] = [layer_spec(l) for l in params["layers"]]
    return specs


# ---------------------------------------------------------------------------
# runner (pipeline._runner protocol)
# ---------------------------------------------------------------------------


@dataclass
class BagelState:
    x_t: Any  # [N, patch_dim]
    text_kv: Any
    cfg_text_kv: Any  # None when guidance off
    timesteps: np.ndarray
    dts: np.ndarray
    pos_ids: Any
    rope_pos: float
    cfg_rope_pos: float
    h_tok: int
    w_tok: int
    guidance_scale: float
    step_index: int = 0
    sigmas: np.ndarray = field(default_factory=lambda: np.zeros(1))

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @property
    def done(self) -> bool:
        return self.step_index >= self.num_steps


class BagelRunner:
    """T2I flow loop (reference pipeline_bagel.py forward: prompt
    prefill into the gen context; the cfg_text branch keeps the
    context WITHOUT the prompt; generate_image Euler loop with
    norm-renormalized text CFG)."""

    decode_via_vae = False  # bagel ships its own flux-style AE

    def __init__(self, cfg: BagelConfig, params: Params,
                 mesh=None) -> None:
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.tokenizer = None
        self._prefill_fns: dict = {}
        self._step_fns: dict = {}

    def _prefill(self, params, ids):
        t = int(ids.shape[0])
        fn = self._prefill_fns.get(t)
        if fn is None:
            pos = np.arange(t)
            fn = jax.jit(lambda p, i: bagel_prefill_text(p, self.cfg,
                                                         i, pos))
            self._prefill_fns[t] = fn
        return fn(params, ids)

    def _step_fn(self, n: int, with_ctx: bool):
        key = (n, with_ctx)
        fn = self._step_fns.get(key)
        if fn is None:
            def body(p, x_t, t, pos_ids, rope_pos, text_kv):
                return bagel_denoise_forward(p, self.cfg, x_t, t,
                                             pos_ids, rope_pos,
                                             text_kv)

            fn = jax.jit(body, static_argnames=("rope_pos",))
            self._step_fns[key] = fn
        return fn

    def _prompt_ids(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text)["input_ids"])
        lo = max(self.cfg.end_of_image + 1, 8)
        span = max(self.cfg.vocab_size - lo, 1)
        data = text.encode() or b"\0"
        return [lo + (b * 2654435761 + i) % span
                for i, b in enumerate(data)]

    def prepare(self, req, num_steps: Optional[int] = None,
                seed: int = 0) -> BagelState:
        p = req.params
        c = self.cfg
        steps = num_steps or p.num_inference_steps or 50
        down = c.latent_downsample
        h_tok = max(p.height // down, 1)
        w_tok = max(p.width // down, 1)
        n = h_tok * w_tok
        text = str(req.prompt) if not isinstance(req.prompt, dict) \
            else str(req.prompt.get("text", ""))
        ids = np.asarray(self._prompt_ids(text), np.int32)
        text_kv = self._prefill(self.params, jnp.asarray(ids))
        use_cfg = bool(p.guidance_scale and p.guidance_scale > 1.0)
        # cfg-text branch: context WITHOUT the prompt → no cached KV
        cfg_kv = None
        key = jax.random.PRNGKey(p.seed if p.seed is not None else seed)
        x_t = jax.random.normal(key, (n, c.patch_dim), jnp.float32)
        ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
        sh = c.timestep_shift
        ts = sh * ts / (1 + (sh - 1) * ts)
        dts = (ts[:-1] - ts[1:]).astype(np.float32)
        timesteps = ts[:-1].astype(np.float32)
        pos_ids = jnp.asarray(flattened_pos_ids(h_tok, w_tok,
                                                c.max_latent_size))
        return BagelState(
            x_t=x_t, text_kv=text_kv,
            cfg_text_kv=cfg_kv if use_cfg else False,
            timesteps=timesteps, dts=dts, pos_ids=pos_ids,
            rope_pos=float(len(ids)), cfg_rope_pos=0.0,
            h_tok=h_tok, w_tok=w_tok,
            guidance_scale=float(p.guidance_scale or 1.0))

    def denoise_step(self, state: BagelState) -> None:
        i = state.step_index
        t = jnp.full((1,), float(state.timesteps[i]), jnp.float32)
        n = state.x_t.shape[0]
        fn = self._step_fn(n, True)
        v = fn(self.params, state.x_t, t, state.pos_ids,
               state.rope_pos, state.text_kv)
        if state.cfg_text_kv is not False:
            fn0 = self._step_fn(n, False)
            v_un = fn0(self.params, state.x_t, t, state.pos_ids,
                       state.cfg_rope_pos, state.cfg_text_kv)
            v = bagel_combine_cfg(v, v_un, state.guidance_scale)
        state.x_t = (state.x_t -
                     v * float(state.dts[i])).astype(state.x_t.dtype)
        state.step_index += 1

    def post_decode(self, state: BagelState,
                    output_type: str = "np"):
        c = self.cfg
        lat = unpatchify_latent(jnp.asarray(state.x_t), state.h_tok,
                                state.w_tok, c.latent_patch_size,
                                c.latent_channels)
        lat = np.asarray(lat, np.float32)[None]
        if output_type == "latent":
            return lat
        # bagel's standalone flux-style AE is not wired — emit a
        # normalized latent preview (documented gap)
        x = lat[..., :3]
        lo, hi = x.min(), x.max()
        img = (x - lo) / max(hi - lo, 1e-6)
        img = np.repeat(np.repeat(img, c.vae_downsample, axis=1),
                        c.vae_downsample, axis=2)
        return np.clip(img, 0.0, 1.0)
