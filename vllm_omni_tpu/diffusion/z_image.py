"""Z-Image (Lumina-lineage) DiT with real checkpoint geometry.

Reference parity: diffusion/models/z_image/z_image_transformer.py
(ZImageTransformer2DModel :578 — llama-style blocks :394 with RMSNorm
sandwiches, tanh'd gates and NO shifts in the 4-way adaLN; GQA
attention :260 with fused to_qkv loaded from separate to_q/to_k/to_v
names :1014; SiLU-and-mul FF with w1/w3/w2 llama naming; 2 modulated
noise_refiner + 2 unmodulated context_refiner blocks before the
IMAGE-FIRST unified stream; per-patch-size x_embedder/final_layer
ModuleDicts keyed "2-1") and pipeline_z_image.py (:690 the model takes
t = 1 - σ and predicts the NEGATIVE velocity :770; CFG composes around
the positive branch :749 pred = pos + s·(pos - neg)).

Token order inside a patch is (ph, pw, c) with channel FASTEST
(patchify_and_embed :866 "c f pf h ph w pw -> (f h w) (pf ph pw c)") —
the opposite of flux's channel-major packing, hence the local
pack/unpack here.

Padding: the reference pads image/caption streams to SEQ_MULTI_OF=32
with learned pad tokens and leaves them UNMASKED in attention
(z_image_transformer.py :349 attn_mask commented out); we reproduce
exactly that (static pad, learned pad embeddings, no mask).

TPU-first like the sibling modules: a pure function over a param pytree
keyed by the checkpoint names; one jitted program per resolution
bucket; heads shard on "tp", the unified sequence on "ulysses".
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
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict

SEQ_MULTI_OF = 32
ADALN_EMBED_DIM = 256


@dataclass
class ZImageConfig:
    """Mirrors the transformer's diffusers config.json
    (ZImageTransformer2DModel.__init__ :632: 30 layers of dim 3840,
    30 heads, ffn dim/3·8, rope theta 256 over (32,48,48))."""

    all_patch_size: tuple = (2,)
    all_f_patch_size: tuple = (1,)
    in_channels: int = 16
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    n_kv_heads: int = 30
    norm_eps: float = 1e-5
    qk_norm: bool = True
    cap_feat_dim: int = 2560
    rope_theta: float = 256.0
    t_scale: float = 1000.0
    axes_dims: tuple = (32, 48, 48)
    axes_lens: tuple = (1024, 512, 512)

    @property
    def inner_dim(self) -> int:
        return self.dim

    @property
    def num_layers(self) -> int:
        return self.n_layers

    @property
    def num_attention_heads(self) -> int:
        return self.n_heads

    @property
    def attention_head_dim(self) -> int:
        return self.dim // self.n_heads

    @property
    def joint_attention_dim(self) -> int:
        return self.cap_feat_dim

    @property
    def patch_size(self) -> int:
        return int(self.all_patch_size[0])

    @property
    def pack_factor(self) -> int:
        return int(self.all_patch_size[0])

    @property
    def ffn_hidden(self) -> int:
        return int(self.dim / 3 * 8)

    @property
    def adaln_dim(self) -> int:
        return min(self.dim, ADALN_EMBED_DIM)

    @classmethod
    def from_json(cls, cfg: dict) -> "ZImageConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        for t in ("all_patch_size", "all_f_patch_size", "axes_dims",
                  "axes_lens"):
            if t in kw:
                kw[t] = tuple(kw[t])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (RopeEmbedder :525 — per-axis tables at theta 256; caption token
# i sits at (1+i, 0, 0), image token (y, x) at (cap_total+1, y, x),
# pad tokens at (0, 0, 0); GPT-J interleaved application)
# ---------------------------------------------------------------------------


def _axis_freqs(pos: np.ndarray, dim: int, theta: float) -> np.ndarray:
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    return pos.astype(np.float64)[:, None] * inv[None, :]


def z_image_rope(cfg: ZImageConfig, h_tokens: int, w_tokens: int,
                 cap_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin for the padded [img; cap] unified stream,
    [n_img_pad + n_cap_pad, head_dim//2]."""
    d0, d1, d2 = cfg.axes_dims
    th = cfg.rope_theta
    n_img = h_tokens * w_tokens
    pad_img = (-n_img) % SEQ_MULTI_OF
    pad_cap = (-cap_len) % SEQ_MULTI_OF
    cap_total = cap_len + pad_cap

    # caption: (1+i, 0, 0) including its pad positions (reference pads
    # ids over the padded length, :836)
    cap_f = 1.0 + np.arange(cap_total, dtype=np.float64)
    cap_z = np.zeros((cap_total,), np.float64)
    cap = np.concatenate([_axis_freqs(cap_f, d0, th),
                          _axis_freqs(cap_z, d1, th),
                          _axis_freqs(cap_z, d2, th)], axis=-1)
    # image: (cap_total+1, y, x); pads at (0,0,0)
    rows = np.repeat(np.arange(h_tokens, dtype=np.float64), w_tokens)
    cols = np.tile(np.arange(w_tokens, dtype=np.float64), h_tokens)
    f_id = np.full_like(rows, cap_total + 1.0)
    img = np.concatenate([_axis_freqs(f_id, d0, th),
                          _axis_freqs(rows, d1, th),
                          _axis_freqs(cols, d2, th)], axis=-1)
    if pad_img:
        img = np.concatenate(
            [img, np.zeros((pad_img, img.shape[1]), np.float64)], axis=0)
    freqs = np.concatenate([img, cap], axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _attention(att: Params, cfg: ZImageConfig, x: jnp.ndarray,
               cos: jnp.ndarray, sin: jnp.ndarray, mesh=None
               ) -> jnp.ndarray:
    """ZImageAttention :260 — GQA, per-head RMS q/k norms (eps 1e-5),
    interleaved rope, bias-free projections."""
    b, s, _ = x.shape
    nh, nkv = cfg.n_heads, cfg.n_kv_heads
    hd = cfg.attention_head_dim
    q = linear(x, att["to_q"]).reshape(b, s, nh, hd)
    k = linear(x, att["to_k"]).reshape(b, s, nkv, hd)
    v = linear(x, att["to_v"]).reshape(b, s, nkv, hd)
    q = rms_norm(q, att["norm_q"], eps=1e-5)
    k = rms_norm(k, att["norm_k"], eps=1e-5)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    if mesh is not None:
        q = _constrain(q, mesh, P("cfg", None, ("ulysses", "tp"), None))
        k = _constrain(k, mesh, P("cfg", None, None, None))
        v = _constrain(v, mesh, P("cfg", None, None, None))
    o = mha_xla(q, k, v, scale=hd ** -0.5)
    return linear(o.reshape(b, s, nh * hd), att["to_out"])


def _ff(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
    """llama FF: w2(silu(w1(x)) · w3(x))."""
    g = linear(x, slot["w1"])
    g = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
    return linear(g * linear(x, slot["w3"]), slot["w2"])


def z_image_block(blk: Params, cfg: ZImageConfig, x: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray,
                  adaln: Optional[jnp.ndarray] = None, mesh=None
                  ) -> jnp.ndarray:
    """ZImageTransformerBlock :444 — RMSNorm sandwiches; with
    modulation: scale = 1+scale_msa on the pre-norm, tanh'd gates on the
    post-norm (NO shifts)."""
    eps = cfg.norm_eps
    if adaln is not None:
        mod = linear(adaln, blk["adaLN_modulation"])  # [B, 4·dim]
        m = mod.reshape(mod.shape[0], 1, 4, cfg.dim)
        scale_msa = 1.0 + m[:, :, 0]
        gate_msa = jnp.tanh(m[:, :, 1].astype(jnp.float32)).astype(
            x.dtype)
        scale_mlp = 1.0 + m[:, :, 2]
        gate_mlp = jnp.tanh(m[:, :, 3].astype(jnp.float32)).astype(
            x.dtype)
        h = rms_norm(x, blk["attention_norm1"], eps=eps) * scale_msa
        attn = _attention(blk["attention"], cfg, h, cos, sin, mesh)
        x = x + gate_msa * rms_norm(attn, blk["attention_norm2"],
                                    eps=eps)
        h2 = rms_norm(x, blk["ffn_norm1"], eps=eps) * scale_mlp
        return x + gate_mlp * rms_norm(_ff(blk["feed_forward"], h2),
                                       blk["ffn_norm2"], eps=eps)
    h = rms_norm(x, blk["attention_norm1"], eps=eps)
    attn = _attention(blk["attention"], cfg, h, cos, sin, mesh)
    x = x + rms_norm(attn, blk["attention_norm2"], eps=eps)
    h2 = rms_norm(x, blk["ffn_norm1"], eps=eps)
    return x + rms_norm(_ff(blk["feed_forward"], h2), blk["ffn_norm2"],
                        eps=eps)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _pack_z(latents: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, (H/p)(W/p), p·p·C], (ph, pw, c) channel
    FASTEST (reference :866)."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)


def _unpack_z(tokens: jnp.ndarray, h: int, w: int, p: int
              ) -> jnp.ndarray:
    b = tokens.shape[0]
    c = tokens.shape[-1] // (p * p)
    x = tokens.reshape(b, h // p, w // p, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def z_image_forward(params: Params, cfg: ZImageConfig,
                    latents: jnp.ndarray, text_states: jnp.ndarray,
                    timesteps: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent], text_states [B, Tt, cap_feat_dim]
    (Qwen3 hidden states), timesteps [B] in the REFERENCE transformer's
    convention: t_model = 1 - σ (pipeline_z_image.py:702; the serving
    wrapper converts). Returns the raw model output — the NEGATIVE of
    the flow-match velocity (:770); the serving wrapper negates."""
    b, h, w, c = latents.shape
    p = cfg.patch_size
    dtype = params["cap_embedder"]["linear"]["w"].dtype
    n_img = (h // p) * (w // p)
    pad_img = (-n_img) % SEQ_MULTI_OF
    cap_len = text_states.shape[1]
    pad_cap = (-cap_len) % SEQ_MULTI_OF

    temb = _z_timestep_embed(params, cfg,
                             timesteps * cfg.t_scale, dtype)

    x = _pack_z(latents.astype(dtype), p)
    x = linear(x, params["x_embedder"])
    if pad_img:
        pad_tok = jnp.broadcast_to(params["x_pad_token"].astype(dtype),
                                   (b, pad_img, cfg.dim))
        x = jnp.concatenate([x, pad_tok], axis=1)

    cap = rms_norm(text_states.astype(dtype),
                   params["cap_embedder"]["norm"], eps=cfg.norm_eps)
    cap = linear(cap, params["cap_embedder"]["linear"])
    if pad_cap:
        pad_tok = jnp.broadcast_to(
            params["cap_pad_token"].astype(dtype),
            (b, pad_cap, cfg.dim))
        cap = jnp.concatenate([cap, pad_tok], axis=1)

    cos, sin = z_image_rope(cfg, h // p, w // p, cap_len)
    n_img_pad = n_img + pad_img
    img_cos, img_sin = cos[:n_img_pad], sin[:n_img_pad]
    cap_cos, cap_sin = cos[n_img_pad:], sin[n_img_pad:]

    for blk in params["noise_refiner"]:
        x = z_image_block(blk, cfg, x, img_cos, img_sin, adaln=temb,
                          mesh=mesh)
    for blk in params["context_refiner"]:
        cap = z_image_block(blk, cfg, cap, cap_cos, cap_sin, mesh=mesh)

    unified = jnp.concatenate([x, cap], axis=1)  # IMAGE first (:97)
    unified = _constrain(unified, mesh, P("cfg", "ulysses", None))
    for blk in params["layers"]:
        unified = z_image_block(blk, cfg, unified, cos, sin, adaln=temb,
                                mesh=mesh)

    # FinalLayer :493 — SiLU→linear modulation, scale only (no shift)
    fin = params["final_layer"]
    scale = 1.0 + linear(
        jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
        fin["adaLN_modulation"])[:, None, :]
    out = _layer_norm_nb(unified, 1e-6) * scale
    out = linear(out, fin["linear"])
    return _unpack_z(out[:, :n_img], h, w, p)


def _z_timestep_embed(params: Params, cfg: ZImageConfig, t: jnp.ndarray,
                      dtype) -> jnp.ndarray:
    """TimestepEmbedder :210 — sinusoid(256) → linear(1024) → silu →
    linear(min(dim,256))."""
    half = 128
    freqs = jnp.exp(-jnp.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    e = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    te = params["t_embedder"]
    e = linear(e.astype(dtype), te["mlp0"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    return linear(e, te["mlp2"])


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


def _z_block_params(keys, cfg: ZImageConfig, dtype,
                    modulation: bool) -> Params:
    d = cfg.dim
    hd = cfg.attention_head_dim
    kv = cfg.n_kv_heads * hd
    fh = cfg.ffn_hidden
    blk = {
        "attention": {
            "to_q": _lin(next(keys), d, d, dtype, bias=False),
            "to_k": _lin(next(keys), d, kv, dtype, bias=False),
            "to_v": _lin(next(keys), d, kv, dtype, bias=False),
            "to_out": _lin(next(keys), d, d, dtype, bias=False),
            "norm_q": jnp.ones((hd,), dtype),
            "norm_k": jnp.ones((hd,), dtype),
        },
        "feed_forward": {
            "w1": _lin(next(keys), d, fh, dtype, bias=False),
            "w3": _lin(next(keys), d, fh, dtype, bias=False),
            "w2": _lin(next(keys), fh, d, dtype, bias=False),
        },
        "attention_norm1": jnp.ones((d,), dtype),
        "attention_norm2": jnp.ones((d,), dtype),
        "ffn_norm1": jnp.ones((d,), dtype),
        "ffn_norm2": jnp.ones((d,), dtype),
    }
    if modulation:
        blk["adaLN_modulation"] = _lin(next(keys), cfg.adaln_dim, 4 * d,
                                       dtype, scale=0.02)
    return blk


def init_z_image_params(cfg: ZImageConfig, key: jax.Array,
                        dtype=jnp.bfloat16) -> Params:
    n = (cfg.n_layers + 2 * cfg.n_refiner_layers) * 9 + 16
    keys = iter(jax.random.split(key, n))
    d = cfg.dim
    p = cfg.patch_size
    tok_in = p * p * cfg.in_channels
    params: Params = {
        "x_embedder": _lin(next(keys), tok_in, d, dtype),
        "cap_embedder": {
            "norm": jnp.ones((cfg.cap_feat_dim,), dtype),
            "linear": _lin(next(keys), cfg.cap_feat_dim, d, dtype)},
        "t_embedder": {
            "mlp0": _lin(next(keys), 256, 1024, dtype),
            "mlp2": _lin(next(keys), 1024, cfg.adaln_dim, dtype)},
        "x_pad_token": jnp.zeros((1, d), dtype),
        "cap_pad_token": jnp.zeros((1, d), dtype),
        "final_layer": {
            "linear": _lin(next(keys), d, tok_in, dtype),
            "adaLN_modulation": _lin(next(keys), cfg.adaln_dim, d,
                                     dtype, scale=0.02)},
        "noise_refiner": [
            _z_block_params(keys, cfg, dtype, True)
            for _ in range(cfg.n_refiner_layers)],
        "context_refiner": [
            _z_block_params(keys, cfg, dtype, False)
            for _ in range(cfg.n_refiner_layers)],
        "layers": [_z_block_params(keys, cfg, dtype, True)
                   for _ in range(cfg.n_layers)],
    }
    return params


def z_image_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/w1/w3 column-split, to_out/w2 row-split;
    modulation/embedders/norms replicate."""
    col = {"to_q", "to_k", "to_v", "w1", "w3"}
    row = {"to_out", "w2"}

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


def assign_z_image_tensor(params: Params, name: str, value,
                          dtype) -> bool:
    """Map one checkpoint tensor (ZImageTransformer2DModel naming,
    reference load_weights :1014 — separate to_q/to_k/to_v and w1/w3
    shard names; ModuleDict keys "2-1") into the pytree. Torch Linear
    [out, in] transposes. Returns False if unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    parts = name.split(".")
    if parts[0] == "all_x_embedder":
        return put(params["x_embedder"],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] == "all_final_layer":
        rest = parts[2:]
        if rest[0] == "linear":
            return put(params["final_layer"]["linear"],
                       "w" if rest[1] == "weight" else "b", value)
        if rest[0] == "adaLN_modulation" and rest[1] == "1":
            return put(params["final_layer"]["adaLN_modulation"],
                       "w" if rest[2] == "weight" else "b", value)
        return False
    if parts[0] == "t_embedder" and parts[1] == "mlp":
        slot = {"0": "mlp0", "2": "mlp2"}.get(parts[2])
        if slot is None:
            return False
        return put(params["t_embedder"][slot],
                   "w" if parts[3] == "weight" else "b", value)
    if parts[0] == "cap_embedder":
        if parts[1] == "0" and parts[2] == "weight":
            params["cap_embedder"]["norm"] = b(value)
            return True
        if parts[1] == "1":
            return put(params["cap_embedder"]["linear"],
                       "w" if parts[2] == "weight" else "b", value)
        return False
    if parts[0] in ("x_pad_token", "cap_pad_token"):
        params[parts[0]] = jnp.asarray(value).astype(dtype)
        return True
    if parts[0] in ("noise_refiner", "context_refiner", "layers"):
        blk = params[parts[0]][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "attention":
            a = blk["attention"]
            if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v") and \
                    rest[2] == "weight":
                return put(a[rest[1]], "w", value)
            if rest[1] == "to_out":  # ModuleList: to_out.0.weight
                leaf = rest[3] if rest[2] == "0" else rest[2]
                if leaf == "weight":
                    return put(a["to_out"], "w", value)
            return False
        if rest[0] == "feed_forward" and rest[1] in ("w1", "w2", "w3") \
                and rest[2] == "weight":
            return put(blk["feed_forward"][rest[1]], "w", value)
        if rest[0] in ("attention_norm1", "attention_norm2",
                       "ffn_norm1", "ffn_norm2") and rest[1] == "weight":
            blk[rest[0]] = b(value)
            return True
        if rest[0] == "adaLN_modulation" and rest[1] == "0" and \
                "adaLN_modulation" in blk:
            return put(blk["adaLN_modulation"],
                       "w" if rest[2] == "weight" else "b", value)
    return False


def z_image_modulated_input(params: Params, cfg: ZImageConfig,
                            latents: jnp.ndarray,
                            timesteps: jnp.ndarray) -> jnp.ndarray:
    """TeaCache probe: main-layer-0 modulated IMAGE stream
    (reference extractors.py:530-539 extract_zimage_context —
    attention_norm1(unified)·(1+scale_msa) with layers[0]'s adaLN).
    The caption half of the unified stream is timestep-invariant (it
    adds no discriminative signal), so the probe runs the image tokens
    only: embed → pad token → noise_refiner blocks → layer-0
    modulation. Timesteps in the transformer's 1−σ convention like
    z_image_forward."""
    b, h, w, c = latents.shape
    p = cfg.patch_size
    dtype = params["cap_embedder"]["linear"]["w"].dtype
    temb = _z_timestep_embed(params, cfg, timesteps * cfg.t_scale,
                             dtype)
    x = linear(_pack_z(latents.astype(dtype), p), params["x_embedder"])
    n_img = x.shape[1]
    pad_img = (-n_img) % SEQ_MULTI_OF
    if pad_img:
        pad_tok = jnp.broadcast_to(params["x_pad_token"].astype(dtype),
                                   (b, pad_img, cfg.dim))
        x = jnp.concatenate([x, pad_tok], axis=1)
    cos, sin = z_image_rope(cfg, h // p, w // p, 0)
    img_cos, img_sin = cos[:x.shape[1]], sin[:x.shape[1]]
    for blk in params["noise_refiner"]:
        x = z_image_block(blk, cfg, x, img_cos, img_sin, adaln=temb)
    blk0 = params["layers"][0]
    mod = linear(temb, blk0["adaLN_modulation"]).reshape(
        b, 1, 4, cfg.dim)
    return (rms_norm(x, blk0["attention_norm1"], eps=cfg.norm_eps) *
            (1.0 + mod[:, :, 0])).astype(jnp.float32)
