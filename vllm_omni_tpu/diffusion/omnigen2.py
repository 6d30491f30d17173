"""OmniGen2 (Lumina2-lineage) DiT with real checkpoint geometry.

Reference parity: diffusion/models/omnigen2/omnigen2_transformer.py
(OmniGen2Transformer2DModel :811 — GQA attention :129 with per-head RMS
q/k at eps 1e-5 and complex interleaved rope; LuminaRMSNormZero :344
(4-way modulation from silu(temb): scale_msa, gate_msa, scale_mlp,
gate_mlp — gates tanh'd at use, RMS norm INSIDE the modulated norm);
llama FF with checkpoint names linear_1/linear_3/linear_2
(gate/up/down, load_weights :1282); 2 modulated noise_refiner + 2
unmodulated context_refiner; TEXT-FIRST joint stream :1246;
scale-only LuminaLayerNormContinuous head :380 with fused output
projection) and pipeline_omnigen2.py (the custom FlowMatch scheduler
runs t ASCENDING 0→1 :150, i.e. t_model = 1-σ and the model predicts
data-noise — the NEGATIVE of our serving velocity; standard
neg + s·(pos-neg) CFG :1286).

Rope ids (rope_embedder :561): text token i at (i, i, i); image token
(row, col) at (cap_len, row, col). Patch token order is (ph, pw, c)
channel-fastest — shared with z_image (same Lumina lineage), so this
module reuses its pack/unpack.
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
from vllm_omni_tpu.diffusion.z_image import _pack_z, _unpack_z
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class OmniGen2Config:
    """Mirrors the transformer's diffusers config.json
    (OmniGen2Transformer2DModel.__init__ :841: 32 layers of 2520,
    21 heads / 7 kv heads, rope (40,40,40) at theta 10000)."""

    patch_size: int = 2
    in_channels: int = 16
    out_channels: int = 16
    hidden_size: int = 2520
    num_layers: int = 32
    num_refiner_layers: int = 2
    num_attention_heads: int = 21
    num_kv_heads: int = 7
    multiple_of: int = 256
    ffn_dim_multiplier: Optional[float] = None
    norm_eps: float = 1e-5
    axes_dim_rope: tuple = (40, 40, 40)
    axes_lens: tuple = (1024, 1664, 1664)
    text_feat_dim: int = 2048
    timestep_scale: float = 1000.0

    @property
    def inner_dim(self) -> int:
        return self.hidden_size

    @property
    def attention_head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def joint_attention_dim(self) -> int:
        return self.text_feat_dim

    @property
    def pack_factor(self) -> int:
        return self.patch_size

    @property
    def temb_dim(self) -> int:
        return min(self.hidden_size, 1024)

    @property
    def ffn_hidden(self) -> int:
        inner = 4 * self.hidden_size
        if self.ffn_dim_multiplier is not None:
            inner = int(self.ffn_dim_multiplier * inner)
        m = self.multiple_of
        return m * ((inner + m - 1) // m)

    @classmethod
    def from_json(cls, cfg: dict) -> "OmniGen2Config":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        for t in ("axes_dim_rope", "axes_lens"):
            if t in kw:
                kw[t] = tuple(kw[t])
        return cls(**kw)


@dataclass
class MammothModa2Config(OmniGen2Config):
    """MammothModa2 DiT (diffusion/models/mammoth_moda2/
    mammothmoda2_dit_model.py:493) — the SAME Lumina2 block math,
    checkpoint naming, rope-id layout, ascending-t scheduler and
    data-noise output as OmniGen2, with MammothModa2 defaults. The one
    behavioral knob is timestep_scale (default 1.0 here: the sinusoid
    takes the raw t ∈ [0,1) — OmniGen2 ships 1000)."""

    patch_size: int = 2
    in_channels: int = 16
    hidden_size: int = 2304
    num_layers: int = 26
    num_attention_heads: int = 24
    num_kv_heads: int = 8
    axes_dim_rope: tuple = (32, 32, 32)
    axes_lens: tuple = (300, 512, 512)
    text_feat_dim: int = 1024
    timestep_scale: float = 1.0


# ---------------------------------------------------------------------------
# Rope — text token i at (i, i, i); image (cap_len, row, col)
# ---------------------------------------------------------------------------


def omnigen2_rope(cfg: OmniGen2Config, h_tokens: int, w_tokens: int,
                  cap_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [cap_len + n_img, head_dim//2] for the TEXT-FIRST joint
    stream."""
    theta = 10000.0

    def axis_freqs(pos: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)
                               / dim))
        return pos.astype(np.float64)[:, None] * inv[None, :]

    d0, d1, d2 = cfg.axes_dim_rope
    seq = np.arange(cap_len, dtype=np.float64)
    txt = np.concatenate([axis_freqs(seq, d0), axis_freqs(seq, d1),
                          axis_freqs(seq, d2)], axis=-1)
    rows = np.repeat(np.arange(h_tokens, dtype=np.float64), w_tokens)
    cols = np.tile(np.arange(w_tokens, dtype=np.float64), h_tokens)
    shift = np.full_like(rows, float(cap_len))
    vis = np.concatenate([axis_freqs(shift, d0), axis_freqs(rows, d1),
                          axis_freqs(cols, d2)], axis=-1)
    freqs = np.concatenate([txt, vis], axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _attention(att: Params, cfg: OmniGen2Config, x: jnp.ndarray,
               cos: jnp.ndarray, sin: jnp.ndarray, mesh=None
               ) -> jnp.ndarray:
    b, s, _ = x.shape
    nh, nkv = cfg.num_attention_heads, cfg.num_kv_heads
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
    o = mha_xla(q, k, v, scale=hd ** -0.5)
    return linear(o.reshape(b, s, nh * hd), att["to_out"])


def _ff(slot: Params, x: jnp.ndarray) -> jnp.ndarray:
    """LuminaFeedForward :430 — down(silu(gate(x)) · up(x)); checkpoint
    names linear_1 (gate) / linear_3 (up) / linear_2 (down)."""
    g = linear(x, slot["linear_1"])
    g = jax.nn.silu(g.astype(jnp.float32)).astype(x.dtype)
    return linear(g * linear(x, slot["linear_3"]), slot["linear_2"])


def omnigen2_block(blk: Params, cfg: OmniGen2Config, x: jnp.ndarray,
                   cos: jnp.ndarray, sin: jnp.ndarray,
                   temb: Optional[jnp.ndarray] = None, mesh=None
                   ) -> jnp.ndarray:
    """OmniGen2TransformerBlock :693."""
    eps = cfg.norm_eps
    if temb is not None:
        # LuminaRMSNormZero :344 — modulation linear over silu(temb)
        mod = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(
            x.dtype), blk["norm1_linear"])
        m = mod.reshape(mod.shape[0], 1, 4, cfg.hidden_size)
        scale_msa, gate_msa = m[:, :, 0], m[:, :, 1]
        scale_mlp, gate_mlp = m[:, :, 2], m[:, :, 3]
        h = rms_norm(x, blk["norm1_norm"], eps=eps) * (1.0 + scale_msa)
        attn = _attention(blk["attn"], cfg, h, cos, sin, mesh)
        x = x + jnp.tanh(gate_msa.astype(jnp.float32)).astype(x.dtype) \
            * rms_norm(attn, blk["norm2"], eps=eps)
        h2 = rms_norm(x, blk["ffn_norm1"], eps=eps) * (1.0 + scale_mlp)
        return x + jnp.tanh(gate_mlp.astype(jnp.float32)).astype(
            x.dtype) * rms_norm(_ff(blk["feed_forward"], h2),
                                blk["ffn_norm2"], eps=eps)
    h = rms_norm(x, blk["norm1_norm"], eps=eps)
    attn = _attention(blk["attn"], cfg, h, cos, sin, mesh)
    x = x + rms_norm(attn, blk["norm2"], eps=eps)
    h2 = rms_norm(x, blk["ffn_norm1"], eps=eps)
    return x + rms_norm(_ff(blk["feed_forward"], h2), blk["ffn_norm2"],
                        eps=eps)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def omnigen2_forward(params: Params, cfg: OmniGen2Config,
                     latents: jnp.ndarray, text_states: jnp.ndarray,
                     timesteps: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent], text_states [B, Tt, text_feat_dim]
    (Qwen2.5-VL hidden states), timesteps [B] in the REFERENCE
    transformer's convention: t_model = 1 - σ (ascending-t Lumina
    scheduler, pipeline :150; the serving wrapper converts). Returns
    the raw model output — data-noise, the NEGATIVE of our serving
    velocity; the wrapper negates."""
    b, h, w, c = latents.shape
    p = cfg.patch_size
    dtype = params["x_embedder"]["w"].dtype
    cap_len = text_states.shape[1]

    # Lumina2CombinedTimestepCaptionEmbedding :485
    half = 128
    freqs = jnp.exp(-jnp.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = (cfg.timestep_scale *
            timesteps.astype(jnp.float32))[:, None] * freqs[None, :]
    e = jnp.concatenate([jnp.cos(args), jnp.sin(args)],
                        axis=-1).astype(dtype)
    te = params["time_caption_embed"]["timestep_embedder"]
    e = linear(e, te["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, te["linear_2"])
    ce = params["time_caption_embed"]["caption_embedder"]
    cap = rms_norm(text_states.astype(dtype), ce["norm"],
                   eps=cfg.norm_eps)
    cap = linear(cap, ce["linear"])

    cos, sin = omnigen2_rope(cfg, h // p, w // p, cap_len)
    cap_cos, cap_sin = cos[:cap_len], sin[:cap_len]
    img_cos, img_sin = cos[cap_len:], sin[cap_len:]

    for blk in params["context_refiner"]:
        cap = omnigen2_block(blk, cfg, cap, cap_cos, cap_sin, mesh=mesh)

    x = _pack_z(latents.astype(dtype), p)
    x = linear(x, params["x_embedder"])
    for blk in params["noise_refiner"]:
        x = omnigen2_block(blk, cfg, x, img_cos, img_sin, temb=temb,
                           mesh=mesh)

    joint = jnp.concatenate([cap, x], axis=1)  # TEXT first (:1246)
    joint = _constrain(joint, mesh, P("cfg", "ulysses", None))
    for blk in params["layers"]:
        joint = omnigen2_block(blk, cfg, joint, cos, sin, temb=temb,
                               mesh=mesh)

    # LuminaLayerNormContinuous :380 — scale-only, fused out projection
    fin = params["norm_out"]
    scale = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                   fin["linear_1"])
    out = _layer_norm_nb(joint, 1e-6) * (1.0 + scale)[:, None, :]
    out = linear(out, fin["linear_2"])
    return _unpack_z(out[:, cap_len:], h, w, p)


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


def _block_params(keys, cfg: OmniGen2Config, dtype,
                  modulation: bool) -> Params:
    d = cfg.hidden_size
    hd = cfg.attention_head_dim
    kv = cfg.num_kv_heads * hd
    fh = cfg.ffn_hidden
    blk = {
        "attn": {
            "to_q": _lin(next(keys), d, d, dtype, bias=False),
            "to_k": _lin(next(keys), d, kv, dtype, bias=False),
            "to_v": _lin(next(keys), d, kv, dtype, bias=False),
            "to_out": _lin(next(keys), d, d, dtype, bias=False),
            "norm_q": jnp.ones((hd,), dtype),
            "norm_k": jnp.ones((hd,), dtype),
        },
        "feed_forward": {
            "linear_1": _lin(next(keys), d, fh, dtype, bias=False),
            "linear_3": _lin(next(keys), d, fh, dtype, bias=False),
            "linear_2": _lin(next(keys), fh, d, dtype, bias=False),
        },
        "norm1_norm": jnp.ones((d,), dtype),
        "norm2": jnp.ones((d,), dtype),
        "ffn_norm1": jnp.ones((d,), dtype),
        "ffn_norm2": jnp.ones((d,), dtype),
    }
    if modulation:
        blk["norm1_linear"] = _lin(next(keys), cfg.temb_dim, 4 * d,
                                   dtype, scale=0.02)
    return blk


def init_omnigen2_params(cfg: OmniGen2Config, key: jax.Array,
                         dtype=jnp.bfloat16) -> Params:
    n = (cfg.num_layers + 3 * cfg.num_refiner_layers) * 9 + 16
    keys = iter(jax.random.split(key, n))
    d = cfg.hidden_size
    p = cfg.patch_size
    tok_in = p * p * cfg.in_channels
    return {
        "x_embedder": _lin(next(keys), tok_in, d, dtype),
        "ref_image_patch_embedder": _lin(next(keys), tok_in, d, dtype),
        "image_index_embedding": jnp.zeros((5, d), dtype),
        "time_caption_embed": {
            "timestep_embedder": {
                "linear_1": _lin(next(keys), 256, cfg.temb_dim, dtype),
                "linear_2": _lin(next(keys), cfg.temb_dim, cfg.temb_dim,
                                 dtype)},
            "caption_embedder": {
                "norm": jnp.ones((cfg.text_feat_dim,), dtype),
                "linear": _lin(next(keys), cfg.text_feat_dim, d,
                               dtype)}},
        "norm_out": {
            "linear_1": _lin(next(keys), cfg.temb_dim, d, dtype,
                             scale=0.02),
            "linear_2": _lin(next(keys), d, p * p * cfg.out_channels,
                             dtype)},
        "noise_refiner": [_block_params(keys, cfg, dtype, True)
                          for _ in range(cfg.num_refiner_layers)],
        "ref_image_refiner": [_block_params(keys, cfg, dtype, True)
                              for _ in range(cfg.num_refiner_layers)],
        "context_refiner": [_block_params(keys, cfg, dtype, False)
                            for _ in range(cfg.num_refiner_layers)],
        "layers": [_block_params(keys, cfg, dtype, True)
                   for _ in range(cfg.num_layers)],
    }


def omnigen2_param_shardings(params: Params) -> Params:
    col = {"to_q", "to_k", "to_v", "linear_1", "linear_3"}
    row = {"to_out", "linear_2"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        gparent = names[-3] if len(names) >= 3 else ""
        # only shard inside attention/FF (time/caption embed + norm_out
        # also use linear_1/linear_2 names but replicate)
        if gparent not in ("attn", "feed_forward"):
            return P()
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_omnigen2_tensor(params: Params, name: str, value,
                           dtype) -> bool:
    """Map one checkpoint tensor (OmniGen2Transformer2DModel naming,
    reference load_weights :1281 — separate to_q/to_k/to_v,
    feed_forward.linear_1/linear_3/linear_2). Returns False if
    unrecognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    parts = name.split(".")
    if parts[0] in ("x_embedder", "ref_image_patch_embedder"):
        return put(params[parts[0]],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[0] == "image_index_embedding":
        params["image_index_embedding"] = jnp.asarray(value).astype(
            dtype)
        return True
    if parts[0] == "time_caption_embed":
        if parts[1] == "timestep_embedder":
            slot = params["time_caption_embed"]["timestep_embedder"]\
                .get(parts[2])
            if slot is None:
                return False
            return put(slot, "w" if parts[3] == "weight" else "b",
                       value)
        if parts[1] == "caption_embedder":
            ce = params["time_caption_embed"]["caption_embedder"]
            if parts[2] == "0" and parts[3] == "weight":
                ce["norm"] = b(value)
                return True
            if parts[2] == "1":
                return put(ce["linear"],
                           "w" if parts[3] == "weight" else "b", value)
        return False
    if parts[0] == "norm_out" and parts[1] in ("linear_1", "linear_2"):
        return put(params["norm_out"][parts[1]],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] in ("noise_refiner", "ref_image_refiner",
                    "context_refiner", "layers"):
        blk = params[parts[0]][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "norm1":
            if rest[1] == "linear" and "norm1_linear" in blk:
                return put(blk["norm1_linear"],
                           "w" if rest[2] == "weight" else "b", value)
            if rest[1] == "norm" and rest[2] == "weight":
                blk["norm1_norm"] = b(value)
                return True
            if rest[1] == "weight":  # unmodulated: norm1 IS the RMSNorm
                blk["norm1_norm"] = b(value)
                return True
            return False
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("norm_q", "norm_k") and rest[2] == "weight":
                a[rest[1]] = b(value)
                return True
            if rest[1] in ("to_q", "to_k", "to_v") and \
                    rest[2] == "weight":
                return put(a[rest[1]], "w", value)
            if rest[1] == "to_out":
                leaf = rest[3] if rest[2] == "0" else rest[2]
                if leaf == "weight":
                    return put(a["to_out"], "w", value)
            return False
        if rest[0] == "feed_forward" and \
                rest[1] in ("linear_1", "linear_2", "linear_3") and \
                rest[2] == "weight":
            return put(blk["feed_forward"][rest[1]], "w", value)
        if rest[0] in ("norm2", "ffn_norm1", "ffn_norm2") and \
                rest[1] == "weight":
            blk[rest[0]] = b(value)
            return True
    return False
