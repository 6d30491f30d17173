"""CosyVoice3 conditional flow-matching mel DiT with real checkpoint
geometry.

Reference parity: diffusion/models/cosyvoice3_audio/cosyvoice3_dit.py
(DiT :373 — F5-TTS-style blocks: AdaLayerNormZero attention norm +
no-affine FF norm :156, biased q/k/v/out projections, gelu-tanh FF
with Sequential names ff.ff.0.0/ff.ff.2 :54, InputEmbedding
proj([x, cond, mu, spks]) + CAUSAL grouped conv position embedding
(two left-padded k=31 group-16 Conv1ds with Mish) :190/:352,
sin-FIRST timestep sinusoid with the (half-1) frequency denominator
:281, AdaLayerNormZero_Final scale-first head :224).

Rope quirk kept faithfully: x_transformers.apply_rotary_pos_emb is
called on the FLATTENED [B, S, inner] q/k with a dim_head-wide table
(:125), so only the first dim_head features — head 0 after the
reshape — are rotated; remaining heads pass through unrotated.

Serving integration: this is the flow stage of the cosyvoice3 3-stage
graph — mu (per-frame talker conditioning) rides in as text_states at
the mel frame rate, cond (prompt-audio mel) and spks default to zeros
for plain TTS.
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

Params = dict


@dataclass
class Cosy3AudioConfig:
    """Mirrors the DiT kwargs (cosyvoice3_dit.py :379)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 80
    mu_dim: Optional[int] = None
    spk_dim: Optional[int] = None
    long_skip_connection: bool = False
    rope_theta: float = 10000.0

    @property
    def inner_dim(self) -> int:
        return self.heads * self.dim_head

    @property
    def num_layers(self) -> int:
        return self.depth

    @property
    def num_attention_heads(self) -> int:
        return self.heads

    @property
    def attention_head_dim(self) -> int:
        return self.dim_head

    @property
    def joint_attention_dim(self) -> int:
        return self.mu_dim or self.mel_dim

    @property
    def patch_size(self) -> int:
        return 1

    @property
    def pack_factor(self) -> int:
        return 1

    @classmethod
    def from_json(cls, cfg: dict) -> "Cosy3AudioConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        return cls(**kw)


def cosy3_rope(cfg: Cosy3AudioConfig, seq_len: int
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x_transformers RotaryEmbedding(dim_head): half-width tables; the
    apply site pairs them GPT-J-interleaved."""
    d = cfg.dim_head
    inv = 1.0 / (cfg.rope_theta **
                 (np.arange(0, d, 2, dtype=np.float64) / d))
    freqs = np.arange(seq_len, dtype=np.float64)[:, None] * inv[None, :]
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


def _mish(x: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    return (xf * jnp.tanh(jax.nn.softplus(xf))).astype(x.dtype)


def _causal_group_conv(x: jnp.ndarray, slot: Params, kernel: int,
                       groups: int) -> jnp.ndarray:
    """[B, T, C] left-padded grouped Conv1d (+bias)."""
    xp = jnp.pad(x, ((0, 0), (kernel - 1, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, slot["w"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    return out + slot["b"]


def cosy3_block(blk: Params, cfg: Cosy3AudioConfig, x: jnp.ndarray,
                temb: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                mesh=None) -> jnp.ndarray:
    """DiTBlock :156."""
    b, s, d = x.shape
    nh, hd = cfg.heads, cfg.dim_head
    mod = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype),
                 blk["attn_norm"])
    m = mod.reshape(b, 1, 6, d)
    sh_msa, sc_msa, g_msa = m[:, :, 0], m[:, :, 1], m[:, :, 2]
    sh_mlp, sc_mlp, g_mlp = m[:, :, 3], m[:, :, 4], m[:, :, 5]

    xn = _layer_norm_nb(x, 1e-6) * (1.0 + sc_msa) + sh_msa
    a = blk["attn"]
    q = linear(xn, a["to_q"])
    k = linear(xn, a["to_k"])
    v = linear(xn, a["to_v"])
    # faithful rope quirk: rotate only the first dim_head features of
    # the flattened projections (head 0 after the reshape)
    q_rot = apply_rope_interleaved(q[:, :, None, :hd], cos, sin)[:, :, 0]
    k_rot = apply_rope_interleaved(k[:, :, None, :hd], cos, sin)[:, :, 0]
    q = jnp.concatenate([q_rot, q[..., hd:]], axis=-1).reshape(
        b, s, nh, hd)
    k = jnp.concatenate([k_rot, k[..., hd:]], axis=-1).reshape(
        b, s, nh, hd)
    v = v.reshape(b, s, nh, hd)
    if mesh is not None:
        q = _constrain(q, mesh, P("cfg", None, ("ulysses", "tp"), None))
    o = mha_xla(q, k, v, scale=hd ** -0.5)
    o = linear(o.reshape(b, s, nh * hd), a["to_out"])
    x = x + g_msa * o

    xn2 = _layer_norm_nb(x, 1e-6) * (1.0 + sc_mlp) + sh_mlp
    h = linear(xn2, blk["ff"]["net0"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
        x.dtype)
    return x + g_mlp * linear(h, blk["ff"]["net2"])


def cosy3_audio_forward(params: Params, cfg: Cosy3AudioConfig,
                        latents: jnp.ndarray, mu: jnp.ndarray,
                        timesteps: jnp.ndarray,
                        cond: Optional[jnp.ndarray] = None,
                        spks: Optional[jnp.ndarray] = None,
                        mesh=None) -> jnp.ndarray:
    """latents [B, T, mel] (noised mel, channel-last — the reference
    transposes [B, mel, T] at the edges :426), mu [B, T, mu_dim]
    (per-frame talker conditioning), timesteps [B] flow-match
    t ∈ [0,1], cond [B, T, mel] (prompt-audio mel, zeros for plain
    TTS), spks [B, spk_dim] → velocity [B, T, mel]."""
    b, s, _ = latents.shape
    dtype = params["proj_out"]["w"].dtype
    x_in = latents.astype(dtype)
    if cond is None:
        cond = jnp.zeros_like(x_in)
    to_cat = [x_in, cond.astype(dtype), mu.astype(dtype)]
    if cfg.spk_dim:
        if spks is None:
            spks = jnp.zeros((b, cfg.spk_dim), dtype)
        to_cat.append(jnp.broadcast_to(spks.astype(dtype)[:, None, :],
                                       (b, s, cfg.spk_dim)))

    # timestep embed :281 — sin FIRST, scale 1000, (half-1) denominator
    half = 128
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) *
                    (-jnp.log(10000.0) / (half - 1)))
    args = 1000.0 * timesteps.astype(jnp.float32)[:, None] * \
        freqs[None, :]
    e = jnp.concatenate([jnp.sin(args), jnp.cos(args)],
                        axis=-1).astype(dtype)
    te = params["time_embed"]
    e = linear(e, te["mlp0"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, te["mlp2"])

    ie = params["input_embed"]
    x = linear(jnp.concatenate(to_cat, axis=-1), ie["proj"])
    pe = _mish(_causal_group_conv(x, ie["conv1"], 31, 16))
    pe = _mish(_causal_group_conv(pe, ie["conv2"], 31, 16))
    x = x + pe
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    cos, sin = cosy3_rope(cfg, s)
    residual = x if cfg.long_skip_connection else None
    for blk in params["blocks"]:
        x = cosy3_block(blk, cfg, x, temb, cos, sin, mesh=mesh)
    if residual is not None:
        x = linear(jnp.concatenate([x, residual], axis=-1),
                   params["long_skip_connection"])

    # AdaLayerNormZero_Final :224 — scale chunked FIRST
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                 params["norm_out"])
    d = cfg.dim
    scale_o, shift_o = fin[:, None, :d], fin[:, None, d:]
    out = _layer_norm_nb(x, 1e-6) * (1.0 + scale_o) + shift_o
    return linear(out, params["proj_out"])


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


def init_cosy3_audio_params(cfg: Cosy3AudioConfig, key: jax.Array,
                            dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.depth * 8 + 12))
    d = cfg.dim
    mu = cfg.mu_dim or cfg.mel_dim
    spk = cfg.spk_dim or 0
    in_dim = cfg.mel_dim * 2 + mu + spk

    def conv_slot(k, groups=16, kernel=31):
        # jax WIO layout: [kernel, in/groups, out]
        return {"w": (jax.random.normal(
            k, (kernel, d // groups, d), jnp.float32) * 0.05).astype(
            dtype), "b": jnp.zeros((d,), dtype)}

    params: Params = {
        "time_embed": {"mlp0": _lin(next(keys), 256, d, dtype),
                       "mlp2": _lin(next(keys), d, d, dtype)},
        "input_embed": {"proj": _lin(next(keys), in_dim, d, dtype),
                        "conv1": conv_slot(next(keys)),
                        "conv2": conv_slot(next(keys))},
        "norm_out": _lin(next(keys), d, 2 * d, dtype, scale=0.02),
        "proj_out": _lin(next(keys), d, cfg.mel_dim, dtype),
        "blocks": [],
    }
    if cfg.long_skip_connection:
        params["long_skip_connection"] = _lin(next(keys), 2 * d, d,
                                              dtype, bias=False)
    hs = cfg.inner_dim
    for _ in range(cfg.depth):
        params["blocks"].append({
            "attn_norm": _lin(next(keys), d, 6 * d, dtype, scale=0.02),
            "attn": {"to_q": _lin(next(keys), d, hs, dtype),
                     "to_k": _lin(next(keys), d, hs, dtype),
                     "to_v": _lin(next(keys), d, hs, dtype),
                     "to_out": _lin(next(keys), hs, d, dtype)},
            "ff": {"net0": _lin(next(keys), d, cfg.ff_mult * d, dtype),
                   "net2": _lin(next(keys), cfg.ff_mult * d, d, dtype)},
        })
    return params


def cosy3_audio_param_shardings(params: Params) -> Params:
    col = {"to_q", "to_k", "to_v", "net0"}
    row = {"to_out", "net2"}

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


def assign_cosy3_audio_tensor(params: Params, name: str, value,
                              dtype) -> bool:
    """Map one checkpoint tensor (cosyvoice3_dit.py module naming —
    Sequential time_mlp.0/.2, conv_pos_embed.conv{1,2}.0 Conv1d
    [out, in/groups, k], ff.ff.0.0/.ff.2). Returns False if
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
    if parts[0] == "time_embed" and parts[1] == "time_mlp":
        slot = {"0": "mlp0", "2": "mlp2"}.get(parts[2])
        if slot is None:
            return False
        return put(params["time_embed"][slot],
                   "w" if parts[3] == "weight" else "b", value)
    if parts[0] == "input_embed":
        if parts[1] == "proj":
            return put(params["input_embed"]["proj"],
                       "w" if parts[2] == "weight" else "b", value)
        if parts[1] == "conv_pos_embed" and parts[2] in ("conv1",
                                                         "conv2") and \
                parts[3] == "0":
            slot = params["input_embed"][parts[2]]
            if parts[4] == "weight":
                # torch Conv1d [out, in/groups, k] → jax WIO
                slot["w"] = jnp.asarray(_np.ascontiguousarray(
                    np.transpose(value, (2, 1, 0)))).astype(dtype)
            else:
                slot["b"] = b(value)
            return True
        return False
    if parts[:2] == ["norm_out", "linear"]:
        return put(params["norm_out"],
                   "w" if parts[2] == "weight" else "b", value)
    if parts[0] == "proj_out" and len(parts) == 2:
        return put(params["proj_out"],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[0] == "long_skip_connection" and \
            "long_skip_connection" in params:
        return put(params["long_skip_connection"],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[0] == "transformer_blocks":
        blk = params["blocks"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "attn_norm" and rest[1] == "linear":
            return put(blk["attn_norm"],
                       "w" if rest[2] == "weight" else "b", value)
        if rest[0] == "attn":
            a = blk["attn"]
            if rest[1] in ("to_q", "to_k", "to_v"):
                return put(a[rest[1]],
                           "w" if rest[2] == "weight" else "b", value)
            if rest[1] == "to_out":
                leaf = rest[3] if rest[2] == "0" else rest[2]
                return put(a["to_out"],
                           "w" if leaf == "weight" else "b", value)
            return False
        if rest[0] == "ff" and rest[1] == "ff":
            if rest[2] == "0" and rest[3] == "0":
                return put(blk["ff"]["net0"],
                           "w" if rest[4] == "weight" else "b", value)
            if rest[2] == "2":
                return put(blk["ff"]["net2"],
                           "w" if rest[3] == "weight" else "b", value)
    return False
