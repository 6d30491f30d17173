"""DreamID-Omni: joint audio+video generation with cross-modal fusion.

Reference: /root/reference/vllm_omni/diffusion/models/dreamid_omni/
(wan2_2.py — native-naming Wan towers: per-token AdaLN modulation via
a learned additive table, qk-rms self-attn with 3D video rope /
temporal-only audio rope; fusion.py FusionModel — the two towers run
block-by-block in LOCKSTEP, and each block's cross-attention adds a
FUSION branch attending the OTHER modality through injected
k_fusion/v_fusion projections with rope applied to q (source grid)
and k (target grid) so the shared temporal rope subspace aligns the
modalities; audio runs its fused cross-attn first against the updated
video, video then attends the PRE-update audio (fusion.py:257-289);
pipeline_dreamid_omni.py — identity-reference latents are appended as
trailing frames/rows and re-injected every step, 4 CFG branches
(pos / text-neg / video-ref-zeroed / audio-ref-zeroed) combine as
neg + cfg·(pos−neg) + ref_cfg·(pos−ref_neg) per modality :266-283).

The audio tower's temporal rope positions are scaled by
``temporal_rope_scaling_factor`` (≈0.19676 ≈ video fps / audio latent
rate) so audio tokens land on the video's temporal axis — that is
what makes the fusion attention time-aligned. The reference imports
rope/conv helpers from the external ``dreamid_omni`` package; those
pieces (rope position scaling, MMAudio-style conv patch embed) are
re-designed here TPU-natively and validated by torch oracles.
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
class DreamIDTowerConfig:
    """One Wan tower (wan2_2.py WanModel)."""
    is_audio: bool = False
    patch_size: tuple = (1, 2, 2)
    in_dim: int = 16
    out_dim: int = 16
    dim: int = 3072
    ffn_dim: int = 14336
    freq_dim: int = 256
    text_dim: int = 4096
    text_len: int = 512
    num_heads: int = 24
    num_layers: int = 30
    eps: float = 1e-6
    temporal_rope_scaling_factor: float = 1.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def t_rope_dim(self) -> int:
        d = self.head_dim
        return d - 4 * (d // 6)

    @classmethod
    def from_json(cls, d: dict) -> "DreamIDTowerConfig":
        mt = d.get("model_type", "t2v")
        return cls(
            is_audio="a" in mt,
            patch_size=tuple(d.get("patch_size", (1, 2, 2))),
            in_dim=d.get("in_dim", 16), out_dim=d.get("out_dim", 16),
            dim=d.get("dim", 3072), ffn_dim=d.get("ffn_dim", 14336),
            freq_dim=d.get("freq_dim", 256),
            text_dim=d.get("text_dim", 4096),
            text_len=d.get("text_len", 512),
            num_heads=d.get("num_heads", 24),
            num_layers=d.get("num_layers", 30),
            eps=d.get("eps", 1e-6),
            temporal_rope_scaling_factor=d.get(
                "temporal_rope_scaling_factor", 1.0),
        )


@dataclass
class DreamIDConfig:
    video: DreamIDTowerConfig = field(
        default_factory=DreamIDTowerConfig)
    audio: DreamIDTowerConfig = field(default_factory=lambda:
                                      DreamIDTowerConfig(is_audio=True))
    num_train_timesteps: int = 1000
    flow_shift: float = 5.0
    vae_downsample: int = 8  # wan2.2 spatial
    video_cfg: float = 4.0
    video_ref_cfg: float = 1.5
    audio_cfg: float = 4.5
    audio_ref_cfg: float = 2.0

    @classmethod
    def from_json(cls, hf: dict) -> "DreamIDConfig":
        return cls(
            video=DreamIDTowerConfig.from_json(
                hf.get("video_config") or {}),
            audio=DreamIDTowerConfig.from_json(
                dict({"model_type": "t2a", "patch_size": [1]},
                     **(hf.get("audio_config") or {}))),
            num_train_timesteps=hf.get("num_train_timesteps", 1000),
            flow_shift=hf.get("flow_shift", 5.0),
        )


def is_dreamid_dir(path: str) -> bool:
    cfg_path = os.path.join(str(path), "config.json")
    if not os.path.isfile(cfg_path):
        return False
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return False
    archs = cfg.get("architectures") or []
    return cfg.get("model_type") == "dreamid_omni" or any(
        "DreamID" in a for a in archs)


# ---------------------------------------------------------------------------
# rope
# ---------------------------------------------------------------------------


def _rope_half(max_pos: int, dim: int, scale: float = 1.0,
               theta: float = 10000.0) -> np.ndarray:
    """rope_params: complex angles [max_pos, dim//2]; positions scaled
    by `scale` (the temporal alignment factor)."""
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, np.float64) / dim))
    return np.arange(max_pos, dtype=np.float64)[:, None] * scale * \
        inv[None]


def video_rope(cfg: DreamIDTowerConfig, f: int, h: int, w: int
               ) -> tuple[np.ndarray, np.ndarray]:
    """3D wan rope: head dim split [t: d−4(d//6) | h: 2(d//6) |
    w: 2(d//6)] (wan2_2.py set_rope_params:381-386). → cos/sin
    [f·h·w, head_dim//2] halves (pairwise rotation)."""
    d = cfg.head_dim
    dt, dh = d - 4 * (d // 6), 2 * (d // 6)
    at = _rope_half(max(f, 1), dt)
    ah = _rope_half(max(h, 1), dh)
    aw = _rope_half(max(w, 1), dh)
    ang = np.zeros((f, h, w, d // 2), np.float64)
    ang[..., :dt // 2] = at[:, None, None]
    ang[..., dt // 2:(dt + dh) // 2] = ah[None, :, None]
    ang[..., (dt + dh) // 2:] = aw[None, None, :]
    ang = ang.reshape(f * h * w, d // 2)
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def audio_rope(cfg: DreamIDTowerConfig, n: int,
               scale: Optional[float] = None
               ) -> tuple[np.ndarray, np.ndarray]:
    """Temporal-only audio rope: ONLY the first d−4(d//6) head dims
    rotate (set_rope_params audio branch) — the same sub-dims as the
    video's temporal axis; positions scaled by
    temporal_rope_scaling_factor so they land on the video's frame
    axis. The remaining dims keep angle 0 (identity rotation)."""
    d = cfg.head_dim
    dt = d - 4 * (d // 6)
    s = cfg.temporal_rope_scaling_factor if scale is None else scale
    ang = np.zeros((n, d // 2), np.float64)
    ang[:, :dt // 2] = _rope_half(n, dt, scale=s)
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32))


def _apply_rope(x: jnp.ndarray, cos, sin) -> jnp.ndarray:
    """x [B, S, H, D]; pairwise (complex) rotation per 2 dims."""
    b, s, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, h, d // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    sn = sin[None, :, None, :]
    return jnp.stack([xr * c - xi * sn, xr * sn + xi * c],
                     axis=-1).reshape(b, s, h, d).astype(x.dtype)


# ---------------------------------------------------------------------------
# tower pieces
# ---------------------------------------------------------------------------


def _rms_full(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32)).astype(x.dtype)


def _ln(x, eps, w=None, b=None):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        out = out * w.astype(jnp.float32) + b.astype(jnp.float32)
    return out.astype(x.dtype)


def _gelu_tanh(x):
    return jax.nn.gelu(x.astype(jnp.float32),
                       approximate=True).astype(x.dtype)


def _sinusoidal(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """sinusoidal_embedding_1d (wan native): [sin | cos] halves of
    pos/theta^(2i/d)."""
    half = dim // 2
    freqs = jnp.power(10000.0,
                      -jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def tower_embed(p: Params, cfg: DreamIDTowerConfig, x: jnp.ndarray,
                t: jnp.ndarray, context: jnp.ndarray):
    """→ (tokens [B,S,D], e [B,6,D], ctx [B,T,D], grid). Video x
    [B,F,H,W,C]; audio x [B,L,C]."""
    dtype = p["text_embedding"]["l0"]["w"].dtype
    if cfg.is_audio:
        # MMAudio-style conv patch embed: ChannelLastConv1d k7 same-pad
        # → SiLU → ConvMLP (k7 conv sandwich) — native helpers live in
        # the external package; this is the documented TPU design
        h = _conv1d_same(x.astype(dtype), p["patch_embedding"]["conv"])
        h = jax.nn.silu(h.astype(jnp.float32)).astype(dtype)
        m = _conv1d_same(h, p["patch_embedding"]["mlp_c1"])
        m = _gelu_tanh(m)
        tokens = _conv1d_same(m, p["patch_embedding"]["mlp_c2"])
        grid = (x.shape[1],)
    else:
        b, f, hh, ww, c = x.shape
        pt, ph, pw = cfg.patch_size
        lat = x.reshape(b, f // pt, pt, hh // ph, ph, ww // pw, pw, c)
        # conv3d weight flattens channel-FIRST per patch (C, pt, ph, pw)
        lat = lat.transpose(0, 1, 3, 5, 7, 2, 4, 6)
        lat = lat.reshape(b, (f // pt) * (hh // ph) * (ww // pw),
                          c * pt * ph * pw)
        tokens = linear(lat.astype(dtype), p["patch_embedding"])
        grid = (f // pt, hh // ph, ww // pw)
    te = _sinusoidal(t, cfg.freq_dim).astype(dtype)
    e = linear(te, p["time_embedding"]["l0"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    temb = linear(e, p["time_embedding"]["l2"])
    tproj = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(dtype),
                   p["time_projection"]).reshape(
        t.shape[0], 6, cfg.dim)
    ctx = linear(_gelu_tanh(linear(context.astype(dtype),
                                   p["text_embedding"]["l0"])),
                 p["text_embedding"]["l2"])
    return tokens, temb, tproj, ctx, grid


def _conv1d_same(x, p):
    """[B, T, C] k=7 'same' conv (padding 3 both sides — torch
    Conv1d(padding=3))."""
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, p["w"], window_strides=(1,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + p["b"]


def _attend(q, k, v, nh, hd):
    sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * (hd ** -0.5)
    pr = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(v.dtype), v)
    return o.reshape(q.shape[0], q.shape[1], nh * hd)


def _self_attn(blk, cfg, x, cos, sin):
    b, s, _ = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    sa = blk["self_attn"]
    q = _rms_full(linear(x, sa["q"]), sa["norm_q"], cfg.eps)
    k = _rms_full(linear(x, sa["k"]), sa["norm_k"], cfg.eps)
    v = linear(x, sa["v"]).reshape(b, s, nh, hd)
    q = _apply_rope(q.reshape(b, s, nh, hd), cos, sin)
    k = _apply_rope(k.reshape(b, s, nh, hd), cos, sin)
    return linear(_attend(q, k, v, nh, hd), sa["o"])


def _fusion_cross_attn(blk, cfg, x, ctx, target, s_cos, s_sin, t_cos,
                       t_sin):
    """fusion.py single_fusion_cross_attention_forward: text branch
    (no rope) + fusion branch (q roped with SOURCE grid, k_target
    roped with TARGET grid)."""
    b, s, _ = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    ca = blk["cross_attn"]
    q = _rms_full(linear(x, ca["q"]), ca["norm_q"],
                  cfg.eps).reshape(b, s, nh, hd)
    k = _rms_full(linear(ctx, ca["k"]), ca["norm_k"],
                  cfg.eps).reshape(b, ctx.shape[1], nh, hd)
    v = linear(ctx, ca["v"]).reshape(b, ctx.shape[1], nh, hd)
    out = _attend(q, k, v, nh, hd)
    tgt = _ln(target, cfg.eps, ca["fusion_norm_w"],
              ca["fusion_norm_b"])
    kt = _rms_full(linear(tgt, ca["k_fusion"]), ca["norm_k_fusion"],
                   cfg.eps).reshape(b, tgt.shape[1], nh, hd)
    vt = linear(tgt, ca["v_fusion"]).reshape(b, tgt.shape[1], nh, hd)
    qr = _apply_rope(q, s_cos, s_sin)
    kt = _apply_rope(kt, t_cos, t_sin)
    out = out + _attend(qr, kt, vt, nh, hd)
    return linear(out, ca["o"])


def _block_self(blk, cfg, x, e6, cos, sin):
    """Self-attn half of a fused block (fusion.py:216-253): AdaLN via
    the additive modulation table, then qk-rms roped attention."""
    mod = (blk["modulation"][None].astype(jnp.float32) +
           e6.astype(jnp.float32))  # [B, 6, D]
    m = [mod[:, i][:, None].astype(x.dtype) for i in range(6)]
    y = _self_attn(blk, cfg, _ln(x, cfg.eps) * (1 + m[1]) + m[0], cos,
                   sin)
    return x + y * m[2], m


def _block_cross_ffn(blk, cfg, x, ctx, target, m, s_cos, s_sin, t_cos,
                     t_sin):
    """Fused cross-attn + FFN half (fusion.py:147-185)."""
    xn = _ln(x, cfg.eps, blk["norm3_w"], blk["norm3_b"])
    x = x + _fusion_cross_attn(blk, cfg, xn, ctx, target, s_cos,
                               s_sin, t_cos, t_sin)
    y = linear(_gelu_tanh(linear(
        _ln(x, cfg.eps) * (1 + m[4]) + m[3], blk["ffn"]["l0"])),
        blk["ffn"]["l2"])
    return x + y * m[5]


def tower_head(p, cfg, x, temb):
    """Head (native wan): LN → AdaLN(2) from temb → linear to
    out·prod(patch)."""
    mod = (p["head"]["modulation"][None].astype(jnp.float32) +
           temb.astype(jnp.float32)[:, None])  # [B, 2, D]
    m0 = mod[:, 0][:, None].astype(x.dtype)
    m1 = mod[:, 1][:, None].astype(x.dtype)
    h = _ln(x, cfg.eps) * (1 + m1) + m0
    return linear(h, p["head"]["head"])


def dreamid_forward(params: Params, cfg: DreamIDConfig,
                    vid: jnp.ndarray, aud: jnp.ndarray,
                    t: jnp.ndarray, vid_ctx: jnp.ndarray,
                    aud_ctx: jnp.ndarray) -> tuple:
    """One fused denoise forward. vid [B,F,H,W,C] (ref frames
    included as trailing frames), aud [B,L,Ca] (ref rows trailing),
    t [B] flow timesteps (train units), contexts [B,T,text_dim] →
    (vid velocity, audio velocity), same shapes."""
    vc, ac = cfg.video, cfg.audio
    pv, pa = params["video"], params["audio"]
    b, f, h, w, c = vid.shape
    vx, v_temb, v_tproj, vctx, vgrid = tower_embed(pv, vc, vid, t,
                                                   vid_ctx)
    ax, a_temb, a_tproj, actx, agrid = tower_embed(pa, ac, aud, t,
                                                   aud_ctx)
    v_cos, v_sin = [jnp.asarray(z) for z in video_rope(vc, *vgrid)]
    a_cos, a_sin = [jnp.asarray(z) for z in audio_rope(ac, agrid[0])]
    for vb, ab in zip(pv["blocks"], pa["blocks"]):
        # lockstep (fusion.py single_fusion_block_forward): both
        # self-attns, then audio cross vs UPDATED video, video cross
        # vs PRE-update audio
        ax, am = _block_self(ab, ac, ax, a_tproj, a_cos, a_sin)
        vx, vm = _block_self(vb, vc, vx, v_tproj, v_cos, v_sin)
        og_audio = ax
        ax = _block_cross_ffn(ab, ac, ax, actx, vx, am, a_cos, a_sin,
                              v_cos, v_sin)
        vx = _block_cross_ffn(vb, vc, vx, vctx, og_audio, vm, v_cos,
                              v_sin, a_cos, a_sin)
    v_out = tower_head(pv, vc, vx, v_temb)
    a_out = tower_head(pa, ac, ax, a_temb)
    pt, ph, pw = vc.patch_size
    fo, ho, wo = vgrid
    v_out = v_out.reshape(b, fo, ho, wo, pt, ph, pw, vc.out_dim)
    v_out = v_out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, f, h, w, vc.out_dim)
    return (v_out.astype(jnp.float32), a_out.astype(jnp.float32))


def combine_dreamid_cfg(pos, neg, ref_neg, cfg_scale: float,
                        ref_scale: float):
    """pipeline_dreamid_omni.py:266-283 per-modality 3-term CFG."""
    return neg + cfg_scale * (pos - neg) + ref_scale * (pos - ref_neg)


# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def _lin_init(cin, cout, dtype, bias=True):
    p = {"w": jnp.zeros((cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_tower_params(cfg: DreamIDTowerConfig, dtype) -> Params:
    d, fd = cfg.dim, cfg.ffn_dim

    def block():
        return {
            "modulation": jnp.zeros((6, d), dtype),
            "self_attn": {
                "q": _lin_init(d, d, dtype), "k": _lin_init(d, d,
                                                            dtype),
                "v": _lin_init(d, d, dtype), "o": _lin_init(d, d,
                                                            dtype),
                "norm_q": jnp.ones((d,), dtype),
                "norm_k": jnp.ones((d,), dtype),
            },
            "norm3_w": jnp.ones((d,), dtype),
            "norm3_b": jnp.zeros((d,), dtype),
            "cross_attn": {
                "q": _lin_init(d, d, dtype), "k": _lin_init(d, d,
                                                            dtype),
                "v": _lin_init(d, d, dtype), "o": _lin_init(d, d,
                                                            dtype),
                "norm_q": jnp.ones((d,), dtype),
                "norm_k": jnp.ones((d,), dtype),
                "k_fusion": _lin_init(d, d, dtype),
                "v_fusion": _lin_init(d, d, dtype),
                "fusion_norm_w": jnp.ones((d,), dtype),
                "fusion_norm_b": jnp.zeros((d,), dtype),
                "norm_k_fusion": jnp.ones((d,), dtype),
            },
            "ffn": {"l0": _lin_init(d, fd, dtype),
                    "l2": _lin_init(fd, d, dtype)},
        }

    if cfg.is_audio:
        patch = {"conv": {"w": jnp.zeros((7, cfg.in_dim, d), dtype),
                          "b": jnp.zeros((d,), dtype)},
                 "mlp_c1": {"w": jnp.zeros((7, d, 4 * d), dtype),
                            "b": jnp.zeros((4 * d,), dtype)},
                 "mlp_c2": {"w": jnp.zeros((7, 4 * d, d), dtype),
                            "b": jnp.zeros((d,), dtype)}}
        out_mult = 1
    else:
        pt, ph, pw = cfg.patch_size
        patch = _lin_init(pt * ph * pw * cfg.in_dim, d, dtype)
        out_mult = pt * ph * pw
    return {
        "patch_embedding": patch,
        "text_embedding": {"l0": _lin_init(cfg.text_dim, d, dtype),
                           "l2": _lin_init(d, d, dtype)},
        "time_embedding": {"l0": _lin_init(cfg.freq_dim, d, dtype),
                           "l2": _lin_init(d, d, dtype)},
        "time_projection": _lin_init(d, 6 * d, dtype),
        "blocks": [block() for _ in range(cfg.num_layers)],
        "head": {"head": _lin_init(d, cfg.out_dim * out_mult, dtype),
                 "modulation": jnp.zeros((2, d), dtype)},
    }


def init_dreamid_params(cfg: DreamIDConfig, dtype=jnp.bfloat16
                        ) -> Params:
    return {"video": init_tower_params(cfg.video, dtype),
            "audio": init_tower_params(cfg.audio, dtype)}


_SA = {"q", "k", "v", "o"}


def _assign_tower(p: Params, cfg: DreamIDTowerConfig, parts: list,
                  arr, dtype) -> bool:
    leaf = parts[-1]
    a = np.asarray(arr)

    def put(slot):
        if leaf == "weight":
            slot["w"] = jnp.asarray(a.T, dtype)
        else:
            slot["b"] = jnp.asarray(a, dtype)
        return True

    if parts[0] == "patch_embedding":
        if cfg.is_audio:
            # Sequential [ChannelLastConv1d, SiLU, ConvMLP(c1, c2)]
            key = {"0": "conv", "2.c1": "mlp_c1",
                   "2.c2": "mlp_c2"}.get(".".join(parts[1:-1]))
            if key is None:
                return False
            if leaf == "weight":  # torch conv [O, I, K] → [K, I, O]
                p["patch_embedding"][key]["w"] = jnp.asarray(
                    a.transpose(2, 1, 0), dtype)
            else:
                p["patch_embedding"][key]["b"] = jnp.asarray(a, dtype)
            return True
        if leaf == "weight":  # conv3d [D, C, pt, ph, pw] → matmul
            p["patch_embedding"]["w"] = jnp.asarray(
                a.reshape(a.shape[0], -1).T, dtype)
        else:
            p["patch_embedding"]["b"] = jnp.asarray(a, dtype)
        return True
    seq_map = {("text_embedding", "0"): ("text_embedding", "l0"),
               ("text_embedding", "2"): ("text_embedding", "l2"),
               ("time_embedding", "0"): ("time_embedding", "l0"),
               ("time_embedding", "2"): ("time_embedding", "l2")}
    if (parts[0], parts[1] if len(parts) > 1 else "") in seq_map:
        g, k = seq_map[(parts[0], parts[1])]
        return put(p[g][k])
    if parts[0] == "time_projection":
        # Sequential [SiLU, Linear] → index 1
        return put(p["time_projection"])
    if parts[0] == "head":
        if parts[1] == "head":
            return put(p["head"]["head"])
        if parts[1] == "modulation":
            p["head"]["modulation"] = jnp.asarray(
                a.reshape(2, -1), dtype)
            return True
        return False
    if parts[0] != "blocks":
        return False
    blk = p["blocks"][int(parts[1])]
    rest = parts[2:]
    if rest[0] == "modulation":
        blk["modulation"] = jnp.asarray(a.reshape(6, -1), dtype)
        return True
    if rest[0] == "self_attn":
        if rest[1] in _SA:
            return put(blk["self_attn"][rest[1]])
        if rest[1] in ("norm_q", "norm_k") and leaf == "weight":
            blk["self_attn"][rest[1]] = jnp.asarray(a, dtype)
            return True
        return False
    if rest[0] == "cross_attn":
        ca = blk["cross_attn"]
        if rest[1] in _SA or rest[1] in ("k_fusion", "v_fusion"):
            return put(ca[rest[1]])
        if rest[1] in ("norm_q", "norm_k", "norm_k_fusion") and \
                leaf == "weight":
            ca[rest[1]] = jnp.asarray(a, dtype)
            return True
        if rest[1] == "pre_attn_norm_fusion":
            key = "fusion_norm_w" if leaf == "weight" else \
                "fusion_norm_b"
            ca[key] = jnp.asarray(a, dtype)
            return True
        return False
    if rest[0] == "norm3":
        key = "norm3_w" if leaf == "weight" else "norm3_b"
        blk[key] = jnp.asarray(a, dtype)
        return True
    if rest[0] == "ffn":
        key = {"0": "l0", "2": "l2"}.get(rest[1])
        if key is None:
            return False
        return put(blk["ffn"][key])
    return False


def assign_dreamid_tensor(params: Params, cfg: DreamIDConfig,
                          name: str, arr, dtype) -> bool:
    """Fusion checkpoint naming (FusionModel attrs): video_model.* /
    audio_model.* native-Wan tensors incl. the injected fusion
    projections."""
    parts = name.split(".")
    if parts[0] == "video_model":
        return _assign_tower(params["video"], cfg.video, parts[1:],
                             arr, dtype)
    if parts[0] == "audio_model":
        return _assign_tower(params["audio"], cfg.audio, parts[1:],
                             arr, dtype)
    return False


def load_dreamid(path: str, dtype=jnp.bfloat16
                 ) -> tuple[DreamIDConfig, Params]:
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import _collect_safetensor_files

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = DreamIDConfig.from_json(hf)
    params = init_dreamid_params(cfg, dtype)
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                if assign_dreamid_tensor(params, cfg, name, arr,
                                         dtype):
                    loaded += 1
                else:
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no dreamid tensors mapped from {path}")
    if skipped:
        logger.warning("dreamid: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("dreamid: %d tensors loaded (%d fused blocks)",
                loaded, cfg.video.num_layers)
    return cfg, params


def dreamid_param_shardings(params: Params):
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(lambda _: P(), params)


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


@dataclass
class DreamIDState:
    vid: Any            # [1, F_total, h, w, C] incl ref frames
    aud: Any            # [1, L_total, Ca] incl ref rows
    ref_vid: Any        # [1, F_ref, h, w, C]
    ref_aud: Any        # [1, L_ref, Ca]
    vid_ctx: Any
    aud_ctx: Any
    timesteps: np.ndarray
    sigmas: np.ndarray
    step_index: int = 0
    audio_latents: Any = None

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @property
    def done(self) -> bool:
        return self.step_index >= self.num_steps


class DreamIDRunner:
    """R2AV joint loop (pipeline_dreamid_omni.py diffuse:285-365):
    per step re-inject the reference latents as trailing frames/rows,
    run 4 CFG branches batched, 3-term combine per modality, Euler
    step on the generated region only."""

    decode_via_vae = False

    def __init__(self, cfg: DreamIDConfig, params: Params,
                 mesh=None) -> None:
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.tokenizer = None
        self._step_fns: dict = {}

    def _fn(self, key):
        fn = self._step_fns.get(key)
        if fn is None:
            fn = jax.jit(lambda p, v, a, t, vc, ac: dreamid_forward(
                p, self.cfg, v, a, t, vc, ac))
            self._step_fns[key] = fn
        return fn

    def _ctx(self, text: str, tower: DreamIDTowerConfig, tlen: int
             ) -> np.ndarray:
        seed = abs(hash(("dreamid", text))) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (1, tlen, tower.text_dim)).astype(np.float32) * 0.02

    def prepare(self, req, num_steps: Optional[int] = None,
                seed: int = 0) -> DreamIDState:
        cfg = self.cfg
        p = req.params
        extra = p.extra_args or {}
        steps = num_steps or p.num_inference_steps or 20
        f = max(int(p.num_frames or 2), 1)
        hh = max(p.height // cfg.vae_downsample, cfg.video.patch_size[1])
        ww = max(p.width // cfg.vae_downsample, cfg.video.patch_size[2])
        n_aud = int(extra.get("audio_frames", 8))
        text = str(req.prompt) if not isinstance(req.prompt, dict) \
            else str(req.prompt.get("text", ""))
        key = jax.random.PRNGKey(p.seed if p.seed is not None else seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        vid = jax.random.normal(k1, (1, f, hh, ww, cfg.video.in_dim),
                                jnp.float32)
        aud = jax.random.normal(k2, (1, n_aud, cfg.audio.in_dim),
                                jnp.float32)
        rv = extra.get("ref_video_latents")
        ra = extra.get("ref_audio_latents")
        pt = cfg.video.patch_size[0]
        ref_vid = (jnp.asarray(np.asarray(rv, np.float32))
                   if rv is not None else
                   jax.random.normal(
                       k3, (1, pt, hh, ww, cfg.video.in_dim),
                       jnp.float32) * 0.1)
        ref_aud = (jnp.asarray(np.asarray(ra, np.float32))
                   if ra is not None else
                   jax.random.normal(k4, (1, 2, cfg.audio.in_dim),
                                     jnp.float32) * 0.1)
        ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
        sh = cfg.flow_shift
        sig = sh * ts / (1 + (sh - 1) * ts)
        neg = str((p.extra_args or {}).get("negative_prompt", ""))
        return DreamIDState(
            vid=vid, aud=aud, ref_vid=ref_vid, ref_aud=ref_aud,
            vid_ctx=np.concatenate(
                [self._ctx(text, cfg.video, 16),
                 self._ctx(neg, cfg.video, 16)], axis=0),
            aud_ctx=np.concatenate(
                [self._ctx(text, cfg.audio, 16),
                 self._ctx(neg, cfg.audio, 16)], axis=0),
            timesteps=(sig[:-1] * cfg.num_train_timesteps).astype(
                np.float32),
            sigmas=sig.astype(np.float32))

    def denoise_step(self, state: DreamIDState) -> None:
        cfg = self.cfg
        i = state.step_index
        t = float(state.timesteps[i])
        # 4 branches: pos, text-neg, video-ref-neg, audio-ref-neg
        v_in = jnp.concatenate([state.vid, state.ref_vid], axis=1)
        v_refneg = jnp.concatenate(
            [state.vid, jnp.zeros_like(state.ref_vid)], axis=1)
        a_in = jnp.concatenate([state.aud, state.ref_aud], axis=1)
        a_refneg = jnp.concatenate(
            [state.aud, jnp.zeros_like(state.ref_aud)], axis=1)
        vids = jnp.concatenate([v_in, v_in, v_refneg, v_in], axis=0)
        auds = jnp.concatenate([a_in, a_in, a_in, a_refneg], axis=0)
        vctx = jnp.asarray(np.stack([state.vid_ctx[0],
                                     state.vid_ctx[1],
                                     state.vid_ctx[0],
                                     state.vid_ctx[0]]))
        actx = jnp.asarray(np.stack([state.aud_ctx[0],
                                     state.aud_ctx[1],
                                     state.aud_ctx[0],
                                     state.aud_ctx[0]]))
        fn = self._fn((vids.shape, auds.shape))
        tv = jnp.full((4,), t, jnp.float32)
        v_out, a_out = fn(self.params, vids, auds, tv, vctx, actx)
        nf = state.vid.shape[1]
        na = state.aud.shape[1]
        v_pred = combine_dreamid_cfg(
            v_out[0:1, :nf], v_out[1:2, :nf], v_out[2:3, :nf],
            cfg.video_cfg, cfg.video_ref_cfg)
        a_pred = combine_dreamid_cfg(
            a_out[0:1, :na], a_out[1:2, :na], a_out[3:4, :na],
            cfg.audio_cfg, cfg.audio_ref_cfg)
        dt = float(state.sigmas[i + 1] - state.sigmas[i])
        state.vid = state.vid + v_pred * dt
        state.aud = state.aud + a_pred * dt
        state.step_index += 1

    def post_decode(self, state: DreamIDState,
                    output_type: str = "np"):
        state.audio_latents = np.asarray(state.aud, np.float32)
        lat = np.asarray(state.vid, np.float32)
        if output_type == "latent":
            return lat
        # wan2.2 VAE decode rides the pipeline's loaded VAE when
        # present; standalone tier emits a normalized latent preview
        x = lat[..., :3]
        lo, hi = x.min(), x.max()
        img = (x - lo) / max(hi - lo, 1e-6)
        d = self.cfg.vae_downsample
        img = np.repeat(np.repeat(img, d, axis=2), d, axis=3)
        return np.clip(img, 0.0, 1.0)
