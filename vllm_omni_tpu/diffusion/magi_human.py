"""MAGI-Human: unified video+audio+text single-stream DiT (daVinci-
MagiHuman port).

Reference: /root/reference/vllm_omni/diffusion/models/magi_human/
(magi_human_dit.py — one packed token stream [video | audio | text]
with per-modality embedders (Adapter:931), element-wise Fourier rope
built from 9-dim coords (xyz + sizes + ref sizes; scales =
(ref−1)/(size−1), centered h/w axes — ElementWiseFourierEmbed:191),
per-modality RMS "expert" norms and stacked per-modality expert
linears on the mm_layers (MultiModalityRMSNorm:247, MoE linears
:337-505), fused QKV+gating projection with sigmoid head gating
(Attention:702), clamped swiglu7/gelu7 MLPs (:97-112), optional
frame-local attention ranges (calc_local_qk_range:1260), per-modality
final norm+linear heads (DiTModel:1094). The DiT takes NO timestep
input — noise level is implicit in x_t (pipeline_magi_human.py
_evaluate_with_latent:2016 passes only x_t/audio/text). The denoise
loop is 2-branch text CFG with a per-frame guidance ramp
(cfg_trick:2040-2044, t≤500 guidance drop :2052), shift-warped flow
schedule, first-frame image-latent clamp for i2v (:2049,:2099).

TPU mapping: the packed stream is modality-contiguous by construction
(_SingleData.token_sequence:1179 concatenates [video, audio, text]),
so the reference's permute/dispatch machinery reduces to STATIC
segment slices — each per-modality expert runs on its contiguous
slice, no gathers. Local attention becomes a dense mask (batch-1
serving). Euler flow stands in for UniPC (documented)."""

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

VIDEO, AUDIO, TEXT = 0, 1, 2


@dataclass
class MagiHumanConfig:
    num_layers: int = 40
    hidden_size: int = 5120
    head_dim: int = 128
    num_query_groups: int = 8
    video_latent_channels: int = 48
    patch_size: int = 2
    t_patch_size: int = 1
    audio_in_channels: int = 64
    text_in_channels: int = 3584
    mm_layers: tuple = (0, 1, 2, 3, 36, 37, 38, 39)
    local_attn_layers: tuple = ()
    gelu7_layers: tuple = (0, 1, 2, 3)
    post_norm_layers: tuple = ()
    enable_attn_gating: bool = True
    frame_receptive_field: int = -1
    num_train_timesteps: int = 1000
    flow_shift: float = 3.0
    vae_downsample: int = 8
    video_guidance: float = 5.0
    audio_guidance: float = 4.0

    @property
    def num_heads(self) -> int:
        return self.hidden_size // self.head_dim

    @property
    def video_in_channels(self) -> int:
        return (self.video_latent_channels * self.t_patch_size *
                self.patch_size * self.patch_size)

    @property
    def swiglu_inter(self) -> int:
        return int(self.hidden_size * 4 * 2 / 3) // 4 * 4

    @classmethod
    def from_json(cls, hf: dict) -> "MagiHumanConfig":
        d = hf.get("dit_config") or hf
        return cls(
            num_layers=d.get("num_layers", 40),
            hidden_size=d.get("hidden_size", 5120),
            head_dim=d.get("head_dim", 128),
            num_query_groups=d.get("num_query_groups", 8),
            video_latent_channels=d.get("video_latent_channels", 48),
            patch_size=d.get("patch_size", 2),
            t_patch_size=d.get("t_patch_size", 1),
            audio_in_channels=d.get("audio_in_channels", 64),
            text_in_channels=d.get("text_in_channels", 3584),
            mm_layers=tuple(d.get("mm_layers",
                                  (0, 1, 2, 3, 36, 37, 38, 39))),
            local_attn_layers=tuple(d.get("local_attn_layers", ())),
            gelu7_layers=tuple(d.get("gelu7_layers", (0, 1, 2, 3))),
            post_norm_layers=tuple(d.get("post_norm_layers", ())),
            enable_attn_gating=d.get("enable_attn_gating", True),
            frame_receptive_field=d.get("frame_receptive_field", -1),
            num_train_timesteps=hf.get("num_train_timesteps", 1000),
            flow_shift=hf.get("flow_shift", 3.0),
        )


def is_magi_human_dir(path: str) -> bool:
    cfg_path = os.path.join(str(path), "config.json")
    if not os.path.isfile(cfg_path):
        return False
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return False
    archs = cfg.get("architectures") or []
    return cfg.get("model_type") == "magi_human" or any(
        "MagiHuman" in a for a in archs)


# ---------------------------------------------------------------------------
# Fourier rope (ElementWiseFourierEmbed :191 + apply_rotary_emb :180)
# ---------------------------------------------------------------------------


def freq_bands(num_bands: int, temperature: float = 10000.0
               ) -> np.ndarray:
    """freq_bands(:164) with step=1."""
    exp = np.arange(num_bands, dtype=np.float32) / num_bands
    return (1.0 / temperature ** exp).astype(np.float32)


def build_coords(shape: tuple, ref_shape: tuple,
                 offset: tuple = (0, 0, 0)) -> np.ndarray:
    """_get_coords (pipeline:1115): [N, 9] = (t,h,w grid + offsets,
    sizes, ref sizes)."""
    t, h, w = shape
    tg, hg, wg = np.meshgrid(np.arange(t) + offset[0],
                             np.arange(h) + offset[1],
                             np.arange(w) + offset[2], indexing="ij")
    flat = np.stack([tg, hg, wg], axis=-1).reshape(-1, 3).astype(
        np.float32)
    meta = np.asarray([t, h, w, *ref_shape], np.float32)
    return np.concatenate(
        [flat, np.broadcast_to(meta, (flat.shape[0], 6))], axis=1)


def fourier_rope(coords: np.ndarray, head_dim: int) -> np.ndarray:
    """[N, 9] → rope table [N, 6·(hd//8)] = [sin | cos] flattened over
    (axis, band). scales = (ref−1)/(size−1) (1 when both are 1);
    centers subtracted on h/w only."""
    bands = freq_bands(head_dim // 8)
    xyz = coords[:, :3].astype(np.float64)
    sizes = coords[:, 3:6].astype(np.float64)
    refs = coords[:, 6:9].astype(np.float64)
    denom = np.where(sizes > 1, sizes - 1, 1.0)
    scales = (refs - 1) / denom
    scales = np.where((refs == 1) & (sizes == 1), 1.0, scales)
    centers = (sizes - 1) / 2
    centers[:, 0] = 0
    proj = (xyz - centers)[:, :, None] * scales[:, :, None] * \
        bands[None, None, :]
    return np.concatenate(
        [np.sin(proj), np.cos(proj)],
        axis=1).reshape(coords.shape[0], -1).astype(np.float32)


def apply_fourier_rope(x: jnp.ndarray, rope: jnp.ndarray
                      ) -> jnp.ndarray:
    """x [N, H, D]; rope [N, 6·D/8] → rotates the first 3D/4 dims
    NeoX-style (apply_rotary_emb_torch:180: cos/sin repeated as two
    concatenated halves)."""
    n, h, d = x.shape
    half = rope.shape[-1] // 2  # 3d/8
    sin = rope[:, :half]
    cos = rope[:, half:]
    ro = 2 * half  # 3d/4
    xf = x.astype(jnp.float32)
    xr = xf[..., :ro]
    x1, x2 = xr[..., :half], xr[..., half:]
    c = cos[:, None, :]
    s = sin[:, None, :]
    rot = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return jnp.concatenate([rot, xf[..., ro:]],
                           axis=-1).astype(x.dtype)


# ---------------------------------------------------------------------------
# per-modality expert helpers (static segment slices)
# ---------------------------------------------------------------------------


def _rms_w(x, w, eps=1e-6):
    """MultiModalityRMSNorm: rms(x) · (w + 1)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) *
            (w.astype(jnp.float32) + 1.0)).astype(x.dtype)


def _seg_apply(x, segs, fn):
    """Apply fn(x_seg, expert_idx) on the three contiguous modality
    segments [video | audio | text]. segs = (n_video, n_audio,
    n_text) static ints."""
    nv, na, nt = segs
    parts = []
    off = 0
    for i, n in enumerate((nv, na, nt)):
        parts.append(fn(x[off:off + n], i))
        off += n
    return jnp.concatenate(parts, axis=0)


def _expert_norm(x, w, segs, num_mod, eps=1e-6):
    if num_mod == 1:
        return _rms_w(x, w, eps)
    chunk = w.shape[0] // num_mod
    return _seg_apply(x, segs,
                      lambda v, i: _rms_w(v, w[i * chunk:(i + 1) *
                                            chunk], eps))


def _expert_linear(x, p, segs, num_mod):
    """p["w"]: single [in, out] or stacked [mod, in, out]."""
    if num_mod == 1:
        return linear(x, p)
    return _seg_apply(x, segs, lambda v, i: linear(v, {"w": p["w"][i]}))


def swiglu7(x: jnp.ndarray) -> jnp.ndarray:
    """(:97) interleaved [glu, linear] pairs, clamped at ±7."""
    xf = x.astype(jnp.float32)
    g = jnp.minimum(xf[..., ::2], 7.0)
    lin = jnp.clip(xf[..., 1::2], -7.0, 7.0)
    return (g * jax.nn.sigmoid(1.702 * g)) * (lin + 1.0)


def gelu7(x: jnp.ndarray) -> jnp.ndarray:
    xf = jnp.minimum(x.astype(jnp.float32), 7.0)
    return xf * jax.nn.sigmoid(1.702 * xf)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _layer(blk: Params, cfg: MagiHumanConfig, x: jnp.ndarray,
           rope: jnp.ndarray, segs: tuple, num_mod: int,
           use_gelu7: bool, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    nh, hkv, hd = cfg.num_heads, cfg.num_query_groups, cfg.head_dim
    h = _expert_norm(x, blk["attn_pre_norm"], segs, num_mod)
    qkv = _expert_linear(h, blk["linear_qkv"], segs, num_mod)
    q = qkv[:, :nh * hd].reshape(-1, nh, hd)
    k = qkv[:, nh * hd:(nh + hkv) * hd].reshape(-1, hkv, hd)
    v = qkv[:, (nh + hkv) * hd:(nh + 2 * hkv) * hd].reshape(-1, hkv,
                                                            hd)
    q = _expert_qknorm(q, blk["q_norm"], segs, num_mod)
    k = _expert_qknorm(k, blk["k_norm"], segs, num_mod)
    q = apply_fourier_rope(q, rope)
    k = apply_fourier_rope(k, rope)
    g = nh // hkv
    kr = jnp.repeat(k, g, axis=1)
    vr = jnp.repeat(v, g, axis=1)
    sc = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                    kr.astype(jnp.float32)) * (hd ** -0.5)
    if mask is not None:
        sc = jnp.where(mask[None], sc, -1e30)
    pr = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", pr.astype(vr.dtype), vr)
    if cfg.enable_attn_gating:
        gate = _expert_linear(h, blk["linear_gating"], segs, num_mod)
        o = o * jax.nn.sigmoid(gate.astype(jnp.float32)
                               )[:, :, None].astype(o.dtype)
    attn = _expert_linear(o.reshape(-1, nh * hd), blk["linear_proj"],
                          segs, num_mod)
    if "attn_post_norm" in blk:
        attn = _expert_norm(attn, blk["attn_post_norm"], segs, num_mod)
    x = x + attn
    h = _expert_norm(x, blk["mlp_pre_norm"], segs, num_mod)
    up = _expert_linear(h, blk["up_gate_proj"], segs, num_mod)
    act = gelu7(up) if use_gelu7 else swiglu7(up)
    m = _expert_linear(act.astype(x.dtype), blk["down_proj"], segs,
                       num_mod)
    if "mlp_post_norm" in blk:
        m = _expert_norm(m, blk["mlp_post_norm"], segs, num_mod)
    return x + m


def _expert_qknorm(x, w, segs, num_mod, eps=1e-6):
    """Head-dim RMS, per modality. x [N, H, D]."""
    if num_mod == 1:
        return _rms_w(x, w, eps)
    chunk = w.shape[0] // num_mod
    return _seg_apply(x, segs,
                      lambda v, i: _rms_w(v, w[i * chunk:(i + 1) *
                                            chunk], eps))


def local_attn_mask(n_video: int, n_at: int, num_frames: int,
                    receptive: int) -> np.ndarray:
    """calc_local_qk_range (:1260) as a dense mask: each frame's video
    Q sees video K within ±receptive frames; video Q sees all
    audio+text K; audio/text Q see everything."""
    total = n_video + n_at
    m = np.zeros((total, total), bool)
    tpf = n_video // num_frames
    for i in range(num_frames):
        q0, q1 = i * tpf, (i + 1) * tpf
        k0 = max((i - receptive) * tpf, 0)
        k1 = min((i + receptive + 1) * tpf, n_video)
        m[q0:q1, k0:k1] = True
    m[:n_video, n_video:] = True
    m[n_video:, :] = True
    return m


def magi_forward(params: Params, cfg: MagiHumanConfig,
                 video_tokens: jnp.ndarray, audio: jnp.ndarray,
                 text: jnp.ndarray, rope: jnp.ndarray,
                 num_frames: int) -> tuple:
    """video_tokens [Nv, video_in_channels] (pre-unfolded patches),
    audio [Na, Ca], text [Nt, Ct], rope [N, 6·hd/8] → (video velocity
    [Nv, Cv], audio velocity [Na, Ca])."""
    nv, na, nt = (video_tokens.shape[0], audio.shape[0],
                  text.shape[0])
    segs = (nv, na, nt)
    ad = params["adapter"]
    dtype = ad["video_embedder"]["w"].dtype
    x = jnp.concatenate([
        linear(video_tokens.astype(dtype), ad["video_embedder"]),
        linear(audio.astype(dtype), ad["audio_embedder"]),
        linear(text.astype(dtype), ad["text_embedder"])], axis=0)
    mask = None
    if cfg.frame_receptive_field >= 0 and num_frames > 0:
        mask = jnp.asarray(local_attn_mask(
            nv, na + nt, num_frames, cfg.frame_receptive_field))
    for idx, blk in enumerate(params["layers"]):
        num_mod = 3 if idx in cfg.mm_layers else 1
        use_mask = mask if idx in cfg.local_attn_layers else None
        x = _layer(blk, cfg, x, rope, segs, num_mod,
                   idx in cfg.gelu7_layers, use_mask)
    v = linear(_rms_w(x[:nv], params["final_norm_video"]),
               params["final_linear_video"])
    a = linear(_rms_w(x[nv:nv + na], params["final_norm_audio"]),
               params["final_linear_audio"])
    return v.astype(jnp.float32), a.astype(jnp.float32)


def pack_video(lat: jnp.ndarray, cfg: MagiHumanConfig) -> jnp.ndarray:
    """[F, H, W, C] → [Nv, C·pt·p·p] tokens; channel-FIRST per patch
    (img2tokens 3D-unfold col order (C, kD, kH, kW) :1220-1240)."""
    f, h, w, c = lat.shape
    pt, p = cfg.t_patch_size, cfg.patch_size
    x = lat.reshape(f // pt, pt, h // p, p, w // p, p, c)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5)
    return x.reshape((f // pt) * (h // p) * (w // p), c * pt * p * p)


def unpack_video(x: jnp.ndarray, f: int, h: int, w: int,
                 cfg: MagiHumanConfig) -> jnp.ndarray:
    pt, p = cfg.t_patch_size, cfg.patch_size
    c = cfg.video_latent_channels
    x = x.reshape(f // pt, h // p, w // p, c, pt, p, p)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3)
    return x.reshape(f, h, w, c)


def magi_coords(cfg: MagiHumanConfig, f_tok: int, h_tok: int,
                w_tok: int, n_audio: int, n_text: int) -> np.ndarray:
    """coords_style v2 (_SingleData.coords_mapping:1203): video grid
    with its own shape as refs; audio on the t axis with ref
    (⌈Na/4⌉/pt); text at negative offsets with ref (1,1,1)."""
    video = build_coords((f_tok, h_tok, w_tok),
                         (f_tok, h_tok, w_tok))
    audio_ref_t = max(((n_audio - 1) // 4 + 1) // cfg.t_patch_size, 1)
    audio = build_coords((n_audio, 1, 1), (audio_ref_t, 1, 1))
    text = build_coords((n_text, 1, 1), (1, 1, 1),
                        offset=(-n_text, 0, 0))
    return np.concatenate([video, audio, text], axis=0)


# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def init_magi_params(cfg: MagiHumanConfig, dtype=jnp.bfloat16
                     ) -> Params:
    hs, hd = cfg.hidden_size, cfg.head_dim
    nh, hkv = cfg.num_heads, cfg.num_query_groups
    qkvg = (nh + 2 * hkv) * hd + (nh if cfg.enable_attn_gating else 0)

    def lin(cin, cout, mod, bias=False):
        if mod == 1:
            p = {"w": jnp.zeros((cin, cout), dtype)}
        else:
            p = {"w": jnp.zeros((mod, cin, cout), dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def layer(idx):
        mod = 3 if idx in cfg.mm_layers else 1
        g7 = idx in cfg.gelu7_layers
        inter_up = (cfg.hidden_size * 4 if g7 else
                    cfg.swiglu_inter * 2)
        inter_down = cfg.hidden_size * 4 if g7 else cfg.swiglu_inter
        blk = {
            "attn_pre_norm": jnp.zeros((hs * mod,), jnp.float32),
            "linear_qkv": lin(hs, (nh + 2 * hkv) * hd, mod),
            "q_norm": jnp.zeros((hd * mod,), jnp.float32),
            "k_norm": jnp.zeros((hd * mod,), jnp.float32),
            "linear_proj": lin(nh * hd, hs, mod),
            "mlp_pre_norm": jnp.zeros((hs * mod,), jnp.float32),
            "up_gate_proj": lin(hs, inter_up, mod),
            "down_proj": lin(inter_down, hs, mod),
        }
        if cfg.enable_attn_gating:
            blk["linear_gating"] = lin(hs, nh, mod)
        if idx in cfg.post_norm_layers:
            blk["attn_post_norm"] = jnp.zeros((hs * mod,), jnp.float32)
            blk["mlp_post_norm"] = jnp.zeros((hs * mod,), jnp.float32)
        return blk

    del qkvg
    return {
        "adapter": {
            "video_embedder": {"w": jnp.zeros(
                (cfg.video_in_channels, hs), dtype),
                "b": jnp.zeros((hs,), dtype)},
            "audio_embedder": {"w": jnp.zeros(
                (cfg.audio_in_channels, hs), dtype),
                "b": jnp.zeros((hs,), dtype)},
            "text_embedder": {"w": jnp.zeros(
                (cfg.text_in_channels, hs), dtype),
                "b": jnp.zeros((hs,), dtype)},
        },
        "layers": [layer(i) for i in range(cfg.num_layers)],
        "final_norm_video": jnp.zeros((hs,), jnp.float32),
        "final_norm_audio": jnp.zeros((hs,), jnp.float32),
        "final_linear_video": {"w": jnp.zeros(
            (hs, cfg.video_in_channels), dtype)},
        "final_linear_audio": {"w": jnp.zeros(
            (hs, cfg.audio_in_channels), dtype)},
    }


def assign_magi_tensor(params: Params, cfg: MagiHumanConfig,
                       name: str, arr, dtype) -> bool:
    """Native DiT naming (DiTModel attrs; checkpoint stacks per-expert
    rows on dim 0 and fuses [Q,K,V,G] in linear_qkv —
    pipeline load_weights :1890-1988)."""
    a = np.asarray(arr)
    parts = name.split(".")
    if parts[0] == "dit":
        parts = parts[1:]
    nh, hkv, hd = cfg.num_heads, cfg.num_query_groups, cfg.head_dim
    if parts[0] == "adapter":
        if parts[1] == "rope":
            return True  # fixed bands (non-learnable)
        slot = params["adapter"].get(parts[1])
        if slot is None:
            return False
        if parts[-1] == "weight":
            slot["w"] = jnp.asarray(a.T, dtype)
        else:
            slot["b"] = jnp.asarray(a, dtype)
        return True
    if parts[0] in ("final_norm_video", "final_norm_audio"):
        params[parts[0]] = jnp.asarray(a, jnp.float32)
        return True
    if parts[0] in ("final_linear_video", "final_linear_audio"):
        params[parts[0]]["w"] = jnp.asarray(a.T, dtype)
        return True
    if parts[0] != "block" or parts[1] != "layers":
        return False
    idx = int(parts[2])
    blk = params["layers"][idx]
    mod = 3 if idx in cfg.mm_layers else 1
    rest = parts[3:]

    def put_stacked(key, w):
        """w rows stacked per expert on dim 0 → [mod, in, out]."""
        if mod == 1:
            blk[key]["w"] = jnp.asarray(w.T, dtype)
        else:
            per = w.shape[0] // mod
            blk[key]["w"] = jnp.asarray(
                np.stack([w[i * per:(i + 1) * per].T
                          for i in range(mod)]), dtype)
        return True

    if rest[0] == "attention":
        sub = rest[1]
        if sub == "pre_norm":
            blk["attn_pre_norm"] = jnp.asarray(a, jnp.float32)
            return True
        if sub in ("q_norm", "k_norm"):
            blk[sub] = jnp.asarray(a, jnp.float32)
            return True
        if sub == "linear_qkv":
            # per-expert chunks each [Q, K, V, G?]
            per = a.shape[0] // mod
            qkv_rows = (nh + 2 * hkv) * hd
            qkvs, gs = [], []
            for i in range(mod):
                chunk = a[i * per:(i + 1) * per]
                qkvs.append(chunk[:qkv_rows])
                if cfg.enable_attn_gating:
                    gs.append(chunk[qkv_rows:])
            if mod == 1:
                blk["linear_qkv"]["w"] = jnp.asarray(qkvs[0].T, dtype)
                if gs:
                    blk["linear_gating"]["w"] = jnp.asarray(
                        gs[0].T, dtype)
            else:
                blk["linear_qkv"]["w"] = jnp.asarray(
                    np.stack([q.T for q in qkvs]), dtype)
                if gs:
                    blk["linear_gating"]["w"] = jnp.asarray(
                        np.stack([g.T for g in gs]), dtype)
            return True
        if sub == "linear_proj":
            return put_stacked("linear_proj", a)
        if sub == "linear_gating":
            return put_stacked("linear_gating", a)
        return False
    if rest[0] == "mlp":
        sub = rest[1]
        if sub == "pre_norm":
            blk["mlp_pre_norm"] = jnp.asarray(a, jnp.float32)
            return True
        if sub in ("up_gate_proj", "down_proj"):
            return put_stacked(sub, a)
        return False
    if rest[0] in ("attn_post_norm", "mlp_post_norm"):
        blk[rest[0]] = jnp.asarray(a, jnp.float32)
        return True
    return False


def load_magi_human(path: str, dtype=jnp.bfloat16
                    ) -> tuple[MagiHumanConfig, Params]:
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import _collect_safetensor_files

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = MagiHumanConfig.from_json(hf)
    params = init_magi_params(cfg, dtype)
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                if assign_magi_tensor(params, cfg, name, arr, dtype):
                    loaded += 1
                elif not name.startswith(("vae.", "audio_vae.",
                                          "text_encoder.")):
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no magi_human tensors mapped from {path}")
    if skipped:
        logger.warning("magi_human: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("magi_human: %d tensors loaded (%d layers)", loaded,
                cfg.num_layers)
    return cfg, params


def magi_param_shardings(params: Params):
    """TP over "tp": column-shard qkv/up, row-shard proj/down (last
    axis of stacked expert weights is still out-features)."""
    from jax.sharding import PartitionSpec as P

    def layer_spec(blk):
        out = {}
        for k, v in blk.items():
            if k in ("linear_qkv", "up_gate_proj", "linear_gating"):
                nd = v["w"].ndim
                out[k] = {"w": P(*([None] * (nd - 1)), "tp")}
            elif k in ("linear_proj", "down_proj"):
                nd = v["w"].ndim
                out[k] = {"w": P(*([None] * (nd - 2)), "tp", None)}
            else:
                out[k] = jax.tree.map(lambda _: P(), v)
        return out

    specs = {k: jax.tree.map(lambda _: P(), v)
             for k, v in params.items() if k != "layers"}
    specs["layers"] = [layer_spec(b) for b in params["layers"]]
    return specs


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------


@dataclass
class MagiState:
    vid: Any             # [F, H, W, C] latent
    aud: Any             # [Na, Ca]
    text: Any            # [Nt, Ct]
    text_null: Any
    image_latent: Any    # [1, H, W, C] i2v first-frame clamp or None
    rope: Any
    sigmas: np.ndarray
    timesteps: np.ndarray
    num_frames: int
    step_index: int = 0
    audio_latents: Any = None

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @property
    def done(self) -> bool:
        return self.step_index >= self.num_steps


class MagiHumanRunner:
    """Joint AV denoise (pipeline _evaluate_with_latent:2016): 2-branch
    text CFG (guidance drops to 2.0 for t ≤ 500 in the base stage),
    first-frame image-latent clamp, Euler flow steps standing in for
    UniPC."""

    decode_via_vae = False

    def __init__(self, cfg: MagiHumanConfig, params: Params,
                 mesh=None) -> None:
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.tokenizer = None
        self._fns: dict = {}

    def _fn(self, key):
        fn = self._fns.get(key)
        if fn is None:
            nf = key[3]
            fn = jax.jit(lambda p, v, a, t, r: magi_forward(
                p, self.cfg, v, a, t, r, nf),
                static_argnames=())
            self._fns[key] = fn
        return fn

    def _text(self, text: str, n: int) -> np.ndarray:
        seed = abs(hash(("magi", text))) % (2 ** 31)
        rng = np.random.default_rng(seed)
        return rng.standard_normal(
            (n, self.cfg.text_in_channels)).astype(np.float32) * 0.02

    def prepare(self, req, num_steps: Optional[int] = None,
                seed: int = 0) -> MagiState:
        cfg = self.cfg
        p = req.params
        extra = p.extra_args or {}
        steps = num_steps or p.num_inference_steps or 8
        f = max(int(p.num_frames or 2), cfg.t_patch_size)
        hh = max(p.height // cfg.vae_downsample, cfg.patch_size)
        ww = max(p.width // cfg.vae_downsample, cfg.patch_size)
        na = int(extra.get("audio_frames", 8))
        ntext = int(extra.get("text_tokens", 8))
        text = str(req.prompt) if not isinstance(req.prompt, dict) \
            else str(req.prompt.get("text", ""))
        key = jax.random.PRNGKey(p.seed if p.seed is not None else seed)
        k1, k2 = jax.random.split(key)
        vid = jax.random.normal(
            k1, (f, hh, ww, cfg.video_latent_channels), jnp.float32)
        aud = jax.random.normal(k2, (na, cfg.audio_in_channels),
                                jnp.float32)
        img = extra.get("image_latent")
        image_latent = None if img is None else jnp.asarray(
            np.asarray(img, np.float32))
        coords = magi_coords(cfg, f // cfg.t_patch_size,
                             hh // cfg.patch_size,
                             ww // cfg.patch_size, na, ntext)
        rope = jnp.asarray(fourier_rope(coords, cfg.head_dim))
        ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
        sh = cfg.flow_shift
        sig = sh * ts / (1 + (sh - 1) * ts)
        return MagiState(
            vid=vid, aud=aud,
            text=jnp.asarray(self._text(text, ntext)),
            text_null=jnp.asarray(self._text("", ntext)),
            image_latent=image_latent, rope=rope,
            sigmas=sig.astype(np.float32),
            timesteps=(sig[:-1] * cfg.num_train_timesteps).astype(
                np.float32),
            num_frames=f // cfg.t_patch_size)

    def denoise_step(self, state: MagiState) -> None:
        cfg = self.cfg
        i = state.step_index
        t = float(state.timesteps[i])
        if state.image_latent is not None:
            state.vid = state.vid.at[:1].set(state.image_latent[:1])
        f, hh, ww, c = state.vid.shape
        vt = pack_video(state.vid, cfg)
        key = (vt.shape, state.aud.shape, state.text.shape,
               state.num_frames)
        fn = self._fn(key)
        v_c, a_c = fn(self.params, vt, state.aud, state.text,
                      state.rope)
        v_u, a_u = fn(self.params, vt, state.aud, state.text_null,
                      state.rope)
        vg = cfg.video_guidance if t > 500 else 2.0
        v = v_u + vg * (v_c - v_u)
        a = a_u + cfg.audio_guidance * (a_c - a_u)
        dt = float(state.sigmas[i + 1] - state.sigmas[i])
        state.vid = state.vid + unpack_video(v, f, hh, ww, cfg) * dt
        state.aud = state.aud + a * dt
        state.step_index += 1

    def post_decode(self, state: MagiState, output_type: str = "np"):
        state.audio_latents = np.asarray(state.aud,
                                         np.float32)[None]
        lat = np.asarray(state.vid, np.float32)[None]
        if output_type == "latent":
            return lat
        x = lat[..., :3]
        lo, hi = x.min(), x.max()
        img = (x - lo) / max(hi - lo, 1e-6)
        d = self.cfg.vae_downsample
        img = np.repeat(np.repeat(img, d, axis=2), d, axis=3)
        return np.clip(img, 0.0, 1.0)
