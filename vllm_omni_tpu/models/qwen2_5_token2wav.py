"""Qwen2.5-Omni token2wav: codec-conditioned flow-matching mel DiT +
anti-aliased BigVGAN.

Reference: /root/reference/vllm_omni/model_executor/models/
qwen2_5_omni/qwen2_5_omni_token2wav.py —
Qwen2_5OmniToken2WavDiTModel:1173: AdaLN-zero DiT over mel frames,
input = proj(cat[x, ECAPA(ref_mel), repeat-interleaved codec embed,
speaker x-vector]) (:385-416), rope applied to HEAD 0 ONLY with the
interleaved pair rotation (:492-530), per-layer block-diagonal
attention with ±1-block look-ahead/behind on configured layers
(:631-664, _create_block_diff:1207), CFG = guided + (guided − null)·
scale where the null branch zeroes speaker/reference conditioning and
drops the code embedding (:1295-1317), RK4 integration over the
sway-warped ascending schedule (:1087-1170, sample:1318-1336).
Qwen2_5OmniToken2WavBigVGANModel:993: mel → exp → dB → [-1,1]
normalize → conv_pre → per-stage transposed-conv upsample + averaged
AMP blocks with anti-aliased SnakeBeta (Kaiser-sinc 2× up/down
around the activation, :709-789) → conv_post → clamp.

The ECAPA speaker encoder inside the DiT input embedding is the same
geometry as models/speaker_encoder.py (qwen3_tts path) and is reused
directly."""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.models.speaker_encoder import (SpeakerEncoderConfig,
                                                  speaker_encode)

logger = init_logger(__name__)

Params = dict


@dataclass
class Token2WavDiTConfig:
    mel_dim: int = 80
    hidden_size: int = 1024
    num_layers: int = 22
    num_heads: int = 16
    head_dim: int = 64
    ff_mult: int = 2
    emb_dim: int = 512           # codec embedding width
    enc_dim: int = 128           # ECAPA output width
    enc_emb_dim: int = 192       # speaker x-vector width
    num_embeds: int = 8193
    repeats: int = 2
    block_size: int = 24
    look_ahead_layers: tuple = (10,)
    look_backward_layers: tuple = (0, 20)
    enc_channels: tuple = (256, 256, 256, 256, 768)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 64
    enc_res2net_scale: int = 4
    enc_se_channels: int = 64

    @classmethod
    def from_json(cls, d: dict) -> "Token2WavDiTConfig":
        return cls(
            mel_dim=d.get("mel_dim", 80),
            hidden_size=d.get("hidden_size", 1024),
            num_layers=d.get("num_hidden_layers", 22),
            num_heads=d.get("num_attention_heads", 16),
            head_dim=d.get("head_dim", 64),
            ff_mult=d.get("ff_mult", 2),
            emb_dim=d.get("emb_dim", 512),
            enc_dim=d.get("enc_dim", 128),
            enc_emb_dim=d.get("enc_emb_dim", 192),
            num_embeds=d.get("num_embeds", 8193),
            repeats=d.get("repeats", 2),
            block_size=d.get("block_size", 24),
            look_ahead_layers=tuple(d.get("look_ahead_layers", (10,))),
            look_backward_layers=tuple(d.get("look_backward_layers",
                                             (0, 20))),
            enc_channels=tuple(d.get("enc_channels",
                                     (256, 256, 256, 256, 768))),
            enc_kernel_sizes=tuple(d.get("enc_kernel_sizes",
                                         (5, 3, 3, 3, 1))),
            enc_dilations=tuple(d.get("enc_dilations",
                                      (1, 2, 3, 4, 1))),
            enc_attention_channels=d.get("enc_attention_channels", 64),
            enc_res2net_scale=d.get("enc_res2net_scale", 4),
            enc_se_channels=d.get("enc_se_channels", 64),
        )

    def spk_cfg(self) -> SpeakerEncoderConfig:
        return SpeakerEncoderConfig(
            mel_dim=self.mel_dim, enc_dim=self.enc_dim,
            enc_channels=tuple(self.enc_channels),
            enc_kernel_sizes=tuple(self.enc_kernel_sizes),
            enc_dilations=tuple(self.enc_dilations),
            enc_attention_channels=self.enc_attention_channels,
            enc_res2net_scale=self.enc_res2net_scale,
            enc_se_channels=self.enc_se_channels)


@dataclass
class BigVGANConfig:
    mel_dim: int = 80
    upsample_initial_channel: int = 1536
    upsample_rates: tuple = (5, 3, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (11, 7, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5),) * 3

    @classmethod
    def from_json(cls, d: dict) -> "BigVGANConfig":
        return cls(
            mel_dim=d.get("mel_dim", 80),
            upsample_initial_channel=d.get("upsample_initial_channel",
                                           1536),
            upsample_rates=tuple(d.get("upsample_rates",
                                       (5, 3, 2, 2, 2, 2))),
            upsample_kernel_sizes=tuple(d.get("upsample_kernel_sizes",
                                              (11, 7, 4, 4, 4, 4))),
            resblock_kernel_sizes=tuple(d.get("resblock_kernel_sizes",
                                              (3, 7, 11))),
            resblock_dilation_sizes=tuple(
                tuple(x) for x in d.get("resblock_dilation_sizes",
                                        ((1, 3, 5),) * 3)),
        )


def is_token2wav_config(hf: dict) -> bool:
    t2w = hf.get("token2wav_config") or {}
    return "dit_config" in t2w and "bigvgan_config" in t2w


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _gelu_tanh(x):
    return jax.nn.gelu(x.astype(jnp.float32),
                       approximate=True).astype(x.dtype)


def dit_time_embed(p: Params, t: jnp.ndarray,
                   freq_dim: int = 256) -> jnp.ndarray:
    """SinusPositionEmbedding (:602, scale=1000, exp spacing
    /(half−1)) → linear silu linear."""
    half = freq_dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) *
                    (-math.log(10000.0) / (half - 1)))
    args = 1000.0 * t.astype(jnp.float32)[:, None] * freqs[None]
    e = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    h = linear(e.astype(p["l1"]["w"].dtype), p["l1"])
    return linear(jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype),
                  p["l2"])


def _rope_interleaved(n: int, d: int) -> tuple:
    """Qwen2_5OmniDiTRotaryEmbedding (:57): freqs duplicated
    INTERLEAVED ((f, f) stacked on the last axis)."""
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2, np.float64) / d))
    f = np.arange(n, dtype=np.float64)[:, None] * inv[None]
    f = np.stack([f, f], axis=-1).reshape(n, d)
    return (jnp.asarray(np.cos(f), jnp.float32),
            jnp.asarray(np.sin(f), jnp.float32))


def _apply_rope_head0(q, cos, sin):
    """[B, T, H, D]: rope on head 0 only (:578-580 'only first head is
    applied with RoPE'), interleaved pair rotation (:492-530)."""
    q0 = q[:, :, 0].astype(jnp.float32)
    x = q0.reshape(*q0.shape[:-1], -1, 2)
    rot = jnp.stack([-x[..., 1], x[..., 0]],
                    axis=-1).reshape(q0.shape)
    q0 = q0 * cos[None] + rot * sin[None]
    return q.at[:, :, 0].set(q0.astype(q.dtype))


def dit_forward(params: Params, cfg: Token2WavDiTConfig,
                x: jnp.ndarray, ref_mel: jnp.ndarray,
                spk: jnp.ndarray, code: jnp.ndarray, t: jnp.ndarray,
                drop_cond: bool = False) -> jnp.ndarray:
    """One branch (apply_cfg handled by the caller): x [B, T, mel],
    ref_mel [B, Tref, mel], spk [B, T, enc_emb_dim] (already
    repeated), code [B, Tc], t [B] → mel velocity [B, T, mel].
    drop_cond zeroes ref/spk and the code ids (the CFG null
    branch)."""
    b, tt, _ = x.shape
    dtype = params["input_proj"]["w"].dtype
    if drop_cond:
        ref_mel = jnp.zeros_like(ref_mel)
        spk = jnp.zeros_like(spk)
        code = jnp.zeros_like(code)
    ce = jnp.take(params["codec_embed"], code, axis=0)
    ce = jnp.repeat(ce, cfg.repeats, axis=1)
    cond = speaker_encode(params["spk_encoder"], cfg.spk_cfg(),
                          ref_mel.astype(jnp.float32))
    cond = jnp.broadcast_to(cond[:, None].astype(dtype),
                            (b, tt, cond.shape[-1]))
    h = linear(jnp.concatenate(
        [x.astype(dtype), cond, ce.astype(dtype), spk.astype(dtype)],
        axis=-1), params["input_proj"])
    temb = dit_time_embed(params["time_embed"], t)
    cos, sin = _rope_interleaved(tt, cfg.head_dim)
    blocks = np.arange(tt) // cfg.block_size
    diff = blocks[None, :] - blocks[:, None]
    nh, hd = cfg.num_heads, cfg.head_dim
    c_silu = jax.nn.silu(temb.astype(jnp.float32)).astype(dtype)
    for i, layer in enumerate(params["layers"]):
        ahead = 1 if i in cfg.look_ahead_layers else 0
        back = 1 if i in cfg.look_backward_layers else 0
        mask = jnp.asarray((diff >= -back) & (diff <= ahead))
        ada = linear(c_silu, layer["attn_norm"]).reshape(
            b, 6, cfg.hidden_size)
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = [ada[:, j][:, None]
                                            for j in range(6)]
        norm = _ln(h) * (1 + sc_m) + sh_m
        qkv = linear(norm, layer["qkv"])
        q = qkv[..., :nh * hd].reshape(b, tt, nh, hd)
        k = qkv[..., nh * hd:2 * nh * hd].reshape(b, tt, nh, hd)
        v = qkv[..., 2 * nh * hd:].reshape(b, tt, nh, hd)
        q = _apply_rope_head0(q, cos, sin)
        k = _apply_rope_head0(k, cos, sin)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
        sc = jnp.where(mask[None, None], sc, -jnp.inf)
        pr = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(v.dtype),
                       v).reshape(b, tt, nh * hd)
        h = h + g_m * linear(o, layer["to_out"])
        norm = _ln(h) * (1 + sc_f) + sh_f
        ff = linear(_gelu_tanh(linear(norm, layer["ff1"])),
                    layer["ff2"])
        h = h + g_f * ff
    ada = linear(c_silu, params["norm_out"]).reshape(
        b, 2, cfg.hidden_size)
    h = _ln(h) * (1 + ada[:, 0][:, None]) + ada[:, 1][:, None]
    return linear(h, params["proj_out"]).astype(jnp.float32)


def dit_velocity(params, cfg, x, ref_mel, spk, code, t,
                 guidance_scale: float):
    """CFG combine (:1315-1317): guided + (guided − null)·scale."""
    g = dit_forward(params, cfg, x, ref_mel, spk, code, t)
    if guidance_scale < 1e-5:
        return g
    n = dit_forward(params, cfg, x, ref_mel, spk, code, t,
                    drop_cond=True)
    return g + (g - n) * guidance_scale


def sway_times(num_steps: int, coef: float = -1.0) -> np.ndarray:
    t = np.linspace(0.0, 1.0, num_steps, dtype=np.float64)
    if coef is not None:
        t = t + coef * (np.cos(np.pi / 2 * t) - 1 + t)
    return t.astype(np.float32)


def rk4_integrate(fn, y0, times: np.ndarray):
    """RungeKutta4ODESolver (:1087): 3/8-rule RK4 over the given time
    grid; returns the final state."""
    y = y0
    for t0, t1 in zip(times[:-1], times[1:]):
        dt = float(t1 - t0)
        k1 = fn(float(t0), y)
        k2 = fn(float(t0) + dt / 3, y + dt * k1 / 3)
        k3 = fn(float(t0) + 2 * dt / 3, y + dt * (k2 - k1 / 3))
        k4 = fn(float(t1), y + dt * (k1 - k2 + k3))
        y = y + (k1 + 3 * (k2 + k3) + k4) * dt / 8
    return y


def dit_sample(params: Params, cfg: Token2WavDiTConfig,
               code: np.ndarray, ref_mel: np.ndarray,
               spk: np.ndarray, num_steps: int = 10,
               guidance_scale: float = 0.5,
               sway_coefficient: float = -1.0,
               seed: int = 0) -> np.ndarray:
    """sample (:1264): code [1, Tc] → mel [1, Tc·repeats, mel_dim]."""
    tgt = code.shape[1] * cfg.repeats
    y0 = jax.random.normal(jax.random.PRNGKey(seed),
                           (1, tgt, cfg.mel_dim), jnp.float32)
    spk_rep = jnp.broadcast_to(
        jnp.asarray(spk, jnp.float32).reshape(1, 1, -1),
        (1, tgt, spk.reshape(-1).shape[0]))
    ref = jnp.asarray(ref_mel, jnp.float32)
    code_j = jnp.asarray(code, jnp.int32)
    fn = jax.jit(lambda t, y: dit_velocity(
        params, cfg, y, ref, spk_rep, code_j,
        jnp.full((1,), t, jnp.float32), guidance_scale))

    def f(t, y):
        return fn(jnp.float32(t), y)

    mel = rk4_integrate(f, y0, sway_times(num_steps,
                                          sway_coefficient))
    return np.asarray(mel, np.float32)


# ---------------------------------------------------------------------------
# BigVGAN
# ---------------------------------------------------------------------------


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """(:710-765) — numpy port (identical windows/taps)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    win = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros((kernel_size,), np.float32)
    filt = 2 * cutoff * win * np.sinc(2 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _pad_replicate(x, left, right):
    return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")


def _depthwise_conv(x, filt, stride):
    """x [B, T, C], filt [K] applied per channel."""
    c = x.shape[-1]
    w = jnp.broadcast_to(jnp.asarray(filt)[:, None, None],
                         (filt.shape[0], 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))


def _depthwise_transconv(x, filt, stride):
    """Per-channel transposed conv via input dilation (the filter is
    symmetric, so correlation == convolution)."""
    c = x.shape[-1]
    k = filt.shape[0]
    w = jnp.broadcast_to(jnp.asarray(filt)[:, None, None], (k, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,), feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))


def snake_beta_aa(x: jnp.ndarray, alpha: jnp.ndarray,
                  beta: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """TorchActivation1d(SnakeBeta) (:880-901): 2× Kaiser-sinc
    upsample → exp-parameterized SnakeBeta (:666-706) → 2×
    downsample. x [B, T, C]."""
    up_k = int(6 * ratio // 2) * 2
    up_pad = up_k // ratio - 1
    up_pad_left = up_pad * ratio + (up_k - ratio) // 2
    up_pad_right = up_pad * ratio + (up_k - ratio + 1) // 2
    f_up = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, up_k)
    h = _pad_replicate(x.astype(jnp.float32), up_pad, up_pad)
    h = ratio * _depthwise_transconv(h, f_up, ratio)
    h = h[:, up_pad_left:h.shape[1] - up_pad_right]
    a = jnp.exp(alpha.astype(jnp.float32))[None, None]
    bb = jnp.exp(beta.astype(jnp.float32))[None, None]
    h = h + (1.0 / (bb + 1e-9)) * jnp.sin(h * a) ** 2
    down_k = up_k
    even = down_k % 2 == 0
    d_left = down_k // 2 - int(even)
    d_right = down_k // 2
    f_dn = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, down_k)
    h = _pad_replicate(h, d_left, d_right)
    return _depthwise_conv(h, f_dn, ratio).astype(x.dtype)


def _conv1d(x, p, stride=1, dilation=1, pad=0):
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, p["w"], window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def process_mel(mel: jnp.ndarray) -> jnp.ndarray:
    """(:1046-1066): exp → dB (floor −115) − 20 → [-1, 1]."""
    amp = jnp.exp(mel.astype(jnp.float32))
    min_level = math.exp(-115 / 20.0 * math.log(10))
    db = 20.0 * jnp.log10(jnp.maximum(amp, min_level)) - 20.0
    return jnp.clip(2.0 * ((db + 115.0) / 115.0) - 1.0, -1.0, 1.0)


def bigvgan_forward(params: Params, cfg: BigVGANConfig,
                    mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, mel_dim] → waveform [B, T·prod(rates)]."""
    x = process_mel(mel)
    x = _conv1d(x, params["conv_pre"], pad=3)
    n_res = len(cfg.resblock_kernel_sizes)
    for li, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                         cfg.upsample_kernel_sizes)):
        up = params["ups"][li]
        pad = (ksz - rate) // 2
        out = jax.lax.conv_transpose(
            x, up["w"], strides=(rate,), padding="VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            transpose_kernel=True)
        out = out + up["b"]
        # torch ConvTranspose1d(padding=p) crops p from BOTH ends
        x = out[:, pad:out.shape[1] - pad]
        acc = None
        for bi in range(n_res):
            rb = params["resblocks"][li * n_res + bi]
            h = x
            for ci in range(len(rb["convs1"])):
                r = h
                h = snake_beta_aa(h, rb["acts"][2 * ci]["alpha"],
                                  rb["acts"][2 * ci]["beta"])
                c1 = rb["convs1"][ci]
                h = _conv1d(h, c1, dilation=c1["dilation"],
                            pad=c1["pad"])
                h = snake_beta_aa(h, rb["acts"][2 * ci + 1]["alpha"],
                                  rb["acts"][2 * ci + 1]["beta"])
                c2 = rb["convs2"][ci]
                h = _conv1d(h, c2, pad=c2["pad"])
                h = r + h
            acc = h if acc is None else acc + h
        x = acc / n_res
    x = snake_beta_aa(x, params["act_post"]["alpha"],
                      params["act_post"]["beta"])
    x = _conv1d(x, params["conv_post"], pad=3)
    return jnp.clip(x.astype(jnp.float32), -1.0, 1.0)[..., 0]


# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def _lin_init(cin, cout, dtype, bias=True):
    p = {"w": jnp.zeros((cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_dit_params(cfg: Token2WavDiTConfig,
                    dtype=jnp.float32) -> Params:
    from vllm_omni_tpu.models.speaker_encoder import (
        init_speaker_encoder_params)

    hs, hd, nh = cfg.hidden_size, cfg.head_dim, cfg.num_heads
    inner = int(hs * cfg.ff_mult)

    def layer():
        return {
            "attn_norm": _lin_init(hs, 6 * hs, dtype),
            "qkv": _lin_init(hs, 3 * nh * hd, dtype),
            "to_out": _lin_init(nh * hd, hs, dtype),
            "ff1": _lin_init(hs, inner, dtype),
            "ff2": _lin_init(inner, hs, dtype),
        }

    return {
        "time_embed": {"l1": _lin_init(256, hs, dtype),
                       "l2": _lin_init(hs, hs, dtype)},
        "codec_embed": jnp.zeros((cfg.num_embeds + 1, cfg.emb_dim),
                                 dtype),
        "input_proj": _lin_init(
            cfg.mel_dim + cfg.enc_dim + cfg.enc_emb_dim + cfg.emb_dim,
            hs, dtype),
        "spk_encoder": init_speaker_encoder_params(cfg.spk_cfg(),
                                                   dtype=jnp.float32),
        "layers": [layer() for _ in range(cfg.num_layers)],
        "norm_out": _lin_init(hs, 2 * hs, dtype),
        "proj_out": _lin_init(hs, cfg.mel_dim, dtype),
    }


def init_bigvgan_params(cfg: BigVGANConfig,
                        dtype=jnp.float32) -> Params:
    uic = cfg.upsample_initial_channel

    def conv(cin, cout, k, bias=True, dilation=1):
        p = {"w": jnp.zeros((k, cin, cout), dtype),
             "dilation": dilation,
             "pad": (k * dilation - dilation) // 2}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    ups, resblocks = [], []
    for li, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                         cfg.upsample_kernel_sizes)):
        cin = uic // (2 ** li)
        cout = uic // (2 ** (li + 1))
        ups.append({"w": jnp.zeros((ksz, cout, cin), dtype),
                    "b": jnp.zeros((cout,), dtype)})
        for k, dil in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilation_sizes):
            rb = {"convs1": [conv(cout, cout, k, dilation=d)
                             for d in dil],
                  "convs2": [conv(cout, cout, k) for _ in dil],
                  "acts": [{"alpha": jnp.zeros((cout,), dtype),
                            "beta": jnp.zeros((cout,), dtype)}
                           for _ in range(2 * len(dil))]}
            resblocks.append(rb)
    tail = uic // (2 ** len(cfg.upsample_rates))
    return {
        "conv_pre": {"w": jnp.zeros((7, cfg.mel_dim, uic), dtype),
                     "b": jnp.zeros((uic,), dtype)},
        "ups": ups,
        "resblocks": resblocks,
        "act_post": {"alpha": jnp.zeros((tail,), dtype),
                     "beta": jnp.zeros((tail,), dtype)},
        "conv_post": {"w": jnp.zeros((7, tail, 1), dtype)},
    }


def assign_token2wav_tensor(dit: Params, vgan: Params,
                            cfg: Token2WavDiTConfig, name: str, arr,
                            dtype=jnp.float32) -> bool:
    """HF naming: [token2wav.]code2wav_dit_model.* /
    [token2wav.]code2wav_bigvgan_model.* (reference load_weights
    :1410+: to_q/k/v fuse into qkv_proj; our layout keeps the fused
    [q|k|v] columns)."""
    a = np.asarray(arr)
    parts = name.split(".")
    if parts[0] == "token2wav":
        parts = parts[1:]
    if not parts:
        return False

    def put(slot, transpose=True):
        if parts[-1] == "weight":
            slot["w"] = jnp.asarray(a.T if transpose else a, dtype)
        else:
            slot["b"] = jnp.asarray(a, dtype)
        return True

    if parts[0] == "code2wav_dit_model":
        sub = parts[1:]
        if sub[0] == "time_embed":
            # time_mlp ModuleList [Linear, SiLU, Linear] → 0 / 2
            idx = {"0": "l1", "2": "l2"}.get(sub[2])
            if idx is None:
                return sub[1] == "time_embed"  # sinus: no params
            return put(dit["time_embed"][idx])
        if sub[0] == "text_embed" and sub[1] == "codec_embed":
            dit["codec_embed"] = jnp.asarray(a, dtype)
            return True
        if sub[0] == "input_embed":
            if sub[1] == "proj":
                return put(dit["input_proj"])
            if sub[1] == "spk_encoder":
                from vllm_omni_tpu.models.speaker_encoder import (
                    assign_speaker_tensor)

                return assign_speaker_tensor(
                    dit["spk_encoder"], ".".join(sub[2:]), a)
            return False
        if sub[0] == "rotary_embed":
            return True  # fixed inv_freq
        if sub[0] == "transformer_blocks":
            layer = dit["layers"][int(sub[1])]
            mod = sub[2]
            if mod == "attn_norm" and sub[3] == "linear":
                return put(layer["attn_norm"])
            if mod == "attn":
                if sub[3] == "qkv_proj":
                    return put(layer["qkv"])
                if sub[3] == "to_out" and sub[4] == "0":
                    return put(layer["to_out"])
                return False
            if mod == "ff":
                idx = {"0": "ff1", "3": "ff2"}.get(sub[4])
                if idx is None:
                    return False
                return put(layer[idx])
            return False
        if sub[0] == "norm_out" and sub[1] == "linear":
            return put(dit["norm_out"])
        if sub[0] == "proj_out":
            return put(dit["proj_out"])
        return False
    if parts[0] == "code2wav_bigvgan_model":
        sub = parts[1:]
        if sub[0] == "conv_pre":
            # torch conv [O, I, K] → [K, I, O]
            if parts[-1] == "weight":
                vgan["conv_pre"]["w"] = jnp.asarray(
                    a.transpose(2, 1, 0), dtype)
            else:
                vgan["conv_pre"]["b"] = jnp.asarray(a, dtype)
            return True
        if sub[0] == "conv_post" and parts[-1] == "weight":
            vgan["conv_post"]["w"] = jnp.asarray(
                a.transpose(2, 1, 0), dtype)
            return True
        if sub[0] == "activation_post" and sub[1] == "act":
            vgan["act_post"][sub[2]] = jnp.asarray(a, dtype)
            return True
        if sub[0] == "ups":
            up = vgan["ups"][int(sub[1])]
            if parts[-1] == "weight":  # ConvTranspose1d [I, O, K]
                up["w"] = jnp.asarray(a.transpose(2, 1, 0), dtype)
            else:
                up["b"] = jnp.asarray(a, dtype)
            return True
        if sub[0] == "resblocks":
            rb = vgan["resblocks"][int(sub[1])]
            kind = sub[2]
            if kind in ("convs1", "convs2"):
                slot = rb[kind][int(sub[3])]
                if parts[-1] == "weight":
                    slot["w"] = jnp.asarray(a.transpose(2, 1, 0),
                                            dtype)
                else:
                    slot["b"] = jnp.asarray(a, dtype)
                return True
            if kind == "activations" and sub[3].isdigit():
                # activations.N.act.{alpha,beta}
                rb["acts"][int(sub[3])][sub[-1]] = jnp.asarray(a,
                                                              dtype)
                return True
            return False
        return False
    return False


def load_token2wav(path: str, dtype=jnp.float32) -> dict:
    """→ {"dit": (cfg, params), "bigvgan": (cfg, params)} from an HF
    Qwen2.5-Omni checkpoint dir (token2wav_config in config.json)."""
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import _collect_safetensor_files

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    t2w = hf.get("token2wav_config") or {}
    dit_cfg = Token2WavDiTConfig.from_json(t2w.get("dit_config") or {})
    vg_cfg = BigVGANConfig.from_json(t2w.get("bigvgan_config") or {})
    dit = init_dit_params(dit_cfg, dtype)
    vgan = init_bigvgan_params(vg_cfg, dtype)
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                if "code2wav" not in name:
                    continue
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                if assign_token2wav_tensor(dit, vgan, dit_cfg, name,
                                           arr, dtype):
                    loaded += 1
                else:
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no token2wav tensors mapped from {path}")
    if skipped:
        logger.warning("token2wav: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("qwen2_5 token2wav: %d tensors loaded", loaded)
    return {"dit": (dit_cfg, dit), "bigvgan": (vg_cfg, vgan)}


def token2wav_generate(bundle: dict, code: np.ndarray,
                       ref_mel: np.ndarray, spk: np.ndarray,
                       num_steps: int = 10,
                       guidance_scale: float = 0.5,
                       seed: int = 0) -> np.ndarray:
    """codec ids → waveform (the token2wav stage's whole job)."""
    dit_cfg, dit = bundle["dit"]
    vg_cfg, vgan = bundle["bigvgan"]
    mel = dit_sample(dit, dit_cfg, code, ref_mel, spk,
                     num_steps=num_steps,
                     guidance_scale=guidance_scale, seed=seed)
    wav = bigvgan_forward(vgan, vg_cfg, jnp.asarray(mel))
    return np.asarray(wav, np.float32)
