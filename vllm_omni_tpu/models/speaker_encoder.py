"""ECAPA-TDNN speaker encoder + mel frontend (Qwen3-TTS Base voice
cloning).

Reference: qwen3_tts_talker.py:61-246 (TimeDelayNet / Res2Net /
Squeeze-Excitation blocks, attentive statistics pooling) and the
mel_spectrogram frontend :250-299 (librosa-style slaney filterbank via
utils/audio.py mel_filter_bank, hann STFT with reflect padding,
log dynamic-range compression).

All convs are 1D with torch "same" REFLECT padding; tensors run NLC
([B, T, C]) so channels sit on the 128-lane axis. The whole encoder is
one jittable function over a param pytree; the mel frontend is pure
numpy (host-side preprocessing of a reference clip, once per voice —
the reference caches the resulting embedding, voice_cache.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

Params = dict


@dataclass
class SpeakerEncoderConfig:
    mel_dim: int = 80
    enc_dim: int = 192
    enc_channels: tuple = (512, 512, 512, 512, 1536)
    enc_kernel_sizes: tuple = (5, 3, 3, 3, 1)
    enc_dilations: tuple = (1, 2, 3, 4, 1)
    enc_attention_channels: int = 128
    enc_res2net_scale: int = 8
    enc_se_channels: int = 128
    sample_rate: int = 16000

    @classmethod
    def from_json(cls, cfg: dict) -> "SpeakerEncoderConfig":
        keep = set(cls.__dataclass_fields__)
        out = {k: v for k, v in cfg.items() if k in keep}
        for k in ("enc_channels", "enc_kernel_sizes", "enc_dilations"):
            if k in out:
                out[k] = tuple(out[k])
        return cls(**out)


# ---------------------------------------------------------------------------
# mel frontend (host-side numpy; reference mel_spectrogram :250)
# ---------------------------------------------------------------------------


def slaney_mel_fbank(sr: int, n_fft: int, n_mels: int,
                     fmin: float = 0.0,
                     fmax: Optional[float] = None) -> np.ndarray:
    """librosa-default (slaney scale + slaney area norm) mel filterbank
    [n_mels, n_fft//2 + 1]."""
    if fmax is None:
        fmax = sr / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3.0)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) /
            (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3.0)
        log_region = m >= 15.0
        f = np.where(log_region,
                     1000.0 * np.exp((np.log(6.4) / 27.0) *
                                     (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    freqs = np.linspace(0, sr / 2.0, n_fft // 2 + 1)
    fb = np.zeros((n_mels, freqs.shape[0]), np.float64)
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # slaney area norm
    return fb.astype(np.float32)


def mel_spectrogram_np(y: np.ndarray, n_fft: int, num_mels: int,
                       sampling_rate: int, hop_size: int,
                       win_size: int, fmin: float = 0.0,
                       fmax: Optional[float] = None) -> np.ndarray:
    """[T] waveform in [−1, 1] → log-mel [n_mels, frames] (reference
    mel_spectrogram: reflect pad (n_fft − hop)//2, hann window,
    center=False, |STFT| with +1e-9 floor, log(clamp(x, 1e-5)))."""
    pad = (n_fft - hop_size) // 2
    y = np.pad(np.asarray(y, np.float64), (pad, pad), mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop_size
    idx = (np.arange(n_fft)[None, :] +
           hop_size * np.arange(n_frames)[:, None])
    frames = y[idx] * np.hanning(win_size + 1)[:-1]  # torch hann
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    mag = np.sqrt(np.abs(spec) ** 2 + 1e-9).T  # [F, frames]
    fb = slaney_mel_fbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    mel = fb.astype(np.float64) @ mag
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


# ---------------------------------------------------------------------------
# ECAPA blocks ([B, T, C])
# ---------------------------------------------------------------------------


def _conv1d_same_reflect(x: jnp.ndarray, p: Params, kernel: int,
                         dilation: int = 1) -> jnp.ndarray:
    """torch Conv1d(padding="same", padding_mode="reflect")."""
    total = (kernel - 1) * dilation
    left = total // 2
    xf = x.astype(jnp.float32)
    if total:
        xf = jnp.pad(xf, ((0, 0), (left, total - left), (0, 0)),
                     mode="reflect")
    out = jax.lax.conv_general_dilated(
        xf, p["w"].astype(jnp.float32), (1,), "VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"))
    if "b" in p:
        out = out + p["b"].astype(jnp.float32)
    return out.astype(x.dtype)


def _tdnn(x, p, kernel, dilation):
    return jax.nn.relu(
        _conv1d_same_reflect(x, p, kernel, dilation)
        .astype(jnp.float32)).astype(x.dtype)


def _res2net(x, p, scale, kernel, dilation):
    parts = jnp.split(x, scale, axis=-1)
    outs = [parts[0]]
    prev = None
    for i in range(1, scale):
        inp = parts[i] if i == 1 else parts[i] + prev
        prev = _tdnn(inp, p["blocks"][i - 1], kernel, dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=-1)


def _se_block(x, p):
    m = x.astype(jnp.float32).mean(axis=1, keepdims=True)
    m = jax.nn.relu(_conv1d_same_reflect(m, p["conv1"], 1)
                    .astype(jnp.float32))
    m = jax.nn.sigmoid(_conv1d_same_reflect(
        m.astype(x.dtype), p["conv2"], 1).astype(jnp.float32))
    return (x.astype(jnp.float32) * m).astype(x.dtype)


def _se_res2net(x, p, scale, se_ch, kernel, dilation):
    res = x
    h = _tdnn(x, p["tdnn1"], 1, 1)
    h = _res2net(h, p["res2net"], scale, kernel, dilation)
    h = _tdnn(h, p["tdnn2"], 1, 1)
    h = _se_block(h, p["se"])
    return h + res


def _asp(x, p):
    """Attentive statistics pooling → [B, 2C] (mean ‖ std)."""
    xf = x.astype(jnp.float32)
    t = xf.shape[1]
    mean = xf.mean(axis=1, keepdims=True)
    std = jnp.sqrt(jnp.clip(((xf - mean) ** 2).mean(axis=1,
                                                    keepdims=True),
                            1e-12, None))
    attn_in = jnp.concatenate(
        [xf, jnp.broadcast_to(mean, xf.shape),
         jnp.broadcast_to(std, xf.shape)], axis=-1).astype(x.dtype)
    a = _tdnn(attn_in, p["tdnn"], 1, 1)
    a = jnp.tanh(a.astype(jnp.float32)).astype(x.dtype)
    a = _conv1d_same_reflect(a, p["conv"], 1).astype(jnp.float32)
    a = jax.nn.softmax(a, axis=1)
    mean = (a * xf).sum(axis=1)
    std = jnp.sqrt(jnp.clip((a * (xf - mean[:, None]) ** 2).sum(axis=1),
                            1e-12, None))
    del t
    return jnp.concatenate([mean, std], axis=-1).astype(x.dtype)


def speaker_encode(params: Params, cfg: SpeakerEncoderConfig,
                   mels: jnp.ndarray) -> jnp.ndarray:
    """log-mel [B, T, mel_dim] → speaker embedding [B, enc_dim]
    (reference Qwen3TTSSpeakerEncoder.forward: TDNN, 3 SE-Res2Net
    blocks whose outputs concatenate into the MFA layer, attentive
    stats pooling, 1×1 fc)."""
    ch = cfg.enc_channels
    x = _tdnn(mels, params["blocks"][0], cfg.enc_kernel_sizes[0],
              cfg.enc_dilations[0])
    feats = []
    for i in range(1, len(ch) - 1):
        x = _se_res2net(x, params["blocks"][i], cfg.enc_res2net_scale,
                        cfg.enc_se_channels, cfg.enc_kernel_sizes[i],
                        cfg.enc_dilations[i])
        feats.append(x)
    x = jnp.concatenate(feats, axis=-1)
    x = _tdnn(x, params["mfa"], cfg.enc_kernel_sizes[-1],
              cfg.enc_dilations[-1])
    x = _asp(x, params["asp"])
    x = _conv1d_same_reflect(x[:, None], params["fc"], 1)[:, 0]
    return x


# ---------------------------------------------------------------------------
# params init + tensor mapping (speaker_encoder.* names)
# ---------------------------------------------------------------------------


def init_speaker_encoder_params(cfg: SpeakerEncoderConfig,
                                dtype=jnp.float32) -> Params:
    ch = cfg.enc_channels

    def conv(cin, cout, k):
        return {"w": jnp.zeros((k, cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def res2(cio, k):
        n = cio // cfg.enc_res2net_scale
        return {"blocks": [conv(n, n, k)
                           for _ in range(cfg.enc_res2net_scale - 1)]}

    blocks: list = [conv(cfg.mel_dim, ch[0], cfg.enc_kernel_sizes[0])]
    for i in range(1, len(ch) - 1):
        blocks.append({
            "tdnn1": conv(ch[i - 1], ch[i], 1),
            "res2net": res2(ch[i], cfg.enc_kernel_sizes[i]),
            "tdnn2": conv(ch[i], ch[i], 1),
            "se": {"conv1": conv(ch[i], cfg.enc_se_channels, 1),
                   "conv2": conv(cfg.enc_se_channels, ch[i], 1)},
        })
    cat_ch = sum(ch[1:-1])
    return {
        "blocks": blocks,
        "mfa": conv(cat_ch, ch[-1], cfg.enc_kernel_sizes[-1]),
        "asp": {"tdnn": conv(ch[-1] * 3, cfg.enc_attention_channels, 1),
                "conv": conv(cfg.enc_attention_channels, ch[-1], 1)},
        "fc": conv(ch[-1] * 2, cfg.enc_dim, 1),
    }


def assign_speaker_tensor(params: Params, name: str, arr,
                          dtype=jnp.float32) -> bool:
    """speaker_encoder.* torch names → pytree (Conv1d [O, I, K] →
    HIO [K, I, O])."""
    arr = np.asarray(arr)

    def put(slot, leaf):
        if leaf == "weight":
            slot["w"] = jnp.asarray(arr.transpose(2, 1, 0), dtype)
        else:
            slot["b"] = jnp.asarray(arr, dtype)
        return True

    parts = name.split(".")
    if parts[0] == "speaker_encoder":
        parts = parts[1:]
    head, leaf = parts[0], parts[-1]
    if head == "blocks":
        i = int(parts[1])
        blk = params["blocks"][i]
        if i == 0:
            return put(blk, leaf) if parts[2] == "conv" else False
        mod = parts[2]
        if mod in ("tdnn1", "tdnn2") and parts[3] == "conv":
            return put(blk[mod], leaf)
        if mod == "res2net_block" and parts[3] == "blocks":
            return put(blk["res2net"]["blocks"][int(parts[4])], leaf) \
                if parts[5] == "conv" else False
        if mod == "se_block" and parts[3] in ("conv1", "conv2"):
            return put(blk["se"][parts[3]], leaf)
        return False
    if head == "mfa" and parts[1] == "conv":
        return put(params["mfa"], leaf)
    if head == "asp":
        if parts[1] == "tdnn" and parts[2] == "conv":
            return put(params["asp"]["tdnn"], leaf)
        if parts[1] == "conv":
            return put(params["asp"]["conv"], leaf)
        return False
    if head == "fc":
        return put(params["fc"], leaf)
    return False


def extract_speaker_embedding(params: Params,
                              cfg: SpeakerEncoderConfig,
                              wav: np.ndarray, sr: Optional[int] = None,
                              n_fft: int = 400, hop: int = 160,
                              win: int = 400) -> np.ndarray:
    """Reference clip waveform → [enc_dim] voice embedding (the
    artifact the reference caches per voice, voice_cache.py)."""
    mel = mel_spectrogram_np(wav, n_fft, cfg.mel_dim,
                             sr or cfg.sample_rate, hop, win)
    out = speaker_encode(params, cfg,
                         jnp.asarray(mel.T[None], jnp.float32))
    return np.asarray(out[0], np.float32)
