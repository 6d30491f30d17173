"""AutoencoderOobleck decoder — stable_audio's 1D waveform VAE.

Reference parity: the reference pipeline decodes StableAudio latents
through diffusers' AutoencoderOobleck (models/stable_audio/
pipeline_stable_audio.py vae.decode); this is the TPU-native decoder so
the stable_audio family no longer ships latents downstream undecoded
(VERDICT r4 item 2 — the "non-checkpoint vocoder workaround").

Architecture (Descript-audio-codec lineage):
* Snake1d activation: x + (1/(β+1e-9))·sin²(α·x), α/β stored as
  log-scale per-channel parameters;
* weight-normed Conv1d everywhere (checkpoints ship weight_g/weight_v,
  or parametrizations.weight.original0/1 on newer torch — both mapped);
* decoder: conv1(k7) → per-ratio upsample blocks (snake →
  ConvTranspose1d(k=2s, stride s, pad ⌈s/2⌉) → 3 residual units at
  dilations 1/3/9, each snake→conv(k7,dil)→snake→conv(k1) + skip) →
  snake → conv2(k7, no bias) to audio channels.

TPU-first: channels-last [B, L, C] internally (lax.conv_general_dilated
NHC layout keeps the channel dim on the 128-lane axis), fp32 throughout
(audio decode is tiny next to the DiT), transposed conv via lhs_dilation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

Params = dict

_DN = ("NHC", "HIO", "NHC")  # batch-length-channel, kernel [K, in, out]


@dataclass
class OobleckConfig:
    decoder_channels: int = 128
    decoder_input_channels: int = 64
    audio_channels: int = 2
    downsampling_ratios: tuple = (2, 4, 4, 8, 8)
    channel_multiples: tuple = (1, 2, 4, 8, 16)
    sampling_rate: int = 44100

    @property
    def upsampling_ratios(self) -> tuple:
        return tuple(reversed(self.downsampling_ratios))

    @property
    def hop(self) -> int:
        h = 1
        for r in self.downsampling_ratios:
            h *= int(r)
        return h

    @classmethod
    def from_json(cls, cfg: dict) -> "OobleckConfig":
        keep = set(cls.__dataclass_fields__)
        kw = {k: v for k, v in cfg.items() if k in keep}
        for k in ("downsampling_ratios", "channel_multiples"):
            if k in kw:
                kw[k] = tuple(kw[k])
        return cls(**kw)


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def _snake(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """x [B, L, C]; alpha/beta [C] log-scale."""
    alpha = jnp.exp(p["alpha"])[None, None, :]
    beta = jnp.exp(p["beta"])[None, None, :]
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(alpha * x))


def _conv1d(x: jnp.ndarray, p: Params, dilation: int = 1,
            padding: int = 0) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"][None, None, :]
    return out


def _conv_transpose1d(x: jnp.ndarray, p: Params, stride: int,
                      padding: int) -> jnp.ndarray:
    """torch ConvTranspose1d: insert (s-1) zeros between inputs, then
    correlate with the flipped kernel, edge pad (k-1-pad). Weight in p
    is already [K, in, out] with the kernel FLIPPED at assign time."""
    k = p["w"].shape[0]
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=(1,), padding=[(pad, pad)],
        lhs_dilation=(stride,), dimension_numbers=_DN)
    if "b" in p:
        out = out + p["b"][None, None, :]
    return out


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _res_unit(x: jnp.ndarray, p: Params, dilation: int) -> jnp.ndarray:
    pad = ((7 - 1) * dilation) // 2
    y = _conv1d(_snake(x, p["snake1"]), p["conv1"], dilation=dilation,
                padding=pad)
    y = _conv1d(_snake(y, p["snake2"]), p["conv2"])
    return x + y


def oobleck_decode(params: Params, cfg: OobleckConfig,
                   latents: jnp.ndarray) -> jnp.ndarray:
    """latents [B, L, C_lat] (channels-last) → waveform
    [B, L·hop, audio_channels] in [-1, 1]-ish float32."""
    x = latents.astype(jnp.float32)
    x = _conv1d(x, params["conv1"], padding=3)
    for blk, stride in zip(params["blocks"], cfg.upsampling_ratios):
        x = _snake(x, blk["snake1"])
        x = _conv_transpose1d(x, blk["conv_t1"], stride,
                              math.ceil(stride / 2))
        x = _res_unit(x, blk["res1"], 1)
        x = _res_unit(x, blk["res2"], 3)
        x = _res_unit(x, blk["res3"], 9)
    x = _snake(x, params["snake1"])
    return _conv1d(x, params["conv2"], padding=3)


# ---------------------------------------------------------------------------
# init + tensor mapping
# ---------------------------------------------------------------------------


def init_oobleck_params(cfg: OobleckConfig, dtype=jnp.float32) -> Params:
    """Zero-init skeleton; real weights land via assign (decode through
    random Oobleck weights is useless, so no random tier)."""
    del dtype
    mult = (1,) + tuple(cfg.channel_multiples)
    ch = cfg.decoder_channels
    n = len(cfg.upsampling_ratios)

    def conv(k, cin, cout, bias=True):
        p = {"w": jnp.zeros((k, cin, cout), jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        return p

    def snake(c):
        return {"alpha": jnp.zeros((c,), jnp.float32),
                "beta": jnp.zeros((c,), jnp.float32)}

    def res(c):
        return {"snake1": snake(c), "conv1": conv(7, c, c),
                "snake2": snake(c), "conv2": conv(1, c, c)}

    blocks = []
    for i, s in enumerate(cfg.upsampling_ratios):
        cin = ch * mult[n - i]
        cout = ch * mult[n - i - 1]
        blocks.append({"snake1": snake(cin),
                       "conv_t1": conv(2 * s, cin, cout),
                       "res1": res(cout), "res2": res(cout),
                       "res3": res(cout)})
    return {
        "conv1": conv(7, cfg.decoder_input_channels, ch * mult[-1]),
        "blocks": blocks,
        "snake1": snake(ch),
        "conv2": conv(7, ch, cfg.audio_channels, bias=False),
    }


def _compose_weight_norm(slots: dict) -> None:
    """Fold staged weight_v/weight_g pairs into the final [K,in,out]
    (or transposed-conv flipped) kernels."""
    for slot, staging in list(slots.items()):
        v = staging.pop("_v", None)
        g = staging.pop("_g", None)
        if v is None:
            continue
        # torch norm over all dims but 0: w = g * v / ||v||_dims(1,2)
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = (g.reshape(-1, 1, 1) * v / np.maximum(norm, 1e-12))
        staging["_w"] = w


def assign_oobleck_tensor(params: Params, name: str, value: np.ndarray,
                          dtype=None, _staging: dict = None) -> bool:
    """Two-phase: weight-norm halves stage under the target slot; call
    finalize_oobleck_params once after the last tensor. Handles both
    `weight_g/weight_v` and `parametrizations.weight.original0/1`."""
    del dtype
    parts = name.split(".")
    if parts[0] != "decoder":
        return False  # encoder unused at serving time
    parts = parts[1:]

    def slot_for(path: list) -> dict | None:
        if path[0] == "conv1":
            return params["conv1"]
        if path[0] == "conv2":
            return params["conv2"]
        if path[0] == "snake1":
            return params["snake1"]
        if path[0] == "block":
            blk = params["blocks"][int(path[1])]
            m = {"snake1": "snake1", "conv_t1": "conv_t1",
                 "res_unit1": "res1", "res_unit2": "res2",
                 "res_unit3": "res3"}.get(path[2])
            if m is None:
                return None
            tgt = blk[m]
            if m.startswith("res") and len(path) > 3:
                sub = {"snake1": "snake1", "conv1": "conv1",
                       "snake2": "snake2", "conv2": "conv2"}.get(path[3])
                return tgt.get(sub) if sub else None
            return tgt
        return None

    # leaf kind
    if parts[-1] in ("alpha", "beta"):
        tgt = slot_for(parts[:-1])
        if tgt is None or parts[-1] not in tgt:
            return False
        tgt[parts[-1]] = jnp.asarray(
            np.asarray(value, np.float32).reshape(-1))
        return True
    if parts[-1] == "bias":
        tgt = slot_for(parts[:-1])
        if tgt is None:
            return False
        tgt["b"] = jnp.asarray(np.asarray(value, np.float32))
        return True
    leaf = None
    if parts[-1] in ("weight_g", "weight_v"):
        leaf = "g" if parts[-1] == "weight_g" else "v"
        path = parts[:-1]
    elif parts[-2:] == ["weight", "original0"] or \
            parts[-3:] == ["parametrizations", "weight", "original0"]:
        leaf, path = "g", parts[:-3] if "parametrizations" in parts \
            else parts[:-2]
    elif parts[-2:] == ["weight", "original1"] or \
            parts[-3:] == ["parametrizations", "weight", "original1"]:
        leaf, path = "v", parts[:-3] if "parametrizations" in parts \
            else parts[:-2]
    elif parts[-1] == "weight":
        leaf, path = "w", parts[:-1]
    if leaf is None:
        return False
    tgt = slot_for(path)
    if tgt is None or "w" not in tgt:
        return False
    is_transpose = path[-1] == "conv_t1"
    tgt.setdefault("_staging", {})["_" + leaf if leaf != "w" else "_w_raw"] \
        = np.asarray(value, np.float32)
    tgt["_staging"]["_transpose"] = is_transpose
    return True


def finalize_oobleck_params(params: Params) -> int:
    """Compose weight norms and lay kernels out [K, in, out]; returns
    the number of conv slots filled."""
    filled = 0

    def walk(node):
        nonlocal filled
        if isinstance(node, dict):
            st = node.pop("_staging", None)
            if st is not None:
                raw = st.get("_w_raw")
                if raw is None and "_v" in st:
                    v, g = st["_v"], st["_g"]
                    norm = np.sqrt((v ** 2).sum(
                        axis=tuple(range(1, v.ndim)), keepdims=True))
                    raw = g.reshape(-1, *([1] * (v.ndim - 1))) * v / \
                        np.maximum(norm, 1e-12)
                if raw is not None:
                    if st.get("_transpose"):
                        # torch ConvTranspose1d [in, out, K] → flip K,
                        # land [K, in, out]
                        w = raw[:, :, ::-1].transpose(2, 0, 1)
                    else:
                        # torch Conv1d [out, in, K] → [K, in, out]
                        w = raw.transpose(2, 1, 0)
                    node["w"] = jnp.asarray(np.ascontiguousarray(w))
                    filled += 1
            for v in node.values():
                walk(v)
        elif isinstance(node, list):
            for v in node:
                walk(v)

    walk(params)
    return filled
