"""Discrete audio tokenizer: waveform/mel → codec codes (12.5 Hz class).

Reference parity: the qwen3_tts "12hz tokenizer" (7,668 LoC family,
model_executor/models/qwen3_tts/) — the tower that turns reference
audio into discrete codec codes for voice cloning and TTS prompting,
and codes back into continuous features for the talker. Same role as
EnCodec/Mimi-style tokenizers: conv/transformer encoder at a low frame
rate + residual vector quantization (RVQ).

TPU-first design: the encoder reuses the whisper-style tower
(models/encoders.py — bidirectional attention on the MXU, one-shot jit);
RVQ is a pure-function nearest-neighbor cascade (argmin over a
[codebook, dim] matmul — MXU-friendly, no host loops); decode is an
embedding-sum + projection. Codebooks are params like any other tensor,
loadable from real checkpoints through the same safetensors path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.models.encoders import (AudioEncoderConfig,
                                           audio_encoder_forward,
                                           init_audio_encoder)

Params = dict


@dataclass(frozen=True)
class AudioTokenizerConfig:
    n_mels: int = 128
    hidden_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    # RVQ: n_q residual stages over a shared latent dim
    codebook_size: int = 1024
    n_q: int = 8
    latent_dim: int = 256
    # mel frames per second / subsample → 12.5 Hz at 100 fps mel and
    # 8x total subsample (whisper 2x stem × 4x pooling)
    frame_pool: int = 4  # extra pooling after the 2x conv stem

    @property
    def encoder_cfg(self) -> AudioEncoderConfig:
        return AudioEncoderConfig(
            n_mels=self.n_mels, hidden_size=self.hidden_size,
            num_layers=self.num_layers, num_heads=self.num_heads,
            output_dim=self.latent_dim, conv_strides=(1, 2))


def rvq_encode(codebooks: jnp.ndarray, x: jnp.ndarray
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Residual VQ: x [..., D] against codebooks [n_q, K, D] →
    (codes [..., n_q] int32, quantized [..., D]).

    Each stage quantizes the residual of the previous stages. The
    nearest-neighbor search is ‖r‖² - 2·r·cᵀ + ‖c‖² with the r·cᵀ term
    a single [T, D]×[D, K] matmul per stage — MXU work, not a gather
    loop."""
    def stage(carry, cb):
        residual, quant = carry
        # distances: [..., K]
        dots = jnp.einsum("...d,kd->...k", residual, cb)
        c_norm = jnp.sum(cb.astype(jnp.float32) ** 2, axis=-1)
        d2 = c_norm - 2.0 * dots.astype(jnp.float32)
        idx = jnp.argmin(d2, axis=-1)
        chosen = cb[idx]
        return (residual - chosen, quant + chosen), idx

    (_, quant), codes = jax.lax.scan(
        stage, (x, jnp.zeros_like(x)), codebooks)
    # scan stacks codes on axis 0 → move n_q last
    codes = jnp.moveaxis(codes, 0, -1)
    return codes.astype(jnp.int32), quant


def rvq_decode(codebooks: jnp.ndarray, codes: jnp.ndarray
               ) -> jnp.ndarray:
    """codes [..., n_q] → sum of per-stage codebook vectors [..., D]."""
    def stage(acc, args):
        cb, idx = args
        return acc + cb[idx], None

    n_q = codebooks.shape[0]
    idxs = jnp.moveaxis(codes, -1, 0)  # [n_q, ...]
    init = jnp.zeros(codes.shape[:-1] + (codebooks.shape[-1],),
                     codebooks.dtype)
    acc, _ = jax.lax.scan(stage, init, (codebooks[:n_q], idxs))
    return acc


class AudioTokenizer:
    """Encode reference audio to codec codes; decode codes to talker
    conditioning features. The serving voice cache stores the codes —
    decode-once semantics extend to tokenize-once."""

    def __init__(self, cfg: AudioTokenizerConfig, seed: int = 0,
                 dtype=jnp.float32) -> None:
        self.cfg = cfg
        key = jax.random.PRNGKey(seed)
        k_enc, k_cb, k_out = jax.random.split(key, 3)
        self.encoder_params = init_audio_encoder(cfg.encoder_cfg, k_enc,
                                                 dtype)
        # k-means-style init stand-in: unit-scaled gaussian codebooks
        self.codebooks = (jax.random.normal(
            k_cb, (cfg.n_q, cfg.codebook_size, cfg.latent_dim),
            jnp.float32) / cfg.latent_dim ** 0.5).astype(dtype)
        self.out_proj = (jax.random.normal(
            k_out, (cfg.latent_dim, cfg.hidden_size), jnp.float32) *
            cfg.latent_dim ** -0.5).astype(dtype)
        self._encode_fn = jax.jit(self._encode)
        self._decode_fn = jax.jit(self._decode)

    # -- device programs -----------------------------------------------------
    def _encode(self, mel: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        feats = audio_encoder_forward(self.encoder_params,
                                      self.cfg.encoder_cfg, mel)
        # pool to the final low frame rate (12.5 Hz class)
        b, t, d = feats.shape
        p = self.cfg.frame_pool
        t_out = t // p
        pooled = feats[:, :t_out * p].reshape(b, t_out, p, d).mean(2)
        return rvq_encode(self.codebooks, pooled)

    def _decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        quant = rvq_decode(self.codebooks, codes)
        return quant @ self.out_proj

    # -- host API --------------------------------------------------------
    def encode(self, mel: np.ndarray) -> np.ndarray:
        """mel [T, n_mels] (or flat f32) → codes [T', n_q] int32."""
        mel = np.asarray(mel, np.float32)
        if mel.ndim == 1:
            # arbitrary client audio: drop the trailing partial frame
            n = (mel.size // self.cfg.n_mels) * self.cfg.n_mels
            if n == 0:
                raise ValueError(
                    f"audio too short: {mel.size} samples < one "
                    f"{self.cfg.n_mels}-dim frame")
            mel = mel[:n].reshape(-1, self.cfg.n_mels)
        codes, _ = self._encode_fn(jnp.asarray(mel[None]))
        return np.asarray(codes[0])

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [T', n_q] → conditioning features [T', hidden]."""
        return np.asarray(self._decode_fn(jnp.asarray(codes)[None]))[0]


_default: dict = {}


def get_audio_tokenizer(**cfg_kwargs) -> AudioTokenizer:
    """Cached default-instance accessor (stage input processors and the
    serving voice path share one tokenizer per config)."""
    key = tuple(sorted(cfg_kwargs.items()))
    inst = _default.get(key)
    if inst is None:
        inst = AudioTokenizer(AudioTokenizerConfig(**cfg_kwargs))
        _default[key] = inst
    return inst
