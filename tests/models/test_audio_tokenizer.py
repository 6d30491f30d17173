"""Discrete audio tokenizer (qwen3_tts 12hz-tokenizer role): RVQ
correctness, frame-rate math, roundtrip determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.models.audio_tokenizer import (AudioTokenizer,
                                                  AudioTokenizerConfig,
                                                  rvq_decode, rvq_encode)

TINY = AudioTokenizerConfig(n_mels=16, hidden_size=32, num_layers=1,
                            num_heads=2, codebook_size=64, n_q=4,
                            latent_dim=16, frame_pool=2)


def test_rvq_nearest_neighbor_exact():
    """A vector that IS a codebook entry must quantize to it with zero
    first-stage residual."""
    key = jax.random.PRNGKey(0)
    cb = jax.random.normal(key, (1, 8, 4))
    x = cb[0, 5][None]
    codes, quant = rvq_encode(cb, x)
    assert int(codes[0, 0]) == 5
    np.testing.assert_allclose(np.asarray(quant), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_rvq_residual_cascade_reduces_error():
    """Each extra quantizer stage must not increase reconstruction
    error (residual refinement)."""
    key = jax.random.PRNGKey(1)
    cbs = jax.random.normal(key, (6, 32, 8)) * 0.5
    x = jax.random.normal(jax.random.PRNGKey(2), (64, 8))
    errs = []
    for n_q in (1, 2, 4, 6):
        codes, quant = rvq_encode(cbs[:n_q], x)
        errs.append(float(jnp.mean((quant - x) ** 2)))
        assert codes.shape == (64, n_q)
    assert errs == sorted(errs, reverse=True), errs


def test_rvq_decode_matches_encode_quant():
    key = jax.random.PRNGKey(3)
    cbs = jax.random.normal(key, (4, 16, 8))
    x = jax.random.normal(jax.random.PRNGKey(4), (10, 8))
    codes, quant = rvq_encode(cbs, x)
    np.testing.assert_allclose(np.asarray(rvq_decode(cbs, codes)),
                               np.asarray(quant), rtol=1e-5, atol=1e-5)


def test_tokenizer_frame_rate_and_shapes():
    tok = AudioTokenizer(TINY)
    mel = np.random.default_rng(0).standard_normal((64, 16)).astype(
        np.float32)
    codes = tok.encode(mel)
    # 64 mel frames → 2x conv stem → 32 → frame_pool 2 → 16 code frames
    assert codes.shape == (16, 4)
    assert codes.dtype == np.int32
    assert (codes >= 0).all() and (codes < 64).all()
    feats = tok.decode(codes)
    assert feats.shape == (16, 32)
    # flat realtime stream input reshapes by n_mels
    codes_flat = tok.encode(mel.reshape(-1))
    np.testing.assert_array_equal(codes_flat, codes)


def test_tokenizer_deterministic():
    tok = AudioTokenizer(TINY)
    mel = np.random.default_rng(1).standard_normal((32, 16)).astype(
        np.float32)
    np.testing.assert_array_equal(tok.encode(mel), tok.encode(mel))
