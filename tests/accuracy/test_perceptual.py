"""Accuracy harness (reference compute_lpips.py role): perceptual
distance between pipeline outputs across runs and dtypes."""

import numpy as np
import pytest

from vllm_omni_tpu.diffusion.perceptual import perceptual_distance


def test_metric_properties():
    rng = np.random.default_rng(0)
    img = rng.random((32, 32, 3)).astype(np.float32)
    assert perceptual_distance(img, img) == pytest.approx(0.0, abs=1e-9)
    other = rng.random((32, 32, 3)).astype(np.float32)
    d_noise = perceptual_distance(img, other)
    d_small = perceptual_distance(img, np.clip(img + 0.01, 0, 1))
    assert d_noise > 10 * d_small > 0
    # symmetric
    assert perceptual_distance(other, img) == pytest.approx(d_noise,
                                                            rel=1e-5)


def test_pipeline_seed_determinism_and_dtype_accuracy():
    """Same seed → perceptually identical; float32 vs bfloat16 of the
    SAME request stays within the accuracy budget while a different
    seed is far outside it (the reference tier's golden-vs-candidate
    comparison shape)."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import (DiffusionConfig,
                                                DiTConfig)
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    def run(dtype, seed):
        cfg = DiffusionConfig(
            model="dummy", dtype=dtype, seed=7,
            resolution_buckets=((32, 32),), vae_latent_channels=4,
            flow_shift=1.0,
            dit=DiTConfig(hidden_size=64, num_layers=2, num_heads=4,
                          head_dim=16, latent_channels=4, patch_size=2,
                          text_dim=32, axes_dims_rope=(4, 6, 6)))
        eng = DiffusionEngine(cfg)
        out = eng.generate([DiffusionRequest(
            "r0", "accuracy probe",
            DiffusionSamplingParams(num_inference_steps=4, height=32,
                                    width=32, seed=seed,
                                    output_type="np"))])[0]
        assert out.error is None, out.error
        return np.asarray(out.images, np.float32)[0]

    a32 = run("float32", seed=1)
    a32_again = run("float32", seed=1)
    assert perceptual_distance(a32, a32_again) == pytest.approx(
        0.0, abs=1e-7)
    b16 = run("bfloat16", seed=1)
    other = run("float32", seed=2)
    d_dtype = perceptual_distance(a32, b16)
    d_seed = perceptual_distance(a32, other)
    assert d_seed > 3 * d_dtype, (d_seed, d_dtype)
