"""Diffusion parallelism parity on the 8-device virtual CPU mesh
(reference: tests/e2e/offline_inference/test_sequence_parallel.py — SP/CFG
configs compared against a single-device baseline in the same test)."""

import numpy as np
import pytest

from vllm_omni_tpu.core.request import DiffusionRequest
from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
from vllm_omni_tpu.diffusion.config import DiffusionConfig, DiTConfig
from vllm_omni_tpu.diffusion.engine import DiffusionEngine

TINY_DIT = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
                latent_channels=4, patch_size=2, text_dim=32,
                axes_dims_rope=(4, 6, 6))


def run(parallel=None, guidance=4.0):
    cfg = DiffusionConfig(
        dit=DiTConfig(**TINY_DIT), dtype="float32",
        vae_latent_channels=4, flow_shift=1.0,
        resolution_buckets=((32, 32),),
        parallel=parallel or {})
    eng = DiffusionEngine(cfg)
    p = DiffusionSamplingParams(
        num_inference_steps=3, height=32, width=32, seed=11,
        guidance_scale=guidance, negative_prompt="bad",
        output_type="latent")
    return eng.generate([DiffusionRequest("r", "a prompt", p)])[0].images


@pytest.mark.parametrize("parallel", [
    {"cfg_parallel_size": 2},
    {"ulysses_degree": 2},
    {"tensor_parallel_size": 2},
    {"cfg_parallel_size": 2, "ulysses_degree": 2,
     "tensor_parallel_size": 2},
], ids=["cfg2", "sp2", "tp2", "cfg2xsp2xtp2"])
def test_parallel_matches_single_device(parallel):
    base = run()
    par = run(parallel)
    np.testing.assert_allclose(par, base, rtol=2e-4, atol=2e-4)


def test_vae_patch_parallel_decode_parity():
    """Full pipeline with image output: sharded VAE decode matches
    single-device pixels (reference test_vae_decode_parallelism.py)."""
    base = run_full(None)
    par = run_full({"ulysses_degree": 2, "tensor_parallel_size": 2})
    np.testing.assert_allclose(par.astype(np.float32),
                               base.astype(np.float32), atol=1.5)


def run_full(parallel):
    cfg = DiffusionConfig(
        dit=DiTConfig(**TINY_DIT), dtype="float32",
        vae_latent_channels=4, flow_shift=1.0,
        resolution_buckets=((32, 32),), parallel=parallel or {})
    eng = DiffusionEngine(cfg)
    p = DiffusionSamplingParams(
        num_inference_steps=2, height=32, width=32, seed=11,
        guidance_scale=1.0, output_type="np")
    return eng.generate([DiffusionRequest("r", "a prompt", p)])[0].images
