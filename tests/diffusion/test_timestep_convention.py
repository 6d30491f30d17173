"""Serving-path timestep convention regression test.

Every real-geometry family forward takes flow-match σ ∈ [0,1] (it
applies its own diffusers-transformer scaling internally, e.g. ×1000
sinusoids), while the scheduler's `timesteps_for` returns σ·num_train
(diffusers pipeline convention). The pipeline must normalize before
dispatching — a ×1000 over-scaled sinusoid still *runs* (parity tests
pass σ directly and e2e tests can't see conditioning quality), so this
pins the contract behaviorally: one engine denoise step must equal a
manual Euler step computed with σ."""

import numpy as np
import pytest

pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.diffusion.test_stable_audio_loader import pipeline_dir  # noqa: E402,F401


def test_denoise_step_feeds_sigma_to_family_forward(pipeline_dir):  # noqa: F811
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.pipeline import DiffusionPipeline
    from vllm_omni_tpu.diffusion.stable_audio import stable_audio_forward

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             flow_shift=1.0)
    pipe = DiffusionPipeline(config)
    req = DiffusionRequest(
        "r0", "convention check",
        DiffusionSamplingParams(num_inference_steps=2, guidance_scale=1.0,
                                seed=3, output_type="latent",
                                extra_args={"audio_end_in_s": 1.0}))
    state = pipe.prepare(req)
    lat0 = np.asarray(state.latents)
    sigma, sigma_next = float(state.sigmas[0]), float(state.sigmas[1])
    assert float(state.timesteps[0]) == pytest.approx(
        sigma * config.num_train_timesteps)

    pipe.denoise_step(state)
    stepped = np.asarray(state.latents)

    # manual Euler step with σ (NOT σ·num_train) fed to the forward
    v = np.asarray(stable_audio_forward(
        pipe.dit_params, pipe.family_cfg, jnp.asarray(lat0),
        state.text_states[:1],
        jnp.full((1,), sigma, jnp.float32)), np.float32)
    expected = lat0 + (sigma_next - sigma) * v
    np.testing.assert_allclose(stepped, expected, rtol=2e-5, atol=2e-5)

    # and σ·num_train conditioning must NOT reproduce the step (guards
    # against both conventions accidentally agreeing)
    v_bad = np.asarray(stable_audio_forward(
        pipe.dit_params, pipe.family_cfg, jnp.asarray(lat0),
        state.text_states[:1],
        jnp.full((1,), sigma * config.num_train_timesteps,
                 jnp.float32)), np.float32)
    assert not np.allclose(stepped, lat0 + (sigma_next - sigma) * v_bad,
                           rtol=2e-5, atol=2e-5)
