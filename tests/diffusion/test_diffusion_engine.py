"""Diffusion engine tests (CPU tier, tiny DiT)."""

import numpy as np
import pytest

from vllm_omni_tpu.core.request import DiffusionRequest
from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
from vllm_omni_tpu.diffusion.config import DiffusionConfig, DiTConfig
from vllm_omni_tpu.diffusion.engine import DiffusionEngine

TINY_DIT = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
                latent_channels=4, patch_size=2, text_dim=32,
                axes_dims_rope=(4, 6, 6))


def make_config(**over):
    kw = dict(dit=DiTConfig(**TINY_DIT), dtype="float32",
              vae_latent_channels=4, flow_shift=1.0,
              resolution_buckets=((32, 32),))
    kw.update(over)
    return DiffusionConfig(**kw)


def params(**over):
    kw = dict(num_inference_steps=3, height=32, width=32,
              guidance_scale=1.0, seed=0, output_type="np")
    kw.update(over)
    return DiffusionSamplingParams(**kw)


def test_request_mode_t2i():
    eng = DiffusionEngine(make_config())
    req = DiffusionRequest(request_id="r0", prompt="a cat", params=params())
    outs = eng.generate([req])
    assert outs[0].finished and outs[0].error is None
    img = outs[0].images
    assert img.shape == (1, 32, 32, 3) and img.dtype == np.uint8


def test_step_mode_preemptible_matches_request_mode():
    """Step-mode execution must produce the same latents as request mode
    (same seed/steps) — the step contract is pure."""
    eng_r = DiffusionEngine(make_config())
    eng_s = DiffusionEngine(make_config(scheduler_mode="step"))
    p = params(output_type="latent")
    a = eng_r.generate([DiffusionRequest("a", "same prompt", p)])[0]
    b = eng_s.generate([DiffusionRequest("b", "same prompt", p)])[0]
    np.testing.assert_allclose(a.images, b.images, rtol=1e-5, atol=1e-5)
    # step mode emitted per-step progress
    assert b.num_steps == 3


def test_cfg_changes_output():
    eng = DiffusionEngine(make_config())
    p1 = params(output_type="latent", guidance_scale=1.0)
    p2 = params(output_type="latent", guidance_scale=4.0,
                negative_prompt="blurry")
    a = eng.generate([DiffusionRequest("a", "a dog", p1)])[0]
    b = eng.generate([DiffusionRequest("b", "a dog", p2)])[0]
    assert not np.allclose(a.images, b.images)


def test_seed_determinism():
    eng = DiffusionEngine(make_config())
    p = params(output_type="latent", seed=7)
    a = eng.generate([DiffusionRequest("a", "x", p)])[0]
    b = eng.generate([DiffusionRequest("b", "x", p)])[0]
    np.testing.assert_array_equal(a.images, b.images)


def test_text_states_handoff():
    """Upstream-stage hidden states flow in as conditioning (the AR→DiT
    pipeline edge)."""
    eng = DiffusionEngine(make_config())
    ts = np.random.default_rng(0).standard_normal((10, 32)).astype(
        np.float32)
    p = params(output_type="latent")
    a = eng.generate([DiffusionRequest(
        "a", "ignored", p,
        additional_information={"text_states": ts})])[0]
    b = eng.generate([DiffusionRequest("b", "ignored", p)])[0]
    assert not np.allclose(a.images, b.images)


def test_error_isolation():
    eng = DiffusionEngine(make_config())
    bad = DiffusionRequest("bad", "x", params(height=33, width=32))
    good = DiffusionRequest("good", "x", params())
    outs = eng.generate([bad, good])
    assert outs[0].error is not None and outs[0].finished
    assert outs[1].error is None and outs[1].images is not None


def test_tea_cache_skips_and_stays_close():
    """TeaCache-style device-side skip: with a generous threshold some
    steps reuse the cached velocity; output stays near baseline
    (reference teacache 1.5-2x speedup with minimal quality loss)."""
    from vllm_omni_tpu.diffusion.pipeline import DiffusionPipeline

    base_cfg = make_config()
    cache_cfg = make_config(cache={"backend": "tea_cache",
                                   "rel_l1_thresh": 1e9})
    p = params(num_inference_steps=6, output_type="latent", seed=2)
    base = DiffusionEngine(base_cfg).generate(
        [DiffusionRequest("a", "x", p)])[0]
    pipe = DiffusionPipeline(cache_cfg)
    req = DiffusionRequest("b", "x", p)
    state = pipe.prepare(req)
    while not state.done:
        pipe.denoise_step(state)
    skipped = int(state.cache_skips)
    # first and last steps always compute; everything between skips at
    # this threshold
    assert skipped == 4
    out = pipe.post_decode(state, "latent")
    assert out.shape == base.images.shape
    # tight threshold → no skips → exact parity with baseline
    tight = DiffusionPipeline(make_config(cache={
        "backend": "tea_cache", "rel_l1_thresh": 0.0}))
    st2 = tight.prepare(DiffusionRequest("c", "x", p))
    while not st2.done:
        tight.denoise_step(st2)
    assert int(st2.cache_skips) == 0
    import numpy as np

    np.testing.assert_allclose(tight.post_decode(st2, "latent"),
                               base.images, rtol=1e-4, atol=1e-4)


def test_model_offload_parity():
    """VAE host offload produces identical pixels (reference offloader
    model-level mode)."""
    import numpy as np

    p = params(seed=9)
    a = DiffusionEngine(make_config()).generate(
        [DiffusionRequest("a", "x", p)])[0]
    eng = DiffusionEngine(make_config(offload="model"))
    assert eng.pipeline.vae_params is None
    b = eng.generate([DiffusionRequest("b", "x", p)])[0]
    np.testing.assert_array_equal(a.images, b.images)


def test_layerwise_offload_parity():
    """Layerwise host offload (block-by-block prefetch) produces
    identical latents (reference offloader/layerwise_backend.py:21)."""
    import numpy as np

    p = params(seed=12, output_type="latent", num_inference_steps=3)
    a = DiffusionEngine(make_config()).generate(
        [DiffusionRequest("a", "x", p)])[0]
    eng = DiffusionEngine(make_config(offload="layerwise"))
    # only block 0 stays resident (TeaCache probe); the rest stream
    # from host RAM
    assert len(eng.pipeline.dit_params["layers"]) == 1
    assert len(eng.pipeline._host_layers) > 1
    b = eng.generate([DiffusionRequest("b", "x", p)])[0]
    np.testing.assert_allclose(b.images, a.images, rtol=1e-5, atol=1e-5)
    # CFG path too
    p2 = params(seed=12, output_type="latent", num_inference_steps=2,
                guidance_scale=4.0, negative_prompt="bad")
    a2 = DiffusionEngine(make_config()).generate(
        [DiffusionRequest("a", "x", p2)])[0]
    b2 = DiffusionEngine(make_config(offload="layerwise")).generate(
        [DiffusionRequest("b", "x", p2)])[0]
    np.testing.assert_allclose(b2.images, a2.images, rtol=1e-5,
                               atol=1e-5)


def test_taylor_seer_backend():
    """Second cache backend (cache-dit/TaylorSeer role): first-order
    velocity extrapolation on skipped steps. Same skip criterion as
    tea_cache; prediction differs. With skips forced, the extrapolated
    trajectory stays closer to (or as close as) the no-cache baseline
    than plain reuse on a trending velocity field."""
    import numpy as np

    from vllm_omni_tpu.diffusion.pipeline import DiffusionPipeline

    p = params(num_inference_steps=6, output_type="latent", seed=2)
    base = DiffusionEngine(make_config()).generate(
        [DiffusionRequest("a", "x", p)])[0]

    def run(backend, thresh):
        pipe = DiffusionPipeline(make_config(cache={
            "backend": backend, "rel_l1_thresh": thresh}))
        st = pipe.prepare(DiffusionRequest("b", "x", p))
        while not st.done:
            pipe.denoise_step(st)
        return pipe.post_decode(st, "latent"), int(st.cache_skips)

    ts_lat, ts_skips = run("taylor_seer", 1e9)
    assert ts_skips == 4  # same criterion as tea_cache
    tea_lat, _ = run("tea_cache", 1e9)
    ref = np.asarray(base.images, np.float32)
    ts_err = float(np.mean(np.abs(np.asarray(ts_lat) - ref)))
    tea_err = float(np.mean(np.abs(np.asarray(tea_lat) - ref)))
    # extrapolation beats (or at least matches) plain reuse
    assert ts_err <= tea_err * 1.05, (ts_err, tea_err)
    # tight threshold → zero skips → exact parity
    exact_lat, n = run("taylor_seer", 0.0)
    assert n == 0
    np.testing.assert_allclose(np.asarray(exact_lat), ref,
                               rtol=1e-4, atol=1e-5)
