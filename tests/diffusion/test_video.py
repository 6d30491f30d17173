"""Video (t2v) pipeline tests: 3D rope, frame batch VAE decode
(Wan2.2/LTX-class structure)."""

import numpy as np

from vllm_omni_tpu.core.request import DiffusionRequest
from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
from vllm_omni_tpu.diffusion.config import DiffusionConfig, DiTConfig
from vllm_omni_tpu.diffusion.engine import DiffusionEngine

TINY_DIT = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
                latent_channels=4, patch_size=2, text_dim=32,
                axes_dims_rope=(4, 6, 6))


def make_engine(**over):
    kw = dict(dit=DiTConfig(**TINY_DIT), dtype="float32",
              vae_latent_channels=4, flow_shift=1.0,
              resolution_buckets=((32, 32),))
    kw.update(over)
    return DiffusionEngine(DiffusionConfig(**kw))


def test_t2v_generates_frames():
    eng = make_engine()
    p = DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=4, seed=0,
                                guidance_scale=1.0, output_type="np")
    out = eng.generate([DiffusionRequest("v", "a video", p)])[0]
    assert out.error is None
    assert out.images is None
    assert out.video.shape == (4, 32, 32, 3)
    assert out.video.dtype == np.uint8


def test_video_frames_differ_temporally():
    """3D rope gives frames distinct temporal positions → different
    content per frame even from the same text conditioning."""
    eng = make_engine()
    p = DiffusionSamplingParams(num_inference_steps=3, height=32,
                                width=32, num_frames=3, seed=1,
                                guidance_scale=1.0, output_type="latent")
    out = eng.generate([DiffusionRequest("v", "x", p)])[0]
    lat = out.video  # [1, F, h, w, C]
    assert lat.shape == (1, 3, 4, 4, 4)
    assert not np.allclose(lat[0, 0], lat[0, 1])


def test_video_cfg_and_sp():
    eng = make_engine(parallel={"ulysses_degree": 2})
    base = make_engine()
    p = DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=2, seed=3,
                                guidance_scale=4.0,
                                negative_prompt="static",
                                output_type="latent")
    a = eng.generate([DiffusionRequest("v", "x", p)])[0]
    b = base.generate([DiffusionRequest("v", "x", p)])[0]
    np.testing.assert_allclose(a.video, b.video, rtol=2e-4, atol=2e-4)


def test_frame_interpolation():
    """RIFE-role fps doubling (reference postprocess/rife_interpolator)."""
    from vllm_omni_tpu.diffusion.postprocess import FrameInterpolator

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    interp = FrameInterpolator()
    out = interp.interpolate(frames)
    assert out.shape == (7, 32, 32, 3) and out.dtype == np.uint8
    # originals preserved at even indices
    np.testing.assert_array_equal(out[0::2], frames)
    # zero-init head → midpoints ≈ average of neighbours
    mid = out[1].astype(np.float32)
    avg = (frames[0].astype(np.float32) + frames[1]) / 2
    assert np.abs(mid - avg).mean() < 2.0
    # two rounds: 4 → 7 → 13
    assert interp.interpolate(frames, rounds=2).shape[0] == 13
