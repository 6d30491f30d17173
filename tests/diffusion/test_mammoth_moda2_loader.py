"""MammothModa2 DiT family tests.

The transformer is checkpoint- and math-identical to OmniGen2's Lumina2
layout (diffusion/models/mammoth_moda2/mammothmoda2_dit_model.py:493 vs
omnigen2_transformer.py:811) — same blocks, rope ids, ascending-t
scheduler (schedulers.py:47) and data-noise output — differing only in
defaults and timestep_scale (1.0: the sinusoid takes raw t). These
tests pin the class-name dispatch, the timestep_scale plumbing (golden
from the omnigen2 oracle with its ×1000 undone) and the e2e engine
drive."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tests.diffusion.test_omnigen2_loader import (  # noqa: E402
    TINY as OG2_TINY, _oracle_forward, _tiny_state_dict)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.omnigen2 import (  # noqa: E402
    MammothModa2Config, omnigen2_forward)

TINY = {**OG2_TINY, "timestep_scale": 1.0}


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mm2_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "MammothModa2DiTPipeline",
                   "transformer": ["diffusers",
                                   "MammothModa2Transformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "MammothModa2Transformer2DModel",
                   **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "latent_channels": 4,
                   "block_out_channels": [8, 16, 16, 16]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


def test_dispatch_and_mapping(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "mammoth_moda2"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, MammothModa2Config)
    assert cfg.timestep_scale == 1.0


def test_forward_parity_raw_t_sinusoid(pipeline_dir):
    """timestep_scale=1.0 must feed the sinusoid RAW t — golden from
    the omnigen2 oracle with its ×1000 undone."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(47)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    cap = rng.standard_normal((2, 5, TINY["text_feat_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.25, 0.9], np.float32)
    ours = np.asarray(omnigen2_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(cap),
        jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), lat, cap,
                             t / OG2_TINY["timestep_scale"])
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)
    # and it must NOT equal the ×1000 conditioning
    golden_1000 = _oracle_forward(_tiny_state_dict(), lat, cap, t)
    assert not np.allclose(ours, golden_1000, rtol=3e-4, atol=3e-4)


def test_pipeline_end_to_end(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "mammoth_moda2"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny mammoth test",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
