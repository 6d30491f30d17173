"""AR → DiT pipeline (the Bagel/GLM-image shape: LLM conditions a
diffusion stage) and single-stage t2i through the Omni API."""

import numpy as np

from vllm_omni_tpu import Omni
from vllm_omni_tpu.core.sampling_params import (DiffusionSamplingParams,
                                                SamplingParams)

TINY_LLM = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}
TINY_DIT = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
                latent_channels=4, patch_size=2, text_dim=32,
                axes_dims_rope=(4, 6, 6))


def test_single_stage_t2i_via_omni():
    omni = Omni(model="dummy", stage_configs={
        "stage_args": [{
            "stage_id": 0, "stage_type": "diffusion",
            "engine_args": {"dit": TINY_DIT, "dtype": "float32",
                            "vae_latent_channels": 4,
                            "resolution_buckets": [[32, 32]]},
            "final_output": True, "final_output_type": "image",
        }]})
    p = DiffusionSamplingParams(num_inference_steps=2, height=32, width=32,
                                guidance_scale=1.0, seed=1,
                                output_type="np")
    outs = omni.generate(["a tiny test image"], p)
    assert outs[0].finished
    img = outs[0].multimodal_output["image"]
    assert img.shape == (1, 32, 32, 3)


def test_ar_to_dit_pipeline():
    """LLM hidden states condition the DiT (text_states handoff)."""
    cfg = {
        "stage_args": [
            {"stage_id": 0, "stage_type": "llm",
             "engine_args": {"model": "dummy", "hf_overrides": TINY_LLM,
                             "dtype": "float32", "max_model_len": 128,
                             "num_pages": 32, "page_size": 16},
             "default_sampling_params": {"max_tokens": 4,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
            {"stage_id": 1, "stage_type": "diffusion",
             "engine_args": {"dit": TINY_DIT, "dtype": "float32",
                             "vae_latent_channels": 4,
                             "resolution_buckets": [[32, 32]]},
             "engine_input_source": [0],
             "final_output": True, "final_output_type": "image",
             "default_sampling_params": {"num_inference_steps": 2,
                                         "height": 32, "width": 32,
                                         "guidance_scale": 1.0,
                                         "seed": 3,
                                         "output_type": "np"}},
        ]
    }
    omni = Omni(model="dummy", stage_configs=cfg)
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    outs = omni.generate([list(range(1, 9)), list(range(50, 70))],
                         [sp, sp])
    imgs = [o.multimodal_output["image"] for o in outs]
    assert imgs[0].shape == (1, 32, 32, 3)
    # different prompts → different hidden states → different images
    assert not np.array_equal(imgs[0], imgs[1])
    assert outs[0].stage_durations.keys() == {"stage0", "stage1"}


def test_cross_stage_cfg_companion():
    """The negative prompt runs through the AR encoder as a companion
    request; its hidden states become the DiT's uncond branch (reference
    architecture_overview.md:101-106 CFG companion requests)."""
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams

    cfg = {
        "stage_args": [
            {"stage_id": 0, "stage_type": "llm",
             "engine_args": {"model": "dummy", "hf_overrides": TINY_LLM,
                             "dtype": "float32", "max_model_len": 128,
                             "num_pages": 32, "page_size": 16},
             "default_sampling_params": {"max_tokens": 4,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
            {"stage_id": 1, "stage_type": "diffusion",
             "engine_args": {"dit": TINY_DIT, "dtype": "float32",
                             "vae_latent_channels": 4,
                             "resolution_buckets": [[32, 32]]},
             "engine_input_source": [0],
             "final_output": True, "final_output_type": "image"},
        ]
    }
    from vllm_omni_tpu.config.stage_config import load_stage_configs
    from vllm_omni_tpu.engine.orchestrator import PipelineRunner

    dp = DiffusionSamplingParams(
        num_inference_steps=2, height=32, width=32, guidance_scale=4.0,
        seed=7, output_type="latent",
        extra_args={"negative_prompt_token_ids": [9, 8, 7, 6]})
    runner = PipelineRunner(load_stage_configs(cfg))
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    runner.submit(list(range(1, 9)), sp, "r1", modality="image",
                  diffusion_params=dp)
    while runner.has_unfinished():
        runner.step()
    out = runner._active["r1"].final_output
    assert out is not None and out.error is None
    # companion ran and its hidden states reached the diffusion stage
    assert 0 in runner._active["r1"].companion_outputs
    lat_companion = out.multimodal_output["image"]

    # without companion tokens: falls back to hash-embed negative →
    # different uncond branch → different latents
    runner2 = PipelineRunner(load_stage_configs(cfg))
    dp2 = DiffusionSamplingParams(
        num_inference_steps=2, height=32, width=32, guidance_scale=4.0,
        seed=7, output_type="latent", negative_prompt="bad")
    runner2.submit(list(range(1, 9)), sp, "r2", modality="image",
                   diffusion_params=dp2)
    while runner2.has_unfinished():
        runner2.step()
    lat_plain = runner2._active["r2"].final_output.multimodal_output[
        "image"]
    assert not np.array_equal(lat_companion, lat_plain)
