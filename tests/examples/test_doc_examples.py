"""Doc examples executed as tests (reference tests/examples/ — the doc
snippets must keep working verbatim, shrunk to the tiny tier)."""

import numpy as np

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}
TINY_ENGINE = dict(hf_overrides=TINY_HF, dtype="float32",
                   max_model_len=128, num_pages=32, page_size=16,
                   max_num_seqs=4, max_num_batched_tokens=64)


def test_readme_quickstart_llm():
    """README: plain LLM (single AR stage)."""
    from vllm_omni_tpu import Omni, SamplingParams

    omni = Omni(model="dummy", **TINY_ENGINE)
    outs = omni.generate([[1, 2, 3]], SamplingParams(
        max_tokens=8, temperature=0.0, ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 8


def test_readme_quickstart_t2i():
    """README: text → image (single diffusion stage)."""
    from vllm_omni_tpu import DiffusionSamplingParams, Omni

    omni = Omni(model="dummy", stage_configs={"stage_args": [{
        "stage_id": 0, "stage_type": "diffusion",
        "engine_args": {"dtype": "float32",
                        "dit": {"hidden_size": 64, "num_layers": 2,
                                "num_heads": 4, "head_dim": 16,
                                "latent_channels": 4, "patch_size": 2,
                                "text_dim": 64,
                                "axes_dims_rope": [4, 6, 6]},
                        "vae_latent_channels": 4,
                        "resolution_buckets": [[64, 64]]},
        "final_output": True, "final_output_type": "image"}]})
    outs = omni.generate(["a photo of a cat"], DiffusionSamplingParams(
        num_inference_steps=2, height=64, width=64, guidance_scale=1.0,
        seed=0, output_type="np"))
    img = np.asarray(outs[0].multimodal_output["image"])
    assert img.shape == (1, 64, 64, 3)


def test_user_guide_dict_prompt():
    """User guide: dict prompts with prompt_token_ids."""
    from vllm_omni_tpu import Omni, SamplingParams

    omni = Omni(model="dummy", **TINY_ENGINE)
    outs = omni.generate([{"prompt_token_ids": [4, 5, 6]}],
                         SamplingParams(max_tokens=4, temperature=0.0,
                                        ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4


def test_user_guide_async_streaming():
    """User guide: AsyncOmni streaming output + streaming input."""
    import asyncio

    from vllm_omni_tpu import AsyncOmni, SamplingParams

    omni = AsyncOmni(model="dummy", **TINY_ENGINE)
    try:
        async def run():
            ticks = 0
            async for out in omni.generate(
                    [1, 2, 3], SamplingParams(max_tokens=6,
                                              temperature=0.0,
                                              ignore_eos=True)):
                ticks += 1
                if out.finished:
                    return ticks, out
        ticks, final = asyncio.run(run())
        assert ticks >= 1
        assert len(final.outputs[0].token_ids) == 6
    finally:
        omni.shutdown()


def test_user_guide_operations_sleep_wake():
    """User guide: omni.runner.collective_rpc("sleep", 1) /
    ("wake_up") — free HBM between bursts, weights restored."""
    import asyncio

    from vllm_omni_tpu import AsyncOmni, SamplingParams

    omni = AsyncOmni(model="dummy", **TINY_ENGINE)
    try:
        sp = SamplingParams(max_tokens=4, temperature=0.0,
                            ignore_eos=True)

        async def run():
            async for out in omni.generate([1, 2, 3], sp):
                if out.finished:
                    return out

        a = asyncio.run(run())
        omni.runner.collective_rpc("sleep", 1)
        omni.runner.collective_rpc("wake_up")
        b = asyncio.run(run())
        assert a.outputs[0].token_ids == b.outputs[0].token_ids
    finally:
        omni.shutdown()
