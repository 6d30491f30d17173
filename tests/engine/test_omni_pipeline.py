"""Full omni 3-stage pipeline at tiny scale: audio-in → MoE thinker →
talker (hidden-state prompt) → async_chunk code2wav → waveform out.
The structural e2e for the Qwen3-Omni-class flagship
(stage_configs/qwen3_omni_tpu.yaml is the full-size version)."""

import numpy as np

from vllm_omni_tpu import Omni
from vllm_omni_tpu.core.sampling_params import SamplingParams

AUDIO_TOKEN = 250

THINKER = {
    "architectures": ["Qwen3MoeForCausalLM"],
    "vocab_size": 256, "hidden_size": 64, "intermediate_size": 0,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "num_experts": 4,
    "num_experts_per_tok": 2, "moe_intermediate_size": 32,
    "eos_token_id": 0,
}
TALKER = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 64, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 63,
}
CODE2WAV = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 1, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 63,
}
BASE = dict(dtype="float32", max_model_len=256, num_pages=64,
            page_size=16, max_num_seqs=4, max_num_batched_tokens=64,
            multi_step=2)

PIPELINE = {
    "stage_args": [
        {"stage_id": 0, "stage_type": "llm",
         "engine_args": dict(BASE, model="dummy", hf_overrides=THINKER,
                             mm_encoders={
                                 "audio_token_id": AUDIO_TOKEN,
                                 "audio": {"n_mels": 16,
                                           "hidden_size": 32,
                                           "num_layers": 1,
                                           "num_heads": 2,
                                           "max_frames": 64}}),
         "default_sampling_params": {"max_tokens": 6, "temperature": 0.0,
                                     "ignore_eos": True}},
        {"stage_id": 1, "stage_type": "llm",
         "engine_args": dict(BASE, model="dummy", hf_overrides=TALKER,
                             seed=1),
         "engine_input_source": [0],
         "custom_process_input_func":
             "vllm_omni_tpu.models.stage_input_processors.thinker2talker",
         "default_sampling_params": {"max_tokens": 8, "temperature": 0.0,
                                     "ignore_eos": True}},
        {"stage_id": 2, "stage_type": "llm",
         "engine_args": dict(BASE, model="dummy", hf_overrides=CODE2WAV,
                             mode="generation", seed=2),
         "engine_input_source": [1],
         "async_chunk": True, "chunk_frames": 3,
         "final_output": True, "final_output_type": "audio",
         "custom_process_output_func":
             "vllm_omni_tpu.models.vocoder.code2wav_postprocess",
         "default_sampling_params": {"max_tokens": 1,
                                     "return_hidden_states": True}},
    ]
}


def test_omni_audio_to_audio():
    omni = Omni(model="dummy", stage_configs=PIPELINE)
    # prompt: text tokens + 8 audio placeholders (16 mel frames / 4
    # subsample → wait: 64 frames stem → /4 = 16... use 32 frames → 8)
    mel = np.random.default_rng(0).standard_normal((32, 16)).astype(
        np.float32)
    prompt = {"prompt_token_ids":
              [1, 2, 3] + [AUDIO_TOKEN] * 8 + [4, 5],
              "mm_inputs": {"audio": mel}}
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    out = omni.generate([prompt], [sp])[0]
    assert out.finished and out.error is None
    assert out.final_output_type == "audio"
    audio = out.multimodal_output["audio"]
    # code2wav consumed 8 talker codec tokens → hidden [8, 32] → vocoder
    # upsamples 240x/frame
    assert audio["data"].shape == (8 * 240,)
    assert audio["sample_rate"] == 24000
    assert np.all(np.abs(audio["data"]) <= 1.0)
    assert set(out.stage_durations) == {"stage0", "stage1", "stage2"}


def test_mm_input_changes_output():
    omni = Omni(model="dummy", stage_configs={
        "stage_args": [PIPELINE["stage_args"][0] | {"final_output": True}]})
    rng = np.random.default_rng(0)
    mel_a = rng.standard_normal((32, 16)).astype(np.float32)
    mel_b = rng.standard_normal((32, 16)).astype(np.float32) * 3.0
    base = [1, 2, 3] + [AUDIO_TOKEN] * 8 + [4, 5]
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    a = omni.generate([{"prompt_token_ids": base,
                        "mm_inputs": {"audio": mel_a}}], [sp])[0]
    b = omni.generate([{"prompt_token_ids": base,
                        "mm_inputs": {"audio": mel_b}}], [sp])[0]
    assert a.outputs[0].token_ids != b.outputs[0].token_ids


def test_full_yaml_parses():
    from vllm_omni_tpu.config.stage_config import load_stage_configs

    p = load_stage_configs(
        "vllm_omni_tpu/stage_configs/qwen3_omni_tpu.yaml")
    assert p.num_stages == 3
    assert p.stages[2].async_chunk and p.stages[2].chunk_frames == 25
    assert p.stages[0].engine_args["mm_encoders"]["audio_token_id"] \
        == 151646
    assert p.stages[1].custom_process_input_func.endswith("thinker2talker")
