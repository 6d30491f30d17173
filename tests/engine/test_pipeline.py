"""Multi-stage pipeline orchestration tests (CPU tier, tiny models).

Models the reference's 3-stage Qwen3-Omni shape: AR thinker → AR talker
(consumes thinker hidden states as an embeddings prompt) → generation-mode
code2wav (one-shot, returns hidden states) — reference
stage_input_processors/qwen3_omni.py:174 thinker2talker.
"""

import numpy as np

from vllm_omni_tpu.config.stage_config import load_stage_configs
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.orchestrator import PipelineRunner

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}

COMMON = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
              max_model_len=256, num_pages=64, page_size=16,
              max_num_seqs=4, max_num_batched_tokens=64)

PIPELINE_3STAGE = {
    "stage_args": [
        {"stage_id": 0, "stage_type": "llm",
         "engine_args": COMMON,
         "default_sampling_params": {"max_tokens": 6, "temperature": 0.0,
                                     "ignore_eos": True}},
        {"stage_id": 1, "stage_type": "llm",
         "engine_args": dict(COMMON, seed=1),
         "engine_input_source": [0],
         "default_sampling_params": {"max_tokens": 5, "temperature": 0.0,
                                     "ignore_eos": True}},
        {"stage_id": 2, "stage_type": "llm",
         "engine_args": dict(COMMON, mode="generation", seed=2),
         "engine_input_source": [1],
         "final_output": True, "final_output_type": "audio",
         "default_sampling_params": {"max_tokens": 1,
                                     "return_hidden_states": True}},
    ]
}


def test_three_stage_pipeline():
    pipeline = load_stage_configs(PIPELINE_3STAGE)
    runner = PipelineRunner(pipeline)
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    outs = runner.generate([list(range(1, 12)), list(range(20, 40))],
                           [sp, sp], modality="audio")
    assert len(outs) == 2
    for out in outs:
        assert out.finished
        assert out.stage_id == 2
        assert out.final_output_type == "audio"
        # generation stage returns per-token hidden states of its
        # (embeds) prompt = talker hidden states length
        hs = out.outputs[0].hidden_states
        assert hs is not None and hs.shape[-1] == 64
        # thinker prompt (11 or 20) + 6 thinker tokens → talker prompt =
        # thinker hidden states; talker emits 5+prompt hiddens → stage2
        # prompt length > 0
        assert hs.shape[0] > 4
        assert set(out.stage_durations) == {"stage0", "stage1", "stage2"}


def test_pipeline_hidden_state_handoff_is_embeds():
    """Stage 1 must receive stage-0 hidden states as an embeddings
    prompt, not token ids."""
    captured = {}

    def spy_processor(prev_outputs, stage, ctx):
        from vllm_omni_tpu.engine.orchestrator import default_process_input

        kwargs = default_process_input(prev_outputs, stage, ctx)
        captured.update(kwargs)
        return kwargs

    cfg = {
        "stage_args": [
            {"stage_id": 0, "stage_type": "llm", "engine_args": COMMON,
             "default_sampling_params": {"max_tokens": 4,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
            {"stage_id": 1, "stage_type": "llm",
             "engine_args": dict(COMMON, seed=1),
             "engine_input_source": [0], "final_output": True,
             "custom_process_input_func":
                 f"{__name__}.the_spy",
             "default_sampling_params": {"max_tokens": 3,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
        ]
    }
    global the_spy
    the_spy = spy_processor
    runner = PipelineRunner(load_stage_configs(cfg))
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    outs = runner.generate([list(range(1, 10))], [sp])
    assert outs[0].finished
    pe = captured.get("prompt_embeds")
    assert pe is not None
    # prompt 9 tokens prefilled + 4 decodes (first token sampled from
    # prefill logits → its hidden comes from the following decode rows)
    assert pe.shape[1] == 64 and pe.shape[0] >= 9


def test_collective_rpc_sleep_wake():
    """collective_rpc fans sleep/wake across stage engines (reference
    AsyncOmni.collective_rpc async_omni.py:502)."""
    pipeline = load_stage_configs(PIPELINE_3STAGE)
    runner = PipelineRunner(pipeline)
    res = runner.collective_rpc("sleep", 1)
    assert set(res) == {0, 1, 2}
    assert runner.engines[0].runner.params is None
    runner.collective_rpc("wake_up")
    assert runner.engines[0].runner.params is not None
    # subset targeting
    res = runner.collective_rpc("sleep", 1, stage_ids=[1])
    assert set(res) == {1}
    assert runner.engines[0].runner.params is not None
    runner.collective_rpc("wake_up", stage_ids=[1])
    # still generates correctly after a sleep/wake cycle
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    outs = runner.generate([list(range(1, 10))], [sp], modality="audio")
    assert outs[0].finished
