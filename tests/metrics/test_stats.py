"""Metrics aggregation tests (reference: tests/metrics/)."""

import time

from vllm_omni_tpu.core.outputs import CompletionOutput, RequestOutput
from vllm_omni_tpu.metrics.stats import OrchestratorAggregator


def test_request_lifecycle_metrics(tmp_path):
    path = tmp_path / "stats.jsonl"
    agg = OrchestratorAggregator(log_stats_path=str(path))
    agg.on_request_start("r1")
    time.sleep(0.01)
    agg.on_stage_output(0, "r1", num_new_tokens=4)
    time.sleep(0.01)
    agg.on_stage_output(0, "r1", num_new_tokens=4, finished=True)
    out = RequestOutput(request_id="r1", finished=True)
    out.outputs = [CompletionOutput(index=0, text="", token_ids=[1] * 8)]
    out.stage_durations = {"stage0": 0.02}
    agg.on_request_finish("r1", out)

    s = agg.request_summary("r1")
    assert s["e2e_s"] > 0.015
    assert s["ttft_s"] is not None and s["ttft_s"] < s["e2e_s"]
    assert s["num_output_tokens"] == 8
    assert s["tpot_s"] is not None

    overall = agg.overall_summary()
    assert overall["num_finished"] == 1
    assert overall["stages"][0]["tokens"] == 8
    assert overall["overall_tps"] > 0
    assert path.read_text().count("\n") == 1


def test_audio_rtf():
    import numpy as np

    agg = OrchestratorAggregator()
    agg.on_request_start("r2")
    time.sleep(0.01)
    out = RequestOutput(request_id="r2", finished=True)
    out.multimodal_output["audio"] = {
        "data": np.zeros(24000, np.float32), "sample_rate": 24000}
    agg.on_request_finish("r2", out)
    s = agg.request_summary("r2")
    assert s["rtf"] is not None and s["rtf"] < 1.0  # 1s audio, ~10ms work
    assert s["ttfp_s"] is not None


def test_pipeline_runner_populates_stats():
    from vllm_omni_tpu.config.stage_config import single_stage_pipeline
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.orchestrator import PipelineRunner

    hf = {"architectures": ["Qwen3ForCausalLM"], "vocab_size": 128,
          "hidden_size": 32, "intermediate_size": 64,
          "num_hidden_layers": 1, "num_attention_heads": 2,
          "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0}
    runner = PipelineRunner(single_stage_pipeline(
        "llm", model="dummy", hf_overrides=hf, dtype="float32",
        max_model_len=64, num_pages=16, page_size=16))
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    runner.generate([[1, 2, 3]], [sp])
    overall = runner.stats.overall_summary()
    assert overall["num_finished"] == 1
    assert overall["stages"][0]["tokens"] == 4
