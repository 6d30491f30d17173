"""Serving benchmark harness: metrics of record → stats.jsonl.

Reference parity: the reference's benchmark harness (`vllm bench serve`,
benchmarks/qwen3-omni/README.md:38-61) — per-request and overall TTFT /
TPOT / TTFP / RTF / E2E / overall_tps written as stats.jsonl lines.

Usage:
  python benchmarks/serve_bench.py --pipeline tts --concurrency 4 \
      --num-requests 16 --out /tmp/stats
Pipelines: llm (AR only), tts (talker→code2wav async_chunk),
omni (mm thinker→talker→code2wav), t2i (DiT).
Tiny random-weight models by default (structure-true; pass a stage YAML
for real checkpoints).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TINY_LLM = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 512, "hidden_size": 256, "intermediate_size": 512,
    "num_hidden_layers": 4, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 64, "eos_token_id": 0,
}
BASE = dict(model="dummy", dtype="bfloat16", max_model_len=2048,
            page_size=16, max_num_seqs=32, max_num_batched_tokens=2048)


def make_pipeline(kind: str):
    if kind == "llm":
        return {"stage_args": [
            {"stage_id": 0, "stage_type": "llm",
             "engine_args": dict(BASE, hf_overrides=TINY_LLM),
             "final_output": True}]}
    if kind == "tts":
        vocoder = dict(TINY_LLM, vocab_size=512, hidden_size=256)
        return {"stage_args": [
            {"stage_id": 0, "stage_type": "llm",
             "engine_args": dict(BASE, hf_overrides=TINY_LLM),
             "default_sampling_params": {"max_tokens": 100,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
            {"stage_id": 1, "stage_type": "llm",
             "engine_args": dict(BASE, hf_overrides=vocoder,
                                 mode="generation", seed=1),
             "engine_input_source": [0], "async_chunk": True,
             "chunk_frames": 25, "final_output": True,
             "final_output_type": "audio",
             "custom_process_output_func":
                 "vllm_omni_tpu.models.vocoder.code2wav_postprocess",
             "default_sampling_params": {"max_tokens": 1,
                                         "return_hidden_states": True}},
        ]}
    if kind == "t2i":
        return {"stage_args": [
            {"stage_id": 0, "stage_type": "diffusion",
             "engine_args": {"dtype": "bfloat16",
                             "dit": {"hidden_size": 256, "num_layers": 4,
                                     "num_heads": 4, "head_dim": 64,
                                     "latent_channels": 16,
                                     "patch_size": 2, "text_dim": 256,
                                     "axes_dims_rope": [16, 24, 24]},
                             "vae_latent_channels": 16,
                             "resolution_buckets": [[256, 256]]},
             "final_output": True, "final_output_type": "image",
             "default_sampling_params": {"num_inference_steps": 20,
                                         "height": 256, "width": 256,
                                         "guidance_scale": 4.0,
                                         "output_type": "np"}}]}
    raise ValueError(kind)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pipeline", default="tts",
                    choices=["llm", "tts", "t2i"])
    ap.add_argument("--stage-configs-path", default=None)
    ap.add_argument("--num-requests", type=int, default=8)
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--prompt-len", type=int, default=64)
    ap.add_argument("--max-tokens", type=int, default=100)
    ap.add_argument("--out", default="/tmp/omni_bench")
    args = ap.parse_args()

    from vllm_omni_tpu.config.stage_config import load_stage_configs
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams, SamplingParams)
    from vllm_omni_tpu.engine.orchestrator import PipelineRunner

    cfg = args.stage_configs_path or make_pipeline(args.pipeline)
    runner = PipelineRunner(load_stage_configs(cfg))
    runner.stats.log_stats_path = f"{args.out}.stats.jsonl"
    open(runner.stats.log_stats_path, "w").close()

    if args.pipeline == "t2i":
        sp = DiffusionSamplingParams(num_inference_steps=20, height=256,
                                     width=256, seed=0, output_type="np")
        modality = "image"
    else:
        sp = SamplingParams(max_tokens=args.max_tokens, temperature=0.0,
                            ignore_eos=True)
        modality = "audio" if args.pipeline == "tts" else "text"

    rng = np.random.default_rng(0)
    pending = [
        [int(x) for x in rng.integers(1, 500, args.prompt_len)]
        for _ in range(args.num_requests)]
    t0 = time.time()
    submitted = 0
    done = 0
    # closed-loop client at fixed concurrency (reference bench serve)
    while done < args.num_requests:
        while submitted < args.num_requests and \
                submitted - done < args.concurrency:
            rid = f"req{submitted}"
            if args.pipeline == "t2i":
                runner.submit([], SamplingParams(), rid,
                              modality=modality, diffusion_params=sp,
                              prompt=f"prompt {submitted}")
            else:
                runner.submit(pending[submitted], sp, rid,
                              modality=modality)
            submitted += 1
        outs = runner.step()
        done += len(outs)
        if not outs:
            time.sleep(0.0005)
    wall = time.time() - t0

    overall = runner.stats.overall_summary()
    overall["wall_s"] = wall
    overall["requests_per_s"] = args.num_requests / wall
    with open(f"{args.out}.overall.json", "w") as f:
        json.dump(overall, f, indent=2)
    print(json.dumps(overall, indent=2))
    runner.shutdown()


if __name__ == "__main__":
    main()
