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


def bench_http(args) -> None:
    """Spawn the real aiohttp server as a subprocess and drive streaming
    /v1/completions with a closed-loop concurrent client — TTFT / ITL /
    TPOT / E2E measured from the wire (reference `vllm bench serve`)."""
    import asyncio
    import signal
    import socket
    import subprocess
    import tempfile

    import aiohttp

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    llm_cfg = make_pipeline("llm")
    llm_cfg["stage_args"][0]["engine_args"]["max_model_len"] = (
        args.prompt_len + args.max_tokens + 64)
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(llm_cfg, f)
        cfg_path = f.name
    srv = subprocess.Popen(
        [sys.executable, "-m", "vllm_omni_tpu.entrypoints.cli", "serve",
         "dummy", "--stage-configs-path", cfg_path, "--host", "127.0.0.1",
         "--port", str(port)],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    base = f"http://127.0.0.1:{port}"

    rng = np.random.default_rng(0)
    prompts = [[int(x) for x in rng.integers(1, 500, args.prompt_len)]
               for _ in range(args.num_requests)]

    async def one(session, prompt, rec):
        t0 = time.perf_counter()
        last = t0
        itls = []
        n_tok = 0
        async with session.post(f"{base}/v1/completions", json={
                "prompt": prompt, "max_tokens": args.max_tokens,
                "temperature": 0.0, "ignore_eos": True,
                "stream": True}) as r:
            assert r.status == 200, await r.text()
            async for raw in r.content:
                line = raw.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                payload = json.loads(line[6:])
                now = time.perf_counter()
                new = len(payload["choices"][0].get("token_ids", []))
                if new and n_tok == 0:
                    rec["ttft"] = now - t0
                elif new:
                    itls.append((now - last) / new)
                if new:
                    n_tok += new
                    last = now
        rec["e2e"] = time.perf_counter() - t0
        rec["n_tokens"] = n_tok
        rec["tpot"] = (rec["e2e"] - rec.get("ttft", 0)) / max(n_tok - 1, 1)
        rec["itl_mean"] = float(np.mean(itls)) if itls else 0.0

    async def drive():
        async with aiohttp.ClientSession() as session:
            for _ in range(240):
                try:
                    async with session.get(f"{base}/health") as r:
                        if r.status == 200:
                            break
                except aiohttp.ClientError:
                    pass
                await asyncio.sleep(1.0)
            else:
                raise RuntimeError("server never became healthy")
            # warmup (compiles)
            w = {}
            await one(session, prompts[0], w)
            recs = [{} for _ in range(args.num_requests)]
            t0 = time.perf_counter()
            sem = asyncio.Semaphore(args.concurrency)

            async def task(i):
                async with sem:
                    await one(session, prompts[i], recs[i])

            await asyncio.gather(*(task(i)
                                   for i in range(args.num_requests)))
            wall = time.perf_counter() - t0
            return recs, wall

    try:
        recs, wall = asyncio.run(drive())
    finally:
        srv.send_signal(signal.SIGTERM)
        try:
            srv.wait(timeout=10)
        except subprocess.TimeoutExpired:
            srv.kill()
        os.unlink(cfg_path)
    toks = sum(r["n_tokens"] for r in recs)
    summary = {
        "mode": "http", "pipeline": "llm",
        "concurrency": args.concurrency,
        "num_requests": args.num_requests,
        "prompt_len": args.prompt_len, "max_tokens": args.max_tokens,
        "ttft_mean_s": float(np.mean([r["ttft"] for r in recs])),
        "ttft_p99_s": float(np.percentile([r["ttft"] for r in recs], 99)),
        "tpot_mean_s": float(np.mean([r["tpot"] for r in recs])),
        "itl_mean_s": float(np.mean([r["itl_mean"] for r in recs])),
        "e2e_mean_s": float(np.mean([r["e2e"] for r in recs])),
        "wall_s": wall, "output_tok_per_s": toks / wall,
    }
    with open(f"{args.out}.http.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


def main(args=None) -> None:
    if args is None:
        ap = argparse.ArgumentParser()
        ap.add_argument("--pipeline", default="tts",
                        choices=["llm", "tts", "t2i"])
        ap.add_argument("--stage-configs-path", default=None)
        ap.add_argument("--num-requests", type=int, default=8)
        ap.add_argument("--concurrency", type=int, default=4)
        ap.add_argument("--prompt-len", type=int, default=64)
        ap.add_argument("--max-tokens", type=int, default=100)
        ap.add_argument("--http", action="store_true",
                        help="spawn the aiohttp server and bench over "
                             "HTTP")
        ap.add_argument("--out", default="/tmp/omni_bench")
        args = ap.parse_args()
    if args.http:
        bench_http(args)
        return

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
