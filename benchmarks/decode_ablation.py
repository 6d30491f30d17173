"""Decode hot-loop attribution by whole-model ablation.

Through the remote-dispatch tunnel, single-op microbenchmarks are
dominated by RPC jitter (~30 ms/call). Whole-engine decode runs for
seconds, so differences between model variants attribute time reliably:

  per-layer cost   = (t[32 layers] - t[16 layers]) / 16
  lm_head+sampler  =  t[V=128256] - t[V=2048]
  attention+KV     =  t[base]     - t[ctx-minimal]   (prompt 8 vs 120)

Usage: python benchmarks/decode_ablation.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

BATCH = 32
DECODE_STEPS = 128

BASE_HF = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128256, "hidden_size": 4096,
    "intermediate_size": 14336, "num_hidden_layers": 32,
    "num_attention_heads": 32, "num_key_value_heads": 8, "head_dim": 128,
    "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False, "eos_token_id": 128001,
}


def run_variant(name: str, hf: dict, prompt_len: int = 120,
                quant: str = "int8") -> float:
    """→ seconds per forward pass (weight-streaming pass) at BATCH."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=hf, dtype="bfloat16",
        quantization=quant, kv_cache_dtype="bfloat16",
        max_model_len=512, page_size=16, memory_fraction=0.55,
        max_num_seqs=BATCH, max_num_batched_tokens=1024,
        multi_step=16, decode_bs_buckets=(BATCH,),
        prefill_token_buckets=(128, 256, 512, 1024))
    t0 = time.time()
    engine = EngineCore(config)
    sys.stderr.write(f"[{name}] engine init {time.time()-t0:.0f}s\n")

    def round_(measure: bool) -> float:
        sp = SamplingParams(max_tokens=DECODE_STEPS, temperature=0.0,
                            ignore_eos=True)
        for i in range(BATCH):
            engine.add_request([(i * 7 + j) % 1000 + 1
                                for j in range(prompt_len)], sp)
        # drain prefills
        while True:
            out = engine.scheduler.schedule()
            if not out.prefills:
                for r in out.decodes:
                    pass
                break
            res = engine.runner.execute_prefill(out.prefills)
            for i, s in enumerate(out.prefills):
                engine.scheduler.complete_prefill(s)
                if s.request.prefill_done:
                    s.request.append_output_token(res.token_ids[i])
        t0 = time.time()
        steps = 0
        while engine.has_unfinished():
            for _ in engine.step():
                pass
            steps += 1
        dt = time.time() - t0
        return dt

    round_(False)  # warm compile
    dt = round_(True)
    passes = DECODE_STEPS  # per request; chains of 16
    per_pass = dt / passes
    toks = BATCH * DECODE_STEPS / dt
    print(f"{name:24s} {dt:6.2f}s  {per_pass*1e3:7.2f} ms/pass  "
          f"{toks:8.1f} tok/s", flush=True)
    del engine
    return per_pass


VARIANTS = {
    "base_32L": lambda: run_variant("base_32L", BASE_HF),
    "half_16L": lambda: run_variant(
        "half_16L", dict(BASE_HF, num_hidden_layers=16)),
    "tiny_vocab": lambda: run_variant(
        "tiny_vocab", dict(BASE_HF, vocab_size=2048, eos_token_id=1)),
    "short_ctx": lambda: run_variant("short_ctx", BASE_HF, prompt_len=8),
    "bf16": lambda: run_variant("bf16_weights", BASE_HF, quant=None),
}


def main() -> None:
    # each variant runs in its own subprocess: XLA donation/compile
    # caches otherwise pin the previous variant's 8 GB of weights and
    # the next engine init dies with RESOURCE_EXHAUSTED
    import json
    import subprocess

    results = {}
    for name in VARIANTS:
        for attempt in range(2):
            try:
                p = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), name],
                    capture_output=True, text=True, timeout=900)
                break
            except subprocess.TimeoutExpired:
                sys.stderr.write(f"[{name}] attempt {attempt} timed out "
                                 "(wedged compile tunnel?) — retrying\n")
                p = None
        if p is None:
            continue
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("RESULT ")]
        if not line:
            sys.stderr.write(f"[{name}] FAILED:\n{p.stdout[-2000:]}"
                             f"\n{p.stderr[-2000:]}\n")
            continue
        results[name] = json.loads(line[0][len("RESULT "):])["per_pass"]
        print(f"{name:24s} {results[name]*1e3:7.2f} ms/pass", flush=True)

    if "base_32L" in results and "half_16L" in results:
        per_layer = (results["base_32L"] - results["half_16L"]) / 16
        print("\n--- attribution (ms/pass) ---")
        print(f"per decoder layer : {per_layer*1e3:7.3f}  "
              f"(x32 = {per_layer*32*1e3:.2f})")
        if "tiny_vocab" in results:
            lm_head = results["base_32L"] - results["tiny_vocab"]
            print(f"lm_head + sampler : {lm_head*1e3:7.3f}")
            print(f"residual (fixed)  : "
                  f"{(results['base_32L'] - per_layer*32 - lm_head)*1e3:7.3f}")
        if "short_ctx" in results:
            print(f"attn ctx 120->8   : "
                  f"{(results['base_32L'] - results['short_ctx'])*1e3:7.3f}")
        if "bf16" in results:
            print(f"int8 vs bf16      : {results['base_32L']*1e3:.2f} vs "
                  f"{results['bf16']*1e3:.2f}")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        import json

        pp = VARIANTS[sys.argv[1]]()
        print("RESULT " + json.dumps({"per_pass": pp}), flush=True)
    else:
        main()
