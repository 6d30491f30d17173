"""Split decode time: device chain program vs engine host overhead.

Times (a) raw ModelRunner.execute_decode_multi back-to-back, (b) the
full EngineCore.step loop, (c) lm_head variants. Identifies where the
fixed ~10 ms/pass from decode_ablation.py lives.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = 32
K = 16

LLAMA8B_HF = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128256, "hidden_size": 4096,
    "intermediate_size": 14336, "num_hidden_layers": 32,
    "num_attention_heads": 32, "num_key_value_heads": 8, "head_dim": 128,
    "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False, "eos_token_id": 128001,
}


def lm_head_bench():
    HBM_BW = 819e9
    H, V, M = 4096, 128256, 32
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (M, H), jnp.bfloat16)
    from vllm_omni_tpu.ops.quant import quantize_int8

    w = jax.random.normal(key, (H, V), jnp.float32) * 0.02
    wq, ws = jax.device_put(quantize_int8(w))
    wb = jax.device_put((w * 1).astype(jnp.bfloat16))
    del w

    # weights must be jit *arguments*: closure-captured arrays are baked
    # into the program as constants and blow up the remote-compile
    # request (HTTP 413 on the axon tunnel)
    cases = [
        ("lm_bf16", lambda c, w: jnp.dot(
            c, w, preferred_element_type=jnp.float32), wb, 2),
        ("lm_int8_up", lambda c, w: jnp.dot(
            c, w.astype(c.dtype),
            preferred_element_type=jnp.float32) * ws, wq, 1),
        ("lm_int8_native", lambda c, w: jnp.dot(
            (c * 8).astype(jnp.int8), w,
            preferred_element_type=jnp.int32).astype(jnp.float32)
            * (ws / 8), wq, 1),
    ]
    for name, f, w, itemsize in cases:
        def body(c, w, f=f):
            logits = f(c, w)
            ids = jnp.argmax(logits, axis=-1)
            # carry must DEPEND on the compute or XLA hoists the whole
            # body out of the fori_loop as loop-invariant
            dep = (ids[:, None] & 0).astype(c.dtype)
            return c + dep

        @jax.jit
        def prog(xx, w):
            return jax.lax.fori_loop(
                0, 64, lambda i, c: body(c, w), xx)

        jax.block_until_ready(prog(x, w))
        t0 = time.perf_counter()
        jax.block_until_ready(prog(x, w))
        dt = (time.perf_counter() - t0) / 64
        by = H * V * itemsize
        print(f"{name:12s} {dt*1e3:7.3f} ms  sol={by/HBM_BW*1e3:.3f} ms  "
              f"eff={100*by/HBM_BW/dt:5.1f}%", flush=True)


def chain_split():
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=LLAMA8B_HF, dtype="bfloat16",
        quantization="int8", kv_cache_dtype="bfloat16",
        max_model_len=512, page_size=16, memory_fraction=0.55,
        max_num_seqs=BATCH, max_num_batched_tokens=1024,
        multi_step=K, decode_bs_buckets=(BATCH,),
        prefill_token_buckets=(128, 256, 512, 1024))
    t0 = time.time()
    engine = EngineCore(config)
    print(f"engine init {time.time()-t0:.0f}s", flush=True)
    sp = SamplingParams(max_tokens=400, temperature=0.0, ignore_eos=True)
    for i in range(BATCH):
        engine.add_request([(i * 7 + j) % 1000 + 1 for j in range(120)], sp)
    while True:
        out = engine.scheduler.schedule()
        if not out.prefills:
            break
        res = engine.runner.execute_prefill(out.prefills)
        for i, s in enumerate(out.prefills):
            engine.scheduler.complete_prefill(s)
            if s.request.prefill_done:
                s.request.append_output_token(res.token_ids[i])

    reqs = list(engine.scheduler.running)
    # raw chains, bypassing scheduler/stop handling
    for r in reqs:
        engine.scheduler.block_manager.extend(r.page_ids, r.num_tokens,
                                              r.num_tokens + K)
    engine.runner.execute_decode_multi(reqs, K)  # warm compile
    for r in reqs:
        for _ in range(K):
            r.append_output_token(1)

    n_chains = 8
    t0 = time.perf_counter()
    for c in range(n_chains):
        for r in reqs:
            engine.scheduler.block_manager.extend(
                r.page_ids, r.num_tokens, r.num_tokens + K)
        results = engine.runner.execute_decode_multi(reqs, K)
        for r in reqs:
            for _ in range(K):
                r.append_output_token(1)
    dt_raw = (time.perf_counter() - t0) / (n_chains * K)
    print(f"raw chain: {dt_raw*1e3:7.2f} ms/pass "
          f"({BATCH/dt_raw:.0f} tok/s)", flush=True)
    print(f"decode cache hits/misses: {engine.runner.decode_cache_hits}/"
          f"{engine.runner.decode_cache_misses}", flush=True)

    # full engine loop
    t0 = time.perf_counter()
    steps = 0
    while engine.has_unfinished() and steps < 8:
        engine.step()
        steps += 1
    dt_full = (time.perf_counter() - t0) / (steps * K)
    print(f"engine.step: {dt_full*1e3:7.2f} ms/pass "
          f"({BATCH/dt_full:.0f} tok/s)", flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    lm_head_bench()
    chain_split()
