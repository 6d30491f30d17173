"""TTFT decomposition at the bench config (512-token prefill, 8B int8
W8A8, 1 chip) — VERDICT r4 weak-1: nobody measured where the other half
of TTFT goes (kernel vs dispatch vs scheduling).

Layers timed independently, innermost first:
  A. pure jitted prefill step fn (device time, block_until_ready)
  B. decoder_forward alone (no paged-KV writes, no sampler)
  C. compute_logits alone
  D. engine-level TTFT (scheduler + host prep + dispatch + sync)
The A-D ladder attributes the gap: D-A = host/scheduling, A-B-C =
KV-write + sampler + step plumbing, B vs roofline = kernel efficiency.

Run on the real chip:  python benchmarks/profile_ttft.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

LLAMA8B_HF = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128256, "hidden_size": 4096,
    "intermediate_size": 14336, "num_hidden_layers": 32,
    "num_attention_heads": 32, "num_key_value_heads": 8, "head_dim": 128,
    "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False, "eos_token_id": 128001,
}
T = 512


def med(f, n=5, warm=2):
    for _ in range(warm):
        f()
    ts = []
    for _ in range(n):
        t0 = time.time()
        f()
        ts.append((time.time() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    print("platform:", jax.devices()[0])
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=LLAMA8B_HF, dtype="bfloat16",
        quantization="int8", kv_cache_dtype="bfloat16",
        max_model_len=768, page_size=16, memory_fraction=0.72,
        max_num_seqs=64, max_num_batched_tokens=1024, multi_step=16,
        decode_bs_buckets=(32, 64), prefill_token_buckets=(128, 512, 1024))
    t0 = time.time()
    engine = EngineCore(config)
    print(f"engine init {time.time() - t0:.1f}s")
    r = engine.runner
    cfg = r.cfg

    # ---- D. engine-level TTFT
    def ttft(seed):
        sp = SamplingParams(max_tokens=1, temperature=0.0,
                            ignore_eos=True)
        prompt = [(11 * seed + j) % 32000 + 1 for j in range(T)]
        t0 = time.time()
        engine.add_request(prompt, sp)
        while engine.has_unfinished():
            for out in engine.step():
                if out.finished:
                    return (time.time() - t0) * 1e3
        raise AssertionError

    ttft(0)
    d_ms = sorted(ttft(i + 1) for i in range(5))[2]
    print(f"D engine TTFT          : {d_ms:7.2f} ms")

    # ---- A. pure prefill step fn at the same bucket (b=1, t=512)
    from vllm_omni_tpu.ops import sampler as sampler_ops

    b, t = 1, T
    pw = r._page_bucket(-(-(T + 1) // r.page_size))
    token_ids = np.random.randint(1, 32000, (b, t)).astype(np.int32)
    positions = np.arange(t, dtype=np.int32)[None].repeat(b, 0)
    slot_ids = np.arange(t, dtype=np.int32)[None].repeat(b, 0)
    bt = np.zeros((b, pw), np.int32)
    bt[0, :(-(-t // r.page_size))] = np.arange(-(-t // r.page_size))
    q_start = np.zeros((b,), np.int32)
    kv_lens = np.full((b,), t, np.int32)
    last_idx = np.full((b,), t - 1, np.int32)
    step_ctr = np.zeros((b,), np.int32)
    sampling = sampler_ops.make_sampling_arrays(
        [SamplingParams(max_tokens=1, temperature=0.0)])
    embeds = np.zeros((1,), np.float32)
    embeds_mask = np.zeros((b, t), bool)
    bias = np.zeros((1, 1), np.float32)
    pbuf = obuf = np.full((1, 1), -1, np.int32)
    fn = r._get_fn("prefill", return_hidden=False, with_embeds=False,
                   use_bias=False, use_penalties=False)

    def step_fn():
        out = fn(r.params, r.kv_pages, token_ids, positions, bt, q_start,
                 kv_lens, slot_ids, last_idx, sampling, step_ctr, embeds,
                 embeds_mask, bias, pbuf, obuf)
        r.kv_pages = out[2]
        jax.block_until_ready(out[0])

    a_ms = med(step_fn)
    print(f"A jitted prefill fn    : {a_ms:7.2f} ms")

    # ---- B. decoder_forward alone (dense mha, no paged KV)
    from vllm_omni_tpu.models.decoder import compute_logits, decoder_forward
    from vllm_omni_tpu.ops.attention import mha_xla

    @jax.jit
    def fwd_only(params, ids, pos):
        def attn(i, q, k, v):
            return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5,
                           causal=True)

        return decoder_forward(params, cfg, ids, pos, attn)

    ids_j = jnp.asarray(token_ids)
    pos_j = jnp.asarray(positions)
    b_ms = med(lambda: jax.block_until_ready(
        fwd_only(r.params, ids_j, pos_j)))
    print(f"B decoder_forward only : {b_ms:7.2f} ms")

    # ---- C. logits head alone (last position)
    h = fwd_only(r.params, ids_j, pos_j)

    @jax.jit
    def logits_only(params, hh):
        return compute_logits(params, cfg, hh[:, -1:])

    c_ms = med(lambda: jax.block_until_ready(logits_only(r.params, h)))
    print(f"C logits head (1 tok)  : {c_ms:7.2f} ms")

    # ---- roofline anchors
    pl = 2 * 8.03e9 * T  # 2·params·tokens
    print(f"roofline: {pl / 394e12 * 1e3:6.1f} ms int8-peak / "
          f"{pl / 197e12 * 1e3:6.1f} ms bf16-peak (v5e)")
    print(f"attribution: host+sched={d_ms - a_ms:.2f} ms, "
          f"kv+sampler+plumbing={a_ms - b_ms - c_ms:.2f} ms, "
          f"forward={b_ms:.2f} ms, logits={c_ms:.2f} ms")


if __name__ == "__main__":
    main()
