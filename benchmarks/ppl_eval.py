"""Perplexity evaluation: quantization quality vs full precision.

The BASELINE.md accuracy target is "ppl delta vs FP16 ≤ 0.1 at matched
bit-width" (reference quantization/overview.md). This tool computes
teacher-forced perplexity of a checkpoint at several quantization
settings over a token corpus and reports the deltas.

Usage:
  python benchmarks/ppl_eval.py --model /ckpts/llama-8b \
      --tokens corpus.npy --quant int8 int4 fp8 --seq-len 1024
  (corpus: .npy int32 [N] token stream, or omit for a synthetic stream)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def eval_ppl(model: str, hf_overrides: dict, quant, seq_len: int,
             tokens: np.ndarray, dtype: str = "bfloat16") -> float:
    """Teacher-forced perplexity over non-overlapping seq_len windows."""
    import jax
    import jax.numpy as jnp

    from vllm_omni_tpu.config.engine import ModelConfig
    from vllm_omni_tpu.models.decoder import compute_logits, decoder_forward
    from vllm_omni_tpu.models.weights import load_model
    from vllm_omni_tpu.ops.attention import mha_xla

    cfg, params, _ = load_model(ModelConfig(
        model=model, dtype=dtype, quantization=quant,
        hf_overrides=hf_overrides, max_model_len=seq_len + 1))

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    @jax.jit
    def window_nll(ids):
        # ids [1, T+1]: predict ids[1:] from ids[:-1]
        x = ids[:, :-1]
        pos = jnp.arange(x.shape[1])[None, :]
        hidden = decoder_forward(params, cfg, x, pos, attn)
        logits = compute_logits(params, cfg, hidden)  # [1, T, V]
        lp = jax.nn.log_softmax(logits, axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(lp, tgt[..., None], axis=-1)[..., 0]
        return jnp.sum(nll), nll.size

    total, count = 0.0, 0
    n_windows = len(tokens) // (seq_len + 1)
    for w in range(n_windows):
        chunk = tokens[w * (seq_len + 1):(w + 1) * (seq_len + 1)]
        s, n = window_nll(jnp.asarray(chunk[None], jnp.int32))
        total += float(s)
        count += int(n)
    return float(np.exp(total / max(count, 1)))


TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 2048, "hidden_size": 256, "intermediate_size": 512,
    "num_hidden_layers": 4, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 64, "eos_token_id": 0,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="dummy")
    ap.add_argument("--tokens", default=None,
                    help=".npy int32 token stream (else synthetic)")
    ap.add_argument("--quant", nargs="*",
                    default=["int8", "int4", "fp8"])
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--num-windows", type=int, default=4)
    args = ap.parse_args()

    hf = TINY_HF if args.model == "dummy" else {}
    if args.tokens:
        tokens = np.load(args.tokens).astype(np.int32)
    else:
        vocab = hf.get("vocab_size", 32000)
        tokens = np.random.default_rng(0).integers(
            1, vocab, args.num_windows * (args.seq_len + 1)).astype(
                np.int32)

    base = eval_ppl(args.model, hf, None, args.seq_len, tokens)
    report = {"base_ppl": base, "quant": {}}
    for q in args.quant:
        ppl = eval_ppl(args.model, hf, q, args.seq_len, tokens)
        report["quant"][q] = {"ppl": ppl, "delta": ppl - base}
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
