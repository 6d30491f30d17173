"""Decoder model unit tests (tiny random models, CPU tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.models.decoder import (DecoderConfig, compute_logits,
                                          decoder_forward, init_params,
                                          param_shardings)
from vllm_omni_tpu.models.weights import (hf_config_to_decoder_config,
                                          quantize_params)
from vllm_omni_tpu.ops.attention import mha_xla

TINY = DecoderConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                     num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
                     qk_norm=True)

TINY_MOE = DecoderConfig(vocab_size=128, hidden_size=64,
                         intermediate_size=0, num_layers=2, num_heads=4,
                         num_kv_heads=2, head_dim=16, num_experts=4,
                         num_experts_per_tok=2, moe_intermediate_size=32)


def dense_attn(i, q, k, v):
    return mha_xla(q, k, v, scale=q.shape[-1] ** -0.5, causal=True)


@pytest.mark.parametrize("cfg", [TINY, TINY_MOE], ids=["dense", "moe"])
def test_forward_shapes(cfg):
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ids = jnp.arange(10).reshape(1, 10) % cfg.vocab_size
    pos = jnp.arange(10).reshape(1, 10)
    h = decoder_forward(params, cfg, ids, pos, dense_attn)
    assert h.shape == (1, 10, cfg.hidden_size)
    logits = compute_logits(params, cfg, h)
    assert logits.shape == (1, 10, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(logits)))


def test_quantized_forward_close():
    cfg = TINY
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ids = jnp.arange(8).reshape(1, 8)
    pos = jnp.arange(8).reshape(1, 8)
    ref = compute_logits(params, cfg,
                         decoder_forward(params, cfg, ids, pos, dense_attn))
    for method, tol in [("int8", 0.15), ("fp8", 0.25)]:
        qp = quantize_params(jax.tree.map(lambda x: x, params), method)
        got = compute_logits(qp, cfg,
                             decoder_forward(qp, cfg, ids, pos, dense_attn))
        err = np.max(np.abs(np.asarray(ref) - np.asarray(got)))
        scale = np.max(np.abs(np.asarray(ref))) + 1e-6
        assert err / scale < tol, (method, err, scale)


def test_hf_config_mapping():
    hf = {
        "architectures": ["Qwen3ForCausalLM"],
        "vocab_size": 1000, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "rope_theta": 1e6,
        "rms_norm_eps": 1e-6, "tie_word_embeddings": True,
    }
    cfg = hf_config_to_decoder_config(hf)
    assert cfg.qk_norm and cfg.tie_word_embeddings
    assert cfg.head_dim == 16 and cfg.rope_theta == 1e6

    hf_moe = dict(hf, architectures=["Qwen3MoeForCausalLM"],
                  num_experts=8, num_experts_per_tok=2,
                  moe_intermediate_size=32)
    cfg = hf_config_to_decoder_config(hf_moe)
    assert cfg.is_moe and cfg.num_experts == 8


def test_param_shardings_structure():
    params = init_params(TINY_MOE, jax.random.PRNGKey(0), jnp.float32)
    specs = param_shardings(params)
    # same tree structure
    jax.tree.map(lambda a, b: None, params, specs)
    assert specs["layers"][0]["q_proj"]["w"] == jax.sharding.PartitionSpec(
        None, "tp")
    assert specs["layers"][0]["o_proj"]["w"] == jax.sharding.PartitionSpec(
        "tp", None)
    assert specs["layers"][0]["experts"]["down"] == \
        jax.sharding.PartitionSpec(None, "tp", None)
