"""Safetensors checkpoint loading round-trip (HF naming → param pytree).

Builds an HF-format dir (config.json + model.safetensors) from a
random-init pytree, loads it through the real loader, and checks forward
equivalence — covers name mapping, transposes, MoE expert stacking, and
quantize-on-load.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.config.engine import ModelConfig
from vllm_omni_tpu.models.decoder import (DecoderConfig, compute_logits,
                                          decoder_forward, init_params)
from vllm_omni_tpu.models.weights import load_model
from vllm_omni_tpu.ops.attention import mha_xla

HF_DENSE = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 96, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
    "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
}
HF_MOE = dict(HF_DENSE, architectures=["Qwen3MoeForCausalLM"],
              num_experts=4, num_experts_per_tok=2,
              moe_intermediate_size=16, intermediate_size=0)


def export_hf(params, cfg: DecoderConfig, path):
    """init_params pytree → HF-named safetensors (transposed back)."""
    from safetensors.numpy import save_file

    t = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr, np.float32)
        t[name] = a.T.copy() if transpose else a

    put("model.embed_tokens.weight", params["embed"])
    put("model.norm.weight", params["final_norm"])
    if "lm_head" in params:
        put("lm_head.weight", params["lm_head"]["w"], transpose=True)
    for i, layer in enumerate(params["layers"]):
        p = f"model.layers.{i}."
        put(p + "input_layernorm.weight", layer["input_norm"])
        put(p + "post_attention_layernorm.weight", layer["post_norm"])
        for n in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put(p + f"self_attn.{n}.weight", layer[n]["w"],
                transpose=True)
            if "b" in layer[n]:
                put(p + f"self_attn.{n}.bias", layer[n]["b"])
        if cfg.qk_norm:
            put(p + "self_attn.q_norm.weight", layer["q_norm"])
            put(p + "self_attn.k_norm.weight", layer["k_norm"])
        if cfg.is_moe:
            put(p + "mlp.gate.weight", layer["router"]["w"],
                transpose=True)
            for e in range(cfg.num_experts):
                for hfn, ours in (("gate_proj", "gate"), ("up_proj", "up"),
                                  ("down_proj", "down")):
                    put(p + f"mlp.experts.{e}.{hfn}.weight",
                        layer["experts"][ours][e], transpose=True)
        else:
            for n in ("gate_proj", "up_proj", "down_proj"):
                put(p + f"mlp.{n}.weight", layer[n]["w"], transpose=True)
    save_file(t, str(path / "model.safetensors"))


@pytest.mark.parametrize("hf", [HF_DENSE, HF_MOE], ids=["dense", "moe"])
def test_load_roundtrip(tmp_path, hf):
    from vllm_omni_tpu.models.weights import hf_config_to_decoder_config

    cfg = hf_config_to_decoder_config(hf)
    params = init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    (tmp_path / "config.json").write_text(json.dumps(hf))
    export_hf(params, cfg, tmp_path)

    loaded_cfg, loaded, raw_hf = load_model(
        ModelConfig(model=str(tmp_path), dtype="float32"))
    assert loaded_cfg == cfg
    assert raw_hf["eos_token_id"] == 0

    ids = jnp.arange(12).reshape(1, 12)
    pos = jnp.arange(12).reshape(1, 12)

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    ref = compute_logits(params, cfg,
                         decoder_forward(params, cfg, ids, pos, attn))
    got = compute_logits(loaded, cfg,
                         decoder_forward(loaded, cfg, ids, pos, attn))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_load_with_quantize_on_load(tmp_path):
    from vllm_omni_tpu.models.weights import hf_config_to_decoder_config

    cfg = hf_config_to_decoder_config(HF_DENSE)
    params = init_params(cfg, jax.random.PRNGKey(3), jnp.float32)
    (tmp_path / "config.json").write_text(json.dumps(HF_DENSE))
    export_hf(params, cfg, tmp_path)
    _, loaded, _ = load_model(ModelConfig(
        model=str(tmp_path), dtype="float32", quantization="int8"))
    layer0 = loaded["layers"][0]
    proj = layer0.get("qkv_proj") or layer0["q_proj"]  # fused by default
    assert proj["w_q"].dtype == jnp.int8
    # numerics stay close after int8 quantization
    ids = jnp.arange(12).reshape(1, 12)
    pos = jnp.arange(12).reshape(1, 12)

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    ref = compute_logits(params, cfg,
                         decoder_forward(params, cfg, ids, pos, attn))
    got = compute_logits(loaded, cfg,
                         decoder_forward(loaded, cfg, ids, pos, attn))
    err = np.max(np.abs(np.asarray(ref) - np.asarray(got)))
    assert err / (np.max(np.abs(np.asarray(ref))) + 1e-6) < 0.15
