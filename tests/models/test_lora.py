"""LoRA adapter tests (reference: tests/diffusion lora suites)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.models.decoder import (DecoderConfig, decoder_forward,
                                          init_params)
from vllm_omni_tpu.models.lora import (LoRAManager, attach, detach,
                                       init_lora, merge)
from vllm_omni_tpu.models.weights import quantize_params
from vllm_omni_tpu.ops.attention import mha_xla

CFG = DecoderConfig(vocab_size=64, hidden_size=32, intermediate_size=64,
                    num_layers=2, num_heads=2, num_kv_heads=2, head_dim=16)


def fwd(params):
    ids = jnp.arange(8).reshape(1, 8)
    pos = jnp.arange(8).reshape(1, 8)

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=0.25, causal=True)

    return np.asarray(decoder_forward(params, CFG, ids, pos, attn))


def make_nonzero_lora(params, key):
    lora = init_lora(params, rank=4, key=key)

    def fill(node, name):
        if isinstance(node, dict):
            if "lora_b" in node:
                node["lora_b"] = jax.random.normal(
                    key, node["lora_b"].shape, jnp.float32) * 0.1
            else:
                for k, v in node.items():
                    fill(v, k)
        elif isinstance(node, list):
            for v in node:
                fill(v, name)

    fill(lora, "")
    return lora


def test_zero_init_lora_is_identity():
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    lora = init_lora(params, rank=4)
    np.testing.assert_allclose(fwd(attach(params, lora)), fwd(params),
                               rtol=1e-6, atol=1e-6)


def test_attach_detach_and_effect():
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    lora = make_nonzero_lora(params, jax.random.PRNGKey(7))
    with_lora = attach(params, lora)
    assert not np.allclose(fwd(with_lora), fwd(params))
    np.testing.assert_allclose(fwd(detach(with_lora)), fwd(params))


def test_merge_matches_runtime_add():
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    lora = make_nonzero_lora(params, jax.random.PRNGKey(7))
    runtime = fwd(attach(params, lora))
    merged = fwd(merge(attach(params, lora)))
    np.testing.assert_allclose(merged, runtime, rtol=1e-4, atol=1e-5)


def test_lora_on_quantized_base():
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    qp = quantize_params(jax.tree.map(lambda x: x, params), "int8")
    lora = make_nonzero_lora(params, jax.random.PRNGKey(7))
    base = fwd(qp)
    with_lora = fwd(attach(qp, lora))
    assert not np.allclose(base, with_lora)


def test_manager_and_engine_reload():
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    hf = {"architectures": ["LlamaForCausalLM"], "vocab_size": 64,
          "hidden_size": 32, "intermediate_size": 64,
          "num_hidden_layers": 2, "num_attention_heads": 2,
          "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0}
    eng = EngineCore(EngineConfig.from_kwargs(
        model="dummy", hf_overrides=hf, dtype="float32",
        max_model_len=64, num_pages=16, page_size=16))
    mgr = LoRAManager(eng.runner.params)
    mgr.register("style-a", make_nonzero_lora(eng.runner.params,
                                              jax.random.PRNGKey(9)))
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)

    def gen():
        rid = eng.add_request(list(range(1, 9)), sp)
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    return o.outputs[0].token_ids

    base_out = gen()
    eng.reload_weights(mgr.activate("style-a", scale=4.0))
    lora_out = gen()
    eng.reload_weights(mgr.activate(None))
    restored = gen()
    assert base_out == restored
    assert base_out != lora_out
