"""Golden-logit parity against HF transformers on REAL HF checkpoints.

Round-1 verdict: the loader had only ever round-tripped its own export.
Here the checkpoint is written by HF transformers' `save_pretrained`
(the genuine HF tensor naming / layout / dtype conventions — the same
bytes a hub download would produce; the hub itself is unreachable in
this zero-egress environment), and our logits must match the torch
model's teacher-forced logits.

Reference parity anchor: vLLM's weight loader + golden-logit accuracy
tests (reference tests/e2e/accuracy). Architectures: Llama (untied),
Qwen2 (attention bias + tied embeddings), Qwen3 (qk_norm + explicit
head_dim), Qwen3-MoE.
"""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import ModelConfig
from vllm_omni_tpu.models.weights import load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _save_hf(tmp_path, arch: str):
    """Build a tiny random-weight HF model and save_pretrained it."""
    torch.manual_seed(0)
    common = dict(vocab_size=256, hidden_size=64, intermediate_size=128,
                  num_hidden_layers=2, num_attention_heads=4,
                  num_key_value_heads=2, max_position_embeddings=512,
                  rope_theta=10000.0)
    if arch == "llama":
        cfg = transformers.LlamaConfig(tie_word_embeddings=False, **common)
        model = transformers.LlamaForCausalLM(cfg)
    elif arch == "qwen2":
        cfg = transformers.Qwen2Config(tie_word_embeddings=True, **common)
        model = transformers.Qwen2ForCausalLM(cfg)
    elif arch == "qwen3":
        cfg = transformers.Qwen3Config(head_dim=32, **common)
        model = transformers.Qwen3ForCausalLM(cfg)
    elif arch == "glm4":
        # GLM-4 (GLM-Image AR text core): sandwich norms, partial
        # rotary 0.5 with the hybrid glm4 application, fused gate_up
        cfg = transformers.Glm4Config(
            partial_rotary_factor=0.5, head_dim=16, pad_token_id=0,
            eos_token_id=3, attention_bias=True,
            tie_word_embeddings=False, **common)
        model = transformers.Glm4ForCausalLM(cfg)
    elif arch == "hunyuan_moe":
        # HunYuanMoEV1 (HunyuanImage3's AR backbone): per-head qk norms
        # named query/key_layernorm, softmax top-k routing with renorm,
        # UNGATED always-on shared MLP, mlp.gate.wg router naming
        cfg = transformers.HunYuanMoEV1Config(
            num_experts=4, moe_topk=2, moe_intermediate_size=128,
            attention_bias=False, tie_word_embeddings=False,
            pad_token_id=0, eos_token_id=3, head_dim=16, **common)
        model = transformers.HunYuanMoEV1ForCausalLM(cfg)
    elif arch == "qwen3_moe":
        cfg = transformers.Qwen3MoeConfig(
            head_dim=32, num_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=96, decoder_sparse_step=1,
            norm_topk_prob=True, **common)
        model = transformers.Qwen3MoeForCausalLM(cfg)
    elif arch == "qwen25_vl":
        # Qwen2.5-VL (qwen_image's text encoder): decoder fields nested
        # under text_config, vision tower under visual.* (skipped), and
        # language weights under model.language_model.* in transformers
        # ≥4.52
        vis = dict(depth=2, hidden_size=32, intermediate_size=64,
                   num_heads=2, out_hidden_size=64, patch_size=14,
                   spatial_merge_size=2, temporal_patch_size=2)
        cfg = transformers.Qwen2_5_VLConfig(
            text_config=dict(common, tie_word_embeddings=False,
                             rope_scaling={"type": "mrope",
                                           "mrope_section": [2, 3, 3]}),
            vision_config=vis)
        model = transformers.Qwen2_5_VLForConditionalGeneration(cfg)
    else:
        raise ValueError(arch)
    model = model.eval().to(torch.float32)
    d = tmp_path / arch
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def _jax_logits(path: str, token_ids: np.ndarray,
                quant=None) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    from vllm_omni_tpu.models.decoder import compute_logits, decoder_forward
    from vllm_omni_tpu.ops.attention import mha_xla

    cfg, params, _ = load_model(
        ModelConfig(model=path, dtype="float32", quantization=quant,
                    max_model_len=512))

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    @jax.jit
    def fwd(ids):
        pos = jnp.arange(ids.shape[1])[None, :]
        h = decoder_forward(params, cfg, ids, pos, attn)
        return compute_logits(params, cfg, h)

    return np.asarray(fwd(jnp.asarray(token_ids)))


@pytest.mark.parametrize("arch", ["llama", "qwen2", "qwen3", "qwen3_moe",
                                  "glm4", "hunyuan_moe", "qwen25_vl"])
def test_hf_checkpoint_golden_logits(tmp_path, arch):
    path, hf_model = _save_hf(tmp_path, arch)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 256, size=(2, 24), dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.float().numpy()
    got = _jax_logits(path, ids.astype(np.int32))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    # greedy argmax agreement everywhere (the serving-visible invariant)
    assert (got.argmax(-1) == ref.argmax(-1)).mean() > 0.99


def test_hf_checkpoint_int8_close(tmp_path):
    """Quantize-on-load from a real HF checkpoint stays near fp32."""
    path, hf_model = _save_hf(tmp_path, "llama")
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 256, size=(1, 16), dtype=np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids)).logits.float().numpy()
    got = _jax_logits(path, ids.astype(np.int32), quant="int8")
    # int8 weight-only: last-position greedy token must agree
    assert got[0, -1].argmax() == ref[0, -1].argmax()


def test_no_unmapped_tensors(tmp_path, caplog):
    """Every tensor in a real HF checkpoint must map into the pytree."""
    import logging

    path, _ = _save_hf(tmp_path, "qwen3_moe")
    with caplog.at_level(logging.WARNING):
        load_model(ModelConfig(model=path, dtype="float32",
                               max_model_len=512))
    assert not [r for r in caplog.records
                if "unmapped" in r.getMessage()], caplog.text
