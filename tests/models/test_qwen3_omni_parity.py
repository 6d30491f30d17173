"""Golden parity of the Qwen3-Omni family vs HF transformers.

Builds a tiny random `Qwen3OmniMoeForConditionalGeneration`, saves it with
save_pretrained (genuine HF checkpoint layout — NOT our own exporter),
loads through `load_qwen3_omni_checkpoint`, and asserts numeric parity of
every tower: thinker text logits, talker hidden states, code-predictor
codes, code2wav waveform. Mirrors the reference's HF-numerics contract
(models/common/qwen3_code_predictor.py:1-12: exact f32 RMSNorm/RoPE).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _tiny_cfg():
    from transformers import Qwen3OmniMoeConfig
    from transformers.models.qwen3_omni_moe.configuration_qwen3_omni_moe \
        import (Qwen3OmniMoeCode2WavConfig, Qwen3OmniMoeTalkerConfig,
                Qwen3OmniMoeTextConfig, Qwen3OmniMoeThinkerConfig)

    text = dict(vocab_size=96, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, head_dim=8, rope_theta=10000.0,
                num_experts=4, num_experts_per_tok=2,
                moe_intermediate_size=16, decoder_sparse_step=1,
                mlp_only_layers=[], norm_topk_prob=True,
                rope_scaling={"rope_type": "default",
                              "mrope_section": [2, 1, 1]})
    audio = dict(d_model=32, encoder_attention_heads=2,
                 encoder_ffn_dim=48, encoder_layers=2, num_mel_bins=16,
                 max_source_positions=100, n_window=16,
                 output_dim=32, n_window_infer=32, conv_chunksize=100,
                 downsample_hidden_size=16)
    vision = dict(depth=2, hidden_size=24, intermediate_size=48,
                  num_heads=2, patch_size=4, temporal_patch_size=2,
                  spatial_merge_size=2, out_hidden_size=32,
                  deepstack_visual_indexes=[0, 1])
    thinker = Qwen3OmniMoeThinkerConfig(
        text_config=Qwen3OmniMoeTextConfig(**text).to_dict(),
        audio_config=audio, vision_config=vision)
    talker_text = dict(vocab_size=80, hidden_size=24,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, head_dim=8,
                       num_experts=4, num_experts_per_tok=2,
                       moe_intermediate_size=16,
                       shared_expert_intermediate_size=20,
                       intermediate_size=48, norm_topk_prob=True,
                       rope_scaling={"rope_type": "default",
                                     "mrope_section": [2, 1, 1]})
    cp = dict(vocab_size=80, hidden_size=24, intermediate_size=48,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, head_dim=8, num_code_groups=4,
              rope_scaling=None, sliding_window=None)
    talker = Qwen3OmniMoeTalkerConfig(
        text_config=talker_text, code_predictor_config=cp,
        num_code_groups=4, thinker_hidden_size=32,
        spatial_merge_size=2)
    c2w = Qwen3OmniMoeCode2WavConfig(
        codebook_size=40, hidden_size=16, num_quantizers=3,
        num_hidden_layers=2, num_attention_heads=2,
        num_key_value_heads=2, intermediate_size=32, sliding_window=8,
        upsample_rates=(2, 2), upsampling_ratios=(2,), decoder_dim=16)
    return Qwen3OmniMoeConfig(
        thinker_config=thinker.to_dict(), talker_config=talker.to_dict(),
        code2wav_config=c2w.to_dict())


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from transformers import Qwen3OmniMoeForConditionalGeneration

    torch.manual_seed(0)
    cfg = _tiny_cfg()
    model = Qwen3OmniMoeForConditionalGeneration(cfg)
    model = model.float().eval()
    path = tmp_path_factory.mktemp("qwen3omni")
    model.save_pretrained(path, safe_serialization=True)
    return model, str(path)


@pytest.fixture(scope="module")
def loaded(ckpt):
    from vllm_omni_tpu.models.qwen3_omni import load_qwen3_omni_checkpoint

    _, path = ckpt
    return load_qwen3_omni_checkpoint(path, dtype=jnp.float32)


def test_checkpoint_routes_all_tensors(loaded):
    # rotary inv_freq buffers etc. are not parameters; everything real
    # must be mapped
    leftovers = [n for n in loaded["unmapped"]
                 if "rotary" not in n and "inv_freq" not in n]
    assert leftovers == [], leftovers


def test_thinker_text_logits_parity(ckpt, loaded):
    from vllm_omni_tpu.models.decoder import compute_logits, decoder_forward
    from vllm_omni_tpu.ops.attention import mha_xla

    model, _ = ckpt
    cfg, params = loaded["thinker"]
    ids = torch.arange(1, 9)[None]
    with torch.no_grad():
        hf_out = model.thinker.model(input_ids=ids).last_hidden_state
        hf_logits = model.thinker.lm_head(hf_out)

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    pos = jnp.arange(8)[None]
    hidden = decoder_forward(params, cfg, jnp.asarray(ids.numpy()), pos,
                             attn)
    logits = compute_logits(params, cfg, hidden)
    np.testing.assert_allclose(np.asarray(logits), hf_logits.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_talker_hidden_parity(ckpt, loaded):
    from vllm_omni_tpu.models.decoder import decoder_forward
    from vllm_omni_tpu.ops.attention import mha_xla

    model, _ = ckpt
    cfg, params = loaded["talker"]
    torch.manual_seed(1)
    embeds = torch.randn(1, 6, cfg.hidden_size) * 0.1
    with torch.no_grad():
        hf_hidden = model.talker.model(
            inputs_embeds=embeds).last_hidden_state

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    pos = jnp.arange(6)[None]
    hidden = decoder_forward(params, cfg, None, pos, attn,
                             input_embeds=jnp.asarray(embeds.numpy()))
    np.testing.assert_allclose(np.asarray(hidden), hf_hidden.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_resize_mlp_parity(ckpt, loaded):
    from vllm_omni_tpu.models.qwen3_omni import resize_mlp

    model, _ = ckpt
    torch.manual_seed(2)
    x = torch.randn(3, 32)
    with torch.no_grad():
        hf = model.talker.text_projection(x)
    got = resize_mlp(loaded["talker_extras"]["text_projection"],
                     jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), hf.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_code_predictor_parity(ckpt, loaded):
    """Greedy MTP codes match an HF-driven reference loop exactly."""
    from vllm_omni_tpu.models.qwen3_omni import code_predictor_generate

    model, _ = ckpt
    cfg, params = loaded["code_predictor"]
    cp = model.talker.code_predictor
    torch.manual_seed(3)
    b = 2
    talker_hidden = torch.randn(b, cfg.hidden_size) * 0.2
    layer0_embed = torch.randn(b, cfg.hidden_size) * 0.2

    # HF reference loop: prefill [hidden, embed0], then greedy steps with
    # codec_embedding[g-1]
    seq = torch.stack([talker_hidden, layer0_embed], dim=1)
    ref_codes = []
    with torch.no_grad():
        for g in range(cfg.num_code_groups - 1):
            out = cp.model(inputs_embeds=seq)
            logits = cp.lm_head[g](out.last_hidden_state[:, -1])
            code = logits.argmax(-1)
            ref_codes.append(code)
            if g < cfg.num_code_groups - 2:
                emb = cp.model.codec_embedding[g](code)
                seq = torch.cat([seq, emb[:, None]], dim=1)
    ref = torch.stack(ref_codes, dim=1).numpy()  # [B, G-1]

    codes, summed = code_predictor_generate(
        params, cfg, jnp.asarray(talker_hidden.numpy()),
        jnp.asarray(layer0_embed.numpy()))
    np.testing.assert_array_equal(np.asarray(codes), ref)
    # summed residual embeddings match the sum of HF's embeds
    with torch.no_grad():
        ref_sum = sum(
            cp.model.codec_embedding[g](torch.as_tensor(ref[:, g]))
            for g in range(cfg.num_code_groups - 1)).numpy()
    np.testing.assert_allclose(np.asarray(summed), ref_sum, rtol=1e-4,
                               atol=1e-5)


def test_code2wav_parity(ckpt, loaded):
    from vllm_omni_tpu.models.qwen3_omni import code2wav_forward

    model, _ = ckpt
    cfg, params = loaded["code2wav"]
    torch.manual_seed(4)
    codes = torch.randint(0, cfg.codebook_size,
                          (1, cfg.num_quantizers, 12))
    with torch.no_grad():
        hf_wav = model.code2wav(codes).numpy()  # [B, 1, T]
    wav = code2wav_forward(params, cfg, jnp.asarray(codes.numpy()))
    assert wav.shape[1] == hf_wav.shape[-1]
    np.testing.assert_allclose(np.asarray(wav), hf_wav[:, 0], rtol=2e-3,
                               atol=2e-4)
