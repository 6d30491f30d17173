"""Golden parity for the real text encoders vs installed transformers.

Same method as tests/models/test_hf_checkpoint_parity.py: tiny
random-weight HF models are saved with save_pretrained and reloaded
through our loader; outputs must match the genuine transformers
forward — the strongest oracle available in this environment (the
reference encodes prompts with exactly these classes:
diffusion/models/t5_encoder/t5_encoder.py, pipeline_flux.py
text_encoder/text_encoder_2)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.text_encoder import (  # noqa: E402
    CLIPTextConfigJ, T5EncoderConfig, assign_clip_text_tensor,
    assign_t5_tensor, clip_text_encode, init_clip_text_params,
    init_t5_params, load_text_encoder, t5_encode)


def _load_from_hf(model, cfg, init_fn, assign_fn):
    params = init_fn(cfg, jnp.float32)
    unmapped = []
    for name, t in model.state_dict().items():
        if not assign_fn(params, name, t.detach().numpy(), jnp.float32):
            unmapped.append(name)
    # embed_tokens may alias shared; everything else must map
    unmapped = [n for n in unmapped if "embed_tokens" not in n]
    assert not unmapped, unmapped
    return params


@pytest.mark.parametrize("gated", [False, True])
def test_t5_encoder_parity(gated):
    from transformers import T5Config, T5EncoderModel

    hf_cfg = T5Config(
        vocab_size=96, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu" if gated else "relu",
        dropout_rate=0.0)
    torch.manual_seed(0)
    model = T5EncoderModel(hf_cfg).eval()
    cfg = T5EncoderConfig.from_json(hf_cfg.to_dict())
    assert cfg.is_gated_act == gated and not cfg.per_layer_bias
    params = _load_from_hf(model, cfg, init_t5_params, assign_t5_tensor)
    ids = torch.randint(0, 96, (2, 11),
                        generator=torch.Generator().manual_seed(1))
    mask = torch.ones(2, 11, dtype=torch.long)
    mask[1, 7:] = 0  # padded row
    with torch.no_grad():
        want = model(input_ids=ids, attention_mask=mask
                     ).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids.numpy()),
                               jnp.asarray(mask.numpy())))
    # padded positions diverge (we don't zero them; HF doesn't either —
    # but they attend to nothing so both are defined); compare valid
    np.testing.assert_allclose(got[0], want[0], atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(got[1, :7], want[1, :7], atol=2e-4,
                               rtol=2e-3)


def test_umt5_encoder_parity():
    from transformers import UMT5Config, UMT5EncoderModel

    hf_cfg = UMT5Config(
        vocab_size=80, d_model=32, d_kv=8, d_ff=64, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(0)
    model = UMT5EncoderModel(hf_cfg).eval()
    cfg = T5EncoderConfig.from_json(hf_cfg.to_dict())
    assert cfg.per_layer_bias  # UMT5: every layer owns a bias table
    params = _load_from_hf(model, cfg, init_t5_params, assign_t5_tensor)
    assert all("rel_bias" in l for l in params["layers"])
    ids = torch.randint(0, 80, (1, 9),
                        generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        want = model(input_ids=ids).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


@pytest.mark.parametrize("projection", [False, True])
def test_clip_text_parity(projection):
    from transformers import (CLIPTextConfig, CLIPTextModel,
                              CLIPTextModelWithProjection)

    hf_cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=16, hidden_act="quick_gelu",
        eos_token_id=98, projection_dim=24)
    torch.manual_seed(0)
    cls = CLIPTextModelWithProjection if projection else CLIPTextModel
    model = cls(hf_cfg).eval()
    cfg_json = hf_cfg.to_dict()
    if not projection:
        cfg_json["projection_dim"] = None
    cfg = CLIPTextConfigJ.from_json(cfg_json)
    params = _load_from_hf(model, cfg, init_clip_text_params,
                           assign_clip_text_tensor)
    ids = torch.randint(0, 97, (2, 12),
                        generator=torch.Generator().manual_seed(3))
    ids[0, 5] = 98  # eos mid-sequence exercises pooling position
    ids[1, 11] = 98
    with torch.no_grad():
        out = model(input_ids=ids)
    seq, pooled = clip_text_encode(params, cfg, jnp.asarray(ids.numpy()))
    want_seq = out.last_hidden_state.numpy()
    want_pool = (out.text_embeds if projection
                 else out.pooler_output).numpy()
    np.testing.assert_allclose(np.asarray(seq), want_seq, atol=2e-4,
                               rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), want_pool, atol=2e-4,
                               rtol=2e-3)


def test_load_text_encoder_from_subfolder(tmp_path):
    """save_pretrained layout under pipeline/text_encoder/ loads through
    load_text_encoder with full tensor mapping."""
    from transformers import T5Config, T5EncoderModel

    hf_cfg = T5Config(
        vocab_size=64, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(1)
    model = T5EncoderModel(hf_cfg).eval()
    model.save_pretrained(str(tmp_path / "text_encoder"))
    kind, cfg, params = load_text_encoder(str(tmp_path), "text_encoder",
                                          dtype=jnp.float32)
    assert kind == "t5"
    ids = torch.randint(0, 64, (1, 7),
                        generator=torch.Generator().manual_seed(4))
    with torch.no_grad():
        want = model(input_ids=ids).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, cfg, jnp.asarray(ids.numpy())))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)
