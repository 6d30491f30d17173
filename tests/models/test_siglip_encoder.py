"""SigLIP vision tower golden parity vs GENUINE transformers.

The HunyuanVideo15 I2V pipeline feeds SiglipVisionModel
last_hidden_state tokens to the transformer's image_embedder
(pipeline_hunyuan_video_1_5_i2v.py:135, :358). The generic ViT stack
in models/encoders.py covers SigLIP once the patch-conv bias and the
tanh-GELU are honored — this golden pins that against a real
transformers forward (not a hand-written oracle)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.encoders import (  # noqa: E402
    load_clip_vision_encoder, vision_encoder_forward)

TINY_SIGLIP = dict(hidden_size=16, intermediate_size=32,
                   num_hidden_layers=2, num_attention_heads=2,
                   num_channels=3, image_size=32, patch_size=8,
                   hidden_act="gelu_pytorch_tanh",
                   layer_norm_eps=1e-6)


@pytest.fixture(scope="module")
def siglip_ckpt(tmp_path_factory):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    torch.manual_seed(0)
    model = SiglipVisionModel(SiglipVisionConfig(**TINY_SIGLIP)).eval()
    d = tmp_path_factory.mktemp("siglip_tiny")
    model.save_pretrained(d)
    return str(d), model


def test_siglip_golden_parity(siglip_ckpt):
    path, model = siglip_ckpt
    cfg, params = load_clip_vision_encoder(path, dtype=jnp.float32)
    assert cfg.act == "gelu_pytorch_tanh"
    assert not cfg.use_cls_token and not cfg.use_pre_ln
    assert "b" in params["patch_embed"]

    rng = np.random.default_rng(1)
    pix = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(
            pix.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    got = np.asarray(vision_encoder_forward(
        params, cfg, jnp.asarray(pix)))
    assert got.shape == want.shape == (1, 16, 16)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)
