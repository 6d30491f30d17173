"""Golden-feature parity for the Qwen2-VL vision tower against the real
HF module (transformers Qwen2VisionTransformerPretrainedModel — the ViT
the Qwen omni/VL families actually carry): merge-grouped patch order,
2D rotary attention, PatchMerger."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.qwen2vl_vision import (  # noqa: E402
    extract_patches, load_qwen2vl_vision_encoder, qwen2vl_vision_forward)


@pytest.fixture(scope="module")
def qwen2vl_ckpt(tmp_path_factory):
    from transformers.models.qwen2_vl.configuration_qwen2_vl import \
        Qwen2VLVisionConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import \
        Qwen2VisionTransformerPretrainedModel

    torch.manual_seed(0)
    cfg = Qwen2VLVisionConfig(
        depth=2, embed_dim=64, num_heads=4, mlp_ratio=2.0,
        in_channels=3, hidden_size=48, patch_size=4,
        spatial_merge_size=2, temporal_patch_size=2,
        hidden_act="quick_gelu")
    cfg._attn_implementation = "eager"
    model = Qwen2VisionTransformerPretrainedModel(cfg).eval().to(
        torch.float32)
    d = tmp_path_factory.mktemp("qwen2vl") / "ckpt"
    model.save_pretrained(d, safe_serialization=True)
    return str(d), model


def test_patch_extraction_matches_processor(qwen2vl_ckpt):
    """Our patch flattening must equal the HF image processor's
    merge-grouped layout (transpose(0,3,6,4,7,2,1,5,8))."""
    path, model = qwen2vl_ckpt
    cfg, params = load_qwen2vl_vision_encoder(path)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((16, 24, 3)).astype(np.float32)
    ours, gh, gw = extract_patches(jnp.asarray(img), cfg)
    assert (gh, gw) == (4, 6)
    # HF processor layout, replicated in numpy
    p, m, tps = cfg.patch_size, cfg.spatial_merge_size, \
        cfg.temporal_patch_size
    frames = np.stack([img.transpose(2, 0, 1)] * tps)  # [tps, C, H, W]
    x = frames.reshape(1, tps, 3, gh // m, m, p, gw // m, m, p)
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    want = x.reshape(gh * gw, 3 * tps * p * p)
    np.testing.assert_allclose(np.asarray(ours), want, rtol=0, atol=0)


def test_qwen2vl_vision_tower_parity(qwen2vl_ckpt):
    path, model = qwen2vl_ckpt
    cfg, params = load_qwen2vl_vision_encoder(path)
    assert cfg.depth == 2 and cfg.embed_dim == 64
    assert cfg.hidden_size == 48 and cfg.num_heads == 4
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 24, 3)).astype(np.float32)
    ours = np.asarray(qwen2vl_vision_forward(params, cfg,
                                             jnp.asarray(img)))
    patches, gh, gw = extract_patches(jnp.asarray(img), cfg)
    with torch.no_grad():
        theirs = model(
            torch.from_numpy(np.asarray(patches)),
            grid_thw=torch.tensor([[1, gh, gw]])).numpy()
    assert ours.shape == theirs.shape  # [gh*gw/4, 48]
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


def test_mm_processor_autodetects_qwen2vl(qwen2vl_ckpt):
    from vllm_omni_tpu.models.multimodal import MMProcessor

    path, model = qwen2vl_ckpt
    proc = MMProcessor(hidden_size=48,
                       spec={"image_token_id": 5,
                             "vision": {"weights_path": path}})
    rng = np.random.default_rng(3)
    img = rng.standard_normal((16, 24, 3)).astype(np.float32)
    feats = proc.encode_image(img)
    assert feats.shape == ((16 // 4 // 2) * (24 // 4 // 2), 48)
    assert proc.feature_rows("image", img) == feats.shape[0]
    patches, gh, gw = extract_patches(jnp.asarray(img), proc.vision_cfg)
    with torch.no_grad():
        theirs = model(torch.from_numpy(np.asarray(patches)),
                       grid_thw=torch.tensor([[1, gh, gw]])).numpy()
    np.testing.assert_allclose(feats, theirs, rtol=3e-4, atol=3e-4)


def test_prefixed_tower_loads(qwen2vl_ckpt, tmp_path):
    """omni checkpoints carry the tower under `visual.`."""
    import json
    import os

    from safetensors import safe_open
    from safetensors.numpy import save_file

    path, model = qwen2vl_ckpt
    src = [f for f in os.listdir(path) if f.endswith(".safetensors")][0]
    renamed = {}
    with safe_open(os.path.join(path, src), framework="numpy") as st:
        for name in st.keys():
            renamed["visual." + name] = st.get_tensor(name)
    d = tmp_path / "tower"
    d.mkdir()
    save_file(renamed, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"vision_config": {"num_heads": 4, "mlp_ratio": 2.0,
                                     "spatial_merge_size": 2,
                                     "hidden_act": "quick_gelu"}}, f)
    cfg, params = load_qwen2vl_vision_encoder(str(d))
    cfg2, params2 = load_qwen2vl_vision_encoder(path)
    rng = np.random.default_rng(2)
    img = rng.standard_normal((8, 8, 3)).astype(np.float32)
    a = np.asarray(qwen2vl_vision_forward(params, cfg, jnp.asarray(img)))
    b = np.asarray(qwen2vl_vision_forward(params2, cfg2,
                                          jnp.asarray(img)))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
