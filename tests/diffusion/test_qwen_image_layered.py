"""QwenImageLayered true multi-layer semantics (VERDICT r4 item 5).

The Layered pipeline denoises (layers+1) stacked latent frames jointly
— frame 0 is the recomposited input, frames 1..layers are the
decomposed RGBA layers — conditioned on the input image's latents at
rope frame −1, with per-layer rope frame positions
(QwenEmbedLayer3DRope) and an is_rgb `additional_t_cond` embedding in
the timestep conditioning (reference
pipeline_qwen_image_layered.py:585-860, qwen_image_transformer.py:160-
320)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.diffusion.test_qwen_image_loader import (  # noqa: E402
    TINY, _tiny_state_dict)
from vllm_omni_tpu.diffusion.qwen_image import (  # noqa: E402
    QwenImageConfig, assign_qwen_image_tensor, init_qwen_image_params,
    qwen_image_forward, qwen_image_rope, qwen_time_embed)

HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]


def test_layered_rope_matches_polar_reference():
    """Layered rope: per-layer frame positions 0..L−1, condition at
    frame −1, text start past max(h//2, w//2, layer_num) — vs a torch
    polar-arithmetic oracle of QwenEmbedLayer3DRope (:208-320)."""
    cfg = QwenImageConfig.from_json(TINY)
    layers, h, w, txt_len = 3, 4, 6, 5
    ch, cw = 8, 8  # condition grid
    cos, sin = qwen_image_rope(cfg, h, w, txt_len, cond_hw=(ch, cw),
                               layers=layers)

    d_t, d_h, d_w = cfg.axes_dims_rope

    def rope_params(index, dim):
        freqs = torch.outer(
            index.float(),
            1.0 / torch.pow(torch.tensor(10000.0),
                            torch.arange(0, dim, 2).float() / dim))
        return torch.polar(torch.ones_like(freqs), freqs)

    pos = torch.arange(4096)
    neg = torch.arange(4096).flip(0) * -1 - 1
    pos_f = [rope_params(pos, d) for d in (d_t, d_h, d_w)]
    neg_f = [rope_params(neg, d) for d in (d_t, d_h, d_w)]

    def grid(hh, ww, frame_freq):
        fh = torch.cat([neg_f[1][-(hh - hh // 2):],
                        pos_f[1][:hh // 2]], dim=0)
        fw = torch.cat([neg_f[2][-(ww - ww // 2):],
                        pos_f[2][:ww // 2]], dim=0)
        ff = frame_freq.view(1, 1, 1, -1).expand(1, hh, ww, -1)
        fh = fh.view(1, hh, 1, -1).expand(1, hh, ww, -1)
        fw = fw.view(1, 1, ww, -1).expand(1, hh, ww, -1)
        return torch.cat([ff, fh, fw], dim=-1).reshape(hh * ww, -1)

    vid = [grid(h, w, pos_f[0][i]) for i in range(layers)]
    vid.append(grid(ch, cw, neg_f[0][-1]))  # condition frame −1
    max_vid = max(h // 2, w // 2, ch // 2, cw // 2, layers)
    txt = torch.cat([pos_f[0], pos_f[1], pos_f[2]],
                    dim=1)[max_vid:max_vid + txt_len]
    want = torch.cat([txt, torch.cat(vid, dim=0)], dim=0)

    np.testing.assert_allclose(np.asarray(cos), want.real.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin), want.imag.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_additional_t_cond_embedding_parity():
    cfg = QwenImageConfig.from_json(
        dict(TINY, use_additional_t_cond=True))
    params = init_qwen_image_params(cfg, jax.random.PRNGKey(0),
                                    jnp.float32)
    table = np.random.default_rng(1).standard_normal(
        (2, HS)).astype(np.float32)
    assert assign_qwen_image_tensor(
        params, "time_text_embed.addition_t_embedding.weight", table,
        jnp.float32)
    t = jnp.asarray([0.4], jnp.float32)
    base = np.asarray(qwen_time_embed(params, t, jnp.float32))
    rgb0 = np.asarray(qwen_time_embed(params, t, jnp.float32,
                                      t_cond=jnp.asarray([0])))
    rgb1 = np.asarray(qwen_time_embed(params, t, jnp.float32,
                                      t_cond=jnp.asarray([1])))
    np.testing.assert_allclose(rgb0, base + table[0], rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(rgb1, base + table[1], rtol=1e-5,
                               atol=1e-5)
    # non-layered checkpoints don't ship the table → flag off → no slot
    plain = init_qwen_image_params(QwenImageConfig.from_json(TINY),
                                   jax.random.PRNGKey(0), jnp.float32)
    assert "addition_t_embedding" not in plain["time_embed"]
    assert not assign_qwen_image_tensor(
        plain, "time_text_embed.addition_t_embedding.weight", table,
        jnp.float32)


def test_layered_forward_shapes_and_layer_coupling():
    """5D stacked-layer forward returns per-layer velocities; layers
    attend jointly (changing layer 2's latents changes layer 0's
    velocity)."""
    cfg = QwenImageConfig.from_json(
        dict(TINY, use_additional_t_cond=True))
    params = init_qwen_image_params(cfg, jax.random.PRNGKey(3),
                                    jnp.float32)
    rng = np.random.default_rng(5)
    # init zeros the is_rgb table; load a real one so rows differ
    assert assign_qwen_image_tensor(
        params, "time_text_embed.addition_t_embedding.weight",
        rng.standard_normal((2, HS)).astype(np.float32) * 0.1,
        jnp.float32)
    lat = rng.standard_normal((1, 3, 8, 8, 4)).astype(np.float32)
    cond = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    txt = rng.standard_normal(
        (1, 5, TINY["joint_attention_dim"])).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    tc = jnp.asarray([0])
    v = np.asarray(qwen_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t), cond_latents=jnp.asarray(cond), t_cond=tc))
    assert v.shape == (1, 3, 8, 8, 4)
    lat2 = lat.copy()
    lat2[:, 2] += 0.3
    v2 = np.asarray(qwen_image_forward(
        params, cfg, jnp.asarray(lat2), jnp.asarray(txt),
        jnp.asarray(t), cond_latents=jnp.asarray(cond), t_cond=tc))
    assert np.abs(v2[:, 0] - v[:, 0]).max() > 1e-6
    # is_rgb flag routes a different embedding row
    v3 = np.asarray(qwen_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t), cond_latents=jnp.asarray(cond),
        t_cond=jnp.asarray([1])))
    assert np.abs(v3 - v).max() > 1e-6


def test_layered_pipeline_end_to_end(tmp_path):
    """A QwenImageLayeredPipeline dir decomposes an input image into
    `layers` separate images: stacked (layers+1)-frame denoise, frame 0
    dropped at decode (reference forward :838-845)."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    root = tmp_path / "qwen_layered"
    for d in ("transformer", "scheduler", "vae"):
        (root / d).mkdir(parents=True)
    tiny = dict(TINY, use_additional_t_cond=True)
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "QwenImageLayeredPipeline",
                   "transformer": ["diffusers",
                                   "QwenImageTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKLQwenImage"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "QwenImageTransformer2DModel",
                   **tiny}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 2.2}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLQwenImage", "z_dim": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)
    sd = _tiny_state_dict()
    g = torch.Generator().manual_seed(9)
    sd["time_text_embed.addition_t_embedding.weight"] = torch.randn(
        2, HS, generator=g) * 0.02
    save_file(sd, str(root / "transformer" /
                      "diffusion_pytorch_model.safetensors"))

    eng = DiffusionEngine(DiffusionConfig(
        model=str(root), dtype="float32",
        resolution_buckets=((32, 32),), flow_shift=1.0))
    pipe = eng.pipeline
    assert pipe.family == "qwen_image"
    assert pipe.family_cfg.use_additional_t_cond
    assert "Layered" in pipe.pipeline_class

    img = np.random.default_rng(2).uniform(
        -1, 1, (32, 32, 3)).astype(np.float32)
    out = eng.generate([DiffusionRequest(
        "r0", "decompose this image", DiffusionSamplingParams(
            num_inference_steps=2, height=32, width=32,
            guidance_scale=3.0, seed=0, output_type="np",
            extra_args={"layers": 2, "ref_image": img}))])[0]
    assert out.finished and out.error is None, out.error
    arr = np.asarray(out.images if out.images is not None
                     else out.video)
    # layers=2 → 3 denoised frames, frame 0 dropped → 2 layer images
    assert arr.shape == (2, 32, 32, 3)
    assert arr.dtype == np.uint8


def test_conditioned_steps_bypass_cache_accel(qwen_pipeline_dir=None,
                                              tmp_path_factory=None):
    """cache.enabled + a conditioned step body (ref/vace/layered) used
    to hand the cached arg list to a non-cached body — the conditioned
    path now steps aside from cache accel (reference
    _NO_CACHE_ACCELERATION registry role) instead of crashing."""
    from tests.diffusion.test_qwen_image_loader import (
        pipeline_dir as _)  # noqa: F401  (fixture import for reuse)
    import tempfile

    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.pipeline import DiffusionPipeline

    # build a plain qwen_image dir inline (Edit-style ref conditioning)
    import json as _json
    root = tempfile.mkdtemp()
    import os
    for d in ("transformer", "scheduler", "vae"):
        os.makedirs(os.path.join(root, d))
    with open(os.path.join(root, "model_index.json"), "w") as f:
        _json.dump({"_class_name": "QwenImageEditPipeline",
                    "transformer": ["diffusers",
                                    "QwenImageTransformer2DModel"],
                    "scheduler": ["diffusers",
                                  "FlowMatchEulerDiscreteScheduler"],
                    "vae": ["diffusers", "AutoencoderKLQwenImage"]}, f)
    with open(os.path.join(root, "transformer", "config.json"), "w") as f:
        _json.dump({"_class_name": "QwenImageTransformer2DModel",
                    **TINY}, f)
    with open(os.path.join(root, "scheduler",
                           "scheduler_config.json"), "w") as f:
        _json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                    "num_train_timesteps": 1000, "shift": 1.0}, f)
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        _json.dump({"_class_name": "AutoencoderKLQwenImage", "z_dim": 4,
                    "block_out_channels": [16, 32, 32, 32]}, f)
    save_file(_tiny_state_dict(), os.path.join(
        root, "transformer", "diffusion_pytorch_model.safetensors"))

    pipe = DiffusionPipeline(DiffusionConfig(
        model=root, dtype="float32", resolution_buckets=((32, 32),),
        flow_shift=1.0,
        cache={"backend": "tea_cache", "rel_l1_thresh": 1e9}))
    assert pipe.config.cache.enabled
    img = np.zeros((32, 32, 3), np.float32)
    st = pipe.prepare(DiffusionRequest(
        "r", "edit it", DiffusionSamplingParams(
            num_inference_steps=3, height=32, width=32,
            guidance_scale=1.0, seed=0, output_type="latent",
            extra_args={"ref_image": img})))
    assert st.ref_latents is not None
    while not st.done:
        pipe.denoise_step(st)  # used to TypeError on the cached branch
    assert np.isfinite(np.asarray(st.latents)).all()
