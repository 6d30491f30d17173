"""Z-Image real-geometry family + diffusers loader tests.

Same method as the sibling loader tests: genuine checkpoint layout
(ZImageTransformer2DModel naming — ModuleDict x_embedder/final_layer
keyed "2-1", llama w1/w3/w2 FF, separate to_q/to_k/to_v), independent
torch oracle re-deriving the reference semantics
(diffusion/models/z_image/z_image_transformer.py:578 + pipeline
conventions :690-770: t = 1-σ input, negative-velocity output,
pos + s·(pos-neg) CFG)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.z_image import (  # noqa: E402
    SEQ_MULTI_OF, ZImageConfig, z_image_forward)

TINY = dict(all_patch_size=[2], all_f_patch_size=[1], in_channels=4,
            dim=24, n_layers=2, n_refiner_layers=1, n_heads=2,
            n_kv_heads=1, norm_eps=1e-5, qk_norm=True, cap_feat_dim=12,
            rope_theta=256.0, t_scale=1000.0, axes_dims=[4, 4, 4],
            axes_lens=[256, 64, 64])
D = TINY["dim"]
HD = D // TINY["n_heads"]
KV = TINY["n_kv_heads"] * HD
FH = int(D / 3 * 8)
ADALN = min(D, 256)
TOK = 2 * 2 * TINY["in_channels"]


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    def put_rms(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5

    put("all_x_embedder.2-1", D, TOK)
    put("all_final_layer.2-1.linear", TOK, D)
    put("all_final_layer.2-1.adaLN_modulation.1", D, ADALN)
    put("t_embedder.mlp.0", 1024, 256)
    put("t_embedder.mlp.2", ADALN, 1024)
    put_rms("cap_embedder.0", TINY["cap_feat_dim"])
    put("cap_embedder.1", D, TINY["cap_feat_dim"])
    sd["x_pad_token"] = torch.randn(1, D, generator=g) * 0.1
    sd["cap_pad_token"] = torch.randn(1, D, generator=g) * 0.1

    def put_block(p, modulation):
        put(f"{p}.attention.to_q", D, D, bias=False)
        put(f"{p}.attention.to_k", KV, D, bias=False)
        put(f"{p}.attention.to_v", KV, D, bias=False)
        put(f"{p}.attention.to_out.0", D, D, bias=False)
        put_rms(f"{p}.attention.norm_q", HD)
        put_rms(f"{p}.attention.norm_k", HD)
        put(f"{p}.feed_forward.w1", FH, D, bias=False)
        put(f"{p}.feed_forward.w3", FH, D, bias=False)
        put(f"{p}.feed_forward.w2", D, FH, bias=False)
        for nm in ("attention_norm1", "attention_norm2", "ffn_norm1",
                   "ffn_norm2"):
            put_rms(f"{p}.{nm}", D)
        if modulation:
            put(f"{p}.adaLN_modulation.0", 4 * D, ADALN)

    for i in range(TINY["n_refiner_layers"]):
        put_block(f"noise_refiner.{i}", True)
        put_block(f"context_refiner.{i}", False)
    for i in range(TINY["n_layers"]):
        put_block(f"layers.{i}", True)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("zimg_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "ZImagePipeline",
                   "transformer": ["diffusers",
                                   "ZImageTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"],
                   "text_encoder": ["transformers", "Qwen3Model"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "ZImageTransformer2DModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 3.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "latent_channels": 4,
                   "block_out_channels": [8, 16, 16, 16]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _axis_table(dim, length):
    inv = 1.0 / torch.pow(torch.tensor(TINY["rope_theta"]),
                          torch.arange(0, dim, 2).double() / dim)
    fr = torch.arange(length).double()[:, None] * inv[None, :]
    return fr


def _rope_from_ids(ids):
    """ids [S, 3] → cos/sin [S, HD//2]."""
    outs_c, outs_s = [], []
    for i, d in enumerate(TINY["axes_dims"]):
        fr = _axis_table(d, 4096)[ids[:, i].long()]
        outs_c.append(fr.cos())
        outs_s.append(fr.sin())
    return (torch.cat(outs_c, -1).float(), torch.cat(outs_s, -1).float())


def _apply_rope(x, cos, sin):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.stack([x1 * c - x2 * s, x2 * c + x1 * s],
                       dim=-1).reshape(x.shape)


def _oracle_forward(sd, lat_np, cap_np, t_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    cap_in = T(cap_np).float()
    t = T(t_np).float() * TINY["t_scale"]
    b, h, w, c = lat.shape
    p = 2
    nh, nkv = TINY["n_heads"], TINY["n_kv_heads"]

    def lin(x, name):
        out = x @ sd[f"{name}.weight"].float().T
        if f"{name}.bias" in sd:
            out = out + sd[f"{name}.bias"].float()
        return out

    def rms(x, name, eps):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * sd[f"{name}.weight"].float()

    # sinusoid(256) → mlp
    half = 128
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = t[:, None] * freqs[None, :]
    e = torch.cat([args.cos(), args.sin()], -1)
    temb = lin(torch.nn.functional.silu(lin(e, "t_embedder.mlp.0")),
               "t_embedder.mlp.2")

    # patchify (ph, pw, c) channel fastest
    x = lat.reshape(b, h // p, p, w // p, p, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
    x = lin(x, "all_x_embedder.2-1")
    n_img = x.shape[1]
    pad_img = (-n_img) % SEQ_MULTI_OF
    if pad_img:
        x = torch.cat([x, sd["x_pad_token"].float().expand(
            b, pad_img, -1)], dim=1)

    cap = rms(cap_in, "cap_embedder.0", TINY["norm_eps"])
    cap = lin(cap, "cap_embedder.1")
    cap_len = cap.shape[1]
    pad_cap = (-cap_len) % SEQ_MULTI_OF
    if pad_cap:
        cap = torch.cat([cap, sd["cap_pad_token"].float().expand(
            b, pad_cap, -1)], dim=1)
    cap_total = cap_len + pad_cap

    # position ids
    cap_ids = torch.stack([1 + torch.arange(cap_total),
                           torch.zeros(cap_total, dtype=torch.long),
                           torch.zeros(cap_total, dtype=torch.long)],
                          dim=-1)
    rows = torch.arange(h // p).repeat_interleave(w // p)
    cols = torch.arange(w // p).repeat(h // p)
    img_ids = torch.stack([torch.full_like(rows, cap_total + 1),
                           rows, cols], dim=-1)
    if pad_img:
        img_ids = torch.cat([img_ids,
                             torch.zeros(pad_img, 3, dtype=torch.long)])
    img_cos, img_sin = _rope_from_ids(img_ids)
    cap_cos, cap_sin = _rope_from_ids(cap_ids)

    def attention(xx, pfx, cos, sin):
        bb, s, _ = xx.shape
        q = lin(xx, f"{pfx}.to_q").view(bb, s, nh, HD)
        k = lin(xx, f"{pfx}.to_k").view(bb, s, nkv, HD)
        v = lin(xx, f"{pfx}.to_v").view(bb, s, nkv, HD)
        q = rms(q, f"{pfx}.norm_q", 1e-5)
        k = rms(k, f"{pfx}.norm_k", 1e-5)
        q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
        k = k.repeat_interleave(nh // nkv, dim=2)
        v = v.repeat_interleave(nh // nkv, dim=2)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return lin(o.transpose(1, 2).reshape(bb, s, nh * HD),
                   f"{pfx}.to_out.0")

    def ff(xx, pfx):
        return lin(torch.nn.functional.silu(lin(xx, f"{pfx}.w1")) *
                   lin(xx, f"{pfx}.w3"), f"{pfx}.w2")

    eps = TINY["norm_eps"]

    def block(xx, pfx, cos, sin, modulated):
        if modulated:
            mod = lin(temb, f"{pfx}.adaLN_modulation.0").unsqueeze(1)
            s_msa, g_msa, s_mlp, g_mlp = mod.chunk(4, dim=-1)
            g_msa, g_mlp = g_msa.tanh(), g_mlp.tanh()
            hh = rms(xx, f"{pfx}.attention_norm1", eps) * (1 + s_msa)
            attn = attention(hh, f"{pfx}.attention", cos, sin)
            xx = xx + g_msa * rms(attn, f"{pfx}.attention_norm2", eps)
            h2 = rms(xx, f"{pfx}.ffn_norm1", eps) * (1 + s_mlp)
            return xx + g_mlp * rms(ff(h2, f"{pfx}.feed_forward"),
                                    f"{pfx}.ffn_norm2", eps)
        hh = rms(xx, f"{pfx}.attention_norm1", eps)
        attn = attention(hh, f"{pfx}.attention", cos, sin)
        xx = xx + rms(attn, f"{pfx}.attention_norm2", eps)
        h2 = rms(xx, f"{pfx}.ffn_norm1", eps)
        return xx + rms(ff(h2, f"{pfx}.feed_forward"),
                        f"{pfx}.ffn_norm2", eps)

    for i in range(TINY["n_refiner_layers"]):
        x = block(x, f"noise_refiner.{i}", img_cos, img_sin, True)
        cap = block(cap, f"context_refiner.{i}", cap_cos, cap_sin,
                    False)

    uni = torch.cat([x, cap], dim=1)
    uni_cos = torch.cat([img_cos, cap_cos], dim=0)
    uni_sin = torch.cat([img_sin, cap_sin], dim=0)
    for i in range(TINY["n_layers"]):
        uni = block(uni, f"layers.{i}", uni_cos, uni_sin, True)

    scale = 1 + lin(torch.nn.functional.silu(temb),
                    "all_final_layer.2-1.adaLN_modulation.1")
    out = torch.nn.functional.layer_norm(uni, (D,), eps=1e-6) * \
        scale.unsqueeze(1)
    out = lin(out, "all_final_layer.2-1.linear")
    out = out[:, :n_img]
    out = out.reshape(b, h // p, w // p, p, p, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    return out.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "z_image"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, ZImageConfig)
    assert cfg.n_layers == 2 and cfg.patch_size == 2
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.z_image import (assign_z_image_tensor,
                                                 init_z_image_params)
    import jax

    params = init_z_image_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_z_image_tensor(params, n, t.numpy(),
                                             jnp.float32)]
    assert unmapped == []


def test_forward_parity_with_padding(pipeline_dir):
    """16 image tokens (pads to 32 with x_pad_token) + 5 caption tokens
    (pads to 32 with cap_pad_token) — exercises both learned pad paths,
    GQA (kv=1 vs heads=2), refiners and the unified stream."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(17)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    cap = rng.standard_normal((2, 5, TINY["cap_feat_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.3, 0.9], np.float32)  # model convention (1 - σ)
    ours = np.asarray(z_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(cap),
        jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), lat, cap, t)
    assert ours.shape == golden.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)


def test_pipeline_end_to_end(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "z_image"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny z-image test",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
