"""LongCat-Image real-geometry family + diffusers loader tests.

Flux-architecture blocks with flux-style checkpoint naming but no
pooled/guidance conditioning, (0,i,i) text rope ids, and per-token CFG
renormalization. Oracle re-derives the reference semantics
(diffusion/models/longcat_image/longcat_image_transformer.py:577 +
pipeline prepare_pos_ids :113 + cfg_normalize_function :467)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.longcat_image import (  # noqa: E402
    LongCatImageConfig, cfg_renormalize, longcat_image_forward)

TINY = dict(patch_size=1, in_channels=16, out_channels=16,
            num_layers=2, num_single_layers=2, attention_head_dim=16,
            num_attention_heads=2, joint_attention_dim=20,
            pooled_projection_dim=8, axes_dims_rope=[4, 6, 6])
HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]
MLP = 4 * HS


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    def put_rms(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5

    put("x_embedder", HS, TINY["in_channels"])
    put("context_embedder", HS, TINY["joint_attention_dim"])
    put("time_embed.timestep_embedder.linear_1", HS, 256)
    put("time_embed.timestep_embedder.linear_2", HS, HS)
    put("norm_out.linear", 2 * HS, HS)
    put("proj_out", TINY["out_channels"], HS)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        put(f"{p}.norm1.linear", 6 * HS, HS)
        put(f"{p}.norm1_context.linear", 6 * HS, HS)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_add_out"):
            put(f"{p}.attn.{nm}", HS, HS)
        put(f"{p}.attn.to_out.0", HS, HS)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            put_rms(f"{p}.attn.{nm}", TINY["attention_head_dim"])
        put(f"{p}.ff.net.0.proj", MLP, HS)
        put(f"{p}.ff.net.2", HS, MLP)
        put(f"{p}.ff_context.net.0.proj", MLP, HS)
        put(f"{p}.ff_context.net.2", HS, MLP)
    for i in range(TINY["num_single_layers"]):
        p = f"single_transformer_blocks.{i}"
        put(f"{p}.norm.linear", 3 * HS, HS)
        for nm in ("to_q", "to_k", "to_v"):
            put(f"{p}.attn.{nm}", HS, HS)
        put_rms(f"{p}.attn.norm_q", TINY["attention_head_dim"])
        put_rms(f"{p}.attn.norm_k", TINY["attention_head_dim"])
        put(f"{p}.proj_mlp", MLP, HS)
        put(f"{p}.proj_out", HS, HS + MLP)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("longcat_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "LongCatImagePipeline",
                   "transformer": ["diffusers",
                                   "LongCatImageTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"],
                   "text_encoder": ["transformers", "Qwen2_5_VLModel"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "LongCatImageTransformer2DModel",
                   **TINY}, f)
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


def _oracle_rope(h_tok, w_tok, txt_len):
    dims = TINY["axes_dims_rope"]
    rows = torch.arange(h_tok).repeat_interleave(w_tok).float()
    cols = torch.arange(w_tok).repeat(h_tok).float()
    zv = torch.zeros_like(rows)
    img_ids = torch.stack([zv, rows, cols], dim=-1)
    seq = torch.arange(txt_len).float()
    zt = torch.zeros(txt_len)
    txt_ids = torch.stack([zt, seq, seq], dim=-1)
    ids = torch.cat([txt_ids, img_ids], dim=0)
    cos_out, sin_out = [], []
    for i, dim in enumerate(dims):
        inv = 1.0 / torch.pow(torch.tensor(10000.0),
                              torch.arange(0, dim, 2).double() / dim)
        fr = ids[:, i].double()[:, None] * inv[None, :]
        cos_out.append(fr.cos())
        sin_out.append(fr.sin())
    return (torch.cat(cos_out, -1).float(),
            torch.cat(sin_out, -1).float())


def _apply_rope(x, cos, sin):
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.stack([x1 * c - x2 * s, x2 * c + x1 * s],
                       dim=-1).reshape(x.shape)


def _oracle_forward(sd, lat_np, txt_np, t_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    txt_in = T(txt_np).float()
    tt = T(t_np).float()
    b, h, w, c = lat.shape
    p = 2
    nh, hd = TINY["num_attention_heads"], TINY["attention_head_dim"]

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def ln(x):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                              eps=1e-6)

    def rms(x, name):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + 1e-6) \
            * sd[f"{name}.weight"].float()

    def gelu_ff(x, pfx):
        return lin(torch.nn.functional.gelu(
            lin(x, f"{pfx}.net.0.proj"), approximate="tanh"),
            f"{pfx}.net.2")

    img = lat.permute(0, 3, 1, 2).reshape(b, c, h // p, p, w // p, p)
    img = img.permute(0, 2, 4, 1, 3, 5).reshape(
        b, (h // p) * (w // p), c * p * p)
    img = lin(img, "x_embedder")
    ctx = lin(txt_in, "context_embedder")

    half = 128
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = 1000.0 * tt[:, None] * freqs[None, :]
    e = torch.cat([args.cos(), args.sin()], -1)
    temb = lin(torch.nn.functional.silu(
        lin(e, "time_embed.timestep_embedder.linear_1")),
        "time_embed.timestep_embedder.linear_2")
    silu_t = torch.nn.functional.silu(temb)

    cos, sin = _oracle_rope(h // p, w // p, txt_in.shape[1])
    tlen = txt_in.shape[1]

    def attend(q, k, v):
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return o.transpose(1, 2).reshape(q.shape[0], q.shape[1],
                                         nh * hd)

    x = img
    for i in range(TINY["num_layers"]):
        pfx = f"transformer_blocks.{i}"
        m_i = lin(silu_t, f"{pfx}.norm1.linear").view(b, 6, -1)
        m_c = lin(silu_t, f"{pfx}.norm1_context.linear").view(b, 6, -1)
        xn = ln(x) * (1 + m_i[:, 1:2]) + m_i[:, 0:1]
        cn = ln(ctx) * (1 + m_c[:, 1:2]) + m_c[:, 0:1]
        sv, sc = xn.shape[1], cn.shape[1]
        q = rms(lin(xn, f"{pfx}.attn.to_q").view(b, sv, nh, hd),
                f"{pfx}.attn.norm_q")
        k = rms(lin(xn, f"{pfx}.attn.to_k").view(b, sv, nh, hd),
                f"{pfx}.attn.norm_k")
        v = lin(xn, f"{pfx}.attn.to_v").view(b, sv, nh, hd)
        cq = rms(lin(cn, f"{pfx}.attn.add_q_proj").view(b, sc, nh, hd),
                 f"{pfx}.attn.norm_added_q")
        ck = rms(lin(cn, f"{pfx}.attn.add_k_proj").view(b, sc, nh, hd),
                 f"{pfx}.attn.norm_added_k")
        cv = lin(cn, f"{pfx}.attn.add_v_proj").view(b, sc, nh, hd)
        q = _apply_rope(torch.cat([cq, q], 1), cos, sin)
        k = _apply_rope(torch.cat([ck, k], 1), cos, sin)
        v = torch.cat([cv, v], 1)
        o = attend(q, k, v)
        x = x + m_i[:, 2:3] * lin(o[:, tlen:], f"{pfx}.attn.to_out.0")
        ctx = ctx + m_c[:, 2:3] * lin(o[:, :tlen],
                                      f"{pfx}.attn.to_add_out")
        xn2 = ln(x) * (1 + m_i[:, 4:5]) + m_i[:, 3:4]
        x = x + m_i[:, 5:6] * gelu_ff(xn2, f"{pfx}.ff")
        cn2 = ln(ctx) * (1 + m_c[:, 4:5]) + m_c[:, 3:4]
        ctx = ctx + m_c[:, 5:6] * gelu_ff(cn2, f"{pfx}.ff_context")

    x = torch.cat([ctx, x], dim=1)
    for i in range(TINY["num_single_layers"]):
        pfx = f"single_transformer_blocks.{i}"
        s = x.shape[1]
        m = lin(silu_t, f"{pfx}.norm.linear").view(b, 3, -1)
        xn = ln(x) * (1 + m[:, 1:2]) + m[:, 0:1]
        q = rms(lin(xn, f"{pfx}.attn.to_q").view(b, s, nh, hd),
                f"{pfx}.attn.norm_q")
        k = rms(lin(xn, f"{pfx}.attn.to_k").view(b, s, nh, hd),
                f"{pfx}.attn.norm_k")
        v = lin(xn, f"{pfx}.attn.to_v").view(b, s, nh, hd)
        q, k = _apply_rope(q, cos, sin), _apply_rope(k, cos, sin)
        o = attend(q, k, v)
        mlp = torch.nn.functional.gelu(lin(xn, f"{pfx}.proj_mlp"),
                                       approximate="tanh")
        x = x + m[:, 2:3] * lin(torch.cat([o, mlp], -1),
                                f"{pfx}.proj_out")

    x = x[:, tlen:]
    fin = lin(silu_t, "norm_out.linear")
    scale_o, shift_o = fin.chunk(2, dim=-1)
    out = ln(x) * (1 + scale_o.unsqueeze(1)) + shift_o.unsqueeze(1)
    out = lin(out, "proj_out")
    out = out.reshape(b, h // p, w // p, c, p, p)
    out = out.permute(0, 1, 4, 2, 5, 3).reshape(b, h, w, c)
    return out.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "longcat_image"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, LongCatImageConfig)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.longcat_image import (
        assign_longcat_image_tensor, init_longcat_image_params)
    import jax

    params = init_longcat_image_params(cfg, jax.random.PRNGKey(0),
                                       jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_longcat_image_tensor(params, n, t.numpy(),
                                                   jnp.float32)]
    assert unmapped == []


def test_forward_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(29)
    lat = rng.standard_normal((2, 4, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.6, 0.15], np.float32)
    ours = np.asarray(longcat_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t)
    assert ours.shape == golden.shape == (2, 4, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_cfg_renormalize_caps_norm():
    rng = np.random.default_rng(5)
    cond = jnp.asarray(rng.standard_normal((1, 6, 8), dtype=np.float32))
    comb = 3.0 * cond  # inflated combined prediction
    out = np.asarray(cfg_renormalize(cond, comb))
    np.testing.assert_allclose(
        np.linalg.norm(out, axis=-1),
        np.linalg.norm(np.asarray(cond), axis=-1), rtol=1e-5)
    # already-smaller predictions pass through unchanged
    small = 0.5 * cond
    np.testing.assert_allclose(np.asarray(cfg_renormalize(cond, small)),
                               np.asarray(small), rtol=1e-6)


def test_pipeline_end_to_end(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "longcat_image"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny longcat test",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=4.5, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
