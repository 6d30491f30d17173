"""Flux2 real-geometry family + diffusers loader tests.

Same method as test_flux_loader.py: genuine diffusers checkpoint layout
(Flux2Transformer2DModel naming — global modulation linears, SwiGLU
linear_in/linear_out FFs, fused single-block to_qkv_mlp_proj),
independent torch oracle re-deriving the reference semantics
(diffusion/models/flux2/flux2_transformer.py:550 + pipeline ids
:457/:477). The same transformer class serves Flux2KleinPipeline
(flux2_klein_transformer.py:737) — the e2e test drives a klein-named
pipeline dir."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.flux2 import (  # noqa: E402
    Flux2Config, flux2_forward, flux2_rope)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)

TINY = dict(patch_size=1, in_channels=16, out_channels=16,
            num_layers=2, num_single_layers=2, attention_head_dim=16,
            num_attention_heads=2, joint_attention_dim=24,
            timestep_guidance_channels=32, mlp_ratio=3.0,
            axes_dims_rope=[4, 4, 4, 4], rope_theta=2000,
            guidance_embeds=True)
HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]
MH = int(HS * TINY["mlp_ratio"])


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):  # every Flux2 linear is bias-free
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)

    def put_rms(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5

    nch = TINY["timestep_guidance_channels"]
    put("time_guidance_embed.timestep_embedder.linear_1", HS, nch)
    put("time_guidance_embed.timestep_embedder.linear_2", HS, HS)
    put("time_guidance_embed.guidance_embedder.linear_1", HS, nch)
    put("time_guidance_embed.guidance_embedder.linear_2", HS, HS)
    put("double_stream_modulation_img.linear", 6 * HS, HS)
    put("double_stream_modulation_txt.linear", 6 * HS, HS)
    put("single_stream_modulation.linear", 3 * HS, HS)
    put("x_embedder", HS, TINY["in_channels"])
    put("context_embedder", HS, TINY["joint_attention_dim"])
    put("norm_out.linear", 2 * HS, HS)
    put("proj_out", TINY["out_channels"], HS)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_add_out"):
            put(f"{p}.attn.{nm}", HS, HS)
        put(f"{p}.attn.to_out.0", HS, HS)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            put_rms(f"{p}.attn.{nm}", TINY["attention_head_dim"])
        put(f"{p}.ff.linear_in", 2 * MH, HS)
        put(f"{p}.ff.linear_out", HS, MH)
        put(f"{p}.ff_context.linear_in", 2 * MH, HS)
        put(f"{p}.ff_context.linear_out", HS, MH)
    for i in range(TINY["num_single_layers"]):
        p = f"single_transformer_blocks.{i}"
        put(f"{p}.attn.to_qkv_mlp_proj", 3 * HS + 2 * MH, HS)
        put(f"{p}.attn.to_out", HS, HS + MH)
        put_rms(f"{p}.attn.norm_q", TINY["attention_head_dim"])
        put_rms(f"{p}.attn.norm_k", TINY["attention_head_dim"])
    return sd


def _make_pipeline(tmp_path_factory, pipeline_class):
    root = tmp_path_factory.mktemp("flux2_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": pipeline_class,
                   "transformer": ["diffusers",
                                   "Flux2Transformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKLFlux2"],
                   "text_encoder": ["transformers", "MistralModel"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "Flux2Transformer2DModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 3.0,
                   "use_dynamic_shifting": True}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLFlux2",
                   "latent_channels": 4,
                   "block_out_channels": [8, 16, 16, 16]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    return _make_pipeline(tmp_path_factory, "Flux2Pipeline")


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_rope(h_tok, w_tok, txt_len):
    """(0,row,col,0) image ids + (0,0,0,pos) text ids, [txt; img]."""
    dims = TINY["axes_dims_rope"]
    theta = TINY["rope_theta"]
    rows = torch.arange(h_tok).repeat_interleave(w_tok).float()
    cols = torch.arange(w_tok).repeat(h_tok).float()
    zv = torch.zeros_like(rows)
    img_ids = torch.stack([zv, rows, cols, zv], dim=-1)
    zt = torch.zeros(txt_len)
    txt_ids = torch.stack([zt, zt, zt, torch.arange(txt_len).float()],
                          dim=-1)
    ids = torch.cat([txt_ids, img_ids], dim=0)
    cos_out, sin_out = [], []
    for i, dim in enumerate(dims):
        inv = 1.0 / torch.pow(torch.tensor(float(theta)),
                              torch.arange(0, dim, 2).double() / dim)
        fr = ids[:, i].double()[:, None] * inv[None, :]
        cos_out.append(fr.cos())
        sin_out.append(fr.sin())
    return (torch.cat(cos_out, -1).float(),
            torch.cat(sin_out, -1).float())


def _oracle_apply_rope(x, cos, sin):
    """GPT-J interleaved pairs (rope.py rotate_half interleaved)."""
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = torch.stack([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)
    return out.reshape(x.shape)


def _sinusoid(v, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = 1000.0 * v[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _oracle_forward(sd, lat_np, txt_np, t_np, g_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    txt = T(txt_np).float()
    tt = T(t_np).float()
    gg = T(g_np).float()
    b, h, w, c = lat.shape
    p = 2
    nh, hd = TINY["num_attention_heads"], TINY["attention_head_dim"]

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T

    def ln(x):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                              eps=1e-6)

    def rms(x, name):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + 1e-6) \
            * sd[f"{name}.weight"].float()

    def swiglu(x):
        x1, x2 = x.chunk(2, dim=-1)
        return torch.nn.functional.silu(x1) * x2

    # channel-major 2x2 packing (Flux2Pipeline.prepare_latents builds
    # [B, C*4, H/2, W/2] then _pack_latents flattens)
    img = lat.permute(0, 3, 1, 2).reshape(b, c, h // p, p, w // p, p)
    img = img.permute(0, 2, 4, 1, 3, 5).reshape(
        b, (h // p) * (w // p), c * p * p)
    img = lin(img, "x_embedder")
    txt_h = lin(txt, "context_embedder")

    nch = TINY["timestep_guidance_channels"]

    def embed(v, which):
        e = lin(v, f"time_guidance_embed.{which}.linear_1")
        return lin(torch.nn.functional.silu(e),
                   f"time_guidance_embed.{which}.linear_2")

    temb = embed(_sinusoid(tt, nch), "timestep_embedder") + \
        embed(_sinusoid(gg, nch), "guidance_embedder")

    def modulation(name, sets):
        m = lin(torch.nn.functional.silu(temb), f"{name}.linear")
        chunks = m.unsqueeze(1).chunk(3 * sets, dim=-1)
        return [chunks[3 * i:3 * (i + 1)] for i in range(sets)]

    mod_img = modulation("double_stream_modulation_img", 2)
    mod_txt = modulation("double_stream_modulation_txt", 2)
    mod_single = modulation("single_stream_modulation", 1)[0]

    cos, sin = _oracle_rope(h // p, w // p, txt.shape[1])
    tt_len = txt.shape[1]

    def attend(q, k, v):
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return o.transpose(1, 2).reshape(q.shape[0], q.shape[1],
                                         nh * hd)

    x, ctx = img, txt_h
    for i in range(TINY["num_layers"]):
        pfx = f"transformer_blocks.{i}"
        (i_sh, i_sc, i_g), (i_sh2, i_sc2, i_g2) = mod_img
        (t_sh, t_sc, t_g), (t_sh2, t_sc2, t_g2) = mod_txt
        xn = ln(x) * (1 + i_sc) + i_sh
        cn = ln(ctx) * (1 + t_sc) + t_sh
        sv, sc_ = xn.shape[1], cn.shape[1]
        q = rms(lin(xn, f"{pfx}.attn.to_q").view(b, sv, nh, hd),
                f"{pfx}.attn.norm_q")
        k = rms(lin(xn, f"{pfx}.attn.to_k").view(b, sv, nh, hd),
                f"{pfx}.attn.norm_k")
        v = lin(xn, f"{pfx}.attn.to_v").view(b, sv, nh, hd)
        cq = rms(lin(cn, f"{pfx}.attn.add_q_proj").view(b, sc_, nh, hd),
                 f"{pfx}.attn.norm_added_q")
        ck = rms(lin(cn, f"{pfx}.attn.add_k_proj").view(b, sc_, nh, hd),
                 f"{pfx}.attn.norm_added_k")
        cv = lin(cn, f"{pfx}.attn.add_v_proj").view(b, sc_, nh, hd)
        q = _oracle_apply_rope(torch.cat([cq, q], 1), cos, sin)
        k = _oracle_apply_rope(torch.cat([ck, k], 1), cos, sin)
        v = torch.cat([cv, v], 1)
        o = attend(q, k, v)
        x = x + i_g * lin(o[:, tt_len:], f"{pfx}.attn.to_out.0")
        ctx = ctx + t_g * lin(o[:, :tt_len], f"{pfx}.attn.to_add_out")
        xn2 = ln(x) * (1 + i_sc2) + i_sh2
        x = x + i_g2 * lin(swiglu(lin(xn2, f"{pfx}.ff.linear_in")),
                           f"{pfx}.ff.linear_out")
        cn2 = ln(ctx) * (1 + t_sc2) + t_sh2
        ctx = ctx + t_g2 * lin(
            swiglu(lin(cn2, f"{pfx}.ff_context.linear_in")),
            f"{pfx}.ff_context.linear_out")

    x = torch.cat([ctx, x], dim=1)
    sh, sc, g_ = mod_single
    for i in range(TINY["num_single_layers"]):
        pfx = f"single_transformer_blocks.{i}"
        s = x.shape[1]
        xn = ln(x) * (1 + sc) + sh
        fused = lin(xn, f"{pfx}.attn.to_qkv_mlp_proj")
        qkv, mlp = torch.split(fused, [3 * HS, 2 * MH], dim=-1)
        q, k, v = qkv.chunk(3, dim=-1)
        q = rms(q.view(b, s, nh, hd), f"{pfx}.attn.norm_q")
        k = rms(k.view(b, s, nh, hd), f"{pfx}.attn.norm_k")
        v = v.view(b, s, nh, hd)
        q = _oracle_apply_rope(q, cos, sin)
        k = _oracle_apply_rope(k, cos, sin)
        o = attend(q, k, v)
        x = x + g_ * lin(torch.cat([o, swiglu(mlp)], -1),
                         f"{pfx}.attn.to_out")

    x = x[:, tt_len:]
    fin = lin(torch.nn.functional.silu(temb), "norm_out.linear")
    scale_o, shift_o = fin.chunk(2, dim=-1)
    out = ln(x) * (1 + scale_o.unsqueeze(1)) + shift_o.unsqueeze(1)
    out = lin(out, "proj_out")
    # unpack (channel-major, _unpatchify_latents)
    out = out.reshape(b, h // p, w // p, c, p, p)
    out = out.permute(0, 1, 4, 2, 5, 3).reshape(b, h, w, c)
    return out.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "flux2"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, Flux2Config)
    assert cfg.num_layers == 2 and cfg.num_single_layers == 2
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.flux2 import (assign_flux2_tensor,
                                               init_flux2_params)
    import jax

    params = init_flux2_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_flux2_tensor(params, n, t.numpy(),
                                           jnp.float32)]
    assert unmapped == []


def test_forward_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(13)
    lat = rng.standard_normal((2, 4, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.7, 0.2], np.float32)
    g = np.asarray([4.0, 4.0], np.float32)
    ours = np.asarray(flux2_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        guidance=jnp.asarray(g)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t, g)
    assert ours.shape == golden.shape == (2, 4, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_rope_matches_reference_ids():
    cfg = Flux2Config.from_json(TINY)
    cos, sin = flux2_rope(cfg, 3, 2, 4)
    gcos, gsin = _oracle_rope(3, 2, 4)
    np.testing.assert_allclose(np.asarray(cos), gcos.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), gsin.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_end_to_end_klein(tmp_path_factory):
    """Flux2KleinPipeline rides the same transformer class — drive the
    engine with a klein-named pipeline dir."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    root = _make_pipeline(tmp_path_factory, "Flux2KleinPipeline")
    config = DiffusionConfig(model=root, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "flux2"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny flux2 klein test",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=4.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
