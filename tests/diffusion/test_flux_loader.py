"""Flux real-geometry family + diffusers-format loader tests.

Same method as test_qwen_image_loader.py: the checkpoint fixture is
written in the genuine diffusers layout (FluxTransformer2DModel naming —
double blocks `transformer_blocks.N` with norm1/norm1_context AdaLN-Zero
and ff/ff_context, single blocks `single_transformer_blocks.N` with
fused proj_out, time_text_embed with guidance + pooled text embedders,
torch [out, in] Linear weights), and the numeric oracle is an
independent torch re-implementation of the diffusers semantics so
transpose/naming/packing mistakes cannot cancel out. Reference:
diffusion/models/flux/flux_transformer.py:479."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.flux import (  # noqa: E402
    FluxConfig, flux_forward, flux_rope)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)

TINY = dict(patch_size=1, in_channels=16, out_channels=16, num_layers=2,
            num_single_layers=2, attention_head_dim=32,
            num_attention_heads=2, joint_attention_dim=48,
            pooled_projection_dim=24, guidance_embeds=True,
            axes_dims_rope=[8, 12, 12])


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    hs = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    mlp = hs * 4
    hd = TINY["attention_head_dim"]

    def lin(n_out, n_in):
        return (torch.randn(n_out, n_in, generator=g) * (n_in ** -0.5),
                torch.randn(n_out, generator=g) * 0.02)

    sd = {}

    def put(prefix, n_out, n_in):
        w, b = lin(n_out, n_in)
        sd[f"{prefix}.weight"] = w
        sd[f"{prefix}.bias"] = b

    put("x_embedder", hs, TINY["in_channels"])
    put("context_embedder", hs, TINY["joint_attention_dim"])
    put("time_text_embed.timestep_embedder.linear_1", hs, 256)
    put("time_text_embed.timestep_embedder.linear_2", hs, hs)
    put("time_text_embed.guidance_embedder.linear_1", hs, 256)
    put("time_text_embed.guidance_embedder.linear_2", hs, hs)
    put("time_text_embed.text_embedder.linear_1", hs,
        TINY["pooled_projection_dim"])
    put("time_text_embed.text_embedder.linear_2", hs, hs)
    put("norm_out.linear", 2 * hs, hs)
    put("proj_out", TINY["patch_size"] ** 2 * TINY["out_channels"], hs)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        put(f"{p}.norm1.linear", 6 * hs, hs)
        put(f"{p}.norm1_context.linear", 6 * hs, hs)
        for name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj"):
            put(f"{p}.attn.{name}", hs, hs)
        put(f"{p}.attn.to_out.0", hs, hs)
        put(f"{p}.attn.to_add_out", hs, hs)
        for name in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{name}.weight"] = torch.rand(hd, generator=g) \
                + 0.5
        put(f"{p}.ff.net.0.proj", mlp, hs)
        put(f"{p}.ff.net.2", hs, mlp)
        put(f"{p}.ff_context.net.0.proj", mlp, hs)
        put(f"{p}.ff_context.net.2", hs, mlp)
    for i in range(TINY["num_single_layers"]):
        p = f"single_transformer_blocks.{i}"
        put(f"{p}.norm.linear", 3 * hs, hs)
        for name in ("to_q", "to_k", "to_v"):
            put(f"{p}.attn.{name}", hs, hs)
        for name in ("norm_q", "norm_k"):
            sd[f"{p}.attn.{name}.weight"] = torch.rand(hd, generator=g) \
                + 0.5
        put(f"{p}.proj_mlp", mlp, hs)
        put(f"{p}.proj_out", hs, hs + mlp)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("flux_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "FluxPipeline",
                   "transformer": ["diffusers", "FluxTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"],
                   "text_encoder": ["transformers", "CLIPTextModel"],
                   "text_encoder_2": ["transformers",
                                      "T5EncoderModel"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "FluxTransformer2DModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 3.0,
                   "use_dynamic_shifting": True}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL",
                   "latent_channels": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)
    sd = _tiny_state_dict()
    save_file(sd, str(root / "transformer" /
                      "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_rope(cfg, h_tok, w_tok, txt_len, ref_hw=None):
    """FluxPosEmbed: plain grid ids, txt ids zero, complex freqs.
    ref_hw: Kontext reference grid with frame id 1
    (pipeline_flux_kontext.py:427)."""
    axes = cfg["axes_dims_rope"]

    def rope_params(index, dim):
        freqs = torch.outer(index.float(), 1.0 / torch.pow(
            torch.tensor(10000.0),
            torch.arange(0, dim, 2).float() / dim))
        return torch.polar(torch.ones_like(freqs), freqs)

    def grid(h, w, frame):
        rows = torch.arange(h).repeat_interleave(w).float()
        cols = torch.arange(w).repeat(h).float()
        fr = torch.full((h * w,), float(frame))
        return torch.cat([rope_params(fr, axes[0]),
                          rope_params(rows, axes[1]),
                          rope_params(cols, axes[2])], dim=-1)

    vid = grid(h_tok, w_tok, 0)
    zt = torch.zeros(txt_len)
    txt = torch.cat([rope_params(zt, d) for d in axes], dim=-1)
    parts = [txt, vid]
    if ref_hw is not None:
        parts.append(grid(ref_hw[0], ref_hw[1], 1))
    return torch.cat(parts, dim=0)


def _oracle_apply_rope(x, freqs):
    b, t, h, d = x.shape
    xc = torch.view_as_complex(x.float().reshape(b, t, h, d // 2, 2))
    out = xc * freqs[None, :, None, :]
    return torch.view_as_real(out).reshape(b, t, h, d)


def _oracle_forward(sd, cfg, latents_np, txt_np, t_np, pooled_np, g_np,
                    ref_np=None):
    T = torch.from_numpy
    lat, txt, tt = T(latents_np).float(), T(txt_np).float(), \
        T(t_np).float()
    pooled, gg = T(pooled_np).float(), T(g_np).float()
    p = 2  # pipeline pack factor
    b, h, w, c = lat.shape
    nh, hd = cfg["num_attention_heads"], cfg["attention_head_dim"]
    hs = nh * hd
    eps = 1e-6

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def pack(z):
        bb, hh, ww, cc = z.shape
        zc = z.permute(0, 3, 1, 2).view(bb, cc, hh // p, p, ww // p, p)
        return zc.permute(0, 2, 4, 1, 3, 5).reshape(
            bb, (hh // p) * (ww // p), cc * p * p)

    img = pack(lat)
    n_target = img.shape[1]
    ref_hw = None
    if ref_np is not None:
        ref = T(ref_np).float()
        ref_hw = (ref.shape[1] // p, ref.shape[2] // p)
        img = torch.cat([img, pack(ref)], dim=1)
    img = lin(img, "x_embedder")
    txt_h = lin(txt, "context_embedder")

    half = 128

    def sinusoid(v):
        freqs = torch.exp(-math.log(10000.0) *
                          torch.arange(half).float() / half)
        args = 1000.0 * v[:, None] * freqs[None, :]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def embed(v, which):
        e = lin(v, f"time_text_embed.{which}.linear_1")
        return lin(torch.nn.functional.silu(e),
                   f"time_text_embed.{which}.linear_2")

    te = embed(sinusoid(tt), "timestep_embedder") + \
        embed(sinusoid(gg), "guidance_embedder") + \
        embed(pooled, "text_embedder")

    fr = _oracle_rope(cfg, h // p, w // p, txt.shape[1], ref_hw=ref_hw)

    def rms(x, wname):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * sd[wname].float()

    def ada(x, shift, scale):
        xn = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)
        return xn * (1 + scale[:, None]) + shift[:, None]

    tv, ttk = img.shape[1], txt_h.shape[1]
    x_img, x_txt = img, txt_h
    st = torch.nn.functional.silu(te)
    for i in range(cfg["num_layers"]):
        pref = f"transformer_blocks.{i}"
        imod = lin(st, f"{pref}.norm1.linear")
        tmod = lin(st, f"{pref}.norm1_context.linear")
        ish1, isc1, ig1, ish2, isc2, ig2 = imod.chunk(6, -1)
        tsh1, tsc1, tg1, tsh2, tsc2, tg2 = tmod.chunk(6, -1)

        img_n = ada(x_img, ish1, isc1)
        txt_n = ada(x_txt, tsh1, tsc1)
        iq, ik, iv = (lin(img_n, f"{pref}.attn.to_{s}")
                      .view(b, tv, nh, hd) for s in "qkv")
        tq, tk, tvv = (lin(txt_n, f"{pref}.attn.add_{s}_proj")
                       .view(b, ttk, nh, hd) for s in "qkv")
        iq = rms(iq, f"{pref}.attn.norm_q.weight")
        ik = rms(ik, f"{pref}.attn.norm_k.weight")
        tq = rms(tq, f"{pref}.attn.norm_added_q.weight")
        tk = rms(tk, f"{pref}.attn.norm_added_k.weight")
        q = _oracle_apply_rope(torch.cat([tq, iq], 1), fr)
        k = _oracle_apply_rope(torch.cat([tk, ik], 1), fr)
        v = torch.cat([tvv, iv], 1)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(b, ttk + tv, hs)
        x_img = x_img + ig1[:, None] * lin(o[:, ttk:],
                                           f"{pref}.attn.to_out.0")
        x_txt = x_txt + tg1[:, None] * lin(o[:, :ttk],
                                           f"{pref}.attn.to_add_out")

        def ff(x, which):
            hdn = lin(x, f"{pref}.{which}.net.0.proj")
            hdn = torch.nn.functional.gelu(hdn, approximate="tanh")
            return lin(hdn, f"{pref}.{which}.net.2")

        x_img = x_img + ig2[:, None] * ff(ada(x_img, ish2, isc2), "ff")
        x_txt = x_txt + tg2[:, None] * ff(ada(x_txt, tsh2, tsc2),
                                          "ff_context")

    x = torch.cat([x_txt, x_img], dim=1)
    for i in range(cfg["num_single_layers"]):
        pref = f"single_transformer_blocks.{i}"
        mod = lin(st, f"{pref}.norm.linear")
        sh, sc, gate = mod.chunk(3, -1)
        xn = ada(x, sh, sc)
        q, k, v = (lin(xn, f"{pref}.attn.to_{s}")
                   .view(b, ttk + tv, nh, hd) for s in "qkv")
        q = rms(q, f"{pref}.attn.norm_q.weight")
        k = rms(k, f"{pref}.attn.norm_k.weight")
        q = _oracle_apply_rope(q, fr)
        k = _oracle_apply_rope(k, fr)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        attn_out = o.transpose(1, 2).reshape(b, ttk + tv, hs)
        mlpo = torch.nn.functional.gelu(lin(xn, f"{pref}.proj_mlp"),
                                        approximate="tanh")
        fused = torch.cat([attn_out, mlpo], dim=-1)
        x = x + gate[:, None] * lin(fused, f"{pref}.proj_out")
    x_img = x[:, ttk:]

    fin = lin(st, "norm_out.linear")
    sc, sh = fin[:, :hs], fin[:, hs:]
    out = ada(x_img, sh, sc)
    out = lin(out, "proj_out")[:, :n_target]
    oc = cfg["out_channels"] // (p * p)
    out = out.view(b, h // p, w // p, oc, p, p)
    out = out.permute(0, 3, 1, 4, 2, 5).reshape(b, oc, h, w)
    return out.permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "flux"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, FluxConfig)
    assert cfg.num_layers == 2 and cfg.num_single_layers == 2
    assert cfg.guidance_embeds
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.flux import (assign_flux_tensor,
                                              init_flux_params)
    params = init_flux_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_flux_tensor(params, n, t.numpy(),
                                          jnp.float32)]
    assert unmapped == []


def test_forward_parity_vs_torch_oracle(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]

    rng = np.random.default_rng(11)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    pooled = rng.standard_normal((2, TINY["pooled_projection_dim"]),
                                 dtype=np.float32)
    t = np.asarray([0.7, 0.3], np.float32)
    g = np.asarray([3.5, 3.5], np.float32)

    ours = np.asarray(flux_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        pooled=jnp.asarray(pooled), guidance=jnp.asarray(g)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, t,
                             pooled, g)
    assert ours.shape == golden.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_rope_matches_polar_reference():
    cfg = FluxConfig.from_json(TINY)
    cos, sin = flux_rope(cfg, h_tokens=6, w_tokens=4, txt_len=3)
    fr = _oracle_rope(TINY, 6, 4, 3)
    np.testing.assert_allclose(np.asarray(cos), fr.real.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), fr.imag.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_end_to_end_with_diffusers_dir(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "flux"
    assert eng.pipeline.config.flow_shift == 3.0
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny test image",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.5, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None
    assert out.images.shape == (1, 32, 32, 3)


def test_kontext_ref_conditioning_parity(pipeline_dir):
    """FluxKontext: a reference image's latents append to the image
    stream with frame-1 rope ids and drop from the prediction
    (pipeline_flux_kontext.py:653,681 + image_ids[..., 0] = 1 :427).
    Parity vs the oracle running the same extended stream."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(17)
    lat = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    ref = rng.standard_normal((1, 12, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((1, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    pooled = rng.standard_normal((1, TINY["pooled_projection_dim"]),
                                 dtype=np.float32)
    t = np.asarray([0.4], np.float32)
    g = np.asarray([3.0], np.float32)
    ours = np.asarray(flux_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        pooled=jnp.asarray(pooled), guidance=jnp.asarray(g),
        ref_latents=jnp.asarray(ref)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, t,
                             pooled, g, ref_np=ref)
    assert ours.shape == golden.shape == (1, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)
    # the reference image must actually influence the prediction
    base = np.asarray(flux_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        pooled=jnp.asarray(pooled), guidance=jnp.asarray(g)))
    assert np.abs(ours - base).max() > 1e-4


def test_pipeline_end_to_end_kontext_ref_image(pipeline_dir):
    """Engine e2e with extra_args.ref_image (the /v1/images/edits
    Kontext path): the reference image is VAE-encoded once
    (deterministic, posterior mean) and rides every denoise step."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    rng = np.random.default_rng(3)
    ref = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = eng.generate([DiffusionRequest(
        "r0", "make it blue",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.5, seed=0,
                                output_type="np",
                                extra_args={"ref_image": ref}))])[0]
    assert out.finished and out.error is None
    assert out.images.shape == (1, 32, 32, 3)
    # and the conditioning changed the result vs no-ref
    out2 = eng.generate([DiffusionRequest(
        "r1", "make it blue",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.5, seed=0,
                                output_type="np"))])[0]
    assert np.abs(np.asarray(out.images, np.float32) -
                  np.asarray(out2.images, np.float32)).max() > 1e-6
