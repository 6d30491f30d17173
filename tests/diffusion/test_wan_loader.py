"""Wan2.2 real-geometry family + diffusers-format loader tests.

Same method as test_flux_loader.py: genuine diffusers checkpoint layout
(WanTransformer3DModel naming — blocks.N.attn1/attn2, per-block
scale_shift_table, Conv3d patch_embedding, condition_embedder towers),
independent torch oracle re-deriving the diffusers semantics.
Reference: diffusion/models/wan2_2/wan2_2_transformer.py:703."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.wan import (  # noqa: E402
    WanConfig, wan_forward, wan_rope)

# head_dim 24: t=8+h=8+w=8 (hd//3 each; hd-2*(hd//3)=8)
TINY = dict(patch_size=[1, 2, 2], num_attention_heads=2,
            attention_head_dim=24, in_channels=4, out_channels=4,
            text_dim=32, freq_dim=64, ffn_dim=96, num_layers=2,
            cross_attn_norm=True, eps=1e-6, rope_max_seq_len=64)


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    hs = TINY["num_attention_heads"] * TINY["attention_head_dim"]

    def lin(n_out, n_in):
        return (torch.randn(n_out, n_in, generator=g) * (n_in ** -0.5),
                torch.randn(n_out, generator=g) * 0.02)

    sd = {}

    def put(prefix, n_out, n_in):
        w, b = lin(n_out, n_in)
        sd[f"{prefix}.weight"] = w
        sd[f"{prefix}.bias"] = b

    pt, ph, pw = TINY["patch_size"]
    sd["patch_embedding.weight"] = torch.randn(
        hs, TINY["in_channels"], pt, ph, pw, generator=g) * 0.1
    sd["patch_embedding.bias"] = torch.randn(hs, generator=g) * 0.02
    put("condition_embedder.time_embedder.linear_1", hs,
        TINY["freq_dim"])
    put("condition_embedder.time_embedder.linear_2", hs, hs)
    put("condition_embedder.time_proj", 6 * hs, hs)
    put("condition_embedder.text_embedder.linear_1", hs,
        TINY["text_dim"])
    put("condition_embedder.text_embedder.linear_2", hs, hs)
    sd["scale_shift_table"] = torch.randn(1, 2, hs, generator=g) \
        * hs ** -0.5
    put("proj_out", TINY["out_channels"] * pt * ph * pw, hs)
    for i in range(TINY["num_layers"]):
        p = f"blocks.{i}"
        sd[f"{p}.scale_shift_table"] = torch.randn(
            1, 6, hs, generator=g) * hs ** -0.5
        for attn in ("attn1", "attn2"):
            for nm in ("to_q", "to_k", "to_v"):
                put(f"{p}.{attn}.{nm}", hs, hs)
            put(f"{p}.{attn}.to_out.0", hs, hs)
            for nm in ("norm_q", "norm_k"):
                sd[f"{p}.{attn}.{nm}.weight"] = torch.rand(
                    hs, generator=g) + 0.5
        put(f"{p}.norm2", hs, hs)  # affine LN: weight [hs], bias [hs]
        sd[f"{p}.norm2.weight"] = torch.rand(hs, generator=g) + 0.5
        sd[f"{p}.norm2.bias"] = torch.randn(hs, generator=g) * 0.02
        put(f"{p}.ffn.net.0.proj", TINY["ffn_dim"], hs)
        put(f"{p}.ffn.net.2", hs, TINY["ffn_dim"])
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("wan_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "WanPipeline",
                   "transformer": ["diffusers", "WanTransformer3DModel"],
                   "scheduler": ["diffusers",
                                 "UniPCMultistepScheduler"],
                   "vae": ["diffusers", "AutoencoderKLWan"],
                   "text_encoder": ["transformers", "UMT5EncoderModel"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "WanTransformer3DModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "UniPCMultistepScheduler",
                   "num_train_timesteps": 1000, "shift": 5.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLWan", "z_dim": 4,
                   "latent_channels": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)
    sd = _tiny_state_dict()
    save_file(sd, str(root / "transformer" /
                      "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_rope(hd, f_tok, h_tok, w_tok):
    """WanRotaryPosEmbed: per-axis plain positions, split
    [hd-2(hd//3), hd//3, hd//3], complex freqs."""
    d_h = d_w = hd // 3
    d_t = hd - 2 * d_h

    def polar(n, dim):
        freqs = torch.outer(
            torch.arange(n).float(),
            1.0 / torch.pow(torch.tensor(10000.0),
                            torch.arange(0, dim, 2).float() / dim))
        return torch.polar(torch.ones_like(freqs), freqs)

    ft = polar(f_tok, d_t).view(f_tok, 1, 1, -1).expand(
        f_tok, h_tok, w_tok, -1)
    fh = polar(h_tok, d_h).view(1, h_tok, 1, -1).expand(
        f_tok, h_tok, w_tok, -1)
    fw = polar(w_tok, d_w).view(1, 1, w_tok, -1).expand(
        f_tok, h_tok, w_tok, -1)
    return torch.cat([ft, fh, fw], dim=-1).reshape(
        f_tok * h_tok * w_tok, -1)


def _oracle_apply_rope(x, freqs):
    b, t, h, d = x.shape
    xc = torch.view_as_complex(x.float().reshape(b, t, h, d // 2, 2))
    out = xc * freqs[None, :, None, :]
    return torch.view_as_real(out).reshape(b, t, h, d)


def _oracle_forward(sd, cfg, latents_np, txt_np, t_np):
    # t_np: [B] scalar timesteps, or [B, S_patches] per-patch (TI2V
    # expand_timesteps, pipeline_wan2_2_i2v.py:533-537)
    """latents [B, F, H, W, C] NHWC-style; oracle works in the
    reference's NCFHW layout internally."""
    T = torch.from_numpy
    lat = T(latents_np).float().permute(0, 4, 1, 2, 3)  # B C F H W
    txt, tt_in = T(txt_np).float(), T(t_np).float()
    pt, ph, pw = cfg["patch_size"]
    b, c, f, h, w = lat.shape
    nh, hd = cfg["num_attention_heads"], cfg["attention_head_dim"]
    hs = nh * hd
    eps = cfg["eps"]

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    # Conv3d stride=kernel patch embedding
    x = torch.nn.functional.conv3d(
        lat, sd["patch_embedding.weight"].float(),
        sd["patch_embedding.bias"].float(), stride=(pt, ph, pw))
    x = x.flatten(2).transpose(1, 2)  # [B, S, hs]

    # timestep: train units, Timesteps(freq_dim, flip_sin_to_cos)
    per_patch = tt_in.dim() == 2
    t_train = tt_in.reshape(-1) * 1000.0
    half = cfg["freq_dim"] // 2
    freqs = torch.exp(-torch.log(torch.tensor(10000.0)) *
                      torch.arange(half).float() / half)
    args = t_train[:, None] * freqs[None, :]
    te_sin = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = lin(te_sin, "condition_embedder.time_embedder.linear_1")
    temb = lin(torch.nn.functional.silu(temb),
               "condition_embedder.time_embedder.linear_2")
    tproj = lin(torch.nn.functional.silu(temb),
                "condition_embedder.time_proj")
    if per_patch:
        s_pat = tt_in.shape[1]
        temb = temb.view(b, s_pat, hs)
        tproj = tproj.view(b, s_pat, 6, hs)
    else:
        tproj = tproj.view(b, 6, hs)

    txt_h = lin(txt, "condition_embedder.text_embedder.linear_1")
    txt_h = torch.nn.functional.gelu(txt_h, approximate="tanh")
    txt_h = lin(txt_h, "condition_embedder.text_embedder.linear_2")

    fr = _oracle_rope(hd, f // pt, h // ph, w // pw)

    def rms_full(x, wname):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * sd[wname].float()

    def ln(x):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)

    s = x.shape[1]
    ttk = txt_h.shape[1]
    for i in range(cfg["num_layers"]):
        p = f"blocks.{i}"
        if per_patch:
            mod = sd[f"{p}.scale_shift_table"].float()[None] + tproj
            sh1, sc1, g1, sh2, sc2, g2 = (
                m.squeeze(2) for m in mod.chunk(6, dim=2))
        else:
            mod = sd[f"{p}.scale_shift_table"].float() + tproj
            sh1, sc1, g1, sh2, sc2, g2 = mod.chunk(6, dim=1)

        xn = ln(x) * (1 + sc1) + sh1
        q = rms_full(lin(xn, f"{p}.attn1.to_q"),
                     f"{p}.attn1.norm_q.weight").view(b, s, nh, hd)
        k = rms_full(lin(xn, f"{p}.attn1.to_k"),
                     f"{p}.attn1.norm_k.weight").view(b, s, nh, hd)
        v = lin(xn, f"{p}.attn1.to_v").view(b, s, nh, hd)
        q = _oracle_apply_rope(q, fr)
        k = _oracle_apply_rope(k, fr)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(b, s, hs)
        x = x + g1 * lin(o, f"{p}.attn1.to_out.0")

        xn2 = ln(x) * sd[f"{p}.norm2.weight"].float() + \
            sd[f"{p}.norm2.bias"].float()
        q = rms_full(lin(xn2, f"{p}.attn2.to_q"),
                     f"{p}.attn2.norm_q.weight").view(b, s, nh, hd)
        k = rms_full(lin(txt_h, f"{p}.attn2.to_k"),
                     f"{p}.attn2.norm_k.weight").view(b, ttk, nh, hd)
        v = lin(txt_h, f"{p}.attn2.to_v").view(b, ttk, nh, hd)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(b, s, hs)
        x = x + lin(o, f"{p}.attn2.to_out.0")

        xn3 = ln(x) * (1 + sc2) + sh2
        ff = torch.nn.functional.gelu(lin(xn3, f"{p}.ffn.net.0.proj"),
                                      approximate="tanh")
        x = x + g2 * lin(ff, f"{p}.ffn.net.2")

    if per_patch:
        fin = sd["scale_shift_table"].float()[None] + temb.unsqueeze(2)
        shift, scale = (m.squeeze(2) for m in fin.chunk(2, dim=2))
    else:
        fin = sd["scale_shift_table"].float() + temb.unsqueeze(1)
        shift, scale = fin.chunk(2, dim=1)
    out = ln(x) * (1 + scale) + shift
    out = lin(out, "proj_out")
    # unpatchify (reference :958-962)
    oc = cfg["out_channels"]
    out = out.reshape(b, f // pt, h // ph, w // pw, pt, ph, pw, oc)
    out = out.permute(0, 7, 1, 4, 2, 5, 3, 6)
    out = out.flatten(6, 7).flatten(4, 5).flatten(2, 3)  # B C F H W
    return out.permute(0, 2, 3, 4, 1).numpy()  # B F H W C


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "wan"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, WanConfig)
    assert cfg.patch_size == (1, 2, 2) and cfg.num_layers == 2
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.wan import (assign_wan_tensor,
                                             init_wan_params)
    params = init_wan_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_wan_tensor(params, n, t.numpy(),
                                         jnp.float32)]
    assert unmapped == []


def test_forward_parity_vs_torch_oracle(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]

    rng = np.random.default_rng(13)
    lat = rng.standard_normal((2, 2, 8, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["text_dim"]), dtype=np.float32)
    t = np.asarray([0.7, 0.3], np.float32)

    ours = np.asarray(wan_forward(params, cfg, jnp.asarray(lat),
                                  jnp.asarray(txt), jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, t)
    assert ours.shape == golden.shape == (2, 2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_rope_matches_polar_reference():
    cfg = WanConfig.from_json(TINY)
    cos, sin = wan_rope(cfg, f_tokens=3, h_tokens=4, w_tokens=2)
    fr = _oracle_rope(TINY["attention_head_dim"], 3, 4, 2)
    np.testing.assert_allclose(np.asarray(cos), fr.real.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), fr.imag.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_image_forward_squeezes_frames(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(3)
    lat = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((1, 4, TINY["text_dim"]), dtype=np.float32)
    out = wan_forward(params, cfg, jnp.asarray(lat), jnp.asarray(txt),
                      jnp.asarray([0.5], np.float32))
    assert out.shape == (1, 8, 8, 4)


def test_pipeline_end_to_end_video(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "wan"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny test video",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=2,
                                guidance_scale=3.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images is None
    assert out.video.shape[0] == 2  # frames


def test_per_patch_timesteps_parity(pipeline_dir):
    """TI2V expand_timesteps: per-patch timesteps (first-frame patches
    clean at t=0) modulate per token — parity vs the oracle."""
    from vllm_omni_tpu.diffusion.loader import load_diffusers_pipeline
    from vllm_omni_tpu.diffusion.wan import wan_forward

    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(31)
    f, h, w = 4, 8, 8
    lat = rng.standard_normal((1, f, h, w, cfg.in_channels),
                              dtype=np.float32)
    txt = rng.standard_normal((1, 5, TINY["text_dim"]),
                              dtype=np.float32)
    pt, ph, pw = cfg.patch_size
    n_pat = (f // pt) * (h // ph) * (w // pw)
    per_frame = (h // ph) * (w // pw)
    ts = np.full((1, n_pat), 0.6, np.float32)
    ts[:, :per_frame] = 0.0  # first latent frame is clean
    ours = np.asarray(wan_forward(params, cfg, jnp.asarray(lat),
                                  jnp.asarray(txt), jnp.asarray(ts)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, ts)
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)


def test_pipeline_end_to_end_i2v_ref_image(pipeline_dir):
    """Engine e2e WanImageToVideo: extra_args.ref_image drives the TI2V
    path — the decoded clip's first frame comes from the (clean)
    condition latent."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    rng = np.random.default_rng(5)
    ref = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
    out = eng.generate([DiffusionRequest(
        "r0", "a clip",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=4,
                                guidance_scale=1.0, seed=0,
                                output_type="latent",
                                extra_args={"ref_image": ref}))])[0]
    assert out.finished and out.error is None
    lat = np.asarray(out.video, np.float32)
    assert lat.ndim == 5 and np.isfinite(lat).all()
    # first latent frame == the blended clean condition (exactly)
    out2 = eng.generate([DiffusionRequest(
        "r1", "a clip",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=4,
                                guidance_scale=1.0, seed=1,
                                output_type="latent",
                                extra_args={"ref_image": ref}))])[0]
    lat2 = np.asarray(out2.video, np.float32)
    np.testing.assert_allclose(lat[:, 0], lat2[:, 0], atol=1e-5)
    assert np.abs(lat[:, 1] - lat2[:, 1]).max() > 1e-6
