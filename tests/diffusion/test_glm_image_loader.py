"""GLM-Image DiT real-geometry family + loader tests.

Independent torch oracle re-deriving the reference semantics
(diffusion/models/glm_image/glm_image_transformer.py:843 — 12-chunk
no-SiLU AdaLN with interleaved img/ctx order, per-head no-affine
LayerNorm q/k norms, image-only 2D duplicated-halves rope, SHARED FF
across streams, prior-VQ conditioning with CFG drop, SDXL-like
size/crop conditioning, no-SiLU scale-first final AdaLN)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.glm_image import (  # noqa: E402
    GlmImageConfig, glm_image_forward)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    load_diffusers_pipeline)

TINY = dict(patch_size=2, in_channels=4, out_channels=4, num_layers=2,
            num_attention_heads=2, attention_head_dim=16,
            time_embed_dim=32, condition_dim=16,
            prior_vq_quantizer_codebook_size=32, text_embed_dim=12)
D = TINY["num_attention_heads"] * TINY["attention_head_dim"]
HD = TINY["attention_head_dim"]
NH = TINY["num_attention_heads"]
TE = TINY["time_embed_dim"]
FFN = 4 * D
TOK = TINY["in_channels"] * TINY["patch_size"] ** 2


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    put("image_projector.proj", D, TOK)
    put("glyph_projector.net.0", D, TINY["text_embed_dim"])
    put("glyph_projector.net.2", D, D)
    sd["prior_token_embedding.weight"] = torch.randn(
        TINY["prior_vq_quantizer_codebook_size"], D, generator=g) * 0.1
    put("prior_projector.net.0", D, D)
    put("prior_projector.net.2", D, D)
    put("time_condition_embed.timestep_embedder.linear_1", TE, TE)
    put("time_condition_embed.timestep_embedder.linear_2", TE, TE)
    put("time_condition_embed.condition_embedder.linear_1", TE,
        4 * TINY["condition_dim"])
    put("time_condition_embed.condition_embedder.linear_2", TE, TE)
    put("norm_out.linear", 2 * D, TE)
    put("proj_out", TOK, D)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        put(f"{p}.norm1.linear", 12 * D, TE)
        for nm in ("to_q", "to_k", "to_v"):
            put(f"{p}.attn1.{nm}", D, D)
        put(f"{p}.attn1.to_out.0", D, D)
        put(f"{p}.ff.net.0", FFN, D)
        put(f"{p}.ff.net.2", D, FFN)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("glm_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "GlmImagePipeline",
                   "transformer": ["diffusers",
                                   "GlmImageTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "GlmImageTransformer2DModel",
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


def _oracle_rope(h_tok, w_tok):
    dh = dw = HD // 2

    def inv(dim):
        return 1.0 / torch.pow(
            torch.tensor(10000.0),
            torch.arange(0, dim, 2).float()[:dim // 2] / dim)

    fh = torch.outer(torch.arange(h_tok).float(), inv(dh))
    fw = torch.outer(torch.arange(w_tok).float(), inv(dw))
    fh = fh.unsqueeze(1).expand(h_tok, w_tok, -1)
    fw = fw.unsqueeze(0).expand(h_tok, w_tok, -1)
    freqs = torch.cat([fh, fw], -1)
    freqs = torch.cat([freqs, freqs], -1).reshape(h_tok * w_tok, -1)
    return freqs.cos(), freqs.sin()


def _apply_rope(x, cos, sin):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    rot = torch.cat([-x2, x1], -1)
    return x * cos[None, :, None, :] + rot * sin[None, :, None, :]


def _sinusoid(v, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = v[:, None].float() * freqs[None]
    return torch.cat([args.cos(), args.sin()], -1)


def _oracle_forward(sd, lat_np, txt_np, t_np, prior_np, drop_np,
                    target_np, crop_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    txt = T(txt_np).float()
    t = T(t_np).float()
    prior_id = T(prior_np).long()
    drop = T(drop_np).bool()
    b, h, w, c = lat.shape
    p = TINY["patch_size"]
    hp, wp = h // p, w // p

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def ln(x):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                              eps=1e-5)

    ctx = lin(torch.nn.functional.gelu(lin(txt, "glyph_projector.net.0")),
              "glyph_projector.net.2")
    prior = sd["prior_token_embedding.weight"][prior_id].float()
    prior = prior * (~drop)[:, None, None].float()
    prior = lin(torch.nn.functional.silu(
        lin(prior, "prior_projector.net.0")), "prior_projector.net.2")

    x = lat.reshape(b, hp, p, wp, p, c).permute(0, 1, 3, 5, 2, 4)
    x = x.reshape(b, hp * wp, c * p * p)
    x = lin(x, "image_projector.proj") + prior

    temb = lin(torch.nn.functional.silu(lin(
        _sinusoid(t, TE), "time_condition_embed.timestep_embedder"
        ".linear_1")), "time_condition_embed.timestep_embedder.linear_2")
    conds = torch.cat([T(target_np).float(), T(crop_np).float()], dim=1)
    ce = _sinusoid(conds.reshape(-1), TINY["condition_dim"]).reshape(
        b, 4 * TINY["condition_dim"])
    temb = temb + lin(torch.nn.functional.silu(lin(
        ce, "time_condition_embed.condition_embedder.linear_1")),
        "time_condition_embed.condition_embedder.linear_2")

    cos, sin = _oracle_rope(hp, wp)
    tt = txt.shape[1]

    for i in range(TINY["num_layers"]):
        pfx = f"transformer_blocks.{i}"
        mod = lin(temb, f"{pfx}.norm1.linear").unsqueeze(1)
        (sh, c_sh, sc, c_sc, gm, c_gm, sh2, c_sh2, sc2, c_sc2,
         gmlp, c_gmlp) = mod.chunk(12, dim=-1)
        xn = ln(x) * (1 + sc) + sh
        cn = ln(ctx) * (1 + c_sc) + c_sh
        joint = torch.cat([cn, xn], dim=1)
        s = joint.shape[1]
        q = lin(joint, f"{pfx}.attn1.to_q").view(b, s, NH, HD)
        k = lin(joint, f"{pfx}.attn1.to_k").view(b, s, NH, HD)
        v = lin(joint, f"{pfx}.attn1.to_v").view(b, s, NH, HD)
        q = torch.nn.functional.layer_norm(q, (HD,), eps=1e-5)
        k = torch.nn.functional.layer_norm(k, (HD,), eps=1e-5)
        qi = _apply_rope(q[:, tt:], cos, sin)
        ki = _apply_rope(k[:, tt:], cos, sin)
        q = torch.cat([q[:, :tt], qi], dim=1)
        k = torch.cat([k[:, :tt], ki], dim=1)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(b, s, NH * HD)
        o = lin(o, f"{pfx}.attn1.to_out.0")
        x = x + o[:, tt:] * gm
        ctx = ctx + o[:, :tt] * c_gm
        xn2 = ln(x) * (1 + sc2) + sh2
        cn2 = ln(ctx) * (1 + c_sc2) + c_sh2

        def ff(v_in):
            return lin(torch.nn.functional.gelu(
                lin(v_in, f"{pfx}.ff.net.0"), approximate="tanh"),
                f"{pfx}.ff.net.2")

        x = x + ff(xn2) * gmlp
        ctx = ctx + ff(cn2) * c_gmlp

    fin = lin(temb, "norm_out.linear")  # NO silu
    scale, shift = fin.chunk(2, dim=1)
    out = ln(x) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
    out = lin(out, "proj_out")
    out = out.reshape(b, hp, wp, c, p, p).permute(0, 1, 4, 2, 5, 3)
    return out.reshape(b, h, w, c).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "glm_image"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, GlmImageConfig)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.glm_image import (
        assign_glm_image_tensor, init_glm_image_params)
    import jax

    params = init_glm_image_params(cfg, jax.random.PRNGKey(0),
                                   jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_glm_image_tensor(params, n, t.numpy(),
                                               jnp.float32)]
    assert unmapped == []


def test_forward_parity_with_prior(pipeline_dir):
    """Prior kept on row 0, dropped on row 1 — pins the CFG prior-drop
    semantics alongside full block parity."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(61)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["text_embed_dim"]),
                              dtype=np.float32)
    t = np.asarray([874.0, 213.0], np.float32)  # model units (σ·1e3−1)
    prior = rng.integers(0, 32, (2, 16)).astype(np.int32)
    drop = np.asarray([False, True])
    target = np.asarray([[64.0, 64.0]] * 2, np.float32)
    crop = np.zeros((2, 2), np.float32)
    ours = np.asarray(glm_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        prior_token_id=jnp.asarray(prior),
        prior_token_drop=jnp.asarray(drop),
        target_size=jnp.asarray(target), crop_coords=jnp.asarray(crop)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t, prior,
                             drop, target, crop)
    assert ours.shape == golden.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)


def test_pipeline_end_to_end_with_ar_prior(pipeline_dir):
    """Engine drive with AR prior tokens via additional_information."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "glm_image"
    rng = np.random.default_rng(3)
    req = DiffusionRequest(
        "r0", "a tiny glm test",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.0, seed=0,
                                output_type="np"))
    req.additional_information["prior_token_id"] = rng.integers(
        0, 32, (1, 4)).astype(np.int32)
    out = eng.generate([req])[0]
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
    # and without priors (dropped-prior branch)
    out2 = eng.generate([DiffusionRequest(
        "r1", "no prior",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.0, seed=0,
                                output_type="np"))])[0]
    assert out2.finished and out2.error is None, out2.error
