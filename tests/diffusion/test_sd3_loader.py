"""SD3/SD3.5 real-geometry family + diffusers-format loader tests.

Same method as test_flux_loader.py: the checkpoint fixture is written in
the genuine diffusers layout (SD3Transformer2DModel naming — joint
blocks `transformer_blocks.N` with AdaLN-Zero, the LAST block
context_pre_only with an AdaLayerNormContinuous context norm and no
to_add_out, SD3.5 dual_attention_layers adding attn2 under a 9-chunk
SD35AdaLayerNormZeroX, conv patch embed + center-cropped learned
pos_embed buffer, torch [out, in] Linear weights), and the numeric
oracle is an independent torch re-implementation of the diffusers
semantics. Reference: diffusion/models/sd3/sd3_transformer.py:384."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.sd3 import SD3Config  # noqa: E402

TINY = dict(sample_size=16, patch_size=2, in_channels=4, out_channels=4,
            num_layers=3, attention_head_dim=16, num_attention_heads=2,
            joint_attention_dim=24, caption_projection_dim=32,
            pooled_projection_dim=12, pos_embed_max_size=12,
            dual_attention_layers=[1], qk_norm="rms_norm")


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    hs = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    mlp = hs * 4
    hd = TINY["attention_head_dim"]
    p = TINY["patch_size"]
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(n_out, n_in, generator=g) \
            * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    sd["pos_embed.proj.weight"] = torch.randn(
        hs, TINY["in_channels"], p, p, generator=g) * 0.1
    sd["pos_embed.proj.bias"] = torch.randn(hs, generator=g) * 0.02
    sd["pos_embed.pos_embed"] = torch.randn(
        1, TINY["pos_embed_max_size"] ** 2, hs, generator=g) * 0.02
    put("context_embedder", TINY["caption_projection_dim"],
        TINY["joint_attention_dim"])
    put("time_text_embed.timestep_embedder.linear_1", hs, 256)
    put("time_text_embed.timestep_embedder.linear_2", hs, hs)
    put("time_text_embed.text_embedder.linear_1", hs,
        TINY["pooled_projection_dim"])
    put("time_text_embed.text_embedder.linear_2", hs, hs)
    put("norm_out.linear", 2 * hs, hs)
    put("proj_out", p * p * TINY["out_channels"], hs)
    n = TINY["num_layers"]
    for i in range(n):
        pref = f"transformer_blocks.{i}"
        last = i == n - 1
        dual = i in TINY["dual_attention_layers"]
        put(f"{pref}.norm1.linear", (9 if dual else 6) * hs, hs)
        put(f"{pref}.norm1_context.linear", (2 if last else 6) * hs, hs)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj"):
            put(f"{pref}.attn.{nm}", hs, hs)
        put(f"{pref}.attn.to_out.0", hs, hs)
        if not last:
            put(f"{pref}.attn.to_add_out", hs, hs)
            put(f"{pref}.ff_context.net.0.proj", mlp, hs)
            put(f"{pref}.ff_context.net.2", hs, mlp)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{pref}.attn.{nm}.weight"] = torch.rand(
                hd, generator=g) + 0.5
        if dual:
            for nm in ("to_q", "to_k", "to_v"):
                put(f"{pref}.attn2.{nm}", hs, hs)
            put(f"{pref}.attn2.to_out.0", hs, hs)
            for nm in ("norm_q", "norm_k"):
                sd[f"{pref}.attn2.{nm}.weight"] = torch.rand(
                    hd, generator=g) + 0.5
        put(f"{pref}.ff.net.0.proj", mlp, hs)
        put(f"{pref}.ff.net.2", hs, mlp)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sd3_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "StableDiffusion3Pipeline",
                   "transformer": ["diffusers", "SD3Transformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "SD3Transformer2DModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 3.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "latent_channels": 4,
                   "block_out_channels": [16, 32]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle (diffusers SD3Transformer2DModel semantics)
# ---------------------------------------------------------------------------


def _oracle_forward(sd, cfg, latents_np, txt_np, t_np, pooled_np):
    T = torch.from_numpy
    lat = T(latents_np).float().permute(0, 3, 1, 2)  # NCHW
    txt, tt = T(txt_np).float(), T(t_np).float()
    pooled = T(pooled_np).float()
    b, c, h, w = lat.shape
    p = cfg["patch_size"]
    nh, hd = cfg["num_attention_heads"], cfg["attention_head_dim"]
    hs = nh * hd
    eps = 1e-6

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    # PatchEmbed: conv + cropped pos table
    x = torch.nn.functional.conv2d(lat, sd["pos_embed.proj.weight"],
                                   sd["pos_embed.proj.bias"], stride=p)
    x = x.flatten(2).transpose(1, 2)  # [B, T, hs]
    ht, wt = h // p, w // p
    m = cfg["pos_embed_max_size"]
    table = sd["pos_embed.pos_embed"].reshape(m, m, hs)
    top, left = (m - ht) // 2, (m - wt) // 2
    x = x + table[top:top + ht, left:left + wt].reshape(1, ht * wt, hs)

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
        embed(pooled, "text_embedder")
    st = torch.nn.functional.silu(te)
    txt_h = lin(txt, "context_embedder")

    def rms(x, wname):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * sd[wname].float()

    def ada(x, shift, scale):
        xn = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)
        return xn * (1 + scale[:, None]) + shift[:, None]

    def attend(q, k, v):
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return o.transpose(1, 2).reshape(q.shape[0], q.shape[1], hs)

    tv, ttk = x.shape[1], txt_h.shape[1]
    n = cfg["num_layers"]
    for i in range(n):
        pref = f"transformer_blocks.{i}"
        last = i == n - 1
        dual = i in cfg["dual_attention_layers"]
        imod = lin(st, f"{pref}.norm1.linear")
        if dual:
            (ish, isc, ig, ish2, isc2, ig2,
             ish3, isc3, ig3) = imod.chunk(9, -1)
        else:
            ish, isc, ig, ish2, isc2, ig2 = imod.chunk(6, -1)
        img_n = ada(x, ish, isc)
        if last:
            cmod = lin(st, f"{pref}.norm1_context.linear")
            csc, csh = cmod.chunk(2, -1)  # scale FIRST (AdaLNContinuous)
            txt_n = ada(txt_h, csh, csc)
        else:
            tsh, tsc, tg, tsh2, tsc2, tg2 = lin(
                st, f"{pref}.norm1_context.linear").chunk(6, -1)
            txt_n = ada(txt_h, tsh, tsc)

        def qkv(xx, stem, ntok, names=("to_q", "to_k", "to_v"),
                norms=("norm_q", "norm_k")):
            q = lin(xx, f"{stem}.{names[0]}").view(b, ntok, nh, hd)
            k = lin(xx, f"{stem}.{names[1]}").view(b, ntok, nh, hd)
            v = lin(xx, f"{stem}.{names[2]}").view(b, ntok, nh, hd)
            q = rms(q, f"{stem}.{norms[0]}.weight")
            k = rms(k, f"{stem}.{norms[1]}.weight")
            return q, k, v

        iq, ik, iv = qkv(img_n, f"{pref}.attn", tv)
        tq, tk, tvv = qkv(txt_n, f"{pref}.attn", ttk,
                          ("add_q_proj", "add_k_proj", "add_v_proj"),
                          ("norm_added_q", "norm_added_k"))
        o = attend(torch.cat([tq, iq], 1), torch.cat([tk, ik], 1),
                   torch.cat([tvv, iv], 1))
        x = x + ig[:, None] * lin(o[:, ttk:], f"{pref}.attn.to_out.0")
        if dual:
            img_n2 = ada(x, ish3, isc3)
            q2, k2, v2 = qkv(img_n2, f"{pref}.attn2", tv)
            x = x + ig3[:, None] * lin(attend(q2, k2, v2),
                                       f"{pref}.attn2.to_out.0")

        def ff(xx, which):
            hdn = lin(xx, f"{pref}.{which}.net.0.proj")
            hdn = torch.nn.functional.gelu(hdn, approximate="tanh")
            return lin(hdn, f"{pref}.{which}.net.2")

        x = x + ig2[:, None] * ff(ada(x, ish2, isc2), "ff")
        if last:
            txt_h = None
        else:
            txt_h = txt_h + tg[:, None] * lin(o[:, :ttk],
                                              f"{pref}.attn.to_add_out")
            txt_h = txt_h + tg2[:, None] * ff(ada(txt_h, tsh2, tsc2),
                                              "ff_context")

    fin = lin(st, "norm_out.linear")
    sc, sh = fin.chunk(2, -1)
    out = lin(ada(x, sh, sc), "proj_out")
    oc = cfg["out_channels"]
    # diffusers unpatchify: nhwpqc → nchpwq (PATCH-major)
    out = out.view(b, ht, wt, p, p, oc)
    out = torch.einsum("nhwpqc->nchpwq", out).reshape(b, oc, h, w)
    return out.permute(0, 2, 3, 1).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "sd3"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, SD3Config)
    assert cfg.dual_attention_layers == (1,)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.sd3 import (assign_sd3_tensor,
                                             init_sd3_params)

    params = init_sd3_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [nm for nm, t in sd.items()
                if not assign_sd3_tensor(params, nm, t.numpy(),
                                         jnp.float32)]
    assert unmapped == []


def test_forward_parity_vs_torch_oracle(pipeline_dir):
    from vllm_omni_tpu.diffusion.sd3 import sd3_forward

    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(4)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    pooled = rng.standard_normal((2, TINY["pooled_projection_dim"]),
                                 dtype=np.float32)
    t = np.asarray([0.7, 0.3], np.float32)
    ours = np.asarray(sd3_forward(params, cfg, jnp.asarray(lat),
                                  jnp.asarray(txt), jnp.asarray(t),
                                  pooled=jnp.asarray(pooled)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, t,
                             pooled)
    assert ours.shape == golden.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_pipeline_end_to_end_with_diffusers_dir(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    out = eng.generate([DiffusionRequest(
        "r0", "a prompt", DiffusionSamplingParams(
            num_inference_steps=2, height=32, width=32,
            guidance_scale=4.0, seed=0, output_type="latent"))])[0]
    assert out.error is None, out.error
    assert np.isfinite(np.asarray(out.images)).all()
