"""Helios real-geometry family + diffusers loader tests.

Independent torch oracle re-deriving the reference single-chunk (T2V,
no history) semantics (diffusion/models/helios/helios_transformer.py
:571 — Wan-architecture blocks, explicit config rope_dim, plain-Linear
ffn.net.0, HeliosOutputNorm scale_shift_table under norm_out)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.helios import (  # noqa: E402
    HeliosConfig, helios_forward)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)

TINY = dict(patch_size=[1, 2, 2], num_attention_heads=2,
            attention_head_dim=12, in_channels=4, out_channels=4,
            text_dim=20, freq_dim=32, ffn_dim=48, num_layers=2,
            cross_attn_norm=True, rope_dim=[4, 4, 4],
            rope_theta=10000.0, has_multi_term_memory_patch=True,
            is_amplify_history=True)
D = TINY["num_attention_heads"] * TINY["attention_head_dim"]


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    def put_rms(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5

    pt, ph, pw = TINY["patch_size"]
    sd["patch_embedding.weight"] = torch.randn(
        D, TINY["in_channels"], pt, ph, pw, generator=g) * 0.1
    sd["patch_embedding.bias"] = torch.randn(D, generator=g) * 0.02
    for nm, k in (("patch_short", (1, 2, 2)), ("patch_mid", (2, 4, 4)),
                  ("patch_long", (4, 8, 8))):
        sd[f"{nm}.weight"] = torch.randn(
            D, TINY["in_channels"], *k, generator=g) * 0.1
        sd[f"{nm}.bias"] = torch.randn(D, generator=g) * 0.02
    put("condition_embedder.time_embedder.linear_1", D,
        TINY["freq_dim"])
    put("condition_embedder.time_embedder.linear_2", D, D)
    put("condition_embedder.time_proj", 6 * D, D)
    put("condition_embedder.text_embedder.linear_1", D,
        TINY["text_dim"])
    put("condition_embedder.text_embedder.linear_2", D, D)
    sd["norm_out.scale_shift_table"] = torch.randn(
        1, 2, D, generator=g) * D ** -0.5
    put("proj_out", TINY["out_channels"] * pt * ph * pw, D)
    for i in range(TINY["num_layers"]):
        p = f"blocks.{i}"
        sd[f"{p}.scale_shift_table"] = torch.randn(
            1, 6, D, generator=g) * D ** -0.5
        for att in ("attn1", "attn2"):
            for nm in ("to_q", "to_k", "to_v"):
                put(f"{p}.{att}.{nm}", D, D)
            put(f"{p}.{att}.to_out.0", D, D)
            put_rms(f"{p}.{att}.norm_q", D)
            put_rms(f"{p}.{att}.norm_k", D)
        sd[f"{p}.attn1.history_key_scale"] = torch.ones(
            TINY["num_attention_heads"])
        sd[f"{p}.norm2.weight"] = torch.rand(D, generator=g) + 0.5
        sd[f"{p}.norm2.bias"] = torch.randn(D, generator=g) * 0.02
        put(f"{p}.ffn.net.0", TINY["ffn_dim"], D)
        put(f"{p}.ffn.net.2", D, TINY["ffn_dim"])
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("helios_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "HeliosPipeline",
                   "transformer": ["diffusers",
                                   "HeliosTransformer3DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKLWan"],
                   "text_encoder": ["transformers", "UMT5EncoderModel"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "HeliosTransformer3DModel", **TINY},
                  f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 5.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLWan",
                   "latent_channels": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle (single chunk, no history)
# ---------------------------------------------------------------------------


def _oracle_rope(f_tok, h_tok, w_tok):
    """[S, head_dim] cos/sin with each half-freq repeat_interleaved —
    HeliosRotaryPosEmbed :156 + apply :53."""
    dims = TINY["rope_dim"]
    grids = torch.meshgrid(torch.arange(f_tok), torch.arange(h_tok),
                           torch.arange(w_tok), indexing="ij")
    cos_list, sin_list = [], []
    for grid, dim in zip(grids, dims):
        inv = 1.0 / torch.pow(torch.tensor(TINY["rope_theta"]),
                              torch.arange(0, dim, 2).float() / dim)
        fr = torch.outer(grid.reshape(-1).float(), inv)
        fr = fr.repeat_interleave(2, dim=-1)
        cos_list.append(fr.cos())
        sin_list.append(fr.sin())
    return torch.cat(cos_list, -1), torch.cat(sin_list, -1)


def _apply_rope_helios(x, cos, sin):
    """apply_rotary_emb_helios :53 — adjacent pairs against
    repeat_interleaved full-width tables."""
    x1, x2 = x.unflatten(-1, (-1, 2)).unbind(-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = torch.empty_like(x)
    out[..., 0::2] = x1 * c[..., 0::2] - x2 * s[..., 1::2]
    out[..., 1::2] = x1 * s[..., 1::2] + x2 * c[..., 0::2]
    return out


def _oracle_forward(sd, lat_np, txt_np, t_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    txt_in = T(txt_np).float()
    t_train = T(t_np).float() * 1000.0
    b, f, h, w, c = lat.shape
    pt, ph, pw = TINY["patch_size"]
    nh, hd = TINY["num_attention_heads"], TINY["attention_head_dim"]

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def ln(x):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                              eps=1e-6)

    def rms_full(x, name):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + 1e-6) \
            * sd[f"{name}.weight"].float()

    xw = sd["patch_embedding.weight"].float()
    x = torch.nn.functional.conv3d(
        lat.permute(0, 4, 1, 2, 3), xw,
        sd["patch_embedding.bias"].float(),
        stride=(pt, ph, pw)).flatten(2).transpose(1, 2)

    half = TINY["freq_dim"] // 2
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = t_train[:, None] * freqs[None, :]
    e = torch.cat([args.cos(), args.sin()], -1)
    temb = lin(torch.nn.functional.silu(
        lin(e, "condition_embedder.time_embedder.linear_1")),
        "condition_embedder.time_embedder.linear_2")
    tproj = lin(torch.nn.functional.silu(temb),
                "condition_embedder.time_proj").view(b, 6, D)
    ctx = lin(torch.nn.functional.gelu(
        lin(txt_in, "condition_embedder.text_embedder.linear_1"),
        approximate="tanh"),
        "condition_embedder.text_embedder.linear_2")

    cos, sin = _oracle_rope(f // pt, h // ph, w // pw)

    def attend(q, k, v, s_q):
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return o.transpose(1, 2).reshape(b, s_q, nh * hd)

    for i in range(TINY["num_layers"]):
        p = f"blocks.{i}"
        mod = sd[f"{p}.scale_shift_table"].float() + tproj
        sh1, sc1, g1 = mod[:, 0:1], mod[:, 1:2], mod[:, 2:3]
        sh2, sc2, g2 = mod[:, 3:4], mod[:, 4:5], mod[:, 5:6]
        s = x.shape[1]
        xn = ln(x) * (1 + sc1) + sh1
        q = rms_full(lin(xn, f"{p}.attn1.to_q"), f"{p}.attn1.norm_q")
        k = rms_full(lin(xn, f"{p}.attn1.to_k"), f"{p}.attn1.norm_k")
        v = lin(xn, f"{p}.attn1.to_v")
        q = _apply_rope_helios(q.view(b, s, nh, hd), cos, sin)
        k = _apply_rope_helios(k.view(b, s, nh, hd), cos, sin)
        o = attend(q, k, v.view(b, s, nh, hd), s)
        x = x + g1 * lin(o, f"{p}.attn1.to_out.0")

        xn2 = ln(x) * sd[f"{p}.norm2.weight"].float() + \
            sd[f"{p}.norm2.bias"].float()
        tt = ctx.shape[1]
        q = rms_full(lin(xn2, f"{p}.attn2.to_q"), f"{p}.attn2.norm_q")
        k = rms_full(lin(ctx, f"{p}.attn2.to_k"), f"{p}.attn2.norm_k")
        v = lin(ctx, f"{p}.attn2.to_v")
        o = attend(q.view(b, s, nh, hd), k.view(b, tt, nh, hd),
                   v.view(b, tt, nh, hd), s)
        x = x + lin(o, f"{p}.attn2.to_out.0")

        xn3 = ln(x) * (1 + sc2) + sh2
        ff = lin(torch.nn.functional.gelu(
            lin(xn3, f"{p}.ffn.net.0"), approximate="tanh"),
            f"{p}.ffn.net.2")
        x = x + g2 * ff

    # scale_shift_table [1, 2, D]: chunk along dim 1
    table = sd["norm_out.scale_shift_table"].float()
    fin = table + temb.unsqueeze(1)  # [B, 2, D]
    shift, scale = fin[:, 0], fin[:, 1]
    out = ln(x) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
    out = lin(out, "proj_out")
    # unpatchify (pt, ph, pw, c) innermost-c
    out = out.reshape(b, f // pt, h // ph, w // pw, pt, ph, pw, -1)
    out = out.permute(0, 1, 4, 2, 5, 3, 6, 7)
    return out.reshape(b, f, h, w, TINY["out_channels"]).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "helios"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, HeliosConfig)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.helios import (assign_helios_tensor,
                                                init_helios_params)
    import jax

    params = init_helios_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_helios_tensor(params, n, t.numpy(),
                                            jnp.float32)]
    assert unmapped == []


def test_forward_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(37)
    lat = rng.standard_normal((2, 2, 4, 4, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["text_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.9, 0.3], np.float32)
    ours = np.asarray(helios_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t)
    assert ours.shape == golden.shape == (2, 2, 4, 4, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_pipeline_end_to_end_video(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "helios"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny helios test video",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=2,
                                guidance_scale=5.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.video.shape[0] == 2
