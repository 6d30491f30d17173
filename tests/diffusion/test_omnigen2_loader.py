"""OmniGen2 real-geometry family + diffusers loader tests.

Independent torch oracle re-deriving the reference semantics
(diffusion/models/omnigen2/omnigen2_transformer.py:811 — GQA,
LuminaRMSNormZero with tanh'd gates, gate/up/down FF named
linear_1/linear_3/linear_2, text-first joint stream, scale-only final
norm with fused projection; pipeline ascending-t convention)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.omnigen2 import (  # noqa: E402
    OmniGen2Config, omnigen2_forward)

TINY = dict(patch_size=2, in_channels=4, out_channels=4,
            hidden_size=24, num_layers=2, num_refiner_layers=1,
            num_attention_heads=2, num_kv_heads=1, multiple_of=16,
            norm_eps=1e-5, axes_dim_rope=[4, 4, 4],
            axes_lens=[64, 32, 32], text_feat_dim=10,
            timestep_scale=1000.0)
D = TINY["hidden_size"]
HD = D // TINY["num_attention_heads"]
KV = TINY["num_kv_heads"] * HD
TEMB = min(D, 1024)
FH = TINY["multiple_of"] * ((4 * D + TINY["multiple_of"] - 1)
                            // TINY["multiple_of"])
TOK = TINY["patch_size"] ** 2 * TINY["in_channels"]


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

    put("x_embedder", D, TOK)
    put("ref_image_patch_embedder", D, TOK)
    sd["image_index_embedding"] = torch.randn(5, D, generator=g) * 0.1
    put("time_caption_embed.timestep_embedder.linear_1", TEMB, 256)
    put("time_caption_embed.timestep_embedder.linear_2", TEMB, TEMB)
    put_rms("time_caption_embed.caption_embedder.0",
            TINY["text_feat_dim"])
    put("time_caption_embed.caption_embedder.1", D,
        TINY["text_feat_dim"])
    put("norm_out.linear_1", D, TEMB)
    put("norm_out.linear_2", TOK, D)

    def put_block(p, modulation):
        for nm, n_out in (("to_q", D), ("to_k", KV), ("to_v", KV),
                          ("to_out.0", D)):
            put(f"{p}.attn.{nm}", n_out, D, bias=False)
        put_rms(f"{p}.attn.norm_q", HD)
        put_rms(f"{p}.attn.norm_k", HD)
        put(f"{p}.feed_forward.linear_1", FH, D, bias=False)
        put(f"{p}.feed_forward.linear_3", FH, D, bias=False)
        put(f"{p}.feed_forward.linear_2", D, FH, bias=False)
        if modulation:
            put(f"{p}.norm1.linear", 4 * D, TEMB)
            put_rms(f"{p}.norm1.norm", D)
        else:
            put_rms(f"{p}.norm1", D)
        for nm in ("norm2", "ffn_norm1", "ffn_norm2"):
            put_rms(f"{p}.{nm}", D)

    for i in range(TINY["num_refiner_layers"]):
        put_block(f"noise_refiner.{i}", True)
        put_block(f"ref_image_refiner.{i}", True)
        put_block(f"context_refiner.{i}", False)
    for i in range(TINY["num_layers"]):
        put_block(f"layers.{i}", True)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("og2_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "OmniGen2Pipeline",
                   "transformer": ["diffusers",
                                   "OmniGen2Transformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"],
                   "text_encoder": ["transformers", "Qwen2_5_VLModel"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "OmniGen2Transformer2DModel",
                   **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "latent_channels": 4,
                   "block_out_channels": [8, 16, 16, 16]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _rope_ids(h_tok, w_tok, cap_len):
    seq = torch.arange(cap_len).float()
    txt_ids = torch.stack([seq, seq, seq], dim=-1)
    rows = torch.arange(h_tok).repeat_interleave(w_tok).float()
    cols = torch.arange(w_tok).repeat(h_tok).float()
    shift = torch.full_like(rows, float(cap_len))
    img_ids = torch.stack([shift, rows, cols], dim=-1)
    ids = torch.cat([txt_ids, img_ids], dim=0)
    cos_out, sin_out = [], []
    for i, d in enumerate(TINY["axes_dim_rope"]):
        inv = 1.0 / torch.pow(torch.tensor(10000.0),
                              torch.arange(0, d, 2).double() / d)
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


def _oracle_forward(sd, lat_np, cap_np, t_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    cap_in = T(cap_np).float()
    t = T(t_np).float() * TINY["timestep_scale"]
    b, h, w, c = lat.shape
    p = TINY["patch_size"]
    nh, nkv = TINY["num_attention_heads"], TINY["num_kv_heads"]
    eps = TINY["norm_eps"]

    def lin(x, name):
        out = x @ sd[f"{name}.weight"].float().T
        if f"{name}.bias" in sd:
            out = out + sd[f"{name}.bias"].float()
        return out

    def rms(x, name, e=eps):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + e) \
            * sd[f"{name}.weight"].float()

    half = 128
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = t[:, None] * freqs[None, :]
    e = torch.cat([args.cos(), args.sin()], -1)
    temb = lin(torch.nn.functional.silu(
        lin(e, "time_caption_embed.timestep_embedder.linear_1")),
        "time_caption_embed.timestep_embedder.linear_2")
    cap = rms(cap_in, "time_caption_embed.caption_embedder.0")
    cap = lin(cap, "time_caption_embed.caption_embedder.1")
    cap_len = cap.shape[1]

    cos, sin = _rope_ids(h // p, w // p, cap_len)

    def attention(xx, pfx, cc, ss):
        bb, s, _ = xx.shape
        q = rms(lin(xx, f"{pfx}.to_q").view(bb, s, nh, HD),
                f"{pfx}.norm_q", 1e-5)
        k = rms(lin(xx, f"{pfx}.to_k").view(bb, s, nkv, HD),
                f"{pfx}.norm_k", 1e-5)
        v = lin(xx, f"{pfx}.to_v").view(bb, s, nkv, HD)
        q, k = _apply_rope(q, cc, ss), _apply_rope(k, cc, ss)
        k = k.repeat_interleave(nh // nkv, dim=2)
        v = v.repeat_interleave(nh // nkv, dim=2)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        return lin(o.transpose(1, 2).reshape(bb, s, nh * HD),
                   f"{pfx}.to_out.0")

    def ff(xx, pfx):
        return lin(torch.nn.functional.silu(lin(xx, f"{pfx}.linear_1"))
                   * lin(xx, f"{pfx}.linear_3"), f"{pfx}.linear_2")

    def block(xx, pfx, cc, ss, modulated):
        if modulated:
            mod = lin(torch.nn.functional.silu(temb),
                      f"{pfx}.norm1.linear").unsqueeze(1)
            s_msa, g_msa, s_mlp, g_mlp = mod.chunk(4, dim=-1)
            hh = rms(xx, f"{pfx}.norm1.norm") * (1 + s_msa)
            attn = attention(hh, f"{pfx}.attn", cc, ss)
            xx = xx + g_msa.tanh() * rms(attn, f"{pfx}.norm2")
            h2 = rms(xx, f"{pfx}.ffn_norm1") * (1 + s_mlp)
            return xx + g_mlp.tanh() * rms(ff(h2, f"{pfx}.feed_forward"),
                                           f"{pfx}.ffn_norm2")
        hh = rms(xx, f"{pfx}.norm1")
        attn = attention(hh, f"{pfx}.attn", cc, ss)
        xx = xx + rms(attn, f"{pfx}.norm2")
        h2 = rms(xx, f"{pfx}.ffn_norm1")
        return xx + rms(ff(h2, f"{pfx}.feed_forward"),
                        f"{pfx}.ffn_norm2")

    cap_cos, cap_sin = cos[:cap_len], sin[:cap_len]
    img_cos, img_sin = cos[cap_len:], sin[cap_len:]
    for i in range(TINY["num_refiner_layers"]):
        cap = block(cap, f"context_refiner.{i}", cap_cos, cap_sin,
                    False)

    x = lat.reshape(b, h // p, p, w // p, p, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b, (h // p) * (w // p), p * p * c)
    x = lin(x, "x_embedder")
    for i in range(TINY["num_refiner_layers"]):
        x = block(x, f"noise_refiner.{i}", img_cos, img_sin, True)

    joint = torch.cat([cap, x], dim=1)
    for i in range(TINY["num_layers"]):
        joint = block(joint, f"layers.{i}", cos, sin, True)

    scale = lin(torch.nn.functional.silu(temb), "norm_out.linear_1")
    out = torch.nn.functional.layer_norm(joint, (D,), eps=1e-6) * \
        (1 + scale).unsqueeze(1)
    out = lin(out, "norm_out.linear_2")
    out = out[:, cap_len:]
    out = out.reshape(b, h // p, w // p, p, p, c).permute(
        0, 1, 3, 2, 4, 5).reshape(b, h, w, c)
    return out.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "omnigen2"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, OmniGen2Config)
    assert cfg.ffn_hidden == FH
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.omnigen2 import (assign_omnigen2_tensor,
                                                  init_omnigen2_params)
    import jax

    params = init_omnigen2_params(cfg, jax.random.PRNGKey(0),
                                  jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_omnigen2_tensor(params, n, t.numpy(),
                                              jnp.float32)]
    assert unmapped == []


def test_forward_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(31)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    cap = rng.standard_normal((2, 5, TINY["text_feat_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.2, 0.85], np.float32)  # model convention (1 - σ)
    ours = np.asarray(omnigen2_forward(
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
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "omnigen2"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny omnigen2 test",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
