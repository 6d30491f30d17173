"""CosyVoice3 audio DiT real-geometry family + loader tests.

Independent torch oracle re-deriving the reference semantics
(diffusion/models/cosyvoice3_audio/cosyvoice3_dit.py:373 — F5-TTS-style
blocks with AdaLayerNormZero, causal grouped conv position embedding,
sin-first timestep sinusoid, the head-0-only rope quirk :125, and the
scale-first final AdaLN)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.cosyvoice3_audio import (  # noqa: E402
    Cosy3AudioConfig, cosy3_audio_forward)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)

TINY = dict(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2,
            mel_dim=8, mu_dim=12, spk_dim=6)
D = TINY["dim"]
INNER = TINY["heads"] * TINY["dim_head"]
IN_DIM = TINY["mel_dim"] * 2 + TINY["mu_dim"] + TINY["spk_dim"]
GROUPS = 16


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    put("time_embed.time_mlp.0", D, 256)
    put("time_embed.time_mlp.2", D, D)
    put("input_embed.proj", D, IN_DIM)
    for nm in ("conv1", "conv2"):
        sd[f"input_embed.conv_pos_embed.{nm}.0.weight"] = torch.randn(
            D, D // GROUPS, 31, generator=g) * 0.05
        sd[f"input_embed.conv_pos_embed.{nm}.0.bias"] = torch.randn(
            D, generator=g) * 0.02
    put("norm_out.linear", 2 * D, D)
    put("proj_out", TINY["mel_dim"], D)
    for i in range(TINY["depth"]):
        p = f"transformer_blocks.{i}"
        put(f"{p}.attn_norm.linear", 6 * D, D)
        for nm in ("to_q", "to_k", "to_v"):
            put(f"{p}.attn.{nm}", INNER, D)
        put(f"{p}.attn.to_out.0", D, INNER)
        put(f"{p}.ff.ff.0.0", TINY["ff_mult"] * D, D)
        put(f"{p}.ff.ff.2", D, TINY["ff_mult"] * D)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cosy3a_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "CosyVoice3AudioPipeline",
                   "transformer": ["vllm_omni", "CosyVoice3AudioDiT"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "CosyVoice3AudioDiT", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_forward(sd, x_np, mu_np, t_np, cond_np, spk_np):
    T = torch.from_numpy
    x_mel = T(x_np).float()
    mu = T(mu_np).float()
    t = T(t_np).float()
    cond = T(cond_np).float()
    spks = T(spk_np).float()
    b, s, _ = x_mel.shape
    nh, hd = TINY["heads"], TINY["dim_head"]

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def ln(x):
        return torch.nn.functional.layer_norm(x, (x.shape[-1],),
                                              eps=1e-6)

    # timestep: sin FIRST, (half-1) denominator, scale 1000
    half = 128
    emb = math.log(10000) / (half - 1)
    freqs = torch.exp(torch.arange(half).float() * -emb)
    args = 1000.0 * t[:, None] * freqs[None, :]
    e = torch.cat([args.sin(), args.cos()], dim=-1)
    temb = lin(torch.nn.functional.silu(
        lin(e, "time_embed.time_mlp.0")), "time_embed.time_mlp.2")

    xx = lin(torch.cat([x_mel, cond, mu,
                        spks[:, None, :].expand(b, s, -1)], dim=-1),
             "input_embed.proj")

    def causal_conv(v, nm):
        w = sd[f"input_embed.conv_pos_embed.{nm}.0.weight"].float()
        bb = sd[f"input_embed.conv_pos_embed.{nm}.0.bias"].float()
        vp = torch.nn.functional.pad(v.permute(0, 2, 1), (30, 0))
        out = torch.nn.functional.conv1d(vp, w, bb, groups=GROUPS)
        return out.permute(0, 2, 1)

    def mish(v):
        return v * torch.tanh(torch.nn.functional.softplus(v))

    pe = mish(causal_conv(xx, "conv1"))
    pe = mish(causal_conv(pe, "conv2"))
    xx = xx + pe

    # rope tables (x_transformers: half-width, GPT-J pairs)
    inv = 1.0 / torch.pow(torch.tensor(10000.0),
                          torch.arange(0, hd, 2).double() / hd)
    fr = torch.arange(s).double()[:, None] * inv[None, :]
    cos, sin = fr.cos().float(), fr.sin().float()

    def rope_head0(q):
        """rotate ONLY the first dim_head features of [B, S, inner]."""
        qr = q[..., :hd]
        x1, x2 = qr[..., 0::2], qr[..., 1::2]
        out = torch.stack([x1 * cos[None] - x2 * sin[None],
                           x2 * cos[None] + x1 * sin[None]],
                          dim=-1).reshape(qr.shape)
        return torch.cat([out, q[..., hd:]], dim=-1)

    for i in range(TINY["depth"]):
        p = f"transformer_blocks.{i}"
        mod = lin(torch.nn.functional.silu(temb),
                  f"{p}.attn_norm.linear").unsqueeze(1)
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = mod.chunk(
            6, dim=-1)
        xn = ln(xx) * (1 + sc_msa) + sh_msa
        q = rope_head0(lin(xn, f"{p}.attn.to_q"))
        k = rope_head0(lin(xn, f"{p}.attn.to_k"))
        v = lin(xn, f"{p}.attn.to_v")
        q = q.view(b, s, nh, hd).transpose(1, 2)
        k = k.view(b, s, nh, hd).transpose(1, 2)
        v = v.view(b, s, nh, hd).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, nh * hd)
        xx = xx + g_msa * lin(o, f"{p}.attn.to_out.0")
        xn2 = ln(xx) * (1 + sc_mlp) + sh_mlp
        ff = lin(torch.nn.functional.gelu(
            lin(xn2, f"{p}.ff.ff.0.0"), approximate="tanh"),
            f"{p}.ff.ff.2")
        xx = xx + g_mlp * ff

    fin = lin(torch.nn.functional.silu(temb), "norm_out.linear")
    scale_o, shift_o = fin.chunk(2, dim=-1)
    out = ln(xx) * (1 + scale_o.unsqueeze(1)) + shift_o.unsqueeze(1)
    return lin(out, "proj_out").numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "cosyvoice3_audio"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, Cosy3AudioConfig)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.cosyvoice3_audio import (
        assign_cosy3_audio_tensor, init_cosy3_audio_params)
    import jax

    params = init_cosy3_audio_params(cfg, jax.random.PRNGKey(0),
                                     jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_cosy3_audio_tensor(params, n, t.numpy(),
                                                 jnp.float32)]
    assert unmapped == []


def test_forward_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(41)
    x = rng.standard_normal((2, 10, TINY["mel_dim"]), dtype=np.float32)
    mu = rng.standard_normal((2, 10, TINY["mu_dim"]), dtype=np.float32)
    cond = rng.standard_normal((2, 10, TINY["mel_dim"]),
                               dtype=np.float32)
    spk = rng.standard_normal((2, TINY["spk_dim"]), dtype=np.float32)
    t = np.asarray([0.7, 0.2], np.float32)
    ours = np.asarray(cosy3_audio_forward(
        params, cfg, jnp.asarray(x), jnp.asarray(mu), jnp.asarray(t),
        cond=jnp.asarray(cond), spks=jnp.asarray(spk)))
    golden = _oracle_forward(_tiny_state_dict(), x, mu, t, cond, spk)
    assert ours.shape == golden.shape == (2, 10, TINY["mel_dim"])
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_pipeline_end_to_end_mel(pipeline_dir):
    """Engine drive: mu rides in as per-frame text_states; output is a
    raw mel latent stream on the audio edge."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "cosyvoice3_audio"
    rng = np.random.default_rng(2)
    mu = rng.standard_normal((24, TINY["mu_dim"]), dtype=np.float32)
    req = DiffusionRequest(
        "r0", {"text_states": mu},
        DiffusionSamplingParams(num_inference_steps=2,
                                guidance_scale=1.0, seed=0,
                                output_type="np"))
    out = eng.generate([req])[0]
    assert out.finished and out.error is None, out.error
    # mu pads to the TEXT_LEN bucket (64); mel frames track it 1:1
    assert out.audio.shape == (1, 64, TINY["mel_dim"])
    assert np.isfinite(out.audio).all()
