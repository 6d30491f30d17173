"""Stable Audio Open real-geometry family + diffusers loader tests.

Same method as test_hunyuan_video_loader.py: genuine diffusers
checkpoint layout (StableAudioDiTModel naming — Sequential projection
MLPs, k=1 Conv1d pre/post, GQA cross-attn), independent torch oracle
re-deriving the reference semantics (diffusion/models/stable_audio/
stable_audio_transformer.py:360 + pipeline :525)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.stable_audio import (  # noqa: E402
    StableAudioConfig, stable_audio_forward, stable_audio_rope)

TINY = dict(sample_size=64, in_channels=6, out_channels=6,
            num_layers=2, attention_head_dim=8, num_attention_heads=4,
            num_key_value_attention_heads=2, cross_attention_dim=24,
            time_proj_dim=16, global_states_input_dim=20,
            cross_attention_input_dim=12)
HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]
KV = TINY["num_key_value_attention_heads"] * TINY["attention_head_dim"]


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    def put_ln(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(n, generator=g) * 0.02

    sd["time_proj.weight"] = torch.randn(
        TINY["time_proj_dim"] // 2, generator=g)
    put("timestep_proj.0", HS, TINY["time_proj_dim"])
    put("timestep_proj.2", HS, HS)
    put("global_proj.0", HS, TINY["global_states_input_dim"], bias=False)
    put("global_proj.2", HS, HS, bias=False)
    put("cross_attention_proj.0", TINY["cross_attention_dim"],
        TINY["cross_attention_input_dim"], bias=False)
    put("cross_attention_proj.2", TINY["cross_attention_dim"],
        TINY["cross_attention_dim"], bias=False)
    sd["preprocess_conv.weight"] = torch.randn(
        TINY["in_channels"], TINY["in_channels"], 1, generator=g) * 0.1
    put("proj_in", HS, TINY["in_channels"], bias=False)
    put("proj_out", TINY["out_channels"], HS, bias=False)
    sd["postprocess_conv.weight"] = torch.randn(
        TINY["out_channels"], TINY["out_channels"], 1, generator=g) * 0.1
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        put_ln(f"{p}.norm1", HS)
        for nm in ("to_q", "to_k", "to_v"):
            put(f"{p}.attn1.{nm}", HS, HS, bias=False)
        put(f"{p}.attn1.to_out.0", HS, HS, bias=False)
        put_ln(f"{p}.norm2", HS)
        put(f"{p}.attn2.to_q", HS, HS, bias=False)
        put(f"{p}.attn2.to_k", KV, TINY["cross_attention_dim"],
            bias=False)
        put(f"{p}.attn2.to_v", KV, TINY["cross_attention_dim"],
            bias=False)
        put(f"{p}.attn2.to_out.0", HS, HS, bias=False)
        put_ln(f"{p}.norm3", HS)
        put(f"{p}.ff.net.0.proj", 8 * HS, HS)  # SwiGLU: 2 × (4·dim)
        put(f"{p}.ff.net.2", HS, 4 * HS)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sa_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "StableAudioPipeline",
                   "transformer": ["diffusers", "StableAudioDiTModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderOobleck"],
                   "text_encoder": ["transformers", "T5EncoderModel"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "StableAudioDiTModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        # AutoencoderOobleck layout (no latent_channels key)
        json.dump({"_class_name": "AutoencoderOobleck",
                   "audio_channels": 2,
                   "decoder_input_channels": TINY["in_channels"],
                   "downsampling_ratios": [2, 4, 4, 8, 8],
                   "sampling_rate": 44100}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_rope(seq_len):
    rd = TINY["attention_head_dim"] // 2
    inv = 1.0 / torch.pow(torch.tensor(10000.0),
                          torch.arange(0, rd, 2).float() / rd)
    freqs = torch.outer(torch.arange(seq_len).float(), inv)
    return (torch.cat([freqs.cos(), freqs.cos()], -1),
            torch.cat([freqs.sin(), freqs.sin()], -1))


def _oracle_apply_rope(x, cos, sin):
    rd = cos.shape[-1]
    x_rot, x_pass = x[..., :rd], x[..., rd:]
    half = rd // 2
    x1, x2 = x_rot[..., :half], x_rot[..., half:]
    rotated = torch.cat([-x2, x1], -1)
    out = x_rot.float() * cos[None, :, None, :] + \
        rotated.float() * sin[None, :, None, :]
    return torch.cat([out.to(x.dtype), x_pass], -1)


def _oracle_forward(sd, lat_np, txt_np, t_np, glob_np=None,
                    txt_mask_np=None):
    T = torch.from_numpy
    lat = T(lat_np).float()  # [B, L, C] channel-last
    txt = T(txt_np).float()
    t = T(t_np).float()
    b, L, c = lat.shape
    nh = TINY["num_attention_heads"]
    hd = TINY["attention_head_dim"]
    nkv = TINY["num_key_value_attention_heads"]

    def lin(x, name):
        out = x @ sd[f"{name}.weight"].float().T
        if f"{name}.bias" in sd:
            out = out + sd[f"{name}.bias"].float()
        return out

    def ln(x, name):
        out = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=1e-5)
        return out * sd[f"{name}.weight"].float() + \
            sd[f"{name}.bias"].float()

    ctx = lin(torch.nn.functional.silu(lin(txt, "cross_attention_proj"
                                           ".0")),
              "cross_attention_proj.2")
    if glob_np is None:
        glob = torch.zeros(b, 1, TINY["global_states_input_dim"])
    else:
        glob = T(glob_np).float()
    g = lin(torch.nn.functional.silu(lin(glob, "global_proj.0")),
            "global_proj.2")
    proj = 2 * torch.pi * t[:, None] @ sd["time_proj.weight"].float(
    )[None, :]
    tfeat = torch.cat([proj.cos(), proj.sin()], -1)
    temb = lin(torch.nn.functional.silu(lin(tfeat, "timestep_proj.0")),
               "timestep_proj.2")
    g = g + temb[:, None, :]

    x = lat + lat @ sd["preprocess_conv.weight"].float()[:, :, 0].T
    x = lin(x, "proj_in")
    x = torch.cat([g, x], dim=1)
    cos, sin = _oracle_rope(L + 1)
    kmask = None if txt_mask_np is None else T(txt_mask_np).bool()

    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        s = x.shape[1]
        xn = ln(x, f"{p}.norm1")
        q = lin(xn, f"{p}.attn1.to_q").view(b, s, nh, hd)
        k = lin(xn, f"{p}.attn1.to_k").view(b, s, nh, hd)
        v = lin(xn, f"{p}.attn1.to_v").view(b, s, nh, hd)
        q, k = _oracle_apply_rope(q, cos, sin), \
            _oracle_apply_rope(k, cos, sin)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2),
            v.transpose(1, 2)).transpose(1, 2).reshape(b, s, nh * hd)
        x = x + lin(o, f"{p}.attn1.to_out.0")

        xn = ln(x, f"{p}.norm2")
        tc = ctx.shape[1]
        q = lin(xn, f"{p}.attn2.to_q").view(b, s, nh, hd)
        k = lin(ctx, f"{p}.attn2.to_k").view(b, tc, nkv, hd)
        v = lin(ctx, f"{p}.attn2.to_v").view(b, tc, nkv, hd)
        groups = nh // nkv
        k = k.unsqueeze(3).expand(-1, -1, -1, groups, -1).reshape(
            b, tc, nh, hd)
        v = v.unsqueeze(3).expand(-1, -1, -1, groups, -1).reshape(
            b, tc, nh, hd)
        am = None if kmask is None else kmask[:, None, None, :]
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=am).transpose(1, 2).reshape(b, s, nh * hd)
        x = x + lin(o, f"{p}.attn2.to_out.0")

        xn = ln(x, f"{p}.norm3")
        h = lin(xn, f"{p}.ff.net.0.proj")
        hid, gate = h.chunk(2, dim=-1)
        x = x + lin(hid * torch.nn.functional.silu(gate),
                    f"{p}.ff.net.2")

    out = lin(x, "proj_out")[:, 1:]
    out = out + out @ sd["postprocess_conv.weight"].float()[:, :, 0].T
    return out.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "stable_audio"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, StableAudioConfig)
    assert cfg.num_layers == 2 and cfg.in_channels == 6
    # Oobleck VAE parse: latent dim from decoder_input_channels, hop
    # from the downsampling ratios product
    assert loaded["vae"]["latent_channels"] == TINY["in_channels"]
    assert loaded["vae"]["scale_factor"] == 2 * 4 * 4 * 8 * 8
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.stable_audio import (
        assign_stable_audio_tensor, init_stable_audio_params)
    import jax

    params = init_stable_audio_params(cfg, jax.random.PRNGKey(0),
                                      jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_stable_audio_tensor(params, n, t.numpy(),
                                                  jnp.float32)]
    assert unmapped == []


def test_forward_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(11)
    lat = rng.standard_normal((2, 16, TINY["in_channels"]),
                              dtype=np.float32)
    txt = rng.standard_normal(
        (2, 5, TINY["cross_attention_input_dim"]), dtype=np.float32)
    glob = rng.standard_normal(
        (2, 1, TINY["global_states_input_dim"]), dtype=np.float32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    t = np.asarray([0.8, 0.25], np.float32)
    ours = np.asarray(stable_audio_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        global_states=jnp.asarray(glob), text_mask=jnp.asarray(mask)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t, glob, mask)
    assert ours.shape == golden.shape == (2, 16, TINY["out_channels"])
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_serving_defaults_match_zero_global(pipeline_dir):
    """The serving path passes no duration conditioning; must equal the
    oracle with an explicit zero global embed (bias-free global_proj)."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(4)
    lat = rng.standard_normal((1, 8, TINY["in_channels"]),
                              dtype=np.float32)
    txt = rng.standard_normal(
        (1, 3, TINY["cross_attention_input_dim"]), dtype=np.float32)
    t = np.asarray([0.5], np.float32)
    ours = np.asarray(stable_audio_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_rope_matches_diffusers_form():
    cfg = StableAudioConfig.from_json(TINY)
    cos, sin = stable_audio_rope(cfg, 9)
    gcos, gsin = _oracle_rope(9)
    np.testing.assert_allclose(np.asarray(cos), gcos.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), gsin.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_pipeline_end_to_end_audio(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "stable_audio"
    out = eng.generate([DiffusionRequest(
        "r0", "rain on a tin roof",
        DiffusionSamplingParams(num_inference_steps=2,
                                guidance_scale=3.0, seed=0,
                                output_type="np",
                                extra_args={"audio_end_in_s": 2.0}))])[0]
    assert out.finished and out.error is None, out.error
    assert out.images is None and out.video is None
    # 2 s · 44100 / 2048 ≈ 43 frames → 64-frame bucket
    assert out.audio.shape == (1, 64, TINY["in_channels"])
    assert np.isfinite(out.audio).all()
