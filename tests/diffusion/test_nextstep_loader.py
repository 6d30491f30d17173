"""NextStep-1.1 real-geometry family + loader tests.

Independent torch oracles for the two compute pieces — the llama
backbone (prefill + one cached decode step, with left-padded CFG rows)
and the SimpleMLPAdaLN flow-head velocity — plus an e2e engine drive of
the full AR image-token loop (modeling_nextstep.py:116,
modeling_nextstep_heads.py:134, pipeline_nextstep_1_1.py:430)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import load_diffusers_pipeline  # noqa: E402
from vllm_omni_tpu.diffusion.nextstep import (  # noqa: E402
    NextStepConfig, fm_head_velocity, nextstep_decode_step,
    nextstep_prefill)

TINY = dict(hidden_size=32, num_hidden_layers=2,
            num_attention_heads=2, num_key_value_heads=1,
            intermediate_size=64, vocab_size=64, rope_theta=10000.0,
            rms_norm_eps=1e-5, attention_bias=False,
            latent_channels=4, latent_patch_size=2, fm_head_dim=24,
            fm_head_layers=2)
D = TINY["hidden_size"]
HD = D // TINY["num_attention_heads"]
NH, NKV = TINY["num_attention_heads"], TINY["num_key_value_heads"]
TD = TINY["latent_channels"] * TINY["latent_patch_size"] ** 2
FD = TINY["fm_head_dim"]


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

    sd["embed_tokens.weight"] = torch.randn(
        TINY["vocab_size"], D, generator=g) * 0.1
    put_rms("norm", D)
    put("lm_head", TINY["vocab_size"], D, bias=False)
    put("image_in_projector", D, TD)
    put("image_out_projector", D, D)
    put("image_head.net.time_embed.mlp.0", FD, 256)
    put("image_head.net.time_embed.mlp.2", FD, FD)
    put("image_head.net.cond_embed", FD, D)
    put("image_head.net.input_proj", FD, TD)
    for i in range(TINY["fm_head_layers"]):
        p = f"image_head.net.res_blocks.{i}"
        sd[f"{p}.in_ln.weight"] = torch.rand(FD, generator=g) + 0.5
        sd[f"{p}.in_ln.bias"] = torch.randn(FD, generator=g) * 0.02
        put(f"{p}.mlp.0", FD, FD)
        put(f"{p}.mlp.2", FD, FD)
        put(f"{p}.adaLN_modulation.1", 3 * FD, FD)
    put("image_head.net.final_layer.linear", TD, FD)
    put("image_head.net.final_layer.adaLN_modulation.1", 2 * FD, FD)
    for i in range(TINY["num_hidden_layers"]):
        p = f"layers.{i}"
        put_rms(f"{p}.input_layernorm", D)
        put_rms(f"{p}.post_attention_layernorm", D)
        put(f"{p}.self_attn.q_proj", NH * HD, D, bias=False)
        put(f"{p}.self_attn.k_proj", NKV * HD, D, bias=False)
        put(f"{p}.self_attn.v_proj", NKV * HD, D, bias=False)
        put(f"{p}.self_attn.o_proj", D, NH * HD, bias=False)
        put(f"{p}.mlp.gate_proj", TINY["intermediate_size"], D,
            bias=False)
        put(f"{p}.mlp.up_proj", TINY["intermediate_size"], D,
            bias=False)
        put(f"{p}.mlp.down_proj", D, TINY["intermediate_size"],
            bias=False)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ns_tiny")
    (root / "transformer").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "NextStep11Pipeline",
                   "transformer": ["vllm_omni", "NextStepModel"],
                   "vae": ["diffusers", "AutoencoderKL"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "NextStepModel", **TINY}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "latent_channels": 4,
                   "block_out_channels": [8, 16, 16, 16]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Torch oracles
# ---------------------------------------------------------------------------


def _oracle_llama(sd, embeds_np, valid_np, extra_embed_np=None):
    """Full recompute over [prompt(+1 extra)] with left-padding; returns
    last hidden per row."""
    T = torch.from_numpy
    x = T(embeds_np).float()
    valid = T(valid_np).long()
    if extra_embed_np is not None:
        x = torch.cat([x, T(extra_embed_np).float()[:, None]], dim=1)
    b, s, _ = x.shape
    tp = embeds_np.shape[1]
    pos_in_seq = torch.arange(tp)[None, :] - (tp - valid)[:, None]
    if extra_embed_np is not None:
        # appended token: rope position = valid count, always valid
        pos_in_seq = torch.cat([pos_in_seq, valid[:, None]], dim=1)
    positions = pos_in_seq.clamp(min=0)
    valid_mask = pos_in_seq >= 0
    causal = torch.tril(torch.ones(s, s, dtype=torch.bool))
    mask = causal[None] & valid_mask[:, None, :]

    def rms(v, name):
        return v / torch.sqrt((v ** 2).mean(-1, keepdim=True) +
                              TINY["rms_norm_eps"]) * \
            sd[f"{name}.weight"].float()

    def lin(v, name):
        return v @ sd[f"{name}.weight"].float().T

    inv = 1.0 / torch.pow(torch.tensor(TINY["rope_theta"]),
                          torch.arange(0, HD, 2).double() / HD)
    fr = positions.double()[..., None] * inv  # [B, S, HD/2]
    emb = torch.cat([fr, fr], dim=-1).float()
    cos, sin = emb.cos(), emb.sin()

    def rope(v):
        half = HD // 2
        rot = torch.cat([-v[..., half:], v[..., :half]], -1)
        return v * cos[:, :, None, :] + rot * sin[:, :, None, :]

    for i in range(TINY["num_hidden_layers"]):
        p = f"layers.{i}"
        h = rms(x, f"{p}.input_layernorm")
        q = rope(lin(h, f"{p}.self_attn.q_proj").view(b, s, NH, HD))
        k = rope(lin(h, f"{p}.self_attn.k_proj").view(b, s, NKV, HD))
        v = lin(h, f"{p}.self_attn.v_proj").view(b, s, NKV, HD)
        k = k.repeat_interleave(NH // NKV, dim=2)
        v = v.repeat_interleave(NH // NKV, dim=2)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=mask[:, None])
        o = o.transpose(1, 2).reshape(b, s, NH * HD)
        x = x + lin(o, f"{p}.self_attn.o_proj")
        h = rms(x, f"{p}.post_attention_layernorm")
        x = x + lin(torch.nn.functional.silu(
            lin(h, f"{p}.mlp.gate_proj")) * lin(h, f"{p}.mlp.up_proj"),
            f"{p}.mlp.down_proj")
    return rms(x, "norm")[:, -1].numpy()


def _oracle_head_velocity(sd, x_np, t_np, c_np):
    T = torch.from_numpy
    x = T(x_np).float()
    t = T(t_np).float()
    c = T(c_np).float()

    def lin(v, name):
        out = v @ sd[f"{name}.weight"].float().T
        if f"{name}.bias" in sd:
            out = out + sd[f"{name}.bias"].float()
        return out

    def ln(v, name=None):
        out = torch.nn.functional.layer_norm(v, (v.shape[-1],),
                                             eps=1e-6)
        if name:
            out = out * sd[f"{name}.weight"].float() + \
                sd[f"{name}.bias"].float()
        return out

    half = 128
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = t[:, None] * freqs[None]
    e = torch.cat([args.cos(), args.sin()], -1)
    temb = lin(torch.nn.functional.silu(
        lin(e, "image_head.net.time_embed.mlp.0")),
        "image_head.net.time_embed.mlp.2")
    y = temb + lin(c, "image_head.net.cond_embed")
    h = lin(x, "image_head.net.input_proj")
    sy = torch.nn.functional.silu(y)
    for i in range(TINY["fm_head_layers"]):
        p = f"image_head.net.res_blocks.{i}"
        mod = lin(sy, f"{p}.adaLN_modulation.1")
        shift, scale, gate = mod.chunk(3, dim=-1)
        hn = ln(h, f"{p}.in_ln") * (1 + scale) + shift
        h = h + gate * lin(torch.nn.functional.silu(
            lin(hn, f"{p}.mlp.0")), f"{p}.mlp.2")
    mod = lin(sy, "image_head.net.final_layer.adaLN_modulation.1")
    shift, scale = mod.chunk(2, dim=-1)
    out = ln(h) * (1 + scale) + shift
    return lin(out, "image_head.net.final_layer.linear").numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "nextstep"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, NextStepConfig)
    assert cfg.token_dim == TD
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.nextstep import (assign_nextstep_tensor,
                                                  init_nextstep_params)

    params = init_nextstep_params(cfg, jax.random.PRNGKey(0),
                                  jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_nextstep_tensor(params, n, t.numpy(),
                                              jnp.float32)]
    assert unmapped == []


def test_backbone_prefill_and_decode_parity(pipeline_dir):
    """Left-padded 2-row prefill + one cached decode step must equal a
    full recompute over [prompt; token]."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(53)
    tp = 6
    embeds = rng.standard_normal((2, tp, D), dtype=np.float32) * 0.3
    valid = np.asarray([6, 3], np.int32)
    # zero padded slots like the runner's left-pad layout
    embeds[1, :3] = 0.0
    cache_len = tp + 2
    cond, kc, vc = nextstep_prefill(
        params, cfg, jnp.asarray(embeds), jnp.asarray(valid), cache_len)
    golden = _oracle_llama(_tiny_state_dict(), embeds, valid)
    np.testing.assert_allclose(np.asarray(cond), golden, rtol=3e-4,
                               atol=3e-4)

    extra = rng.standard_normal((2, D), dtype=np.float32) * 0.3
    key_valid = np.zeros((2, cache_len), bool)
    key_valid[0, 0:tp] = True
    key_valid[1, tp - 3:tp] = True
    cond2, kc, vc, _ = nextstep_decode_step(
        params, cfg, jnp.asarray(extra), kc, vc, jnp.int32(tp),
        jnp.asarray(valid), jnp.asarray(key_valid))
    golden2 = _oracle_llama(_tiny_state_dict(), embeds, valid,
                            extra_embed_np=extra)
    np.testing.assert_allclose(np.asarray(cond2), golden2, rtol=3e-4,
                               atol=3e-4)


def test_flow_head_velocity_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(59)
    x = rng.standard_normal((3, TD), dtype=np.float32)
    t = np.asarray([0.1, 0.5, 0.95], np.float32)
    c = rng.standard_normal((3, D), dtype=np.float32)
    ours = np.asarray(fm_head_velocity(
        params["image_head"], cfg, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(c)))
    golden = _oracle_head_velocity(_tiny_state_dict(), x, t, c)
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)


def test_pipeline_end_to_end_image(pipeline_dir):
    """Full AR loop: 4 image tokens at 32x32 through the engine, with
    CFG rows and deterministic output per seed."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "nextstep"

    def gen(seed):
        return eng.generate([DiffusionRequest(
            f"r{seed}", "a tiny nextstep test",
            DiffusionSamplingParams(num_inference_steps=4, height=32,
                                    width=32, guidance_scale=2.0,
                                    seed=seed, output_type="np"))])[0]

    out = gen(0)
    assert out.finished and out.error is None, out.error
    assert out.images.shape == (1, 32, 32, 3)
    out2 = gen(0)
    np.testing.assert_array_equal(out.images, out2.images)
