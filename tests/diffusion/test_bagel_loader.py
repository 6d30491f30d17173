"""BAGEL MoT real-geometry family tests.

Checkpoint fixture uses the genuine Bagel HF naming
(language_model.model.layers.N with *_moe_gen expert twins, top-level
time_embedder/vae2llm/llm2vae/latent_pos_embed, torch [out, in] Linear
weights). The numeric oracle is an independent torch re-implementation
of the reference semantics (bagel_transformer.py: qk-norm in f32
BEFORE rope :420-440, single shared rope position for the whole gen
stream prepare_input:1564, vae input = vae2llm + timestep + 2D-sincos
pos :2341, velocity = llm2vae at vae rows :2364, Euler x−v·dt with
shift-warped schedule generate_image:1771-1774, norm-renormalized text
CFG _combine_cfg:2216-2235) so transpose/naming/order mistakes cannot
cancel out."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.bagel import (  # noqa: E402
    BagelConfig, bagel_combine_cfg, bagel_denoise_forward,
    bagel_prefill_text, flattened_pos_ids, is_bagel_dir, load_bagel,
    sincos_pos_table)

HS, IM, NH, NKV, HD = 32, 64, 4, 2, 8
VOCAB, LC, PS, MAXS = 64, 4, 2, 8
HF = {
    "model_type": "bagel",
    "architectures": ["BagelForConditionalGeneration"],
    "llm_config": {
        "vocab_size": VOCAB, "hidden_size": HS,
        "intermediate_size": IM, "num_hidden_layers": 2,
        "num_attention_heads": NH, "num_key_value_heads": NKV,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
    },
    "vae_config": {"z_channels": LC, "downsample": 4},
    "latent_patch_size": PS, "max_latent_size": MAXS,
    "timestep_shift": 3.0,
    "new_token_ids": {"start_of_image": 60, "end_of_image": 61},
}
PD = PS * PS * LC  # patch_dim = 16


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)

    def put(sd, prefix, o, i, bias=False):
        sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    sd = {}
    sd["language_model.model.embed_tokens.weight"] = torch.randn(
        VOCAB, HS, generator=g) * 0.02
    for li in range(2):
        p = f"language_model.model.layers.{li}"
        for sfx in ("", "_moe_gen"):
            put(sd, f"{p}.self_attn.q_proj{sfx}", NH * HD, HS, True)
            put(sd, f"{p}.self_attn.k_proj{sfx}", NKV * HD, HS, True)
            put(sd, f"{p}.self_attn.v_proj{sfx}", NKV * HD, HS, True)
            put(sd, f"{p}.self_attn.o_proj{sfx}", HS, NH * HD)
            sd[f"{p}.self_attn.q_norm{sfx}.weight"] = torch.rand(
                HD, generator=g) + 0.5
            sd[f"{p}.self_attn.k_norm{sfx}.weight"] = torch.rand(
                HD, generator=g) + 0.5
            mlp = "mlp" if not sfx else "mlp_moe_gen"
            put(sd, f"{p}.{mlp}.gate_proj", IM, HS)
            put(sd, f"{p}.{mlp}.up_proj", IM, HS)
            put(sd, f"{p}.{mlp}.down_proj", HS, IM)
            sd[f"{p}.input_layernorm{sfx}.weight"] = torch.rand(
                HS, generator=g) + 0.5
            sd[f"{p}.post_attention_layernorm{sfx}.weight"] = \
                torch.rand(HS, generator=g) + 0.5
    sd["language_model.model.norm.weight"] = torch.rand(
        HS, generator=g) + 0.5
    sd["language_model.model.norm_moe_gen.weight"] = torch.rand(
        HS, generator=g) + 0.5
    put(sd, "time_embedder.mlp.0", HS, 256, True)
    put(sd, "time_embedder.mlp.2", HS, HS, True)
    put(sd, "vae2llm", HS, PD, True)
    put(sd, "llm2vae", PD, HS, True)
    sd["latent_pos_embed.pos_embed"] = torch.from_numpy(
        sincos_pos_table(MAXS, HS)).float()
    # components our loader must SKIP
    sd["vit_model.embeddings.patch_embedding.weight"] = torch.randn(
        HS, 3, 14, 14, generator=g)
    sd["connector.fc1.weight"] = torch.randn(HS, HS, generator=g)
    sd["vit_pos_embed.pos_embed"] = torch.randn(16, HS, generator=g)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("bagel_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_rms(x, w, eps=1e-6):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps)) * w.float()


def _o_rope(positions, d=HD, base=10000.0):
    inv = 1.0 / (base ** (torch.arange(0, d, 2).float() / d))
    ang = torch.as_tensor(positions).float()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    return torch.cos(emb), torch.sin(emb)


def _o_apply_rope(x, cos, sin):
    # x [T, H, D] NeoX half rotation
    c = cos[:, None, :]
    s = sin[:, None, :]
    half = x.shape[-1] // 2
    rot = torch.cat([-x[..., half:], x[..., :half]], dim=-1)
    return x.float() * c + rot.float() * s


def _o_qkv(sd, p, sfx, x):
    t = x.shape[0]
    q = (x @ sd[f"{p}.self_attn.q_proj{sfx}.weight"].T.float() +
         sd[f"{p}.self_attn.q_proj{sfx}.bias"].float()
         ).reshape(t, NH, HD)
    k = (x @ sd[f"{p}.self_attn.k_proj{sfx}.weight"].T.float() +
         sd[f"{p}.self_attn.k_proj{sfx}.bias"].float()
         ).reshape(t, NKV, HD)
    v = (x @ sd[f"{p}.self_attn.v_proj{sfx}.weight"].T.float() +
         sd[f"{p}.self_attn.v_proj{sfx}.bias"].float()
         ).reshape(t, NKV, HD)
    q = _o_rms(q, sd[f"{p}.self_attn.q_norm{sfx}.weight"])
    k = _o_rms(k, sd[f"{p}.self_attn.k_norm{sfx}.weight"])
    return q, k, v


def _o_attend(q, k, v, mask):
    kr = k.repeat_interleave(NH // NKV, dim=1)
    vr = v.repeat_interleave(NH // NKV, dim=1)
    sc = torch.einsum("qhd,khd->hqk", q.float(), kr.float()) * \
        (HD ** -0.5)
    if mask is not None:
        sc = sc.masked_fill(~mask[None], -1e30)
    pr = torch.softmax(sc, dim=-1)
    return torch.einsum("hqk,khd->qhd", pr, vr.float()).reshape(
        q.shape[0], NH * HD)


def _o_mlp(sd, p, sfx, x):
    mlp = "mlp" if not sfx else "mlp_moe_gen"
    g = x @ sd[f"{p}.{mlp}.gate_proj.weight"].T.float()
    u = x @ sd[f"{p}.{mlp}.up_proj.weight"].T.float()
    return (F.silu(g) * u) @ sd[f"{p}.{mlp}.down_proj.weight"].T.float()


def _o_prefill(sd, ids, positions):
    """Causal und forward; returns per-layer post-rope (k, v)."""
    t = len(ids)
    x = sd["language_model.model.embed_tokens.weight"][ids].float()
    cos, sin = _o_rope(positions)
    causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
    out = []
    for li in range(2):
        p = f"language_model.model.layers.{li}"
        h = _o_rms(x, sd[f"{p}.input_layernorm.weight"])
        q, k, v = _o_qkv(sd, p, "", h)
        q = _o_apply_rope(q, cos, sin)
        k = _o_apply_rope(k, cos, sin)
        out.append((k, v))
        att = _o_attend(q, k, v, causal)
        x = x + att @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        h = _o_rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        x = x + _o_mlp(sd, p, "", h)
    return out


def _o_tembed(sd, t):
    half = 128
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    e = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    h = e @ sd["time_embedder.mlp.0.weight"].T.float() + \
        sd["time_embedder.mlp.0.bias"].float()
    return F.silu(h) @ sd["time_embedder.mlp.2.weight"].T.float() + \
        sd["time_embedder.mlp.2.bias"].float()


def _o_denoise(sd, x_t, t, pos_ids, rope_pos, text_kv):
    """Gen forward: [som, vae×N, eoi], one shared rope position,
    non-causal over [text KV + stream]."""
    n = x_t.shape[0]
    emb = sd["language_model.model.embed_tokens.weight"].float()
    temb = _o_tembed(sd, t)[0]
    pose = sd["latent_pos_embed.pos_embed"].float()[pos_ids]
    vae_in = (x_t.float() @ sd["vae2llm.weight"].T.float() +
              sd["vae2llm.bias"].float() + temb + pose)
    x = torch.cat([emb[60][None], vae_in, emb[61][None]], dim=0)
    s = n + 2
    is_text = torch.zeros(s, dtype=torch.bool)
    is_text[0] = is_text[-1] = True
    cos, sin = _o_rope([rope_pos] * s)
    for li in range(2):
        p = f"language_model.model.layers.{li}"
        hu = _o_rms(x, sd[f"{p}.input_layernorm.weight"])
        hg = _o_rms(x, sd[f"{p}.input_layernorm_moe_gen.weight"])
        h = torch.where(is_text[:, None], hu, hg)
        qu, ku, vu = _o_qkv(sd, p, "", h)
        qg, kg, vg = _o_qkv(sd, p, "_moe_gen", h)
        q = torch.where(is_text[:, None, None], qu, qg)
        k = torch.where(is_text[:, None, None], ku, kg)
        v = torch.where(is_text[:, None, None], vu, vg)
        q = _o_apply_rope(q, cos, sin)
        k = _o_apply_rope(k, cos, sin)
        if text_kv is not None:
            pk, pv = text_kv[li]
            k = torch.cat([pk, k], dim=0)
            v = torch.cat([pv, v], dim=0)
        att = _o_attend(q, k, v, None)
        au = att @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        ag = att @ sd[f"{p}.self_attn.o_proj_moe_gen.weight"].T.float()
        x = x + torch.where(is_text[:, None], au, ag)
        hu = _o_rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        hg = _o_rms(x,
                    sd[f"{p}.post_attention_layernorm_moe_gen.weight"])
        h = torch.where(is_text[:, None], hu, hg)
        mu = _o_mlp(sd, p, "", h)
        mg = _o_mlp(sd, p, "_moe_gen", h)
        x = x + torch.where(is_text[:, None], mu, mg)
    xu = _o_rms(x, sd["language_model.model.norm.weight"])
    xg = _o_rms(x, sd["language_model.model.norm_moe_gen.weight"])
    x = torch.where(is_text[:, None], xu, xg)
    return x[1:n + 1] @ sd["llm2vae.weight"].T.float() + \
        sd["llm2vae.bias"].float()


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    assert is_bagel_dir(ckpt_dir)
    cfg, params = load_bagel(ckpt_dir, dtype=jnp.float32)
    assert cfg.hidden_size == HS and cfg.num_layers == 2
    assert cfg.patch_dim == PD and cfg.latent_downsample == 8
    l0 = params["layers"][0]
    assert l0["q_proj"]["w"].shape == (HS, NH * HD)
    assert l0["q_proj_moe_gen"]["b"].shape == (NH * HD,)
    assert l0["down_proj_moe_gen"]["w"].shape == (IM, HS)
    assert params["vae2llm"]["w"].shape == (PD, HS)
    assert params["latent_pos_embed"].shape == (MAXS * MAXS, HS)
    # layer 1 und vs gen experts differ (both really loaded)
    l1 = params["layers"][1]
    assert not np.allclose(np.asarray(l1["gate_proj"]["w"]),
                           np.asarray(l1["gate_proj_moe_gen"]["w"]))


def test_prefill_kv_parity_vs_torch(ckpt_dir):
    cfg, params = load_bagel(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    ids = np.asarray([3, 9, 17, 25, 41], np.int32)
    pos = np.arange(5)
    kv = bagel_prefill_text(params, cfg, jnp.asarray(ids), pos)
    golden = _o_prefill(sd, ids.astype(np.int64), pos)
    assert len(kv) == 2
    for (k, v), (gk, gv) in zip(kv, golden):
        np.testing.assert_allclose(np.asarray(k), gk.numpy(),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(v), gv.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_denoise_velocity_parity_vs_torch(ckpt_dir):
    cfg, params = load_bagel(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(7)
    ids = np.asarray([3, 9, 17, 25, 41], np.int32)
    kv = bagel_prefill_text(params, cfg, jnp.asarray(ids),
                            np.arange(5))
    h_tok = w_tok = 3
    n = h_tok * w_tok
    x_t = rng.standard_normal((n, PD)).astype(np.float32)
    pos_ids = flattened_pos_ids(h_tok, w_tok, MAXS)
    t = np.asarray([0.63], np.float32)
    v = bagel_denoise_forward(params, cfg, jnp.asarray(x_t),
                              jnp.asarray(t), jnp.asarray(pos_ids),
                              5.0, kv)
    golden_kv = _o_prefill(sd, ids.astype(np.int64), np.arange(5))
    golden = _o_denoise(sd, torch.from_numpy(x_t),
                        torch.from_numpy(t),
                        torch.from_numpy(pos_ids.astype(np.int64)),
                        5.0, golden_kv).numpy()
    assert v.shape == golden.shape == (n, PD)
    np.testing.assert_allclose(np.asarray(v), golden, rtol=3e-4,
                               atol=3e-4)


def test_denoise_no_context_branch(ckpt_dir):
    """The cfg-text branch runs with NO cached KV (reference keeps the
    context without the prompt; pipeline_bagel.py:558-564 leaves it
    empty when the negative prompt is empty)."""
    cfg, params = load_bagel(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(11)
    x_t = rng.standard_normal((4, PD)).astype(np.float32)
    pos_ids = flattened_pos_ids(2, 2, MAXS)
    t = np.asarray([0.2], np.float32)
    v = bagel_denoise_forward(params, cfg, jnp.asarray(x_t),
                              jnp.asarray(t), jnp.asarray(pos_ids),
                              0.0, None)
    golden = _o_denoise(sd, torch.from_numpy(x_t), torch.from_numpy(t),
                        torch.from_numpy(pos_ids.astype(np.int64)),
                        0.0, None).numpy()
    np.testing.assert_allclose(np.asarray(v), golden, rtol=3e-4,
                               atol=3e-4)


def test_combine_cfg_matches_reference_formula():
    rng = np.random.default_rng(5)
    vc = rng.standard_normal((6, PD)).astype(np.float32)
    vu = rng.standard_normal((6, PD)).astype(np.float32)
    scale = 4.0
    got = np.asarray(bagel_combine_cfg(jnp.asarray(vc),
                                       jnp.asarray(vu), scale))
    tv = torch.from_numpy(vu) + scale * (torch.from_numpy(vc) -
                                         torch.from_numpy(vu))
    s = (torch.norm(torch.from_numpy(vc)) /
         (torch.norm(tv) + 1e-8)).clamp(0.0, 1.0)
    np.testing.assert_allclose(got, (tv * s).numpy(), rtol=1e-5,
                               atol=1e-5)
    # channel renorm variant
    got_c = np.asarray(bagel_combine_cfg(
        jnp.asarray(vc), jnp.asarray(vu), scale, "channel", 0.1))
    sc = (torch.norm(torch.from_numpy(vc), dim=-1, keepdim=True) /
          (torch.norm(tv, dim=-1, keepdim=True) + 1e-8)).clamp(0.1, 1.0)
    np.testing.assert_allclose(got_c, (tv * sc).numpy(), rtol=1e-5,
                               atol=1e-5)


def test_pipeline_end_to_end(ckpt_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=ckpt_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "bagel"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny test image",
        DiffusionSamplingParams(num_inference_steps=3, height=32,
                                width=32, guidance_scale=4.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None
    assert out.images.shape[-1] == 3
    assert np.isfinite(np.asarray(out.images, np.float32)).all()
