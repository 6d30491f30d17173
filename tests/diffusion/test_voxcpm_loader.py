"""VoxCPM / VoxCPM2 hybrid AR+CFM family tests.

The serving-loop semantics are oracled against the REFERENCE
(voxcpm/voxcpm.py:59-142 `_inference`; voxcpm2_talker.py:253-340
`_optimized_solve_euler`, :245-247 sway t-span;
minicpm4_hf_compat.py mup/fp32-rope/LongRoPE). The LocEnc/LocDiT/FSQ/
AudioVAE internals live in the external ``voxcpm`` package there —
our TPU-native designs are validated by independent torch
re-implementations of the documented geometry so
transpose/naming/order mistakes cannot cancel out."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.voxcpm import (  # noqa: E402
    VoxCPMConfig, cfm_solve, dit_estimator, feat_encode, fsq_apply,
    is_voxcpm_dir, lm_prefill, lm_rope_tables, lm_step, load_voxcpm,
    make_t_span, vae_decode)

HS, IM, NH, NKV, HD = 32, 64, 4, 2, 8
EH, DH = 16, 16
FD, PS = 8, 2
LEVELS = [8, 5, 5]
HF_V1 = {
    "model_type": "voxcpm",
    "patch_size": PS, "feat_dim": FD, "sample_rate": 24000,
    "audio_start_token": 3, "max_len": 2000,
    "lm_config": {"vocab_size": 64, "hidden_size": HS,
                  "intermediate_size": IM, "num_hidden_layers": 2,
                  "num_attention_heads": NH,
                  "num_key_value_heads": NKV, "rope_theta": 10000.0,
                  "rms_norm_eps": 1e-6, "use_mup": True,
                  "scale_emb": 12.0, "scale_depth": 1.4},
    "residual_lm_config": {"hidden_size": HS,
                           "intermediate_size": IM,
                           "num_hidden_layers": 2,
                           "num_attention_heads": NH,
                           "num_key_value_heads": NKV},
    "encoder_config": {"hidden_size": EH, "num_hidden_layers": 1,
                       "num_attention_heads": 2},
    "dit_config": {"hidden_size": DH, "num_hidden_layers": 1,
                   "num_attention_heads": 2, "mu_dim": DH,
                   "sway_coef": 1.0},
    "fsq_config": {"levels": LEVELS},
    "audio_vae_config": {"channels": 32, "rates": [2, 2]},
}


def _v2_hf():
    hf = json.loads(json.dumps(HF_V1))
    hf["model_type"] = "voxcpm2"
    hf["lm_config"]["rope_scaling"] = {
        "short_factor": [1.0, 1.2, 1.5, 2.0],
        "long_factor": [1.0, 2.0, 4.0, 8.0],
        "original_max_position_embeddings": 2048,
    }
    hf["lm_config"]["max_position_embeddings"] = 8192
    return hf


def _tiny_state_dict(variant="v1", seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, o, i, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    def lm(prefix, embed):
        if embed:
            sd[f"{prefix}.embed_tokens.weight"] = torch.randn(
                64, HS, generator=g) * 0.02
        for li in range(2):
            p = f"{prefix}.layers.{li}"
            put(f"{p}.self_attn.q_proj", NH * HD, HS, False)
            put(f"{p}.self_attn.k_proj", NKV * HD, HS, False)
            put(f"{p}.self_attn.v_proj", NKV * HD, HS, False)
            put(f"{p}.self_attn.o_proj", HS, NH * HD, False)
            put(f"{p}.mlp.gate_proj", IM, HS, False)
            put(f"{p}.mlp.up_proj", IM, HS, False)
            put(f"{p}.mlp.down_proj", HS, IM, False)
            sd[f"{p}.input_layernorm.weight"] = torch.rand(
                HS, generator=g) + 0.5
            sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
                HS, generator=g) + 0.5
        sd[f"{prefix}.norm.weight"] = torch.rand(HS, generator=g) + 0.5

    lm("base_lm", True)
    lm("residual_lm", False)
    nl = len(LEVELS)
    put("fsq_layer.project_in", nl, HS)
    put("fsq_layer.project_out", HS, nl)
    # feat encoder
    put("feat_encoder.in_proj", EH, FD)
    sd["feat_encoder.cls"] = torch.randn(EH, generator=g) * 0.02
    sd["feat_encoder.pos_embed"] = torch.randn(PS + 1, EH,
                                               generator=g) * 0.02
    p = "feat_encoder.layers.0"
    for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
        put(f"{p}.{k}", EH, EH)
    put(f"{p}.fc1", 4 * EH, EH)
    put(f"{p}.fc2", EH, 4 * EH)
    sd[f"{p}.ln1.weight"] = torch.rand(EH, generator=g) + 0.5
    sd[f"{p}.ln2.weight"] = torch.rand(EH, generator=g) + 0.5
    sd["feat_encoder.norm.weight"] = torch.rand(EH, generator=g) + 0.5
    # dit estimator
    mu_total = 2 * DH if variant == "v2" else DH
    put("feat_decoder.estimator.in_proj", DH, FD)
    put("feat_decoder.estimator.cond_proj", DH, FD)
    put("feat_decoder.estimator.mu_proj", DH, mu_total)
    sd["feat_decoder.estimator.pos_embed"] = torch.randn(
        1 + 2 * PS, DH, generator=g) * 0.02
    for te in ("t_embed", "dt_embed"):
        put(f"feat_decoder.estimator.{te}.l1", DH, 256)
        put(f"feat_decoder.estimator.{te}.l2", DH, DH)
    p = "feat_decoder.estimator.layers.0"
    put(f"{p}.ada", 6 * DH, DH)
    for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
        put(f"{p}.{k}", DH, DH)
    put(f"{p}.fc1", 4 * DH, DH)
    put(f"{p}.fc2", DH, 4 * DH)
    sd[f"{p}.ln1.weight"] = torch.rand(DH, generator=g) + 0.5
    sd[f"{p}.ln2.weight"] = torch.rand(DH, generator=g) + 0.5
    sd["feat_decoder.estimator.out_norm.weight"] = torch.rand(
        DH, generator=g) + 0.5
    put("feat_decoder.estimator.out_proj", FD, DH)
    # projections
    put("enc_to_lm_proj", HS, EH)
    put("lm_to_dit_proj", DH, HS)
    put("res_to_dit_proj", DH, HS)
    if variant == "v2":
        put("fusion_concat_proj", HS, 2 * HS)
    put("stop_proj", HS, HS)
    put("stop_head", 2, HS)
    # audio vae decoder (channels 32, rates [2,2])
    def conv(prefix, o, i, k):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k,
                                             generator=g) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    conv("audio_vae.decoder.conv_in", 32, FD, 7)
    ch = 32
    for bi, rate in enumerate([2, 2]):
        nxt = max(ch // 2, 16)
        sd[f"audio_vae.decoder.blocks.{bi}.alpha"] = torch.rand(
            ch, generator=g) + 0.5
        # torch ConvTranspose1d weight [I, O, K]
        sd[f"audio_vae.decoder.blocks.{bi}.up.weight"] = torch.randn(
            ch, nxt, 2 * rate, generator=g) * 0.05
        sd[f"audio_vae.decoder.blocks.{bi}.up.bias"] = torch.randn(
            nxt, generator=g) * 0.02
        for ri in range(2):
            rp = f"audio_vae.decoder.blocks.{bi}.res.{ri}"
            sd[f"{rp}.alpha1"] = torch.rand(nxt, generator=g) + 0.5
            conv(f"{rp}.conv1", nxt, nxt, 7)
            sd[f"{rp}.alpha2"] = torch.rand(nxt, generator=g) + 0.5
            conv(f"{rp}.conv2", nxt, nxt, 1)
        ch = nxt
    sd["audio_vae.decoder.alpha_out"] = torch.rand(ch,
                                                   generator=g) + 0.5
    conv("audio_vae.decoder.conv_out", 1, ch, 7)
    return sd


def _mk_ckpt(tmp, variant="v1"):
    root = tmp / f"voxcpm_{variant}"
    root.mkdir()
    hf = HF_V1 if variant == "v1" else _v2_hf()
    with open(root / "config.json", "w") as f:
        json.dump(hf, f)
    save_file(_tiny_state_dict(variant), str(root /
                                             "model.safetensors"))
    return str(root)


@pytest.fixture(scope="module")
def ckpt_v1(tmp_path_factory):
    return _mk_ckpt(tmp_path_factory.mktemp("vox1"), "v1")


@pytest.fixture(scope="module")
def ckpt_v2(tmp_path_factory):
    return _mk_ckpt(tmp_path_factory.mktemp("vox2"), "v2")


# ---------------------------------------------------------------------------
# torch oracles
# ---------------------------------------------------------------------------


def _o_rms(x, w, eps=1e-6):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps)) * w.float()


def _o_lm(sd, prefix, embeds, use_rope=True, rope_scaling=None,
          max_pos=8192):
    """MiniCPM tower oracle: mup residual scaling scale_depth/√L,
    fp32 rope (optionally LongRoPE), causal."""
    t = embeds.shape[0]
    x = embeds.float()
    rs = 1.4 / math.sqrt(2)
    inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).float() / HD))
    scale = 1.0
    if rope_scaling is not None:
        orig = rope_scaling["original_max_position_embeddings"]
        fac = torch.tensor(
            rope_scaling["short_factor"] if t <= orig
            else rope_scaling["long_factor"])
        inv = inv / fac
        s = max_pos / orig
        scale = math.sqrt(1 + math.log(s) / math.log(orig))
    ang = torch.arange(t).float()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    cos, sin = emb.cos() * scale, emb.sin() * scale

    def rope(v):
        half = v.shape[-1] // 2
        rot = torch.cat([-v[..., half:], v[..., :half]], dim=-1)
        return v * cos[:, None] + rot * sin[:, None]

    causal = torch.tril(torch.ones(t, t, dtype=torch.bool))
    for li in range(2):
        p = f"{prefix}.layers.{li}"
        h = _o_rms(x, sd[f"{p}.input_layernorm.weight"])
        q = (h @ sd[f"{p}.self_attn.q_proj.weight"].T.float()
             ).reshape(t, NH, HD)
        k = (h @ sd[f"{p}.self_attn.k_proj.weight"].T.float()
             ).reshape(t, NKV, HD)
        v = (h @ sd[f"{p}.self_attn.v_proj.weight"].T.float()
             ).reshape(t, NKV, HD)
        if use_rope:
            q, k = rope(q), rope(k)
        kr = k.repeat_interleave(NH // NKV, dim=1)
        vr = v.repeat_interleave(NH // NKV, dim=1)
        sc = torch.einsum("qhd,khd->hqk", q, kr) * (HD ** -0.5)
        sc = sc.masked_fill(~causal[None], -1e30)
        o = torch.einsum("hqk,khd->qhd", torch.softmax(sc, -1),
                         vr).reshape(t, NH * HD)
        x = x + (o @ sd[f"{p}.self_attn.o_proj.weight"].T.float()) * rs
        h = _o_rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        m = (F.silu(h @ sd[f"{p}.mlp.gate_proj.weight"].T.float()) *
             (h @ sd[f"{p}.mlp.up_proj.weight"].T.float())) @ \
            sd[f"{p}.mlp.down_proj.weight"].T.float()
        x = x + m * rs
    return _o_rms(x, sd[f"{prefix}.norm.weight"])


def _o_lin(sd, prefix, x):
    out = x.float() @ sd[f"{prefix}.weight"].T.float()
    if f"{prefix}.bias" in sd:
        out = out + sd[f"{prefix}.bias"].float()
    return out


def _o_fsq(sd, x):
    z = _o_lin(sd, "fsq_layer.project_in", x)
    half = (torch.tensor(LEVELS).float() - 1) / 2
    q = torch.round(torch.tanh(z) * half) / half
    return _o_lin(sd, "fsq_layer.project_out", q)


def _o_feat_encode(sd, feat):
    t = feat.shape[0]
    x = _o_lin(sd, "feat_encoder.in_proj", feat)
    cls = sd["feat_encoder.cls"].float()[None, None].expand(t, 1, EH)
    x = torch.cat([cls, x], dim=1) + \
        sd["feat_encoder.pos_embed"].float()[None]
    p = "feat_encoder.layers.0"
    s = x.shape[1]
    h = _o_rms(x, sd[f"{p}.ln1.weight"])
    nh, d = 2, EH // 2
    q = _o_lin(sd, f"{p}.q_proj", h).reshape(t, s, nh, d)
    k = _o_lin(sd, f"{p}.k_proj", h).reshape(t, s, nh, d)
    v = _o_lin(sd, f"{p}.v_proj", h).reshape(t, s, nh, d)
    sc = torch.einsum("tqhd,tkhd->thqk", q, k) * (d ** -0.5)
    o = torch.einsum("thqk,tkhd->tqhd", torch.softmax(sc, -1),
                     v).reshape(t, s, EH)
    x = x + _o_lin(sd, f"{p}.o_proj", o)
    h = _o_rms(x, sd[f"{p}.ln2.weight"])
    x = x + _o_lin(sd, f"{p}.fc2",
                   F.gelu(_o_lin(sd, f"{p}.fc1", h)))
    x = _o_rms(x, sd["feat_encoder.norm.weight"])
    return x[:, 0]


def _o_time_embed(sd, prefix, t):
    half = 128
    freqs = torch.exp(-math.log(10000.0) *
                      torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    e = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    h = _o_lin(sd, f"{prefix}.l1", e)
    return _o_lin(sd, f"{prefix}.l2", F.silu(h))


def _o_estimator(sd, x, mu, t, cond, dt, mean_mode=False):
    b = x.shape[0]
    xt = x.transpose(1, 2).float()
    ct = cond.transpose(1, 2).float()
    te = _o_time_embed(sd, "feat_decoder.estimator.t_embed", t)
    if mean_mode:
        te = te + _o_time_embed(sd, "feat_decoder.estimator.dt_embed",
                                dt)
    mu_tok = _o_lin(sd, "feat_decoder.estimator.mu_proj", mu)[:, None]
    seq = torch.cat([
        mu_tok,
        _o_lin(sd, "feat_decoder.estimator.cond_proj", ct),
        _o_lin(sd, "feat_decoder.estimator.in_proj", xt)], dim=1) + \
        sd["feat_decoder.estimator.pos_embed"].float()[None]
    p = "feat_decoder.estimator.layers.0"
    c = F.silu(te)
    ada = _o_lin(sd, f"{p}.ada", c).reshape(b, 6, DH)
    sh1, sc1, g1, sh2, sc2, g2 = [ada[:, i][:, None] for i in range(6)]
    s = seq.shape[1]
    nh, d = 2, DH // 2
    h = _o_rms(seq, sd[f"{p}.ln1.weight"]) * (1 + sc1) + sh1
    q = _o_lin(sd, f"{p}.q_proj", h).reshape(b, s, nh, d)
    k = _o_lin(sd, f"{p}.k_proj", h).reshape(b, s, nh, d)
    v = _o_lin(sd, f"{p}.v_proj", h).reshape(b, s, nh, d)
    sc = torch.einsum("bqhd,bkhd->bhqk", q, k) * (d ** -0.5)
    o = torch.einsum("bhqk,bkhd->bqhd", torch.softmax(sc, -1),
                     v).reshape(b, s, DH)
    seq = seq + g1 * _o_lin(sd, f"{p}.o_proj", o)
    h = _o_rms(seq, sd[f"{p}.ln2.weight"]) * (1 + sc2) + sh2
    seq = seq + g2 * _o_lin(sd, f"{p}.fc2",
                            F.gelu(_o_lin(sd, f"{p}.fc1", h)))
    out = _o_rms(seq[:, 1 + PS:],
                 sd["feat_decoder.estimator.out_norm.weight"])
    return _o_lin(sd, "feat_decoder.estimator.out_proj",
                  out).transpose(1, 2)


def _o_solve(sd, mu, cond, noise, n_steps, cfg_value, zero_star,
             sway=1.0):
    """Reference solver semantics (voxcpm2_talker.py:253-340)."""
    t_span = torch.linspace(1, 0, n_steps + 1)
    t_span = t_span + sway * (torch.cos(torch.pi / 2 * t_span) - 1 +
                              t_span)
    zero_init = max(1, int(len(t_span) * 0.04)) if zero_star else 0
    x = noise.clone()
    t, dt = t_span[0], t_span[0] - t_span[1]
    for step in range(1, len(t_span)):
        if step <= zero_init:
            dphi = torch.zeros_like(x)
        else:
            x2 = torch.cat([x, x], dim=0)
            mu2 = torch.cat([mu, torch.zeros_like(mu)], dim=0)
            t2 = torch.full((2,), float(t))
            d2 = torch.zeros(2)
            c2 = torch.cat([cond, cond], dim=0)
            raw = _o_estimator(sd, x2, mu2, t2, c2, d2)
            pos, neg = raw[:1], raw[1:]
            if zero_star:
                pf, nf = pos.reshape(1, -1), neg.reshape(1, -1)
                st = (pf * nf).sum(1, keepdim=True) / \
                    ((nf * nf).sum(1, keepdim=True) + 1e-8)
                st = st.reshape(1, 1, 1)
            else:
                st = 1.0
            dphi = neg * st + cfg_value * (pos - neg * st)
        x = x - dt * dphi
        t = t - dt
        if step < len(t_span) - 1:
            dt = t - t_span[step + 1]
    return x


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_v1, ckpt_v2):
    assert is_voxcpm_dir(ckpt_v1) and is_voxcpm_dir(ckpt_v2)
    for path, variant in ((ckpt_v1, "v1"), (ckpt_v2, "v2")):
        cfg, params = load_voxcpm(path, dtype=jnp.float32)
        assert cfg.variant == variant
        assert params["base_lm"]["embed"].shape == (64, HS)
        assert params["fsq_layer"]["project_in"]["w"].shape == \
            (HS, len(LEVELS))
        assert params["feat_decoder"]["pos_embed"].shape == \
            (1 + 2 * PS, DH)
        assert params["audio_vae"]["blocks"][0]["up"]["w"].shape == \
            (4, 16, 32)
        if variant == "v2":
            assert params["fusion_concat_proj"]["w"].shape == \
                (2 * HS, HS)
        else:
            assert params["fusion_concat_proj"] is None


def test_lm_prefill_parity_vs_torch(ckpt_v1):
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    sd = _tiny_state_dict("v1")
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((6, HS)).astype(np.float32)
    cos, sin = lm_rope_tables(cfg.lm, 64)
    hidden, kvs = lm_prefill(params["base_lm"], cfg.lm,
                             jnp.asarray(emb), cos, sin, kv_cap=16)
    golden = _o_lm(sd, "base_lm", torch.from_numpy(emb)).numpy()
    np.testing.assert_allclose(np.asarray(hidden), golden, rtol=2e-4,
                               atol=2e-4)
    # residual tower: no rope
    hidden_r, _ = lm_prefill(params["residual_lm"], cfg.residual,
                             jnp.asarray(emb), cos, sin, kv_cap=16)
    golden_r = _o_lm(sd, "residual_lm", torch.from_numpy(emb),
                     use_rope=False).numpy()
    np.testing.assert_allclose(np.asarray(hidden_r), golden_r,
                               rtol=2e-4, atol=2e-4)


def test_lm_step_consistency(ckpt_v1):
    """Chained lm_step after a prefill must equal a longer prefill's
    last hidden (validates the fixed-capacity KV machinery)."""
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    emb = rng.standard_normal((7, HS)).astype(np.float32)
    cos, sin = lm_rope_tables(cfg.lm, 64)
    _, kvs = lm_prefill(params["base_lm"], cfg.lm,
                        jnp.asarray(emb[:5]), cos, sin, kv_cap=16)
    h5, kvs = lm_step(params["base_lm"], cfg.lm, kvs,
                      jnp.asarray(emb[5]), jnp.int32(5), cos, sin)
    h6, kvs = lm_step(params["base_lm"], cfg.lm, kvs,
                      jnp.asarray(emb[6]), jnp.int32(6), cos, sin)
    full, _ = lm_prefill(params["base_lm"], cfg.lm, jnp.asarray(emb),
                         cos, sin, kv_cap=16)
    np.testing.assert_allclose(np.asarray(h6), np.asarray(full[-1]),
                               rtol=2e-4, atol=2e-4)


def test_longrope_tables_parity():
    cfg2 = VoxCPMConfig.from_json(_v2_hf())
    cos, sin = lm_rope_tables(cfg2.lm, 32)
    rs = cfg2.lm.rope_scaling
    orig = rs["original_max_position_embeddings"]
    inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).float() / HD))
    inv = inv / torch.tensor(rs["short_factor"])
    s = cfg2.lm.max_position_embeddings / orig
    scale = math.sqrt(1 + math.log(s) / math.log(orig))
    ang = torch.arange(32).float()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    np.testing.assert_allclose(np.asarray(cos),
                               (emb.cos() * scale).numpy(), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sin),
                               (emb.sin() * scale).numpy(), rtol=1e-5,
                               atol=1e-5)


def test_fsq_parity_and_grid(ckpt_v1):
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, HS)).astype(np.float32)
    got = np.asarray(fsq_apply(params["fsq_layer"], jnp.asarray(x),
                               cfg.fsq_levels))
    sd = _tiny_state_dict("v1")
    golden = _o_fsq(sd, torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=2e-4)
    # quantized codes land on the level grid
    z = _o_lin(sd, "fsq_layer.project_in", torch.from_numpy(x))
    half = (torch.tensor(LEVELS).float() - 1) / 2
    q = torch.round(torch.tanh(z) * half)
    assert (q.abs() <= half).all()


def test_feat_encoder_parity(ckpt_v1):
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    sd = _tiny_state_dict("v1")
    rng = np.random.default_rng(3)
    feat = rng.standard_normal((4, PS, FD)).astype(np.float32)
    got = np.asarray(feat_encode(params["feat_encoder"], cfg,
                                 jnp.asarray(feat)))
    golden = _o_feat_encode(sd, torch.from_numpy(feat)).numpy()
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=2e-4)


def test_dit_estimator_parity(ckpt_v1):
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    sd = _tiny_state_dict("v1")
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, FD, PS)).astype(np.float32)
    cond = rng.standard_normal((2, FD, PS)).astype(np.float32)
    mu = rng.standard_normal((2, DH)).astype(np.float32)
    t = np.asarray([0.7, 0.3], np.float32)
    dt = np.zeros(2, np.float32)
    got = np.asarray(dit_estimator(
        params["feat_decoder"], cfg, jnp.asarray(x), jnp.asarray(mu),
        jnp.asarray(t), jnp.asarray(cond), jnp.asarray(dt)))
    golden = _o_estimator(sd, torch.from_numpy(x),
                          torch.from_numpy(mu), torch.from_numpy(t),
                          torch.from_numpy(cond),
                          torch.from_numpy(dt)).numpy()
    np.testing.assert_allclose(got, golden, rtol=3e-4, atol=3e-4)


def test_t_span_matches_reference_formula():
    span = make_t_span(10, 1.0)
    t = torch.linspace(1, 0, 11)
    ref = t + 1.0 * (torch.cos(torch.pi / 2 * t) - 1 + t)
    np.testing.assert_allclose(span, ref.numpy(), rtol=1e-6, atol=1e-6)
    assert span[0] == pytest.approx(1.0) and \
        span[-1] == pytest.approx(0.0)


@pytest.mark.parametrize("zero_star", [False, True])
def test_cfm_solver_parity(ckpt_v1, zero_star):
    """Full Euler solve vs the reference solver semantics (same noise,
    same estimator weights): v1 plain CFG; v2 zero-init steps +
    ⟨pos,neg⟩/⟨neg,neg⟩ projection guidance."""
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    sd = _tiny_state_dict("v1")
    rng = np.random.default_rng(5)
    mu = rng.standard_normal((1, DH)).astype(np.float32)
    cond = rng.standard_normal((1, FD, PS)).astype(np.float32)
    noise = rng.standard_normal((1, FD, PS)).astype(np.float32)
    got = np.asarray(cfm_solve(params["feat_decoder"], cfg,
                               jnp.asarray(mu), jnp.asarray(cond),
                               jnp.asarray(noise), 6, 2.0, zero_star))
    golden = _o_solve(sd, torch.from_numpy(mu), torch.from_numpy(cond),
                      torch.from_numpy(noise), 6, 2.0,
                      zero_star).numpy()
    np.testing.assert_allclose(got, golden, rtol=1e-3, atol=1e-3)


def test_vae_decode_shapes(ckpt_v1):
    cfg, params = load_voxcpm(ckpt_v1, dtype=jnp.float32)
    rng = np.random.default_rng(6)
    lat = rng.standard_normal((1, 10, FD)).astype(np.float32)
    wav = np.asarray(vae_decode(params["audio_vae"], cfg,
                                jnp.asarray(lat)))
    assert wav.shape == (1, 10 * cfg.hop)
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0


@pytest.mark.parametrize("variant", ["v1", "v2"])
def test_pipeline_end_to_end(ckpt_v1, ckpt_v2, variant):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    path = ckpt_v1 if variant == "v1" else ckpt_v2
    config = DiffusionConfig(model=path, dtype="float32")
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == ("voxcpm" if variant == "v1"
                                   else "voxcpm2")
    out = eng.generate([DiffusionRequest(
        "r0", "hello there",
        DiffusionSamplingParams(
            num_inference_steps=4, guidance_scale=2.0, seed=0,
            output_type="np",
            extra_args={"max_len": 5, "min_len": 2}))])[0]
    assert out.finished and out.error is None, out.error
    wav = np.asarray(out.audio, np.float32)
    assert wav.ndim == 2 and wav.shape[1] % eng.pipeline.family_cfg.hop \
        == 0
    assert np.isfinite(wav).all()


def test_voice_clone_prompt_feat(ckpt_v1):
    """prompt_audio_feat rows enter the stream as encoded patches and
    seed the CFM conditioning with the last prompt patch."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    rng = np.random.default_rng(9)
    pf = rng.standard_normal((3, PS, FD)).astype(np.float32)
    config = DiffusionConfig(model=ckpt_v1, dtype="float32")
    eng = DiffusionEngine(config)
    out = eng.generate([DiffusionRequest(
        "r0", "clone me",
        DiffusionSamplingParams(
            num_inference_steps=4, guidance_scale=2.0, seed=0,
            output_type="np",
            extra_args={"max_len": 4, "min_len": 1,
                        "prompt_audio_feat": pf.tolist()}))])[0]
    assert out.finished and out.error is None, out.error
    assert np.isfinite(np.asarray(out.audio, np.float32)).all()
