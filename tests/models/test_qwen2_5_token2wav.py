"""Qwen2.5-Omni token2wav tests — torch oracles of the reference
(qwen2_5_omni_token2wav.py): codec-conditioned AdaLN-zero mel DiT
(head-0-only interleaved rope :578, block-diagonal ±1 attention
:1207/:655, CFG null branch zeroing spk/ref and the code ids
:405-416), 3/8-rule RK4 over the sway schedule :1087/:1320, and the
anti-aliased SnakeBeta BigVGAN :993 (Kaiser-sinc up/down around the
activation, mel dB preprocessing :1046)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

import tests.models.test_speaker_encoder as tse  # noqa: E402
from vllm_omni_tpu.models.qwen2_5_token2wav import (  # noqa: E402
    BigVGANConfig, Token2WavDiTConfig, bigvgan_forward, dit_forward,
    dit_sample, dit_velocity, is_token2wav_config,
    kaiser_sinc_filter1d, load_token2wav, process_mel, rk4_integrate,
    sway_times, token2wav_generate)

MEL, HS, NH, HD = 8, 32, 2, 16
EMB, ENC, XV = 12, 12, 10
DIT_JSON = {
    "mel_dim": MEL, "hidden_size": HS, "num_hidden_layers": 2,
    "num_attention_heads": NH, "head_dim": HD, "ff_mult": 2,
    "emb_dim": EMB, "enc_dim": ENC, "enc_emb_dim": XV,
    "num_embeds": 30, "repeats": 2, "block_size": 4,
    "look_ahead_layers": [0], "look_backward_layers": [1],
    "enc_channels": [16, 16, 16, 16, 24],
    "enc_kernel_sizes": [5, 3, 3, 3, 1],
    "enc_dilations": [1, 2, 3, 4, 1],
    "enc_attention_channels": 8, "enc_res2net_scale": 4,
    "enc_se_channels": 8,
}
VGAN_JSON = {
    "mel_dim": MEL, "upsample_initial_channel": 16,
    "upsample_rates": [2, 2], "upsample_kernel_sizes": [4, 4],
    "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
}
HF = {"model_type": "qwen2_5_omni",
      "token2wav_config": {"dit_config": DIT_JSON,
                           "bigvgan_config": VGAN_JSON}}


def _dit_cfg():
    return Token2WavDiTConfig.from_json(DIT_JSON)


def _spk_sd(seed=11):
    old = tse.CFG
    tse.CFG = _dit_cfg().spk_cfg()
    try:
        return tse._tiny_state_dict(seed=seed)
    finally:
        tse.CFG = old


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, o, i, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    d = "code2wav_dit_model"
    put(f"{d}.time_embed.time_mlp.0", HS, 256)
    put(f"{d}.time_embed.time_mlp.2", HS, HS)
    sd[f"{d}.text_embed.codec_embed.weight"] = torch.randn(
        31, EMB, generator=g) * 0.1
    put(f"{d}.input_embed.proj", HS, MEL + ENC + XV + EMB)
    for k, v in _spk_sd().items():
        sd[f"{d}.input_embed.spk_encoder.{k}"] = v
    for li in range(2):
        p = f"{d}.transformer_blocks.{li}"
        put(f"{p}.attn_norm.linear", 6 * HS, HS)
        put(f"{p}.attn.qkv_proj", 3 * NH * HD, HS)
        put(f"{p}.attn.to_out.0", HS, NH * HD)
        put(f"{p}.ff.ff.0", 2 * HS, HS)
        put(f"{p}.ff.ff.3", HS, 2 * HS)
    put(f"{d}.norm_out.linear", 2 * HS, HS)
    put(f"{d}.proj_out", MEL, HS)
    # bigvgan
    v = "code2wav_bigvgan_model"

    def conv(prefix, o, i, k, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k,
                                             generator=g) * 0.1
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    conv(f"{v}.conv_pre", 16, MEL, 7)
    ch = 16
    cfg_v = BigVGANConfig.from_json(VGAN_JSON)
    n_res = len(cfg_v.resblock_kernel_sizes)
    for li, (rate, ksz) in enumerate(zip(cfg_v.upsample_rates,
                                         cfg_v.upsample_kernel_sizes)):
        cout = 16 // (2 ** (li + 1))
        sd[f"{v}.ups.{li}.0.weight"] = torch.randn(
            ch, cout, ksz, generator=g) * 0.1
        sd[f"{v}.ups.{li}.0.bias"] = torch.randn(cout,
                                                 generator=g) * 0.02
        for bi, (k, dil) in enumerate(zip(
                cfg_v.resblock_kernel_sizes,
                cfg_v.resblock_dilation_sizes)):
            rb = f"{v}.resblocks.{li * n_res + bi}"
            for ci in range(len(dil)):
                conv(f"{rb}.convs1.{ci}", cout, cout, k)
                conv(f"{rb}.convs2.{ci}", cout, cout, k)
            for ai in range(2 * len(dil)):
                sd[f"{rb}.activations.{ai}.act.alpha"] = torch.randn(
                    cout, generator=g) * 0.1
                sd[f"{rb}.activations.{ai}.act.beta"] = torch.randn(
                    cout, generator=g) * 0.1
        ch = cout
    sd[f"{v}.activation_post.act.alpha"] = torch.randn(
        ch, generator=g) * 0.1
    sd[f"{v}.activation_post.act.beta"] = torch.randn(
        ch, generator=g) * 0.1
    conv(f"{v}.conv_post", 1, ch, 7, bias=False)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("t2w_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle (DiT)
# ---------------------------------------------------------------------------


def _o_lin(sd, prefix, x):
    out = x.float() @ sd[f"{prefix}.weight"].T.float()
    if f"{prefix}.bias" in sd:
        out = out + sd[f"{prefix}.bias"].float()
    return out


def _o_time_embed(sd, t):
    half = 128
    freqs = torch.exp(torch.arange(half).float() *
                      (-math.log(10000.0) / (half - 1)))
    args = 1000.0 * t.float()[:, None] * freqs[None]
    e = torch.cat([args.sin(), args.cos()], dim=-1)
    d = "code2wav_dit_model"
    h = _o_lin(sd, f"{d}.time_embed.time_mlp.0", e)
    return _o_lin(sd, f"{d}.time_embed.time_mlp.2", F.silu(h))


def _o_rope(n, d):
    inv = 1.0 / (10000.0 ** (torch.arange(0, d, 2).double() / d))
    f = torch.arange(n).double()[:, None] * inv[None]
    f = torch.stack([f, f], dim=-1).reshape(n, d)
    return f.cos().float(), f.sin().float()


def _o_rot_head0(q, cos, sin):
    q0 = q[:, :, 0].float()
    x = q0.reshape(*q0.shape[:-1], -1, 2)
    rot = torch.stack([-x[..., 1], x[..., 0]],
                      dim=-1).reshape(q0.shape)
    q = q.clone().float()
    q[:, :, 0] = q0 * cos[None] + rot * sin[None]
    return q


def _o_dit_forward(sd, cfg, x, ref_mel, spk, code, t,
                   drop_cond=False):
    d = "code2wav_dit_model"
    b, tt, _ = x.shape
    if drop_cond:
        ref_mel = torch.zeros_like(ref_mel)
        spk = torch.zeros_like(spk)
        code = torch.zeros_like(code)
    ce = sd[f"{d}.text_embed.codec_embed.weight"][code.long()].float()
    ce = torch.repeat_interleave(ce, 2, dim=1)
    spk_sd = {k[len(f"{d}.input_embed.spk_encoder."):]: v
              for k, v in sd.items()
              if k.startswith(f"{d}.input_embed.spk_encoder.")}
    old = tse.CFG
    tse.CFG = _dit_cfg().spk_cfg()
    try:
        cond = tse._o_encoder(spk_sd, ref_mel.float().transpose(1, 2))
    finally:
        tse.CFG = old
    cond = cond.unsqueeze(1).repeat(1, tt, 1)
    h = _o_lin(sd, f"{d}.input_embed.proj",
               torch.cat([x.float(), cond, ce, spk.float()], dim=-1))
    temb = _o_time_embed(sd, t)
    c = F.silu(temb)
    cos, sin = _o_rope(tt, HD)
    blocks = torch.arange(tt) // cfg.block_size
    diff = blocks[None, :] - blocks[:, None]
    for li in range(2):
        p = f"{d}.transformer_blocks.{li}"
        ahead = 1 if li in cfg.look_ahead_layers else 0
        back = 1 if li in cfg.look_backward_layers else 0
        mask = (diff >= -back) & (diff <= ahead)
        ada = _o_lin(sd, f"{p}.attn_norm.linear", c).reshape(b, 6, HS)
        sh_m, sc_m, g_m, sh_f, sc_f, g_f = [ada[:, j][:, None]
                                            for j in range(6)]
        norm = F.layer_norm(h, (HS,), eps=1e-6) * (1 + sc_m) + sh_m
        qkv = _o_lin(sd, f"{p}.attn.qkv_proj", norm)
        q = qkv[..., :NH * HD].reshape(b, tt, NH, HD)
        k = qkv[..., NH * HD:2 * NH * HD].reshape(b, tt, NH, HD)
        v = qkv[..., 2 * NH * HD:].reshape(b, tt, NH, HD)
        q = _o_rot_head0(q, cos, sin)
        k = _o_rot_head0(k, cos, sin)
        sc = torch.einsum("bqhd,bkhd->bhqk", q, k) * (HD ** -0.5)
        sc = sc.masked_fill(~mask[None, None], float("-inf"))
        o = torch.einsum("bhqk,bkhd->bqhd", torch.softmax(sc, -1),
                         v.float()).reshape(b, tt, NH * HD)
        h = h + g_m * _o_lin(sd, f"{p}.attn.to_out.0", o)
        norm = F.layer_norm(h, (HS,), eps=1e-6) * (1 + sc_f) + sh_f
        ff = _o_lin(sd, f"{p}.ff.ff.3",
                    F.gelu(_o_lin(sd, f"{p}.ff.ff.0", norm),
                           approximate="tanh"))
        h = h + g_f * ff
    ada = _o_lin(sd, f"{d}.norm_out.linear", c).reshape(b, 2, HS)
    h = F.layer_norm(h, (HS,), eps=1e-6) * (1 + ada[:, 0][:, None]) + \
        ada[:, 1][:, None]
    return _o_lin(sd, f"{d}.proj_out", h)


# ---------------------------------------------------------------------------
# torch oracle (BigVGAN)
# ---------------------------------------------------------------------------


def _o_snake_aa(x, alpha, beta, ratio=2):
    k = int(6 * ratio // 2) * 2
    pad = k // ratio - 1
    pl = pad * ratio + (k - ratio) // 2
    pr = pad * ratio + (k - ratio + 1) // 2
    f = torch.from_numpy(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio,
                                              k)).view(1, 1, -1)
    c = x.shape[1]
    h = F.pad(x.float(), (pad, pad), mode="replicate")
    h = ratio * F.conv_transpose1d(h, f.expand(c, -1, -1),
                                   stride=ratio, groups=c)
    h = h[..., pl:h.shape[-1] - pr]
    a = torch.exp(alpha.float())[None, :, None]
    bb = torch.exp(beta.float())[None, :, None]
    h = h + (1.0 / (bb + 1e-9)) * torch.sin(h * a) ** 2
    even = k % 2 == 0
    h = F.pad(h, (k // 2 - int(even), k // 2), mode="replicate")
    return F.conv1d(h, f.expand(c, -1, -1), stride=ratio, groups=c)


def _o_bigvgan(sd, cfg, mel):
    v = "code2wav_bigvgan_model"
    amp = torch.exp(mel.float())
    min_level = math.exp(-115 / 20.0 * math.log(10))
    db = 20 * torch.log10(torch.clamp(amp, min=min_level)) - 20
    x = torch.clamp(2 * ((db + 115) / 115) - 1, -1, 1)
    x = F.conv1d(x, sd[f"{v}.conv_pre.weight"].float(),
                 sd[f"{v}.conv_pre.bias"].float(), padding=3)
    n_res = len(cfg.resblock_kernel_sizes)
    for li, (rate, ksz) in enumerate(zip(cfg.upsample_rates,
                                         cfg.upsample_kernel_sizes)):
        x = F.conv_transpose1d(
            x, sd[f"{v}.ups.{li}.0.weight"].float(),
            sd[f"{v}.ups.{li}.0.bias"].float(), stride=rate,
            padding=(ksz - rate) // 2)
        acc = None
        for bi, (k, dil) in enumerate(zip(
                cfg.resblock_kernel_sizes,
                cfg.resblock_dilation_sizes)):
            rb = f"{v}.resblocks.{li * n_res + bi}"
            h = x
            for ci, dd in enumerate(dil):
                r = h
                h = _o_snake_aa(h, sd[f"{rb}.activations.{2*ci}"
                                      ".act.alpha"],
                                sd[f"{rb}.activations.{2*ci}"
                                   ".act.beta"])
                h = F.conv1d(h, sd[f"{rb}.convs1.{ci}.weight"].float(),
                             sd[f"{rb}.convs1.{ci}.bias"].float(),
                             dilation=dd,
                             padding=(k * dd - dd) // 2)
                h = _o_snake_aa(h, sd[f"{rb}.activations.{2*ci+1}"
                                      ".act.alpha"],
                                sd[f"{rb}.activations.{2*ci+1}"
                                   ".act.beta"])
                h = F.conv1d(h, sd[f"{rb}.convs2.{ci}.weight"].float(),
                             sd[f"{rb}.convs2.{ci}.bias"].float(),
                             padding=(k - 1) // 2)
                h = r + h
            acc = h if acc is None else acc + h
        x = acc / n_res
    x = _o_snake_aa(x, sd[f"{v}.activation_post.act.alpha"],
                    sd[f"{v}.activation_post.act.beta"])
    x = F.conv1d(x, sd[f"{v}.conv_post.weight"].float(), padding=3)
    return torch.clamp(x, -1, 1)[:, 0]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    assert is_token2wav_config(HF)
    bundle = load_token2wav(ckpt_dir)
    dit_cfg, dit = bundle["dit"]
    vg_cfg, vgan = bundle["bigvgan"]
    assert dit["codec_embed"].shape == (31, EMB)
    assert dit["input_proj"]["w"].shape == (MEL + ENC + XV + EMB, HS)
    assert dit["layers"][0]["qkv"]["w"].shape == (HS, 3 * NH * HD)
    assert vgan["ups"][0]["w"].shape == (4, 8, 16)
    assert "b" not in vgan["conv_post"]


def test_dit_forward_parity_vs_torch(ckpt_dir):
    bundle = load_token2wav(ckpt_dir)
    cfg, dit = bundle["dit"]
    sd = _tiny_state_dict()
    rng = np.random.default_rng(0)
    tc = 6
    tt = tc * 2
    x = rng.standard_normal((1, tt, MEL)).astype(np.float32)
    ref = rng.standard_normal((1, 12, MEL)).astype(np.float32)
    spk = rng.standard_normal((1, tt, XV)).astype(np.float32)
    code = rng.integers(1, 30, (1, tc)).astype(np.int32)
    t = np.asarray([0.4], np.float32)
    for drop in (False, True):
        got = np.asarray(dit_forward(
            dit, cfg, jnp.asarray(x), jnp.asarray(ref),
            jnp.asarray(spk), jnp.asarray(code), jnp.asarray(t),
            drop_cond=drop))
        gold = _o_dit_forward(sd, cfg, torch.from_numpy(x),
                              torch.from_numpy(ref),
                              torch.from_numpy(spk),
                              torch.from_numpy(code),
                              torch.from_numpy(t),
                              drop_cond=drop).numpy()
        np.testing.assert_allclose(got, gold, rtol=4e-4, atol=4e-4)


def test_rk4_and_sway_parity():
    times = sway_times(5, -1.0)
    t = torch.linspace(0, 1, 5)
    ref = (t + -1.0 * (torch.cos(torch.pi / 2 * t) - 1 + t)).numpy()
    np.testing.assert_allclose(times, ref, rtol=1e-6, atol=1e-6)
    # RK4 on dy/dt = y matches exp within 3/8-rule accuracy
    y = rk4_integrate(lambda t, y: y, np.asarray([1.0]),
                      np.linspace(0, 1, 11).astype(np.float32))
    np.testing.assert_allclose(y, [math.e], rtol=1e-5)


def test_bigvgan_parity_vs_torch(ckpt_dir):
    bundle = load_token2wav(ckpt_dir)
    cfg, vgan = bundle["bigvgan"]
    sd = _tiny_state_dict()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 12, MEL)).astype(np.float32) * 0.5
    got = np.asarray(bigvgan_forward(vgan, cfg, jnp.asarray(mel)))
    gold = _o_bigvgan(sd, cfg,
                      torch.from_numpy(mel).transpose(1, 2)).numpy()
    assert got.shape == gold.shape == (1, 12 * 4)
    np.testing.assert_allclose(got, gold, rtol=5e-4, atol=5e-4)


def test_sample_and_generate_shapes(ckpt_dir):
    bundle = load_token2wav(ckpt_dir)
    rng = np.random.default_rng(2)
    code = rng.integers(1, 30, (1, 5)).astype(np.int32)
    ref = rng.standard_normal((1, 10, MEL)).astype(np.float32)
    spk = rng.standard_normal((XV,)).astype(np.float32)
    mel = dit_sample(bundle["dit"][0] and bundle["dit"][1],
                     bundle["dit"][0], code, ref, spk, num_steps=3,
                     guidance_scale=0.5)
    assert mel.shape == (1, 10, MEL)
    assert np.isfinite(mel).all()
    wav = token2wav_generate(bundle, code, ref, spk, num_steps=3)
    assert wav.shape == (1, 10 * 4)
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0


def test_engine_token2wav_stage(ckpt_dir):
    """hf_config_name=token2wav serves the stage through EngineCore
    (same shape as the other code2wav stages)."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    eng = EngineCore(EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", mode="generation",
        max_model_len=64, num_pages=16, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, hf_config_name="token2wav"))
    assert "token2wav_25" in eng.aux
    rng = np.random.default_rng(3)
    codes = rng.integers(1, 30, (4,)).tolist()
    eng.add_request([1], SamplingParams(max_tokens=1),
                    request_id="w0",
                    additional_information={
                        "codec_codes": codes, "num_steps": 3,
                        "ref_mel": rng.standard_normal(
                            (10, MEL)).astype(np.float32).tolist(),
                        "speaker_embedding": rng.standard_normal(
                            (XV,)).astype(np.float32).tolist()})
    outs = []
    for _ in range(20):
        outs.extend(eng.step())
        if outs:
            break
    assert outs and outs[0].multimodal_output
    audio = outs[0].multimodal_output["audio"]
    wav = np.asarray(audio["data"], np.float32)
    assert wav.shape == (4 * 2 * 4,)  # Tc·repeats·prod(rates)
    assert np.isfinite(wav).all()
