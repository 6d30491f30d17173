"""DreamID-Omni fused AV family tests.

The torch oracle independently re-implements the reference semantics
(dreamid_omni/fusion.py single_fusion_block_forward:190-289 lockstep +
fused cross-attention with source/target rope; wan2_2.py native Wan
tower — additive modulation table, qk-rms, 3D video rope vs
temporal-only scaled audio rope, AdaLN head) so transpose/naming/order
mistakes cannot cancel out."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.dreamid import (  # noqa: E402
    DreamIDConfig, audio_rope, combine_dreamid_cfg, dreamid_forward,
    is_dreamid_dir, load_dreamid, video_rope)

D, NH, HD = 24, 2, 12
FFN = 48
VIN, AIN = 4, 6
TD = 16  # text_dim
SCALE = 0.25
HF = {
    "model_type": "dreamid_omni",
    "flow_shift": 5.0,
    "video_config": {
        "model_type": "ti2v", "patch_size": [1, 2, 2],
        "in_dim": VIN, "out_dim": VIN, "dim": D, "ffn_dim": FFN,
        "freq_dim": 8, "text_dim": TD, "num_heads": NH,
        "num_layers": 1, "eps": 1e-6,
    },
    "audio_config": {
        "model_type": "t2a", "patch_size": [1],
        "in_dim": AIN, "out_dim": AIN, "dim": D, "ffn_dim": FFN,
        "freq_dim": 8, "text_dim": TD, "num_heads": NH,
        "num_layers": 1, "eps": 1e-6,
        "temporal_rope_scaling_factor": SCALE,
    },
}


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, o, i, bias=True):
        sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    def tower(prefix, is_audio):
        if is_audio:
            sd[f"{prefix}.patch_embedding.0.weight"] = torch.randn(
                D, AIN, 7, generator=g) * 0.1
            sd[f"{prefix}.patch_embedding.0.bias"] = torch.randn(
                D, generator=g) * 0.02
            sd[f"{prefix}.patch_embedding.2.c1.weight"] = torch.randn(
                4 * D, D, 7, generator=g) * 0.05
            sd[f"{prefix}.patch_embedding.2.c1.bias"] = torch.randn(
                4 * D, generator=g) * 0.02
            sd[f"{prefix}.patch_embedding.2.c2.weight"] = torch.randn(
                D, 4 * D, 7, generator=g) * 0.05
            sd[f"{prefix}.patch_embedding.2.c2.bias"] = torch.randn(
                D, generator=g) * 0.02
        else:
            sd[f"{prefix}.patch_embedding.weight"] = torch.randn(
                D, VIN, 1, 2, 2, generator=g) * 0.1
            sd[f"{prefix}.patch_embedding.bias"] = torch.randn(
                D, generator=g) * 0.02
        put(f"{prefix}.text_embedding.0", D, TD)
        put(f"{prefix}.text_embedding.2", D, D)
        put(f"{prefix}.time_embedding.0", D, 8)
        put(f"{prefix}.time_embedding.2", D, D)
        put(f"{prefix}.time_projection.1", 6 * D, D)
        b = f"{prefix}.blocks.0"
        sd[f"{b}.modulation"] = torch.randn(1, 6, D, generator=g) * 0.2
        for m in ("self_attn", "cross_attn"):
            for k in ("q", "k", "v", "o"):
                put(f"{b}.{m}.{k}", D, D)
            sd[f"{b}.{m}.norm_q.weight"] = torch.rand(D,
                                                      generator=g) + 0.5
            sd[f"{b}.{m}.norm_k.weight"] = torch.rand(D,
                                                      generator=g) + 0.5
        put(f"{b}.cross_attn.k_fusion", D, D)
        put(f"{b}.cross_attn.v_fusion", D, D)
        sd[f"{b}.cross_attn.pre_attn_norm_fusion.weight"] = torch.rand(
            D, generator=g) + 0.5
        sd[f"{b}.cross_attn.pre_attn_norm_fusion.bias"] = torch.randn(
            D, generator=g) * 0.02
        sd[f"{b}.cross_attn.norm_k_fusion.weight"] = torch.rand(
            D, generator=g) + 0.5
        sd[f"{b}.norm3.weight"] = torch.rand(D, generator=g) + 0.5
        sd[f"{b}.norm3.bias"] = torch.randn(D, generator=g) * 0.02
        put(f"{b}.ffn.0", FFN, D)
        put(f"{b}.ffn.2", D, FFN)
        out_mult = 1 if is_audio else 4
        put(f"{prefix}.head.head",
            (AIN if is_audio else VIN) * out_mult, D)
        sd[f"{prefix}.head.modulation"] = torch.randn(
            1, 2, D, generator=g) * 0.2

    tower("video_model", False)
    tower("audio_model", True)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("dreamid_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_lin(sd, prefix, x):
    out = x.float() @ sd[f"{prefix}.weight"].T.float()
    if f"{prefix}.bias" in sd:
        out = out + sd[f"{prefix}.bias"].float()
    return out


def _o_rms(x, w, eps=1e-6):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(var + eps)) * w.float()


def _o_ln(x, w=None, b=None, eps=1e-6):
    out = F.layer_norm(x.float(), (x.shape[-1],), eps=eps)
    if w is not None:
        out = out * w.float() + b.float()
    return out


def _rope_cs(f, h, w):
    dt, dh = HD - 4 * (HD // 6), 2 * (HD // 6)

    def half(n, dim):
        inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).double()
                                 / dim))
        return torch.arange(n).double()[:, None] * inv[None]

    ang = torch.zeros(f, h, w, HD // 2, dtype=torch.float64)
    ang[..., :dt // 2] = half(f, dt)[:, None, None]
    ang[..., dt // 2:(dt + dh) // 2] = half(h, dh)[None, :, None]
    ang[..., (dt + dh) // 2:] = half(w, dh)[None, None, :]
    ang = ang.reshape(-1, HD // 2)
    return ang.cos().float(), ang.sin().float()


def _audio_rope_cs(n, scale):
    dt = HD - 4 * (HD // 6)
    inv = 1.0 / (10000.0 ** (torch.arange(0, dt, 2).double() / dt))
    ang = torch.zeros(n, HD // 2, dtype=torch.float64)
    ang[:, :dt // 2] = torch.arange(n).double()[:, None] * scale * \
        inv[None]
    return ang.cos().float(), ang.sin().float()


def _o_rope_apply(x, cos, sin):
    b, s, h, d = x.shape
    xf = x.float().reshape(b, s, h, d // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    c, sn = cos[None, :, None], sin[None, :, None]
    return torch.stack([xr * c - xi * sn, xr * sn + xi * c],
                       dim=-1).reshape(b, s, h, d)


def _o_attend(q, k, v):
    sc = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) * \
        (HD ** -0.5)
    o = torch.einsum("bhqk,bkhd->bqhd", torch.softmax(sc, -1),
                     v.float())
    return o.reshape(q.shape[0], q.shape[1], NH * HD)


def _o_sinusoid(t, dim):
    half = dim // 2
    freqs = torch.pow(10000.0, -torch.arange(half).float() / half)
    args = t.float()[:, None] * freqs[None]
    return torch.cat([args.sin(), args.cos()], dim=-1)


def _o_embed(sd, prefix, x, t, ctx, is_audio):
    if is_audio:
        h = F.conv1d(x.transpose(1, 2),
                     sd[f"{prefix}.patch_embedding.0.weight"].float(),
                     sd[f"{prefix}.patch_embedding.0.bias"].float(),
                     padding=3)
        h = F.silu(h)
        m = F.conv1d(h,
                     sd[f"{prefix}.patch_embedding.2.c1.weight"
                        ].float(),
                     sd[f"{prefix}.patch_embedding.2.c1.bias"].float(),
                     padding=3)
        m = F.gelu(m, approximate="tanh")
        tokens = F.conv1d(
            m, sd[f"{prefix}.patch_embedding.2.c2.weight"].float(),
            sd[f"{prefix}.patch_embedding.2.c2.bias"].float(),
            padding=3).transpose(1, 2)
        grid = (x.shape[1],)
    else:
        lat = x.permute(0, 4, 1, 2, 3)  # BFHWC → BCFHW
        h = F.conv3d(lat,
                     sd[f"{prefix}.patch_embedding.weight"].float(),
                     sd[f"{prefix}.patch_embedding.bias"].float(),
                     stride=(1, 2, 2))
        grid = tuple(h.shape[2:])
        tokens = h.flatten(2).transpose(1, 2)
    e = _o_lin(sd, f"{prefix}.time_embedding.0", _o_sinusoid(t, 8))
    temb = _o_lin(sd, f"{prefix}.time_embedding.2", F.silu(e))
    tproj = _o_lin(sd, f"{prefix}.time_projection.1",
                   F.silu(temb)).reshape(-1, 6, D)
    c = _o_lin(sd, f"{prefix}.text_embedding.2",
               F.gelu(_o_lin(sd, f"{prefix}.text_embedding.0", ctx),
                      approximate="tanh"))
    return tokens, temb, tproj, c, grid


def _o_self(sd, b, x, tproj, cos, sin):
    mod = sd[f"{b}.modulation"].float() + tproj[:, None].squeeze(1)[
        :, :, :] if False else sd[f"{b}.modulation"].float() + \
        tproj.float()
    m = [mod[:, i][:, None] for i in range(6)]
    xn = _o_ln(x) * (1 + m[1]) + m[0]
    s = xn.shape[1]
    q = _o_rms(_o_lin(sd, f"{b}.self_attn.q", xn),
               sd[f"{b}.self_attn.norm_q.weight"]).reshape(-1, s, NH,
                                                           HD)
    k = _o_rms(_o_lin(sd, f"{b}.self_attn.k", xn),
               sd[f"{b}.self_attn.norm_k.weight"]).reshape(-1, s, NH,
                                                           HD)
    v = _o_lin(sd, f"{b}.self_attn.v", xn).reshape(-1, s, NH, HD)
    y = _o_attend(_o_rope_apply(q, cos, sin),
                  _o_rope_apply(k, cos, sin), v)
    y = _o_lin(sd, f"{b}.self_attn.o", y)
    return x + y * m[2], m


def _o_cross_ffn(sd, b, x, ctx, target, m, s_cos, s_sin, t_cos,
                 t_sin):
    xn = _o_ln(x, sd[f"{b}.norm3.weight"], sd[f"{b}.norm3.bias"])
    s = xn.shape[1]
    q = _o_rms(_o_lin(sd, f"{b}.cross_attn.q", xn),
               sd[f"{b}.cross_attn.norm_q.weight"]).reshape(
        -1, s, NH, HD)
    k = _o_rms(_o_lin(sd, f"{b}.cross_attn.k", ctx),
               sd[f"{b}.cross_attn.norm_k.weight"]).reshape(
        -1, ctx.shape[1], NH, HD)
    v = _o_lin(sd, f"{b}.cross_attn.v", ctx).reshape(
        -1, ctx.shape[1], NH, HD)
    out = _o_attend(q, k, v)
    tgt = _o_ln(target,
                sd[f"{b}.cross_attn.pre_attn_norm_fusion.weight"],
                sd[f"{b}.cross_attn.pre_attn_norm_fusion.bias"])
    kt = _o_rms(_o_lin(sd, f"{b}.cross_attn.k_fusion", tgt),
                sd[f"{b}.cross_attn.norm_k_fusion.weight"]).reshape(
        -1, tgt.shape[1], NH, HD)
    vt = _o_lin(sd, f"{b}.cross_attn.v_fusion", tgt).reshape(
        -1, tgt.shape[1], NH, HD)
    out = out + _o_attend(_o_rope_apply(q, s_cos, s_sin),
                          _o_rope_apply(kt, t_cos, t_sin), vt)
    x = x + _o_lin(sd, f"{b}.cross_attn.o", out)
    y = _o_lin(sd, f"{b}.ffn.2",
               F.gelu(_o_lin(sd, f"{b}.ffn.0",
                             _o_ln(x) * (1 + m[4]) + m[3]),
                      approximate="tanh"))
    return x + y * m[5]


def _o_head(sd, prefix, x, temb):
    mod = sd[f"{prefix}.head.modulation"].float() + temb.float()[
        :, None]
    h = _o_ln(x) * (1 + mod[:, 1][:, None]) + mod[:, 0][:, None]
    return _o_lin(sd, f"{prefix}.head.head", h)


def _o_forward(sd, vid, aud, t, vctx, actx):
    vx, v_temb, v_tproj, vc, vgrid = _o_embed(sd, "video_model", vid,
                                              t, vctx, False)
    ax, a_temb, a_tproj, ac, agrid = _o_embed(sd, "audio_model", aud,
                                              t, actx, True)
    v_cos, v_sin = _rope_cs(*vgrid)
    a_cos, a_sin = _audio_rope_cs(agrid[0], SCALE)
    ax, am = _o_self(sd, "audio_model.blocks.0", ax, a_tproj, a_cos,
                     a_sin)
    vx, vm = _o_self(sd, "video_model.blocks.0", vx, v_tproj, v_cos,
                     v_sin)
    og = ax
    ax = _o_cross_ffn(sd, "audio_model.blocks.0", ax, ac, vx, am,
                      a_cos, a_sin, v_cos, v_sin)
    vx = _o_cross_ffn(sd, "video_model.blocks.0", vx, vc, og, vm,
                      v_cos, v_sin, a_cos, a_sin)
    v_out = _o_head(sd, "video_model", vx, v_temb)
    a_out = _o_head(sd, "audio_model", ax, a_temb)
    b = vid.shape[0]
    f, h, w = vgrid
    v_out = v_out.reshape(b, f, h, w, 1, 2, 2, VIN)
    v_out = v_out.permute(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        b, f, h * 2, w * 2, VIN)
    return v_out, a_out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    assert is_dreamid_dir(ckpt_dir)
    cfg, params = load_dreamid(ckpt_dir, dtype=jnp.float32)
    assert cfg.video.num_layers == 1 and cfg.audio.is_audio
    assert cfg.audio.temporal_rope_scaling_factor == SCALE
    pv = params["video"]
    assert pv["patch_embedding"]["w"].shape == (4 * VIN, D)
    assert pv["blocks"][0]["cross_attn"]["k_fusion"]["w"].shape == \
        (D, D)
    pa = params["audio"]
    assert pa["patch_embedding"]["conv"]["w"].shape == (7, AIN, D)
    assert pa["head"]["head"]["w"].shape == (D, AIN)
    assert pv["head"]["modulation"].shape == (2, D)


def test_rope_split_video_vs_audio():
    cfg, _ = DreamIDConfig.from_json(HF), None
    vcos, vsin = video_rope(cfg.video, 2, 2, 2)
    assert vcos.shape == (8, HD // 2)
    acos, asin = audio_rope(cfg.audio, 5)
    dt = HD - 4 * (HD // 6)
    # audio rotates ONLY the temporal sub-dims; rest identity
    assert np.allclose(acos[:, dt // 2:], 1.0)
    assert np.allclose(asin[:, dt // 2:], 0.0)
    # temporal positions scaled: angle(n=1) = SCALE / theta^0
    assert acos[1, 0] == pytest.approx(math.cos(SCALE), abs=1e-6)


def test_fused_forward_parity_vs_torch(ckpt_dir):
    cfg, params = load_dreamid(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(0)
    vid = rng.standard_normal((2, 2, 4, 4, VIN)).astype(np.float32)
    aud = rng.standard_normal((2, 5, AIN)).astype(np.float32)
    t = np.asarray([700.0, 300.0], np.float32)
    vctx = rng.standard_normal((2, 3, TD)).astype(np.float32)
    actx = rng.standard_normal((2, 3, TD)).astype(np.float32)
    v_got, a_got = dreamid_forward(
        params, cfg, jnp.asarray(vid), jnp.asarray(aud),
        jnp.asarray(t), jnp.asarray(vctx), jnp.asarray(actx))
    v_gold, a_gold = _o_forward(sd, torch.from_numpy(vid),
                                torch.from_numpy(aud),
                                torch.from_numpy(t),
                                torch.from_numpy(vctx),
                                torch.from_numpy(actx))
    assert v_got.shape == tuple(v_gold.shape) == (2, 2, 4, 4, VIN)
    assert a_got.shape == tuple(a_gold.shape) == (2, 5, AIN)
    np.testing.assert_allclose(np.asarray(v_got), v_gold.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(a_got), a_gold.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_cfg_combine_formula():
    rng = np.random.default_rng(2)
    pos, neg, ref = [rng.standard_normal((1, 4)).astype(np.float32)
                     for _ in range(3)]
    got = np.asarray(combine_dreamid_cfg(jnp.asarray(pos),
                                         jnp.asarray(neg),
                                         jnp.asarray(ref), 4.0, 1.5))
    want = neg + 4.0 * (pos - neg) + 1.5 * (pos - ref)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pipeline_end_to_end(ckpt_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=ckpt_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "dreamid_omni"
    out = eng.generate([DiffusionRequest(
        "r0", "a person speaking",
        DiffusionSamplingParams(
            num_inference_steps=2, height=32, width=32, num_frames=2,
            seed=0, output_type="np",
            extra_args={"audio_frames": 6}))])[0]
    assert out.finished and out.error is None, out.error
    vid = np.asarray(out.video, np.float32)
    assert vid.shape[1] == 2 and vid.shape[-1] == 3
    assert np.isfinite(vid).all()
    aud = np.asarray(out.audio, np.float32)
    assert aud.shape == (1, 6, AIN)
    assert np.isfinite(aud).all()
