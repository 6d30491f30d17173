"""MAGI-Human unified AV DiT family tests.

The torch oracle independently re-implements the reference semantics
(magi_human_dit.py: element-wise Fourier rope from 9-dim coords with
(ref−1)/(size−1) scaling and centered h/w axes :191-243, per-modality
expert RMS norms applied as rms(x)·(w+1) :247, stacked per-modality
expert linears with fused [Q,K,V,G] qkv :702-845, sigmoid head gating,
clamped swiglu7/gelu7 MLPs :97-112, per-modality final heads
:1094-1188, frame-local attention ranges :1260) so
transpose/naming/order mistakes cannot cancel out."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.magi_human import (  # noqa: E402
    MagiHumanConfig, build_coords, fourier_rope, is_magi_human_dir,
    load_magi_human, local_attn_mask, magi_coords, magi_forward,
    pack_video, unpack_video)

HS, HD = 32, 16       # 2 heads, 1 kv group
NH, HKV = 2, 1
VC, AC, TC = 4, 6, 10  # video latent / audio / text channels
P, PT = 2, 1
VIN = VC * P * P * PT  # 16
HF = {
    "model_type": "magi_human",
    "flow_shift": 3.0,
    "dit_config": {
        "num_layers": 2, "hidden_size": HS, "head_dim": HD,
        "num_query_groups": HKV, "video_latent_channels": VC,
        "patch_size": P, "t_patch_size": PT,
        "audio_in_channels": AC, "text_in_channels": TC,
        "mm_layers": [0], "gelu7_layers": [0],
        "local_attn_layers": [1], "post_norm_layers": [1],
        "enable_attn_gating": True, "frame_receptive_field": 1,
    },
}


def _cfg():
    return MagiHumanConfig.from_json(HF)


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    cfg = _cfg()
    sd = {}

    def emb(prefix, cin):
        sd[f"{prefix}.weight"] = torch.randn(HS, cin,
                                             generator=g) * 0.1
        sd[f"{prefix}.bias"] = torch.randn(HS, generator=g) * 0.02

    emb("adapter.video_embedder", VIN)
    emb("adapter.audio_embedder", AC)
    emb("adapter.text_embedder", TC)
    qkv_rows = (NH + 2 * HKV) * HD
    for li in range(2):
        mod = 3 if li in cfg.mm_layers else 1
        b = f"block.layers.{li}"
        g7 = li in cfg.gelu7_layers
        inter_up = HS * 4 if g7 else cfg.swiglu_inter * 2
        inter_down = HS * 4 if g7 else cfg.swiglu_inter
        sd[f"{b}.attention.pre_norm.weight"] = torch.randn(
            HS * mod, generator=g) * 0.1
        # fused [Q, K, V, G] per expert, experts stacked on dim 0
        sd[f"{b}.attention.linear_qkv.weight"] = torch.randn(
            (qkv_rows + NH) * mod, HS, generator=g) * (HS ** -0.5)
        sd[f"{b}.attention.q_norm.weight"] = torch.randn(
            HD * mod, generator=g) * 0.1
        sd[f"{b}.attention.k_norm.weight"] = torch.randn(
            HD * mod, generator=g) * 0.1
        sd[f"{b}.attention.linear_proj.weight"] = torch.randn(
            HS * mod, NH * HD, generator=g) * (HS ** -0.5)
        sd[f"{b}.mlp.pre_norm.weight"] = torch.randn(
            HS * mod, generator=g) * 0.1
        sd[f"{b}.mlp.up_gate_proj.weight"] = torch.randn(
            inter_up * mod, HS, generator=g) * (HS ** -0.5)
        sd[f"{b}.mlp.down_proj.weight"] = torch.randn(
            HS * mod, inter_down, generator=g) * (inter_down ** -0.5)
        if li in cfg.post_norm_layers:
            sd[f"{b}.attn_post_norm.weight"] = torch.randn(
                HS * mod, generator=g) * 0.1
            sd[f"{b}.mlp_post_norm.weight"] = torch.randn(
                HS * mod, generator=g) * 0.1
    sd["final_norm_video.weight"] = torch.randn(HS, generator=g) * 0.1
    sd["final_norm_audio.weight"] = torch.randn(HS, generator=g) * 0.1
    sd["final_linear_video.weight"] = torch.randn(
        VIN, HS, generator=g) * 0.1
    sd["final_linear_audio.weight"] = torch.randn(
        AC, HS, generator=g) * 0.1
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("magi_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_rope_table(coords):
    bands = (1.0 / 10000.0 ** (torch.arange(HD // 8).float() /
                               (HD // 8)))
    xyz = coords[:, :3].double()
    sizes = coords[:, 3:6].double()
    refs = coords[:, 6:9].double()
    scales = (refs - 1) / torch.where(sizes > 1, sizes - 1,
                                      torch.ones_like(sizes))
    scales[(refs == 1) & (sizes == 1)] = 1
    centers = (sizes - 1) / 2
    centers[:, 0] = 0
    proj = (xyz - centers).unsqueeze(-1) * scales.unsqueeze(-1) * \
        bands.double()
    return torch.cat([proj.sin(), proj.cos()], dim=1).flatten(1).float()


def _o_apply_rope(x, rope):
    """x [N, H, D]; reference apply_rotary_emb_torch with sin/cos
    halves."""
    half = rope.shape[-1] // 2
    sin, cos = rope[:, :half], rope[:, half:]
    ro = 2 * half
    cosr = torch.cat([cos, cos], dim=-1)[:, None]
    sinr = torch.cat([sin, sin], dim=-1)[:, None]
    xr = x[..., :ro].float()
    x1, x2 = xr.chunk(2, dim=-1)
    rot = torch.cat([-x2, x1], dim=-1)
    out = xr * cosr + rot * sinr
    return torch.cat([out, x[..., ro:].float()], dim=-1)


def _o_rmsw(x, w, eps=1e-6):
    t = x.float()
    t = t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + eps)
    return t * (w.float() + 1)


def _seg(x, segs):
    nv, na, nt = segs
    return x[:nv], x[nv:nv + na], x[nv + na:]


def _o_expert_norm(x, w, segs, mod):
    if mod == 1:
        return _o_rmsw(x, w)
    chunks = w.chunk(mod)
    parts = [_o_rmsw(s, chunks[i]) for i, s in enumerate(_seg(x,
                                                              segs))]
    return torch.cat(parts, dim=0)


def _o_expert_lin(x, w_stacked, segs, mod):
    """w_stacked: checkpoint layout [rows·mod, in] (stacked on dim 0)."""
    if mod == 1:
        return x.float() @ w_stacked.T.float()
    per = w_stacked.shape[0] // mod
    parts = [s.float() @ w_stacked[i * per:(i + 1) * per].T.float()
             for i, s in enumerate(_seg(x, segs))]
    return torch.cat(parts, dim=0)


def _o_swiglu7(x):
    x = x.float()
    gl, lin = x[..., ::2], x[..., 1::2]
    gl = gl.clamp(max=7.0)
    lin = lin.clamp(-7.0, 7.0)
    return gl * torch.sigmoid(1.702 * gl) * (lin + 1)


def _o_gelu7(x):
    x = x.float().clamp(max=7.0)
    return x * torch.sigmoid(1.702 * x)


def _o_forward(sd, cfg, vt, aud, txt, coords, num_frames):
    segs = (vt.shape[0], aud.shape[0], txt.shape[0])
    nv, na, nt = segs
    rope = _o_rope_table(coords)
    x = torch.cat([
        vt.float() @ sd["adapter.video_embedder.weight"].T.float() +
        sd["adapter.video_embedder.bias"].float(),
        aud.float() @ sd["adapter.audio_embedder.weight"].T.float() +
        sd["adapter.audio_embedder.bias"].float(),
        txt.float() @ sd["adapter.text_embedder.weight"].T.float() +
        sd["adapter.text_embedder.bias"].float()], dim=0)
    qkv_rows = (NH + 2 * HKV) * HD
    for li in range(2):
        mod = 3 if li in cfg.mm_layers else 1
        b = f"block.layers.{li}"
        h = _o_expert_norm(x, sd[f"{b}.attention.pre_norm.weight"],
                           segs, mod)
        full = _o_expert_lin(h, sd[f"{b}.attention.linear_qkv.weight"],
                             segs, mod)
        qkv, gate = full[:, :qkv_rows], full[:, qkv_rows:]
        q = qkv[:, :NH * HD].reshape(-1, NH, HD)
        k = qkv[:, NH * HD:(NH + HKV) * HD].reshape(-1, HKV, HD)
        v = qkv[:, (NH + HKV) * HD:].reshape(-1, HKV, HD)

        def qknorm(z, w):
            if mod == 1:
                return _o_rmsw(z, w)
            chunks = w.chunk(mod)
            parts = [_o_rmsw(s, chunks[i])
                     for i, s in enumerate(_seg(z, segs))]
            return torch.cat(parts, dim=0)

        q = qknorm(q, sd[f"{b}.attention.q_norm.weight"])
        k = qknorm(k, sd[f"{b}.attention.k_norm.weight"])
        q = _o_apply_rope(q, rope)
        k = _o_apply_rope(k, rope)
        kr = k.repeat_interleave(NH // HKV, dim=1)
        vr = v.float().repeat_interleave(NH // HKV, dim=1)
        sc = torch.einsum("qhd,khd->hqk", q, kr) * (HD ** -0.5)
        if li in cfg.local_attn_layers:
            m = torch.from_numpy(local_attn_mask(
                nv, na + nt, num_frames, cfg.frame_receptive_field))
            sc = sc.masked_fill(~m[None], -1e30)
        o = torch.einsum("hqk,khd->qhd", torch.softmax(sc, -1), vr)
        o = o * torch.sigmoid(gate)[:, :, None]
        attn = _o_expert_lin(o.reshape(-1, NH * HD),
                             sd[f"{b}.attention.linear_proj.weight"],
                             segs, mod)
        if li in cfg.post_norm_layers:
            attn = _o_expert_norm(attn,
                                  sd[f"{b}.attn_post_norm.weight"],
                                  segs, mod)
        x = x + attn
        h = _o_expert_norm(x, sd[f"{b}.mlp.pre_norm.weight"], segs,
                           mod)
        up = _o_expert_lin(h, sd[f"{b}.mlp.up_gate_proj.weight"],
                           segs, mod)
        act = _o_gelu7(up) if li in cfg.gelu7_layers else \
            _o_swiglu7(up)
        m_out = _o_expert_lin(act, sd[f"{b}.mlp.down_proj.weight"],
                              segs, mod)
        if li in cfg.post_norm_layers:
            m_out = _o_expert_norm(m_out,
                                   sd[f"{b}.mlp_post_norm.weight"],
                                   segs, mod)
        x = x + m_out
    v_out = _o_rmsw(x[:nv], sd["final_norm_video.weight"]) @ \
        sd["final_linear_video.weight"].T.float()
    a_out = _o_rmsw(x[nv:nv + na], sd["final_norm_audio.weight"]) @ \
        sd["final_linear_audio.weight"].T.float()
    return v_out, a_out


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    assert is_magi_human_dir(ckpt_dir)
    cfg, params = load_magi_human(ckpt_dir, dtype=jnp.float32)
    assert cfg.num_layers == 2 and cfg.mm_layers == (0,)
    l0 = params["layers"][0]  # mm layer: stacked experts
    assert l0["linear_qkv"]["w"].shape == (3, HS, (NH + 2 * HKV) * HD)
    assert l0["linear_gating"]["w"].shape == (3, HS, NH)
    assert l0["attn_pre_norm"].shape == (3 * HS,)
    l1 = params["layers"][1]  # shared layer
    assert l1["linear_qkv"]["w"].shape == (HS, (NH + 2 * HKV) * HD)
    assert "attn_post_norm" in l1
    assert params["final_linear_video"]["w"].shape == (HS, VIN)


def test_fourier_rope_parity():
    cfg = _cfg()
    coords = magi_coords(cfg, 2, 2, 2, 3, 4)
    got = fourier_rope(coords, HD)
    golden = _o_rope_table(torch.from_numpy(coords)).numpy()
    np.testing.assert_allclose(got, golden, rtol=1e-5, atol=1e-5)
    assert got.shape == (8 + 3 + 4, 6 * (HD // 8))


def test_pack_unpack_roundtrip():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((2, 4, 4, VC)).astype(np.float32)
    toks = pack_video(jnp.asarray(lat), cfg)
    assert toks.shape == (2 * 2 * 2, VIN)
    back = unpack_video(toks, 2, 4, 4, cfg)
    np.testing.assert_allclose(np.asarray(back), lat, atol=0)


def test_forward_parity_vs_torch(ckpt_dir):
    cfg, params = load_magi_human(ckpt_dir, dtype=jnp.float32)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(1)
    f_tok, h_tok, w_tok = 2, 2, 2
    na, nt = 3, 4
    vt = rng.standard_normal((f_tok * h_tok * w_tok, VIN)).astype(
        np.float32)
    aud = rng.standard_normal((na, AC)).astype(np.float32)
    txt = rng.standard_normal((nt, TC)).astype(np.float32)
    coords = magi_coords(cfg, f_tok, h_tok, w_tok, na, nt)
    rope = jnp.asarray(fourier_rope(coords, HD))
    v_got, a_got = magi_forward(params, cfg, jnp.asarray(vt),
                                jnp.asarray(aud), jnp.asarray(txt),
                                rope, f_tok)
    v_gold, a_gold = _o_forward(sd, cfg, torch.from_numpy(vt),
                                torch.from_numpy(aud),
                                torch.from_numpy(txt),
                                torch.from_numpy(coords), f_tok)
    np.testing.assert_allclose(np.asarray(v_got), v_gold.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(a_got), a_gold.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_local_attn_mask_ranges():
    m = local_attn_mask(n_video=8, n_at=5, num_frames=4, receptive=1)
    # frame 0 video Q (rows 0-1) sees frames 0-1 video K + all at
    assert m[0, :4].all() and not m[0, 4:8].any()
    assert m[0, 8:].all()
    # at rows see everything
    assert m[8:].all()


def test_pipeline_end_to_end(ckpt_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=ckpt_dir, dtype="float32",
                             resolution_buckets=((32, 32),))
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "magi_human"
    out = eng.generate([DiffusionRequest(
        "r0", "a person talking",
        DiffusionSamplingParams(
            num_inference_steps=2, height=32, width=32, num_frames=2,
            seed=0, output_type="np",
            extra_args={"audio_frames": 4, "text_tokens": 4}))])[0]
    assert out.finished and out.error is None, out.error
    vid = np.asarray(out.video, np.float32)
    assert vid.shape[1] == 2 and vid.shape[-1] == 3
    assert np.isfinite(vid).all()
    aud = np.asarray(out.audio, np.float32)
    assert aud.shape == (1, 4, AC) and np.isfinite(aud).all()
