"""LTX-2 real-geometry family + diffusers-format loader tests.

Same method as test_sd3_loader.py: checkpoint fixture in genuine
diffusers layout (LTX2VideoTransformer3DModel naming — per block attn1/
audio_attn1 self-attention, attn2/audio_attn2 text cross-attention,
audio_to_video_attn/video_to_audio_attn at audio inner width, per-layer
scale_shift tables, AdaLN-Single timestep modulation stacks, PixArt
caption projections), numeric oracle is an independent torch
re-implementation of the diffusers semantics for BOTH output streams.
Reference: diffusion/models/ltx2/ltx2_transformer.py:1237."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.ltx2 import (LTX2Config,  # noqa: E402
                                          assign_ltx2_tensor,
                                          init_ltx2_params, ltx2_forward)

TINY = dict(in_channels=8, out_channels=8, patch_size=1, patch_size_t=1,
            num_attention_heads=2, attention_head_dim=12,
            cross_attention_dim=24, vae_scale_factors=[8, 32, 32],
            pos_embed_max_pos=20, base_height=2048, base_width=2048,
            audio_in_channels=6, audio_out_channels=6,
            audio_num_attention_heads=2, audio_attention_head_dim=8,
            audio_cross_attention_dim=16, audio_scale_factor=4,
            audio_pos_embed_max_pos=20, audio_sampling_rate=16000,
            audio_hop_length=160, num_layers=2, caption_channels=24,
            rope_theta=10000.0, causal_offset=1)

HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]      # 24
AHS = TINY["audio_num_attention_heads"] * \
    TINY["audio_attention_head_dim"]                               # 16


def _tiny_state_dict(seed=0, cfg=None):
    cfg = cfg or TINY
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(n_out, n_in, generator=g) \
            * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    def ada(prefix, dim, n_mod):
        put(f"{prefix}.emb.timestep_embedder.linear_1", dim, 256)
        put(f"{prefix}.emb.timestep_embedder.linear_2", dim, dim)
        put(f"{prefix}.linear", n_mod * dim, dim)

    HS_ = cfg["num_attention_heads"] * cfg["attention_head_dim"]
    AHS_ = cfg["audio_num_attention_heads"] * cfg["audio_attention_head_dim"]
    put("proj_in", HS_, cfg["in_channels"])
    put("audio_proj_in", AHS_, cfg["audio_in_channels"])
    put("caption_projection.linear_1", HS_, cfg["caption_channels"])
    put("caption_projection.linear_2", HS_, HS_)
    put("audio_caption_projection.linear_1", AHS_,
        cfg["caption_channels"])
    put("audio_caption_projection.linear_2", AHS_, AHS_)
    ada("time_embed", HS_, 6)
    ada("audio_time_embed", AHS_, 6)
    ada("av_cross_attn_video_scale_shift", HS_, 4)
    ada("av_cross_attn_audio_scale_shift", AHS_, 4)
    ada("av_cross_attn_video_a2v_gate", HS_, 1)
    ada("av_cross_attn_audio_v2a_gate", AHS_, 1)
    sd["scale_shift_table"] = torch.randn(2, HS_, generator=g) / HS_ ** 0.5
    sd["audio_scale_shift_table"] = torch.randn(
        2, AHS_, generator=g) / AHS_ ** 0.5
    put("proj_out", cfg["out_channels"], HS_)
    put("audio_proj_out", cfg["audio_out_channels"], AHS_)
    for i in range(cfg["num_layers"]):
        p = f"transformer_blocks.{i}"

        def attn(stem, q_dim, kv_dim, inner, out_dim):
            put(f"{stem}.to_q", inner, q_dim)
            put(f"{stem}.to_k", inner, kv_dim)
            put(f"{stem}.to_v", inner, kv_dim)
            put(f"{stem}.to_out.0", out_dim, inner)
            sd[f"{stem}.norm_q.weight"] = torch.rand(
                inner, generator=g) + 0.5
            sd[f"{stem}.norm_k.weight"] = torch.rand(
                inner, generator=g) + 0.5

        attn(f"{p}.attn1", HS_, HS_, HS_, HS_)
        attn(f"{p}.audio_attn1", AHS_, AHS_, AHS_, AHS_)
        attn(f"{p}.attn2", HS_, cfg["cross_attention_dim"], HS_, HS_)
        attn(f"{p}.audio_attn2", AHS_, cfg["audio_cross_attention_dim"],
             AHS_, AHS_)
        attn(f"{p}.audio_to_video_attn", HS_, AHS_, AHS_, HS_)
        attn(f"{p}.video_to_audio_attn", AHS_, HS_, AHS_, AHS_)
        put(f"{p}.ff.net.0.proj", 4 * HS_, HS_)
        put(f"{p}.ff.net.2", HS_, 4 * HS_)
        put(f"{p}.audio_ff.net.0.proj", 4 * AHS_, AHS_)
        put(f"{p}.audio_ff.net.2", AHS_, 4 * AHS_)
        sd[f"{p}.scale_shift_table"] = torch.randn(
            6, HS_, generator=g) / HS_ ** 0.5
        sd[f"{p}.audio_scale_shift_table"] = torch.randn(
            6, AHS_, generator=g) / AHS_ ** 0.5
        sd[f"{p}.video_a2v_cross_attn_scale_shift_table"] = torch.randn(
            5, HS_, generator=g)
        sd[f"{p}.audio_a2v_cross_attn_scale_shift_table"] = torch.randn(
            5, AHS_, generator=g)
    return sd


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _rope(coords, dim, max_positions, theta=10000.0):
    ndims, n = coords.shape
    per = dim // (2 * ndims)
    base = torch.pow(torch.tensor(theta),
                     torch.linspace(0, 1, per, dtype=torch.float64)) \
        * math.pi / 2.0
    grid = torch.stack([torch.from_numpy(coords[i]) / max_positions[i]
                        for i in range(ndims)], dim=-1)
    freqs = (grid.unsqueeze(-1) * 2 - 1) * base
    freqs = freqs.transpose(-1, -2).flatten(1).float()
    cos = freqs.cos().repeat_interleave(2, dim=-1)
    sin = freqs.sin().repeat_interleave(2, dim=-1)
    pad = dim % (2 * ndims)
    if pad:
        cos = torch.cat([torch.ones(n, pad), cos], dim=-1)
        sin = torch.cat([torch.zeros(n, pad), sin], dim=-1)
    return cos, sin


def _apply_rope(x, rope):
    if rope is None:
        return x
    cos, sin = rope
    xr, xi = x.unflatten(2, (-1, 2)).unbind(-1)
    rot = torch.stack([-xi, xr], dim=-1).flatten(2)
    return x * cos[None] + rot * sin[None]


def _oracle_forward(sd, vid_np, aud_np, txt_np, atxt_np, t_np, dims,
                    audio_frames, fps=24.0):
    from vllm_omni_tpu.diffusion.ltx2 import (LTX2Config,
                                              ltx2_audio_coords,
                                              ltx2_video_coords)

    cfg = LTX2Config.from_json(TINY)
    T = torch.from_numpy
    vid, aud = T(vid_np).float(), T(aud_np).float()
    txt, atxt = T(txt_np).float(), T(atxt_np).float()
    tt = T(t_np).float() * 1000.0
    b = vid.shape[0]
    eps = 1e-6

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def sinusoid(v):
        half = 128
        freqs = torch.exp(-math.log(10000.0) *
                          torch.arange(half).float() / half)
        args = v[:, None] * freqs[None, :]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def ada(prefix, v):
        e = lin(sinusoid(v), f"{prefix}.emb.timestep_embedder.linear_1")
        e = lin(torch.nn.functional.silu(e),
                f"{prefix}.emb.timestep_embedder.linear_2")
        return lin(torch.nn.functional.silu(e), f"{prefix}.linear"), e

    def rms_nw(x):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps)

    def rms_w(x, wname):
        return rms_nw(x) * sd[wname].float()

    def attend(stem, q_in, kv_in, heads, q_rope, k_rope):
        q = rms_w(lin(q_in, f"{stem}.to_q"), f"{stem}.norm_q.weight")
        k = rms_w(lin(kv_in, f"{stem}.to_k"), f"{stem}.norm_k.weight")
        v = lin(kv_in, f"{stem}.to_v")
        q = _apply_rope(q, q_rope)
        k = _apply_rope(k, k_rope if k_rope is not None else q_rope)
        hd = q.shape[-1] // heads
        bq, tq = q.shape[0], q.shape[1]
        q = q.view(bq, tq, heads, hd).transpose(1, 2)
        k = k.view(bq, -1, heads, hd).transpose(1, 2)
        v = v.view(bq, -1, heads, hd).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(bq, tq, heads * hd)
        return lin(o, f"{stem}.to_out.0")

    def table_mod(table, temb, n):
        v = table[None, None].float() + temb.reshape(b, 1, n, -1)
        return [v[:, :, i] for i in range(n)]

    def caption(prefix, x):
        h = torch.nn.functional.gelu(lin(x, f"{prefix}.linear_1"),
                                     approximate="tanh")
        return lin(h, f"{prefix}.linear_2")

    vcoords = ltx2_video_coords(cfg, *dims, fps)
    acoords = ltx2_audio_coords(cfg, audio_frames)
    v_rope = _rope(vcoords, HS, (cfg.pos_embed_max_pos, cfg.base_height,
                                 cfg.base_width))
    a_rope = _rope(acoords, AHS, (cfg.audio_pos_embed_max_pos,))
    ca_max = max(cfg.pos_embed_max_pos, cfg.audio_pos_embed_max_pos)
    cav = _rope(vcoords[:1], cfg.audio_cross_attention_dim, (ca_max,))
    caa = _rope(acoords[:1], cfg.audio_cross_attention_dim, (ca_max,))

    x = lin(vid, "proj_in")
    xa = lin(aud, "audio_proj_in")
    temb, emb_t = ada("time_embed", tt)
    temb_a, emb_ta = ada("audio_time_embed", tt)
    ca_ss, _ = ada("av_cross_attn_video_scale_shift", tt)
    ca_ss_a, _ = ada("av_cross_attn_audio_scale_shift", tt)
    ca_g, _ = ada("av_cross_attn_video_a2v_gate", tt)
    ca_g_a, _ = ada("av_cross_attn_audio_v2a_gate", tt)
    txt_h = caption("caption_projection", txt)
    atxt_h = caption("audio_caption_projection", atxt)

    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        sh, sc, g, sh2, sc2, g2 = table_mod(
            sd[f"{p}.scale_shift_table"], temb, 6)
        h = rms_nw(x) * (1 + sc) + sh
        x = x + g * attend(f"{p}.attn1", h, h, 2, v_rope, None)
        ash, asc, ag, ash2, asc2, ag2 = table_mod(
            sd[f"{p}.audio_scale_shift_table"], temb_a, 6)
        ha = rms_nw(xa) * (1 + asc) + ash
        xa = xa + ag * attend(f"{p}.audio_attn1", ha, ha, 2, a_rope,
                              None)
        x = x + attend(f"{p}.attn2", rms_nw(x), txt_h, 2, None, None)
        xa = xa + attend(f"{p}.audio_attn2", rms_nw(xa), atxt_h, 2,
                         None, None)
        hv, ha = rms_nw(x), rms_nw(xa)
        vtab = sd[f"{p}.video_a2v_cross_attn_scale_shift_table"]
        atab = sd[f"{p}.audio_a2v_cross_attn_scale_shift_table"]
        va2v_sc, va2v_sh, vv2a_sc, vv2a_sh = table_mod(vtab[:4], ca_ss, 4)
        (a2v_gate,) = table_mod(vtab[4:], ca_g, 1)
        aa2v_sc, aa2v_sh, av2a_sc, av2a_sh = table_mod(atab[:4], ca_ss_a,
                                                       4)
        (v2a_gate,) = table_mod(atab[4:], ca_g_a, 1)
        x = x + a2v_gate * attend(
            f"{p}.audio_to_video_attn", hv * (1 + va2v_sc) + va2v_sh,
            ha * (1 + aa2v_sc) + aa2v_sh, 2, cav, caa)
        xa = xa + v2a_gate * attend(
            f"{p}.video_to_audio_attn", ha * (1 + av2a_sc) + av2a_sh,
            hv * (1 + vv2a_sc) + vv2a_sh, 2, caa, cav)

        def ff(xx, which):
            hh = torch.nn.functional.gelu(
                lin(xx, f"{p}.{which}.net.0.proj"), approximate="tanh")
            return lin(hh, f"{p}.{which}.net.2")

        x = x + g2 * ff(rms_nw(x) * (1 + sc2) + sh2, "ff")
        xa = xa + ag2 * ff(rms_nw(xa) * (1 + asc2) + ash2, "audio_ff")

    # output mod: table[None, None] + embedded_timestep[:, :, None]
    ss = sd["scale_shift_table"][None, None].float() + \
        emb_t[:, None, None, :]
    shift, scale = ss[:, :, 0], ss[:, :, 1]
    x = torch.nn.functional.layer_norm(x, (HS,), eps=1e-6)
    x = x * (1 + scale) + shift
    out = lin(x, "proj_out")
    ssa = sd["audio_scale_shift_table"][None, None].float() + \
        emb_ta[:, None, None, :]
    ashift, ascale = ssa[:, :, 0], ssa[:, :, 1]
    xa = torch.nn.functional.layer_norm(xa, (AHS,), eps=1e-6)
    xa = xa * (1 + ascale) + ashift
    aout = lin(xa, "audio_proj_out")
    return out.numpy(), aout.numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor():
    cfg = LTX2Config.from_json(TINY)
    params = init_ltx2_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    sd = _tiny_state_dict()
    unmapped = [nm for nm, t in sd.items()
                if not assign_ltx2_tensor(params, nm, t.numpy(),
                                          jnp.float32)]
    assert unmapped == []


def test_forward_parity_vs_torch_oracle_both_streams():
    cfg = LTX2Config.from_json(TINY)
    params = init_ltx2_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    sd = _tiny_state_dict()
    for nm, t in sd.items():
        assert assign_ltx2_tensor(params, nm, t.numpy(), jnp.float32)

    rng = np.random.default_rng(3)
    dims = (2, 3, 4)  # latent (frames, height, width) → 24 video tokens
    audio_frames = 5
    vid = rng.standard_normal((2, 24, TINY["in_channels"]),
                              dtype=np.float32)
    aud = rng.standard_normal((2, 5, TINY["audio_in_channels"]),
                              dtype=np.float32)
    txt = rng.standard_normal((2, 6, TINY["caption_channels"]),
                              dtype=np.float32)
    atxt = rng.standard_normal((2, 6, TINY["caption_channels"]),
                               dtype=np.float32)
    t = np.asarray([0.7, 0.3], np.float32)
    ours_v, ours_a = ltx2_forward(
        params, cfg, jnp.asarray(vid), jnp.asarray(aud),
        jnp.asarray(txt), jnp.asarray(atxt), jnp.asarray(t), dims,
        audio_frames)
    gold_v, gold_a = _oracle_forward(sd, vid, aud, txt, atxt, t, dims,
                                     audio_frames)
    np.testing.assert_allclose(np.asarray(ours_v), gold_v, rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours_a), gold_a, rtol=2e-4,
                               atol=2e-4)


def test_loader_dispatches_ltx2(tmp_path):
    import json as _json

    from safetensors.torch import save_file

    from vllm_omni_tpu.diffusion.loader import load_transformer

    root = tmp_path / "ltx2"
    (root / "transformer").mkdir(parents=True)
    with open(root / "transformer" / "config.json", "w") as f:
        _json.dump({"_class_name": "LTX2VideoTransformer3DModel",
                    **TINY}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    family, cfg, params = load_transformer(str(root), dtype=jnp.float32)
    assert family == "ltx2"
    assert cfg.num_layers == 2 and cfg.audio_inner_dim == AHS


def test_pipeline_end_to_end_joint_av(tmp_path):
    """DiffusionEngine drives the LTX2 joint audio-video denoise loop
    from a diffusers-format dir: both streams advance per step and the
    video decodes through the VAE."""
    import json as _json

    from safetensors.torch import save_file

    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    root = tmp_path / "ltx2_pipe"
    (root / "transformer").mkdir(parents=True)
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    tiny = dict(TINY, in_channels=4, out_channels=4)
    with open(root / "model_index.json", "w") as f:
        _json.dump({"_class_name": "LTX2Pipeline",
                    "transformer": ["diffusers",
                                    "LTX2VideoTransformer3DModel"],
                    "scheduler": ["diffusers",
                                  "FlowMatchEulerDiscreteScheduler"],
                    "vae": ["diffusers", "AutoencoderKLLTXVideo"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        _json.dump({"_class_name": "LTX2VideoTransformer3DModel",
                    **tiny}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        _json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                    "num_train_timesteps": 1000, "shift": 1.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        _json.dump({"_class_name": "AutoencoderKLLTXVideo",
                    "latent_channels": 4, "block_out_channels": [16]}, f)

    # regenerate the state dict at the 4-channel video width
    sd = _tiny_state_dict(cfg=tiny)
    save_file(sd, str(root / "transformer" /
                      "diffusion_pytorch_model.safetensors"))

    config = DiffusionConfig(model=str(root), dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    out = eng.generate([DiffusionRequest(
        "r0", "a talking dog", DiffusionSamplingParams(
            num_inference_steps=2, height=32, width=32, num_frames=2,
            guidance_scale=4.0, seed=0, output_type="latent"))])[0]
    assert out.error is None, out.error
    lat = np.asarray(out.video)
    assert lat.shape[1] == 2  # frames preserved
    assert np.isfinite(lat).all()
    # the joint audio stream rode along and was denoised
    assert out.audio is not None and np.isfinite(out.audio).all()
