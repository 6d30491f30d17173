"""HunyuanVideo-1.5 real-geometry family + diffusers loader tests.

Same method as test_wan_loader.py: genuine diffusers checkpoint layout
(HunyuanVideo15Transformer3DModel naming — token_refiner context
embedder, ByT5/image projections, cond_type_embed, dual-stream blocks
with add_*_proj), independent torch oracle re-deriving the reference
semantics (diffusion/models/hunyuan_video/
hunyuan_video_15_transformer.py:533 + pipeline :458)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.hunyuan_video import (  # noqa: E402
    HunyuanVideoConfig, hunyuan_video_forward, hunyuan_video_rope)
from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)

TINY = dict(in_channels=9, out_channels=4, num_attention_heads=2,
            attention_head_dim=24, num_layers=2, num_refiner_layers=1,
            mlp_ratio=2.0, patch_size=1, patch_size_t=1,
            text_embed_dim=32, text_embed_2_dim=16, image_embed_dim=12,
            rope_theta=256.0, rope_axes_dim=[8, 8, 8],
            use_meanflow=False)
HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]
MLP = int(HS * TINY["mlp_ratio"])


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    def put_ln(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(n, generator=g) * 0.02

    sd["x_embedder.proj.weight"] = torch.randn(
        HS, TINY["in_channels"], 1, 1, 1, generator=g) * 0.1
    sd["x_embedder.proj.bias"] = torch.randn(HS, generator=g) * 0.02
    put_ln("image_embedder.norm_in", TINY["image_embed_dim"])
    put("image_embedder.linear_1", TINY["image_embed_dim"],
        TINY["image_embed_dim"])
    put("image_embedder.linear_2", HS, TINY["image_embed_dim"])
    put_ln("image_embedder.norm_out", HS)
    tte = "context_embedder.time_text_embed"
    put(f"{tte}.timestep_embedder.linear_1", HS, 256)
    put(f"{tte}.timestep_embedder.linear_2", HS, HS)
    put(f"{tte}.text_embedder.linear_1", HS, TINY["text_embed_dim"])
    put(f"{tte}.text_embedder.linear_2", HS, HS)
    put("context_embedder.proj_in", HS, TINY["text_embed_dim"])
    for i in range(TINY["num_refiner_layers"]):
        p = f"context_embedder.token_refiner.refiner_blocks.{i}"
        put_ln(f"{p}.norm1", HS)
        for nm in ("to_q", "to_k", "to_v"):
            put(f"{p}.attn.{nm}", HS, HS)
        put(f"{p}.attn.to_out.0", HS, HS)
        put_ln(f"{p}.norm2", HS)
        put(f"{p}.ff.net.0.proj", 4 * HS, HS)  # refiner mlp_ratio 4.0
        put(f"{p}.ff.net.2", HS, 4 * HS)
        put(f"{p}.norm_out.linear", 2 * HS, HS)
    put_ln("context_embedder_2.norm", TINY["text_embed_2_dim"])
    put("context_embedder_2.linear_1", 2048, TINY["text_embed_2_dim"])
    put("context_embedder_2.linear_2", 2048, 2048)
    put("context_embedder_2.linear_3", HS, 2048)
    put("time_embed.timestep_embedder.linear_1", HS, 256)
    put("time_embed.timestep_embedder.linear_2", HS, HS)
    sd["cond_type_embed.weight"] = torch.randn(3, HS, generator=g) * 0.1
    put("norm_out.linear", 2 * HS, HS)
    put("proj_out", TINY["out_channels"], HS)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        put(f"{p}.norm1.linear", 6 * HS, HS)
        put(f"{p}.norm1_context.linear", 6 * HS, HS)
        for nm in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                   "add_v_proj", "to_add_out"):
            put(f"{p}.attn.{nm}", HS, HS)
        put(f"{p}.attn.to_out.0", HS, HS)
        for nm in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{nm}.weight"] = torch.rand(
                TINY["attention_head_dim"], generator=g) + 0.5
        put(f"{p}.ff.net.0.proj", MLP, HS)
        put(f"{p}.ff.net.2", HS, MLP)
        put(f"{p}.ff_context.net.0.proj", MLP, HS)
        put(f"{p}.ff_context.net.2", HS, MLP)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("hv15_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "HunyuanVideo15Pipeline",
                   "transformer": ["diffusers",
                                   "HunyuanVideo15Transformer3DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKLHunyuanVideo15"],
                   "text_encoder": ["transformers", "Qwen2_5_VLModel"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "HunyuanVideo15Transformer3DModel",
                   **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 7.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLHunyuanVideo15",
                   "latent_channels": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_rope(f_tok, h_tok, w_tok):
    """Per-axis plain grid positions, theta 256, dims (8, 8, 8)."""
    dims = TINY["rope_axes_dim"]
    grids = torch.meshgrid(torch.arange(f_tok), torch.arange(h_tok),
                           torch.arange(w_tok), indexing="ij")
    outs = []
    for grid, dim in zip(grids, dims):
        inv = 1.0 / torch.pow(torch.tensor(TINY["rope_theta"]),
                              torch.arange(0, dim, 2).float() / dim)
        fr = torch.outer(grid.reshape(-1).float(), inv)
        outs.append(torch.polar(torch.ones_like(fr), fr))
    return torch.cat(outs, dim=-1)


def _oracle_apply_rope(x, freqs):
    b, t, h, d = x.shape
    xc = torch.view_as_complex(x.float().reshape(b, t, h, d // 2, 2))
    return torch.view_as_real(xc * freqs[None, :, None, :]).reshape(
        b, t, h, d)


def _sin_embed(t, dim=256):
    half = dim // 2
    freqs = torch.exp(-torch.log(torch.tensor(10000.0)) *
                      torch.arange(half).float() / half)
    args = t[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


def _masked_sdpa(q, k, v, key_mask=None):
    """[B, T, H, D] inputs; key_mask [B, S] bool."""
    attn_mask = None
    if key_mask is not None:
        attn_mask = key_mask[:, None, None, :]
    o = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
        attn_mask=attn_mask)
    return o.transpose(1, 2)


def _oracle_forward(sd, lat_np, txt_np, t_np, txt_mask_np, txt2_np,
                    txt2_mask_np, img_np, img_mask_np):
    T = torch.from_numpy
    lat = T(lat_np).float()
    txt, txt2, img = T(txt_np).float(), T(txt2_np).float(), \
        T(img_np).float()
    mask1 = T(txt_mask_np).bool()
    mask2 = T(txt2_mask_np).bool()
    mask3 = T(img_mask_np).bool()
    t_train = T(t_np).float() * 1000.0
    b, f, h, w, c = lat.shape
    nh, hd = TINY["num_attention_heads"], TINY["attention_head_dim"]

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + \
            sd[f"{name}.bias"].float()

    def ln(x, name=None):
        out = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=1e-6)
        if name is not None:
            out = out * sd[f"{name}.weight"].float() + \
                sd[f"{name}.bias"].float()
        return out

    def rms_head(x, name):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + 1e-6) \
            * sd[name].float()

    # 65-channel model input: [latent, zeros cond, zero mask]
    x_in = torch.cat([lat, torch.zeros_like(lat),
                      torch.zeros(b, f, h, w, 1)], dim=-1)
    xw = sd["x_embedder.proj.weight"].float()  # [HS, C, 1, 1, 1]
    x = torch.nn.functional.conv3d(
        x_in.permute(0, 4, 1, 2, 3), xw, sd["x_embedder.proj.bias"]
        .float(), stride=(1, 1, 1)).flatten(2).transpose(1, 2)

    temb = lin(_sin_embed(t_train), "time_embed.timestep_embedder"
               ".linear_1")
    temb = lin(torch.nn.functional.silu(temb),
               "time_embed.timestep_embedder.linear_2")

    # token refiner
    tte = "context_embedder.time_text_embed"
    mf = mask1.float().unsqueeze(-1)
    pooled = (txt * mf).sum(1) / mf.sum(1)
    rtemb = lin(_sin_embed(t_train), f"{tte}.timestep_embedder.linear_1")
    rtemb = lin(torch.nn.functional.silu(rtemb),
                f"{tte}.timestep_embedder.linear_2")
    pe = lin(pooled, f"{tte}.text_embedder.linear_1")
    rtemb = rtemb + lin(torch.nn.functional.silu(pe),
                        f"{tte}.text_embedder.linear_2")
    ctx1 = lin(txt, "context_embedder.proj_in")
    for i in range(TINY["num_refiner_layers"]):
        p = f"context_embedder.token_refiner.refiner_blocks.{i}"
        s = ctx1.shape[1]
        xn = ln(ctx1, f"{p}.norm1")
        q = lin(xn, f"{p}.attn.to_q").view(b, s, nh, hd)
        k = lin(xn, f"{p}.attn.to_k").view(b, s, nh, hd)
        v = lin(xn, f"{p}.attn.to_v").view(b, s, nh, hd)
        o = _masked_sdpa(q, k, v, mask1).reshape(b, s, nh * hd)
        attn_out = lin(o, f"{p}.attn.to_out.0")
        gates = lin(torch.nn.functional.silu(rtemb),
                    f"{p}.norm_out.linear")
        g_msa, g_mlp = gates.chunk(2, dim=1)
        ctx1 = ctx1 + attn_out * g_msa.unsqueeze(1)
        ffh = torch.nn.functional.silu(
            lin(ln(ctx1, f"{p}.norm2"), f"{p}.ff.net.0.proj"))
        ctx1 = ctx1 + lin(ffh, f"{p}.ff.net.2") * g_mlp.unsqueeze(1)
    ct = sd["cond_type_embed.weight"].float()
    ctx1 = ctx1 + ct[0]

    # byt5
    h2 = ln(txt2, "context_embedder_2.norm")
    h2 = torch.nn.functional.gelu(lin(h2, "context_embedder_2.linear_1"))
    h2 = torch.nn.functional.gelu(lin(h2, "context_embedder_2.linear_2"))
    ctx2 = lin(h2, "context_embedder_2.linear_3") + ct[1]

    # image
    h3 = ln(img, "image_embedder.norm_in")
    h3 = torch.nn.functional.gelu(lin(h3, "image_embedder.linear_1"))
    h3 = ln(lin(h3, "image_embedder.linear_2"), "image_embedder.norm_out")
    ctx3 = h3 + ct[2]

    # reorder per reference :679-718
    new_e, new_m = [], []
    for i in range(b):
        e1, m1 = ctx1[i], mask1[i]
        e2, m2 = ctx2[i], mask2[i]
        e3, m3 = ctx3[i], mask3[i]
        new_e.append(torch.cat([
            e3[m3], e2[m2], e1[m1], e3[~m3],
            torch.zeros_like(e2[~m2]), torch.zeros_like(e1[~m1])]))
        new_m.append(torch.cat([m3[m3], m2[m2], m1[m1], m3[~m3],
                                m2[~m2], m1[~m1]]))
    ctx = torch.stack(new_e)
    cmask = torch.stack(new_m)

    fr = _oracle_rope(f, h, w)
    s_vid = x.shape[1]
    key_mask = torch.cat([torch.ones(b, s_vid, dtype=torch.bool), cmask],
                         dim=1)

    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        st = torch.nn.functional.silu(temb)
        m_v = lin(st, f"{p}.norm1.linear").view(b, 6, -1)
        m_c = lin(st, f"{p}.norm1_context.linear").view(b, 6, -1)
        xn = ln(x) * (1 + m_v[:, 1:2]) + m_v[:, 0:1]
        cn = ln(ctx) * (1 + m_c[:, 1:2]) + m_c[:, 0:1]
        sv, sc = xn.shape[1], cn.shape[1]
        q = rms_head(lin(xn, f"{p}.attn.to_q").view(b, sv, nh, hd),
                     f"{p}.attn.norm_q.weight")
        k = rms_head(lin(xn, f"{p}.attn.to_k").view(b, sv, nh, hd),
                     f"{p}.attn.norm_k.weight")
        v = lin(xn, f"{p}.attn.to_v").view(b, sv, nh, hd)
        q, k = _oracle_apply_rope(q, fr), _oracle_apply_rope(k, fr)
        cq = rms_head(lin(cn, f"{p}.attn.add_q_proj").view(b, sc, nh, hd),
                      f"{p}.attn.norm_added_q.weight")
        ck = rms_head(lin(cn, f"{p}.attn.add_k_proj").view(b, sc, nh, hd),
                      f"{p}.attn.norm_added_k.weight")
        cv = lin(cn, f"{p}.attn.add_v_proj").view(b, sc, nh, hd)
        q = torch.cat([q, cq], dim=1)
        k = torch.cat([k, ck], dim=1)
        v = torch.cat([v, cv], dim=1)
        o = _masked_sdpa(q, k, v, key_mask).reshape(b, sv + sc, nh * hd)
        x = x + m_v[:, 2:3] * lin(o[:, :sv], f"{p}.attn.to_out.0")
        ctx = ctx + m_c[:, 2:3] * lin(o[:, sv:], f"{p}.attn.to_add_out")
        xn2 = ln(x) * (1 + m_v[:, 4:5]) + m_v[:, 3:4]
        ffv = torch.nn.functional.gelu(
            lin(xn2, f"{p}.ff.net.0.proj"), approximate="tanh")
        x = x + m_v[:, 5:6] * lin(ffv, f"{p}.ff.net.2")
        cn2 = ln(ctx) * (1 + m_c[:, 4:5]) + m_c[:, 3:4]
        ffc = torch.nn.functional.gelu(
            lin(cn2, f"{p}.ff_context.net.0.proj"), approximate="tanh")
        ctx = ctx + m_c[:, 5:6] * lin(ffc, f"{p}.ff_context.net.2")

    fin = lin(torch.nn.functional.silu(temb), "norm_out.linear")
    scale, shift = fin.chunk(2, dim=1)
    out = ln(x) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
    out = lin(out, "proj_out")
    return out.reshape(b, f, h, w, TINY["out_channels"]).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "hunyuan_video"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, HunyuanVideoConfig)
    assert cfg.num_layers == 2 and cfg.latent_channels == 4
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.hunyuan_video import (
        assign_hunyuan_video_tensor, init_hunyuan_video_params)
    params = init_hunyuan_video_params(cfg, jax.random.PRNGKey(0),
                                       jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_hunyuan_video_tensor(params, n, t.numpy(),
                                                   jnp.float32)]
    assert unmapped == []


def test_forward_parity_three_sources(pipeline_dir):
    """All three context sources with partial masks — exercises the
    token refiner, ByT5/image projections, and the reorder."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]

    rng = np.random.default_rng(7)
    lat = rng.standard_normal((2, 2, 4, 4, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["text_embed_dim"]),
                              dtype=np.float32)
    txt_mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)
    txt2 = rng.standard_normal((2, 3, TINY["text_embed_2_dim"]),
                               dtype=np.float32)
    txt2_mask = np.array([[1, 0, 0], [1, 1, 0]], bool)
    img = rng.standard_normal((2, 2, TINY["image_embed_dim"]),
                              dtype=np.float32)
    img_mask = np.array([[0, 0], [1, 0]], bool)
    t = np.asarray([0.8, 0.25], np.float32)

    ours = np.asarray(hunyuan_video_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        text_mask=jnp.asarray(txt_mask), text_states_2=jnp.asarray(txt2),
        text_mask_2=jnp.asarray(txt2_mask),
        image_embeds=jnp.asarray(img),
        image_embeds_mask=jnp.asarray(img_mask)))
    golden = _oracle_forward(_tiny_state_dict(), lat, txt, t, txt_mask,
                             txt2, txt2_mask, img, img_mask)
    assert ours.shape == golden.shape == (2, 2, 4, 4, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_rope_matches_polar_reference():
    cfg = HunyuanVideoConfig.from_json(TINY)
    cos, sin = hunyuan_video_rope(cfg, 3, 2, 4)
    fr = _oracle_rope(3, 2, 4)
    np.testing.assert_allclose(np.asarray(cos), fr.real.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), fr.imag.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_t2v_defaults_match_explicit_zeros(pipeline_dir):
    """Serving path passes no ByT5/vision sources; the video output
    must equal the reference's explicit zero-embed + zero-mask call."""
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(3)
    lat = rng.standard_normal((1, 2, 4, 4, 4), dtype=np.float32)
    txt = rng.standard_normal((1, 4, TINY["text_embed_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.5], np.float32)
    ours = np.asarray(hunyuan_video_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t)))
    golden = _oracle_forward(
        _tiny_state_dict(), lat, txt, t,
        np.ones((1, 4), bool),
        np.zeros((1, 0, TINY["text_embed_2_dim"]), np.float32),
        np.zeros((1, 0), bool),
        np.zeros((1, 0, TINY["image_embed_dim"]), np.float32),
        np.zeros((1, 0), bool))
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_pipeline_end_to_end_video(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "hunyuan_video"
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny hunyuan test video",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, num_frames=2,
                                guidance_scale=3.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    assert out.video.shape[0] == 2
