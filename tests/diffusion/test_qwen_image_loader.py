"""QwenImage real-geometry family + diffusers-format loader tests.

The checkpoint fixture is written in the genuine diffusers layout
(model_index.json, transformer/config.json, sharded safetensors with
diffusion_pytorch_model.safetensors.index.json, torch [out, in] Linear
weights under the diffusers module names the reference's load_weights
consumes — qwen_image_transformer.py:1159). The numeric oracle is an
independent torch re-implementation of the diffusers block semantics
(AdaLN shift/scale/gate chunking :800-818, QwenEmbedRope scale_rope
centering :324-424, AdaLayerNormContinuous scale-first final norm),
so transpose/naming/packing mistakes in the JAX side cannot cancel out.
"""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.qwen_image import (  # noqa: E402
    QwenImageConfig, pack_latents, qwen_image_forward, qwen_image_rope,
    unpack_latents)

# tiny real-shaped geometry: head_dim 32 = 8+12+12 rope axes
TINY = dict(patch_size=2, in_channels=16, out_channels=4, num_layers=2,
            attention_head_dim=32, num_attention_heads=2,
            joint_attention_dim=48, axes_dims_rope=[8, 12, 12])


def _tiny_state_dict(seed=0):
    """Diffusers-named torch state dict for the TINY geometry."""
    g = torch.Generator().manual_seed(seed)
    hs = TINY["num_attention_heads"] * TINY["attention_head_dim"]
    qk = hs
    mlp = hs * 4
    hd = TINY["attention_head_dim"]

    def lin(n_out, n_in):
        return (torch.randn(n_out, n_in, generator=g) * (n_in ** -0.5),
                torch.randn(n_out, generator=g) * 0.02)

    sd = {}

    def put(prefix, n_out, n_in):
        w, b = lin(n_out, n_in)
        sd[f"{prefix}.weight"] = w
        sd[f"{prefix}.bias"] = b

    put("img_in", hs, TINY["in_channels"])
    put("txt_in", hs, TINY["joint_attention_dim"])
    sd["txt_norm.weight"] = torch.rand(TINY["joint_attention_dim"],
                                       generator=g) + 0.5
    put("time_text_embed.timestep_embedder.linear_1", hs, 256)
    put("time_text_embed.timestep_embedder.linear_2", hs, hs)
    put("norm_out.linear", 2 * hs, hs)
    put("proj_out", TINY["patch_size"] ** 2 * TINY["out_channels"], hs)
    for i in range(TINY["num_layers"]):
        p = f"transformer_blocks.{i}"
        put(f"{p}.img_mod.1", 6 * hs, hs)
        put(f"{p}.txt_mod.1", 6 * hs, hs)
        for name in ("to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
                     "add_v_proj"):
            put(f"{p}.attn.{name}", qk, hs)
        put(f"{p}.attn.to_out.0", hs, qk)  # diffusers ModuleList wrap
        put(f"{p}.attn.to_add_out", hs, qk)
        for name in ("norm_q", "norm_k", "norm_added_q", "norm_added_k"):
            sd[f"{p}.attn.{name}.weight"] = torch.rand(hd, generator=g) \
                + 0.5
        put(f"{p}.img_mlp.net.0.proj", mlp, hs)
        put(f"{p}.img_mlp.net.2", hs, mlp)
        put(f"{p}.txt_mlp.net.0.proj", mlp, hs)
        put(f"{p}.txt_mlp.net.2", hs, mlp)
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    """Write a tiny diffusers pipeline dir: sharded transformer +
    scheduler + vae configs."""
    root = tmp_path_factory.mktemp("qwen_image_tiny")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()

    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "QwenImagePipeline",
                   "transformer": ["diffusers",
                                   "QwenImageTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKLQwenImage"],
                   "text_encoder": ["transformers",
                                    "Qwen2_5_VLForConditionalGeneration"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "QwenImageTransformer2DModel",
                   **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 2.2,
                   "use_dynamic_shifting": False}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLQwenImage", "z_dim": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)

    sd = _tiny_state_dict()
    # split into 2 shards to exercise the index path
    names = sorted(sd)
    half = len(names) // 2
    shards = {"diffusion_pytorch_model-00001-of-00002.safetensors":
              {k: sd[k] for k in names[:half]},
              "diffusion_pytorch_model-00002-of-00002.safetensors":
              {k: sd[k] for k in names[half:]}}
    weight_map = {}
    for fname, tensors in shards.items():
        save_file(tensors, str(root / "transformer" / fname))
        for k in tensors:
            weight_map[k] = fname
    with open(root / "transformer" /
              "diffusion_pytorch_model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle (diffusers semantics re-derived)
# ---------------------------------------------------------------------------


def _oracle_rope(cfg, h_tok, w_tok, txt_len, cond_hw=None):
    """QwenEmbedRope(scale_rope=True) via torch.polar, the reference's
    own pos/neg-index construction."""
    out = []
    for pos_fn in (lambda d: torch.cat([
            torch.arange(-(h_tok - h_tok // 2), h_tok // 2).float()
            if d == 1 else torch.empty(0)]),):
        del pos_fn
        break
    axes = cfg["axes_dims_rope"]

    def rope_params(index, dim):
        freqs = torch.outer(index.float(), 1.0 / torch.pow(
            torch.tensor(10000.0),
            torch.arange(0, dim, 2).float() / dim))
        return torch.polar(torch.ones_like(freqs), freqs)

    h_pos = torch.arange(-(h_tok - h_tok // 2), h_tok // 2).float()
    w_pos = torch.arange(-(w_tok - w_tok // 2), w_tok // 2).float()
    f_t = rope_params(torch.zeros(1), axes[0]).view(1, 1, 1, -1) \
        .expand(1, h_tok, w_tok, -1)
    f_h = rope_params(h_pos, axes[1]).view(1, h_tok, 1, -1) \
        .expand(1, h_tok, w_tok, -1)
    f_w = rope_params(w_pos, axes[2]).view(1, 1, w_tok, -1) \
        .expand(1, h_tok, w_tok, -1)
    vid = torch.cat([f_t, f_h, f_w], dim=-1).reshape(h_tok * w_tok, -1)

    start = max(h_tok // 2, w_tok // 2)
    if cond_hw is not None:
        start = max(start, cond_hw[0] // 2, cond_hw[1] // 2)
    tpos = torch.arange(start, start + txt_len).float()
    txt = torch.cat([rope_params(tpos, d) for d in axes], dim=-1)
    parts = [txt, vid]
    if cond_hw is not None:
        # Edit condition image: frame position -1
        # (QwenEmbedRope._compute_condition_freqs neg_freqs[-1])
        ch, cw = cond_hw
        ch_pos = torch.arange(-(ch - ch // 2), ch // 2).float()
        cw_pos = torch.arange(-(cw - cw // 2), cw // 2).float()
        f_t = rope_params(torch.tensor([-1.0]), axes[0]).view(
            1, 1, 1, -1).expand(1, ch, cw, -1)
        f_h = rope_params(ch_pos, axes[1]).view(1, ch, 1, -1).expand(
            1, ch, cw, -1)
        f_w = rope_params(cw_pos, axes[2]).view(1, 1, cw, -1).expand(
            1, ch, cw, -1)
        parts.append(torch.cat([f_t, f_h, f_w], dim=-1).reshape(
            ch * cw, -1))
    out = torch.cat(parts, dim=0)
    return out


def _oracle_apply_rope(x, freqs):
    """Interleaved (is_neox_style=False) complex rotation."""
    b, t, h, d = x.shape
    xc = torch.view_as_complex(
        x.float().reshape(b, t, h, d // 2, 2))
    out = xc * freqs[None, :, None, :]
    return torch.view_as_real(out).reshape(b, t, h, d)


def _oracle_forward(sd, cfg, latents_np, txt_np, t_np, cond_np=None):
    """Full transformer forward in torch from the raw state dict."""
    T = torch.from_numpy
    lat, txt, tt = T(latents_np).float(), T(txt_np).float(), T(t_np).float()
    p = cfg["patch_size"]
    b, h, w, c = lat.shape
    nh, hd = cfg["num_attention_heads"], cfg["attention_head_dim"]
    hs = nh * hd
    eps = 1e-6

    def lin(x, name):
        return x @ sd[f"{name}.weight"].float().T + sd[f"{name}.bias"].float()

    # diffusers _pack_latents: BCHW view → (0,2,4,1,3,5) permute.
    # Our test tensors are NHWC; go through NCHW to match exactly.
    def pack(z):
        bb, hh, ww, cc = z.shape
        zz = z.permute(0, 3, 1, 2).view(bb, cc, hh // p, p, ww // p, p)
        return zz.permute(0, 2, 4, 1, 3, 5).reshape(
            bb, (hh // p) * (ww // p), cc * p * p)

    img = pack(lat)
    n_target = img.shape[1]
    cond_hw = None
    if cond_np is not None:
        cond = T(cond_np).float()
        cond_hw = (cond.shape[1] // p, cond.shape[2] // p)
        img = torch.cat([img, pack(cond)], dim=1)
    img = lin(img, "img_in")
    tn = txt * (sd["txt_norm.weight"].float() /
                torch.sqrt((txt ** 2).mean(-1, keepdim=True) + eps))
    # RMSNorm: x / rms * weight
    tn = txt / torch.sqrt((txt ** 2).mean(-1, keepdim=True) + eps) \
        * sd["txt_norm.weight"].float()
    txt_h = lin(tn, "txt_in")

    # timestep embedding: scale=1000, flip_sin_to_cos → [cos | sin]
    half = 128
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float()
                      / half)
    args = 1000.0 * tt[:, None] * freqs[None, :]
    te = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    te = lin(te, "time_text_embed.timestep_embedder.linear_1")
    te = lin(torch.nn.functional.silu(te),
             "time_text_embed.timestep_embedder.linear_2")

    fr = _oracle_rope(cfg, h // p, w // p, txt.shape[1],
                      cond_hw=cond_hw)

    def rms(x, wname):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * sd[wname].float()

    def ada(x, shift, scale):
        xn = torch.nn.functional.layer_norm(x, (x.shape[-1],), eps=eps)
        return xn * (1 + scale[:, None]) + shift[:, None]

    tv, ttk = img.shape[1], txt_h.shape[1]
    x_img, x_txt = img, txt_h
    for i in range(cfg["num_layers"]):
        pref = f"transformer_blocks.{i}"
        st = torch.nn.functional.silu(te)
        imod = lin(st, f"{pref}.img_mod.1")
        tmod = lin(st, f"{pref}.txt_mod.1")
        # chunk(2) then chunk(3): [shift, scale, gate] per half
        im1, im2 = imod.chunk(2, -1)
        tm1, tm2 = tmod.chunk(2, -1)
        ish1, isc1, ig1 = im1.chunk(3, -1)
        tsh1, tsc1, tg1 = tm1.chunk(3, -1)

        img_n = ada(x_img, ish1, isc1)
        txt_n = ada(x_txt, tsh1, tsc1)

        def qkv(x, pfx, n):
            return (lin(x, f"{pref}.attn.{pfx}{s}").view(b, n, nh, hd)
                    for s in ("q", "k", "v"))

        iq, ik, iv = (lin(img_n, f"{pref}.attn.to_{s}").view(b, tv, nh, hd)
                      for s in "qkv")
        tq, tk, tvv = (lin(txt_n, f"{pref}.attn.add_{s}_proj")
                       .view(b, ttk, nh, hd) for s in "qkv")
        iq = rms(iq, f"{pref}.attn.norm_q.weight")
        ik = rms(ik, f"{pref}.attn.norm_k.weight")
        tq = rms(tq, f"{pref}.attn.norm_added_q.weight")
        tk = rms(tk, f"{pref}.attn.norm_added_k.weight")

        q = torch.cat([tq, iq], dim=1)
        k = torch.cat([tk, ik], dim=1)
        v = torch.cat([tvv, iv], dim=1)
        q = _oracle_apply_rope(q, fr)
        k = _oracle_apply_rope(k, fr)

        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
        o = o.transpose(1, 2).reshape(b, ttk + tv, hs)
        txt_o = lin(o[:, :ttk], f"{pref}.attn.to_add_out")
        img_o = lin(o[:, ttk:], f"{pref}.attn.to_out.0")
        x_img = x_img + ig1[:, None] * img_o
        x_txt = x_txt + tg1[:, None] * txt_o

        ish2, isc2, ig2 = im2.chunk(3, -1)
        tsh2, tsc2, tg2 = tm2.chunk(3, -1)

        def ff(x, which):
            hdn = lin(x, f"{pref}.{which}.net.0.proj")
            hdn = torch.nn.functional.gelu(hdn, approximate="tanh")
            return lin(hdn, f"{pref}.{which}.net.2")

        x_img = x_img + ig2[:, None] * ff(ada(x_img, ish2, isc2),
                                          "img_mlp")
        x_txt = x_txt + tg2[:, None] * ff(ada(x_txt, tsh2, tsc2),
                                          "txt_mlp")

    # AdaLayerNormContinuous: scale FIRST
    fin = lin(torch.nn.functional.silu(te), "norm_out.linear")
    sc, sh = fin[:, :hs], fin[:, hs:]
    out = ada(x_img, sh, sc)
    out = lin(out, "proj_out")[:, :n_target]  # [B, Tv, out*p*p]
    # unpack (inverse of diffusers packing) → NHWC
    oc = cfg["out_channels"]
    out = out.view(b, h // p, w // p, oc, p, p)
    out = out.permute(0, 3, 1, 4, 2, 5).reshape(b, oc, h, w)
    return out.permute(0, 2, 3, 1).numpy()  # NHWC


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "qwen_image"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, QwenImageConfig)
    assert cfg.num_layers == 2 and cfg.attention_head_dim == 32
    assert loaded["scheduler"]["flow_shift"] == 2.2
    assert loaded["vae"]["latent_channels"] == 4
    assert loaded["vae"]["scale_factor"] == 8
    # every checkpoint tensor must land in the pytree (count leaves that
    # differ from random init is implicit in the parity test; here check
    # the mapping is total)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.qwen_image import (
        assign_qwen_image_tensor, init_qwen_image_params)
    params = init_qwen_image_params(cfg, jax.random.PRNGKey(0),
                                    jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_qwen_image_tensor(params, n, t.numpy(),
                                                jnp.float32)]
    assert unmapped == []


def test_forward_parity_vs_torch_oracle(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]

    rng = np.random.default_rng(7)
    lat = rng.standard_normal((2, 8, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((2, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.7, 0.3], np.float32)

    ours = np.asarray(qwen_image_forward(params, cfg, jnp.asarray(lat),
                                         jnp.asarray(txt),
                                         jnp.asarray(t)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, t)
    assert ours.shape == golden.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_rope_matches_polar_reference():
    cfg = QwenImageConfig.from_json(TINY)
    cos, sin = qwen_image_rope(cfg, h_tokens=6, w_tokens=4, txt_len=3)
    fr = _oracle_rope(TINY, 6, 4, 3)
    np.testing.assert_allclose(np.asarray(cos), fr.real.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), fr.imag.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_pack_unpack_roundtrip_channel_major():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 16), dtype=np.float32))
    packed = pack_latents(x, 2)
    assert packed.shape == (1, 6, 64)
    # channel-major: first 4 features of a patch are channel 0's 2x2
    got = np.asarray(packed)[0, 0, :4]
    want = np.asarray(x)[0, :2, :2, 0].reshape(-1)
    np.testing.assert_allclose(got, want)
    back = unpack_latents(packed, 4, 6, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_pipeline_end_to_end_with_diffusers_dir(pipeline_dir):
    """DiffusionPipeline loads the dir and denoises an image."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    # scheduler knobs adopted from the checkpoint
    assert eng.pipeline.config.flow_shift == 2.2
    assert eng.pipeline.config.vae_latent_channels == 4
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny test image",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=2.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None
    assert out.images.shape == (1, 32, 32, 3)


def test_edit_cond_conditioning_parity(pipeline_dir):
    """QwenImageEdit: a condition image's latents append to the image
    stream with frame-position -1 rope ids and drop from the
    prediction (pipeline_qwen_image_edit.py:757 img_shapes +
    QwenEmbedRope._compute_condition_freqs)."""
    import numpy as np

    from vllm_omni_tpu.diffusion.qwen_image import qwen_image_forward

    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(23)
    lat = rng.standard_normal((1, 8, 8, 4), dtype=np.float32)
    cond = rng.standard_normal((1, 12, 8, 4), dtype=np.float32)
    txt = rng.standard_normal((1, 5, TINY["joint_attention_dim"]),
                              dtype=np.float32)
    t = np.asarray([0.35], np.float32)
    ours = np.asarray(qwen_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(t),
        cond_latents=jnp.asarray(cond)))
    golden = _oracle_forward(_tiny_state_dict(), TINY, lat, txt, t,
                             cond_np=cond)
    assert ours.shape == golden.shape == lat.shape
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)
    base = np.asarray(qwen_image_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t)))
    assert np.abs(ours - base).max() > 1e-4
