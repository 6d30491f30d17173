"""WanVACE per-region context blocks (VERDICT r4 item 10).

The VACE variant adds vace_patch_embedding + vace_blocks conditioning
towers whose per-block proj_out hints inject into the main blocks
listed in vace_layers (reference wan2_2_vace_transformer.py:24-124,
forward :150; pipeline_wan2_2_vace.py prepare_video_latents /
prepare_masks). Parity vs an independent torch oracle, checkpoint
mapping coverage, and V2V/MV2V conditioning through the engine."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.diffusion.test_wan_loader import (  # noqa: E402
    TINY, _oracle_apply_rope, _oracle_rope, _tiny_state_dict)
from vllm_omni_tpu.diffusion.wan import (  # noqa: E402
    WanConfig, assign_wan_tensor, init_wan_params, wan_forward)

VACE_TINY = dict(TINY, vace_layers=[0], vace_in_channels=12)
HS = TINY["num_attention_heads"] * TINY["attention_head_dim"]


def _vace_state_dict(seed=0):
    sd = _tiny_state_dict(seed)
    g = torch.Generator().manual_seed(seed + 77)

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        sd[f"{prefix}.bias"] = torch.randn(n_out, generator=g) * 0.02

    pt, ph, pw = TINY["patch_size"]
    sd["vace_patch_embedding.weight"] = torch.randn(
        HS, VACE_TINY["vace_in_channels"], pt, ph, pw,
        generator=g) * 0.1
    sd["vace_patch_embedding.bias"] = torch.randn(
        HS, generator=g) * 0.02
    for j in range(len(VACE_TINY["vace_layers"])):
        p = f"vace_blocks.{j}"
        sd[f"{p}.scale_shift_table"] = torch.randn(
            1, 6, HS, generator=g) * HS ** -0.5
        for attn in ("attn1", "attn2"):
            for nm in ("to_q", "to_k", "to_v"):
                put(f"{p}.{attn}.{nm}", HS, HS)
            put(f"{p}.{attn}.to_out.0", HS, HS)
            for nm in ("norm_q", "norm_k"):
                sd[f"{p}.{attn}.{nm}.weight"] = torch.rand(
                    HS, generator=g) + 0.5
        sd[f"{p}.norm2.weight"] = torch.rand(HS, generator=g) + 0.5
        sd[f"{p}.norm2.bias"] = torch.randn(HS, generator=g) * 0.02
        put(f"{p}.ffn.net.0.proj", TINY["ffn_dim"], HS)
        put(f"{p}.ffn.net.2", HS, TINY["ffn_dim"])
        if j == 0:
            put(f"{p}.proj_in", HS, HS)
        put(f"{p}.proj_out", HS, HS)
    return sd


# ---------------------------------------------------------------------------
# Independent torch oracle (NCFHW internally, like the reference)
# ---------------------------------------------------------------------------


def _o_lin(sd, x, name):
    return x @ sd[f"{name}.weight"].float().T + sd[f"{name}.bias"].float()


def _o_block(sd, p, x, txt_h, tproj, fr, eps):
    b, s, hs = x.shape
    nh = TINY["num_attention_heads"]
    hd = TINY["attention_head_dim"]
    ttk = txt_h.shape[1]

    def rms_full(v, wname):
        return v / torch.sqrt((v ** 2).mean(-1, keepdim=True) + eps) \
            * sd[wname].float()

    def ln(v):
        return torch.nn.functional.layer_norm(v, (v.shape[-1],), eps=eps)

    mod = sd[f"{p}.scale_shift_table"].float() + tproj
    sh1, sc1, g1, sh2, sc2, g2 = mod.chunk(6, dim=1)
    xn = ln(x) * (1 + sc1) + sh1
    q = rms_full(_o_lin(sd, xn, f"{p}.attn1.to_q"),
                 f"{p}.attn1.norm_q.weight").view(b, s, nh, hd)
    k = rms_full(_o_lin(sd, xn, f"{p}.attn1.to_k"),
                 f"{p}.attn1.norm_k.weight").view(b, s, nh, hd)
    v = _o_lin(sd, xn, f"{p}.attn1.to_v").view(b, s, nh, hd)
    q = _oracle_apply_rope(q, fr)
    k = _oracle_apply_rope(k, fr)
    o = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
    x = x + g1 * _o_lin(sd, o.transpose(1, 2).reshape(b, s, hs),
                        f"{p}.attn1.to_out.0")
    xn2 = ln(x) * sd[f"{p}.norm2.weight"].float() + \
        sd[f"{p}.norm2.bias"].float()
    q = rms_full(_o_lin(sd, xn2, f"{p}.attn2.to_q"),
                 f"{p}.attn2.norm_q.weight").view(b, s, nh, hd)
    k = rms_full(_o_lin(sd, txt_h, f"{p}.attn2.to_k"),
                 f"{p}.attn2.norm_k.weight").view(b, ttk, nh, hd)
    v = _o_lin(sd, txt_h, f"{p}.attn2.to_v").view(b, ttk, nh, hd)
    o = torch.nn.functional.scaled_dot_product_attention(
        q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2))
    x = x + _o_lin(sd, o.transpose(1, 2).reshape(b, s, hs),
                   f"{p}.attn2.to_out.0")
    xn3 = ln(x) * (1 + sc2) + sh2
    ff = torch.nn.functional.gelu(
        _o_lin(sd, xn3, f"{p}.ffn.net.0.proj"), approximate="tanh")
    return x + g2 * _o_lin(sd, ff, f"{p}.ffn.net.2")


def _oracle_vace_forward(sd, cfg, lat_np, txt_np, t_np, vctx_np,
                         scale):
    T = torch.from_numpy
    lat = T(lat_np).float().permute(0, 4, 1, 2, 3)  # B C F H W
    vctx = T(vctx_np).float().permute(0, 4, 1, 2, 3)
    txt, tt = T(txt_np).float(), T(t_np).float()
    pt, ph, pw = cfg["patch_size"]
    b, c, f, h, w = lat.shape
    eps = cfg["eps"]

    x = torch.nn.functional.conv3d(
        lat, sd["patch_embedding.weight"].float(),
        sd["patch_embedding.bias"].float(), stride=(pt, ph, pw))
    x = x.flatten(2).transpose(1, 2)
    ctrl = torch.nn.functional.conv3d(
        vctx, sd["vace_patch_embedding.weight"].float(),
        sd["vace_patch_embedding.bias"].float(), stride=(pt, ph, pw))
    ctrl = ctrl.flatten(2).transpose(1, 2)

    t_train = tt.reshape(-1) * 1000.0
    half = cfg["freq_dim"] // 2
    freqs = torch.exp(-torch.log(torch.tensor(10000.0)) *
                      torch.arange(half).float() / half)
    args = t_train[:, None] * freqs[None, :]
    te = torch.cat([torch.cos(args), torch.sin(args)], dim=-1)
    temb = _o_lin(sd, te, "condition_embedder.time_embedder.linear_1")
    temb = _o_lin(sd, torch.nn.functional.silu(temb),
                  "condition_embedder.time_embedder.linear_2")
    tproj = _o_lin(sd, torch.nn.functional.silu(temb),
                   "condition_embedder.time_proj").view(b, 6, HS)
    txt_h = _o_lin(sd, txt, "condition_embedder.text_embedder.linear_1")
    txt_h = torch.nn.functional.gelu(txt_h, approximate="tanh")
    txt_h = _o_lin(sd, txt_h,
                   "condition_embedder.text_embedder.linear_2")
    fr = _oracle_rope(cfg["attention_head_dim"], f // pt, h // ph,
                      w // pw)

    # VACE hint towers (wan2_2_vace_transformer.py:41-63)
    hints = []
    for j in range(len(cfg["vace_layers"])):
        p = f"vace_blocks.{j}"
        if j == 0:
            ctrl = _o_lin(sd, ctrl, f"{p}.proj_in") + x
        ctrl = _o_block(sd, p, ctrl, txt_h, tproj, fr, eps)
        hints.append(_o_lin(sd, ctrl, f"{p}.proj_out"))

    mapping = {li: vi for vi, li in enumerate(cfg["vace_layers"])}
    for i in range(cfg["num_layers"]):
        x = _o_block(sd, f"blocks.{i}", x, txt_h, tproj, fr, eps)
        if i in mapping:
            x = x + hints[mapping[i]] * scale

    def ln(v):
        return torch.nn.functional.layer_norm(v, (v.shape[-1],), eps=eps)

    fin = sd["scale_shift_table"].float() + temb.unsqueeze(1)
    shift, fscale = fin.chunk(2, dim=1)
    out = ln(x) * (1 + fscale) + shift
    out = _o_lin(sd, out, "proj_out")
    oc = cfg["out_channels"]
    out = out.reshape(b, f // pt, h // ph, w // pw, pt, ph, pw, oc)
    out = out.permute(0, 7, 1, 4, 2, 5, 3, 6)
    out = out.flatten(6, 7).flatten(4, 5).flatten(2, 3)
    return out.permute(0, 2, 3, 4, 1).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def _jax_params(sd, cfg):
    params = init_wan_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_wan_tensor(params, n, t.numpy(),
                                         jnp.float32)]
    return params, unmapped


def test_vace_loader_maps_every_tensor():
    cfg = WanConfig.from_json(VACE_TINY)
    assert cfg.vace_layers == (0,)
    _, unmapped = _jax_params(_vace_state_dict(), cfg)
    assert unmapped == []


def test_vace_forward_parity_vs_torch_oracle():
    cfg = WanConfig.from_json(VACE_TINY)
    sd = _vace_state_dict()
    params, unmapped = _jax_params(sd, cfg)
    assert unmapped == []

    rng = np.random.default_rng(11)
    lat = rng.standard_normal((1, 2, 8, 8, 4), dtype=np.float32)
    ctx = rng.standard_normal(
        (1, 2, 8, 8, VACE_TINY["vace_in_channels"]),
        dtype=np.float32) * 0.5
    txt = rng.standard_normal((1, 5, TINY["text_dim"]), dtype=np.float32)
    t = np.asarray([0.6], np.float32)

    ours = np.asarray(wan_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t), vace_context=jnp.asarray(ctx), vace_scale=1.3))
    golden = _oracle_vace_forward(sd, VACE_TINY, lat, txt, t, ctx, 1.3)
    assert ours.shape == golden.shape == (1, 2, 8, 8, 4)
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)

    # no context → hints disabled → differs from the conditioned run
    plain = np.asarray(wan_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t)))
    assert np.abs(plain - ours).max() > 1e-4


def test_vace_forward_parity_under_pp2():
    """VACE hints thread through the GPipe schedule (round-5: the
    wan.py pp gate is lifted): the hint stack rides row_consts per
    microbatch and per-layer idx/scale leaves select the injection —
    pp=2 output matches the single-device conditioned forward."""
    cfg = WanConfig.from_json(VACE_TINY)
    sd = _vace_state_dict()
    params, unmapped = _jax_params(sd, cfg)
    assert unmapped == []

    rng = np.random.default_rng(13)
    lat = rng.standard_normal((2, 2, 8, 8, 4), dtype=np.float32)
    ctx = rng.standard_normal(
        (2, 2, 8, 8, VACE_TINY["vace_in_channels"]),
        dtype=np.float32) * 0.5
    txt = rng.standard_normal((2, 5, TINY["text_dim"]), dtype=np.float32)
    t = np.asarray([0.6, 0.25], np.float32)

    base = np.asarray(wan_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t), vace_context=jnp.asarray(ctx), vace_scale=1.3))

    from jax.sharding import Mesh
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.asarray(devs[:2]), ("pp",))
    pp = np.asarray(wan_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t), mesh=mesh, vace_context=jnp.asarray(ctx),
        vace_scale=1.3))
    np.testing.assert_allclose(pp, base, rtol=2e-4, atol=2e-4)

    # scale actually biting under pp too
    pp0 = np.asarray(wan_forward(
        params, cfg, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(t), mesh=mesh, vace_context=jnp.asarray(ctx),
        vace_scale=0.0))
    assert np.abs(pp - pp0).max() > 1e-4


def _vace_pipeline_dir(tmp_path, with_real_vae=False):
    root = tmp_path / "wan_vace"
    for d in ("transformer", "scheduler", "vae"):
        (root / d).mkdir(parents=True)
    # real tiny wan VAE: spatial 4x, z 4 → vace ch 2*4 + 4*4 = 24
    vace_cfg = dict(VACE_TINY, vace_in_channels=24)
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "WanVACEPipeline",
                   "transformer": ["diffusers",
                                   "WanVACETransformer3DModel"],
                   "scheduler": ["diffusers",
                                 "UniPCMultistepScheduler"],
                   "vae": ["diffusers", "AutoencoderKLWan"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "WanVACETransformer3DModel",
                   **vace_cfg}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "UniPCMultistepScheduler",
                   "num_train_timesteps": 1000, "shift": 5.0}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKLWan", "z_dim": 4,
                   "base_dim": 8, "dim_mult": [1, 2, 2],
                   "num_res_blocks": 1, "attn_scales": [],
                   "temperal_downsample": [False, True],
                   "latents_mean": [0.1, -0.2, 0.05, 0.3],
                   "latents_std": [1.2, 0.8, 1.1, 0.9]}, f)
    sd = {k: v.float() for k, v in _vace_state_dict().items()}
    # the 24-channel vace patch embedding replaces the 12-channel one
    g = torch.Generator().manual_seed(5)
    pt, ph, pw = TINY["patch_size"]
    sd["vace_patch_embedding.weight"] = torch.randn(
        HS, 24, pt, ph, pw, generator=g) * 0.1
    save_file(sd, str(root / "transformer" /
                      "diffusion_pytorch_model.safetensors"))
    if with_real_vae:
        from tests.diffusion.test_vae_wan import tiny_state_dict
        save_file(tiny_state_dict(), str(
            root / "vae" / "diffusion_pytorch_model.safetensors"))
    return str(root)


def test_vace_mv2v_through_engine(tmp_path):
    """MV2V: source_video + mask → inactive/reactive wan-encode +
    8×8-stride mask channels → context blocks engage (reference
    pipeline_wan2_2_vace.py forward, MV2V mode)."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    model = _vace_pipeline_dir(tmp_path, with_real_vae=True)
    eng = DiffusionEngine(DiffusionConfig(
        model=model, dtype="float32", resolution_buckets=((16, 16),),
        flow_shift=1.0))
    assert eng.pipeline.family == "wan"
    assert eng.pipeline.family_cfg.vace_layers == (0,)
    assert eng.pipeline.vae_kind == "wan"

    rng = np.random.default_rng(3)
    video = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    mask = np.zeros((2, 16, 16), np.float32)
    mask[:, 4:12, 4:12] = 1.0  # repaint the center region

    def run(extra):
        return eng.generate([DiffusionRequest(
            "r", "a red ball", DiffusionSamplingParams(
                num_inference_steps=2, height=16, width=16,
                num_frames=2, guidance_scale=4.0, seed=0,
                output_type="latent", extra_args=extra))])[0]

    out = run({"source_video": video, "mask": mask,
               "vace_context_scale": 1.2})
    assert out.error is None, out.error
    base = run(None)
    assert base.error is None

    def lat(o):
        x = o.images if o.images is not None else o.video
        return np.asarray(x, np.float32)

    # conditioning must change the denoised latents
    assert np.abs(lat(out) - lat(base)).max() > 1e-4


def test_vace_precomputed_context_and_missing_vae_guard(tmp_path):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    model = _vace_pipeline_dir(tmp_path, with_real_vae=False)
    eng = DiffusionEngine(DiffusionConfig(
        model=model, dtype="float32", resolution_buckets=((16, 16),),
        flow_shift=1.0))
    assert eng.pipeline.vae_kind == "generic"

    ctx = np.random.default_rng(4).standard_normal(
        (1, 4, 4, 24)).astype(np.float32)
    out = eng.generate([DiffusionRequest(
        "r", "x", DiffusionSamplingParams(
            num_inference_steps=2, height=16, width=16,
            guidance_scale=1.0, seed=0, output_type="latent",
            extra_args={"vace_context": ctx}))])[0]
    assert out.error is None, out.error

    # source_video without the checkpoint's wan VAE must refuse loudly
    video = np.zeros((2, 16, 16, 3), np.float32)
    out = eng.generate([DiffusionRequest(
        "r2", "x", DiffusionSamplingParams(
            num_inference_steps=2, height=16, width=16, num_frames=2,
            guidance_scale=1.0, seed=0, output_type="latent",
            extra_args={"source_video": video}))])[0]
    assert out.error is not None and "Wan VAE" in out.error


def test_vace_under_layerwise_refuses(tmp_path):
    """Layerwise offload streams the MAIN blocks only — VACE context
    towers would be silently dropped; the step must refuse loudly."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    model = _vace_pipeline_dir(tmp_path, with_real_vae=False)
    eng = DiffusionEngine(DiffusionConfig(
        model=model, dtype="float32", resolution_buckets=((16, 16),),
        flow_shift=1.0, offload="layerwise"))
    ctx = np.zeros((1, 4, 4, 24), np.float32)
    out = eng.generate([DiffusionRequest(
        "r", "x", DiffusionSamplingParams(
            num_inference_steps=2, height=16, width=16,
            guidance_scale=1.0, seed=0, output_type="latent",
            extra_args={"vace_context": ctx}))])[0]
    assert out.error is not None and "layerwise" in out.error
