"""HunyuanImage3 conv3d VAE decoder tests — torch oracle of the
reference AutoencoderKLConv3D Decoder (hunyuan_image3/autoencoder.py
:300-384: conv_in + channel-repeat shortcut, GN32 ResnetBlocks,
single-head full-attn mid block, DC-AE pixel-shuffle upsample with a
repeat-interleave shortcut, GN32 tail)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.vae_hi3 import (  # noqa: E402
    HI3VaeConfig, assign_hi3_vae_tensor, hi3_vae_decode,
    init_hi3_vae_decoder)

Z, CH = 8, 32
VAE_CFG = {
    "latent_channels": Z, "out_channels": 3,
    "block_out_channels": [CH, CH, CH], "layers_per_block": 1,
    "ffactor_spatial": 4, "ffactor_temporal": 1,
}


def _vae_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(prefix, o, i, k=3):
        sd[f"{prefix}.weight"] = torch.randn(o, i, k, k, k,
                                             generator=g) * 0.05
        sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    def norm(prefix, c):
        sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.02

    def res(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cout, cin)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)
        if cin != cout:
            conv(f"{prefix}.nin_shortcut", cout, cin, 1)

    conv("decoder.conv_in", CH, Z)
    res("decoder.mid.block_1", CH, CH)
    norm("decoder.mid.attn_1.norm", CH)
    for k in ("q", "k", "v", "proj_out"):
        conv(f"decoder.mid.attn_1.{k}", CH, CH, 1)
    res("decoder.mid.block_2", CH, CH)
    cfg = HI3VaeConfig.from_json(VAE_CFG)
    for lv, (res_plan, up) in enumerate(cfg.level_plan()):
        for bi, (ci, co) in enumerate(res_plan):
            res(f"decoder.up.{lv}.block.{bi}", ci, co)
        if up is not None:
            cin, cout, tp = up
            factor = (2 if tp else 1) * 4
            conv(f"decoder.up.{lv}.upsample.conv", cout * factor, cin)
    norm("decoder.norm_out", cfg.tail_channels)
    conv("decoder.conv_out", 3, cfg.tail_channels)
    return sd


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_gn(x, w, b):
    # x [B, C, F, H, W]
    g = 32 if x.shape[1] % 32 == 0 and x.shape[1] >= 32 else x.shape[1]
    return F.group_norm(x.float(), g, w.float(), b.float(), eps=1e-6)


def _o_conv(sd, p, x, k=3):
    return F.conv3d(x.float(), sd[f"{p}.weight"].float(),
                    sd[f"{p}.bias"].float(), padding=(k - 1) // 2)


def _o_res(sd, p, x):
    h = _o_conv(sd, f"{p}.conv1",
                F.silu(_o_gn(x, sd[f"{p}.norm1.weight"],
                             sd[f"{p}.norm1.bias"])))
    h = _o_conv(sd, f"{p}.conv2",
                F.silu(_o_gn(h, sd[f"{p}.norm2.weight"],
                             sd[f"{p}.norm2.bias"])))
    if f"{p}.nin_shortcut.weight" in sd:
        x = _o_conv(sd, f"{p}.nin_shortcut", x, 1)
    return x + h


def _o_attn(sd, p, x):
    b, c, f, hh, ww = x.shape
    h = _o_gn(x, sd[f"{p}.norm.weight"], sd[f"{p}.norm.bias"])
    q = _o_conv(sd, f"{p}.q", h, 1).reshape(b, c, -1).transpose(1, 2)
    k = _o_conv(sd, f"{p}.k", h, 1).reshape(b, c, -1).transpose(1, 2)
    v = _o_conv(sd, f"{p}.v", h, 1).reshape(b, c, -1).transpose(1, 2)
    o = F.scaled_dot_product_attention(q[:, None], k[:, None],
                                       v[:, None])[:, 0]
    o = o.transpose(1, 2).reshape(b, c, f, hh, ww)
    return x + _o_conv(sd, f"{p}.proj_out", o, 1)


def _o_upsample(sd, p, x, c_out, temporal):
    from einops import rearrange
    r1 = 2 if temporal else 1
    factor = r1 * 4
    h = _o_conv(sd, f"{p}.conv", x)
    h = rearrange(h, "b (r1 r2 r3 c) f hh w -> b c (f r1) (hh r2) "
                  "(w r3)", r1=r1, r2=2, r3=2)
    repeats = factor * c_out // x.shape[1]
    sc = x.repeat_interleave(repeats, dim=1)
    sc = rearrange(sc, "b (r1 r2 r3 c) f hh w -> b c (f r1) (hh r2) "
                   "(w r3)", r1=r1, r2=2, r3=2)
    return h + sc


def _o_decode(sd, cfg, z):
    # z [B, C, F, H, W]
    h = _o_conv(sd, "decoder.conv_in", z) + z.repeat_interleave(
        CH // Z, dim=1)
    h = _o_res(sd, "decoder.mid.block_1", h)
    h = _o_attn(sd, "decoder.mid.attn_1", h)
    h = _o_res(sd, "decoder.mid.block_2", h)
    for lv, (res_plan, up) in enumerate(cfg.level_plan()):
        for bi in range(len(res_plan)):
            h = _o_res(sd, f"decoder.up.{lv}.block.{bi}", h)
        if up is not None:
            _, c_out, tp = up
            h = _o_upsample(sd, f"decoder.up.{lv}.upsample", h, c_out,
                            tp)
    h = F.silu(_o_gn(h, sd["decoder.norm_out.weight"],
                     sd["decoder.norm_out.bias"]))
    return _o_conv(sd, "decoder.conv_out", h)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _load_params():
    cfg = HI3VaeConfig.from_json(VAE_CFG)
    params = init_hi3_vae_decoder(cfg)
    sd = _vae_state_dict()
    n = 0
    for name, t in sd.items():
        assert assign_hi3_vae_tensor(params, name[len("decoder."):],
                                     t.numpy()), name
        n += 1
    return cfg, params, sd, n


def test_assign_maps_every_tensor():
    cfg, params, sd, n = _load_params()
    assert n == len(sd)
    assert params["conv_in"]["w"].shape == (3, 3, 3, Z, CH)
    assert params["up"][0][1]["conv"]["w"].shape == (3, 3, 3, CH,
                                                     4 * CH)
    assert params["up"][2][1] is None  # last level: no upsample


def test_decode_parity_vs_torch():
    cfg, params, sd, _ = _load_params()
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((1, 4, 4, Z)).astype(np.float32)
    got = np.asarray(hi3_vae_decode(params, cfg, jnp.asarray(lat)))
    z = torch.from_numpy(lat).permute(0, 3, 1, 2)[:, :, None]
    golden = _o_decode(sd, cfg, z).numpy()[:, :, 0].transpose(
        0, 2, 3, 1)
    assert got.shape == golden.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(got, golden, rtol=4e-4, atol=4e-4)


def test_hi3_e2e_with_real_vae(tmp_path):
    """The family e2e decodes through the real conv3d VAE when the
    checkpoint ships vae.decoder.* tensors."""
    from tests.diffusion.test_hunyuan_image3_loader import (
        HF, _tiny_state_dict)
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import (
        DiffusionSamplingParams)
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    hf = json.loads(json.dumps(HF))
    hf["vae"] = dict(VAE_CFG, ffactor_spatial=16, scaling_factor=1.0)
    # family config: latent 4ch, downsample 16 — VAE tier: z must
    # match the DiT latent channels
    hf["vae"]["latent_channels"] = 4
    root = tmp_path / "hi3_vae"
    root.mkdir()
    with open(root / "config.json", "w") as f:
        json.dump(hf, f)
    sd = _tiny_state_dict()
    # fabricate a matching VAE (z=4 → block0 % z == 0 with CH=32;
    # ffactor 16 → levels 0..1 upsample only with 3 levels? log2(16)=4
    # needs 5 levels; use ffactor 4 and downsample metadata stays 16
    # for bucketing)
    hf["vae"]["ffactor_spatial"] = 4
    with open(root / "config.json", "w") as f:
        json.dump(hf, f)
    g = torch.Generator().manual_seed(1)
    vcfg = HI3VaeConfig.from_json(hf["vae"])
    vsd = {}

    def conv(prefix, o, i, k=3):
        vsd[f"{prefix}.weight"] = torch.randn(o, i, k, k, k,
                                              generator=g) * 0.05
        vsd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    def norm(prefix, c):
        vsd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
        vsd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.02

    def res(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cout, cin)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout)

    conv("vae.decoder.conv_in", CH, 4)
    res("vae.decoder.mid.block_1", CH, CH)
    norm("vae.decoder.mid.attn_1.norm", CH)
    for k in ("q", "k", "v", "proj_out"):
        conv(f"vae.decoder.mid.attn_1.{k}", CH, CH, 1)
    res("vae.decoder.mid.block_2", CH, CH)
    for lv, (res_plan, up) in enumerate(vcfg.level_plan()):
        for bi, (ci, co) in enumerate(res_plan):
            res(f"vae.decoder.up.{lv}.block.{bi}", ci, co)
        if up is not None:
            cin, c_out, tp = up
            conv(f"vae.decoder.up.{lv}.upsample.conv",
                 c_out * 4, cin)
    norm("vae.decoder.norm_out", vcfg.tail_channels)
    conv("vae.decoder.conv_out", 3, vcfg.tail_channels)
    sd.update(vsd)
    save_file(sd, str(root / "model.safetensors"))

    config = DiffusionConfig(model=str(root), dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=5.0)
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "hunyuan_image3"
    assert getattr(eng.pipeline.family_cfg, "vae_decoder_params",
                   None) is not None
    out = eng.generate([DiffusionRequest(
        "r0", "a tiny test image",
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=1.0, seed=0,
                                output_type="np"))])[0]
    assert out.finished and out.error is None, out.error
    img = np.asarray(out.images, np.float32)
    # ffactor 4 → latents 8x8 → VAE x4 → 32x32 RGB
    assert img.shape[-1] == 3 and img.shape[1] == 32
    assert np.isfinite(img).all()
    assert img.min() >= 0.0 and img.max() <= 1.0
