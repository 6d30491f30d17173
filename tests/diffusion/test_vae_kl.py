"""Real-geometry AutoencoderKL parity tests.

Same method as test_flux_loader.py: a tiny checkpoint is written in the
genuine diffusers layout (encoder/decoder blocks, mid attention,
quant/post_quant convs, torch conv [out,in,kh,kw] weights) and the
numeric oracle is an independent torch re-implementation of the
diffusers AutoencoderKL semantics (GroupNorm eps 1e-6, silu resnets,
1-head mid attention, nearest-2x upsample + conv, asymmetric (0,1,0,1)
downsample pad), so transpose/naming mistakes cannot cancel out.
Reference: the reference decodes every 2D image family through exactly
this module (diffusers AutoencoderKL; e.g. flux pipeline_flux.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.vae_kl import (  # noqa: E402
    VAEKLConfig, assign_kl_tensor, init_kl_params, kl_decode, kl_encode)

CFG = VAEKLConfig(
    in_channels=3, out_channels=3, latent_channels=4,
    block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4,
    scaling_factor=0.25, shift_factor=0.1, use_quant_conv=True,
    use_post_quant_conv=True)


def _conv(sd, prefix, cin, cout, k, g):
    sd[f"{prefix}.weight"] = torch.randn(cout, cin, k, k,
                                         generator=g) * 0.2
    sd[f"{prefix}.bias"] = torch.randn(cout, generator=g) * 0.05


def _norm(sd, prefix, c, g):
    sd[f"{prefix}.weight"] = torch.rand(c, generator=g) + 0.5
    sd[f"{prefix}.bias"] = torch.randn(c, generator=g) * 0.05


def _lin(sd, prefix, cin, cout, g):
    sd[f"{prefix}.weight"] = torch.randn(cout, cin, generator=g) * 0.2
    sd[f"{prefix}.bias"] = torch.randn(cout, generator=g) * 0.05


def _resnet_sd(sd, p, cin, cout, g):
    _norm(sd, f"{p}.norm1", cin, g)
    _conv(sd, f"{p}.conv1", cin, cout, 3, g)
    _norm(sd, f"{p}.norm2", cout, g)
    _conv(sd, f"{p}.conv2", cout, cout, 3, g)
    if cin != cout:
        _conv(sd, f"{p}.conv_shortcut", cin, cout, 1, g)


def _mid_sd(sd, p, c, g):
    _resnet_sd(sd, f"{p}.resnets.0", c, c, g)
    _resnet_sd(sd, f"{p}.resnets.1", c, c, g)
    _norm(sd, f"{p}.attentions.0.group_norm", c, g)
    for n in ("to_q", "to_k", "to_v"):
        _lin(sd, f"{p}.attentions.0.{n}", c, c, g)
    _lin(sd, f"{p}.attentions.0.to_out.0", c, c, g)


def tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    boc = CFG.block_out_channels
    rboc = tuple(reversed(boc))
    z = CFG.latent_channels
    sd = {}
    # encoder
    _conv(sd, "encoder.conv_in", 3, boc[0], 3, g)
    prev = boc[0]
    for i, c in enumerate(boc):
        for j in range(CFG.layers_per_block):
            _resnet_sd(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                       prev if j == 0 else c, c, g)
        if i < len(boc) - 1:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  c, c, 3, g)
        prev = c
    _mid_sd(sd, "encoder.mid_block", boc[-1], g)
    _norm(sd, "encoder.conv_norm_out", boc[-1], g)
    _conv(sd, "encoder.conv_out", boc[-1], 2 * z, 3, g)
    # decoder
    _conv(sd, "decoder.conv_in", z, rboc[0], 3, g)
    _mid_sd(sd, "decoder.mid_block", rboc[0], g)
    prev = rboc[0]
    for i, c in enumerate(rboc):
        for j in range(CFG.layers_per_block + 1):
            _resnet_sd(sd, f"decoder.up_blocks.{i}.resnets.{j}",
                       prev if j == 0 else c, c, g)
        if i < len(rboc) - 1:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv",
                  c, c, 3, g)
        prev = c
    _norm(sd, "decoder.conv_norm_out", rboc[-1], g)
    _conv(sd, "decoder.conv_out", rboc[-1], 3, 3, g)
    _conv(sd, "quant_conv", 2 * z, 2 * z, 1, g)
    _conv(sd, "post_quant_conv", z, z, 1, g)
    return sd


# ---------------------------------------------------------------------------
# torch oracle (independent re-implementation of diffusers semantics)
# ---------------------------------------------------------------------------


def _t_gn(x, sd, p, groups):
    return F.group_norm(x, groups, sd[f"{p}.weight"], sd[f"{p}.bias"],
                        eps=1e-6)


def _t_conv(x, sd, p, stride=1, pad=1):
    return F.conv2d(x, sd[f"{p}.weight"], sd[f"{p}.bias"],
                    stride=stride, padding=pad)


def _t_resnet(x, sd, p, groups):
    h = _t_conv(F.silu(_t_gn(x, sd, f"{p}.norm1", groups)),
                sd, f"{p}.conv1")
    h = _t_conv(F.silu(_t_gn(h, sd, f"{p}.norm2", groups)),
                sd, f"{p}.conv2")
    if f"{p}.conv_shortcut.weight" in sd:
        x = _t_conv(x, sd, f"{p}.conv_shortcut", pad=0)
    return x + h


def _t_mid(x, sd, p, groups):
    x = _t_resnet(x, sd, f"{p}.resnets.0", groups)
    b, c, h, w = x.shape
    res = x
    xn = _t_gn(x, sd, f"{p}.attentions.0.group_norm", groups)
    xn = xn.reshape(b, c, h * w).transpose(1, 2)
    q = F.linear(xn, sd[f"{p}.attentions.0.to_q.weight"],
                 sd[f"{p}.attentions.0.to_q.bias"])
    k = F.linear(xn, sd[f"{p}.attentions.0.to_k.weight"],
                 sd[f"{p}.attentions.0.to_k.bias"])
    v = F.linear(xn, sd[f"{p}.attentions.0.to_v.weight"],
                 sd[f"{p}.attentions.0.to_v.bias"])
    o = F.scaled_dot_product_attention(q, k, v)
    o = F.linear(o, sd[f"{p}.attentions.0.to_out.0.weight"],
                 sd[f"{p}.attentions.0.to_out.0.bias"])
    x = res + o.transpose(1, 2).reshape(b, c, h, w)
    return _t_resnet(x, sd, f"{p}.resnets.1", groups)


def torch_decode(sd, z):
    g = CFG.norm_num_groups
    z = z / CFG.scaling_factor + CFG.shift_factor
    x = _t_conv(z, sd, "post_quant_conv", pad=0) \
        if "post_quant_conv.weight" in sd else z
    x = _t_conv(x, sd, "decoder.conv_in")
    x = _t_mid(x, sd, "decoder.mid_block", g)
    n = len(CFG.block_out_channels)
    for i in range(n):
        for j in range(CFG.layers_per_block + 1):
            x = _t_resnet(x, sd, f"decoder.up_blocks.{i}.resnets.{j}", g)
        if i < n - 1:
            x = F.interpolate(x, scale_factor=2.0, mode="nearest")
            x = _t_conv(x, sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
    x = F.silu(_t_gn(x, sd, "decoder.conv_norm_out", g))
    return _t_conv(x, sd, "decoder.conv_out")


def torch_encode_moments(sd, img):
    g = CFG.norm_num_groups
    x = _t_conv(img, sd, "encoder.conv_in")
    n = len(CFG.block_out_channels)
    for i in range(n):
        for j in range(CFG.layers_per_block):
            x = _t_resnet(x, sd, f"encoder.down_blocks.{i}.resnets.{j}",
                          g)
        if i < n - 1:
            x = F.pad(x, (0, 1, 0, 1))
            x = _t_conv(x, sd, f"encoder.down_blocks.{i}.downsamplers"
                        ".0.conv", stride=2, pad=0)
    x = _t_mid(x, sd, "encoder.mid_block", g)
    x = F.silu(_t_gn(x, sd, "encoder.conv_norm_out", g))
    moments = _t_conv(x, sd, "encoder.conv_out")
    return _t_conv(moments, sd, "quant_conv", pad=0)


def _load(sd):
    params = init_kl_params(CFG, jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_kl_tensor(params, n, t.numpy(),
                                        jnp.float32)]
    assert not unmapped, unmapped
    return params


def test_decode_parity():
    sd = tiny_state_dict()
    params = _load(sd)
    z = torch.randn(2, CFG.latent_channels, 6, 5,
                    generator=torch.Generator().manual_seed(7))
    want = torch_decode(sd, z).detach().numpy()
    got = kl_decode(params, CFG,
                    jnp.asarray(z.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape  # 2x upsample per non-final block
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_encode_parity():
    sd = tiny_state_dict()
    params = _load(sd)
    img = torch.randn(1, 3, 12, 10,
                      generator=torch.Generator().manual_seed(9))
    want = torch_encode_moments(sd, img).detach().numpy()
    mean_w = want[:, :CFG.latent_channels]
    # deterministic (mean) encode for parity
    got = kl_encode(params, CFG,
                    jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                    sample=False)
    got = np.asarray(got, np.float32).transpose(0, 3, 1, 2)
    want_z = (mean_w - CFG.shift_factor) * CFG.scaling_factor
    np.testing.assert_allclose(got, want_z, atol=2e-4, rtol=2e-3)


def test_no_quant_conv_variant():
    """flux/sd3 ship use_quant_conv=False — those names must not exist
    and decode must skip the 1x1s."""
    cfg = VAEKLConfig(latent_channels=4, block_out_channels=(8, 16),
                      layers_per_block=1, norm_num_groups=4,
                      use_quant_conv=False, use_post_quant_conv=False)
    params = init_kl_params(cfg, jnp.float32)
    assert "quant_conv" not in params
    assert not assign_kl_tensor(params, "quant_conv.weight",
                                np.zeros((8, 8, 1, 1), np.float32),
                                jnp.float32)
    z = jnp.ones((1, 4, 4, cfg.latent_channels), jnp.float32)
    out = kl_decode(params, cfg, z)
    assert out.shape == (1, 8, 8, 3)


def test_load_vae_real_weights(tmp_path):
    """vae/ subfolder with config + safetensors loads real weights and
    decodes identically to the torch oracle through loader.load_vae."""
    import json

    from safetensors.torch import save_file

    from vllm_omni_tpu.diffusion.loader import load_vae

    (tmp_path / "vae").mkdir()
    with open(tmp_path / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL",
                   "in_channels": 3, "out_channels": 3,
                   "latent_channels": CFG.latent_channels,
                   "block_out_channels": list(CFG.block_out_channels),
                   "layers_per_block": CFG.layers_per_block,
                   "norm_num_groups": CFG.norm_num_groups,
                   "scaling_factor": CFG.scaling_factor,
                   "shift_factor": CFG.shift_factor,
                   "use_quant_conv": True,
                   "use_post_quant_conv": True}, f)
    sd = tiny_state_dict()
    save_file({k: v.contiguous() for k, v in sd.items()},
              str(tmp_path / "vae" / "diffusion_pytorch_model"
                  ".safetensors"))
    meta = load_vae(str(tmp_path), dtype=jnp.float32)
    assert meta["kind"] == "kl"
    assert meta["latent_channels"] == CFG.latent_channels
    assert meta["scale_factor"] == CFG.spatial_scale
    z = torch.randn(1, CFG.latent_channels, 4, 4,
                    generator=torch.Generator().manual_seed(11))
    want = torch_decode(sd, z).detach().numpy()
    got = kl_decode(meta["params"], meta["vae_cfg"],
                    jnp.asarray(z.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=2e-4,
        rtol=2e-3)


def test_load_vae_config_only_falls_back(tmp_path):
    """No safetensors under vae/ → metadata only (existing fixtures)."""
    import json

    from vllm_omni_tpu.diffusion.loader import load_vae

    (tmp_path / "vae").mkdir()
    with open(tmp_path / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL", "latent_channels": 4,
                   "block_out_channels": [8, 16]}, f)
    meta = load_vae(str(tmp_path), dtype=jnp.float32)
    assert "kind" not in meta
    assert meta["latent_channels"] == 4
