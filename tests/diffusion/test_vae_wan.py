"""Wan-style 3D causal VAE parity tests.

The torch oracle below re-implements the reference's STREAMING decode
(AutoencoderKLQwenImage._decode autoencoder_kl_qwenimage.py:839-865:
frame-by-frame through the decoder with a feat_cache of per-conv
temporal tails, CACHE_T=2, first-frame "Rep" handling in upsample3d) —
so this test proves the JAX full-sequence decode is numerically
identical to the cached streaming semantics, not merely to another
full-sequence formulation. Encode parity runs the reference's 1+4k
chunking (:788-809)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.vae_wan import (  # noqa: E402
    VAEWanConfig, assign_wan_vae_tensor, init_wan_vae_params, wan_decode,
    wan_encode)

CACHE_T = 2

CFG = VAEWanConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 2), num_res_blocks=1,
    attn_scales=(), temperal_downsample=(False, True),
    latents_mean=(0.1, -0.2, 0.05, 0.3),
    latents_std=(1.2, 0.8, 1.1, 0.9))


# ---------------------------------------------------------------------------
# tiny checkpoint in genuine diffusers naming
# ---------------------------------------------------------------------------


def _c3(sd, p, cin, cout, kt, ks, g):
    sd[f"{p}.weight"] = torch.randn(cout, cin, kt, ks, ks,
                                    generator=g) * 0.2
    sd[f"{p}.bias"] = torch.randn(cout, generator=g) * 0.05


def _c2(sd, p, cin, cout, k, g):
    sd[f"{p}.weight"] = torch.randn(cout, cin, k, k, generator=g) * 0.2
    sd[f"{p}.bias"] = torch.randn(cout, generator=g) * 0.05


def _gamma(sd, p, c, g, images=False):
    shape = (c, 1, 1) if images else (c, 1, 1, 1)
    sd[f"{p}.gamma"] = torch.rand(*shape, generator=g) + 0.5


def _resnet_sd(sd, p, cin, cout, g):
    _gamma(sd, f"{p}.norm1", cin, g)
    _c3(sd, f"{p}.conv1", cin, cout, 3, 3, g)
    _gamma(sd, f"{p}.norm2", cout, g)
    _c3(sd, f"{p}.conv2", cout, cout, 3, 3, g)
    if cin != cout:
        _c3(sd, f"{p}.conv_shortcut", cin, cout, 1, 1, g)


def _mid_sd(sd, p, c, g):
    _resnet_sd(sd, f"{p}.resnets.0", c, c, g)
    _gamma(sd, f"{p}.attentions.0.norm", c, g, images=True)
    _c2(sd, f"{p}.attentions.0.to_qkv", c, 3 * c, 1, g)
    _c2(sd, f"{p}.attentions.0.proj", c, c, 1, g)
    _resnet_sd(sd, f"{p}.resnets.1", c, c, g)


def tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    dm = CFG.dim_mult
    base = CFG.base_dim
    sd = {}
    # decoder
    ddims = [base * u for u in (dm[-1],) + tuple(reversed(dm))]
    _c3(sd, "decoder.conv_in", CFG.z_dim, ddims[0], 3, 3, g)
    _mid_sd(sd, "decoder.mid_block", ddims[0], g)
    n_up = len(dm) - 1
    for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i > 0:
            cin //= 2
        cur = cin
        for j in range(CFG.num_res_blocks + 1):
            _resnet_sd(sd, f"decoder.up_blocks.{i}.resnets.{j}", cur,
                       cout, g)
            cur = cout
        if i < n_up:
            _c2(sd, f"decoder.up_blocks.{i}.upsamplers.0.resample.1",
                cout, cout // 2, 3, g)
            if CFG.temporal_upsample[i]:
                _c3(sd, f"decoder.up_blocks.{i}.upsamplers.0.time_conv",
                    cout, 2 * cout, 3, 1, g)
    _gamma(sd, "decoder.norm_out", ddims[-1], g)
    _c3(sd, "decoder.conv_out", ddims[-1], 3, 3, 3, g)
    # encoder (flat down_blocks)
    edims = [base * u for u in (1,) + tuple(dm)]
    _c3(sd, "encoder.conv_in", 3, edims[0], 3, 3, g)
    k = 0
    for i, (cin, cout) in enumerate(zip(edims[:-1], edims[1:])):
        cur = cin
        for _ in range(CFG.num_res_blocks):
            _resnet_sd(sd, f"encoder.down_blocks.{k}", cur, cout, g)
            cur = cout
            k += 1
        if i < len(dm) - 1:
            _c2(sd, f"encoder.down_blocks.{k}.resample.1", cout, cout,
                3, g)
            if CFG.temperal_downsample[i]:
                _c3(sd, f"encoder.down_blocks.{k}.time_conv", cout,
                    cout, 3, 1, g)
            k += 1
    _mid_sd(sd, "encoder.mid_block", edims[-1], g)
    _gamma(sd, "encoder.norm_out", edims[-1], g)
    _c3(sd, "encoder.conv_out", edims[-1], 2 * CFG.z_dim, 3, 3, g)
    _c3(sd, "quant_conv", 2 * CFG.z_dim, 2 * CFG.z_dim, 1, 1, g)
    _c3(sd, "post_quant_conv", CFG.z_dim, CFG.z_dim, 1, 1, g)
    return sd


# ---------------------------------------------------------------------------
# torch oracle: the reference's cached streaming semantics, verbatim
# ---------------------------------------------------------------------------


class OCausalConv:
    def __init__(self, sd, p, stride=(1, 1, 1), pad=(1, 1, 1)):
        self.w, self.b = sd[f"{p}.weight"], sd[f"{p}.bias"]
        self.stride = stride
        self._padding = (pad[2], pad[2], pad[1], pad[1], 2 * pad[0], 0)

    def __call__(self, x, cache_x=None):
        padding = list(self._padding)
        if cache_x is not None and self._padding[4] > 0:
            x = torch.cat([cache_x, x], dim=2)
            padding[4] -= cache_x.shape[2]
        x = F.pad(x, padding)
        return F.conv3d(x, self.w, self.b, stride=self.stride)


def _cached_conv(conv, x, cache, idx):
    i = idx[0]
    cache_x = x[:, :, -CACHE_T:].clone()
    if cache_x.shape[2] < 2 and cache[i] is not None:
        cache_x = torch.cat(
            [cache[i][:, :, -1].unsqueeze(2), cache_x], dim=2)
    out = conv(x, cache[i])
    cache[i] = cache_x
    idx[0] += 1
    return out


def _o_rms(x, gamma):
    c = x.shape[1]
    return F.normalize(x, dim=1) * (c ** 0.5) * gamma


class OResnet:
    def __init__(self, sd, p, cin, cout):
        self.n1 = sd[f"{p}.norm1.gamma"]
        self.c1 = OCausalConv(sd, f"{p}.conv1")
        self.n2 = sd[f"{p}.norm2.gamma"]
        self.c2 = OCausalConv(sd, f"{p}.conv2")
        self.sh = OCausalConv(sd, f"{p}.conv_shortcut", pad=(0, 0, 0)) \
            if cin != cout else None

    def __call__(self, x, cache, idx):
        h = self.sh(x) if self.sh else x
        y = F.silu(_o_rms(x, self.n1))
        y = _cached_conv(self.c1, y, cache, idx)
        y = F.silu(_o_rms(y, self.n2))
        y = _cached_conv(self.c2, y, cache, idx)
        return y + h


class OAttn:
    def __init__(self, sd, p):
        self.g = sd[f"{p}.norm.gamma"]
        self.qkv_w, self.qkv_b = sd[f"{p}.to_qkv.weight"], \
            sd[f"{p}.to_qkv.bias"]
        self.p_w, self.p_b = sd[f"{p}.proj.weight"], sd[f"{p}.proj.bias"]

    def __call__(self, x):
        identity = x
        b, c, t, h, w = x.size()
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = F.normalize(x, dim=1) * (c ** 0.5) * self.g
        qkv = F.conv2d(x, self.qkv_w, self.qkv_b)
        qkv = qkv.reshape(b * t, 1, c * 3, -1).permute(
            0, 1, 3, 2).contiguous()
        q, k, v = qkv.chunk(3, dim=-1)
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = F.conv2d(x, self.p_w, self.p_b)
        x = x.view(b, t, c, h, w).permute(0, 2, 1, 3, 4)
        return x + identity


class OResample:
    def __init__(self, sd, p, dim, mode):
        self.mode = mode
        self.cw, self.cb = sd[f"{p}.resample.1.weight"], \
            sd[f"{p}.resample.1.bias"]
        if mode == "upsample3d":
            self.tc = OCausalConv(sd, f"{p}.time_conv", pad=(1, 0, 0))
        elif mode == "downsample3d":
            self.tc = OCausalConv(sd, f"{p}.time_conv",
                                  stride=(2, 1, 1), pad=(0, 0, 0))

    def __call__(self, x, cache, idx):
        b, c, t, h, w = x.size()
        if self.mode == "upsample3d":
            i = idx[0]
            if cache[i] is None:
                cache[i] = "Rep"
                idx[0] += 1
            else:
                cache_x = x[:, :, -CACHE_T:].clone()
                if cache_x.shape[2] < 2 and cache[i] != "Rep":
                    cache_x = torch.cat(
                        [cache[i][:, :, -1].unsqueeze(2), cache_x], 2)
                if cache_x.shape[2] < 2 and cache[i] == "Rep":
                    cache_x = torch.cat(
                        [torch.zeros_like(cache_x), cache_x], 2)
                if cache[i] == "Rep":
                    x = self.tc(x)
                else:
                    x = self.tc(x, cache[i])
                cache[i] = cache_x
                idx[0] += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = torch.stack((x[:, 0], x[:, 1]), 3)
                x = x.reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        if self.mode.startswith("upsample"):
            x = F.interpolate(x.float(), scale_factor=(2.0, 2.0),
                              mode="nearest-exact").type_as(x)
            x = F.conv2d(x, self.cw, self.cb, padding=1)
        else:
            x = F.pad(x, (0, 1, 0, 1))
            x = F.conv2d(x, self.cw, self.cb, stride=2)
        x = x.view(b, t, x.size(1), x.size(2), x.size(3)).permute(
            0, 2, 1, 3, 4)
        if self.mode == "downsample3d":
            i = idx[0]
            if cache[i] is None:
                cache[i] = x.clone()
                idx[0] += 1
            else:
                cache_x = x[:, :, -1:].clone()
                x = self.tc(torch.cat([cache[i][:, :, -1:], x], 2))
                cache[i] = cache_x
                idx[0] += 1
        return x


class ODecoder:
    def __init__(self, sd):
        dm = CFG.dim_mult
        ddims = [CFG.base_dim * u for u in (dm[-1],) + tuple(
            reversed(dm))]
        self.conv_in = OCausalConv(sd, "decoder.conv_in")
        self.mid = [OResnet(sd, "decoder.mid_block.resnets.0",
                            ddims[0], ddims[0]),
                    OAttn(sd, "decoder.mid_block.attentions.0"),
                    OResnet(sd, "decoder.mid_block.resnets.1",
                            ddims[0], ddims[0])]
        self.ups = []
        n_up = len(dm) - 1
        for i, (cin, cout) in enumerate(zip(ddims[:-1], ddims[1:])):
            if i > 0:
                cin //= 2
            res = []
            cur = cin
            for j in range(CFG.num_res_blocks + 1):
                res.append(OResnet(
                    sd, f"decoder.up_blocks.{i}.resnets.{j}", cur,
                    cout))
                cur = cout
            up = None
            if i < n_up:
                mode = "upsample3d" if CFG.temporal_upsample[i] \
                    else "upsample2d"
                up = OResample(sd, f"decoder.up_blocks.{i}.upsamplers.0",
                               cout, mode)
            self.ups.append((res, up))
        self.ng = sd["decoder.norm_out.gamma"]
        self.conv_out = OCausalConv(sd, "decoder.conv_out")

    def __call__(self, x, cache, idx):
        x = _cached_conv(self.conv_in, x, cache, idx)
        x = self.mid[0](x, cache, idx)
        x = self.mid[1](x)
        x = self.mid[2](x, cache, idx)
        for res, up in self.ups:
            for r in res:
                x = r(x, cache, idx)
            if up is not None:
                x = up(x, cache, idx)
        x = F.silu(_o_rms(x, self.ng))
        return _cached_conv(self.conv_out, x, cache, idx)


def oracle_decode(sd, z):
    """Reference _decode: un-normalize, post_quant_conv on the full
    clip, then stream the decoder frame by frame."""
    mean = torch.tensor(CFG.latents_mean).view(1, -1, 1, 1, 1)
    std = torch.tensor(CFG.latents_std).view(1, -1, 1, 1, 1)
    z = z * std + mean
    pq = OCausalConv(sd, "post_quant_conv", pad=(0, 0, 0))
    x = pq(z)
    dec = ODecoder(sd)
    n_convs = sum(1 for k in sd if k.startswith("decoder")
                  and (".conv" in k or "time_conv" in k)
                  and k.endswith("weight")) + 4  # + upsample3d slots
    outs = []
    cache = [None] * 64
    for i in range(x.shape[2]):
        idx = [0]
        outs.append(dec(x[:, :, i:i + 1], cache, idx))
    del n_convs
    return torch.clamp(torch.cat(outs, 2), -1.0, 1.0)


class OEncoder:
    def __init__(self, sd):
        dm = CFG.dim_mult
        edims = [CFG.base_dim * u for u in (1,) + tuple(dm)]
        self.conv_in = OCausalConv(sd, "encoder.conv_in")
        self.downs = []
        k = 0
        for i, (cin, cout) in enumerate(zip(edims[:-1], edims[1:])):
            cur = cin
            for _ in range(CFG.num_res_blocks):
                self.downs.append(OResnet(
                    sd, f"encoder.down_blocks.{k}", cur, cout))
                cur = cout
                k += 1
            if i < len(dm) - 1:
                mode = "downsample3d" if CFG.temperal_downsample[i] \
                    else "downsample2d"
                self.downs.append(OResample(
                    sd, f"encoder.down_blocks.{k}", cout, mode))
                k += 1
        self.mid = [OResnet(sd, "encoder.mid_block.resnets.0",
                            edims[-1], edims[-1]),
                    OAttn(sd, "encoder.mid_block.attentions.0"),
                    OResnet(sd, "encoder.mid_block.resnets.1",
                            edims[-1], edims[-1])]
        self.ng = sd["encoder.norm_out.gamma"]
        self.conv_out = OCausalConv(sd, "encoder.conv_out")

    def __call__(self, x, cache, idx):
        x = _cached_conv(self.conv_in, x, cache, idx)
        for d in self.downs:
            x = d(x, cache, idx)
        x = self.mid[0](x, cache, idx)
        x = self.mid[1](x)
        x = self.mid[2](x, cache, idx)
        x = F.silu(_o_rms(x, self.ng))
        return _cached_conv(self.conv_out, x, cache, idx)


def oracle_encode_mean(sd, video):
    """Reference _encode 1+4k chunking → quant_conv → mean →
    normalize."""
    enc = OEncoder(sd)
    cache = [None] * 64
    outs = []
    t = video.shape[2]
    for i in range(1 + (t - 1) // 4):
        idx = [0]
        chunk = video[:, :, :1] if i == 0 else \
            video[:, :, 1 + 4 * (i - 1):1 + 4 * i]
        outs.append(enc(chunk, cache, idx))
    out = torch.cat(outs, 2)
    qc = OCausalConv(sd, "quant_conv", pad=(0, 0, 0))
    moments = qc(out)
    mean = moments[:, :CFG.z_dim]
    m = torch.tensor(CFG.latents_mean).view(1, -1, 1, 1, 1)
    s = torch.tensor(CFG.latents_std).view(1, -1, 1, 1, 1)
    return (mean - m) / s


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _load(sd):
    params = init_wan_vae_params(CFG, jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_wan_vae_tensor(params, n, t.numpy(),
                                             jnp.float32)]
    assert not unmapped, unmapped
    return params


def _to_jax(x):  # NCTHW → NTHWC
    return jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))


def _to_torch_layout(a):  # NTHWC → NCTHW
    return np.asarray(a, np.float32).transpose(0, 4, 1, 2, 3)


def test_video_decode_parity_vs_streaming_oracle():
    sd = tiny_state_dict()
    params = _load(sd)
    z = torch.randn(1, CFG.z_dim, 5, 4, 3,
                    generator=torch.Generator().manual_seed(3))
    want = oracle_decode(sd, z).numpy()
    got = _to_torch_layout(wan_decode(params, CFG, _to_jax(z)))
    # one upsample3d: 1 + 2·(5−1) = 9 frames; spatial ×4
    assert got.shape == (1, 3, 9, 16, 12)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_image_decode_parity():
    sd = tiny_state_dict()
    params = _load(sd)
    z = torch.randn(2, CFG.z_dim, 1, 4, 4,
                    generator=torch.Generator().manual_seed(5))
    want = oracle_decode(sd, z).numpy()
    got = _to_torch_layout(wan_decode(params, CFG, _to_jax(z)))
    assert got.shape == (2, 3, 1, 16, 16)
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_video_encode_parity_vs_chunked_oracle():
    sd = tiny_state_dict()
    params = _load(sd)
    video = torch.randn(1, 3, 5, 16, 12,
                        generator=torch.Generator().manual_seed(7))
    want = oracle_encode_mean(sd, video).numpy()
    got = _to_torch_layout(
        wan_encode(params, CFG, _to_jax(video), sample=False))
    # one downsample3d: 1 + (5−1)/2 = 3 latent frames; spatial /4
    assert got.shape == (1, CFG.z_dim, 3, 4, 3)
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)
