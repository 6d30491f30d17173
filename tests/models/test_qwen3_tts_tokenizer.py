"""Qwen3-TTS 12hz tokenizer (V2) decoder — real-geometry parity vs an
independent torch oracle implementing the reference semantics
(tokenizer_12hz/modeling_qwen3_tts_tokenizer_v2.py: split-RVQ EMA
codebooks, causal conv padding :198, trans-conv right-trim :221,
sliding-window rope transformer with LayerScale :432, SnakeBeta :602,
dilated residual units :726, chunked streaming decode :1030)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.qwen3_tts_tokenizer import (  # noqa: E402
    Tok12Decoder, TTSTok12Config, load_tok12, tok12_decode)

CFG = {
    "decoder_config": {
        "codebook_size": 32, "codebook_dim": 16, "hidden_size": 32,
        "latent_dim": 16, "rope_theta": 10000.0,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "attention_bias": False, "sliding_window": 6,
        "intermediate_size": 48, "layer_scale_initial_scale": 0.01,
        "rms_norm_eps": 1e-5, "num_hidden_layers": 2,
        "num_quantizers": 3, "upsample_rates": [2, 2],
        "upsampling_ratios": [2], "decoder_dim": 32,
    },
    "output_sample_rate": 24000,
    "decode_upsample_rate": 16,
}
D = CFG["decoder_config"]


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(pre, o, i, bias=True):
        sd[f"{pre}.weight"] = torch.randn(o, i, generator=g) * (i ** -0.5)
        if bias:
            sd[f"{pre}.bias"] = torch.randn(o, generator=g) * 0.02

    def conv(pre, o, i, k, groups=1):
        sd[f"{pre}.weight"] = torch.randn(o, i // groups, k,
                                          generator=g) * 0.2
        sd[f"{pre}.bias"] = torch.randn(o, generator=g) * 0.02

    def tconv(pre, i, o, k):
        sd[f"{pre}.weight"] = torch.randn(i, o, k, generator=g) * 0.2
        sd[f"{pre}.bias"] = torch.randn(o, generator=g) * 0.02

    def snake(pre, c):
        sd[f"{pre}.alpha"] = torch.randn(c, generator=g) * 0.3
        sd[f"{pre}.beta"] = torch.randn(c, generator=g) * 0.3

    cd2 = D["codebook_dim"] // 2
    for grp, n in (("rvq_first", 1), ("rvq_rest",
                                      D["num_quantizers"] - 1)):
        sd[f"decoder.quantizer.{grp}.output_proj.weight"] = \
            torch.randn(D["codebook_dim"], cd2, 1, generator=g) * 0.3
        for q in range(n):
            p = f"decoder.quantizer.{grp}.vq.layers.{q}._codebook"
            sd[f"{p}.embedding_sum"] = torch.randn(
                D["codebook_size"], cd2, generator=g)
            sd[f"{p}.cluster_usage"] = torch.rand(
                D["codebook_size"], generator=g) * 2 + 0.5
    conv("decoder.pre_conv.conv", D["latent_dim"], D["codebook_dim"], 3)
    lin("decoder.pre_transformer.input_proj", D["hidden_size"],
        D["latent_dim"])
    lin("decoder.pre_transformer.output_proj", D["latent_dim"],
        D["hidden_size"])
    sd["decoder.pre_transformer.norm.weight"] = torch.rand(
        D["hidden_size"], generator=g) + 0.5
    hd = D["hidden_size"] // D["num_attention_heads"]
    for li in range(D["num_hidden_layers"]):
        p = f"decoder.pre_transformer.layers.{li}"
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            D["hidden_size"], generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            D["hidden_size"], generator=g) + 0.5
        lin(f"{p}.self_attn.q_proj",
            D["num_attention_heads"] * hd, D["hidden_size"], bias=False)
        lin(f"{p}.self_attn.k_proj",
            D["num_key_value_heads"] * hd, D["hidden_size"], bias=False)
        lin(f"{p}.self_attn.v_proj",
            D["num_key_value_heads"] * hd, D["hidden_size"], bias=False)
        lin(f"{p}.self_attn.o_proj", D["hidden_size"],
            D["num_attention_heads"] * hd, bias=False)
        lin(f"{p}.mlp.gate_proj", D["intermediate_size"],
            D["hidden_size"], bias=False)
        lin(f"{p}.mlp.up_proj", D["intermediate_size"],
            D["hidden_size"], bias=False)
        lin(f"{p}.mlp.down_proj", D["hidden_size"],
            D["intermediate_size"], bias=False)
        sd[f"{p}.self_attn_layer_scale.scale"] = torch.randn(
            D["hidden_size"], generator=g) * 0.02
        sd[f"{p}.mlp_layer_scale.scale"] = torch.randn(
            D["hidden_size"], generator=g) * 0.02
    for i, r in enumerate(D["upsampling_ratios"]):
        tconv(f"decoder.upsample.{i}.0.conv", D["latent_dim"],
              D["latent_dim"], r)
        cn = f"decoder.upsample.{i}.1"
        conv(f"{cn}.dwconv.conv", D["latent_dim"], D["latent_dim"], 7,
             groups=D["latent_dim"])
        sd[f"{cn}.norm.weight"] = torch.rand(D["latent_dim"],
                                             generator=g) + 0.5
        sd[f"{cn}.norm.bias"] = torch.randn(D["latent_dim"],
                                            generator=g) * 0.02
        lin(f"{cn}.pwconv1", 4 * D["latent_dim"], D["latent_dim"])
        lin(f"{cn}.pwconv2", D["latent_dim"], 4 * D["latent_dim"])
        sd[f"{cn}.gamma"] = torch.randn(D["latent_dim"],
                                        generator=g) * 0.1
    conv("decoder.decoder.0.conv", D["decoder_dim"], D["latent_dim"], 7)
    for i, rate in enumerate(D["upsample_rates"]):
        cin = D["decoder_dim"] // 2 ** i
        cout = D["decoder_dim"] // 2 ** (i + 1)
        p = f"decoder.decoder.{i + 1}.block"
        snake(f"{p}.0", cin)
        tconv(f"{p}.1.conv", cin, cout, 2 * rate)
        for j in range(3):
            u = f"{p}.{j + 2}"
            snake(f"{u}.act1", cout)
            conv(f"{u}.conv1.conv", cout, cout, 7)
            snake(f"{u}.act2", cout)
            conv(f"{u}.conv2.conv", cout, cout, 1)
    n = len(D["upsample_rates"])
    out_dim = D["decoder_dim"] // 2 ** n
    snake(f"decoder.decoder.{n + 1}", out_dim)
    conv(f"decoder.decoder.{n + 2}.conv", 1, out_dim, 7)
    # encoder tensors must be skipped silently
    sd["encoder.downsample.weight"] = torch.randn(4, 4, 3, generator=g)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("tok12")
    with open(root / "config.json", "w") as f:
        json.dump(CFG, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------


def _o_causal_conv(sd, pre, x, k, dilation=1, stride=1, groups=1):
    keff = (k - 1) * dilation + 1
    pad = keff - stride
    length = x.shape[-1]
    n_frames = (length - keff + pad) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (keff - pad)
    x = F.pad(x, (pad, ideal - length))
    return F.conv1d(x, sd[f"{pre}.weight"].float(),
                    sd[f"{pre}.bias"].float(), stride=stride,
                    dilation=dilation, groups=groups)


def _o_tconv(sd, pre, x, k, stride):
    out = F.conv_transpose1d(x, sd[f"{pre}.weight"].float(),
                             sd[f"{pre}.bias"].float(), stride=stride)
    trim = k - stride
    return out[..., :out.shape[-1] - trim] if trim > 0 else out


def _o_snake(sd, pre, x):
    ea = torch.exp(sd[f"{pre}.alpha"].float())[None, :, None]
    ib = 1.0 / (torch.exp(sd[f"{pre}.beta"].float())[None, :, None] +
                1e-9)
    return x + ib * torch.sin(x * ea) ** 2


def _o_rms(x, w, eps=1e-5):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps)) * w.float()


def _o_transformer(sd, x):
    # x [B, T, latent]
    b, t, _ = x.shape
    hs, h, hkv = D["hidden_size"], D["num_attention_heads"], \
        D["num_key_value_heads"]
    hd = hs // h
    x = x @ sd["decoder.pre_transformer.input_proj.weight"].T.float() \
        + sd["decoder.pre_transformer.input_proj.bias"].float()
    inv = 1.0 / (D["rope_theta"] ** (torch.arange(0, hd, 2).float()
                                     / hd))
    ang = torch.arange(t).float()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    cos, sin = emb.cos(), emb.sin()

    def rope(v):
        half = v.shape[-1] // 2
        rot = torch.cat([-v[..., half:], v[..., :half]], dim=-1)
        return v * cos[None, :, None, :] + rot * sin[None, :, None, :]

    qi = torch.arange(t)[:, None]
    ki = torch.arange(t)[None, :]
    mask = (ki <= qi) & (ki > qi - D["sliding_window"])
    for li in range(D["num_hidden_layers"]):
        p = f"decoder.pre_transformer.layers.{li}"
        res = x
        hx = _o_rms(x, sd[f"{p}.input_layernorm.weight"])
        q = (hx @ sd[f"{p}.self_attn.q_proj.weight"].T.float()
             ).reshape(b, t, h, hd)
        k = (hx @ sd[f"{p}.self_attn.k_proj.weight"].T.float()
             ).reshape(b, t, hkv, hd)
        v = (hx @ sd[f"{p}.self_attn.v_proj.weight"].T.float()
             ).reshape(b, t, hkv, hd)
        q, k = rope(q), rope(k)
        k = k.repeat_interleave(h // hkv, dim=2)
        v = v.repeat_interleave(h // hkv, dim=2)
        sc = torch.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
        sc = sc.masked_fill(~mask[None, None], -1e30)
        pr = torch.softmax(sc, dim=-1)
        o = torch.einsum("bhqk,bkhd->bqhd", pr, v).reshape(b, t, hs)
        att = o @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        x = res + att * sd[f"{p}.self_attn_layer_scale.scale"].float()
        res = x
        hx = _o_rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        gate = hx @ sd[f"{p}.mlp.gate_proj.weight"].T.float()
        up = hx @ sd[f"{p}.mlp.up_proj.weight"].T.float()
        m = (F.silu(gate) * up) @ sd[f"{p}.mlp.down_proj.weight"
                                     ].T.float()
        x = res + m * sd[f"{p}.mlp_layer_scale.scale"].float()
    x = _o_rms(x, sd["decoder.pre_transformer.norm.weight"])
    return x @ sd["decoder.pre_transformer.output_proj.weight"
                  ].T.float() + \
        sd["decoder.pre_transformer.output_proj.bias"].float()


def _o_decode(sd, codes):
    # codes [B, K, T]
    cd2 = D["codebook_dim"] // 2
    quant = torch.zeros(codes.shape[0], D["codebook_dim"],
                        codes.shape[-1])
    for grp, qs in (("rvq_first", [0]),
                    ("rvq_rest", list(range(1, D["num_quantizers"])))):
        acc = torch.zeros(codes.shape[0], cd2, codes.shape[-1])
        for slot, q in enumerate(qs):
            p = f"decoder.quantizer.{grp}.vq.layers.{slot}._codebook"
            emb = sd[f"{p}.embedding_sum"].float() / \
                sd[f"{p}.cluster_usage"].float().clamp(min=1e-5)[:, None]
            acc = acc + F.embedding(codes[:, q], emb).transpose(1, 2)
        quant = quant + F.conv1d(
            acc, sd[f"decoder.quantizer.{grp}.output_proj.weight"
                    ].float())
    hid = _o_causal_conv(sd, "decoder.pre_conv.conv", quant, 3)
    hid = _o_transformer(sd, hid.transpose(1, 2)).transpose(1, 2)
    for i, r in enumerate(D["upsampling_ratios"]):
        hid = _o_tconv(sd, f"decoder.upsample.{i}.0.conv", hid, r, r)
        cn = f"decoder.upsample.{i}.1"
        inp = hid
        hid = _o_causal_conv(sd, f"{cn}.dwconv.conv", hid, 7,
                             groups=D["latent_dim"])
        hid = hid.transpose(1, 2)
        hid = F.layer_norm(hid, (D["latent_dim"],),
                           sd[f"{cn}.norm.weight"].float(),
                           sd[f"{cn}.norm.bias"].float(), eps=1e-6)
        hid = hid @ sd[f"{cn}.pwconv1.weight"].T.float() + \
            sd[f"{cn}.pwconv1.bias"].float()
        hid = F.gelu(hid)
        hid = hid @ sd[f"{cn}.pwconv2.weight"].T.float() + \
            sd[f"{cn}.pwconv2.bias"].float()
        hid = sd[f"{cn}.gamma"].float() * hid
        hid = inp + hid.transpose(1, 2)
    wav = _o_causal_conv(sd, "decoder.decoder.0.conv", hid, 7)
    for i, rate in enumerate(D["upsample_rates"]):
        p = f"decoder.decoder.{i + 1}.block"
        wav = _o_snake(sd, f"{p}.0", wav)
        wav = _o_tconv(sd, f"{p}.1.conv", wav, 2 * rate, rate)
        for j, dil in enumerate((1, 3, 9)):
            u = f"{p}.{j + 2}"
            res = wav
            wav = _o_snake(sd, f"{u}.act1", wav)
            wav = _o_causal_conv(sd, f"{u}.conv1.conv", wav, 7,
                                 dilation=dil)
            wav = _o_snake(sd, f"{u}.act2", wav)
            wav = _o_causal_conv(sd, f"{u}.conv2.conv", wav, 1)
            wav = wav + res
    n = len(D["upsample_rates"])
    wav = _o_snake(sd, f"decoder.decoder.{n + 1}", wav)
    wav = _o_causal_conv(sd, f"decoder.decoder.{n + 2}.conv", wav, 7)
    return wav.clamp(-1, 1)[:, 0]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_decoder_tensor(ckpt_dir):
    cfg, params = load_tok12(ckpt_dir)
    assert cfg.num_quantizers == 3 and cfg.sliding_window == 6
    assert cfg.total_upsample == 8
    assert len(params["quantizer"]["rvq_rest"]["layers"]) == 2
    assert params["pre_conv"]["w"].shape == (3, 16, 16)
    assert params["dec_blocks"][1]["conv"]["w"].shape == (4, 8, 16)


def test_decode_parity_vs_torch_oracle(ckpt_dir):
    cfg, params = load_tok12(ckpt_dir)
    sd = _tiny_state_dict()
    rng = np.random.default_rng(5)
    codes = rng.integers(0, D["codebook_size"],
                         (1, D["num_quantizers"], 17)).astype(np.int32)
    wav = np.asarray(tok12_decode(params, cfg, jnp.asarray(codes)))
    golden = _o_decode(sd, torch.from_numpy(codes.astype(np.int64))
                       ).numpy()
    assert wav.shape == golden.shape == (1, 17 * cfg.total_upsample)
    np.testing.assert_allclose(wav, golden, rtol=3e-4, atol=3e-4)
    assert np.abs(wav).max() <= 1.0


def test_chunked_decode_matches_full(ckpt_dir):
    """Streaming chunks primed with left context reproduce the
    full-sequence decode exactly once the context covers the decoder's
    receptive field (layers×(window−1) + conv lookback). With a shorter
    context the output is an approximation — the reference ships
    chunk=300/context=25 against window=72 (chunked_decode :1030), so
    the partial-context case must still be numerically close."""
    cfg, params = load_tok12(ckpt_dir)
    dec = Tok12Decoder(cfg, params)
    rng = np.random.default_rng(6)
    codes = rng.integers(0, D["codebook_size"],
                         (1, D["num_quantizers"], 23)).astype(np.int32)
    full = dec.decode(codes)
    # context >= total receptive field → exact. (The operational
    # partial-context quality bound only holds for TRAINED weights —
    # random weights are not contractive, so it is not asserted here.)
    exact = dec.chunked_decode(codes, chunk_size=6,
                               left_context_size=22)
    assert exact.shape == full.shape
    np.testing.assert_allclose(exact, full, rtol=1e-4, atol=1e-5)
