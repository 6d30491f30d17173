"""ECAPA-TDNN speaker encoder parity vs an independent torch oracle
(reference qwen3_tts_talker.py:61-246) + mel-frontend checks."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.speaker_encoder import (  # noqa: E402
    SpeakerEncoderConfig, assign_speaker_tensor,
    extract_speaker_embedding, init_speaker_encoder_params,
    mel_spectrogram_np, slaney_mel_fbank, speaker_encode)

CFG = SpeakerEncoderConfig(
    mel_dim=8, enc_dim=12, enc_channels=(16, 16, 16, 16, 24),
    enc_kernel_sizes=(5, 3, 3, 3, 1), enc_dilations=(1, 2, 3, 4, 1),
    enc_attention_channels=8, enc_res2net_scale=4, enc_se_channels=8,
    sample_rate=16000)


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = torch.randn(o, i, k, generator=g) * 0.2
        sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.02

    ch = CFG.enc_channels
    conv("blocks.0.conv", ch[0], CFG.mel_dim, CFG.enc_kernel_sizes[0])
    for i in range(1, len(ch) - 1):
        p = f"blocks.{i}"
        conv(f"{p}.tdnn1.conv", ch[i], ch[i - 1], 1)
        n = ch[i] // CFG.enc_res2net_scale
        for j in range(CFG.enc_res2net_scale - 1):
            conv(f"{p}.res2net_block.blocks.{j}.conv", n, n,
                 CFG.enc_kernel_sizes[i])
        conv(f"{p}.tdnn2.conv", ch[i], ch[i], 1)
        conv(f"{p}.se_block.conv1", CFG.enc_se_channels, ch[i], 1)
        conv(f"{p}.se_block.conv2", ch[i], CFG.enc_se_channels, 1)
    conv("mfa.conv", ch[-1], sum(ch[1:-1]), CFG.enc_kernel_sizes[-1])
    conv("asp.tdnn.conv", CFG.enc_attention_channels, ch[-1] * 3, 1)
    conv("asp.conv", ch[-1], CFG.enc_attention_channels, 1)
    conv("fc", CFG.enc_dim, ch[-1] * 2, 1)
    return sd


# ---------------------------------------------------------------------------
# torch oracle (functional, NCL)
# ---------------------------------------------------------------------------


def _o_conv(sd, pre, x, k, dil=1):
    total = (k - 1) * dil
    left = total // 2
    if total:
        x = F.pad(x, (left, total - left), mode="reflect")
    return F.conv1d(x, sd[f"{pre}.weight"].float(),
                    sd[f"{pre}.bias"].float(), dilation=dil)


def _o_tdnn(sd, pre, x, k, dil=1):
    return F.relu(_o_conv(sd, f"{pre}.conv", x, k, dil))


def _o_encoder(sd, mels):
    # mels [B, C, T]
    x = _o_tdnn(sd, "blocks.0", mels, CFG.enc_kernel_sizes[0],
                CFG.enc_dilations[0])
    feats = []
    for i in range(1, len(CFG.enc_channels) - 1):
        p = f"blocks.{i}"
        res = x
        h = _o_tdnn(sd, f"{p}.tdnn1", x, 1)
        parts = torch.chunk(h, CFG.enc_res2net_scale, dim=1)
        outs = []
        for j, part in enumerate(parts):
            if j == 0:
                out = part
            elif j == 1:
                out = _o_tdnn(sd, f"{p}.res2net_block.blocks.{j - 1}",
                              part, CFG.enc_kernel_sizes[i],
                              CFG.enc_dilations[i])
            else:
                out = _o_tdnn(sd, f"{p}.res2net_block.blocks.{j - 1}",
                              part + out, CFG.enc_kernel_sizes[i],
                              CFG.enc_dilations[i])
            outs.append(out)
        h = torch.cat(outs, dim=1)
        h = _o_tdnn(sd, f"{p}.tdnn2", h, 1)
        m = h.mean(dim=2, keepdim=True)
        m = F.relu(_o_conv(sd, f"{p}.se_block.conv1", m, 1))
        m = torch.sigmoid(_o_conv(sd, f"{p}.se_block.conv2", m, 1))
        x = h * m + res
        feats.append(x)
    x = torch.cat(feats, dim=1)
    x = _o_tdnn(sd, "mfa", x, CFG.enc_kernel_sizes[-1],
                CFG.enc_dilations[-1])
    # attentive statistics pooling (uniform mask: lengths == T)
    t = x.shape[-1]
    total = float(t)
    mean = x.sum(2) / total
    std = torch.sqrt((((x - mean.unsqueeze(2)) ** 2).sum(2) / total)
                     .clamp(1e-12))
    attn = torch.cat([x, mean.unsqueeze(2).repeat(1, 1, t),
                      std.unsqueeze(2).repeat(1, 1, t)], dim=1)
    attn = _o_conv(sd, "asp.conv",
                   torch.tanh(_o_tdnn(sd, "asp.tdnn", attn, 1)), 1)
    attn = F.softmax(attn, dim=2)
    mean = (attn * x).sum(2)
    std = torch.sqrt(((attn * (x - mean.unsqueeze(2)) ** 2).sum(2))
                     .clamp(1e-12))
    pooled = torch.cat([mean, std], dim=1).unsqueeze(2)
    return _o_conv(sd, "fc", pooled, 1).squeeze(-1)


def test_encoder_parity_vs_torch_oracle():
    sd = _tiny_state_dict()
    params = init_speaker_encoder_params(CFG)
    unmapped = [n for n in sd
                if not assign_speaker_tensor(
                    params, "speaker_encoder." + n[:-len(".weight")]
                    if False else "speaker_encoder." + n,
                    sd[n].numpy())]
    assert unmapped == []
    rng = np.random.default_rng(4)
    mels = rng.standard_normal((2, 25, CFG.mel_dim)).astype(np.float32)
    ours = np.asarray(speaker_encode(params, CFG, jnp.asarray(mels)))
    golden = _o_encoder(sd, torch.from_numpy(
        mels.transpose(0, 2, 1))).numpy()
    assert ours.shape == golden.shape == (2, CFG.enc_dim)
    np.testing.assert_allclose(ours, golden, rtol=3e-4, atol=3e-4)


def test_mel_frontend_vs_torch_stft():
    """Framing + rfft + slaney fbank vs torch.stft with a hann window
    (reference mel_spectrogram :250 — reflect pad, center=False)."""
    rng = np.random.default_rng(7)
    wav = (rng.random(4000) * 1.6 - 0.8).astype(np.float32)
    n_fft, hop, win, n_mels, sr = 400, 160, 400, 8, 16000
    ours = mel_spectrogram_np(wav, n_fft, n_mels, sr, hop, win)
    y = torch.from_numpy(wav)[None]
    pad = (n_fft - hop) // 2
    y = F.pad(y.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(y, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      return_complex=True)
    mag = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + 1e-9)
    fb = torch.from_numpy(slaney_mel_fbank(sr, n_fft, n_mels))
    want = torch.log(torch.clamp(fb @ mag[0], min=1e-5)).numpy()
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_extract_embedding_runs():
    sd = _tiny_state_dict()
    params = init_speaker_encoder_params(CFG)
    for n in sd:
        assign_speaker_tensor(params, "speaker_encoder." + n,
                              sd[n].numpy())
    wav = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    emb = extract_speaker_embedding(params, CFG, wav)
    assert emb.shape == (CFG.enc_dim,)
    assert np.isfinite(emb).all()
