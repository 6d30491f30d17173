"""Oobleck waveform-VAE decoder parity vs a torch oracle.

The oracle re-implements diffusers' AutoencoderOobleck decoder module
semantics (Snake1d log-scale activation, weight-normed convs,
ConvTranspose1d(k=2s, stride s, pad ⌈s/2⌉) upsampling, residual units at
dilations 1/3/9) with genuine torch weight_norm so the state dict ships
the real `weight_g`/`weight_v` names the checkpoints use. Reference:
models/stable_audio/pipeline_stable_audio.py vae.decode."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.vae_oobleck import (  # noqa: E402
    OobleckConfig, assign_oobleck_tensor, finalize_oobleck_params,
    init_oobleck_params, oobleck_decode)

CFG = OobleckConfig(decoder_channels=8, decoder_input_channels=4,
                    audio_channels=2, downsampling_ratios=(2, 4),
                    channel_multiples=(2, 4))


class Snake1d(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.alpha = nn.Parameter(torch.randn(1, dim, 1) * 0.2)
        self.beta = nn.Parameter(torch.randn(1, dim, 1) * 0.2)

    def forward(self, x):
        a, b = torch.exp(self.alpha), torch.exp(self.beta)
        return x + (b + 1e-9).reciprocal() * torch.sin(a * x).pow(2)


class ResUnit(nn.Module):
    def __init__(self, dim, dilation):
        super().__init__()
        pad = ((7 - 1) * dilation) // 2
        self.snake1 = Snake1d(dim)
        self.conv1 = weight_norm(nn.Conv1d(dim, dim, 7,
                                           dilation=dilation,
                                           padding=pad))
        self.snake2 = Snake1d(dim)
        self.conv2 = weight_norm(nn.Conv1d(dim, dim, 1))

    def forward(self, x):
        y = self.conv1(self.snake1(x))
        y = self.conv2(self.snake2(y))
        return x + y


class DecBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.snake1 = Snake1d(cin)
        self.conv_t1 = weight_norm(nn.ConvTranspose1d(
            cin, cout, 2 * stride, stride=stride,
            padding=math.ceil(stride / 2)))
        self.res_unit1 = ResUnit(cout, 1)
        self.res_unit2 = ResUnit(cout, 3)
        self.res_unit3 = ResUnit(cout, 9)

    def forward(self, x):
        x = self.conv_t1(self.snake1(x))
        return self.res_unit3(self.res_unit2(self.res_unit1(x)))


class Decoder(nn.Module):
    def __init__(self, cfg: OobleckConfig):
        super().__init__()
        mult = (1,) + tuple(cfg.channel_multiples)
        ch = cfg.decoder_channels
        ups = cfg.upsampling_ratios
        n = len(ups)
        self.conv1 = weight_norm(nn.Conv1d(
            cfg.decoder_input_channels, ch * mult[-1], 7, padding=3))
        self.block = nn.ModuleList([
            DecBlock(ch * mult[n - i], ch * mult[n - i - 1], s)
            for i, s in enumerate(ups)])
        self.snake1 = Snake1d(ch)
        self.conv2 = weight_norm(nn.Conv1d(ch, cfg.audio_channels, 7,
                                           padding=3, bias=False))

    def forward(self, x):
        x = self.conv1(x)
        for b in self.block:
            x = b(x)
        return self.conv2(self.snake1(x))


def test_oobleck_decode_parity():
    torch.manual_seed(0)
    dec = Decoder(CFG).eval()
    sd = {"decoder." + k: v.detach().numpy()
          for k, v in dec.state_dict().items()}
    params = init_oobleck_params(CFG)
    unmapped = [k for k, v in sd.items()
                if not assign_oobleck_tensor(params, k, v)]
    assert not unmapped, unmapped
    n = finalize_oobleck_params(params)
    # conv1 + conv2 + per block (conv_t1 + 3 res units × 2 convs)
    assert n == 2 + 7 * len(CFG.upsampling_ratios)

    lat = np.random.default_rng(1).normal(
        size=(2, 4, 50)).astype(np.float32)  # torch layout [B, C, L]
    with torch.no_grad():
        want = dec(torch.from_numpy(lat)).numpy()
    got = np.asarray(oobleck_decode(
        params, CFG, jnp.asarray(lat.transpose(0, 2, 1))))
    # ours is channels-last
    got = got.transpose(0, 2, 1)
    assert got.shape == want.shape == (2, 2, 50 * CFG.hop)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_stable_audio_e2e_decodes_waveform(tmp_path):
    """A stable_audio pipeline dir whose vae/ ships Oobleck weights
    decodes latents → waveform end-to-end (no more raw-latent
    workaround, VERDICT r4 item 2 / pipeline.py:1344)."""
    import json

    from safetensors.torch import save_file

    from tests.diffusion.test_stable_audio_loader import (
        TINY, _tiny_state_dict)
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    root = tmp_path / "sa"
    for d in ("transformer", "scheduler", "vae"):
        (root / d).mkdir(parents=True)
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "StableAudioPipeline",
                   "transformer": ["diffusers", "StableAudioDiTModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderOobleck"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "StableAudioDiTModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0}, f)
    vae_cfg = OobleckConfig(
        decoder_channels=8, decoder_input_channels=TINY["in_channels"],
        audio_channels=2, downsampling_ratios=(2, 4),
        channel_multiples=(2, 4))
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderOobleck",
                   "audio_channels": 2,
                   "decoder_channels": 8,
                   "decoder_input_channels": TINY["in_channels"],
                   "channel_multiples": [2, 4],
                   "downsampling_ratios": [2, 4],
                   "sampling_rate": 44100}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    torch.manual_seed(1)
    dec = Decoder(vae_cfg).eval()
    save_file({"decoder." + k: v.detach().clone()
               for k, v in dec.state_dict().items()},
              str(root / "vae" / "diffusion_pytorch_model.safetensors"))

    eng = DiffusionEngine(DiffusionConfig(model=str(root),
                                          dtype="float32",
                                          flow_shift=1.0))
    assert eng.pipeline.vae_kind == "oobleck"
    out = eng.generate([DiffusionRequest(
        "r0", "rain",
        DiffusionSamplingParams(num_inference_steps=2,
                                guidance_scale=3.0, seed=0,
                                output_type="np",
                                extra_args={"audio_end_in_s": 2.0}))])[0]
    assert out.finished and out.error is None, out.error
    # 64 latent frames × hop 8 samples, 2 audio channels
    assert out.audio.shape == (1, 64 * vae_cfg.hop, 2)
    assert np.isfinite(out.audio).all()
