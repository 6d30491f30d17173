"""code2wav vocoder: codec hidden states → waveform (BigVGAN-class).

Reference parity: the code2wav towers of qwen2_5_omni/qwen3_omni
(token2wav / code2wav generation stages — BigVGAN-family conv upsamplers
driven as a "generation" worker, reference
model_executor/models/qwen3_omni, worker/gpu_generation_model_runner.py).

Structure (BigVGAN / HiFi-GAN generator):
  input proj → per stage: snake → transposed-conv upsample →
  MRF (multi-receptive-field fusion: parallel resblocks with kernel
  sizes (3,7,11) × dilations (1,3,5), averaged) → snake → conv head →
  tanh. Snake activation x + sin²(αx)/α with a learnable per-channel α
  (periodic inductive bias for audio). BigVGAN-v2's anti-aliased
  (low-pass filtered) activation variant is omitted — XLA fuses the
  plain form into the convs, and the AA filter is a quality knob, not
  structure.

Runs as one jit program over the whole (bucketed) frame sequence; all
convs map onto the MXU via NTC conv_general_dilated.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


@dataclass(frozen=True)
class VocoderConfig:
    input_dim: int = 1024  # codec hidden width from the talker
    channels: int = 256
    upsample_factors: tuple[int, ...] = (5, 4, 4, 3)  # prod = 240
    mrf_kernels: tuple[int, ...] = (3, 7, 11)
    mrf_dilations: tuple[int, ...] = (1, 3, 5)
    sample_rate: int = 24000

    @property
    def samples_per_frame(self) -> int:
        n = 1
        for f in self.upsample_factors:
            n *= f
        return n


def _snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """x + sin²(αx)/α, per-channel α (BigVGAN snake)."""
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)
    return (xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)).astype(x.dtype)


def _conv1d(x: jnp.ndarray, p: Params, stride: int = 1,
            dilation: int = 1) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding="SAME", rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _conv_transpose1d(x: jnp.ndarray, p: Params,
                      stride: int) -> jnp.ndarray:
    out = jax.lax.conv_transpose(
        x, p["w"].astype(x.dtype), strides=(stride,), padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _resblock(x: jnp.ndarray, block: Params,
              dilations: tuple[int, ...]) -> jnp.ndarray:
    """HiFi-GAN ResBlock1: per dilation d, x += conv1(snake(conv_d(
    snake(x))))."""
    for i, d in enumerate(dilations):
        xt = _conv1d(_snake(x, block["alpha1"][i]), block["convs1"][i],
                     dilation=d)
        xt = _conv1d(_snake(xt, block["alpha2"][i]), block["convs2"][i])
        x = x + xt
    return x


def vocoder_forward(params: Params, cfg: VocoderConfig,
                    codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, T, input_dim] → waveform [B, T * samples_per_frame]."""
    x = _conv1d(codes, params["conv_in"])
    for i, factor in enumerate(cfg.upsample_factors):
        stage = params["stages"][i]
        x = _conv_transpose1d(_snake(x, stage["alpha_up"]), stage["up"],
                              factor)
        # MRF: parallel receptive fields, averaged
        acc = None
        for k, block in enumerate(stage["mrf"]):
            r = _resblock(x, block, cfg.mrf_dilations)
            acc = r if acc is None else acc + r
        x = acc / len(stage["mrf"])
    wav = _conv1d(_snake(x, params["alpha_out"]), params["conv_out"])
    return jnp.tanh(wav.astype(jnp.float32))[..., 0]


def init_vocoder(cfg: VocoderConfig, key, dtype=jnp.float32) -> Params:
    n_keys = (len(cfg.upsample_factors) *
              (1 + len(cfg.mrf_kernels) * len(cfg.mrf_dilations) * 2)
              + 8)
    keys = iter(jax.random.split(key, n_keys))

    def conv(k, cin, cout):
        return {"w": (jax.random.normal(next(keys), (k, cin, cout),
                                        jnp.float32) *
                      (k * cin) ** -0.5).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    c = cfg.channels
    params: Params = {
        "conv_in": conv(7, cfg.input_dim, c),
        "stages": [],
    }
    cin = c
    for i, factor in enumerate(cfg.upsample_factors):
        cout = max(c // 2 ** (i + 1), 8)
        stage: Params = {
            "alpha_up": jnp.ones((cin,), dtype),
            "up": conv(2 * factor, cin, cout),
            "mrf": [],
        }
        for k in cfg.mrf_kernels:
            stage["mrf"].append({
                "alpha1": [jnp.ones((cout,), dtype)
                           for _ in cfg.mrf_dilations],
                "alpha2": [jnp.ones((cout,), dtype)
                           for _ in cfg.mrf_dilations],
                "convs1": [conv(k, cout, cout)
                           for _ in cfg.mrf_dilations],
                "convs2": [conv(k, cout, cout)
                           for _ in cfg.mrf_dilations],
            })
        params["stages"].append(stage)
        cin = cout
    params["alpha_out"] = jnp.ones((cin,), dtype)
    params["conv_out"] = conv(7, cin, 1)
    return params


class Code2WavPostprocessor:
    """Final-stage output hook: hidden states → audio dict (reference:
    per-model post-process registry, diffusion/registry.py:344/:381;
    configured via stage `custom_process_output_func`)."""

    _instances: dict = {}

    def __init__(self, input_dim: int = 1024, seed: int = 0,
                 **cfg_kwargs: Any) -> None:
        self.cfg = VocoderConfig(input_dim=input_dim, **cfg_kwargs)
        self.params = init_vocoder(self.cfg, jax.random.PRNGKey(seed))
        self._fn = jax.jit(
            lambda p, c: vocoder_forward(p, self.cfg, c))

    def __call__(self, output) -> None:
        comp = output.outputs[0] if output.outputs else None
        if comp is None or comp.hidden_states is None:
            return
        hs = np.asarray(comp.hidden_states, np.float32)
        wav = np.asarray(self._fn(self.params, jnp.asarray(hs[None])))[0]
        output.multimodal_output["audio"] = {
            "data": wav, "sample_rate": self.cfg.sample_rate}


def code2wav_postprocess(output) -> None:
    """Dotted-path entry for stage configs: applies a cached
    Code2WavPostprocessor sized to the stage's hidden width."""
    comp = output.outputs[0] if output.outputs else None
    if comp is None or comp.hidden_states is None:
        return
    dim = int(np.asarray(comp.hidden_states).shape[-1])
    inst = Code2WavPostprocessor._instances.get(dim)
    if inst is None:
        inst = Code2WavPostprocessor(input_dim=dim)
        Code2WavPostprocessor._instances[dim] = inst
    inst(output)
