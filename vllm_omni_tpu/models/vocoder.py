"""code2wav vocoder: codec hidden states → waveform.

Reference parity: the code2wav towers of qwen2_5_omni/qwen3_omni
(token2wav / code2wav generation stages — BigVGAN-class conv upsamplers
driven as a "generation" worker, reference
model_executor/models/qwen3_omni, worker/gpu_generation_model_runner.py).

Structure: input proj → N transposed-conv upsample stages (stride
prod = samples-per-frame) with leaky-relu resblocks → tanh head. Runs as
one jit program over the whole (bucketed) frame sequence.
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
    sample_rate: int = 24000

    @property
    def samples_per_frame(self) -> int:
        n = 1
        for f in self.upsample_factors:
            n *= f
        return n


def _conv1d(x: jnp.ndarray, p: Params, stride: int = 1) -> jnp.ndarray:
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding="SAME", dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    b, t, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :], (b, t, factor, c))
    return x.reshape(b, t * factor, c)


def vocoder_forward(params: Params, cfg: VocoderConfig,
                    codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, T, input_dim] → waveform [B, T * samples_per_frame]."""
    x = _conv1d(codes, params["conv_in"])
    for i, factor in enumerate(cfg.upsample_factors):
        x = _upsample(x, factor)
        stage = params["stages"][i]
        x = _conv1d(jax.nn.leaky_relu(x.astype(jnp.float32), 0.1).astype(
            x.dtype), stage["conv"])
        # residual block
        r = _conv1d(jax.nn.leaky_relu(x.astype(jnp.float32), 0.1).astype(
            x.dtype), stage["res1"])
        r = _conv1d(jax.nn.leaky_relu(r.astype(jnp.float32), 0.1).astype(
            x.dtype), stage["res2"])
        x = x + r
    wav = _conv1d(jax.nn.leaky_relu(x.astype(jnp.float32), 0.1).astype(
        x.dtype), params["conv_out"])
    return jnp.tanh(wav.astype(jnp.float32))[..., 0]


def init_vocoder(cfg: VocoderConfig, key, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, len(cfg.upsample_factors) * 4 + 4))

    def conv(k, cin, cout):
        return {"w": (jax.random.normal(next(keys), (k, cin, cout),
                                        jnp.float32) *
                      (k * cin) ** -0.5).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    c = cfg.channels
    params: Params = {
        "conv_in": conv(7, cfg.input_dim, c),
        "stages": [],
        "conv_out": conv(7, max(c // 2 ** len(cfg.upsample_factors), 8), 1),
    }
    cin = c
    for i in range(len(cfg.upsample_factors)):
        cout = max(c // 2 ** (i + 1), 8)
        params["stages"].append({
            "conv": conv(7, cin, cout),
            "res1": conv(3, cout, cout),
            "res2": conv(3, cout, cout),
        })
        cin = cout
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
