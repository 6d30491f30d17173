"""Video postprocessing: frame interpolation.

Reference parity: postprocess/rife_interpolator.py (RIFE frame
interpolation doubling video fps after generation). Same role here: a
small conv interpolation net synthesizes midpoint frames from adjacent
pairs; all pairs batch through one jit program (MXU-friendly — no
per-pair Python loop on device).

Random-init tier synthesizes plausible midpoints via the residual
formulation (midpoint = average + learned residual, residual ≈ 0 at
init); real RIFE weights map onto the same structure later.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.diffusion.vae import _conv_init, conv2d
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


def init_interp_params(key, channels: int = 32, dtype=jnp.float32) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv_in": _conv_init(k1, 3, 3, 6, channels, dtype),
        "conv_mid": _conv_init(k2, 3, 3, channels, channels, dtype),
        # zero-init head → identity (average) interpolation at init
        "conv_out": {
            "w": jnp.zeros((3, 3, channels, 3), dtype),
            "b": jnp.zeros((3,), dtype),
        },
    }


def interp_forward(params: dict, a: jnp.ndarray,
                   b: jnp.ndarray) -> jnp.ndarray:
    """a, b: [N, H, W, 3] float in [-1, 1] → midpoint frames [N, H, W, 3]
    = (a+b)/2 + residual(a, b)."""
    x = jnp.concatenate([a, b], axis=-1)
    h = jax.nn.relu(conv2d(x, params["conv_in"]).astype(jnp.float32)
                    ).astype(x.dtype)
    h = jax.nn.relu(conv2d(h, params["conv_mid"]).astype(jnp.float32)
                    ).astype(x.dtype)
    residual = conv2d(h, params["conv_out"])
    return jnp.clip((a + b) * 0.5 + residual, -1.0, 1.0)


class FrameInterpolator:
    """fps-doubling interpolator: [F, H, W, C] → [2F-1, H, W, C]."""

    _instance = None

    def __init__(self, seed: int = 0) -> None:
        self.params = init_interp_params(jax.random.PRNGKey(seed))
        self._fn = jax.jit(interp_forward)

    def interpolate(self, frames: np.ndarray,
                    rounds: int = 1) -> np.ndarray:
        """frames [F, H, W, C] uint8 or float; each round doubles the
        frame rate (F → 2F-1)."""
        as_uint8 = frames.dtype == np.uint8
        x = frames.astype(np.float32)
        if as_uint8:
            x = x / 127.5 - 1.0
        for _ in range(rounds):
            a, b = x[:-1], x[1:]
            mids = np.asarray(self._fn(self.params, jnp.asarray(a),
                                       jnp.asarray(b)))
            out = np.empty((2 * len(x) - 1,) + x.shape[1:], np.float32)
            out[0::2] = x
            out[1::2] = mids
            x = out
        if as_uint8:
            x = np.rint((x + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        return x


def interpolate_video_postprocess(output) -> None:
    """Final-stage output hook (custom_process_output_func): doubles the
    fps of a video output in place."""
    video = output.multimodal_output.get("video")
    if video is None:
        return
    if FrameInterpolator._instance is None:
        FrameInterpolator._instance = FrameInterpolator()
    output.multimodal_output["video"] = \
        FrameInterpolator._instance.interpolate(np.asarray(video))
