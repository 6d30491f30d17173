"""Perceptual-similarity harness (LPIPS role).

Reference parity: tests/e2e/offline_inference/compute_lpips.py — the
reference's accuracy tier scores generated images against goldens with
LPIPS. This TPU-native stand-in computes a multi-scale random-feature
distance: a FIXED (seeded) stack of strided convs + nonlinearities
embeds both images and the distance is the mean normalized feature
L2 across scales. Random convolutional features are a standard
perceptual-metric proxy (they correlate with LPIPS far better than
pixel MSE and need no downloaded VGG weights, which this offline
environment cannot fetch); the absolute scale differs from LPIPS so
thresholds are calibrated against the self-similarity tests in
tests/accuracy/."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _feature_stack(key, in_ch: int, widths=(16, 32, 64)):
    params = []
    ch = in_ch
    for i, w in enumerate(widths):
        k1, key = jax.random.split(key)
        params.append(jax.random.normal(k1, (3, 3, ch, w),
                                        jnp.float32) *
                      (2.0 / (9 * ch)) ** 0.5)
        ch = w
    return params


def perceptual_distance(a: np.ndarray, b: np.ndarray,
                        seed: int = 0) -> float:
    """a, b: [H, W, 3] float in [0, 1] (or [B, H, W, 3] — batch
    averaged). → scalar distance ≥ 0 (0 iff identical)."""
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    if a.ndim == 3:
        a, b = a[None], b[None]
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    params = _feature_stack(jax.random.PRNGKey(seed), a.shape[-1])
    xa = jnp.asarray(a) * 2.0 - 1.0
    xb = jnp.asarray(b) * 2.0 - 1.0
    total = 0.0
    for w in params:
        xa = jax.nn.leaky_relu(jax.lax.conv_general_dilated(
            xa, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.2)
        xb = jax.nn.leaky_relu(jax.lax.conv_general_dilated(
            xb, w, (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), 0.2)
        # unit-normalize channels (LPIPS convention) then L2
        na = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-8)
        nb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-8)
        total = total + jnp.mean((na - nb) ** 2)
    return float(total) / len(params)
