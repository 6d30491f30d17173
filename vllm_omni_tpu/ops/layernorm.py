"""Normalization ops.

These are bandwidth-bound elementwise ops that XLA fuses into neighbouring
matmuls on TPU — a hand-written Pallas kernel buys nothing here, so jnp is
the production path (unlike the reference, which needed fused CUDA RMSNorm
from upstream vLLM because torch eager wouldn't fuse).
"""

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray,
             eps: float = 1e-6) -> jnp.ndarray:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(orig_dtype)


def rms_norm_residual(x: jnp.ndarray, residual: jnp.ndarray,
                      weight: jnp.ndarray,
                      eps: float = 1e-6) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused add + norm used between transformer sublayers: returns
    (normed, new_residual)."""
    resid = (x.astype(jnp.float32) + residual.astype(jnp.float32))
    return rms_norm(resid, weight, eps).astype(x.dtype), resid.astype(x.dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * lax.rsqrt(var + eps)
    out = x * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def ada_layer_norm(x: jnp.ndarray, scale: jnp.ndarray, shift: jnp.ndarray,
                   eps: float = 1e-6) -> jnp.ndarray:
    """AdaLN modulation used by DiT blocks (scale/shift from timestep
    embedding). Norm without learned affine, then modulate."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * lax.rsqrt(var + eps)
    return (x * (1 + scale.astype(jnp.float32)) +
            shift.astype(jnp.float32)).astype(orig_dtype)
