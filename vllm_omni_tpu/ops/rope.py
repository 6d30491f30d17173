"""Rotary position embeddings.

Covers the variants the reference's model zoo needs: standard NeoX-style
RoPE (Llama/Qwen), scaling (linear / yarn hooks), and multimodal M-RoPE
(reference patches vLLM's MRotaryEmbedding, patch.py:108-119; 3-section
time/height/width position ids for Qwen-VL/Omni models).
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_inv_freq(head_dim: int, rope_theta: float) -> jnp.ndarray:
    return 1.0 / (rope_theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def compute_cos_sin(positions: jnp.ndarray, head_dim: int,
                    rope_theta: float = 10000.0,
                    scaling_factor: float = 1.0) -> tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """positions: [...] int32 → cos,sin [..., head_dim//2] f32."""
    inv_freq = compute_inv_freq(head_dim, rope_theta)
    if scaling_factor != 1.0:
        inv_freq = inv_freq / scaling_factor
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(freqs), jnp.sin(freqs)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
               sin: jnp.ndarray) -> jnp.ndarray:
    """NeoX-style (rotate half) RoPE.

    x: [..., num_heads, head_dim]; cos/sin: [..., head_dim//2] broadcast
    over the heads axis.
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    out = jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(orig_dtype)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray,
                           sin: jnp.ndarray) -> jnp.ndarray:
    """GPT-J-style interleaved RoPE: rotation pairs are consecutive
    elements (x[2i], x[2i+1]), not half-split. Fish Speech trains with
    this style (reference fish_speech_fast_ar.py:88 is_neox_style=False).

    x: [..., num_heads, head_dim]; cos/sin: [..., head_dim//2] broadcast
    over the heads axis.
    """
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.reshape(x.shape).astype(orig_dtype)


def apply_rope_glm4(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                    rotary_dim: int) -> jnp.ndarray:
    """GLM-4 partial rotary (transformers glm4 apply_rotary_pos_emb):
    GPT-J-style INTERLEAVED rotation (glm4's rotate_half pairs
    consecutive elements) applied to only the first ``rotary_dim``
    dims; the rest pass through. cos/sin: [..., rotary_dim//2] angles
    (compute_cos_sin with head_dim=rotary_dim);
    x: [..., num_heads, head_dim]."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    r = rotary_dim
    x_rot, x_pass = x[..., :r], x[..., r:]
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    out = jnp.stack([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    out = out.reshape(x_rot.shape)
    return jnp.concatenate([out, x_pass], -1).astype(orig_dtype)


def compute_mrope_cos_sin(positions: jnp.ndarray, head_dim: int,
                          mrope_section: tuple[int, ...],
                          rope_theta: float = 10000.0
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """M-RoPE: positions [3, T] (time/height/width ids); the head_dim/2
    frequency slots are split between the 3 sections
    (reference: vLLM MRotaryEmbedding semantics)."""
    assert positions.ndim == 2 and positions.shape[0] == len(mrope_section)
    cos_all, sin_all = compute_cos_sin(positions, head_dim, rope_theta)
    # cos_all: [3, T, head_dim//2] → select per frequency-band section
    chunks_c, chunks_s = [], []
    start = 0
    for i, sec in enumerate(mrope_section):
        chunks_c.append(cos_all[i, :, start:start + sec])
        chunks_s.append(sin_all[i, :, start:start + sec])
        start += sec
    return jnp.concatenate(chunks_c, -1), jnp.concatenate(chunks_s, -1)
