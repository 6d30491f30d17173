"""Dense flash attention (full-sequence, DiT/encoder variant).

Replaces the reference's flash-attn/FA3/SageAttention dependency for the
diffusion attention backends (SURVEY.md §2.9 row 2: "Pallas fused
attention (full-sequence, non-causal DiT variant)"). The XLA path
materializes [B, H, T, S] scores — ~1.7 GB/layer for a 1024² image's
4k-token stream; this kernel keeps everything blocked in VMEM with
online softmax.

Layout: inputs reshaped to [B·H, T, D]; grid (B·H, T/BQ). Each program
holds its (b, h) row's full K/V tile in VMEM (S·D ≤ ~2 MB at DiT sizes)
and loops S in chunks with the online-softmax merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_tpu.utils import cdiv

NEG_INF = -1e30


def _flash_kernel(seq_lens_ref, q_ref, k_ref, v_ref, o_ref, *,
                  block_s: int, causal: bool, scale: float,
                  q_block: int, s_true: int):
    qb = pl.program_id(1)
    s_total = k_ref.shape[1]
    s_len = seq_lens_ref[0]
    q = q_ref[0].astype(jnp.float32)  # [BQ, D]
    bq, d = q.shape
    q_pos = qb * q_block + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)

    def body(i, carry, *, masked: bool):
        acc, m, l = carry
        # f32 operands measured FASTER than bf16-in/f32-acc here
        # (6.30 vs 6.79 ms at the 4160-token DiT shape) — the kernel is
        # not MXU-cast-bound at these tile sizes
        ks = k_ref[0, pl.ds(i * block_s, block_s), :].astype(jnp.float32)
        vs = v_ref[0, pl.ds(i * block_s, block_s), :].astype(jnp.float32)
        s = jnp.dot(q, ks.T, preferred_element_type=jnp.float32) * scale
        if masked:
            kv_pos = i * block_s + jax.lax.broadcasted_iota(
                jnp.int32, (1, block_s), 1)
            mask = kv_pos < s_len
            if causal:
                mask = mask & (kv_pos <= q_pos)
            s = jnp.where(mask, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, -1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p, vs,
                                        preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    init = (jnp.zeros((bq, d), jnp.float32),
            jnp.full((bq, 1), NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32))
    n_blocks = s_total // block_s
    if causal:
        # every block needs the causal mask (pad mask rides along)
        carry = jax.lax.fori_loop(
            0, n_blocks, functools.partial(body, masked=True), init)
    else:
        # pad masking is STATIC: only blocks past the true sequence end
        # carry padded columns — the main loop skips the per-block mask
        # compare/where entirely (pure MXU + online softmax)
        full = s_true // block_s
        carry = jax.lax.fori_loop(
            0, full, functools.partial(body, masked=False), init)
        carry = jax.lax.fori_loop(
            full, n_blocks, functools.partial(body, masked=True), carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal",
                                             "q_block", "block_s",
                                             "interpret"))
def flash_attention_pallas(q: jnp.ndarray, k: jnp.ndarray,
                           v: jnp.ndarray, scale: float,
                           causal: bool = False, q_block: int = 512,
                           block_s: int = 512,
                           interpret: bool = False) -> jnp.ndarray:
    """q [B, T, H, D] × k/v [B, S, H, D] → [B, T, H, D] (H == Hkv)."""
    b, t, h, d = q.shape
    s = k.shape[1]
    from vllm_omni_tpu.utils import round_up

    t_pad = round_up(t, q_block)
    s_pad = round_up(s, block_s)
    qr = jnp.swapaxes(q, 1, 2).reshape(b * h, t, d)
    kr = jnp.swapaxes(k, 1, 2).reshape(b * h, s, d)
    vr = jnp.swapaxes(v, 1, 2).reshape(b * h, s, d)
    if t_pad != t:
        qr = jnp.pad(qr, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad != s:
        kr = jnp.pad(kr, ((0, 0), (0, s_pad - s), (0, 0)))
        vr = jnp.pad(vr, ((0, 0), (0, s_pad - s), (0, 0)))
    seq_lens = jnp.array([s], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, t_pad // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j, *_: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, d), lambda i, j, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, d),
                               lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_flash_kernel, block_s=block_s,
                               causal=causal, scale=scale,
                               q_block=q_block, s_true=s)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t * s * d,
            bytes_accessed=b * h * (t + 2 * s) * d * 2,
            transcendentals=b * h * t * s),
        interpret=interpret,
    )(seq_lens, qr, kr, vr)
    out = out[:, :t].reshape(b, h, t, d)
    return jnp.swapaxes(out, 1, 2)


def int8_attention(q: "jnp.ndarray", k: "jnp.ndarray", v: "jnp.ndarray",
                   scale: float) -> "jnp.ndarray":
    """Quantized dense attention — the SageAttention role (reference
    diffusion/attention/backends/sage_attn.py:27): per-token per-head
    symmetric int8 quant of Q and K, QK^T as a native s8×s8→s32 MXU dot
    (the int MXU path doubles the bf16 rate on v5e), f32 softmax, PV in
    bf16. K is mean-centered first (SageAttention's smoothing — softmax
    is shift-invariant along the key axis, so subtracting the per-head
    key mean costs nothing in exactness and absorbs the outlier channel
    energy that otherwise eats the int8 range).

    q/k/v: [B, T, H, D] (non-causal, DiT full-sequence)."""
    import jax.numpy as jnp

    kf = k.astype(jnp.float32)
    kf = kf - jnp.mean(kf, axis=1, keepdims=True)
    qf = q.astype(jnp.float32)

    def quant(x):
        s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-8)
        xi = jnp.clip(jnp.round(x / s[..., None]), -127, 127).astype(
            jnp.int8)
        return xi, s

    qi, qs = quant(qf)
    ki, ks = quant(kf)
    s = jax.lax.dot_general(
        qi.transpose(0, 2, 1, 3), ki.transpose(0, 2, 1, 3),
        (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)  # [B, H, T, S]
    s = s.astype(jnp.float32) * (qs.transpose(0, 2, 1)[..., None] *
                                 ks.transpose(0, 2, 1)[:, :, None, :] *
                                 scale)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhts,bshd->bthd", p, v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def flash_attention(q, k, v, scale: float, causal: bool = False):
    """Dispatch: Pallas on TPU for H==Hkv and 128-aligned head_dim, XLA
    reference otherwise."""
    from vllm_omni_tpu.ops import use_pallas
    from vllm_omni_tpu.ops.attention import mha_xla

    if use_pallas() and q.shape[2] == k.shape[2] and \
            q.shape[-1] % 128 == 0:
        return flash_attention_pallas(q, k, v, scale=scale, causal=causal)
    return mha_xla(q, k, v, scale, causal=causal)
