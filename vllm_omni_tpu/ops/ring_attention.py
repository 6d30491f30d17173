"""Ring attention: blockwise full-sequence attention over a mesh axis.

Reference parity: RingParallelAttention (attention/parallel/ring.py:37),
RingComm p2p (distributed/comm.py:228), per-hop kernels + LSE merge
(backends/ring/ring_kernels.py, ring_utils.py). TPU-native: shard_map
over the "ring" mesh axis; KV blocks rotate via lax.ppermute (ICI
neighbor exchange) while each rank accumulates online-softmax partial
results — Liu et al. blockwise ring attention.

Non-causal (DiT full-sequence) variant: every q block attends every kv
block, so each hop is a dense block attention and comms overlap compute
naturally (the next ppermute is issued before the current block's math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, scale):
    """q [B,Tq,H,D] x k/v [B,Ts,H,D] → (scores-weighted values, row max,
    row sumexp) for online-softmax accumulation."""
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    m = jnp.max(s, axis=-1)  # [B,H,Tq]
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)  # [B,H,Tq]
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return o, m, l


def _ring_attn_local(q, k, v, *, scale: float, axis_name: str,
                     ring_size: int):
    """Per-shard body under shard_map: rotate kv around the ring,
    merging blocks with the online-softmax (LSE) rule."""
    perm = [(i, (i + 1) % ring_size) for i in range(ring_size)]

    def step(i, carry):
        acc, m, l, k_cur, v_cur = carry
        # issue the rotation first so the transfer overlaps the block
        # compute below (XLA schedules the ppermute async)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        o_b, m_b, l_b = _block_attn(q, k_cur, v_cur, scale)
        m_new = jnp.maximum(m, m_b)
        alpha = jnp.exp(m - m_new)
        beta = jnp.exp(m_b - m_new)
        l_new = alpha * l + beta * l_b
        acc_new = (acc * alpha.transpose(0, 2, 1)[..., None] +
                   o_b * beta.transpose(0, 2, 1)[..., None])
        return acc_new, m_new, l_new, k_nxt, v_nxt

    b, t, h, d = q.shape
    init = (jnp.zeros((b, t, h, d), jnp.float32),
            jnp.full((b, h, t), NEG_INF, jnp.float32),
            jnp.zeros((b, h, t), jnp.float32), k, v)
    acc, m, l, _, _ = jax.lax.fori_loop(0, ring_size, step, init)
    out = acc / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   scale: float, mesh: Mesh, ring_axis: str = "ring",
                   batch_axes=("cfg",), head_axes=("ulysses", "tp")
                   ) -> jnp.ndarray:
    """Full-sequence non-causal attention with the sequence sharded over
    `ring_axis`. Heads may additionally shard over `head_axes` and batch
    over `batch_axes` (composes ring × ulysses-as-head-parallel × tp —
    reference's hybrid SP, sequence_parallel_size = ulysses × ring).
    """
    spec = P(batch_axes, ring_axis, head_axes, None)
    ring_size = mesh.shape[ring_axis]
    fn = jax.shard_map(
        functools.partial(_ring_attn_local, scale=scale,
                          axis_name=ring_axis, ring_size=ring_size),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    return fn(q, k, v)


def ring_applicable(mesh, q_shape, ring_axis: str = "ring") -> bool:
    if mesh is None or mesh.shape.get(ring_axis, 1) <= 1:
        return False
    b, t, h, _ = q_shape
    cfgs = mesh.shape.get("cfg", 1)
    heads = mesh.shape.get("ulysses", 1) * mesh.shape.get("tp", 1)
    return (b % cfgs == 0 and t % mesh.shape[ring_axis] == 0 and
            h % heads == 0)
