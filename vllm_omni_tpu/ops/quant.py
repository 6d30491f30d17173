"""Quantized weight storage + dequant-fused matmul.

Replaces the reference's dependency on upstream vLLM's Marlin INT8/INT4 and
ModelOpt FP8 CUDA GEMMs (SURVEY.md §2.9 row 1). Scale math mirrors the
reference's online-quantization path (quantize-on-load per-channel /
per-group symmetric, reference quantization/int8_config.py:385
Int8OnlineLinearMethod) so perplexity parity at matched bit-width holds.

Layouts (TPU-first):
- int8 weight-only: w_q int8 [K, N], scale f32 [N] (per-output-channel).
- int4 grouped:     w_q int4 [K, N] (jnp.int4 — XLA packs 2/byte in HBM),
                    scale f32 [K/G, N] with group size G along K.
- fp8 W8A8:         w_q float8_e4m3fn [K, N], w_scale f32 [N]; activations
                    quantized per-token dynamic. v5e has no native fp8 MXU
                    (SURVEY.md §7) → dequant to bf16 before the dot; on
                    v5p+/v6 XLA lowers the fp8 dot natively.

The Pallas kernel fuses dequantization into the matmul tiles so int8/int4
weights stream from HBM at their quantized width — the matmul is HBM-bound
at decode batch sizes, so this is the 2-4× win over upcasting in HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_tpu.utils import cdiv

# ---------------------------------------------------------------------------
# Quantization (weight preprocessing, runs once at load)
# ---------------------------------------------------------------------------


def quantize_int8(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8. w: [K, N] → (int8 [K,N], f32 [N])."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_int4(w: jnp.ndarray,
                  group_size: int = 128) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric grouped int4, nibble-packed into uint8.

    w: [K, N] → (packed uint8 [K//2, N], scale f32 [K/G, N]).

    Packing is *group-local split-half*: within scale group g, packed row r
    holds original rows (g*G + r) in the low nibble and (g*G + G/2 + r) in
    the high nibble. Unpacking is then a concat along the sublane axis —
    no interleave, which Mosaic lowers poorly. (jnp.int4 is avoided: the
    dtype is broken on some PJRT backends.) Values are stored biased by 8.
    """
    K, N = w.shape
    G = group_size
    assert K % G == 0 and G % 2 == 0, (K, G)
    wf = w.astype(jnp.float32).reshape(K // G, G, N)
    amax = jnp.max(jnp.abs(wf), axis=1)  # [K/G, N]
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -7, 7) + 8.0
    q = q.astype(jnp.uint8)  # [K/G, G, N], values 1..15
    lo, hi = q[:, :G // 2, :], q[:, G // 2:, :]
    packed = (lo | (hi << 4)).reshape(K // 2, N)
    return packed, scale


def unpack_int4(packed: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """Inverse of the group-local split-half packing → int8 [K, N]
    holding values in [-7, 7]."""
    K2, N = packed.shape
    G = group_size
    p = packed.reshape(K2 // (G // 2), G // 2, N)
    lo = (p & 0xF).astype(jnp.int8) - 8
    hi = (p >> 4).astype(jnp.int8) - 8
    return jnp.concatenate([lo, hi], axis=1).reshape(2 * K2, N)


def quantize_int8_act(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token symmetric int8 activation quant for the W8A8
    path. x: [M, K] → (int8 [M, K], f32 [M])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / scale[:, None]), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul_native(x: jnp.ndarray, w_q: jnp.ndarray,
                       w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8: per-token act quant + native s8×s8→s32 MXU dot + rescale.

    The fastest int8 path on v5e at decode batch: 83.4% of HBM
    speed-of-light with fused projections vs 78.5% for the upcast dot
    (benchmarks/layer_variants.py). The int32 accumulator dot streams
    weights at quantized width and keeps the MXU in its int mode."""
    xq, xs = quantize_int8_act(x)
    o = jax.lax.dot_general(xq, w_q, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (o.astype(jnp.float32) * xs[:, None] *
            w_scale[None, :]).astype(x.dtype)


def quantize_fp8(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel scaled float8_e4m3. w: [K,N] → (fp8, f32 [N])."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(amax / 448.0, 1e-8)  # e4m3fn max = 448
    q = (w / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def quantize_fp8_per_token(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Dynamic per-token activation quant for the W8A8 path.
    x: [M, K] → (fp8 [M,K], f32 [M])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 448.0, 1e-8)
    q = (xf / scale[:, None]).astype(jnp.float8_e4m3fn)
    return q, scale


# ---------------------------------------------------------------------------
# XLA reference matmuls (CPU tier + oracle)
# ---------------------------------------------------------------------------


def int8_matmul_xla(x: jnp.ndarray, w_q: jnp.ndarray,
                    scale: jnp.ndarray) -> jnp.ndarray:
    out = jnp.dot(x, w_q.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    return (out * scale).astype(x.dtype)


def int4_matmul_xla(x: jnp.ndarray, w_packed: jnp.ndarray,
                    scale: jnp.ndarray,
                    group_size: int = 128) -> jnp.ndarray:
    w_q = unpack_int4(w_packed, group_size)
    K, N = w_q.shape
    M = x.shape[0]
    xg = x.reshape(M, K // group_size, group_size).astype(jnp.float32)
    wg = w_q.astype(jnp.float32).reshape(K // group_size, group_size, N)
    # per-group partial products scaled independently (exact grouped dequant)
    partial = jnp.einsum("mgk,gkn->mgn", xg, wg)
    out = jnp.sum(partial * scale[None, :, :], axis=1)
    return out.astype(x.dtype)


def fp8_matmul_xla(x: jnp.ndarray, w_q: jnp.ndarray,
                   w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8: dynamic per-token act quant, fp8×fp8 dot, rescale."""
    x2d = x.reshape(-1, x.shape[-1])
    xq, x_scale = quantize_fp8_per_token(x2d)
    out = jnp.dot(xq.astype(jnp.bfloat16), w_q.astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    out = out * x_scale[:, None] * w_scale[None, :]
    return out.astype(x.dtype).reshape(*x.shape[:-1], w_q.shape[1])


# ---------------------------------------------------------------------------
# Pallas dequant-fused matmul
# ---------------------------------------------------------------------------


def _choose_tiles(M: int, K: int, N: int) -> tuple[int, int, int]:
    bm = 256 if M >= 256 else max(8, 1 << (M - 1).bit_length())
    bk = 512 if K >= 512 else K
    bn = 512 if N >= 512 else N
    return bm, bk, bn


def _quant_matmul_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *,
                         n_k: int, out_dtype):
    """Grid (M/bm, N/bn, K/bk); acc persists across the K grid dim."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    w = w_ref[:].astype(x.dtype)  # dequant int8/int4 → act dtype in-register
    acc_ref[:] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)).astype(
            out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int8_matmul_pallas(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """x [M,K] @ int8 w [K,N] * scale [N] → [M,N] in x.dtype."""
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2
    bm, bk, bn = _choose_tiles(M, K, N)
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    kernel = functools.partial(_quant_matmul_kernel, n_k=grid[2],
                               out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w_q, scale.reshape(1, N))


def _int4_matmul_kernel(x_ref, w_ref, scale_ref, o_ref, acc_ref, *,
                        n_k: int, groups_per_bk: int, group_size: int,
                        out_dtype):
    """Grouped-scale packed int4: bk must be a multiple of group_size.

    w_ref tile is [bk//2, bn] uint8 (group-local split-half packing, see
    quantize_int4); each scale group's nibbles unpack to [G, bn] via a
    sublane concat, dequant rides the MXU feed.
    """
    k = pl.program_id(2)
    half = group_size // 2

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    acc = acc_ref[:]
    for g in range(groups_per_bk):
        # int32 nibble math: Mosaic won't legalize i8 vector sub/shift
        p = w_ref[g * half:(g + 1) * half, :].astype(jnp.int32)
        lo = ((p & 0xF) - 8).astype(x.dtype)
        hi = ((p >> 4) - 8).astype(x.dtype)
        w = jnp.concatenate([lo, hi], axis=0)  # [G, bn]
        sl = slice(g * group_size, (g + 1) * group_size)
        part = jnp.dot(x[:, sl], w, preferred_element_type=jnp.float32)
        # scale_ref holds ALL K/G rows (sublane-tiling keeps us from
        # blocking the tiny group dim); pick this tile's row dynamically
        sc = scale_ref[pl.ds(k * groups_per_bk + g, 1), :]
        acc = acc + part * sc
    acc_ref[:] = acc

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def int4_matmul_pallas(x: jnp.ndarray, w_packed: jnp.ndarray,
                       scale: jnp.ndarray, group_size: int = 128,
                       interpret: bool = False) -> jnp.ndarray:
    M, K = x.shape
    K2, N = w_packed.shape
    assert K == 2 * K2 and K % group_size == 0
    bm, bk, bn = _choose_tiles(M, K, N)
    bk = max(group_size, (bk // group_size) * group_size)
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    gpb = bk // group_size
    kernel = functools.partial(_int4_matmul_kernel, n_k=grid[2],
                               groups_per_bk=gpb, group_size=group_size,
                               out_dtype=x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group_size, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N // 2 + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w_packed, scale)


# ---------------------------------------------------------------------------
# Native s8xs8 Pallas GEMM (prefill shapes — compute-bound at large M)
# ---------------------------------------------------------------------------


def _s8_matmul_kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, acc_ref, *,
                      n_k: int, out_dtype):
    """Grid (M/bm, N/bn, K/bk); int32 accumulator persists across the K
    grid dim, per-token x per-channel rescale fused into the epilogue."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:].astype(jnp.float32) * xs_ref[:] *
                    ws_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret",
                                             "tiles"))
def int8_matmul_pallas_s8(xq: jnp.ndarray, xs: jnp.ndarray,
                          w_q: jnp.ndarray, w_scale: jnp.ndarray,
                          out_dtype=jnp.bfloat16,
                          interpret: bool = False,
                          tiles: tuple | None = None) -> jnp.ndarray:
    """W8A8 GEMM with the MXU kept in int8 mode end to end: pre-quantized
    activations xq int8 [M,K] / per-token scale xs f32 [M] against w_q
    int8 [K,N] / per-channel w_scale f32 [N] → [M,N] out_dtype.

    Hand-tiled for the compute-bound prefill shapes (M >= 256) where
    XLA's s8xs8 dot reaches only ~1.3x bf16 instead of the 2x silicon
    ratio (docs/design/performance.md prefill table). Decode-batch M
    stays on the XLA native path, which is weight-bandwidth-optimal."""
    M, K = xq.shape
    K2, N = w_q.shape
    assert K == K2
    if tiles is not None:
        bm, bk, bn = tiles
        bm, bk, bn = min(bm, M), min(bk, K), min(bn, N)
    else:
        # measured (benchmarks/prefill_s8_gemm.py, v5e-1, M=512): the
        # full-K single-accumulation tile wins at K<=4096 (gate_up
        # 73.3% of int8 peak vs 58.7% for XLA's s8 dot); at larger K
        # VMEM forces a K loop and bk=2048 times best.
        bm = min(512, M) if M % 256 == 0 else max(
            8, 1 << (M - 1).bit_length())
        bk = K if K <= 4096 else 2048
        bn = 512 if N >= 512 else N
    grid = (cdiv(M, bm), cdiv(N, bn), cdiv(K, bk))
    kernel = functools.partial(_s8_matmul_kernel, n_k=grid[2],
                               out_dtype=out_dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(xq, w_q, xs.reshape(M, 1).astype(jnp.float32),
      w_scale.reshape(1, N).astype(jnp.float32))


def _s8_fusedq_kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, xs_ref, *,
                      out_dtype):
    """Grid (M/bm, N/bn), full-K x block. Per-token act quant runs ONCE
    per M-block (at j==0) into VMEM scratch; every N-block reuses it —
    the quant pass never round-trips HBM and there is no kernel
    boundary between quant and dot."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        xs = jnp.maximum(amax / 127.0, 1e-8)
        xs_ref[:] = xs
        xq_ref[:] = jnp.clip(jnp.round(xf / xs), -127, 127).astype(
            jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] *
                ws_ref[:]).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "bn"))
def int8_matmul_pallas_fusedq(x: jnp.ndarray, w_q: jnp.ndarray,
                              w_scale: jnp.ndarray,
                              interpret: bool = False,
                              bn: int = 512) -> jnp.ndarray:
    """W8A8 GEMM with in-kernel per-token activation quantization.
    x bf16/f32 [M,K] (K <= 4096: full-K tile), w_q int8 [K,N],
    w_scale f32 [N] → [M,N] x.dtype.

    Measured-NEGATIVE variant, kept as a tuning base: at M=512 it
    reaches gate_up 71.2% / o_proj 72.0% of int8 peak — the two-pass
    path (XLA act quant + int8_matmul_pallas_s8) is faster (73.3%)
    because the fused kernel's bm is VMEM-capped at 256 (the in-kernel
    f32 quant view of the x block) while the two-pass kernel runs
    bm=512. Also shows qkv's 33%-of-peak cap is NOT quant-pass
    serialization (identical cap with quant fused). Not dispatched."""
    M, K = x.shape
    K2, N = w_q.shape
    assert K == K2 and K <= 4096
    # bm=256: the in-kernel quant materializes an f32 view of the x
    # block; at bm=512/K=4096 that plus double-buffered inputs exceeds
    # the 16 MB scoped-VMEM limit (measured 21.57M).
    bm = min(256, M) if M % 256 == 0 else max(8, 1 << (M - 1).bit_length())
    bn = min(bn, N)
    grid = (cdiv(M, bm), cdiv(N, bn))
    kernel = functools.partial(_s8_fusedq_kernel,
                               out_dtype=jnp.dtype(x.dtype))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, K), jnp.int8),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * x.dtype.itemsize + K * N + M * N * 2,
            transcendentals=0),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, N).astype(jnp.float32))


def int8_matmul_native_prefill(x: jnp.ndarray, w_q: jnp.ndarray,
                               w_scale: jnp.ndarray) -> jnp.ndarray:
    """W8A8 prefill entry: per-token act quant (XLA, fused) + the
    hand-tiled s8xs8 Pallas GEMM."""
    xq, xs = quantize_int8_act(x)
    return int8_matmul_pallas_s8(xq, xs, w_q, w_scale,
                                 out_dtype=jnp.dtype(x.dtype))


# ---------------------------------------------------------------------------
# Dispatch + parameter container
# ---------------------------------------------------------------------------


def quantized_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                     method: str, group_size: int = 128,
                     act8: bool = False) -> jnp.ndarray:
    """Entry used by model layers. x: [..., K] → [..., N].

    int8 never takes the hand-written Pallas kernel: measured on v5e-1
    (benchmarks/layer_variants.py, M=32 Llama-8B layer stack) XLA's
    upcast dot hits 78.5% of the HBM speed-of-light while the Pallas
    fused-dequant kernel reaches only 53.9% — XLA's convert+dot fusion
    already streams int8 weights at quantized width and its pipelining
    beats ours. With act8 (per-token activation quant, W8A8) the native
    s8×s8 MXU dot reaches 83.4% with fused projections — the serving
    default. The Pallas kernel remains for int4 (XLA's unpack path
    materializes the upcast in HBM) and as a tuning base.
    """
    from vllm_omni_tpu.ops import use_pallas

    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if method == "int8":
        if act8:
            M2, K2 = x2.shape
            N2 = w_q.shape[1]
            if (use_pallas() and M2 % 256 == 0 and M2 >= 256
                    and N2 >= 8192 and K2 % 1024 == 0 and N2 % 512 == 0):
                # compute-bound prefill rows x wide N (gate_up-class):
                # the hand-tiled s8 kernel keeps the MXU in int8 mode
                # at 73% of int8 peak vs 59% for the XLA dot (measured,
                # docs/design/performance.md prefill table). Narrow-N
                # and decode-M shapes measured a wash or worse — they
                # stay on the XLA native path.
                out = int8_matmul_native_prefill(x2, w_q, scale)
            else:
                out = int8_matmul_native(x2, w_q, scale)
        else:
            out = int8_matmul_xla(x2, w_q, scale)
    elif method == "int4":
        if use_pallas() and x2.shape[0] % 8 == 0:
            out = int4_matmul_pallas(x2, w_q, scale, group_size=group_size)
        else:
            out = int4_matmul_xla(x2, w_q, scale, group_size=group_size)
    elif method == "fp8":
        out = fp8_matmul_xla(x2, w_q, scale)
    else:
        raise ValueError(f"unknown quant method {method!r}")
    return out.reshape(*lead, -1)
