"""Paged attention for continuous batching (XLA reference + Pallas TPU).

Replaces upstream vLLM's CUDA paged-attention + flash-attn prefill
(SURVEY.md §2.9 rows 1-2) with a TPU-native design.

KV layout: per layer, K and V each live in HBM as
    [num_pages, num_kv_heads, page_size, head_dim]
(page-major: one DMA moves a page across ALL kv heads. The round-1
head-major layout needed one DMA per (seq, head, page) — ~8k DMA issues
per decode layer-step at bs=32/ctx≈250, ≈8.5 ms/pass of issue cost
measured by ablating the kernel (benchmarks/decode_ablation.py).
Page-major cuts decode DMA count by num_kv_heads×.)
Page 0 is the reserved null page — padding slots of block tables point at
it. All shapes are static; per-request raggedness is expressed through
int32 block tables + context lengths, never through dynamic shapes.

Step shapes (matching core/scheduler.py's prefill/decode split):
- decode: q [B, H, D], one new token per running request.
- prefill: q [B, T, H, D]: B chunk rows padded to buckets; chunk token t of
  row b sits at absolute position q_start[b] + t.

GQA is native: H = num_kv_heads * group; KV heads are never repeated in
memory.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_omni_tpu.utils import cdiv

NEG_INF = -1e30


def lane_pack(head_dim: int) -> int:
    """Tokens packed per 128-lane row for small heads (d ∈ {32, 64}):
    Mosaic requires HBM DMA slices 128-aligned on the lane axis, so a
    d<128 cache stores `pack` consecutive tokens per physical row."""
    if head_dim < 128 and 128 % head_dim == 0:
        return 128 // head_dim
    return 1


def _sublane_tile(dtype) -> int:
    itemsize = jnp.dtype(dtype).itemsize
    return {4: 8, 2: 16, 1: 32}.get(itemsize, 8)


def kv_physical_shape(num_kv_heads: int, num_pages: int, page_size: int,
                      head_dim: int, dtype) -> tuple[int, ...]:
    """Physical page-array shape (page-major). d % 128 == 0 stores rows
    directly; d ∈ {32, 64} lane-packs `pack` tokens per 128-lane row —
    (n_pages, hkv, ps // pack, 128) — iff every page stays
    sublane-tile-aligned for the dtype (else the unpacked layout +
    XLA fallback path applies). Element order is identical to the
    logical (n_pages, hkv, ps, d) layout, so reshape is a bitcast."""
    pack = lane_pack(head_dim)
    if pack > 1 and page_size % pack == 0 and \
            (page_size // pack) % _sublane_tile(dtype) == 0:
        return (num_pages, num_kv_heads, page_size // pack, 128)
    return (num_pages, num_kv_heads, page_size, head_dim)


def min_page_size_for_pallas(head_dim: int, dtype) -> int:
    """Smallest page_size whose physical layout takes the Pallas
    kernels: d%128==0 needs only the dtype's sublane tile; packed small
    heads need pack x that."""
    return _sublane_tile(dtype) * lane_pack(head_dim)


def logical_kv_view(pages: jnp.ndarray, head_dim: int) -> jnp.ndarray:
    """Physical (possibly lane-packed) pages → logical
    [n_pages, hkv, ps, d] view (element-order-preserving reshape)."""
    if pages.shape[-1] == head_dim:
        return pages
    n_pages, hkv = pages.shape[:2]
    return pages.reshape(n_pages, hkv, -1, head_dim)


def make_kv_pages(num_layers: int, num_kv_heads: int, num_pages: int,
                  page_size: int, head_dim: int, dtype) -> list:
    """Allocate the paged KV cache: per layer a (K, V) pair (physical
    layout — lane-packed for d<128, see kv_physical_shape)."""
    shape = kv_physical_shape(num_kv_heads, num_pages, page_size,
                              head_dim, dtype)
    return [(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))
            for _ in range(num_layers)]


# ---------------------------------------------------------------------------
# KV page write + cache quantization
# ---------------------------------------------------------------------------


def write_kv_pages_xla(k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                       k_new: jnp.ndarray, v_new: jnp.ndarray,
                       slot_ids: jnp.ndarray
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """XLA scatter of new KV rows into pages (CPU tier / TP-sharded
    caches / large prefill writes).

    k_new/v_new: [T, Hkv, D]; slot_ids: [T] flat slot index
    (= page_id * page_size + offset). Padding rows must target page 0.
    Scatter on the 4D layout directly — reshaping the cache around the
    scatter breaks XLA's in-place aliasing inside lax.scan decode chains
    (measured ~30% slower per step). NOTE: on TPU even this scatter
    copies the whole page buffer per step inside a scan (see
    write_kv_pages_pallas) — it is the fallback, not the hot path.

    Lane-packed caches (kv_physical_shape, d<128): scatter packed rows
    of `pack` tokens — [T, Hkv, D] rows land at (page, off // pack) with
    a lane-section update via gather+dynamic_update; done as a
    read-modify-write on the packed row.
    """
    d = k_new.shape[-1]
    if k_pages.shape[-1] != d:
        pack = k_pages.shape[-1] // d
        n_pages = k_pages.shape[0]
        page_size = k_pages.shape[2] * pack
        pg = slot_ids // page_size
        row = (slot_ids % page_size) // pack
        sec = (slot_ids % page_size) % pack
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        tiled_k = jnp.tile(k_new, (1, 1, pack)).astype(k_pages.dtype)
        tiled_v = jnp.tile(v_new, (1, 1, pack)).astype(v_pages.dtype)
        # one RMW scatter per lane section: tokens of other sections
        # redirect out of bounds (mode="drop"), so a packed row shared
        # by two tokens (adjacent prefill slots) is never written twice
        # in one scatter with conflicting values — each section sees
        # the previous section's update when it re-reads the row
        for s in range(pack):
            pg_s = jnp.where(sec == s, pg, n_pages)
            sel = (lane // d) == s
            old_k = k_pages[pg, :, row]  # [T, Hkv, 128]
            old_v = v_pages[pg, :, row]
            k_pages = k_pages.at[pg_s, :, row].set(
                jnp.where(sel, tiled_k, old_k), mode="drop")
            v_pages = v_pages.at[pg_s, :, row].set(
                jnp.where(sel, tiled_v, old_v), mode="drop")
        return k_pages, v_pages
    _, _, page_size, _ = k_pages.shape
    pg = slot_ids // page_size
    off = slot_ids % page_size
    kf = k_pages.at[pg, :, off].set(k_new.astype(k_pages.dtype))
    vf = v_pages.at[pg, :, off].set(v_new.astype(v_pages.dtype))
    return kf, vf


def write_kv_pages(k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                   k_new: jnp.ndarray, v_new: jnp.ndarray,
                   slot_ids: jnp.ndarray, pallas_ok: bool = False
                   ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """KV row write dispatcher: in-place Pallas DMA writer on TPU for
    decode-sized updates (the XLA scatter copies the whole cache per
    scan step — benchmarks/decode_ablation.py 'fixed' residual), XLA
    scatter otherwise. pallas_ok: caller confirms single-device
    unsharded cache (a pallas_call under SPMD would force a gather)."""
    from vllm_omni_tpu.ops import use_pallas

    if pallas_ok and use_pallas() and k_pages.shape[-1] % 128 == 0:
        # the writer's VMEM staging scales with rows (one page block
        # per token) — chunk to ≤64 rows per call so batches >64 keep
        # the in-place path instead of falling back to the XLA scatter
        # (which copies the WHOLE cache per scan step: the round-5
        # bs>64 decode cliff, 4270 → 2670 tok/s)
        t = k_new.shape[0]
        for i in range(0, t, 64):
            k_pages, v_pages = write_kv_pages_pallas(
                k_pages, v_pages, k_new[i:i + 64], v_new[i:i + 64],
                slot_ids[i:i + 64])
        return k_pages, v_pages
    return write_kv_pages_xla(k_pages, v_pages, k_new, v_new, slot_ids)


def _write_kv_kernel(slots_ref, knew_ref, vnew_ref, kp_in, vp_in,
                     kp_out, vp_out, kbuf, vbuf, k_sems, v_sems,
                     *, page_size: int, t: int, pack: int = 1,
                     d: int = 0):
    """In-place KV row writes via page-granularity read-modify-write:
    fetch each target page to VMEM, vector-select the new row in, write
    the page back. kp_out/vp_out alias kp_in/vp_in
    (input_output_aliases) — the cache buffer is never copied; traffic
    is 2 pages per token instead of the whole cache. Page-sized DMAs
    keep every slice sublane-tile-aligned for bf16/fp8/int8 (a single
    [.., 1, d] row slice is not). Decode rows touch distinct pages
    (pages are per-request), so the RMW has no cross-token hazard."""
    del kp_in, vp_in

    def page_copy(src, dst, sem):
        pltpu.make_async_copy(src, dst, sem).start()

    for i in range(t):
        pg = slots_ref[i] // page_size
        page_copy(kp_out.at[pl.ds(pg, 1)], kbuf.at[i], k_sems.at[i])
        page_copy(vp_out.at[pl.ds(pg, 1)], vbuf.at[i], v_sems.at[i])
    for i in range(t):
        pg = slots_ref[i] // page_size
        pltpu.make_async_copy(kp_out.at[pl.ds(pg, 1)], kbuf.at[i],
                              k_sems.at[i]).wait()
        pltpu.make_async_copy(vp_out.at[pl.ds(pg, 1)], vbuf.at[i],
                              v_sems.at[i]).wait()
    ps = page_size
    ps_rows = ps // pack  # physical rows per page (lane-packed d<128)
    for i in range(t):
        off = slots_ref[i] % ps
        sel = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ps_rows, 1),
                                       2) == off // pack
        if pack > 1:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
            sel = sel & ((lane // d) == off % pack)
        kbuf[i] = jnp.where(sel, knew_ref[i], kbuf[i])
        vbuf[i] = jnp.where(sel, vnew_ref[i], vbuf[i])
    for i in range(t):
        pg = slots_ref[i] // page_size
        page_copy(kbuf.at[i], kp_out.at[pl.ds(pg, 1)], k_sems.at[i])
        page_copy(vbuf.at[i], vp_out.at[pl.ds(pg, 1)], v_sems.at[i])
    for i in range(t):
        pg = slots_ref[i] // page_size
        pltpu.make_async_copy(kbuf.at[i], kp_out.at[pl.ds(pg, 1)],
                              k_sems.at[i]).wait()
        pltpu.make_async_copy(vbuf.at[i], vp_out.at[pl.ds(pg, 1)],
                              v_sems.at[i]).wait()


def write_kv_pages_pallas(k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                          k_new: jnp.ndarray, v_new: jnp.ndarray,
                          slot_ids: jnp.ndarray,
                          interpret: bool = False
                          ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-place scatter of new KV rows via Pallas input_output_aliases.

    XLA's scatter inside a lax.scan decode chain copies the WHOLE page
    buffer every step (measured: the 10.9 ms/pass 'fixed' residual of
    benchmarks/decode_ablation.py — ~33% of decode time at a 2.25 GB
    cache; HLO shows bf16[Hkv,P,ps,D] copies under while/body/scatter).
    A single-program kernel that DMAs each [hkv, d] row into its slot
    writes ~T·hkv·d bytes instead of re-writing the cache.

    Lane-packed caches (d<128, kv_physical_shape): the page fetch moves
    [1, hkv, ps//pack, 128] and the row select masks both the packed
    row and the d-wide lane section."""
    n_pages, hkv, rows_per_page, d_phys = k_pages.shape
    d = k_new.shape[-1]
    pack = d_phys // d
    page_size = rows_per_page * pack
    t = k_new.shape[0]
    # [T, 1, hkv, 1, d_phys] so each row broadcast matches the fetched
    # page block [1, hkv, rows, d_phys]; packed layouts tile the d-wide
    # row across all lane sections (the kernel's select keeps only the
    # right one)
    k_rows = jnp.tile(k_new.astype(k_pages.dtype)
                      .reshape(t, 1, hkv, 1, d), (1, 1, 1, 1, pack))
    v_rows = jnp.tile(v_new.astype(v_pages.dtype)
                      .reshape(t, 1, hkv, 1, d), (1, 1, 1, 1, pack))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_new rows (small)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # v_new rows (small)
            pl.BlockSpec(memory_space=pltpu.ANY),   # k_pages (aliased)
            pl.BlockSpec(memory_space=pltpu.ANY),   # v_pages (aliased)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((t, 1, hkv, rows_per_page, d_phys), k_pages.dtype),
            pltpu.VMEM((t, 1, hkv, rows_per_page, d_phys), v_pages.dtype),
            pltpu.SemaphoreType.DMA((t,)),
            pltpu.SemaphoreType.DMA((t,)),
        ],
    )
    kernel = functools.partial(_write_kv_kernel, page_size=page_size,
                               t=t, pack=pack, d=d)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(k_pages.shape, k_pages.dtype),
                   jax.ShapeDtypeStruct(v_pages.shape, v_pages.dtype)],
        input_output_aliases={3: 0, 4: 1},  # (after scalar prefetch)
        interpret=interpret,
    )(slot_ids.astype(jnp.int32), k_rows, v_rows, k_pages, v_pages)


def quantize_kv(k: jnp.ndarray, v: jnp.ndarray, dtype: str,
                k_scale: Optional[jnp.ndarray] = None,
                v_scale: Optional[jnp.ndarray] = None):
    """KV-cache quantization on write (reference: FP8 KV cache,
    SURVEY.md §2.9). k/v: [T, hkv, D] new rows. k_scale/v_scale:
    optional per-kv-head scales [hkv] — stored value is x / scale
    (calibrated by the model runner from real K/V amax, or loaded from
    a pre-quantized checkpoint). Without scales: int8 falls back to the
    fixed 1/16 write scale (post-norm K/V are O(1)), fp8 e4m3 to a raw
    cast (enough dynamic range for post-rope K/V)."""
    if dtype == "fp8":
        if k_scale is not None:
            k = k.astype(jnp.float32) / k_scale[None, :, None]
            v = v.astype(jnp.float32) / v_scale[None, :, None]
        return k.astype(jnp.float8_e4m3fn), v.astype(jnp.float8_e4m3fn)
    if dtype == "int8":
        ks = (1.0 / 16.0 if k_scale is None else k_scale[None, :, None])
        vs = (1.0 / 16.0 if v_scale is None else v_scale[None, :, None])
        kq = jnp.clip(jnp.round(k.astype(jnp.float32) / ks), -127,
                      127).astype(jnp.int8)
        vq = jnp.clip(jnp.round(v.astype(jnp.float32) / vs), -127,
                      127).astype(jnp.int8)
        return kq, vq
    return k, v


def dequantize_kv(k: jnp.ndarray, v: jnp.ndarray, compute_dtype=jnp.float32,
                  k_scale: Optional[jnp.ndarray] = None,
                  v_scale: Optional[jnp.ndarray] = None):
    """k/v: head-major [hkv, B, S, D] (gather_kv_for_seqs output).
    Per-head scales broadcast over axis 0; int8 without scales uses the
    legacy fixed 1/16, fp8/bf16 without scales pass through."""
    was_int8 = k.dtype == jnp.int8
    k = k.astype(compute_dtype)
    v = v.astype(compute_dtype)
    if k_scale is not None:
        return (k * k_scale[:, None, None, None],
                v * v_scale[:, None, None, None])
    return (k / 16.0, v / 16.0) if was_int8 else (k, v)


# ---------------------------------------------------------------------------
# XLA reference paths (CPU tier + oracle; also solid on TPU — XLA fuses the
# softmax into the einsums)
# ---------------------------------------------------------------------------


def gather_kv_for_seqs(k_pages: jnp.ndarray, v_pages: jnp.ndarray,
                       block_tables: jnp.ndarray,
                       head_dim: Optional[int] = None
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B, P] page ids → [Hkv, B, P*page_size, D] (head-major output for
    the einsum paths; cache itself is page-major). head_dim unpacks
    lane-packed caches (kv_physical_shape) — the packed row order is
    token-major, so the reshape is free."""
    b, p = block_tables.shape
    _, hkv, ps, d = k_pages.shape
    if head_dim is not None:
        d = head_dim
    k = jnp.swapaxes(k_pages[block_tables], 1, 2)  # [B, Hkv, P, ps, D]
    v = jnp.swapaxes(v_pages[block_tables], 1, 2)
    return (jnp.swapaxes(k.reshape(b, hkv, -1, d), 0, 1),
            jnp.swapaxes(v.reshape(b, hkv, -1, d), 0, 1))


def paged_attention_decode_xla(q: jnp.ndarray, k_pages: jnp.ndarray,
                               v_pages: jnp.ndarray,
                               block_tables: jnp.ndarray,
                               context_lens: jnp.ndarray,
                               scale: float,
                               k_scale: Optional[jnp.ndarray] = None,
                               v_scale: Optional[jnp.ndarray] = None
                               ) -> jnp.ndarray:
    """q: [B, H, D] → [B, H, D]. context_lens counts tokens INCLUDING the
    one being decoded (its KV is already written)."""
    b, h, d = q.shape
    k, v = gather_kv_for_seqs(k_pages, v_pages, block_tables,
                              head_dim=d)
    k, v = dequantize_kv(k, v, k_scale=k_scale, v_scale=v_scale)
    hkv, _, s_max, _ = k.shape
    g = h // hkv
    qf = q.astype(jnp.float32).reshape(b, hkv, g, d)
    scores = jnp.einsum("bkgd,kbsd->bkgs", qf, k) * scale
    mask = (jnp.arange(s_max)[None, :] < context_lens[:, None])
    scores = jnp.where(mask[:, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,kbsd->bkgd", probs, v)
    return out.reshape(b, h, d).astype(q.dtype)


def paged_attention_prefill_xla(q: jnp.ndarray, k_pages: jnp.ndarray,
                                v_pages: jnp.ndarray,
                                block_tables: jnp.ndarray,
                                q_start: jnp.ndarray,
                                kv_lens: jnp.ndarray,
                                scale: float,
                                causal: bool = True,
                                k_scale: Optional[jnp.ndarray] = None,
                                v_scale: Optional[jnp.ndarray] = None
                                ) -> jnp.ndarray:
    """Chunked-prefill attention reading context from pages.

    q: [B, T, H, D]; token t of row b is at absolute position q_start[b]+t
    and attends to positions <= its own (causal) that are < kv_lens[b].
    Padding rows produce garbage the caller never reads.
    """
    b, t, h, d = q.shape
    k, v = gather_kv_for_seqs(k_pages, v_pages, block_tables,
                              head_dim=d)
    k, v = dequantize_kv(k, v, k_scale=k_scale, v_scale=v_scale)
    hkv, _, s_max, _ = k.shape
    g = h // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, g, d)
    scores = jnp.einsum("btkgd,kbsd->btkgs", qf, k) * scale
    kv_pos = jnp.arange(s_max)[None, None, :]
    q_pos = q_start[:, None] + jnp.arange(t)[None, :]
    mask = kv_pos < kv_lens[:, None, None]
    if causal:
        mask = mask & (kv_pos <= q_pos[:, :, None])
    scores = jnp.where(mask[:, :, None, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("btkgs,kbsd->btkgd", probs, v)
    return out.reshape(b, t, h, d).astype(q.dtype)


def mha_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
            causal: bool = False,
            key_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Plain dense attention [B,T,H,D] × [B,S,Hkv,D] — encoders and DiT
    (non-causal full sequence). ``key_mask`` [B, S] bool excludes
    padded/invalid keys for every query (variable-length context
    streams, e.g. HunyuanVideo's reordered text sources)."""
    b, t, h, d = q.shape
    s, hkv = k.shape[1], k.shape[2]
    g = h // hkv
    qf = q.astype(jnp.float32).reshape(b, t, hkv, g, d)
    scores = jnp.einsum("btkgd,bskd->btkgs", qf,
                        k.astype(jnp.float32)) * scale
    if causal:
        mask = (jnp.arange(s)[None, :] <= jnp.arange(t)[:, None])
        scores = jnp.where(mask[None, :, None, None, :], scores, NEG_INF)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, None, :], scores,
                           NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("btkgs,bskd->btkgd", probs, v.astype(jnp.float32))
    return out.reshape(b, t, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas decode kernel — THE hot loop (one token per running request).
#
# Grid: (B,). Each program streams its sequence's pages from HBM through
# a double-buffered VMEM scratch with online-softmax accumulation. One
# DMA per page moves ALL kv heads ([hkv, rows, d] — the page-major
# layout), so DMA issue count is 2·pages per sequence, independent of
# head count. Per block the scores for every head come from a single
# [H, D] × [D, hkv·blk] matmul; a block-diagonal head mask (row's kv
# head == column's kv head) folded into the position mask zeroes the
# cross-head terms, so p @ v accumulates only own-head contributions.
# The hkv× extra MXU work is noise — decode is DMA/bandwidth-bound and
# the MXU is otherwise idle. Block tables arrive via scalar prefetch so
# DMA addresses are known before the body runs. Total HBM traffic per
# step = sum(context_lens) * 2 * D * itemsize — decode speed-of-light.
# ---------------------------------------------------------------------------


def _e4m3_bits_to_f32(x8) -> "jnp.ndarray":
    """int8-bitcast e4m3fn bytes → f32, integer-only field math.

    v5e Mosaic lowers f8 vector loads/converts ~5.5× slower than the
    whole bf16 kernel; int8 loads are fast, so the caller bitcasts the
    f8 pool to int8 and this decodes s|eeee|mmm in i32 (per the rig
    note: no i8 vector sub/shift — all shifts in i32):
    normals → f32 bits  sign<<31 | (e+120)<<23 | m<<20;
    subnormals (e==0) → m·2⁻⁹ exactly. 0x7f/0xff (e4m3fn NaN) decode
    as ±480 — never written by quantize_kv (clips to ±448)."""
    xi = x8.astype(jnp.int32)
    em = xi & 0x7F
    sgn = (xi & 0x80) << 24
    mag = sgn | (((em >> 3) + 120) << 23) | ((em & 7) << 20)
    normal = jax.lax.bitcast_convert_type(mag, jnp.float32)
    sub = (em.astype(jnp.float32) * (2.0 ** -9) *
           jnp.where(xi < 0, -1.0, 1.0))
    return jnp.where(em < 8, sub, normal)


def _decode_kernel(block_tables_ref, num_blocks_ref, cum_blocks_ref,
                   context_lens_ref, q_ref, k_hbm, v_hbm, o_ref,
                   k_buf, v_buf, k_sem, v_sem,
                   *, pages_per_blk: int, page_size: int, hkv: int,
                   g: int, scale: float, fp8_bits: bool = False):
    """Globally software-pipelined over the flat (seq, block) stream.

    Work items are numbered globally: item ``cum_blocks[b] + blk`` is
    block ``blk`` of sequence ``b`` (every sequence has >= 1 block —
    the wrapper clamps — so the stream is gapless). Buffer slot of item
    g is ``g % 2`` regardless of which sequence it belongs to, and the
    body of item g issues the DMA for item g+1 — whether that is this
    sequence's next block or the NEXT sequence's block 0. The round-2
    kernel reset slots per sequence and issued the next sequence's
    block 0 only after its own compute loop, leaving one unhidden
    page-fetch bubble per sequence: at serving shapes (bs=32, ctx=248
    → 2 blocks/seq) that bubble was ~1/3 of the runtime (53% of the
    KV-bytes roofline, docs/design/performance.md). Slot safety: item
    g+1 overwrites slot (g+1)%2, last used by item g-1, whose compute
    finished before body(g) ran (the grid and fori_loop are serial on
    one core).
    """
    b = pl.program_id(0)
    nprog = pl.num_programs(0)
    n_blocks = num_blocks_ref[b]   # >= 1 (wrapper clamps; ctx=0 rows
    cum = cum_blocks_ref[b]        # run one zero-fetch masked block)
    ctx = context_lens_ref[b]
    p_max = block_tables_ref.shape[1]

    # Fetches are UNCONDITIONAL: tail pages of a sequence's last block
    # read whatever the block table holds there (page 0, the reserved
    # null page) and the position mask kills their scores. A per-page
    # `pl.when(page needed)` guard was measured to cost 13% at the
    # serving shape (0.048 -> 0.055 ms; scalar-core branch per
    # start/wait) while buying nothing on ragged batches (47.0% vs
    # 46.8% — those are bounded by per-block VPU work, not bandwidth).
    def start_fetch_for(seq, blk, slot):
        for i in range(pages_per_blk):
            page_idx = jnp.minimum(blk * pages_per_blk + i, p_max - 1)
            pid = block_tables_ref[seq, page_idx]
            pltpu.make_async_copy(k_hbm.at[pid], k_buf.at[slot, i],
                                  k_sem.at[slot, i]).start()
            pltpu.make_async_copy(v_hbm.at[pid], v_buf.at[slot, i],
                                  v_sem.at[slot, i]).start()

    def wait_fetch(seq, blk, slot):
        del seq, blk
        for i in range(pages_per_blk):
            pltpu.make_async_copy(k_hbm.at[0], k_buf.at[slot, i],
                                  k_sem.at[slot, i]).wait()
            pltpu.make_async_copy(v_hbm.at[0], v_buf.at[slot, i],
                                  v_sem.at[slot, i]).wait()

    # Item 0 has no predecessor: program 0 issues it itself.
    @pl.when(b == 0)
    def _():
        start_fetch_for(0, 0, 0)

    blk_tokens = pages_per_blk * page_size  # logical tokens per head
    q = q_ref[0].astype(jnp.float32)        # [H, D] (H = hkv·g, hkv-major)
    h, d = q.shape
    pack = 128 // d if d < 128 else 1       # lane-packed physical rows
    rows = page_size // pack                # physical rows per page
    n_cols = pages_per_blk * hkv * rows     # packed columns per block
    # packed column c → (page-slot c // (hkv·rows), head (c // rows) %
    # hkv, physical row c % rows holding tokens row·pack + sec);
    # score row r → kv head r // g
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    col_page = col // (hkv * rows)
    col_rowtok = (col % rows) * pack
    head_ok = ((col // rows) % hkv ==
               jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) // g)

    def body(blk, carry):
        acc, m, l = carry
        slot = (cum + blk) % 2

        # issue global item g+1 = (b, blk+1) or (b+1, 0); slot
        # continuity holds because cum[b+1] = cum[b] + n_blocks
        nxt_in_seq = blk + 1 < n_blocks

        @pl.when(nxt_in_seq | (b + 1 < nprog))
        def _():
            start_fetch_for(jnp.where(nxt_in_seq, b, b + 1),
                            jnp.where(nxt_in_seq, blk + 1, 0),
                            (cum + blk + 1) % 2)

        wait_fetch(b, blk, slot)
        # KV dequant scales never enter the kernel: per-head K scales
        # fold into q rows pre-kernel and per-head V scales into output
        # rows post-kernel (cross-head terms are masked / exp to 0, so
        # the fold is exact) — see paged_attention_decode_pallas.
        k = k_buf[slot].reshape(n_cols, 128 if pack > 1 else d)
        v = v_buf[slot].reshape(n_cols, 128 if pack > 1 else d)
        if fp8_bits:
            # e4m3 pages arrive BITCAST to int8 (the wrapper relabels
            # the pool): Mosaic's f8 vector loads/converts lower
            # catastrophically on v5e (measured 5.5× the bf16 kernel),
            # while the int8 path is fast — so decode the e4m3 fields
            # with integer math and bitcast to f32.
            k = _e4m3_bits_to_f32(k)
            v = _e4m3_bits_to_f32(v)
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
        # small heads (d < 128): each packed 128-lane row holds `pack`
        # tokens. Mosaic cannot shape-cast the lane dim, so extract
        # section `sec` with a selection matmul k_s = k @ E_sec
        # (E_sec[i, j] = [i == sec·d + j]) and treat sections as extra
        # online-softmax blocks — MXU-only, no relayouts.
        per_sec = []
        for sec in range(pack):
            if pack == 1:
                k_s, v_s = k, v
            else:
                e_sel = (jax.lax.broadcasted_iota(
                    jnp.int32, (128, d), 0) == sec * d +
                    jax.lax.broadcasted_iota(jnp.int32, (128, d), 1)
                ).astype(jnp.float32)
                k_s = jnp.dot(k, e_sel, preferred_element_type=jnp.float32)
                v_s = jnp.dot(v, e_sel, preferred_element_type=jnp.float32)
            s = jnp.dot(q, k_s.T,
                        preferred_element_type=jnp.float32) * scale
            pos = (blk * blk_tokens + col_page * page_size +
                   col_rowtok + sec)
            s = jnp.where(head_ok & (pos < ctx), s, NEG_INF)
            per_sec.append((s, v_s))
        m_new = m
        for s, _ in per_sec:
            m_new = jnp.maximum(m_new, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l
        acc_new = acc * alpha
        for s, v_s in per_sec:
            p = jnp.exp(s - m_new)
            l_new = l_new + jnp.sum(p, -1, keepdims=True)
            acc_new = acc_new + jnp.dot(p, v_s,
                                        preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    init = (jnp.zeros((h, d), jnp.float32),
            jnp.full((h, 1), NEG_INF, jnp.float32),
            jnp.zeros((h, 1), jnp.float32))
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "pages_per_blk", "interpret"))
def paged_attention_decode_pallas(q: jnp.ndarray, k_pages: jnp.ndarray,
                                  v_pages: jnp.ndarray,
                                  block_tables: jnp.ndarray,
                                  context_lens: jnp.ndarray,
                                  scale: float,
                                  pages_per_blk: int = 16,
                                  interpret: bool = False,
                                  k_scale: Optional[jnp.ndarray] = None,
                                  v_scale: Optional[jnp.ndarray] = None
                                  ) -> jnp.ndarray:
    """k_scale/v_scale: optional per-kv-head dequant scales [hkv]
    (quantize_kv wrote k/scale into the cache). They never enter the
    kernel: scores are linear in K per column and the GQA block-diag
    mask kills every cross-head term, so scaling q row r by
    k_scale[r // g] is exact; attention output rows are linear in V
    with p == 0 off-head, so scaling output rows by v_scale[r // g] is
    exact. Legacy int8 caches without scales use the fixed 1/16 write
    scale."""
    b, h, d = q.shape
    n_pages, hkv, rows_per_page, d_phys = k_pages.shape
    page_size = rows_per_page * (d_phys // d)  # logical tokens/page
    g = h // hkv
    p_max = block_tables.shape[1]
    pages_per_blk = min(pages_per_blk, p_max)
    # >= 1 block per row: ctx=0 padding rows fetch one fully-masked
    # block so the global DMA stream stays gapless (see _decode_kernel)
    num_blocks = jnp.maximum(
        (cdiv_arr(context_lens, page_size) + pages_per_blk - 1)
        // pages_per_blk, 1)
    cum_blocks = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(num_blocks, dtype=jnp.int32)[:-1]])

    out_dtype = q.dtype
    fp8_bits = k_pages.dtype == jnp.float8_e4m3fn
    if fp8_bits:
        # relabel the f8 pool as int8 (free inside jit): Mosaic's f8
        # vector loads/converts lower ~5.5× slower than the whole bf16
        # kernel on v5e; the kernel decodes e4m3 fields with integer
        # math instead (_e4m3_bits_to_f32)
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.int8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.int8)
    if k_scale is None and k_pages.dtype == jnp.int8 and not fp8_bits:
        k_scale = jnp.full((hkv,), 1.0 / 16.0, jnp.float32)
        v_scale = jnp.full((hkv,), 1.0 / 16.0, jnp.float32)
    if k_scale is not None:
        # f32 into the kernel: the fold must not round the scaled q
        # back to bf16 (the kernel upcasts q to f32 anyway)
        q = (q.astype(jnp.float32) *
             jnp.repeat(k_scale, g)[None, :, None])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  #K pages stay in HBM
            pl.BlockSpec(memory_space=pl.ANY),  #V pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, h, d), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_blk, hkv, rows_per_page, d_phys),
                       k_pages.dtype),
            pltpu.VMEM((2, pages_per_blk, hkv, rows_per_page, d_phys),
                       v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pages_per_blk)),
            pltpu.SemaphoreType.DMA((2, pages_per_blk)),
        ],
    )
    kernel = functools.partial(_decode_kernel, pages_per_blk=pages_per_blk,
                               page_size=page_size, hkv=hkv, g=g,
                               scale=scale, fp8_bits=fp8_bits)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, d), out_dtype),
        interpret=interpret,
    )(block_tables, num_blocks, cum_blocks, context_lens, q,
      k_pages, v_pages)
    if v_scale is not None:
        out = (out.astype(jnp.float32) *
               jnp.repeat(v_scale, g)[None, :, None]).astype(out_dtype)
    return out


def cdiv_arr(a: jnp.ndarray, b: int) -> jnp.ndarray:
    return (a + b - 1) // b


# ---------------------------------------------------------------------------
# Pallas prefill kernel — flash-style chunked prefill over pages.
#
# Grid: (B, num_kv_heads). One program handles a whole chunk row: streams
# the row's KV pages (context + freshly written chunk) through the same
# double-buffered VMEM pipeline as decode, accumulating online-softmax
# for all T×G query rows at once. Causality is a position mask per KV
# block; KV blocks entirely in the future are never fetched (the loop
# bound is the causal limit, not the padded page table).
# ---------------------------------------------------------------------------


def _prefill_kernel(block_tables_ref, num_blocks_ref, q_start_ref,
                    kv_lens_ref, q_ref, k_hbm, v_hbm, o_ref,
                    k_buf, v_buf, k_sem, v_sem,
                    *, pages_per_blk: int, page_size: int, scale: float,
                    causal: bool, t_blk: int, fp8_bits: bool = False):
    b = pl.program_id(0)
    h = pl.program_id(1)
    tb = pl.program_id(2)  # query tile (bounds VMEM at large T)
    q0 = q_start_ref[b] + tb * t_blk
    kv_len = kv_lens_ref[b]
    blk_span = pages_per_blk * page_size
    n_blocks = num_blocks_ref[b]
    if causal:
        # this tile's queries end at q0 + t_blk; later KV blocks are
        # entirely masked — don't fetch them
        n_blocks = jnp.minimum(
            n_blocks, (q0 + t_blk + blk_span - 1) // blk_span)
    p_max = block_tables_ref.shape[1]

    def start_fetch(blk, slot):
        for i in range(pages_per_blk):
            page_idx = jnp.minimum(blk * pages_per_blk + i, p_max - 1)
            pid = block_tables_ref[b, page_idx]
            pltpu.make_async_copy(k_hbm.at[pid, h], k_buf.at[slot, i],
                                  k_sem.at[slot, i]).start()
            pltpu.make_async_copy(v_hbm.at[pid, h], v_buf.at[slot, i],
                                  v_sem.at[slot, i]).start()

    def wait_fetch(slot):
        for i in range(pages_per_blk):
            pltpu.make_async_copy(k_hbm.at[0, 0], k_buf.at[slot, i],
                                  k_sem.at[slot, i]).wait()
            pltpu.make_async_copy(v_hbm.at[0, 0], v_buf.at[slot, i],
                                  v_sem.at[slot, i]).wait()

    @pl.when(n_blocks > 0)
    def _():
        start_fetch(0, 0)

    blk_tokens = pages_per_blk * page_size
    t, g, d = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    pack = 128 // d if d < 128 else 1       # lane-packed physical rows
    rows = page_size // pack                # physical rows per page
    n_cols = pages_per_blk * rows
    q = q_ref[0, 0].reshape(t * g, d).astype(jnp.float32)
    # absolute position of each query row (row r of t·g = query token
    # r // g)
    q_pos = q0 + jax.lax.broadcasted_iota(jnp.int32, (t * g, 1),
                                          0) // g
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n_cols), 1)
    col_base = (col // rows) * page_size + (col % rows) * pack

    def body(blk, carry):
        acc, m, l = carry
        slot = blk % 2

        @pl.when(blk + 1 < n_blocks)
        def _():
            start_fetch(blk + 1, (blk + 1) % 2)

        wait_fetch(slot)
        # dequant scales fold into q / output rows in the wrapper (one
        # kv head per program), never into the kernel
        k = k_buf[slot].reshape(n_cols, 128 if pack > 1 else d)
        v = v_buf[slot].reshape(n_cols, 128 if pack > 1 else d)
        if fp8_bits:
            # e4m3 pages arrive BITCAST to int8 (the wrapper relabels
            # the pool): Mosaic's f8 vector loads/converts lower
            # catastrophically on v5e (measured 5.5× the bf16 kernel),
            # while the int8 path is fast — so decode the e4m3 fields
            # with integer math and bitcast to f32.
            k = _e4m3_bits_to_f32(k)
            v = _e4m3_bits_to_f32(v)
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
        # lane-packed small heads: per-section selection matmuls (see
        # _decode_kernel) — sections act as extra online-softmax blocks
        per_sec = []
        for sec in range(pack):
            if pack == 1:
                k_s, v_s = k, v
            else:
                e_sel = (jax.lax.broadcasted_iota(
                    jnp.int32, (128, d), 0) == sec * d +
                    jax.lax.broadcasted_iota(jnp.int32, (128, d), 1)
                ).astype(jnp.float32)
                k_s = jnp.dot(k, e_sel, preferred_element_type=jnp.float32)
                v_s = jnp.dot(v, e_sel, preferred_element_type=jnp.float32)
            s = jnp.dot(q, k_s.T,
                        preferred_element_type=jnp.float32) * scale
            kv_pos = blk * blk_tokens + col_base + sec
            mask = kv_pos < kv_len
            if causal:
                mask = mask & (kv_pos <= q_pos)
            s = jnp.where(mask, s, NEG_INF)
            per_sec.append((s, v_s))
        m_new = m
        for s, _ in per_sec:
            m_new = jnp.maximum(m_new, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l
        acc_new = acc * alpha
        for s, v_s in per_sec:
            p = jnp.exp(s - m_new)
            l_new = l_new + jnp.sum(p, -1, keepdims=True)
            acc_new = acc_new + jnp.dot(p, v_s,
                                        preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    init = (jnp.zeros((t * g, d), jnp.float32),
            jnp.full((t * g, 1), NEG_INF, jnp.float32),
            jnp.zeros((t * g, 1), jnp.float32))
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, init)
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.reshape(t, g, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "pages_per_blk", "interpret"))
def paged_attention_prefill_pallas(q: jnp.ndarray, k_pages: jnp.ndarray,
                                   v_pages: jnp.ndarray,
                                   block_tables: jnp.ndarray,
                                   q_start: jnp.ndarray,
                                   kv_lens: jnp.ndarray, scale: float,
                                   causal: bool = True,
                                   pages_per_blk: int = 8,
                                   interpret: bool = False,
                                   k_scale: Optional[jnp.ndarray] = None,
                                   v_scale: Optional[jnp.ndarray] = None
                                   ) -> jnp.ndarray:
    """q [B, T, H, D] chunk rows → [B, T, H, D]; context read from pages
    (which already include the chunk's own freshly written KV).
    k_scale/v_scale: per-kv-head dequant scales [hkv], folded into q /
    output rows exactly (one kv head per program — see the decode
    wrapper's derivation)."""
    b, t, h, d = q.shape
    n_pages, hkv, rows_per_page, d_phys = k_pages.shape
    page_size = rows_per_page * (d_phys // d)  # logical tokens/page
    g = h // hkv
    p_max = block_tables.shape[1]
    pages_per_blk = min(pages_per_blk, p_max)
    blk_tokens = pages_per_blk * page_size
    # causal limit: KV beyond the chunk's last token is never attended
    limit = jnp.minimum(kv_lens, q_start + t) if causal else kv_lens
    num_blocks = (cdiv_arr(limit, page_size) + pages_per_blk -
                  1) // pages_per_blk
    out_dtype = q.dtype
    fp8_bits = k_pages.dtype == jnp.float8_e4m3fn
    if fp8_bits:
        # relabel the f8 pool as int8 (free inside jit): Mosaic's f8
        # vector loads/converts lower ~5.5× slower than the whole bf16
        # kernel on v5e; the kernel decodes e4m3 fields with integer
        # math instead (_e4m3_bits_to_f32)
        k_pages = jax.lax.bitcast_convert_type(k_pages, jnp.int8)
        v_pages = jax.lax.bitcast_convert_type(v_pages, jnp.int8)
    if k_scale is None and k_pages.dtype == jnp.int8 and not fp8_bits:
        k_scale = jnp.full((hkv,), 1.0 / 16.0, jnp.float32)
        v_scale = jnp.full((hkv,), 1.0 / 16.0, jnp.float32)
    if k_scale is not None:
        q = (q.astype(jnp.float32) *
             jnp.repeat(k_scale, g)[None, None, :, None])
    q_r = jnp.transpose(q.reshape(b, t, hkv, g, d), (0, 2, 1, 3, 4))
    # tile the query dim: whole-T q/o blocks VMEM-OOM at T≥1024 with
    # 8B geometry (measured: 20 MB scoped vmem vs the 16 MB limit)
    t_blk = t
    for cand in (512, 256, 128):
        if t > cand and t % cand == 0 and cand * g * d >= 128:
            t_blk = cand
            break
    n_t = t // t_blk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, hkv, n_t),
        in_specs=[
            pl.BlockSpec((1, 1, t_blk, g, d),
                         lambda i, j, tb, *_: (i, j, tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, t_blk, g, d),
                               lambda i, j, tb, *_: (i, j, tb, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, pages_per_blk, rows_per_page, d_phys),
                       k_pages.dtype),
            pltpu.VMEM((2, pages_per_blk, rows_per_page, d_phys),
                       v_pages.dtype),
            pltpu.SemaphoreType.DMA((2, pages_per_blk)),
            pltpu.SemaphoreType.DMA((2, pages_per_blk)),
        ],
    )
    kernel = functools.partial(_prefill_kernel,
                               pages_per_blk=pages_per_blk,
                               page_size=page_size, scale=scale,
                               causal=causal, t_blk=t_blk,
                               fp8_bits=fp8_bits)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hkv, t, g, d), out_dtype),
        interpret=interpret,
    )(block_tables, num_blocks, q_start, kv_lens, q_r, k_pages, v_pages)
    if v_scale is not None:
        out = (out.astype(jnp.float32) *
               v_scale[None, :, None, None, None]).astype(out_dtype)
    return jnp.transpose(out, (0, 2, 1, 3, 4)).reshape(b, t, h, d)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------


def pallas_supported_geometry(k_pages: jnp.ndarray) -> bool:
    """Both Pallas paged-attention kernels take any KV storage dtype —
    int8 dequants in-register right after the DMA lands (round 1 fell
    back to the XLA gather path for int8 KV). head_dim must be a
    multiple of 128: Mosaic requires HBM DMA slices 128-aligned on the
    lane axis (verified on v5e — "Slice shape along dimension 3 must be
    aligned to tiling (128)"); d=64 support needs the token-pair packed
    page layout (two 64-dim vectors per 128-lane row)."""
    return k_pages.shape[-1] % 128 == 0


def paged_attention_decode(q, k_pages, v_pages, block_tables, context_lens,
                           scale, k_scale=None, v_scale=None):
    from vllm_omni_tpu.ops import use_pallas

    if use_pallas() and pallas_supported_geometry(k_pages):
        return paged_attention_decode_pallas(
            q, k_pages, v_pages, block_tables, context_lens, scale=scale,
            k_scale=k_scale, v_scale=v_scale)
    return paged_attention_decode_xla(q, k_pages, v_pages, block_tables,
                                      context_lens, scale,
                                      k_scale=k_scale, v_scale=v_scale)


def paged_attention_prefill(q, k_pages, v_pages, block_tables, q_start,
                            kv_lens, scale, causal=True, k_scale=None,
                            v_scale=None):
    from vllm_omni_tpu.ops import use_pallas

    if use_pallas() and pallas_supported_geometry(k_pages):
        return paged_attention_prefill_pallas(
            q, k_pages, v_pages, block_tables, q_start, kv_lens,
            scale=scale, causal=causal, k_scale=k_scale, v_scale=v_scale)
    return paged_attention_prefill_xla(q, k_pages, v_pages, block_tables,
                                       q_start, kv_lens, scale, causal,
                                       k_scale=k_scale, v_scale=v_scale)
