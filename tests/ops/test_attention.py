import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.ops.attention import (mha_xla, paged_attention_decode_xla,
                                         paged_attention_decode_pallas,
                                         paged_attention_prefill_xla,
                                         quantize_kv, write_kv_pages)


def naive_attention(q, k, v, scale, causal=False):
    """Straight softmax attention, per-batch, with GQA repeat. Oracle."""
    b, t, h, d = q.shape
    hkv = k.shape[2]
    g = h // hkv
    k = np.repeat(np.asarray(k, np.float64), g, axis=2)
    v = np.repeat(np.asarray(v, np.float64), g, axis=2)
    q = np.asarray(q, np.float64)
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            s = q[bi, :, hi] @ k[bi, :, hi].T * scale
            if causal:
                mask = np.tril(np.ones((t, k.shape[1])), k=k.shape[1] - t)
                s = np.where(mask, s, -1e30)
            p = np.exp(s - s.max(-1, keepdims=True))
            p /= p.sum(-1, keepdims=True)
            out[bi, :, hi] = p @ v[bi, :, hi]
    return out


class PagedCase:
    """Builds a paged KV cache from dense per-seq K/V."""

    def __init__(self, key, b=3, hkv=2, g=2, d=64, page_size=4, n_pages=64,
                 ctx_lens=(7, 12, 3), kv_dtype=None):
        ks = jax.random.split(jax.random.PRNGKey(key), 4)
        self.b, self.hkv, self.g, self.d = b, hkv, g, d
        self.h = hkv * g
        self.page_size = page_size
        s_max = max(ctx_lens)
        self.ctx = np.array(ctx_lens, np.int32)
        self.k_dense = jax.random.normal(ks[0], (b, s_max, hkv, d))
        self.v_dense = jax.random.normal(ks[1], (b, s_max, hkv, d))
        p_max = -(-s_max // page_size)
        self.p_max = p_max
        kp = jnp.zeros((n_pages, hkv, page_size, d))
        vp = jnp.zeros((n_pages, hkv, page_size, d))
        bt = np.zeros((b, p_max), np.int32)
        next_page = 1
        for bi in range(b):
            n = -(-int(self.ctx[bi]) // page_size)
            for pi in range(n):
                bt[bi, pi] = next_page
                lo, hi = pi * page_size, min((pi + 1) * page_size,
                                             int(self.ctx[bi]))
                kp = kp.at[next_page, :, :hi - lo].set(
                    jnp.swapaxes(self.k_dense[bi, lo:hi], 0, 1))
                vp = vp.at[next_page, :, :hi - lo].set(
                    jnp.swapaxes(self.v_dense[bi, lo:hi], 0, 1))
                next_page += 1
        if kv_dtype:
            kp, vp = quantize_kv(kp, vp, kv_dtype)
        self.k_pages, self.v_pages = kp, vp
        self.block_tables = jnp.asarray(bt)
        self.q = jax.random.normal(ks[2], (b, self.h, d))

    def dense_masked(self, bi):
        n = int(self.ctx[bi])
        return self.k_dense[bi, :n], self.v_dense[bi, :n]


def test_decode_xla_matches_naive():
    case = PagedCase(0)
    scale = case.d ** -0.5
    out = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables,
                                     jnp.asarray(case.ctx), scale)
    for bi in range(case.b):
        k, v = case.dense_masked(bi)
        ref = naive_attention(case.q[bi][None, None], k[None], v[None],
                              scale)  # [1,1,H,D]
        np.testing.assert_allclose(np.asarray(out[bi]), ref[0, 0],
                                   rtol=2e-5, atol=2e-5)


def test_decode_pallas_matches_xla():
    case = PagedCase(1, b=4, hkv=2, g=4, d=128, page_size=8, n_pages=32,
                     ctx_lens=(9, 24, 17, 2))
    scale = case.d ** -0.5
    ref = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables,
                                     jnp.asarray(case.ctx), scale)
    out = paged_attention_decode_pallas(case.q, case.k_pages, case.v_pages,
                                        case.block_tables,
                                        jnp.asarray(case.ctx), scale=scale,
                                        pages_per_blk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_fp8_kv_close():
    case = PagedCase(2, kv_dtype="fp8")
    case_ref = PagedCase(2)
    scale = case.d ** -0.5
    out = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables,
                                     jnp.asarray(case.ctx), scale)
    ref = paged_attention_decode_xla(case_ref.q, case_ref.k_pages,
                                     case_ref.v_pages,
                                     case_ref.block_tables,
                                     jnp.asarray(case.ctx), scale)
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    assert err < 0.2  # e4m3 ~3 mantissa bits on N(0,1) K/V


def test_prefill_causal_matches_naive():
    # fresh prefill: whole prompt is the chunk, q_start = 0
    case = PagedCase(3, ctx_lens=(6, 6, 6))
    scale = case.d ** -0.5
    t = 6
    key = jax.random.PRNGKey(99)
    q = jax.random.normal(key, (case.b, t, case.h, case.d))
    out = paged_attention_prefill_xla(
        q, case.k_pages, case.v_pages, case.block_tables,
        q_start=jnp.zeros(case.b, jnp.int32),
        kv_lens=jnp.asarray(case.ctx), scale=scale)
    for bi in range(case.b):
        k, v = case.dense_masked(bi)
        ref = naive_attention(q[bi][None], k[None], v[None], scale,
                              causal=True)
        np.testing.assert_allclose(np.asarray(out[bi]), ref[0], rtol=2e-5,
                                   atol=2e-5)


def test_prefill_chunked_matches_full():
    """Chunk 2 of a prompt must equal the tail of a full-prompt prefill."""
    case = PagedCase(4, ctx_lens=(12, 12, 12))
    scale = case.d ** -0.5
    qfull = jax.random.normal(jax.random.PRNGKey(7),
                              (case.b, 12, case.h, case.d))
    full = paged_attention_prefill_xla(
        qfull, case.k_pages, case.v_pages, case.block_tables,
        q_start=jnp.zeros(case.b, jnp.int32),
        kv_lens=jnp.asarray(case.ctx), scale=scale)
    chunk = paged_attention_prefill_xla(
        qfull[:, 8:], case.k_pages, case.v_pages, case.block_tables,
        q_start=jnp.full((case.b,), 8, jnp.int32),
        kv_lens=jnp.asarray(case.ctx), scale=scale)
    np.testing.assert_allclose(np.asarray(chunk), np.asarray(full[:, 8:]),
                               rtol=2e-5, atol=2e-5)


def test_write_kv_pages_roundtrip():
    hkv, n_pages, ps, d = 2, 8, 4, 16
    kp = jnp.zeros((n_pages, hkv, ps, d))
    vp = jnp.zeros((n_pages, hkv, ps, d))
    t = 5
    k_new = jnp.arange(t * hkv * d, dtype=jnp.float32).reshape(t, hkv, d)
    v_new = -k_new
    # tokens land in page 2 slots 1..3 then page 5 slots 0..1
    slots = jnp.asarray([2 * ps + 1, 2 * ps + 2, 2 * ps + 3, 5 * ps + 0,
                         5 * ps + 1])
    kp, vp = write_kv_pages(kp, vp, k_new, v_new, slots)
    np.testing.assert_array_equal(np.asarray(kp[2, :, 1]),
                                  np.asarray(k_new[0]))
    np.testing.assert_array_equal(np.asarray(kp[5, :, 0]),
                                  np.asarray(k_new[3]))
    np.testing.assert_array_equal(np.asarray(vp[5, :, 1]),
                                  np.asarray(v_new[4]))
    # untouched slots stay zero
    assert float(jnp.abs(kp[3]).sum()) == 0.0


def test_write_kv_pages_pallas_matches_xla_interpret():
    """In-place Pallas KV writer (page-granularity RMW, interpret mode)
    vs the XLA scatter oracle, across KV dtypes. On TPU this kernel
    aliases the cache buffers (input_output_aliases) so a decode scan
    step writes 2 pages/token instead of copying the whole cache."""
    from vllm_omni_tpu.ops.attention import (write_kv_pages_pallas,
                                             write_kv_pages_xla)
    for dt in (jnp.float32, jnp.bfloat16, jnp.int8):
        hkv, n_pages, ps, d = 2, 8, 16, 128
        kp = (jax.random.normal(jax.random.PRNGKey(0),
                                (n_pages, hkv, ps, d)) * 10).astype(dt)
        vp = (jax.random.normal(jax.random.PRNGKey(9),
                                (n_pages, hkv, ps, d)) * 10).astype(dt)
        t = 4
        k_new = (jax.random.normal(jax.random.PRNGKey(1),
                                   (t, hkv, d)) * 10).astype(dt)
        v_new = (k_new.astype(jnp.float32) * 2).astype(dt)
        slots = jnp.asarray([3, 17, 64, 100], jnp.int32)
        want_k, want_v = write_kv_pages_xla(kp, vp, k_new, v_new, slots)
        got_k, got_v = write_kv_pages_pallas(kp, vp, k_new, v_new, slots,
                                             interpret=True)
        np.testing.assert_array_equal(np.asarray(got_k),
                                      np.asarray(want_k))
        np.testing.assert_array_equal(np.asarray(got_v),
                                      np.asarray(want_v))


def test_mha_gqa_matches_naive():
    key = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(key[0], (2, 10, 8, 32))
    k = jax.random.normal(key[1], (2, 10, 2, 32))
    v = jax.random.normal(key[2], (2, 10, 2, 32))
    out = mha_xla(q, k, v, scale=32 ** -0.5, causal=True)
    ref = naive_attention(q, k, v, 32 ** -0.5, causal=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_prefill_pallas_matches_xla_interpret():
    """Pallas flash prefill (interpret mode on CPU) vs the XLA oracle,
    incl. chunked rows with nonzero q_start."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_omni_tpu.ops.attention import (paged_attention_prefill_pallas,
                                             paged_attention_prefill_xla,
                                             write_kv_pages)

    hkv, pages, ps, d = 2, 16, 16, 128
    hq, b, t = 4, 2, 32
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (pages, hkv, ps, d), jnp.float32)
    vp = jax.random.normal(jax.random.fold_in(key, 1),
                           (pages, hkv, ps, d), jnp.float32)
    q = jax.random.normal(jax.random.fold_in(key, 2), (b, t, hq, d),
                          jnp.float32)
    bt = jnp.asarray([[1, 2, 3, 4, 0, 0, 0, 0],
                      [5, 6, 7, 8, 9, 10, 0, 0]], jnp.int32)
    # row 0: fresh prompt chunk [0,32) of 32-token ctx; row 1: chunk
    # starting at 48 of a 80-token ctx (chunked prefill)
    q_start = jnp.asarray([0, 48], jnp.int32)
    kv_lens = jnp.asarray([32, 80], jnp.int32)
    ref = paged_attention_prefill_xla(q, kp, vp, bt, q_start, kv_lens,
                                      scale=d ** -0.5)
    got = paged_attention_prefill_pallas(q, kp, vp, bt, q_start, kv_lens,
                                         scale=d ** -0.5, pages_per_blk=2,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("d,kv_dtype", [(64, None), (64, "int8"),
                                        (128, "int8"), (64, "fp8")])
def test_decode_pallas_geometry_matrix(d, kv_dtype):
    """int8/fp8 KV take the Pallas path (in-kernel dequant) — golden vs
    the XLA gather oracle. d=64 cases validate kernel numerics in
    interpret mode only: on real hardware Mosaic requires 128-aligned
    DMA slices, so dispatch (pallas_supported_geometry) gates on
    head_dim % 128 until the packed-pair page layout lands."""
    case = PagedCase(3, b=3, hkv=2, g=4, d=d, page_size=8, n_pages=32,
                     ctx_lens=(9, 24, 5), kv_dtype=kv_dtype)
    scale = case.d ** -0.5
    ref = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables,
                                     jnp.asarray(case.ctx), scale)
    out = paged_attention_decode_pallas(case.q, case.k_pages, case.v_pages,
                                        case.block_tables,
                                        jnp.asarray(case.ctx), scale=scale,
                                        pages_per_blk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("d,kv_dtype", [(64, None), (64, "int8"),
                                        (128, "int8")])
def test_prefill_pallas_geometry_matrix(d, kv_dtype):
    from vllm_omni_tpu.ops.attention import (
        paged_attention_prefill_pallas)

    b, t, hkv, g, ps = 2, 8, 2, 2, 8
    h = hkv * g
    ctx = (24, 13)
    key = jax.random.PRNGKey(7)
    case = PagedCase(4, b=b, hkv=hkv, g=g, d=d, page_size=ps, n_pages=32,
                     ctx_lens=ctx, kv_dtype=kv_dtype)
    q = jax.random.normal(key, (b, t, h, d))
    q_start = jnp.asarray([int(c) - t for c in ctx], jnp.int32)
    scale = d ** -0.5
    ref = paged_attention_prefill_xla(q, case.k_pages, case.v_pages,
                                      case.block_tables, q_start,
                                      jnp.asarray(case.ctx), scale)
    out = paged_attention_prefill_pallas(q, case.k_pages, case.v_pages,
                                         case.block_tables, q_start,
                                         jnp.asarray(case.ctx), scale,
                                         pages_per_blk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Lane-packed small-head layout (d < 128) — kv_physical_shape
# ---------------------------------------------------------------------------


def _pack_pages(pages, d):
    """Logical [np, hkv, ps, d] → physical packed [np, hkv, ps*d/128, 128]."""
    n_pages, hkv = pages.shape[:2]
    return pages.reshape(n_pages, hkv, -1, 128)


def test_kv_physical_shape_packs_small_heads():
    from vllm_omni_tpu.ops.attention import (kv_physical_shape, lane_pack,
                                             min_page_size_for_pallas)

    assert lane_pack(128) == 1 and lane_pack(64) == 2 and lane_pack(32) == 4
    assert kv_physical_shape(8, 100, 16, 128, jnp.bfloat16) == \
        (100, 8, 16, 128)
    # bf16 d=64: pack 2, ps 32 → 16 sublane rows/page (tile-aligned)
    assert kv_physical_shape(8, 100, 32, 64, jnp.bfloat16) == \
        (100, 8, 16, 128)
    # misaligned page size → stays unpacked (XLA fallback)
    assert kv_physical_shape(8, 100, 16, 64, jnp.bfloat16) == \
        (100, 8, 16, 64)
    # int8 needs 32-sublane pages → ps 64 at d=64
    assert kv_physical_shape(8, 100, 64, 64, jnp.int8) == (100, 8, 32, 128)
    assert min_page_size_for_pallas(64, jnp.bfloat16) == 32
    assert min_page_size_for_pallas(64, jnp.int8) == 64
    assert min_page_size_for_pallas(128, jnp.bfloat16) == 16


def test_write_kv_xla_packed_matches_unpacked():
    """Packed XLA scatter == unpacked scatter, including adjacent
    prefill slots sharing one packed row (the collision case)."""
    from vllm_omni_tpu.ops.attention import write_kv_pages_xla

    hkv, n_pages, ps, d = 2, 8, 32, 64
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (n_pages, hkv, ps, d))
    vp = jax.random.normal(jax.random.PRNGKey(1), (n_pages, hkv, ps, d))
    t = 9  # odd count → last packed row half-written
    k_new = jax.random.normal(jax.random.PRNGKey(2), (t, hkv, d))
    v_new = jax.random.normal(jax.random.PRNGKey(3), (t, hkv, d))
    # adjacent slots within one page (prefill write pattern)
    slots = jnp.asarray(np.arange(t, dtype=np.int32) + 3 * ps + 5)

    ref_k, ref_v = write_kv_pages_xla(kp, vp, k_new, v_new, slots)
    got_k, got_v = write_kv_pages_xla(_pack_pages(kp, d),
                                      _pack_pages(vp, d),
                                      k_new, v_new, slots)
    np.testing.assert_allclose(
        np.asarray(got_k).reshape(np.asarray(ref_k).shape),
        np.asarray(ref_k), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_v).reshape(np.asarray(ref_v).shape),
        np.asarray(ref_v), rtol=1e-6)


def test_write_kv_pallas_packed_interpret_matches_xla():
    from vllm_omni_tpu.ops.attention import write_kv_pages_pallas

    hkv, n_pages, ps, d = 2, 8, 32, 64
    kp = jax.random.normal(jax.random.PRNGKey(0), (n_pages, hkv, ps, d))
    vp = jax.random.normal(jax.random.PRNGKey(1), (n_pages, hkv, ps, d))
    t = 4
    k_new = jax.random.normal(jax.random.PRNGKey(2), (t, hkv, d))
    v_new = jax.random.normal(jax.random.PRNGKey(3), (t, hkv, d))
    # decode pattern: distinct pages, arbitrary offsets (odd + even)
    slots = jnp.asarray([1 * ps + 0, 2 * ps + 7, 4 * ps + 30, 6 * ps + 13],
                        jnp.int32)
    from vllm_omni_tpu.ops.attention import write_kv_pages_xla

    ref_k, ref_v = write_kv_pages_xla(kp, vp, k_new, v_new, slots)
    got_k, got_v = write_kv_pages_pallas(_pack_pages(kp, d),
                                         _pack_pages(vp, d),
                                         k_new, v_new, slots,
                                         interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_k).reshape(np.asarray(ref_k).shape),
        np.asarray(ref_k), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_v).reshape(np.asarray(ref_v).shape),
        np.asarray(ref_v), rtol=1e-6)


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_decode_pallas_packed_interpret(kv_dtype):
    """Packed-layout decode kernel == unpacked XLA oracle at d=64."""
    case = PagedCase(11, b=3, hkv=2, g=4, d=64, page_size=32, n_pages=16,
                     ctx_lens=(40, 17, 5), kv_dtype=kv_dtype)
    scale = case.d ** -0.5
    ref = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables,
                                     jnp.asarray(case.ctx), scale)
    out = paged_attention_decode_pallas(
        case.q, _pack_pages(case.k_pages, 64),
        _pack_pages(case.v_pages, 64), case.block_tables,
        jnp.asarray(case.ctx), scale=scale, pages_per_blk=2,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kv_dtype", [None, "int8"])
def test_prefill_pallas_packed_interpret(kv_dtype):
    from vllm_omni_tpu.ops.attention import paged_attention_prefill_pallas

    b, t, d, ps = 2, 8, 64, 32
    ctx = (40, 13)
    case = PagedCase(12, b=b, hkv=2, g=2, d=d, page_size=ps, n_pages=16,
                     ctx_lens=ctx, kv_dtype=kv_dtype)
    q = jax.random.normal(jax.random.PRNGKey(5), (b, t, case.h, d))
    q_start = jnp.asarray([int(c) - t for c in ctx], jnp.int32)
    scale = d ** -0.5
    ref = paged_attention_prefill_xla(q, case.k_pages, case.v_pages,
                                      case.block_tables, q_start,
                                      jnp.asarray(case.ctx), scale)
    out = paged_attention_prefill_pallas(
        q, _pack_pages(case.k_pages, d), _pack_pages(case.v_pages, d),
        case.block_tables, q_start, jnp.asarray(case.ctx), scale,
        pages_per_blk=2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# Per-head KV dequant scales (VERDICT r2 item 5)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("kv_dtype", ["int8", "fp8"])
def test_per_head_kv_scales_beat_fixed_scale(kv_dtype):
    """Quantize K/V with per-head amax scales; decode through both the
    XLA and Pallas paths must match the unquantized oracle much closer
    than the fixed-1/16 legacy scale when heads have outlier ranges.
    The scale fold is bitwise-equivalent to dequant-then-attend (scores
    linear in K per column, output linear in V with p==0 off-head), so
    path-vs-path tolerance only absorbs f32 softmax noise — q is tamed
    to keep scores small so that noise stays tiny."""
    b, hkv, g, d, ps = 3, 2, 4, 128, 8
    ctx = (9, 24, 17)
    case = PagedCase(21, b=b, hkv=hkv, g=g, d=d, page_size=ps, n_pages=32,
                     ctx_lens=ctx)
    case.q = case.q * 0.25
    # inflate head 1 by 8x: fixed 1/16 scale clips it hard in int8
    k_dense = case.k_dense.at[:, :, 1].multiply(8.0)
    v_dense = case.v_dense.at[:, :, 1].multiply(8.0)
    scale = d ** -0.5
    # rebuild pages quantized with per-head scales
    from vllm_omni_tpu.ops.attention import quantize_kv

    k_sc = jnp.max(jnp.abs(k_dense), axis=(0, 1, 3)) / 127.0
    v_sc = jnp.max(jnp.abs(v_dense), axis=(0, 1, 3)) / 127.0
    if kv_dtype == "fp8":
        k_sc = jnp.max(jnp.abs(k_dense), axis=(0, 1, 3)) / 448.0
        v_sc = jnp.max(jnp.abs(v_dense), axis=(0, 1, 3)) / 448.0
    kp = jnp.zeros_like(case.k_pages)
    vp = jnp.zeros_like(case.v_pages)
    bt = np.asarray(case.block_tables)
    for bi in range(b):
        n = int(case.ctx[bi])
        for pi in range(-(-n // ps)):
            lo, hi = pi * ps, min((pi + 1) * ps, n)
            kq, vq = quantize_kv(k_dense[bi, lo:hi], v_dense[bi, lo:hi],
                                 kv_dtype, k_sc, v_sc)
            kp = kp.at[bt[bi, pi], :, :hi - lo].set(
                jnp.swapaxes(kq, 0, 1).astype(kp.dtype))
            vp = vp.at[bt[bi, pi], :, :hi - lo].set(
                jnp.swapaxes(vq, 0, 1).astype(vp.dtype))
    kp = kp.astype(jnp.int8 if kv_dtype == "int8" else jnp.float8_e4m3fn)
    vp = vp.astype(kp.dtype)

    # oracle on the unquantized K/V
    def oracle(bi):
        n = int(case.ctx[bi])
        return naive_attention(case.q[bi][None, None],
                               np.asarray(k_dense[bi, :n])[None],
                               np.asarray(v_dense[bi, :n])[None], scale)

    out_xla = paged_attention_decode_xla(
        case.q, kp, vp, case.block_tables, jnp.asarray(case.ctx), scale,
        k_scale=k_sc, v_scale=v_sc)
    out_pl = paged_attention_decode_pallas(
        case.q, kp, vp, case.block_tables, jnp.asarray(case.ctx),
        scale=scale, pages_per_blk=2, interpret=True,
        k_scale=k_sc, v_scale=v_sc)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla),
                               rtol=2e-3, atol=2e-3)
    # fixed-1/16 baseline: quantize the same data legacy-style
    kf, vf = quantize_kv(
        k_dense.reshape(-1, hkv, d), v_dense.reshape(-1, hkv, d), kv_dtype)
    kf = kf.reshape(k_dense.shape)
    vf = vf.reshape(v_dense.shape)
    if kv_dtype == "int8":
        kf_dq, vf_dq = (np.asarray(kf, np.float64) / 16.0,
                        np.asarray(vf, np.float64) / 16.0)
    else:
        kf_dq, vf_dq = (np.asarray(kf, np.float64),
                        np.asarray(vf, np.float64))
    err_ph, err_fixed = 0.0, 0.0
    for bi in range(b):
        n = int(case.ctx[bi])
        ref = oracle(bi)[0, 0]
        err_ph = max(err_ph, np.abs(
            np.asarray(out_xla[bi], np.float64) - ref).max())
        fixed = naive_attention(case.q[bi][None, None],
                                kf_dq[bi, :n][None], vf_dq[bi, :n][None],
                                scale)[0, 0]
        err_fixed = max(err_fixed, np.abs(fixed - ref).max())
    if kv_dtype == "int8":
        # the fixed 1/16 scale clips the 8x head; per-head must win big
        assert err_ph < 0.35 * err_fixed, (err_ph, err_fixed)
    else:
        # fp8 e4m3 has RELATIVE precision — a raw cast already covers
        # the dynamic range, so scales (kept for checkpoint-provided
        # k_scale/v_scale compat) just need to stay noise-level
        assert err_ph < 2.0, err_ph


def test_per_head_scales_prefill_paths_agree():
    from vllm_omni_tpu.ops.attention import (paged_attention_prefill_pallas,
                                             quantize_kv)

    b, t, hkv, g, d, ps = 2, 8, 2, 2, 128, 8
    ctx = (24, 13)
    case = PagedCase(22, b=b, hkv=hkv, g=g, d=d, page_size=ps, n_pages=32,
                     ctx_lens=ctx)
    k_sc = jnp.asarray([1 / 24.0, 1 / 3.0], jnp.float32)
    v_sc = jnp.asarray([1 / 5.0, 1 / 40.0], jnp.float32)
    kq, vq = quantize_kv(
        jnp.swapaxes(case.k_pages.reshape(-1, hkv, d), 0, 0),
        jnp.swapaxes(case.v_pages.reshape(-1, hkv, d), 0, 0),
        "int8", k_sc, v_sc)
    kp = kq.reshape(case.k_pages.shape).astype(jnp.int8)
    vp = vq.reshape(case.v_pages.shape).astype(jnp.int8)
    q = jax.random.normal(jax.random.PRNGKey(5), (b, t, hkv * g, d))
    q_start = jnp.asarray([int(c) - t for c in ctx], jnp.int32)
    scale = d ** -0.5
    ref = paged_attention_prefill_xla(q, kp, vp, case.block_tables,
                                      q_start, jnp.asarray(case.ctx),
                                      scale, k_scale=k_sc, v_scale=v_sc)
    out = paged_attention_prefill_pallas(q, kp, vp, case.block_tables,
                                         q_start, jnp.asarray(case.ctx),
                                         scale, pages_per_blk=2,
                                         interpret=True, k_scale=k_sc,
                                         v_scale=v_sc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_decode_pallas_under_shard_map_tp2():
    """The exact shard_map contract worker/model_runner._meshed_attn
    uses for tp>1: q heads + KV heads shard over "tp", tables/lens
    replicate; the Pallas decode kernel (interpret tier on CPU) runs
    per shard and the stitched output must match the unsharded XLA
    oracle. This is the spec that keeps the DMA-pipelined kernel on the
    serving path in sharded topologies."""
    from jax.sharding import PartitionSpec as P

    from vllm_omni_tpu.parallel import make_mesh

    case = PagedCase(31, b=4, hkv=2, g=4, d=128, page_size=8, n_pages=32,
                     ctx_lens=(9, 24, 17, 2))
    scale = case.d ** -0.5
    ctx = jnp.asarray(case.ctx)
    ref = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables, ctx, scale)
    mesh = make_mesh((1, 2), ("dp", "tp"))

    def local(q, kp, vp, bt, lens):
        return paged_attention_decode_pallas(q, kp, vp, bt, lens,
                                             scale=scale, pages_per_blk=2,
                                             interpret=True)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "tp", None), P(None, "tp", None, None),
                  P(None, "tp", None, None), P(), P()),
        out_specs=P(None, "tp", None), check_vma=False)
    out = fn(case.q, case.k_pages, case.v_pages, case.block_tables, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_write_kv_pallas_under_shard_map_tp2():
    """In-place Pallas page writer under the tp shard_map spec: each
    shard RMWs its own KV-head slice; the stitched cache must equal the
    unsharded XLA scatter."""
    from jax.sharding import PartitionSpec as P

    from vllm_omni_tpu.ops.attention import (write_kv_pages_pallas,
                                             write_kv_pages_xla)
    from vllm_omni_tpu.parallel import make_mesh

    hkv, ps, d, n_pages, t = 4, 8, 128, 16, 6
    ks = jax.random.split(jax.random.PRNGKey(3), 4)
    kp = jax.random.normal(ks[0], (n_pages, hkv, ps, d), jnp.float32)
    vp = jax.random.normal(ks[1], (n_pages, hkv, ps, d), jnp.float32)
    k_new = jax.random.normal(ks[2], (t, hkv, d), jnp.float32)
    v_new = jax.random.normal(ks[3], (t, hkv, d), jnp.float32)
    slots = jnp.asarray([9, 17, 33, 42, 57, 88], jnp.int32)
    ref_k, ref_v = write_kv_pages_xla(kp, vp, k_new, v_new, slots)
    mesh = make_mesh((1, 2), ("dp", "tp"))

    def local(kp, vp, kn, vn, s):
        return write_kv_pages_pallas(kp, vp, kn, vn, s, interpret=True)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "tp", None, None), P(None, "tp", None, None),
                  P(None, "tp", None), P(None, "tp", None), P()),
        out_specs=(P(None, "tp", None, None), P(None, "tp", None, None)),
        check_vma=False)
    out_k, out_v = fn(kp, vp, k_new, v_new, slots)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref_k),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("seed", range(6))
def test_decode_pallas_randomized_geometry_fuzz(seed):
    """Seeded random-geometry sweep of the Pallas decode kernel vs the
    XLA reference (reference CPU unit-tier role): random batch, GQA
    group, head_dim ∈ {64, 128}, page size, ragged context lengths —
    catches tiling/indexing bugs the fixed-shape matrix misses."""
    rng = np.random.default_rng(1000 + seed)
    b = int(rng.integers(1, 6))
    hkv = int(rng.choice([1, 2, 4]))
    g = int(rng.choice([1, 2, 4]))
    d = int(rng.choice([64, 128]))
    page_size = int(rng.choice([8, 16]))
    max_pages = int(rng.integers(2, 5))
    ctx = tuple(int(rng.integers(1, page_size * max_pages))
                for _ in range(b))
    n_pages = b * max_pages + 1
    case = PagedCase(seed, b=b, hkv=hkv, g=g, d=d,
                     page_size=page_size, n_pages=n_pages,
                     ctx_lens=ctx)
    scale = d ** -0.5
    ref = paged_attention_decode_xla(case.q, case.k_pages, case.v_pages,
                                     case.block_tables,
                                     jnp.asarray(case.ctx), scale)
    ppb = int(rng.choice([1, 2, 4]))
    out = paged_attention_decode_pallas(
        case.q, case.k_pages, case.v_pages, case.block_tables,
        jnp.asarray(case.ctx), scale=scale, pages_per_blk=ppb,
        interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-5, atol=3e-5,
                               err_msg=f"b={b} hkv={hkv} g={g} d={d} "
                                       f"ps={page_size} ctx={ctx} "
                                       f"ppb={ppb}")


@pytest.mark.parametrize("seed", range(4))
def test_flash_attention_randomized_fuzz(seed):
    """Random (T, S, heads) dense flash sweep vs the XLA reference —
    exercises the static pad-mask split at arbitrary off-block
    sequence lengths."""
    from vllm_omni_tpu.ops.attention import mha_xla
    from vllm_omni_tpu.ops.flash_attention import flash_attention_pallas

    rng = np.random.default_rng(2000 + seed)
    b = int(rng.integers(1, 3))
    t = int(rng.integers(5, 700))
    h = int(rng.choice([1, 2, 4]))
    d = 128
    causal = bool(rng.integers(0, 2))
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    ref = mha_xla(q, k, v, scale=d ** -0.5, causal=causal)
    out = flash_attention_pallas(q, k, v, scale=d ** -0.5,
                                 causal=causal, q_block=256,
                                 block_s=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5,
                               err_msg=f"b={b} t={t} h={h} "
                                       f"causal={causal}")
