import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.ops.quant import (fp8_matmul_xla, int4_matmul_pallas,
                                     int4_matmul_xla, int8_matmul_pallas,
                                     int8_matmul_xla, quantize_fp8,
                                     quantize_int4, quantize_int8,
                                     quantized_matmul)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=dtype)


def test_int8_quant_error_small():
    w = _rand((256, 128), 0)
    q, s = quantize_int8(w)
    deq = q.astype(jnp.float32) * s
    rel = jnp.abs(deq - w).max() / jnp.abs(w).max()
    assert rel < 0.01


def test_int4_quant_error_small():
    from vllm_omni_tpu.ops.quant import unpack_int4

    w = _rand((256, 128), 1)
    packed, s = quantize_int4(w, group_size=64)
    assert packed.shape == (128, 128) and packed.dtype == jnp.uint8
    q = unpack_int4(packed, group_size=64)
    deq = q.astype(jnp.float32).reshape(4, 64, 128) * s[:, None, :]
    rel = jnp.abs(deq.reshape(256, 128) - w).max() / jnp.abs(w).max()
    assert rel < 0.15  # 4-bit symmetric


def test_int8_matmul_matches_dequant():
    x = _rand((16, 256), 2)
    w = _rand((256, 128), 3)
    q, s = quantize_int8(w)
    ref = x @ (q.astype(jnp.float32) * s)
    out = int8_matmul_xla(x, q, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_pallas_matches_xla():
    x = _rand((16, 256), 4)
    w = _rand((256, 128), 5)
    q, s = quantize_int8(w)
    ref = int8_matmul_xla(x, q, s)
    out = int8_matmul_pallas(x, q, s, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_int8_pallas_s8_matches_native():
    """The hand-tiled s8xs8 prefill GEMM is bit-exact vs the XLA native
    W8A8 path (same int32 accumulation, same rescale epilogue); both
    the multi-K-block and the full-K single-accumulation tilings."""
    from vllm_omni_tpu.ops.quant import (int8_matmul_native,
                                         int8_matmul_pallas_s8,
                                         quantize_int8_act)

    x = _rand((512, 256), 10)
    w = _rand((256, 512), 11)
    q, s = quantize_int8(w)
    ref = np.asarray(int8_matmul_native(x, q, s), np.float32)
    xq, xs = quantize_int8_act(x)
    for tiles in (None, (512, 128, 512), (256, 256, 256)):
        out = np.asarray(int8_matmul_pallas_s8(
            xq, xs, q, s, out_dtype=jnp.float32, interpret=True,
            tiles=tiles), np.float32)
        np.testing.assert_array_equal(out, ref)


def test_int8_pallas_fusedq_matches_native():
    """The in-kernel-act-quant variant agrees with the native path to
    one f32 ULP of the per-token scale (XLA's jit rewrites div-by-
    constant to reciprocal multiply, so bit-exactness vs the eager
    reference is not achievable)."""
    from vllm_omni_tpu.ops.quant import (int8_matmul_native,
                                         int8_matmul_pallas_fusedq)

    x = _rand((512, 256), 12)
    w = _rand((256, 1024), 13)
    q, s = quantize_int8(w)
    ref = np.asarray(int8_matmul_native(x, q, s), np.float32)
    out = np.asarray(int8_matmul_pallas_fusedq(
        x, q, s, interpret=True, bn=512), np.float32)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_int4_pallas_matches_xla():
    x = _rand((8, 256), 6)
    w = _rand((256, 128), 7)
    q, s = quantize_int4(w, group_size=64)
    ref = int4_matmul_xla(x, q, s, group_size=64)
    out = int4_matmul_pallas(x, q, s, group_size=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


def test_fp8_matmul_close_to_fp32():
    x = _rand((8, 256), 8)
    w = _rand((256, 128), 9)
    q, s = quantize_fp8(w)
    ref = x @ w
    out = fp8_matmul_xla(x, q, s)
    # fp8 W8A8 ~2 decimal digits
    err = jnp.abs(out - ref).max() / jnp.abs(ref).max()
    assert err < 0.05


@pytest.mark.parametrize("method", ["int8", "int4", "fp8"])
def test_dispatch_entry(method):
    x = _rand((2, 3, 256), 10)  # leading dims collapse
    w = _rand((256, 128), 11)
    if method == "int8":
        q, s = quantize_int8(w)
    elif method == "int4":
        q, s = quantize_int4(w, group_size=128)
    else:
        q, s = quantize_fp8(w)
    out = quantized_matmul(x, q, s, method, group_size=128)
    assert out.shape == (2, 3, 128)
    ref = x @ w
    err = jnp.abs(out - ref).max() / jnp.abs(ref).max()
    # int4 with G=128 carries the largest quant error of the three
    assert err < (0.15 if method == "int4" else 0.06)


def test_bf16_activation_path():
    x = _rand((16, 256), 12).astype(jnp.bfloat16)
    w = _rand((256, 128), 13)
    q, s = quantize_int8(w)
    out = int8_matmul_xla(x, q, s)
    assert out.dtype == jnp.bfloat16
