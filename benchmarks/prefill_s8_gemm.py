"""Prefill-shape (M=512) W8A8 GEMM: XLA s8xs8 dot vs the hand-tiled
Pallas s8 kernel (ops/quant.py int8_matmul_pallas_s8). Run on the real
chip. Reuses the kernel_sol difference-timing harness."""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.kernel_sol import (PEAK_INT8, _chain, timed_loop)
from vllm_omni_tpu.ops.quant import (int8_matmul_pallas_s8,
                                     quantize_int8, quantize_int8_act)

SHAPES = [("qkv", 4096, 6144), ("gate_up", 4096, 28672),
          ("down", 14336, 4096), ("o_proj", 4096, 4096)]


def _mk(m, k, n, kind):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    wq, scale = jax.device_put(quantize_int8(w))

    if kind == "xla_native":
        def body(xx, wq, scale):
            xq, xs = quantize_int8_act(xx)
            o32 = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o = (o32.astype(jnp.float32) * xs[:, None] *
                 scale[None, :]).astype(jnp.bfloat16)
            return _chain(xx, o, k)
    elif kind == "pallas_s8":
        def body(xx, wq, scale):
            xq, xs = quantize_int8_act(xx)
            o = int8_matmul_pallas_s8(xq, xs, wq, scale)
            return _chain(xx, o, k)
    else:
        raise ValueError(kind)
    return x, (wq, scale), body


def main(m=512):
    for name, k, n in SHAPES:
        for kind in ("xla_native", "pallas_s8"):
            t = timed_loop(functools.partial(_mk, m, k, n, kind),
                           iters=32)
            t_sol = 2 * m * k * n / PEAK_INT8
            print(f"{name:9s} M={m:<4d} {kind:11s} {t*1e3:7.3f} ms  "
                  f"sol={t_sol*1e3:6.3f}  eff={100*t_sol/t:5.1f}%",
                  flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
