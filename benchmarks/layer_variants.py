"""Decode-layer matmul strategy shootout (real chip).

One jit program runs the full 32-layer matmul stack (qkv/o/gate_up/down
at M=32) REPS times with optimization barriers — seconds of device work
per measurement, so tunnel jitter is noise. Compares:

  sep_upcast   four separate matmuls, int8 weights upcast in XLA dot
  sep_pallas   four separate Pallas fused-dequant matmuls
  fused_upcast qkv fused [K,6144], gate+up fused [K,28672+...]
  fused_native fused + s8xs8->s32 native MXU dot (w8a8, per-token scale)
  sep_native   separate + native int8 dot
  fused_bf16   fused, bf16 weights (HBM 2x) — the dtype control

Also lm_head variants at the end.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

M = 32
H, NQKV, I = 4096, 6144, 14336
LAYERS = 32
REPS = 8
HBM_BW = 819e9


def quant_i8(key, k, n):
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    from vllm_omni_tpu.ops.quant import quantize_int8

    q, s = quantize_int8(w)
    return jax.device_put(q), jax.device_put(s)


def act_quant(x):
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    xs = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs[:, None]),
                  -127, 127).astype(jnp.int8)
    return xq, xs


def native_mm(x, wq, ws):
    xq, xs = act_quant(x)
    o = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (o.astype(jnp.float32) * xs[:, None] * ws[None, :]).astype(
        jnp.bfloat16)


def upcast_mm(x, wq, ws):
    o = jnp.dot(x, wq.astype(x.dtype), preferred_element_type=jnp.float32)
    return (o * ws).astype(x.dtype)


def pallas_mm(x, wq, ws):
    from vllm_omni_tpu.ops.quant import int8_matmul_pallas

    return int8_matmul_pallas(x, wq, ws)


def bf16_mm(x, w, ws):
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def build_weights(fused: bool, dtype: str):
    key = jax.random.PRNGKey(0)
    mk = quant_i8 if dtype == "int8" else (
        lambda kk, k, n: (jax.random.normal(kk, (k, n), jnp.bfloat16) * 0.02,
                          jnp.ones((n,), jnp.float32)))
    ks = jax.random.split(key, 8)
    if fused:
        return {
            "qkv": mk(ks[0], H, NQKV),
            "o": mk(ks[1], H, H),
            "gate_up": mk(ks[2], H, 2 * I),
            "down": mk(ks[3], I, H),
        }
    return {
        "q": mk(ks[0], H, H), "k": mk(ks[1], H, 1024),
        "v": mk(ks[2], H, 1024), "o": mk(ks[3], H, H),
        "gate": mk(ks[4], H, I), "up": mk(ks[5], H, I),
        "down": mk(ks[6], I, H),
    }


def layer_stack(weights, mm, fused: bool):
    def one_layer(x):
        if fused:
            qkv = mm(x, *weights["qkv"])
            q = qkv[:, :H]
            x2 = mm(q, *weights["o"])
            gu = mm(x2, *weights["gate_up"])
            act = (jax.nn.silu(gu[:, :I].astype(jnp.float32)) *
                   gu[:, I:].astype(jnp.float32)).astype(x.dtype)
            return mm(act, *weights["down"]) + x2
        q = mm(x, *weights["q"])
        _k = mm(x, *weights["k"])
        _v = mm(x, *weights["v"])
        x2 = mm(q, *weights["o"])
        g = mm(x2, *weights["gate"])
        u = mm(x2, *weights["up"])
        act = (jax.nn.silu(g.astype(jnp.float32)) *
               u.astype(jnp.float32)).astype(x.dtype)
        out = mm(act, *weights["down"]) + x2
        return jax.lax.optimization_barrier((out, _k, _v))[0]

    def body(x):
        for _ in range(LAYERS):
            x = jax.lax.optimization_barrier(one_layer(x))
        return x

    return body


def run(name, fused, dtype, mm):
    weights = build_weights(fused, dtype)
    body = layer_stack(weights, mm, fused)

    @jax.jit
    def prog(x):
        return jax.lax.fori_loop(
            0, REPS, lambda i, c: jax.lax.optimization_barrier(body(c)), x)

    x = jax.random.normal(jax.random.PRNGKey(1), (M, H), jnp.bfloat16)
    r = prog(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    jax.block_until_ready(prog(x))
    dt = (time.perf_counter() - t0) / REPS
    per_layer = dt / LAYERS
    wbytes = (H * NQKV + H * H + H * 2 * I + I * H) * (
        1 if dtype == "int8" else 2)
    sol = wbytes / HBM_BW
    print(f"{name:14s} {dt*1e3:8.2f} ms/stack  {per_layer*1e3:7.3f} "
          f"ms/layer  sol={sol*1e3:.3f}  eff={100*sol/per_layer:5.1f}%",
          flush=True)
    return per_layer


def lm_head_bench():
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (M, H), jnp.bfloat16)
    V = 128256
    wq, ws = quant_i8(key, H, V)
    wb = jax.random.normal(key, (H, V), jnp.bfloat16) * 0.02

    for name, f in [
        ("lm_bf16", lambda c: jnp.dot(c, wb,
                                      preferred_element_type=jnp.float32)),
        ("lm_int8_up", lambda c: upcast_mm(c, wq, ws).astype(jnp.float32)),
        ("lm_int8_nat", lambda c: native_mm(c, wq, ws).astype(jnp.float32)),
    ]:
        def body(c, f=f):
            logits = f(c)
            ids = jnp.argmax(logits, axis=-1)
            return jax.lax.optimization_barrier((c, ids))[0]

        @jax.jit
        def prog(x):
            return jax.lax.fori_loop(
                0, 64, lambda i, c: body(c), x)

        r = prog(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        jax.block_until_ready(prog(x))
        dt = (time.perf_counter() - t0) / 64
        by = H * V * (2 if name == "lm_bf16" else 1)
        print(f"{name:14s} {dt*1e3:7.3f} ms  sol={by/HBM_BW*1e3:.3f}  "
              f"eff={100*by/HBM_BW/dt:5.1f}%", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    run("sep_upcast", False, "int8", upcast_mm)
    run("sep_pallas", False, "int8", pallas_mm)
    run("sep_native", False, "int8", native_mm)
    run("fused_upcast", True, "int8", upcast_mm)
    run("fused_pallas", True, "int8", pallas_mm)
    run("fused_native", True, "int8", native_mm)
    run("fused_bf16", True, "bf16", bf16_mm)
    lm_head_bench()


if __name__ == "__main__":
    main()
