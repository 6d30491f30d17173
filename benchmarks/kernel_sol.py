"""Per-kernel speed-of-light study on one real TPU chip.

Measures the decode hot path piece by piece (in-jit fori loops — no
dispatch overhead) and compares each against the roofline bound:
  t_sol = max(bytes / HBM_BW, flops / PEAK)
Also probes MXU paths: bf16 dot, int8-weight upcast dot, Pallas fused
dequant, and NATIVE int8xint8 dot (v5e MXU does 394 TOPS int8 = 2x bf16
— if XLA lowers s8xs8->s32 natively, the MXU weight-pass bound halves).

Usage:  python benchmarks/kernel_sol.py [--out KERNEL_SOL.md]
Run on the real chip (axon default platform).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# v5e single chip
HBM_BW = 819e9  # bytes/s
PEAK_BF16 = 197e12
PEAK_INT8 = 394e12

# Llama-3-8B decode matmul shapes (fused qkv / o / fused gate-up / down)
SHAPES = [
    ("qkv", 4096, 6144),
    ("o_proj", 4096, 4096),
    ("gate_up", 4096, 28672),
    ("down", 14336, 4096),
    ("lm_head", 4096, 128256),
]


def timed_loop(build_body, iters: int = 128, warmup: int = 2,
               target_s: float = 0.3, reps: int = 3) -> float:
    """build_body() -> (init_carry, body_fn(carry)->carry). Returns
    seconds per iteration, measured inside one jit program.

    Difference method: time N and 2N iterations of the SAME compiled
    program (dynamic trip count) and divide the delta — the per-execute
    dispatch cost cancels in expectation. On this rig that cost is a
    ~30 ms axon-tunnel round trip per execute whose VARIANCE (±several
    ms) destroys the difference for sub-ms kernels, so (a) iters is
    auto-scaled until the N-run takes >= target_s of in-loop time, and
    (b) each leg is sampled `reps` times and the MIN taken (min-of-k
    strips the RTT tail; mins of both legs share the same floor).
    Bodies must carry a live data dependence on their op's output
    (chain it into the carry) or XLA hoists the op out of the loop.

    CRITICAL (axon tunnel): block_until_ready returns BEFORE remote
    completion — executes are asynchronous on this rig, so naive
    timings measure the enqueue, and piling up unfinished multi-second
    executes wedges the chip. The only true barrier is a device→host
    transfer of a value that data-depends on the loop output; every
    timing below syncs that way.

    build_body() -> (init, body) or (init, consts, body(c, consts)).
    Weights MUST ride in `consts` (runtime args), not body closures —
    a closed-over jnp array becomes an inline HLO constant, which (a)
    blows the remote-compile request past its HTTP body limit for
    GB-scale weights and (b) invites constant-specific compiler tricks
    that break the bandwidth accounting."""
    built = build_body()
    if len(built) == 2:
        init, body = built
        consts = ()
    else:
        init, consts, body = built

    @jax.jit
    def run(c, n, *cs):
        c = jax.lax.fori_loop(0, n, lambda i, c: body(c, *cs), c,
                              unroll=False)
        # fold every leaf into one scalar the host will fetch — the
        # transfer is the completion barrier
        acc = jnp.float32(0)
        for leaf in jax.tree.leaves(c):
            acc = acc + jnp.sum(leaf.ravel()[:1]).astype(jnp.float32)
        return acc

    def timed(n):
        t0 = time.perf_counter()
        float(jax.device_get(run(init, n, *consts)))
        return time.perf_counter() - t0

    timed(iters)  # compile + warm
    # calibrate: scale iters so kernel time dominates dispatch jitter
    t = timed(iters)
    while t < target_s and iters < (1 << 20):
        grow = min(max(int(target_s / max(t, 1e-4)) + 1, 2), 32)
        iters *= grow
        t = timed(iters)

    def leg(n):
        return min(timed(n) for _ in range(reps))

    for _ in range(3):
        delta = (leg(2 * iters) - leg(iters)) / iters
        if delta > 0:
            return delta
    raise RuntimeError("non-positive timing delta (device unhealthy or "
                       "loop optimized away)")


def bench_hbm_read(gb: float = 0.5) -> float:
    """HBM stream bandwidth (STREAM scale: x' = x * a). The scale factor
    depends on the previous iteration's output, so every iteration
    re-reads and re-writes the full array — 2·n·2 bytes of traffic.

    NOTE: init via jnp.full, NOT jax.random.normal — threefry bit
    generation for 2^30+ elements transiently allocates 4x the output
    bytes and OOM-faults the 16 GB chip (which then stays wedged for
    minutes). Keep the buffer <= 0.5 GB: multi-GB carries through the
    axon tunnel fault the device outright (measured: 0.25 GB fine,
    2 GB wedges the chip)."""
    n = int(gb * (1 << 30) / 2)
    a = jnp.full((n,), 1.0, jnp.bfloat16)

    def build():
        def body(c):
            s, x = c
            x2 = x * (1.0 + s * 1e-30).astype(jnp.bfloat16)
            return (x2[0].astype(jnp.float32), x2)

        return (jnp.float32(0), a), body

    t = timed_loop(build, iters=4)
    return (n * 2 * 2) / t  # read + write per iteration


def _chain(xx, o, k):
    """Feed the op output back into the next iteration's input — a live
    data dependence XLA cannot hoist or CSE away. EVERY output column
    must fold into the carry: folding only o[:, :k] lets DCE slice the
    weight to its first k columns (measured: bf16 lm_head 'ran' at
    22 TB/s because only 4096 of 128256 columns were ever read). The
    tiny perturbation keeps xx numerically sane across iterations."""
    m, n = o.shape
    reps = -(-n // k)
    of = jnp.pad(o.astype(jnp.float32), ((0, 0), (0, reps * k - n)))
    fold = of.reshape(m, reps, k).sum(axis=1)
    return (xx.astype(jnp.float32) + fold * 1e-6).astype(xx.dtype)


def _mk_matmul(m, k, n, kind, seed=0):
    key = jax.random.PRNGKey(seed)
    x = jax.random.normal(key, (m, k), jnp.bfloat16)
    w = jax.random.normal(key, (k, n), jnp.float32) * 0.02
    if kind == "bf16":
        wa = jax.device_put(w.astype(jnp.bfloat16))

        def body(xx, wa):
            o = jnp.dot(xx, wa, preferred_element_type=jnp.float32)
            return _chain(xx, o, k)

        return x, (wa,), body
    from vllm_omni_tpu.ops.quant import (int8_matmul_pallas, int8_matmul_xla,
                                         quantize_int8)

    wq, scale = quantize_int8(w)
    wq, scale = jax.device_put((wq, scale))
    if kind == "int8_xla":
        def body(xx, wq, scale):
            return _chain(xx, int8_matmul_xla(xx, wq, scale), k)

        return x, (wq, scale), body
    if kind == "int8_pallas":
        def body(xx, wq, scale):
            return _chain(xx, int8_matmul_pallas(xx, wq, scale), k)

        return x, (wq, scale), body
    if kind == "int8_native":
        # w8a8: dynamic per-token act quant + s8xs8 -> s32 MXU dot
        def body(xx, wq, scale):
            amax = jnp.max(jnp.abs(xx.astype(jnp.float32)), axis=-1)
            xs = jnp.maximum(amax / 127.0, 1e-8)
            xq = jnp.clip(jnp.round(xx.astype(jnp.float32) / xs[:, None]),
                          -127, 127).astype(jnp.int8)
            o32 = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            o = (o32.astype(jnp.float32) * xs[:, None] *
                 scale[None, :]).astype(jnp.bfloat16)
            return _chain(xx, o, k)

        return x, (wq, scale), body
    raise ValueError(kind)


def bench_matmuls(ms=(8, 32, 128), kinds=("bf16", "int8_xla",
                                          "int8_pallas", "int8_native"),
                  cells=None):
    """cells: optional explicit list of (shape_name, m, kind) to run —
    every compile costs ~30-60 s over the axon tunnel, so the default
    full product (60 cells) is only for offline runs."""
    rows = []
    for name, k, n in SHAPES:
        for m in ms:
            for kind in kinds:
                if cells is not None and (name, m, kind) not in cells:
                    continue
                try:
                    t = timed_loop(functools.partial(
                        lambda m, k, n, kind: _mk_matmul(m, k, n, kind),
                        m, k, n, kind), iters=32)
                except Exception as e:  # noqa: BLE001
                    rows.append((name, m, kind, None, str(e)[:160]))
                    print(f"{name:9s} M={m:<4d} {kind:12s} FAILED: "
                          f"{str(e)[:160]}", flush=True)
                    continue
                wbytes = k * n * (2 if kind == "bf16" else 1)
                flops = 2 * m * k * n
                peak = PEAK_INT8 if kind == "int8_native" else PEAK_BF16
                t_sol = max(wbytes / HBM_BW, flops / peak)
                rows.append((name, m, kind, t, t_sol))
                print(f"{name:9s} M={m:<4d} {kind:12s} "
                      f"{t*1e3:7.3f} ms  sol={t_sol*1e3:6.3f} ms  "
                      f"eff={100*t_sol/t:5.1f}%  "
                      f"{wbytes/t/1e9:6.1f} GB/s", flush=True)
    return rows


def bench_paged_attention(b=32, ctx=248, layers=1):
    """Pallas decode attention at serving shape (8 kv heads, d=128)."""
    from vllm_omni_tpu.ops.attention import (paged_attention_decode_pallas,
                                             quantize_kv, write_kv_pages)

    hq, hkv, d, ps = 32, 8, 128, 16
    pages_per = (ctx + ps - 1) // ps
    npages = b * pages_per + 1
    key = jax.random.PRNGKey(0)
    kp = jax.random.normal(key, (npages, hkv, ps, d), jnp.bfloat16)
    vp = jax.random.normal(key, (npages, hkv, ps, d), jnp.bfloat16)
    bt = np.zeros((b, 32), np.int32)
    for i in range(b):
        bt[i, :pages_per] = np.arange(i * pages_per, (i + 1) * pages_per) + 1
    bt = jnp.asarray(bt)
    kv_lens = jnp.full((b,), ctx, jnp.int32)
    q = jax.random.normal(key, (b, hq, d), jnp.bfloat16)

    def build():
        def body(qq, kp, vp, bt, kv_lens):
            # output has q's shape: chain it directly (convex combos of
            # N(0,1) v stay bounded across iterations)
            return paged_attention_decode_pallas(qq, kp, vp, bt, kv_lens,
                                                 scale=d ** -0.5)

        return q, (kp, vp, bt, kv_lens), body

    t = timed_loop(build, iters=256)
    kv_bytes = b * ctx * 2 * hkv * d * 2
    t_sol = kv_bytes / HBM_BW
    print(f"paged_attn_decode b={b} ctx={ctx}: {t*1e3:.3f} ms "
          f"sol={t_sol*1e3:.3f} ms eff={100*t_sol/t:.1f}%", flush=True)
    return t, t_sol


def bench_sampler(b=32, v=128256):
    from vllm_omni_tpu.ops import sampler as S

    key = jax.random.PRNGKey(0)
    logits = jax.random.normal(key, (b, v), jnp.float32)

    def build_greedy():
        def body(lg):
            ids = jnp.argmax(lg, axis=-1)
            lp = jnp.take_along_axis(jax.nn.log_softmax(lg, axis=-1),
                                     ids[:, None], axis=-1)
            return lg + lp * 1e-6 + ids[:, None].astype(jnp.float32) * 1e-30

        return logits, body

    t = timed_loop(build_greedy, iters=64)
    print(f"sampler greedy+lp b={b} V={v}: {t*1e3:.3f} ms", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--full", action="store_true",
                    help="full 60-cell matmul product (slow: one compile "
                         "per cell, ~30-60s each over the tunnel)")
    ap.add_argument("--only", choices=["hbm", "matmul", "attn", "sampler"],
                    default=None)
    args = ap.parse_args()
    print("devices:", jax.devices(), flush=True)
    # a previous process's fault can leave the chip wedged for minutes —
    # wait for a trivial op to succeed before burning compile time
    for attempt in range(20):
        try:
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
            break
        except Exception as e:  # noqa: BLE001
            print(f"device not ready (attempt {attempt}): "
                  f"{str(e)[:80]}", flush=True)
            time.sleep(30)
    else:
        raise SystemExit("TPU never became healthy")
    if args.only in (None, "hbm"):
        bw = bench_hbm_read(0.25 if args.quick else 0.5)
        print(f"HBM stream bandwidth: {bw/1e9:.1f} GB/s", flush=True)
    if args.only in (None, "matmul"):
        if args.full:
            bench_matmuls()
        else:
            # serving-relevant diagonal: all kinds at the serving batch
            # (M=32) for every decode shape, plus an M sweep on gate_up
            # (the biggest weight) for bf16 vs native-int8.
            cells = {(nm, 32, kd) for nm, _, _ in SHAPES
                     for kd in ("bf16", "int8_xla", "int8_pallas",
                                "int8_native")}
            cells |= {("gate_up", m, kd) for m in (8, 128)
                      for kd in ("bf16", "int8_native")}
            bench_matmuls(cells=cells)
    if args.only in (None, "attn"):
        bench_paged_attention()
    if args.only in (None, "sampler"):
        bench_sampler()


if __name__ == "__main__":
    main()
