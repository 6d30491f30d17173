"""Round benchmark: continuous-batching decode throughput on one chip.

Workload: Llama-3-8B-shaped dense AR decoder (BASELINE.json config 2
class), INT8 weight-only, bf16 KV, continuous-batching decode at batch
32 and 64 (serving steady state). Random weights (numerics identical to
real weights for throughput). Decode is weight-bandwidth-bound
(per-kernel table in docs/design/performance.md), so tokens/chip scales
with batch while the weight pass is shared.

Wedge-proof design (the round-2 bench died rc=124 because the
tunnel-attached chip never initialised and jax init HANGS rather than
raising on this rig):
  * the PARENT process never imports jax, so it cannot hang;
  * chip probes and the engine run in SUBPROCESSES with hard timeouts,
    killed by process group on expiry (never by pattern);
  * the engine child prints a result line per batch tier AS SOON as it
    is measured, so a later wedge cannot lose an earlier number;
  * a global deadline (BENCH_DEADLINE, default 1320 s) bounds the whole
    script — on failure it exits non-zero FAST with a diagnostic on
    stderr instead of hanging into the driver's timeout.

Prints ONE json line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
vs_baseline anchors on the reference's closest per-chip number: 39.9
tok/s decode for the FP8 Qwen3-Omni-30B-A3B thinker on 1xH200
(BASELINE.md). Both are single-stream-per-chip weight-bandwidth-bound
decode; ours is per-chip on v5e.
"""

import json
import os
import subprocess
import sys
import time

DEADLINE = float(os.environ.get("BENCH_DEADLINE", "1320"))
T_START = time.time()

DECODE_STEPS = 128
PROMPT_LEN = 120
MEM_FRACTION = float(os.environ.get("BENCH_MEM_FRACTION", "0.72"))
BASELINE_TPS = 39.9  # ref FP8 30B-A3B decode tok/s on 1xH200 (BASELINE.md)

# Llama-3-8B geometry
LLAMA8B_HF = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128256, "hidden_size": 4096,
    "intermediate_size": 14336, "num_hidden_layers": 32,
    "num_attention_heads": 32, "num_key_value_heads": 8, "head_dim": 128,
    "rope_theta": 500000.0, "rms_norm_eps": 1e-5,
    "tie_word_embeddings": False, "eos_token_id": 128001,
}

# BENCH_TINY=1: shrink geometry so the full parent/child plumbing can be
# smoke-tested on the CPU tier in seconds (numbers meaningless)
if os.environ.get("BENCH_TINY"):
    LLAMA8B_HF.update(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16)


def _remaining() -> float:
    return DEADLINE - (time.time() - T_START)


def _log(msg: str) -> None:
    sys.stderr.write(f"[bench +{time.time() - T_START:6.1f}s] {msg}\n")
    sys.stderr.flush()


# ----------------------------------------------------------------- child modes

def child_probe() -> None:
    """Trivial device op; parent gives us a hard timeout."""
    import jax
    import jax.numpy as jnp
    ok = jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert float(ok[0, 0]) == 8.0
    print("PROBE_OK", flush=True)


def child_engine(tiers: list[int]) -> None:
    """Init one engine and measure each batch tier, printing a
    ``TIER {json}`` line immediately after each measurement."""
    import jax
    import jax.numpy as jnp

    # cheap sanity op first (fails fast if the chip wedged post-probe)
    jax.device_get(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    max_bs = max(tiers)
    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=LLAMA8B_HF, dtype="bfloat16",
        quantization="int8", kv_cache_dtype="bfloat16",
        max_model_len=512, page_size=16, memory_fraction=MEM_FRACTION,
        max_num_seqs=max_bs, max_num_batched_tokens=1024,
        multi_step=16, decode_bs_buckets=tuple(sorted(set(tiers))),
        prefill_token_buckets=(128, 1024))
    t0 = time.time()
    engine = EngineCore(config)
    print(f"ENGINE_INIT {time.time() - t0:.1f}s "
          f"{engine.runner.num_pages} pages", flush=True)

    def run_round(batch: int) -> float:
        sp = SamplingParams(max_tokens=DECODE_STEPS, temperature=0.0,
                            ignore_eos=True)
        for i in range(batch):
            engine.add_request(
                [(7 * i + j) % 32000 + 1 for j in range(PROMPT_LEN)], sp)
        # prefill (not timed in decode throughput)
        while engine.scheduler.waiting:
            engine.step()
        t0 = time.time()
        finished = 0
        while engine.has_unfinished():
            for out in engine.step():
                if out.finished:
                    finished += len(out.outputs[0].token_ids)
        dt = time.time() - t0
        assert finished == batch * DECODE_STEPS, finished
        # first token of each request was sampled during prefill
        return (finished - batch) / dt

    for batch in sorted(tiers):
        t0 = time.time()
        run_round(batch)  # warmup: compiles prefill+decode for this tier
        print(f"WARMUP bs={batch} {time.time() - t0:.1f}s", flush=True)
        tps = run_round(batch)
        print("TIER " + json.dumps({"bs": batch, "tps": round(tps, 2)}),
              flush=True)


# ------------------------------------------------------------------- parent

def _run_child(args: list[str], timeout: float):
    """Run a child in its own process group; on timeout kill exactly
    that group (never by pattern). Streams child stdout lines back via
    the returned (rc, lines) — lines harvested even on timeout."""
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)] + args,
        stdout=subprocess.PIPE, stderr=sys.stderr,
        text=True, bufsize=1, start_new_session=True)
    lines: list[str] = []
    deadline = time.time() + timeout
    import selectors
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    timed_out = False
    while True:
        if proc.poll() is not None:
            for rest in proc.stdout:
                lines.append(rest.rstrip("\n"))
                _log(f"child: {rest.rstrip()}")
            break
        if time.time() > deadline:
            timed_out = True
            _log(f"child timeout after {timeout:.0f}s — killing pgid")
            try:
                os.killpg(proc.pid, 9)
            except ProcessLookupError:
                pass
            proc.wait()
            break
        if sel.select(timeout=1.0):
            line = proc.stdout.readline()
            if line:
                lines.append(line.rstrip("\n"))
                _log(f"child: {line.rstrip()}")
    return (124 if timed_out else proc.returncode), lines


def parent() -> int:
    bench_bs = os.environ.get("BENCH_BS")
    tiers = [int(bench_bs)] if bench_bs else [32, 64]

    # Phase 1: chip probe (each attempt hard-capped — jax init HANGS on
    # a dead relay rather than raising)
    probe_ok = False
    for attempt in range(8):
        if _remaining() < 120:
            break
        _log(f"probe attempt {attempt}")
        rc, lines = _run_child(["--probe"], timeout=min(90.0, _remaining()))
        if rc == 0 and any("PROBE_OK" in ln for ln in lines):
            probe_ok = True
            break
        time.sleep(min(15.0, max(0.0, _remaining() - 60)))
    if not probe_ok:
        _log("DIAGNOSTIC " + json.dumps({
            "error": "tpu_unavailable",
            "detail": "chip probe never succeeded (relay down or chip "
                      "wedged); no measurement possible",
            "elapsed_s": round(time.time() - T_START, 1)}))
        return 3

    # Phase 2: engine run; tier results harvested as they stream
    results: dict[int, float] = {}
    rc, lines = _run_child(
        ["--engine"] + [str(t) for t in tiers],
        timeout=max(60.0, _remaining() - 30))
    for ln in lines:
        if ln.startswith("TIER "):
            d = json.loads(ln[5:])
            results[d["bs"]] = d["tps"]

    if not results:
        _log("DIAGNOSTIC " + json.dumps({
            "error": "engine_run_failed", "child_rc": rc,
            "elapsed_s": round(time.time() - T_START, 1)}))
        return 4

    best_bs = max(results, key=lambda b: results[b])
    tps = results[best_bs]
    print(json.dumps({
        "metric": f"decode_tok_s_per_chip_llama8b_int8_bs{best_bs}",
        "value": tps,
        "unit": "tok/s",
        "vs_baseline": round(tps / BASELINE_TPS, 3),
        "tiers": {str(b): v for b, v in sorted(results.items())},
    }), flush=True)
    return 0


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--probe":
        child_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "--engine":
        child_engine([int(t) for t in sys.argv[2:]])
    else:
        sys.exit(parent())


if __name__ == "__main__":
    main()
