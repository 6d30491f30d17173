"""Prefix caching, sleep mode, weight reload, profiler (CPU tier)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}


def make_engine(**over):
    kwargs = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=512, num_pages=128, page_size=16,
                  max_num_seqs=8, max_num_batched_tokens=64)
    kwargs.update(over)
    return EngineCore(EngineConfig.from_kwargs(**kwargs))


def run_all(engine, prompts, params):
    rids = [engine.add_request(p, sp) for p, sp in zip(prompts, params)]
    finals = {}
    while engine.has_unfinished():
        for out in engine.step():
            if out.finished:
                finals[out.request_id] = out
    return [finals[r] for r in rids]


def greedy(n=8):
    return SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)


def test_prefix_caching_reuses_pages_and_matches():
    eng = make_engine(enable_prefix_caching=True)
    prompt = list(range(1, 41))  # 40 tokens → 2 full pages cacheable
    a = run_all(eng, [prompt], [greedy()])[0]
    # second identical prompt: allocation must reuse cached pages
    rid = eng.add_request(prompt, greedy())
    sched = eng.scheduler.schedule()
    assert sched.prefills, "expected a prefill"
    assert sched.prefills[0].start == 32, \
        f"prefix cache not hit: chunk starts at {sched.prefills[0].start}"
    # finish the run and compare outputs
    finals = {}
    # complete the started prefill through the engine path: feed the
    # sched manually is internal; simplest — drain via fresh engine calls
    eng2 = make_engine(enable_prefix_caching=True)
    run_all(eng2, [prompt], [greedy()])
    b = run_all(eng2, [prompt], [greedy()])[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_prefix_cache_off_no_reuse():
    eng = make_engine(enable_prefix_caching=False)
    prompt = list(range(1, 41))
    run_all(eng, [prompt], [greedy()])
    eng.add_request(prompt, greedy())
    sched = eng.scheduler.schedule()
    assert sched.prefills[0].start == 0


def test_sleep_wake_preserves_outputs():
    eng = make_engine()
    prompt = list(range(5, 30))
    a = run_all(eng, [prompt], [greedy()])[0]
    eng.sleep(level=1)
    assert eng.runner.params is None
    eng.wake_up()
    b = run_all(eng, [prompt], [greedy()])[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_sleep_level2_reloads_from_source():
    eng = make_engine()
    prompt = list(range(5, 30))
    a = run_all(eng, [prompt], [greedy()])[0]
    eng.sleep(level=2)
    eng.wake_up()  # dummy model: re-init from the same seed
    b = run_all(eng, [prompt], [greedy()])[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_reload_weights_changes_outputs():
    from vllm_omni_tpu.models.decoder import init_params
    from vllm_omni_tpu.models.weights import hf_config_to_decoder_config

    eng = make_engine()
    prompt = list(range(5, 30))
    a = run_all(eng, [prompt], [greedy()])[0]
    cfg = hf_config_to_decoder_config(TINY_HF)
    new_params = init_params(cfg, jax.random.PRNGKey(99), jnp.float32)
    eng.reload_weights(new_params)
    b = run_all(eng, [prompt], [greedy()])[0]
    assert a.outputs[0].token_ids != b.outputs[0].token_ids


def test_profiler_start_stop(tmp_path):
    from vllm_omni_tpu.profiler import StageProfiler

    prof = StageProfiler(base_dir=str(tmp_path), stage_id=3)
    out = prof.start()
    assert prof.is_active
    _ = jnp.ones((8, 8)) @ jnp.ones((8, 8))
    stopped = prof.stop()
    assert stopped == out and not prof.is_active
    import os

    assert any("stage3" in d for d in os.listdir(tmp_path))


def test_int4_engine_e2e():
    """BASELINE config 5 path: INT4 weights end-to-end."""
    eng = make_engine(quantization="int4", quant_group_size=32,
                      hf_overrides=dict(TINY_HF, hidden_size=64,
                                        intermediate_size=128))
    out = run_all(eng, [list(range(1, 20))], [greedy()])[0]
    assert len(out.outputs[0].token_ids) == 8
    import jax.numpy as jnp

    layer0 = eng.runner.params["layers"][0]
    proj = layer0.get("qkv_proj") or layer0["q_proj"]  # fused by default
    assert proj["w_q"].dtype == jnp.uint8  # nibble-packed


def test_fp8_kv_cache_e2e():
    """FP8 KV cache (BASELINE config 2): outputs stay close to bf16 KV."""
    a = run_all(make_engine(), [list(range(1, 30))], [greedy(16)])[0]
    eng = make_engine(kv_cache_dtype="fp8")
    import jax.numpy as jnp

    assert eng.runner.kv_pages[0][0].dtype == jnp.float8_e4m3fn
    b = run_all(eng, [list(range(1, 30))], [greedy(16)])[0]
    # fp8 KV perturbs logits slightly; greedy tokens usually match on a
    # random tiny model — require a long common prefix
    common = 0
    for x, y in zip(a.outputs[0].token_ids, b.outputs[0].token_ids):
        if x != y:
            break
        common += 1
    assert common >= 4, (a.outputs[0].token_ids, b.outputs[0].token_ids)


def test_int8_kv_cache_e2e():
    eng = make_engine(kv_cache_dtype="int8")
    out = run_all(eng, [list(range(1, 30))], [greedy(8)])[0]
    assert len(out.outputs[0].token_ids) == 8


def test_min_p_and_logit_bias():
    eng = make_engine()
    prompt = list(range(1, 12))
    # forbid the greedy-chosen tokens via logit_bias → output must avoid
    # them
    base = run_all(eng, [prompt], [greedy()])[0].outputs[0].token_ids
    banned = {int(base[0]): -1e9, int(base[1]): -1e9}
    biased = run_all(eng, [prompt], [SamplingParams(
        max_tokens=8, temperature=0.0, ignore_eos=True,
        logit_bias=banned)])[0].outputs[0].token_ids
    assert all(t not in banned for t in biased)
    # min_p runs and stays valid under sampling
    out = run_all(eng, [prompt], [SamplingParams(
        max_tokens=8, temperature=0.9, min_p=0.2, seed=3,
        ignore_eos=True)])[0]
    assert len(out.outputs[0].token_ids) == 8


def test_async_chains_parity_and_engagement():
    """Pipelined decode chains (async_chains) must produce token-exact
    parity with sync chains, engage the in-flight path in steady state,
    and handle mid-chain finishes (staggered max_tokens)."""
    prompts = [list(range(1, 20 + 4 * i)) for i in range(3)]
    params = [SamplingParams(max_tokens=24 + 8 * i, temperature=0.0,
                             ignore_eos=True) for i in range(3)]
    sync = make_engine(multi_step=4, async_chains=False)
    a = run_all(sync, prompts, params)
    pipe = make_engine(multi_step=4, async_chains=True)
    b = run_all(pipe, prompts, params)
    for x, y in zip(a, b):
        assert x.outputs[0].token_ids == y.outputs[0].token_ids
    assert pipe.async_chain_launches > 0, "pipelining never engaged"
    assert pipe._inflight is None


def test_async_chains_sampled_parity():
    """Seeded stochastic sampling is identical under pipelining (the
    device carry, not host tokens, feeds the next chain)."""
    sp = [SamplingParams(max_tokens=20, temperature=0.8, top_p=0.9,
                         seed=7, ignore_eos=True)]
    a = run_all(make_engine(multi_step=4, async_chains=False),
                [list(range(1, 30))], sp)
    b = run_all(make_engine(multi_step=4, async_chains=True),
                [list(range(1, 30))], sp)
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids


def test_stage_output_cache_replays_identical_requests():
    """Inter-stage output cache (reference OmniTensorPrefixCache role):
    a deterministic stage's finished output replays for an identical
    request without re-running the engine."""
    from vllm_omni_tpu.config.stage_config import load_stage_configs
    from vllm_omni_tpu.engine.orchestrator import PipelineRunner

    tiny = {"architectures": ["Qwen3ForCausalLM"], "vocab_size": 128,
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 1, "num_attention_heads": 2,
            "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0}
    runner = PipelineRunner(load_stage_configs({"stage_args": [{
        "stage_id": 0, "stage_type": "llm", "cache_outputs": True,
        "engine_args": {"model": "dummy", "hf_overrides": tiny,
                        "dtype": "float32", "max_model_len": 64,
                        "num_pages": 16, "page_size": 16,
                        "max_num_seqs": 2,
                        "max_num_batched_tokens": 32},
        "final_output": True}]}))
    try:
        sp = SamplingParams(max_tokens=4, temperature=0.0,
                            ignore_eos=True)

        def run(rid):
            runner.submit([1, 2, 3], sp, rid)
            for _ in range(5000):
                outs = runner.step()
                if outs:
                    return outs[0]
            raise TimeoutError

        first = run("c1")
        assert first.error is None
        handle = runner.handles[0]
        assert len(handle._out_cache) == 1
        second = run("c2")
        assert second.request_id == "c2"
        assert second.outputs[0].token_ids == first.outputs[0].token_ids
        # different params -> miss (re-runs the engine)
        sp2 = SamplingParams(max_tokens=6, temperature=0.0,
                             ignore_eos=True)
        runner.submit([1, 2, 3], sp2, "c3")
        for _ in range(5000):
            outs = runner.step()
            if outs:
                break
        assert len(outs[0].outputs[0].token_ids) == 6
        assert len(handle._out_cache) == 2
    finally:
        runner.shutdown()


def test_kv_scale_calibration_on_first_prefill():
    """int8 KV engines calibrate per-head dequant scales from the first
    real prefill (VERDICT r2 item 5); outputs must track the bf16-KV
    engine closely even when the fixed 1/16 legacy scale would clip."""
    import numpy as np

    eng = make_engine(kv_cache_dtype="int8")
    assert eng.runner.kv_scales is None
    a = run_all(eng, [list(range(1, 30))], [greedy(12)])[0]
    k_sc, v_sc = eng.runner.kv_scales
    L = eng.decoder_cfg.num_layers
    hkv = eng.decoder_cfg.num_kv_heads
    assert k_sc.shape == (L, hkv) and v_sc.shape == (L, hkv)
    assert (k_sc > 0).all() and (v_sc > 0).all()
    # scales differ across heads (real amax, not a constant fallback)
    assert not np.allclose(k_sc, k_sc[0, 0])
    ref = run_all(make_engine(), [list(range(1, 30))], [greedy(12)])[0]
    common = 0
    for x, y in zip(ref.outputs[0].token_ids, a.outputs[0].token_ids):
        if x != y:
            break
        common += 1
    assert common >= 4, (ref.outputs[0].token_ids, a.outputs[0].token_ids)


def test_kv_transfer_reconciles_scales():
    """Quantized KV moved between engines with different calibrated
    scales must decode to the same tokens as a local prefill+decode."""
    import numpy as np

    prompt = list(range(1, 26))
    sender = make_engine(kv_cache_dtype="int8")
    # warm sender calibration with a DIFFERENT prompt so its scales
    # differ from the receiver's
    run_all(sender, [list(range(30, 60))], [greedy(2)])
    receiver = make_engine(kv_cache_dtype="int8")
    run_all(receiver, [list(range(60, 90))], [greedy(2)])
    assert not np.allclose(sender.runner.kv_scales[0],
                           receiver.runner.kv_scales[0])

    # local oracle: receiver runs the prompt itself
    local = run_all(make_engine(kv_cache_dtype="int8"), [prompt],
                    [greedy(8)])[0].outputs[0].token_ids

    sp = SamplingParams(max_tokens=1, temperature=0.0, ignore_eos=True,
                        pin_kv=True)
    rid = sender.add_request(prompt, sp)
    while sender.has_unfinished():
        sender.step()
    payload = sender.extract_request_kv(rid)
    assert payload["kv_scales"] is not None
    rid2 = receiver.inject_request_kv(
        payload, SamplingParams(max_tokens=8, temperature=0.0,
                                ignore_eos=True))
    outs = {}
    while receiver.has_unfinished():
        for o in receiver.step():
            if o.finished:
                outs[o.request_id] = o
    got = outs[rid2].outputs[0].token_ids
    # int8 rescale noise can flip late tokens on a tiny random model;
    # the prefix must survive
    common = 0
    for x, y in zip(local, got):
        if x != y:
            break
        common += 1
    assert common >= 4, (local, got)
