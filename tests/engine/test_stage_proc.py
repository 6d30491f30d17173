"""Process-isolated stage engine tests: subprocess + ZMQ control/data
plane (reference: StageEngineCoreProc subprocess busy loop)."""

import numpy as np
import pytest

from vllm_omni_tpu.config.stage_config import load_stage_configs
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.orchestrator import PipelineRunner
from vllm_omni_tpu.engine.stage_proc import StageProcClient

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}
ARGS = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
            max_model_len=128, num_pages=32, page_size=16,
            max_num_seqs=4, max_num_batched_tokens=64)


@pytest.fixture(scope="module")
def client():
    c = StageProcClient(ARGS, platform="cpu")
    yield c
    c.shutdown()


def drain(client, rids):
    import time

    finals = {}
    deadline = time.time() + 120
    while len(finals) < len(rids):
        for o in client.step():
            if o.finished:
                finals[o.request_id] = o
        if time.time() > deadline:
            raise TimeoutError("stage proc outputs timed out")
        time.sleep(0.005)
    return [finals[r] for r in rids]


def test_proc_engine_matches_inproc(client):
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.engine.core import EngineCore

    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    rid = client.add_request(list(range(1, 12)), sp)
    proc_out = drain(client, [rid])[0]

    eng = EngineCore(EngineConfig.from_kwargs(**ARGS))
    rid2 = eng.add_request(list(range(1, 12)), sp)
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                inproc_out = o
    assert proc_out.outputs[0].token_ids == inproc_out.outputs[0].token_ids
    assert not client.has_unfinished()


def test_proc_hidden_states_cross_boundary(client):
    sp = SamplingParams(max_tokens=3, temperature=0.0, ignore_eos=True,
                        return_hidden_states=True)
    rid = client.add_request(list(range(1, 9)), sp)
    out = drain(client, [rid])[0]
    hs = out.outputs[0].hidden_states
    assert hs is not None and np.asarray(hs).shape[-1] == 32


def test_pipeline_with_isolated_stage():
    """2-stage pipeline where the talker runs in its own process; hidden
    states cross the process boundary through the payload codec."""
    cfg = {
        "stage_args": [
            {"stage_id": 0, "stage_type": "llm", "engine_args": ARGS,
             "default_sampling_params": {"max_tokens": 4,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
            {"stage_id": 1, "stage_type": "llm",
             "engine_args": dict(ARGS, seed=1, process_isolation=True),
             "engine_input_source": [0], "final_output": True,
             "default_sampling_params": {"max_tokens": 3,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
        ]
    }
    runner = PipelineRunner(load_stage_configs(cfg))
    try:
        sp = SamplingParams(max_tokens=4, temperature=0.0,
                            ignore_eos=True)
        outs = runner.generate([list(range(1, 10))], [sp])
        assert outs[0].finished and outs[0].error is None
        assert len(outs[0].outputs[0].token_ids) == 3
    finally:
        runner.shutdown()


def test_ar_stage_proc_elastic_restart():
    """Kill the AR stage proc mid-decode: in-flight request errors,
    the proc respawns, and the next request succeeds (beyond the
    reference — SURVEY §5.3: a dead stage kills its engine)."""
    import time

    c = StageProcClient(ARGS, platform="cpu")
    try:
        sp = SamplingParams(max_tokens=64, temperature=0.0,
                            ignore_eos=True)
        c.add_request([1, 2, 3], sp, request_id="victim")
        c.proc.kill()
        c.proc.join(timeout=10)
        outs = []
        t0 = time.time()
        while c.has_unfinished() and time.time() - t0 < 30:
            outs.extend(c.step())
            time.sleep(0.01)
        assert any(o.error and "died" in o.error for o in outs)
        assert not getattr(c, "_dead", False)
        c.add_request([4, 5, 6], SamplingParams(
            max_tokens=4, temperature=0.0, ignore_eos=True),
            request_id="survivor")
        final = drain(c, ["survivor"])[0]
        assert final.error is None
        assert len(final.outputs[0].token_ids) == 4
    finally:
        c.shutdown()


def test_logprobs_cross_proc_wire(client):
    """Chosen-token logprobs survive the msgpack wire (int map keys are
    rejected by strict_map_key — pairs on the wire, dicts in memory)."""
    sp = SamplingParams(max_tokens=3, temperature=0.0, ignore_eos=True,
                        logprobs=0)
    client.add_request([1, 2, 3], sp, request_id="lp1")
    final = drain(client, ["lp1"])[0]
    comp = final.outputs[0]
    assert comp.logprobs is not None and len(comp.logprobs) == 3
    for d, tok in zip(comp.logprobs, comp.token_ids):
        (t, lp), = d.items()
        assert t == tok and lp <= 0.0


def test_default_isolation_policy(monkeypatch):
    """Multi-stage pipelines default to process-per-stage (reference
    default topology); single-stage, shared-chip and env-overridden
    pipelines stay inline."""
    cfg2 = {"stage_args": [
        {"stage_id": 0, "stage_type": "llm", "engine_args": ARGS},
        {"stage_id": 1, "stage_type": "llm", "engine_args": ARGS,
         "engine_input_source": [0], "final_output": True},
    ]}
    cfg1 = {"stage_args": [
        {"stage_id": 0, "stage_type": "llm", "engine_args": ARGS,
         "final_output": True}]}
    monkeypatch.delenv("OMNI_TPU_INLINE_STAGES", raising=False)
    assert PipelineRunner._default_isolation(load_stage_configs(cfg2))
    assert not PipelineRunner._default_isolation(load_stage_configs(cfg1))
    monkeypatch.setenv("OMNI_TPU_INLINE_STAGES", "1")
    assert not PipelineRunner._default_isolation(load_stage_configs(cfg2))


def test_multi_stage_defaults_to_separate_procs(monkeypatch):
    """End-to-end: with no explicit process_isolation, a 2-stage CPU
    pipeline builds StageProcClient handles and still generates."""
    monkeypatch.delenv("OMNI_TPU_INLINE_STAGES", raising=False)
    cfg = {"stage_args": [
        {"stage_id": 0, "stage_type": "llm", "engine_args": ARGS,
         "default_sampling_params": {"max_tokens": 4, "temperature": 0.0,
                                     "ignore_eos": True}},
        {"stage_id": 1, "stage_type": "llm",
         "engine_args": dict(ARGS, seed=1),
         "engine_input_source": [0], "final_output": True,
         "default_sampling_params": {"max_tokens": 3, "temperature": 0.0,
                                     "ignore_eos": True}},
    ]}
    runner = PipelineRunner(load_stage_configs(cfg))
    try:
        assert all(isinstance(h.engine, StageProcClient)
                   for h in runner.handles.values())
        sp = SamplingParams(max_tokens=4, temperature=0.0,
                            ignore_eos=True)
        outs = runner.generate([list(range(1, 10))], [sp])
        assert outs[0].finished and outs[0].error is None
        assert len(outs[0].outputs[0].token_ids) == 3
    finally:
        runner.shutdown()
