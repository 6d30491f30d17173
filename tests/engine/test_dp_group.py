"""DP replica group tests (CPU tier; replicas pinned to distinct virtual
devices)."""

import jax

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.dp_group import DPEngineGroup

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}


def make_group(replicas=2, devices=None):
    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=TINY_HF, dtype="float32",
        max_model_len=128, num_pages=32, page_size=16, max_num_seqs=4,
        max_num_batched_tokens=64)
    return DPEngineGroup(config, replicas, devices=devices)


def drain(group, rids):
    finals = {}
    while group.has_unfinished():
        for o in group.step():
            if o.finished:
                finals[o.request_id] = o
    return [finals[r] for r in rids]


def test_load_balanced_dispatch_and_parity():
    group = make_group(2)
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    rids = [group.add_request(list(range(1, 10)), sp) for _ in range(4)]
    # round-robin-by-load: 2 requests per replica
    assert group.queue_lengths == [2, 2]
    outs = drain(group, rids)
    # identical prompts & weights (same seed) → identical greedy outputs
    # across replicas
    toks = [o.outputs[0].token_ids for o in outs]
    assert all(t == toks[0] for t in toks)


def test_replicas_on_distinct_devices():
    devs = jax.devices()
    group = make_group(2, devices=[[devs[0]], [devs[1]]])
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    rids = [group.add_request(list(range(1, 8)), sp) for _ in range(2)]
    outs = drain(group, rids)
    assert all(o.finished for o in outs)
    # each replica's params live on its own device
    d0 = list(group.engines[0].runner.params["embed"].devices())
    d1 = list(group.engines[1].runner.params["embed"].devices())
    assert d0 != d1


def test_abort_routed():
    group = make_group(2)
    sp = SamplingParams(max_tokens=50, temperature=0.0, ignore_eos=True)
    rid = group.add_request(list(range(1, 10)), sp)
    assert group.abort_request(rid)
    assert not group.has_unfinished()
