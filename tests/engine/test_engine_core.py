"""End-to-end engine tests on a tiny random model (CPU tier).

Mirrors the reference's tiny-model strategy (SURVEY.md §4): random
weights, token-id prompts, numeric determinism checks.
"""

import numpy as np
import pytest

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "rope_theta": 10000.0,
    "rms_norm_eps": 1e-6, "tie_word_embeddings": False,
    "eos_token_id": 0,
}


def make_engine(**over):
    kwargs = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=512, num_pages=128, page_size=16,
                  max_num_seqs=8, max_num_batched_tokens=64,
                  decode_bs_buckets=(1, 2, 4, 8),
                  prefill_token_buckets=(16, 32, 64))
    kwargs.update(over)
    return EngineCore(EngineConfig.from_kwargs(**kwargs))


@pytest.fixture(scope="module")
def engine():
    return make_engine()


def greedy(n=16):
    return SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)


def run_all(engine, prompts, params):
    rids = [engine.add_request(p, sp) for p, sp in zip(prompts, params)]
    finals = {}
    while engine.has_unfinished():
        for out in engine.step():
            if out.finished:
                finals[out.request_id] = out
    return [finals[r] for r in rids]


def test_greedy_deterministic(engine):
    prompt = list(range(1, 20))
    a = run_all(engine, [prompt], [greedy()])[0]
    b = run_all(engine, [prompt], [greedy()])[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids
    assert len(a.outputs[0].token_ids) == 16


def test_batched_matches_single(engine):
    """Continuous batching must not change greedy results — the core
    correctness invariant of paged attention + scheduler."""
    prompts = [list(range(1, 10)), list(range(30, 55)),
               list(range(7, 90, 2))]
    singles = [run_all(engine, [p], [greedy()])[0] for p in prompts]
    batched = run_all(engine, prompts, [greedy()] * 3)
    for s, b in zip(singles, batched):
        assert s.outputs[0].token_ids == b.outputs[0].token_ids


def test_chunked_prefill_matches(engine):
    """A prompt longer than the per-step token budget must produce the
    same greedy output as one that fits in one chunk."""
    long_prompt = list(range(3, 120))  # 117 tokens > 64 budget
    out = run_all(engine, [long_prompt], [greedy(8)])[0]
    big = make_engine(max_num_batched_tokens=256,
                      prefill_token_buckets=(64, 128, 256))
    ref = run_all(big, [long_prompt], [greedy(8)])[0]
    assert out.outputs[0].token_ids == ref.outputs[0].token_ids


def test_eos_stops(engine):
    # ignore_eos=False: eos token id 0 should stop generation when sampled.
    p = SamplingParams(max_tokens=64, temperature=0.0)
    out = run_all(engine, [list(range(1, 12))], [p])[0]
    toks = out.outputs[0].token_ids
    if 0 in toks:
        assert toks[-1] == 0 and toks.count(0) == 1
        assert out.outputs[0].finish_reason == "stop"
    else:
        assert out.outputs[0].finish_reason == "length"


def test_seeded_sampling_reproducible(engine):
    p = SamplingParams(max_tokens=12, temperature=0.8, top_p=0.9, seed=42,
                       ignore_eos=True)
    a = run_all(engine, [list(range(5, 25))], [p])[0]
    b = run_all(engine, [list(range(5, 25))], [p])[0]
    assert a.outputs[0].token_ids == b.outputs[0].token_ids


def test_hidden_states_handoff(engine):
    p = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                       return_hidden_states=True)
    out = run_all(engine, [list(range(1, 9))], [p])[0]
    hs = out.outputs[0].hidden_states
    assert hs is not None
    # prefill chunk hidden (8) + one per decode step (3 decodes after the
    # prefill-sampled first token)
    assert hs.shape[-1] == 64
    assert hs.shape[0] >= 8


def test_generation_mode_one_shot():
    eng = make_engine(mode="generation")
    p = SamplingParams(max_tokens=1, return_hidden_states=True)
    out = run_all(eng, [list(range(1, 40))], [p])[0]
    assert out.finished
    hs = out.outputs[0].hidden_states
    assert hs is not None and hs.shape[0] == 39


def test_preemption_recovers():
    eng = make_engine(num_pages=24, max_model_len=256)  # tiny KV pool
    prompts = [list(range(1, 30)), list(range(2, 31)), list(range(3, 32))]
    outs = run_all(eng, prompts, [greedy(24)] * 3)
    for o in outs:
        assert len(o.outputs[0].token_ids) == 24
    # parity with an uncontended engine
    big = make_engine()
    ref = run_all(big, [prompts[0]], [greedy(24)])[0]
    assert outs[0].outputs[0].token_ids == ref.outputs[0].token_ids


def test_penalties_change_output(engine):
    base = SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True)
    pen = SamplingParams(max_tokens=16, temperature=0.0, ignore_eos=True,
                         repetition_penalty=2.0, frequency_penalty=1.0)
    a = run_all(engine, [list(range(1, 10))], [base])[0]
    b = run_all(engine, [list(range(1, 10))], [pen])[0]
    # with a random tiny model greedy output nearly always repeats; the
    # penalty path must at least run and produce valid tokens
    assert len(b.outputs[0].token_ids) == 16
    assert all(0 <= t < 256 for t in b.outputs[0].token_ids)
    assert a.outputs[0].token_ids != b.outputs[0].token_ids
