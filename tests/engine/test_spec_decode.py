"""N-gram speculative decoding: exact greedy parity + fewer device
steps on repetitive sequences."""

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.worker.model_runner import ModelRunner

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 64, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}


def make_engine(**over):
    kwargs = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=512, num_pages=128, page_size=16,
                  max_num_seqs=8, max_num_batched_tokens=64)
    kwargs.update(over)
    return EngineCore(EngineConfig.from_kwargs(**kwargs))


def run(eng, prompt, n=96):
    sp = SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)
    eng.add_request(list(prompt), sp)
    steps = 0
    final = None
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                final = o
        steps += 1
    return final.outputs[0].token_ids, eng.runner.forward_passes


def test_ngram_propose():
    # trailing (5, 6) matched earlier → propose what followed
    assert ModelRunner.ngram_propose(
        [1, 5, 6, 7, 8, 9, 5, 6], gamma=3) == [7, 8, 9]
    assert ModelRunner.ngram_propose([1, 2, 3], gamma=3) == []
    assert ModelRunner.ngram_propose([1, 2], gamma=3) == []


def test_spec_matches_baseline_greedy():
    """Speculation must be lossless: identical greedy outputs."""
    # small vocab → greedy decode loops quickly → n-grams repeat
    prompt = [1, 2, 3, 4, 5, 6, 7, 8]
    base_toks, base_passes = run(make_engine(), prompt)
    spec_toks, spec_passes = run(make_engine(spec_gamma=8), prompt)
    assert spec_toks == base_toks
    # a verify pass is never worse than a chain pass per token, and the
    # (weakly) repetitive tail of the tiny random model must yield some
    # savings; real text is far more n-gram predictable
    assert spec_passes < base_passes * 0.9, (spec_passes, base_passes)


def test_oracle_proposal_full_acceptance():
    """A proposal equal to the model's own greedy continuation must be
    accepted in full (gamma matched + 1 bonus) — the core verify
    invariant."""
    prompt = [3, 1, 4, 1, 5, 9, 2, 6]
    oracle, _ = run(make_engine(), prompt, n=12)
    eng = make_engine(spec_gamma=4)
    sp = SamplingParams(max_tokens=12, temperature=0.0, ignore_eos=True)
    eng.add_request(list(prompt), sp)
    eng.step()  # prefill → first token == oracle[0]
    req = eng.scheduler.running[0]
    assert req.output_token_ids == oracle[:1]
    sched = eng.scheduler.schedule(lookahead=5)
    accepted = eng.runner.execute_spec_verify(
        sched.decodes, [list(oracle[1:5])], gamma=4)[0]
    assert accepted == oracle[1:6]


def test_spec_with_batch():
    prompts = [[1, 2, 3, 4], [9, 10, 11, 12], [20, 21, 22, 23]]
    base = make_engine()
    spec = make_engine(spec_gamma=4)
    sp = SamplingParams(max_tokens=32, temperature=0.0, ignore_eos=True)
    for p in prompts:
        base.add_request(list(p), sp)
        spec.add_request(list(p), sp)

    def drain(eng):
        outs = {}
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = o.outputs[0].token_ids
        return list(outs.values())

    a = drain(base)
    b = drain(spec)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_spec_disabled_for_sampling_requests():
    eng = make_engine(spec_gamma=4)
    sp = SamplingParams(max_tokens=16, temperature=0.8, seed=1,
                        ignore_eos=True)
    eng.add_request(list(range(1, 9)), sp)
    assert not eng._spec_applicable() or not eng.scheduler.running
    while eng.has_unfinished():
        eng.step()
