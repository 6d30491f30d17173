"""Stress / concurrency tier (reference tests/dfx/stability role):
many concurrent requests with mixed lengths, mid-flight aborts, and
repeated submit waves through the async API — no hangs, no dropped
outputs, per-request isolation."""

import asyncio

import numpy as np
import pytest

from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.entrypoints.async_omni import AsyncOmni

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}


@pytest.fixture(scope="module")
def omni():
    o = AsyncOmni(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=128, num_pages=96, page_size=16,
                  max_num_seqs=8, max_num_batched_tokens=128)
    yield o
    o.shutdown()


def test_concurrent_mixed_lengths(omni):
    """32 concurrent requests, random prompt/output lengths at 4x the
    engine's max_num_seqs — queueing + continuous batching must drain
    them all with correct per-request token counts."""
    rng = np.random.default_rng(0)
    specs = [(list(rng.integers(1, 250, int(rng.integers(4, 60)))),
              int(rng.integers(1, 24))) for _ in range(32)]

    async def run():
        async def one(i, prompt, max_tokens):
            outs = []
            sp = SamplingParams(max_tokens=max_tokens, temperature=0.0,
                                ignore_eos=True)
            async for out in omni.generate(prompt, sp,
                                           request_id=f"mix{i}"):
                outs.append(out)
            return outs[-1]

        return await asyncio.wait_for(
            asyncio.gather(*(one(i, p, m)
                             for i, (p, m) in enumerate(specs))),
            timeout=300)

    finals = asyncio.run(run())
    for (prompt, max_tokens), final in zip(specs, finals):
        assert final.finished and final.error is None
        assert len(final.outputs[0].token_ids) == max_tokens, \
            (len(prompt), max_tokens)


def test_abort_storm(omni):
    """Half the in-flight requests abort mid-decode; survivors finish
    with full outputs, aborted ones terminate (no hang, no leak)."""

    async def run():
        sp = SamplingParams(max_tokens=48, temperature=0.0,
                            ignore_eos=True)
        rng = np.random.default_rng(1)
        prompts = [list(rng.integers(1, 250, 16)) for _ in range(8)]

        async def one(i):
            seen = 0
            async for out in omni.generate(prompts[i], sp,
                                           request_id=f"ab{i}"):
                seen = len(out.outputs[0].token_ids) if out.outputs \
                    else 0
                if i % 2 == 0 and seen >= 4:
                    await omni.abort(f"ab{i}")
                if out.finished:
                    return i, seen, out
            return i, seen, None

        return await asyncio.wait_for(
            asyncio.gather(*(one(i) for i in range(8))), timeout=600)

    results = asyncio.run(run())
    for i, seen, final in results:
        if i % 2 == 1:
            assert final is not None and final.error is None
            assert len(final.outputs[0].token_ids) == 48
        else:
            # aborted: stream ended (finished flag or generator close)
            assert seen >= 4


def test_repeated_waves_no_leak(omni):
    """Submit/drain several waves; scheduler + KV pages must fully
    recycle (wave N+1 behaves like wave 0)."""

    async def wave(n):
        sp = SamplingParams(max_tokens=8, temperature=0.0,
                            ignore_eos=True)

        async def one(i):
            final = None
            async for out in omni.generate([1 + (i % 200), 2, 3], sp,
                                           request_id=f"w{n}_{i}"):
                if out.finished:
                    final = out
            return final

        return await asyncio.wait_for(
            asyncio.gather(*(one(i) for i in range(16))), timeout=120)

    for n in range(4):
        finals = asyncio.run(wave(n))
        assert all(f is not None and f.error is None and
                   len(f.outputs[0].token_ids) == 8 for f in finals), n
    # no residual request state
    assert not omni.runner.has_unfinished()
