"""Sampler semantics tests (ADVICE round-1 regressions).

Covers: top-k fallback for k > cap, penalty semantics (repetition spans
prompt + output per HF/vLLM; presence/frequency output-only), and
counter-based RNG independence across seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.ops import sampler as S


def _sampling(b, **over):
    d = {
        "temperature": jnp.ones((b,), jnp.float32),
        "top_p": jnp.ones((b,), jnp.float32),
        "min_p": jnp.zeros((b,), jnp.float32),
        "top_k": jnp.full((b,), -1, jnp.int32),
        "repetition_penalty": jnp.ones((b,), jnp.float32),
        "presence_penalty": jnp.zeros((b,), jnp.float32),
        "frequency_penalty": jnp.zeros((b,), jnp.float32),
        "seed": jnp.zeros((b,), jnp.uint32),
    }
    d.update(over)
    return d


def test_top_k_within_cap_masks():
    logits = jnp.asarray(np.linspace(0, 1, 100)[None, :], jnp.float32)
    out = S._mask_top_k(logits, jnp.asarray([3], jnp.int32))
    kept = np.asarray(out[0] > S.NEG_INF / 2)
    assert kept.sum() == 3 and kept[-3:].all()


def test_top_k_above_cap_disables_not_truncates():
    # k=100 > cap 64: docstring promises "no top-k", NOT top-64
    logits = jnp.asarray(np.linspace(0, 1, 200)[None, :], jnp.float32)
    out = S._mask_top_k(logits, jnp.asarray([100], jnp.int32))
    kept = np.asarray(out[0] > S.NEG_INF / 2)
    assert kept.sum() == 200  # nothing masked


def test_top_k_disabled_sentinel():
    logits = jnp.asarray(np.random.randn(2, 50), jnp.float32)
    out = S._mask_top_k(logits, jnp.asarray([-1, 0], jnp.int32))
    assert np.allclose(np.asarray(out), np.asarray(logits))


def test_repetition_penalty_spans_prompt_tokens():
    v = 8
    logits = jnp.ones((1, v), jnp.float32)
    out_counts = jnp.zeros((1, v), jnp.int32)
    prompt_counts = jnp.zeros((1, v), jnp.int32).at[0, 3].set(2)
    rp = jnp.asarray([2.0], jnp.float32)
    zero = jnp.zeros((1,), jnp.float32)
    out = S.apply_penalties(logits, out_counts, rp, zero, zero,
                            prompt_counts=prompt_counts)
    got = np.asarray(out[0])
    assert got[3] == 0.5  # prompt token penalized (1.0 / 2.0)
    assert got[0] == 1.0  # unseen untouched


def test_presence_frequency_output_only():
    v = 8
    logits = jnp.zeros((1, v), jnp.float32)
    out_counts = jnp.zeros((1, v), jnp.int32).at[0, 1].set(3)
    prompt_counts = jnp.zeros((1, v), jnp.int32).at[0, 2].set(5)
    rp = jnp.ones((1,), jnp.float32)
    pres = jnp.asarray([0.5], jnp.float32)
    freq = jnp.asarray([0.1], jnp.float32)
    out = S.apply_penalties(logits, out_counts, rp, pres, freq,
                            prompt_counts=prompt_counts)
    got = np.asarray(out[0])
    # output token 1: presence 0.5 + frequency 0.1*3
    assert np.isclose(got[1], -0.8)
    # prompt-only token 2: presence/frequency must NOT apply
    assert got[2] == 0.0


def test_distinct_seeds_distinct_draws():
    v = 1000
    logits = jnp.zeros((2, v), jnp.float32)  # uniform
    step = jnp.zeros((2,), jnp.int32)
    ids_a = []
    for seed in (1, 2):
        s = _sampling(2, seed=jnp.full((2,), seed, jnp.uint32))
        ids, _ = jax.jit(S.sample)(logits, s, step)
        ids_a.append(np.asarray(ids))
    assert not np.array_equal(ids_a[0], ids_a[1])


def test_same_seed_reproducible():
    v = 1000
    logits = jnp.asarray(np.random.randn(1, v), jnp.float32)
    s = _sampling(1, seed=jnp.asarray([7], jnp.uint32))
    step = jnp.zeros((1,), jnp.int32)
    a, _ = S.sample(logits, s, step)
    b, _ = S.sample(logits, s, step)
    assert int(a[0]) == int(b[0])


def test_engine_assigns_fresh_seed_when_unset():
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import _seed_params

    p = SamplingParams(temperature=1.0)
    a, b = _seed_params(p), _seed_params(p)
    assert a.seed is not None and b.seed is not None
    assert a.seed != b.seed  # 2^-32 flake odds
    assert p.seed is None  # original untouched (may be shared)
    # explicit seed preserved
    q = SamplingParams(temperature=1.0, seed=42)
    assert _seed_params(q).seed == 42
