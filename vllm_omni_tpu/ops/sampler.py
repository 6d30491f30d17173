"""On-device batched token sampler.

Replaces upstream vLLM's CUDA continuous-batching sampler (SURVEY.md §2.9
row 1). All requests in a step sample in one fused program: per-request
parameters arrive as batched arrays, greedy rows are a `where` over the
sampled result, and randomness is counter-based (request seed ⊕ step via
fold_in) so results are reproducible regardless of batch composition —
the TPU answer to per-request CUDA generators.

Penalties (repetition / presence / frequency) read an int32 count buffer
[B, V] maintained on device by scatter-add of sampled tokens; the engine
only resets rows when a slot is reassigned.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_sampling_arrays(params_list, np=None):
    """Host helper: list of SamplingParams → dict of batched numpy arrays
    (padded entries should use greedy defaults)."""
    import numpy as np

    b = len(params_list)
    out = {
        "temperature": np.zeros((b,), np.float32),
        "top_p": np.ones((b,), np.float32),
        "min_p": np.zeros((b,), np.float32),
        "top_k": np.full((b,), -1, np.int32),
        "repetition_penalty": np.ones((b,), np.float32),
        "presence_penalty": np.zeros((b,), np.float32),
        "frequency_penalty": np.zeros((b,), np.float32),
        "seed": np.zeros((b,), np.uint32),
    }
    for i, p in enumerate(params_list):
        if p is None:
            continue
        out["temperature"][i] = p.temperature
        out["top_p"][i] = p.top_p
        out["min_p"][i] = p.min_p
        out["top_k"][i] = p.top_k
        out["repetition_penalty"][i] = p.repetition_penalty
        out["presence_penalty"][i] = p.presence_penalty
        out["frequency_penalty"][i] = p.frequency_penalty
        out["seed"][i] = 0 if p.seed is None else (p.seed & 0xFFFFFFFF)
    return out


def pack_sampling(params_list, b: int):
    """Pack per-request sampling params into two dense arrays so the hot
    decode loop ships ONE f32 and ONE i32 host→device transfer instead of
    seven (transfer count, not bytes, is what the dispatch path pays for).

    Returns (f32 [6, B]: temp/top_p/rep/pres/freq/min_p,
    i32 [2, B]: top_k/seed).
    """
    import numpy as np

    f = np.zeros((6, b), np.float32)
    f[1] = 1.0  # top_p
    f[2] = 1.0  # repetition
    ints = np.zeros((2, b), np.int32)
    ints[0] = -1  # top_k off
    for i, p in enumerate(params_list):
        if p is None:
            continue
        f[0, i] = p.temperature
        f[1, i] = p.top_p
        f[2, i] = p.repetition_penalty
        f[3, i] = p.presence_penalty
        f[4, i] = p.frequency_penalty
        f[5, i] = p.min_p
        ints[0, i] = p.top_k
        ints[1, i] = np.int32((0 if p.seed is None else p.seed) &
                              0x7FFFFFFF)
    return f, ints


def unpack_sampling(fpack: jnp.ndarray, ipack: jnp.ndarray) -> dict:
    return {
        "temperature": fpack[0],
        "top_p": fpack[1],
        "repetition_penalty": fpack[2],
        "presence_penalty": fpack[3],
        "frequency_penalty": fpack[4],
        "min_p": fpack[5] if fpack.shape[0] > 5 else None,
        "top_k": ipack[0],
        "seed": ipack[1].astype(jnp.uint32),
    }


def apply_penalties(logits: jnp.ndarray, counts: jnp.ndarray,
                    repetition_penalty: jnp.ndarray,
                    presence_penalty: jnp.ndarray,
                    frequency_penalty: jnp.ndarray,
                    prompt_counts: Optional[jnp.ndarray] = None
                    ) -> jnp.ndarray:
    """logits [B, V] f32; counts [B, V] int32 OUTPUT-token occurrence
    counts; prompt_counts [B, V] int32 PROMPT-token occurrences.

    Matches HF/vLLM semantics exactly: repetition penalty applies over
    prompt + output tokens (divides positive / multiplies negative logits
    of any seen token); presence subtracts a flat penalty and frequency a
    count-proportional one, both over output tokens only.
    """
    out_seen = counts > 0
    rep_seen = out_seen if prompt_counts is None else (
        out_seen | (prompt_counts > 0))
    rp = repetition_penalty[:, None]
    penalized = jnp.where(logits > 0, logits / rp, logits * rp)
    logits = jnp.where(rep_seen, penalized, logits)
    logits = logits - presence_penalty[:, None] * out_seen.astype(
        jnp.float32)
    logits = logits - frequency_penalty[:, None] * counts.astype(jnp.float32)
    return logits


def _mask_top_k(logits: jnp.ndarray, top_k: jnp.ndarray) -> jnp.ndarray:
    """Per-row top-k mask without a sort: keep values >= the k-th largest.
    top_k[b] == -1 disables. Uses a fixed 64-wide top_k window — requests
    asking for k > 64 genuinely fall back to no top-k (the mask
    deactivates rather than silently truncating to top-64)."""
    k_cap = min(64, logits.shape[-1])
    topvals, _ = jax.lax.top_k(logits, k_cap)  # [B, k_cap] sorted desc
    k = jnp.clip(top_k, 1, k_cap)
    kth = jnp.take_along_axis(topvals, (k - 1)[:, None], axis=-1)  # [B,1]
    active = ((top_k > 0) & (top_k <= k_cap))[:, None]
    return jnp.where(active & (logits < kth), NEG_INF, logits)


def _mask_min_p(logits: jnp.ndarray, min_p: jnp.ndarray) -> jnp.ndarray:
    """Drop tokens whose probability < min_p * max_prob (cheap: one max,
    no sort)."""
    active = min_p > 0
    probs = jax.nn.softmax(logits, axis=-1)
    thresh = min_p[:, None] * jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(active[:, None] & (probs < thresh), NEG_INF, logits)


def _mask_top_p(logits: jnp.ndarray, top_p: jnp.ndarray) -> jnp.ndarray:
    """Nucleus mask: smallest set of tokens with cumulative prob >= p.
    Sort-based; [B, V] sort is fine at V≈150k on TPU (single decode-step
    cost is dominated by the model forward)."""
    active = top_p < 1.0
    if logits.shape[0] == 0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens while cumulative prob (exclusive) < p
    keep_sorted = (cum - probs) < top_p[:, None]
    # threshold = smallest kept logit per row
    thresh = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                     axis=-1, keepdims=True)
    return jnp.where(active[:, None] & (logits < thresh), NEG_INF, logits)


def sample(logits: jnp.ndarray, sampling: dict, step: jnp.ndarray,
           counts: Optional[jnp.ndarray] = None,
           greedy_only: bool = False,
           prompt_counts: Optional[jnp.ndarray] = None
           ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """logits [B, V] → (token_ids [B] int32, logprobs [B] f32).

    sampling: dict of batched arrays (see make_sampling_arrays), all [B].
    step: [B] int32 per-request decode counter for counter-based RNG.
    greedy_only (static): whole batch is temperature-0 — skip the
    top-k/top-p masking and the [B, V] sort entirely (hot-loop win at
    vocab ≈ 150k).
    counts / prompt_counts: [B, V] occurrence buffers for output /
    prompt tokens (repetition penalty spans both; see apply_penalties).
    """
    logits = logits.astype(jnp.float32)
    if counts is not None:
        logits = apply_penalties(logits, counts,
                                 sampling["repetition_penalty"],
                                 sampling["presence_penalty"],
                                 sampling["frequency_penalty"],
                                 prompt_counts=prompt_counts)
    greedy_ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if greedy_only:
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits, axis=-1),
                                 greedy_ids[:, None], axis=-1)[:, 0]
        return greedy_ids, lp

    temp = sampling["temperature"]
    safe_temp = jnp.where(temp > 0, temp, 1.0)
    scaled = logits / safe_temp[:, None]
    scaled = _mask_top_k(scaled, sampling["top_k"])
    scaled = _mask_top_p(scaled, sampling["top_p"])
    min_p = sampling.get("min_p")
    if min_p is not None:
        scaled = _mask_min_p(scaled, min_p)

    def row_key(seed, s):
        return jax.random.fold_in(jax.random.PRNGKey(seed), s)

    keys = jax.vmap(row_key)(sampling["seed"], step)
    # Gumbel-max sampling: argmax(logits + G) ~ Categorical(softmax)
    gumbel = jax.vmap(
        lambda k, shape=scaled.shape[-1:]: jax.random.gumbel(k, shape))(keys)
    sampled_ids = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)

    ids = jnp.where(temp > 0, sampled_ids, greedy_ids)
    logprobs_all = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.take_along_axis(logprobs_all, ids[:, None], axis=-1)[:, 0]
    return ids, lp


def update_counts(counts: jnp.ndarray, row_ids: jnp.ndarray,
                  token_ids: jnp.ndarray,
                  active: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add sampled tokens into the [B, V] count buffer.
    active[b]=False rows are skipped (padding)."""
    inc = active.astype(jnp.int32)
    return counts.at[row_ids, token_ids].add(inc)
