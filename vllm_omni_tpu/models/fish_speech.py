"""Fish Speech S2 Pro dual-AR (slow AR + fast AR) with real checkpoint
geometry.

Reference parity: model_executor/models/fish_speech/
(fish_speech_slow_ar.py:170 FishSpeechSlowARForConditionalGeneration —
a Qwen3 tower with GPT-J interleaved RoPE, tied embeddings, a
codebook-embedding table summed into semantic-token inputs, and a
semantic-range logit mask; fish_speech_fast_ar.py:259 FishSpeechFastAR —
a 4-layer re-prefill transformer predicting the residual codebook codes
after every slow step; configuration_fish_speech.py field remapping;
_remap_fish_speech_weights :45 for the original checkpoint naming).

TPU-native design:
* the slow AR IS the shared decoder tower (models/decoder.py) with
  ``rope_interleaved=True`` — it runs under the normal paged-KV
  continuous-batching engine, no family-specific runner;
* the semantic logit mask rides the engine's dense logit-bias path (the
  same device path guided decoding uses) — no new sampler surface;
* the fast AR is a pure-function mini-transformer whose re-prefill loop
  is UNROLLED over the ≤10 residual steps inside one jit — each step
  re-runs the fixed [B, Q+1] buffer (causal attention makes positions
  ≤ step exact regardless of the not-yet-filled suffix), mirroring the
  reference's KV-cache-free re-prefill (fast_ar.py:6-9) but as a single
  compiled program instead of 9 eager dispatches;
* in-loop conditioning runs INSIDE the chained decode scan (the
  engine's step-conditioner surface, worker/model_runner.py
  set_step_conditioner): at step t the fast AR expands
  (hidden_{t-1}, token_t) into the frame's codebook column and the slow
  AR's input embedding becomes (embed + Σ codebook_embed)/√(Q+1) —
  exactly the reference's talker_mtp :646 behavior, verified per-step
  against a torch oracle (tests/models/test_fish_speech.py). Columns
  stream out per frame; a vectorized finish-hook expansion covers only
  a max_tokens-truncated tail frame.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import DecoderConfig, linear
from vllm_omni_tpu.ops.layernorm import rms_norm
from vllm_omni_tpu.ops.rope import apply_rope_interleaved, compute_cos_sin

logger = init_logger(__name__)

Params = dict


@dataclass
class FishFastConfig:
    """audio_decoder config (configuration_fish_speech.py:72)."""

    vocab_size: int = 4096
    num_codebooks: int = 10
    hidden_size: int = 2560
    num_heads: int = 32
    num_kv_heads: int = 8
    head_dim: int = 128
    num_layers: int = 4
    intermediate_size: int = 9728
    text_dim: int = 2560
    rope_theta: float = 1_000_000.0
    rms_norm_eps: float = 1e-6
    qk_norm: bool = False
    residual_codebook_size: int = 1024  # fast_ar.py:449


def slow_config_from_fish(tc: dict[str, Any],
                          quant_flags: Optional[dict] = None
                          ) -> DecoderConfig:
    """Fish text_config (original field names: dim/n_head/n_layer/…) →
    DecoderConfig (configuration_fish_speech.py:44-56 name mapping)."""
    return DecoderConfig(
        vocab_size=tc.get("vocab_size", 155776),
        hidden_size=tc.get("dim", tc.get("hidden_size", 2560)),
        intermediate_size=tc.get("intermediate_size", 9728),
        num_layers=tc.get("n_layer", tc.get("num_hidden_layers", 36)),
        num_heads=tc.get("n_head", tc.get("num_attention_heads", 32)),
        num_kv_heads=tc.get("n_local_heads",
                            tc.get("num_key_value_heads", 8)),
        head_dim=tc.get("head_dim", 128),
        rope_theta=tc.get("rope_base", tc.get("rope_theta", 1e6)),
        rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=tc.get("tie_word_embeddings", True),
        qk_norm=tc.get("attention_qk_norm", True),
        rope_interleaved=True,
        max_position_embeddings=tc.get("max_seq_len",
                                       tc.get("max_position_embeddings",
                                              32768)),
    )


def fast_config_from_fish(ac: dict[str, Any]) -> FishFastConfig:
    return FishFastConfig(
        vocab_size=ac.get("vocab_size", 4096),
        num_codebooks=ac.get("num_codebooks", 10),
        hidden_size=ac.get("dim", ac.get("hidden_size", 2560)),
        num_heads=ac.get("n_head", ac.get("num_attention_heads", 32)),
        num_kv_heads=ac.get("n_local_heads",
                            ac.get("num_key_value_heads", 8)),
        head_dim=ac.get("head_dim", 128),
        num_layers=ac.get("n_layer", ac.get("num_hidden_layers", 4)),
        intermediate_size=ac.get("intermediate_size", 9728),
        text_dim=ac.get("text_dim", ac.get("dim", 2560)),
        rope_theta=ac.get("rope_base", ac.get("rope_theta", 1e6)),
        rms_norm_eps=ac.get("rms_norm_eps", 1e-6),
        qk_norm=ac.get("attention_qk_norm", False),
    )


# ---------------------------------------------------------------------------
# Fast AR (residual codebook predictor)
# ---------------------------------------------------------------------------


def _fast_layer(layer: Params, cfg: FishFastConfig, x: jnp.ndarray,
                cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    b, s, h = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    xn = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
    q = linear(xn, layer["q_proj"]).reshape(b, s, nh, hd)
    k = linear(xn, layer["k_proj"]).reshape(b, s, nkv, hd)
    v = linear(xn, layer["v_proj"]).reshape(b, s, nkv, hd)
    if cfg.qk_norm:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    if nkv != nh:
        rep = nh // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    # tiny S (≤11): plain masked softmax attention
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (hd ** -0.5)
    mask = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    x = x + linear(o.reshape(b, s, nh * hd), layer["o_proj"])

    xn = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
    gate = linear(xn, layer["gate_proj"])
    up = linear(xn, layer["up_proj"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    return x + linear(act, layer["down_proj"])


def fast_ar_hidden(params: Params, cfg: FishFastConfig,
                   embeds: jnp.ndarray) -> jnp.ndarray:
    """Full re-prefill forward: embeds [B, S, H] → hidden [B, S, H]."""
    s = embeds.shape[1]
    cos, sin = compute_cos_sin(jnp.arange(s), cfg.head_dim,
                               cfg.rope_theta)
    x = embeds
    for layer in params["layers"]:
        x = _fast_layer(layer, cfg, x, cos, sin)
    return x


def fast_ar_predict(params: Params, cfg: FishFastConfig,
                    slow_hidden: jnp.ndarray, semantic_code: jnp.ndarray,
                    key: Optional[jax.Array] = None,
                    temperature: float = 0.8, top_k: int = 30
                    ) -> jnp.ndarray:
    """Residual codebook prediction (fast_ar.py:393 forward).

    slow_hidden [B, Hs], semantic_code [B] (codebook index, NOT vocab
    id) → codes [B, num_codebooks] (code 0 = the semantic code).
    key=None → greedy. Unrolled re-prefill: 9 fixed-shape forwards of
    the growing [B, Q+1] buffer inside one trace.
    """
    b = slow_hidden.shape[0]
    q_cb = cfg.num_codebooks
    dtype = params["fast_embeddings"].dtype
    max_seq = q_cb + 1

    if "fast_project_in" in params:
        proj = linear(slow_hidden.astype(dtype),
                      params["fast_project_in"])
    else:  # identity when dims match (fast_ar.py:299-302)
        proj = slow_hidden.astype(dtype)
    buf = jnp.zeros((b, max_seq, cfg.hidden_size), dtype)
    buf = buf.at[:, 0].set(proj)
    buf = buf.at[:, 1].set(
        jnp.take(params["fast_embeddings"], semantic_code, axis=0))

    codes = [semantic_code]
    keys = jax.random.split(key, q_cb) if key is not None else None
    for step in range(1, q_cb):
        hidden = fast_ar_hidden(params, cfg, buf)[:, step]
        logits = linear(
            rms_norm(hidden, params["fast_norm"], cfg.rms_norm_eps),
            params["fast_output"]).astype(jnp.float32)
        # residual codebooks only use the first 1024 head entries
        logits = logits[:, :cfg.residual_codebook_size]
        if keys is not None and temperature > 0:
            scaled = logits / max(temperature, 1e-6)
            if top_k > 0:
                kth = jnp.sort(scaled, axis=-1)[:, -min(
                    top_k, scaled.shape[-1])][:, None]
                scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
            g = jax.random.gumbel(keys[step], scaled.shape)
            nxt = jnp.argmax(scaled + g, axis=-1)
        else:
            nxt = jnp.argmax(logits, axis=-1)
        nxt = nxt.astype(semantic_code.dtype)
        codes.append(nxt)
        if step < q_cb - 1:
            buf = buf.at[:, step + 1].set(
                jnp.take(params["fast_embeddings"], nxt, axis=0))
    return jnp.stack(codes, axis=1)


def init_fast_params(cfg: FishFastConfig, key: jax.Array,
                     dtype=jnp.bfloat16,
                     with_project_in: Optional[bool] = None) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 10 + 6))
    h, hd = cfg.hidden_size, cfg.head_dim

    def lin(k_in, n_out):
        return {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                        jnp.float32) *
                      k_in ** -0.5).astype(dtype)}

    params: Params = {
        "fast_embeddings": (jax.random.normal(
            next(keys), (cfg.vocab_size, h), jnp.float32) *
            0.02).astype(dtype),
        "fast_output": lin(h, cfg.vocab_size),
        "fast_norm": jnp.ones((h,), dtype),
        "layers": [],
    }
    if with_project_in is None:
        with_project_in = cfg.text_dim != cfg.hidden_size
    if with_project_in:
        params["fast_project_in"] = {
            **lin(cfg.text_dim, h), "b": jnp.zeros((h,), dtype)}
    for _ in range(cfg.num_layers):
        layer = {
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": lin(h, cfg.num_heads * hd),
            "k_proj": lin(h, cfg.num_kv_heads * hd),
            "v_proj": lin(h, cfg.num_kv_heads * hd),
            "o_proj": lin(cfg.num_heads * hd, h),
            "gate_proj": lin(h, cfg.intermediate_size),
            "up_proj": lin(h, cfg.intermediate_size),
            "down_proj": lin(cfg.intermediate_size, h),
        }
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((hd,), dtype)
            layer["k_norm"] = jnp.ones((hd,), dtype)
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# Checkpoint loading (original Fish Speech naming)
# ---------------------------------------------------------------------------


def _iter_safetensors(src: str):
    from safetensors import safe_open

    files = sorted(f for f in os.listdir(src)
                   if f.endswith(".safetensors"))
    for f in files:
        with safe_open(os.path.join(src, f), framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(jnp.bfloat16))
                yield name, arr


def load_fish_speech_checkpoint(src: str, dtype=jnp.bfloat16
                                ) -> dict[str, Any]:
    """HF fish_qwen3_omni dir → slow decoder pytree + fast AR pytree +
    codebook embeddings. Consumes the ORIGINAL checkpoint naming
    (text_model.model.layers.N.attention.wqkv fused qkv, feed_forward
    w1/w2/w3, audio_decoder.* — reference _remap_fish_speech_weights
    :45-168)."""
    with open(os.path.join(src, "config.json")) as f:
        hf = json.load(f)
    tc = hf.get("text_config") or {}
    ac = hf.get("audio_decoder_config") or {}
    slow_cfg = slow_config_from_fish(tc)
    fast_cfg = fast_config_from_fish(ac)

    from vllm_omni_tpu.models.decoder import init_params

    slow = init_params(slow_cfg, jax.random.PRNGKey(0), dtype)
    fast = init_fast_params(fast_cfg, jax.random.PRNGKey(1), dtype)
    codebook_embeddings = None

    q_size = slow_cfg.num_heads * slow_cfg.head_dim
    kv_size = slow_cfg.num_kv_heads * slow_cfg.head_dim
    fq = fast_cfg.num_heads * fast_cfg.head_dim
    fkv = fast_cfg.num_kv_heads * fast_cfg.head_dim

    def w(v):
        return jnp.asarray(np.ascontiguousarray(v.T)).astype(dtype)

    def emb(v):
        return jnp.asarray(v).astype(dtype)

    def assign_layer(layer: Params, rest: list[str], v, qs, kvs) -> bool:
        if rest[:2] == ["attention", "wqkv"]:
            layer["q_proj"] = {"w": w(v[:qs])}
            layer["k_proj"] = {"w": w(v[qs:qs + kvs])}
            layer["v_proj"] = {"w": w(v[qs + kvs:])}
            return True
        m = {("attention", "wo"): ("o_proj", "w"),
             ("feed_forward", "w1"): ("gate_proj", "w"),
             ("feed_forward", "w3"): ("up_proj", "w"),
             ("feed_forward", "w2"): ("down_proj", "w")}
        if len(rest) == 3 and (rest[0], rest[1]) in m:
            slot, _ = m[(rest[0], rest[1])]
            layer[slot] = {"w": w(v)}
            return True
        if rest[:2] == ["attention", "q_norm"]:
            layer["q_norm"] = emb(v)
            return True
        if rest[:2] == ["attention", "k_norm"]:
            layer["k_norm"] = emb(v)
            return True
        if rest[0] == "attention_norm":
            layer["input_norm"] = emb(v)
            return True
        if rest[0] == "ffn_norm":
            layer["post_norm"] = emb(v)
            return True
        return False

    unmapped, loaded = [], 0
    for name, v in _iter_safetensors(src):
        ok = False
        if name.startswith("text_model.model."):
            suffix = name[len("text_model.model."):]
            if suffix == "embeddings.weight":
                slow["embed"] = emb(v)
                ok = True
            elif suffix == "norm.weight":
                slow["final_norm"] = emb(v)
                ok = True
            elif suffix.startswith("layers."):
                parts = suffix.split(".")
                layer = slow["layers"][int(parts[1])]
                ok = assign_layer(layer, parts[2:], v, q_size, kv_size)
        elif name.startswith("audio_decoder."):
            suffix = name[len("audio_decoder."):]
            if suffix == "codebook_embeddings.weight":
                codebook_embeddings = emb(v)
                ok = True
            elif suffix == "embeddings.weight":
                fast["fast_embeddings"] = emb(v)
                ok = True
            elif suffix == "output.weight":
                fast["fast_output"] = {"w": w(v)}
                ok = True
            elif suffix == "norm.weight":
                fast["fast_norm"] = emb(v)
                ok = True
            elif suffix.startswith("fast_project_in."):
                leaf = suffix.split(".")[-1]
                fast.setdefault("fast_project_in", {})
                fast["fast_project_in"]["w" if leaf == "weight"
                                        else "b"] = \
                    w(v) if leaf == "weight" else emb(v)
                ok = True
            elif suffix.startswith("layers."):
                parts = suffix.split(".")
                layer = fast["layers"][int(parts[1])]
                ok = assign_layer(layer, parts[2:], v, fq, fkv)
        if ok:
            loaded += 1
        else:
            unmapped.append(name)
    if unmapped:
        logger.warning("fish_speech: %d unmapped tensors, e.g. %s",
                       len(unmapped), unmapped[:8])
    if loaded == 0:
        raise ValueError(f"no fish_speech tensors mapped from {src}")
    logger.info("fish_speech: %d tensors loaded (slow %d layers, "
                "fast %d layers)", loaded, slow_cfg.num_layers,
                fast_cfg.num_layers)
    return {
        "slow": (slow_cfg, slow),
        "fast": (fast_cfg, fast),
        "codebook_embeddings": codebook_embeddings,
        "hf_config": hf,
        "special": {
            "semantic_start_token_id": hf.get("semantic_start_token_id",
                                              151678),
            "semantic_end_token_id": hf.get("semantic_end_token_id",
                                            155773),
            "audio_pad_token_id": hf.get("audio_pad_token_id", 151677),
            "im_end_id": hf.get("im_end_id", 151645),
        },
    }


def semantic_logit_mask(vocab_size: int, special: dict[str, Any]
                        ) -> np.ndarray:
    """Additive float32 row: 0 on semantic tokens + im_end, -inf-like
    elsewhere (reference _semantic_allowed_mask :243-254)."""
    row = np.full((vocab_size,), -1e9, np.float32)
    lo = special["semantic_start_token_id"]
    hi = min(special["semantic_end_token_id"] + 1, vocab_size)
    if hi > lo:
        row[lo:hi] = 0.0
    im_end = special.get("im_end_id", 151645)
    if im_end < vocab_size:
        row[im_end] = 0.0
    return row


class FixedLogitMask:
    """Constant logit mask riding the runner's guided-decoding bias
    path. ``dynamic=False`` keeps multi-token decode chains enabled
    (the mask never changes, so one bias upload covers a whole chain)."""

    dynamic = False

    def __init__(self, row: np.ndarray) -> None:
        self._row = row

    def mask_row(self) -> np.ndarray:
        return self._row

    def advance(self, token_id: int) -> None:  # noqa: ARG002
        pass
