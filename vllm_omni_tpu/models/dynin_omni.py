"""Dynin-Omni: unified masked-discrete-diffusion LM (text / image /
audio tokens in one vocabulary).

Reference: /root/reference/vllm_omni/model_executor/models/dynin_omni/
— a three-stage token chain (token2text → token2image → token2audio)
around a hub remote-code model. What the reference pins down
(dynin_omni_token2text.py): the task→generate-fn map :61-76 (t2i /
i2i / t2s / mmu / mmu_fast / mmu_fastdllm_v1 / s2t / t2t...), the
generate kwargs surface :90-124 (steps, block_length, cfg_scale,
remasking, mask_id, noise_schedule, temperature, guidance_scale...),
mask_token_id default 126336 :435, image tokens offset by
text_vocab_size :456, CFG via an empty-text uncond prompt :508-519,
and the detok targets per task (dynin_omni_common.py:34-48). The
placeholder grammar is in dynin_omni.py:56-62 (<|soi|><|image|><|eoi|>
etc.). The model internals live in hub remote code
(snu-aidas/Dynin-Omni); this module re-designs them TPU-natively as a
bidirectional (full-attention) LLaDA-class tower with the public
masked-diffusion samplers the reference's fn names denote:

- mmu_generate: block-wise low-confidence remasking (LLaDA
  semantics: per block, linearly-scheduled transfer counts, gumbel
  temperature sampling, CFG by re-masking the prompt).
- mmu_generate_fastdllm_v1: Fast-dLLM parallel decoding — commit
  every masked position whose confidence clears a threshold (always
  at least the argmax) per iteration.
- t2i_generate / t2s_generate: MaskGIT cosine-schedule parallel
  decode over the image/audio vocab slice with CFG.

All samplers run as jitted fixed-shape steps (the engine runner maps
one masked-denoise iteration onto one `denoise_step`).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import linear

logger = init_logger(__name__)

Params = dict


@dataclass
class DyninConfig:
    hidden_size: int = 2048
    intermediate_size: int = 5632
    num_layers: int = 22
    num_heads: int = 16
    num_kv_heads: int = 16
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    qk_norm: bool = True  # Qwen3-family tower (registry hf_archs)
    text_vocab_size: int = 126349  # incl. specials + mask
    image_codebook_size: int = 8192
    audio_codebook_size: int = 4096
    mask_token_id: int = 126336
    # placeholder special ids (inside the text vocab)
    soi_token_id: int = 126337
    eoi_token_id: int = 126338
    soa_token_id: int = 126339
    eoa_token_id: int = 126340
    eot_token_id: int = 126081
    image_grid: int = 16  # 16x16 = 256 image tokens (resolution tier)
    t2s_token_length: int = 256

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def vocab_size(self) -> int:
        return (self.text_vocab_size + self.image_codebook_size +
                self.audio_codebook_size)

    @property
    def image_offset(self) -> int:
        return self.text_vocab_size  # reference :456

    @property
    def audio_offset(self) -> int:
        return self.text_vocab_size + self.image_codebook_size

    @classmethod
    def from_json(cls, hf: dict) -> "DyninConfig":
        return cls(
            hidden_size=hf.get("hidden_size", 2048),
            intermediate_size=hf.get("intermediate_size", 5632),
            num_layers=hf.get("num_hidden_layers", 22),
            num_heads=hf.get("num_attention_heads", 16),
            num_kv_heads=hf.get("num_key_value_heads", 16),
            rope_theta=hf.get("rope_theta", 10000.0),
            rms_norm_eps=hf.get("rms_norm_eps", 1e-5),
            qk_norm=hf.get("qk_norm", True),
            text_vocab_size=hf.get("text_vocab_size",
                                   hf.get("vocab_size", 126349)),
            image_codebook_size=hf.get("image_codebook_size", 8192),
            audio_codebook_size=hf.get("audio_codebook_size", 4096),
            mask_token_id=hf.get("mask_token_id", 126336),
            soi_token_id=hf.get("soi_token_id", 126337),
            eoi_token_id=hf.get("eoi_token_id", 126338),
            soa_token_id=hf.get("soa_token_id", 126339),
            eoa_token_id=hf.get("eoa_token_id", 126340),
            eot_token_id=hf.get("eot_token_id", 126081),
            image_grid=hf.get("image_grid", 16),
            t2s_token_length=hf.get("t2s_token_length", 256),
        )


def is_dynin_config(hf: dict) -> bool:
    archs = hf.get("architectures") or []
    return hf.get("model_type") == "dynin_omni" or any(
        "Dynin" in a for a in archs)


# ---------------------------------------------------------------------------
# bidirectional tower
# ---------------------------------------------------------------------------


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32)).astype(x.dtype)


def _rope_cs(n: int, d: int, theta: float):
    inv = 1.0 / (theta ** (np.arange(0, d, 2, np.float64) / d))
    ang = np.arange(n, dtype=np.float64)[:, None] * inv[None]
    emb = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(emb), jnp.float32),
            jnp.asarray(np.sin(emb), jnp.float32))


def _apply_rope(x, cos, sin):
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * cos[:, None] + rot * sin[:, None]).astype(x.dtype)


def dynin_forward(params: Params, cfg: DyninConfig,
                  ids: jnp.ndarray) -> jnp.ndarray:
    """Full bidirectional forward over ids [T] → logits [T, V]
    (diffusion LLMs attend bidirectionally — no causal mask)."""
    t = ids.shape[0]
    d = cfg.head_dim
    x = jnp.take(params["embed"], ids, axis=0)
    cos, sin = _rope_cs(t, d, cfg.rope_theta)
    for layer in params["layers"]:
        h = _rms(x, layer["input_norm"], cfg.rms_norm_eps)
        q = linear(h, layer["q_proj"]).reshape(t, cfg.num_heads, d)
        k = linear(h, layer["k_proj"]).reshape(t, cfg.num_kv_heads, d)
        v = linear(h, layer["v_proj"]).reshape(t, cfg.num_kv_heads, d)
        if cfg.qk_norm:
            q = _rms(q, layer["q_norm"], cfg.rms_norm_eps)
            k = _rms(k, layer["k_norm"], cfg.rms_norm_eps)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        g = cfg.num_heads // cfg.num_kv_heads
        kr = jnp.repeat(k, g, axis=1)
        vr = jnp.repeat(v, g, axis=1)
        sc = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                        kr.astype(jnp.float32)) * (d ** -0.5)
        pr = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", pr.astype(vr.dtype),
                       vr).reshape(t, cfg.num_heads * d)
        x = x + linear(o, layer["o_proj"])
        h = _rms(x, layer["post_norm"], cfg.rms_norm_eps)
        gate = linear(h, layer["gate_proj"])
        up = linear(h, layer["up_proj"])
        x = x + linear(jax.nn.silu(gate.astype(jnp.float32)).astype(
            x.dtype) * up, layer["down_proj"])
    x = _rms(x, params["norm"], cfg.rms_norm_eps)
    return linear(x, params["lm_head"]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# prompting (dynin_omni.py:56-62 placeholder grammar; reference
# build_dynin_prompt_payload semantics)
# ---------------------------------------------------------------------------


def build_dynin_prompt(cfg: DyninConfig, task: str,
                       text_ids: list[int],
                       image_tokens: Optional[np.ndarray] = None
                       ) -> tuple[np.ndarray, int, int]:
    """→ (ids, gen_start, gen_len). Generation region is filled with
    mask tokens: t2i → <|soi|> MASK×G² <|eoi|>; t2s → <|soa|>
    MASK×L <|eoa|>; mmu/t2t → MASK×max_new appended after the
    prompt (handled by the samplers)."""
    ids = list(text_ids)
    if task in ("t2i", "i2i"):
        if image_tokens is not None:  # i2i conditioning image
            ids += [cfg.soi_token_id] + [
                int(c) + cfg.image_offset for c in
                np.asarray(image_tokens).reshape(-1)] + \
                [cfg.eoi_token_id]
        n = cfg.image_grid * cfg.image_grid
        start = len(ids) + 1
        ids += [cfg.soi_token_id] + [cfg.mask_token_id] * n + \
            [cfg.eoi_token_id]
        return np.asarray(ids, np.int32), start, n
    if task in ("t2s", "s2s", "v2s", "t2s_fixed", "t2s_mmu_like"):
        n = cfg.t2s_token_length
        start = len(ids) + 1
        ids += [cfg.soa_token_id] + [cfg.mask_token_id] * n + \
            [cfg.eoa_token_id]
        return np.asarray(ids, np.int32), start, n
    # text tasks: region appended by the caller (gen_len chosen there)
    return np.asarray(ids, np.int32), len(ids), 0


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def _gumbel_sample(logits: jnp.ndarray, temperature: float,
                   key) -> jnp.ndarray:
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(key, logits.shape, jnp.float32,
                           1e-20, 1.0) + 1e-20) + 1e-20)
    return jnp.argmax(logits / temperature + g, axis=-1)


def _cfg_logits(params, cfg, ids, prompt_len: int, cfg_scale: float):
    """LLaDA-style CFG: the uncond branch re-masks the prompt;
    l = un + (s + 1)(l − un)."""
    logits = dynin_forward(params, cfg, ids)
    if cfg_scale <= 0:
        return logits
    un_ids = jnp.where(jnp.arange(ids.shape[0]) < prompt_len,
                       cfg.mask_token_id, ids)
    un = dynin_forward(params, cfg, un_ids)
    return un + (cfg_scale + 1.0) * (logits - un)


def num_transfer_tokens(mask_count: int, steps: int) -> np.ndarray:
    """LLaDA per-step transfer schedule: even split, remainder to the
    first steps."""
    base = mask_count // steps
    out = np.full((steps,), base, np.int64)
    out[:mask_count % steps] += 1
    return out


def mmu_generate(params: Params, cfg: DyninConfig,
                 prompt_ids: np.ndarray, gen_len: int = 128,
                 steps: int = 64, block_length: int = 32,
                 temperature: float = 0.0, cfg_scale: float = 0.0,
                 remasking: str = "low_confidence",
                 seed: int = 0) -> np.ndarray:
    """Block-wise masked-diffusion text generation (LLaDA mmu
    semantics). Text logits only (image/audio vocab slices masked
    out)."""
    p_len = len(prompt_ids)
    x = np.concatenate([prompt_ids,
                        np.full((gen_len,), cfg.mask_token_id,
                                np.int32)])
    n_blocks = max(gen_len // block_length, 1)
    steps_per = max(steps // n_blocks, 1)
    key = jax.random.PRNGKey(seed)
    fwd = jax.jit(lambda p, i: _cfg_logits(p, cfg, i, p_len,
                                           cfg_scale))
    vocab_mask = np.zeros((cfg.vocab_size,), np.float32)
    vocab_mask[cfg.text_vocab_size:] = -1e30  # text-only slices
    for b in range(n_blocks):
        b0 = p_len + b * block_length
        b1 = p_len + (b + 1) * block_length
        transfer = num_transfer_tokens(block_length, steps_per)
        for s in range(steps_per):
            key, k1, k2 = jax.random.split(key, 3)
            logits = np.asarray(fwd(params, jnp.asarray(x))) + \
                vocab_mask[None]
            mask_idx = x == cfg.mask_token_id
            x0 = np.asarray(_gumbel_sample(jnp.asarray(logits),
                                           temperature, k1))
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits),
                                              axis=-1))
            conf = probs[np.arange(len(x)), x0]
            if remasking == "random":
                conf = np.asarray(jax.random.uniform(
                    k2, (len(x),), jnp.float32))
            conf = np.where(mask_idx, conf, -np.inf)
            conf[:b0] = -np.inf
            conf[b1:] = -np.inf
            k = int(transfer[s])
            if k <= 0:
                continue
            pick = np.argsort(-conf)[:k]
            pick = pick[conf[pick] > -np.inf]
            x[pick] = x0[pick]
        if np.all(x[b0:b1] == cfg.eot_token_id):
            break
    return x[p_len:p_len + gen_len]


def mmu_generate_fastdllm_v1(params: Params, cfg: DyninConfig,
                             prompt_ids: np.ndarray,
                             gen_len: int = 128,
                             block_length: int = 32,
                             threshold: float = 0.9,
                             temperature: float = 0.0,
                             cfg_scale: float = 0.0,
                             seed: int = 0,
                             max_iters: int = 64) -> np.ndarray:
    """Fast-dLLM v1 parallel decoding: per block, each iteration
    commits EVERY masked position whose confidence clears the
    threshold (always at least the most-confident one), looping until
    the block has no masks."""
    p_len = len(prompt_ids)
    x = np.concatenate([prompt_ids,
                        np.full((gen_len,), cfg.mask_token_id,
                                np.int32)])
    key = jax.random.PRNGKey(seed)
    fwd = jax.jit(lambda p, i: _cfg_logits(p, cfg, i, p_len,
                                           cfg_scale))
    vocab_mask = np.zeros((cfg.vocab_size,), np.float32)
    vocab_mask[cfg.text_vocab_size:] = -1e30
    n_blocks = max(gen_len // block_length, 1)
    for b in range(n_blocks):
        b0 = p_len + b * block_length
        b1 = p_len + (b + 1) * block_length
        for _ in range(max_iters):
            if not np.any(x[b0:b1] == cfg.mask_token_id):
                break
            key, k1 = jax.random.split(key)
            logits = np.asarray(fwd(params, jnp.asarray(x))) + \
                vocab_mask[None]
            x0 = np.asarray(_gumbel_sample(jnp.asarray(logits),
                                           temperature, k1))
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits),
                                              axis=-1))
            conf = probs[np.arange(len(x)), x0]
            mask_idx = (x == cfg.mask_token_id)
            mask_idx[:b0] = False
            mask_idx[b1:] = False
            conf = np.where(mask_idx, conf, -np.inf)
            commit = mask_idx & (conf >= threshold)
            if not commit.any():
                commit[np.argmax(conf)] = True
            x[commit] = x0[commit]
    return x[p_len:p_len + gen_len]


def maskgit_generate(params: Params, cfg: DyninConfig,
                     ids: np.ndarray, start: int, n: int,
                     vocab_lo: int, vocab_hi: int, steps: int = 12,
                     temperature: float = 1.0, cfg_scale: float = 0.0,
                     seed: int = 0) -> np.ndarray:
    """MaskGIT cosine-schedule parallel decode over one vocab slice
    (t2i_generate / t2s_generate role): per step keep the
    most-confident predictions, re-mask the rest with
    mask_by_random_topk noise."""
    x = ids.copy()
    key = jax.random.PRNGKey(seed)
    fwd = jax.jit(lambda p, i: _cfg_logits(p, cfg, i, start,
                                           cfg_scale))
    vocab_mask = np.full((cfg.vocab_size,), -1e30, np.float32)
    vocab_mask[vocab_lo:vocab_hi] = 0.0
    region = slice(start, start + n)
    for s in range(steps):
        key, k1, k2 = jax.random.split(key, 3)
        logits = np.asarray(fwd(params, jnp.asarray(x))) + \
            vocab_mask[None]
        x0 = np.asarray(_gumbel_sample(jnp.asarray(logits),
                                       temperature, k1))
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits),
                                          axis=-1))
        conf = probs[np.arange(len(x)), x0]
        still_masked = x[region] == cfg.mask_token_id
        cur = np.where(still_masked, x0[region], x[region])
        ratio = (s + 1) / steps
        mask_len = int(np.floor(n * math.cos(math.pi / 2 * ratio)))
        mask_len = min(max(mask_len, 0), int(still_masked.sum()) - 1)
        if s == steps - 1 or mask_len <= 0:
            x[region] = cur
            continue
        c = np.where(still_masked, conf[region], np.inf)
        # mask_by_random_topk: gumbel-perturbed confidence, lowest
        # mask_len go back to MASK
        noise = np.asarray(-jnp.log(-jnp.log(jax.random.uniform(
            k2, (n,), jnp.float32, 1e-20, 1.0) + 1e-20) + 1e-20))
        c = c + temperature * (1.0 - ratio) * noise
        order = np.argsort(c)
        remask = order[:mask_len]
        cur[remask] = cfg.mask_token_id
        x[region] = cur
    return x[region] - vocab_lo


def t2i_generate(params, cfg, prompt_ids, **kw):
    ids, start, n = build_dynin_prompt(cfg, "t2i", list(prompt_ids))
    codes = maskgit_generate(params, cfg, ids, start, n,
                             cfg.image_offset,
                             cfg.image_offset +
                             cfg.image_codebook_size, **kw)
    return codes.reshape(cfg.image_grid, cfg.image_grid)


def t2s_generate(params, cfg, prompt_ids, **kw):
    ids, start, n = build_dynin_prompt(cfg, "t2s", list(prompt_ids))
    return maskgit_generate(params, cfg, ids, start, n,
                            cfg.audio_offset,
                            cfg.audio_offset +
                            cfg.audio_codebook_size, **kw)


TASK_TO_GENERATE_FN = {
    "t2i": "t2i_generate", "i2i": "t2i_generate",
    "t2s": "t2s_generate", "s2s": "t2s_generate",
    "v2s": "t2s_generate", "t2s_fixed": "t2s_generate",
    "t2s_mmu_like": "t2s_generate",
    "mmu": "mmu_generate", "t2t": "mmu_generate",
    "s2t": "mmu_generate", "v2t": "mmu_generate",
    "mmu_fast": "mmu_generate_fastdllm_v1",
    "mmu_fastdllm_v1": "mmu_generate_fastdllm_v1",
}


# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def init_dynin_params(cfg: DyninConfig, dtype=jnp.bfloat16) -> Params:
    hs, im, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim

    def lin(cin, cout):
        return {"w": jnp.zeros((cin, cout), dtype)}

    def layer():
        p = {
            "q_proj": lin(hs, cfg.num_heads * d),
            "k_proj": lin(hs, cfg.num_kv_heads * d),
            "v_proj": lin(hs, cfg.num_kv_heads * d),
            "o_proj": lin(cfg.num_heads * d, hs),
            "gate_proj": lin(hs, im), "up_proj": lin(hs, im),
            "down_proj": lin(im, hs),
            "input_norm": jnp.ones((hs,), dtype),
            "post_norm": jnp.ones((hs,), dtype),
        }
        if cfg.qk_norm:
            p["q_norm"] = jnp.ones((d,), dtype)
            p["k_norm"] = jnp.ones((d,), dtype)
        return p

    return {
        "embed": jnp.zeros((cfg.vocab_size, hs), dtype),
        "layers": [layer() for _ in range(cfg.num_layers)],
        "norm": jnp.ones((hs,), dtype),
        "lm_head": lin(hs, cfg.vocab_size),
    }


_LIN = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
        "up_proj", "down_proj"}
_NORM = {"input_layernorm": "input_norm",
         "post_attention_layernorm": "post_norm"}


def assign_dynin_tensor(params: Params, name: str, arr,
                        dtype) -> bool:
    a = np.asarray(arr)
    parts = name.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    if parts[:2] == ["embed_tokens", "weight"]:
        params["embed"] = jnp.asarray(a, dtype)
        return True
    if parts[0] == "lm_head" and parts[-1] == "weight":
        params["lm_head"]["w"] = jnp.asarray(a.T, dtype)
        return True
    if parts[0] == "norm" and parts[-1] == "weight":
        params["norm"] = jnp.asarray(a, dtype)
        return True
    if parts[0] != "layers":
        return False
    layer = params["layers"][int(parts[1])]
    rest = parts[2:]
    if rest[0] == "self_attn":
        if rest[1] in _LIN:
            layer[rest[1]]["w"] = jnp.asarray(a.T, dtype)
            return True
        if rest[1] in ("q_norm", "k_norm") and rest[-1] == "weight":
            layer[rest[1]] = jnp.asarray(a, dtype)
            return True
        return False
    if rest[0] == "mlp" and rest[1] in _LIN:
        layer[rest[1]]["w"] = jnp.asarray(a.T, dtype)
        return True
    if rest[0] in _NORM and rest[-1] == "weight":
        layer[_NORM[rest[0]]] = jnp.asarray(a, dtype)
        return True
    return False


def load_dynin(path: str, dtype=jnp.bfloat16
               ) -> tuple[DyninConfig, Params]:
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import _collect_safetensor_files

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = DyninConfig.from_json(hf)
    params = init_dynin_params(cfg, dtype)
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                if assign_dynin_tensor(params, name, arr, dtype):
                    loaded += 1
                else:
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no dynin tensors mapped from {path}")
    if skipped:
        logger.warning("dynin: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("dynin: %d tensors loaded", loaded)
    return cfg, params


class DyninOmni:
    """Task-routed front door (reference DyninOmniToken2Text
    _generate_token_ids:661 dispatch)."""

    def __init__(self, path: str, dtype=jnp.bfloat16) -> None:
        self.cfg, self.params = load_dynin(path, dtype)
        self.tokenizer = None
        try:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(path)
        except Exception:  # noqa: BLE001
            pass

    def _ids(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text)["input_ids"])
        lo, span = 8, max(self.cfg.text_vocab_size - 300, 1)
        return [lo + (b * 2654435761 + i) % span
                for i, b in enumerate(text.encode() or b"\0")]

    def generate(self, task: str, text: str, **kw) -> np.ndarray:
        fn_name = TASK_TO_GENERATE_FN.get(task, "mmu_generate")
        ids = np.asarray(self._ids(text), np.int32)
        if fn_name == "t2i_generate":
            return t2i_generate(self.params, self.cfg, ids, **kw)
        if fn_name == "t2s_generate":
            return t2s_generate(self.params, self.cfg, ids, **kw)
        if fn_name == "mmu_generate_fastdllm_v1":
            return mmu_generate_fastdllm_v1(self.params, self.cfg,
                                            ids, **kw)
        return mmu_generate(self.params, self.cfg, ids, **kw)
