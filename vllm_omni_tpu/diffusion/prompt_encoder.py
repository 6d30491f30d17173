"""Per-family prompt encoding with the pipeline's own text towers.

Reference parity: each reference pipeline encodes prompts with the
checkpoint's shipped encoders — flux `encode_prompt` runs CLIP (pooled)
+ T5 (sequence) (models/flux/pipeline_flux.py), sd3 runs CLIP-L +
CLIP-G + T5 and concatenates, wan2_2 runs UMT5-XXL
(models/wan2_2/pipeline_wan2_2.py), qwen_image runs Qwen2.5-VL
(pipeline_qwen_image.py:418 — served here by the AR stage instead).

This module discovers `text_encoder*` / `tokenizer*` subfolders in a
diffusers pipeline dir, loads the towers through
diffusion/text_encoder.py (T5/UMT5/CLIP in JAX), and composes the
family's conditioning. When no tower is loadable the pipeline falls
back to the hash embedding (dummy/bench tier) — loudly logged.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

_SLOTS = ("text_encoder", "text_encoder_2", "text_encoder_3")


class PromptEncoder:
    """Tokenize + encode prompts for one loaded diffusion pipeline."""

    def __init__(self, path: str, dtype=jnp.bfloat16) -> None:
        from vllm_omni_tpu.diffusion.loader import read_model_index
        from vllm_omni_tpu.diffusion.text_encoder import load_text_encoder

        self.path = path
        self.dtype = dtype
        self.encoders: dict[str, tuple] = {}
        self.tokenizers: dict[str, Any] = {}
        self._cache: dict[tuple, dict] = {}
        try:
            index = read_model_index(path)
        except (OSError, ValueError):  # HF-layout dir (no model_index)
            index = {}
        for slot in _SLOTS:
            if not isinstance(index.get(slot), (list, tuple)):
                continue
            try:
                self.encoders[slot] = load_text_encoder(path, slot,
                                                        dtype)
            except (FileNotFoundError, ValueError, KeyError) as e:
                logger.info("%s: not loadable (%s)", slot, e)
        for slot, enc in self.encoders.items():
            tok = "tokenizer" + slot[len("text_encoder"):]
            try:
                from transformers import AutoTokenizer

                self.tokenizers[slot] = AutoTokenizer.from_pretrained(
                    path, subfolder=tok)
            except Exception as e:  # noqa: BLE001 — HF raises broadly
                logger.warning("%s: tokenizer %s not loadable (%s)",
                               slot, tok, e)
        # an encoder without its tokenizer can't serve prompts
        self.encoders = {s: v for s, v in self.encoders.items()
                         if s in self.tokenizers}

    @property
    def available(self) -> bool:
        return bool(self.encoders)

    # -- single towers -------------------------------------------------------

    def _ids(self, slot: str, prompt: str, max_len: int):
        tok = self.tokenizers[slot]
        out = tok(prompt, padding="max_length", max_length=max_len,
                  truncation=True, return_tensors="np")
        return out["input_ids"].astype(np.int32), \
            out.get("attention_mask",
                    np.ones_like(out["input_ids"])).astype(np.int32)

    def _run_t5(self, slot: str, prompt: str, max_len: int) -> np.ndarray:
        from vllm_omni_tpu.diffusion.text_encoder import t5_encode

        _, cfg, params = self.encoders[slot]
        ids, mask = self._ids(slot, prompt, max_len)
        seq = t5_encode(params, cfg, jnp.asarray(ids),
                        jnp.asarray(mask))
        # zero padded positions like the reference pipelines do before
        # feeding the DiT (prompt_embeds * mask)
        return np.asarray(seq, np.float32) * mask[..., None]

    def _run_clip(self, slot: str, prompt: str,
                  max_len: int = 77) -> tuple:
        from vllm_omni_tpu.diffusion.text_encoder import clip_text_encode

        _, cfg, params = self.encoders[slot]
        ids, _ = self._ids(slot, prompt,
                           min(cfg.max_position_embeddings, 77, max_len))
        seq, pooled = clip_text_encode(params, cfg, jnp.asarray(ids))
        return np.asarray(seq, np.float32), \
            np.asarray(pooled, np.float32)

    # -- family composition --------------------------------------------------

    def encode(self, prompt: str, family: str,
               text_len: int) -> dict[str, Optional[np.ndarray]]:
        """→ {"text_states": [1, T, D], "pooled": [1, P] | None}."""
        key = (prompt, family, text_len)
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        out = self._encode(prompt, family, text_len)
        if len(self._cache) >= 32:
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = out
        return out

    def _encode(self, prompt: str, family: str,
                text_len: int) -> dict[str, Optional[np.ndarray]]:
        kinds = {s: v[0] for s, v in self.encoders.items()}
        t5_slots = [s for s in _SLOTS if kinds.get(s) == "t5"]
        clip_slots = [s for s in _SLOTS if kinds.get(s) == "clip"]
        if family == "sd3" and t5_slots and clip_slots:
            # sd3: concat CLIP-L/G seq on channels, zero-pad to the T5
            # width, then concat with T5 along the sequence
            # (pipeline_stable_diffusion_3 encode_prompt)
            seqs, pools = zip(*(self._run_clip(s, prompt)
                                for s in clip_slots))
            clip_seq = np.concatenate(seqs, axis=-1)
            t5_seq = self._run_t5(t5_slots[0], prompt, text_len)
            d = t5_seq.shape[-1]
            if clip_seq.shape[-1] < d:
                clip_seq = np.pad(
                    clip_seq,
                    ((0, 0), (0, 0), (0, d - clip_seq.shape[-1])))
            text = np.concatenate([clip_seq, t5_seq], axis=1)
            return {"text_states": text,
                    "pooled": np.concatenate(pools, axis=-1)}
        if t5_slots:
            # flux/wan class: T5 sequence is the conditioning; CLIP (if
            # present) contributes only the pooled projection
            text = self._run_t5(t5_slots[0], prompt, text_len)
            pooled = None
            if clip_slots:
                _, pooled = self._run_clip(clip_slots[0], prompt)
            return {"text_states": text, "pooled": pooled}
        if clip_slots:
            seq, pooled = self._run_clip(clip_slots[0], prompt)
            return {"text_states": seq, "pooled": pooled}
        raise RuntimeError("no loadable text encoder")
