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

# qwen_image conditioning prompt (reference
# pipeline_qwen_image.py:300-301): the Qwen2.5-VL tower runs this chat
# template around the user prompt; the first 34 tokens (the fixed
# system/user scaffold) are dropped from the hidden states.
_QWEN_IMAGE_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, "
    "shape, size, texture, quantity, text, spatial relationships of "
    "the objects and background:<|im_end|>\n<|im_start|>user\n{}"
    "<|im_end|>\n<|im_start|>assistant\n")
_QWEN_IMAGE_DROP_IDX = 34

# flux2's Mistral3 encode runs a system+user conversation
# (pipeline_flux2.py:404-447; the exact creative system message ships
# with diffusers' flux2 pipeline — not vendorable here, so it is a
# config knob: set PromptEncoder.flux2_system_message, or the
# `text_encoder_system_message` field of the stage YAML, to the
# checkpoint card's string when serving a real FLUX.2 checkpoint).
_FLUX2_DEFAULT_SYSTEM_MESSAGE = (
    "You are an AI that converts user requests into detailed image "
    "descriptions for an image generation model.")
# intermediate layers whose hidden states form the conditioning
# (pipeline_flux2.py:414 hidden_states_layers=(10, 20, 30) — written
# for the 40-layer Mistral3-Small tower; smaller towers scale the
# same 1/4 / 1/2 / 3/4 depth fractions)
_FLUX2_LAYERS = (10, 20, 30)


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
        self.flux2_system_message = _FLUX2_DEFAULT_SYSTEM_MESSAGE
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

                t = AutoTokenizer.from_pretrained(path, subfolder=tok)
                if t.pad_token is None:  # LLM towers often ship none
                    t.pad_token = t.eos_token
                self.tokenizers[slot] = t
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

    # -- LLM towers ----------------------------------------------------------

    def _run_llm(self, slot: str, text: str, max_len: int,
                 collect: tuple) -> tuple[dict, int]:
        """Tokenize (right-padded to the static max_len bucket) and run
        the tower → ({hidden_states_index: [1, max_len, H] fp32},
        num_valid_tokens)."""
        from vllm_omni_tpu.diffusion.text_encoder import llm_hidden_states

        _, cfg, params = self.encoders[slot]
        tok = self.tokenizers[slot]
        tok.padding_side = "right"  # causal prefix stays exact
        out = tok(text, padding="max_length", max_length=max_len,
                  truncation=True, return_tensors="np")
        ids = out["input_ids"].astype(np.int32)
        mask = out.get("attention_mask",
                       np.ones_like(out["input_ids"]))
        hs = llm_hidden_states(params, cfg, jnp.asarray(ids), collect,
                               mask=jnp.asarray(mask))
        return ({k: np.asarray(v, np.float32) for k, v in hs.items()},
                int(mask.sum()))

    def _chat_text(self, slot: str, messages: list, **kw) -> str:
        """apply_chat_template when the tokenizer ships one; otherwise
        a plain role-prefixed fallback (tiny test tokenizers)."""
        tok = self.tokenizers[slot]
        if getattr(tok, "chat_template", None):
            return tok.apply_chat_template(messages, tokenize=False,
                                           **kw)
        parts = []
        for m in messages:
            c = m["content"]
            if isinstance(c, list):
                c = "".join(x.get("text", "") for x in c)
            parts.append(f"{m['role']}: {c}")
        if kw.get("add_generation_prompt"):
            parts.append("assistant: ")
        return "\n".join(parts)

    def _encode_qwen_image(self, slot: str, prompt: str,
                           text_len: int) -> dict:
        """Final-layer hidden states of the templated prompt with the
        34-token scaffold dropped (pipeline_qwen_image.py:386-416)."""
        _, cfg, _ = self.encoders[slot]
        n = cfg.num_layers
        txt = _QWEN_IMAGE_TEMPLATE.format(prompt)
        hs, valid = self._run_llm(slot, txt,
                                  text_len + _QWEN_IMAGE_DROP_IDX, (n,))
        drop = min(_QWEN_IMAGE_DROP_IDX, max(valid - 1, 0))
        emb = hs[n][:, drop:valid]
        return {"text_states": emb, "pooled": None}

    def _encode_flux2(self, slot: str, prompt: str,
                      text_len: int) -> dict:
        """Mistral3 conversation encode: stack intermediate layers'
        hidden states on channels (pipeline_flux2.py:404-452; layer
        picks scale to the tower depth — see _FLUX2_LAYERS)."""
        _, cfg, _ = self.encoders[slot]
        n = cfg.num_layers
        ks = _FLUX2_LAYERS if n >= max(_FLUX2_LAYERS) + 1 else \
            (max(1, n // 4), max(1, n // 2), max(1, 3 * n // 4))
        messages = [
            {"role": "system", "content": [
                {"type": "text", "text": self.flux2_system_message}]},
            {"role": "user", "content": [
                {"type": "text", "text": prompt.replace("[IMG]", "")}]},
        ]
        txt = self._chat_text(slot, messages,
                              add_generation_prompt=False)
        hs, _ = self._run_llm(slot, txt, min(text_len, 512), tuple(ks))
        # stack(dim=1) + permute + reshape == channel concat per token
        emb = np.concatenate([hs[k] for k in ks], axis=-1)
        return {"text_states": emb, "pooled": None}

    def _encode_z_image(self, slot: str, prompt: str,
                        text_len: int) -> dict:
        """hidden_states[-2] of the chat-templated prompt, trimmed to
        the valid tokens (pipeline_z_image.py:255-290)."""
        _, cfg, _ = self.encoders[slot]
        n = cfg.num_layers
        txt = self._chat_text(
            slot, [{"role": "user", "content": prompt}],
            add_generation_prompt=True, enable_thinking=True)
        hs, valid = self._run_llm(slot, txt, text_len, (n - 1,))
        return {"text_states": hs[n - 1][:, :max(valid, 1)],
                "pooled": None}

    def _encode_llm_generic(self, slot: str, prompt: str,
                            text_len: int) -> dict:
        """Unmapped family with an LLM tower: final normed hidden
        states of the raw prompt, mask-trimmed."""
        _, cfg, _ = self.encoders[slot]
        n = cfg.num_layers
        hs, valid = self._run_llm(slot, prompt, text_len, (n,))
        return {"text_states": hs[n][:, :max(valid, 1)], "pooled": None}

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
        llm_slots = [s for s in _SLOTS if kinds.get(s) == "llm"]
        if llm_slots:
            s = llm_slots[0]
            if family.startswith("qwen_image"):
                return self._encode_qwen_image(s, prompt, text_len)
            if family.startswith("flux2"):
                return self._encode_flux2(s, prompt, text_len)
            if family == "z_image":
                return self._encode_z_image(s, prompt, text_len)
            return self._encode_llm_generic(s, prompt, text_len)
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
