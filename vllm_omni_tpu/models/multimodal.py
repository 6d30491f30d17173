"""Multimodal input processing: encoder runs + placeholder fusion.

Reference parity: the upstream InputProcessor the reference runs for
stage-0 tokenization/mm-preprocessing (async_omni_engine.py add_request →
InputProcessor.process_inputs) plus the omni models' placeholder-token
fusion (audio/image placeholder runs in the prompt are replaced by
encoder features).

TPU design: encoders are one-shot jit programs at add-request time; the
fusion itself happens inside the prefill program — the request carries
the feature rows + a per-token mask, and the runner selects
feature-vs-embedding per position (no host-side embed-table pull).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.encoders import (AudioEncoderConfig,
                                           VisionEncoderConfig,
                                           audio_encoder_forward,
                                           init_audio_encoder,
                                           init_vision_encoder,
                                           vision_encoder_forward)

logger = init_logger(__name__)


class MMProcessor:
    """Runs modality encoders and builds (prompt_embeds,
    embeds_token_mask) for placeholder fusion."""

    def __init__(self, hidden_size: int, spec: dict[str, Any],
                 dtype=jnp.float32, seed: int = 0) -> None:
        self.hidden_size = hidden_size
        self.audio_token_id: Optional[int] = spec.get("audio_token_id")
        self.image_token_id: Optional[int] = spec.get("image_token_id")
        key = jax.random.PRNGKey(seed)
        ka, kv = jax.random.split(key)
        self.audio_cfg = self.audio_params = None
        self.vision_cfg = self.vision_params = None
        if "audio" in spec:
            aspec = dict(spec["audio"])
            weights = aspec.pop("weights_path", None)
            if weights:
                # real checkpoint (whisper / qwen-audio tower naming)
                from vllm_omni_tpu.models.encoders import \
                    load_whisper_audio_encoder

                self.audio_cfg, self.audio_params = \
                    load_whisper_audio_encoder(weights, dtype=dtype)
                logger.info("audio encoder loaded from %s (%d layers, "
                            "h=%d)", weights, self.audio_cfg.num_layers,
                            self.audio_cfg.hidden_size)
            else:
                self.audio_cfg = AudioEncoderConfig(
                    output_dim=hidden_size, **aspec)
                self.audio_params = init_audio_encoder(self.audio_cfg,
                                                       ka, dtype)
            self._audio_fn = jax.jit(
                lambda p, mel: audio_encoder_forward(p, self.audio_cfg,
                                                     mel))
        if "vision" in spec:
            vspec = dict(spec["vision"])
            weights = vspec.pop("weights_path", None)
            if weights:
                self._load_vision_weights(weights, dtype)
            else:
                self.vision_cfg = VisionEncoderConfig(
                    output_dim=hidden_size, **vspec)
                self.vision_params = init_vision_encoder(self.vision_cfg,
                                                         kv, dtype)
                self._vision_fn = jax.jit(
                    lambda p, px: vision_encoder_forward(
                        p, self.vision_cfg, px))

    def _load_vision_weights(self, weights: str, dtype) -> None:
        """Real vision tower by checkpoint shape: Qwen2-VL style
        (blocks.N.attn.qkv, 2D rope, PatchMerger) or CLIP-style ViT."""
        from vllm_omni_tpu.models.encoders import _read_safetensors

        names = set(_read_safetensors(weights))
        is_qwen2vl = any("attn.qkv.weight" in n for n in names)
        if is_qwen2vl:
            from vllm_omni_tpu.models.qwen2vl_vision import (
                load_qwen2vl_vision_encoder, qwen2vl_vision_forward)

            self.vision_cfg, self.vision_params = \
                load_qwen2vl_vision_encoder(weights, dtype=dtype)
            cfg = self.vision_cfg
            self._vision_fn = jax.jit(jax.vmap(
                lambda p, px: qwen2vl_vision_forward(p, cfg, px),
                in_axes=(None, 0)))
            logger.info("qwen2vl vision tower loaded from %s (%d "
                        "blocks, d=%d)", weights, cfg.depth,
                        cfg.embed_dim)
        else:
            from vllm_omni_tpu.models.encoders import \
                load_clip_vision_encoder

            self.vision_cfg, self.vision_params = \
                load_clip_vision_encoder(weights, dtype=dtype)
            cfg = self.vision_cfg
            self._vision_fn = jax.jit(
                lambda p, px: vision_encoder_forward(p, cfg, px))
            logger.info("CLIP vision tower loaded from %s (%d layers, "
                        "h=%d)", weights, cfg.num_layers,
                        cfg.hidden_size)

    def encode_audio(self, mel: np.ndarray) -> np.ndarray:
        """mel [T, n_mels] or [B, T, n_mels] → [N, hidden]."""
        if self.audio_params is None:
            raise ValueError("no audio encoder configured")
        if mel.ndim == 1:  # flat f32 stream (realtime WS) → [T, n_mels]
            n = (mel.size // self.audio_cfg.n_mels) * \
                self.audio_cfg.n_mels
            if n == 0:
                raise ValueError(
                    f"audio too short: {mel.size} samples < one "
                    f"{self.audio_cfg.n_mels}-dim frame")
            mel = mel[:n].reshape(-1, self.audio_cfg.n_mels)
        if mel.ndim == 2:
            mel = mel[None]
        out = self._audio_fn(self.audio_params, jnp.asarray(mel))
        return np.asarray(out).reshape(-1, out.shape[-1])

    def encode_image(self, pixels: np.ndarray) -> np.ndarray:
        """pixels [H, W, 3] or [B, H, W, 3] → [N, hidden]."""
        if self.vision_params is None:
            raise ValueError("no vision encoder configured")
        if pixels.ndim == 3:
            pixels = pixels[None]
        out = self._vision_fn(self.vision_params, jnp.asarray(pixels))
        return np.asarray(out).reshape(-1, out.shape[-1])

    def feature_rows(self, modality: str, data: np.ndarray) -> int:
        """How many placeholder tokens one input occupies — the number
        of encoder feature rows (serving handlers splice this many
        `<modality>_token_id`s into the prompt; reference serving_chat
        placeholder expansion)."""
        data = np.asarray(data)
        if modality == "audio":
            if self.audio_cfg is None:
                raise ValueError("no audio encoder configured")
            t = (data.size // self.audio_cfg.n_mels
                 if data.ndim == 1 else data.shape[-2])
            sub = self.audio_cfg.subsample
            return -(-t // sub)
        if modality == "image":
            if self.vision_cfg is None:
                raise ValueError("no vision encoder configured")
            h, w = data.shape[-3], data.shape[-2]
            cfg = self.vision_cfg
            gh, gw = h // cfg.patch_size, w // cfg.patch_size
            m = getattr(cfg, "merge_size",
                        getattr(cfg, "spatial_merge_size", 1))
            n = (gh // m) * (gw // m) if m > 1 else gh * gw
            return n + (1 if getattr(cfg, "use_cls_token", False)
                        else 0)
        raise ValueError(modality)

    def compute_mrope_positions(self, prompt_token_ids: list[int]
                                ) -> tuple[np.ndarray, int]:
        """[3, T] (time/height/width) position ids + decode delta
        (vLLM MRotaryEmbedding get_input_positions semantics): text
        tokens advance all streams together; an image placeholder run of
        n=gh·gw tokens keeps time constant with (h, w) grid ids; audio
        runs advance time per frame."""
        toks = np.asarray(prompt_token_ids)
        t = len(toks)
        pos = np.zeros((3, t), np.int64)
        cur = 0  # next position value (max so far + 1)
        i = 0
        while i < t:
            tok = int(toks[i])
            if self.image_token_id is not None and \
                    tok == self.image_token_id:
                n = 1
                while i + n < t and int(toks[i + n]) == \
                        self.image_token_id:
                    n += 1
                gh = int(np.sqrt(n))
                while gh > 1 and n % gh:
                    gh -= 1
                gw = n // gh
                hh = np.repeat(np.arange(gh), gw)
                ww = np.tile(np.arange(gw), gh)
                pos[0, i:i + n] = cur
                pos[1, i:i + n] = cur + hh
                pos[2, i:i + n] = cur + ww
                cur = int(pos[:, i:i + n].max()) + 1
                i += n
            elif self.audio_token_id is not None and \
                    tok == self.audio_token_id:
                n = 1
                while i + n < t and int(toks[i + n]) == \
                        self.audio_token_id:
                    n += 1
                rng = cur + np.arange(n)
                pos[:, i:i + n] = rng
                cur = int(rng.max()) + 1
                i += n
            else:
                pos[:, i] = cur
                cur += 1
                i += 1
        return pos.astype(np.int32), cur - t

    def process(self, prompt_token_ids: list[int],
                mm_inputs: dict[str, Any]
                ) -> tuple[np.ndarray, np.ndarray]:
        """→ (prompt_embeds [T, H] f32 — feature rows at placeholder
        positions, zeros elsewhere; embeds_token_mask [T] bool)."""
        toks = np.asarray(prompt_token_ids)
        t = len(toks)
        embeds = np.zeros((t, self.hidden_size), np.float32)
        mask = np.zeros((t,), bool)
        for modality, token_id, encode in (
                ("audio", self.audio_token_id, self.encode_audio),
                ("image", self.image_token_id, self.encode_image)):
            data = mm_inputs.get(modality)
            if data is None:
                continue
            if token_id is None:
                raise ValueError(f"no {modality}_token_id configured")
            positions = np.where(toks == token_id)[0]
            if len(positions) == 0:
                raise ValueError(
                    f"{modality} input given but no placeholder token "
                    f"{token_id} in prompt")
            items = data if isinstance(data, list) else [data]
            feats = np.concatenate(
                [encode(np.asarray(d)) for d in items], axis=0)
            if len(positions) != feats.shape[0]:
                raise ValueError(
                    f"{modality}: {len(positions)} placeholder tokens vs "
                    f"{feats.shape[0]} encoder features")
            embeds[positions] = feats
            mask[positions] = True
        return embeds, mask
