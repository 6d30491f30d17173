"""Checkpoint loading: HF config/safetensors → decoder param pytrees.

Reference parity: upstream vLLM's weight loader + the reference's
quantize-on-load path (reference quantization/int8_config.py:385
Int8OnlineLinearMethod — weights are quantized as they stream in, so peak
host memory stays at one tensor). Supports:

- a local HF-format directory (config.json + *.safetensors),
- the "dummy" model source: random weights from `hf_overrides` — the
  tiny-model test tier (reference SURVEY.md §4 uses random-weight HF
  checkpoints the same way).

Weight-only INT8/INT4 and FP8 quantization happen at load; the quant
method is encoded in array dtypes (see models/decoder.py `linear`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.config.engine import ModelConfig
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import DecoderConfig, init_params
from vllm_omni_tpu.ops.quant import (quantize_fp8, quantize_int4,
                                     quantize_int8)

logger = init_logger(__name__)

# HF architecture name → config feature flags
_ARCH_FLAGS = {
    "LlamaForCausalLM": {},
    "MistralForCausalLM": {},
    "Qwen2ForCausalLM": {"attention_bias": True},
    "Qwen3ForCausalLM": {"qk_norm": True},
    "Qwen2MoeForCausalLM": {"attention_bias": True, "moe": True},
    "Qwen3MoeForCausalLM": {"qk_norm": True, "moe": True},
    # Omni text towers reuse the qwen3(-moe) block structure (reference
    # model_executor/models/qwen3_omni/)
    "Qwen3OmniMoeForConditionalGeneration": {"qk_norm": True, "moe": True},
    # GLM-4 family: sandwich norms (4 per layer), partial rotary with
    # the glm4 hybrid application, qkv bias. GLM-Image's AR text core
    # is this architecture + M-RoPE (reference glm_image_ar.py:1873).
    "Glm4ForCausalLM": {"sandwich_norm": True, "glm4_rope": True,
                        "attention_bias": True},
    # HunYuan MoE (HunyuanImage3's AR backbone, reference
    # hunyuan_image3.py:91 HunyuanModel(HunYuanModel)): per-head qk
    # norms (query/key_layernorm naming), softmax top-k routing with
    # renorm, always-on UNGATED shared MLP
    "HunYuanMoEV1ForCausalLM": {"qk_norm": True, "moe": True,
                                "hunyuan": True},
    "GlmImageForConditionalGeneration": {"sandwich_norm": True,
                                         "glm4_rope": True,
                                         "attention_bias": True},
    # Qwen2.5-VL TEXT tower (the reference qwen_image pipeline's text
    # encoder, pipeline_qwen_image.py:418 encode_prompt): qwen2 block
    # with qkv bias; vision tower (visual.*) is skipped — the serving
    # graph encodes text prompts only, image conditioning rides the
    # diffusion stage's latent stream
    "Qwen2_5_VLForConditionalGeneration": {"attention_bias": True,
                                           "vl_text": True},
    # Mistral3 (flux2/flux2_klein's text encoder,
    # pipeline_flux2.py:371 Mistral3ForConditionalGeneration): plain
    # mistral decoder nested under text_config; the Pixtral vision
    # tower (vision_tower.*/multi_modal_projector.*) is skipped — the
    # diffusion side encodes text prompts only
    "Mistral3ForConditionalGeneration": {"vl_text": True},
}

# composite-checkpoint prefixes that are not part of the text decoder
_SKIP_PREFIXES = ("visual.", "model.visual.", "vision_tower.",
                  "model.vision_tower.", "multi_modal_projector.",
                  "model.multi_modal_projector.")


def flatten_text_config(hf: dict[str, Any]) -> dict[str, Any]:
    """VL composites (Qwen2.5-VL, Mistral3) nest the decoder fields
    under ``text_config`` — flatten them so hf_config_to_decoder_config
    sees a plain decoder config, keeping the composite architecture
    name so its flags apply."""
    arch0 = (hf.get("architectures") or
             (hf.get("text_config") or {}).get("architectures")
             or [""])[0]
    if isinstance(hf.get("text_config"), dict) and (
            _ARCH_FLAGS.get(arch0, {}).get("vl_text") or
            hf.get("model_type") in ("qwen2_5_vl", "mistral3")):
        hf = {**hf["text_config"],
              **{k: v for k, v in hf.items() if k != "text_config"}}
        if arch0 == "Mistral3ForConditionalGeneration" or \
                hf.get("model_type") == "mistral3":
            hf["architectures"] = ["Mistral3ForConditionalGeneration"]
        else:
            hf["architectures"] = ["Qwen2_5_VLForConditionalGeneration"]
    return hf


def _scalar(v):
    """HunYuan configs store some MoE knobs as per-layer lists; our
    decoder is homogeneous — take the first entry."""
    if isinstance(v, (list, tuple)):
        return int(v[0]) if v else 0
    return int(v) if v is not None else 0


def hf_config_to_decoder_config(hf: dict[str, Any]) -> DecoderConfig:
    arch = (hf.get("architectures") or ["LlamaForCausalLM"])[0]
    if arch not in _ARCH_FLAGS:
        raise ValueError(
            f"unsupported architecture {arch!r}; known: "
            f"{sorted(_ARCH_FLAGS)}")
    flags = _ARCH_FLAGS[arch]
    num_heads = hf["num_attention_heads"]
    head_dim = hf.get("head_dim") or hf["hidden_size"] // num_heads
    return DecoderConfig(
        vocab_size=hf["vocab_size"],
        hidden_size=hf["hidden_size"],
        intermediate_size=hf.get("intermediate_size", 4 * hf["hidden_size"]),
        num_layers=hf["num_hidden_layers"],
        num_heads=num_heads,
        num_kv_heads=hf.get("num_key_value_heads", num_heads),
        head_dim=head_dim,
        rope_theta=hf.get("rope_theta", 10000.0),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        qk_norm=flags.get("qk_norm", False),
        attention_bias=hf.get("attention_bias",
                              flags.get("attention_bias", False)),
        sandwich_norm=flags.get("sandwich_norm", False),
        glm4_rope=flags.get("glm4_rope", False),
        partial_rotary_factor=hf.get("partial_rotary_factor", 1.0),
        max_position_embeddings=hf.get("max_position_embeddings", 4096),
        mrope_section=tuple(hf["rope_scaling"]["mrope_section"])
        if isinstance(hf.get("rope_scaling"), dict)
        and hf["rope_scaling"].get("mrope_section") else None,
        num_experts=_scalar(hf.get("num_experts", 0))
        if flags.get("moe") else 0,
        num_experts_per_tok=_scalar(
            hf.get("num_experts_per_tok") or hf.get("moe_topk", 0)),
        moe_intermediate_size=_scalar(
            hf.get("moe_intermediate_size", 0)),
        norm_topk_prob=hf.get("norm_topk_prob", True),
        shared_expert_intermediate_size=_scalar(
            hf.get("shared_expert_intermediate_size")
            or (hf.get("intermediate_size", 0)
                if flags.get("hunyuan") else 0)),
    )


# ---------------------------------------------------------------------------
# Quantize-on-load
# ---------------------------------------------------------------------------

# linears quantized by weight-only schemes; embeddings/norms/router stay
# full precision (matches the reference: embeddings excluded; lm_head
# opt-in via ModelConfig.quantize_lm_head, gated on measured ppl delta)
_QUANT_LINEARS = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                  "up_proj", "down_proj", "qkv_proj", "gate_up_proj"}


def _quantize_linear(w: jnp.ndarray, method: str, group_size: int) -> dict:
    if method == "int8":
        q, s = quantize_int8(w)
    elif method == "int4":
        q, s = quantize_int4(w, group_size)
    elif method == "fp8":
        q, s = quantize_fp8(w)
    else:
        raise ValueError(method)
    return {"w_q": q, "scale": s}


def quantize_params(params: dict, method: Optional[str],
                    group_size: int = 128,
                    quantize_lm_head: bool = False) -> dict:
    """Walk a full-precision param pytree and quantize eligible linears
    in place (returns the same structure)."""
    if method is None:
        return params
    targets = _QUANT_LINEARS | ({"lm_head"} if quantize_lm_head else set())

    def walk(node: Any, name: str) -> Any:
        if isinstance(node, dict):
            if name in targets and "w" in node:
                newp = _quantize_linear(node["w"], method, group_size)
                if "b" in node:
                    newp["b"] = node["b"]
                return newp
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, name) for v in node]
        return node

    return walk(params, "")


# fused-layout concat (decoder.fuse_layer_params) is re-exported here
# for loader callers
from vllm_omni_tpu.models.decoder import fuse_layer_params  # noqa: E402


def init_params_quantized(cfg: DecoderConfig, key, method: str,
                          group_size: int = 128,
                          dtype=jnp.bfloat16) -> dict:
    """Random-weight init directly in quantized storage: each linear is
    quantized the moment it's created, so peak memory stays near the
    quantized footprint (big-model benchmarks on a 16 GB chip)."""
    return init_params(cfg, key, dtype, quant=method, group_size=group_size)


# ---------------------------------------------------------------------------
# Safetensors → pytree
# ---------------------------------------------------------------------------


def _collect_safetensor_files(path: str) -> list[str]:
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    return [os.path.join(path, f) for f in files]


def _assign(params: dict, hf_name: str, value: np.ndarray, dtype,
            cfg: DecoderConfig) -> bool:
    """Map one HF tensor name into the param pytree. Linear weights are
    transposed to [in, out] (we keep x @ W layout)."""
    parts = hf_name.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    if parts and parts[0] == "language_model":
        # transformers ≥4.52 VL layout: model.language_model.layers.*
        parts = parts[1:]
        if parts and parts[0] == "model":
            # pre-4.52 layout: language_model.model.layers.*
            parts = parts[1:]

    def as_dtype(v):
        return jnp.asarray(v).astype(dtype)

    if parts[:2] == ["embed_tokens", "weight"] or \
            parts[:2] == ["codec_embedding", "weight"]:
        # codec_embedding: the talker text tower embeds codec ids
        # (qwen3_omni_moe_talker Qwen3OmniMoeTalkerModel)
        params["embed"] = as_dtype(value)
        return True
    if parts[:2] == ["norm", "weight"]:
        params["final_norm"] = as_dtype(value)
        return True
    if parts[:2] == ["lm_head", "weight"] or hf_name == "lm_head.weight":
        params["lm_head"] = {"w": as_dtype(value.T)}
        return True
    if parts[0] != "layers":
        return False
    i = int(parts[1])
    layer = params["layers"][i]
    rest = parts[2:]
    norm_map = {("input_layernorm", "weight"): "input_norm",
                ("post_attention_layernorm", "weight"): "post_norm",
                ("post_self_attn_layernorm", "weight"):
                    "post_self_attn_norm",
                ("post_mlp_layernorm", "weight"): "post_mlp_norm"}
    if tuple(rest) in norm_map:
        layer[norm_map[tuple(rest)]] = as_dtype(value)
        return True
    if rest[0] == "self_attn":
        name = rest[1]
        if name in ("q_norm", "k_norm"):
            layer[name] = as_dtype(value)
            return True
        if name in ("query_layernorm", "key_layernorm"):  # HunYuan
            layer["q_norm" if name == "query_layernorm"
                  else "k_norm"] = as_dtype(value)
            return True
        if name in ("q_proj", "k_proj", "v_proj", "o_proj"):
            slot = layer.setdefault(name, {})
            if rest[2] == "weight":
                slot["w"] = as_dtype(value.T)
            elif rest[2] == "bias":
                slot["b"] = as_dtype(value)
            return True
        return False
    if rest[0] == "mlp":
        if rest[1] in ("gate_proj", "up_proj", "down_proj",
                       "gate_up_proj"):  # GLM-4 ships gate_up fused
            layer.setdefault(rest[1], {})["w"] = as_dtype(value.T)
            return True
        if rest[1] == "gate" and rest[2] == "weight":  # MoE router
            layer["router"] = {"w": as_dtype(value.T)}
            return True
        if rest[1] == "gate" and rest[2] == "wg":  # HunYuan router
            layer["router"] = {"w": as_dtype(value.T)}
            return True
        if rest[1] == "shared_mlp":  # HunYuan ungated shared MLP
            se = layer.setdefault("shared_expert", {})
            se.setdefault(rest[2], {})["w"] = as_dtype(value.T)
            return True
        if rest[1] == "shared_expert":  # Qwen2MoE/talker shared expert
            se = layer.setdefault("shared_expert", {})
            se.setdefault(rest[2], {})["w"] = as_dtype(value.T)
            return True
        if rest[1] == "shared_expert_gate" and rest[2] == "weight":
            layer["shared_expert_gate"] = {"w": as_dtype(value.T)}
            return True
        if rest[1] == "experts":
            e = int(rest[2])
            which = {"gate_proj": "gate", "up_proj": "up",
                     "down_proj": "down"}[rest[3]]
            ex = layer.setdefault("experts", {})
            stack = ex.setdefault("_staging_" + which, {})
            stack[e] = as_dtype(value.T)
            return True
    return False


def _finalize_experts(params: dict, cfg: DecoderConfig) -> None:
    """Stack per-expert staging tensors into [E, ...] arrays."""
    for layer in params["layers"]:
        ex = layer.get("experts")
        if not isinstance(ex, dict):
            continue
        for which in ("gate", "up", "down"):
            staging = ex.pop("_staging_" + which, None)
            if staging is not None:
                ex[which] = jnp.stack(
                    [staging[e] for e in sorted(staging)], axis=0)


def load_safetensors_params(path: str, cfg: DecoderConfig,
                            dtype=jnp.bfloat16) -> dict:
    from safetensors import safe_open

    params: dict = {"layers": [dict() for _ in range(cfg.num_layers)]}
    unmapped = []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                if name.startswith(_SKIP_PREFIXES):
                    continue  # VL vision tower: not part of this stage
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:  # bf16 stored as raw uint16
                    arr = arr.view(np.uint16)
                    arr = jnp.asarray(arr).view(jnp.bfloat16)
                if not _assign(params, name, arr, dtype, cfg):
                    unmapped.append(name)
    if unmapped:
        logger.warning("unmapped checkpoint tensors: %s", unmapped[:10])
    _finalize_experts(params, cfg)
    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    return params


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


def load_model(model_config: ModelConfig,
               dtype=None) -> tuple[DecoderConfig, dict, dict]:
    """ModelConfig → (DecoderConfig, quantized params pytree, raw hf
    config dict — the engine reads eos_token_id etc. from it).

    hf_config_name selects a component of a composite omni checkpoint
    (reference: hf_config_name in stage YAMLs, engine/arg_utils.py:33):
    "thinker" | "talker" | "code2wav" against an HF
    Qwen3OmniMoeForConditionalGeneration directory. Auxiliary towers
    (code predictor, thinker→talker projections, code2wav params) ride
    back under hf["_aux"] for the engine to claim."""
    if dtype is None:
        dtype = jnp.bfloat16 if model_config.dtype == "bfloat16" \
            else jnp.dtype(model_config.dtype)
    src = model_config.model
    from vllm_omni_tpu.models.gguf_ar import is_gguf_source

    if is_gguf_source(src):
        # GGUF (llama.cpp) checkpoint: reader dequantizes Q8_0/Q4_0,
        # quantize-on-load re-quantizes into the serving layout
        # (reference quantization/gguf_config.py role)
        from vllm_omni_tpu.models.gguf_ar import (load_gguf_ar,
                                                  resolve_gguf_path)

        cfg, params, hf = load_gguf_ar(resolve_gguf_path(src), dtype)
        hf.update(model_config.hf_overrides)
        cfg = _apply_quant_flags(cfg, model_config)
        if model_config.fused_qkv:
            params = fuse_layer_params(params)
        params = quantize_params(
            params, model_config.quantization,
            model_config.quant_group_size,
            quantize_lm_head=model_config.quantize_lm_head)
        return cfg, params, hf
    if os.path.isdir(src) and os.path.isfile(
            os.path.join(src, "config.json")):
        with open(os.path.join(src, "config.json")) as f:
            probe = json.load(f)
        if model_config.hf_config_name == "token2wav" and \
                "token2wav_config" in probe:
            return _load_token2wav_25_component(model_config, src,
                                                dtype)
        if model_config.hf_config_name and "thinker_config" in probe:
            return _load_omni_component(model_config, src, dtype)
        if "audio_decoder_config" in probe or \
                str(probe.get("model_type", "")).startswith("fish"):
            return _load_fish_component(model_config, src, dtype)
        if "speech_vocab_size" in probe and "local_dim" in probe:
            return _load_mimo_component(model_config, src, dtype)
        from vllm_omni_tpu.models.qwen3_tts import is_qwen3_tts_config
        if is_qwen3_tts_config(probe):
            return _load_qwen3_tts_component(model_config, src, dtype)
        from vllm_omni_tpu.models.voxtral_tts import (
            is_voxtral_tts_config)
        if is_voxtral_tts_config(probe):
            return _load_voxtral_component(model_config, src, dtype)
        if "decoder_config" in probe and (
                "decode_upsample_rate" in probe or
                "encoder_config" in probe):
            return _load_tok12_component(model_config, src, dtype)
    if src == "dummy" or not os.path.isdir(src):
        if src != "dummy":
            raise FileNotFoundError(
                f"model path {src!r} not found (HF hub download not "
                "available in this environment; pass a local dir)")
        hf = dict(model_config.hf_overrides)
        if "hidden_size" not in hf or "num_attention_heads" not in hf:
            raise ValueError(
                "model='dummy' (random-weight tier) needs the architecture "
                "in hf_overrides (vocab_size/hidden_size/num_hidden_layers/"
                "num_attention_heads/...); pass a local HF checkpoint dir "
                "to load real weights")
        cfg = hf_config_to_decoder_config(hf)
        cfg = _apply_quant_flags(cfg, model_config)
        # one jitted program builds the whole (quantized) pytree on
        # device: a single dispatch instead of ~8 eager ops per linear
        # (init of an 8B model goes from minutes to seconds behind a
        # high-latency dispatch path)
        import functools

        init_fn = jax.jit(functools.partial(
            init_params, cfg, dtype=dtype,
            quant=model_config.quantization,
            group_size=model_config.quant_group_size,
            fused=model_config.fused_qkv,
            quant_lm_head=model_config.quantize_lm_head))
        params = init_fn(jax.random.PRNGKey(model_config.seed))
        return cfg, params, hf
    else:
        with open(os.path.join(src, "config.json")) as f:
            hf = json.load(f)
        hf.update(model_config.hf_overrides)
        hf = flatten_text_config(hf)
        cfg = hf_config_to_decoder_config(hf)
        cfg = _apply_quant_flags(cfg, model_config)
        if _is_modelopt_fp8(hf):
            # pre-quantized ModelOpt FP8 checkpoint (the reference's
            # anchor config, quantization/component_config.py:51):
            # fp8 weights + scales land DIRECTLY on the fp8 serving
            # path — no dequant/requant round trip
            params, kv_scales = load_modelopt_fp8_params(src, cfg,
                                                         dtype)
            if kv_scales is not None:
                hf["_kv_scales"] = kv_scales
            if model_config.fused_qkv:
                logger.info("fused_qkv skipped: pre-quantized fp8 "
                            "slots keep the checkpoint's per-tensor "
                            "scales separate")
            return cfg, params, hf
        params = load_safetensors_params(src, cfg, dtype)
        if model_config.fused_qkv:
            params = fuse_layer_params(params)
    params = quantize_params(params, model_config.quantization,
                             model_config.quant_group_size,
                             quantize_lm_head=model_config.quantize_lm_head)
    return cfg, params, hf


def load_text_tower(path: str, dtype=jnp.bfloat16
                    ) -> tuple[DecoderConfig, dict, dict]:
    """HF text-decoder dir (possibly a VL composite nesting the decoder
    under text_config) → (DecoderConfig, params, flat hf config). The
    diffusion side uses this to serve checkpoints' LLM text encoders
    in-process: qwen_image → Qwen2.5-VL (pipeline_qwen_image.py:418),
    flux2 → Mistral3 (pipeline_flux2.py:371), z_image → Qwen
    (pipeline_z_image.py:186)."""
    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    hf = flatten_text_config(hf)
    cfg = hf_config_to_decoder_config(hf)
    params = load_safetensors_params(path, cfg, dtype)
    return cfg, params, hf


def _is_modelopt_fp8(hf: dict) -> bool:
    qc = hf.get("quantization_config") or {}
    algo = str(qc.get("quant_algo") or qc.get("quant_method") or "")
    return algo.upper() in ("FP8", "MODELOPT_FP8") or (
        str(qc.get("quant_method", "")).lower() == "modelopt" and
        "FP8" in str(qc.get("quant_algo", "")).upper())


def load_modelopt_fp8_params(path: str, cfg: DecoderConfig,
                             dtype=jnp.bfloat16
                             ) -> tuple[dict, Optional[tuple]]:
    """Load a ModelOpt-exported FP8 checkpoint: every quantized linear
    ships ``*.weight`` (float8_e4m3fn, torch [N, K]) plus a per-tensor
    ``*.weight_scale`` (dequant w = w_q·scale). The fp8 payload is
    bit-cast through uint8 (numpy has no fp8) and lands as
    {"w_q" fp8 [K, N], "scale" f32 [N]} — exactly the serving layout
    decoder.linear dispatches on. Optional per-layer attention
    ``k_scale``/``v_scale`` return as ([L], [L]) for the KV cache.
    ``input_scale`` (static activation quant) is ignored — the serving
    path quantizes activations per-token dynamically, which is at
    least as accurate."""
    from safetensors import safe_open

    params: dict = {"layers": [dict() for _ in range(cfg.num_layers)]}
    scales: dict[str, float] = {}
    fp8_slots: dict[str, Any] = {}
    k_sc = np.zeros((cfg.num_layers,), np.float32)
    v_sc = np.zeros((cfg.num_layers,), np.float32)
    have_kv = False
    unmapped: list[str] = []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="pt") as st:
            for name in st.keys():
                t = st.get_tensor(name)
                if name.endswith(".weight_scale"):
                    scales[name[:-len(".weight_scale")]] = float(t)
                    continue
                if name.endswith(".input_scale"):
                    continue  # dynamic per-token act quant serves this
                if name.endswith((".k_scale", ".v_scale")):
                    parts = name.split(".")
                    li = int(parts[parts.index("layers") + 1])
                    (k_sc if name.endswith("k_scale") else v_sc)[li] = \
                        float(t)
                    have_kv = True
                    continue
                if str(t.dtype) == "torch.float8_e4m3fn":
                    import torch as _torch

                    # keep raw bytes; bitcast + transpose at assign
                    fp8_slots[name] = t.view(_torch.uint8).numpy()
                    continue
                arr = t.float().numpy()
                if not _assign(params, name, arr, dtype, cfg):
                    unmapped.append(name)
    for name, raw in fp8_slots.items():
        base = name[:-len(".weight")]
        scalar = scales.pop(base, None)
        if scalar is None:
            unmapped.append(name)
            continue
        w_q = jnp.asarray(raw.T).view(jnp.float8_e4m3fn)  # [K, N]
        slot = _resolve_linear_slot(params, name, cfg)
        if slot is None:
            unmapped.append(name)
            continue
        slot["w_q"] = w_q
        slot["scale"] = jnp.full((w_q.shape[1],), scalar, jnp.float32)
    _finalize_experts(params, cfg)
    if cfg.tie_word_embeddings:
        params.pop("lm_head", None)
    if unmapped:
        logger.warning("modelopt fp8: unmapped tensors: %s",
                       unmapped[:10])
    logger.info("modelopt fp8 checkpoint: %d pre-quantized linears, "
                "kv scales=%s", len(fp8_slots), have_kv)
    return params, ((k_sc, v_sc) if have_kv else None)


def _resolve_linear_slot(params: dict, weight_name: str,
                         cfg: DecoderConfig) -> Optional[dict]:
    """name of a ``*.weight`` linear → its (possibly fresh) slot dict
    in the param pytree (mirrors the _assign layout for the quantized
    linear set)."""
    parts = weight_name.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    if parts[:2] == ["lm_head", "weight"] or \
            weight_name == "lm_head.weight":
        return params.setdefault("lm_head", {})
    if parts[0] != "layers":
        return None
    layer = params["layers"][int(parts[1])]
    rest = parts[2:]
    if rest[0] == "self_attn" and rest[1] in (
            "q_proj", "k_proj", "v_proj", "o_proj"):
        return layer.setdefault(rest[1], {})
    if rest[0] == "mlp":
        if rest[1] in ("gate_proj", "up_proj", "down_proj",
                       "gate_up_proj"):
            return layer.setdefault(rest[1], {})
        if rest[1] in ("shared_expert", "shared_mlp") and rest[2] in (
                "gate_proj", "up_proj", "down_proj"):
            se = layer.setdefault("shared_expert", {})
            return se.setdefault(rest[2], {})
    return None


def _load_fish_component(model_config: ModelConfig, src: str, dtype
                         ) -> tuple[DecoderConfig, dict, dict]:
    """Fish Speech dual-AR checkpoint: the slow AR is this stage's
    decoder; the fast AR + codebook embeddings + special ids ride under
    hf["_aux"]["fish"] for the engine to claim (reference
    fish_speech_slow_ar.py:170)."""
    from vllm_omni_tpu.models.fish_speech import load_fish_speech_checkpoint

    ck = load_fish_speech_checkpoint(src, dtype=dtype)
    cfg, params = ck["slow"]
    cfg = _apply_quant_flags(cfg, model_config)
    if model_config.fused_qkv:
        params = fuse_layer_params(params)
    params = quantize_params(params, model_config.quantization,
                             model_config.quant_group_size,
                             quantize_lm_head=model_config.quantize_lm_head)
    hf = {"vocab_size": cfg.vocab_size,
          "eos_token_id": ck["special"]["im_end_id"],
          "_aux": {"fish": {"fast": ck["fast"],
                            "codebook_embeddings":
                                ck["codebook_embeddings"],
                            "special": ck["special"]}}}
    return cfg, params, hf


def _load_qwen3_tts_component(model_config: ModelConfig, src: str, dtype
                              ) -> tuple[DecoderConfig, dict, dict]:
    """Qwen3-TTS talker checkpoint: the talker backbone is this stage's
    decoder (codec vocab); the code predictor + text towers + special
    ids ride under hf["_aux"]["qwen3_tts"] for the engine's in-loop
    step conditioner (reference qwen3_tts_talker.py talker_mtp)."""
    from vllm_omni_tpu.models.qwen3_tts import load_qwen3_tts_checkpoint

    ck = load_qwen3_tts_checkpoint(src, dtype=dtype)
    cfg, params = ck["backbone"]
    cfg = _apply_quant_flags(cfg, model_config)
    if model_config.fused_qkv:
        params = fuse_layer_params(params)
    params = quantize_params(params, model_config.quantization,
                             model_config.quant_group_size,
                             quantize_lm_head=model_config.quantize_lm_head)
    spec = ck["spec"]
    hf = {"vocab_size": cfg.vocab_size,
          "eos_token_id": spec.codec_eos_token_id,
          "_aux": {"qwen3_tts": {"spec": spec, "aux": ck["aux"],
                                 "backbone_embed": params["embed"]}}}
    return cfg, params, hf


def _load_token2wav_25_component(model_config: ModelConfig, src: str,
                                 dtype) -> tuple[DecoderConfig, dict,
                                                 dict]:
    """Qwen2.5-Omni token2wav stage: codec ids → waveform through the
    REAL flow-matching mel DiT + anti-aliased BigVGAN
    (models/qwen2_5_token2wav.py; reference
    qwen2_5_omni_token2wav.py). Rides hf["_aux"]["token2wav_25"]; the
    engine bypasses the decoder like the other code2wav stages."""
    del model_config
    from vllm_omni_tpu.models.qwen2_5_token2wav import load_token2wav

    bundle = load_token2wav(src, dtype=jnp.float32)
    cfg = DecoderConfig(
        vocab_size=bundle["dit"][0].num_embeds, hidden_size=8,
        intermediate_size=8, num_layers=0, num_heads=1,
        num_kv_heads=1, head_dim=8)
    params = {"embed": jnp.zeros((8, 8), dtype), "layers": [],
              "final_norm": jnp.ones((8,), dtype),
              "lm_head": {"w": jnp.zeros((8, 8), dtype)}}
    hf = {"_aux": {"token2wav_25": bundle}}
    return cfg, params, hf


def _load_voxtral_component(model_config: ModelConfig, src: str, dtype
                            ) -> tuple[DecoderConfig, dict, dict]:
    """Voxtral TTS checkpoint (reference model_executor/models/
    voxtral_tts/). hf_config_name="audio_tokenizer" loads the codec
    decoder as a code2wav stage; otherwise the Mistral backbone (with
    the semantic-code lm_head) is this stage's decoder and the flow
    head + multivocab table ride hf["_aux"]["voxtral"] for the
    engine's in-loop step conditioner."""
    from vllm_omni_tpu.models.voxtral_tts import (
        load_voxtral_tts_checkpoint)

    ck = load_voxtral_tts_checkpoint(src, dtype=dtype)
    if model_config.hf_config_name == "audio_tokenizer":
        cargs, cparams = ck["codec"]
        cfg = DecoderConfig(
            vocab_size=8, hidden_size=8, intermediate_size=8,
            num_layers=0, num_heads=1, num_kv_heads=1, head_dim=8)
        params = {"embed": jnp.zeros((8, 8), dtype), "layers": [],
                  "final_norm": jnp.ones((8,), dtype),
                  "lm_head": {"w": jnp.zeros((8, 8), dtype)}}
        hf = {"_aux": {"code2wav_voxtral": (cargs, cparams)}}
        return cfg, params, hf
    cfg, params = ck["backbone"]
    cfg = _apply_quant_flags(cfg, model_config)
    if model_config.fused_qkv:
        params = fuse_layer_params(params)
    params = quantize_params(params, model_config.quantization,
                             model_config.quant_group_size,
                             quantize_lm_head=model_config.quantize_lm_head)
    from vllm_omni_tpu.models.voxtral_tts import END_AUDIO_ID
    hf = {"vocab_size": cfg.vocab_size, "eos_token_id": END_AUDIO_ID,
          "_aux": {"voxtral": {"spec": ck["spec"], "aux": ck["aux"]}}}
    return cfg, params, hf


def _load_tok12_component(model_config: ModelConfig, src: str, dtype
                          ) -> tuple[DecoderConfig, dict, dict]:
    """Qwen3-TTS 12hz speech-tokenizer checkpoint as a code2wav stage:
    the real V2 codec decoder (models/qwen3_tts_tokenizer.py) rides
    under hf["_aux"]["code2wav_tok12"]; the engine bypasses the
    decoder entirely (same shape as the qwen3_omni code2wav stage)."""
    del model_config
    from vllm_omni_tpu.models.qwen3_tts_tokenizer import load_tok12

    t_cfg, t_params = load_tok12(src, dtype=jnp.float32)
    cfg = DecoderConfig(
        vocab_size=t_cfg.codebook_size * t_cfg.num_quantizers,
        hidden_size=max(t_cfg.latent_dim, 8), intermediate_size=8,
        num_layers=0, num_heads=1, num_kv_heads=1, head_dim=8)
    params = {"embed": jnp.zeros((8, 8), dtype), "layers": [],
              "final_norm": jnp.ones((8,), dtype),
              "lm_head": {"w": jnp.zeros((8, 8), dtype)}}
    hf = {"_aux": {"code2wav_tok12": (t_cfg, t_params)}}
    return cfg, params, hf


def _load_mimo_component(model_config: ModelConfig, src: str, dtype
                         ) -> tuple[DecoderConfig, dict, dict]:
    """MiMo-Audio grouped dual-AR checkpoint: the Qwen2 global backbone
    is this stage's decoder; the local transformers + RVQ embeddings +
    heads ride under hf["_aux"]["mimo"] for the engine (reference
    mimo_audio_llm.py:489)."""
    from vllm_omni_tpu.models.mimo_audio import load_mimo_audio_checkpoint

    ck = load_mimo_audio_checkpoint(src, dtype=dtype)
    cfg, params = ck["global"]
    cfg = _apply_quant_flags(cfg, model_config)
    if model_config.fused_qkv:
        params = fuse_layer_params(params)
    params = quantize_params(params, model_config.quantization,
                             model_config.quant_group_size,
                             quantize_lm_head=model_config.quantize_lm_head)
    hf_src = ck["hf_config"]
    hf = {"vocab_size": cfg.vocab_size,
          "eos_token_id": hf_src.get("eos_token_id", 151645),
          "_aux": {"mimo": ck["aux"]}}
    return cfg, params, hf


def _load_omni_component(model_config: ModelConfig, src: str, dtype
                         ) -> tuple[DecoderConfig, dict, dict]:
    """One component of an HF Qwen3-Omni checkpoint (thinker / talker /
    code2wav) as this stage's model. The talker stage additionally gets
    the MTP code predictor and the thinker→talker projections; the
    code2wav stage gets the conv tower (the engine bypasses the decoder
    entirely for it)."""
    from vllm_omni_tpu.models.qwen3_omni import load_qwen3_omni_checkpoint

    which = model_config.hf_config_name
    ck = load_qwen3_omni_checkpoint(src, dtype=dtype, only={which})
    hf_top = ck["hf_config"]
    if which == "thinker":
        cfg, params = ck["thinker"]
        hf = dict(hf_top["thinker_config"].get("text_config", {}))
        hf.setdefault("eos_token_id", hf_top.get("eos_token_id"))
    elif which == "talker":
        cfg, params = ck["talker"]
        tk = hf_top["talker_config"]
        hf = dict(tk.get("text_config", {}))
        hf["eos_token_id"] = tk.get("codec_eos_token_id")
        hf["_aux"] = {"code_predictor": ck["code_predictor"],
                      "projections": ck["talker_extras"],
                      "talker_special": {
                          k: tk.get(k) for k in
                          ("codec_bos_id", "codec_pad_id",
                           "codec_eos_token_id", "codec_nothink_id",
                           "codec_think_bos_id", "codec_think_eos_id")}}
    elif which == "code2wav":
        # minimal decoder config so the engine's generic machinery has
        # shapes; the code2wav path never runs the decoder
        c2w_cfg, c2w_params = ck["code2wav"]
        cfg = DecoderConfig(
            vocab_size=c2w_cfg.codebook_size * c2w_cfg.num_quantizers,
            hidden_size=c2w_cfg.hidden_size, intermediate_size=8,
            num_layers=0, num_heads=1, num_kv_heads=1, head_dim=8)
        params = {"embed": jnp.zeros((8, 8), dtype), "layers": [],
                  "final_norm": jnp.ones((8,), dtype),
                  "lm_head": {"w": jnp.zeros((8, 8), dtype)}}
        hf = {"_aux": {"code2wav": (c2w_cfg, c2w_params)}}
        return cfg, params, hf
    else:
        raise ValueError(f"unknown hf_config_name {which!r} for omni "
                         "checkpoint (thinker | talker | code2wav)")
    cfg = _apply_quant_flags(cfg, model_config)
    if model_config.fused_qkv:
        params = fuse_layer_params(params)
    params = quantize_params(params, model_config.quantization,
                             model_config.quant_group_size,
                             quantize_lm_head=model_config.quantize_lm_head)
    return cfg, params, hf


def _apply_quant_flags(cfg: DecoderConfig,
                       model_config: ModelConfig) -> DecoderConfig:
    """W8A8 activation quant rides the fused layout (separate q/k/v
    re-quantize the same input three times — measured slower than the
    upcast dot, benchmarks/layer_variants.py sep_native row)."""
    import dataclasses

    if (model_config.quantization == "int8" and model_config.int8_w8a8
            and model_config.fused_qkv):
        cfg = dataclasses.replace(cfg, act_quant=True)
    return cfg
