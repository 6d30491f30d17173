"""AR checkpoint ingestion from GGUF (llama.cpp format).

Reference parity: quantization/gguf_config.py (the reference loads
GGUF-quantized checkpoints through vLLM's gguf quant config). Here a
``model: /path/model.gguf`` source loads directly into the decoder
pytree: the reader (diffusion/gguf.py — shared with the diffusion GGUF
adapters) dequantizes Q8_0/Q4_0 blocks to float32, and the standard
quantize-on-load path re-quantizes into the int8/int4 serving layouts,
so a Q8_0 checkpoint serves on the native s8×s8 MXU path.

Tensor naming follows the llama.cpp convention (token_embd, blk.N.attn_q
/attn_k/attn_v/attn_output/attn_norm/ffn_gate/ffn_up/ffn_down/ffn_norm,
output_norm, output); metadata follows ``{arch}.embedding_length`` etc.
2D tensors are stored [out, in] (ggml ne-reversed), transposed on load.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

# general.architecture → HF architecture name (models/weights._ARCH_FLAGS)
_GGUF_ARCHS = {
    "llama": "LlamaForCausalLM",
    "mistral": "MistralForCausalLM",
    "qwen2": "Qwen2ForCausalLM",
    "qwen3": "Qwen3ForCausalLM",
    "qwen2moe": "Qwen2MoeForCausalLM",
    "qwen3moe": "Qwen3MoeForCausalLM",
}


def gguf_to_hf_config(meta: dict[str, Any],
                      tensors: dict[str, np.ndarray]) -> dict[str, Any]:
    """GGUF metadata → HF-style config dict (consumed by
    hf_config_to_decoder_config)."""
    arch = meta.get("general.architecture", "llama")
    hf_arch = _GGUF_ARCHS.get(arch)
    if hf_arch is None:
        raise ValueError(f"unsupported GGUF architecture {arch!r}; "
                         f"known: {sorted(_GGUF_ARCHS)}")

    def key(name: str, default=None):
        return meta.get(f"{arch}.{name}", default)

    n_head = int(key("attention.head_count"))
    hidden = int(key("embedding_length"))
    vocab = int(tensors["token_embd.weight"].shape[0])
    hf = {
        "architectures": [hf_arch],
        "vocab_size": vocab,
        "hidden_size": hidden,
        "intermediate_size": int(key("feed_forward_length",
                                     4 * hidden)),
        "num_hidden_layers": int(key("block_count")),
        "num_attention_heads": n_head,
        "num_key_value_heads": int(key("attention.head_count_kv",
                                       n_head)),
        "rope_theta": float(key("rope.freq_base", 10000.0)),
        "rms_norm_eps": float(key("attention.layer_norm_rms_epsilon",
                                  1e-6)),
        "max_position_embeddings": int(key("context_length", 4096)),
        "tie_word_embeddings": "output.weight" not in tensors,
    }
    if key("attention.key_length"):
        hf["head_dim"] = int(key("attention.key_length"))
    if meta.get("tokenizer.ggml.eos_token_id") is not None:
        hf["eos_token_id"] = int(meta["tokenizer.ggml.eos_token_id"])
    if "blk.0.attn_q.bias" in tensors:
        hf["attention_bias"] = True
    return hf


def load_gguf_ar(path: str, dtype=jnp.bfloat16
                 ) -> tuple[Any, dict, dict[str, Any]]:
    """model.gguf → (DecoderConfig, float params pytree, hf dict).
    The caller applies quantize-on-load (models/weights.load_model)."""
    from vllm_omni_tpu.diffusion.gguf import read_gguf
    from vllm_omni_tpu.models.decoder import init_params
    from vllm_omni_tpu.models.weights import hf_config_to_decoder_config

    meta, tensors = read_gguf(path)
    hf = gguf_to_hf_config(meta, tensors)
    cfg = hf_config_to_decoder_config(hf)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype)

    def w(v):
        return jnp.asarray(np.ascontiguousarray(v.T)).astype(dtype)

    def vec(v):
        return jnp.asarray(v).astype(dtype)

    slot_map = {
        "attn_q": "q_proj", "attn_k": "k_proj", "attn_v": "v_proj",
        "attn_output": "o_proj", "ffn_gate": "gate_proj",
        "ffn_up": "up_proj", "ffn_down": "down_proj",
    }
    norm_map = {"attn_norm": "input_norm", "ffn_norm": "post_norm",
                "attn_q_norm": "q_norm", "attn_k_norm": "k_norm"}
    unmapped, loaded = [], 0
    for name, v in tensors.items():
        ok = False
        if name == "token_embd.weight":
            params["embed"] = vec(v)
            ok = True
        elif name == "output_norm.weight":
            params["final_norm"] = vec(v)
            ok = True
        elif name == "output.weight":
            params["lm_head"] = {"w": w(v)}
            ok = True
        elif name.startswith("blk."):
            parts = name.split(".")
            layer = params["layers"][int(parts[1])]
            slot, leaf = parts[2], parts[3]
            if slot in slot_map and leaf == "weight":
                layer[slot_map[slot]]["w"] = w(v)
                ok = True
            elif slot in slot_map and leaf == "bias":
                layer[slot_map[slot]]["b"] = vec(v)
                ok = True
            elif slot in norm_map and leaf == "weight":
                layer[norm_map[slot]] = vec(v)
                ok = True
        elif name.startswith("tokenizer.") or name.startswith("rope_"):
            ok = True  # vocab blobs / precomputed rope: not needed
        if ok:
            loaded += 1
        else:
            unmapped.append(name)
    if unmapped:
        logger.warning("gguf: %d unmapped tensors, e.g. %s",
                       len(unmapped), unmapped[:8])
    if loaded == 0:
        raise ValueError(f"no tensors mapped from {path}")
    logger.info("gguf AR checkpoint: %d tensors loaded (%s, %d layers)",
                loaded, hf["architectures"][0], cfg.num_layers)
    return cfg, params, hf


def is_gguf_source(src: str) -> bool:
    if src.endswith(".gguf") and os.path.isfile(src):
        return True
    # a dir holding exactly one .gguf file also counts
    if os.path.isdir(src):
        gg = [f for f in os.listdir(src) if f.endswith(".gguf")]
        return len(gg) == 1 and not os.path.isfile(
            os.path.join(src, "config.json"))
    return False


def resolve_gguf_path(src: str) -> str:
    if os.path.isfile(src):
        return src
    gg = [f for f in os.listdir(src) if f.endswith(".gguf")]
    return os.path.join(src, gg[0])
