"""Real text encoders for diffusion conditioning: T5/UMT5 + CLIP text.

Reference parity: diffusion/models/t5_encoder/t5_encoder.py (705 LoC —
the reference's native T5 encoder used by wan2_2 (UMT5-XXL), and the
CLIP text towers flux/sd3 load from the pipeline's `text_encoder*/`
subfolders (pipeline_flux.py `text_encoder`/`text_encoder_2`).

TPU-first: pure functions over param pytrees, one jitted program per
(batch, seq) bucket; everything bf16 with fp32 norm/softmax statistics.
Golden parity is asserted against the installed `transformers`
implementations (tests/diffusion/test_text_encoder.py) — the same
method as tests/models/test_hf_checkpoint_parity.py, which is stronger
than a hand-written oracle.

T5 semantics that matter (and differ from a vanilla transformer):
* RMS layer norm without mean subtraction or bias, fp32 stats;
* NO 1/√d attention scaling (folded into init by T5 training);
* additive relative-position bias from bucketed distances — one shared
  table computed at block 0 for T5, a per-layer table for UMT5;
* gated-gelu FF (wi_0·gelu ⊙ wi_1) for v1.1/UMT5, relu(wi) for v1.0.

CLIP text semantics: learned positional embeddings, causal mask,
quick_gelu (L) or gelu (G), final layer norm, pooled output = hidden
state at the EOS position (+ optional text_projection).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = dict


# ---------------------------------------------------------------------------
# T5 / UMT5 encoder
# ---------------------------------------------------------------------------


@dataclass
class T5EncoderConfig:
    """Mirrors the transformers T5Config/UMT5Config fields the encoder
    needs (text_encoder*/config.json)."""

    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    is_gated_act: bool = False
    per_layer_bias: bool = False  # UMT5: fresh bias table every layer

    @classmethod
    def from_json(cls, cfg: dict) -> "T5EncoderConfig":
        ff = cfg.get("feed_forward_proj", "relu")
        return cls(
            vocab_size=cfg["vocab_size"], d_model=cfg["d_model"],
            d_kv=cfg["d_kv"], d_ff=cfg["d_ff"],
            num_layers=cfg["num_layers"], num_heads=cfg["num_heads"],
            relative_attention_num_buckets=cfg.get(
                "relative_attention_num_buckets", 32),
            relative_attention_max_distance=cfg.get(
                "relative_attention_max_distance", 128),
            layer_norm_epsilon=cfg.get("layer_norm_epsilon", 1e-6),
            is_gated_act=cfg.get("is_gated_act",
                                 ff.startswith("gated")),
            per_layer_bias=cfg.get("model_type") == "umt5")


def _t5_ln(x: jnp.ndarray, w: jnp.ndarray, eps: float) -> jnp.ndarray:
    """T5LayerNorm: scale-only RMS, no mean subtraction, fp32 stats."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * \
        w.astype(x.dtype)


def _rel_bucket(rel: jnp.ndarray, num_buckets: int,
                max_dist: int) -> jnp.ndarray:
    """transformers T5Attention._relative_position_bucket,
    bidirectional."""
    nb = num_buckets // 2
    ret = (rel > 0).astype(jnp.int32) * nb
    n = jnp.abs(rel)
    max_exact = nb // 2
    large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6) /
        math.log(max_dist / max_exact) * (nb - max_exact)
    ).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return ret + jnp.where(n < max_exact, n, large)


def _position_bias(table: jnp.ndarray, seq: int, num_buckets: int,
                   max_dist: int) -> jnp.ndarray:
    """[buckets, H] table → [1, H, T, T] additive bias."""
    pos = jnp.arange(seq)
    rel = pos[None, :] - pos[:, None]  # memory − query
    bucket = _rel_bucket(rel, num_buckets, max_dist)
    bias = table[bucket]  # [T, T, H]
    return bias.transpose(2, 0, 1)[None].astype(jnp.float32)


def _t5_attention(x: jnp.ndarray, p: Params, cfg: T5EncoderConfig,
                  bias: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    b, t, _ = x.shape
    h, dk = cfg.num_heads, cfg.d_kv

    def proj(w):
        return (x @ w.astype(x.dtype)).reshape(b, t, h, dk).transpose(
            0, 2, 1, 3)

    q, k, v = proj(p["q"]), proj(p["k"]), proj(p["v"])
    # T5: no 1/√d scaling
    scores = q.astype(jnp.float32) @ k.astype(jnp.float32).swapaxes(
        -1, -2)
    scores = scores + bias + mask
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, h * dk)
    return o @ p["o"].astype(o.dtype)


def _t5_ff(x: jnp.ndarray, p: Params, cfg: T5EncoderConfig) -> jnp.ndarray:
    if cfg.is_gated_act:
        g = jax.nn.gelu(
            (x @ p["wi_0"].astype(x.dtype)).astype(jnp.float32),
            approximate=True).astype(x.dtype)
        h = g * (x @ p["wi_1"].astype(x.dtype))
    else:
        h = jax.nn.relu(x @ p["wi"].astype(x.dtype))
    return h @ p["wo"].astype(h.dtype)


def t5_encode(params: Params, cfg: T5EncoderConfig, ids: jnp.ndarray,
              attn_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """[B, T] token ids → [B, T, d_model] final hidden states."""
    x = params["embed"][ids]
    t = ids.shape[1]
    if attn_mask is None:
        mask = jnp.zeros((1, 1, 1, t), jnp.float32)
    else:
        mask = jnp.where(attn_mask[:, None, None, :] > 0, 0.0,
                         -1e9).astype(jnp.float32)
    bias = None
    for i, layer in enumerate(params["layers"]):
        if bias is None or cfg.per_layer_bias:
            bias = _position_bias(
                layer["rel_bias"] if cfg.per_layer_bias
                else params["layers"][0]["rel_bias"], t,
                cfg.relative_attention_num_buckets,
                cfg.relative_attention_max_distance)
        h = _t5_ln(x, layer["ln1"], cfg.layer_norm_epsilon)
        x = x + _t5_attention(h, layer["attn"], cfg, bias, mask)
        h = _t5_ln(x, layer["ln2"], cfg.layer_norm_epsilon)
        x = x + _t5_ff(h, layer["ff"], cfg)
    return _t5_ln(x, params["final_ln"], cfg.layer_norm_epsilon)


def init_t5_params(cfg: T5EncoderConfig, dtype=jnp.bfloat16) -> Params:
    dm, inner = cfg.d_model, cfg.num_heads * cfg.d_kv
    layers = []
    for i in range(cfg.num_layers):
        lay: Params = {
            "ln1": jnp.ones((dm,), dtype),
            "ln2": jnp.ones((dm,), dtype),
            "attn": {"q": jnp.zeros((dm, inner), dtype),
                     "k": jnp.zeros((dm, inner), dtype),
                     "v": jnp.zeros((dm, inner), dtype),
                     "o": jnp.zeros((inner, dm), dtype)},
        }
        if cfg.is_gated_act:
            lay["ff"] = {"wi_0": jnp.zeros((dm, cfg.d_ff), dtype),
                         "wi_1": jnp.zeros((dm, cfg.d_ff), dtype),
                         "wo": jnp.zeros((cfg.d_ff, dm), dtype)}
        else:
            lay["ff"] = {"wi": jnp.zeros((dm, cfg.d_ff), dtype),
                         "wo": jnp.zeros((cfg.d_ff, dm), dtype)}
        if cfg.per_layer_bias or i == 0:
            lay["rel_bias"] = jnp.zeros(
                (cfg.relative_attention_num_buckets, cfg.num_heads),
                jnp.float32)
        layers.append(lay)
    return {"embed": jnp.zeros((cfg.vocab_size, dm), dtype),
            "layers": layers,
            "final_ln": jnp.ones((dm,), dtype)}


def assign_t5_tensor(params: Params, name: str, arr: Any,
                     dtype=jnp.bfloat16) -> bool:
    """Map transformers T5EncoderModel/UMT5EncoderModel tensor names."""
    arr = np.asarray(arr)
    if name in ("shared.weight", "encoder.embed_tokens.weight"):
        params["embed"] = jnp.asarray(arr, dtype)
        return True
    if name == "encoder.final_layer_norm.weight":
        params["final_ln"] = jnp.asarray(arr, dtype)
        return True
    parts = name.split(".")
    # encoder.block.{i}.layer.{j}.{SelfAttention|DenseReluDense|
    # layer_norm}.{...}
    if parts[0] != "encoder" or parts[1] != "block":
        return False
    lay = params["layers"][int(parts[2])]
    sub_idx, sub = parts[4], parts[5]
    if sub == "SelfAttention":
        if parts[6] == "relative_attention_bias":
            if "rel_bias" not in lay:
                return False
            lay["rel_bias"] = jnp.asarray(arr, jnp.float32)
            return True
        lay["attn"][parts[6]] = jnp.asarray(arr.T, dtype)  # q|k|v|o
        return True
    if sub == "layer_norm":
        lay["ln1" if sub_idx == "0" else "ln2"] = jnp.asarray(arr,
                                                              dtype)
        return True
    if sub == "DenseReluDense":
        key = parts[6]  # wi | wi_0 | wi_1 | wo
        if key not in lay["ff"]:
            return False
        lay["ff"][key] = jnp.asarray(arr.T, dtype)
        return True
    return False


# ---------------------------------------------------------------------------
# CLIP text encoder
# ---------------------------------------------------------------------------


@dataclass
class CLIPTextConfigJ:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None

    @classmethod
    def from_json(cls, cfg: dict) -> "CLIPTextConfigJ":
        keep = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in cfg.items() if k in keep})


def _ln(x: jnp.ndarray, p: Params, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32) +
            p["shift"].astype(jnp.float32)).astype(x.dtype)


def _clip_act(x: jnp.ndarray, act: str) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    if act == "quick_gelu":
        y = xf * jax.nn.sigmoid(1.702 * xf)
    else:
        y = jax.nn.gelu(xf, approximate=False)
    return y.astype(x.dtype)


def _lin(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def clip_text_encode(params: Params, cfg: CLIPTextConfigJ,
                     ids: jnp.ndarray) -> tuple:
    """[B, T] ids → (sequence [B, T, D] post final-LN, pooled [B, D|proj]).
    Pooled = hidden at the first EOS position, through text_projection
    when the checkpoint ships one (CLIPTextModelWithProjection)."""
    b, t = ids.shape
    x = params["tok_embed"][ids] + \
        params["pos_embed"][:t][None].astype(params["tok_embed"].dtype)
    h, d = cfg.num_attention_heads, cfg.hidden_size
    dk = d // h
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e9
    ).astype(jnp.float32)
    for layer in params["layers"]:
        res = x
        xn = _ln(x, layer["ln1"], cfg.layer_norm_eps)

        def proj(slot):
            return _lin(xn, slot).reshape(b, t, h, dk).transpose(
                0, 2, 1, 3)

        q, k, v = proj(layer["q"]), proj(layer["k"]), proj(layer["v"])
        scores = (q.astype(jnp.float32) @
                  k.astype(jnp.float32).swapaxes(-1, -2)) * (dk ** -0.5)
        attn = jax.nn.softmax(scores + causal, axis=-1).astype(v.dtype)
        o = (attn @ v).transpose(0, 2, 1, 3).reshape(b, t, d)
        x = res + _lin(o, layer["o"])
        res = x
        xn = _ln(x, layer["ln2"], cfg.layer_norm_eps)
        x = res + _lin(_clip_act(_lin(xn, layer["fc1"]),
                                 cfg.hidden_act), layer["fc2"])
    seq = _ln(x, params["final_ln"], cfg.layer_norm_eps)
    eos_pos = jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32),
                         axis=-1)
    pooled = seq[jnp.arange(b), eos_pos]
    if "text_projection" in params:
        pooled = pooled @ params["text_projection"].astype(pooled.dtype)
    return seq, pooled


def init_clip_text_params(cfg: CLIPTextConfigJ,
                          dtype=jnp.bfloat16) -> Params:
    d, ff = cfg.hidden_size, cfg.intermediate_size

    def lin(cin, cout):
        return {"w": jnp.zeros((cin, cout), dtype),
                "b": jnp.zeros((cout,), dtype)}

    def norm():
        return {"scale": jnp.ones((d,), dtype),
                "shift": jnp.zeros((d,), dtype)}

    layers = [{"ln1": norm(), "ln2": norm(),
               "q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
               "o": lin(d, d), "fc1": lin(d, ff), "fc2": lin(ff, d)}
              for _ in range(cfg.num_hidden_layers)]
    p: Params = {
        "tok_embed": jnp.zeros((cfg.vocab_size, d), dtype),
        "pos_embed": jnp.zeros((cfg.max_position_embeddings, d), dtype),
        "layers": layers,
        "final_ln": norm(),
    }
    if cfg.projection_dim:
        p["text_projection"] = jnp.zeros((d, cfg.projection_dim), dtype)
    return p


_CLIP_LIN = {"q_proj": "q", "k_proj": "k", "v_proj": "v",
             "out_proj": "o", "fc1": "fc1", "fc2": "fc2"}


def assign_clip_text_tensor(params: Params, name: str, arr: Any,
                            dtype=jnp.bfloat16) -> bool:
    arr = np.asarray(arr)
    if name == "text_projection.weight":
        if "text_projection" not in params:
            return False
        params["text_projection"] = jnp.asarray(arr.T, dtype)
        return True
    if not name.startswith("text_model."):
        return False
    rest = name[len("text_model."):].split(".")
    if rest[0] == "embeddings":
        tgt = "tok_embed" if rest[1] == "token_embedding" else \
            "pos_embed"
        params[tgt] = jnp.asarray(arr, dtype)
        return True
    if rest[0] == "final_layer_norm":
        params["final_ln"]["scale" if rest[1] == "weight"
                           else "shift"] = jnp.asarray(arr, dtype)
        return True
    if rest[0] != "encoder" or rest[1] != "layers":
        return False
    lay = params["layers"][int(rest[2])]
    mod = rest[3]
    if mod in ("layer_norm1", "layer_norm2"):
        slot = lay["ln1" if mod == "layer_norm1" else "ln2"]
        slot["scale" if rest[4] == "weight" else "shift"] = \
            jnp.asarray(arr, dtype)
        return True
    leaf = rest[-1]
    key = rest[4] if mod in ("self_attn", "mlp") else None
    tgt = _CLIP_LIN.get(key)
    if tgt is None:
        return False
    slot = lay[tgt]
    if leaf == "weight":
        slot["w"] = jnp.asarray(arr.T, dtype)
    else:
        slot["b"] = jnp.asarray(arr, dtype)
    return True


# ---------------------------------------------------------------------------
# LLM towers (causal decoders as text encoders)
# ---------------------------------------------------------------------------


def llm_hidden_states(params, cfg, ids: jnp.ndarray, collect: tuple,
                      mask: Optional[jnp.ndarray] = None
                      ) -> dict[int, jnp.ndarray]:
    """Causal full-sequence forward of an LLM text tower →
    {hidden_states_index: [B, T, H]} with transformers
    ``output_hidden_states`` indexing (len(layers) = final normed
    output). ``mask`` [B, T] excludes pad keys like the torch models'
    attention_mask — flux2 feeds the PADDED sequence to the DiT
    (pipeline_flux2.py:430 padding="max_length"), so pad-position
    embeddings must match bit-for-bit, not just the valid prefix.
    Jitted per (seq_len, collect) — prompt encoding pads to a static
    bucket so one compilation serves every prompt."""
    import functools

    from vllm_omni_tpu.models.decoder import decoder_forward
    from vllm_omni_tpu.ops.attention import mha_xla

    collect = tuple(sorted(set(int(k) for k in collect)))

    @functools.partial(jax.jit, static_argnames=("idxs",))
    def fwd(p, ids_, mask_, idxs):
        def attn(i, q, k, v):
            return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5,
                           causal=True, key_mask=mask_)

        pos = jnp.broadcast_to(jnp.arange(ids_.shape[1])[None, :],
                               ids_.shape)
        _, hs = decoder_forward(p, cfg, ids_, pos, attn,
                                collect_hidden=idxs)
        return hs

    if mask is None:
        mask = jnp.ones(ids.shape, jnp.bool_)
    return fwd(params, ids, mask.astype(jnp.bool_), collect)


# ---------------------------------------------------------------------------
# loading from a transformers-format subfolder
# ---------------------------------------------------------------------------


def load_text_encoder(path: str, subfolder: str, dtype=jnp.bfloat16):
    """pipeline/<subfolder>/ (config.json + safetensors) → ("t5"|"clip",
    cfg, params). Dispatches on the transformers architecture name."""
    import json
    import os

    from vllm_omni_tpu.diffusion.loader import iter_component_tensors

    with open(os.path.join(path, subfolder, "config.json")) as f:
        cfg_json = json.load(f)
    archs = cfg_json.get("architectures") or []
    arch = archs[0] if archs else cfg_json.get("model_type", "")
    if "T5" in arch or "t5" in cfg_json.get("model_type", ""):
        cfg = T5EncoderConfig.from_json(cfg_json)
        params = init_t5_params(cfg, dtype)
        assign = assign_t5_tensor
        kind = "t5"
    elif "CLIPText" in arch or cfg_json.get("model_type") in (
            "clip_text_model", "clip"):
        if "CLIPTextModelWithProjection" not in arch:
            cfg_json = dict(cfg_json, projection_dim=None)
        cfg = CLIPTextConfigJ.from_json(cfg_json)
        params = init_clip_text_params(cfg, dtype)
        assign = assign_clip_text_tensor
        kind = "clip"
    else:
        from vllm_omni_tpu.models.weights import (_ARCH_FLAGS,
                                                  load_text_tower)

        nested_arch = ((cfg_json.get("text_config") or {})
                       .get("architectures") or [""])[0]
        if arch in _ARCH_FLAGS or nested_arch in _ARCH_FLAGS or \
                cfg_json.get("model_type") in ("qwen2_5_vl", "mistral3"):
            # LLM text tower (qwen_image → Qwen2.5-VL, flux2 →
            # Mistral3, z_image → Qwen; reference
            # pipeline_qwen_image.py:418, pipeline_flux2.py:371,
            # pipeline_z_image.py:186): served by the AR decoder stack
            cfg, params, _hf = load_text_tower(
                os.path.join(path, subfolder), dtype)
            return "llm", cfg, params
        raise ValueError(f"unsupported text encoder arch {arch!r}")
    loaded, unmapped = 0, []
    for name, arr in iter_component_tensors(path, subfolder):
        if assign(params, name, arr, dtype):
            loaded += 1
        else:
            unmapped.append(name)
    if loaded == 0:
        raise ValueError(f"no tensors mapped from {subfolder}")
    if unmapped:
        import logging

        logging.getLogger(__name__).warning(
            "%s: %d unmapped tensors, e.g. %s", subfolder,
            len(unmapped), unmapped[:6])
    return kind, cfg, params
