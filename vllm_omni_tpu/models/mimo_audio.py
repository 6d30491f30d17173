"""MiMo-Audio grouped dual-AR (global Qwen2 + local RVQ transformers)
with real checkpoint geometry.

Reference parity: model_executor/models/mimo_audio/
(mimo_audio_llm.py:489 MiMoAudioLLMForConditionalGeneration — a Qwen2
global backbone whose audio positions are PATCHES of group_size=4
timesteps x audio_channels=8 RVQ codes; config_mimo_audio.py:16
MiMoAudioConfig with per-channel vocab sizes "1025-1025-129x6", empty
ids, and the "0-1-...-7" delay pattern; base_local_forward :786 — the
output local transformer decodes one group of codes in
group_size + max(delay) causal steps with per-channel lm heads and the
summed sampled-code embeddings as the next input; the input local
transformer re-encodes summed RVQ embeddings NON-causally per group
(:999 is_causal=False) and speech_group_downcast folds the group into
one global token embedding).

TPU-native design (the fish_speech.py pattern):
* the GLOBAL AR is the shared decoder tower (models/decoder.py,
  attention_bias=True Qwen2 semantics) under the normal paged-KV
  continuous-batching engine;
* the local decode is a pure function whose causal step loop is
  UNROLLED over the 11 delay iterations inside one jit, re-running a
  fixed [B, 11, H] buffer instead of a DynamicCache (causal attention
  makes positions <= t exact regardless of the unfilled suffix);
* in-loop patch conditioning runs INSIDE the chained decode scan (the
  step-conditioner surface, worker/model_runner.set_step_conditioner):
  a fed <|empty|> token's input embedding is the input-local encoding
  of the codes local-decoded from hidden_{t-1} — the reference's
  merge_mm_embedding behavior (mimo_audio_llm.py:917,951), verified
  per-step against a torch oracle. Codes stream out per patch; the
  batched finish-hook expansion covers only a max_tokens-truncated
  final patch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import DecoderConfig, linear
from vllm_omni_tpu.ops.layernorm import rms_norm
from vllm_omni_tpu.ops.rope import apply_rope, compute_cos_sin

logger = init_logger(__name__)

Params = dict


def _parse_list(value, n: int) -> tuple[int, ...]:
    if isinstance(value, str) and "-" in value:
        return tuple(int(s) for s in value.split("-"))
    return tuple([int(value)] * n)


@dataclass
class MiMoLocalConfig:
    """One local transformer (Qwen2 semantics: qkv bias, standard rope,
    final rms norm). config_mimo_audio.py local_config/input_local_config."""

    hidden_size: int = 1024
    num_layers: int = 16
    num_heads: int = 64
    intermediate_size: int = 4096
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass
class MiMoAudioConfig:
    group_size: int = 4
    audio_channels: int = 8
    speech_vocab_sizes: tuple = (1025, 1025, 129, 129, 129, 129, 129, 129)
    speech_empty_ids: tuple = (1024, 1024, 128, 128, 128, 128, 128, 128)
    delay_pattern: tuple = (0, 1, 2, 3, 4, 5, 6, 7)
    hidden_size: int = 4096  # global backbone width
    local: MiMoLocalConfig = field(default_factory=MiMoLocalConfig)
    input_local: MiMoLocalConfig = field(default_factory=MiMoLocalConfig)
    empty_token_id: int = 151667
    sostm_token_id: int = 151670
    eostm_token_id: int = 151671

    @classmethod
    def from_hf(cls, hf: dict) -> "MiMoAudioConfig":
        ch = hf.get("audio_channels", 8)
        local_dim = hf.get("local_dim", 1024)
        heads = hf.get("local_attn_heads", 64)
        ild = hf.get("input_local_dim") or local_dim
        theta = hf.get("rope_theta", 10000.0)
        eps = hf.get("rms_norm_eps", 1e-6)
        return cls(
            group_size=hf.get("group_size", 4),
            audio_channels=ch,
            speech_vocab_sizes=_parse_list(
                hf.get("speech_vocab_size",
                       "1025-1025-129-129-129-129-129-129"), ch),
            speech_empty_ids=_parse_list(
                hf.get("speech_zeroemb_idx",
                       "1024-1024-128-128-128-128-128-128"), ch),
            delay_pattern=_parse_list(
                hf.get("delay_pattern", "0-1-2-3-4-5-6-7"), ch),
            hidden_size=hf.get("hidden_size", 4096),
            local=MiMoLocalConfig(
                hidden_size=local_dim,
                num_layers=hf.get("local_layers", 16),
                num_heads=heads,
                intermediate_size=hf.get("local_ffn_dim", 4096),
                rope_theta=theta, rms_norm_eps=eps),
            input_local=MiMoLocalConfig(
                hidden_size=ild,
                num_layers=hf.get("input_local_layers", 6),
                num_heads=heads,
                intermediate_size=ild * 4,
                rope_theta=theta, rms_norm_eps=eps),
        )


def global_config_from_hf(hf: dict) -> DecoderConfig:
    """Global backbone = Qwen2 (mimo_audio_llm.py:536 architectures
    ["Qwen2ForCausalLM"])."""
    heads = hf.get("num_attention_heads", 32)
    return DecoderConfig(
        vocab_size=hf.get("vocab_size", 151936),
        hidden_size=hf.get("hidden_size", 4096),
        intermediate_size=hf.get("intermediate_size", 11008),
        num_layers=hf.get("num_hidden_layers", 36),
        num_heads=heads,
        num_kv_heads=hf.get("num_key_value_heads", 8),
        head_dim=hf.get("head_dim",
                        hf.get("hidden_size", 4096) // heads),
        rope_theta=hf.get("rope_theta", 1e6),
        rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=hf.get("tie_word_embeddings", False),
        attention_bias=True,
        max_position_embeddings=hf.get("max_position_embeddings", 32768),
    )


# ---------------------------------------------------------------------------
# Local Qwen2 mini-transformer (shared by both local towers)
# ---------------------------------------------------------------------------


def _local_layer(layer: Params, cfg: MiMoLocalConfig, x: jnp.ndarray,
                 cos, sin, causal: bool) -> jnp.ndarray:
    b, s, h = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    xn = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
    q = linear(xn, layer["q_proj"]).reshape(b, s, nh, hd)
    k = linear(xn, layer["k_proj"]).reshape(b, s, nh, hd)
    v = linear(xn, layer["v_proj"]).reshape(b, s, nh, hd)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (hd ** -0.5)
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask[None, None], logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    x = x + linear(o.reshape(b, s, nh * hd), layer["o_proj"])
    xn = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
    gate = linear(xn, layer["gate_proj"])
    up = linear(xn, layer["up_proj"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(up.dtype) * up
    return x + linear(act, layer["down_proj"])


def local_forward(params: Params, cfg: MiMoLocalConfig,
                  embeds: jnp.ndarray, causal: bool = True) -> jnp.ndarray:
    """Qwen2Model over inputs_embeds [B, S, H] → last hidden (incl.
    final norm). causal=False for the input local transformer
    (mimo_audio_llm.py:999)."""
    s = embeds.shape[1]
    cos, sin = compute_cos_sin(jnp.arange(s), cfg.head_dim,
                               cfg.rope_theta)
    x = embeds
    for layer in params["layers"]:
        x = _local_layer(layer, cfg, x, cos, sin, causal)
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


# ---------------------------------------------------------------------------
# Input side: RVQ code groups → global token embeddings
# ---------------------------------------------------------------------------


def encode_groups(params: Params, cfg: MiMoAudioConfig,
                  codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, T_groups, G, C] int32 → [B, T_groups, hidden] global
    audio-patch embeddings: per-channel embedding lookups SUMMED per
    timestep, non-causal input_local_transformer per group, concat of
    the G hiddens through speech_group_downcast (reference :960-1004)."""
    b, tg, g, c = codes.shape
    ild = cfg.input_local.hidden_size
    x = jnp.zeros((b, tg, g, ild),
                  params["speech_embeddings"][0].dtype)
    for i in range(cfg.audio_channels):
        x = x + jnp.take(params["speech_embeddings"][i], codes[..., i],
                         axis=0)
    h = local_forward(params["input_local"], cfg.input_local,
                      x.reshape(b * tg, g, ild), causal=False)
    h = h.reshape(b, tg, g * ild)
    return linear(h, params["speech_group_downcast"])


# ---------------------------------------------------------------------------
# Output side: global hidden → one group of RVQ codes
# ---------------------------------------------------------------------------


def local_decode(params: Params, cfg: MiMoAudioConfig,
                 global_hidden: jnp.ndarray,
                 key: Optional[jax.Array] = None,
                 temperature: float = 0.9, top_k: int = 50
                 ) -> jnp.ndarray:
    """global_hidden [B, hidden] (the backbone hidden that SAMPLED the
    audio patch token) → codes [B, G, C]. Causal delay-pattern decode
    (base_local_forward :786): channel i's token for group slot s is
    sampled at step s + delay[i] and the summed sampled-code embeddings
    feed step+1. key=None → greedy (the reference's default local
    sampler is do_sample=False). Unrolled re-prefill over the
    group_size + max(delay) steps inside one jit."""
    lcfg = cfg.local
    b = global_hidden.shape[0]
    g, c = cfg.group_size, cfg.audio_channels
    steps = g + max(cfg.delay_pattern)
    dtype = params["speech_embeddings"][0].dtype

    x0 = linear(global_hidden.astype(dtype),
                params["hidden_states_downcast"])
    buf = jnp.zeros((b, steps, lcfg.hidden_size), dtype)
    buf = buf.at[:, 0].set(x0)
    codes = jnp.zeros((b, g, c), jnp.int32)
    keys = jax.random.split(key, steps * c).reshape(steps, c) \
        if key is not None else None

    for t in range(steps):
        hidden = local_forward(params["local"], lcfg,
                               buf[:, :t + 1], causal=True)[:, t]
        nxt_embed = jnp.zeros((b, cfg.input_local.hidden_size), dtype)
        for i in range(c):
            d = cfg.delay_pattern[i]
            if not (d <= t < d + g):
                continue
            logits = linear(hidden, params["local_heads"][i]).astype(
                jnp.float32)
            # the empty (zero-emb) id is banned (MiMoSampler.sample
            # removed_tokens, :94-97)
            logits = logits.at[:, cfg.speech_empty_ids[i]].set(-jnp.inf)
            if keys is not None and temperature > 0:
                scaled = logits / max(temperature, 1e-6)
                if 0 < top_k < scaled.shape[-1]:
                    kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
                    scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
                gmb = jax.random.gumbel(keys[t, i], scaled.shape)
                tok = jnp.argmax(scaled + gmb, axis=-1)
            else:
                tok = jnp.argmax(logits, axis=-1)
            tok = tok.astype(jnp.int32)
            codes = codes.at[:, t - d, i].set(tok)
            emb = jnp.take(params["speech_embeddings"][i], tok, axis=0)
            nxt_embed = nxt_embed + emb
        if t + 1 < steps:
            if "speech_embeddings_to_local" in params:
                nxt_embed = linear(nxt_embed,
                                   params["speech_embeddings_to_local"])
            buf = buf.at[:, t + 1].set(nxt_embed)
    return codes


# ---------------------------------------------------------------------------
# Init (tiny-model test tier) + checkpoint loading
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, bias=False):
    p = {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
               k_in ** -0.5).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((n_out,), dtype)
    return p


def _init_local(cfg: MiMoLocalConfig, key: jax.Array, dtype) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 2))
    h = cfg.hidden_size
    params: Params = {"final_norm": jnp.ones((h,), dtype), "layers": []}
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": _lin(next(keys), h, h, dtype, bias=True),
            "k_proj": _lin(next(keys), h, h, dtype, bias=True),
            "v_proj": _lin(next(keys), h, h, dtype, bias=True),
            "o_proj": _lin(next(keys), h, h, dtype),
            "gate_proj": _lin(next(keys), h, cfg.intermediate_size,
                              dtype),
            "up_proj": _lin(next(keys), h, cfg.intermediate_size, dtype),
            "down_proj": _lin(next(keys), cfg.intermediate_size, h,
                              dtype),
        })
    return params


def init_mimo_aux_params(cfg: MiMoAudioConfig, key: jax.Array,
                         dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.audio_channels * 2 + 8))
    ild = cfg.input_local.hidden_size
    ld = cfg.local.hidden_size
    params: Params = {
        "speech_embeddings": [
            (jax.random.normal(next(keys), (cfg.speech_vocab_sizes[i],
                                            ild), jnp.float32) *
             0.02).astype(dtype) for i in range(cfg.audio_channels)],
        "local_heads": [
            _lin(next(keys), ld, cfg.speech_vocab_sizes[i], dtype)
            for i in range(cfg.audio_channels)],
        "speech_group_downcast": _lin(next(keys), ild * cfg.group_size,
                                      cfg.hidden_size, dtype),
        "hidden_states_downcast": _lin(next(keys), cfg.hidden_size, ld,
                                       dtype),
        "local": _init_local(cfg.local, next(keys), dtype),
        "input_local": _init_local(cfg.input_local, next(keys), dtype),
    }
    if ild != ld:
        params["speech_embeddings_to_local"] = _lin(next(keys), ild, ld,
                                                    dtype)
    return params


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


def _assign_local_layer(layer: Params, rest: list[str], v, w, emb) -> bool:
    m = {("self_attn", "q_proj"): "q_proj",
         ("self_attn", "k_proj"): "k_proj",
         ("self_attn", "v_proj"): "v_proj",
         ("self_attn", "o_proj"): "o_proj",
         ("mlp", "gate_proj"): "gate_proj",
         ("mlp", "up_proj"): "up_proj",
         ("mlp", "down_proj"): "down_proj"}
    if len(rest) == 3 and (rest[0], rest[1]) in m:
        slot = layer[m[(rest[0], rest[1])]]
        if rest[2] == "weight":
            slot["w"] = w(v)
        else:
            slot["b"] = emb(v)
        return True
    if rest == ["input_layernorm", "weight"]:
        layer["input_norm"] = emb(v)
        return True
    if rest == ["post_attention_layernorm", "weight"]:
        layer["post_norm"] = emb(v)
        return True
    return False


def load_mimo_audio_checkpoint(src: str, dtype=jnp.bfloat16
                               ) -> dict[str, Any]:
    """HF MiMo-Audio dir → global decoder pytree + aux pytree
    (transformers naming: model.layers.N.self_attn.q_proj,
    local_transformer.layers.N..., input_local_transformer...,
    speech_embeddings.N, local_transformer_lm_heads.N,
    speech_group_downcast / hidden_states_downcast /
    speech_embeddings_to_local, lm_head)."""
    with open(os.path.join(src, "config.json")) as f:
        hf = json.load(f)
    cfg = MiMoAudioConfig.from_hf(hf)
    gcfg = global_config_from_hf(hf)

    from vllm_omni_tpu.models.decoder import init_params

    glob = init_params(gcfg, jax.random.PRNGKey(0), dtype)
    aux = init_mimo_aux_params(cfg, jax.random.PRNGKey(1), dtype)

    def w(v):
        return jnp.asarray(np.ascontiguousarray(v.T)).astype(dtype)

    def emb(v):
        return jnp.asarray(v).astype(dtype)

    unmapped, loaded = [], 0
    for name, v in _iter_safetensors(src):
        ok = False
        parts = name.split(".")
        if name.startswith("model.layers."):
            ok = _assign_local_layer(glob["layers"][int(parts[2])],
                                     parts[3:], v, w, emb)
        elif name == "model.embed_tokens.weight":
            glob["embed"] = emb(v)
            ok = True
        elif name == "model.norm.weight":
            glob["final_norm"] = emb(v)
            ok = True
        elif name == "lm_head.weight":
            glob["lm_head"] = {"w": w(v)}
            ok = True
        elif name.startswith("local_transformer.layers."):
            ok = _assign_local_layer(aux["local"]["layers"][int(parts[2])],
                                     parts[3:], v, w, emb)
        elif name == "local_transformer.norm.weight":
            aux["local"]["final_norm"] = emb(v)
            ok = True
        elif name.startswith("input_local_transformer.layers."):
            ok = _assign_local_layer(
                aux["input_local"]["layers"][int(parts[2])], parts[3:],
                v, w, emb)
        elif name == "input_local_transformer.norm.weight":
            aux["input_local"]["final_norm"] = emb(v)
            ok = True
        elif name.startswith("speech_embeddings."):
            aux["speech_embeddings"][int(parts[1])] = emb(v)
            ok = True
        elif name.startswith("local_transformer_lm_heads."):
            aux["local_heads"][int(parts[1])] = {"w": w(v)}
            ok = True
        elif name.startswith("speech_group_downcast."):
            aux["speech_group_downcast"]["w" if parts[-1] == "weight"
                                         else "b"] = \
                w(v) if parts[-1] == "weight" else emb(v)
            ok = True
        elif name.startswith("hidden_states_downcast."):
            aux["hidden_states_downcast"]["w" if parts[-1] == "weight"
                                          else "b"] = \
                w(v) if parts[-1] == "weight" else emb(v)
            ok = True
        elif name.startswith("speech_embeddings_to_local."):
            aux.setdefault("speech_embeddings_to_local", {})
            aux["speech_embeddings_to_local"][
                "w" if parts[-1] == "weight" else "b"] = \
                w(v) if parts[-1] == "weight" else emb(v)
            ok = True
        if ok:
            loaded += 1
        else:
            unmapped.append(name)
    if unmapped:
        logger.warning("mimo_audio: %d unmapped tensors, e.g. %s",
                       len(unmapped), unmapped[:8])
    if loaded == 0:
        raise ValueError(f"no mimo_audio tensors mapped from {src}")
    logger.info("mimo_audio: %d tensors loaded (global %d layers, local "
                "%d, input_local %d)", loaded, gcfg.num_layers,
                cfg.local.num_layers, cfg.input_local.num_layers)
    return {"global": (gcfg, glob), "aux": (cfg, aux), "hf_config": hf}
