"""Generic dense / MoE transformer decoder (Llama, Qwen2, Qwen3, Qwen3-MoE).

Covers the text backbones of the reference's AR families (thinker/talker
towers of qwen2_5_omni / qwen3_omni, reference
model_executor/models/qwen3_omni/*): pre-norm decoder blocks, GQA + RoPE,
SwiGLU MLP or top-k routed MoE, optional QK-norm (Qwen3) and attention
bias (Qwen2).

Design (TPU-first, not a port):
- A model is a pure function over a parameter *pytree* (nested dicts of
  jnp arrays). No module classes — the runner jits closures over
  `decoder_forward` and donates the KV cache buffers.
- Attention is injected: the caller passes ``attn_apply(layer_idx, q, k,
  v) -> out`` which owns paged-KV writes + paged attention (prefill or
  decode). The model never sees cache layout.
- Quantized linears carry their method in the *dtype* of the stored
  weight (int8 / uint8-nibble-packed int4 / float8), so the pytree stays
  pure arrays with no static leaves; see `linear`.
- Sharding is a parallel pytree of PartitionSpecs (`param_shardings`):
  column-parallel q/k/v/gate/up, row-parallel o/down — jit + XLA SPMD
  inserts the psum that the reference got from NCCL all_reduce (reference
  tensor-parallel docs docs/design/feature/tensor_parallel.md).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.ops.layernorm import rms_norm
from vllm_omni_tpu.ops.quant import quantized_matmul
from vllm_omni_tpu.ops.rope import apply_rope, compute_cos_sin

Params = dict
AttnApply = Callable[[int, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                     jnp.ndarray]


@dataclass(frozen=True)
class DecoderConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    tie_word_embeddings: bool = False
    qk_norm: bool = False  # Qwen3 per-head RMSNorm on q/k
    attention_bias: bool = False  # Qwen2 qkv bias
    # GLM-4 family (GLM-Image AR text core): 4 norms per layer
    # (post_self_attn / post_mlp sandwich norms) + partial rotary with
    # the glm4 permuted-interleaved application
    sandwich_norm: bool = False
    partial_rotary_factor: float = 1.0
    glm4_rope: bool = False
    # GPT-J-style interleaved RoPE pairs (Fish Speech; reference
    # fish_speech_slow_ar.py _fix_rope_style). False = NeoX half-split.
    rope_interleaved: bool = False
    max_position_embeddings: int = 4096
    # M-RoPE: head_dim/2 frequency slots split between (time, height,
    # width) position streams (Qwen-VL/Omni; reference patches vLLM's
    # MRotaryEmbedding, patch.py:108-119). None = standard 1D RoPE.
    mrope_section: Optional[tuple[int, ...]] = None
    # MoE (0 experts = dense). Qwen3-MoE: all layers sparse.
    num_experts: int = 0
    num_experts_per_tok: int = 0
    moe_intermediate_size: int = 0
    norm_topk_prob: bool = True
    # Qwen2-MoE-style always-on shared expert gated by a sigmoid scalar
    # (the Qwen3-Omni talker text tower keeps it; plain Qwen3-MoE
    # dropped it). 0 = none.
    shared_expert_intermediate_size: int = 0
    # W8A8: per-token int8 activation quant feeding native s8×s8 MXU
    # dots on int8-quantized linears (83.4% of HBM speed-of-light on
    # v5e with fused projections vs 78.5% upcast —
    # benchmarks/layer_variants.py). Set by the loader when
    # quantization="int8" and the fused layout is active.
    act_quant: bool = False

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0

    @property
    def q_size(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def kv_size(self) -> int:
        return self.num_kv_heads * self.head_dim


# ---------------------------------------------------------------------------
# Linear with quantization-by-dtype dispatch
# ---------------------------------------------------------------------------


def linear(x: jnp.ndarray, p: Params, group_size: int = 128,
           act8: bool = False) -> jnp.ndarray:
    """x [..., K] @ weight [K, N]. `p` holds either {"w"} (full precision)
    or {"w_q", "scale"} with the quant method encoded in w_q.dtype:
    int8 → per-channel int8; uint8 → nibble-packed grouped int4;
    float8_e4m3fn → fp8 W8A8. Optional bias under "b". act8: int8
    weights take the W8A8 native-dot path (per-token act quant)."""
    if "w" in p:
        out = jnp.dot(x, p["w"].astype(x.dtype),
                      preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        w_q = p["w_q"]
        if w_q.dtype == jnp.int8:
            method = "int8"
        elif w_q.dtype == jnp.uint8:
            method = "int4"
            # group size travels implicitly: K / num scale groups
            group_size = (2 * w_q.shape[0]) // p["scale"].shape[0]
        else:
            method = "fp8"
        out = quantized_matmul(x, w_q, p["scale"], method,
                               group_size=group_size, act8=act8)
    if "lora_a" in p:
        # runtime LoRA (models/lora.py): rank-r bypass added to the base
        # matmul — the only option for quantized bases, negligible FLOPs
        lora = jnp.dot(jnp.dot(x, p["lora_a"].astype(x.dtype),
                               preferred_element_type=jnp.float32)
                       .astype(x.dtype),
                       p["lora_b"].astype(x.dtype),
                       preferred_element_type=jnp.float32)
        out = out + lora.astype(out.dtype)
    if "b" in p:
        out = out + p["b"].astype(out.dtype)
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attention_block(layer: Params, cfg: DecoderConfig, x: jnp.ndarray,
                     cos: jnp.ndarray, sin: jnp.ndarray, layer_idx: int,
                     attn_apply: AttnApply) -> jnp.ndarray:
    b, t, _ = x.shape
    d = cfg.head_dim
    a8 = cfg.act_quant
    if "qkv_proj" in layer:
        # fused projection (single-device layout; the loader keeps q/k/v
        # separate under TP where a contiguous column split would mix
        # them): one weight stream + one activation quant for all three
        qkv = linear(x, layer["qkv_proj"], act8=a8)
        q = qkv[..., :cfg.q_size].reshape(b, t, cfg.num_heads, d)
        k = qkv[..., cfg.q_size:cfg.q_size + cfg.kv_size].reshape(
            b, t, cfg.num_kv_heads, d)
        v = qkv[..., cfg.q_size + cfg.kv_size:].reshape(
            b, t, cfg.num_kv_heads, d)
    else:
        q = linear(x, layer["q_proj"], act8=a8).reshape(
            b, t, cfg.num_heads, d)
        k = linear(x, layer["k_proj"], act8=a8).reshape(
            b, t, cfg.num_kv_heads, d)
        v = linear(x, layer["v_proj"], act8=a8).reshape(
            b, t, cfg.num_kv_heads, d)
    if cfg.qk_norm:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    if cfg.glm4_rope:
        import functools

        from vllm_omni_tpu.ops.rope import apply_rope_glm4

        _rope_fn = functools.partial(
            apply_rope_glm4,
            rotary_dim=int(cfg.head_dim * cfg.partial_rotary_factor))
    elif cfg.rope_interleaved:
        from vllm_omni_tpu.ops.rope import \
            apply_rope_interleaved as _rope_fn
    else:
        _rope_fn = apply_rope
    q = _rope_fn(q, cos, sin)
    k = _rope_fn(k, cos, sin)
    attn = attn_apply(layer_idx, q, k, v)  # [B, T, Hq, D]
    return linear(attn.reshape(b, t, cfg.q_size), layer["o_proj"],
                  act8=a8)


def _dense_mlp(layer: Params, x: jnp.ndarray,
               act8: bool = False) -> jnp.ndarray:
    if "gate_up_proj" in layer:
        gu = linear(x, layer["gate_up_proj"], act8=act8)
        i = gu.shape[-1] // 2
        gate, up = gu[..., :i], gu[..., i:]
    else:
        gate = linear(x, layer["gate_proj"], act8=act8)
        up = linear(x, layer["up_proj"], act8=act8)
    return linear(jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up,
                  layer["down_proj"], act8=act8)


def _moe_mlp(layer: Params, cfg: DecoderConfig, x: jnp.ndarray
             ) -> jnp.ndarray:
    """Top-k routed MoE, dense dispatch.

    Every expert runs on every token and results are combined with the
    (sparse) routing weights. At serving batch sizes on TPU the MoE layer
    is weight-bandwidth-bound — all experts' weights stream from HBM
    regardless once the batch covers the expert set — so dense dispatch is
    bandwidth-neutral and keeps shapes static for XLA. (A sorted grouped
    Pallas matmul is the planned upgrade for large-batch prefill.)
    """
    b, t, h = x.shape
    xf = x.reshape(b * t, h)
    router_logits = jnp.dot(xf, layer["router"]["w"].astype(xf.dtype),
                            preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(router_logits, axis=-1)  # [T, E]
    topk_p, topk_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)
    combine = jnp.zeros_like(probs).at[
        jnp.arange(xf.shape[0])[:, None], topk_i].set(topk_p)  # [T, E]

    ew = layer["experts"]
    # [T,H] x [E,H,I] → [E,T,I]
    gate = jnp.einsum("th,ehi->eti", xf, ew["gate"].astype(xf.dtype),
                      preferred_element_type=jnp.float32)
    up = jnp.einsum("th,ehi->eti", xf, ew["up"].astype(xf.dtype),
                    preferred_element_type=jnp.float32)
    act = jax.nn.silu(gate) * up
    out = jnp.einsum("eti,eih->eth", act.astype(x.dtype),
                     ew["down"].astype(x.dtype),
                     preferred_element_type=jnp.float32)  # [E,T,H]
    mixed = jnp.einsum("te,eth->th", combine.astype(jnp.float32), out)
    if "shared_expert" in layer:
        se = layer["shared_expert"]
        gate_s = linear(xf, se["gate_proj"])
        up_s = linear(xf, se["up_proj"])
        shared = linear(jax.nn.silu(gate_s.astype(jnp.float32)).astype(
            xf.dtype) * up_s, se["down_proj"])
        if "shared_expert_gate" in layer:
            # Qwen2-MoE style: sigmoid-scalar-gated shared expert
            sg = jax.nn.sigmoid(jnp.dot(
                xf, layer["shared_expert_gate"]["w"].astype(xf.dtype),
                preferred_element_type=jnp.float32))  # [T, 1]
            mixed = mixed + sg * shared.astype(jnp.float32)
        else:
            # HunYuan style: always-on shared MLP added unconditionally
            # (transformers HunYuanMoEV1Moe.forward)
            mixed = mixed + shared.astype(jnp.float32)
    return mixed.astype(x.dtype).reshape(b, t, h)


def decoder_forward(params: Params, cfg: DecoderConfig,
                    token_ids: Optional[jnp.ndarray],
                    positions: jnp.ndarray, attn_apply: AttnApply,
                    input_embeds: Optional[jnp.ndarray] = None,
                    collect_hidden: Optional[tuple] = None):
    """token_ids [B, T] (or input_embeds [B, T, H]) → hidden [B, T, H].

    positions [B, T] absolute positions for RoPE. Embeddings-as-prompt
    (input_embeds) is how next-stage talker prompts arrive (reference:
    OmniEmbedsPrompt inputs/data.py:85).

    ``collect_hidden``: indices into the transformers
    ``output_hidden_states`` tuple to also return (0 = embeddings,
    k = input of layer k for 1 <= k <= N-1, N = final normed output).
    Diffusion-side LLM text towers consume intermediate states — z_image
    takes hidden_states[-2] (pipeline_z_image.py:283), flux2 stacks
    layers (10, 20, 30) (pipeline_flux2.py:414). When given, returns
    (final, {idx: hidden}).
    """
    if input_embeds is not None:
        x = input_embeds
    else:
        x = jnp.take(params["embed"], token_ids, axis=0)
    if cfg.mrope_section is not None and positions.ndim == 3:
        # positions [B, 3, T]: per-batch-row M-RoPE
        from vllm_omni_tpu.ops.rope import compute_mrope_cos_sin

        # GLM-Image: M-RoPE sections cover only the PARTIAL rotary dims
        # (mrope_section [8,12,12] sums to rotary_dim/2 at factor 0.5)
        _rd = int(cfg.head_dim * cfg.partial_rotary_factor) \
            if cfg.glm4_rope else cfg.head_dim
        cos, sin = jax.vmap(
            lambda p: compute_mrope_cos_sin(p, _rd,
                                            cfg.mrope_section,
                                            cfg.rope_theta))(positions)
    else:
        if positions.ndim == 3:  # mrope ids given but model is 1D-rope
            positions = positions[:, 0]
        rope_dim = int(cfg.head_dim * cfg.partial_rotary_factor) \
            if cfg.glm4_rope else cfg.head_dim
        cos, sin = compute_cos_sin(positions, rope_dim, cfg.rope_theta)
    collected: dict = {}
    want = frozenset(collect_hidden or ())
    for i, layer in enumerate(params["layers"]):
        if i in want:
            collected[i] = x
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        att = _attention_block(layer, cfg, h, cos, sin, i, attn_apply)
        if cfg.sandwich_norm:  # GLM-4: norm BEFORE the residual add
            att = rms_norm(att, layer["post_self_attn_norm"],
                           cfg.rms_norm_eps)
        x = x + att
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        if cfg.is_moe:
            mlp_out = _moe_mlp(layer, cfg, h)
        else:
            mlp_out = _dense_mlp(layer, h, act8=cfg.act_quant)
        if cfg.sandwich_norm:
            mlp_out = rms_norm(mlp_out, layer["post_mlp_norm"],
                               cfg.rms_norm_eps)
        x = x + mlp_out
    out = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if collect_hidden is None:
        return out
    n = len(params["layers"])
    if n in want:
        collected[n] = out
    return out, collected


def compute_logits(params: Params, cfg: DecoderConfig,
                   hidden: jnp.ndarray) -> jnp.ndarray:
    """hidden [..., H] → logits [..., V] in float32."""
    if cfg.tie_word_embeddings:
        out = jnp.dot(hidden, params["embed"].T.astype(hidden.dtype),
                      preferred_element_type=jnp.float32)
    else:
        out = linear(hidden, params["lm_head"],
                     act8=cfg.act_quant).astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# Init (random weights — tiny-model test tier, reference SURVEY.md §4
# "tiny-model strategy")
# ---------------------------------------------------------------------------


def _init_linear(key, k_in: int, n_out: int, dtype, bias: bool = False,
                 quant: Optional[str] = None,
                 group_size: int = 128) -> Params:
    w = (jax.random.normal(key, (k_in, n_out), jnp.float32) *
         (k_in ** -0.5)).astype(dtype)
    if quant is None:
        p = {"w": w}
    else:
        from vllm_omni_tpu.ops.quant import (quantize_fp8, quantize_int4,
                                             quantize_int8)

        fn = {"int8": quantize_int8, "fp8": quantize_fp8,
              "int4": lambda x: quantize_int4(x, group_size)}[quant]
        q, s = fn(w)
        del w  # XLA frees the full-precision weight inside the program
        p = {"w_q": q, "scale": s}
    if bias:
        p["b"] = jnp.zeros((n_out,), dtype)
    return p


def init_params(cfg: DecoderConfig, key: jax.Array, dtype=jnp.bfloat16,
                quant: Optional[str] = None,
                group_size: int = 128, fused: bool = False,
                quant_lm_head: bool = False) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 4))
    h, d = cfg.hidden_size, cfg.head_dim
    params: Params = {
        "embed": (jax.random.normal(next(keys), (cfg.vocab_size, h),
                                    jnp.float32) * 0.02).astype(dtype),
        "final_norm": jnp.ones((h,), dtype),
        "layers": [],
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _init_linear(
            next(keys), h, cfg.vocab_size, dtype,
            quant=quant if quant_lm_head else None, group_size=group_size)
    for _ in range(cfg.num_layers):
        # fused layouts are produced by fuse_layer_params below so the
        # random draw is identical across layouts (TP-vs-single parity
        # tests compare the same model)
        layer: Params = {
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
        }
        if cfg.sandwich_norm:
            layer["post_self_attn_norm"] = jnp.ones((h,), dtype)
            layer["post_mlp_norm"] = jnp.ones((h,), dtype)
        layer.update({
            "q_proj": _init_linear(
                next(keys), h, cfg.q_size, dtype, cfg.attention_bias,
                quant, group_size),
            "k_proj": _init_linear(
                next(keys), h, cfg.kv_size, dtype, cfg.attention_bias,
                quant, group_size),
            "v_proj": _init_linear(
                next(keys), h, cfg.kv_size, dtype, cfg.attention_bias,
                quant, group_size),
            "o_proj": _init_linear(next(keys), cfg.q_size, h, dtype,
                                   False, quant, group_size),
        })
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((d,), dtype)
            layer["k_norm"] = jnp.ones((d,), dtype)
        if cfg.is_moe:
            e, i = cfg.num_experts, cfg.moe_intermediate_size
            k1, k2, k3, k4 = jax.random.split(next(keys), 4)
            layer["router"] = {"w": (jax.random.normal(
                k1, (h, e), jnp.float32) * h ** -0.5).astype(dtype)}
            layer["experts"] = {
                "gate": (jax.random.normal(k2, (e, h, i), jnp.float32) *
                         h ** -0.5).astype(dtype),
                "up": (jax.random.normal(k3, (e, h, i), jnp.float32) *
                       h ** -0.5).astype(dtype),
                "down": (jax.random.normal(k4, (e, i, h), jnp.float32) *
                         i ** -0.5).astype(dtype),
            }
            if cfg.shared_expert_intermediate_size > 0:
                si = cfg.shared_expert_intermediate_size
                k5, k6, k7, k8 = jax.random.split(next(keys), 4)
                layer["shared_expert"] = {
                    "gate_proj": _init_linear(k5, h, si, dtype),
                    "up_proj": _init_linear(k6, h, si, dtype),
                    "down_proj": _init_linear(k7, si, h, dtype),
                }
                layer["shared_expert_gate"] = {"w": (
                    jax.random.normal(k8, (h, 1), jnp.float32) *
                    h ** -0.5).astype(dtype)}
        else:
            layer["gate_proj"] = _init_linear(
                next(keys), h, cfg.intermediate_size, dtype, False, quant,
                group_size)
            layer["up_proj"] = _init_linear(
                next(keys), h, cfg.intermediate_size, dtype, False, quant,
                group_size)
            layer["down_proj"] = _init_linear(
                next(keys), cfg.intermediate_size, h, dtype, False, quant,
                group_size)
        params["layers"].append(layer)
    if fused:
        fuse_layer_params(params)
    return params


def fuse_layer_params(params: Params) -> Params:
    """Concatenate per-layer q/k/v → qkv_proj and gate/up →
    gate_up_proj in place. Works on full-precision ("w") and quantized
    ("w_q" + per-channel "scale") leaves alike — per-output-channel
    int8/fp8 scales and nibble-packed int4 columns concatenate exactly.
    Single-device layout only (under TP the separate projections keep
    contiguous column splits head-aligned)."""

    def cat(parts: list[Params]) -> Params:
        fused: Params = {}
        for leaf in ("w", "w_q"):
            if leaf in parts[0]:
                fused[leaf] = jnp.concatenate(
                    [p[leaf] for p in parts], axis=1)
        if "scale" in parts[0]:
            fused["scale"] = jnp.concatenate(
                [p["scale"] for p in parts], axis=-1)
        if all("b" in p for p in parts):
            fused["b"] = jnp.concatenate([p["b"] for p in parts])
        return fused

    for layer in params.get("layers", []):
        if all(k in layer for k in ("q_proj", "k_proj", "v_proj")):
            layer["qkv_proj"] = cat(
                [layer.pop(n) for n in ("q_proj", "k_proj", "v_proj")])
        if "gate_proj" in layer and "up_proj" in layer:
            layer["gate_up_proj"] = cat(
                [layer.pop("gate_proj"), layer.pop("up_proj")])
    return params


# ---------------------------------------------------------------------------
# Sharding (tensor parallel over mesh axis "tp")
# ---------------------------------------------------------------------------

_COL = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj", "lm_head",
        # fused layouts exist only at tp==1 (a contiguous column split
        # would mix q/k/v); specs listed for completeness
        "qkv_proj", "gate_up_proj"}
_ROW = {"o_proj", "down_proj"}


def _linear_spec(name: str, leaf_name: str, leaf: Any) -> P:
    col = name in _COL
    if leaf_name == "w":
        return P(None, "tp") if col else P("tp", None)
    if leaf_name == "w_q":
        return P(None, "tp") if col else P("tp", None)
    if leaf_name == "b":
        return P("tp") if col else P(None)
    if leaf_name == "scale":
        if leaf.ndim == 1:  # int8/fp8 per-channel [N]
            return P("tp") if col else P(None)
        # int4 grouped [K/G, N]
        return P(None, "tp") if col else P("tp", None)
    return P()


def param_shardings(params: Params,
                    expert_parallel: bool = False) -> Params:
    """PartitionSpec pytree matching `params` for TP over axis "tp".

    Replaces the reference's RankGenerator/GroupCoordinator machinery
    (diffusion/distributed/parallel_state.py:676): the mesh + these specs
    are the entire parallelism definition; XLA inserts the collectives.

    expert_parallel: shard MoE experts on the EXPERT dim over "tp"
    instead of the intermediate dim — each rank owns E/tp whole experts
    and the combine einsum contracts the expert dim into a psum
    (reference EP overlay, docs/design/feature/expert_parallel.md:31-36;
    EP reuses the existing mesh axes rather than adding one).
    """

    def walk(path: tuple, leaf: Any) -> P:
        names = [p.key for p in path if hasattr(p, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if leaf_name == "embed":
            return P(None, "tp")
        if leaf_name in ("final_norm", "input_norm", "post_norm", "q_norm",
                         "k_norm"):
            return P()
        if parent in _COL or parent in _ROW:
            return _linear_spec(parent, leaf_name, leaf)
        if parent == "router":
            return P()
        if parent == "experts":
            if expert_parallel:
                return P("tp", None, None)
            if leaf_name in ("gate", "up"):
                return P(None, None, "tp")
            if leaf_name == "down":
                return P(None, "tp", None)
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


# ---------------------------------------------------------------------------
# Pipeline parallelism (AR stages)
#
# Reference AR stages inherit vLLM's pipeline parallelism (SURVEY.md
# §2.5); here PP is a GPipe schedule inside ONE jitted program: decoder
# layer groups live on "pp" mesh ranks (stacked-leading-dim params and
# paged KV sharded over dim 0), activations hand off rank→rank via
# `ppermute` over batch-row microbatches. No host P2P plane, no NCCL
# send/recv — the handoff is one ICI collective per tick.
# ---------------------------------------------------------------------------


def stack_layer_params(layers: list) -> Params:
    """Per-layer param dicts → one pytree with a leading [L] axis (the
    unit PP shards over the "pp" mesh axis)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def decoder_forward_pp(params: Params, cfg: DecoderConfig,
                       token_ids: Optional[jnp.ndarray],
                       positions: jnp.ndarray, mesh,
                       kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                       slot_ids: jnp.ndarray, block_tables: jnp.ndarray,
                       q_start: Optional[jnp.ndarray],
                       kv_lens: jnp.ndarray, scale: float,
                       kv_quant: str = "none", decode: bool = False,
                       input_embeds: Optional[jnp.ndarray] = None):
    """GPipe pipeline-parallel decoder forward.

    params must carry "layers_stacked" (stack_layer_params output).
    kv_k/kv_v: stacked paged caches [L, n_pages, hkv, ps, D] sharded
    P("pp") on dim 0 — each rank stores KV only for its own layer
    group. Batch rows are split into `pp` microbatches (falling back to
    one when B % pp != 0 — correct, no overlap); fill/drain ticks
    compute on zero activations and write their KV to the reserved
    null page (slot 0), which masked attention never reads with
    nonzero probability. Embedding, RoPE tables, and the LM head stay
    replicated — at inference the dominant memory (layer weights + KV)
    scales 1/pp. Returns (hidden [B, T, H], kv_k', kv_v').
    Constraints (v1): dense layers (no MoE), tp == dp == 1, legacy KV
    quant scales only.
    """
    from vllm_omni_tpu.ops.attention import (paged_attention_decode_xla,
                                             paged_attention_prefill_xla,
                                             quantize_kv,
                                             write_kv_pages_xla)

    if input_embeds is not None:
        x = input_embeds
    else:
        x = jnp.take(params["embed"], token_ids, axis=0)
    if positions.ndim == 3:
        positions = positions[:, 0]
    cos, sin = compute_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    pp = mesh.shape["pp"]
    n_layers = cfg.num_layers
    assert n_layers % pp == 0, (n_layers, pp)
    stacked = params["layers_stacked"]
    b, t = x.shape[0], x.shape[1]
    micro = pp if b % pp == 0 else 1
    mb = b // micro
    ticks = micro + pp - 1
    qs = q_start if q_start is not None else jnp.zeros((b,), jnp.int32)
    eps = cfg.rms_norm_eps

    def apply_layer(layer, kp, vp, x_mb, cos_mb, sin_mb, slots_mb,
                    bt_mb, qs_mb, kvl_mb):
        cell = {}

        def attn(i, q, k, v):
            del i
            bq, tq = q.shape[0], q.shape[1]
            k_flat = k.reshape(bq * tq, cfg.num_kv_heads, cfg.head_dim)
            v_flat = v.reshape(bq * tq, cfg.num_kv_heads, cfg.head_dim)
            kq, vq = quantize_kv(k_flat, v_flat, kv_quant)
            kp2, vp2 = write_kv_pages_xla(kp, vp, kq, vq,
                                          slots_mb.reshape(-1))
            cell["kv"] = (kp2, vp2)
            if decode:
                o = paged_attention_decode_xla(
                    q.reshape(bq, cfg.num_heads, cfg.head_dim), kp2, vp2,
                    bt_mb, kvl_mb, scale)
                return o.reshape(bq, 1, cfg.num_heads, cfg.head_dim)
            return paged_attention_prefill_xla(q, kp2, vp2, bt_mb, qs_mb,
                                               kvl_mb, scale)

        h = rms_norm(x_mb, layer["input_norm"], eps)
        x_mb = x_mb + _attention_block(layer, cfg, h, cos_mb, sin_mb, 0,
                                       attn)
        h = rms_norm(x_mb, layer["post_norm"], eps)
        x_mb = x_mb + _dense_mlp(layer, h, act8=cfg.act_quant)
        return x_mb, cell["kv"]

    def rank_fn(layers, kvk, kvv, x_all, cos_a, sin_a, slots_a, bt_a,
                qs_a, kvl_a):
        g = jax.lax.axis_index("pp")
        state = jnp.zeros_like(x_all[:mb])
        out = jnp.zeros_like(x_all)
        perm = [(i, (i + 1) % pp) for i in range(pp)]

        def row_slice(a, idx):
            return jax.lax.dynamic_slice_in_dim(a, idx * mb, mb, 0)

        for tick in range(ticks):
            incoming = jax.lax.ppermute(state, "pp", perm)
            my_mb = tick - g
            valid = (my_mb >= 0) & (my_mb < micro)
            idx = jnp.clip(my_mb, 0, micro - 1)
            first = row_slice(x_all, jnp.clip(tick, 0, micro - 1))
            feed = jnp.where(g == 0, first, incoming)
            # fill/drain ticks write KV garbage to the null page (finite
            # values; masked attention multiplies them by exactly 0)
            slots_mb = jnp.where(valid, row_slice(slots_a, idx), 0)
            args = (row_slice(cos_a, idx), row_slice(sin_a, idx),
                    slots_mb, row_slice(bt_a, idx), row_slice(qs_a, idx),
                    row_slice(kvl_a, idx))

            def one(carry, xs):
                layer, kp, vp = xs
                y, (kp2, vp2) = apply_layer(layer, kp, vp, carry[0],
                                            *args)
                return (y,), (kp2, vp2)

            (state,), (kvk, kvv) = jax.lax.scan(one, (feed,),
                                                (layers, kvk, kvv))
            m_out = tick - (pp - 1)
            ok = (g == pp - 1) & (m_out >= 0)
            widx = jnp.clip(m_out, 0, micro - 1)
            cur = row_slice(out, widx)
            out = jax.lax.dynamic_update_slice_in_dim(
                out, jnp.where(ok, state, cur), widx * mb, 0)
        out = jnp.where(g == pp - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(out, "pp"), kvk, kvv

    pp_spec = P("pp")
    fn = jax.shard_map(
        rank_fn, mesh=mesh,
        in_specs=(pp_spec, pp_spec, pp_spec, P(), P(), P(), P(), P(),
                  P(), P()),
        out_specs=(P(), pp_spec, pp_spec),
        check_vma=False)
    hidden, kv_k2, kv_v2 = fn(stacked, kv_k, kv_v, x, cos, sin,
                              slot_ids, block_tables, qs, kv_lens)
    return rms_norm(hidden, params["final_norm"], eps), kv_k2, kv_v2
