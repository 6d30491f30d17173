"""Qwen3-Omni family fine structure: talker codec stack + MTP code
predictor + code2wav tower, with HF-checkpoint weight mapping.

Reference parity (structure + numerics):
- talker: reference model_executor/models/qwen3_omni/qwen3_omni_moe_talker.py:58
  (codec_head, text/hidden ResizeMLP projections, MoE text tower with
  shared expert) — our text tower is models/decoder.py with
  shared_expert_intermediate_size set.
- code predictor (MTP): reference
  models/common/qwen3_code_predictor.py:318 (re-prefill wrapper, per-group
  embedding tables + lm_heads, HF-exact f32 RMSNorm/RoPE numerics). Our
  TPU version runs ALL frame positions as one batch and lax.scans over
  the G-1 residual codebook groups with a fixed [B, G+1, H] buffer —
  static shapes, one jit, no KV cache (the sequence is ≤ G+1 tokens).
- code2wav: reference qwen3_omni_code2wav.py:34 — code embedding
  (mean over RVQ groups), sliding-window pre-transformer with layer
  scale, ConvNeXt upsampling, SnakeBeta decoder blocks → waveform.

Weight layout follows the HF `Qwen3OmniMoeForConditionalGeneration`
checkpoint (transformers qwen3_omni_moe), prefixes thinker./talker./
code2wav. — load with `load_qwen3_omni_checkpoint`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.decoder import DecoderConfig, Params, linear
from vllm_omni_tpu.ops.layernorm import layer_norm, rms_norm
from vllm_omni_tpu.ops.rope import apply_rope, compute_cos_sin


# ---------------------------------------------------------------------------
# Talker projections (thinker dim → talker dim)
# ---------------------------------------------------------------------------


def resize_mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """linear_fc1 → silu → linear_fc2 (reference ResizeMLP,
    qwen3_omni_moe_talker.py:452)."""
    h = linear(x, p["fc1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    return linear(h, p["fc2"])


def project_thinker_outputs(talker_params: Params,
                            thinker_embeds: Optional[jnp.ndarray],
                            thinker_hidden: Optional[jnp.ndarray],
                            mm_mask: Optional[jnp.ndarray] = None
                            ) -> jnp.ndarray:
    """Text positions use text_projection(embeds); multimodal positions
    use hidden_projection(hidden states) (reference
    project_thinker_outputs, qwen3_omni_moe_talker.py:232)."""
    if thinker_hidden is None or mm_mask is None:
        return resize_mlp(talker_params["text_projection"], thinker_embeds)
    if thinker_embeds is None:
        return resize_mlp(talker_params["hidden_projection"],
                          thinker_hidden)
    text = resize_mlp(talker_params["text_projection"], thinker_embeds)
    mm = resize_mlp(talker_params["hidden_projection"], thinker_hidden)
    return jnp.where(mm_mask[..., None], mm, text)


# ---------------------------------------------------------------------------
# MTP code predictor
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class CodePredictorConfig:
    vocab_size: int
    hidden_size: int
    intermediate_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    num_code_groups: int
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    qk_norm: bool = True  # Qwen3-style per-head q/k RMSNorm

    @classmethod
    def from_hf(cls, hf: Any) -> "CodePredictorConfig":
        get = (lambda k, d=None: getattr(hf, k, d)) if not isinstance(
            hf, dict) else (lambda k, d=None: hf.get(k, d))
        return cls(
            vocab_size=get("vocab_size"),
            hidden_size=get("hidden_size"),
            intermediate_size=get("intermediate_size"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            head_dim=get("head_dim") or
            get("hidden_size") // get("num_attention_heads"),
            num_code_groups=get("num_code_groups"),
            rope_theta=get("rope_theta", 10000.0),
            rms_norm_eps=get("rms_norm_eps", 1e-6))


def _cp_attention(layer: Params, cfg: CodePredictorConfig, x: jnp.ndarray,
                  cos: jnp.ndarray, sin: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Dense causal attention over the short (≤ G+1) code sequence.
    mask: [T, T] additive (0 / -inf)."""
    b, t, _ = x.shape
    d = cfg.head_dim
    q = linear(x, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
    k = linear(x, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    v = linear(x, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
    if cfg.qk_norm:
        q = rms_norm(q, layer["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, layer["k_norm"], cfg.rms_norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    g = cfg.num_heads // cfg.num_kv_heads
    k = jnp.repeat(k, g, axis=2)
    v = jnp.repeat(v, g, axis=2)
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * (d ** -0.5)
    s = s + mask[None, None]
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bhts,bshd->bthd", p, v,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return linear(o.reshape(b, t, cfg.num_heads * d), layer["o_proj"])


def _cp_forward(params: Params, cfg: CodePredictorConfig,
                embeds: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """embeds [B, T, H] → final hidden [B, T, H] (HF-exact block:
    pre-norm attention + SwiGLU MLP, f32 norms)."""
    t = embeds.shape[1]
    pos = jnp.arange(t)[None, :]
    cos, sin = compute_cos_sin(pos, cfg.head_dim, cfg.rope_theta)
    x = embeds
    for layer in params["layers"]:
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        x = x + _cp_attention(layer, cfg, h, cos, sin, mask)
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        gate = linear(h, layer["gate_proj"])
        up = linear(h, layer["up_proj"])
        x = x + linear(jax.nn.silu(gate.astype(jnp.float32)).astype(
            h.dtype) * up, layer["down_proj"])
    return rms_norm(x, params["final_norm"], cfg.rms_norm_eps)


def code_predictor_generate(params: Params, cfg: CodePredictorConfig,
                            talker_hidden: jnp.ndarray,
                            layer0_embed: jnp.ndarray,
                            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy MTP decode of residual RVQ groups 1..G-1.

    talker_hidden / layer0_embed: [B, H] (per codec frame; callers batch
    all frames of all requests into B). Returns (codes [B, G-1],
    summed_embeds [B, H] — the sum of the G-1 residual codec embeddings,
    plus layer-0's, is the talker's next-step input embedding; here we
    return the residual sum, layer-0 embedding is the caller's).

    Reference re-prefills a growing sequence per group
    (qwen3_code_predictor.py:318); we keep a fixed [B, G+1, H] buffer and
    re-run the (tiny) transformer each scan step — static shapes, one
    compiled program for all groups.
    """
    b, h = talker_hidden.shape
    g_total = cfg.num_code_groups  # G; we predict groups 1..G-1
    t_max = g_total + 1
    buf = jnp.zeros((b, t_max, h), talker_hidden.dtype)
    buf = buf.at[:, 0].set(talker_hidden)
    buf = buf.at[:, 1].set(layer0_embed)

    base_mask = jnp.where(
        jnp.tril(jnp.ones((t_max, t_max), bool)), 0.0, -jnp.inf)
    # embeddings/heads stacked for dynamic indexing inside the scan
    embeds_s = params["codec_embeddings"]  # [G-1, V, H]
    heads_s = params["lm_heads"]           # [G-1, H, V]

    def step(carry, g):
        buf = carry
        # keys beyond the current length stay masked out
        valid = jnp.arange(t_max) < (g + 2)
        mask = jnp.where(valid[None, :], base_mask, -jnp.inf)
        hidden = _cp_forward(params, cfg, buf, mask)
        last = hidden[:, g + 1]  # position of the newest embedding
        w = jax.lax.dynamic_index_in_dim(heads_s, g, keepdims=False)
        logits = jnp.dot(last, w.astype(last.dtype),
                         preferred_element_type=jnp.float32)
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]
        table = jax.lax.dynamic_index_in_dim(embeds_s, g, keepdims=False)
        emb = jnp.take(table, code, axis=0).astype(buf.dtype)
        buf = buf.at[:, g + 2].set(emb)
        return buf, (code, emb)

    buf, (codes, embs) = jax.lax.scan(step, buf,
                                      jnp.arange(g_total - 1))
    codes = jnp.moveaxis(codes, 0, 1)          # [B, G-1]
    summed = jnp.sum(embs, axis=0)             # [B, H]
    return codes, summed


def init_code_predictor(cfg: CodePredictorConfig, key: jax.Array,
                        dtype=jnp.float32) -> Params:
    """Random init (tiny-model tier)."""
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 6))
    h, d = cfg.hidden_size, cfg.head_dim

    def lin(k_in, n_out):
        return {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                        jnp.float32) *
                      k_in ** -0.5).astype(dtype)}

    params: Params = {
        "layers": [],
        "final_norm": jnp.ones((h,), dtype),
        "codec_embeddings": (jax.random.normal(
            next(keys), (cfg.num_code_groups - 1, cfg.vocab_size, h),
            jnp.float32) * 0.02).astype(dtype),
        "lm_heads": (jax.random.normal(
            next(keys), (cfg.num_code_groups - 1, h, cfg.vocab_size),
            jnp.float32) * h ** -0.5).astype(dtype),
    }
    for _ in range(cfg.num_layers):
        layer = {
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": lin(h, cfg.num_heads * d),
            "k_proj": lin(h, cfg.num_kv_heads * d),
            "v_proj": lin(h, cfg.num_kv_heads * d),
            "o_proj": lin(cfg.num_heads * d, h),
            "gate_proj": lin(h, cfg.intermediate_size),
            "up_proj": lin(h, cfg.intermediate_size),
            "down_proj": lin(cfg.intermediate_size, h),
        }
        if cfg.qk_norm:
            layer["q_norm"] = jnp.ones((d,), dtype)
            layer["k_norm"] = jnp.ones((d,), dtype)
        params["layers"].append(layer)
    return params


# ---------------------------------------------------------------------------
# Code2Wav
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Code2WavConfig:
    codebook_size: int = 2048
    hidden_size: int = 1024
    num_quantizers: int = 16
    num_layers: int = 8
    num_heads: int = 16
    num_kv_heads: int = 16
    intermediate_size: int = 3072
    sliding_window: int = 72
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    layer_scale_initial_scale: float = 0.01
    upsampling_ratios: tuple[int, ...] = (2, 2)
    upsample_rates: tuple[int, ...] = (8, 5, 4, 3)
    decoder_dim: int = 1536

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def total_upsample(self) -> int:
        n = 1
        for f in self.upsample_rates + self.upsampling_ratios:
            n *= f
        return n

    @classmethod
    def from_hf(cls, hf: Any) -> "Code2WavConfig":
        get = (lambda k, d=None: getattr(hf, k, d)) if not isinstance(
            hf, dict) else (lambda k, d=None: hf.get(k, d))
        return cls(
            codebook_size=get("codebook_size"),
            hidden_size=get("hidden_size"),
            num_quantizers=get("num_quantizers"),
            num_layers=get("num_hidden_layers"),
            num_heads=get("num_attention_heads"),
            num_kv_heads=get("num_key_value_heads"),
            intermediate_size=get("intermediate_size"),
            sliding_window=get("sliding_window", 72),
            rope_theta=get("rope_theta", 10000.0),
            rms_norm_eps=get("rms_norm_eps", 1e-5),
            layer_scale_initial_scale=get("layer_scale_initial_scale",
                                          0.01),
            upsampling_ratios=tuple(get("upsampling_ratios", (2, 2))),
            upsample_rates=tuple(get("upsample_rates", (8, 5, 4, 3))),
            decoder_dim=get("decoder_dim"))


def _causal_conv1d(x: jnp.ndarray, p: Params, *, kernel_size: int,
                   stride: int = 1, dilation: int = 1,
                   groups: int = 1) -> jnp.ndarray:
    """HF Qwen3OmniMoeCausalConvNet: left-pad (k_eff - stride), plus
    extra right padding so every input frame lands in a full window.
    x: [B, T, C]."""
    t = x.shape[1]
    k_eff = (kernel_size - 1) * dilation + 1
    pad = k_eff - stride
    n_frames = (t - k_eff + pad) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (k_eff - pad)
    extra = ideal - t
    x = jnp.pad(x, ((0, 0), (pad, extra), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(stride,),
        padding="VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32).astype(x.dtype)
    return out + p["b"].astype(x.dtype)


def _causal_trans_conv1d(x: jnp.ndarray, p: Params, *, kernel_size: int,
                         stride: int) -> jnp.ndarray:
    """HF Qwen3OmniMoeCausalTransConvNet: full transposed conv then crop
    (k - s) frames from each side.

    Implemented as the equivalent fractionally-strided conv (zeros
    inserted via lhs_dilation, full padding): the loader stores the
    torch ConvTranspose1d kernel time-flipped in [k, in, out] layout so
    this is numerically identical to torch's transposed conv."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=(1,),
        padding=((kernel_size - 1, kernel_size - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NTC", "TIO", "NTC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    out = out + p["b"].astype(x.dtype)
    pad = kernel_size - stride
    return out[:, pad:out.shape[1] - pad] if pad else out


def _convnext_block(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """Depthwise causal conv7 → LN → pw conv ×4 → GELU → pw conv →
    gamma-scaled residual."""
    c = x.shape[-1]
    h = _causal_conv1d(x, p["dwconv"], kernel_size=7, groups=c)
    h = layer_norm(h, p["norm_w"], p["norm_b"], eps=1e-6)
    h = linear(h, p["pwconv1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
        x.dtype)
    h = linear(h, p["pwconv2"])
    return x + p["gamma"].astype(x.dtype) * h


def _snake_beta(x: jnp.ndarray, p: Params) -> jnp.ndarray:
    """SnakeBeta: x + 1/(e^beta + eps) * sin^2(x * e^alpha). x: [B,T,C],
    params [C]."""
    xf = x.astype(jnp.float32)
    alpha = jnp.exp(p["alpha"].astype(jnp.float32))
    beta = jnp.exp(p["beta"].astype(jnp.float32))
    out = xf + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(xf * alpha))
    return out.astype(x.dtype)


def _c2w_pre_transformer(params: Params, cfg: Code2WavConfig,
                         x: jnp.ndarray) -> jnp.ndarray:
    """Sliding-window causal transformer with per-sublayer LayerScale."""
    b, t, _ = x.shape
    d = cfg.head_dim
    pos = jnp.arange(t)[None, :]
    cos, sin = compute_cos_sin(pos, d, cfg.rope_theta)
    i = jnp.arange(t)
    delta = i[:, None] - i[None, :]
    mask = jnp.where((delta >= 0) & (delta < cfg.sliding_window),
                     0.0, -jnp.inf)
    for layer in params["layers"]:
        h = rms_norm(x, layer["input_norm"], cfg.rms_norm_eps)
        q = linear(h, layer["q_proj"]).reshape(b, t, cfg.num_heads, d)
        k = linear(h, layer["k_proj"]).reshape(b, t, cfg.num_kv_heads, d)
        v = linear(h, layer["v_proj"]).reshape(b, t, cfg.num_kv_heads, d)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        g = cfg.num_heads // cfg.num_kv_heads
        if g > 1:
            k = jnp.repeat(k, g, axis=2)
            v = jnp.repeat(v, g, axis=2)
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32) * (d ** -0.5)
        s = s + mask[None, None]
        pw = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhts,bshd->bthd", pw, v,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        o = linear(o.reshape(b, t, cfg.num_heads * d), layer["o_proj"])
        x = x + layer["attn_scale"].astype(x.dtype) * o
        h = rms_norm(x, layer["post_norm"], cfg.rms_norm_eps)
        gate = linear(h, layer["gate_proj"])
        up = linear(h, layer["up_proj"])
        m = linear(jax.nn.silu(gate.astype(jnp.float32)).astype(h.dtype) *
                   up, layer["down_proj"])
        x = x + layer["mlp_scale"].astype(x.dtype) * m
    return rms_norm(x, params["norm"], cfg.rms_norm_eps)


def code2wav_forward(params: Params, cfg: Code2WavConfig,
                     codes: jnp.ndarray) -> jnp.ndarray:
    """codes [B, num_quantizers, T] → waveform [B, T * total_upsample]
    (reference qwen3_omni_code2wav.py:122)."""
    offsets = (jnp.arange(cfg.num_quantizers) *
               cfg.codebook_size)[None, :, None]
    emb = jnp.take(params["code_embedding"], codes + offsets,
                   axis=0)  # [B, Q, T, H]
    hidden = jnp.mean(emb, axis=1)  # [B, T, H]
    hidden = _c2w_pre_transformer(params["pre_transformer"], cfg, hidden)
    for i, factor in enumerate(cfg.upsampling_ratios):
        up = params["upsample"][i]
        hidden = _causal_trans_conv1d(hidden, up["trans_conv"],
                                      kernel_size=factor, stride=factor)
        hidden = _convnext_block(hidden, up["convnext"])
    # decoder: conv_in → blocks (snake, transconv, 3 res units) → snake →
    # conv_out
    dec = params["decoder"]
    wav = _causal_conv1d(hidden, dec["conv_in"], kernel_size=7)
    for i, rate in enumerate(cfg.upsample_rates):
        blk = dec["blocks"][i]
        wav = _snake_beta(wav, blk["snake"])
        wav = _causal_trans_conv1d(wav, blk["trans_conv"],
                                   kernel_size=2 * rate, stride=rate)
        for j in range(3):
            ru = blk["res_units"][j]
            r = _snake_beta(wav, ru["snake1"])
            r = _causal_conv1d(r, ru["conv1"], kernel_size=7,
                               dilation=(1, 3, 9)[j])
            r = _snake_beta(r, ru["snake2"])
            r = _causal_conv1d(r, ru["conv2"], kernel_size=1)
            wav = wav + r
    wav = _snake_beta(wav, dec["snake_out"])
    wav = _causal_conv1d(wav, dec["conv_out"], kernel_size=7)
    return jnp.clip(wav[..., 0], -1.0, 1.0)


def code2wav_chunked(params: Params, cfg: Code2WavConfig,
                     codes: jnp.ndarray, chunk: int = 50,
                     left_context: int = 25) -> jnp.ndarray:
    """Chunked decode with left context for long sequences / streaming
    (reference chunked_decode, qwen3_omni_code2wav.py:160): each chunk is
    decoded with `left_context` frames of history, the overlap samples
    dropped. Host loop — each chunk is one jit call at a bucketed size."""
    b, q, t = codes.shape
    ups = cfg.total_upsample
    outs = []
    start = 0
    while start < t:
        ctx = min(left_context, start)
        end = min(start + chunk, t)
        piece = codes[:, :, start - ctx:end]
        wav = code2wav_forward(params, cfg, piece)
        outs.append(wav[:, ctx * ups:])
        start = end
    return jnp.concatenate(outs, axis=1)


def init_code2wav(cfg: Code2WavConfig, key: jax.Array,
                  dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 12 +
                                 len(cfg.upsampling_ratios) * 8 +
                                 len(cfg.upsample_rates) * 16 + 16))
    h = cfg.hidden_size

    def lin(k_in, n_out, bias=False):
        p = {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                     jnp.float32) *
                   k_in ** -0.5).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((n_out,), dtype)
        return p

    def conv(k, cin, cout, groups=1):
        return {"w": (jax.random.normal(next(keys), (k, cin // groups,
                                                     cout), jnp.float32) *
                      (k * cin // groups) ** -0.5).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    pre = {"layers": [], "norm": jnp.ones((h,), dtype)}
    d = cfg.head_dim
    for _ in range(cfg.num_layers):
        pre["layers"].append({
            "input_norm": jnp.ones((h,), dtype),
            "post_norm": jnp.ones((h,), dtype),
            "q_proj": lin(h, cfg.num_heads * d),
            "k_proj": lin(h, cfg.num_kv_heads * d),
            "v_proj": lin(h, cfg.num_kv_heads * d),
            "o_proj": lin(cfg.num_heads * d, h),
            "gate_proj": lin(h, cfg.intermediate_size),
            "up_proj": lin(h, cfg.intermediate_size),
            "down_proj": lin(cfg.intermediate_size, h),
            "attn_scale": jnp.full((h,), cfg.layer_scale_initial_scale,
                                   dtype),
            "mlp_scale": jnp.full((h,), cfg.layer_scale_initial_scale,
                                  dtype),
        })
    upsample = []
    for factor in cfg.upsampling_ratios:
        upsample.append({
            "trans_conv": conv(factor, h, h),
            "convnext": {
                "dwconv": conv(7, h, h, groups=h),
                "norm_w": jnp.ones((h,), dtype),
                "norm_b": jnp.zeros((h,), dtype),
                "pwconv1": lin(h, 4 * h, bias=True),
                "pwconv2": lin(4 * h, h, bias=True),
                "gamma": jnp.full((h,), 1e-6, dtype),
            },
        })
    blocks = []
    for i, rate in enumerate(cfg.upsample_rates):
        cin = cfg.decoder_dim // (2 ** i)
        cout = cfg.decoder_dim // (2 ** (i + 1))
        blocks.append({
            "snake": {"alpha": jnp.zeros((cin,), dtype),
                      "beta": jnp.zeros((cin,), dtype)},
            "trans_conv": conv(2 * rate, cin, cout),
            "res_units": [{
                "snake1": {"alpha": jnp.zeros((cout,), dtype),
                           "beta": jnp.zeros((cout,), dtype)},
                "conv1": conv(7, cout, cout),
                "snake2": {"alpha": jnp.zeros((cout,), dtype),
                           "beta": jnp.zeros((cout,), dtype)},
                "conv2": conv(1, cout, cout),
            } for _ in range(3)],
        })
    out_dim = cfg.decoder_dim // 2 ** len(cfg.upsample_rates)
    return {
        "code_embedding": (jax.random.normal(
            next(keys), (cfg.codebook_size * cfg.num_quantizers, h),
            jnp.float32) * 0.02).astype(dtype),
        "pre_transformer": pre,
        "upsample": upsample,
        "decoder": {
            "conv_in": conv(7, h, cfg.decoder_dim),
            "blocks": blocks,
            "snake_out": {"alpha": jnp.zeros((out_dim,), dtype),
                          "beta": jnp.zeros((out_dim,), dtype)},
            "conv_out": conv(7, out_dim, 1),
        },
    }


# ---------------------------------------------------------------------------
# HF checkpoint loading (Qwen3OmniMoeForConditionalGeneration layout)
# ---------------------------------------------------------------------------


def load_qwen3_omni_checkpoint(path: str, dtype=jnp.float32,
                               only: Optional[set] = None
                               ) -> dict[str, Any]:
    """Load an HF `Qwen3OmniMoeForConditionalGeneration` checkpoint
    directory (config.json + safetensors with thinker./talker./code2wav.
    prefixes) into our pytrees.

    Returns {"hf_config", "thinker": (DecoderConfig, params),
    "talker": (DecoderConfig, params), "code_predictor":
    (CodePredictorConfig, params), "code2wav": (Code2WavConfig, params),
    "talker_extras": {text_projection, hidden_projection},
    "unmapped": [names]}. Weight-name layout follows transformers
    qwen3_omni_moe (reference hf_to_vllm_mapper,
    qwen3_omni_moe_talker.py:83).
    """
    import json
    import os

    import numpy as np

    from vllm_omni_tpu.models.weights import (_assign,
                                              _collect_safetensor_files,
                                              _finalize_experts,
                                              hf_config_to_decoder_config)

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    thinker_hf = hf["thinker_config"]
    text_hf = dict(thinker_hf.get("text_config", thinker_hf))
    if not text_hf.get("architectures"):  # nested configs save None here
        text_hf["architectures"] = ["Qwen3OmniMoeForConditionalGeneration"]
    thinker_cfg = hf_config_to_decoder_config(text_hf)
    talker_hf = hf["talker_config"]
    talker_cfg = talker_decoder_config(talker_hf)
    cp_cfg = CodePredictorConfig.from_hf(
        talker_hf["code_predictor_config"])
    c2w_cfg = Code2WavConfig.from_hf(hf["code2wav_config"])

    thinker: dict = {"layers": [dict() for _ in
                                range(thinker_cfg.num_layers)]}
    talker: dict = {"layers": [dict() for _ in
                               range(talker_cfg.num_layers)]}
    cp: dict = {"layers": [dict() for _ in range(cp_cfg.num_layers)]}
    cp_embeds: dict[int, np.ndarray] = {}
    cp_heads: dict[int, np.ndarray] = {}
    want = only or {"thinker", "talker", "code2wav"}
    c2w = init_code2wav(c2w_cfg, jax.random.PRNGKey(0), dtype) \
        if "code2wav" in want else {}
    extras: dict = {"text_projection": {"fc1": {}, "fc2": {}},
                    "hidden_projection": {"fc1": {}, "fc2": {}}}
    unmapped: list[str] = []

    def as_dt(v):
        return jnp.asarray(v).astype(dtype)

    def conv_w(v):  # torch Conv1d [out, in, k] → TIO [k, in, out]
        return as_dt(np.transpose(v, (2, 1, 0)))

    def tconv_w(v):  # torch ConvTranspose1d [in, out, k] → flipped TIO
        return as_dt(np.transpose(v[:, :, ::-1], (2, 0, 1)))

    def route_c2w(parts: list[str], v) -> bool:
        if parts[:2] == ["code_embedding", "weight"]:
            c2w["code_embedding"] = as_dt(v)
            return True
        if parts[0] == "pre_transformer":
            if parts[1] == "norm":
                c2w["pre_transformer"]["norm"] = as_dt(v)
                return True
            if parts[1] != "layers":
                return False
            layer = c2w["pre_transformer"]["layers"][int(parts[2])]
            rest = parts[3:]
            m = {("input_layernorm", "weight"): "input_norm",
                 ("post_attention_layernorm", "weight"): "post_norm"}
            if tuple(rest) in m:
                layer[m[tuple(rest)]] = as_dt(v)
                return True
            if rest[0] == "self_attn_layer_scale" and rest[1] == "scale":
                layer["attn_scale"] = as_dt(v)
                return True
            if rest[0] == "mlp_layer_scale" and rest[1] == "scale":
                layer["mlp_scale"] = as_dt(v)
                return True
            if rest[0] in ("self_attn", "mlp") and rest[1] in (
                    "q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
                    "up_proj", "down_proj"):
                slot = layer.setdefault(rest[1], {})
                slot["w" if rest[2] == "weight" else "b"] = \
                    as_dt(v.T if rest[2] == "weight" else v)
                return True
            return False
        if parts[0] == "upsample":
            up = c2w["upsample"][int(parts[1])]
            rest = parts[2:]
            if rest[0] == "0" and rest[1] == "conv":  # trans conv
                up["trans_conv"]["w" if rest[2] == "weight" else "b"] = \
                    tconv_w(v) if rest[2] == "weight" else as_dt(v)
                return True
            if rest[0] == "1":  # ConvNeXt block
                cn = up["convnext"]
                if rest[1] == "dwconv" and rest[2] == "conv":
                    cn["dwconv"]["w" if rest[3] == "weight" else "b"] = \
                        conv_w(v) if rest[3] == "weight" else as_dt(v)
                    return True
                if rest[1] == "norm":
                    cn["norm_w" if rest[2] == "weight" else "norm_b"] = \
                        as_dt(v)
                    return True
                if rest[1] in ("pwconv1", "pwconv2"):
                    cn[rest[1]]["w" if rest[2] == "weight" else "b"] = \
                        as_dt(v.T if rest[2] == "weight" else v)
                    return True
                if rest[1] == "gamma":
                    cn["gamma"] = as_dt(v)
                    return True
            return False
        if parts[0] == "decoder":
            i = int(parts[1])
            rest = parts[2:]
            n_blocks = len(c2w_cfg.upsample_rates)
            dec = c2w["decoder"]
            if i == 0 and rest[0] == "conv":
                dec["conv_in"]["w" if rest[1] == "weight" else "b"] = \
                    conv_w(v) if rest[1] == "weight" else as_dt(v)
                return True
            if 1 <= i <= n_blocks:  # decoder block
                blk = dec["blocks"][i - 1]
                if rest[0] != "block":
                    return False
                j = int(rest[1])
                sub = rest[2:]
                if j == 0:  # SnakeBeta
                    blk["snake"][sub[0]] = as_dt(v)
                    return True
                if j == 1 and sub[0] == "conv":  # trans conv
                    blk["trans_conv"][
                        "w" if sub[1] == "weight" else "b"] = \
                        tconv_w(v) if sub[1] == "weight" else as_dt(v)
                    return True
                if 2 <= j <= 4:  # residual units
                    ru = blk["res_units"][j - 2]
                    if sub[0] in ("act1", "act2"):
                        ru["snake1" if sub[0] == "act1" else "snake2"][
                            sub[1]] = as_dt(v)
                        return True
                    if sub[0] in ("conv1", "conv2") and sub[1] == "conv":
                        ru[sub[0]]["w" if sub[2] == "weight" else "b"] = \
                            conv_w(v) if sub[2] == "weight" else as_dt(v)
                        return True
                return False
            if i == n_blocks + 1:  # SnakeBeta out
                dec["snake_out"][rest[0]] = as_dt(v)
                return True
            if i == n_blocks + 2 and rest[0] == "conv":
                dec["conv_out"]["w" if rest[1] == "weight" else "b"] = \
                    conv_w(v) if rest[1] == "weight" else as_dt(v)
                return True
        return False

    def route(name: str, v) -> bool:
        if name.startswith("thinker."):
            if "thinker" not in want:
                return True
            sub = name[len("thinker."):]
            if sub.startswith(("audio_tower.", "visual.")):
                return True  # encoder towers: loaded by models/encoders
            return _assign(thinker, sub, v, dtype, thinker_cfg)
        if name.startswith("talker.") and "talker" not in want:
            return True
        if name.startswith("code2wav.") and "code2wav" not in want:
            return True
        if name.startswith("talker.code_predictor."):
            sub = name[len("talker.code_predictor."):]
            parts = sub.split(".")
            if parts[0] == "lm_head":
                cp_heads[int(parts[1])] = np.asarray(v).T
                return True
            if parts[:2] == ["model", "codec_embedding"]:
                cp_embeds[int(parts[2])] = np.asarray(v)
                return True
            return _assign(cp, sub, v, dtype, cp_cfg)
        if name.startswith("talker."):
            sub = name[len("talker."):]
            parts = sub.split(".")
            if parts[0] == "codec_head":
                talker["lm_head"] = {"w": as_dt(np.asarray(v).T)}
                return True
            if parts[0] in ("text_projection", "hidden_projection"):
                fc = {"linear_fc1": "fc1", "linear_fc2": "fc2"}[parts[1]]
                slot = extras[parts[0]][fc]
                slot["w" if parts[2] == "weight" else "b"] = \
                    as_dt(np.asarray(v).T if parts[2] == "weight" else v)
                return True
            return _assign(talker, sub, v, dtype, talker_cfg)
        if name.startswith("code2wav."):
            return route_c2w(name[len("code2wav."):].split("."), v)
        return False

    for f in _collect_safetensor_files(path):
        from safetensors import safe_open

        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = jnp.asarray(arr).view(jnp.bfloat16)
                if not route(name, arr):
                    unmapped.append(name)
    _finalize_experts(thinker, thinker_cfg)
    _finalize_experts(talker, talker_cfg)
    if cp_embeds:
        cp["codec_embeddings"] = as_dt(np.stack(
            [cp_embeds[i] for i in sorted(cp_embeds)]))
    if cp_heads:
        cp["lm_heads"] = as_dt(np.stack(
            [cp_heads[i] for i in sorted(cp_heads)]))
    return {"hf_config": hf,
            "thinker": (thinker_cfg, thinker),
            "talker": (talker_cfg, talker),
            "code_predictor": (cp_cfg, cp),
            "code2wav": (c2w_cfg, c2w),
            "talker_extras": extras,
            "unmapped": unmapped}


def talker_decoder_config(talker_hf: Any) -> DecoderConfig:
    """Talker text tower → DecoderConfig (MoE + shared expert +
    qk_norm)."""
    text = talker_hf["text_config"] if isinstance(talker_hf, dict) else \
        talker_hf.text_config
    get = (lambda k, d=None: text.get(k, d)) if isinstance(text, dict) \
        else (lambda k, d=None: getattr(text, k, d))
    num_heads = get("num_attention_heads")
    return DecoderConfig(
        vocab_size=get("vocab_size"),
        hidden_size=get("hidden_size"),
        intermediate_size=get("intermediate_size", 0) or 0,
        num_layers=get("num_hidden_layers"),
        num_heads=num_heads,
        num_kv_heads=get("num_key_value_heads", num_heads),
        head_dim=get("head_dim") or get("hidden_size") // num_heads,
        rope_theta=get("rope_theta", 10000.0),
        rms_norm_eps=get("rms_norm_eps", 1e-6),
        tie_word_embeddings=False,
        qk_norm=True,
        num_experts=get("num_experts", 0) or 0,
        num_experts_per_tok=get("num_experts_per_tok", 0) or 0,
        moe_intermediate_size=get("moe_intermediate_size", 0) or 0,
        norm_topk_prob=get("norm_topk_prob", True),
        shared_expert_intermediate_size=get(
            "shared_expert_intermediate_size", 0) or 0,
    )
