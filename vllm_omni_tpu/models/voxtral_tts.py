"""Voxtral TTS: Mistral LM + per-step flow-matching acoustic head +
causal ALiBi codec decoder.

Reference: /root/reference/vllm_omni/model_executor/models/voxtral_tts/
(voxtral_tts_audio_generation.py FlowMatchingAudioTransformer:394-611 —
per decode step the LLM hidden drives a semantic-codebook argmax head
plus a continuous flow-match over the n_acoustic-dim FSQ space: Euler
t 0→1 over linspace, CFG α=1.2 with the llm conditioning zeroed for
the guidance branch, clamp→scale→round→+len(special);
voxtral_tts_audio_tokenizer.py — MultiVocabEmbeddings:428 sums
offset-shifted codebook embeddings into the next LM input,
VoxtralTTSAudioTokenizer:721 decodes code frames through
[semantic EMA codebook | FSQ rescale] → causal conv/transformer stack
with ALiBi sliding-window attention (qk-norm over the flattened head
dim, LayerScale, silu w1·w3→w2 FFN) → patch unfold → waveform;
voxtral_tts.py make_omni_output:286 forces the next text token to
audio/eos from the semantic code).

TPU mapping: the Mistral backbone IS this stage's decoder with its
lm_head replaced by ``semantic_codebook_output`` — the sampled token
IS the semantic code (greedy + FixedLogitMask reproduces the masked
argmax), EOS = END_AUDIO, and the engine's in-loop step conditioner
(worker/model_runner.set_step_conditioner) runs the acoustic flow
solve + multivocab embedding inside the jitted decode chain, streaming
each frame's [semantic, acoustic×N] column via StepResult.codes. The
codec decoder runs as a code2wav stage (aux "code2wav_voxtral").
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.models.decoder import linear

logger = init_logger(__name__)

Params = dict

N_SPECIAL = 2  # [EMPTY_AUDIO, END_AUDIO] (AudioSpecialTokens)
EMPTY_AUDIO_ID = 0
END_AUDIO_ID = 1


def _round128(n: int) -> int:
    return 128 * ((n + 127) // 128)


@dataclass
class VoxtralTTSSpec:
    llm_hidden: int = 3072
    semantic_size: int = 8192     # raw (incl. reserved absence token)
    acoustic_levels: int = 21
    n_acoustic: int = 36
    # acoustic transformer (AcousticTransformerArgs defaults)
    at_dim: int = 768
    at_layers: int = 3
    at_heads: int = 6
    at_kv_heads: int = 2
    at_head_dim: int = 128
    at_hidden_dim: int = 2048
    at_norm_eps: float = 1e-5
    n_steps: int = 7
    cfg_alpha: float = 1.2

    @property
    def codebook_sizes(self) -> list[int]:
        """With special tokens (get_codebook_sizes(None, True))."""
        return [self.semantic_size + N_SPECIAL] + \
            [self.acoustic_levels + N_SPECIAL] * self.n_acoustic

    @property
    def offsets(self) -> np.ndarray:
        return np.cumsum([0] + self.codebook_sizes[:-1]).astype(
            np.int32)

    @property
    def embed_vocab(self) -> int:
        return _round128(sum(self.codebook_sizes))

    @property
    def semantic_head_dim(self) -> int:
        return _round128(self.semantic_size + N_SPECIAL)

    @property
    def num_groups(self) -> int:
        return 1 + self.n_acoustic

    @classmethod
    def from_config(cls, hf: dict) -> "VoxtralTTSSpec":
        ac = hf.get("audio_config") or {}
        ama = dict(ac.get("audio_model_args") or {})
        if "codebook_sizes" in ama:
            sizes = [int(c) for c in str(ama["codebook_sizes"]
                                         ).split(",")]
            ama.setdefault("semantic_codebook_size", sizes[0])
            ama.setdefault("acoustic_codebook_size", sizes[1])
            ama.setdefault("n_acoustic_codebook", len(sizes) - 1)
        at = ama.get("acoustic_transformer_args") or {}
        text = hf.get("text_config") or {}
        return cls(
            llm_hidden=at.get("input_dim",
                              text.get("hidden_size", 3072)),
            semantic_size=ama.get("semantic_codebook_size", 8192),
            acoustic_levels=ama.get("acoustic_codebook_size", 21),
            n_acoustic=ama.get("n_acoustic_codebook", 36),
            at_dim=at.get("dim", 768),
            at_layers=at.get("n_layers", 3),
            at_heads=at.get("n_heads", 6),
            at_kv_heads=at.get("n_kv_heads", 2),
            at_head_dim=at.get("head_dim", 128),
            at_hidden_dim=at.get("hidden_dim", 2048),
            at_norm_eps=at.get("norm_eps", 1e-5),
            n_steps=at.get("n_decoding_steps") or 7,
        )


def is_voxtral_tts_config(hf: dict) -> bool:
    archs = hf.get("architectures") or []
    return hf.get("model_type") == "voxtral_tts" or any(
        "VoxtralTTS" in a for a in archs)


# ---------------------------------------------------------------------------
# acoustic flow-matching head
# ---------------------------------------------------------------------------


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32)).astype(x.dtype)


def at_time_embedding(inv_freq: jnp.ndarray,
                      t: jnp.ndarray) -> jnp.ndarray:
    """TimeEmbedding (:376): t [B, 1] ⊗ inv_freq [dim//2] →
    [cos | sin] [B, dim]."""
    emb = jnp.einsum("bi,j->bj", t.astype(jnp.float32),
                     inv_freq.astype(jnp.float32))
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


def at_transformer(p: Params, spec: VoxtralTTSSpec,
                   x: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional no-rope blocks over the 3-token stream [B, S, D]
    (AcousticTransformerBlock:327)."""
    b, s, _ = x.shape
    nh, nkv, hd = spec.at_heads, spec.at_kv_heads, spec.at_head_dim
    for layer in p["layers"]:
        h = _rms(x, layer["attention_norm"], spec.at_norm_eps)
        q = linear(h, layer["wq"]).reshape(b, s, nh, hd)
        k = linear(h, layer["wk"]).reshape(b, s, nkv, hd)
        v = linear(h, layer["wv"]).reshape(b, s, nkv, hd)
        g = nh // nkv
        kr = jnp.repeat(k, g, axis=2)
        vr = jnp.repeat(v, g, axis=2)
        sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        kr.astype(jnp.float32)) * (hd ** -0.5)
        pr = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(vr.dtype),
                       vr).reshape(b, s, nh * hd)
        x = x + linear(o, layer["wo"])
        h = _rms(x, layer["ffn_norm"], spec.at_norm_eps)
        up = jax.nn.silu(linear(h, layer["w1"]).astype(
            jnp.float32)).astype(x.dtype) * linear(h, layer["w3"])
        x = x + linear(up, layer["w2"])
    return _rms(x, p["norm"], spec.at_norm_eps)


def at_predict_velocity(p: Params, spec: VoxtralTTSSpec,
                        x_t: jnp.ndarray, llm: jnp.ndarray,
                        t_emb: jnp.ndarray) -> jnp.ndarray:
    """_predict_velocity (:559): stream [x_proj, t_proj, llm_proj] →
    transformer → acoustic head on token 0. x_t [B, C], llm [B, Dllm],
    t_emb [B, D] → [B, C]."""
    dtype = p["input_projection"]["w"].dtype
    toks = jnp.stack([
        linear(x_t.astype(dtype), p["input_projection"]),
        linear(t_emb.astype(dtype), p["time_projection"]),
        linear(llm.astype(dtype), p["llm_projection"]),
    ], axis=1)
    h = at_transformer(p, spec, toks)
    return linear(h[:, 0], p["acoustic_codebook_output"]).astype(
        jnp.float32)


def acoustic_decode_frame(p: Params, spec: VoxtralTTSSpec,
                          semantic: jnp.ndarray, llm: jnp.ndarray,
                          noise: jnp.ndarray) -> jnp.ndarray:
    """decode_one_frame (:511): Euler t 0→1 over linspace(0,1,n+1)
    with CFG α (uncond llm = 0), clamp [-1,1], scale to levels, round,
    END_AUDIO rows → EMPTY, +N_SPECIAL. semantic [B] (with-special
    ids), llm [B, Dllm], noise [B, C] → codes [B, C] int32."""
    b = llm.shape[0]
    ts = np.linspace(0.0, 1.0, spec.n_steps + 1, dtype=np.float32)
    x = noise.astype(jnp.float32)
    llm2 = jnp.concatenate([llm, jnp.zeros_like(llm)], axis=0)
    for i in range(spec.n_steps):
        t = float(ts[i])
        dt = float(ts[i + 1] - ts[i])
        t_emb = at_time_embedding(p["time_inv_freq"],
                                  jnp.full((b, 1), t))
        v_all = at_predict_velocity(
            p, spec, jnp.concatenate([x, x], axis=0), llm2,
            jnp.concatenate([t_emb, t_emb], axis=0))
        v = (spec.cfg_alpha * v_all[:b] +
             (1.0 - spec.cfg_alpha) * v_all[b:])
        x = x + v * dt
    x = jnp.clip(x, -1.0, 1.0)
    scaled = (x + 1.0) / 2.0 * (spec.acoustic_levels - 1)
    codes = jnp.round(scaled).astype(jnp.int32)
    end = (semantic == END_AUDIO_ID)[:, None]
    codes = jnp.where(end, EMPTY_AUDIO_ID, codes)
    return codes + N_SPECIAL


def multivocab_embed(table: jnp.ndarray, offsets: jnp.ndarray,
                     codes: jnp.ndarray) -> jnp.ndarray:
    """MultiVocabEmbeddings (:428) + encode_tokens sum (:968):
    codes [B, K] (with-special per-codebook ids) → Σ_k
    table[codes_k + offset_k] [B, H]."""
    ids = codes + offsets[None, :]
    return jnp.take(table, ids, axis=0).sum(axis=1)


def semantic_logit_mask(spec: VoxtralTTSSpec) -> np.ndarray:
    """forward (:585-588): EMPTY_AUDIO masked, ids past
    N_SPECIAL+semantic_size masked; END_AUDIO allowed."""
    row = np.zeros((spec.semantic_head_dim,), np.float32)
    row[EMPTY_AUDIO_ID] = -1e30
    row[N_SPECIAL + spec.semantic_size:] = -1e30
    return row


def make_voxtral_conditioner(spec: VoxtralTTSSpec, aux: Params):
    """→ (fn, num_groups, aux_builder=None) for
    ModelRunner.set_step_conditioner. Per decode step: the sampled
    token IS the semantic code (the stage lm_head is
    semantic_codebook_output); acoustic codes flow-match from the
    hidden that sampled it; next input embedding = Σ codebook embeds
    (encode_tokens)."""
    head = aux["head"]
    table = aux["embed_table"]
    offsets = jnp.asarray(spec.offsets)
    key0 = jax.random.PRNGKey(0)

    def fn(tok, emb, ph, ctr):
        b = tok.shape[0]
        noise = jax.random.normal(
            jax.random.fold_in(key0, jnp.reshape(ctr, ())),
            (b, spec.n_acoustic), jnp.float32)
        ac = acoustic_decode_frame(head, spec, tok, ph.astype(
            jnp.float32), noise)
        codes = jnp.concatenate(
            [tok[:, None].astype(jnp.int32), ac], axis=1)
        new_emb = multivocab_embed(table, offsets, codes).astype(
            emb.dtype)
        return new_emb, codes

    return fn, spec.num_groups, None


# ---------------------------------------------------------------------------
# codec (audio tokenizer) decoder
# ---------------------------------------------------------------------------


@dataclass
class VoxtralCodecArgs:
    """AudioTokenizerArgs (voxtral_tts_audio_tokenizer.py:57),
    decoder-relevant subset."""
    sampling_rate: int = 24000
    pretransform_patch_size: int = 240
    patch_proj_kernel_size: int = 7
    semantic_size: int = 8192
    semantic_dim: int = 256
    acoustic_levels: int = 21
    acoustic_dim: int = 36
    dim: int = 1024
    hidden_dim: int = 4096
    head_dim: int = 128
    n_heads: int = 8
    n_kv_heads: int = 8
    qk_norm: bool = True
    qk_norm_eps: float = 1e-6
    norm_eps: float = 1e-2
    layer_scale: bool = True
    window: int = 16
    half_window_rule: bool = True
    decoder_transformer_lengths: tuple = (2, 2, 2, 2)
    decoder_convs_kernels: tuple = (3, 4, 4, 4)
    decoder_convs_strides: tuple = (1, 2, 2, 2)

    @property
    def latent_dim(self) -> int:
        return self.semantic_dim + self.acoustic_dim

    @property
    def downsample_factor(self) -> int:
        return self.pretransform_patch_size * int(
            np.prod(self.decoder_convs_strides))

    @classmethod
    def from_config(cls, hf: dict) -> "VoxtralCodecArgs":
        ca = dict((hf.get("audio_config") or {}).get("codec_args")
                  or {})

        def lst(key, default):
            v = ca.get(key + "_str")
            if v is None:
                return default
            return tuple(int(i) for i in str(v).split(","))

        return cls(
            sampling_rate=ca.get("sampling_rate", 24000),
            pretransform_patch_size=ca.get("pretransform_patch_size",
                                           240),
            patch_proj_kernel_size=ca.get("patch_proj_kernel_size", 7),
            semantic_size=ca.get("semantic_codebook_size", 8192),
            semantic_dim=ca.get("semantic_dim", 256),
            acoustic_levels=ca.get("acoustic_codebook_size", 21),
            acoustic_dim=ca.get("acoustic_dim", 36),
            dim=ca.get("dim", 1024),
            hidden_dim=ca.get("hidden_dim", 4096),
            head_dim=ca.get("head_dim", 128),
            n_heads=ca.get("n_heads", 8),
            n_kv_heads=ca.get("n_kv_heads", 8),
            qk_norm=ca.get("qk_norm", True),
            qk_norm_eps=ca.get("qk_norm_eps", 1e-6),
            norm_eps=ca.get("norm_eps", 1e-2),
            layer_scale=ca.get("layer_scale", True),
            window=ca.get("attn_sliding_window_size", 16),
            half_window_rule=ca.get("half_attn_window_upon_downsampling",
                                    True),
            decoder_transformer_lengths=lst(
                "decoder_transformer_lengths", (2, 2, 2, 2)),
            decoder_convs_kernels=lst("decoder_convs_kernels",
                                      (3, 4, 4, 4)),
            decoder_convs_strides=lst("decoder_convs_strides",
                                      (1, 2, 2, 2)),
        )


def alibi_slopes(n_heads: int) -> np.ndarray:
    """get_alibi_slopes (:470): geometric 2^(-8/n) sequence, with the
    interleaved extension for non-power-of-2 head counts."""

    def pow2(n):
        r = 2.0 ** (-8.0 / n)
        return np.asarray([r ** i for i in range(n)], np.float32)

    if math.log2(n_heads).is_integer():
        return pow2(n_heads)
    m = 2 ** math.floor(math.log2(n_heads))
    return np.concatenate([pow2(m), pow2(2 * m)[::2][:n_heads - m]])


def codec_causal_conv(x: jnp.ndarray, p: Params, kernel: int,
                      stride: int = 1, pad_mode: str = "reflect"
                      ) -> jnp.ndarray:
    """CausalConv1d (:357): left-pad (k−s), right-pad to align the
    stride; x [B, T, C], kernel [K, I, O] (weight-norm resolved at
    load)."""
    pad_total = kernel - stride
    t = x.shape[1]
    n_frames = (t - kernel + pad_total) / stride + 1
    target = (math.ceil(n_frames) - 1) * stride + (kernel - pad_total)
    extra = max(target - t, 0)
    mode = {"reflect": "reflect", "replicate": "edge",
            "constant": "constant"}[pad_mode]
    xp = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode=mode)
    out = jax.lax.conv_general_dilated(
        xp, p["w"], window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        out = out + p["b"]
    return out


def codec_transconv(x: jnp.ndarray, p: Params, kernel: int,
                    stride: int) -> jnp.ndarray:
    """CausalConvTranspose1d (:394): trim_ratio=1 → trim (k−s) from
    the right. Kernel [K, O, I] torch-layout with
    transpose_kernel=True (the verified jax↔torch correspondence)."""
    out = jax.lax.conv_transpose(
        x, p["w"], strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), transpose_kernel=True)
    if "b" in p:
        out = out + p["b"]
    trim = kernel - stride
    return out[:, :out.shape[1] - trim] if trim > 0 else out


def codec_attention(p: Params, args: VoxtralCodecArgs, x: jnp.ndarray,
                    window: int, slopes: jnp.ndarray) -> jnp.ndarray:
    """ALiBi causal sliding-window attention (:525-573); qk-norm over
    the FLATTENED head dim (:583-585). x [B, T, D]."""
    b, t, _ = x.shape
    nh, nkv, hd = args.n_heads, args.n_kv_heads, args.head_dim
    q = linear(x, p["wq"])
    k = linear(x, p["wk"])
    v = linear(x, p["wv"])
    if args.qk_norm:
        q = _rms(q, p["q_norm"], args.qk_norm_eps)
        k = _rms(k, p["k_norm"], args.qk_norm_eps)
    q = q.reshape(b, t, nh, hd)
    k = k.reshape(b, t, nkv, hd)
    v = v.reshape(b, t, nkv, hd)
    g = nh // nkv
    kr = jnp.repeat(k, g, axis=2)
    vr = jnp.repeat(v, g, axis=2)
    pos = jnp.arange(t)
    rel = pos[None, :] - pos[:, None]  # [Tq, Tk] = j - i
    bias = slopes[:, None, None].astype(jnp.float32) * \
        rel[None].astype(jnp.float32)
    ok = (rel <= 0) & (rel >= -window)
    bias = jnp.where(ok[None], bias, -jnp.inf)
    sc = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                    kr.astype(jnp.float32)) * (hd ** -0.5)
    pr = jax.nn.softmax(sc + bias[None], axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(vr.dtype),
                   vr).reshape(b, t, nh * hd)
    return linear(o, p["wo"])


def codec_transformer(p_layers: list, args: VoxtralCodecArgs,
                      x: jnp.ndarray, window: int,
                      slopes: jnp.ndarray) -> jnp.ndarray:
    """TransformerBlock (:606): pre-norm attn/FFN with LayerScale."""
    for layer in p_layers:
        h = _rms(x, layer["attention_norm"], args.norm_eps)
        r = codec_attention(layer, args, h, window, slopes)
        if args.layer_scale:
            r = r * layer["attention_scale"]
        x = x + r
        h = _rms(x, layer["ffn_norm"], args.norm_eps)
        up = jax.nn.silu(linear(h, layer["w1"]).astype(
            jnp.float32)).astype(x.dtype) * linear(h, layer["w3"])
        r = linear(up, layer["w2"])
        if args.layer_scale:
            r = r * layer["ffn_scale"]
        x = x + r
    return x


def quantizer_decode(p: Params, args: VoxtralCodecArgs,
                     codes: jnp.ndarray) -> jnp.ndarray:
    """MistralAudioCodebook.decode (:288): codes [B, K, T] (raw,
    special offset already removed) → [B, T, latent_dim]. Semantic
    codebook = EMA embedding_sum/cluster_usage (:151); acoustic =
    2c/(L−1) − 1 (:203)."""
    emb_table = (p["embedding_sum"].astype(jnp.float32) /
                 jnp.clip(p["cluster_usage"].astype(jnp.float32),
                          1e-5, None)[:, None])
    sem = jnp.take(emb_table, jnp.clip(codes[:, 0], 0,
                                       emb_table.shape[0] - 1), axis=0)
    ac = (codes[:, 1:].astype(jnp.float32) * 2.0 /
          (args.acoustic_levels - 1)) - 1.0
    return jnp.concatenate([sem, ac.transpose(0, 2, 1)], axis=-1)


def voxtral_code2wav(p: Params, args: VoxtralCodecArgs,
                     codes: jnp.ndarray) -> jnp.ndarray:
    """_forward_decoder (:1008-1028): codes [B, K, T] raw → waveform
    [B, T·downsample]. conv-in (replicate) → per stage [transformer →
    transposed-conv ×2 upsample (window doubles)] → output_proj →
    patch unfold."""
    x = quantizer_decode(p["quantizer"], args, codes)
    x = codec_causal_conv(x, p["conv_in"], args.decoder_convs_kernels[0],
                          args.decoder_convs_strides[0],
                          pad_mode="replicate")
    slopes = jnp.asarray(alibi_slopes(args.n_heads))
    window = args.window
    n_stages = len(args.decoder_transformer_lengths)
    for idx in range(n_stages):
        x = codec_transformer(p["stages"][idx]["layers"], args, x,
                              window, slopes)
        if idx + 1 < n_stages:
            k = args.decoder_convs_kernels[idx + 1]
            s = args.decoder_convs_strides[idx + 1]
            if k != 1 or s != 1:
                x = codec_transconv(x, p["stages"][idx]["up"], k, s)
                if args.half_window_rule and s > 1:
                    window *= 2
    x = codec_causal_conv(x, p["output_proj"],
                          args.patch_proj_kernel_size, 1,
                          pad_mode="reflect")
    b, t, c = x.shape  # c == pretransform_patch_size
    return x.reshape(b, t * c)


def strip_at_eoa(codes: np.ndarray) -> np.ndarray:
    """decode_helper_batch_async pre-processing (:1055-1061): cut at
    the first END_AUDIO frame, remove the special offset."""
    eoa = np.nonzero(codes[:, 0] == END_AUDIO_ID)[0]
    cut = int(eoa[0]) if len(eoa) else len(codes)
    return (codes[:cut] - N_SPECIAL).astype(np.int32)


# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def _lin_init(cin, cout, dtype, bias=False):
    p = {"w": jnp.zeros((cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_voxtral_head(spec: VoxtralTTSSpec, dtype=jnp.float32
                      ) -> Params:
    d, hd = spec.at_dim, spec.at_head_dim

    def layer():
        return {
            "wq": _lin_init(d, spec.at_heads * hd, dtype),
            "wk": _lin_init(d, spec.at_kv_heads * hd, dtype),
            "wv": _lin_init(d, spec.at_kv_heads * hd, dtype),
            "wo": _lin_init(spec.at_heads * hd, d, dtype),
            "w1": _lin_init(d, spec.at_hidden_dim, dtype),
            "w2": _lin_init(spec.at_hidden_dim, d, dtype),
            "w3": _lin_init(d, spec.at_hidden_dim, dtype),
            "attention_norm": jnp.ones((d,), dtype),
            "ffn_norm": jnp.ones((d,), dtype),
        }

    half = d // 2
    inv = np.exp(-np.log(10000.0) * np.arange(half) / half)
    return {
        "time_inv_freq": jnp.asarray(inv, jnp.float32),
        "input_projection": _lin_init(spec.n_acoustic, d, dtype),
        "time_projection": _lin_init(d, d, dtype),
        "llm_projection": _lin_init(spec.llm_hidden, d, dtype),
        "layers": [layer() for _ in range(spec.at_layers)],
        "norm": jnp.ones((d,), dtype),
        "acoustic_codebook_output": _lin_init(d, spec.n_acoustic,
                                              dtype),
    }


def init_voxtral_codec(args: VoxtralCodecArgs, dtype=jnp.float32
                       ) -> Params:
    d, hd = args.dim, args.head_dim

    def layer():
        p = {
            "wq": _lin_init(d, args.n_heads * hd, dtype),
            "wk": _lin_init(d, args.n_kv_heads * hd, dtype),
            "wv": _lin_init(d, args.n_kv_heads * hd, dtype),
            "wo": _lin_init(args.n_heads * hd, d, dtype),
            "w1": _lin_init(d, args.hidden_dim, dtype),
            "w2": _lin_init(args.hidden_dim, d, dtype),
            "w3": _lin_init(d, args.hidden_dim, dtype),
            "attention_norm": jnp.ones((d,), dtype),
            "ffn_norm": jnp.ones((d,), dtype),
        }
        if args.qk_norm:
            p["q_norm"] = jnp.ones((args.n_heads * hd,), dtype)
            p["k_norm"] = jnp.ones((args.n_kv_heads * hd,), dtype)
        if args.layer_scale:
            p["attention_scale"] = jnp.full((d,), 0.1, dtype)
            p["ffn_scale"] = jnp.full((d,), 0.1, dtype)
        return p

    stages = []
    n = len(args.decoder_transformer_lengths)
    for idx, n_layers in enumerate(args.decoder_transformer_lengths):
        st = {"layers": [layer() for _ in range(n_layers)]}
        if idx + 1 < n:
            k = args.decoder_convs_kernels[idx + 1]
            st["up"] = {"w": jnp.zeros((k, d, d), dtype)}
        stages.append(st)
    return {
        "quantizer": {
            "embedding_sum": jnp.zeros((args.semantic_size,
                                        args.semantic_dim), dtype),
            "cluster_usage": jnp.ones((args.semantic_size,), dtype),
        },
        "conv_in": {"w": jnp.zeros((args.decoder_convs_kernels[0],
                                    args.latent_dim, d), dtype)},
        "stages": stages,
        "output_proj": {"w": jnp.zeros(
            (args.patch_proj_kernel_size, d,
             args.pretransform_patch_size), dtype)},
    }


def _resolve_weight_norm(tensors: dict) -> dict:
    """Collapse weight-norm pairs (weight_g/weight_v or
    parametrizations.weight.original0/original1) into plain weights.
    torch weight_norm dim=0: w = g · v / ||v||_{dims>0}."""
    out = {}
    done = set()
    for name, arr in tensors.items():
        if name in done:
            continue
        for gk, vk in ((".weight_g", ".weight_v"),
                       (".parametrizations.weight.original0",
                        ".parametrizations.weight.original1")):
            if name.endswith(gk):
                vname = name[:-len(gk)] + vk
                if vname in tensors:
                    g = np.asarray(tensors[name], np.float32)
                    v = np.asarray(tensors[vname], np.float32)
                    axes = tuple(range(1, v.ndim))
                    nrm = np.sqrt((v * v).sum(axis=axes,
                                              keepdims=True))
                    w = g * v / np.maximum(nrm, 1e-12)
                    out[name[:-len(gk)] + ".weight"] = w
                    done.add(vname)
                    break
        else:
            if not any(name.endswith(vk) and
                       (name[:-len(vk)] + gk) in tensors
                       for gk, vk in
                       ((".weight_g", ".weight_v"),
                        (".parametrizations.weight.original0",
                         ".parametrizations.weight.original1"))):
                out[name] = arr
    return out


def _assign_at(head: Params, parts: list, arr, dtype) -> bool:
    leaf = parts[-1]

    def put(slot, a):
        if leaf == "weight":
            slot["w"] = jnp.asarray(np.asarray(a).T, dtype)
        else:
            slot["b"] = jnp.asarray(a, dtype)
        return True

    if parts[0] == "time_embedding":
        head["time_inv_freq"] = jnp.asarray(arr, jnp.float32)
        return True
    if parts[0] in ("input_projection", "time_projection",
                    "llm_projection", "acoustic_codebook_output"):
        return put(head[parts[0]], arr)
    if parts[0] == "norm" and leaf == "weight":
        head["norm"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] == "layers":
        layer = head["layers"][int(parts[1])]
        rest = parts[2:]
        if rest[0] == "attention" and rest[1] in ("wq", "wk", "wv",
                                                  "wo"):
            return put(layer[rest[1]], arr)
        if rest[0] == "feed_forward" and rest[1] in ("w1", "w2", "w3"):
            return put(layer[rest[1]], arr)
        if rest[0] in ("attention_norm", "ffn_norm") and \
                leaf == "weight":
            layer[rest[0]] = jnp.asarray(arr, dtype)
            return True
    return False


def _assign_codec(codec: Params, args: VoxtralCodecArgs, parts: list,
                  arr, dtype,
                  block_map: Optional[dict] = None) -> bool:
    """decoder_blocks.N flat indexing → our stage structure.
    block_map: flat index → ("stage"|"conv_in"|"up", stage_idx)."""
    leaf = parts[-1]
    a = np.asarray(arr)
    if parts[0] == "quantizer":
        if parts[1] == "semantic_codebook" and parts[2] in (
                "embedding_sum", "cluster_usage"):
            codec["quantizer"][parts[2]] = jnp.asarray(a, dtype)
            return True
        return parts[1] == "acoustic_codebook"  # paramless
    if parts[0] == "output_proj":
        # CausalConv1d wraps nn.Conv1d as .conv; torch [O, I, K] →
        # [K, I, O]
        codec["output_proj"]["w"] = jnp.asarray(
            a.transpose(2, 1, 0), dtype)
        return True
    if parts[0] != "decoder_blocks":
        return False
    flat = int(parts[1])
    kind, sidx = block_map[flat]
    rest = parts[2:]
    if kind == "conv_in":
        codec["conv_in"]["w"] = jnp.asarray(a.transpose(2, 1, 0),
                                            dtype)
        return True
    if kind == "up":
        # torch ConvTranspose1d [I, O, K] → [K, O, I]... stored via
        # ("NWC","WIO",transpose_kernel) as [K, I→?]: use the verified
        # [K, O, I] layout
        codec["stages"][sidx]["up"]["w"] = jnp.asarray(
            a.transpose(2, 1, 0), dtype)
        return True
    # transformer stage: layers.J.attention.wq ...
    layer = codec["stages"][sidx]["layers"][int(rest[1])]
    sub = rest[2:]

    def put(slot, x):
        if leaf == "weight":
            slot["w"] = jnp.asarray(np.asarray(x).T, dtype)
        else:
            slot["b"] = jnp.asarray(x, dtype)
        return True

    if sub[0] == "attention":
        if sub[1] in ("wq", "wk", "wv", "wo"):
            return put(layer[sub[1]], arr)
        if sub[1] in ("q_norm", "k_norm") and leaf == "weight":
            layer[sub[1]] = jnp.asarray(arr, dtype)
            return True
        return False
    if sub[0] == "feed_forward" and sub[1] in ("w1", "w2", "w3"):
        return put(layer[sub[1]], arr)
    if sub[0] in ("attention_norm", "ffn_norm") and leaf == "weight":
        layer[sub[0]] = jnp.asarray(arr, dtype)
        return True
    if sub[0] in ("attention_scale", "ffn_scale"):
        layer[sub[0]] = jnp.asarray(arr, dtype)
        return True
    return False


def codec_block_map(args: VoxtralCodecArgs) -> dict:
    """Flat decoder_blocks ModuleList index → structured slot
    (mirrors the construction order :800-848: conv_in first, then per
    stage a Transformer and (if not last, k/s≠1) a transposed conv)."""
    m = {0: ("conv_in", -1)}
    flat = 1
    n = len(args.decoder_transformer_lengths)
    for idx in range(n):
        m[flat] = ("stage", idx)
        flat += 1
        if idx + 1 < n:
            k = args.decoder_convs_kernels[idx + 1]
            s = args.decoder_convs_strides[idx + 1]
            if k != 1 or s != 1:
                m[flat] = ("up", idx)
                flat += 1
    return m


def load_voxtral_tts_checkpoint(path: str, dtype=jnp.bfloat16) -> dict:
    """→ {"backbone": (DecoderConfig, params), "spec", "aux"
    {"head", "embed_table"}, "codec": (args, params)}.

    Checkpoint naming follows the reference load_weights routing
    (voxtral_tts_audio_generation.py:1055-1105): bare model.* Mistral
    tensors → backbone; acoustic_transformer.* → flow head;
    audio_tokenizer.* → codec; mm_audio_embeddings.
    audio_codebook_embeddings.embeddings.weight → multivocab table.
    The backbone lm_head is REPLACED by acoustic_transformer.
    semantic_codebook_output (the semantic code head)."""
    import dataclasses

    from safetensors import safe_open

    from vllm_omni_tpu.models.decoder import init_params
    from vllm_omni_tpu.models.weights import (_assign,
                                              _collect_safetensor_files,
                                              hf_config_to_decoder_config)

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    spec = VoxtralTTSSpec.from_config(hf)
    cargs = VoxtralCodecArgs.from_config(hf)
    text_cfg = dict(hf.get("text_config") or {})
    text_cfg.setdefault("architectures", ["MistralForCausalLM"])
    cfg = hf_config_to_decoder_config(text_cfg)
    params = init_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    head = init_voxtral_head(spec, dtype=jnp.float32)
    codec = init_voxtral_codec(cargs, dtype=jnp.float32)
    bmap = codec_block_map(cargs)
    embed_table = jnp.zeros((spec.embed_vocab, cfg.hidden_size),
                            jnp.float32)
    sem_head = None

    raw = {}
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                raw[name] = arr
    raw = _resolve_weight_norm(raw)

    loaded, skipped = 0, []
    for name, arr in raw.items():
        parts = name.split(".")
        if parts[0] == "acoustic_transformer":
            sub = parts[1:]
            if sub[0] == "semantic_codebook_output":
                if sub[-1] == "weight":
                    sem_head = {"w": jnp.asarray(
                        np.asarray(arr).T, dtype)}
                loaded += 1
                continue
            if _assign_at(head, sub, arr, jnp.float32):
                loaded += 1
            else:
                skipped.append(name)
            continue
        if parts[0] == "audio_tokenizer":
            sub = parts[1:]
            # strip the CausalConv wrapper's .conv segment
            sub = [s for s in sub if s != "conv"]
            if sub[0] in ("input_proj", "encoder_blocks"):
                loaded += 1  # encoder not needed for TTS decode
                continue
            if _assign_codec(codec, cargs, sub, arr, jnp.float32,
                             bmap):
                loaded += 1
            else:
                skipped.append(name)
            continue
        if name == ("mm_audio_embeddings.audio_codebook_embeddings."
                    "embeddings.weight"):
            embed_table = jnp.asarray(arr, jnp.float32)
            loaded += 1
            continue
        if parts[0] == "mm_audio_embeddings":
            loaded += 1  # tok_embeddings duplicate of model embed
            continue
        if _assign(params, name, arr, dtype, cfg):
            loaded += 1
        else:
            skipped.append(name)
    if sem_head is not None:
        params["lm_head"] = sem_head
        cfg = dataclasses.replace(cfg,
                                  vocab_size=sem_head["w"].shape[1])
    if loaded == 0:
        raise ValueError(f"no voxtral_tts tensors mapped from {path}")
    if skipped:
        logger.warning("voxtral_tts: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("voxtral_tts: %d tensors loaded (sem head %s)",
                loaded, "replaced" if sem_head is not None else "kept")
    return {"backbone": (cfg, params), "spec": spec,
            "aux": {"head": head, "embed_table": embed_table},
            "codec": (cargs, codec)}


def build_voxtral_prompt(embed: jnp.ndarray, text_ids: list[int]
                         ) -> np.ndarray:
    """Text prompt → prompt embeddings (the decode loop's inputs come
    from the conditioner, so the stage runs embeddings-as-prompt)."""
    ids = jnp.asarray(np.asarray(text_ids, np.int32))
    return np.asarray(jnp.take(embed, ids, axis=0), np.float32)
