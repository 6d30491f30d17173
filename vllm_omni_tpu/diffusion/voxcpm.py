"""VoxCPM / VoxCPM2: hybrid AR + local-flow-matching TTS.

Reference: /root/reference/vllm_omni/model_executor/models/voxcpm/
(voxcpm.py:59-142 `_inference` — the serving loop) and voxcpm2/
(voxcpm2_talker.py:789-920 per-step scaffold, :253-340
`_optimized_solve_euler`; minicpm4_paged.py + minicpm4_hf_compat.py —
the MiniCPM4 tower with fp32 LongRoPE and mup scaling). Per step the
text-semantic LM hidden (through an FSQ bottleneck) and a residual
acoustic LM hidden condition a local DiT that flow-matches the next
PATCH of audio-VAE latents; the patch is re-encoded (local encoder →
enc_to_lm_proj) and fed back as the next LM input embedding; a stop
head on the LM hidden ends the utterance. v1 vs v2 (visible in the
reference): v1 sums the two DiT projections and feeds the residual LM
``fsq(h) + feat_embed``; v2 concatenates the projections and fuses the
residual input with ``fusion_concat_proj``, adds LongRoPE, sway-warped
t-span, and CFG-zero-star guidance.

The reference imports the model internals (LocEnc/LocDiT/FSQ/AudioVAE)
from the external ``voxcpm`` package; those modules are re-designed
here TPU-natively (static-shape jitted step, explicit fixed-capacity
KV buffers, lax-friendly CFM loop) with a documented native-style
checkpoint layout (base_lm.* / residual_lm.* / fsq_layer.* /
feat_encoder.* / feat_decoder.estimator.* / audio_vae.* — the module
attribute names the reference itself dereferences on the native
model).
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
from vllm_omni_tpu.models.decoder import linear

logger = init_logger(__name__)

Params = dict


@dataclass
class LMConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    num_kv_heads: int = 2
    vocab_size: int = 73448
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    # mup (MiniCPM): embed × scale_emb, residual adds ×
    # scale_depth/√num_layers (reference voxcpm.py:76 consumes
    # scale_emb; the tower itself is MiniCPM)
    use_mup: bool = True
    scale_emb: float = 12.0
    scale_depth: float = 1.4
    # LongRoPE (v2 tower; minicpm4_hf_compat.py:46-99)
    rope_scaling: Optional[dict] = None
    max_position_embeddings: int = 32768
    use_rope: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def res_scale(self) -> float:
        if not self.use_mup:
            return 1.0
        return self.scale_depth / (self.num_layers ** 0.5)

    @classmethod
    def from_json(cls, d: dict, **over) -> "LMConfig":
        kw = dict(
            hidden_size=d.get("hidden_size", 1024),
            intermediate_size=d.get("intermediate_size", 4096),
            num_layers=d.get("num_hidden_layers", d.get("num_layers",
                                                        24)),
            num_heads=d.get("num_attention_heads", 16),
            num_kv_heads=d.get("num_key_value_heads",
                               d.get("num_attention_heads", 16)),
            vocab_size=d.get("vocab_size", 73448),
            rope_theta=d.get("rope_theta", 10000.0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-6),
            use_mup=d.get("use_mup", True),
            scale_emb=d.get("scale_emb", 12.0),
            scale_depth=d.get("scale_depth", 1.4),
            rope_scaling=d.get("rope_scaling"),
            max_position_embeddings=d.get("max_position_embeddings",
                                          32768),
        )
        kw.update(over)
        return cls(**kw)


@dataclass
class VoxCPMConfig:
    variant: str = "v1"  # "v1" | "v2"
    patch_size: int = 2
    feat_dim: int = 64
    sample_rate: int = 24000
    lm: LMConfig = field(default_factory=LMConfig)
    residual: LMConfig = field(default_factory=lambda: LMConfig(
        num_layers=8, use_rope=False))
    # local patch encoder / DiT estimator
    enc_hidden: int = 512
    enc_layers: int = 4
    enc_heads: int = 8
    dit_hidden: int = 512
    dit_layers: int = 6
    dit_heads: int = 8
    dit_mu_dim: int = 512  # lm_to_dit/res_to_dit output width
    fsq_latent_dim: int = 32
    fsq_levels: tuple = (8, 8, 8, 8, 8, 8, 8, 8)
    sway_coef: float = 1.0
    mean_mode: bool = False
    # audio VAE decoder (latent 75ish Hz → waveform)
    vae_channels: int = 256
    vae_rates: tuple = (8, 5, 4, 2)  # prod=320 samples per latent frame
    audio_start_token: int = 0
    max_len: int = 2000

    @property
    def hop(self) -> int:
        h = 1
        for r in self.vae_rates:
            h *= r
        return h

    @classmethod
    def from_json(cls, hf: dict) -> "VoxCPMConfig":
        variant = "v2" if hf.get("model_type") == "voxcpm2" else "v1"
        lm = LMConfig.from_json(hf.get("lm_config") or {})
        res_d = hf.get("residual_lm_config") or {}
        res = LMConfig.from_json(
            res_d, use_rope=False,
            hidden_size=res_d.get("hidden_size", lm.hidden_size),
            num_layers=res_d.get("num_hidden_layers", 8))
        enc = hf.get("encoder_config") or {}
        dit = hf.get("dit_config") or {}
        fsq = hf.get("fsq_config") or {}
        vae = hf.get("audio_vae_config") or {}
        return cls(
            variant=variant,
            patch_size=hf.get("patch_size", 2),
            feat_dim=hf.get("feat_dim", 64),
            sample_rate=hf.get("sample_rate",
                               48000 if variant == "v2" else 24000),
            lm=lm, residual=res,
            enc_hidden=enc.get("hidden_size", 512),
            enc_layers=enc.get("num_hidden_layers", 4),
            enc_heads=enc.get("num_attention_heads", 8),
            dit_hidden=dit.get("hidden_size", 512),
            dit_layers=dit.get("num_hidden_layers", 6),
            dit_heads=dit.get("num_attention_heads", 8),
            dit_mu_dim=dit.get("mu_dim", dit.get("hidden_size", 512)),
            fsq_latent_dim=fsq.get("latent_dim", 32),
            fsq_levels=tuple(fsq.get("levels", (8,) * 8)),
            sway_coef=dit.get("sway_coef", 1.0),
            mean_mode=dit.get("mean_mode", False),
            vae_channels=vae.get("channels", 256),
            vae_rates=tuple(vae.get("rates", (8, 5, 4, 2))),
            audio_start_token=hf.get("audio_start_token", 0),
            max_len=hf.get("max_len", 2000),
        )


def is_voxcpm_dir(path: str) -> bool:
    cfg_path = os.path.join(str(path), "config.json")
    if not os.path.isfile(cfg_path):
        return False
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except (OSError, ValueError):
        return False
    return cfg.get("model_type") in ("voxcpm", "voxcpm2")


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _rms(x, w, eps):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) *
            w.astype(jnp.float32)).astype(x.dtype)


def lm_rope_tables(cfg: LMConfig, max_len: int):
    """fp32 cos/sin [max_len, head_dim]. LongRoPE (v2): per-frequency
    ext factors + √(1+ln s/ln orig) amplitude scale
    (minicpm4_hf_compat._MiniCPMLongRoPE:79-95)."""
    d = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, d, 2, np.float64) / d))
    scale = 1.0
    if cfg.rope_scaling:
        rs = cfg.rope_scaling
        factors = np.asarray(
            rs["short_factor"] if max_len <=
            rs.get("original_max_position_embeddings", max_len)
            else rs["long_factor"], np.float64)
        inv = inv / factors
        orig = rs.get("original_max_position_embeddings", 1)
        s = cfg.max_position_embeddings / orig
        if s > 1 and orig > 1:
            scale = float(np.sqrt(1 + np.log(s) / np.log(orig)))
    ang = np.arange(max_len, dtype=np.float64)[:, None] * inv[None]
    emb = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(emb) * scale, jnp.float32),
            jnp.asarray(np.sin(emb) * scale, jnp.float32))


def _apply_rope(x, cos, sin):
    """[T, H, D]; fp32 half rotation (reference applies rope in f32)."""
    xf = x.astype(jnp.float32)
    c = cos[:, None, :]
    s = sin[:, None, :]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    return (xf * c + rot * s).astype(x.dtype)


def _attend(q, k, v, n_heads, n_kv, mask):
    g = n_heads // n_kv
    kr = jnp.repeat(k, g, axis=1)
    vr = jnp.repeat(v, g, axis=1)
    d = q.shape[-1]
    sc = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                    kr.astype(jnp.float32)) * (d ** -0.5)
    if mask is not None:
        sc = jnp.where(mask[None], sc, -1e30)
    pr = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", pr.astype(vr.dtype), vr)
    return o.reshape(q.shape[0], n_heads * d)


def lm_prefill(params: Params, cfg: LMConfig, embeds: jnp.ndarray,
               cos, sin, kv_cap: int) -> tuple:
    """Causal forward over input embeddings [T, H]; returns
    (hidden [T, H], kv buffers [(k,v)] each [cap, hkv, d], length T).
    The KV buffers are fixed-capacity so the chained decode step jits
    once per capacity bucket."""
    t = embeds.shape[0]
    d = cfg.head_dim
    x = embeds
    causal = jnp.tril(jnp.ones((t, t), bool))
    rs = cfg.res_scale
    kvs = []
    for layer in params["layers"]:
        h = _rms(x, layer["input_norm"], cfg.rms_norm_eps)
        q = linear(h, layer["q_proj"]).reshape(t, cfg.num_heads, d)
        k = linear(h, layer["k_proj"]).reshape(t, cfg.num_kv_heads, d)
        v = linear(h, layer["v_proj"]).reshape(t, cfg.num_kv_heads, d)
        if cfg.use_rope:
            q = _apply_rope(q, cos[:t], sin[:t])
            k = _apply_rope(k, cos[:t], sin[:t])
        att = _attend(q, k, v, cfg.num_heads, cfg.num_kv_heads, causal)
        x = x + linear(att, layer["o_proj"]) * rs
        h = _rms(x, layer["post_norm"], cfg.rms_norm_eps)
        gate = linear(h, layer["gate_proj"])
        up = linear(h, layer["up_proj"])
        m = linear(jax.nn.silu(gate.astype(jnp.float32)).astype(
            x.dtype) * up, layer["down_proj"])
        x = x + m * rs
        kb = jnp.zeros((kv_cap, cfg.num_kv_heads, d), x.dtype)
        vb = jnp.zeros((kv_cap, cfg.num_kv_heads, d), x.dtype)
        kvs.append((jax.lax.dynamic_update_slice(kb, k, (0, 0, 0)),
                    jax.lax.dynamic_update_slice(vb, v, (0, 0, 0))))
    hidden = _rms(x, params["norm"], cfg.rms_norm_eps)
    return hidden, kvs


def lm_step(params: Params, cfg: LMConfig, kvs: list,
            x_row: jnp.ndarray, pos: jnp.ndarray, cos, sin) -> tuple:
    """One decode row [H] against fixed-capacity KV; returns
    (hidden [H], updated kvs). pos = current length (scalar int32)."""
    d = cfg.head_dim
    x = x_row[None]
    rs = cfg.res_scale
    cap = kvs[0][0].shape[0]
    new_kvs = []
    idx = jnp.arange(cap)
    mask = (idx <= pos)[None, :]  # [1, cap]
    for layer, (kb, vb) in zip(params["layers"], kvs):
        h = _rms(x, layer["input_norm"], cfg.rms_norm_eps)
        q = linear(h, layer["q_proj"]).reshape(1, cfg.num_heads, d)
        k = linear(h, layer["k_proj"]).reshape(1, cfg.num_kv_heads, d)
        v = linear(h, layer["v_proj"]).reshape(1, cfg.num_kv_heads, d)
        if cfg.use_rope:
            c = jax.lax.dynamic_slice_in_dim(cos, pos, 1)
            s = jax.lax.dynamic_slice_in_dim(sin, pos, 1)
            q = _apply_rope(q, c, s)
            k = _apply_rope(k, c, s)
        kb = jax.lax.dynamic_update_slice(kb, k, (pos, 0, 0))
        vb = jax.lax.dynamic_update_slice(vb, v, (pos, 0, 0))
        new_kvs.append((kb, vb))
        att = _attend(q, kb, vb, cfg.num_heads, cfg.num_kv_heads, mask)
        x = x + linear(att, layer["o_proj"]) * rs
        h = _rms(x, layer["post_norm"], cfg.rms_norm_eps)
        gate = linear(h, layer["gate_proj"])
        up = linear(h, layer["up_proj"])
        m = linear(jax.nn.silu(gate.astype(jnp.float32)).astype(
            x.dtype) * up, layer["down_proj"])
        x = x + m * rs
    hidden = _rms(x, params["norm"], cfg.rms_norm_eps)
    return hidden[0], new_kvs


# ---------------------------------------------------------------------------
# FSQ bottleneck
# ---------------------------------------------------------------------------


def fsq_apply(p: Params, x: jnp.ndarray,
              levels: tuple) -> jnp.ndarray:
    """Finite scalar quantization bottleneck on the LM hidden
    (semantic token space): project down, bound each channel to L
    levels via tanh, round to the grid, project back. Inference-only
    (no straight-through)."""
    z = linear(x, p["project_in"]).astype(jnp.float32)
    half = (jnp.asarray(levels, jnp.float32) - 1.0) / 2.0
    zb = jnp.tanh(z) * half
    q = jnp.round(zb) / half
    return linear(q.astype(x.dtype), p["project_out"])


# ---------------------------------------------------------------------------
# local patch encoder
# ---------------------------------------------------------------------------


def feat_encode(p: Params, cfg: VoxCPMConfig,
                feat: jnp.ndarray) -> jnp.ndarray:
    """[T, P, feat_dim] → [T, enc_hidden]: per-patch transformer with
    a CLS token; the CLS hidden is the patch embedding."""
    t = feat.shape[0]
    x = linear(feat.astype(p["in_proj"]["w"].dtype), p["in_proj"])
    cls = jnp.broadcast_to(p["cls"][None, None], (t, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + p["pos_embed"][None]
    nh = cfg.enc_heads
    d = cfg.enc_hidden // nh
    s = x.shape[1]
    for layer in p["layers"]:
        h = _rms(x, layer["ln1"], 1e-6)
        q = linear(h, layer["q_proj"]).reshape(t, s, nh, d)
        k = linear(h, layer["k_proj"]).reshape(t, s, nh, d)
        v = linear(h, layer["v_proj"]).reshape(t, s, nh, d)
        sc = jnp.einsum("tqhd,tkhd->thqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (d ** -0.5)
        pr = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("thqk,tkhd->tqhd", pr.astype(v.dtype),
                       v).reshape(t, s, cfg.enc_hidden)
        x = x + linear(o, layer["o_proj"])
        h = _rms(x, layer["ln2"], 1e-6)
        m = linear(jax.nn.gelu(linear(h, layer["fc1"]).astype(
            jnp.float32), approximate=False).astype(x.dtype), layer["fc2"])
        x = x + m
    x = _rms(x, p["norm"], 1e-6)
    return x[:, 0]


# ---------------------------------------------------------------------------
# local DiT estimator + CFM solver
# ---------------------------------------------------------------------------


def _time_embed(p: Params, t: jnp.ndarray, dim: int = 256):
    half = dim // 2
    freqs = jnp.exp(-np.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    e = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = linear(e.astype(p["l1"]["w"].dtype), p["l1"])
    return linear(jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype),
                  p["l2"])


def dit_estimator(p: Params, cfg: VoxCPMConfig, x: jnp.ndarray,
                  mu: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray,
                  dt: jnp.ndarray) -> jnp.ndarray:
    """Velocity estimator over one patch. x/cond [B, feat_dim, P]
    (channel-first as the reference solver passes them), mu [B, M],
    t/dt [B] → [B, feat_dim, P]. Token stream = [mu, cond×P, x×P] with
    AdaLN-zero time conditioning (t + dt when mean_mode)."""
    b = x.shape[0]
    ps = cfg.patch_size
    dtype = p["in_proj"]["w"].dtype
    xt = x.transpose(0, 2, 1).astype(dtype)      # [B, P, D]
    ct = cond.transpose(0, 2, 1).astype(dtype)
    te = _time_embed(p["t_embed"], t)
    if cfg.mean_mode:
        te = te + _time_embed(p["dt_embed"], dt)
    mu_tok = linear(mu.astype(dtype), p["mu_proj"])[:, None]
    seq = jnp.concatenate(
        [mu_tok, linear(ct, p["cond_proj"]), linear(xt, p["in_proj"])],
        axis=1) + p["pos_embed"][None]
    nh = cfg.dit_heads
    hd = cfg.dit_hidden // nh
    s = seq.shape[1]
    c = jax.nn.silu(te.astype(jnp.float32)).astype(dtype)
    for layer in p["layers"]:
        ada = linear(c, layer["ada"]).reshape(b, 6, cfg.dit_hidden)
        sh1, sc1, g1, sh2, sc2, g2 = [ada[:, i][:, None]
                                      for i in range(6)]
        h = _rms(seq, layer["ln1"], 1e-6) * (1 + sc1) + sh1
        q = linear(h, layer["q_proj"]).reshape(b, s, nh, hd)
        k = linear(h, layer["k_proj"]).reshape(b, s, nh, hd)
        v = linear(h, layer["v_proj"]).reshape(b, s, nh, hd)
        scs = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                         k.astype(jnp.float32)) * (hd ** -0.5)
        pr = jax.nn.softmax(scs, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", pr.astype(v.dtype),
                       v).reshape(b, s, cfg.dit_hidden)
        seq = seq + g1 * linear(o, layer["o_proj"])
        h = _rms(seq, layer["ln2"], 1e-6) * (1 + sc2) + sh2
        m = linear(jax.nn.gelu(linear(h, layer["fc1"]).astype(
            jnp.float32), approximate=False).astype(dtype), layer["fc2"])
        seq = seq + g2 * m
    out = _rms(seq[:, 1 + ps:], p["out_norm"], 1e-6)
    out = linear(out, p["out_proj"])  # [B, P, feat_dim]
    return out.transpose(0, 2, 1).astype(jnp.float32)


def make_t_span(n: int, sway: float) -> np.ndarray:
    """Sway-warped descending schedule (voxcpm2_talker.py:245-247:
    linspace(1,0,n+1) + coef·(cos(πt/2) − 1 + t))."""
    t = np.linspace(1.0, 0.0, n + 1, dtype=np.float64)
    return (t + sway * (np.cos(np.pi / 2 * t) - 1 + t)).astype(
        np.float32)


def cfm_solve(p: Params, cfg: VoxCPMConfig, mu: jnp.ndarray,
              cond: jnp.ndarray, noise: jnp.ndarray, n_steps: int,
              cfg_value: float, zero_star: bool) -> jnp.ndarray:
    """Euler CFM over one patch (reference _optimized_solve_euler
    :253-340): x ← x − dt·v; CFG doubles the batch with mu zeroed for
    the guidance branch; with zero_star (v2) the first
    max(1, 4%·steps) velocities are zero and the guidance uses the
    ⟨pos,neg⟩/⟨neg,neg⟩ projection. mu [1, M], cond/noise
    [1, feat_dim, P] → [1, feat_dim, P]."""
    span = make_t_span(n_steps, cfg.sway_coef)
    zero_init = max(1, int(len(span) * 0.04)) if zero_star else 0
    x = noise
    mu2 = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
    for step in range(1, len(span)):
        t_val = float(span[step - 1])
        dt = float(span[step - 1] - span[step])
        if step <= zero_init:
            continue  # dphi = 0 → x unchanged
        x2 = jnp.concatenate([x, x], axis=0)
        c2 = jnp.concatenate([cond, cond], axis=0)
        tt = jnp.full((2,), t_val, jnp.float32)
        dd = jnp.full((2,), dt if cfg.mean_mode else 0.0, jnp.float32)
        raw = dit_estimator(p, cfg, x2, mu2, tt, c2, dd)
        pos, neg = raw[:1], raw[1:]
        if zero_star:
            pf = pos.reshape(1, -1)
            nf = neg.reshape(1, -1)
            st = (jnp.sum(pf * nf, axis=1, keepdims=True) /
                  (jnp.sum(nf * nf, axis=1, keepdims=True) + 1e-8))
            st = st.reshape(1, 1, 1)
        else:
            st = 1.0
        dphi = neg * st + cfg_value * (pos - neg * st)
        x = x - dt * dphi
    return x


# ---------------------------------------------------------------------------
# audio VAE decoder (latents → waveform)
# ---------------------------------------------------------------------------


def _causal_conv(x, p, dilation=1):
    """x [B, T, C]; kernel [K, Cin, Cout] left-padded (causal)."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation
    xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        xp, p["w"], window_strides=(1,), padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return out + p["b"]


def _up_transconv(x, p, stride):
    """Transposed conv upsample; kernel [K, Cout, Cin],
    transpose_kernel matching torch ConvTranspose1d."""
    out = jax.lax.conv_transpose(
        x, p["w"], strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        transpose_kernel=True)
    k = p["w"].shape[0]
    trim = k - stride
    if trim > 0:
        out = out[:, :-trim] if trim < out.shape[1] else out
    return out + p["b"]


def _snake(x, alpha):
    xf = x.astype(jnp.float32)
    a = alpha.astype(jnp.float32)[None, None, :]
    return (xf + (1.0 / (a + 1e-9)) * jnp.sin(a * xf) ** 2).astype(
        x.dtype)


def vae_decode(p: Params, cfg: VoxCPMConfig,
               lat: jnp.ndarray) -> jnp.ndarray:
    """[B, T, feat_dim] latent frames → [B, T·hop] waveform. DAC-style
    stack: conv-in → per-rate (snake → transposed-conv upsample → 2
    dilated residual units) → snake → conv-out → tanh."""
    x = _causal_conv(lat.astype(p["conv_in"]["w"].dtype), p["conv_in"])
    for blk, rate in zip(p["blocks"], cfg.vae_rates):
        x = _snake(x, blk["alpha"])
        x = _up_transconv(x, blk["up"], rate)
        for res in blk["res"]:
            h = _snake(x, res["alpha1"])
            h = _causal_conv(h, res["conv1"], dilation=res["dilation"])
            h = _snake(h, res["alpha2"])
            h = _causal_conv(h, res["conv2"])
            x = x + h
    x = _snake(x, p["alpha_out"])
    x = _causal_conv(x, p["conv_out"])
    return jnp.tanh(x.astype(jnp.float32))[..., 0]

# ---------------------------------------------------------------------------
# init + loading
# ---------------------------------------------------------------------------


def _lin_init(cin, cout, dtype, bias=True):
    p = {"w": jnp.zeros((cin, cout), dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _lm_init(cfg: LMConfig, dtype, embed: bool) -> Params:
    hs, im, d = cfg.hidden_size, cfg.intermediate_size, cfg.head_dim

    def layer():
        return {
            "q_proj": _lin_init(hs, cfg.num_heads * d, dtype, False),
            "k_proj": _lin_init(hs, cfg.num_kv_heads * d, dtype, False),
            "v_proj": _lin_init(hs, cfg.num_kv_heads * d, dtype, False),
            "o_proj": _lin_init(cfg.num_heads * d, hs, dtype, False),
            "gate_proj": _lin_init(hs, im, dtype, False),
            "up_proj": _lin_init(hs, im, dtype, False),
            "down_proj": _lin_init(im, hs, dtype, False),
            "input_norm": jnp.ones((hs,), dtype),
            "post_norm": jnp.ones((hs,), dtype),
        }

    p = {"layers": [layer() for _ in range(cfg.num_layers)],
         "norm": jnp.ones((hs,), dtype)}
    if embed:
        p["embed"] = jnp.zeros((cfg.vocab_size, hs), dtype)
    return p


def init_voxcpm_params(cfg: VoxCPMConfig, dtype=jnp.bfloat16) -> Params:
    hs = cfg.lm.hidden_size
    rh = cfg.residual.hidden_size
    eh, dh = cfg.enc_hidden, cfg.dit_hidden
    fd, ps = cfg.feat_dim, cfg.patch_size
    nl = len(cfg.fsq_levels)

    def enc_layer():
        return {
            "ln1": jnp.ones((eh,), dtype), "ln2": jnp.ones((eh,), dtype),
            "q_proj": _lin_init(eh, eh, dtype),
            "k_proj": _lin_init(eh, eh, dtype),
            "v_proj": _lin_init(eh, eh, dtype),
            "o_proj": _lin_init(eh, eh, dtype),
            "fc1": _lin_init(eh, 4 * eh, dtype),
            "fc2": _lin_init(4 * eh, eh, dtype),
        }

    def dit_layer():
        return {
            "ln1": jnp.ones((dh,), dtype), "ln2": jnp.ones((dh,), dtype),
            "ada": _lin_init(dh, 6 * dh, dtype),
            "q_proj": _lin_init(dh, dh, dtype),
            "k_proj": _lin_init(dh, dh, dtype),
            "v_proj": _lin_init(dh, dh, dtype),
            "o_proj": _lin_init(dh, dh, dtype),
            "fc1": _lin_init(dh, 4 * dh, dtype),
            "fc2": _lin_init(4 * dh, dh, dtype),
        }

    mu_total = cfg.dit_mu_dim * (2 if cfg.variant == "v2" else 1)
    vc = cfg.vae_channels
    blocks = []
    ch = vc
    for rate in cfg.vae_rates:
        nxt = max(ch // 2, 16)
        res = []
        for dil in (1, 3):
            res.append({
                "alpha1": jnp.ones((nxt,), dtype),
                "conv1": {"w": jnp.zeros((7, nxt, nxt), dtype),
                          "b": jnp.zeros((nxt,), dtype)},
                "alpha2": jnp.ones((nxt,), dtype),
                "conv2": {"w": jnp.zeros((1, nxt, nxt), dtype),
                          "b": jnp.zeros((nxt,), dtype)},
                "dilation": dil,
            })
        blocks.append({
            "alpha": jnp.ones((ch,), dtype),
            "up": {"w": jnp.zeros((2 * rate, nxt, ch), dtype),
                   "b": jnp.zeros((nxt,), dtype)},
            "res": res,
        })
        ch = nxt
    return {
        "base_lm": _lm_init(cfg.lm, dtype, embed=True),
        "residual_lm": _lm_init(cfg.residual, dtype, embed=False),
        "fsq_layer": {"project_in": _lin_init(hs, nl, dtype),
                      "project_out": _lin_init(nl, hs, dtype)},
        "feat_encoder": {
            "in_proj": _lin_init(fd, eh, dtype),
            "cls": jnp.zeros((eh,), dtype),
            "pos_embed": jnp.zeros((ps + 1, eh), dtype),
            "layers": [enc_layer() for _ in range(cfg.enc_layers)],
            "norm": jnp.ones((eh,), dtype),
        },
        "feat_decoder": {
            "in_proj": _lin_init(fd, dh, dtype),
            "cond_proj": _lin_init(fd, dh, dtype),
            "mu_proj": _lin_init(mu_total, dh, dtype),
            "pos_embed": jnp.zeros((1 + 2 * ps, dh), dtype),
            "t_embed": {"l1": _lin_init(256, dh, dtype),
                        "l2": _lin_init(dh, dh, dtype)},
            "dt_embed": {"l1": _lin_init(256, dh, dtype),
                         "l2": _lin_init(dh, dh, dtype)},
            "layers": [dit_layer() for _ in range(cfg.dit_layers)],
            "out_norm": jnp.ones((dh,), dtype),
            "out_proj": _lin_init(dh, fd, dtype),
        },
        "enc_to_lm_proj": _lin_init(eh, hs, dtype),
        "lm_to_dit_proj": _lin_init(hs, cfg.dit_mu_dim, dtype),
        "res_to_dit_proj": _lin_init(rh, cfg.dit_mu_dim, dtype),
        "fusion_concat_proj": _lin_init(hs + hs, rh, dtype)
        if cfg.variant == "v2" else None,
        "stop_proj": _lin_init(hs, hs, dtype),
        "stop_head": _lin_init(hs, 2, dtype),
        "audio_vae": {
            "conv_in": {"w": jnp.zeros((7, fd, vc), dtype),
                        "b": jnp.zeros((vc,), dtype)},
            "blocks": blocks,
            "alpha_out": jnp.ones((ch,), dtype),
            "conv_out": {"w": jnp.zeros((7, ch, 1), dtype),
                         "b": jnp.zeros((1,), dtype)},
        },
    }


_LM_LEAF = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
            "up_proj", "down_proj"}
_LM_NORM = {"input_layernorm": "input_norm",
            "post_attention_layernorm": "post_norm"}


def _assign_lm(lm: Params, parts: list, arr, dtype) -> bool:
    if parts[:2] == ["embed_tokens", "weight"]:
        lm["embed"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] == "norm" and parts[-1] == "weight":
        lm["norm"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] != "layers":
        return False
    layer = lm["layers"][int(parts[1])]
    rest = parts[2:]
    if rest[0] == "self_attn" and rest[1] in _LM_LEAF:
        layer[rest[1]]["w"] = jnp.asarray(np.asarray(arr).T, dtype)
        return True
    if rest[0] == "mlp" and rest[1] in _LM_LEAF:
        layer[rest[1]]["w"] = jnp.asarray(np.asarray(arr).T, dtype)
        return True
    if rest[0] in _LM_NORM and rest[-1] == "weight":
        layer[_LM_NORM[rest[0]]] = jnp.asarray(arr, dtype)
        return True
    return False


def _assign_lin(slot, leaf, arr, dtype) -> bool:
    if leaf == "weight":
        slot["w"] = jnp.asarray(np.asarray(arr).T, dtype)
    elif leaf == "bias":
        slot["b"] = jnp.asarray(arr, dtype)
    else:
        return False
    return True


def _assign_tree(node, parts, arr, dtype) -> bool:
    """Generic dotted-path assignment into the param pytree. Linear
    slots end with weight/bias (transposed); conv slots hold torch
    [O, I, K] kernels mapped to jax layouts by key."""
    leaf = parts[-1]
    cur = node
    for seg in parts[:-1]:
        if isinstance(cur, dict) and seg in cur:
            cur = cur[seg]
        elif isinstance(cur, (list, tuple)) and seg.isdigit():
            cur = cur[int(seg)]
        else:
            return False
    if isinstance(cur, dict) and "w" in cur and leaf in ("weight",
                                                         "bias"):
        a = np.asarray(arr)
        if leaf == "bias":
            cur["b"] = jnp.asarray(a, dtype)
            return True
        if a.ndim == 3:  # torch conv [O, I, K]
            kw = cur["w"].shape
            if kw == (a.shape[2], a.shape[1], a.shape[0]):
                cur["w"] = jnp.asarray(a.transpose(2, 1, 0), dtype)
                return True
            # transposed conv [I, O, K] → [K, O, I]
            if kw == (a.shape[2], a.shape[1], a.shape[0]) or \
                    kw == (a.shape[2], a.shape[1], a.shape[0]):
                pass
            cur["w"] = jnp.asarray(a.transpose(2, 1, 0), dtype)
            return True
        cur["w"] = jnp.asarray(a.T, dtype)
        return True
    return False


def assign_voxcpm_tensor(params: Params, name: str, arr,
                         cfg: VoxCPMConfig, dtype) -> bool:
    """Native-style VoxCPM naming (the attribute paths the reference
    dereferences on the external model): base_lm.* / residual_lm.*
    MiniCPM towers (HF layers.N naming), fsq_layer.project_in/out,
    feat_encoder.*, feat_decoder.estimator.*, the five top-level
    projections, stop head, audio_vae.decoder.*."""
    parts = name.split(".")
    root = parts[0]
    if root in ("base_lm", "residual_lm"):
        sub = parts[1:]
        if sub and sub[0] == "model":
            sub = sub[1:]
        return _assign_lm(params[root], sub, arr, dtype)
    if root == "fsq_layer":
        if len(parts) == 3 and parts[1] in ("project_in",
                                            "project_out"):
            return _assign_lin(params["fsq_layer"][parts[1]], parts[2],
                               arr, dtype)
        return False
    if root in ("enc_to_lm_proj", "lm_to_dit_proj", "res_to_dit_proj",
                "fusion_concat_proj", "stop_proj", "stop_head"):
        if params.get(root) is None:
            return False
        return _assign_lin(params[root], parts[-1], arr, dtype)
    if root == "stop_actn":
        return True  # activation has no params; tolerate stray keys
    if root == "feat_encoder":
        p = params["feat_encoder"]
        if parts[1] == "cls":
            p["cls"] = jnp.asarray(np.asarray(arr).reshape(-1), dtype)
            return True
        if parts[1] == "pos_embed":
            p["pos_embed"] = jnp.asarray(
                np.asarray(arr).reshape(cfg.patch_size + 1, -1), dtype)
            return True
        if parts[1] in ("norm", ) and parts[-1] == "weight":
            p["norm"] = jnp.asarray(arr, dtype)
            return True
        if parts[1] == "layers":
            layer = p["layers"][int(parts[2])]
            key = parts[3]
            if key in ("ln1", "ln2") and parts[-1] == "weight":
                layer[key] = jnp.asarray(arr, dtype)
                return True
            if key in layer and isinstance(layer[key], dict):
                return _assign_lin(layer[key], parts[-1], arr, dtype)
            return False
        return _assign_tree(p, parts[1:], arr, dtype)
    if root == "feat_decoder":
        sub = parts[1:]
        if sub and sub[0] == "estimator":
            sub = sub[1:]
        p = params["feat_decoder"]
        if sub[0] == "pos_embed":
            p["pos_embed"] = jnp.asarray(
                np.asarray(arr).reshape(1 + 2 * cfg.patch_size, -1),
                dtype)
            return True
        if sub[0] in ("out_norm", ) and sub[-1] == "weight":
            p["out_norm"] = jnp.asarray(arr, dtype)
            return True
        if sub[0] in ("t_embed", "dt_embed"):
            return _assign_lin(p[sub[0]][sub[1]], sub[-1], arr, dtype)
        if sub[0] == "layers":
            layer = p["layers"][int(sub[1])]
            key = sub[2]
            if key in ("ln1", "ln2") and sub[-1] == "weight":
                layer[key] = jnp.asarray(arr, dtype)
                return True
            if key in layer and isinstance(layer[key], dict):
                return _assign_lin(layer[key], sub[-1], arr, dtype)
            return False
        if sub[0] in p and isinstance(p[sub[0]], dict):
            return _assign_lin(p[sub[0]], sub[-1], arr, dtype)
        return False
    if root == "audio_vae":
        sub = parts[1:]
        if sub and sub[0] == "decoder":
            sub = sub[1:]
        p = params["audio_vae"]
        if sub[0] in ("conv_in", "conv_out"):
            a = np.asarray(arr)
            if sub[-1] == "bias":
                p[sub[0]]["b"] = jnp.asarray(a, dtype)
            else:  # torch [O, I, K] → [K, I, O]
                p[sub[0]]["w"] = jnp.asarray(a.transpose(2, 1, 0),
                                             dtype)
            return True
        if sub[0] == "alpha_out":
            p["alpha_out"] = jnp.asarray(np.asarray(arr).reshape(-1),
                                         dtype)
            return True
        if sub[0] == "blocks":
            blk = p["blocks"][int(sub[1])]
            key = sub[2]
            a = np.asarray(arr)
            if key == "alpha":
                blk["alpha"] = jnp.asarray(a.reshape(-1), dtype)
                return True
            if key == "up":
                if sub[-1] == "bias":
                    blk["up"]["b"] = jnp.asarray(a, dtype)
                else:  # torch ConvTranspose1d [I, O, K] → [K, O, I]
                    blk["up"]["w"] = jnp.asarray(a.transpose(2, 1, 0),
                                                 dtype)
                return True
            if key == "res":
                res = blk["res"][int(sub[3])]
                rk = sub[4]
                if rk in ("alpha1", "alpha2"):
                    res[rk] = jnp.asarray(a.reshape(-1), dtype)
                    return True
                if rk in ("conv1", "conv2"):
                    if sub[-1] == "bias":
                        res[rk]["b"] = jnp.asarray(a, dtype)
                    else:
                        res[rk]["w"] = jnp.asarray(
                            a.transpose(2, 1, 0), dtype)
                    return True
        return False
    return False


def load_voxcpm(path: str, dtype=jnp.bfloat16
                ) -> tuple[VoxCPMConfig, Params]:
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import _collect_safetensor_files

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    cfg = VoxCPMConfig.from_json(hf)
    params = init_voxcpm_params(cfg, dtype)
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                if assign_voxcpm_tensor(params, name, arr, cfg, dtype):
                    loaded += 1
                else:
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no voxcpm tensors mapped from {path}")
    if skipped:
        logger.warning("voxcpm: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("voxcpm(%s): %d tensors loaded", cfg.variant, loaded)
    return cfg, params


# ---------------------------------------------------------------------------
# runner (pipeline._runner protocol; audio family)
# ---------------------------------------------------------------------------


@dataclass
class VoxCPMState:
    kvs: Any           # base LM KV buffers
    res_kvs: Any       # residual LM KV buffers
    pos: int           # base LM length so far
    res_pos: int
    lm_hidden: Any     # [H] post-fsq semantic hidden
    res_hidden: Any    # [Hr]
    prev_cond: Any     # [1, feat_dim, P] previous patch (CFM cond)
    feats: list        # generated patches [P, feat_dim] host-side
    rng: Any
    num_steps: int
    min_len: int = 2
    step_index: int = 0
    stopped: bool = False

    @property
    def done(self) -> bool:
        return self.stopped or self.step_index >= self.num_steps


class VoxCPMRunner:
    """Hybrid AR/CFM serving loop (reference voxcpm.py:59-142 and
    voxcpm2_talker.py:789-920): prefill text(+prompt audio) → per step
    [dit mu → CFM patch → stop head → encode patch → LM step →
    residual step] → audio-VAE decode."""

    decode_via_vae = False

    def __init__(self, cfg: VoxCPMConfig, params: Params,
                 mesh=None) -> None:
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self.tokenizer = None
        self.kv_cap = 512  # bucket; prompts+patches beyond re-bucket
        self._cos, self._sin = lm_rope_tables(cfg.lm, 4096)
        self._fns: dict = {}
        self.inference_timesteps = 10
        self.cfg_value = 2.0

    # ---- jitted programs -------------------------------------------------
    def _get(self, key, build):
        fn = self._fns.get(key)
        if fn is None:
            fn = build()
            self._fns[key] = fn
        return fn

    def _prefill_fn(self, t: int, n_audio: int, cap: int):
        """t total rows, the last n_audio of which are prompt-audio
        patches. Reference (voxcpm.py:93-103 / voxcpm2_talker.py
        :815-820): enc_outputs = fsq(h)·feat_mask + h·text_mask;
        lm_hidden = enc_outputs[-1]; residual input = enc_outputs +
        feat_mask·feat_embed (v1) or fusion_concat([enc_outputs,
        feat_mask·feat_embed]) (v2)."""
        cfg = self.cfg
        audio_mask = np.zeros((t, 1), bool)
        if n_audio:
            audio_mask[-n_audio:] = True
        amask = jnp.asarray(audio_mask)

        def build():
            def run(params, embeds, feat_embeds):
                hidden, kvs = lm_prefill(params["base_lm"], cfg.lm,
                                         embeds, self._cos, self._sin,
                                         cap)
                fsq_h = fsq_apply(params["fsq_layer"], hidden,
                                  cfg.fsq_levels)
                enc = jnp.where(amask, fsq_h, hidden)
                lm_h = enc[-1]
                fe = jnp.where(amask, feat_embeds, 0)
                if cfg.variant == "v2":
                    res_in = linear(
                        jnp.concatenate([enc, fe], axis=-1),
                        params["fusion_concat_proj"])
                else:
                    res_in = enc + fe
                res_h, res_kvs = lm_prefill(params["residual_lm"],
                                            cfg.residual, res_in,
                                            self._cos, self._sin, cap)
                return lm_h, res_h[-1], kvs, res_kvs

            return jax.jit(run)

        return self._get(("prefill", t, n_audio, cap), build)

    def _step_fn(self, cap: int):
        cfg = self.cfg

        def build():
            def run(params, kvs, res_kvs, pos, res_pos, lm_h, res_h,
                    prev_cond, noise):
                # mu for the local DiT
                a = linear(lm_h[None], params["lm_to_dit_proj"])
                b = linear(res_h[None], params["res_to_dit_proj"])
                mu = (jnp.concatenate([a, b], axis=-1)
                      if cfg.variant == "v2" else a + b)
                patch = cfm_solve(params["feat_decoder"], cfg, mu,
                                  prev_cond, noise,
                                  self.inference_timesteps,
                                  self.cfg_value,
                                  zero_star=cfg.variant == "v2")
                # stop head on the PRE-step lm hidden (reference
                # voxcpm.py:124 — checked before forward_step)
                stop = linear(jax.nn.gelu(linear(
                    lm_h[None], params["stop_proj"]).astype(
                        jnp.float32), approximate=False).astype(lm_h.dtype),
                    params["stop_head"])[0]
                # re-encode the patch; the SAME embedding feeds the
                # LM step and the residual fusion (voxcpm.py:115-136)
                pt = patch.transpose(0, 2, 1)  # [1, P, D]
                emb = linear(feat_encode(params["feat_encoder"], cfg,
                                         pt),
                             params["enc_to_lm_proj"])[0]
                new_lm, kvs = lm_step(params["base_lm"], cfg.lm, kvs,
                                      emb, pos, self._cos, self._sin)
                new_lm_h = fsq_apply(params["fsq_layer"], new_lm[None],
                                     cfg.fsq_levels)[0]
                if cfg.variant == "v2":
                    res_in = linear(
                        jnp.concatenate([new_lm_h, emb], -1)[None],
                        params["fusion_concat_proj"])[0]
                else:
                    res_in = new_lm_h + emb
                new_res, res_kvs = lm_step(params["residual_lm"],
                                           cfg.residual, res_kvs,
                                           res_in, res_pos, self._cos,
                                           self._sin)
                return (patch, stop, new_lm_h, new_res, kvs, res_kvs)

            return jax.jit(run)

        return self._get(("step", cap), build)

    # ---- serving ---------------------------------------------------------
    def _prompt_ids(self, text: str) -> list[int]:
        if self.tokenizer is not None:
            return list(self.tokenizer(text)["input_ids"])
        lo, span = 8, max(self.cfg.lm.vocab_size - 8, 1)
        data = text.encode() or b"\0"
        return [lo + (b * 2654435761 + i) % span
                for i, b in enumerate(data)]

    def prepare(self, req, num_steps: Optional[int] = None,
                seed: int = 0) -> VoxCPMState:
        cfg = self.cfg
        p = req.params
        text = str(req.prompt) if not isinstance(req.prompt, dict) \
            else str(req.prompt.get("text", ""))
        extra = p.extra_args or {}
        self.inference_timesteps = int(
            extra.get("inference_timesteps",
                      p.num_inference_steps or 10))
        self.cfg_value = float(p.guidance_scale or 2.0)
        ids = self._prompt_ids(text) + [cfg.audio_start_token]
        dtype = self.params["base_lm"]["embed"].dtype
        scale = cfg.lm.scale_emb if cfg.lm.use_mup else 1.0
        embeds = jnp.take(self.params["base_lm"]["embed"],
                          jnp.asarray(ids, jnp.int32), axis=0) * scale
        # optional voice-clone prompt latents [Ta, P, feat_dim]
        prompt_feat = extra.get("prompt_audio_feat")
        prev_cond = jnp.zeros((1, cfg.feat_dim, cfg.patch_size),
                              jnp.float32)
        n_audio = 0
        if prompt_feat is not None:
            pf = jnp.asarray(np.asarray(prompt_feat, np.float32))
            fe = linear(feat_encode(self.params["feat_encoder"], cfg,
                                    pf.astype(dtype)),
                        self.params["enc_to_lm_proj"])
            embeds = jnp.concatenate([embeds, fe], axis=0)
            n_audio = int(pf.shape[0])
            prev_cond = pf[-1].T[None]
        t = embeds.shape[0]
        feat_embeds = jnp.zeros((t, cfg.lm.hidden_size), dtype)
        if n_audio:
            feat_embeds = feat_embeds.at[-n_audio:].set(fe)
        cap = self.kv_cap
        while cap < t + cfg.max_len + 8:
            cap *= 2
        fn = self._prefill_fn(t, n_audio, cap)
        lm_h, res_h, kvs, res_kvs = fn(self.params, embeds,
                                       feat_embeds)
        max_steps = min(int(extra.get("max_len", 400)), cfg.max_len)
        key = jax.random.PRNGKey(p.seed if p.seed is not None else seed)
        return VoxCPMState(
            kvs=kvs, res_kvs=res_kvs, pos=t, res_pos=t,
            lm_hidden=lm_h, res_hidden=res_h, prev_cond=prev_cond,
            feats=[], rng=key, num_steps=max_steps,
            min_len=int(extra.get("min_len", 2)))

    def denoise_step(self, state: VoxCPMState) -> None:
        cfg = self.cfg
        key, sub = jax.random.split(state.rng)
        state.rng = key
        noise = jax.random.normal(
            sub, (1, cfg.feat_dim, cfg.patch_size), jnp.float32)
        fn = self._step_fn(state.kvs[0][0].shape[0])
        patch, stop, lm_h, res_h, kvs, res_kvs = fn(
            self.params, state.kvs, state.res_kvs,
            jnp.int32(state.pos), jnp.int32(state.res_pos),
            state.lm_hidden, state.res_hidden, state.prev_cond, noise)
        state.feats.append(np.asarray(patch[0].T, np.float32))
        state.prev_cond = patch
        state.lm_hidden = lm_h
        state.res_hidden = res_h
        state.kvs = kvs
        state.res_kvs = res_kvs
        state.pos += 1
        state.res_pos += 1
        state.step_index += 1
        if state.step_index > state.min_len and \
                int(np.asarray(jnp.argmax(stop))) == 1:
            state.stopped = True

    def post_decode(self, state: VoxCPMState,
                    output_type: str = "np"):
        if not state.feats:
            return np.zeros((1, self.cfg.hop), np.float32)
        lat = np.concatenate(state.feats, axis=0)  # [T·P? , feat_dim]
        if output_type == "latent":
            return lat[None]
        wav = vae_decode(self.params["audio_vae"], self.cfg,
                         jnp.asarray(lat[None]))
        return np.asarray(wav, np.float32)


def voxcpm_param_shardings(params: Params):
    """Replicate everything except the two LM towers' projections,
    which shard tensor-parallel like a decoder (column q/k/v/gate/up,
    row o/down)."""
    from jax.sharding import PartitionSpec as P

    col = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    row = {"o_proj", "down_proj"}

    def lm_spec(lm):
        out = {}
        for k, v in lm.items():
            if k == "layers":
                out[k] = [{
                    lk: ({"w": P(None, "tp")} if lk in col else
                         {"w": P("tp", None)} if lk in row else
                         P())
                    for lk in layer
                } for layer in v]
            else:
                out[k] = jax.tree.map(lambda _: P(), v)
        return out

    specs = {}
    for k, v in params.items():
        if v is None:
            specs[k] = None
        elif k in ("base_lm", "residual_lm"):
            specs[k] = lm_spec(v)
        else:
            specs[k] = jax.tree.map(lambda _: P(), v)
    return specs
