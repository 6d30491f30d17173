"""NextStep-1.1 autoregressive image generation with real checkpoint
geometry.

Reference parity: diffusion/models/nextstep_1_1/modeling_nextstep.py
(NextStepModel :116 — a Llama backbone over mixed text+image-token
embeddings with image_in/out projectors and a FlowMatchingHead),
modeling_nextstep_heads.py (SimpleMLPAdaLN :134 — AdaLN ResBlocks over
a per-token latent patch; the SDE sampler :228: score-from-velocity
drift (1+t)·v - x with sqrt(2(1-t))·dW noise injection and a shifted
t∈[0,1) grid) and pipeline_nextstep_1_1.py :430 (per-image-token loop:
decode one LLM step → image_out_projector → 20-step head sample →
image_in_projector feeds the next step; linear/constant CFG schedule;
final unpatchify → flux VAE).

TPU-first: the backbone runs as two jitted programs — a causal prefill
over the static prompt bucket and a single-token decode step against a
dense [L, B, Hkv, Tmax, D] KV cache updated via dynamic_update_slice —
and the flow head's whole SDE integration is ONE jitted
lax.fori_loop. The host loop only sequences image tokens (exactly the
denoise-step contract, so step-mode preemption works per token).
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class NextStepConfig:
    """Mirrors the HF NextStep config (modeling_nextstep.py :65 —
    LlamaConfig + latent/flow-head fields)."""

    hidden_size: int = 2048
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    num_key_value_heads: int = 16
    intermediate_size: int = 8192
    vocab_size: int = 128815
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    attention_bias: bool = False
    o_attention_bias: Optional[bool] = None
    mlp_bias: bool = False
    head_dim: Optional[int] = None
    latent_size: int = 32
    latent_patch_size: int = 2
    latent_channels: int = 16
    image_placeholder_id: Optional[int] = None
    boi: Optional[int] = None
    eoi: Optional[int] = None
    fm_head_dim: int = 1536
    fm_head_layers: int = 12

    @property
    def hd(self) -> int:
        return self.head_dim or \
            self.hidden_size // self.num_attention_heads

    @property
    def token_dim(self) -> int:
        return self.latent_channels * self.latent_patch_size ** 2

    @property
    def o_bias(self) -> bool:
        return self.attention_bias if self.o_attention_bias is None \
            else self.o_attention_bias

    # pipeline config-sync duck-typing
    @property
    def inner_dim(self) -> int:
        return self.hidden_size

    @property
    def num_layers(self) -> int:
        return self.num_hidden_layers

    @property
    def attention_head_dim(self) -> int:
        return self.hd

    @property
    def joint_attention_dim(self) -> int:
        return self.hidden_size

    @property
    def patch_size(self) -> int:
        return self.latent_patch_size

    @property
    def pack_factor(self) -> int:
        return self.latent_patch_size

    @classmethod
    def from_json(cls, cfg: dict) -> "NextStepConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        return cls(**kw)


# ---------------------------------------------------------------------------
# Llama backbone (dense-cache variant for the generation stage)
# ---------------------------------------------------------------------------


def nextstep_prefill(params: Params, cfg: NextStepConfig,
                     embeds: jnp.ndarray, valid_len: jnp.ndarray,
                     cache_len: int
                     ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Causal forward over the prompt bucket [B, Tp, D] (left-padded
    prompts masked via valid positions >= Tp - valid_len). Returns
    (last hidden [B, D], k_cache, v_cache [L, B, Tmax, Hkv, D])."""
    b, tp, _ = embeds.shape
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, \
        cfg.hd
    eps = cfg.rms_norm_eps
    # left-pad layout: real tokens occupy [tp - valid_len, tp)
    pos_in_seq = jnp.arange(tp)[None, :] - (tp - valid_len)[:, None]
    positions = jnp.clip(pos_in_seq, 0, None)
    valid = pos_in_seq >= 0  # [B, Tp]
    causal = jnp.tril(jnp.ones((tp, tp), bool))
    mask = causal[None] & valid[:, None, :]  # [B, Tq, Tk]

    x = embeds
    k_cache = jnp.zeros((cfg.num_hidden_layers, b, cache_len, nkv, hd),
                        embeds.dtype)
    v_cache = jnp.zeros_like(k_cache)
    # per-row positions (left-pad aware)
    cos_t = jnp.cos(_pos_freqs(cfg, positions))
    sin_t = jnp.sin(_pos_freqs(cfg, positions))
    for li, blk in enumerate(params["layers"]):
        h = rms_norm(x, blk["input_layernorm"], eps=eps)
        a = blk["self_attn"]
        q = linear(h, a["q_proj"]).reshape(b, tp, nh, hd)
        k = linear(h, a["k_proj"]).reshape(b, tp, nkv, hd)
        v = linear(h, a["v_proj"]).reshape(b, tp, nkv, hd)
        q = _apply_rope_batched(q, cos_t, sin_t)
        k = _apply_rope_batched(k, cos_t, sin_t)
        k_cache = k_cache.at[li, :, :tp].set(k)
        v_cache = v_cache.at[li, :, :tp].set(v)
        g = nh // nkv
        qf = q.astype(jnp.float32).reshape(b, tp, nkv, g, hd)
        scores = jnp.einsum("btkgd,bskd->btkgs", qf,
                            k.astype(jnp.float32)) * hd ** -0.5
        scores = jnp.where(mask[:, :, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("btkgs,bskd->btkgd", probs,
                       v.astype(jnp.float32))
        o = o.reshape(b, tp, nh * hd).astype(x.dtype)
        x = x + linear(o, a["o_proj"])
        h = rms_norm(x, blk["post_attention_layernorm"], eps=eps)
        m = blk["mlp"]
        gate = jax.nn.silu(linear(h, m["gate_proj"]).astype(
            jnp.float32)).astype(x.dtype)
        x = x + linear(gate * linear(h, m["up_proj"]), m["down_proj"])

    x = rms_norm(x, params["norm"], eps=eps)
    return x[:, -1], k_cache, v_cache


def _pos_freqs(cfg: NextStepConfig, positions: jnp.ndarray
               ) -> jnp.ndarray:
    d = cfg.hd
    inv = 1.0 / (cfg.rope_theta **
                 (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    freqs = positions.astype(jnp.float32)[..., None] * inv
    return jnp.concatenate([freqs, freqs], axis=-1)  # [..., D]


def _apply_rope_batched(x: jnp.ndarray, cos: jnp.ndarray,
                        sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, D]; cos/sin [B, T, D]."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-xf[..., half:], xf[..., :half]], axis=-1)
    out = xf * cos[:, :, None, :] + rot * sin[:, :, None, :]
    return out.astype(orig)


def nextstep_decode_step(params: Params, cfg: NextStepConfig,
                         embed: jnp.ndarray, k_cache: jnp.ndarray,
                         v_cache: jnp.ndarray, pos: jnp.ndarray,
                         seq_pos: jnp.ndarray, key_valid: jnp.ndarray
                         ) -> tuple[jnp.ndarray, jnp.ndarray,
                                    jnp.ndarray, jnp.ndarray]:
    """One token [B, D] against the dense cache; `pos` = cache slot
    (same for every row), `seq_pos` [B] = rope position per row,
    `key_valid` [B, Tmax] = per-row valid cache slots (excludes the
    shorter CFG row's left-pad slots)."""
    b = embed.shape[0]
    nh, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, \
        cfg.hd
    eps = cfg.rms_norm_eps
    x = embed[:, None, :]
    cos_t = jnp.cos(_pos_freqs(cfg, seq_pos[:, None]))
    sin_t = jnp.sin(_pos_freqs(cfg, seq_pos[:, None]))
    key_valid = jax.lax.dynamic_update_slice(
        key_valid, jnp.ones((b, 1), bool), (0, pos))

    for li, blk in enumerate(params["layers"]):
        h = rms_norm(x, blk["input_layernorm"], eps=eps)
        a = blk["self_attn"]
        q = linear(h, a["q_proj"]).reshape(b, 1, nh, hd)
        k = linear(h, a["k_proj"]).reshape(b, 1, nkv, hd)
        v = linear(h, a["v_proj"]).reshape(b, 1, nkv, hd)
        q = _apply_rope_batched(q, cos_t, sin_t)
        k = _apply_rope_batched(k, cos_t, sin_t)
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k[None], (li, 0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v[None], (li, 0, pos, 0, 0))
        kk, vv = k_cache[li], v_cache[li]  # [B, Tmax, Hkv, D]
        g = nh // nkv
        qf = q.astype(jnp.float32).reshape(b, nkv, g, hd)
        scores = jnp.einsum("bkgd,bskd->bkgs", qf,
                            kk.astype(jnp.float32)) * hd ** -0.5
        scores = jnp.where(key_valid[:, None, None, :], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("bkgs,bskd->bkgd", probs,
                       vv.astype(jnp.float32))
        o = o.reshape(b, 1, nh * hd).astype(x.dtype)
        x = x + linear(o, a["o_proj"])
        h = rms_norm(x, blk["post_attention_layernorm"], eps=eps)
        m = blk["mlp"]
        gate = jax.nn.silu(linear(h, m["gate_proj"]).astype(
            jnp.float32)).astype(x.dtype)
        x = x + linear(gate * linear(h, m["up_proj"]), m["down_proj"])

    x = rms_norm(x, params["norm"], eps=eps)
    return x[:, 0], k_cache, v_cache, key_valid


# ---------------------------------------------------------------------------
# Flow-matching head (SimpleMLPAdaLN :134 + SDE sampler :228)
# ---------------------------------------------------------------------------


def fm_head_velocity(head: Params, cfg: NextStepConfig, x: jnp.ndarray,
                     t: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """x [B, token_dim], t [B], c [B, hidden] → velocity."""
    half = 128
    freqs = jnp.exp(-jnp.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    e = jnp.concatenate([jnp.cos(args), jnp.sin(args)],
                        axis=-1).astype(x.dtype)
    e = linear(e, head["time_embed"]["mlp0"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(x.dtype)
    temb = linear(e, head["time_embed"]["mlp2"])
    y = temb + linear(c, head["cond_embed"])

    h = linear(x, head["input_proj"])
    for blk in head["res_blocks"]:
        mod = linear(jax.nn.silu(y.astype(jnp.float32)).astype(y.dtype),
                     blk["adaLN_modulation"])
        d = h.shape[-1]
        shift, scale, gate = mod[:, :d], mod[:, d:2 * d], mod[:, 2 * d:]
        # in_ln is an AFFINE LayerNorm (ResBlock :64)
        hn = _ln_nb(h) * blk["in_ln"]["w"] + blk["in_ln"]["b"]
        hn = hn * (1.0 + scale) + shift
        hn = linear(hn, blk["mlp0"])
        hn = jax.nn.silu(hn.astype(jnp.float32)).astype(h.dtype)
        h = h + gate * linear(hn, blk["mlp2"])
    fin = head["final_layer"]
    mod = linear(jax.nn.silu(y.astype(jnp.float32)).astype(y.dtype),
                 fin["adaLN_modulation"])
    d = h.shape[-1]
    shift, scale = mod[:, :d], mod[:, d:]
    out = _ln_nb(h) * (1.0 + scale) + shift
    return linear(out, fin["linear"])


def _ln_nb(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def fm_head_sample(head: Params, cfg: NextStepConfig, c: jnp.ndarray,
                   rng: jax.Array, guidance: jnp.ndarray,
                   num_steps: int, timesteps_shift: float = 1.0,
                   cfg_mult: int = 1) -> jnp.ndarray:
    """SDE sampler (:228): drift = (1+t)·v - x (score-substituted),
    noise sqrt(2(1-t))·dW; shifted ascending t grid. c [cfg_mult·B',
    hidden] (cond rows first) → token [B', token_dim]."""
    bp = c.shape[0] // cfg_mult
    ts = np.linspace(0.0, 1.0, num_steps + 1, dtype=np.float64)[:-1]
    ts = ts / (timesteps_shift - (timesteps_shift - 1.0) * ts)
    ts = np.append(ts, 1.0).astype(np.float32)
    ts_j = jnp.asarray(ts)

    rng, sub = jax.random.split(rng)
    x0 = jax.random.normal(sub, (bp, cfg.token_dim), jnp.float32)

    def body(i, carry):
        x, key = carry
        ti = ts_j[i]
        dt = ts_j[i + 1] - ti
        comb = jnp.tile(x.astype(c.dtype), (cfg_mult, 1))
        v = fm_head_velocity(head, cfg, comb,
                             jnp.full((c.shape[0],), ti), c)
        v = v.astype(jnp.float32)
        if cfg_mult == 2:
            v_c, v_u = v[:bp], v[bp:]
            v = v_u + guidance * (v_c - v_u)
        # score = (t·v - x)/(1-t); drift = v + (1-t)·score = (1+t)v - x
        drift = (1.0 + ti) * v - x
        key, sub2 = jax.random.split(key)
        w = jax.random.normal(sub2, x.shape, jnp.float32)
        x = x + drift * dt + jnp.sqrt(2.0 * (1.0 - ti)) * w * \
            jnp.sqrt(dt)
        return x, key

    x, _ = jax.lax.fori_loop(0, num_steps, body, (x0, rng))
    return x.astype(c.dtype)


# ---------------------------------------------------------------------------
# Generation runner
# ---------------------------------------------------------------------------


@dataclass
class NextStepState:
    k_cache: Any
    v_cache: Any
    key_valid: Any  # [rows, Tmax] bool per-row valid cache slots
    cond: Any  # [cfg_mult·B', hidden] last hidden per row
    tokens: Any  # [B', n_done, token_dim]
    pos: int  # next cache slot
    seq_pos: Any  # [rows] rope positions
    n_tokens: int
    h_tok: int
    w_tok: int
    cfg_mult: int
    guidance: float
    rng: Any
    head_steps: int
    step_index: int = 0
    t_start: float = field(default_factory=time.monotonic)
    audio_latents: Any = None

    @property
    def num_steps(self) -> int:
        return self.n_tokens

    @property
    def done(self) -> bool:
        return self.step_index >= self.n_tokens


class NextStepRunner:
    """Per-image-token AR loop with the flow head as the token
    sampler."""

    decode_via_vae = True  # pipeline runs the image VAE on our latents

    def __init__(self, cfg: NextStepConfig, params: Params,
                 mesh=None) -> None:
        self.cfg = cfg
        self.params = params
        self.mesh = mesh
        self._prefill = jax.jit(functools.partial(
            nextstep_prefill, cfg=cfg), static_argnames=("cache_len",))
        self._decode = jax.jit(functools.partial(
            nextstep_decode_step, cfg=cfg))
        self._sample = jax.jit(functools.partial(
            fm_head_sample, cfg=cfg),
            static_argnames=("num_steps", "timesteps_shift",
                             "cfg_mult"))

    def prepare(self, req, num_steps=None, seed: int = 0
                ) -> NextStepState:
        cfg = self.cfg
        p = req.params
        prompt = req.prompt
        if isinstance(prompt, dict):
            ids = prompt.get("input_ids")
            neg_ids = prompt.get("negative_input_ids")
            text = prompt.get("text", "")
        else:
            ids, neg_ids, text = None, None, str(prompt)
        if ids is None:
            data = text.encode() or b"\0"
            ids = [(b * 2654435761 + i) % cfg.vocab_size
                   for i, b in enumerate(data)]
        use_cfg = p.guidance_scale and p.guidance_scale > 1.0
        cfg_mult = 2 if use_cfg else 1
        if neg_ids is None:
            neg_ids = ids[:1]
        down = 8 * cfg.latent_patch_size  # vae 8× then 2×2 patch
        h_tok = max(p.height // down, 1)
        w_tok = max(p.width // down, 1)
        n_tokens = h_tok * w_tok

        rows = [np.asarray(ids, np.int32)]
        if use_cfg:
            rows.append(np.asarray(neg_ids, np.int32))
        tp = max(len(r) for r in rows)
        tp = -(-tp // 16) * 16  # prompt bucket
        embeds = np.zeros((cfg_mult, tp), np.int32)
        valid = np.zeros((cfg_mult,), np.int32)
        for i, r in enumerate(rows):
            embeds[i, tp - len(r):] = r  # left-pad
            valid[i] = len(r)
        emb = self.params["embed_tokens"][jnp.asarray(embeds)]
        cache_len = tp + n_tokens
        cond, k_cache, v_cache = self._prefill(
            self.params, embeds=emb, valid_len=jnp.asarray(valid),
            cache_len=cache_len)
        key_valid = np.zeros((cfg_mult, cache_len), bool)
        for i in range(cfg_mult):
            key_valid[i, tp - valid[i]:tp] = True
        head_steps = num_steps or 20
        return NextStepState(
            k_cache=k_cache, v_cache=v_cache,
            key_valid=jnp.asarray(key_valid), cond=cond,
            tokens=jnp.zeros((1, 0, cfg.token_dim), emb.dtype),
            pos=tp, seq_pos=jnp.asarray(valid), n_tokens=n_tokens,
            h_tok=h_tok, w_tok=w_tok, cfg_mult=cfg_mult,
            guidance=float(p.guidance_scale or 1.0),
            rng=jax.random.PRNGKey(seed), head_steps=head_steps)

    def denoise_step(self, state: NextStepState) -> None:
        cfg = self.cfg
        state.rng, sub = jax.random.split(state.rng)
        c = linear(state.cond, self.params["image_out_projector"])
        token = self._sample(self.params["image_head"], c=c, rng=sub,
                             guidance=jnp.float32(state.guidance),
                             num_steps=state.head_steps,
                             cfg_mult=state.cfg_mult)
        state.tokens = jnp.concatenate(
            [state.tokens, token[:, None, :]], axis=1)
        emb = linear(token, self.params["image_in_projector"])
        if state.cfg_mult > 1:
            emb = jnp.tile(emb, (state.cfg_mult, 1))
        (state.cond, state.k_cache, state.v_cache,
         state.key_valid) = self._decode(
            self.params, embed=emb, k_cache=state.k_cache,
            v_cache=state.v_cache, pos=jnp.int32(state.pos),
            seq_pos=state.seq_pos, key_valid=state.key_valid)
        state.pos += 1
        state.seq_pos = state.seq_pos + 1
        state.step_index += 1

    def post_decode(self, state: NextStepState,
                    output_type: str = "np") -> Any:
        """Unpatchify [B, hw, p²·C] → latents [B, H, W, C] (the
        pipeline VAE-decodes them)."""
        cfg = self.cfg
        p = cfg.latent_patch_size
        c = cfg.latent_channels
        b = state.tokens.shape[0]
        x = np.asarray(state.tokens, np.float32).reshape(
            b, state.h_tok, state.w_tok, c, p, p)
        # token dim is (c, p, p) — patchify :177 einsum nchpwq->nhwcpq
        x = x.transpose(0, 1, 4, 2, 5, 3)
        return x.reshape(b, state.h_tok * p, state.w_tok * p, c)

    def run(self, req):
        p = req.params
        state = self.prepare(req, num_steps=p.num_inference_steps,
                             seed=p.seed if p.seed is not None else 0)
        while not state.done:
            self.denoise_step(state)
        return self.post_decode(state, p.output_type), state


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, bias=True, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    slot = {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype)}
    if bias:
        slot["b"] = jnp.zeros((n_out,), dtype)
    return slot


def init_nextstep_params(cfg: NextStepConfig, key: jax.Array,
                         dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(
        key, cfg.num_hidden_layers * 8 + cfg.fm_head_layers * 4 + 16))
    d = cfg.hidden_size
    hd = cfg.hd
    nh, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    td = cfg.token_dim
    fd = cfg.fm_head_dim
    params: Params = {
        "embed_tokens": (jax.random.normal(
            next(keys), (cfg.vocab_size, d), jnp.float32) *
            0.02).astype(dtype),
        "norm": jnp.ones((d,), dtype),
        "lm_head": _lin(next(keys), d, cfg.vocab_size, dtype,
                        bias=False),
        "image_in_projector": _lin(next(keys), td, d, dtype),
        "image_out_projector": _lin(next(keys), d, d, dtype),
        "image_head": {
            "time_embed": {"mlp0": _lin(next(keys), 256, fd, dtype),
                           "mlp2": _lin(next(keys), fd, fd, dtype)},
            "cond_embed": _lin(next(keys), d, fd, dtype),
            "input_proj": _lin(next(keys), td, fd, dtype),
            "final_layer": {
                "linear": _lin(next(keys), fd, td, dtype),
                "adaLN_modulation": _lin(next(keys), fd, 2 * fd, dtype,
                                         scale=0.02)},
            "res_blocks": [],
        },
        "layers": [],
    }
    for _ in range(cfg.fm_head_layers):
        params["image_head"]["res_blocks"].append({
            "in_ln": {"w": jnp.ones((fd,), dtype),
                      "b": jnp.zeros((fd,), dtype)},
            "adaLN_modulation": _lin(next(keys), fd, 3 * fd, dtype,
                                     scale=0.02),
            "mlp0": _lin(next(keys), fd, fd, dtype),
            "mlp2": _lin(next(keys), fd, fd, dtype),
        })
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append({
            "input_layernorm": jnp.ones((d,), dtype),
            "post_attention_layernorm": jnp.ones((d,), dtype),
            "self_attn": {
                "q_proj": _lin(next(keys), d, nh * hd, dtype,
                               bias=cfg.attention_bias),
                "k_proj": _lin(next(keys), d, nkv * hd, dtype,
                               bias=cfg.attention_bias),
                "v_proj": _lin(next(keys), d, nkv * hd, dtype,
                               bias=cfg.attention_bias),
                "o_proj": _lin(next(keys), nh * hd, d, dtype,
                               bias=cfg.o_bias),
            },
            "mlp": {
                "gate_proj": _lin(next(keys), d, cfg.intermediate_size,
                                  dtype, bias=cfg.mlp_bias),
                "up_proj": _lin(next(keys), d, cfg.intermediate_size,
                                dtype, bias=cfg.mlp_bias),
                "down_proj": _lin(next(keys), cfg.intermediate_size, d,
                                  dtype, bias=cfg.mlp_bias),
            },
        })
    return params


def nextstep_param_shardings(params: Params) -> Params:
    col = {"q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"}
    row = {"o_proj", "down_proj"}

    def walk(path: tuple, leaf: Any) -> P:
        if leaf is None:
            return P()
        names = [q.key for q in path if hasattr(q, "key")]
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_nextstep_tensor(params: Params, name: str, value,
                           dtype) -> bool:
    """Map one HF checkpoint tensor (NextStepModel naming,
    modeling_nextstep.py :418 — separate q/k/v and gate/up shard
    names; head Sequential indices mlp.0/.2, adaLN_modulation.1)."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v) -> bool:
        slot[leaf] = w(v) if leaf == "w" else b(v)
        return True

    parts = name.split(".")
    if name == "embed_tokens.weight":
        params["embed_tokens"] = jnp.asarray(value).astype(dtype)
        return True
    if name == "norm.weight":
        params["norm"] = b(value)
        return True
    if parts[0] in ("lm_head", "image_in_projector",
                    "image_out_projector"):
        return put(params[parts[0]],
                   "w" if parts[1] == "weight" else "b", value)
    if parts[:2] == ["image_head", "net"]:
        head = params["image_head"]
        rest = parts[2:]
        if rest[0] == "time_embed" and rest[1] == "mlp":
            slot = {"0": "mlp0", "2": "mlp2"}.get(rest[2])
            if slot is None:
                return False
            return put(head["time_embed"][slot],
                       "w" if rest[3] == "weight" else "b", value)
        if rest[0] in ("cond_embed", "input_proj"):
            return put(head[rest[0]],
                       "w" if rest[1] == "weight" else "b", value)
        if rest[0] == "res_blocks":
            blk = head["res_blocks"][int(rest[1])]
            if rest[2] == "in_ln":
                blk["in_ln"]["w" if rest[3] == "weight" else "b"] = \
                    b(value)
                return True
            if rest[2] == "mlp":
                slot = {"0": "mlp0", "2": "mlp2"}.get(rest[3])
                if slot is None:
                    return False
                return put(blk[slot],
                           "w" if rest[4] == "weight" else "b", value)
            if rest[2] == "adaLN_modulation" and rest[3] == "1":
                return put(blk["adaLN_modulation"],
                           "w" if rest[4] == "weight" else "b", value)
            return False
        if rest[0] == "final_layer":
            fin = head["final_layer"]
            if rest[1] == "linear":
                return put(fin["linear"],
                           "w" if rest[2] == "weight" else "b", value)
            if rest[1] == "adaLN_modulation" and rest[2] == "1":
                return put(fin["adaLN_modulation"],
                           "w" if rest[3] == "weight" else "b", value)
        return False
    if parts[0] == "layers":
        blk = params["layers"][int(parts[1])]
        rest = parts[2:]
        if rest[0] in ("input_layernorm", "post_attention_layernorm") \
                and rest[1] == "weight":
            blk[rest[0]] = b(value)
            return True
        if rest[0] == "self_attn" and rest[1] in (
                "q_proj", "k_proj", "v_proj", "o_proj"):
            return put(blk["self_attn"][rest[1]],
                       "w" if rest[2] == "weight" else "b", value)
        if rest[0] == "mlp" and rest[1] in ("gate_proj", "up_proj",
                                            "down_proj"):
            return put(blk["mlp"][rest[1]],
                       "w" if rest[2] == "weight" else "b", value)
    return False
