"""QwenImage dual-stream MMDiT with the real checkpoint geometry.

Reference parity: diffusion/models/qwen_image/qwen_image_transformer.py
(QwenImageTransformer2DModel :866 — dual-stream blocks with separate
img/txt modulation+MLP and joint attention :690, QwenEmbedRope with
scale_rope centering :324, QwenTimestepProjEmbeddings :161) and the
diffusers checkpoint naming consumed by its load_weights (:1159).

TPU-first: a pure function over a param pytree keyed by the *diffusers*
module names, so `diffusion/loader.py` maps `transformer_blocks.N.attn.
to_q.weight` → `params["blocks"][N]["attn"]["to_q"]["w"]` mechanically.
One jitted program per resolution bucket; heads shard on "tp", the
joint sequence on "ulysses" (XLA SPMD emits the Ulysses all-to-alls the
reference hand-writes)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.dit import (_constrain, _layer_norm_nb,
                                         apply_rope_interleaved)
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


@dataclass
class QwenImageConfig:
    """Mirrors the transformer's diffusers config.json (reference
    QwenImageTransformer2DModel.__init__ defaults: patch_size 2,
    in_channels 64, out_channels 16, 60 layers, 24 heads × 128,
    joint_attention_dim 3584, axes_dims_rope (16, 56, 56))."""

    patch_size: int = 2
    in_channels: int = 64  # packed latent channels (16 × patch²)
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: tuple[int, int, int] = (16, 56, 56)
    guidance_embeds: bool = False
    eps: float = 1e-6
    # QwenImageLayered: is_rgb embedding added to the timestep
    # conditioning (QwenTimestepProjEmbeddings use_additional_t_cond)
    use_additional_t_cond: bool = False

    @property
    def inner_dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @classmethod
    def from_json(cls, cfg: dict) -> "QwenImageConfig":
        keep = {f for f in cls.__dataclass_fields__}
        kw = {k: v for k, v in cfg.items() if k in keep}
        if kw.get("out_channels") is None:
            kw.pop("out_channels", None)
        if "axes_dims_rope" in kw:
            kw["axes_dims_rope"] = tuple(kw["axes_dims_rope"])
        return cls(**kw)


# ---------------------------------------------------------------------------
# Rope (QwenEmbedRope, scale_rope=True)
# ---------------------------------------------------------------------------


def qwen_image_rope(cfg: QwenImageConfig, h_tokens: int, w_tokens: int,
                    txt_len: int, frame_idx: int = 0, cond_hw=None,
                    layers: int = 1
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Joint-stream cos/sin [Ttxt+Tvis, head_dim//2], stream order
    [txt; img].

    Reference QwenEmbedRope(:324, scale_rope=True): image h/w positions
    are CENTERED — h axis runs over [-(h-h//2), …, -1, 0, …, h//2-1]
    (negative side uses index·(-1)-1 of a flipped range, which is
    exactly the negative integers) — and text tokens are NOT identity:
    they take joint positions max(h//2, w//2) + [0, txt_len) applied to
    all three axes. Frame axis uses positions frame_idx + [0, F) (0 for
    stills; condition images shift idx)."""
    d_t, d_h, d_w = cfg.axes_dims_rope
    assert d_t + d_h + d_w == cfg.attention_head_dim

    def axis_freqs(pos: np.ndarray, dim: int) -> np.ndarray:
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64)
                                 / dim))
        return pos.astype(np.float64)[:, None] * inv[None, :]

    def grid(h, w, frame):
        h_pos = np.arange(-(h - h // 2), h // 2, dtype=np.float64)
        w_pos = np.arange(-(w - w // 2), w // 2, dtype=np.float64)
        t_pos = np.asarray([float(frame)])
        ff = np.broadcast_to(axis_freqs(t_pos, d_t)[:, None, None, :],
                             (1, h, w, d_t // 2))
        fh = np.broadcast_to(axis_freqs(h_pos, d_h)[None, :, None, :],
                             (1, h, w, d_h // 2))
        fw = np.broadcast_to(axis_freqs(w_pos, d_w)[None, None, :, :],
                             (1, h, w, d_w // 2))
        return np.concatenate([ff.reshape(-1, d_t // 2),
                               fh.reshape(-1, d_h // 2),
                               fw.reshape(-1, d_w // 2)], axis=-1)

    if layers > 1:
        # QwenImageLayered (QwenEmbedLayer3DRope :208): one grid per
        # generated layer at frame positions 0..layers−1
        vis = np.concatenate(
            [grid(h_tokens, w_tokens, i) for i in range(layers)],
            axis=0)
    else:
        vis = grid(h_tokens, w_tokens, frame_idx)
    txt_start = max(h_tokens // 2, w_tokens // 2)
    if layers > 1:
        # layered rope: max_vid_index also covers the layer count
        # (QwenEmbedLayer3DRope.forward — max(max_vid_index, layer_num))
        txt_start = max(txt_start, layers)
    if cond_hw is not None:
        # condition image of the Edit pipelines: frame position −1
        # (QwenEmbedRope _compute_condition_freqs — neg_freqs[-1]);
        # text positions start past the LARGEST image extent
        txt_start = max(txt_start, cond_hw[0] // 2, cond_hw[1] // 2)
    txt_pos = np.arange(txt_start, txt_start + txt_len, dtype=np.float64)
    txt = np.concatenate([axis_freqs(txt_pos, d_t),
                          axis_freqs(txt_pos, d_h),
                          axis_freqs(txt_pos, d_w)], axis=-1)

    parts = [txt, vis]
    if cond_hw is not None:
        parts.append(grid(cond_hw[0], cond_hw[1], -1))
    freqs = np.concatenate(parts, axis=0)
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


# ---------------------------------------------------------------------------
# Timestep conditioning (QwenTimestepProjEmbeddings)
# ---------------------------------------------------------------------------


def _qwen_timestep_embedding(t: jnp.ndarray, dim: int = 256,
                             scale: float = 1000.0) -> jnp.ndarray:
    """diffusers Timesteps(256, flip_sin_to_cos=True,
    downscale_freq_shift=0, scale=1000): [cos | sin] halves of
    scale·t·10000^(-i/half). Flow-match t ∈ [0,1] is scaled ×1000."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = scale * t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def qwen_time_embed(params: Params, t: jnp.ndarray, dtype,
                    t_cond=None) -> jnp.ndarray:
    """timestep → conditioning [B, inner] (timestep_embedder
    linear_1 → SiLU → linear_2). t_cond [B] int: the Layered
    pipeline's is_rgb flag through addition_t_embedding
    (QwenTimestepProjEmbeddings :193-205)."""
    e = _qwen_timestep_embedding(t).astype(dtype)
    e = linear(e, params["time_embed"]["linear_1"])
    e = jax.nn.silu(e.astype(jnp.float32)).astype(dtype)
    out = linear(e, params["time_embed"]["linear_2"])
    if t_cond is not None:
        table = params["time_embed"]["addition_t_embedding"]
        out = out + table.astype(out.dtype)[t_cond]
    return out


# ---------------------------------------------------------------------------
# Dual-stream block
# ---------------------------------------------------------------------------


def _mod_chunks(mod: jnp.ndarray, hs: int):
    """[B, 6H] → two (shift, scale, gate) triples: chunk(2) then
    chunk(3) — reference QwenImageTransformerBlock.forward :800."""
    m = mod.reshape(mod.shape[0], 6, hs)
    return (m[:, 0], m[:, 1], m[:, 2]), (m[:, 3], m[:, 4], m[:, 5])


def _ada_norm(x, shift, scale, eps):
    return _layer_norm_nb(x, eps) * (1.0 + scale[:, None, :]) \
        + shift[:, None, :]


def _ff(x, p: Params):
    """FeedForward: net.0.proj → gelu(tanh) → net.2."""
    h = linear(x, p["net0"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    return linear(h, p["net2"])


def qwen_image_block(blk: Params, cfg: QwenImageConfig, img: jnp.ndarray,
                     txt: jnp.ndarray, temb: jnp.ndarray,
                     cos: jnp.ndarray, sin: jnp.ndarray, mesh=None
                     ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One dual-stream block. img [B, Tv, H], txt [B, Tt, H]; cos/sin
    cover the JOINT stream [txt; img]. Returns (img', txt')."""
    b, tv, hs = img.shape
    tt = txt.shape[1]
    nh, hd = cfg.num_attention_heads, cfg.attention_head_dim
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)
    img_m1, img_m2 = _mod_chunks(linear(silu_t, blk["img_mod"]), hs)
    txt_m1, txt_m2 = _mod_chunks(linear(silu_t, blk["txt_mod"]), hs)

    att = blk["attn"]
    img_h = _ada_norm(img, img_m1[0], img_m1[1], cfg.eps)
    txt_h = _ada_norm(txt, txt_m1[0], txt_m1[1], cfg.eps)

    def qkv(x, p_q, p_k, p_v, n_tok):
        q = linear(x, p_q).reshape(b, n_tok, nh, hd)
        k = linear(x, p_k).reshape(b, n_tok, nh, hd)
        v = linear(x, p_v).reshape(b, n_tok, nh, hd)
        return q, k, v

    iq, ik, iv = qkv(img_h, att["to_q"], att["to_k"], att["to_v"], tv)
    tq, tk, tvv = qkv(txt_h, att["add_q_proj"], att["add_k_proj"],
                      att["add_v_proj"], tt)
    iq = rms_norm(iq, att["norm_q"], eps=cfg.eps)
    ik = rms_norm(ik, att["norm_k"], eps=cfg.eps)
    tq = rms_norm(tq, att["norm_added_q"], eps=cfg.eps)
    tk = rms_norm(tk, att["norm_added_k"], eps=cfg.eps)

    q = jnp.concatenate([tq, iq], axis=1)
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([tvv, iv], axis=1)
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)

    scale = hd ** -0.5
    if mesh is None:
        from vllm_omni_tpu.ops.flash_attention import flash_attention

        o = flash_attention(q, k, v, scale=scale)
    else:
        head_spec = P("cfg", None, ("ulysses", "tp"), None)
        q = _constrain(q, mesh, head_spec)
        k = _constrain(k, mesh, head_spec)
        v = _constrain(v, mesh, head_spec)
        o = mha_xla(q, k, v, scale=scale, causal=False)
        o = _constrain(o, mesh, P("cfg", "ulysses", None, None))
    o = o.reshape(b, tt + tv, nh * hd)
    txt_o = linear(o[:, :tt], att["to_add_out"])
    img_o = linear(o[:, tt:], att["to_out"])
    img = img + img_m1[2][:, None, :] * img_o
    txt = txt + txt_m1[2][:, None, :] * txt_o

    img_h2 = _ada_norm(img, img_m2[0], img_m2[1], cfg.eps)
    img = img + img_m2[2][:, None, :] * _ff(img_h2, blk["img_mlp"])
    txt_h2 = _ada_norm(txt, txt_m2[0], txt_m2[1], cfg.eps)
    txt = txt + txt_m2[2][:, None, :] * _ff(txt_h2, blk["txt_mlp"])
    return img, txt


# ---------------------------------------------------------------------------
# Latent packing (reference pipeline_qwen_image.py:456 _pack_latents)
# ---------------------------------------------------------------------------


def pack_latents(latents: jnp.ndarray, patch: int = 2) -> jnp.ndarray:
    """[B, H, W, C] → [B, (H/p)(W/p), C·p²] with CHANNEL-MAJOR patch
    layout (c, ph, pw) — matches diffusers' _pack_latents permute
    (0,2,4,1,3,5) so real img_in weights see the right feature order.
    (dit.patchify uses (ph, pw, c) — do not mix them.)"""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/p, W/p, C, p, p]
    return x.reshape(b, (h // patch) * (w // patch), c * patch * patch)


def unpack_latents(x: jnp.ndarray, h: int, w: int, patch: int = 2
                   ) -> jnp.ndarray:
    """Inverse of pack_latents → [B, H, W, C]."""
    b, t, cp = x.shape
    c = cp // (patch * patch)
    x = x.reshape(b, h // patch, w // patch, c, patch, patch)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H/p, p, W/p, p, C]
    return x.reshape(b, h, w, c)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def qwen_image_forward(params: Params, cfg: QwenImageConfig,
                       latents: jnp.ndarray, text_states: jnp.ndarray,
                       timesteps: jnp.ndarray,
                       cond_latents: Optional[jnp.ndarray] = None,
                       mesh=None, t_cond=None) -> jnp.ndarray:
    """latents [B, H, W, C_latent] (unpacked), text_states
    [B, Tt, joint_attention_dim], timesteps [B] (flow-match t ∈ [0,1]),
    cond_latents [B, H2, W2, C] (QwenImageEdit reference image —
    appended to the image stream with frame-position −1 rope ids and
    dropped from the prediction, pipeline_qwen_image_edit.py:757
    img_shapes + QwenEmbedRope condition freqs)
    → velocity prediction, same shape as latents.

    Packing: 2×2 patchify to in_channels (reference pipeline
    _pack_latents, pipeline_qwen_image.py:247), txt first in the joint
    stream."""
    layered = latents.ndim == 5
    if layered:
        b, frames, h, w, c = latents.shape
    else:
        b, h, w, c = latents.shape
        frames = 1
    p = cfg.patch_size
    (img, txt), temb, (cos, sin), n_target = qwen_image_prolog(
        params, cfg, latents, text_states, timesteps,
        cond_latents=cond_latents, mesh=mesh, t_cond=t_cond)

    if mesh is not None and mesh.shape.get("pp", 1) > 1:
        from vllm_omni_tpu.diffusion.dit import (gpipe_blocks,
                                                 stack_layers)

        stacked = params.get("blocks_stacked")
        if stacked is None:
            stacked = stack_layers(params["blocks"])

        def body(layer, carry, rows, shared):
            return qwen_image_block(layer, cfg, carry[0], carry[1],
                                    rows, shared[0], shared[1],
                                    mesh=None)

        img, txt = gpipe_blocks(stacked, body, (img, txt), temb,
                                (cos, sin), mesh)
    else:
        for blk in params["blocks"]:
            img, txt = qwen_image_block(blk, cfg, img, txt, temb, cos,
                                        sin, mesh=mesh)

    return qwen_image_epilog(params, cfg, img, temb, h, w, n_target,
                             frames=frames)


def qwen_image_prolog(params: Params, cfg: QwenImageConfig,
                      latents: jnp.ndarray, text_states: jnp.ndarray,
                      timesteps: jnp.ndarray,
                      cond_latents: Optional[jnp.ndarray] = None,
                      mesh=None, t_cond=None):
    """Embedding + conditioning stage → ((img, txt) carry, temb,
    (cos, sin) rope tables, n_target). The unit boundary the layerwise
    offloader and the PP GPipe body share with the plain forward.
    5D latents [B, F, H, W, C] = the Layered pipeline's stacked layer
    frames (frame-major token order; per-layer rope frame positions)."""
    if latents.ndim == 5:
        b, frames, h, w, c = latents.shape
        flat = latents.reshape(b * frames, h, w, c)
    else:
        b, h, w, c = latents.shape
        frames = 1
        flat = latents
    p = cfg.patch_size
    img = pack_latents(flat, p)  # [B·F, Tf, C·p²] channel-major
    img = img.reshape(b, frames * img.shape[1], img.shape[2])
    n_target = img.shape[1]
    cond_hw = None
    if cond_latents is not None:
        cond_hw = (cond_latents.shape[1] // p,
                   cond_latents.shape[2] // p)
        img = jnp.concatenate([img, pack_latents(cond_latents, p)],
                              axis=1)
    img = linear(img, params["img_in"])
    txt = rms_norm(text_states, params["txt_norm"], eps=cfg.eps)
    txt = linear(txt, params["txt_in"])
    img = _constrain(img, mesh, P("cfg", "ulysses", None))

    temb = qwen_time_embed(params, timesteps, img.dtype, t_cond=t_cond)
    cos, sin = qwen_image_rope(cfg, h // p, w // p,
                               text_states.shape[1], cond_hw=cond_hw,
                               layers=frames)
    return (img, txt), temb, (cos, sin), n_target


def qwen_image_epilog(params: Params, cfg: QwenImageConfig,
                      img: jnp.ndarray, temb: jnp.ndarray, h: int,
                      w: int, n_target: int,
                      frames: int = 1) -> jnp.ndarray:
    """Final AdaLN + projection back to latent patches."""
    # AdaLayerNormContinuous: linear(silu(temb)) → (scale, shift) —
    # NOTE order differs from the block modulation (diffusers
    # AdaLayerNormContinuous chunks scale first)
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["norm_out"])
    hs = cfg.inner_dim
    scale_o, shift_o = fin[:, :hs], fin[:, hs:]
    out = _ada_norm(img, shift_o, scale_o, cfg.eps)
    out = linear(out, params["proj_out"])  # [B, Tv, out_channels·p²]
    if out.shape[1] != n_target:
        out = out[:, :n_target]  # condition tokens carry no prediction
    if frames > 1:
        b = out.shape[0]
        out = out.reshape(b * frames, n_target // frames, out.shape[2])
        return unpack_latents(out, h, w, cfg.patch_size).reshape(
            b, frames, h, w, -1)
    return unpack_latents(out, h, w, cfg.patch_size)


def qwen_image_modulated_input(params: Params, cfg: QwenImageConfig,
                               latents: jnp.ndarray,
                               timesteps: jnp.ndarray) -> jnp.ndarray:
    """TeaCache probe: layer-0 img-stream AdaLN-modulated embedding
    (reference cache/teacache/extractors.py:225-229
    extract_qwen_context — block.img_mod(temb) first chunk applied to
    img_norm1(hidden)). Cheap relative to a full forward: one packing
    matmul + the timestep MLP + one modulation linear."""
    if latents.ndim == 5:  # Layered stacked frames
        b5, f5 = latents.shape[0], latents.shape[1]
        flat = latents.reshape(b5 * f5, *latents.shape[2:])
        img = pack_latents(flat, cfg.patch_size)
        img = img.reshape(b5, f5 * img.shape[1], img.shape[2])
    else:
        img = pack_latents(latents, cfg.patch_size)
    img = linear(img, params["img_in"])
    temb = qwen_time_embed(params, timesteps, img.dtype)
    silu_t = jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype)
    blk = params["blocks"][0]
    m1, _ = _mod_chunks(linear(silu_t, blk["img_mod"]), cfg.inner_dim)
    return _ada_norm(img, m1[0], m1[1], cfg.eps).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Init + sharding + name mapping
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def init_qwen_image_params(cfg: QwenImageConfig, key: jax.Array,
                           dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 16 + 8))
    hs = cfg.inner_dim
    qk = cfg.num_attention_heads * cfg.attention_head_dim
    mlp = hs * 4
    params: Params = {
        "img_in": _lin(next(keys), cfg.in_channels, hs, dtype),
        "txt_in": _lin(next(keys), cfg.joint_attention_dim, hs, dtype),
        "txt_norm": jnp.ones((cfg.joint_attention_dim,), dtype),
        "time_embed": {
            "linear_1": _lin(next(keys), 256, hs, dtype),
            "linear_2": _lin(next(keys), hs, hs, dtype),
            **({"addition_t_embedding": jnp.zeros((2, hs), dtype)}
               if cfg.use_additional_t_cond else {}),
        },
        "norm_out": _lin(next(keys), hs, 2 * hs, dtype, scale=0.02),
        "proj_out": _lin(next(keys), hs,
                         cfg.patch_size ** 2 * cfg.out_channels, dtype),
        "blocks": [],
    }
    for _ in range(cfg.num_layers):
        params["blocks"].append({
            "img_mod": _lin(next(keys), hs, 6 * hs, dtype, scale=0.02),
            "txt_mod": _lin(next(keys), hs, 6 * hs, dtype, scale=0.02),
            "attn": {
                "to_q": _lin(next(keys), hs, qk, dtype),
                "to_k": _lin(next(keys), hs, qk, dtype),
                "to_v": _lin(next(keys), hs, qk, dtype),
                "add_q_proj": _lin(next(keys), hs, qk, dtype),
                "add_k_proj": _lin(next(keys), hs, qk, dtype),
                "add_v_proj": _lin(next(keys), hs, qk, dtype),
                "to_out": _lin(next(keys), qk, hs, dtype),
                "to_add_out": _lin(next(keys), qk, hs, dtype),
                "norm_q": jnp.ones((cfg.attention_head_dim,), dtype),
                "norm_k": jnp.ones((cfg.attention_head_dim,), dtype),
                "norm_added_q": jnp.ones((cfg.attention_head_dim,), dtype),
                "norm_added_k": jnp.ones((cfg.attention_head_dim,), dtype),
            },
            "img_mlp": {"net0": _lin(next(keys), hs, mlp, dtype),
                        "net2": _lin(next(keys), mlp, hs, dtype)},
            "txt_mlp": {"net0": _lin(next(keys), hs, mlp, dtype),
                        "net2": _lin(next(keys), mlp, hs, dtype)},
        })
    return params


def qwen_image_param_shardings(params: Params) -> Params:
    """TP over "tp": qkv/mlp-in column-split, out/mlp-out row-split;
    modulation + embedders replicate (precision-sensitive and tiny —
    reference keeps them unquantized for the same reason)."""
    col = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
           "add_v_proj", "net0"}
    row = {"to_out", "to_add_out", "net2"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        if "blocks_stacked" in names:
            # PP: stacked [L, ...] leaves shard their layer axis over
            # "pp" (layer groups per rank; dit.gpipe_blocks)
            return P("pp")
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            return P("tp", None) if leaf_name == "w" else P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)


def assign_qwen_image_tensor(params: Params, name: str, value, dtype
                             ) -> bool:
    """Map one diffusers-format tensor (QwenImageTransformer2DModel
    naming, reference load_weights :1159) into the pytree. Torch Linear
    weights [out, in] transpose to [in, out]. Returns False if the name
    is not recognized."""
    import numpy as _np

    def w(v):
        return jnp.asarray(_np.ascontiguousarray(v.T)).astype(dtype)

    def b(v):
        return jnp.asarray(v).astype(dtype)

    def put(slot: dict, leaf: str, v):
        slot[leaf] = w(v) if leaf == "w" else b(v)

    parts = name.split(".")
    top = {
        ("img_in", "weight"): ("img_in", "w"),
        ("img_in", "bias"): ("img_in", "b"),
        ("txt_in", "weight"): ("txt_in", "w"),
        ("txt_in", "bias"): ("txt_in", "b"),
        ("proj_out", "weight"): ("proj_out", "w"),
        ("proj_out", "bias"): ("proj_out", "b"),
    }
    if tuple(parts) in top:
        slot, leaf = top[tuple(parts)]
        put(params[slot], leaf, value)
        return True
    if parts == ["txt_norm", "weight"]:
        params["txt_norm"] = b(value)
        return True
    if parts[:2] == ["time_text_embed", "timestep_embedder"]:
        put(params["time_embed"][parts[2]],
            "w" if parts[3] == "weight" else "b", value)
        return True
    if parts[:2] == ["time_text_embed", "addition_t_embedding"]:
        if "addition_t_embedding" not in params["time_embed"]:
            return False
        params["time_embed"]["addition_t_embedding"] = \
            jnp.asarray(value).astype(dtype)
        return True
    if parts[:2] == ["norm_out", "linear"]:
        put(params["norm_out"], "w" if parts[2] == "weight" else "b",
            value)
        return True
    if parts[0] != "transformer_blocks":
        return False
    blk = params["blocks"][int(parts[1])]
    rest = parts[2:]
    # img_mod.1 / txt_mod.1 (index 1 = the Linear inside nn.Sequential)
    if rest[0] in ("img_mod", "txt_mod") and rest[1] == "1":
        put(blk[rest[0]], "w" if rest[2] == "weight" else "b", value)
        return True
    if rest[0] == "attn":
        a = blk["attn"]
        if rest[1] in ("norm_q", "norm_k", "norm_added_q",
                       "norm_added_k") and rest[2] == "weight":
            a[rest[1]] = b(value)
            return True
        if rest[1] in ("to_q", "to_k", "to_v", "add_q_proj",
                       "add_k_proj", "add_v_proj", "to_add_out"):
            put(a[rest[1]], "w" if rest[2] == "weight" else "b", value)
            return True
        if rest[1] == "to_out":
            # diffusers wraps in ModuleList: attn.to_out.0.weight
            leaf = rest[3] if rest[2] == "0" else rest[2]
            put(a["to_out"], "w" if leaf == "weight" else "b", value)
            return True
        return False
    if rest[0] in ("img_mlp", "txt_mlp") and rest[1] == "net":
        # net.0.proj.{weight,bias} | net.2.{weight,bias}
        mlp = blk[rest[0]]
        if rest[2] == "0":
            put(mlp["net0"], "w" if rest[4] == "weight" else "b", value)
            return True
        if rest[2] == "2":
            put(mlp["net2"], "w" if rest[3] == "weight" else "b", value)
            return True
    return False
