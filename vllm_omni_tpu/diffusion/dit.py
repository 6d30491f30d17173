"""MMDiT-style diffusion transformer (Qwen-Image / Flux class).

Reference parity: diffusion/models/qwen_image/transformer_qwen_image.py
and flux/ (joint text+image token stream, AdaLN-Zero modulation, QK-norm,
2D rope on image tokens). TPU-first: pure function over a param pytree;
the whole denoise step jits to one fixed-shape program per resolution
bucket; heads shard on mesh axis "tp", sequence on "ulysses" (via
jit sharding propagation — attention is full-sequence non-causal, the
all-to-alls the reference hand-writes in parallel/ulysses.py:52-150 come
out of XLA SPMD here).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vllm_omni_tpu.diffusion.config import DiTConfig
from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import rms_norm

Params = dict


def _constrain(x: jnp.ndarray, mesh, spec: P) -> jnp.ndarray:
    """Sharding hint under SPMD jit; no-op without a mesh. This is the
    whole of the reference's `_sp_plan` hook machinery (sp_plan.py,
    hooks/sequence_parallel.py): declare where the sequence/heads live,
    XLA inserts the Ulysses all-to-alls."""
    if mesh is None:
        return x
    from jax.sharding import NamedSharding

    # drop axes that don't divide the dim (uneven seq lens fall back to
    # replication on that dim rather than erroring — the reference's UAA
    # variable-split mode handles this with padded all-to-alls)
    fixed = []
    for dim, entry in zip(x.shape, spec):
        axes = entry if isinstance(entry, tuple) else (
            (entry,) if entry else ())
        size = 1
        for a in axes:
            size *= mesh.shape.get(a, 1)
        fixed.append(entry if size > 1 and dim % size == 0 else None)
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*fixed)))


# ---------------------------------------------------------------------------
# Embeddings
# ---------------------------------------------------------------------------


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """Sinusoidal [B] → [B, dim] (f32)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_3d(cfg: DiTConfig, f_tokens: int, h_tokens: int, w_tokens: int,
            text_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token cos/sin [T_total, head_dim//2] — visual tokens get
    (frame, h, w) axis frequencies (frame=0 for stills), text tokens
    identity rotation (cos=1, sin=0), matching the reference's rotary
    with zero text ids (video: Wan/LTX-class 3D rope)."""
    d_t, d_h, d_w = cfg.axes_dims_rope
    assert d_t + d_h + d_w == cfg.head_dim, "axes dims must sum to head_dim"
    hd2 = cfg.head_dim // 2

    def axis_freqs(pos, dim):
        # dim is the full width for this axis; uses dim//2 frequencies
        inv = 1.0 / (10000.0 ** (
            jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
        return pos[:, None] * inv[None, :]

    n_spatial = h_tokens * w_tokens
    hh = jnp.tile(jnp.repeat(jnp.arange(h_tokens, dtype=jnp.float32),
                             w_tokens), f_tokens)
    ww = jnp.tile(jnp.arange(w_tokens, dtype=jnp.float32),
                  h_tokens * f_tokens)
    tt = jnp.repeat(jnp.arange(f_tokens, dtype=jnp.float32), n_spatial)
    freqs = jnp.concatenate([axis_freqs(tt, d_t), axis_freqs(hh, d_h),
                             axis_freqs(ww, d_w)], axis=-1)  # [Tvis, hd2]
    img_cos, img_sin = jnp.cos(freqs), jnp.sin(freqs)
    txt_cos = jnp.ones((text_len, hd2), jnp.float32)
    txt_sin = jnp.zeros((text_len, hd2), jnp.float32)
    return (jnp.concatenate([txt_cos, img_cos], axis=0),
            jnp.concatenate([txt_sin, img_sin], axis=0))


def rope_2d(cfg: DiTConfig, h_tokens: int, w_tokens: int,
            text_len: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return rope_3d(cfg, 1, h_tokens, w_tokens, text_len)


def apply_rope_interleaved(x: jnp.ndarray, cos: jnp.ndarray,
                           sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, D]; cos/sin [T, D//2]; rotate (even, odd) pairs (Flux
    convention)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return out.reshape(x.shape).astype(orig)


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------


def _modulate(x, shift, scale):
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]


def _dit_block(layer: Params, cfg: DiTConfig, x: jnp.ndarray,
               mod: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
               mesh=None) -> jnp.ndarray:
    """AdaLN-Zero joint block: attn + mlp, 6 modulation params from the
    timestep vector. x: [B, T, H]; mod: [B, 6*H].

    With a mesh: x rides sequence-sharded over "ulysses"; around
    attention q/k/v are re-constrained to head-sharded, which makes XLA
    emit exactly the Ulysses all-to-all pair (reference
    attention/parallel/ulysses.py:52-150 hand-writes these).
    """
    b, t, hsz = x.shape
    m = mod.reshape(b, 6, hsz)
    shift_a, scale_a, gate_a = m[:, 0], m[:, 1], m[:, 2]
    shift_m, scale_m, gate_m = m[:, 3], m[:, 4], m[:, 5]

    h = _layer_norm_nb(x)
    h = _modulate(h, shift_a, scale_a)
    q = linear(h, layer["q_proj"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = linear(h, layer["k_proj"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    v = linear(h, layer["v_proj"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    q = rms_norm(q, layer["q_norm"])
    k = rms_norm(k, layer["k_norm"])
    q = apply_rope_interleaved(q, cos, sin)
    k = apply_rope_interleaved(k, cos, sin)
    from vllm_omni_tpu.ops.ring_attention import (ring_applicable,
                                                  ring_attention)

    if ring_applicable(mesh, q.shape):
        # ring SP: seq shards stay put, KV blocks rotate over ICI with
        # online-softmax merge (composes with head-parallel ulysses/tp)
        attn = ring_attention(q, k, v, scale=cfg.head_dim ** -0.5,
                              mesh=mesh)
    elif mesh is None:
        if cfg.attention_backend == "int8":
            # SageAttention role: int8 Q/K on the MXU int path
            from vllm_omni_tpu.ops.flash_attention import int8_attention

            attn = int8_attention(q, k, v, scale=cfg.head_dim ** -0.5)
        else:
            # Pallas flash attention (VMEM-blocked online softmax — no
            # [T, S] score materialization)
            from vllm_omni_tpu.ops.flash_attention import flash_attention

            attn = flash_attention(q, k, v, scale=cfg.head_dim ** -0.5)
    else:
        # Ulysses: seq-shard → head-shard for the attention body
        head_spec = P("cfg", None, ("ulysses", "tp"), None)
        q = _constrain(q, mesh, head_spec)
        k = _constrain(k, mesh, head_spec)
        v = _constrain(v, mesh, head_spec)
        attn = mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=False)
        attn = _constrain(attn, mesh, P("cfg", "ulysses", None, None))
    attn = linear(attn.reshape(b, t, cfg.num_heads * cfg.head_dim),
                  layer["o_proj"])
    x = x + gate_a[:, None, :] * attn

    h = _layer_norm_nb(x)
    h = _modulate(h, shift_m, scale_m)
    if "experts" in layer:
        h = _dit_moe_mlp(layer, cfg, h)
    else:
        h = linear(h, layer["mlp_in"])
        h = jax.nn.gelu(h.astype(jnp.float32),
                        approximate=True).astype(x.dtype)
        h = linear(h, layer["mlp_out"])
    return x + gate_m[:, None, :] * h


def _dit_moe_mlp(layer: Params, cfg: DiTConfig,
                 x: jnp.ndarray) -> jnp.ndarray:
    """Routed-expert FFN for MoE DiT blocks (HunyuanImage3 role,
    reference diffusion/models/hunyuan_image3 MoE DiT + EP over the
    non-PP ranks, docs/design/feature/expert_parallel.md).

    Dense dispatch, same rationale as the AR tower's `_moe_mlp`
    (models/decoder.py): at denoise token counts the layer is weight-
    bandwidth-bound, every expert's weights stream from HBM regardless,
    and static shapes keep XLA happy. EP = the expert axis of the
    einsums sharded over "tp" (dit_param_shardings), so each rank
    streams only its expert shard and the combine is a psum XLA inserts."""
    b, t, hs = x.shape
    xf = x.reshape(b * t, hs)
    logits = jnp.dot(xf, layer["router"]["w"].astype(xf.dtype),
                     preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
    k = min(cfg.num_experts_per_tok, cfg.num_experts)
    topk_p, topk_i = jax.lax.top_k(probs, k)
    topk_p = topk_p / jnp.sum(topk_p, axis=-1, keepdims=True)
    combine = jnp.zeros_like(probs).at[
        jnp.arange(xf.shape[0])[:, None], topk_i].set(topk_p)
    ew = layer["experts"]
    hcur = jnp.einsum("th,ehi->eti", xf, ew["mlp_in"].astype(xf.dtype),
                      preferred_element_type=jnp.float32)
    hcur = jax.nn.gelu(hcur, approximate=True).astype(x.dtype)
    out = jnp.einsum("eti,eih->eth", hcur,
                     ew["mlp_out"].astype(x.dtype),
                     preferred_element_type=jnp.float32)
    mixed = jnp.einsum("te,eth->th", combine.astype(jnp.float32), out)
    return mixed.astype(x.dtype).reshape(b, t, hs)


def _layer_norm_nb(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """LayerNorm without learned affine (AdaLN provides it)."""
    orig = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(orig)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def patchify(latents: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, (H/p)(W/p), C·p²]."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // patch, patch, w // patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // patch) * (w // patch), patch * patch * c)


def unpatchify(x: jnp.ndarray, h: int, w: int, patch: int,
               channels: int) -> jnp.ndarray:
    """Inverse of patchify → [B, H, W, C]."""
    b = x.shape[0]
    x = x.reshape(b, h // patch, w // patch, patch, patch, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, channels)


def modulated_input(params: Params, cfg: DiTConfig, latents: jnp.ndarray,
                    timesteps: jnp.ndarray) -> jnp.ndarray:
    """Layer-0 AdaLN-modulated image embedding — the TeaCache skip
    metric's probe signal (reference cache/teacache/extractors: the
    modulated input of the first transformer block). Cheap relative to a
    full forward: one patchify matmul + the timestep MLP."""
    if latents.ndim == 5:
        b, f, h, w, c = latents.shape
        latents = latents.reshape(b * f, h, w, c)
        timesteps = jnp.repeat(timesteps, f)
    img = linear(patchify(latents, cfg.patch_size), params["img_in"])
    temb = timestep_embedding(timesteps, 256)
    temb = linear(temb.astype(img.dtype), params["time_in_1"])
    temb = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                  params["time_in_2"])
    mod = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(img.dtype),
                 params["layers"][0]["ada_mod"])
    b = img.shape[0]
    m = mod.reshape(b, 6, cfg.hidden_size)
    return _modulate(_layer_norm_nb(img), m[:, 0], m[:, 1])


def dit_prolog(params: Params, cfg: DiTConfig, latents: jnp.ndarray,
               text_states: jnp.ndarray, timesteps: jnp.ndarray,
               mesh=None):
    """Embedding + conditioning stage: → (x [B,T,H], temb [B,H])."""
    video = latents.ndim == 5
    if video:
        b, f, h, w, c = latents.shape
        frames = latents.reshape(b * f, h, w, c)
    else:
        b, h, w, c = latents.shape
        f = 1
        frames = latents
    p = cfg.patch_size
    img = patchify(frames, p)  # [B*F, n, pd]
    img = img.reshape(b, f * img.shape[1], img.shape[2])
    img = linear(img, params["img_in"])
    txt = linear(text_states, params["txt_in"])
    x = jnp.concatenate([txt, img], axis=1)
    x = _constrain(x, mesh, P("cfg", "ulysses", None))

    temb = timestep_embedding(timesteps, 256)
    temb = linear(temb.astype(x.dtype), params["time_in_1"])
    temb = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype),
                  params["time_in_2"])  # [B, H]
    return x, temb


def dit_block_apply(layer: Params, cfg: DiTConfig, x: jnp.ndarray,
                    temb: jnp.ndarray, cos: jnp.ndarray,
                    sin: jnp.ndarray, mesh=None) -> jnp.ndarray:
    """One transformer block incl. its AdaLN modulation — the unit the
    layerwise offloader streams (all blocks share one compiled program)."""
    mod = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype),
                 layer["ada_mod"])  # [B, 6H]
    return _dit_block(layer, cfg, x, mod, cos, sin, mesh=mesh)


def dit_epilog(params: Params, cfg: DiTConfig, x: jnp.ndarray,
               temb: jnp.ndarray, text_len: int, latent_shape
               ) -> jnp.ndarray:
    """Final AdaLN + projection back to latent patches."""
    video = len(latent_shape) == 5
    if video:
        b, f, h, w, c = latent_shape
    else:
        b, h, w, c = latent_shape
        f = 1
    p = cfg.patch_size
    fin = linear(jax.nn.silu(temb.astype(jnp.float32)).astype(x.dtype),
                 params["final_mod"])  # [B, 2H]
    shift, scale = fin[:, :fin.shape[1] // 2], fin[:, fin.shape[1] // 2:]
    img_x = x[:, text_len:]
    img_x = _modulate(_layer_norm_nb(img_x), shift, scale)
    out = linear(img_x, params["final_proj"])  # [B, F*n, pd]
    out = out.reshape(b * f, out.shape[1] // f, out.shape[2])
    frames_out = unpatchify(out, h, w, p, c)
    if video:
        return frames_out.reshape(b, f, h, w, c)
    return frames_out


def dit_rope(cfg: DiTConfig, latent_shape, text_len: int):
    video = len(latent_shape) == 5
    f = latent_shape[1] if video else 1
    h, w = latent_shape[-3], latent_shape[-2]
    p = cfg.patch_size
    return rope_3d(cfg, f, h // p, w // p, text_len)


def dit_forward(params: Params, cfg: DiTConfig, latents: jnp.ndarray,
                text_states: jnp.ndarray, timesteps: jnp.ndarray,
                mesh=None) -> jnp.ndarray:
    """latents [B, H, W, C] (or video [B, F, H, W, C]), text_states
    [B, Ttxt, text_dim], timesteps [B] → velocity prediction.

    mesh axes used when present: "cfg" shards the CFG batch rows,
    "ulysses" shards the joint token sequence, "tp" shards heads/MLP.
    """
    x, temb = dit_prolog(params, cfg, latents, text_states, timesteps,
                         mesh=mesh)
    cos, sin = dit_rope(cfg, latents.shape, text_states.shape[1])
    if mesh is not None and mesh.shape.get("pp", 1) > 1:
        x = _dit_blocks_pp(params, cfg, x, temb, cos, sin, mesh)
    else:
        for layer in params["layers"]:
            x = dit_block_apply(layer, cfg, x, temb, cos, sin, mesh=mesh)
    return dit_epilog(params, cfg, x, temb, text_states.shape[1],
                      latents.shape)


def stack_layers(layers: list) -> Params:
    """Per-layer param dicts → one pytree with a leading [L] axis (the
    unit PP shards over "pp")."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def gpipe_blocks(stacked: Params, body, carry, row_consts,
                 shared_consts, mesh):
    """Family-generic pipeline-parallel transformer body: layer groups
    live on "pp" ranks, activations hand off rank→rank via ppermute in
    a GPipe schedule over batch rows (microbatch = one row; exact
    numerics — attention sees the full sequence of its own row).

    ``carry``: pytree of [B, ...] activations pipelined through the
    blocks (single stream for generic/wan; (img, txt) for qwen_image).
    ``row_consts``: pytree of [B, ...] per-row conditioning (temb,
    projected text for cross-attn, ...) indexed per microbatch.
    ``shared_consts``: pytree broadcast to every microbatch (rope
    tables). ``body(layer, carry, row_consts, shared_consts) → carry``.

    Replaces the reference's PipeFusion-style P2P latent-segment
    pipeline (diffusion/distributed/group_coordinator.py:549
    pipeline_send/recv + shape negotiation): on TPU the handoff is one
    `ppermute` over ICI inside the jitted step, no host P2P plane.
    Composes with the outer cfg/dp axes only (sp/tp stay 1 under pp).
    """
    pp = mesh.shape["pp"]
    n_layers = jax.tree.leaves(stacked)[0].shape[0]
    assert n_layers % pp == 0, (n_layers, pp)
    grouped = jax.tree.map(
        lambda a: a.reshape(pp, n_layers // pp, *a.shape[1:]), stacked)
    m = jax.tree.leaves(carry)[0].shape[0]  # microbatches = batch rows
    t_total = m + pp - 1

    def _row(tree_all, idx):
        return jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, jnp.clip(idx, 0, m - 1), keepdims=True), tree_all)

    def rank_fn(groups, carry_all, rows_all, shared):
        g = jax.lax.axis_index("pp")
        local = jax.tree.map(lambda a: a[0], groups)  # [L/pp, ...]
        state = jax.tree.map(lambda a: jnp.zeros_like(a[:1]), carry_all)
        out = jax.tree.map(jnp.zeros_like, carry_all)

        def apply_group(feed, mb_idx):
            rows = _row(rows_all, mb_idx)

            def one(c, layer):
                return body(layer, c, rows, shared), None

            y, _ = jax.lax.scan(one, feed, local)
            return y

        perm = [(i, (i + 1) % pp) for i in range(pp)]
        for t in range(t_total):
            incoming = jax.tree.map(
                lambda s: jax.lax.ppermute(s, "pp", perm), state)
            mb_in = t - g  # microbatch this rank works on this tick
            first = _row(carry_all, t)
            feed = jax.tree.map(
                lambda f_, i_: jnp.where(g == 0, f_, i_), first,
                incoming)
            state = apply_group(feed, mb_in)
            m_out = t - (pp - 1)
            valid = (g == pp - 1) & (m_out >= 0)
            idx = jnp.clip(m_out, 0, m - 1)
            out = jax.tree.map(
                lambda o, s: jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(
                        valid, s, jax.lax.dynamic_index_in_dim(
                            o, idx, keepdims=True)), idx, 0),
                out, state)
        # only the last rank holds real outputs → broadcast over "pp"
        out = jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(g == pp - 1, o, jnp.zeros_like(o)), "pp"),
            out)
        return out

    fn = jax.shard_map(
        rank_fn, mesh=mesh,
        in_specs=(P("pp"), P(), P(), P()),
        out_specs=P())
    return fn(grouped, carry, row_consts, shared_consts)


def _dit_blocks_pp(params: Params, cfg: DiTConfig, x: jnp.ndarray,
                   temb: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                   mesh) -> jnp.ndarray:
    """Generic-tier GPipe body over `gpipe_blocks`."""
    stacked = params.get("layers_stacked")
    if stacked is None:
        stacked = stack_layers(params["layers"])

    def body(layer, carry, rows, shared):
        return dit_block_apply(layer, cfg, carry, rows, shared[0],
                               shared[1], mesh=None)

    return gpipe_blocks(stacked, body, x, temb, (cos, sin), mesh)


# ---------------------------------------------------------------------------
# Init + sharding
# ---------------------------------------------------------------------------


def _lin(key, k_in, n_out, dtype, scale=None):
    s = (k_in ** -0.5) if scale is None else scale
    return {"w": (jax.random.normal(key, (k_in, n_out), jnp.float32) *
                  s).astype(dtype),
            "b": jnp.zeros((n_out,), dtype)}


def init_dit_params(cfg: DiTConfig, key: jax.Array,
                    dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 10 + 8))
    hs = cfg.hidden_size
    mlp = int(hs * cfg.mlp_ratio)
    qk = cfg.num_heads * cfg.head_dim
    params: Params = {
        "img_in": _lin(next(keys), cfg.patch_dim, hs, dtype),
        "txt_in": _lin(next(keys), cfg.text_dim, hs, dtype),
        "time_in_1": _lin(next(keys), 256, hs, dtype),
        "time_in_2": _lin(next(keys), hs, hs, dtype),
        "final_mod": _lin(next(keys), hs, 2 * hs, dtype, scale=0.02),
        "final_proj": _lin(next(keys), hs, cfg.patch_dim, dtype),
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        layer = {
            # trained checkpoints are AdaLN-Zero; random init uses small
            # nonzero modulation so blocks (and thus conditioning) are
            # active in the tiny-model test tier
            "ada_mod": _lin(next(keys), hs, 6 * hs, dtype, scale=0.02),
            "q_proj": _lin(next(keys), hs, qk, dtype),
            "k_proj": _lin(next(keys), hs, qk, dtype),
            "v_proj": _lin(next(keys), hs, qk, dtype),
            "o_proj": _lin(next(keys), qk, hs, dtype),
            "q_norm": jnp.ones((cfg.head_dim,), dtype),
            "k_norm": jnp.ones((cfg.head_dim,), dtype),
        }
        if cfg.is_moe:
            # MoE DiT block (HunyuanImage3 role): router + per-expert
            # gelu FFN; the expert axis shards over "tp" (EP)
            e = cfg.num_experts
            layer["router"] = {"w": (jax.random.normal(
                next(keys), (hs, e), jnp.float32) * hs ** -0.5
            ).astype(dtype)}
            layer["experts"] = {
                "mlp_in": (jax.random.normal(
                    next(keys), (e, hs, mlp), jnp.float32) *
                    hs ** -0.5).astype(dtype),
                "mlp_out": (jax.random.normal(
                    next(keys), (e, mlp, hs), jnp.float32) *
                    mlp ** -0.5).astype(dtype),
            }
        else:
            layer["mlp_in"] = _lin(next(keys), hs, mlp, dtype)
            layer["mlp_out"] = _lin(next(keys), mlp, hs, dtype)
        params["layers"].append(layer)
    return params


def dit_param_shardings(params: Params) -> Params:
    """TP over axis "tp": attention heads + MLP column/row split. AdaLN
    and embedders replicate (tiny)."""
    col = {"q_proj", "k_proj", "v_proj", "mlp_in"}
    row = {"o_proj", "mlp_out"}

    def walk(path: tuple, leaf: Any) -> P:
        names = [q.key for q in path if hasattr(q, "key")]
        if "layers_stacked" in names:
            # PP: stacked [L, ...] leaves shard their layer axis over
            # "pp" (layer groups per rank; see _dit_blocks_pp)
            return P("pp")
        leaf_name = names[-1] if names else ""
        parent = names[-2] if len(names) >= 2 else ""
        if parent == "experts":
            # EP: expert axis over "tp" — each rank streams its expert
            # shard; the routed combine's psum rides ICI
            return P("tp", None, None)
        if parent in col:
            return P(None, "tp") if leaf_name == "w" else P("tp")
        if parent in row:
            if leaf_name == "w":
                return P("tp", None)
            return P()
        return P()

    return jax.tree_util.tree_map_with_path(walk, params)
