"""Qwen2-VL vision tower — the ViT the Qwen omni/VL families actually
use (2D rotary attention, merge-grouped patch order, 2x2 PatchMerger).

Reference parity: the vision towers of qwen2_5_omni / glm_image-class
families (model_executor/models/qwen2_5_omni/) are Qwen2-VL-derived;
HF oracle = transformers Qwen2VisionTransformerPretrainedModel. Exact
semantics mirrored:

- patch extraction in MERGE-GROUPED order — (t, h/m, w/m, m, m) with
  per-patch layout (C, tps, p, p) (Qwen2VLImageProcessor flattening);
  single images repeat the frame across temporal_patch_size
- 2D rotary embedding: per-patch (h, w) grid ids in the same
  merge-grouped order; freqs of dim head_dim/4 per axis, concatenated
  (h ++ w) then duplicated, rotate-half application in f32
- pre-LN blocks with fused-qkv attention (bias) and quick-gelu MLP
- PatchMerger: ln_q → reshape to m²·D → linear → exact GELU → linear

Pure functions over a param pytree like every other tower; one-shot jit
at request-add time (no KV cache; full bidirectional attention on the
MXU). Weights load from genuine HF safetensors naming.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.models.encoders import (_act, _lin_t, _ln_t,
                                           _read_safetensors,
                                           _strip_prefix)
from vllm_omni_tpu.ops.layernorm import layer_norm

Params = dict


@dataclass(frozen=True)
class Qwen2VLVisionConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    hidden_size: int = 3584  # output (LLM embedding) width
    act: str = "quick_gelu"
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads


def extract_patches(pixels: jnp.ndarray, cfg: Qwen2VLVisionConfig
                    ) -> tuple[jnp.ndarray, int, int]:
    """pixels [H, W, 3] (single image) → (flat patches
    [gh·gw, C·tps·p·p] in merge-grouped order, gh, gw) — the
    Qwen2VLImageProcessor flattening."""
    h, w, c = pixels.shape
    p, m, tps = (cfg.patch_size, cfg.spatial_merge_size,
                 cfg.temporal_patch_size)
    gh, gw = h // p, w // p
    img = jnp.transpose(pixels, (2, 0, 1))  # [C, H, W]
    frames = jnp.broadcast_to(img[None], (tps, c, h, w))
    x = frames.reshape(tps, c, gh // m, m, p, gw // m, m, p)
    # processor: (grid_t, tps, C, gh/m, m, p, gw/m, m, p)
    #   .transpose(0, 3, 6, 4, 7, 2, 1, 5, 8) — here without grid_t
    x = jnp.transpose(x, (2, 5, 3, 6, 1, 0, 4, 7))
    return x.reshape(gh * gw, c * tps * p * p), gh, gw


def _grid_pos_ids(gh: int, gw: int, m: int) -> np.ndarray:
    """[N, 2] (h, w) ids in merge-grouped order (HF rot_pos_emb)."""
    hpos = np.arange(gh)[:, None].repeat(gw, 1)
    hpos = hpos.reshape(gh // m, m, gw // m, m).transpose(
        0, 2, 1, 3).reshape(-1)
    wpos = np.arange(gw)[None, :].repeat(gh, 0)
    wpos = wpos.reshape(gh // m, m, gw // m, m).transpose(
        0, 2, 1, 3).reshape(-1)
    return np.stack([hpos, wpos], axis=-1)


def _rope_cos_sin(cfg: Qwen2VLVisionConfig, gh: int, gw: int
                  ) -> tuple[jnp.ndarray, jnp.ndarray]:
    dim = cfg.head_dim // 2  # rotary dim per VisionRotaryEmbedding
    inv_freq = 1.0 / (cfg.rope_theta **
                      (np.arange(0, dim, 2, dtype=np.float32) / dim))
    pos = _grid_pos_ids(gh, gw, cfg.spatial_merge_size)  # [N, 2]
    freqs = pos[..., None].astype(np.float32) * inv_freq  # [N, 2, dim/2]
    rope = freqs.reshape(pos.shape[0], -1)  # h freqs ++ w freqs
    emb = np.concatenate([rope, rope], axis=-1)  # [N, head_dim]
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(x: jnp.ndarray, cos: jnp.ndarray,
                sin: jnp.ndarray) -> jnp.ndarray:
    xf = x.astype(jnp.float32)  # [N, heads, d]
    c, s = cos[:, None, :], sin[:, None, :]
    return ((xf * c) + (_rotate_half(xf) * s)).astype(x.dtype)


def qwen2vl_vision_forward(params: Params, cfg: Qwen2VLVisionConfig,
                           pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [H, W, 3] → merged features [gh·gw/m², hidden_size]."""
    patches, gh, gw = extract_patches(pixels, cfg)
    x = patches @ params["patch_embed"].astype(patches.dtype)  # [N, D]
    cos, sin = _rope_cos_sin(cfg, gh, gw)
    n, d = x.shape
    nh, hd = cfg.num_heads, cfg.head_dim
    for layer in params["blocks"]:
        y = layer_norm(x, layer["ln1_w"], layer["ln1_b"], eps=1e-6)
        qkv = linear(y, layer["qkv"]).reshape(n, 3, nh, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        qf = q.transpose(1, 0, 2).astype(jnp.float32)  # [nh, N, hd]
        kf = k.transpose(1, 0, 2).astype(jnp.float32)
        vf = v.transpose(1, 0, 2).astype(jnp.float32)
        scores = jnp.einsum("hnd,hmd->hnm", qf, kf) * hd ** -0.5
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hnm,hmd->hnd", probs, vf)
        attn = attn.transpose(1, 0, 2).reshape(n, d).astype(x.dtype)
        x = x + linear(attn, layer["proj"])
        y = layer_norm(x, layer["ln2_w"], layer["ln2_b"], eps=1e-6)
        x = x + linear(_act(linear(y, layer["fc1"]), cfg.act),
                       layer["fc2"])
    # PatchMerger
    m2 = cfg.spatial_merge_size ** 2
    y = layer_norm(x, params["ln_q_w"], params["ln_q_b"], eps=1e-6)
    y = y.reshape(n // m2, m2 * d)
    y = linear(y, params["merge_fc1"])
    y = _act(y, "gelu")  # nn.GELU default = exact erf
    return linear(y, params["merge_fc2"])


def load_qwen2vl_vision_encoder(path: str, dtype=jnp.float32
                                ) -> tuple[Qwen2VLVisionConfig, Params]:
    """Load from HF safetensors naming (visual./vision_tower. prefixes
    or a bare tower checkpoint):
      patch_embed.proj.weight       Conv3d [D, 3, tps, p, p] (no bias)
      blocks.N.{norm1, norm2}.{weight, bias}
      blocks.N.attn.{qkv, proj}.{weight, bias}
      blocks.N.mlp.{fc1, fc2}.{weight, bias}
      merger.ln_q.{weight, bias}, merger.mlp.{0, 2}.{weight, bias}
    """
    import json
    import os

    tensors = _read_safetensors(path)
    cfg_file = os.path.join(
        path if os.path.isdir(path) else os.path.dirname(path),
        "config.json")
    hf = {}
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            hf = json.load(f)
        hf = hf.get("vision_config", hf)
    tensors = _strip_prefix(tensors, ("thinker.visual.", "visual.",
                                      "vision_tower."))
    pe = np.asarray(tensors["patch_embed.proj.weight"], np.float32)
    d, c, tps, p, _ = pe.shape
    n_layers = 1 + max(int(k.split(".")[1]) for k in tensors
                       if k.startswith("blocks."))
    cfg = Qwen2VLVisionConfig(
        embed_dim=d, depth=n_layers,
        num_heads=int(hf.get("num_heads", d // 80)),
        mlp_ratio=float(hf.get("mlp_ratio", 4.0)),
        patch_size=p, temporal_patch_size=tps,
        spatial_merge_size=int(hf.get("spatial_merge_size", 2)),
        hidden_size=int(tensors["merger.mlp.2.weight"].shape[0]),
        act=hf.get("hidden_act", "quick_gelu"))
    params: Params = {
        # conv3d with stride == kernel ≡ matmul over flat (C,tps,p,p)
        "patch_embed": jnp.asarray(
            pe.reshape(d, -1).T, dtype),
        "blocks": [],
    }
    params["ln_q_w"], params["ln_q_b"] = _ln_t(tensors, "merger.ln_q",
                                               dtype)
    params["merge_fc1"] = _lin_t(tensors, "merger.mlp.0", dtype)
    params["merge_fc2"] = _lin_t(tensors, "merger.mlp.2", dtype)
    for i in range(n_layers):
        pre = f"blocks.{i}"
        l1w, l1b = _ln_t(tensors, f"{pre}.norm1", dtype)
        l2w, l2b = _ln_t(tensors, f"{pre}.norm2", dtype)
        params["blocks"].append({
            "ln1_w": l1w, "ln1_b": l1b, "ln2_w": l2w, "ln2_b": l2b,
            "qkv": _lin_t(tensors, f"{pre}.attn.qkv", dtype),
            "proj": _lin_t(tensors, f"{pre}.attn.proj", dtype),
            "fc1": _lin_t(tensors, f"{pre}.mlp.fc1", dtype),
            "fc2": _lin_t(tensors, f"{pre}.mlp.fc2", dtype),
        })
    return cfg, params
