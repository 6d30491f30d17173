"""Multimodal input encoders: audio (mel → features) and vision (ViT).

Reference parity: the audio/vision towers of the omni AR families
(model_executor/models/qwen2_5_omni, qwen3_omni — whisper-style audio
encoder with conv subsampling; ViT vision tower). Pure functions over
param pytrees like the decoder; encoders run as one-shot jit programs at
request-add time (no KV cache — full bidirectional attention on the MXU).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from vllm_omni_tpu.models.decoder import linear
from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.layernorm import layer_norm

Params = dict


@dataclass(frozen=True)
class AudioEncoderConfig:
    n_mels: int = 128
    hidden_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    output_dim: int = 1024  # thinker hidden size
    max_frames: int = 3000  # mel frames (whisper: 30 s)
    # stem subsample strides; whisper uses (1, 2) (2x), qwen-omni towers
    # re-pool to 4x — default (2, 2) keeps the 4x stem
    conv_strides: tuple = (2, 2)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def subsample(self) -> int:
        s = 1
        for x in self.conv_strides:
            s *= x
        return s


@dataclass(frozen=True)
class VisionEncoderConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 512
    num_layers: int = 4
    num_heads: int = 8
    output_dim: int = 1024
    # spatial merge: 2x2 patch groups fuse into one output token
    # (qwen-vl style); 1 = no merge (CLIP-style ViT)
    merge_size: int = 2
    use_cls_token: bool = False  # CLIP class embedding
    use_pre_ln: bool = False  # CLIP pre_layrnorm
    act: str = "gelu"  # gelu | quick_gelu (CLIP)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _act(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    if kind == "quick_gelu":
        return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)
    if kind in ("gelu_pytorch_tanh", "gelu_new", "gelu_tanh"):
        # SigLIP towers use the tanh approximation — golden parity vs
        # transformers requires matching it exactly
        return jax.nn.gelu(xf, approximate=True).astype(x.dtype)
    # exact erf GELU — HF whisper/CLIP "gelu" is exact, and the tanh
    # approximation differs by up to ~6e-2 (breaks golden parity)
    return jax.nn.gelu(xf, approximate=False).astype(x.dtype)


def _encoder_block(layer: Params, x: jnp.ndarray, num_heads: int,
                   act: str = "gelu") -> jnp.ndarray:
    b, t, h = x.shape
    d = h // num_heads
    y = layer_norm(x, layer["ln1_w"], layer["ln1_b"])
    q = linear(y, layer["q_proj"]).reshape(b, t, num_heads, d)
    k = linear(y, layer["k_proj"]).reshape(b, t, num_heads, d)
    v = linear(y, layer["v_proj"]).reshape(b, t, num_heads, d)
    from vllm_omni_tpu.ops.flash_attention import flash_attention

    attn = flash_attention(q, k, v, scale=d ** -0.5, causal=False)
    x = x + linear(attn.reshape(b, t, h), layer["o_proj"])
    y = layer_norm(x, layer["ln2_w"], layer["ln2_b"])
    y = _act(linear(y, layer["fc1"]), act)
    return x + linear(y, layer["fc2"])


# ---------------------------------------------------------------------------
# Audio
# ---------------------------------------------------------------------------


def audio_encoder_forward(params: Params, cfg: AudioEncoderConfig,
                          mel: jnp.ndarray) -> jnp.ndarray:
    """mel [B, T, n_mels] → features [B, T//4, output_dim].

    Whisper-style stem: two stride-2 1D convs (4x subsample) + GELU, then
    bidirectional transformer blocks, then projection into the thinker's
    embedding space.
    """
    x = mel
    for name, stride in zip(("conv1", "conv2"), cfg.conv_strides):
        p = params[name]  # w [k, cin, cout]
        # explicit symmetric padding (k-1)/2 on both sides — torch
        # conv1d(padding=1) semantics; "SAME" at stride 2 would pad
        # (0, 1) and shift every window by one sample
        k = p["w"].shape[0]
        x = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), window_strides=(stride,),
            padding=[((k - 1) // 2, k // 2)],
            dimension_numbers=("NTC", "TIO", "NTC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
        x = _act(x + p["b"], "gelu")
    t = x.shape[1]
    pos = params["pos_embed"][:t]
    x = x + pos.astype(x.dtype)
    for layer in params["layers"]:
        x = _encoder_block(layer, x, cfg.num_heads)
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"])
    if "proj" in params:  # into the thinker's embedding space
        x = linear(x, params["proj"])
    return x


def init_audio_encoder(cfg: AudioEncoderConfig, key,
                       dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 8))
    h = cfg.hidden_size

    def lin(k_in, n_out):
        return {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                        jnp.float32) *
                      k_in ** -0.5).astype(dtype),
                "b": jnp.zeros((n_out,), dtype)}

    def conv1d(k, cin, cout):
        return {"w": (jax.random.normal(next(keys), (k, cin, cout),
                                        jnp.float32) *
                      (k * cin) ** -0.5).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    params: Params = {
        "conv1": conv1d(3, cfg.n_mels, h),
        "conv2": conv1d(3, h, h),
        "pos_embed": (jax.random.normal(
            next(keys), (cfg.max_frames // 4 + 1, h), jnp.float32) *
            0.02).astype(dtype),
        "layers": [],
        "ln_post_w": jnp.ones((h,), dtype),
        "ln_post_b": jnp.zeros((h,), dtype),
        "proj": lin(h, cfg.output_dim),
    }
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "ln1_w": jnp.ones((h,), dtype), "ln1_b": jnp.zeros((h,), dtype),
            "ln2_w": jnp.ones((h,), dtype), "ln2_b": jnp.zeros((h,), dtype),
            "q_proj": lin(h, h), "k_proj": lin(h, h),
            "v_proj": lin(h, h), "o_proj": lin(h, h),
            "fc1": lin(h, 4 * h), "fc2": lin(4 * h, h),
        })
    return params


# ---------------------------------------------------------------------------
# Vision
# ---------------------------------------------------------------------------


def vision_encoder_forward(params: Params, cfg: VisionEncoderConfig,
                           pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels [B, H, W, 3] → features [B, N/(merge²)(+cls), output_dim].

    Covers both tower shapes the reference AR families use: qwen-vl
    style (no cls, 2x2 spatial merge) and CLIP-style ViT (cls token,
    pre-LN, quick-gelu, no merge)."""
    p = cfg.patch_size
    x = jax.lax.conv_general_dilated(
        pixels, params["patch_embed"]["w"].astype(pixels.dtype),
        window_strides=(p, p), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(pixels.dtype)
    if "b" in params["patch_embed"]:  # SigLIP patch conv carries bias
        x = x + params["patch_embed"]["b"].astype(x.dtype)
    b, gh, gw, h = x.shape
    x = x.reshape(b, gh * gw, h)
    if cfg.use_cls_token:
        cls = jnp.broadcast_to(params["cls"].astype(x.dtype), (b, 1, h))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][:x.shape[1]].astype(pixels.dtype)
    if cfg.use_pre_ln:
        x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"])
    for layer in params["layers"]:
        x = _encoder_block(layer, x, cfg.num_heads, cfg.act)
    x = layer_norm(x, params["ln_post_w"], params["ln_post_b"])
    m = cfg.merge_size
    if m > 1:
        # 2x2 spatial merge → m²·h wide tokens → project to output_dim
        x = x.reshape(b, gh // m, m, gw // m, m, h)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, (gh // m) * (gw // m), m * m * h)
    if "merge_proj" in params:
        x = linear(x, params["merge_proj"])
        if "merge_proj2" in params:  # qwen-vl merger.mlp: lin-gelu-lin
            x = linear(_act(x, "gelu"), params["merge_proj2"])
    return x


def init_vision_encoder(cfg: VisionEncoderConfig, key,
                        dtype=jnp.bfloat16) -> Params:
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 6))
    h = cfg.hidden_size

    def lin(k_in, n_out):
        return {"w": (jax.random.normal(next(keys), (k_in, n_out),
                                        jnp.float32) *
                      k_in ** -0.5).astype(dtype),
                "b": jnp.zeros((n_out,), dtype)}

    p = cfg.patch_size
    npos = cfg.num_patches + (1 if cfg.use_cls_token else 0)
    params: Params = {
        "patch_embed": {"w": (jax.random.normal(
            next(keys), (p, p, 3, h), jnp.float32) *
            (p * p * 3) ** -0.5).astype(dtype)},
        "pos_embed": (jax.random.normal(
            next(keys), (npos, h), jnp.float32) * 0.02).astype(dtype),
        "layers": [],
        "ln_post_w": jnp.ones((h,), dtype),
        "ln_post_b": jnp.zeros((h,), dtype),
        "merge_proj": lin(cfg.merge_size ** 2 * h, cfg.output_dim),
    }
    if cfg.use_cls_token:
        params["cls"] = (jax.random.normal(next(keys), (h,), jnp.float32)
                         * 0.02).astype(dtype)
    if cfg.use_pre_ln:
        params["ln_pre_w"] = jnp.ones((h,), dtype)
        params["ln_pre_b"] = jnp.zeros((h,), dtype)
    for _ in range(cfg.num_layers):
        params["layers"].append({
            "ln1_w": jnp.ones((h,), dtype), "ln1_b": jnp.zeros((h,), dtype),
            "ln2_w": jnp.ones((h,), dtype), "ln2_b": jnp.zeros((h,), dtype),
            "q_proj": lin(h, h), "k_proj": lin(h, h),
            "v_proj": lin(h, h), "o_proj": lin(h, h),
            "fc1": lin(h, 4 * h), "fc2": lin(4 * h, h),
        })
    return params


# ---------------------------------------------------------------------------
# Real-checkpoint loading (HF naming/layout conventions)
# ---------------------------------------------------------------------------


def _read_safetensors(path: str) -> dict:
    """path = dir or .safetensors file → {name: np.ndarray} (bf16 kept)."""
    import os

    import numpy as np
    from safetensors import safe_open

    files = [path] if path.endswith(".safetensors") else sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors under {path}")
    out = {}
    for f in files:
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:  # bf16 stored as raw uint16
                    arr = np.asarray(jnp.asarray(arr).view(jnp.bfloat16)
                                     .astype(jnp.float32))
                out[name] = arr
    return out


def _strip_prefix(tensors: dict, prefixes: tuple) -> dict:
    """Keep tensors under the first matching tower prefix, stripped."""
    for pre in prefixes:
        sub = {k[len(pre):]: v for k, v in tensors.items()
               if k.startswith(pre)}
        if sub:
            return sub
    return tensors


def _lin_t(tensors: dict, name: str, dtype) -> Params:
    """torch Linear [out, in] (+bias) → ours {w [in, out], b}."""
    import numpy as np

    w = np.asarray(tensors[f"{name}.weight"], np.float32).T
    out = {"w": jnp.asarray(w, dtype)}
    b = tensors.get(f"{name}.bias")
    out["b"] = jnp.asarray(np.asarray(
        b if b is not None else np.zeros(w.shape[1]), np.float32), dtype)
    return out


def _ln_t(tensors: dict, name: str, dtype):
    import numpy as np

    return (jnp.asarray(np.asarray(tensors[f"{name}.weight"],
                                   np.float32), dtype),
            jnp.asarray(np.asarray(tensors[f"{name}.bias"],
                                   np.float32), dtype))


def load_whisper_audio_encoder(path: str, output_dim: int = 0,
                               dtype=jnp.float32
                               ) -> tuple:
    """Load a whisper-family audio tower from an HF checkpoint
    (openai/whisper-*, Qwen2-Audio / Qwen-Omni `audio_tower.*`).

    Reference parity: the qwen2_5_omni/qwen3_omni audio towers
    (model_executor/models/qwen2_5_omni/) are whisper-derived; the
    reference loads them through vLLM's HF loader. Name map:
      conv{1,2}.{weight,bias}                 torch conv1d [cout,cin,k]
      embed_positions.weight                  sinusoidal table
      layers.N.self_attn.{q,k,v,out}_proj     (k_proj ships no bias)
      layers.N.self_attn_layer_norm / final_layer_norm
      layers.N.fc{1,2}, layer_norm (post)
    A `proj`/`multi_modal_projector.linear` into the thinker's embedding
    space is mapped when present (absent on bare whisper)."""
    import json
    import os

    import numpy as np

    tensors = _read_safetensors(path)
    cfg_file = os.path.join(
        path if os.path.isdir(path) else os.path.dirname(path),
        "config.json")
    hf = {}
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            hf = json.load(f)
        hf = hf.get("audio_config", hf)
    tensors = _strip_prefix(tensors, (
        "thinker.audio_tower.", "audio_tower.", "model.encoder.",
        "encoder."))
    n_layers = 1 + max(int(k.split(".")[1]) for k in tensors
                       if k.startswith("layers."))
    h = tensors["conv1.weight"].shape[0]
    cfg = AudioEncoderConfig(
        n_mels=int(tensors["conv1.weight"].shape[1]),
        hidden_size=h, num_layers=n_layers,
        num_heads=int(hf.get("encoder_attention_heads",
                             hf.get("num_attention_heads", h // 64))),
        output_dim=output_dim or h,
        max_frames=int(hf.get("max_source_positions", 1500)) * 2,
        conv_strides=(1, 2))

    def conv(name):
        w = np.asarray(tensors[f"{name}.weight"], np.float32)
        return {"w": jnp.asarray(w.transpose(2, 1, 0), dtype),
                "b": jnp.asarray(np.asarray(tensors[f"{name}.bias"],
                                            np.float32), dtype)}

    params: Params = {
        "conv1": conv("conv1"), "conv2": conv("conv2"),
        "pos_embed": jnp.asarray(np.asarray(
            tensors["embed_positions.weight"], np.float32), dtype),
        "layers": [],
    }
    params["ln_post_w"], params["ln_post_b"] = _ln_t(
        tensors, "layer_norm", dtype)
    for i in range(n_layers):
        pre = f"layers.{i}"
        l1w, l1b = _ln_t(tensors, f"{pre}.self_attn_layer_norm", dtype)
        l2w, l2b = _ln_t(tensors, f"{pre}.final_layer_norm", dtype)
        params["layers"].append({
            "ln1_w": l1w, "ln1_b": l1b, "ln2_w": l2w, "ln2_b": l2b,
            "q_proj": _lin_t(tensors, f"{pre}.self_attn.q_proj", dtype),
            "k_proj": _lin_t(tensors, f"{pre}.self_attn.k_proj", dtype),
            "v_proj": _lin_t(tensors, f"{pre}.self_attn.v_proj", dtype),
            "o_proj": _lin_t(tensors, f"{pre}.self_attn.out_proj",
                             dtype),
            "fc1": _lin_t(tensors, f"{pre}.fc1", dtype),
            "fc2": _lin_t(tensors, f"{pre}.fc2", dtype),
        })
    for proj_name in ("proj", "multi_modal_projector.linear"):
        if f"{proj_name}.weight" in tensors:
            params["proj"] = _lin_t(tensors, proj_name, dtype)
            break
    return cfg, params


def load_clip_vision_encoder(path: str, output_dim: int = 0,
                             dtype=jnp.float32) -> tuple:
    """Load a CLIP-style ViT vision tower from an HF checkpoint
    (openai/clip-vit-*, llava `vision_tower.*`). Name map:
      vision_model.embeddings.{class_embedding, patch_embedding.weight
      [h,3,p,p], position_embedding.weight}
      vision_model.pre_layrnorm (sic) / post_layernorm
      vision_model.encoder.layers.N.{self_attn.{q,k,v,out}_proj,
      layer_norm{1,2}, mlp.fc{1,2}}"""
    import json
    import os

    import numpy as np

    tensors = _read_safetensors(path)
    cfg_file = os.path.join(
        path if os.path.isdir(path) else os.path.dirname(path),
        "config.json")
    hf = {}
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            hf = json.load(f)
        hf = hf.get("vision_config", hf)
    tensors = _strip_prefix(tensors, (
        "vision_tower.vision_model.", "vision_model.", "visual."))
    pe = np.asarray(tensors["embeddings.patch_embedding.weight"],
                    np.float32)  # [h, 3, p, p]
    h, _, p, _ = pe.shape
    n_layers = 1 + max(int(k.split(".")[2]) for k in tensors
                       if k.startswith("encoder.layers."))
    cfg = VisionEncoderConfig(
        image_size=int(hf.get("image_size", 224)), patch_size=p,
        hidden_size=h, num_layers=n_layers,
        num_heads=int(hf.get("num_attention_heads", h // 64)),
        output_dim=output_dim or h, merge_size=1,
        use_cls_token="embeddings.class_embedding" in tensors,
        use_pre_ln="pre_layrnorm.weight" in tensors,
        act=hf.get("hidden_act", "quick_gelu"))
    params: Params = {
        "patch_embed": {"w": jnp.asarray(pe.transpose(2, 3, 1, 0),
                                         dtype)},  # [p, p, 3, h]
        "pos_embed": jnp.asarray(np.asarray(
            tensors["embeddings.position_embedding.weight"], np.float32),
            dtype),
        "layers": [],
    }
    if "embeddings.patch_embedding.bias" in tensors:  # SigLIP towers
        params["patch_embed"]["b"] = jnp.asarray(np.asarray(
            tensors["embeddings.patch_embedding.bias"], np.float32),
            dtype)
    if cfg.use_cls_token:
        params["cls"] = jnp.asarray(np.asarray(
            tensors["embeddings.class_embedding"], np.float32), dtype)
    if cfg.use_pre_ln:
        params["ln_pre_w"], params["ln_pre_b"] = _ln_t(
            tensors, "pre_layrnorm", dtype)
    params["ln_post_w"], params["ln_post_b"] = _ln_t(
        tensors, "post_layernorm", dtype)
    for i in range(n_layers):
        pre = f"encoder.layers.{i}"
        l1w, l1b = _ln_t(tensors, f"{pre}.layer_norm1", dtype)
        l2w, l2b = _ln_t(tensors, f"{pre}.layer_norm2", dtype)
        params["layers"].append({
            "ln1_w": l1w, "ln1_b": l1b, "ln2_w": l2w, "ln2_b": l2b,
            "q_proj": _lin_t(tensors, f"{pre}.self_attn.q_proj", dtype),
            "k_proj": _lin_t(tensors, f"{pre}.self_attn.k_proj", dtype),
            "v_proj": _lin_t(tensors, f"{pre}.self_attn.v_proj", dtype),
            "o_proj": _lin_t(tensors, f"{pre}.self_attn.out_proj",
                             dtype),
            "fc1": _lin_t(tensors, f"{pre}.mlp.fc1", dtype),
            "fc2": _lin_t(tensors, f"{pre}.mlp.fc2", dtype),
        })
    return cfg, params
