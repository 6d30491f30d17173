"""Diffusers-format pipeline checkpoint loader.

Reference parity: diffusion/model_loader/diffusers_loader.py
(DiffusersPipelineLoader — model_index.json component discovery,
per-subfolder config.json + safetensors shards with
diffusion_pytorch_model.safetensors.index.json, natural shard sort
:43). TPU-side: tensors land straight in jnp arrays (no torch), names
map through each family's `assign_*_tensor` into the param pytree.

Local directories only — the environment has no hub egress; pass a
downloaded/mounted pipeline dir (the reference falls back the same way
for local paths)."""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Iterator, Optional

import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

MODEL_INDEX = "model_index.json"
WEIGHTS_INDEX = "diffusion_pytorch_model.safetensors.index.json"


def _natural_key(path: str) -> list:
    """model-00002-of-00005.safetensors sorts numerically (reference
    _natural_sort_key)."""
    return [int(s) if s.isdigit() else s
            for s in re.split(r"(\d+)", os.path.basename(path))]


def is_diffusers_pipeline(path: str) -> bool:
    return os.path.isdir(path) and \
        os.path.isfile(os.path.join(path, MODEL_INDEX))


def read_model_index(path: str) -> dict[str, Any]:
    """model_index.json → {component: (library, class_name)} plus
    scalar pipeline fields (`_class_name` etc.)."""
    with open(os.path.join(path, MODEL_INDEX)) as f:
        return json.load(f)


def component_config(path: str, subfolder: str) -> dict[str, Any]:
    """<pipeline>/<subfolder>/config.json (diffusers components) or
    scheduler_config.json (schedulers)."""
    for name in ("config.json", "scheduler_config.json"):
        p = os.path.join(path, subfolder, name)
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
    raise FileNotFoundError(f"no config under {path}/{subfolder}")


def _shard_files(comp_dir: str) -> list[str]:
    """Resolve the component's safetensors shards: honor the weights
    index when present (filters stray consolidated files, reference
    filter_duplicate_safetensors_files), else glob + natural sort."""
    idx = os.path.join(comp_dir, WEIGHTS_INDEX)
    if os.path.isfile(idx):
        with open(idx) as f:
            weight_map = json.load(f)["weight_map"]
        files = sorted({os.path.join(comp_dir, v)
                        for v in weight_map.values()}, key=_natural_key)
        return files
    files = sorted((os.path.join(comp_dir, f)
                    for f in os.listdir(comp_dir)
                    if f.endswith(".safetensors")), key=_natural_key)
    if not files:
        gguf = sorted((os.path.join(comp_dir, f)
                       for f in os.listdir(comp_dir)
                       if f.endswith(".gguf")), key=_natural_key)
        if gguf:
            return gguf
        raise FileNotFoundError(
            f"no .safetensors or .gguf under {comp_dir}")
    return files


def component_tensor_names(path: str, subfolder: str) -> list[str]:
    """Tensor names across all shards WITHOUT loading data (safetensors
    headers only; gguf shards fall back to a full iteration)."""
    from safetensors import safe_open

    names: list[str] = []
    for f in _shard_files(os.path.join(path, subfolder)):
        if f.endswith(".gguf"):
            from vllm_omni_tpu.diffusion.gguf import iter_gguf_tensors

            names.extend(n for n, _ in iter_gguf_tensors(f))
            continue
        with safe_open(f, framework="numpy") as st:
            names.extend(st.keys())
    return names


def iter_component_tensors(path: str, subfolder: str
                           ) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (name, np array) over all shards of one component. bf16
    tensors arrive as jnp-viewable uint16 and are converted here.
    GGUF shards (community conversions keep the diffusers tensor
    names) dequantize through diffusion/gguf.py — reference
    gguf_adapters role."""
    from safetensors import safe_open

    for f in _shard_files(os.path.join(path, subfolder)):
        if f.endswith(".gguf"):
            from vllm_omni_tpu.diffusion.gguf import iter_gguf_tensors

            yield from iter_gguf_tensors(f)
            continue
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(
                        jnp.asarray(arr).view(jnp.bfloat16))
                yield name, arr


# ---------------------------------------------------------------------------
# Component loaders
# ---------------------------------------------------------------------------


def _family_entry(family: str):
    """(cfg_cls, init_fn, assign_fn) per real-geometry family module."""
    if family == "qwen_image":
        from vllm_omni_tpu.diffusion.qwen_image import (
            QwenImageConfig, assign_qwen_image_tensor,
            init_qwen_image_params)

        return QwenImageConfig, init_qwen_image_params, \
            assign_qwen_image_tensor
    if family == "flux":
        from vllm_omni_tpu.diffusion.flux import (FluxConfig,
                                                  assign_flux_tensor,
                                                  init_flux_params)

        return FluxConfig, init_flux_params, assign_flux_tensor
    if family == "wan":
        from vllm_omni_tpu.diffusion.wan import (WanConfig,
                                                 assign_wan_tensor,
                                                 init_wan_params)

        return WanConfig, init_wan_params, assign_wan_tensor
    if family == "sd3":
        from vllm_omni_tpu.diffusion.sd3 import (SD3Config,
                                                 assign_sd3_tensor,
                                                 init_sd3_params)

        return SD3Config, init_sd3_params, assign_sd3_tensor
    if family == "ltx2":
        from vllm_omni_tpu.diffusion.ltx2 import (LTX2Config,
                                                  assign_ltx2_tensor,
                                                  init_ltx2_params)

        return LTX2Config, init_ltx2_params, assign_ltx2_tensor
    if family == "hunyuan_video":
        from vllm_omni_tpu.diffusion.hunyuan_video import (
            HunyuanVideoConfig, assign_hunyuan_video_tensor,
            init_hunyuan_video_params)

        return HunyuanVideoConfig, init_hunyuan_video_params, \
            assign_hunyuan_video_tensor
    if family == "flux2":
        from vllm_omni_tpu.diffusion.flux2 import (Flux2Config,
                                                   assign_flux2_tensor,
                                                   init_flux2_params)

        return Flux2Config, init_flux2_params, assign_flux2_tensor
    if family == "z_image":
        from vllm_omni_tpu.diffusion.z_image import (ZImageConfig,
                                                     assign_z_image_tensor,
                                                     init_z_image_params)

        return ZImageConfig, init_z_image_params, assign_z_image_tensor
    if family == "ovis_image":
        from vllm_omni_tpu.diffusion.ovis_image import (
            OvisImageConfig, assign_ovis_image_tensor,
            init_ovis_image_params)

        return OvisImageConfig, init_ovis_image_params, \
            assign_ovis_image_tensor
    if family == "longcat_image":
        from vllm_omni_tpu.diffusion.longcat_image import (
            LongCatImageConfig, assign_longcat_image_tensor,
            init_longcat_image_params)

        return LongCatImageConfig, init_longcat_image_params, \
            assign_longcat_image_tensor
    if family == "omnigen2":
        from vllm_omni_tpu.diffusion.omnigen2 import (
            OmniGen2Config, assign_omnigen2_tensor, init_omnigen2_params)

        return OmniGen2Config, init_omnigen2_params, \
            assign_omnigen2_tensor
    if family == "mammoth_moda2":
        from vllm_omni_tpu.diffusion.omnigen2 import (
            MammothModa2Config, assign_omnigen2_tensor,
            init_omnigen2_params)

        return MammothModa2Config, init_omnigen2_params, \
            assign_omnigen2_tensor
    if family == "helios":
        from vllm_omni_tpu.diffusion.helios import (HeliosConfig,
                                                    assign_helios_tensor,
                                                    init_helios_params)

        return HeliosConfig, init_helios_params, assign_helios_tensor
    if family == "cosyvoice3_audio":
        from vllm_omni_tpu.diffusion.cosyvoice3_audio import (
            Cosy3AudioConfig, assign_cosy3_audio_tensor,
            init_cosy3_audio_params)

        return Cosy3AudioConfig, init_cosy3_audio_params, \
            assign_cosy3_audio_tensor
    if family == "omnivoice":
        from vllm_omni_tpu.diffusion.omnivoice import (
            OmniVoiceConfig, assign_omnivoice_tensor,
            init_omnivoice_params)

        return OmniVoiceConfig, init_omnivoice_params, \
            assign_omnivoice_tensor
    if family == "nextstep":
        from vllm_omni_tpu.diffusion.nextstep import (
            NextStepConfig, assign_nextstep_tensor, init_nextstep_params)

        return NextStepConfig, init_nextstep_params, \
            assign_nextstep_tensor
    if family == "glm_image":
        from vllm_omni_tpu.diffusion.glm_image import (
            GlmImageConfig, assign_glm_image_tensor,
            init_glm_image_params)

        return GlmImageConfig, init_glm_image_params, \
            assign_glm_image_tensor
    if family == "stable_audio":
        from vllm_omni_tpu.diffusion.stable_audio import (
            StableAudioConfig, assign_stable_audio_tensor,
            init_stable_audio_params)

        return StableAudioConfig, init_stable_audio_params, \
            assign_stable_audio_tensor
    raise KeyError(family)


# diffusers `_class_name` → real-geometry family module. Classes not
# listed here fall back to the generic parameterized MMDiT tier
# (models/registry.py DIFFUSERS_ARCH_MAP) and cannot load real weights.
REAL_TRANSFORMER_CLASSES = {
    "QwenImageTransformer2DModel": "qwen_image",
    "FluxTransformer2DModel": "flux",
    "WanTransformer3DModel": "wan",
    # VACE variant: same backbone + vace_patch_embedding/vace_blocks
    # context towers (wan2_2_vace_transformer.py:66); WanConfig picks
    # up vace_layers/vace_in_channels from config.json
    "WanVACETransformer3DModel": "wan",
    "SD3Transformer2DModel": "sd3",
    "LTX2VideoTransformer3DModel": "ltx2",
    "HunyuanVideo15Transformer3DModel": "hunyuan_video",
    "StableAudioDiTModel": "stable_audio",
    # one class serves both Flux2Pipeline and Flux2KleinPipeline
    "Flux2Transformer2DModel": "flux2",
    "ZImageTransformer2DModel": "z_image",
    "OvisImageTransformer2DModel": "ovis_image",
    "LongCatImageTransformer2DModel": "longcat_image",
    "OmniGen2Transformer2DModel": "omnigen2",
    "HeliosTransformer3DModel": "helios",
    "CosyVoice3AudioDiT": "cosyvoice3_audio",
    "OmniVoiceGenerator": "omnivoice",
    "MammothModa2Transformer2DModel": "mammoth_moda2",
    # AR image generation (llama backbone + flow-matching head)
    "NextStepModel": "nextstep",
    "NextStepTransformer2DModel": "nextstep",
    "GlmImageTransformer2DModel": "glm_image",
    # HF-layout (not a diffusers model_index dir): dispatched by
    # hunyuan_image3.is_hunyuan_image3_dir, listed here so the
    # real-family inventory is complete
    "HunyuanImage3ForCausalLM": "hunyuan_image3",
}


def load_transformer(path: str, dtype=jnp.bfloat16,
                     subfolder: str = "transformer"):
    """→ (family: str, family_cfg, params pytree). Family dispatch by
    the component's diffusers `_class_name`."""
    cfg_json = component_config(path, subfolder)
    cls = cfg_json.get("_class_name", "")
    family = REAL_TRANSFORMER_CLASSES.get(cls)
    if family is None:
        raise ValueError(
            f"unsupported transformer class {cls!r} (real-geometry "
            f"families: {sorted(REAL_TRANSFORMER_CLASSES)})")
    import jax

    cfg_cls, init_fn, assign_fn = _family_entry(family)
    cfg = cfg_cls.from_json(cfg_json)
    params = init_fn(cfg, jax.random.PRNGKey(0), dtype)
    unmapped, loaded = [], 0
    for name, arr in iter_component_tensors(path, subfolder):
        if assign_fn(params, name, arr, dtype):
            loaded += 1
        else:
            unmapped.append(name)
    if unmapped:
        logger.warning("%s: %d unmapped tensors, e.g. %s", family,
                       len(unmapped), unmapped[:8])
    if loaded == 0:
        raise ValueError(f"no tensors mapped from {path}/{subfolder}")
    logger.info("%s transformer: %d tensors loaded", family, loaded)
    return family, cfg, params


def load_scheduler_config(path: str) -> dict[str, Any]:
    """FlowMatch scheduler knobs the denoise loop needs."""
    cfg = component_config(path, "scheduler")
    return {
        "num_train_timesteps": cfg.get("num_train_timesteps", 1000),
        "flow_shift": cfg.get("shift", 3.0),
        "use_dynamic_shifting": cfg.get("use_dynamic_shifting", False),
    }


# vae `_class_name` → real-geometry decoder/encoder implementation.
# "kl": diffusers AutoencoderKL (vae_kl.py) — flux/flux2/sd3/z_image/
# longcat/ovis/omnigen2/glm_image/nextstep; "wan": the Wan-style 3D
# causal VAE (vae_wan.py) — AutoencoderKLQwenImage + AutoencoderKLWan.
# Classes not listed load config-only and decode through the generic
# random-init VAE (dummy/bench tier only).
REAL_VAE_CLASSES = {
    "AutoencoderKL": "kl",
    "AutoencoderKLQwenImage": "wan",
    "AutoencoderKLWan": "wan",
    # stable_audio 1D waveform VAE (vae_oobleck.py) — latents decode
    # straight to waveform, no scaling factor
    # (pipeline_stable_audio.py:571)
    "AutoencoderOobleck": "oobleck",
    # LTX causal 3D video VAEs (vae_ltx2.py) — per-channel
    # latents_mean/std denormalize + optional timestep-conditioned
    # decode (pipeline_ltx2.py:195, :1119-1140)
    "AutoencoderKLLTX2Video": "ltx2",
    "AutoencoderKLLTXVideo": "ltx2",
    # HunyuanVideo 1.5 causal 3D VAE (vae_hyv15.py): 32ch latents,
    # 16x spatial / 4x temporal; decode divides by scaling_factor
    # (pipeline_hunyuan_video_1_5.py:113, :520-521)
    "AutoencoderKLHunyuanVideo15": "hyv15",
}


def load_vae(path: str, dtype=jnp.bfloat16) -> dict[str, Any]:
    """Load the pipeline's vae/ component: scale/latent metadata always;
    REAL weights when the class has a real-geometry implementation and
    the subfolder ships safetensors (reference loads the actual VAE for
    every family — diffusers_loader.py; pipeline_qwen_image.py:797
    _decode_latents)."""
    meta = load_vae_config(path)
    cfg_json = component_config(path, "vae")
    kind = REAL_VAE_CLASSES.get(cfg_json.get("_class_name", ""))
    if kind is None:
        return meta
    try:
        _shard_files(os.path.join(path, "vae"))
    except FileNotFoundError:
        logger.warning("vae/: config-only (no weights) — decode falls "
                       "back to the random generic VAE")
        return meta
    if kind == "kl":
        from vllm_omni_tpu.diffusion.vae_kl import (VAEKLConfig,
                                                    assign_kl_tensor,
                                                    init_kl_params)

        cfg = VAEKLConfig.from_json(cfg_json)
        params = init_kl_params(cfg, dtype)
        assign = assign_kl_tensor
        meta["latent_channels"] = cfg.latent_channels
        meta["scale_factor"] = cfg.spatial_scale
    elif kind == "oobleck":
        from vllm_omni_tpu.diffusion.vae_oobleck import (
            OobleckConfig, assign_oobleck_tensor, init_oobleck_params)

        cfg = OobleckConfig.from_json(cfg_json)
        params = init_oobleck_params(cfg)
        assign = assign_oobleck_tensor
        meta["latent_channels"] = cfg.decoder_input_channels
        meta["scale_factor"] = cfg.hop
    elif kind == "ltx2":
        from vllm_omni_tpu.diffusion.vae_ltx2 import (
            VAELTX2Config, assign_ltx2_vae_tensor, init_ltx2_vae_params)

        cfg = VAELTX2Config.from_json(cfg_json)
        params = init_ltx2_vae_params(cfg, dtype)
        assign = assign_ltx2_vae_tensor
        meta["latent_channels"] = cfg.latent_channels
        meta["scale_factor"] = cfg.spatial_ratio
    elif kind == "hyv15":
        from vllm_omni_tpu.diffusion.vae_hyv15 import (
            VAEHYV15Config, assign_hyv15_vae_tensor,
            init_hyv15_vae_params)

        cfg = VAEHYV15Config.from_json(cfg_json)
        # load the encoder too when the checkpoint ships one (i2v
        # first-frame conditioning encodes through it)
        with_enc = any(n.startswith("encoder.") for n in
                       component_tensor_names(path, "vae"))
        params = init_hyv15_vae_params(cfg, dtype,
                                       with_encoder=with_enc)
        assign = assign_hyv15_vae_tensor
        meta["latent_channels"] = cfg.latent_channels
        meta["scale_factor"] = cfg.spatial_compression_ratio
    else:
        from vllm_omni_tpu.diffusion.vae_wan import (
            VAEWanConfig, assign_wan_vae_tensor, init_wan_vae_params)

        cfg = VAEWanConfig.from_json(cfg_json)
        params = init_wan_vae_params(cfg, dtype)
        assign = assign_wan_vae_tensor
        meta["latent_channels"] = cfg.z_dim
        meta["scale_factor"] = cfg.spatial_scale
    loaded, unmapped = 0, []
    for name, arr in iter_component_tensors(path, "vae"):
        if assign(params, name, arr, dtype):
            loaded += 1
        else:
            unmapped.append(name)
    if kind == "oobleck":
        from vllm_omni_tpu.diffusion.vae_oobleck import (
            finalize_oobleck_params)

        finalize_oobleck_params(params)
    if kind in ("oobleck", "ltx2"):
        # encoder-side tensors are intentionally skipped at serving
        # time (hyv15 DOES map its encoder for i2v conditioning)
        unmapped = [n for n in unmapped
                    if not n.startswith("encoder.") and
                    not n.startswith("quant_conv.")]
    if unmapped:
        logger.warning("vae: %d unmapped tensors, e.g. %s",
                       len(unmapped), unmapped[:8])
    if loaded == 0:
        raise ValueError(f"no vae tensors mapped from {path}/vae")
    logger.info("vae (%s): %d tensors loaded", kind, loaded)
    meta.update(kind=kind, vae_cfg=cfg, params=params)
    return meta


def load_vae_config(path: str) -> dict[str, Any]:
    cfg = component_config(path, "vae")
    if "decoder_input_channels" in cfg:
        # AutoencoderOobleck (stable_audio): 1D waveform VAE. The
        # "scale factor" is the hop (product of downsampling ratios).
        ratios = cfg.get("downsampling_ratios") or []
        hop = 1
        for r in ratios:
            hop *= int(r)
        return {
            "latent_channels": cfg["decoder_input_channels"],
            "scale_factor": hop if ratios else 2048,
            "latents_mean": None,
            "latents_std": None,
            "sampling_rate": cfg.get("sampling_rate", 44100),
        }
    # qwen-image VAE (autoencoder_kl_qwenimage): z_dim 16, 8x spatial
    down = cfg.get("temperal_downsample") or cfg.get("block_out_channels")
    scale = 2 ** (len(cfg["block_out_channels"]) - 1) \
        if "block_out_channels" in cfg else 8
    del down
    return {
        "latent_channels": cfg.get("z_dim", cfg.get("latent_channels", 16)),
        "scale_factor": scale,
        "latents_mean": cfg.get("latents_mean"),
        "latents_std": cfg.get("latents_std"),
    }


def load_diffusers_pipeline(path: str, dtype=jnp.bfloat16) -> dict:
    """Load every component this framework consumes from a diffusers
    pipeline dir. → {"family", "transformer_cfg", "params",
    "scheduler", "vae"}. The text encoder is served by the AR stage
    (stage configs route a Qwen2.5-VL tower there), so it is listed but
    not loaded here."""
    if not is_diffusers_pipeline(path):
        raise FileNotFoundError(f"{path}: no {MODEL_INDEX}")
    index = read_model_index(path)
    out: dict[str, Any] = {"class_name": index.get("_class_name")}
    family, cfg, params = load_transformer(path, dtype)
    out.update(family=family, transformer_cfg=cfg, params=params)
    if "scheduler" in index:
        out["scheduler"] = load_scheduler_config(path)
    if "vae" in index:
        try:
            out["vae"] = load_vae(path, dtype)
        except FileNotFoundError:
            out["vae"] = None
    if os.path.isdir(os.path.join(path, "latent_upsampler")):
        # LTX2 two-stage second model (LTX2LatentUpsamplerModel,
        # pipeline_ltx2_latent_upsample.py) — upsamples stage-1 latents
        # before the distilled refinement pass
        try:
            out["latent_upsampler"] = load_latent_upsampler(path, dtype)
        except (FileNotFoundError, ValueError) as e:
            logger.warning("latent_upsampler/: not loadable (%s)", e)
    return out


def load_latent_upsampler(path: str, dtype=jnp.bfloat16) -> dict:
    from vllm_omni_tpu.diffusion.vae_ltx2 import (
        LTX2UpsamplerConfig, assign_ltx2_upsampler_tensor,
        init_ltx2_upsampler_params)

    cfg_json = component_config(path, "latent_upsampler")
    cfg = LTX2UpsamplerConfig.from_json(cfg_json)
    params = init_ltx2_upsampler_params(cfg, dtype)
    loaded, unmapped = 0, []
    for name, arr in iter_component_tensors(path, "latent_upsampler"):
        if assign_ltx2_upsampler_tensor(params, name, arr, dtype):
            loaded += 1
        else:
            unmapped.append(name)
    if loaded == 0:
        raise ValueError("no latent_upsampler tensors mapped")
    if unmapped:
        logger.warning("latent_upsampler: %d unmapped, e.g. %s",
                       len(unmapped), unmapped[:6])
    logger.info("latent_upsampler: %d tensors loaded", loaded)
    return {"cfg": cfg, "params": params}
