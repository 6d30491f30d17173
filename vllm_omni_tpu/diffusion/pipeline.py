"""Text/embeds → image diffusion pipeline with the 4-method step contract.

Reference parity: QwenImagePipeline (pipeline_qwen_image.py:247:
encode_prompt :418, prepare_latents :479, prepare_timesteps :512,
denoise_step :828, step_scheduler :881, _decode_latents :797) and the
step-execution contract diffusion/models/interface.py:37.

TPU-first: one jitted program per (resolution bucket, CFG on/off) that
runs a single denoise step; the loop + scheduler state stay host-side so
the step scheduler can preempt/interleave requests mid-denoise. CFG runs
as a batched-2 forward (cond/uncond rows in one program — MXU-friendly);
CFG-parallel over a mesh "cfg" axis shards that batch dimension.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.core.request import DiffusionRequest
from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
from vllm_omni_tpu.diffusion.config import DiffusionConfig
from vllm_omni_tpu.diffusion.dit import dit_forward, init_dit_params
from vllm_omni_tpu.diffusion.scheduler_flow import FlowMatchEulerScheduler
from vllm_omni_tpu.diffusion.vae import (init_vae_params, vae_decode,
                                         vae_encode)
from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)

# families denoising 1D audio-latent streams [B, L, C] (no image VAE);
# omnivoice emits an 8-codebook token grid on the same audio edge
# diffusers-loaded families with a TeaCache/TaylorSeer modulated-input
# extractor (reference cache/teacache/extractors.py per-model registry
# — qwen first, teacache.md:23 1.5-2.0×). Others disable with a warning.
_CACHE_ACCEL_FAMILIES = ("qwen_image", "flux", "wan", "flux2",
                         "z_image", "stable_audio")
# families whose block loop is wired through dit.gpipe_blocks (DiT PP)
# and the layerwise host-offload streamer (VERDICT r4 item 7; reference
# group_coordinator.py:549 / offloader/layerwise_backend.py:21)
_PP_FAMILIES = ("generic", "qwen_image", "wan")
_LAYERWISE_FAMILIES = ("generic", "qwen_image", "wan", "flux")

AUDIO_LATENT_FAMILIES = ("stable_audio", "cosyvoice3_audio",
                         "omnivoice", "voxcpm", "voxcpm2")


@dataclass
class DenoiseState:
    """Host-side per-request state between denoise steps (device sees one
    fixed-shape step)."""

    latents: Any  # [B, h, w, C] device array
    text_states: Any  # [B|2B, Ttxt, D]
    sigmas: np.ndarray
    timesteps: np.ndarray
    step_index: int = 0
    # pooled CLIP conditioning [rows(text_states), P] for families whose
    # time embed consumes it (flux/sd3); None when no CLIP tower loaded
    pooled: Any = None
    # Kontext/Edit reference-image latents [1, h2, w2, C]: appended to
    # the image token stream every step (flux frame-1 / qwen frame−1
    # rope ids), never noised, dropped from the prediction
    ref_latents: Any = None
    audio_latents: Any = None  # [B, Ta, Ca] (LTX2 joint AV denoising)
    # per-request extra conditioning pytree (e.g. glm_image AR prior
    # tokens) threaded into the jitted step as an argument
    cond_extras: Any = None
    # WanVACE per-region conditioning: (context [1, F, h, w, C_vace],
    # scale) — inactive|reactive latents + 8×8-stride mask channels
    vace: Any = None
    # HunyuanVideo15 I2V: SigLIP vision tokens of the reference image
    # [1, S, siglip_hidden] fed to the transformer's image_embedder
    image_embeds: Any = None
    use_cfg: bool = False
    guidance_scale: float = 1.0
    t_start: float = field(default_factory=time.monotonic)
    # tea_cache / taylor_seer device state (stays on device; no per-step
    # host sync)
    cache_mod: Any = None  # previous modulated input
    cache_v: Any = None  # previous (combined) velocity
    cache_accum: Any = None  # accumulated rescaled rel-L1 [scalar]
    cache_skips: Any = None  # device counter of skipped steps
    cache_dv: Any = None  # velocity finite difference (taylor_seer)
    cache_gap: Any = None  # steps since last full compute

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)

    @property
    def done(self) -> bool:
        return self.step_index >= self.num_steps


class DiffusionPipeline:
    """Flow-match text(/embeds)-to-image pipeline over the MMDiT."""

    TEXT_LEN = 64  # static text-token bucket

    def __init__(self, config: DiffusionConfig) -> None:
        self.config = config
        self.dtype = jnp.bfloat16 if config.dtype == "bfloat16" \
            else jnp.dtype(config.dtype)
        key = jax.random.PRNGKey(config.seed)
        k1, k2 = jax.random.split(key)
        # family dispatch: a diffusers pipeline dir loads real weights
        # (loader.py); "dummy" random-inits the generic MMDiT tier
        self.family = "generic"
        self.family_cfg = None
        from vllm_omni_tpu.diffusion.loader import is_diffusers_pipeline

        from vllm_omni_tpu.diffusion.bagel import (
            is_bagel_dir as _bagel_dir)
        from vllm_omni_tpu.diffusion.dreamid import (
            is_dreamid_dir as _dreamid_dir)
        from vllm_omni_tpu.diffusion.magi_human import (
            is_magi_human_dir as _magi_dir)
        from vllm_omni_tpu.diffusion.voxcpm import (
            is_voxcpm_dir as _voxcpm_dir)
        from vllm_omni_tpu.diffusion.hunyuan_image3 import (
            is_hunyuan_image3_dir)

        if is_hunyuan_image3_dir(config.model):
            # HF-layout unified AR+diffusion checkpoint (config.json at
            # the root, VAE config embedded) — not a diffusers
            # model_index pipeline (reference pipeline_hunyuan_image3)
            from vllm_omni_tpu.diffusion.hunyuan_image3 import (
                load_hunyuan_image3)

            cfg_h, params_h = load_hunyuan_image3(config.model,
                                                  self.dtype)
            self.family = "hunyuan_image3"
            self.family_cfg = cfg_h
            self.dit_params = params_h
            config.vae_latent_channels = cfg_h.vae_latent_channels
            config.vae_scale_factor = cfg_h.vae_downsample
            if config.cache.enabled:
                logger.warning("cache accel not wired for "
                               "hunyuan_image3; disabling")
                config.cache.backend = "none"
            if config.offload == "layerwise":
                raise ValueError("layerwise offload not wired for "
                                 "hunyuan_image3")
        elif _voxcpm_dir(config.model):
            # native VoxCPM/VoxCPM2 checkpoint (config.json with
            # model_type voxcpm*; reference model_executor/models/
            # voxcpm{,2}/ — hybrid AR + local-CFM TTS)
            from vllm_omni_tpu.diffusion.voxcpm import load_voxcpm

            cfg_v, params_v = load_voxcpm(config.model, self.dtype)
            self.family = "voxcpm2" if cfg_v.variant == "v2" \
                else "voxcpm"
            self.family_cfg = cfg_v
            self.dit_params = params_v
            if config.cache.enabled:
                logger.warning("cache accel not wired for voxcpm; "
                               "disabling")
                config.cache.backend = "none"
            if config.offload == "layerwise":
                raise ValueError("layerwise offload not wired for "
                                 "voxcpm")
        elif _magi_dir(config.model):
            # MAGI-Human unified AV DiT (reference pipeline_magi_human)
            from vllm_omni_tpu.diffusion.magi_human import (
                load_magi_human)

            cfg_m, params_m = load_magi_human(config.model, self.dtype)
            self.family = "magi_human"
            self.family_cfg = cfg_m
            self.dit_params = params_m
            config.vae_latent_channels = cfg_m.video_latent_channels
            config.vae_scale_factor = cfg_m.vae_downsample
            if config.cache.enabled:
                logger.warning("cache accel not wired for magi_human; "
                               "disabling")
                config.cache.backend = "none"
            if config.offload == "layerwise":
                raise ValueError("layerwise offload not wired for "
                                 "magi_human")
        elif _dreamid_dir(config.model):
            # DreamID-Omni fused AV checkpoint (video_config +
            # audio_config; reference pipeline_dreamid_omni.py)
            from vllm_omni_tpu.diffusion.dreamid import load_dreamid

            cfg_d, params_d = load_dreamid(config.model, self.dtype)
            self.family = "dreamid_omni"
            self.family_cfg = cfg_d
            self.dit_params = params_d
            config.vae_latent_channels = cfg_d.video.in_dim
            config.vae_scale_factor = cfg_d.vae_downsample
            if config.cache.enabled:
                logger.warning("cache accel not wired for dreamid; "
                               "disabling")
                config.cache.backend = "none"
            if config.offload == "layerwise":
                raise ValueError("layerwise offload not wired for "
                                 "dreamid")
        elif _bagel_dir(config.model):
            # BAGEL unified MoT checkpoint (config.json with llm_config
            # + vae_config; reference pipeline_bagel.py)
            from vllm_omni_tpu.diffusion.bagel import load_bagel

            cfg_b, params_b = load_bagel(config.model, self.dtype)
            self.family = "bagel"
            self.family_cfg = cfg_b
            self.dit_params = params_b
            config.vae_latent_channels = cfg_b.latent_channels
            config.vae_scale_factor = cfg_b.vae_downsample
            if config.cache.enabled:
                logger.warning("cache accel not wired for bagel; "
                               "disabling")
                config.cache.backend = "none"
            if config.offload == "layerwise":
                raise ValueError("layerwise offload not wired for "
                                 "bagel")
        elif config.model.startswith("dummy:"):
            # random-weight REAL-geometry family tier: exercises the
            # family's true forward (packing, rope, per-family blocks)
            # without a checkpoint on disk — the bench/dryrun analogue
            # of the reference's random-weight HF checkpoints
            # (SURVEY §4 tiny-model strategy; bench.py dit tier)
            fam = config.model.split(":", 1)[1]
            if fam != "qwen_image":
                raise ValueError(
                    f"dummy family tier supports qwen_image, got {fam!r}")
            from vllm_omni_tpu.diffusion.qwen_image import (
                QwenImageConfig, init_qwen_image_params)

            self.family = "qwen_image"
            p = config.dit.patch_size
            self.family_cfg = QwenImageConfig(
                patch_size=p,
                in_channels=config.vae_latent_channels * p * p,
                out_channels=config.vae_latent_channels,
                num_layers=config.dit.num_layers,
                attention_head_dim=config.dit.head_dim,
                num_attention_heads=config.dit.num_heads,
                joint_attention_dim=config.dit.text_dim,
                axes_dims_rope=tuple(config.dit.axes_dims_rope))
            self.dit_params = init_qwen_image_params(
                self.family_cfg, k1, self.dtype)
            config.dit.hidden_size = self.family_cfg.inner_dim
            config.dit.latent_channels = config.vae_latent_channels
        elif is_diffusers_pipeline(config.model):
            from vllm_omni_tpu.diffusion.loader import (
                load_diffusers_pipeline)

            loaded = load_diffusers_pipeline(config.model, self.dtype)
            self.family = loaded["family"]
            self.family_cfg = loaded["transformer_cfg"]
            self.dit_params = loaded["params"]
            self.pipeline_class = loaded.get("class_name") or ""
            self._ltx2_upsampler = loaded.get("latent_upsampler")
            sched = loaded.get("scheduler") or {}
            if sched:
                config.num_train_timesteps = sched["num_train_timesteps"]
                config.flow_shift = sched["flow_shift"]
                config.use_dynamic_shifting = sched["use_dynamic_shifting"]
            vae_meta = loaded.get("vae") or {}
            if vae_meta.get("latent_channels"):
                config.vae_latent_channels = vae_meta["latent_channels"]
                config.vae_scale_factor = vae_meta.get(
                    "scale_factor", config.vae_scale_factor)
            # real VAE weights (loader.py load_vae): "kl" or "wan"
            # geometry replaces the random generic decoder entirely
            self.vae_kind = vae_meta.get("kind", "generic")
            self.vae_cfg = vae_meta.get("vae_cfg")
            self._loaded_vae_params = vae_meta.get("params")
            # keep derived knobs in sync for bucketing / text padding.
            # flux declares patch_size=1 in config.json but its pipeline
            # packs 2x2 (pack_factor) — the effective latent patch
            config.dit.patch_size = getattr(
                self.family_cfg, "pack_factor", None) or \
                self.family_cfg.patch_size
            config.dit.hidden_size = self.family_cfg.inner_dim
            config.dit.text_dim = getattr(
                self.family_cfg, "joint_attention_dim", None) or \
                self.family_cfg.caption_channels
            config.dit.latent_channels = config.vae_latent_channels
            config.dit.num_layers = self.family_cfg.num_layers
            config.dit.num_heads = self.family_cfg.num_attention_heads
            config.dit.head_dim = self.family_cfg.attention_head_dim
            if config.cache.enabled and \
                    self.family not in _CACHE_ACCEL_FAMILIES:
                logger.warning("cache accel not wired for family %s yet; "
                               "disabling", self.family)
                config.cache.backend = "none"
            if config.offload == "layerwise" and \
                    self.family not in _LAYERWISE_FAMILIES:
                raise ValueError(
                    "layerwise offload wired for families "
                    f"{_LAYERWISE_FAMILIES}, not {self.family!r}")
        else:
            self.dit_params = init_dit_params(config.dit, k1, self.dtype)
        if not hasattr(self, "vae_kind"):
            self.vae_kind, self.vae_cfg = "generic", None
            self._loaded_vae_params = None
        if not hasattr(self, "pipeline_class"):
            self.pipeline_class = ""
            self._ltx2_upsampler = None
        if self._loaded_vae_params is not None:
            self.vae_params = self._loaded_vae_params
        else:
            self.vae_kind = "generic"
            self.vae_params = init_vae_params(
                k2, config.vae_latent_channels, dtype=self.dtype)
        del self._loaded_vae_params
        self._vae_host = None
        self._host_layers = None
        if config.offload in ("model", "layerwise"):
            # VAE lives in host RAM; HBM holds only the DiT while
            # denoising (staged in per decode, freed after)
            self._vae_host = jax.device_get(self.vae_params)
            self.vae_params = None
        if config.offload == "layerwise":
            # reference layerwise_backend.py:21: block-by-block prefetch.
            # DiT blocks live in host RAM; the denoise step streams them
            # to HBM one ahead of compute (all blocks share one compiled
            # program) — peak HBM = resident embedders + 2 blocks +
            # activations. Block 0 stays resident so the TeaCache
            # modulated-input probe composes with layerwise offload.
            self._host_layer_tags = None
            if self.family == "flux":
                # heterogeneous stream: double blocks then single
                # blocks, with a txt/img-concat transition between
                dbl = self.dit_params["double_blocks"]
                sgl = self.dit_params["single_blocks"]
                self._host_layers = [jax.device_get(l)
                                     for l in dbl + sgl]
                self._host_layer_tags = (["double"] * len(dbl) +
                                         ["single"] * len(sgl))
                self.dit_params = {
                    k: v for k, v in self.dit_params.items()
                    if k not in ("double_blocks", "single_blocks")}
                self.dit_params["double_blocks"] = dbl[:1]
                self.dit_params["single_blocks"] = []
            else:
                lkey = "layers" if self.family == "generic" else \
                    "blocks"
                blocks = self.dit_params[lkey]
                self._host_layers = [jax.device_get(l) for l in blocks]
                self.dit_params = {
                    k: v for k, v in self.dit_params.items()
                    if k != lkey}
                self.dit_params[lkey] = blocks[:1]
            self._block_fn = jax.jit(functools.partial(
                self._apply_block_jit), static_argnames=("phase",))
            self._prolog_fn = jax.jit(self._prolog_jit)
            self._epilog_fn = jax.jit(self._epilog_jit,
                                      static_argnames=("text_len",
                                                       "latent_shape"))
        # parallel layout: one mesh carries cfg/sp(ulysses)/tp — replaces
        # the reference's initialize_model_parallel rank plumbing
        from vllm_omni_tpu.parallel import stage_mesh

        self.mesh = stage_mesh(config.parallel)
        if self.mesh is not None and self.mesh.shape.get("pp", 1) > 1 \
                and self.family not in _PP_FAMILIES:
            raise ValueError(
                f"pp wired for families {_PP_FAMILIES}, "
                f"not {self.family!r}")
        if self.mesh is not None and self.mesh.shape.get("pp", 1) > 1:
            # PP: layer groups shard over "pp"; the per-layer list is
            # replaced by one stacked pytree (dit.gpipe_blocks). Block 0
            # stays resident for the TeaCache modulated-input probe.
            from vllm_omni_tpu.diffusion.dit import stack_layers

            lkey = "layers" if self.family == "generic" else "blocks"
            blocks = self.dit_params.pop(lkey)
            self.dit_params[lkey + "_stacked"] = stack_layers(blocks)
            self.dit_params[lkey] = blocks[:1]
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            if self.family == "qwen_image":
                from vllm_omni_tpu.diffusion.qwen_image import (
                    qwen_image_param_shardings as _shardings)
            elif self.family == "flux":
                from vllm_omni_tpu.diffusion.flux import (
                    flux_param_shardings as _shardings)
            elif self.family == "wan":
                from vllm_omni_tpu.diffusion.wan import (
                    wan_param_shardings as _shardings)
            elif self.family == "sd3":
                from vllm_omni_tpu.diffusion.sd3 import (
                    sd3_param_shardings as _shardings)
            elif self.family == "hunyuan_video":
                from vllm_omni_tpu.diffusion.hunyuan_video import (
                    hunyuan_video_param_shardings as _shardings)
            elif self.family == "stable_audio":
                from vllm_omni_tpu.diffusion.stable_audio import (
                    stable_audio_param_shardings as _shardings)
            elif self.family == "flux2":
                from vllm_omni_tpu.diffusion.flux2 import (
                    flux2_param_shardings as _shardings)
            elif self.family == "z_image":
                from vllm_omni_tpu.diffusion.z_image import (
                    z_image_param_shardings as _shardings)
            elif self.family == "ovis_image":
                from vllm_omni_tpu.diffusion.ovis_image import (
                    ovis_image_param_shardings as _shardings)
            elif self.family == "longcat_image":
                from vllm_omni_tpu.diffusion.longcat_image import (
                    longcat_image_param_shardings as _shardings)
            elif self.family in ("omnigen2", "mammoth_moda2"):
                from vllm_omni_tpu.diffusion.omnigen2 import (
                    omnigen2_param_shardings as _shardings)
            elif self.family == "glm_image":
                from vllm_omni_tpu.diffusion.glm_image import (
                    glm_image_param_shardings as _shardings)
            elif self.family == "helios":
                from vllm_omni_tpu.diffusion.helios import (
                    helios_param_shardings as _shardings)
            elif self.family == "cosyvoice3_audio":
                from vllm_omni_tpu.diffusion.cosyvoice3_audio import (
                    cosy3_audio_param_shardings as _shardings)
            elif self.family == "omnivoice":
                from vllm_omni_tpu.diffusion.omnivoice import (
                    omnivoice_param_shardings as _shardings)
            elif self.family == "hunyuan_image3":
                from vllm_omni_tpu.diffusion.hunyuan_image3 import (
                    hi3_param_shardings as _shardings)
            elif self.family == "bagel":
                from vllm_omni_tpu.diffusion.bagel import (
                    bagel_param_shardings as _shardings)
            elif self.family in ("voxcpm", "voxcpm2"):
                from vllm_omni_tpu.diffusion.voxcpm import (
                    voxcpm_param_shardings as _shardings)
            elif self.family == "dreamid_omni":
                from vllm_omni_tpu.diffusion.dreamid import (
                    dreamid_param_shardings as _shardings)
            elif self.family == "magi_human":
                from vllm_omni_tpu.diffusion.magi_human import (
                    magi_param_shardings as _shardings)
            else:
                from vllm_omni_tpu.diffusion.dit import (
                    dit_param_shardings as _shardings)
            specs = _shardings(self.dit_params)
            self.dit_params = jax.tree.map(
                lambda x, s: jax.device_put(x, NamedSharding(self.mesh,
                                                             s)),
                self.dit_params, specs)
        self.scheduler = FlowMatchEulerScheduler(
            num_train_timesteps=config.num_train_timesteps,
            shift=config.flow_shift,
            use_dynamic_shifting=config.use_dynamic_shifting)
        self._step_fns: dict = {}
        # masked-token families run their own step loop (same
        # prepare/denoise_step/post_decode contract, no Euler scheduler)
        self._runner = None
        if self.family == "omnivoice":
            from vllm_omni_tpu.diffusion.omnivoice import OmniVoiceRunner

            self._runner = OmniVoiceRunner(self.family_cfg,
                                           self.dit_params,
                                           mesh=self.mesh)
        elif self.family == "nextstep":
            from vllm_omni_tpu.diffusion.nextstep import NextStepRunner

            self._runner = NextStepRunner(self.family_cfg,
                                          self.dit_params,
                                          mesh=self.mesh)
        elif self.family == "hunyuan_image3":
            from vllm_omni_tpu.diffusion.hunyuan_image3 import (
                HunyuanImage3Runner)

            self._runner = HunyuanImage3Runner(
                self.family_cfg, self.dit_params,
                num_train_timesteps=config.num_train_timesteps,
                flow_shift=config.flow_shift, mesh=self.mesh)
            try:
                from transformers import AutoTokenizer

                self._runner.tokenizer = AutoTokenizer.from_pretrained(
                    config.model)
            except Exception as e:  # noqa: BLE001 — HF raises broadly
                logger.warning(
                    "hunyuan_image3: tokenizer not loadable (%s) — "
                    "prompts hash into the vocab (dummy tier)", e)
        elif self.family == "magi_human":
            from vllm_omni_tpu.diffusion.magi_human import (
                MagiHumanRunner)

            self._runner = MagiHumanRunner(self.family_cfg,
                                           self.dit_params,
                                           mesh=self.mesh)
        elif self.family == "dreamid_omni":
            from vllm_omni_tpu.diffusion.dreamid import DreamIDRunner

            self._runner = DreamIDRunner(self.family_cfg,
                                         self.dit_params,
                                         mesh=self.mesh)
        elif self.family in ("voxcpm", "voxcpm2"):
            from vllm_omni_tpu.diffusion.voxcpm import VoxCPMRunner

            self._runner = VoxCPMRunner(self.family_cfg,
                                        self.dit_params,
                                        mesh=self.mesh)
            try:
                from transformers import AutoTokenizer

                self._runner.tokenizer = AutoTokenizer.from_pretrained(
                    config.model)
            except Exception as e:  # noqa: BLE001 — HF raises broadly
                logger.warning(
                    "voxcpm: tokenizer not loadable (%s) — prompts "
                    "hash into the vocab (dummy tier)", e)
        elif self.family == "bagel":
            from vllm_omni_tpu.diffusion.bagel import BagelRunner

            self._runner = BagelRunner(self.family_cfg,
                                       self.dit_params, mesh=self.mesh)
            try:
                from transformers import AutoTokenizer

                self._runner.tokenizer = AutoTokenizer.from_pretrained(
                    config.model)
            except Exception as e:  # noqa: BLE001 — HF raises broadly
                logger.warning(
                    "bagel: tokenizer not loadable (%s) — prompts hash "
                    "into the vocab (dummy tier)", e)
        # real text towers from the pipeline's text_encoder*/ subfolders
        # (reference: each pipeline's encode_prompt runs the checkpoint's
        # own encoders, e.g. pipeline_flux.py CLIP+T5). Families whose
        # encoder is an AR/VLM tower (qwen_image → Qwen2.5-VL) receive
        # text states from the upstream AR stage instead.
        self.prompt_encoder = None
        self._uses_pooled = self.family in ("flux", "sd3")
        if self.family != "generic" and \
                not config.model.startswith("dummy:"):
            from vllm_omni_tpu.diffusion.prompt_encoder import (
                PromptEncoder)

            pe = PromptEncoder(config.model, self.dtype)
            if pe.available:
                self.prompt_encoder = pe
                logger.info("prompt encoder: %s",
                            {s: v[0] for s, v in pe.encoders.items()})
            elif self._runner is None:
                logger.warning(
                    "no loadable text encoder in %s — prompts fall back "
                    "to a HASH embedding unless the upstream stage "
                    "supplies text_states (dummy/bench tier only)",
                    config.model)

    # -- 1/4: prepare --------------------------------------------------------
    def prepare(self, req: DiffusionRequest) -> DenoiseState:
        if self._runner is not None:
            p = req.params
            return self._runner.prepare(
                req, num_steps=p.num_inference_steps,
                seed=p.seed if p.seed is not None else 0)
        if self.family in AUDIO_LATENT_FAMILIES:
            return self._prepare_audio(req)
        p: DiffusionSamplingParams = req.params
        cfgd = self.config
        quantum = cfgd.vae_scale_factor * cfgd.dit.patch_size
        if p.height % quantum or p.width % quantum:
            raise ValueError(
                f"height/width must be multiples of {quantum}, got "
                f"{p.height}x{p.width}")
        h_lat = p.height // cfgd.vae_scale_factor
        w_lat = p.width // cfgd.vae_scale_factor
        if (p.height, p.width) not in cfgd.resolution_buckets:
            logger.warning("resolution %dx%d off-bucket; compiling fresh",
                           p.height, p.width)
        seed = p.seed if p.seed is not None else 0
        key = jax.random.PRNGKey(seed)
        layered = "Layered" in self.pipeline_class and \
            self.family == "qwen_image"
        n_frames = p.num_frames
        if layered:
            # QwenImageLayered: denoise layers+1 stacked frames (frame
            # 0 = the recomposited image; pipeline_qwen_image_layered.py
            # prepare_latents `layers + 1`)
            n_frames = int((p.extra_args or {}).get("layers", 4)) + 1
        shape = (1, h_lat, w_lat, cfgd.vae_latent_channels) \
            if n_frames <= 1 else \
            (1, n_frames, h_lat, w_lat, cfgd.vae_latent_channels)
        if self.family == "ltx2" and p.num_frames <= 1:
            # LTX2 is inherently a video (audio+video) model: a single
            # frame still runs the 5D joint path
            shape = (1, 1, h_lat, w_lat, cfgd.vae_latent_channels)
        latents = jax.random.normal(key, shape, jnp.float32).astype(
            self.dtype)
        text_states, pooled = self._resolve_text_states(req)
        # UAA-equivalent: make the joint (text+image) token stream
        # divisible by the SP extent by padding the text bucket, so
        # sequence sharding never silently falls back to replication
        # (reference UAA uneven-shard mode,
        # docs/design/feature/sequence_parallel.md:52-76 — on TPU a
        # static pad beats variable all-to-all splits: one compiled
        # program, full-width collectives)
        par = cfgd.parallel
        sp = (getattr(par, "ulysses_degree", 1) or 1) * \
            (getattr(par, "ring_degree", 1) or 1)
        if sp > 1:
            npt = (h_lat // cfgd.dit.patch_size) * \
                (w_lat // cfgd.dit.patch_size)
            if p.num_frames > 1:
                npt *= p.num_frames
            extra = (-(text_states.shape[1] + npt)) % sp
            if extra:
                logger.info("padding text bucket %d→%d so the joint "
                            "stream divides sp=%d", text_states.shape[1],
                            text_states.shape[1] + extra, sp)
                text_states = jnp.pad(
                    text_states, ((0, 0), (0, extra), (0, 0)))
        use_cfg = p.use_cfg and text_states.shape[0] == 2
        sigmas = self.scheduler.sigmas_for(
            p.num_inference_steps,
            image_seq_len=(h_lat // cfgd.dit.patch_size) *
            (w_lat // cfgd.dit.patch_size))
        init_image = (p.extra_args or {}).get("init_image")
        if init_image is not None and p.num_frames <= 1:
            # img2img (reference /v1/images/edits api_server.py:1405):
            # VAE-encode the reference image, truncate the flow-match
            # schedule by `strength`, and start from the partially-noised
            # encoding: x_sigma = (1-sigma)·x0 + sigma·noise.
            strength = float((p.extra_args or {}).get("strength", 0.6))
            strength = min(max(strength, 1e-3), 1.0)
            img = np.asarray(init_image, np.float32)
            if img.ndim == 2:
                img = img[..., None].repeat(3, axis=-1)
            if img.max() > 2.0:  # uint8 range → [-1, 1]
                img = img / 127.5 - 1.0
            if img.shape[:2] != (p.height, p.width):
                raise ValueError(
                    f"init_image {img.shape[:2]} must match requested "
                    f"{p.height}x{p.width}")
            vae = (jax.device_put(self._vae_host)
                   if self._vae_host is not None else self.vae_params)
            # split: `key` already generated the initial latent noise —
            # reusing it would make the VAE sampling eps IDENTICAL to
            # that noise (perfectly correlated draws)
            key, enc_key = jax.random.split(key)
            imgj = jnp.asarray(img, self.dtype)[None]
            if self.vae_kind == "kl":
                from vllm_omni_tpu.diffusion.vae_kl import kl_encode

                x0 = kl_encode(vae, self.vae_cfg, imgj, enc_key)
            elif self.vae_kind == "wan":
                from vllm_omni_tpu.diffusion.vae_wan import wan_encode

                x0 = wan_encode(vae, self.vae_cfg, imgj[:, None],
                                enc_key)[:, 0]
            else:
                x0 = vae_encode(vae, imgj, enc_key)
            if self._vae_host is not None:
                del vae
            start = min(int(round(p.num_inference_steps * (1 - strength))),
                        p.num_inference_steps - 1)
            sigmas = sigmas[start:]
            s0 = float(sigmas[0])
            latents = ((1.0 - s0) * x0.astype(jnp.float32) +
                       s0 * latents.astype(jnp.float32)).astype(self.dtype)
        ref_latents = None
        image_embeds = None
        ref_img = (p.extra_args or {}).get(
            "ref_image", (p.extra_args or {}).get("edit_image"))
        if ref_img is not None:
            if self.family == "wan":
                # WanImageToVideo TI2V: the first latent frame is the
                # (clean) encoded image; per-patch timesteps zero it
                # (pipeline_wan2_2_i2v.py expand_timesteps :533-537)
                rimg = np.asarray(ref_img, np.float32)
                if rimg.ndim == 2:
                    rimg = rimg[..., None].repeat(3, axis=-1)
                if rimg.max() > 2.0:
                    rimg = rimg / 127.5 - 1.0
                if rimg.shape[:2] != (p.height, p.width):
                    raise ValueError("ref_image must match the "
                                     "requested height/width")
                from vllm_omni_tpu.diffusion.vae_wan import wan_encode

                vae = (jax.device_put(self._vae_host)
                       if self._vae_host is not None
                       else self.vae_params)
                rj = jnp.asarray(rimg, self.dtype)[None]
                if self.vae_kind == "wan":
                    ref_latents = wan_encode(vae, self.vae_cfg,
                                             rj[:, None], sample=False)
                else:  # dummy tier: generic 2D VAE per frame
                    ref_latents = vae_encode(
                        vae, rj, jax.random.PRNGKey(0))[:, None]
                if self._vae_host is not None:
                    del vae
                ref_latents = ref_latents.astype(self.dtype)
                ref_img = None  # handled; skip the Kontext branch
            elif self.family == "hunyuan_video":
                # HunyuanVideo15 I2V: first-frame conditioning — the
                # image's argmax latents · scaling_factor ride the
                # cond_latents channel block with a first-frame mask
                # (pipeline_hunyuan_video_1_5_i2v.py:372-399); SigLIP
                # tokens load below when image_encoder/ ships.
                if self.vae_kind != "hyv15":
                    raise ValueError(
                        "HunyuanVideo15 I2V needs the checkpoint's "
                        "AutoencoderKLHunyuanVideo15 (with encoder "
                        "weights) to encode the reference image")
                if "encoder" not in (self._vae_host or self.vae_params):
                    raise ValueError(
                        "vae/ ships no encoder weights — cannot encode "
                        "the I2V reference image")
                from vllm_omni_tpu.diffusion.vae_hyv15 import (
                    hyv15_vae_encode)

                rimg = np.asarray(ref_img, np.float32)
                if rimg.ndim == 2:
                    rimg = rimg[..., None].repeat(3, axis=-1)
                if rimg.max() > 2.0:
                    rimg = rimg / 127.5 - 1.0
                if rimg.shape[:2] != (p.height, p.width):
                    raise ValueError("ref_image must match the "
                                     "requested height/width")
                vae = (jax.device_put(self._vae_host)
                       if self._vae_host is not None
                       else self.vae_params)
                lat1 = hyv15_vae_encode(
                    vae, self.vae_cfg,
                    jnp.asarray(rimg, self.dtype)[None, None],
                    sample=False)
                if self._vae_host is not None:
                    del vae
                ref_latents = (lat1[:, 0] *
                               self.vae_cfg.scaling_factor).astype(
                    self.dtype)
                # SigLIP image tokens when the checkpoint ships an
                # image_encoder/ (reference SiglipVisionModel,
                # pipeline_hunyuan_video_1_5_i2v.py:135, :358
                # last_hidden_state); zeros-absent otherwise
                enc_dir = os.path.join(self.config.model,
                                       "image_encoder")
                if os.path.isdir(enc_dir):
                    from vllm_omni_tpu.models.encoders import (
                        load_clip_vision_encoder,
                        vision_encoder_forward)

                    if not hasattr(self, "_siglip"):
                        self._siglip = load_clip_vision_encoder(
                            enc_dir, dtype=self.dtype)
                    scfg, sparams = self._siglip
                    pix = jax.image.resize(
                        jnp.asarray(rimg, jnp.float32)[None],
                        (1, scfg.image_size, scfg.image_size, 3),
                        "bilinear")
                    image_embeds = vision_encoder_forward(
                        sparams, scfg, pix.astype(self.dtype))
                ref_img = None  # handled; skip the Kontext branch
        if ref_img is not None and (p.num_frames <= 1 or layered):
            if self.family not in ("flux", "qwen_image"):
                raise ValueError(
                    "reference-image conditioning (Kontext/Edit) is "
                    f"wired for flux/qwen_image/wan, not {self.family}")
            # reference FluxKontext / QwenImageEdit: deterministic VAE
            # encode (sample_mode="argmax" → the posterior mean), full
            # strength — the reference image is CONTEXT, not an init
            rimg = np.asarray(ref_img, np.float32)
            if rimg.ndim == 2:
                rimg = rimg[..., None].repeat(3, axis=-1)
            if rimg.max() > 2.0:
                rimg = rimg / 127.5 - 1.0
            rh, rw = rimg.shape[:2]
            if rh % quantum or rw % quantum:
                raise ValueError(
                    f"ref_image dims must be multiples of {quantum}")
            vae = (jax.device_put(self._vae_host)
                   if self._vae_host is not None else self.vae_params)
            rj = jnp.asarray(rimg, self.dtype)[None]
            if self.vae_kind == "kl":
                from vllm_omni_tpu.diffusion.vae_kl import kl_encode

                ref_latents = kl_encode(vae, self.vae_cfg, rj,
                                        sample=False)
            elif self.vae_kind == "wan":
                from vllm_omni_tpu.diffusion.vae_wan import wan_encode

                ref_latents = wan_encode(vae, self.vae_cfg, rj[:, None],
                                         sample=False)[:, 0]
            else:
                ref_latents = vae_encode(vae, rj,
                                         jax.random.PRNGKey(0))
            if self._vae_host is not None:
                del vae
            ref_latents = ref_latents.astype(self.dtype)
        audio_latents = None
        if self.family == "ltx2":
            # joint AV denoising: audio latent frames from the video
            # duration at audio_latents_per_second = rate/hop/scale
            # (reference pipeline_ltx2.py audio latent prep)
            fc = self.family_cfg
            frames = max(int(p.num_frames), 1)
            secs = max(frames * fc.vae_scale_factors[0] / 24.0, 0.04)
            lps = (fc.audio_sampling_rate / fc.audio_hop_length /
                   fc.audio_scale_factor)
            ta = max(int(round(secs * lps)), 1)
            audio_latents = jax.random.normal(
                jax.random.fold_in(key, 1), (1, ta, fc.audio_in_channels),
                jnp.float32).astype(self.dtype)
        vace = None
        if self.family == "wan" and \
                getattr(self.family_cfg, "vace_layers", None):
            vace = self._prepare_vace(p)
        cond_extras = None
        if self.family == "glm_image":
            # AR prior-VQ tokens from the upstream GLM-Image AR stage;
            # absent priors run as the reference's dropped-prior branch
            prior = req.additional_information.get("prior_token_id")
            npt = (h_lat // cfgd.dit.patch_size) * \
                (w_lat // cfgd.dit.patch_size)
            missing = prior is None
            if missing:
                prior = np.zeros((1, npt), np.int32)
            cond_extras = {
                "prior_token_id": jnp.asarray(
                    np.asarray(prior, np.int32).reshape(1, -1)),
                "prior_missing": missing,
            }
        return DenoiseState(
            latents=latents, audio_latents=audio_latents,
            text_states=text_states, pooled=pooled,
            ref_latents=ref_latents, sigmas=sigmas,
            timesteps=self.scheduler.timesteps_for(sigmas),
            use_cfg=use_cfg, guidance_scale=p.guidance_scale,
            cond_extras=cond_extras, vace=vace,
            image_embeds=image_embeds)

    def _prepare_vace(self, p) -> Any:
        """WanVACE conditioning context (reference
        pipeline_wan2_2_vace.py prepare_video_latents + prepare_masks):
        inactive = encode(video·(1−mask)), reactive = encode(video·mask)
        (argmax posterior, per-channel normalized inside wan_encode),
        mask 8×8-spatial-stride encoded to 64 channels and temporally
        nearest-resized to the latent frame count; context =
        [inactive | reactive | mask] along channels. A precomputed
        latent-space context rides extra_args["vace_context"]
        ([F, h, w, C_vace] or [1, F, h, w, C_vace])."""
        ea = p.extra_args or {}
        scale = float(ea.get("vace_context_scale", 1.0))
        pre = ea.get("vace_context")
        if pre is not None:
            ctx = jnp.asarray(np.asarray(pre, np.float32), self.dtype)
            if ctx.ndim == 4:
                ctx = ctx[None]
            return (ctx, scale)
        video = ea.get("source_video")
        if video is None:
            return None
        if self.vae_kind != "wan":
            raise ValueError(
                "VACE source_video conditioning needs the checkpoint's "
                "Wan VAE (pass a precomputed extra_args['vace_context'] "
                "otherwise)")
        from vllm_omni_tpu.diffusion.vae_wan import wan_encode

        video = np.asarray(video, np.float32)  # [F, H, W, 3] in [-1,1]
        if video.max() > 2.0:
            video = video / 127.5 - 1.0
        f, hh, ww = video.shape[:3]
        if (hh, ww) != (p.height, p.width):
            raise ValueError("source_video must match the requested "
                             "height/width")
        mask = ea.get("mask")
        if mask is None:
            mask = np.ones((f, hh, ww), np.float32)
        else:
            mask = np.asarray(mask, np.float32)
            if mask.ndim == 4:
                mask = mask[..., 0]
        mask = (mask > 0.5).astype(np.float32)  # binarize
        vae = (jax.device_put(self._vae_host)
               if self._vae_host is not None else self.vae_params)
        inact = wan_encode(vae, self.vae_cfg,
                           jnp.asarray(video * (1.0 - mask[..., None]),
                                       self.dtype)[None], sample=False)
        react = wan_encode(vae, self.vae_cfg,
                           jnp.asarray(video * mask[..., None],
                                       self.dtype)[None], sample=False)
        if self._vae_host is not None:
            del vae
        f_lat = inact.shape[1]
        # 8×8 spatial-stride mask channels (prepare_masks: the 64
        # subpixel offsets become channels at latent resolution), then
        # nearest-exact temporal resize to the latent frame count
        sp = self.config.vae_scale_factor
        h_lat, w_lat = hh // sp, ww // sp
        m = mask.reshape(f, h_lat, sp, w_lat, sp)
        m = m.transpose(2, 4, 0, 1, 3).reshape(sp * sp, f, h_lat, w_lat)
        idx = np.clip(np.round((np.arange(f_lat) + 0.5) * f / f_lat -
                               0.5).astype(np.int64), 0, f - 1)
        m = m[:, idx]  # [64, F_lat, h, w]
        m = jnp.asarray(m.transpose(1, 2, 3, 0), self.dtype)[None]
        ctx = jnp.concatenate([inact.astype(self.dtype),
                               react.astype(self.dtype), m], axis=-1)
        want = getattr(self.family_cfg, "vace_in_channels", ctx.shape[-1])
        if ctx.shape[-1] != want:
            raise ValueError(
                f"vace context has {ctx.shape[-1]} channels; the "
                f"transformer expects vace_in_channels={want}")
        return (ctx, scale)

    def _prepare_audio(self, req: DiffusionRequest) -> DenoiseState:
        """Stable-Audio-class 1D latent prep (reference
        pipeline_stable_audio.py:419-521 — waveform latents
        [B, sample_size, C]; audio_end_in_s only trims the decoded
        waveform, the denoised window is always sample_size). We bucket
        the latent length instead: frames = seconds·rate/hop rounded up
        to 64, capped at the trained window — fewer tokens for short
        clips, one compiled program per bucket."""
        p: DiffusionSamplingParams = req.params
        fc = self.family_cfg
        text_states, _ = self._resolve_text_states(req)
        if self.family == "cosyvoice3_audio":
            # conditional flow matching over mel: mu (talker features)
            # is per-FRAME conditioning, so the mel length is the
            # conditioning length (reference cosyvoice3_dit.py :426 —
            # x, cond and mu share the time axis)
            frames = text_states.shape[1]
            channels = fc.mel_dim
        else:
            secs = float((p.extra_args or {}).get(
                "audio_end_in_s", (p.extra_args or {}).get(
                    "audio_seconds", 10.0)))
            frames = max(
                int(round(secs * fc.sampling_rate / fc.hop_length)), 1)
            frames = min(-(-frames // 64) * 64, fc.sample_size)
            channels = fc.in_channels
        seed = p.seed if p.seed is not None else 0
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            key, (1, frames, channels), jnp.float32).astype(self.dtype)
        use_cfg = p.use_cfg and text_states.shape[0] == 2
        sigmas = self.scheduler.sigmas_for(p.num_inference_steps,
                                           image_seq_len=frames)
        return DenoiseState(
            latents=latents, text_states=text_states, sigmas=sigmas,
            timesteps=self.scheduler.timesteps_for(sigmas),
            use_cfg=use_cfg, guidance_scale=p.guidance_scale)

    def _resolve_text_states(self, req: DiffusionRequest) -> tuple:
        """→ (text_states [1|2, T, text_dim], pooled [1|2, P] | None):
        row 0 = conditional, row 1 = unconditional (CFG). Precedence:
        upstream-stage hidden-state handoff > the checkpoint's own text
        towers (prompt_encoder) > a hash embedding of the prompt string
        (dummy/bench tier only — keeps e2e runnable without a tower)."""
        d = self.config.dit.text_dim
        cond = req.additional_information.get("text_states")
        if cond is None and isinstance(req.prompt, dict):
            cond = req.prompt.get("text_states")
        pooled_rows = None
        neg_p = req.negative_prompt or req.params.negative_prompt or ""
        if cond is not None:
            cond = np.asarray(cond, np.float32)
            if cond.ndim == 2:
                cond = cond[None]
            cond = _pad_or_trim(cond, self.TEXT_LEN)
            pooled = req.additional_information.get("pooled_text_states")
            if pooled is not None:
                pooled_rows = [np.asarray(pooled, np.float32).reshape(
                    1, -1)]
        elif self.prompt_encoder is not None:
            enc = self.prompt_encoder.encode(str(req.prompt),
                                             self.family, self.TEXT_LEN)
            # real encoders may exceed the static bucket (sd3: CLIP+T5
            # concat) — pad up to the next 64 multiple instead of
            # truncating conditioning
            tl = max(self.TEXT_LEN,
                     -(-enc["text_states"].shape[1] // 64) * 64)
            cond = _pad_or_trim(enc["text_states"], tl)
            if enc.get("pooled") is not None:
                pooled_rows = [enc["pooled"]]
        else:
            cond = _hash_embed(str(req.prompt), self.TEXT_LEN, d)[None]
        rows = [cond]
        if req.params.use_cfg:
            neg = req.additional_information.get("negative_text_states")
            if neg is not None:
                # cross-stage CFG: negative branch encoded by the
                # upstream AR stage (companion request)
                neg = np.asarray(neg, np.float32)
                if neg.ndim == 2:
                    neg = neg[None]
                rows.append(_pad_or_trim(neg, cond.shape[1]))
                if pooled_rows is not None:
                    npool = req.additional_information.get(
                        "negative_pooled_text_states")
                    if npool is not None:
                        pooled_rows.append(np.asarray(
                            npool, np.float32).reshape(1, -1))
                    else:
                        pooled_rows.append(np.zeros_like(pooled_rows[0]))
            elif self.prompt_encoder is not None:
                enc_n = self.prompt_encoder.encode(str(neg_p),
                                                   self.family,
                                                   self.TEXT_LEN)
                rows.append(_pad_or_trim(enc_n["text_states"],
                                         cond.shape[1]))
                if pooled_rows is not None:
                    pooled_rows.append(
                        enc_n["pooled"] if enc_n.get("pooled") is not
                        None else np.zeros_like(pooled_rows[0]))
            else:
                rows.append(_hash_embed(str(neg_p), cond.shape[1],
                                        d)[None])
                if pooled_rows is not None:
                    pooled_rows.append(np.zeros_like(pooled_rows[0]))
        text = jnp.asarray(np.concatenate(rows, axis=0), self.dtype)
        pooled = None
        if pooled_rows is not None and self._uses_pooled:
            pooled = jnp.asarray(np.concatenate(pooled_rows, axis=0),
                                 self.dtype)
        return text, pooled

    # -- 2/4: one denoise step ----------------------------------------------
    def denoise_step(self, state: DenoiseState) -> None:
        if self._runner is not None:
            self._runner.denoise_step(state)
            return
        i = state.step_index
        sigma = float(state.sigmas[i])
        sigma_next = float(state.sigmas[i + 1])
        t = float(state.timesteps[i])
        extras_key = None
        if state.cond_extras is not None:
            extras_key = ("glm", bool(
                state.cond_extras.get("prior_missing")),
                state.cond_extras["prior_token_id"].shape)
        elif state.ref_latents is not None:
            extras_key = ("ref", tuple(state.ref_latents.shape),
                          None if state.image_embeds is None
                          else tuple(state.image_embeds.shape))
        elif state.vace is not None:
            extras_key = ("vace", tuple(state.vace[0].shape),
                          float(state.vace[1]))
        # cache accel steps aside for conditioned step bodies (ref/
        # vace/prior) — the reference similarly excludes conditioned
        # archs from cache accel (registry _NO_CACHE_ACCELERATION :204)
        cached = self.config.cache.enabled and extras_key is None
        fn = self._get_step_fn(state.latents.shape, state.use_cfg,
                               cached, extras_key)
        if cached:
            if state.cache_mod is None:
                state.cache_mod = jnp.zeros(
                    self._probe_shape(state.latents.shape), jnp.float32)
                state.cache_v = jnp.zeros(state.latents.shape, jnp.float32)
                state.cache_accum = jnp.float32(0.0)
                state.cache_skips = jnp.int32(0)
                state.cache_dv = jnp.zeros(state.latents.shape,
                                           jnp.float32)
                # -1 sentinel: no anchor velocity yet, first full
                # compute must leave dv at zero
                state.cache_gap = jnp.int32(-1)
            force = jnp.bool_(i == 0 or i == state.num_steps - 1)
            pooled = state.pooled
            if pooled is None and self._uses_pooled:
                pooled = jnp.zeros(
                    (state.text_states.shape[0],
                     self.family_cfg.pooled_projection_dim), self.dtype)
            (state.latents, state.cache_mod, state.cache_v,
             state.cache_accum, state.cache_skips, state.cache_dv,
             state.cache_gap) = fn(
                self.dit_params, state.latents, state.text_states,
                jnp.float32(t), jnp.float32(sigma),
                jnp.float32(sigma_next),
                jnp.float32(state.guidance_scale), state.cache_mod,
                state.cache_v, state.cache_accum, state.cache_skips,
                state.cache_dv, state.cache_gap, force, pooled)
        elif self.family == "ltx2":
            state.latents, state.audio_latents = fn(
                self.dit_params, state.latents, state.audio_latents,
                state.text_states, jnp.float32(t), jnp.float32(sigma),
                jnp.float32(sigma_next),
                jnp.float32(state.guidance_scale))
        elif state.cond_extras is not None:
            state.latents = fn(self.dit_params, state.latents,
                               state.text_states,
                               jnp.float32(t), jnp.float32(sigma),
                               jnp.float32(sigma_next),
                               jnp.float32(state.guidance_scale),
                               state.cond_extras["prior_token_id"])
        elif state.ref_latents is not None:
            pooled = state.pooled
            if pooled is None and self._uses_pooled:
                pooled = jnp.zeros(
                    (state.text_states.shape[0],
                     self.family_cfg.pooled_projection_dim), self.dtype)
            args = (self.dit_params, state.latents, state.text_states,
                    jnp.float32(t), jnp.float32(sigma),
                    jnp.float32(sigma_next),
                    jnp.float32(state.guidance_scale),
                    pooled, state.ref_latents)
            if self.family == "hunyuan_video" and \
                    state.image_embeds is not None:
                args = args + (state.image_embeds,)
            state.latents = fn(*args)
        elif state.vace is not None:
            state.latents = fn(self.dit_params, state.latents,
                               state.text_states,
                               jnp.float32(t), jnp.float32(sigma),
                               jnp.float32(sigma_next),
                               jnp.float32(state.guidance_scale),
                               None, state.vace[0])
        elif self._uses_pooled:
            pooled = state.pooled
            if pooled is None:
                pooled = jnp.zeros(
                    (state.text_states.shape[0],
                     self.family_cfg.pooled_projection_dim), self.dtype)
            state.latents = fn(self.dit_params, state.latents,
                               state.text_states,
                               jnp.float32(t), jnp.float32(sigma),
                               jnp.float32(sigma_next),
                               jnp.float32(state.guidance_scale),
                               pooled)
        else:
            state.latents = fn(self.dit_params, state.latents,
                               state.text_states,
                               jnp.float32(t), jnp.float32(sigma),
                               jnp.float32(sigma_next),
                               jnp.float32(state.guidance_scale))
        state.step_index += 1

    def _get_step_fn(self, latent_shape, use_cfg: bool,
                     cached: bool = False, extras_key=None):
        key = (latent_shape, use_cfg, cached, extras_key)
        fn = self._step_fns.get(key)
        if fn is None:
            if extras_key is not None and extras_key[0] == "ref":
                if self.family == "wan":
                    body = self._step_body_wan_i2v
                elif self.family == "hunyuan_video":
                    body = self._step_body_hyv_i2v
                else:
                    body = self._step_body_ref
            elif extras_key is not None and extras_key[0] == "vace":
                body = functools.partial(self._step_body_vace,
                                         vace_scale=extras_key[2])
            elif extras_key is not None:
                body = functools.partial(
                    self._step_body_extras,
                    prior_missing=extras_key[1])
            else:
                body = self._cached_step_body if cached else (
                    self._step_body_ltx2 if self.family == "ltx2"
                    else self._step_body)
            if self._host_layers is not None:
                # layerwise offload: the step loop runs host-side
                # (device_put per block); only the pieces are jitted
                if cached:
                    raise ValueError(
                        "tea_cache is incompatible with layerwise "
                        "offload (step must stay host-driven)")
                fn = functools.partial(body, use_cfg=use_cfg)
            else:
                fn = jax.jit(functools.partial(body, use_cfg=use_cfg),
                             donate_argnums=(1,))
            self._step_fns[key] = fn
        return fn

    # layerwise-offload jit pieces (shapes shared by all blocks → one
    # compiled program each). Family-dispatched over the same
    # (carry, row_consts, shared_consts) split the PP GPipe body uses.
    def _prolog_jit(self, params, latents, text_states, timesteps,
                    guidance=None, pooled=None):
        if self.family == "flux":
            from vllm_omni_tpu.diffusion.flux import flux_prolog

            g = None
            if self.family_cfg.guidance_embeds and guidance is not None:
                g = jnp.full((latents.shape[0],), guidance, jnp.float32)
            pl_rows = pooled[:latents.shape[0]] \
                if pooled is not None else None
            (img, txt), temb, (cos, sin), _ = flux_prolog(
                params, self.family_cfg, latents, text_states,
                timesteps, pooled=pl_rows, guidance=g, mesh=self.mesh)
            return (img, txt), (temb,), (cos, sin)
        if self.family == "qwen_image":
            from vllm_omni_tpu.diffusion.qwen_image import (
                qwen_image_prolog)

            (img, txt), temb, (cos, sin), _ = qwen_image_prolog(
                params, self.family_cfg, latents, text_states,
                timesteps, mesh=self.mesh)
            return (img, txt), (temb,), (cos, sin)
        if self.family == "wan":
            from vllm_omni_tpu.diffusion.wan import wan_prolog

            lat5 = latents if latents.ndim == 5 else latents[:, None]
            x, (txt, tproj), temb, (cos, sin) = wan_prolog(
                params, self.family_cfg, lat5, text_states, timesteps,
                mesh=self.mesh)
            return (x,), (txt, tproj, temb), (cos, sin)
        from vllm_omni_tpu.diffusion.dit import dit_prolog, dit_rope

        x, temb = dit_prolog(params, self.config.dit, latents,
                             text_states, timesteps, mesh=self.mesh)
        cos, sin = dit_rope(self.config.dit, latents.shape,
                            text_states.shape[1])
        return (x,), (temb,), (cos, sin)

    def _apply_block_jit(self, layer, carry, rows, shared, phase=None):
        if self.family == "flux":
            from vllm_omni_tpu.diffusion.flux import (flux_double_block,
                                                      flux_single_block)

            if phase == "double":
                return flux_double_block(layer, self.family_cfg,
                                         carry[0], carry[1], rows[0],
                                         shared[0], shared[1],
                                         mesh=self.mesh)
            return (flux_single_block(layer, self.family_cfg, carry[0],
                                      rows[0], shared[0], shared[1],
                                      mesh=self.mesh),)
        if self.family == "qwen_image":
            from vllm_omni_tpu.diffusion.qwen_image import (
                qwen_image_block)

            return qwen_image_block(layer, self.family_cfg, carry[0],
                                    carry[1], rows[0], shared[0],
                                    shared[1], mesh=self.mesh)
        if self.family == "wan":
            from vllm_omni_tpu.diffusion.wan import wan_block

            return (wan_block(layer, self.family_cfg, carry[0],
                              rows[0], rows[1], shared[0], shared[1],
                              mesh=self.mesh),)
        from vllm_omni_tpu.diffusion.dit import dit_block_apply

        return (dit_block_apply(layer, self.config.dit, carry[0],
                                rows[0], shared[0], shared[1],
                                mesh=self.mesh),)

    def _epilog_jit(self, params, carry, rows, *, text_len: int,
                    latent_shape):
        if self.family == "flux":
            from vllm_omni_tpu.diffusion.flux import flux_epilog

            b, h, w, c = latent_shape
            p = self.family_cfg.pack_factor
            return flux_epilog(params, self.family_cfg, carry[0],
                               rows[0], text_len, h, w,
                               (h // p) * (w // p))
        if self.family == "qwen_image":
            from vllm_omni_tpu.diffusion.qwen_image import (
                qwen_image_epilog)

            if len(latent_shape) == 5:  # Layered stacked frames
                b, f, h, w, c = latent_shape
            else:
                b, h, w, c = latent_shape
                f = 1
            p = self.family_cfg.patch_size
            return qwen_image_epilog(params, self.family_cfg, carry[0],
                                     rows[0], h, w,
                                     f * (h // p) * (w // p), frames=f)
        if self.family == "wan":
            from vllm_omni_tpu.diffusion.wan import wan_epilog

            if len(latent_shape) == 5:
                b, f, h, w, c = latent_shape
            else:
                b, h, w, c = latent_shape
                f = 1
            out = wan_epilog(params, self.family_cfg, carry[0], rows[2],
                             f, h, w)
            return out[:, 0] if len(latent_shape) == 4 else out
        from vllm_omni_tpu.diffusion.dit import dit_epilog

        return dit_epilog(params, self.config.dit, carry[0], rows[0],
                          text_len, latent_shape)

    def _predict_velocity_layerwise(self, latents, text_states,
                                    timesteps, guidance=None,
                                    pooled=None):
        carry, rows, shared = self._prolog_fn(
            self.dit_params, latents, text_states, timesteps,
            guidance, pooled)
        tags = getattr(self, "_host_layer_tags", None)
        # double-buffered host→HBM prefetch: device_put is async, so
        # block i+1 stages in while block i computes
        nxt = jax.device_put(self._host_layers[0])
        prev_tag = tags[0] if tags else None
        for i in range(len(self._host_layers)):
            cur = nxt
            if i + 1 < len(self._host_layers):
                nxt = jax.device_put(self._host_layers[i + 1])
            tag = tags[i] if tags else None
            if tag != prev_tag:
                # flux double→single phase boundary: the dual streams
                # concat into the joint [txt; img] stream
                carry = (jnp.concatenate([carry[1], carry[0]],
                                         axis=1),)
                prev_tag = tag
            carry = self._block_fn(cur, carry, rows, shared, phase=tag)
            del cur
        return self._epilog_fn(self.dit_params, carry, rows,
                               text_len=text_states.shape[1],
                               latent_shape=tuple(latents.shape)
                               ).astype(jnp.float32)

    def _predict_velocity(self, params, latents, text_states, t,
                          guidance, use_cfg: bool, pooled=None,
                          ref_latents=None, vace=None):
        if self.family != "generic":
            # real-geometry forwards take flow-match σ ∈ [0,1] (each
            # applies its own diffusers-transformer scaling, e.g. ×1000
            # sinusoids); scheduler timesteps arrive as σ·num_train
            # (diffusers pipeline convention) — normalize here. The
            # generic DiT tier keeps raw train-timestep units.
            t = t / self.config.num_train_timesteps
        if self._host_layers is not None:
            if ref_latents is not None:
                raise ValueError("reference-image conditioning is not "
                                 "supported under layerwise offload")
            if vace is not None:
                raise ValueError("VACE conditioning is not supported "
                                 "under layerwise offload")
            tt0 = jnp.full((latents.shape[0],), t, jnp.float32)
            if use_cfg:
                lat2 = jnp.concatenate([latents, latents], axis=0)
                tt2 = jnp.full((2,), t, jnp.float32)
                v = self._predict_velocity_layerwise(
                    lat2, text_states, tt2, guidance=guidance,
                    pooled=pooled)
                v_cond, v_uncond = v[:1], v[1:]
                return v_uncond + guidance * (v_cond - v_uncond)
            return self._predict_velocity_layerwise(
                latents, text_states[:1], tt0, guidance=guidance,
                pooled=pooled)
        if self.family == "qwen_image":
            from vllm_omni_tpu.diffusion.qwen_image import (
                qwen_image_forward)

            def fwd(pp, lat, txt, tt):
                cl = None
                if ref_latents is not None:
                    cl = jnp.concatenate(
                        [ref_latents] * lat.shape[0], axis=0)
                tc = None
                if getattr(self.family_cfg, "use_additional_t_cond",
                           False):
                    # Layered is_rgb flag (the reference serves 0,
                    # pipeline_qwen_image_layered.py `is_rgb`)
                    tc = jnp.zeros((lat.shape[0],), jnp.int32)
                return qwen_image_forward(pp, self.family_cfg, lat, txt,
                                          tt, cond_latents=cl,
                                          mesh=self.mesh, t_cond=tc)
        elif self.family == "flux":
            from vllm_omni_tpu.diffusion.flux import flux_forward

            # guidance-distilled: the guidance scale rides the embedding
            # (reference pipeline_flux.py guidance tensor), no true CFG
            def fwd(pp, lat, txt, tt):
                g = None
                if self.family_cfg.guidance_embeds:
                    g = jnp.full((lat.shape[0],), guidance, jnp.float32)
                pl = pooled[:lat.shape[0]] if pooled is not None else None
                rl = None
                if ref_latents is not None:
                    rl = jnp.concatenate(
                        [ref_latents] * lat.shape[0], axis=0)
                return flux_forward(pp, self.family_cfg, lat, txt, tt,
                                    guidance=g, pooled=pl,
                                    ref_latents=rl, mesh=self.mesh)
        elif self.family == "wan":
            from vllm_omni_tpu.diffusion.wan import wan_forward

            def fwd(pp, lat, txt, tt):
                kw = {}
                if vace is not None:
                    ctx, scale = vace
                    if ctx.shape[0] != lat.shape[0]:
                        ctx = jnp.concatenate(
                            [ctx] * lat.shape[0], axis=0)
                    kw = dict(vace_context=ctx, vace_scale=scale)
                return wan_forward(pp, self.family_cfg, lat, txt, tt,
                                   mesh=self.mesh, **kw)
        elif self.family == "sd3":
            from vllm_omni_tpu.diffusion.sd3 import sd3_forward

            def fwd(pp, lat, txt, tt):
                pl = pooled[:lat.shape[0]] if pooled is not None else None
                return sd3_forward(pp, self.family_cfg, lat, txt, tt,
                                   pooled=pl, mesh=self.mesh)
        elif self.family == "hunyuan_video":
            from vllm_omni_tpu.diffusion.hunyuan_video import (
                hunyuan_video_forward)

            # T2V serving path: ByT5/vision sources absent (zero-length;
            # reference zeroes them, pipeline_hunyuan_video_1_5.py:437)
            def fwd(pp, lat, txt, tt):
                return hunyuan_video_forward(pp, self.family_cfg, lat,
                                             txt, tt, mesh=self.mesh)
        elif self.family == "flux2":
            from vllm_omni_tpu.diffusion.flux2 import flux2_forward

            # guidance-distilled like flux1: the scale rides the
            # embedding (reference flux2_transformer.py :676)
            def fwd(pp, lat, txt, tt):
                g = None
                if self.family_cfg.guidance_embeds:
                    g = jnp.full((lat.shape[0],), guidance, jnp.float32)
                return flux2_forward(pp, self.family_cfg, lat, txt, tt,
                                     guidance=g, mesh=self.mesh)
        elif self.family == "ovis_image":
            from vllm_omni_tpu.diffusion.ovis_image import (
                ovis_image_forward)

            def fwd(pp, lat, txt, tt):
                return ovis_image_forward(pp, self.family_cfg, lat, txt,
                                          tt, mesh=self.mesh)
        elif self.family == "longcat_image":
            from vllm_omni_tpu.diffusion.longcat_image import (
                longcat_image_forward)

            def fwd(pp, lat, txt, tt):
                return longcat_image_forward(pp, self.family_cfg, lat,
                                             txt, tt, mesh=self.mesh)
        elif self.family == "helios":
            from vllm_omni_tpu.diffusion.helios import helios_forward

            def fwd(pp, lat, txt, tt):
                return helios_forward(pp, self.family_cfg, lat, txt, tt,
                                      mesh=self.mesh)
        elif self.family in ("omnigen2", "mammoth_moda2"):
            from vllm_omni_tpu.diffusion.omnigen2 import omnigen2_forward

            # Lumina2 conventions like z_image: t = 1 - σ in,
            # data-noise out (pipeline_omnigen2.py:150; the mammoth
            # scheduler is the same ascending-t Euler, schedulers.py:47)
            def fwd(pp, lat, txt, tt):
                return -omnigen2_forward(pp, self.family_cfg, lat, txt,
                                         1.0 - tt, mesh=self.mesh)
        elif self.family == "z_image":
            from vllm_omni_tpu.diffusion.z_image import z_image_forward

            # reference pipeline_z_image.py:702,770 — the transformer
            # takes t = 1 - σ and returns -velocity
            def fwd(pp, lat, txt, tt):
                return -z_image_forward(pp, self.family_cfg, lat, txt,
                                        1.0 - tt, mesh=self.mesh)
        elif self.family == "cosyvoice3_audio":
            from vllm_omni_tpu.diffusion.cosyvoice3_audio import (
                cosy3_audio_forward)

            # mu = per-frame talker conditioning; cond/spks zero for
            # plain TTS (prompt-audio cloning feeds them upstream)
            def fwd(pp, lat, txt, tt):
                return cosy3_audio_forward(pp, self.family_cfg, lat,
                                           txt, tt, mesh=self.mesh)
        elif self.family == "stable_audio":
            from vllm_omni_tpu.diffusion.stable_audio import (
                stable_audio_forward)

            # duration/global conditioning rides in from the upstream
            # stage when present; zeros otherwise (bias-free global_proj
            # makes zeros a no-op — module docstring)
            def fwd(pp, lat, txt, tt):
                return stable_audio_forward(pp, self.family_cfg, lat,
                                            txt, tt, mesh=self.mesh)
        else:
            def fwd(pp, lat, txt, tt):
                return dit_forward(pp, self.config.dit, lat, txt, tt,
                                   mesh=self.mesh)
        if use_cfg:
            lat2 = jnp.concatenate([latents, latents], axis=0)
            tt = jnp.full((2,), t, jnp.float32)
            v = fwd(params, lat2, text_states, tt)
            v_cond, v_uncond = v[:1], v[1:]
            if self.family == "z_image":
                # reference pipeline_z_image.py:749 — CFG composes
                # around the POSITIVE branch: pred = pos + s·(pos - neg)
                return (v_cond + guidance * (v_cond - v_uncond)).astype(
                    jnp.float32)
            comb = v_uncond + guidance * (v_cond - v_uncond)
            if self.family == "longcat_image":
                # reference cfg_normalize_function (pipeline
                # _longcat_image.py:467, default-on): cap the combined
                # prediction's per-token norm at the conditional's
                from vllm_omni_tpu.diffusion.longcat_image import (
                    cfg_renormalize)

                comb = cfg_renormalize(v_cond, comb)
            return comb.astype(jnp.float32)
        tt = jnp.full((latents.shape[0],), t, jnp.float32)
        return fwd(params, latents, text_states[:1], tt).astype(
            jnp.float32)

    def _probe_shape(self, latent_shape) -> tuple:
        """Shape of the family's modulated-input probe buffer."""
        if self.family == "qwen_image":
            if len(latent_shape) == 5:  # Layered stacked frames
                b, f, h, w, _ = latent_shape
            else:
                b, h, w, _ = latent_shape
                f = 1
            p = self.family_cfg.patch_size
            return (b, f * (h // p) * (w // p),
                    self.family_cfg.inner_dim)
        if self.family == "flux":
            b, h, w, _ = latent_shape
            p = self.family_cfg.pack_factor
            return (b, (h // p) * (w // p), self.family_cfg.inner_dim)
        if self.family == "wan":
            if len(latent_shape) == 4:
                b, h, w, _ = latent_shape
                f = 1
            else:
                b, f, h, w, _ = latent_shape
            pt, ph, pw = self.family_cfg.patch_size
            return (b, (f // pt) * (h // ph) * (w // pw),
                    self.family_cfg.inner_dim)
        if self.family == "flux2":
            b, h, w, _ = latent_shape
            p = self.family_cfg.pack_factor
            return (b, (h // p) * (w // p), self.family_cfg.inner_dim)
        if self.family == "z_image":
            from vllm_omni_tpu.diffusion.z_image import SEQ_MULTI_OF

            b, h, w, _ = latent_shape
            p = self.family_cfg.patch_size
            n = (h // p) * (w // p)
            n += (-n) % SEQ_MULTI_OF
            return (b, n, self.family_cfg.dim)
        if self.family == "stable_audio":
            b, L, _ = latent_shape
            return (b, L + 1, self.family_cfg.inner_dim)
        b, h, w, _ = latent_shape
        npt = (h // self.config.dit.patch_size) * \
            (w // self.config.dit.patch_size)
        return (b, npt, self.config.dit.hidden_size)

    def _modulated_input(self, params, latents, t, guidance,
                         pooled=None) -> jnp.ndarray:
        """Family-dispatched TeaCache probe (reference
        cache/teacache/extractors.py registry). ``t`` in raw scheduler
        units; real families take flow σ like _predict_velocity."""
        b = latents.shape[0]
        if self.family == "generic":
            from vllm_omni_tpu.diffusion.dit import modulated_input

            tt = jnp.full((b,), t, jnp.float32)
            return modulated_input(params, self.config.dit, latents,
                                   tt).astype(jnp.float32)
        sig = t / self.config.num_train_timesteps
        tt = jnp.full((b,), sig, jnp.float32)
        if self.family == "qwen_image":
            from vllm_omni_tpu.diffusion.qwen_image import (
                qwen_image_modulated_input)

            return qwen_image_modulated_input(params, self.family_cfg,
                                              latents, tt)
        if self.family == "flux":
            from vllm_omni_tpu.diffusion.flux import flux_modulated_input

            g = None
            if self.family_cfg.guidance_embeds:
                g = jnp.full((b,), guidance, jnp.float32)
            pl = pooled[:b] if pooled is not None else None
            return flux_modulated_input(params, self.family_cfg,
                                        latents, tt, pooled=pl,
                                        guidance=g)
        if self.family == "wan":
            from vllm_omni_tpu.diffusion.wan import wan_modulated_input

            return wan_modulated_input(params, self.family_cfg, latents,
                                       tt)
        if self.family == "flux2":
            from vllm_omni_tpu.diffusion.flux2 import (
                flux2_modulated_input)

            g = None
            if self.family_cfg.guidance_embeds:
                g = jnp.full((b,), guidance, jnp.float32)
            return flux2_modulated_input(params, self.family_cfg,
                                         latents, tt, guidance=g)
        if self.family == "z_image":
            from vllm_omni_tpu.diffusion.z_image import (
                z_image_modulated_input)

            # transformer convention t = 1 − σ (like z_image_forward)
            return z_image_modulated_input(params, self.family_cfg,
                                           latents, 1.0 - tt)
        if self.family == "stable_audio":
            from vllm_omni_tpu.diffusion.stable_audio import (
                stable_audio_modulated_input)

            return stable_audio_modulated_input(params, self.family_cfg,
                                                latents, tt)
        raise ValueError(
            f"no cache extractor for family {self.family!r}")

    def _cached_step_body(self, params, latents, text_states, t, sigma,
                          sigma_next, guidance, prev_mod, prev_v, accum,
                          skips, prev_dv, gap, force, pooled=None, *,
                          use_cfg: bool):
        """tea_cache / taylor_seer step: lax.cond picks full transformer
        forward vs cached-velocity prediction — decision entirely on
        device. tea_cache reuses the last velocity; taylor_seer
        extrapolates it first-order along the (uniform) step index
        (reference cache-dit/TaylorSeer, cache/cache_dit_backend.py:25)."""
        cc = self.config.cache
        taylor = cc.backend == "taylor_seer"
        mod = self._modulated_input(params, latents, t, guidance,
                                    pooled)
        rel = jnp.mean(jnp.abs(mod - prev_mod)) / (
            jnp.mean(jnp.abs(prev_mod)) + 1e-8)
        rescaled = jnp.polyval(jnp.asarray(cc.coefficients, jnp.float32),
                               rel)
        acc_new = accum + rescaled
        skip = (acc_new < cc.rel_l1_thresh) & jnp.logical_not(force)

        def reuse(_):
            if taylor:
                v = prev_v + prev_dv * (gap + 1).astype(jnp.float32)
            else:
                v = prev_v
            # on skip the anchor velocity/difference stay those of the
            # last full compute; only the gap counter advances
            return v, prev_v, prev_dv, gap + 1

        def full(_):
            v = self._predict_velocity(params, latents, text_states,
                                       t, guidance, use_cfg,
                                       pooled=pooled)
            n = jnp.maximum(gap + 1, 1).astype(jnp.float32)
            # gap == -1 sentinel: no previous anchor → dv stays zero
            dv = jnp.where(gap >= 0, (v - prev_v) / n, 0.0)
            return v, v, dv, jnp.int32(0)

        v_used, v_anchor, dv_out, gap_out = jax.lax.cond(
            skip, reuse, full, None)
        accum_out = jnp.where(skip, acc_new, 0.0)
        new_lat = (latents.astype(jnp.float32) +
                   (sigma_next - sigma) * v_used).astype(latents.dtype)
        return (new_lat, mod, v_anchor, accum_out,
                skips + skip.astype(jnp.int32), dv_out, gap_out)

    def _step_body_ltx2(self, params, latents, audio, text_states, t,
                        sigma, sigma_next, guidance, *, use_cfg: bool):
        """LTX2 joint audio-video Euler step: one transformer forward
        denoises BOTH streams (reference pipeline_ltx2.py — audio and
        video share the flow-match schedule)."""
        from vllm_omni_tpu.diffusion.ltx2 import ltx2_forward

        t = t / self.config.num_train_timesteps  # σ ∈ [0,1], as above
        b, f, h, w, c = latents.shape
        dims = (f, h, w)
        ta = audio.shape[1]

        def fwd(lat5, aud, txt):
            vid = lat5.reshape(lat5.shape[0], f * h * w, c)
            vv, av = ltx2_forward(params, self.family_cfg, vid, aud,
                                  txt, txt,
                                  jnp.full((lat5.shape[0],), t,
                                           jnp.float32),
                                  dims, ta, mesh=self.mesh)
            return vv.reshape(lat5.shape), av

        if use_cfg:
            vv, av = fwd(jnp.concatenate([latents, latents], 0),
                         jnp.concatenate([audio, audio], 0),
                         text_states)
            vv = vv[1:] + guidance * (vv[:1] - vv[1:])
            av = av[1:] + guidance * (av[:1] - av[1:])
        else:
            vv, av = fwd(latents, audio, text_states[:1])
        new_lat = (latents.astype(jnp.float32) +
                   (sigma_next - sigma) * vv.astype(jnp.float32)
                   ).astype(latents.dtype)
        new_aud = (audio.astype(jnp.float32) +
                   (sigma_next - sigma) * av.astype(jnp.float32)
                   ).astype(audio.dtype)
        return new_lat, new_aud

    def _step_body_extras(self, params, latents, text_states, t, sigma,
                          sigma_next, guidance, prior_token_id, *,
                          use_cfg: bool, prior_missing: bool):
        """glm_image step: AR prior-VQ tokens condition the forward;
        the CFG uncond row runs with the prior dropped
        (pipeline_glm_image.py:505-506). Timestep convention :515:
        t_model = σ·1000 − 1."""
        from vllm_omni_tpu.diffusion.glm_image import glm_image_forward

        sig = t / self.config.num_train_timesteps
        t_model = sig * 1000.0 - 1.0

        def fwd(lat, txt, drop):
            tt = jnp.full((lat.shape[0],), t_model, jnp.float32)
            prior = jnp.tile(prior_token_id, (lat.shape[0], 1))
            return glm_image_forward(params, self.family_cfg, lat, txt,
                                     tt, prior_token_id=prior,
                                     prior_token_drop=drop,
                                     mesh=self.mesh)

        if use_cfg:
            lat2 = jnp.concatenate([latents, latents], axis=0)
            drop = jnp.asarray([prior_missing, True])
            v = fwd(lat2, text_states, drop).astype(jnp.float32)
            v_cond, v_uncond = v[:1], v[1:]
            v = v_uncond + guidance * (v_cond - v_uncond)
        else:
            drop = jnp.full((latents.shape[0],), prior_missing)
            v = fwd(latents, text_states[:1], drop).astype(jnp.float32)
        return (latents.astype(jnp.float32) +
                (sigma_next - sigma) * v).astype(latents.dtype)

    def _step_body_hyv_i2v(self, params, latents, text_states, t,
                           sigma, sigma_next, guidance, pooled, cond,
                           image_embeds=None, *, use_cfg: bool):
        """HunyuanVideo15 I2V step: cond_latents = the image's latents
        on frame 0 (zeros after), mask 1.0 on frame 0
        (pipeline_hunyuan_video_1_5_i2v.py prepare_cond_latents_and_
        mask); the transformer consumes the [latent, cond, mask]
        channel concat every step."""
        del pooled
        from vllm_omni_tpu.diffusion.hunyuan_video import (
            hunyuan_video_forward)

        squeeze_f = latents.ndim == 4
        lat5 = latents[:, None] if squeeze_f else latents
        f = lat5.shape[1]
        cond5 = jnp.zeros_like(lat5)
        cond5 = cond5.at[:, 0].set(cond.astype(lat5.dtype))
        mask = jnp.zeros(lat5.shape[:-1] + (1,), lat5.dtype)
        mask = mask.at[:, 0].set(1.0)
        # scheduler t arrives in train units; the family forward takes
        # flow-match σ ∈ [0, 1] (same normalization _predict_velocity
        # applies for real-geometry families)
        sig = t / self.config.num_train_timesteps

        def fwd(lat, txt):
            tt = jnp.full((lat.shape[0],), sig, jnp.float32)
            kw = {}
            if image_embeds is not None:
                ie = jnp.concatenate([image_embeds] * lat.shape[0],
                                     axis=0)
                kw = dict(image_embeds=ie,
                          image_embeds_mask=jnp.ones(
                              ie.shape[:2], bool))
            return hunyuan_video_forward(
                params, self.family_cfg, lat, txt, tt,
                cond_latents=jnp.concatenate([cond5] * lat.shape[0],
                                             axis=0),
                cond_mask=jnp.concatenate([mask] * lat.shape[0],
                                          axis=0),
                mesh=self.mesh, **kw)

        del f
        if use_cfg:
            lat2 = jnp.concatenate([lat5, lat5], axis=0)
            v = fwd(lat2, text_states).astype(jnp.float32)
            v = v[1:] + guidance * (v[:1] - v[1:])
        else:
            v = fwd(lat5, text_states[:1]).astype(jnp.float32)
        new5 = (lat5.astype(jnp.float32) +
                (sigma_next - sigma) * v).astype(lat5.dtype)
        return new5[:, 0] if squeeze_f else new5

    def _step_body_vace(self, params, latents, text_states, t, sigma,
                        sigma_next, guidance, pooled, vace_ctx, *,
                        use_cfg: bool, vace_scale: float):
        """WanVACE step: the per-region context blocks run every step
        on the (fixed) conditioning latents; their hints inject into
        the main blocks (reference pipeline_wan2_2_vace.py forward)."""
        del pooled
        v = self._predict_velocity(params, latents, text_states, t,
                                   guidance, use_cfg,
                                   vace=(vace_ctx, vace_scale))
        return (latents.astype(jnp.float32) +
                (sigma_next - sigma) * v).astype(latents.dtype)

    def _step_body_ref(self, params, latents, text_states, t, sigma,
                       sigma_next, guidance, pooled, ref, *,
                       use_cfg: bool):
        """Kontext/Edit step: the reference image's latents ride the
        joint stream every step (never noised)."""
        v = self._predict_velocity(params, latents, text_states, t,
                                   guidance, use_cfg, pooled=pooled,
                                   ref_latents=ref)
        return (latents.astype(jnp.float32) +
                (sigma_next - sigma) * v).astype(latents.dtype)

    def _wan_i2v_mask(self, latents):
        """[1, F, h, w, 1] float mask: 0 on the first latent frame
        (clean condition), 1 elsewhere."""
        f, h, w = latents.shape[1], latents.shape[2], latents.shape[3]
        m = jnp.ones((1, f, h, w, 1), jnp.float32)
        return m.at[:, 0].set(0.0)

    def _step_body_wan_i2v(self, params, latents, text_states, t, sigma,
                           sigma_next, guidance, pooled, cond, *,
                           use_cfg: bool):
        """WanImageToVideo TI2V step (pipeline_wan2_2_i2v.py
        expand_timesteps): input = (1−mask)·condition + mask·latents,
        per-patch timesteps zero on the first-frame patches; the final
        blend happens at post_decode."""
        del pooled
        from vllm_omni_tpu.diffusion.wan import wan_forward

        squeeze_f = latents.ndim == 4
        lat5 = latents[:, None] if squeeze_f else latents
        cond5 = cond if cond.ndim == 5 else cond[:, None]
        mask = self._wan_i2v_mask(lat5)
        lat_in = ((1.0 - mask) * cond5.astype(jnp.float32) +
                  mask * lat5.astype(jnp.float32)).astype(lat5.dtype)
        sig = t / self.config.num_train_timesteps
        pt, ph, pw = self.family_cfg.patch_size
        ts_patch = mask[0, ::pt, ::ph, ::pw, 0].reshape(1, -1) * sig

        def fwd(lat, txt):
            tt = jnp.broadcast_to(ts_patch, (lat.shape[0],
                                             ts_patch.shape[1]))
            return wan_forward(params, self.family_cfg, lat, txt, tt,
                               mesh=self.mesh)

        if use_cfg:
            lat2 = jnp.concatenate([lat_in, lat_in], axis=0)
            v = fwd(lat2, text_states).astype(jnp.float32)
            v = v[1:] + guidance * (v[:1] - v[1:])
        else:
            v = fwd(lat_in, text_states[:1]).astype(jnp.float32)
        new5 = (lat5.astype(jnp.float32) +
                (sigma_next - sigma) * v).astype(lat5.dtype)
        return new5[:, 0] if squeeze_f else new5

    def _step_body(self, params, latents, text_states, t, sigma,
                   sigma_next, guidance, pooled=None, *, use_cfg: bool):
        # CFG rides as batch rows; the "cfg" mesh axis shards them across
        # ranks (reference CFGParallelMixin cfg_parallel.py:56 — here one
        # sharding annotation inside dit_forward)
        v = self._predict_velocity(params, latents, text_states, t,
                                   guidance, use_cfg, pooled=pooled)
        return (latents.astype(jnp.float32) +
                (sigma_next - sigma) * v).astype(latents.dtype)

    # -- 3/4: scheduler advance is folded into the step (host sigmas) -------

    # -- 4/4: decode ---------------------------------------------------------
    def post_decode(self, state: DenoiseState,
                    output_type: str = "np") -> Any:
        if self._runner is not None:
            out = self._runner.post_decode(state, output_type)
            if getattr(self._runner, "decode_via_vae", False) and \
                    output_type != "latent":
                # runner produced latents — finish through the normal
                # image VAE path below
                state2 = DenoiseState(
                    latents=jnp.asarray(out, self.dtype),
                    text_states=None,
                    sigmas=np.zeros(2, np.float32),
                    timesteps=np.zeros(1, np.float32))
                saved, self._runner = self._runner, None
                try:
                    return self.post_decode(state2, output_type)
                finally:
                    self._runner = saved
            return out
        if state.ref_latents is not None and self.family == "wan":
            # TI2V final blend: the first latent frame IS the encoded
            # reference image (pipeline_wan2_2_i2v.py post-loop blend)
            lat5 = state.latents[:, None] if state.latents.ndim == 4 \
                else state.latents
            cond5 = state.ref_latents if state.ref_latents.ndim == 5 \
                else state.ref_latents[:, None]
            mask = self._wan_i2v_mask(lat5)
            lat5 = ((1.0 - mask) * cond5.astype(jnp.float32) +
                    mask * lat5.astype(jnp.float32)).astype(lat5.dtype)
            state.latents = lat5[:, 0] if state.latents.ndim == 4 \
                else lat5
            state.ref_latents = None  # blend once
        if output_type == "latent":
            return np.asarray(state.latents)
        lat = state.latents
        if lat.ndim == 3:
            # audio-latent family (stable_audio): [B, L, C_lat] float.
            # With the checkpoint's Oobleck VAE loaded, decode to
            # waveform [B, samples, audio_channels]
            # (pipeline_stable_audio.py:571 vae.decode — no scaling
            # factor); config-only checkpoints keep shipping raw
            # latents downstream (dummy/bench tier).
            if self.vae_kind == "oobleck":
                from vllm_omni_tpu.diffusion.vae_oobleck import (
                    oobleck_decode)

                vp = jax.device_put(self._vae_host) \
                    if self._vae_host is not None else self.vae_params
                if not hasattr(self, "_oobleck_fn"):
                    self._oobleck_fn = jax.jit(
                        lambda p, x: oobleck_decode(p, self.vae_cfg, x))
                wav = np.asarray(self._oobleck_fn(vp, lat), np.float32)
                if self._vae_host is not None:
                    del vp
                return wav
            return np.asarray(lat, np.float32)
        squeeze_t = False
        if lat.ndim == 5 and "Layered" in self.pipeline_class and \
                self.family == "qwen_image":
            # QwenImageLayered: frame 0 is the recomposited input —
            # drop it and decode each layer as an independent 1-frame
            # clip (reference pipeline_qwen_image_layered.py:838-842
            # latents[:, :, 1:] → view(-1, c, 1, h, w) → vae.decode)
            lat = lat[:, 1:]
            bl, fl = lat.shape[0], lat.shape[1]
            lat = lat.reshape(bl * fl, 1, *lat.shape[2:])
        if lat.ndim == 5 and self.vae_kind not in ("wan", "ltx2",
                                                   "hyv15"):
            # generic/kl 2D VAEs: frames decode as a batch; the wan,
            # ltx2 and hyv15 VAEs decode the full clip (temporal
            # upsampling is causal 3D)
            b, f, h, w, c = lat.shape
            lat = lat.reshape(b * f, h, w, c)
        elif lat.ndim == 4 and self.vae_kind in ("wan", "ltx2",
                                                 "hyv15"):
            lat, squeeze_t = lat[:, None], True  # image = 1-frame clip
        if self._vae_host is not None:
            vae = jax.device_put(self._vae_host)  # stage in for decode
            images = self._decode_fn()(vae, lat)
            arr = np.asarray(images)
            del vae, images  # free HBM before the next denoise
        else:
            images = self._decode_fn()(self.vae_params, lat)
            arr = np.asarray(images)  # [-1, 1] float
        if squeeze_t:
            arr = arr[:, 0]
        elif arr.ndim == 5:  # decoded video → frame-major like before
            arr = arr.reshape(-1, *arr.shape[2:])
        if output_type == "np":
            return ((arr + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        if output_type == "pil":
            from PIL import Image

            arr = ((arr + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
            return [Image.fromarray(a) for a in arr]
        return arr

    @functools.cache
    def _decode_fn(self):
        mesh, kind, vcfg = self.mesh, self.vae_kind, self.vae_cfg

        def decode(params, latents):
            if mesh is not None:
                # VAE patch parallelism (reference
                # vae_patch_parallel.py:348 _distributed_patch_decode):
                # shard the latent height across the sp/tp ranks — XLA
                # halo-exchanges the conv edges, gather at the end
                from jax.sharding import NamedSharding
                from jax.sharding import PartitionSpec as P

                axes = tuple(a for a in ("ring", "ulysses", "tp")
                             if mesh.shape.get(a, 1) > 1)
                size = 1
                for a in axes:
                    size *= mesh.shape[a]
                h_axis = latents.ndim - 3  # [..., H, W, C]
                if axes and latents.shape[h_axis] % size == 0:
                    spec = [None] * latents.ndim
                    spec[h_axis] = axes
                    latents = jax.lax.with_sharding_constraint(
                        latents, NamedSharding(mesh, P(*spec)))
            if kind == "kl":
                from vllm_omni_tpu.diffusion.vae_kl import kl_decode

                return kl_decode(params, vcfg, latents)
            if kind == "wan":
                from vllm_omni_tpu.diffusion.vae_wan import wan_decode

                return wan_decode(params, vcfg, latents)
            if kind == "hyv15":
                from vllm_omni_tpu.diffusion.vae_hyv15 import (
                    hyv15_vae_decode)

                # decode divides by scaling_factor first
                # (pipeline_hunyuan_video_1_5.py:520)
                lat = (latents.astype(jnp.float32) /
                       vcfg.scaling_factor).astype(latents.dtype)
                return hyv15_vae_decode(params, vcfg, lat)
            if kind == "ltx2":
                from vllm_omni_tpu.diffusion.vae_ltx2 import (
                    denormalize_ltx2_latents, ltx2_vae_decode)

                lat = denormalize_ltx2_latents(latents, params,
                                               vcfg.scaling_factor)
                # decode_timestep 0.0 default (reference
                # pipeline_ltx2.py:772; per-request override rides
                # sampling extra_args — see post_decode)
                return ltx2_vae_decode(params, vcfg, lat)
            return vae_decode(params, latents)

        return jax.jit(decode)

    # -- whole request -------------------------------------------------------
    def run(self, req: DiffusionRequest) -> tuple[Any, DenoiseState]:
        state = self.prepare(req)
        while not state.done:
            self.denoise_step(state)
        two_stage = self._ltx2_upsampler is not None and (
            "TwoStages" in self.pipeline_class or
            (req.params.extra_args or {}).get("two_stage"))
        if two_stage and self.family == "ltx2":
            state = self._ltx2_refine_stage(req, state)
        return self.post_decode(state, req.params.output_type), state

    def _ltx2_refine_stage(self, req: DiffusionRequest,
                           state: DenoiseState) -> DenoiseState:
        """LTX2 two-stage: upsample stage-1 latents ×2 spatially through
        the checkpoint's REAL latent-upsampler model, re-noise at the
        first refinement sigma, and run the short distilled refinement
        schedule at guidance 1.0 (reference LTX2TwoStagesPipeline,
        pipeline_ltx2.py:1258-1304: upsample_pipe → 3-step
        STAGE_2_DISTILLED_SIGMA_VALUES pass). The distilled stage-2
        sigmas ship with the checkpoint card — override via
        extra_args.stage2_sigmas."""
        from vllm_omni_tpu.diffusion.vae_ltx2 import (
            denormalize_ltx2_latents, ltx2_latent_upsample)

        up = self._ltx2_upsampler
        lat = state.latents
        # the upsampler consumes UNnormalized latents
        # (pipeline_ltx2_latent_upsample.py:97); stage 2 re-normalizes
        if self.vae_kind == "ltx2":
            lat = denormalize_ltx2_latents(lat, self.vae_params,
                                           self.vae_cfg.scaling_factor)
        lat = ltx2_latent_upsample(up["params"], up["cfg"], lat)
        if self.vae_kind == "ltx2":
            mean = self.vae_params["latents_mean"].astype(jnp.float32)
            std = self.vae_params["latents_std"].astype(jnp.float32)
            lat = ((lat.astype(jnp.float32) - mean) *
                   self.vae_cfg.scaling_factor / std).astype(lat.dtype)
        sigmas = tuple((req.params.extra_args or {}).get(
            "stage2_sigmas", (0.9094, 0.725, 0.4219)))
        seed = req.params.seed if req.params.seed is not None else 0
        noise = jax.random.normal(jax.random.PRNGKey(seed + 1),
                                  lat.shape, jnp.float32)
        s0 = float(sigmas[0])
        lat = (s0 * noise + (1.0 - s0) *
               lat.astype(jnp.float32)).astype(lat.dtype)
        sig = np.asarray(tuple(sigmas) + (0.0,), np.float32)
        state2 = DenoiseState(
            latents=lat, text_states=state.text_states,
            audio_latents=state.audio_latents,
            sigmas=sig,
            timesteps=sig[:-1] * self.config.num_train_timesteps,
            guidance_scale=1.0, use_cfg=False, pooled=state.pooled)
        while not state2.done:
            self.denoise_step(state2)
        return state2


def _pad_or_trim(x: np.ndarray, t: int) -> np.ndarray:
    if x.shape[1] >= t:
        return x[:, :t]
    pad = np.zeros((x.shape[0], t - x.shape[1], x.shape[2]), x.dtype)
    return np.concatenate([x, pad], axis=1)


def _hash_embed(text: str, t: int, d: int) -> np.ndarray:
    """Deterministic pseudo-embedding of a prompt string (stands in for a
    text encoder so pipelines run standalone; real encoders plug in as an
    upstream stage)."""
    seed = abs(hash(text)) % (2 ** 31)
    rng = np.random.default_rng(seed)
    return rng.standard_normal((t, d), np.float32) * 0.02
