"""Model-family registry: pipeline recipes for every reference family.

Reference parity: `model_executor/models/registry.py:7` (`_OMNI_MODELS`,
14 AR families) + `diffusion/registry.py:19` (34 diffusion archs) +
`model_executor/stage_configs/` (37 pipeline YAMLs).

TPU-first design: the reference ships ~112k LoC of per-family torch
modules; here every family is a *composition recipe* over a small set of
structure-parameterized JAX towers —

- AR text/codec towers      → models/decoder.py  (dense/MoE, GQA,
                              qk-norm, M-RoPE, shared-expert — covers
                              the qwen2/qwen3/llama-derived towers every
                              reference family builds on)
- audio/vision encoders     → models/encoders.py
- conv vocoder (code2wav)   → models/vocoder.py
- omni fine structure       → models/qwen3_omni.py (talker MTP code
                              predictor, thinker→talker projections)
- image/video/audio DiT     → diffusion/dit.py, diffusion/qwen_image.py
- VAE                       → diffusion/vae.py

A family = stage graph (stage_configs/*.yaml) + per-edge input
processors (models/stage_input_processors.py) + HF arch flags
(models/weights.py) or diffusers class mapping (diffusion/loader.py).
The registry is the single place that ties those together and is what
`Omni(model=..., family=...)` / stage-config resolution consults.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

_CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "stage_configs")


@dataclass(frozen=True)
class FamilySpec:
    """One reference model family and how this framework realizes it."""

    name: str
    # reference anchor (file under /root/reference cited for parity)
    reference: str
    # pipeline stage kinds in order, e.g. ("llm", "llm", "generation")
    stages: tuple[str, ...]
    # output modality of the final stage
    modality: str
    # stage-config YAML (structure-true tiny/dummy geometry; swap model
    # paths for real checkpoints)
    stage_config: str
    # stage input processors used on the edges (dotted names)
    processors: tuple[str, ...] = ()
    # HF `architectures` entries this family's AR towers load through
    hf_archs: tuple[str, ...] = ()
    # diffusers transformer `_class_name`s (diffusion stages)
    diffusers_archs: tuple[str, ...] = ()
    notes: str = ""


def _cfg(name: str) -> str:
    return os.path.join(_CFG_DIR, name)


_P = "vllm_omni_tpu.models.stage_input_processors"

AR_FAMILIES: dict[str, FamilySpec] = {f.name: f for f in [
    FamilySpec(
        name="qwen3_omni",
        reference="vllm_omni/model_executor/models/qwen3_omni/ (4,011 LoC)",
        stages=("llm", "llm", "generation"),
        modality="audio",
        stage_config=_cfg("qwen3_omni_tpu.yaml"),
        processors=(f"{_P}.thinker2talker", f"{_P}.talker2code2wav"),
        hf_archs=("Qwen3OmniMoeForConditionalGeneration",
                  "Qwen3MoeForCausalLM"),
        notes="MoE thinker + talker with MTP code predictor "
              "(models/qwen3_omni.py) + conv code2wav; audio/vision "
              "encoders with placeholder fusion."),
    FamilySpec(
        name="qwen2_5_omni",
        reference="vllm_omni/model_executor/models/qwen2_5_omni/ "
                  "(4,414 LoC; thinker/talker/token2wav)",
        stages=("llm", "llm", "generation"),
        modality="audio",
        stage_config=_cfg("qwen2_5_omni_tpu.yaml"),
        processors=(f"{_P}.thinker2talker", f"{_P}.talker2code2wav"),
        hf_archs=("Qwen2_5OmniForConditionalGeneration",
                  "Qwen2ForCausalLM"),
        notes="Dense thinker (qwen2 block: attention_bias) — same "
              "3-stage graph as qwen3_omni without MoE/MTP. REAL "
              "token2wav (models/qwen2_5_token2wav.py): codec-"
              "conditioned AdaLN-zero mel DiT (head-0 rope, block-"
              "diagonal attention, RK4 over the sway schedule, "
              "ECAPA reference-mel conditioning) + anti-aliased "
              "SnakeBeta BigVGAN, served as the "
              "hf_config_name=token2wav stage."),
    FamilySpec(
        name="qwen3_tts",
        reference="vllm_omni/model_executor/models/qwen3_tts/ (7,668 LoC "
                  "incl. 12hz tokenizer)",
        stages=("llm", "generation"),
        modality="audio",
        stage_config=_cfg("qwen3_tts_tpu.yaml"),
        processors=(f"{_P}.talker2code2wav",),
        hf_archs=("Qwen3TTSForConditionalGeneration",
                  "Qwen3ForCausalLM"),
        notes="REAL checkpoint capability (models/qwen3_tts.py): "
              "talker backbone + text towers + per-group code "
              "predictor load real talker.* checkpoints; in-loop "
              "talker_mtp conditioning via the decode-scan step "
              "conditioner; CustomVoice/VoiceDesign/Base(x-vector, "
              "ECAPA speaker encoder) prompt builders; REAL 12hz "
              "tokenizer V2 decoder (models/qwen3_tts_tokenizer.py) "
              "as the code2wav stage. ICL voice-clone prompts not yet "
              "wired."),
    FamilySpec(
        name="mimo_audio",
        reference="vllm_omni/model_executor/models/mimo_audio/ (5,564)",
        stages=("llm", "generation"),
        modality="audio",
        stage_config=_cfg("mimo_audio_tpu.yaml"),
        processors=(f"{_P}.llm2code2wav",),
        hf_archs=("Qwen2ForCausalLM",),
        notes="Grouped dual-AR with REAL checkpoint capability "
              "(models/mimo_audio.py): Qwen2 global backbone over "
              "group_size x audio_channels RVQ patches, non-causal "
              "input local transformer encodes code groups into "
              "prompt embeddings, causal delay-pattern local decode "
              "expands sampled <|empty|> patches at finish."),
    FamilySpec(
        name="cosyvoice3",
        reference="vllm_omni/model_executor/models/cosyvoice3/ (3,429) "
                  "+ diffusion/models/cosyvoice3_audio (448)",
        stages=("llm", "diffusion", "generation"),
        modality="audio",
        stage_config=_cfg("cosyvoice3_tpu.yaml"),
        processors=(f"{_P}.text2flow", f"{_P}.flow2vocoder"),
        hf_archs=("Qwen2ForCausalLM",),
        diffusers_archs=("CosyVoice3AudioDiT",),
        notes="Talker → conditional flow-matching mel decoder (audio "
              "DiT, text2flow packs hidden states as conditioning) → "
              "vocoder (flow2vocoder feeds mel latents as the "
              "embeddings prompt)."),
    FamilySpec(
        name="voxtral_tts",
        reference="vllm_omni/model_executor/models/voxtral_tts/ (2,967)",
        stages=("llm", "generation"),
        modality="audio",
        stage_config=_cfg("voxtral_tts_tpu.yaml"),
        processors=(f"{_P}.generator2tokenizer",),
        hf_archs=("LlamaForCausalLM",),
        notes="REAL geometry (models/voxtral_tts.py): Mistral backbone "
              "with the semantic-code lm_head, in-loop flow-matching "
              "acoustic head (step conditioner streams [sem, ac×N] "
              "frames), multivocab embed feedback, causal ALiBi codec "
              "decoder as the audio_tokenizer stage "
              "(hf_config_name=audio_tokenizer)."),
    FamilySpec(
        name="fish_speech",
        reference="vllm_omni/model_executor/models/fish_speech/ (2,248)",
        stages=("llm", "generation"),
        modality="audio",
        stage_config=_cfg("fish_speech_tpu.yaml"),
        processors=(f"{_P}.slow_ar2dac",),
        hf_archs=("FishSpeechSlowARForConditionalGeneration",),
        notes="REAL dual-AR: slow AR = shared decoder with GPT-J "
              "interleaved rope + semantic logit mask; fast AR = "
              "re-prefill residual-codebook predictor, vectorized at "
              "finish (models/fish_speech.py, torch-oracle parity). "
              "DAC waveform decoder stays role-level "
              "(vocoder.code2wav_postprocess)."),
    FamilySpec(
        name="voxcpm",
        reference="vllm_omni/model_executor/models/voxcpm/ (1,372)",
        stages=("llm", "generation"),
        modality="audio",
        stage_config=_cfg("voxcpm_tpu.yaml"),
        processors=(f"{_P}.latent2vae",),
        hf_archs=("LlamaForCausalLM",),
        notes="REAL geometry (diffusion/voxcpm.py): MiniCPM mup tower "
              "+ residual LM + FSQ bottleneck + local-CFM patch DiT "
              "+ DAC-style audio-VAE decode; stop-head termination, "
              "voice-clone prompt latents via extra_args."),
    FamilySpec(
        name="voxcpm2",
        reference="vllm_omni/model_executor/models/voxcpm2/ (1,899)",
        stages=("llm", "generation"),
        modality="audio",
        stage_config=_cfg("voxcpm2_tpu.yaml"),
        processors=(f"{_P}.latent2vae",),
        hf_archs=("Qwen3ForCausalLM",),
        notes="REAL geometry (diffusion/voxcpm.py variant=v2): "
              "MiniCPM4 tower (fp32 LongRoPE), fusion_concat_proj "
              "residual input, concat DiT projections, sway t-span + "
              "CFG-zero-star solver."),
    FamilySpec(
        name="omnivoice",
        reference="vllm_omni/model_executor/models/omnivoice/ (1,670)",
        stages=("diffusion",),
        modality="audio",
        stage_config=_cfg("omnivoice_tpu.yaml"),
        diffusers_archs=("OmniVoiceDiT",),
        notes="Single audio-DiT stage (1D latent over the dit.py MMDiT "
              "with frames=1)."),
    FamilySpec(
        name="dynin_omni",
        reference="vllm_omni/model_executor/models/dynin_omni/ (4,048)",
        stages=("llm", "llm", "llm"),
        modality="audio",
        stage_config=_cfg("dynin_omni_tpu.yaml"),
        processors=(f"{_P}.token_chain", f"{_P}.token_chain"),
        hf_archs=("Qwen3ForCausalLM",),
        notes="REAL geometry (models/dynin_omni.py): bidirectional "
              "masked-discrete-diffusion unified LM over a joint "
              "text+image+audio vocab — LLaDA-style block remasking "
              "(mmu), Fast-dLLM threshold parallel decode "
              "(mmu_fastdllm_v1), MaskGIT cosine decode (t2i/t2s), "
              "task-routed per the reference's generate-fn map. "
              "token2image/token2audio detok are VQ/codec roles "
              "(external magvitv2 in the reference too)."),
    FamilySpec(
        name="bagel",
        reference="vllm_omni/model_executor/models/bagel/ (1,110) + "
                  "diffusion/models/bagel (3,748)",
        stages=("llm", "diffusion"),
        modality="image",
        stage_config=_cfg("bagel_tpu.yaml"),
        hf_archs=("Qwen2ForCausalLM",),
        diffusers_archs=("BagelTransformer2DModel",),
        notes="REAL geometry (diffusion/bagel.py): unified Qwen2 MoT "
              "checkpoint — und/gen dual experts per layer, in-stream "
              "flow denoise against cached text KV, norm-renormalized "
              "text CFG. Thinking/und chat tier rides the AR stage."),
    FamilySpec(
        name="glm_image",
        reference="vllm_omni/model_executor/models/glm_image/ (3,083) + "
                  "diffusion side (2,108)",
        stages=("llm", "diffusion"),
        modality="image",
        stage_config=_cfg("glm_image_tpu.yaml"),
        processors=(f"{_P}.ar2diffusion",),
        hf_archs=("Glm4ForCausalLM", "GlmImageForConditionalGeneration"),
        diffusers_archs=("GlmImageTransformer2DModel",),
        notes="AR stage plans the image; ar2diffusion packs its tokens "
              "+ hidden states into DiT conditioning. REAL AR backbone: "
              "GLM-4 (sandwich norms, partial glm4 rotary) loads via "
              "the shared decoder with HF golden-logit parity."),
    FamilySpec(
        name="mammoth_moda2",
        reference="vllm_omni/model_executor/models/mammoth_moda2/ (858) "
                  "+ diffusion side (1,496)",
        stages=("llm", "diffusion"),
        modality="image",
        stage_config=_cfg("mammoth_moda2_tpu.yaml"),
        processors=(f"{_P}.ar2diffusion",),
        hf_archs=("Qwen2ForCausalLM",),
        diffusers_archs=("MammothModa2Transformer2DModel",),
        notes="ar2dit edge (reference mammoth_moda2.ar2dit) is the "
              "shared ar2diffusion processor here."),
    FamilySpec(
        name="hunyuan_image3",
        reference="vllm_omni/model_executor/models/hunyuan_image3/ "
                  "(3,382 AR) + diffusion MoE DiT (6,310)",
        stages=("llm", "diffusion"),
        modality="image",
        stage_config=_cfg("hunyuan_image3_tpu.yaml"),
        processors=(f"{_P}.ar2diffusion",),
        hf_archs=("HunYuanMoEV1ForCausalLM",),
        diffusers_archs=("HunyuanImage3Transformer2DModel",),
        notes="t2i graph of the reference's t2t/t2i/i2t/it2i variants. "
              "REAL AR backbone: HunYuanMoEV1 (per-head qk norms, "
              "renormed softmax top-k, shared MLP) loads via the "
              "shared decoder with HF golden-logit parity. REAL "
              "unified t2i transformer: diffusion/hunyuan_image3.py "
              "(UNet patch embed, centered 2D rope, text-KV-cached "
              "denoise loop) with torch-oracle parity; REAL "
              "AutoencoderKLConv3D decoder (diffusion/vae_hi3.py — "
              "DC-AE shortcut upsamplers, GN32 resblocks, mid "
              "attention) with torch-oracle parity."),
]}


DIFFUSION_FAMILIES: dict[str, FamilySpec] = {f.name: f for f in [
    FamilySpec(
        name="qwen_image",
        reference="vllm_omni/diffusion/models/qwen_image/ (5,914; "
                  "pipeline_qwen_image.py:247)",
        stages=("diffusion",),
        modality="image",
        stage_config=_cfg("qwen_image_tpu.yaml"),
        diffusers_archs=("QwenImageTransformer2DModel",),
        notes="Real transformer geometry + diffusers-format checkpoint "
              "loader (diffusion/qwen_image.py, diffusion/loader.py); "
              "the Qwen2.5-VL text tower loads in-process from the "
              "checkpoint's text_encoder/ (prompt_encoder.py)."),
    FamilySpec(
        name="flux",
        reference="vllm_omni/diffusion/models/flux/ (2,359; "
                  "flux_transformer.py:479)",
        stages=("diffusion",),
        modality="image",
        stage_config=_cfg("flux_tpu.yaml"),
        diffusers_archs=("FluxTransformer2DModel",),
        notes="Real geometry: 19 double + 38 single stream blocks, "
              "guidance embed, torch-oracle parity "
              "(diffusion/flux.py, tests/diffusion/test_flux_loader.py)."),
    FamilySpec(
        name="wan2_2",
        reference="vllm_omni/diffusion/models/wan2_2/ (4,656; T2V)",
        stages=("diffusion",),
        modality="video",
        stage_config=_cfg("wan2_2_tpu.yaml"),
        diffusers_archs=("WanTransformer3DModel",),
        notes="Real geometry: self+cross attention blocks, per-block "
              "scale_shift_table, 3D rope, Conv3d patch embed, torch-"
              "oracle parity (diffusion/wan.py); frame-batched VAE "
              "decode + RIFE-role interpolation "
              "(diffusion/postprocess.py)."),
    FamilySpec(
        name="magi_human",
        reference="vllm_omni/diffusion/models/magi_human/ (3,907)",
        stages=("diffusion",),
        modality="video",
        stage_config=_cfg("wan2_2_tpu.yaml"),
        notes="REAL geometry (diffusion/magi_human.py): unified "
              "video+audio+text single-stream DiT — per-modality "
              "expert norms/linears on mm_layers (static segment "
              "slicing, no dispatch gathers), Fourier coords rope, "
              "sigmoid head gating, swiglu7/gelu7, frame-local "
              "attention mask, timestep-free denoiser, 2-branch text "
              "CFG with the t≤500 guidance drop and i2v first-frame "
              "clamp. T5Gemma/whisper/audio-VAE frontends are "
              "stage-gated (hash fallback in the dummy tier)."),
    FamilySpec(
        name="dreamid_omni",
        reference="vllm_omni/diffusion/models/dreamid_omni/ (1,342)",
        stages=("diffusion",),
        modality="video",
        stage_config=_cfg("wan2_2_tpu.yaml"),
        notes="REAL geometry (diffusion/dreamid.py): two native-Wan "
              "towers in lockstep with fused cross-modal attention "
              "(rope-aligned temporal subspace, audio positions "
              "scaled by temporal_rope_scaling_factor), trailing "
              "identity-reference latents re-injected per step, "
              "4-branch 3-term CFG. Audio emitted as MMAudio "
              "latents (external VAE decode is out-of-repo in the "
              "reference too)."),
]}

# diffusers `_class_name` → (family tag, structural notes). Every image
# arch maps onto the joint-stream MMDiT parameterization (dit.py /
# qwen_image.py); video archs onto the 3D-rope variant; audio archs onto
# frames=1 1D latents. Reference: diffusion/registry.py:19 (34 archs).
DIFFUSERS_ARCH_MAP: dict[str, str] = {
    "QwenImageTransformer2DModel": "qwen_image",
    "FluxTransformer2DModel": "flux",
    "Flux2Transformer2DModel": "flux2",
    "SD3Transformer2DModel": "sd3",
    "OmniGen2Transformer2DModel": "omnigen2",
    "ZImageTransformer2DModel": "z_image",
    "LongCatImageTransformer2DModel": "longcat_image",
    "NextStepTransformer2DModel": "nextstep",
    "OvisImageTransformer2DModel": "ovis_image",
    "HeliosTransformer3DModel": "helios",
    "DreamIdOmniTransformer2DModel": "mmdit_image",
    "WanTransformer3DModel": "wan",
    # HunyuanVideo 1.0: NOT a reference-parity family — the reference
    # registry ships only the 1.5 archs (diffusion/registry.py:166-174
    # HunyuanVideo15Pipeline / ...I2VPipeline). Kept as a generic-tier
    # courtesy mapping beyond parity.
    "HunyuanVideoTransformer3DModel": "mmdit_video",
    "HunyuanVideo15Transformer3DModel": "hunyuan_video",
    "LTX2VideoTransformer3DModel": "ltx2",
    "MagiHumanTransformer3DModel": "mmdit_video",
    "StableAudioDiTModel": "stable_audio",
    "CosyVoice3AudioDiT": "cosyvoice3_audio",
    # masked-token TTS generator (Qwen3 backbone, non-AR unmasking)
    "OmniVoiceGenerator": "omnivoice",
    # Lumina2 layout shared with omnigen2 (timestep_scale 1.0)
    "MammothModa2Transformer2DModel": "mammoth_moda2",
    # CogView-lineage joint DiT conditioned on AR prior-VQ tokens
    "GlmImageTransformer2DModel": "glm_image",
}

# pipeline-level `_class_name` VARIANTS served on the same transformer
# family via reference-image conditioning (extra_args.ref_image /
# edit_image → Kontext frame-1 / Edit frame-−1 rope ids) or init_image
# img2img (reference diffusion/registry.py:26-120 variant archs)
DIFFUSERS_PIPELINE_VARIANTS: dict[str, str] = {
    "FluxKontextPipeline": "flux",
    "QwenImageEditPipeline": "qwen_image",
    "QwenImageEditPlusPipeline": "qwen_image",
    # layered output = repeated edit-conditioned passes over the same
    # transformer (reference pipeline_qwen_image_layered.py)
    "QwenImageLayeredPipeline": "qwen_image",
    "QwenImageImg2ImgPipeline": "qwen_image",
    "FluxImg2ImgPipeline": "flux",
    "Flux2KleinPipeline": "flux2",
    "LongCatImageEditPipeline": "longcat_image",
    "WanImageToVideoPipeline": "wan",
    "Wan22Pipeline": "wan",
    "Wan22I2VPipeline": "wan",
    # VACE: REAL per-region context blocks (vace_patch_embedding +
    # vace_blocks hint towers, wan2_2_vace_transformer.py:66) — V2V /
    # MV2V conditioning via extra_args source_video/mask, or a
    # precomputed latent-space vace_context (diffusion/pipeline.py
    # _step_body_vace)
    "WanVACEPipeline": "wan",
    "Wan22VACEPipeline": "wan",
    "HunyuanVideo15ImageToVideoPipeline": "hunyuan_video",
    "HunyuanVideo15I2VPipeline": "hunyuan_video",
    "LTX2ImageToVideoPipeline": "ltx2",
    # two-stage LTX2 = base denoise + upsampler pass on the same
    # transformer family (second stage = refinement schedule)
    "LTX2TwoStagesPipeline": "ltx2",
    "LTX2ImageToVideoTwoStagesPipeline": "ltx2",
    # pyramid multi-resolution schedule over the helios transformer
    "HeliosPyramidPipeline": "helios",
}


def list_families() -> list[str]:
    return sorted({**AR_FAMILIES, **DIFFUSION_FAMILIES})


def get_family(name: str) -> FamilySpec:
    fam = AR_FAMILIES.get(name) or DIFFUSION_FAMILIES.get(name)
    if fam is None:
        raise ValueError(
            f"unknown family {name!r}; known: {list_families()}")
    return fam


def resolve_stage_config(name: str) -> str:
    """Family name → stage-config YAML path (raises if the YAML is
    missing — a registry entry must always ship its pipeline)."""
    fam = get_family(name)
    if not os.path.isfile(fam.stage_config):
        raise FileNotFoundError(fam.stage_config)
    return fam.stage_config
