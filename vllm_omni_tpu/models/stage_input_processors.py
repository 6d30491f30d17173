"""Stage input processors: glue stage N outputs into stage N+1 prompts.

Reference parity: model_executor/stage_input_processors/*.py (17 files) —
e.g. `thinker2talker` (qwen3_omni.py:174-238) packs thinker hidden states
+ tts text embeds into `additional_information` for the talker prompt.

Signature: fn(prev_outputs: dict[stage_id, RequestOutput], stage_cfg,
ctx) -> add_request payload kwargs.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from vllm_omni_tpu.config.stage_config import StageConfig
from vllm_omni_tpu.core.outputs import RequestOutput


def thinker2talker(prev_outputs: dict[int, RequestOutput],
                   stage: StageConfig, ctx: dict[str, Any]
                   ) -> dict[str, Any]:
    """Thinker → talker: the talker's prompt is the thinker's per-token
    hidden states (embeddings prompt); the thinker's sampled text ids
    ride along in additional_information for the talker's text
    conditioning (reference qwen3_omni.py:174 packs thinker hidden +
    embeds into additional_information)."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    if comp.hidden_states is None:
        raise ValueError("thinker2talker needs thinker hidden states")
    return {
        "prompt_token_ids": [],
        "prompt_embeds": np.asarray(comp.hidden_states, np.float32),
        "additional_information": {
            "thinker_token_ids": list(comp.token_ids),
            **{k: v for k, v in prev.additional_information.items()
               if k != "hidden_states"},
        },
    }


def talker2code2wav(prev_outputs: dict[int, RequestOutput],
                    stage: StageConfig, ctx: dict[str, Any]
                    ) -> dict[str, Any]:
    """Talker → code2wav: codec token ids become the vocoder stage's
    prompt (non-chunked fallback path; async_chunk edges stream instead —
    orchestrator._forward_chunks)."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    payload: dict[str, Any] = {"prompt_token_ids": list(comp.token_ids)}
    codes = prev.additional_information.get("codec_codes")
    if codes is not None:
        # full RVQ code matrix from the talker's MTP code predictor
        payload["additional_information"] = {"codec_codes": codes}
    return payload

def llm2code2wav(prev_outputs: dict[int, RequestOutput],
                 stage: StageConfig, ctx: dict[str, Any]
                 ) -> dict[str, Any]:
    """Fused thinker/talker → code2wav (reference
    mimo_audio.llm2code2wav): the AR stage emits interleaved text +
    codec ids; only ids inside the codec codebook feed the vocoder.
    The codec range is the consumer stage's vocab (its hf_overrides
    vocab_size), optionally offset by `codec_offset` in
    additional_information."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    vocab = int(stage.engine_args.get("hf_overrides", {})
                .get("vocab_size", 1 << 30))
    off = int(prev.additional_information.get("codec_offset", 0))
    codec = [t - off for t in comp.token_ids if 0 <= t - off < vocab]
    return {"prompt_token_ids": codec or [0]}


def text2flow(prev_outputs: dict[int, RequestOutput],
              stage: StageConfig, ctx: dict[str, Any]) -> dict[str, Any]:
    """Talker → flow decoder (reference cosyvoice3.text2flow): the
    talker's hidden states become the flow-matching mel decoder's
    utterance conditioning (the DiT's text_states stream); codec ids
    ride along for reference."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    info: dict[str, Any] = {"codec_token_ids": list(comp.token_ids)}
    if comp.hidden_states is not None:
        info["text_states"] = np.asarray(comp.hidden_states, np.float32)
    if stage.stage_type == "diffusion":
        return {"prompt": "", "additional_information": info}
    # legacy 2-stage graph: flow folded into a generation stage
    return {"prompt_token_ids": list(comp.token_ids),
            "additional_information": info}


def flow2vocoder(prev_outputs: dict[int, RequestOutput],
                 stage: StageConfig, ctx: dict[str, Any]
                 ) -> dict[str, Any]:
    """Flow decoder → vocoder (reference cosyvoice3 3-stage graph):
    the flow stage's mel latents ([1, h, w, C], output_type=latent)
    become the vocoder generation stage's embeddings prompt — one mel
    frame per spatial position, padded/trimmed to the consumer tower's
    hidden width."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    mm = prev.multimodal_output or {}
    # output_type=latent rides the images slot of DiffusionOutput
    lat = mm.get("latent", mm.get("image"))
    if lat is None:
        raise ValueError("flow2vocoder needs the flow stage's latents "
                         "(set output_type: latent)")
    arr = np.asarray(lat, np.float32)
    mel = arr.reshape(-1, arr.shape[-1])  # [frames, mel_dims]
    width = (stage.engine_args.get("hf_overrides") or {}).get(
        "hidden_size", mel.shape[-1])
    if mel.shape[-1] < width:
        mel = np.pad(mel, ((0, 0), (0, width - mel.shape[-1])))
    elif mel.shape[-1] > width:
        mel = mel[:, :width]
    return {"prompt_token_ids": [], "prompt_embeds": mel}


def generator2tokenizer(prev_outputs: dict[int, RequestOutput],
                        stage: StageConfig, ctx: dict[str, Any]
                        ) -> dict[str, Any]:
    """audio_generation → audio_tokenizer (reference
    voxtral_tts.generator2tokenizer; the async-chunk variant streams
    the same ids through orchestrator._forward_chunks)."""
    src = stage.engine_input_source[0]
    comp = prev_outputs[src].outputs[0]
    return {"prompt_token_ids": list(comp.token_ids) or [0]}


def slow_ar2dac(prev_outputs: dict[int, RequestOutput],
                stage: StageConfig, ctx: dict[str, Any]) -> dict[str, Any]:
    """Slow-AR semantic tokens → DAC decoder (reference
    fish_speech.slow_ar_to_dac_decoder)."""
    src = stage.engine_input_source[0]
    comp = prev_outputs[src].outputs[0]
    return {"prompt_token_ids": list(comp.token_ids) or [0]}


def latent2vae(prev_outputs: dict[int, RequestOutput],
               stage: StageConfig, ctx: dict[str, Any]) -> dict[str, Any]:
    """Latent-generator AR → one-shot VAE decode stage (reference
    voxcpm.latent2vae): the AR stage's hidden states ARE the latent —
    they become the embeddings prompt of the generation stage."""
    src = stage.engine_input_source[0]
    comp = prev_outputs[src].outputs[0]
    if comp.hidden_states is None:
        raise ValueError("latent2vae needs hidden states "
                         "(set return_hidden_states on the AR stage)")
    return {
        "prompt_token_ids": [],
        "prompt_embeds": np.asarray(comp.hidden_states, np.float32),
    }


def token_chain(prev_outputs: dict[int, RequestOutput],
                stage: StageConfig, ctx: dict[str, Any]) -> dict[str, Any]:
    """Generic AR→AR edge (reference dynin_omni
    token2text_to_token2image / token2image_to_token2audio): sampled
    ids become the next stage's prompt; hidden states ride along."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    payload: dict[str, Any] = {"prompt_token_ids": list(comp.token_ids)
                               or [0]}
    if comp.hidden_states is not None:
        payload["additional_information"] = {
            "source_hidden": np.asarray(comp.hidden_states, np.float32)}
    return payload


def ar2diffusion(prev_outputs: dict[int, RequestOutput],
                 stage: StageConfig, ctx: dict[str, Any]) -> dict[str, Any]:
    """AR planner → DiT (reference glm_image.ar2diffusion /
    mammoth_moda2.ar2dit): the AR stage's hidden states become the
    DiT's text conditioning (text_states); its decoded text (token ids
    as fallback) becomes the logged prompt."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    if comp.hidden_states is None:
        raise ValueError("ar2diffusion needs hidden states "
                         "(set return_hidden_states on the AR stage)")
    return {
        "prompt": comp.text or " ".join(map(str, comp.token_ids)),
        "additional_information": {
            "text_states": np.asarray(comp.hidden_states, np.float32)},
    }
