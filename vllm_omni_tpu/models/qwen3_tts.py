"""Qwen3-TTS talker — real checkpoint geometry for the reference's
largest AR family.

Reference: model_executor/models/qwen3_tts/ (7,668 LoC).
The talker is a Qwen3 decoder over CODEC ids (codec_embedding =
embed_tokens, codec_head = lm_head) conditioned per decode step on a
projected text-hidden queue; a small re-prefill code predictor (the
shared common/qwen3_code_predictor.py class — the same structure this
repo already ships for qwen3_omni) expands each sampled layer-0 code
into the remaining ``num_code_groups − 1`` residual codebooks, and the
SUM of all group embeddings plus the step's text hidden becomes the
talker's next input embedding (qwen3_tts_talker.py talker_mtp).

TPU-native serving design:
* the backbone loads through the shared decoder (models/decoder.py,
  Qwen3 layout) and runs under the paged-KV continuous-batching
  engine;
* the per-step loop rides the engine's in-loop step-conditioner
  surface (worker/model_runner.set_step_conditioner): the code
  predictor runs INSIDE the chained decode scan on
  (hidden_{t-1}, token_t), codes stream out per frame, and the text
  queue is a per-request device array indexed by the step counter
  (reference pops tailing_text_hidden one vector per step,
  qwen3_tts_talker.py preprocess :625);
* prompt construction (CustomVoice / VoiceDesign, streaming and
  non-streaming) mirrors _build_prompt_embeds exactly and produces an
  embeddings-as-prompt request plus the tailing queue;
* code2wav is the real 12hz tokenizer decoder
  (models/qwen3_tts_tokenizer.py).

The ECAPA-TDNN speaker encoder (Base voice cloning) is not yet wired;
CustomVoice (named speakers) and VoiceDesign cover the checkpoint's
primary serving modes.
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
from vllm_omni_tpu.models.decoder import DecoderConfig
from vllm_omni_tpu.models.qwen3_omni import CodePredictorConfig

logger = init_logger(__name__)

Params = dict


@dataclass
class Qwen3TTSSpec:
    """Everything beyond the backbone DecoderConfig."""

    cp: CodePredictorConfig
    num_code_groups: int
    text_vocab_size: int
    text_hidden_size: int
    codec_eos_token_id: int
    codec_pad_id: int
    codec_bos_id: int
    codec_nothink_id: int
    codec_think_id: int
    codec_think_bos_id: int
    codec_think_eos_id: int
    tts_pad_token_id: int
    tts_bos_token_id: int
    tts_eos_token_id: int
    codebook_vocab_size: int  # real code ids are [0, this)
    spk_id: dict = field(default_factory=dict)
    codec_language_id: dict = field(default_factory=dict)


def talker_decoder_config(tc: dict[str, Any]) -> DecoderConfig:
    """talker_config → the shared decoder's config (Qwen3 block: qk
    norm, no attention bias by default)."""
    heads = tc.get("num_attention_heads", 16)
    return DecoderConfig(
        vocab_size=tc.get("vocab_size", 4096),
        hidden_size=tc.get("hidden_size", 1024),
        intermediate_size=tc.get("intermediate_size", 3072),
        num_layers=tc.get("num_hidden_layers", 28),
        num_heads=heads,
        num_kv_heads=tc.get("num_key_value_heads", heads),
        head_dim=tc.get("head_dim") or tc.get("hidden_size", 1024)
        // heads,
        rope_theta=tc.get("rope_theta", 1e6),
        rms_norm_eps=tc.get("rms_norm_eps", 1e-6),
        tie_word_embeddings=False,
        qk_norm=True,
        attention_bias=tc.get("attention_bias", False),
    )


def spec_from_config(hf: dict[str, Any]) -> Qwen3TTSSpec:
    tc = hf.get("talker_config") or {}
    cpc = tc.get("code_predictor_config") or {}
    cp = CodePredictorConfig.from_hf(dict(
        cpc, num_code_groups=cpc.get("num_code_groups",
                                     tc.get("num_code_groups", 16))))
    return Qwen3TTSSpec(
        cp=cp,
        num_code_groups=tc.get("num_code_groups", cp.num_code_groups),
        text_vocab_size=tc.get("text_vocab_size", 151936),
        text_hidden_size=tc.get("text_hidden_size",
                                tc.get("hidden_size", 1024)),
        codec_eos_token_id=tc.get("codec_eos_token_id", 4198),
        codec_pad_id=tc.get("codec_pad_id", 4196),
        codec_bos_id=tc.get("codec_bos_id", 4197),
        codec_nothink_id=tc.get("codec_nothink_id", 4200),
        codec_think_id=tc.get("codec_think_id", 4199),
        codec_think_bos_id=tc.get("codec_think_bos_id", 4201),
        codec_think_eos_id=tc.get("codec_think_eos_id", 4202),
        tts_pad_token_id=hf.get("tts_pad_token_id", 151671),
        tts_bos_token_id=hf.get("tts_bos_token_id", 151672),
        tts_eos_token_id=hf.get("tts_eos_token_id", 151673),
        codebook_vocab_size=cpc.get("vocab_size", 4096),
        spk_id={str(k).lower(): v
                for k, v in (tc.get("spk_id") or {}).items()},
        codec_language_id={str(k).lower(): v for k, v in
                           (tc.get("codec_language_id") or {}).items()},
    )


def is_qwen3_tts_config(hf: dict[str, Any]) -> bool:
    return hf.get("model_type") == "qwen3_tts" or (
        "talker_config" in hf and "tts_pad_token_id" in hf)


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def _init_cp_params(cp: CodePredictorConfig, talker_hidden: int,
                    dtype) -> Params:
    """Code-predictor pytree in the qwen3_omni layout
    (code_predictor_generate): stacked per-group embeddings at TALKER
    hidden width [G−1, V, Ht] and stacked heads [G−1, Hcp, V]."""
    g = cp.num_code_groups

    def lin(cin, cout):
        return {"w": jnp.zeros((cin, cout), dtype)}

    h, d = cp.hidden_size, cp.head_dim
    layers = [{
        "input_norm": jnp.ones((h,), dtype),
        "post_norm": jnp.ones((h,), dtype),
        "q_proj": lin(h, cp.num_heads * d),
        "k_proj": lin(h, cp.num_kv_heads * d),
        "v_proj": lin(h, cp.num_kv_heads * d),
        "o_proj": lin(cp.num_heads * d, h),
        "q_norm": jnp.ones((d,), dtype),
        "k_norm": jnp.ones((d,), dtype),
        "gate_proj": lin(h, cp.intermediate_size),
        "up_proj": lin(h, cp.intermediate_size),
        "down_proj": lin(cp.intermediate_size, h),
    } for _ in range(cp.num_layers)]
    p: Params = {
        "layers": layers,
        "final_norm": jnp.ones((h,), dtype),
        "codec_embeddings": jnp.zeros((g - 1, cp.vocab_size,
                                       talker_hidden), dtype),
        "lm_heads": jnp.zeros((g - 1, h, cp.vocab_size), dtype),
    }
    if talker_hidden != h:
        p["proj"] = {"w": jnp.zeros((talker_hidden, h), dtype),
                     "b": jnp.zeros((h,), dtype)}
    return p


_CP_LIN = {"q_proj", "k_proj", "v_proj", "o_proj", "gate_proj",
           "up_proj", "down_proj"}


def _assign_cp(cp_params: Params, parts: list[str], arr, dtype) -> bool:
    """code_predictor.* tensor (names after the prefix)."""
    if parts[0] == "lm_head":
        g = int(parts[1])
        cp_params["lm_heads"] = cp_params["lm_heads"].at[g].set(
            jnp.asarray(np.asarray(arr).T, dtype))
        return True
    if parts[0] == "small_to_mtp_projection":
        if "proj" not in cp_params:
            return False
        if parts[-1] == "weight":
            cp_params["proj"]["w"] = jnp.asarray(np.asarray(arr).T,
                                                 dtype)
        else:
            cp_params["proj"]["b"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] != "model":
        return False
    parts = parts[1:]
    if parts[0] == "codec_embedding":
        g = int(parts[1])
        cp_params["codec_embeddings"] = \
            cp_params["codec_embeddings"].at[g].set(
                jnp.asarray(arr, dtype))
        return True
    if parts[0] == "norm" and parts[-1] == "weight":
        cp_params["final_norm"] = jnp.asarray(arr, dtype)
        return True
    if parts[0] != "layers":
        return False
    lay = cp_params["layers"][int(parts[1])]
    mod, leaf = parts[2], parts[-1]
    if mod == "input_layernorm":
        lay["input_norm"] = jnp.asarray(arr, dtype)
        return True
    if mod == "post_attention_layernorm":
        lay["post_norm"] = jnp.asarray(arr, dtype)
        return True
    if mod in ("self_attn", "mlp"):
        name = parts[3]
        if name in ("q_norm", "k_norm"):
            lay[name] = jnp.asarray(arr, dtype)
            return True
        if name in _CP_LIN:
            slot = lay[name]
            if leaf == "weight":
                slot["w"] = jnp.asarray(np.asarray(arr).T, dtype)
            else:
                slot["b"] = jnp.asarray(arr, dtype)
            return True
    return False


def load_qwen3_tts_checkpoint(path: str, dtype=jnp.float32) -> dict:
    """→ {"backbone": (DecoderConfig, params), "spec", "aux":
    {text_embedding [Vt, Htxt], text_projection {fc1, fc2},
    cp_params}}. Checkpoint naming per the reference hf_to_vllm_mapper
    (qwen3_tts_talker.py:303): talker.model.* backbone,
    talker.codec_head lm_head, talker.model.text_embedding,
    talker.text_projection.linear_fc{1,2}, talker.code_predictor.*;
    speaker_encoder.* is skipped (Base voice cloning not wired)."""
    from safetensors import safe_open

    from vllm_omni_tpu.models.weights import (_assign,
                                              _collect_safetensor_files)

    with open(os.path.join(path, "config.json")) as f:
        hf = json.load(f)
    tc = hf.get("talker_config") or {}
    dec = talker_decoder_config(tc)
    spec = spec_from_config(hf)
    backbone: Params = {"layers": [dict() for _ in
                                   range(dec.num_layers)]}
    cp_params = _init_cp_params(spec.cp, dec.hidden_size, dtype)
    aux: Params = {"cp": cp_params}
    text_proj: Params = {}
    loaded, skipped = 0, []
    for f in _collect_safetensor_files(path):
        with safe_open(f, framework="numpy") as st:
            for name in st.keys():
                arr = st.get_tensor(name)
                if arr.dtype == np.uint16:
                    arr = np.asarray(jnp.asarray(arr).view(
                        jnp.bfloat16), np.float32)
                parts = name.split(".")
                ok = False
                if parts[0] == "talker":
                    sub = parts[1:]
                    if sub[0] == "model" and sub[1] == \
                            "text_embedding":
                        aux["text_embedding"] = jnp.asarray(arr, dtype)
                        ok = True
                    elif sub[0] == "codec_head":
                        ok = _assign(backbone, "lm_head.weight", arr,
                                     dtype, dec)
                    elif sub[0] == "text_projection":
                        slot = text_proj.setdefault(
                            "fc1" if sub[1] == "linear_fc1" else "fc2",
                            {})
                        if sub[-1] == "weight":
                            slot["w"] = jnp.asarray(
                                np.asarray(arr).T, dtype)
                        else:
                            slot["b"] = jnp.asarray(arr, dtype)
                        ok = True
                    elif sub[0] == "code_predictor":
                        ok = _assign_cp(cp_params, sub[1:], arr, dtype)
                    elif sub[0] == "model":
                        # codec_embedding/norm/layers → shared decoder
                        ok = _assign(backbone, ".".join(sub), arr,
                                     dtype, dec)
                elif parts[0] == "speaker_encoder":
                    from vllm_omni_tpu.models.speaker_encoder import (
                        SpeakerEncoderConfig, assign_speaker_tensor,
                        init_speaker_encoder_params)

                    if "speaker_encoder" not in aux:
                        se_cfg = SpeakerEncoderConfig.from_json(
                            hf.get("speaker_encoder_config") or {})
                        aux["speaker_encoder"] = (
                            se_cfg,
                            init_speaker_encoder_params(se_cfg, dtype))
                    ok = assign_speaker_tensor(
                        aux["speaker_encoder"][1], name, arr, dtype)
                if ok:
                    loaded += 1
                else:
                    skipped.append(name)
    if loaded == 0:
        raise ValueError(f"no qwen3_tts tensors mapped from {path}")
    aux["text_projection"] = text_proj
    if skipped:
        logger.warning("qwen3_tts: %d unmapped tensors, e.g. %s",
                       len(skipped), skipped[:6])
    logger.info("qwen3_tts: %d tensors loaded (talker %d layers, "
                "cp %d layers, %d code groups)", loaded,
                dec.num_layers, spec.cp.num_layers,
                spec.num_code_groups)
    return {"backbone": (dec, backbone), "spec": spec, "aux": aux,
            "hf_config": hf}


# ---------------------------------------------------------------------------
# prompt construction (reference _build_prompt_embeds)
# ---------------------------------------------------------------------------


def _text_project(aux: Params, ids: np.ndarray) -> np.ndarray:
    """text_projection(text_embedding(ids)) → [T, H] f32 (ResizeMLP:
    fc1 → silu → fc2, qwen3_tts_talker.py:45)."""
    emb = np.asarray(aux["text_embedding"], np.float32)[ids]
    fc1 = aux["text_projection"]["fc1"]
    fc2 = aux["text_projection"]["fc2"]
    h = emb @ np.asarray(fc1["w"], np.float32)
    if "b" in fc1:
        h = h + np.asarray(fc1["b"], np.float32)
    h = h * (1.0 / (1.0 + np.exp(-h)))  # silu = x·sigmoid(x)
    out = h @ np.asarray(fc2["w"], np.float32)
    if "b" in fc2:
        out = out + np.asarray(fc2["b"], np.float32)
    return out


def build_talker_prompt(spec: Qwen3TTSSpec, backbone: Params,
                        aux: Params, text_ids: list[int],
                        task_type: str = "CustomVoice",
                        speaker: Optional[str] = None,
                        speaker_embed: Optional[np.ndarray] = None,
                        language: str = "auto",
                        non_streaming: bool = True,
                        ref_ids: Optional[list] = None,
                        ref_codes: Optional[np.ndarray] = None) -> dict:
    """→ {"prompt_embeds" [T, H], "tailing_text_hidden" [L, H],
    "tts_pad_embed" [H]} replicating _build_prompt_embeds for
    CustomVoice / VoiceDesign / Base. text_ids = tokenizer ids of
    ``<|im_start|>assistant\\n{text}<|im_end|>\\n<|im_start|>assistant\\n``
    (role header = first 3 ids, template tail = last 5).

    Base in-context voice cloning (reference _generate_icl_prompt
    qwen3_tts_talker.py:1163): pass ``ref_ids`` (tokenized reference
    transcript; rows 3:-2 used) and ``ref_codes`` [T_ref, G] codec
    frames of the reference clip — the combined [ref, target] text
    embeds overlay the reference codec embeds (group 0 from the talker
    codec table, residual groups from the code predictor tables) with
    a codec_bos prefix; streaming mode spills the text overhang into
    the tailing queue."""
    codec_emb = np.asarray(backbone["embed"], np.float32)
    ids = np.asarray(text_ids, np.int64)
    tts3 = _text_project(aux, np.asarray(
        [spec.tts_bos_token_id, spec.tts_eos_token_id,
         spec.tts_pad_token_id]))
    tts_bos, tts_eos, tts_pad = tts3[0], tts3[1], tts3[2]
    lang_id = spec.codec_language_id.get(language.lower()) \
        if language.lower() != "auto" else None
    if lang_id is None:
        prefill = [spec.codec_nothink_id, spec.codec_think_bos_id,
                   spec.codec_think_eos_id]
    else:
        prefill = [spec.codec_think_id, spec.codec_think_bos_id,
                   int(lang_id), spec.codec_think_eos_id]
    codec_rows = [codec_emb[prefill]]
    if task_type == "CustomVoice":
        if not speaker or speaker.lower() not in spec.spk_id:
            raise ValueError(f"unknown speaker {speaker!r} "
                             f"(known: {sorted(spec.spk_id)})")
        codec_rows.append(
            codec_emb[[spec.spk_id[speaker.lower()]]])
    elif task_type == "Base":
        # x-vector voice cloning: the ECAPA embedding of the reference
        # clip rides as one prompt row (reference _build_prompt_embeds
        # Base branch; models/speaker_encoder.py
        # extract_speaker_embedding produces it). With ref_codes +
        # ref_ids the ICL overlay below extends this to full
        # in-context cloning.
        if speaker_embed is None:
            raise ValueError("Base voice cloning needs speaker_embed "
                             "(extract_speaker_embedding of the "
                             "reference clip)")
        codec_rows.append(np.asarray(speaker_embed,
                                     np.float32).reshape(1, -1))
    elif task_type != "VoiceDesign":
        raise ValueError(f"unknown task_type {task_type!r}")
    codec_rows.append(codec_emb[[spec.codec_pad_id,
                                 spec.codec_bos_id]])
    codec_input = np.concatenate(codec_rows, axis=0)  # [C, H]
    role = _text_project(aux, ids[:3])
    c = codec_input.shape[0]
    codec_prefix = np.concatenate(
        [np.tile(tts_pad[None], (c - 2, 1)), tts_bos[None]], axis=0)
    codec_prefix = codec_prefix + codec_input[:-1]
    prompt = np.concatenate([role, codec_prefix], axis=0)
    if task_type == "Base" and ref_codes is not None:
        # in-context cloning (generate_icl_prompt)
        if ref_ids is None:
            raise ValueError("Base ICL needs ref_ids (tokenized "
                             "reference transcript)")
        rid = np.asarray(ref_ids, np.int64)[3:-2]
        text_embed = np.concatenate(
            [_text_project(aux, np.concatenate([rid, ids[3:-5]])),
             tts_eos[None]], axis=0)
        rc = np.asarray(ref_codes, np.int64)  # [T_ref, G]
        cp_tables = np.asarray(aux["cp"]["codec_embeddings"],
                               np.float32)  # [G-1, V, Ht]
        codec_sum = codec_emb[rc[:, 0]]
        for g in range(1, rc.shape[1]):
            codec_sum = codec_sum + cp_tables[g - 1][rc[:, g]]
        codec_sum = np.concatenate(
            [codec_emb[[spec.codec_bos_id]], codec_sum], axis=0)
        t_len, c_len = text_embed.shape[0], codec_sum.shape[0]
        if non_streaming:
            pad_rows = np.tile(codec_emb[spec.codec_pad_id][None],
                               (t_len, 1))
            icl = np.concatenate(
                [text_embed + pad_rows,
                 codec_sum + np.tile(tts_pad[None], (c_len, 1))],
                axis=0)
            tailing = tts_pad[None]
        elif t_len > c_len:
            icl = text_embed[:c_len] + codec_sum
            tailing = text_embed[c_len:]
        else:
            text_embed = np.concatenate(
                [text_embed,
                 np.tile(tts_pad[None], (c_len - t_len, 1))], axis=0)
            icl = text_embed + codec_sum
            tailing = tts_pad[None]
        prompt = np.concatenate([prompt, icl], axis=0)
        return {"prompt_embeds": prompt.astype(np.float32),
                "tailing_text_hidden": tailing.astype(np.float32),
                "tts_pad_embed": tts_pad.astype(np.float32)}
    if non_streaming:
        text_all = np.concatenate(
            [_text_project(aux, ids[3:-5]), tts_eos[None]], axis=0)
        pad_rows = np.tile(codec_emb[spec.codec_pad_id][None],
                           (text_all.shape[0], 1))
        prompt = np.concatenate([
            prompt, text_all + pad_rows,
            (tts_pad + codec_emb[spec.codec_bos_id])[None]], axis=0)
        tailing = tts_pad[None]
    else:
        first_text = _text_project(aux, ids[3:4]) + codec_input[-1:]
        prompt = np.concatenate([prompt, first_text], axis=0)
        tailing = np.concatenate(
            [_text_project(aux, ids[4:-5]), tts_eos[None]], axis=0)
    return {"prompt_embeds": prompt.astype(np.float32),
            "tailing_text_hidden": tailing.astype(np.float32),
            "tts_pad_embed": tts_pad.astype(np.float32)}


# ---------------------------------------------------------------------------
# in-loop step conditioner (reference talker_mtp)
# ---------------------------------------------------------------------------


def tts_cp_generate(cp_params: Params, cp: CodePredictorConfig,
                    hidden_t: jnp.ndarray, layer0_emb_t: jnp.ndarray
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy residual prediction with the optional
    small_to_mtp_projection applied to EVERY buffer insertion
    (reference CodePredictorWrapper.forward:503 — positions 0/1 and
    each sampled residual embed pass through `projection`; the SUMMED
    embeddings for the talker stay at talker width, talker_mtp).
    hidden_t / layer0_emb_t: [B, Ht]. → (codes [B, G−1],
    summed_res [B, Ht])."""
    from vllm_omni_tpu.models.qwen3_omni import _cp_forward

    def proj(x):
        if "proj" not in cp_params:
            return x
        pw = cp_params["proj"]
        return (x @ pw["w"].astype(x.dtype) + pw["b"].astype(x.dtype))

    b = hidden_t.shape[0]
    g_total = cp.num_code_groups
    t_max = g_total + 1
    buf = jnp.zeros((b, t_max, cp.hidden_size), hidden_t.dtype)
    buf = buf.at[:, 0].set(proj(hidden_t))
    buf = buf.at[:, 1].set(proj(layer0_emb_t))
    base_mask = jnp.where(
        jnp.tril(jnp.ones((t_max, t_max), bool)), 0.0, -jnp.inf)
    embeds_s = cp_params["codec_embeddings"]  # [G-1, V, Ht]
    heads_s = cp_params["lm_heads"]           # [G-1, Hcp, V]

    def step(carry, g):
        buf = carry
        valid = jnp.arange(t_max) < (g + 2)
        mask = jnp.where(valid[None, :], base_mask, -jnp.inf)
        hidden = _cp_forward(cp_params, cp, buf, mask)
        last = hidden[:, g + 1]
        w = jax.lax.dynamic_index_in_dim(heads_s, g, keepdims=False)
        logits = jnp.dot(last, w.astype(last.dtype),
                         preferred_element_type=jnp.float32)
        code = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        table = jax.lax.dynamic_index_in_dim(embeds_s, g,
                                             keepdims=False)
        emb_t = jnp.take(table, code, axis=0).astype(hidden_t.dtype)
        buf = buf.at[:, g + 2].set(proj(emb_t))
        return buf, (code, emb_t)

    _, (codes, embs_t) = jax.lax.scan(step, buf,
                                      jnp.arange(g_total - 1))
    return jnp.moveaxis(codes, 0, 1), jnp.sum(embs_t, axis=0)


def make_talker_conditioner(spec: Qwen3TTSSpec, aux: Params):
    """→ (fn, num_groups, aux_builder) for
    ModelRunner.set_step_conditioner. Per step (talker_mtp
    qwen3_tts_talker.py): codes = CP(hidden_{t-1}, codec_embed(tok));
    invalid layer-0 (EOS/pad) zeroes the whole column; next input =
    Σ group embeds + text_step, text_step popped from the per-request
    tailing queue (pad embed once exhausted)."""
    cp_params = aux["cp"]
    cp = spec.cp
    g = spec.num_code_groups
    vocab_ok = spec.codebook_vocab_size

    def aux_builder(reqs, b):
        from vllm_omni_tpu.utils import pick_bucket

        lens = []
        queues = []
        pads = []
        for r in reqs:
            q = np.asarray(r.additional_information.get(
                "tailing_text_hidden",
                np.zeros((1, 1), np.float32)), np.float32)
            queues.append(np.atleast_2d(q))
            lens.append(queues[-1].shape[0])
            pads.append(np.asarray(r.additional_information.get(
                "tts_pad_embed", np.zeros((queues[-1].shape[1],),
                                          np.float32)), np.float32))
        h = max(qq.shape[1] for qq in queues)
        lb = pick_bucket(max(lens), tuple(2 ** i for i in range(15)))
        text_q = np.zeros((b, lb, h), np.float32)
        text_len = np.zeros((b,), np.int32)
        pad_e = np.zeros((b, h), np.float32)
        for i, qq in enumerate(queues):
            text_q[i, :qq.shape[0]] = qq
            text_len[i] = lens[i]
            pad_e[i] = pads[i]
        return {"text_q": text_q, "text_len": text_len,
                "pad": pad_e}

    def fn(caux, tok, emb, ph, ctr):
        b = tok.shape[0]
        rows = jnp.arange(b)
        # reference pops one text vector per decode step: step 1 (ctr
        # == 1 after the prefill sample) reads queue[0]
        idx = jnp.clip(ctr - 1, 0, caux["text_q"].shape[1] - 1)
        text_step = jnp.where(
            ((ctr - 1) < caux["text_len"])[:, None],
            caux["text_q"][rows, idx], caux["pad"])
        residual, summed_res = tts_cp_generate(
            cp_params, cp, ph.astype(emb.dtype), emb)
        valid = ((tok >= 0) & (tok < vocab_ok))[:, None]
        codes = jnp.concatenate(
            [tok[:, None].astype(jnp.int32), residual], axis=1)
        codes = jnp.where(valid, codes, 0)
        # invalid layer-0 → all-zero column; embeds re-looked-up from
        # the ZEROED residual ids (reference talker_mtp order)
        zero_res = cp_params["codec_embeddings"][:, 0].sum(
            axis=0).astype(emb.dtype)  # Σ_g table_g[0]
        res_sum = jnp.where(valid, summed_res.astype(emb.dtype),
                            zero_res[None])
        new_emb = emb + res_sum + text_step.astype(emb.dtype)
        return new_emb, codes

    return fn, g, aux_builder
