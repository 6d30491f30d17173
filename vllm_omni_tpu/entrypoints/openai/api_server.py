"""OpenAI-compatible HTTP server (aiohttp).

Reference parity: entrypoints/openai/api_server.py (router :122; endpoints
/v1/chat/completions :853, /v1/completions, /v1/images/generations :1277,
/v1/audio/speech :929, /health :1224, /v1/models :1260). The reference
uses FastAPI; this environment ships aiohttp — same endpoints, same wire
format (SSE for streams).
"""

from __future__ import annotations

import asyncio
import base64
import io
import json
from typing import Any, Optional

import numpy as np
from aiohttp import web

from vllm_omni_tpu.entrypoints.async_omni import AsyncOmni, EngineDeadError
from vllm_omni_tpu.entrypoints.openai.protocol import (
    ChatCompletionRequest, CompletionRequest, ImageEditRequest,
    ImageGenerationRequest, SpeechBatchRequest, SpeechRequest,
    make_chat_chunk, make_chat_response)
from vllm_omni_tpu.logger import init_logger
from vllm_omni_tpu.utils import random_uuid

logger = init_logger(__name__)

OMNI_KEY = web.AppKey("omni", AsyncOmni)
NAME_KEY = web.AppKey("model_name", str)


# ---------------------------------------------------------------------------
# Handlers
# ---------------------------------------------------------------------------


async def health(request: web.Request) -> web.Response:
    omni = request.app[OMNI_KEY]
    if not omni.is_alive():
        return web.json_response({"status": "dead"}, status=503)
    return web.json_response({"status": "ok"})


async def metrics(request: web.Request) -> web.Response:
    """Prometheus scrape endpoint aggregating the whole pipeline
    (reference: upstream vLLM Prometheus metrics per stage,
    SURVEY.md §5.5)."""
    from vllm_omni_tpu.metrics.prometheus import (CONTENT_TYPE,
                                                  render_prometheus)

    omni = request.app[OMNI_KEY]
    body = render_prometheus(omni.runner.stats, runner=omni.runner)
    return web.Response(text=body, content_type="text/plain",
                        charset="utf-8",
                        headers={"X-Content-Type": CONTENT_TYPE})


async def list_models(request: web.Request) -> web.Response:
    return web.json_response({
        "object": "list",
        "data": [{"id": request.app[NAME_KEY], "object": "model",
                  "owned_by": "vllm-omni-tpu"}],
    })


def _find_mm_processor(omni: AsyncOmni):
    """The stage-0 engine's MMProcessor when it runs inline (placeholder
    calculus for multimodal chat parts)."""
    for handle in getattr(omni.runner, "handles", {}).values():
        engine = getattr(handle, "engine", None)
        proc = getattr(engine, "mm_processor", None)
        if proc is not None:
            return proc
    return None


def _decode_mm_part(part: dict) -> tuple[str, np.ndarray]:
    """OpenAI chat content part → (modality, array). Supports
    image_url data: URIs and input_audio base64 (f32 mel/wave or wav)."""
    ptype = part.get("type")
    if ptype == "image_url":
        url = (part.get("image_url") or {}).get("url", "")
        if not url.startswith("data:"):
            raise ValueError("only data: image URIs are supported "
                             "(no egress)")
        from PIL import Image

        raw = base64.b64decode(url.split(",", 1)[1])
        return "image", np.asarray(
            Image.open(io.BytesIO(raw)).convert("RGB"), np.uint8)
    if ptype == "input_audio":
        spec = part.get("input_audio") or {}
        raw = base64.b64decode(spec.get("data", ""))
        fmt = spec.get("format", "f32")
        if fmt == "wav":
            pcm = np.frombuffer(raw[44:], "<i2").astype(np.float32)
            return "audio", pcm / 32768.0
        return "audio", np.frombuffer(raw, np.float32).copy()
    raise ValueError(f"unsupported content part {ptype!r}")


def _messages_to_prompt(omni: AsyncOmni, messages: list,
                        tools: Optional[list] = None,
                        tool_choice: Any = None) -> Any:
    """Chat messages → engine prompt. Multimodal parts (image_url data:
    URIs, input_audio) become placeholder-token runs + mm_inputs
    (reference serving_chat multimodal input path). Tools render either
    natively (chat template with tools= support) or as a Hermes-style
    system preamble (entrypoints/openai/tools.py)."""
    from vllm_omni_tpu.entrypoints.openai import tools as tools_mod

    tok = omni.tokenizer
    msgs = []
    mm_parts: list[tuple[str, np.ndarray]] = []
    for m in messages:
        content = m.content
        if isinstance(content, list):
            texts = []
            for p in content:
                if p.get("type") == "text":
                    texts.append(p.get("text", ""))
                else:
                    mm_parts.append(_decode_mm_part(p))
                    texts.append(f"\x00mm{len(mm_parts) - 1}\x00")
            content = " ".join(texts)
        msg: dict[str, Any] = {"role": m.role, "content": content or ""}
        # round-trip earlier tool turns (reference serving_chat.py
        # maybe_serialize_tool_calls)
        if getattr(m, "tool_calls", None):
            msg["tool_calls"] = m.tool_calls
        if getattr(m, "tool_call_id", None):
            msg["tool_call_id"] = m.tool_call_id
        if getattr(m, "name", None):
            msg["name"] = m.name
        msgs.append(msg)
    use_tools = tools_mod.tools_active(tools, tool_choice)
    if tok is not None and getattr(tok, "chat_template", None):
        try:
            prompt = tok.apply_chat_template(
                msgs, tokenize=not mm_parts, add_generation_prompt=True,
                tools=tools if use_tools else None)
        except TypeError:  # template without tools= support
            if use_tools:
                msgs.insert(0, {
                    "role": "system",
                    "content": tools_mod.render_tool_preamble(
                        tools, tool_choice)})
            prompt = tok.apply_chat_template(msgs, tokenize=not mm_parts,
                                             add_generation_prompt=True)
    else:
        if use_tools:
            msgs.insert(0, {
                "role": "system",
                "content": tools_mod.render_tool_preamble(tools,
                                                          tool_choice)})
        parts = []
        for m in msgs:
            body = m["content"]
            if m.get("tool_calls"):
                body += "".join(
                    f"<tool_call>{json.dumps(c.get('function', c))}"
                    f"</tool_call>" for c in m["tool_calls"])
            parts.append(f"<|{m['role']}|>{body}\n")
        prompt = "".join(parts) + "<|assistant|>"
    if not mm_parts:
        return prompt
    proc = _find_mm_processor(omni)
    if proc is None or tok is None:
        raise ValueError("multimodal chat parts need an inline stage-0 "
                         "engine with mm_encoders and a tokenizer")
    # splice placeholder-token runs at the sentinel positions; only the
    # FIRST segment may carry the tokenizer's special tokens (BOS) —
    # encoding mid-prompt segments with them would inject BOS at every
    # mm-part boundary and diverge from apply_chat_template(tokenize)
    def _encode(segment: str, first: bool) -> list[int]:
        try:
            return tok.encode(segment, add_special_tokens=first)
        except TypeError:  # tokenizer without the kwarg
            return tok.encode(segment)

    token_ids: list[int] = []
    mm_inputs: dict[str, list] = {}
    for i, segment in enumerate(prompt.split("\x00")):
        if i % 2 == 0:
            if segment:
                token_ids.extend(_encode(segment, i == 0))
            continue
        modality, arr = mm_parts[int(segment[2:])]
        token_id = (proc.audio_token_id if modality == "audio"
                    else proc.image_token_id)
        if token_id is None:
            raise ValueError(f"stage-0 engine has no "
                             f"{modality}_token_id configured")
        token_ids.extend([token_id] * proc.feature_rows(modality, arr))
        mm_inputs.setdefault(modality, []).append(arr)
    return {"prompt_token_ids": token_ids, "mm_inputs": mm_inputs}


async def chat_completions(request: web.Request) -> web.StreamResponse:
    omni = request.app[OMNI_KEY]
    try:
        req = ChatCompletionRequest(**await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    from vllm_omni_tpu.entrypoints.openai import tools as tools_mod

    use_tools = tools_mod.tools_active(req.tools, req.tool_choice)
    try:
        prompt = _messages_to_prompt(omni, req.messages, tools=req.tools,
                                     tool_choice=req.tool_choice)
        sp = req.to_sampling_params()
    except ValueError as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    rid = random_uuid()
    model = req.model or request.app[NAME_KEY]
    modality = req.modalities[0] if req.modalities else "text"

    if req.stream:
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        sent = 0
        full_text = ""
        try:
            async for out in omni.generate(prompt, sp, request_id=rid,
                                           modality=modality):
                comp = out.outputs[0] if out.outputs else None
                delta = ""
                if comp is not None and omni.tokenizer is not None:
                    full_text = omni.tokenizer.decode(
                        comp.token_ids, skip_special_tokens=True)
                    # with tools active, hold back anything that could
                    # be (part of) a <tool_call> block
                    safe = tools_mod.safe_stream_len(full_text) \
                        if use_tools else len(full_text)
                    if safe > sent:
                        delta, sent = full_text[sent:safe], safe
                extra = _mm_delta(out)
                fin_reason = (comp.finish_reason
                              if out.finished and comp else None)
                if out.finished and use_tools:
                    _, calls = tools_mod.parse_tool_calls(full_text)
                    if calls:
                        fin_reason = "tool_calls"
                        for i, c in enumerate(calls):
                            c["index"] = i
                        extra = dict(extra or {})
                        extra["tool_calls"] = calls
                if delta or extra or out.finished:
                    chunk = make_chat_chunk(
                        rid, model, delta,
                        finish_reason=fin_reason,
                        extra_delta=extra)
                    await resp.write(
                        f"data: {json.dumps(chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
        except EngineDeadError as e:
            await resp.write(f"data: {json.dumps({'error': str(e)})}\n\n"
                             .encode())
        except (ConnectionResetError, asyncio.CancelledError):
            # client disconnected mid-stream: free the engine slot
            await omni.abort(rid)
            raise
        return resp

    final = None
    async for out in omni.generate(prompt, sp, request_id=rid,
                                   modality=modality):
        if out.finished:
            final = out
    comp = final.outputs[0] if final and final.outputs else None
    text = comp.text if comp else ""
    if not text and comp is not None and omni.tokenizer is not None:
        text = omni.tokenizer.decode(comp.token_ids,
                                     skip_special_tokens=True)
    tool_calls = None
    if use_tools and text:
        content, calls = tools_mod.parse_tool_calls(text)
        if calls:
            text, tool_calls = content, calls
    return web.json_response(make_chat_response(
        rid, model, text, comp.finish_reason if comp else None,
        prompt_tokens=len(final.prompt_token_ids) if final else 0,
        completion_tokens=len(comp.token_ids) if comp else 0,
        multimodal=_mm_delta(final) if final else None,
        tool_calls=tool_calls))


def _mm_delta(out) -> Optional[dict]:
    if not out or not out.multimodal_output:
        return None
    mm: dict[str, Any] = {}
    img = out.multimodal_output.get("image")
    if img is not None:
        mm["images"] = [_png_b64(a) for a in np.asarray(img)]
    audio = out.multimodal_output.get("audio")
    if audio is not None:
        data = np.asarray(audio.get("data", audio)).astype(np.float32)
        sr = audio.get("sample_rate", 24000) if isinstance(audio, dict) \
            else 24000
        mm["audio"] = {
            "data": base64.b64encode(data.tobytes()).decode(),
            "dtype": "float32", "sample_rate": sr,
        }
    return mm or None


async def completions(request: web.Request) -> web.Response:
    omni = request.app[OMNI_KEY]
    try:
        req = CompletionRequest(**await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    sp = req.to_sampling_params()
    rid = random_uuid()
    model = req.model or request.app[NAME_KEY]

    if req.stream:
        # SSE per new token batch; token_ids deltas always present so
        # tokenizer-less deployments can still stream (reference
        # serving_completion streaming path)
        resp = web.StreamResponse(headers={
            "Content-Type": "text/event-stream",
            "Cache-Control": "no-cache"})
        await resp.prepare(request)
        sent_toks = 0
        sent_chars = 0
        try:
            async for out in omni.generate(req.prompt, sp,
                                           request_id=rid):
                comp = out.outputs[0] if out.outputs else None
                if comp is None:
                    continue
                new = comp.token_ids[sent_toks:]
                delta = ""
                if omni.tokenizer is not None:
                    text = omni.tokenizer.decode(
                        comp.token_ids, skip_special_tokens=True)
                    delta, sent_chars = text[sent_chars:], len(text)
                if new or out.finished:
                    sent_toks = len(comp.token_ids)
                    chunk = {
                        "id": f"cmpl-{rid}",
                        "object": "text_completion", "model": model,
                        "choices": [{
                            "index": 0, "text": delta,
                            "token_ids": list(new),
                            "finish_reason": comp.finish_reason
                            if out.finished else None}],
                    }
                    await resp.write(
                        f"data: {json.dumps(chunk)}\n\n".encode())
            await resp.write(b"data: [DONE]\n\n")
        except EngineDeadError as e:
            await resp.write(f"data: {json.dumps({'error': str(e)})}\n\n"
                             .encode())
        except (ConnectionResetError, asyncio.CancelledError):
            # client disconnected mid-stream: free the engine slot
            # instead of decoding to a dead socket (reference abort-on-
            # disconnect in the serving handlers)
            await omni.abort(rid)
            raise
        return resp

    async def one(idx: int):
        sp_i = sp
        if req.n > 1 and sp.seed is not None:
            from dataclasses import replace

            sp_i = replace(sp, seed=sp.seed + idx)
        final = None
        async for out in omni.generate(req.prompt, sp_i,
                                       request_id=f"{rid}-{idx}"):
            if out.finished:
                final = out
        comp = final.outputs[0] if final and final.outputs else None
        text = comp.text if comp else ""
        if not text and comp is not None and omni.tokenizer is not None:
            text = omni.tokenizer.decode(comp.token_ids,
                                         skip_special_tokens=True)
        choice = {"index": idx, "text": text,
                  "finish_reason": comp.finish_reason if comp else None,
                  "token_ids": comp.token_ids if comp else []}
        if req.logprobs is not None and comp is not None and \
                comp.logprobs:
            choice["logprobs"] = {
                "token_logprobs": [next(iter(d.values()))
                                   for d in comp.logprobs],
                "tokens": [next(iter(d.keys())) for d in comp.logprobs],
            }
        return choice

    # n>1: concurrent generations through the shared engine's
    # continuous batching (distinct per-choice seeds when seeded;
    # unseeded choices draw fresh admission seeds)
    choices = await asyncio.gather(*(one(i)
                                     for i in range(max(req.n, 1))))
    return web.json_response({
        "id": f"cmpl-{rid}", "object": "text_completion",
        "model": req.model or request.app[NAME_KEY],
        "choices": list(choices),
    })


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


async def image_generations(request: web.Request) -> web.Response:
    omni = request.app[OMNI_KEY]
    try:
        req = ImageGenerationRequest(**await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    dp = req.to_diffusion_params()
    data = []
    for i in range(req.n):
        if req.seed is not None:
            from dataclasses import replace

            dp = replace(dp, seed=req.seed + i)
        final = None
        async for out in omni.generate(req.prompt, dp, modality="image"):
            if out.finished:
                final = out
        if final is None or final.error:
            return web.json_response(
                {"error": {"message": final.error if final else "no "
                           "output"}}, status=500)
        imgs = np.asarray(final.multimodal_output.get("image"))
        for a in imgs:
            data.append({"b64_json": _png_b64(a)}
                        if req.response_format == "b64_json"
                        else {"latent": a.tolist()})
    return web.json_response({"created": 0, "data": data})


async def _synthesize_one(omni: AsyncOmni, text: str,
                          voice_cond: Optional[dict]) -> tuple[
                              np.ndarray, int]:
    """One pipeline pass: text → (waveform f32, sample_rate)."""
    kwargs = {}
    if voice_cond:
        kwargs["additional_information"] = voice_cond
    final = None
    async for out in omni.generate(text, None, modality="audio", **kwargs):
        if out.finished:
            final = out
    audio = final.multimodal_output.get("audio") if final else None
    if audio is None:
        # fall back: hidden states of a generation stage as raw features
        comp = final.outputs[0] if final and final.outputs else None
        if comp is not None and comp.hidden_states is not None:
            audio = {"data": np.asarray(comp.hidden_states).reshape(-1),
                     "sample_rate": 24000}
    if audio is None:
        raise RuntimeError(final.error if final and final.error
                           else "pipeline produced no audio")
    return (np.asarray(audio["data"], np.float32).reshape(-1),
            int(audio.get("sample_rate", 24000)))


async def _synthesize(request: web.Request, text: str, voice: str,
                      speed: float, max_chunk_chars: int,
                      use_cache: bool) -> tuple[np.ndarray, int]:
    """Split → per-chunk synth (LRU-cached) → crossfade concat → speed.

    Reference serving_speech.py flow: text_splitter chunks long inputs so
    synthesis starts on the first sentence; the voice cache resolves
    cloned-voice conditioning once."""
    from vllm_omni_tpu.entrypoints.openai.serving_speech import (
        chunk_cache_key, concat_audio, resample_speed, split_text)

    omni = request.app[OMNI_KEY]
    voices = request.app[VOICES_KEY]
    synth_cache = request.app[SYNTH_KEY]
    ent = voices.get(voice)
    cond = ent.conditioning() if ent is not None else None
    chunks = split_text(text, max_chars=max_chunk_chars) or [""]
    waves: list[np.ndarray] = []
    sr = 24000
    for chunk in chunks:
        key = chunk_cache_key(chunk, voice)
        cached = synth_cache.get(key) if use_cache else None
        if cached is not None:
            wave, sr = cached  # sr rides the cache entry — all-hit
            waves.append(wave)  # requests must not fall back to 24 kHz
            continue
        wave, sr = await _synthesize_one(omni, chunk, cond)
        if use_cache:
            synth_cache.put(key, (wave, sr))
        waves.append(wave)
    return resample_speed(concat_audio(waves, sr), speed), sr


def _speech_response(wave: np.ndarray, sr: int,
                     response_format: str) -> web.Response:
    if response_format == "pcm":
        pcm = (np.clip(wave, -1, 1) * 32767).astype("<i2").tobytes()
        return web.Response(body=pcm, content_type="audio/pcm")
    if response_format == "b64_json":
        return web.json_response({
            "audio": base64.b64encode(
                wave.astype(np.float32).tobytes()).decode(),
            "dtype": "float32", "sample_rate": sr})
    return web.Response(body=_wav_bytes(wave, sr),
                        content_type="audio/wav")


async def image_edits(request: web.Request) -> web.Response:
    """POST /v1/images/edits (reference api_server.py:1405): img2img —
    VAE-encode the input image, truncate the flow-match schedule by
    `strength`, denoise from the partially-noised encoding."""
    omni = request.app[OMNI_KEY]
    try:
        req = ImageEditRequest(**await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    from PIL import Image

    try:
        img = Image.open(io.BytesIO(base64.b64decode(req.image)))
        img = img.convert("RGB")
    except Exception as e:
        return web.json_response(
            {"error": {"message": f"bad image: {e}"}}, status=400)
    if req.size:
        w, h = (int(x) for x in req.size.split("x"))
        img = img.resize((w, h))
    arr = np.asarray(img, np.uint8)
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams

    data = []
    for i in range(req.n):
        dp = DiffusionSamplingParams(
            num_inference_steps=req.steps,
            height=arr.shape[0], width=arr.shape[1],
            guidance_scale=req.guidance_scale,
            seed=None if req.seed is None else req.seed + i,
            negative_prompt=req.negative_prompt, output_type="np",
            extra_args={"init_image": arr, "strength": req.strength})
        final = None
        async for out in omni.generate(req.prompt, dp, modality="image"):
            if out.finished:
                final = out
        if final is None or final.error:
            return web.json_response(
                {"error": {"message": final.error if final
                           else "no output"}}, status=500)
        for a in np.asarray(final.multimodal_output.get("image")):
            data.append({"b64_json": _png_b64(a)}
                        if req.response_format == "b64_json"
                        else {"latent": a.tolist()})
    return web.json_response({"created": 0, "data": data})


async def audio_speech(request: web.Request) -> web.Response:
    """TTS: text → audio pipeline → WAV/PCM bytes (reference
    /v1/audio/speech api_server.py:929 + serving_speech.py)."""
    try:
        req = SpeechRequest(**await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)
    try:
        wave, sr = await _synthesize(request, req.input, req.voice,
                                     req.speed, req.max_chunk_chars,
                                     req.use_cache)
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=500)
    return _speech_response(wave, sr, req.response_format)


async def audio_speech_batch(request: web.Request) -> web.Response:
    """POST /v1/audio/speech/batch (reference api_server.py:977): many
    inputs in one call; synthesis overlaps through the shared engine's
    continuous batching — requests are submitted concurrently."""
    try:
        req = SpeechBatchRequest(**await request.json())
    except Exception as e:
        return web.json_response({"error": {"message": str(e)}}, status=400)

    async def one(text: str):
        return await _synthesize(request, text, req.voice, req.speed,
                                 req.max_chunk_chars, req.use_cache)

    results = await asyncio.gather(*(one(t) for t in req.inputs),
                                   return_exceptions=True)
    data = []
    for r in results:
        if isinstance(r, BaseException):
            data.append({"error": str(r)})
        else:
            wave, sr = r
            data.append({"audio": base64.b64encode(
                wave.astype(np.float32).tobytes()).decode(),
                "dtype": "float32", "sample_rate": sr})
    return web.json_response({"object": "list", "data": data})


def _wav_bytes(samples: np.ndarray, sample_rate: int) -> bytes:
    import struct

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(pcm), b"WAVE", b"fmt ",
        16, 1, 1, sample_rate, sample_rate * 2, 2, 16, b"data", len(pcm))
    return hdr + pcm


async def speech_stream_ws(request: web.Request) -> web.WebSocketResponse:
    """WS /v1/audio/speech/stream (reference api_server.py:1182):
    streaming *input* TTS — the client sends text chunks into a live
    resumable request; token/progress events stream back, final message
    carries the audio (base64 f32 PCM)."""
    omni = request.app[OMNI_KEY]
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    rid = random_uuid()
    state = {"first_chunk": None}

    async def pump():
        try:
            async for out in omni.generate(
                    state["first_chunk"], None, request_id=rid,
                    modality="audio", resumable=True):
                if out.finished:
                    mm = _mm_delta(out) or {}
                    await ws.send_json({"type": "done", **mm})
                else:
                    comp = out.outputs[0] if out.outputs else None
                    await ws.send_json({
                        "type": "progress",
                        "num_tokens": len(comp.token_ids) if comp else 0})
        except Exception as e:
            await ws.send_json({"type": "error", "message": str(e)})

    pump_task = None
    async for msg in ws:
        if msg.type != 1:  # aiohttp.WSMsgType.TEXT
            break
        data = json.loads(msg.data)
        chunk = data.get("token_ids") or data.get("text") or []
        final = bool(data.get("final"))
        if pump_task is None:
            state["first_chunk"] = chunk
            pump_task = asyncio.ensure_future(pump())
            # let pump() run through submit() before accepting chunk 2 —
            # a chunk notify for a not-yet-submitted request would drop
            await asyncio.sleep(0)
            if final:
                await omni.feed_input(rid, [], final=True)
        else:
            await omni.feed_input(rid, chunk, final=final)
        if final:
            break
    if pump_task is not None:
        await pump_task
    await ws.close()
    return ws


# -- voice CRUD (reference /v1/audio/voices api_server.py:1013-1139:
# register/list/delete cloned voices; the voice payload reaches the TTS
# pipeline through additional_information; decoded conditioning is
# LRU-cached so repeat requests skip the b64 decode) -----------------------

from vllm_omni_tpu.entrypoints.openai.serving_speech import (  # noqa: E402
    SynthesisCache, VoiceCache)

VOICES_KEY = web.AppKey("voices", VoiceCache)
SYNTH_KEY = web.AppKey("synth_cache", SynthesisCache)


async def list_voices(request: web.Request) -> web.Response:
    return web.json_response({"voices": request.app[VOICES_KEY].list()})


async def create_voice(request: web.Request) -> web.Response:
    body = await request.json()
    name = body.get("name")
    if not name:
        return web.json_response(
            {"error": {"message": "voice needs a name"}}, status=400)
    request.app[VOICES_KEY].put(
        name, audio_b64=body.get("audio"),
        description=body.get("description", ""),
        sample_rate=body.get("sample_rate", 24000))
    return web.json_response({"name": name, "status": "created"})


async def delete_voice(request: web.Request) -> web.Response:
    name = request.match_info["name"]
    if not request.app[VOICES_KEY].delete(name):
        return web.json_response({"error": {"message": "not found"}},
                                 status=404)
    return web.json_response({"name": name, "status": "deleted"})


async def realtime_ws(request: web.Request) -> web.WebSocketResponse:
    """WS /v1/realtime (reference api_server.py:1203): realtime session.

    Events in:
      session.update                 {"session": {...}}
      input_audio_buffer.append      {"audio": b64}  (f32 PCM mel/wave)
      input_audio_buffer.commit      → becomes an input_audio item
      input_audio_buffer.clear
      conversation.item.create       {"item": {"content": [
          {"type": "input_text", "text": ...}
        | {"type": "input_token_ids", "token_ids": [...]}
        | {"type": "input_audio", "audio": b64}]}}
      response.create                start generating from the last item
      response.cancel                abort the in-flight response
    Events out:
      session.updated, input_audio_buffer.committed,
      conversation.item.created, response.created,
      response.output_text.delta, response.audio.delta (streamed
      mid-generation when the pipeline emits chunked audio),
      response.output_text.done, response.done, response.cancelled,
      error.
    """
    omni = request.app[OMNI_KEY]
    ws = web.WebSocketResponse()
    await ws.prepare(request)
    session: dict[str, Any] = {"modalities": ["text"],
                               "max_output_tokens": 256,
                               "temperature": 0.8}
    items: list[dict[str, Any]] = []  # {prompt, mm_audio}
    audio_buf: list[np.ndarray] = []
    gen_task: Optional[asyncio.Task] = None
    gen_rid: Optional[str] = None

    def _decode_audio(b64: str) -> np.ndarray:
        return np.frombuffer(base64.b64decode(b64), np.float32).copy()

    async def run_response(item: dict[str, Any], rid: str) -> None:
        from vllm_omni_tpu.core.sampling_params import SamplingParams

        sp = SamplingParams(
            max_tokens=int(session.get("max_output_tokens", 256)),
            temperature=float(session.get("temperature", 0.8)))
        modality = (session.get("modalities") or ["text"])[0]
        kwargs: dict[str, Any] = {}
        prompt = item.get("prompt", "")
        if item.get("mm_audio") is not None:
            # splice the placeholder-token run the encoder features
            # will occupy (same calculus as the chat content-part path)
            proc = _find_mm_processor(omni)
            if proc is None or proc.audio_token_id is None:
                await ws.send_json({"type": "error", "error": {
                    "message": "audio input needs a stage-0 engine "
                               "with an audio encoder configured"}})
                return
            rows = proc.feature_rows("audio", item["mm_audio"])
            placeholders = [proc.audio_token_id] * rows
            if isinstance(prompt, list):
                prompt = list(prompt) + placeholders
            elif prompt:
                if omni.tokenizer is None:
                    await ws.send_json({"type": "error", "error": {
                        "message": "text+audio item needs a tokenizer"}})
                    return
                prompt = list(omni.tokenizer.encode(prompt)) + \
                    placeholders
            else:
                prompt = placeholders
            kwargs["mm_inputs"] = {"audio": item["mm_audio"]}
        sent_text = 0
        sent_audio = 0
        text = ""
        comp = None
        try:
            async for out in omni.generate(prompt, sp,
                                           request_id=rid,
                                           modality=modality, **kwargs):
                comp = out.outputs[0] if out.outputs else None
                if comp is not None and omni.tokenizer is not None:
                    text = omni.tokenizer.decode(
                        comp.token_ids, skip_special_tokens=True)
                    if len(text) > sent_text:
                        await ws.send_json({
                            "type": "response.output_text.delta",
                            "delta": text[sent_text:]})
                        sent_text = len(text)
                # chunked audio streams as it lands (async_chunk edges
                # surface partial multimodal_output before finished)
                mm = _mm_delta(out) or {}
                if "audio" in mm:
                    raw = base64.b64decode(mm["audio"]["data"])
                    if len(raw) > sent_audio:
                        await ws.send_json({
                            "type": "response.audio.delta",
                            "data": base64.b64encode(
                                raw[sent_audio:]).decode(),
                            "dtype": "float32",
                            "sample_rate": mm["audio"]["sample_rate"]})
                        sent_audio = len(raw)
                if out.finished:
                    if sent_text:
                        await ws.send_json({
                            "type": "response.output_text.done",
                            "text": text})
                    await ws.send_json({
                        "type": "response.done",
                        "token_ids": comp.token_ids if comp else []})
        except asyncio.CancelledError:
            await omni.abort(rid)
            await ws.send_json({"type": "response.cancelled"})
            raise
        except Exception as e:
            await ws.send_json({"type": "error",
                                "error": {"message": str(e)}})

    async for msg in ws:
        if msg.type != 1:  # TEXT
            break
        try:
            evt = json.loads(msg.data)
        except ValueError:
            await ws.send_json({"type": "error",
                                "error": {"message": "bad json"}})
            continue
        kind = evt.get("type")
        if kind == "session.update":
            session.update(evt.get("session") or {})
            await ws.send_json({"type": "session.updated",
                                "session": session})
        elif kind == "input_audio_buffer.append":
            try:
                audio_buf.append(_decode_audio(evt.get("audio", "")))
            except Exception as e:
                await ws.send_json({"type": "error",
                                    "error": {"message": f"bad audio: "
                                              f"{e}"}})
        elif kind == "input_audio_buffer.clear":
            audio_buf.clear()
        elif kind == "input_audio_buffer.commit":
            audio = (np.concatenate(audio_buf) if audio_buf
                     else np.zeros((0,), np.float32))
            audio_buf.clear()
            items.append({"prompt": [], "mm_audio": audio})
            await ws.send_json({"type": "input_audio_buffer.committed",
                                "num_samples": int(audio.size)})
        elif kind == "conversation.item.create":
            item: dict[str, Any] = {"prompt": "", "mm_audio": None}
            for part in (evt.get("item") or {}).get("content", []):
                ptype = part.get("type")
                if ptype == "input_text":
                    item["prompt"] = part.get("text", "")
                elif ptype == "input_token_ids":
                    item["prompt"] = list(part.get("token_ids") or [])
                elif ptype == "input_audio":
                    try:
                        item["mm_audio"] = _decode_audio(
                            part.get("audio", ""))
                    except Exception as e:
                        await ws.send_json({
                            "type": "error",
                            "error": {"message": f"bad audio: {e}"}})
            items.append(item)
            await ws.send_json({"type": "conversation.item.created",
                                "index": len(items) - 1})
        elif kind == "response.create":
            if gen_task is not None and not gen_task.done():
                await ws.send_json({
                    "type": "error",
                    "error": {"message": "response already in flight"}})
                continue
            item = items[-1] if items else {"prompt": "",
                                            "mm_audio": None}
            gen_rid = random_uuid()
            await ws.send_json({"type": "response.created",
                                "response_id": gen_rid})
            gen_task = asyncio.ensure_future(run_response(item, gen_rid))
        elif kind == "response.cancel":
            if gen_task is not None and not gen_task.done():
                gen_task.cancel()
                try:
                    await gen_task
                except (asyncio.CancelledError, Exception):
                    pass
            else:
                await ws.send_json({"type": "response.cancelled"})
        elif kind == "close":
            break
    if gen_task is not None and not gen_task.done():
        gen_task.cancel()
        try:
            await gen_task
        except (asyncio.CancelledError, Exception):
            pass
    await ws.close()
    return ws


# -- video job API (reference /v1/videos async job store,
# api_server.py:2163-2381 + serving handlers storage.py/stores.py) --------

JOBS_KEY = web.AppKey("video_jobs", dict)


async def create_video_job(request: web.Request) -> web.Response:
    omni = request.app[OMNI_KEY]
    jobs = request.app[JOBS_KEY]
    body = await request.json()
    job_id = f"video-{random_uuid()}"
    jobs[job_id] = {"id": job_id, "status": "queued", "result": None,
                    "error": None}

    async def run():
        jobs[job_id]["status"] = "in_progress"
        try:
            from vllm_omni_tpu.core.sampling_params import \
                DiffusionSamplingParams

            dp = DiffusionSamplingParams(
                num_inference_steps=body.get("steps", 20),
                height=body.get("height", 256),
                width=body.get("width", 256),
                num_frames=body.get("num_frames", 1),
                seed=body.get("seed"), output_type="np")
            final = None
            async for out in omni.generate(body.get("prompt", ""), dp,
                                           modality="video"):
                if out.finished:
                    final = out
            if final is None or final.error:
                raise RuntimeError(final.error if final else "no output")
            img = final.multimodal_output.get(
                "image", final.multimodal_output.get("video"))
            jobs[job_id]["result"] = [_png_b64(a) for a in
                                      np.asarray(img)]
            jobs[job_id]["status"] = "completed"
        except Exception as e:
            jobs[job_id]["status"] = "failed"
            jobs[job_id]["error"] = str(e)

    asyncio.ensure_future(run())
    return web.json_response({"id": job_id, "status": "queued"})


async def get_video_job(request: web.Request) -> web.Response:
    jobs = request.app[JOBS_KEY]
    job = jobs.get(request.match_info["job_id"])
    if job is None:
        return web.json_response({"error": "not found"}, status=404)
    return web.json_response({k: v for k, v in job.items()
                              if k != "result"})


async def get_video_content(request: web.Request) -> web.Response:
    jobs = request.app[JOBS_KEY]
    job = jobs.get(request.match_info["job_id"])
    if job is None or job["status"] != "completed":
        return web.json_response({"error": "not ready"}, status=404)
    return web.json_response({"id": job["id"], "frames": job["result"]})


# -- profiler control (reference profiler_router api_server.py:124) -------

PROF_KEY = web.AppKey("profiler", object)


async def profiler_start(request: web.Request) -> web.Response:
    out = request.app[PROF_KEY].start()
    return web.json_response({"status": "started", "trace_dir": out})


async def profiler_stop(request: web.Request) -> web.Response:
    out = request.app[PROF_KEY].stop()
    return web.json_response({"status": "stopped", "trace_dir": out})


# ---------------------------------------------------------------------------
# App assembly
# ---------------------------------------------------------------------------


def create_app(omni: AsyncOmni, model_name: str = "omni",
               voice_tokenizer: Optional[dict] = None) -> web.Application:
    """voice_tokenizer: AudioTokenizerConfig kwargs — when given,
    cloned-voice reference audio is tokenized once to codec codes
    (12hz-tokenizer role) and rides requests as ref_codes."""
    import asyncio as _a  # noqa: F401  (used by handlers)

    from vllm_omni_tpu.profiler import StageProfiler

    tok = None
    if voice_tokenizer is not None:
        from vllm_omni_tpu.models.audio_tokenizer import \
            get_audio_tokenizer

        tok = get_audio_tokenizer(**voice_tokenizer)
    app = web.Application(client_max_size=64 * 1024 * 1024)
    app[OMNI_KEY] = omni
    app[NAME_KEY] = model_name
    app[JOBS_KEY] = {}
    app[VOICES_KEY] = VoiceCache(tokenizer=tok)
    app[SYNTH_KEY] = SynthesisCache()
    app[PROF_KEY] = StageProfiler()
    app.router.add_get("/health", health)
    app.router.add_get("/metrics", metrics)
    app.router.add_get("/v1/models", list_models)
    app.router.add_post("/v1/chat/completions", chat_completions)
    app.router.add_post("/v1/completions", completions)
    app.router.add_post("/v1/images/generations", image_generations)
    app.router.add_post("/v1/images/edits", image_edits)
    app.router.add_post("/v1/audio/speech", audio_speech)
    app.router.add_post("/v1/audio/speech/batch", audio_speech_batch)
    app.router.add_get("/v1/audio/speech/stream", speech_stream_ws)
    app.router.add_get("/v1/audio/voices", list_voices)
    app.router.add_post("/v1/audio/voices", create_voice)
    app.router.add_delete("/v1/audio/voices/{name}", delete_voice)
    app.router.add_get("/v1/realtime", realtime_ws)
    app.router.add_post("/v1/videos", create_video_job)
    app.router.add_get("/v1/videos/{job_id}", get_video_job)
    app.router.add_get("/v1/videos/{job_id}/content", get_video_content)
    app.router.add_post("/profiler/start", profiler_start)
    app.router.add_post("/profiler/stop", profiler_stop)
    return app


def run_server(model: str, stage_configs: Optional[str] = None,
               host: str = "0.0.0.0", port: int = 8000,
               **engine_args: Any) -> None:
    omni = AsyncOmni(model, stage_configs=stage_configs, **engine_args)
    app = create_app(omni, model_name=model)
    logger.info("serving on %s:%d", host, port)
    web.run_app(app, host=host, port=port, print=None)
