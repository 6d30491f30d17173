"""OpenAI-compatible server tests over the aiohttp test client (tiny
dummy model; mirrors reference tests/entrypoints/openai_api/)."""

import base64
import json

import numpy as np
import pytest

from vllm_omni_tpu.entrypoints.async_omni import AsyncOmni
from vllm_omni_tpu.entrypoints.openai.api_server import create_app

pytest_plugins = ("aiohttp.pytest_plugin",)

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}
TINY_DIT = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
                latent_channels=4, patch_size=2, text_dim=32,
                axes_dims_rope=(4, 6, 6))


@pytest.fixture(scope="module")
def omni():
    o = AsyncOmni(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=128, num_pages=32, page_size=16,
                  max_num_seqs=4, max_num_batched_tokens=64)
    yield o
    o.shutdown()


@pytest.fixture
async def client(omni, aiohttp_client):
    return await aiohttp_client(create_app(omni, model_name="tiny"))


async def test_health(client):
    r = await client.get("/health")
    assert r.status == 200
    assert (await r.json())["status"] == "ok"


async def test_models(client):
    r = await client.get("/v1/models")
    data = await r.json()
    assert data["data"][0]["id"] == "tiny"


async def test_completions_token_ids(client):
    r = await client.post("/v1/completions", json={
        "prompt": list(range(1, 10)), "max_tokens": 5,
        "temperature": 0.0, "ignore_eos": True})
    assert r.status == 200
    data = await r.json()
    assert len(data["choices"][0]["token_ids"]) == 5
    assert data["choices"][0]["finish_reason"] == "length"


async def test_chat_completions_no_tokenizer_errors(client):
    # dummy model has no tokenizer; string chat prompt must 4xx/5xx
    # cleanly, not hang
    r = await client.post("/v1/chat/completions", json={
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 4})
    assert r.status in (400, 500)


async def test_completions_n_choices(client):
    r = await client.post("/v1/completions", json={
        "prompt": list(range(1, 8)), "max_tokens": 4,
        "temperature": 0.8, "seed": 7, "n": 3, "ignore_eos": True})
    assert r.status == 200
    choices = (await r.json())["choices"]
    assert [c["index"] for c in choices] == [0, 1, 2]
    assert all(len(c["token_ids"]) == 4 for c in choices)
    # per-choice seeds: not all identical (vocab 256, 4 tokens — a
    # collision across all three is vanishingly unlikely)
    assert len({tuple(c["token_ids"]) for c in choices}) > 1


async def test_completions_logprobs(client):
    r = await client.post("/v1/completions", json={
        "prompt": list(range(1, 10)), "max_tokens": 5,
        "temperature": 0.0, "ignore_eos": True, "logprobs": 0})
    assert r.status == 200
    choice = (await r.json())["choices"][0]
    lps = choice["logprobs"]
    assert len(lps["token_logprobs"]) == 5
    assert lps["tokens"] == choice["token_ids"]
    # chosen-token log-probabilities are valid log-probs
    assert all(lp <= 0.0 for lp in lps["token_logprobs"])


async def test_bad_request(client):
    r = await client.post("/v1/completions", json={"bogus": 1})
    assert r.status == 400


async def test_image_generations(aiohttp_client):
    o = AsyncOmni(model="dummy", stage_configs={
        "stage_args": [{
            "stage_id": 0, "stage_type": "diffusion",
            "engine_args": {"dit": TINY_DIT, "dtype": "float32",
                            "vae_latent_channels": 4,
                            "resolution_buckets": [[32, 32]]},
            "final_output": True, "final_output_type": "image"}]})
    try:
        client = await aiohttp_client(create_app(o, model_name="t2i"))
        r = await client.post("/v1/images/generations", json={
            "prompt": "a test", "size": "32x32", "steps": 2,
            "guidance_scale": 1.0, "seed": 5})
        assert r.status == 200
        data = await r.json()
        png = base64.b64decode(data["data"][0]["b64_json"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
    finally:
        o.shutdown()


async def test_streaming_input_ws(client, omni):
    """WS /v1/audio/speech/stream: feed prompt chunks into a live
    resumable request; final message carries results."""
    ws = await client.ws_connect("/v1/audio/speech/stream")
    await ws.send_json({"token_ids": [1, 2, 3]})
    await ws.send_json({"token_ids": [4, 5]})
    await ws.send_json({"final": True})
    done = None
    async for msg in ws:
        data = msg.json()
        if data["type"] == "done":
            done = data
            break
        assert data["type"] in ("progress", "error")
        assert data["type"] != "error", data
    assert done is not None
    await ws.close()


async def test_video_job_api(aiohttp_client):
    o = AsyncOmni(model="dummy", stage_configs={
        "stage_args": [{
            "stage_id": 0, "stage_type": "diffusion",
            "engine_args": {"dit": TINY_DIT, "dtype": "float32",
                            "vae_latent_channels": 4,
                            "resolution_buckets": [[32, 32]]},
            "final_output": True, "final_output_type": "image"}]})
    try:
        client = await aiohttp_client(create_app(o, model_name="video"))
        r = await client.post("/v1/videos", json={
            "prompt": "a clip", "height": 32, "width": 32, "steps": 2})
        job = await r.json()
        assert job["status"] == "queued"
        import asyncio

        for _ in range(200):
            r = await client.get(f"/v1/videos/{job['id']}")
            st = (await r.json())["status"]
            if st in ("completed", "failed"):
                break
            await asyncio.sleep(0.05)
        assert st == "completed", st
        r = await client.get(f"/v1/videos/{job['id']}/content")
        data = await r.json()
        assert data["frames"]
        r = await client.get("/v1/videos/nope")
        assert r.status == 404
    finally:
        o.shutdown()


async def test_profiler_endpoints(client):
    r = await client.post("/profiler/start")
    assert (await r.json())["status"] == "started"
    r = await client.post("/profiler/stop")
    assert (await r.json())["status"] == "stopped"


async def test_realtime_ws(client):
    ws = await client.ws_connect("/v1/realtime")
    await ws.send_json({"type": "session.update",
                        "session": {"max_output_tokens": 5,
                                    "temperature": 0.0}})
    msg = await ws.receive_json()
    assert msg["type"] == "session.updated"
    await ws.send_json({
        "type": "conversation.item.create",
        "item": {"content": [
            {"type": "input_token_ids", "token_ids": [1, 2, 3, 4]}]}})
    msg = await ws.receive_json()
    assert msg["type"] == "conversation.item.created"
    await ws.send_json({"type": "response.create"})
    msg = await ws.receive_json()
    assert msg["type"] == "response.created" and msg["response_id"]
    done = None
    for _ in range(50):
        msg = await ws.receive_json()
        if msg["type"] == "response.done":
            done = msg
            break
        assert msg["type"] in ("response.output_text.delta",
                               "response.output_text.done",
                               "response.audio.delta")
    assert done is not None and len(done["token_ids"]) == 5
    await ws.close()


async def test_realtime_ws_audio_buffer_and_cancel(client):
    ws = await client.ws_connect("/v1/realtime")
    # audio buffer: append twice, commit → one item
    wave = np.zeros(160, np.float32)
    b64 = base64.b64encode(wave.tobytes()).decode()
    await ws.send_json({"type": "input_audio_buffer.append", "audio": b64})
    await ws.send_json({"type": "input_audio_buffer.append", "audio": b64})
    await ws.send_json({"type": "input_audio_buffer.commit"})
    msg = await ws.receive_json()
    assert msg["type"] == "input_audio_buffer.committed"
    assert msg["num_samples"] == 320
    # cancel an in-flight long response
    await ws.send_json({
        "type": "conversation.item.create",
        "item": {"content": [
            {"type": "input_token_ids", "token_ids": [1, 2, 3]}]}})
    msg = await ws.receive_json()
    assert msg["type"] == "conversation.item.created"
    await ws.send_json({"type": "session.update",
                        "session": {"max_output_tokens": 512,
                                    "temperature": 0.0}})
    await ws.receive_json()  # session.updated
    await ws.send_json({"type": "response.create"})
    msg = await ws.receive_json()
    assert msg["type"] == "response.created"
    await ws.send_json({"type": "response.cancel"})
    cancelled = False
    for _ in range(600):
        msg = await ws.receive_json()
        if msg["type"] == "response.cancelled":
            cancelled = True
            break
        assert msg["type"] in ("response.output_text.delta",
                               "response.audio.delta")
    assert cancelled
    await ws.close()


class _FakeTok:
    """Whitespace tokenizer so string TTS prompts run on the dummy."""

    chat_template = None

    def encode(self, text):
        return [1 + (ord(c) % 250) for c in text][:32] or [1]

    def decode(self, ids, skip_special_tokens=True):
        return " ".join(str(i) for i in ids)


AUDIO_PIPE = {
    "stage_args": [
        {"stage_id": 0, "stage_type": "llm",
         "engine_args": {"model": "dummy", "hf_overrides": TINY_HF,
                         "dtype": "float32", "max_model_len": 128,
                         "num_pages": 32, "page_size": 16,
                         "max_num_seqs": 4,
                         "max_num_batched_tokens": 64},
         "default_sampling_params": {"max_tokens": 4,
                                     "temperature": 0.0,
                                     "ignore_eos": True}},
        {"stage_id": 1, "stage_type": "llm",
         "engine_args": {"model": "dummy", "hf_overrides": TINY_HF,
                         "dtype": "float32", "max_model_len": 128,
                         "num_pages": 32, "page_size": 16,
                         "mode": "generation", "seed": 2,
                         "max_num_seqs": 4,
                         "max_num_batched_tokens": 128},
         "engine_input_source": [0],
         "final_output": True, "final_output_type": "audio",
         "custom_process_output_func":
             "vllm_omni_tpu.models.vocoder.code2wav_postprocess",
         "default_sampling_params": {"max_tokens": 1,
                                     "return_hidden_states": True}},
    ],
}


@pytest.fixture(scope="module")
def tts_client_factory():
    o = AsyncOmni(model="dummy", stage_configs=AUDIO_PIPE)
    o.runner.tokenizer = o.tokenizer = _FakeTok()
    yield o
    o.shutdown()


@pytest.fixture
async def tts_client(tts_client_factory, aiohttp_client):
    return await aiohttp_client(
        create_app(tts_client_factory, model_name="tts"))


async def test_audio_speech_wav(tts_client):
    r = await tts_client.post("/v1/audio/speech", json={
        "input": "Hello there. This is a synthesized sentence."})
    assert r.status == 200, await r.text()
    body = await r.read()
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"


async def test_audio_speech_long_input_chunks_and_caches(tts_client):
    # long input exercises the text splitter; identical repeat hits the
    # synthesis cache (same bytes back)
    text = ("The quick brown fox jumps over the lazy dog. " * 12).strip()
    r1 = await tts_client.post("/v1/audio/speech", json={
        "input": text, "response_format": "pcm", "max_chunk_chars": 80})
    assert r1.status == 200
    b1 = await r1.read()
    assert len(b1) > 0
    r2 = await tts_client.post("/v1/audio/speech", json={
        "input": text, "response_format": "pcm", "max_chunk_chars": 80})
    assert await r2.read() == b1


async def test_audio_speech_speed(tts_client):
    text = "A sentence to stretch."
    fast = await (await tts_client.post("/v1/audio/speech", json={
        "input": text, "response_format": "pcm", "speed": 2.0,
        "use_cache": False})).read()
    slow = await (await tts_client.post("/v1/audio/speech", json={
        "input": text, "response_format": "pcm", "speed": 0.5,
        "use_cache": False})).read()
    assert len(slow) > len(fast) * 2


async def test_audio_speech_batch(tts_client):
    r = await tts_client.post("/v1/audio/speech/batch", json={
        "inputs": ["First utterance.", "Second one."]})
    assert r.status == 200
    data = (await r.json())["data"]
    assert len(data) == 2
    for item in data:
        assert "audio" in item, item
        wave = np.frombuffer(base64.b64decode(item["audio"]), np.float32)
        assert wave.size > 0


async def test_image_edits(aiohttp_client):
    o = AsyncOmni(model="dummy", stage_configs={
        "stage_args": [{
            "stage_id": 0, "stage_type": "diffusion",
            "engine_args": {"dit": TINY_DIT, "dtype": "float32",
                            "vae_latent_channels": 4,
                            "resolution_buckets": [[32, 32]]},
            "final_output": True, "final_output_type": "image"}]})
    try:
        client = await aiohttp_client(create_app(o, model_name="i2i"))
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.full((32, 32, 3), 128, np.uint8)).save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        r = await client.post("/v1/images/edits", json={
            "image": b64, "prompt": "make it blue", "steps": 4,
            "strength": 0.5, "guidance_scale": 1.0, "seed": 3})
        assert r.status == 200, await r.text()
        data = await r.json()
        png = base64.b64decode(data["data"][0]["b64_json"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        r = await client.post("/v1/images/edits", json={
            "image": "not-b64!!", "prompt": "x"})
        assert r.status == 400
    finally:
        o.shutdown()


async def test_realtime_ws_audio_response(aiohttp_client):
    """input_audio_buffer.commit → response.create must splice encoder
    placeholders and generate (was dead-on-arrival: empty prompt + mm
    inputs was rejected by MMProcessor)."""
    AUDIO_TOKEN = 9
    o = AsyncOmni(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=256, num_pages=64, page_size=16,
                  max_num_seqs=4, max_num_batched_tokens=128,
                  mm_encoders={"audio_token_id": AUDIO_TOKEN,
                               "audio": {"n_mels": 16, "hidden_size": 32,
                                         "num_layers": 1, "num_heads": 2,
                                         "max_frames": 64}})
    try:
        client = await aiohttp_client(create_app(o, model_name="rt-mm"))
        ws = await client.ws_connect("/v1/realtime")
        await ws.send_json({"type": "session.update",
                            "session": {"max_output_tokens": 4,
                                        "temperature": 0.0}})
        await ws.receive_json()
        mel = np.zeros((32, 16), np.float32)
        await ws.send_json({"type": "input_audio_buffer.append",
                            "audio": base64.b64encode(
                                mel.tobytes()).decode()})
        await ws.send_json({"type": "input_audio_buffer.commit"})
        msg = await ws.receive_json()
        assert msg["type"] == "input_audio_buffer.committed"
        await ws.send_json({"type": "response.create"})
        msg = await ws.receive_json()
        assert msg["type"] == "response.created"
        done = None
        for _ in range(100):
            msg = await ws.receive_json()
            assert msg["type"] != "error", msg
            if msg["type"] == "response.done":
                done = msg
                break
        assert done is not None and len(done["token_ids"]) == 4
        await ws.close()
    finally:
        o.shutdown()


async def test_multimodal_chat_audio_part(aiohttp_client):
    """OpenAI chat content parts: input_audio becomes placeholder
    tokens + mm_inputs through the stage-0 encoder (reference
    serving_chat multimodal input path)."""
    AUDIO_TOKEN = 9
    o = AsyncOmni(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=256, num_pages=64, page_size=16,
                  max_num_seqs=4, max_num_batched_tokens=128,
                  mm_encoders={"audio_token_id": AUDIO_TOKEN,
                               "audio": {"n_mels": 16, "hidden_size": 32,
                                         "num_layers": 1, "num_heads": 2,
                                         "max_frames": 64}})
    o.runner.tokenizer = o.tokenizer = _FakeTok()
    try:
        client = await aiohttp_client(create_app(o, model_name="mm"))
        mel = np.zeros((32, 16), np.float32)
        r = await client.post("/v1/chat/completions", json={
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "hear this:"},
                {"type": "input_audio",
                 "input_audio": {"data": base64.b64encode(
                     mel.tobytes()).decode(), "format": "f32"}},
            ]}],
            "max_tokens": 4, "temperature": 0.0, "ignore_eos": True})
        assert r.status == 200, await r.text()
        data = await r.json()
        assert data["choices"][0]["finish_reason"] == "length"
        # 32 mel frames / 4x stem subsample = 8 placeholder tokens
        # consumed; prompt tokens = text tokens + 8
        assert data["usage"]["prompt_tokens"] > 8
    finally:
        o.shutdown()


async def test_voice_crud(client):
    r = await client.post("/v1/audio/voices", json={
        "name": "alice", "description": "warm"})
    assert r.status == 200
    r = await client.get("/v1/audio/voices")
    names = [v["name"] for v in (await r.json())["voices"]]
    assert "alice" in names
    r = await client.delete("/v1/audio/voices/alice")
    assert r.status == 200
    r = await client.delete("/v1/audio/voices/alice")
    assert r.status == 404


async def test_metrics_endpoint(client):
    # generate something first so counters/histograms are non-empty
    r = await client.post("/v1/completions", json={
        "prompt": list(range(1, 8)), "max_tokens": 3,
        "temperature": 0.0, "ignore_eos": True})
    assert r.status == 200
    r = await client.get("/metrics")
    assert r.status == 200
    body = await r.text()
    assert "# TYPE vllm_omni_requests_total counter" in body
    assert "vllm_omni_stage_tokens_total{stage=" in body
    assert "vllm_omni_ttft_seconds_bucket{le=" in body
    assert 'vllm_omni_ttft_seconds_bucket{le="+Inf"}' in body
    assert "vllm_omni_scheduler_queue_depth{stage=" in body
    # parse a counter value: finished >= 1
    for line in body.splitlines():
        if line.startswith("vllm_omni_requests_finished_total "):
            assert float(line.split()[-1]) >= 1
            break
    else:
        raise AssertionError("finished counter missing")
