"""Unit tests for TTS serving depth (reference serving_speech.py +
text_splitter.py roles): sentence splitting, voice cache, audio
assembly."""

import base64

import numpy as np

from vllm_omni_tpu.entrypoints.openai.serving_speech import (
    SynthesisCache, VoiceCache, chunk_cache_key, concat_audio,
    resample_speed, split_text)


class TestSplitText:
    def test_short_passthrough(self):
        assert split_text("Hello world.") == ["Hello world."]

    def test_empty(self):
        assert split_text("   ") == []

    def test_sentence_boundaries(self):
        text = ("First sentence is here. Second one follows! "
                "Third asks a question? Fourth ends.")
        chunks = split_text(text, max_chars=30)
        assert len(chunks) >= 3
        assert all(len(c) <= 30 for c in chunks)
        # nothing lost
        assert "".join(chunks).replace(" ", "") == \
            text.replace(" ", "")

    def test_merge_short_sentences(self):
        text = "A. B. C. D. " * 10
        chunks = split_text(text.strip(), max_chars=40)
        # greedy merge: far fewer chunks than sentences
        assert len(chunks) < 20
        assert all(len(c) <= 40 for c in chunks)

    def test_abbreviation_not_split(self):
        text = ("Dr. Smith went to the market today to buy vegetables. "
                "Then Mr. Jones followed him to the same market stall.")
        chunks = split_text(text, max_chars=60)
        for c in chunks:
            assert not c.endswith("Dr.") and not c.endswith("Mr.")

    def test_overlong_sentence_soft_break(self):
        text = ("word " * 50 + ", " + "word " * 50).strip()
        chunks = split_text(text, max_chars=100)
        assert all(len(c) <= 100 for c in chunks)
        # never splits inside a word
        for c in chunks:
            assert not c.startswith("ord")

    def test_cjk_terminators(self):
        text = "这是第一句话。" * 30
        chunks = split_text(text, max_chars=50)
        assert len(chunks) > 1
        assert all(len(c) <= 50 for c in chunks)


class TestVoiceCache:
    def test_crud_and_decode_once(self):
        vc = VoiceCache()
        ref = np.arange(16, dtype=np.float32) / 16
        vc.put("alice", audio_b64=base64.b64encode(ref.tobytes()).decode(),
               description="warm", sample_rate=16000)
        names = [v["name"] for v in vc.list()]
        assert names == ["alice"]
        ent = vc.get("alice")
        assert ent.sample_rate == 16000
        np.testing.assert_allclose(ent.ref_audio, ref)
        # cached object identity on second get (decode-once)
        assert vc.get("alice") is ent
        cond = ent.conditioning()
        assert cond["voice"] == "alice"
        assert cond["ref_sample_rate"] == 16000
        assert vc.delete("alice") and not vc.delete("alice")
        assert vc.get("alice") is None

    def test_put_invalidates_decode(self):
        vc = VoiceCache()
        vc.put("v", audio_b64=None)
        e1 = vc.get("v")
        assert e1.ref_audio is None
        ref = np.zeros(4, np.float32)
        vc.put("v", audio_b64=base64.b64encode(ref.tobytes()).decode())
        e2 = vc.get("v")
        assert e2 is not e1 and e2.ref_audio is not None

    def test_lru_eviction(self):
        vc = VoiceCache(capacity=2)
        for n in "abc":
            vc.put(n)
            vc.get(n)
        assert len(vc._decoded) == 2
        # raw registry keeps all three; decode repopulates
        assert vc.get("a") is not None

    def test_voice_clone_tokenizes_once(self):
        from vllm_omni_tpu.models.audio_tokenizer import (
            AudioTokenizer, AudioTokenizerConfig)

        tok = AudioTokenizer(AudioTokenizerConfig(
            n_mels=16, hidden_size=32, num_layers=1, num_heads=2,
            codebook_size=64, n_q=4, latent_dim=16, frame_pool=2))
        vc = VoiceCache(tokenizer=tok)
        mel = np.random.default_rng(0).standard_normal(
            (64, 16)).astype(np.float32)
        vc.put("clone", audio_b64=base64.b64encode(
            mel.tobytes()).decode())
        ent = vc.get("clone")
        assert ent.ref_codes is not None
        assert ent.ref_codes.shape == (16, 4)  # 12hz-class frames, n_q
        cond = ent.conditioning()
        np.testing.assert_array_equal(cond["ref_codes"], ent.ref_codes)
        # cached: same entry, no re-tokenize
        assert vc.get("clone") is ent


class TestAudioAssembly:
    def test_concat_crossfade_length(self):
        sr = 1000
        a = np.ones(500, np.float32)
        b = -np.ones(500, np.float32)
        out = concat_audio([a, b], sr, crossfade_ms=20)
        xf = 20  # samples
        assert out.size == 1000 - xf
        # seam is a smooth ramp, not a click
        seam = out[500 - xf:500]
        assert np.all(np.abs(np.diff(seam)) < 0.2)

    def test_concat_single_and_empty(self):
        sr = 24000
        a = np.ones(10, np.float32)
        assert concat_audio([a], sr).size == 10
        assert concat_audio([], sr).size == 0
        assert concat_audio([a, np.zeros(0)], sr).size == 10

    def test_resample_speed(self):
        wave = np.sin(np.linspace(0, 10, 1000)).astype(np.float32)
        fast = resample_speed(wave, 2.0)
        slow = resample_speed(wave, 0.5)
        assert abs(fast.size - 500) <= 1
        assert abs(slow.size - 2000) <= 1
        assert resample_speed(wave, 1.0) is wave

    def test_chunk_cache_key_distinct(self):
        assert chunk_cache_key("a", "v1") != chunk_cache_key("a", "v2")
        assert chunk_cache_key("a", None) != chunk_cache_key("b", None)

    def test_synthesis_cache(self):
        sc = SynthesisCache(capacity=2)
        for i, k in enumerate("abc"):
            sc.put(k, (np.full(4, i, np.float32), 16000 + i))
        assert sc.get("a") is None  # evicted
        wave, sr = sc.get("c")
        assert wave[0] == 2 and sr == 16002  # sr rides the entry
