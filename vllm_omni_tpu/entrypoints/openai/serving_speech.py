"""TTS serving depth: text splitting, voice cache, chunked synthesis.

Reference parity: entrypoints/openai/serving_speech.py (1,965 LoC) +
text_splitter.py:120 (sentence-boundary chunking so long TTS inputs are
synthesized incrementally) + the voice cache the speech handlers keep so
cloned-voice conditioning is decoded once, not per request.

TPU-first notes: chunked synthesis feeds the pipeline's *resumable*
streaming-input path (the same WAITING_FOR_CHUNK machinery async_chunk
uses), so the AR talker starts decoding on the first sentence while the
client-visible text is still being split — the TTFP win, not just a
memory bound.
"""

from __future__ import annotations

import base64
import hashlib
import re
import threading
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

# ---------------------------------------------------------------------------
# Text splitter (reference text_splitter.py:120)
# ---------------------------------------------------------------------------

# sentence terminators: latin + CJK + newline paragraph breaks
_SENT_END = re.compile(r"(?<=[.!?;。！？；…])\s+|\n{2,}")
# soft break points inside an over-long sentence, best first
_SOFT_BREAKS = (re.compile(r"(?<=[,，、:：])\s*"),
                re.compile(r"\s+"))
# common abbreviations that a naive period-split would cut ("Dr. Smith")
_ABBREV = re.compile(
    r"\b(?:mr|mrs|ms|dr|prof|sr|jr|st|vs|etc|e\.g|i\.e|no|fig)\.$",
    re.IGNORECASE)


def split_text(text: str, max_chars: int = 300,
               min_chars: int = 40) -> list[str]:
    """Split TTS input into synthesis chunks on sentence boundaries.

    - never splits inside a word
    - merges short sentences up to max_chars (keeps prosody context)
    - re-joins splits after common abbreviations
    - over-long sentences fall back to comma/space breaks
    """
    text = text.strip()
    if not text:
        return []
    if len(text) <= max_chars:
        return [text]

    # 1. sentence segmentation with abbreviation repair
    raw = [s for s in _SENT_END.split(text) if s and s.strip()]
    sents: list[str] = []
    for s in raw:
        if sents and _ABBREV.search(sents[-1].strip()):
            sents[-1] = sents[-1].rstrip() + " " + s.strip()
        else:
            sents.append(s.strip())

    # 2. hard-split any single sentence that exceeds max_chars
    pieces: list[str] = []
    for s in sents:
        while len(s) > max_chars:
            cut = -1
            for pat in _SOFT_BREAKS:
                best = -1
                for m in pat.finditer(s, 0, max_chars + 1):
                    best = m.end()
                if best > min_chars:
                    cut = best
                    break
            if cut <= 0:
                cut = max_chars  # no break point at all: hard cut
            pieces.append(s[:cut].strip())
            s = s[cut:].strip()
        if s:
            pieces.append(s)

    # 3. greedy merge up to max_chars
    chunks: list[str] = []
    cur = ""
    for p in pieces:
        if cur and len(cur) + 1 + len(p) <= max_chars:
            cur = f"{cur} {p}"
        else:
            if cur:
                chunks.append(cur)
            cur = p
    if cur:
        chunks.append(cur)
    return chunks


# ---------------------------------------------------------------------------
# Voice cache (reference serving_speech voice conditioning cache)
# ---------------------------------------------------------------------------


@dataclass
class VoiceEntry:
    name: str
    description: str = ""
    sample_rate: int = 24000
    # decoded reference audio for voice cloning, float32 [-1, 1]
    ref_audio: Optional[np.ndarray] = None
    # discrete codec codes of the reference audio (12hz-tokenizer role:
    # tokenize-once, reuse per request)
    ref_codes: Optional[np.ndarray] = None
    # opaque conditioning the pipeline may attach (speaker embedding etc.)
    extra: dict[str, Any] = field(default_factory=dict)

    def conditioning(self) -> dict[str, Any]:
        """What rides into the pipeline via additional_information
        (reference: voice payload → stage input processors)."""
        cond: dict[str, Any] = {"voice": self.name, **self.extra}
        if self.ref_audio is not None:
            cond["ref_audio"] = self.ref_audio
            cond["ref_sample_rate"] = self.sample_rate
        if self.ref_codes is not None:
            cond["ref_codes"] = self.ref_codes
        return cond


class VoiceCache:
    """LRU of registered voices with decoded (not base64) reference audio.

    Decode-once semantics: create_voice stores raw b64; the first use
    decodes to float32 PCM and caches; later requests reuse the array.
    Thread-safe — the aiohttp handlers and the orchestrator callback
    thread both touch it.
    """

    def __init__(self, capacity: int = 64, tokenizer: Any = None) -> None:
        self._lock = threading.Lock()
        self._raw: dict[str, dict[str, Any]] = {}
        self._decoded: OrderedDict[str, VoiceEntry] = OrderedDict()
        self.capacity = capacity
        # optional discrete audio tokenizer (models/audio_tokenizer.py):
        # cloned-voice reference audio is tokenized once to codec codes
        self.tokenizer = tokenizer

    # -- registry (CRUD) ---------------------------------------------------
    def put(self, name: str, *, audio_b64: Optional[str] = None,
            description: str = "", sample_rate: int = 24000,
            **extra: Any) -> None:
        with self._lock:
            self._raw[name] = {"audio": audio_b64,
                               "description": description,
                               "sample_rate": sample_rate,
                               "extra": extra}
            self._decoded.pop(name, None)  # invalidate stale decode

    def delete(self, name: str) -> bool:
        with self._lock:
            self._decoded.pop(name, None)
            return self._raw.pop(name, None) is not None

    def list(self) -> list[dict[str, Any]]:
        with self._lock:
            return [{"name": k, "description": v["description"],
                     "sample_rate": v["sample_rate"],
                     "has_ref_audio": v["audio"] is not None}
                    for k, v in self._raw.items()]

    # -- decode-once lookup --------------------------------------------------
    def get(self, name: str) -> Optional[VoiceEntry]:
        with self._lock:
            ent = self._decoded.get(name)
            if ent is not None:
                self._decoded.move_to_end(name)
                return ent
            raw = self._raw.get(name)
            if raw is None:
                return None
            ref = None
            codes = None
            if raw["audio"]:
                buf = base64.b64decode(raw["audio"])
                ref = np.frombuffer(buf, np.float32).copy()
                if self.tokenizer is not None:
                    codes = self.tokenizer.encode(ref)
            ent = VoiceEntry(name=name, description=raw["description"],
                             sample_rate=raw["sample_rate"],
                             ref_audio=ref, ref_codes=codes,
                             extra=dict(raw["extra"]))
            self._decoded[name] = ent
            while len(self._decoded) > self.capacity:
                self._decoded.popitem(last=False)
            return ent


# ---------------------------------------------------------------------------
# Audio assembly
# ---------------------------------------------------------------------------


def concat_audio(chunks: list[np.ndarray], sample_rate: int,
                 crossfade_ms: float = 20.0) -> np.ndarray:
    """Concatenate per-chunk waveforms with a short equal-power
    crossfade at the seams (masks chunk-boundary clicks)."""
    chunks = [np.asarray(c, np.float32).reshape(-1) for c in chunks
              if c is not None and np.asarray(c).size]
    if not chunks:
        return np.zeros((0,), np.float32)
    if len(chunks) == 1:
        return chunks[0]
    xf = int(sample_rate * crossfade_ms / 1000)
    out = chunks[0]
    for nxt in chunks[1:]:
        n = min(xf, len(out), len(nxt))
        if n == 0:
            out = np.concatenate([out, nxt])
            continue
        ramp = np.linspace(0.0, np.pi / 2, n, dtype=np.float32)
        tail = out[-n:] * np.cos(ramp) + nxt[:n] * np.sin(ramp)
        out = np.concatenate([out[:-n], tail, nxt[n:]])
    return out


def resample_speed(audio: np.ndarray, speed: float) -> np.ndarray:
    """OpenAI `speed` param: linear-interp resample (0.25–4.0)."""
    if abs(speed - 1.0) < 1e-3 or audio.size == 0:
        return audio
    n_out = max(int(round(audio.size / speed)), 1)
    x_old = np.arange(audio.size, dtype=np.float64)
    x_new = np.linspace(0, audio.size - 1, n_out)
    return np.interp(x_new, x_old, audio).astype(np.float32)


def chunk_cache_key(text: str, voice: Optional[str]) -> str:
    """Stable key for a (chunk, voice) synthesis result."""
    return hashlib.sha1(
        f"{voice or ''}\x00{text}".encode()).hexdigest()


class SynthesisCache:
    """Tiny LRU of synthesized chunks — repeated fragments (fixed
    greetings, SSML boilerplate) skip the pipeline entirely. Entries
    are (waveform, sample_rate) so all-hit requests report the true
    rate, not a default."""

    def __init__(self, capacity: int = 128) -> None:
        self._lock = threading.Lock()
        self._d: OrderedDict[str, tuple] = OrderedDict()
        self.capacity = capacity

    def get(self, key: str) -> Optional[tuple]:
        with self._lock:
            v = self._d.get(key)
            if v is not None:
                self._d.move_to_end(key)
            return v

    def put(self, key: str, entry: tuple) -> None:
        with self._lock:
            self._d[key] = entry
            while len(self._d) > self.capacity:
                self._d.popitem(last=False)
