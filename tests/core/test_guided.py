"""JSON grammar-masked (guided) decoding: automaton unit tests plus an
engine-level generation test where random-weight logits are forced into
valid JSON purely by the token mask (reference: serving_chat
response_format; upstream structured-output role)."""

import json

import numpy as np
import pytest

from vllm_omni_tpu.core.guided import (GuidedSession, JsonAutomaton,
                                       TokenByteTable)


def feed_all(auto: JsonAutomaton, s: str) -> bool:
    return all(auto.feed(b) for b in s.encode())


@pytest.mark.parametrize("doc", [
    '{"a": 1}',
    '{"k": [1, 2.5, -3e4], "s": "x\\n\\u0041", "b": true, "n": null}',
    '[]',
    '[{"nested": {"deep": [false]}}]',
    '"just a string"',
    '-0.5e-2',
    'true',
    '  {  "ws"  :  [ 1 , 2 ]  }  ',
])
def test_valid_json_accepted_and_complete(doc):
    auto = JsonAutomaton()
    assert feed_all(auto, doc), doc
    assert auto.complete, doc


@pytest.mark.parametrize("doc", [
    '{a: 1}',          # unquoted key
    "{'a': 1}",        # single quotes
    '{"a" 1}',         # missing colon
    '[1 2]',           # missing comma
    '{"a": 01}',       # leading zero
    '"unescaped\tok"'.replace("\t", "\x01"),  # raw control char
    'truth',
    '{"a": .5}',
])
def test_invalid_json_rejected(doc):
    auto = JsonAutomaton()
    assert not feed_all(auto, doc), doc


def test_incomplete_is_not_complete():
    auto = JsonAutomaton()
    assert feed_all(auto, '{"a": [1, 2')
    assert not auto.complete


def test_complete_then_only_ws():
    auto = JsonAutomaton()
    assert feed_all(auto, '{"a": 1}')
    assert auto.complete
    assert auto.feed(ord(" "))
    assert not auto.feed(ord("{"))


def _byte_table(eos_id=0, vocab=128):
    tb = [None] * vocab
    for i in range(1, vocab):
        if i < 0x20 or i > 0x7E:
            continue
        tb[i] = bytes([i])
    # a few multi-byte tokens (BPE-style)
    tb[1] = b'{"'
    tb[2] = b'":'
    tb[3] = b'true'
    tb[4] = b'}]'
    return TokenByteTable(tb)


def test_session_mask_and_advance():
    table = _byte_table()
    sess = GuidedSession(table, {0})
    row = sess.mask_row()
    assert row[ord("{")] == 0.0
    assert row[ord("[")] == 0.0
    assert row[1] == 0.0           # multi-byte '{"'
    assert row[ord("}")] < 0       # can't close before opening
    assert row[0] < 0              # EOS before any value
    sess.advance(1)                # '{"'
    row = sess.mask_row()
    assert row[ord("a")] == 0.0    # key characters
    assert row[0] < 0              # EOS illegal mid-string
    # finish a tiny doc: {"a":true}
    for ch in b'a':
        sess.advance(ch)
    sess.advance(ord('"'))
    # after closing the key quote we need a colon
    row = sess.mask_row()
    assert row[ord(":")] == 0.0
    assert row[ord("x")] < 0
    sess.advance(ord(":"))
    sess.advance(3)                # 'true'
    row = sess.mask_row()
    assert row[ord("}")] == 0.0
    sess.advance(ord("}"))
    assert sess.complete
    row = sess.mask_row()
    assert row[0] == 0.0           # EOS now allowed
    assert row[ord("{")] < 0


def test_masked_sampling_yields_valid_json():
    """Adversarial logits + mask → every sampled sequence parses."""
    rng = np.random.default_rng(7)
    table = _byte_table()
    for trial in range(20):
        sess = GuidedSession(table, {0})
        out = []
        for _ in range(80):
            logits = rng.normal(size=table.vocab_size).astype(np.float32)
            logits += sess.mask_row()
            tok = int(np.argmax(logits + rng.gumbel(
                size=table.vocab_size)))
            if tok == 0:
                break
            sess.advance(tok)
            out.append(tok)
        text = b"".join(table.token_bytes[t] for t in out).decode()
        if sess.complete:
            json.loads(text)  # must parse
        else:  # hit the length cap mid-document: prefix must be legal
            auto = JsonAutomaton()
            assert all(auto.feed(b) for b in text.encode())


class _ByteTokenizer:
    """Tiny tokenizer: token id == byte value; id 0 is EOS."""

    all_special_ids = [0]
    chat_template = None

    def decode(self, ids, skip_special_tokens=True):
        if isinstance(ids, int):
            ids = [ids]
        return bytes(i for i in ids
                     if 0x20 <= i <= 0x7E).decode("latin-1")


def test_engine_guided_json(monkeypatch):
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    hf = {"architectures": ["LlamaForCausalLM"], "vocab_size": 128,
          "hidden_size": 32, "intermediate_size": 64,
          "num_hidden_layers": 2, "num_attention_heads": 2,
          "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0}
    config = EngineConfig.from_kwargs(
        model="dummy", hf_overrides=hf, dtype="float32",
        max_model_len=128, num_pages=32, page_size=16,
        max_num_seqs=2, max_num_batched_tokens=64, multi_step=4)
    engine = EngineCore(config, tokenizer=_ByteTokenizer())
    sp = SamplingParams(max_tokens=64, temperature=1.0, seed=3,
                        guided="json")
    engine.add_request(list(range(1, 9)), sp, request_id="g1")
    finals = engine.run_to_completion()
    assert len(finals) == 1
    out = finals[0].outputs[0]
    text = _ByteTokenizer().decode(out.token_ids)
    json.loads(text)  # random weights, valid JSON — the mask did it
    # guided forces single-step chains (first token comes from prefill)
    assert engine.runner.forward_passes >= len(out.token_ids) - 1
