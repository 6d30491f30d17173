"""Qwen3-TTS talker: loader + prompt-builder + code-predictor parity +
engine per-step in-loop conditioning parity.

Checkpoint fixture uses the genuine reference naming
(qwen3_tts_talker.py hf_to_vllm_mapper: talker.model.* backbone with
codec_embedding, talker.codec_head, talker.model.text_embedding,
talker.text_projection.linear_fc{1,2}, talker.code_predictor.model.*
per-group codec_embedding list + lm_head list + small_to_mtp
projection). Oracles are independent torch re-implementations of
_build_prompt_embeds, CodePredictorWrapper.forward (greedy, projection
on every buffer insertion) and the talker_mtp per-step loop."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HS, HEADS, KV, HD, LAYERS, INTER = 32, 2, 2, 16, 2, 64
VOCAB = 64  # codec vocab
CB_VOCAB = 48  # real code ids [0, 48)
TXT_V, TXT_H = 96, 24
CP_H, CP_HEADS, CP_KV, CP_HD, CP_LAYERS, CP_INTER = 16, 2, 1, 8, 2, 48
G = 3  # num_code_groups
EOS, PAD, BOS = 50, 52, 53
NOTHINK, THINK, THINK_BOS, THINK_EOS = 54, 55, 56, 57
TTS_PAD, TTS_BOS, TTS_EOS = 80, 81, 82

CONFIG = {
    "model_type": "qwen3_tts",
    "tts_pad_token_id": TTS_PAD, "tts_bos_token_id": TTS_BOS,
    "tts_eos_token_id": TTS_EOS,
    "talker_config": {
        "vocab_size": VOCAB, "hidden_size": HS,
        "intermediate_size": INTER, "num_hidden_layers": LAYERS,
        "num_attention_heads": HEADS, "num_key_value_heads": KV,
        "head_dim": HD, "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
        "num_code_groups": G, "text_vocab_size": TXT_V,
        "text_hidden_size": TXT_H,
        "codec_eos_token_id": EOS, "codec_pad_id": PAD,
        "codec_bos_id": BOS, "codec_nothink_id": NOTHINK,
        "codec_think_id": THINK, "codec_think_bos_id": THINK_BOS,
        "codec_think_eos_id": THINK_EOS,
        "spk_id": {"Vivian": 60, "ryan": 61},
        "codec_language_id": {"english": 40},
        "code_predictor_config": {
            "vocab_size": CB_VOCAB, "hidden_size": CP_H,
            "intermediate_size": CP_INTER,
            "num_hidden_layers": CP_LAYERS,
            "num_attention_heads": CP_HEADS,
            "num_key_value_heads": CP_KV, "head_dim": CP_HD,
            "rope_theta": 10000.0, "rms_norm_eps": 1e-6,
            "num_code_groups": G,
        },
    },
}


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, o, i, bias=False):
        sd[f"{name}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)
        if bias:
            sd[f"{name}.bias"] = torch.randn(o, generator=g) * 0.02

    sd["talker.model.codec_embedding.weight"] = torch.randn(
        VOCAB, HS, generator=g) * 0.05
    sd["talker.model.norm.weight"] = torch.rand(HS, generator=g) + 0.5
    sd["talker.codec_head.weight"] = torch.randn(
        VOCAB, HS, generator=g) * HS ** -0.5
    for i in range(LAYERS):
        p = f"talker.model.layers.{i}"
        lin(f"{p}.self_attn.q_proj", HEADS * HD, HS)
        lin(f"{p}.self_attn.k_proj", KV * HD, HS)
        lin(f"{p}.self_attn.v_proj", KV * HD, HS)
        lin(f"{p}.self_attn.o_proj", HS, HEADS * HD)
        sd[f"{p}.self_attn.q_norm.weight"] = torch.rand(
            HD, generator=g) + 0.5
        sd[f"{p}.self_attn.k_norm.weight"] = torch.rand(
            HD, generator=g) + 0.5
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
        lin(f"{p}.mlp.gate_proj", INTER, HS)
        lin(f"{p}.mlp.up_proj", INTER, HS)
        lin(f"{p}.mlp.down_proj", HS, INTER)
    sd["talker.model.text_embedding.weight"] = torch.randn(
        TXT_V, TXT_H, generator=g) * 0.05
    lin("talker.text_projection.linear_fc1", TXT_H, TXT_H, bias=True)
    lin("talker.text_projection.linear_fc2", HS, TXT_H, bias=True)
    # code predictor (with projection: talker 32 → cp 16)
    lin("talker.code_predictor.small_to_mtp_projection", CP_H, HS,
        bias=True)
    for q in range(G - 1):
        sd[f"talker.code_predictor.model.codec_embedding.{q}.weight"] \
            = torch.randn(CB_VOCAB, HS, generator=g) * 0.05
        lin(f"talker.code_predictor.lm_head.{q}", CB_VOCAB, CP_H)
    sd["talker.code_predictor.model.norm.weight"] = torch.rand(
        CP_H, generator=g) + 0.5
    for i in range(CP_LAYERS):
        p = f"talker.code_predictor.model.layers.{i}"
        lin(f"{p}.self_attn.q_proj", CP_HEADS * CP_HD, CP_H)
        lin(f"{p}.self_attn.k_proj", CP_KV * CP_HD, CP_H)
        lin(f"{p}.self_attn.v_proj", CP_KV * CP_HD, CP_H)
        lin(f"{p}.self_attn.o_proj", CP_H, CP_HEADS * CP_HD)
        sd[f"{p}.self_attn.q_norm.weight"] = torch.rand(
            CP_HD, generator=g) + 0.5
        sd[f"{p}.self_attn.k_norm.weight"] = torch.rand(
            CP_HD, generator=g) + 0.5
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            CP_H, generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            CP_H, generator=g) + 0.5
        lin(f"{p}.mlp.gate_proj", CP_INTER, CP_H)
        lin(f"{p}.mlp.up_proj", CP_INTER, CP_H)
        lin(f"{p}.mlp.down_proj", CP_H, CP_INTER)
    # must be skipped
    sd["speaker_encoder.blocks.0.conv.weight"] = torch.randn(
        4, 4, 3, generator=g)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("qwen3_tts_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(CONFIG, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracles
# ---------------------------------------------------------------------------


def _rms(x, w, eps=1e-6):
    return x.float() / torch.sqrt(
        (x.float() ** 2).mean(-1, keepdim=True) + eps) * w.float()


def _o_text_proj(sd, ids):
    e = sd["talker.model.text_embedding.weight"].float()[ids]
    h = e @ sd["talker.text_projection.linear_fc1.weight"].T.float() \
        + sd["talker.text_projection.linear_fc1.bias"].float()
    h = F.silu(h)
    return h @ sd["talker.text_projection.linear_fc2.weight"].T.float()\
        + sd["talker.text_projection.linear_fc2.bias"].float()


def _o_prompt(sd, text_ids, speaker="vivian", non_streaming=True):
    """_build_prompt_embeds CustomVoice (no language id)."""
    ce = sd["talker.model.codec_embedding.weight"].float()
    ids = torch.tensor(text_ids)
    tts = _o_text_proj(sd, torch.tensor([TTS_BOS, TTS_EOS, TTS_PAD]))
    tts_bos, tts_eos, tts_pad = tts[0], tts[1], tts[2]
    codec_input = torch.cat([
        ce[[NOTHINK, THINK_BOS, THINK_EOS]],
        ce[[60]],  # vivian
        ce[[PAD, BOS]]], dim=0)
    role = _o_text_proj(sd, ids[:3])
    c = codec_input.shape[0]
    prefix = torch.cat([tts_pad.expand(c - 2, -1), tts_bos[None]], 0)
    prefix = prefix + codec_input[:-1]
    prompt = torch.cat([role, prefix], dim=0)
    if non_streaming:
        text_all = torch.cat([_o_text_proj(sd, ids[3:-5]),
                              tts_eos[None]], dim=0)
        pad_rows = ce[PAD][None].expand(text_all.shape[0], -1)
        prompt = torch.cat([prompt, text_all + pad_rows,
                            (tts_pad + ce[BOS])[None]], dim=0)
        tail = tts_pad[None]
    else:
        first = _o_text_proj(sd, ids[3:4]) + codec_input[-1:]
        prompt = torch.cat([prompt, first], dim=0)
        tail = torch.cat([_o_text_proj(sd, ids[4:-5]),
                          tts_eos[None]], dim=0)
    return prompt, tail, tts_pad


def _o_cp_tower(sd, x):
    """Code predictor transformer (qwen3_code_predictor.py: qk norm
    then rope, causal SDPA)."""
    b, t, _ = x.shape
    inv = 1.0 / (10000.0 ** (torch.arange(0, CP_HD, 2).float() / CP_HD))
    ang = torch.arange(t).float()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    cos, sin = emb.cos(), emb.sin()

    def rope(v):
        half = v.shape[-1] // 2
        rot = torch.cat([-v[..., half:], v[..., :half]], dim=-1)
        return v * cos[None, :, None, :] + rot * sin[None, :, None, :]

    for i in range(CP_LAYERS):
        p = f"talker.code_predictor.model.layers.{i}"
        h = _rms(x, sd[f"{p}.input_layernorm.weight"])
        q = (h @ sd[f"{p}.self_attn.q_proj.weight"].T.float()
             ).view(b, t, CP_HEADS, CP_HD)
        k = (h @ sd[f"{p}.self_attn.k_proj.weight"].T.float()
             ).view(b, t, CP_KV, CP_HD)
        v = (h @ sd[f"{p}.self_attn.v_proj.weight"].T.float()
             ).view(b, t, CP_KV, CP_HD)
        q = _rms(q, sd[f"{p}.self_attn.q_norm.weight"])
        k = _rms(k, sd[f"{p}.self_attn.k_norm.weight"])
        q, k = rope(q), rope(k)
        k = k.repeat_interleave(CP_HEADS // CP_KV, dim=2)
        v = v.repeat_interleave(CP_HEADS // CP_KV, dim=2)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True).transpose(1, 2).reshape(b, t, -1)
        x = x + o @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        h = _rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        gate = h @ sd[f"{p}.mlp.gate_proj.weight"].T.float()
        up = h @ sd[f"{p}.mlp.up_proj.weight"].T.float()
        x = x + (F.silu(gate) * up) @ \
            sd[f"{p}.mlp.down_proj.weight"].T.float()
    return _rms(x, sd["talker.code_predictor.model.norm.weight"])


def _o_cp_generate(sd, hidden_t, layer0_emb_t):
    """CodePredictorWrapper.forward greedy: projection on every buffer
    insertion; logits for group step at position step."""
    def proj(x):
        return x @ sd["talker.code_predictor.small_to_mtp_projection"
                      ".weight"].T.float() + \
            sd["talker.code_predictor.small_to_mtp_projection.bias"
               ].float()

    b = hidden_t.shape[0]
    buf = torch.zeros(b, G + 1, CP_H)
    buf[:, 0] = proj(hidden_t)
    buf[:, 1] = proj(layer0_emb_t)
    codes, embs = [], []
    for step in range(1, G):
        hid = _o_cp_tower(sd, buf[:, :step + 1].clone())
        logits = hid[:, step] @ sd[
            f"talker.code_predictor.lm_head.{step - 1}.weight"
        ].T.float()
        code = logits.argmax(-1)
        codes.append(code)
        et = sd[f"talker.code_predictor.model.codec_embedding."
                f"{step - 1}.weight"].float()[code]
        embs.append(et)
        if step < G - 1:
            buf[:, step + 1] = proj(et)
    return torch.stack(codes, 1), torch.stack(embs, 0).sum(0)


def _o_talker_tower(sd, embeds):
    """Qwen3 backbone oracle (qk-norm BEFORE rope, NeoX rope), post
    final-norm hidden + codec-head logits of the last position."""
    x = embeds[None].float()
    b, t, _ = x.shape
    inv = 1.0 / (10000.0 ** (torch.arange(0, HD, 2).float() / HD))
    ang = torch.arange(t).float()[:, None] * inv[None]
    emb = torch.cat([ang, ang], dim=-1)
    cos, sin = emb.cos(), emb.sin()

    def rope(v):
        half = v.shape[-1] // 2
        rot = torch.cat([-v[..., half:], v[..., :half]], dim=-1)
        return v * cos[None, :, None, :] + rot * sin[None, :, None, :]

    for i in range(LAYERS):
        p = f"talker.model.layers.{i}"
        h = _rms(x, sd[f"{p}.input_layernorm.weight"])
        q = (h @ sd[f"{p}.self_attn.q_proj.weight"].T.float()
             ).view(b, t, HEADS, HD)
        k = (h @ sd[f"{p}.self_attn.k_proj.weight"].T.float()
             ).view(b, t, KV, HD)
        v = (h @ sd[f"{p}.self_attn.v_proj.weight"].T.float()
             ).view(b, t, KV, HD)
        q = _rms(q, sd[f"{p}.self_attn.q_norm.weight"])
        k = _rms(k, sd[f"{p}.self_attn.k_norm.weight"])
        q, k = rope(q), rope(k)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True).transpose(1, 2).reshape(b, t, -1)
        x = x + o @ sd[f"{p}.self_attn.o_proj.weight"].T.float()
        h = _rms(x, sd[f"{p}.post_attention_layernorm.weight"])
        gate = h @ sd[f"{p}.mlp.gate_proj.weight"].T.float()
        up = h @ sd[f"{p}.mlp.up_proj.weight"].T.float()
        x = x + (F.silu(gate) * up) @ \
            sd[f"{p}.mlp.down_proj.weight"].T.float()
    hn = _rms(x, sd["talker.model.norm.weight"])[0, -1]
    logits = hn @ sd["talker.codec_head.weight"].T.float()
    return hn, logits


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    from vllm_omni_tpu.models.qwen3_tts import load_qwen3_tts_checkpoint

    ck = load_qwen3_tts_checkpoint(ckpt_dir)
    dec, backbone = ck["backbone"]
    spec = ck["spec"]
    assert dec.qk_norm and dec.vocab_size == VOCAB
    assert spec.num_code_groups == G
    assert spec.spk_id == {"vivian": 60, "ryan": 61}
    assert ck["aux"]["text_embedding"].shape == (TXT_V, TXT_H)
    cp = ck["aux"]["cp"]
    assert cp["codec_embeddings"].shape == (G - 1, CB_VOCAB, HS)
    assert cp["lm_heads"].shape == (G - 1, CP_H, CB_VOCAB)
    assert "proj" in cp and cp["proj"]["w"].shape == (HS, CP_H)
    sd = _tiny_state_dict()
    np.testing.assert_allclose(
        np.asarray(backbone["lm_head"]["w"]),
        sd["talker.codec_head.weight"].numpy().T, rtol=1e-6)


def test_prompt_builder_parity(ckpt_dir):
    from vllm_omni_tpu.models.qwen3_tts import (build_talker_prompt,
                                                load_qwen3_tts_checkpoint)

    ck = load_qwen3_tts_checkpoint(ckpt_dir)
    _, backbone = ck["backbone"]
    sd = _tiny_state_dict()
    text_ids = [1, 2, 3, 10, 11, 12, 13, 4, 5, 6, 7, 8]
    for ns in (True, False):
        out = build_talker_prompt(ck["spec"], backbone, ck["aux"],
                                  text_ids, task_type="CustomVoice",
                                  speaker="Vivian", non_streaming=ns)
        prompt, tail, pad = _o_prompt(sd, text_ids, non_streaming=ns)
        np.testing.assert_allclose(out["prompt_embeds"],
                                   prompt.numpy(), rtol=2e-4,
                                   atol=2e-5)
        np.testing.assert_allclose(out["tailing_text_hidden"],
                                   tail.numpy(), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(out["tts_pad_embed"], pad.numpy(),
                                   rtol=2e-4, atol=2e-5)


def test_code_predictor_parity(ckpt_dir):
    from vllm_omni_tpu.models.qwen3_tts import (load_qwen3_tts_checkpoint,
                                                tts_cp_generate)

    ck = load_qwen3_tts_checkpoint(ckpt_dir)
    rng = np.random.default_rng(2)
    hid = rng.standard_normal((3, HS)).astype(np.float32)
    l0 = rng.standard_normal((3, HS)).astype(np.float32)
    codes, summed = tts_cp_generate(ck["aux"]["cp"], ck["spec"].cp,
                                    jnp.asarray(hid), jnp.asarray(l0))
    sd = _tiny_state_dict()
    want_codes, want_sum = _o_cp_generate(sd, torch.from_numpy(hid),
                                          torch.from_numpy(l0))
    np.testing.assert_array_equal(np.asarray(codes),
                                  want_codes.numpy())
    np.testing.assert_allclose(np.asarray(summed), want_sum.numpy(),
                               rtol=3e-4, atol=3e-4)


def test_engine_per_step_parity(ckpt_dir):
    """Full serving-loop parity over 4 steps: prompt embeds prefill →
    greedy masked sampling → in-loop code predictor conditions the next
    step with Σ group embeds + the popped text-hidden queue entry
    (reference talker_mtp + preprocess queue pop). CPU tier (argmax
    ties vs TPU accumulation)."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore
    from vllm_omni_tpu.models.qwen3_tts import (build_talker_prompt,
                                                load_qwen3_tts_checkpoint)

    if jax.devices()[0].platform != "cpu":
        pytest.skip("exact-argmax oracle parity is a CPU-tier test")

    ck = load_qwen3_tts_checkpoint(ckpt_dir)
    sd = _tiny_state_dict()
    text_ids = [1, 2, 3, 20, 21, 22, 4, 5, 6, 7, 8]
    built = build_talker_prompt(ck["spec"], ck["backbone"][1],
                                ck["aux"], text_ids,
                                speaker="vivian", non_streaming=False)
    steps = 4

    # ---- torch oracle ----
    ce = sd["talker.model.codec_embedding.weight"].float()
    mask = torch.full((VOCAB,), -1e30)
    mask[1:CB_VOCAB] = 0.0
    mask[EOS] = 0.0
    embeds = torch.from_numpy(built["prompt_embeds"]).float()
    tail = torch.from_numpy(built["tailing_text_hidden"]).float()
    pad = torch.from_numpy(built["tts_pad_embed"]).float()
    h, logits = _o_talker_tower(sd, embeds)
    tok = int((logits + mask).argmax())
    want_tokens, want_cols = [tok], []
    for s in range(steps - 1):
        codes, summed = _o_cp_generate(sd, h[None], ce[tok][None])
        col = [tok] + [int(c) for c in codes[0]]
        want_cols.append(col)
        text_step = tail[s] if s < tail.shape[0] else pad
        step_emb = ce[tok] + summed[0] + text_step
        embeds = torch.cat([embeds, step_emb[None]], dim=0)
        h, logits = _o_talker_tower(sd, embeds)
        tok = int((logits + mask).argmax())
        want_tokens.append(tok)

    # ---- engine ----
    config = EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=128,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=2)
    engine = EngineCore(config)
    assert engine.runner.step_conditioner is not None
    sp = SamplingParams(max_tokens=steps, temperature=0.0,
                        ignore_eos=True)
    engine.add_request(
        [], sp, request_id="t1",
        prompt_embeds=built["prompt_embeds"],
        additional_information={
            "tailing_text_hidden": built["tailing_text_hidden"],
            "tts_pad_embed": built["tts_pad_embed"]})
    out = engine.run_to_completion()[0]
    got_tokens = out.outputs[0].token_ids
    assert got_tokens == want_tokens, (got_tokens, want_tokens)
    codec = out.additional_information.get("codec_codes")
    assert codec is not None
    got = np.asarray(codec)
    want = np.asarray(want_cols).T  # [G, steps-1]
    n = min(got.shape[1], want.shape[1])
    assert n >= steps - 2
    np.testing.assert_array_equal(got[:, :n], want[:, :n])


def test_two_stage_e2e_with_real_12hz_decoder(ckpt_dir,
                                              tmp_path_factory):
    """Talker stage → real 12hz tokenizer code2wav stage: the streamed
    codec matrix decodes into a waveform of exactly
    T·total_upsample samples at the tokenizer's output rate."""
    from tests.models.test_qwen3_tts_tokenizer import (CFG as TOK_CFG,
                                                       _tiny_state_dict
                                                       as tok_sd)
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore
    from vllm_omni_tpu.models.qwen3_tts import (build_talker_prompt,
                                                load_qwen3_tts_checkpoint)

    tok_root = tmp_path_factory.mktemp("tok12_pipe")
    with open(tok_root / "config.json", "w") as f:
        json.dump(TOK_CFG, f)
    save_file(tok_sd(), str(tok_root / "model.safetensors"))

    ck = load_qwen3_tts_checkpoint(ckpt_dir)
    built = build_talker_prompt(ck["spec"], ck["backbone"][1],
                                ck["aux"], [1, 2, 3, 20, 21, 4, 5, 6,
                                            7, 8],
                                speaker="ryan", non_streaming=True)
    talker = EngineCore(EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=128,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=2))
    sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    talker.add_request(
        [], sp, request_id="t1", prompt_embeds=built["prompt_embeds"],
        additional_information={
            "tailing_text_hidden": built["tailing_text_hidden"],
            "tts_pad_embed": built["tts_pad_embed"]})
    out = talker.run_to_completion()[0]
    codes = out.additional_information.get("codec_codes")
    assert codes is not None
    codes = np.asarray(codes)
    assert codes.shape[0] == G and codes.shape[1] >= 3

    c2w = EngineCore(EngineConfig.from_kwargs(
        model=str(tok_root), dtype="float32", mode="generation",
        max_model_len=1024, num_pages=16, page_size=16,
        max_num_seqs=2, max_num_batched_tokens=64))
    assert "code2wav_tok12" in c2w.aux
    c2w.add_request(
        [int(x) for x in codes[0]], SamplingParams(max_tokens=1),
        request_id="w1",
        additional_information={"codec_codes": codes.tolist()})
    outs = []
    for _ in range(50):
        outs.extend(c2w.step())
        if outs:
            break
    assert outs and outs[0].multimodal_output
    audio = outs[0].multimodal_output["audio"]
    up = 8  # TOK_CFG: upsample_rates (2,2) x ratios (2,)
    assert audio["data"].shape == (codes.shape[1] * up,)
    assert audio["sample_rate"] == 24000
    assert np.isfinite(audio["data"]).all()


def test_base_voice_clone_xvector_prompt(ckpt_dir, tmp_path):
    """Base task: the ECAPA speaker embedding of a reference clip rides
    the prompt (x-vector mode); checkpoint speaker_encoder.* tensors
    load through models/speaker_encoder.py."""
    import tests.models.test_speaker_encoder as tse
    from vllm_omni_tpu.models.qwen3_tts import (build_talker_prompt,
                                                load_qwen3_tts_checkpoint)
    from vllm_omni_tpu.models.speaker_encoder import (
        extract_speaker_embedding)

    # checkpoint variant that ships a speaker encoder sized to HS
    se_cfg_json = {"mel_dim": 8, "enc_dim": HS,
                   "enc_channels": [16, 16, 16, 16, 24],
                   "enc_kernel_sizes": [5, 3, 3, 3, 1],
                   "enc_dilations": [1, 2, 3, 4, 1],
                   "enc_attention_channels": 8, "enc_res2net_scale": 4,
                   "enc_se_channels": 8, "sample_rate": 16000}
    cfg2 = dict(CONFIG, speaker_encoder_config=se_cfg_json)
    sd = _tiny_state_dict()
    sd.pop("speaker_encoder.blocks.0.conv.weight")
    se_cfg = tse.SpeakerEncoderConfig.from_json(se_cfg_json)
    g = torch.Generator().manual_seed(9)
    old_cfg = tse.CFG
    tse.CFG = se_cfg
    try:
        se_sd = tse._tiny_state_dict(seed=9)
    finally:
        tse.CFG = old_cfg
    for k, v in se_sd.items():
        sd["speaker_encoder." + k] = v
    root = tmp_path / "tts_with_se"
    root.mkdir()
    with open(root / "config.json", "w") as f:
        json.dump(cfg2, f)
    save_file(sd, str(root / "model.safetensors"))

    ck = load_qwen3_tts_checkpoint(str(root))
    assert "speaker_encoder" in ck["aux"]
    wav = np.sin(np.linspace(0, 80, 6000)).astype(np.float32) * 0.4
    emb = extract_speaker_embedding(ck["aux"]["speaker_encoder"][1],
                                    ck["aux"]["speaker_encoder"][0],
                                    wav)
    assert emb.shape == (HS,)
    text_ids = [1, 2, 3, 20, 21, 4, 5, 6, 7, 8]
    out = build_talker_prompt(ck["spec"], ck["backbone"][1], ck["aux"],
                              text_ids, task_type="Base",
                              speaker_embed=emb, non_streaming=False)
    # Base prompt layout: role(3) + codec_prefix(prefill3 + xvec + pad
    # = 5 rows) + first_text(1)
    assert out["prompt_embeds"].shape[0] == 3 + 5 + 1
    # the x-vector row is tts_pad + emb
    sd_t = _tiny_state_dict()
    tts_pad = out["tts_pad_embed"]
    np.testing.assert_allclose(
        out["prompt_embeds"][3 + 3], tts_pad + emb, rtol=1e-4,
        atol=1e-5)


def test_base_icl_voice_clone_prompt(ckpt_dir):
    """Base in-context cloning (reference _generate_icl_prompt
    qwen3_tts_talker.py:1163): [ref, target] text embeds overlay the
    reference codec-frame embeds (group 0 = talker table, residual
    groups = code-predictor tables) behind a codec_bos prefix."""
    from vllm_omni_tpu.models.qwen3_tts import (_text_project,
                                                build_talker_prompt,
                                                load_qwen3_tts_checkpoint)

    ck = load_qwen3_tts_checkpoint(ckpt_dir)
    spec, aux = ck["spec"], ck["aux"]
    codec_emb = np.asarray(ck["backbone"][1]["embed"], np.float32)
    rng = np.random.default_rng(13)
    text_ids = [1, 2, 3, 20, 21, 22, 4, 5, 6, 7, 8]
    ref_ids = [1, 2, 3, 30, 31, 32, 33, 9, 10]
    t_ref = 4
    ref_codes = rng.integers(0, 8, (t_ref, G)).astype(np.int64)
    emb = rng.standard_normal((HS,)).astype(np.float32) * 0.1

    out = build_talker_prompt(spec, ck["backbone"][1], aux, text_ids,
                              task_type="Base", speaker_embed=emb,
                              non_streaming=True, ref_ids=ref_ids,
                              ref_codes=ref_codes)
    # layout: role(3) + codec_prefix(prefill3 + xvec + pad = 5) +
    # text_embed(ref 4 + tgt 3 + eos = 8) + codec(bos + T_ref)
    t_len = (len(ref_ids) - 5) + (len(text_ids) - 8) + 1
    c_len = 1 + t_ref
    assert out["prompt_embeds"].shape[0] == 3 + 5 + t_len + c_len
    # expected codec-frame sum rows: talker table + cp residual tables
    cp_tables = np.asarray(aux["cp"]["codec_embeddings"], np.float32)
    want = codec_emb[ref_codes[:, 0]]
    for g in range(1, G):
        want = want + cp_tables[g - 1][ref_codes[:, g]]
    tts_pad = out["tts_pad_embed"]
    got_codec = out["prompt_embeds"][3 + 5 + t_len:]
    np.testing.assert_allclose(
        got_codec[0], codec_emb[spec.codec_bos_id] + tts_pad,
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got_codec[1:], want + tts_pad[None],
                               rtol=1e-4, atol=1e-5)
    # text rows ride on codec_pad embeds
    txt = np.concatenate([
        _text_project(aux, np.asarray(ref_ids, np.int64)[3:-2]),
        _text_project(aux, np.asarray(text_ids, np.int64)[3:-5])],
        axis=0)
    np.testing.assert_allclose(
        out["prompt_embeds"][8:8 + t_len - 1],
        txt + codec_emb[spec.codec_pad_id][None], rtol=1e-4,
        atol=1e-5)

    # streaming: text (8 rows) > codec (5 rows) → overlap-add + the
    # overhang becomes the tailing queue
    out_s = build_talker_prompt(spec, ck["backbone"][1], aux, text_ids,
                                task_type="Base", speaker_embed=emb,
                                non_streaming=False, ref_ids=ref_ids,
                                ref_codes=ref_codes)
    assert out_s["prompt_embeds"].shape[0] == 3 + 5 + c_len
    assert out_s["tailing_text_hidden"].shape[0] == t_len - c_len
    np.testing.assert_allclose(
        out_s["prompt_embeds"][8],
        txt[0] + codec_emb[spec.codec_bos_id], rtol=1e-4, atol=1e-5)
