"""Voxtral TTS family tests.

Numeric oracles are independent torch re-implementations of the
reference semantics (voxtral_tts_audio_generation.py decode_one_frame
:511-558 Euler CFG flow over the FSQ space, _predict_velocity:559,
TimeEmbedding:376; voxtral_tts_audio_tokenizer.py MistralAudioCodebook
decode:288, ALiBi sliding-window attention:525-573 with qk-norm over
the flattened head dim, LayerScale TransformerBlock:606, CausalConv1d
:357 / CausalConvTranspose1d:394 padding, MultiVocabEmbeddings:428
offset-sum) so transpose/naming/order mistakes cannot cancel out."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.voxtral_tts import (  # noqa: E402
    VoxtralCodecArgs, VoxtralTTSSpec, acoustic_decode_frame,
    alibi_slopes, build_voxtral_prompt, is_voxtral_tts_config,
    load_voxtral_tts_checkpoint, multivocab_embed, semantic_logit_mask,
    strip_at_eoa, voxtral_code2wav)

HS = 32            # llm hidden
ATD, ATH = 16, 8   # acoustic transformer dim / head_dim
SEM, LEV, NAC = 10, 5, 4
CDIM, CHD = 16, 8  # codec dim / head_dim
SDIM = 6           # semantic codebook dim
PATCH = 4
HF = {
    "model_type": "voxtral_tts",
    "architectures": ["VoxtralTTSForConditionalGeneration"],
    "text_config": {
        "architectures": ["MistralForCausalLM"],
        "vocab_size": 64, "hidden_size": HS,
        "intermediate_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
    },
    "audio_config": {
        "audio_model_args": {
            "semantic_codebook_size": SEM,
            "acoustic_codebook_size": LEV,
            "n_acoustic_codebook": NAC,
            "acoustic_transformer_args": {
                "input_dim": HS, "dim": ATD, "n_layers": 1,
                "head_dim": ATH, "hidden_dim": 32, "n_heads": 2,
                "n_kv_heads": 1, "norm_eps": 1e-5,
                "n_decoding_steps": 4,
            },
        },
        "codec_args": {
            "sampling_rate": 2400,
            "pretransform_patch_size": PATCH,
            "patch_proj_kernel_size": 3,
            "semantic_codebook_size": SEM, "semantic_dim": SDIM,
            "acoustic_codebook_size": LEV, "acoustic_dim": NAC,
            "dim": CDIM, "hidden_dim": 32, "head_dim": CHD,
            "n_heads": 2, "n_kv_heads": 2, "qk_norm": True,
            "qk_norm_eps": 1e-6, "norm_eps": 1e-2,
            "layer_scale": True, "attn_sliding_window_size": 4,
            "half_attn_window_upon_downsampling": True,
            "decoder_transformer_lengths_str": "1,1",
            "decoder_convs_kernels_str": "3,4",
            "decoder_convs_strides_str": "1,2",
        },
    },
}


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, o, i, bias=False):
        sd[f"{prefix}.weight"] = torch.randn(o, i, generator=g) * \
            (i ** -0.5)
        if bias:
            sd[f"{prefix}.bias"] = torch.randn(o, generator=g) * 0.02

    # Mistral backbone (bare model.* naming per reference
    # llm_weights_generator)
    sd["model.embed_tokens.weight"] = torch.randn(64, HS,
                                                  generator=g) * 0.02
    for li in range(2):
        p = f"model.layers.{li}"
        put(f"{p}.self_attn.q_proj", 4 * 8, HS)
        put(f"{p}.self_attn.k_proj", 2 * 8, HS)
        put(f"{p}.self_attn.v_proj", 2 * 8, HS)
        put(f"{p}.self_attn.o_proj", HS, 4 * 8)
        put(f"{p}.mlp.gate_proj", 64, HS)
        put(f"{p}.mlp.up_proj", 64, HS)
        put(f"{p}.mlp.down_proj", HS, 64)
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            HS, generator=g) + 0.5
    sd["model.norm.weight"] = torch.rand(HS, generator=g) + 0.5
    # acoustic transformer
    spec = VoxtralTTSSpec.from_config(HF)
    put("acoustic_transformer.semantic_codebook_output",
        spec.semantic_head_dim, HS)
    put("acoustic_transformer.acoustic_codebook_output", NAC, ATD)
    put("acoustic_transformer.input_projection", ATD, NAC)
    put("acoustic_transformer.time_projection", ATD, ATD)
    put("acoustic_transformer.llm_projection", ATD, HS)
    half = ATD // 2
    sd["acoustic_transformer.time_embedding.inv_freq"] = torch.exp(
        -math.log(10000.0) * torch.arange(half).float() / half)
    p = "acoustic_transformer.layers.0"
    put(f"{p}.attention.wq", 2 * ATH, ATD)
    put(f"{p}.attention.wk", 1 * ATH, ATD)
    put(f"{p}.attention.wv", 1 * ATH, ATD)
    put(f"{p}.attention.wo", ATD, 2 * ATH)
    put(f"{p}.feed_forward.w1", 32, ATD)
    put(f"{p}.feed_forward.w2", ATD, 32)
    put(f"{p}.feed_forward.w3", 32, ATD)
    sd[f"{p}.attention_norm.weight"] = torch.rand(ATD,
                                                  generator=g) + 0.5
    sd[f"{p}.ffn_norm.weight"] = torch.rand(ATD, generator=g) + 0.5
    sd["acoustic_transformer.norm.weight"] = torch.rand(
        ATD, generator=g) + 0.5
    # multivocab table
    sd["mm_audio_embeddings.audio_codebook_embeddings.embeddings"
       ".weight"] = torch.randn(spec.embed_vocab, HS,
                                generator=g) * 0.02
    # codec decoder (weight-normed convs: store weight_g/weight_v)
    def conv_wn(prefix, o, i, k):
        v = torch.randn(o, i, k, generator=g) * 0.1
        gg = torch.rand(o, 1, 1, generator=g) + 0.5
        sd[f"{prefix}.conv.weight_g"] = gg
        sd[f"{prefix}.conv.weight_v"] = v

    # decoder_blocks flat order: [conv_in, T0, up0, T1]
    conv_wn("audio_tokenizer.decoder_blocks.0", CDIM, SDIM + NAC, 3)
    for bi, si in ((1, 0), (3, 1)):
        p = f"audio_tokenizer.decoder_blocks.{bi}.layers.0"
        put(f"{p}.attention.wq", 2 * CHD, CDIM)
        put(f"{p}.attention.wk", 2 * CHD, CDIM)
        put(f"{p}.attention.wv", 2 * CHD, CDIM)
        put(f"{p}.attention.wo", CDIM, 2 * CHD)
        sd[f"{p}.attention.q_norm.weight"] = torch.rand(
            2 * CHD, generator=g) + 0.5
        sd[f"{p}.attention.k_norm.weight"] = torch.rand(
            2 * CHD, generator=g) + 0.5
        put(f"{p}.feed_forward.w1", 32, CDIM)
        put(f"{p}.feed_forward.w2", CDIM, 32)
        put(f"{p}.feed_forward.w3", 32, CDIM)
        sd[f"{p}.attention_norm.weight"] = torch.rand(
            CDIM, generator=g) + 0.5
        sd[f"{p}.ffn_norm.weight"] = torch.rand(CDIM,
                                                generator=g) + 0.5
        sd[f"{p}.attention_scale"] = torch.rand(CDIM,
                                                generator=g) * 0.2
        sd[f"{p}.ffn_scale"] = torch.rand(CDIM, generator=g) * 0.2
    # transposed conv (torch ConvTranspose1d weight [I, O, K])
    v = torch.randn(CDIM, CDIM, 4, generator=g) * 0.1
    gg = torch.rand(CDIM, 1, 1, generator=g) + 0.5
    sd["audio_tokenizer.decoder_blocks.2.conv.weight_g"] = gg
    sd["audio_tokenizer.decoder_blocks.2.conv.weight_v"] = v
    conv_wn("audio_tokenizer.output_proj", PATCH, CDIM, 3)
    sd["audio_tokenizer.quantizer.semantic_codebook.embedding_sum"] = \
        torch.randn(SEM, SDIM, generator=g)
    sd["audio_tokenizer.quantizer.semantic_codebook.cluster_usage"] = \
        torch.rand(SEM, generator=g) * 4 + 0.5
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("voxtral_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracles
# ---------------------------------------------------------------------------


def _wn(sd, prefix):
    g = sd[f"{prefix}.conv.weight_g"].float()
    v = sd[f"{prefix}.conv.weight_v"].float()
    return g * v / v.norm(dim=(1, 2), keepdim=True)


def _o_rms(x, w, eps):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(var + eps)) * w.float()


def _o_lin(sd, prefix, x):
    out = x.float() @ sd[f"{prefix}.weight"].T.float()
    if f"{prefix}.bias" in sd:
        out = out + sd[f"{prefix}.bias"].float()
    return out


def _o_at(sd, x):
    """Acoustic transformer over [B, 3, D]."""
    b, s, _ = x.shape
    p = "acoustic_transformer.layers.0"
    h = _o_rms(x, sd[f"{p}.attention_norm.weight"], 1e-5)
    q = _o_lin(sd, f"{p}.attention.wq", h).reshape(b, s, 2, ATH)
    k = _o_lin(sd, f"{p}.attention.wk", h).reshape(b, s, 1, ATH)
    v = _o_lin(sd, f"{p}.attention.wv", h).reshape(b, s, 1, ATH)
    kr = k.repeat_interleave(2, dim=2)
    vr = v.repeat_interleave(2, dim=2)
    sc = torch.einsum("bqhd,bkhd->bhqk", q, kr) * (ATH ** -0.5)
    o = torch.einsum("bhqk,bkhd->bqhd", torch.softmax(sc, -1),
                     vr).reshape(b, s, 2 * ATH)
    x = x + _o_lin(sd, f"{p}.attention.wo", o)
    h = _o_rms(x, sd[f"{p}.ffn_norm.weight"], 1e-5)
    up = F.silu(_o_lin(sd, f"{p}.feed_forward.w1", h)) * \
        _o_lin(sd, f"{p}.feed_forward.w3", h)
    x = x + _o_lin(sd, f"{p}.feed_forward.w2", up)
    return _o_rms(x, sd["acoustic_transformer.norm.weight"], 1e-5)


def _o_velocity(sd, x_t, llm, t_emb):
    toks = torch.stack([
        _o_lin(sd, "acoustic_transformer.input_projection", x_t),
        _o_lin(sd, "acoustic_transformer.time_projection", t_emb),
        _o_lin(sd, "acoustic_transformer.llm_projection", llm),
    ], dim=1)
    h = _o_at(sd, toks)
    return _o_lin(sd, "acoustic_transformer.acoustic_codebook_output",
                  h[:, 0])


def _o_decode_frame(sd, semantic, llm, noise, n_steps=4, alpha=1.2):
    b = llm.shape[0]
    inv = sd["acoustic_transformer.time_embedding.inv_freq"].float()
    ts = torch.linspace(0, 1, n_steps + 1)
    x = noise.clone().float()
    for i in range(n_steps):
        t, dt = ts[i], ts[i + 1] - ts[i]
        emb = torch.einsum("bi,j->bj", t.view(1, 1).repeat(b, 1), inv)
        t_emb = torch.cat([emb.cos(), emb.sin()], dim=-1)
        v_c = _o_velocity(sd, x, llm, t_emb)
        v_u = _o_velocity(sd, x, torch.zeros_like(llm), t_emb)
        v = alpha * v_c + (1 - alpha) * v_u
        x = x + v * dt
    x = torch.clamp(x, -1, 1)
    codes = (((x + 1) / 2) * (LEV - 1)).round().long()
    codes[semantic == 1] = 0
    return codes + 2


def _o_codec_attn(sd, prefix, x, window):
    t = x.shape[1]
    q = _o_lin(sd, f"{prefix}.attention.wq", x)
    k = _o_lin(sd, f"{prefix}.attention.wk", x)
    v = _o_lin(sd, f"{prefix}.attention.wv", x)
    q = _o_rms(q, sd[f"{prefix}.attention.q_norm.weight"], 1e-6)
    k = _o_rms(k, sd[f"{prefix}.attention.k_norm.weight"], 1e-6)
    q = q.reshape(1, t, 2, CHD)
    k = k.reshape(1, t, 2, CHD)
    v = v.reshape(1, t, 2, CHD)
    pos = torch.arange(t)
    rel = pos[None, :] - pos[:, None]
    slopes = torch.from_numpy(alibi_slopes(2)).float()
    bias = slopes.view(2, 1, 1) * rel[None].float()
    bias = bias.masked_fill((rel > 0) | (rel < -window), -float("inf"))
    sc = torch.einsum("bqhd,bkhd->bhqk", q, k) * (CHD ** -0.5)
    pr = torch.softmax(sc + bias[None], dim=-1)
    o = torch.einsum("bhqk,bkhd->bqhd", pr, v).reshape(1, t, 2 * CHD)
    return _o_lin(sd, f"{prefix}.attention.wo", o)


def _o_codec_block(sd, prefix, x, window):
    h = _o_rms(x, sd[f"{prefix}.attention_norm.weight"], 1e-2)
    r = _o_codec_attn(sd, prefix, h, window) * \
        sd[f"{prefix}.attention_scale"].float()
    x = x + r
    h = _o_rms(x, sd[f"{prefix}.ffn_norm.weight"], 1e-2)
    up = F.silu(_o_lin(sd, f"{prefix}.feed_forward.w1", h)) * \
        _o_lin(sd, f"{prefix}.feed_forward.w3", h)
    x = x + _o_lin(sd, f"{prefix}.feed_forward.w2", up) * \
        sd[f"{prefix}.ffn_scale"].float()
    return x


def _o_causal_conv(x, w, kernel, stride, pad_mode):
    # x [B, C, T]
    pad_total = kernel - stride
    t = x.shape[-1]
    n_frames = (t - kernel + pad_total) / stride + 1
    target = (math.ceil(n_frames) - 1) * stride + (kernel - pad_total)
    extra = max(target - t, 0)
    x = F.pad(x, (pad_total, extra), mode=pad_mode)
    return F.conv1d(x, w, stride=stride)


def _o_code2wav(sd, codes):
    """codes [1, K, T] raw ids."""
    emb_sum = sd["audio_tokenizer.quantizer.semantic_codebook"
                 ".embedding_sum"].float()
    usage = sd["audio_tokenizer.quantizer.semantic_codebook"
               ".cluster_usage"].float()
    table = emb_sum / usage.clamp(min=1e-5)[:, None]
    sem = F.embedding(codes[:, 0].long(), table)  # [1, T, SDIM]
    ac = codes[:, 1:].float() * 2 / (LEV - 1) - 1  # [1, NAC, T]
    lat = torch.cat([sem.transpose(1, 2), ac], dim=1)  # [1, D, T]
    x = _o_causal_conv(lat, _wn(sd, "audio_tokenizer.decoder_blocks.0"),
                       3, 1, "replicate")
    x = x.transpose(1, 2)  # [1, T, D]
    window = 4
    x = _o_codec_block(sd, "audio_tokenizer.decoder_blocks.1.layers.0",
                       x, window)
    # transposed conv upsample (k=4, s=2): trim k-s from the right
    w = _wn(sd, "audio_tokenizer.decoder_blocks.2")
    up = F.conv_transpose1d(x.transpose(1, 2), w, stride=2)
    up = up[..., : up.shape[-1] - 2]
    x = up.transpose(1, 2)
    window *= 2
    x = _o_codec_block(sd, "audio_tokenizer.decoder_blocks.3.layers.0",
                       x, window)
    out = _o_causal_conv(x.transpose(1, 2),
                         _wn(sd, "audio_tokenizer.output_proj"), 3, 1,
                         "reflect")  # [1, PATCH, T]
    return out.transpose(1, 2).reshape(1, -1)  # unfold (t h)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_spec_and_loader(ckpt_dir):
    assert is_voxtral_tts_config(HF)
    spec = VoxtralTTSSpec.from_config(HF)
    assert spec.codebook_sizes == [SEM + 2] + [LEV + 2] * NAC
    np.testing.assert_array_equal(
        spec.offsets, np.cumsum([0, SEM + 2] + [LEV + 2] * (NAC - 1)))
    assert spec.semantic_head_dim == 128 and spec.num_groups == 1 + NAC
    ck = load_voxtral_tts_checkpoint(ckpt_dir, dtype=jnp.float32)
    cfg, params = ck["backbone"]
    assert cfg.vocab_size == 128  # lm_head replaced by semantic head
    assert params["lm_head"]["w"].shape == (HS, 128)
    assert ck["aux"]["embed_table"].shape == (spec.embed_vocab, HS)
    cargs, codec = ck["codec"]
    assert codec["conv_in"]["w"].shape == (3, SDIM + NAC, CDIM)
    assert codec["stages"][0]["up"]["w"].shape == (4, CDIM, CDIM)


def test_acoustic_frame_parity_vs_torch(ckpt_dir):
    ck = load_voxtral_tts_checkpoint(ckpt_dir, dtype=jnp.float32)
    spec, aux = ck["spec"], ck["aux"]
    sd = _tiny_state_dict()
    rng = np.random.default_rng(0)
    llm = rng.standard_normal((3, HS)).astype(np.float32)
    noise = rng.standard_normal((3, NAC)).astype(np.float32)
    semantic = np.asarray([5, 1, 7], np.int32)  # row 1 = END_AUDIO
    got = np.asarray(acoustic_decode_frame(
        aux["head"], spec, jnp.asarray(semantic), jnp.asarray(llm),
        jnp.asarray(noise)))
    golden = _o_decode_frame(sd, torch.from_numpy(semantic),
                             torch.from_numpy(llm),
                             torch.from_numpy(noise)).numpy()
    np.testing.assert_array_equal(got, golden)
    assert (got[1] == 2).all()  # END row → EMPTY(0) + offset 2
    assert got.min() >= 2 and got.max() <= 2 + LEV - 1


def test_multivocab_embed_offsets(ckpt_dir):
    ck = load_voxtral_tts_checkpoint(ckpt_dir, dtype=jnp.float32)
    spec, aux = ck["spec"], ck["aux"]
    sd = _tiny_state_dict()
    table = sd["mm_audio_embeddings.audio_codebook_embeddings"
               ".embeddings.weight"].float()
    codes = np.asarray([[3, 2, 4, 6, 2]], np.int32)
    got = np.asarray(multivocab_embed(
        aux["embed_table"], jnp.asarray(spec.offsets),
        jnp.asarray(codes)))
    off = torch.from_numpy(np.asarray(spec.offsets)).long()
    golden = table[torch.from_numpy(codes).long() + off[None]].sum(1)
    np.testing.assert_allclose(got, golden.numpy(), rtol=1e-5,
                               atol=1e-5)


def test_code2wav_parity_vs_torch(ckpt_dir):
    ck = load_voxtral_tts_checkpoint(ckpt_dir, dtype=jnp.float32)
    cargs, codec = ck["codec"]
    rng = np.random.default_rng(1)
    t = 6
    codes = np.concatenate([
        rng.integers(0, SEM, (1, 1, t)),
        rng.integers(0, LEV, (1, NAC, t))], axis=1).astype(np.int32)
    got = np.asarray(voxtral_code2wav(codec, cargs,
                                      jnp.asarray(codes)))
    golden = _o_code2wav(_tiny_state_dict(),
                         torch.from_numpy(codes)).numpy()
    assert got.shape == golden.shape == (1, t * 2 * PATCH)
    np.testing.assert_allclose(got, golden, rtol=3e-4, atol=3e-4)


def test_strip_at_eoa():
    codes = np.asarray([[5, 3, 4], [6, 2, 2], [1, 2, 2], [7, 3, 3]],
                       np.int32)
    raw = strip_at_eoa(codes)
    np.testing.assert_array_equal(raw, codes[:2] - 2)
    # no EOA → full length
    assert strip_at_eoa(codes[:2]).shape == (2, 3)


def test_semantic_logit_mask():
    spec = VoxtralTTSSpec.from_config(HF)
    row = semantic_logit_mask(spec)
    assert row.shape == (128,)
    assert row[0] < -1e29             # EMPTY masked
    assert row[1] == 0.0              # END allowed
    assert (row[2:2 + SEM] == 0).all()
    assert (row[2 + SEM:] < -1e29).all()


def test_engine_end_to_end_two_stage(ckpt_dir):
    """Stage 0: Mistral backbone with the semantic-code lm_head + the
    in-loop acoustic flow conditioner streams [semantic, acoustic×N]
    frames; stage 1 (hf_config_name=audio_tokenizer): codec decode to
    a waveform."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    eng = EngineCore(EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=64,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=2))
    assert "voxtral" in eng.aux
    assert eng.runner.step_conditioner is not None
    sp = SamplingParams(max_tokens=5, temperature=0.0,
                        ignore_eos=True)
    eng.add_request([3, 9, 17, 25], sp, request_id="r0")
    out = eng.run_to_completion()[0]
    toks = out.outputs[0].token_ids
    assert all(t != 0 and t < 2 + SEM for t in toks)
    codes = out.additional_information.get("codec_codes")
    assert codes is not None
    codes = np.asarray(codes)  # [T, K]
    assert codes.shape[1] == 1 + NAC
    assert codes.shape[0] >= len(toks) - 1
    np.testing.assert_array_equal(codes[:, 0],
                                  np.asarray(toks)[:codes.shape[0]])
    assert (codes[:, 1:] >= 2).all() and \
        (codes[:, 1:] <= 2 + LEV - 1).all()

    # stage 1: audio_tokenizer decode (append an END frame)
    end = np.full((1, 1 + NAC), 2, np.int64)
    end[0, 0] = 1
    full = np.concatenate([codes, end], axis=0)
    eng2 = EngineCore(EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", mode="generation",
        max_model_len=64, num_pages=16, page_size=16,
        max_num_seqs=2, max_num_batched_tokens=64,
        hf_config_name="audio_tokenizer"))
    assert "code2wav_voxtral" in eng2.aux
    eng2.add_request([1], SamplingParams(max_tokens=1),
                     request_id="w0",
                     additional_information={
                         "codec_codes": full.tolist()})
    outs = []
    for _ in range(50):
        outs.extend(eng2.step())
        if outs:
            break
    assert outs and outs[0].multimodal_output
    audio = outs[0].multimodal_output["audio"]
    wav = np.asarray(audio["data"], np.float32)
    assert wav.shape == (codes.shape[0] * 2 * PATCH,)
    assert np.isfinite(wav).all()
    assert audio["sample_rate"] == 2400
