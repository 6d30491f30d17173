"""MiMo-Audio grouped dual-AR: real checkpoint geometry + parity +
engine integration.

Method as test_fish_speech.py: the checkpoint fixture is written with
the genuine HF naming (model.layers.N.self_attn..., local_transformer /
input_local_transformer Qwen2 towers, speech_embeddings.N RVQ tables,
local_transformer_lm_heads.N, speech_group_downcast /
hidden_states_downcast), and the numeric oracle is an independent torch
re-implementation of the reference semantics
(mimo_audio_llm.py base_local_forward :786 delay-pattern local decode,
:960-1004 non-causal input group encoding)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.models.mimo_audio import (MiMoAudioConfig,  # noqa: E402
                                             encode_groups, local_decode,
                                             load_mimo_audio_checkpoint)

HF_TINY = {
    "architectures": ["MiMoAudioForCausalLM"],
    "model_type": "mimo_audio",
    "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "rope_theta": 10000.0,
    "rms_norm_eps": 1e-6, "eos_token_id": 3,
    # mimo extras (config_mimo_audio.py)
    "speech_vocab_size": "33-33-17-17", "speech_zeroemb_idx": "32-32-16-16",
    "delay_pattern": "0-1-2-3", "group_size": 2, "audio_channels": 4,
    "local_dim": 32, "local_layers": 2, "local_attn_heads": 4,
    "local_ffn_dim": 64, "input_local_layers": 1, "input_local_dim": 24,
}


def _qwen2_layer_sd(g, prefix, h, inter, q, kv, hd, sd):
    def put(name, n_out, n_in, bias):
        sd[f"{prefix}.{name}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)
        if bias:
            sd[f"{prefix}.{name}.bias"] = torch.randn(
                n_out, generator=g) * 0.02

    put("self_attn.q_proj", q * hd, h, True)
    put("self_attn.k_proj", kv * hd, h, True)
    put("self_attn.v_proj", kv * hd, h, True)
    put("self_attn.o_proj", h, q * hd, False)
    put("mlp.gate_proj", inter, h, False)
    put("mlp.up_proj", inter, h, False)
    put("mlp.down_proj", h, inter, False)
    sd[f"{prefix}.input_layernorm.weight"] = torch.rand(
        h, generator=g) + 0.5
    sd[f"{prefix}.post_attention_layernorm.weight"] = torch.rand(
        h, generator=g) + 0.5


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    hf = HF_TINY
    h = hf["hidden_size"]
    sd = {}
    sd["model.embed_tokens.weight"] = torch.randn(
        hf["vocab_size"], h, generator=g) * 0.02
    sd["model.norm.weight"] = torch.rand(h, generator=g) + 0.5
    sd["lm_head.weight"] = torch.randn(hf["vocab_size"], h,
                                       generator=g) * (h ** -0.5)
    for i in range(hf["num_hidden_layers"]):
        _qwen2_layer_sd(g, f"model.layers.{i}", h,
                        hf["intermediate_size"],
                        hf["num_attention_heads"],
                        hf["num_key_value_heads"], hf["head_dim"], sd)
    ld, ild = hf["local_dim"], hf["input_local_dim"]
    lh = hf["local_attn_heads"]
    for i in range(hf["local_layers"]):
        _qwen2_layer_sd(g, f"local_transformer.layers.{i}", ld,
                        hf["local_ffn_dim"], lh, lh, ld // lh, sd)
    sd["local_transformer.norm.weight"] = torch.rand(
        ld, generator=g) + 0.5
    for i in range(hf["input_local_layers"]):
        _qwen2_layer_sd(g, f"input_local_transformer.layers.{i}", ild,
                        ild * 4, lh, lh, ild // lh, sd)
    sd["input_local_transformer.norm.weight"] = torch.rand(
        ild, generator=g) + 0.5
    vocabs = [int(v) for v in hf["speech_vocab_size"].split("-")]
    for i, v in enumerate(vocabs):
        sd[f"speech_embeddings.{i}.weight"] = torch.randn(
            v, ild, generator=g) * 0.1
        sd[f"local_transformer_lm_heads.{i}.weight"] = torch.randn(
            v, ld, generator=g) * (ld ** -0.5)
    sd["speech_group_downcast.weight"] = torch.randn(
        h, ild * hf["group_size"], generator=g) * 0.05
    sd["hidden_states_downcast.weight"] = torch.randn(
        ld, h, generator=g) * 0.05
    sd["speech_embeddings_to_local.weight"] = torch.randn(
        ld, ild, generator=g) * 0.1
    return sd


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("mimo_tiny")
    with open(root / "config.json", "w") as f:
        json.dump(HF_TINY, f)
    save_file(_tiny_state_dict(), str(root / "model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Torch oracle (HF Qwen2 semantics + reference local loops)
# ---------------------------------------------------------------------------


def _torch_rope(x, theta, hd):
    # HF Qwen2: half-split rope over positions 0..S-1
    b, s, nh, d = x.shape
    inv = 1.0 / theta ** (torch.arange(0, d, 2).float() / d)
    t = torch.arange(s).float()
    freqs = torch.outer(t, inv)
    cos = torch.cat([freqs.cos(), freqs.cos()], dim=-1)[None, :, None]
    sin = torch.cat([freqs.sin(), freqs.sin()], dim=-1)[None, :, None]
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    rot = torch.cat([-x2, x1], dim=-1)
    return x * cos + rot * sin


def _torch_local_forward(sd, prefix, cfg_local, x, causal):
    h = x.shape[-1]
    nh = cfg_local["heads"]
    hd = h // nh
    eps = 1e-6

    def rms(x, name):
        return x / torch.sqrt((x ** 2).mean(-1, keepdim=True) + eps) \
            * sd[name].float()

    def lin(x, name, bias):
        y = x @ sd[f"{name}.weight"].float().T
        if bias:
            y = y + sd[f"{name}.bias"].float()
        return y

    for i in range(cfg_local["layers"]):
        p = f"{prefix}.layers.{i}"
        xn = rms(x, f"{p}.input_layernorm.weight")
        b, s, _ = xn.shape
        q = lin(xn, f"{p}.self_attn.q_proj", True).view(b, s, nh, hd)
        k = lin(xn, f"{p}.self_attn.k_proj", True).view(b, s, nh, hd)
        v = lin(xn, f"{p}.self_attn.v_proj", True).view(b, s, nh, hd)
        q = _torch_rope(q, 10000.0, hd)
        k = _torch_rope(k, 10000.0, hd)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=causal)
        o = o.transpose(1, 2).reshape(b, s, h)
        x = x + lin(o, f"{p}.self_attn.o_proj", False)
        xn = rms(x, f"{p}.post_attention_layernorm.weight")
        gate = lin(xn, f"{p}.mlp.gate_proj", False)
        up = lin(xn, f"{p}.mlp.up_proj", False)
        x = x + lin(torch.nn.functional.silu(gate) * up,
                    f"{p}.mlp.down_proj", False)
    return rms(x, f"{prefix}.norm.weight")


def test_encode_groups_matches_torch_oracle(ckpt_dir):
    ck = load_mimo_audio_checkpoint(ckpt_dir, dtype=jnp.float32)
    mcfg, aux = ck["aux"]
    sd = _tiny_state_dict()
    rng = np.random.default_rng(0)
    codes = np.stack([rng.integers(0, v, (1, 3, mcfg.group_size))
                      for v in mcfg.speech_vocab_sizes],
                     axis=-1).astype(np.int32)
    ours = np.asarray(encode_groups(aux, mcfg, jnp.asarray(codes)))

    # oracle: summed per-channel embeddings → non-causal ILT → downcast
    x = torch.zeros(1, 3, mcfg.group_size, mcfg.input_local.hidden_size)
    for i in range(mcfg.audio_channels):
        tab = sd[f"speech_embeddings.{i}.weight"].float()
        x = x + tab[torch.from_numpy(codes[..., i]).long()]
    h = _torch_local_forward(
        sd, "input_local_transformer",
        {"layers": HF_TINY["input_local_layers"],
         "heads": HF_TINY["local_attn_heads"]},
        x.reshape(3, mcfg.group_size, -1), causal=False)
    h = h.reshape(1, 3, -1)
    want = h @ sd["speech_group_downcast.weight"].float().T
    np.testing.assert_allclose(ours, want.numpy(), rtol=2e-4, atol=2e-4)


def test_local_decode_matches_torch_oracle(ckpt_dir):
    """Greedy delay-pattern local decode == the reference
    base_local_forward loop re-implemented in torch."""
    ck = load_mimo_audio_checkpoint(ckpt_dir, dtype=jnp.float32)
    mcfg, aux = ck["aux"]
    sd = _tiny_state_dict()
    rng = np.random.default_rng(1)
    gh = rng.standard_normal((2, mcfg.hidden_size)).astype(np.float32)
    ours = np.asarray(local_decode(aux, mcfg, jnp.asarray(gh)))

    g, c = mcfg.group_size, mcfg.audio_channels
    steps = g + max(mcfg.delay_pattern)
    x0 = torch.from_numpy(gh) @ \
        sd["hidden_states_downcast.weight"].float().T
    embeds = x0[:, None]  # [B, 1, ld]
    want = np.zeros((2, g, c), np.int64)
    lcfg = {"layers": HF_TINY["local_layers"],
            "heads": HF_TINY["local_attn_heads"]}
    for t in range(steps):
        hidden = _torch_local_forward(sd, "local_transformer", lcfg,
                                      embeds, causal=True)[:, t]
        nxt = torch.zeros(2, mcfg.input_local.hidden_size)
        for i in range(c):
            d = mcfg.delay_pattern[i]
            if not (d <= t < d + g):
                continue
            scores = hidden @ \
                sd[f"local_transformer_lm_heads.{i}.weight"].float().T
            scores[:, mcfg.speech_empty_ids[i]] = float("-inf")
            tok = scores.argmax(-1)
            want[:, t - d, i] = tok.numpy()
            nxt = nxt + sd[f"speech_embeddings.{i}.weight"].float()[tok]
        nxt = nxt @ sd["speech_embeddings_to_local.weight"].float().T
        embeds = torch.cat([embeds, nxt[:, None]], dim=1)
    np.testing.assert_array_equal(ours, want)


def test_engine_loads_and_expands_audio_patches(ckpt_dir):
    """Full engine on the real checkpoint: audio code groups ride in as
    prompt embeddings, the global AR is forced (logit_bias) to emit
    <|empty|> patch tokens, and the finish hook expands them into
    [C, T*G] RVQ codec codes."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    empty = 7  # remap the placeholder into the tiny vocab
    eng = EngineCore(EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=128,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64))
    assert "mimo" in eng.aux
    eng.aux["mimo"][0].empty_token_id = empty
    # the in-loop conditioner closed over the original empty id —
    # reinstall after the test remap
    eng._install_mimo_conditioner()

    mcfg = eng.aux["mimo"][0]
    rng = np.random.default_rng(2)
    codes = np.stack([rng.integers(0, v, (2, mcfg.group_size))
                      for v in mcfg.speech_vocab_sizes],
                     axis=-1).astype(np.int32)
    prompt = [5, 6, empty, 9, empty, 11]
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                        logit_bias={empty: 1e9})
    rid = eng.add_request(prompt, sp, additional_information={
        "audio_codes": codes.tolist()})
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    out = outs[rid]
    assert all(t == empty for t in out.outputs[0].token_ids)
    req_codes = np.asarray(
        out.additional_information["codec_codes"])
    assert req_codes.shape == (mcfg.audio_channels,
                               4 * mcfg.group_size)
    for i in range(mcfg.audio_channels):
        assert req_codes[i].max() < mcfg.speech_vocab_sizes[i]
        # the empty id is banned per channel
        assert (req_codes[i] != mcfg.speech_empty_ids[i]).all()


def _torch_global_tower(sd, hf, embeds):
    """Qwen2 global backbone oracle (GQA + qkv bias), post final norm,
    last position."""
    import torch.nn.functional as F

    h = hf["hidden_size"]
    nh, kv, hd = (hf["num_attention_heads"], hf["num_key_value_heads"],
                  hf["head_dim"])
    eps = 1e-6
    x = embeds[None].float()

    def rms(v, name):
        return v / torch.sqrt((v ** 2).mean(-1, keepdim=True) + eps) \
            * sd[name].float()

    def lin(v, name, bias):
        y = v @ sd[f"{name}.weight"].float().T
        if bias:
            y = y + sd[f"{name}.bias"].float()
        return y

    for i in range(hf["num_hidden_layers"]):
        p = f"model.layers.{i}"
        b, s, _ = x.shape
        xn = rms(x, f"{p}.input_layernorm.weight")
        q = lin(xn, f"{p}.self_attn.q_proj", True).view(b, s, nh, hd)
        k = lin(xn, f"{p}.self_attn.k_proj", True).view(b, s, kv, hd)
        v = lin(xn, f"{p}.self_attn.v_proj", True).view(b, s, kv, hd)
        q = _torch_rope(q, hf["rope_theta"], hd)
        k = _torch_rope(k, hf["rope_theta"], hd)
        k = k.repeat_interleave(nh // kv, dim=2)
        v = v.repeat_interleave(nh // kv, dim=2)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            is_causal=True).transpose(1, 2).reshape(b, s, nh * hd)
        x = x + lin(o, f"{p}.self_attn.o_proj", False)
        xn = rms(x, f"{p}.post_attention_layernorm.weight")
        gate = lin(xn, f"{p}.mlp.gate_proj", False)
        up = lin(xn, f"{p}.mlp.up_proj", False)
        x = x + lin(torch.nn.functional.silu(gate) * up,
                    f"{p}.mlp.down_proj", False)
    return rms(x, "model.norm.weight")[0, -1]


def test_in_loop_patch_conditioning_per_step_parity(ckpt_dir):
    """Reference behavior (mimo_audio_llm.py:917,951): an <|empty|>
    patch token FED at step t carries the input-local encoding of the
    codes local-decoded from hidden_{t-1} — not the static embed.
    Oracle = full-recompute torch loop; codes of every fed patch must
    match. CPU tier (argmax ties under TPU accumulation)."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    if jax.devices()[0].platform != "cpu":
        pytest.skip("exact-argmax oracle parity is a CPU-tier test")

    empty = 7
    sd = _tiny_state_dict()
    prompt = [5, 6, 9, 11]
    steps = 4

    eng = EngineCore(EngineConfig.from_kwargs(
        model=ckpt_dir, dtype="float32", max_model_len=128,
        num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=2))
    eng.aux["mimo"][0].empty_token_id = empty
    eng._install_mimo_conditioner()
    mcfg = eng.aux["mimo"][0]
    sp = SamplingParams(max_tokens=steps, temperature=0.0,
                        ignore_eos=True, logit_bias={empty: 1e9})
    rid = eng.add_request(prompt, sp)
    outs = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o
    got = np.asarray(outs[rid].additional_information["codec_codes"])
    got = got.T.reshape(steps, mcfg.group_size, mcfg.audio_channels)

    # ---- torch oracle ----
    g, c = mcfg.group_size, mcfg.audio_channels
    lcfg = {"layers": HF_TINY["local_layers"],
            "heads": HF_TINY["local_attn_heads"]}
    ilcfg = {"layers": HF_TINY["input_local_layers"],
             "heads": HF_TINY["local_attn_heads"]}
    embeds = sd["model.embed_tokens.weight"].float()[
        torch.tensor(prompt)]
    want = []
    for s in range(steps):
        h = _torch_global_tower(sd, HF_TINY, embeds)
        # local decode from this hidden (greedy delay pattern)
        x0 = h[None] @ sd["hidden_states_downcast.weight"].float().T
        buf = x0[:, None]
        codes = np.zeros((1, g, c), np.int64)
        for t in range(g + max(mcfg.delay_pattern)):
            hid = _torch_local_forward(sd, "local_transformer", lcfg,
                                       buf, causal=True)[:, t]
            nxt = torch.zeros(1, mcfg.input_local.hidden_size)
            for i in range(c):
                d = mcfg.delay_pattern[i]
                if not (d <= t < d + g):
                    continue
                sc = hid @ sd[f"local_transformer_lm_heads.{i}"
                              ".weight"].float().T
                sc[:, mcfg.speech_empty_ids[i]] = float("-inf")
                tok = sc.argmax(-1)
                codes[:, t - d, i] = tok.numpy()
                nxt = nxt + sd[f"speech_embeddings.{i}.weight"
                               ].float()[tok]
            nxt = nxt @ sd["speech_embeddings_to_local.weight"
                           ].float().T
            buf = torch.cat([buf, nxt[:, None]], dim=1)
        want.append(codes[0])
        # patch embedding feeds the next step
        x = torch.zeros(1, g, mcfg.input_local.hidden_size)
        for i in range(c):
            x = x + sd[f"speech_embeddings.{i}.weight"].float()[
                torch.from_numpy(codes[0, :, i])]
        ph = _torch_local_forward(sd, "input_local_transformer", ilcfg,
                                  x, causal=False).reshape(1, -1)
        ph = ph @ sd["speech_group_downcast.weight"].float().T
        embeds = torch.cat([embeds, ph], dim=0)
    np.testing.assert_array_equal(got, np.stack(want))
