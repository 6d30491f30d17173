"""OmniVoice real-geometry family + loader tests.

Independent torch oracle re-deriving the reference generator semantics
(model_executor/models/omnivoice/omnivoice_generator.py:236 — Qwen3
bidirectional blocks with per-head qk norms and NeoX rope at theta 1e6,
mixed text+audio embeddings with per-codebook offset sums, fused audio
head) plus schedule parity and an end-to-end unmasking run."""

import json
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vllm_omni_tpu.diffusion.loader import (  # noqa: E402
    is_diffusers_pipeline, load_diffusers_pipeline)
from vllm_omni_tpu.diffusion.omnivoice import (  # noqa: E402
    OmniVoiceConfig, omnivoice_embed, omnivoice_transformer,
    unmask_schedule)

TINY = dict(llm_hidden_size=32, llm_num_hidden_layers=2,
            llm_num_attention_heads=2, llm_num_key_value_heads=1,
            llm_intermediate_size=64, llm_vocab_size=64,
            llm_rope_theta=1000000.0, llm_rms_norm_eps=1e-6,
            llm_head_dim=16, audio_vocab_size=17, audio_mask_id=16,
            num_audio_codebook=4, num_step=6, guidance_scale=2.0,
            t_shift=0.1, position_temperature=5.0)
D = TINY["llm_hidden_size"]
HD = TINY["llm_head_dim"]
NH = TINY["llm_num_attention_heads"]
NKV = TINY["llm_num_key_value_heads"]
NCB = TINY["num_audio_codebook"]
AV = TINY["audio_vocab_size"]


def _tiny_state_dict(seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def put(prefix, n_out, n_in):
        sd[f"{prefix}.weight"] = torch.randn(
            n_out, n_in, generator=g) * (n_in ** -0.5)

    def put_rms(prefix, n):
        sd[f"{prefix}.weight"] = torch.rand(n, generator=g) + 0.5

    sd["llm.embed_tokens.weight"] = torch.randn(
        TINY["llm_vocab_size"], D, generator=g) * 0.1
    sd["audio_embeddings.weight"] = torch.randn(
        NCB * AV, D, generator=g) * 0.1
    put("audio_heads", NCB * AV, D)
    put_rms("llm.norm", D)
    for i in range(TINY["llm_num_hidden_layers"]):
        p = f"llm.layers.{i}"
        put_rms(f"{p}.input_layernorm", D)
        put_rms(f"{p}.post_attention_layernorm", D)
        put(f"{p}.self_attn.q_proj", NH * HD, D)
        put(f"{p}.self_attn.k_proj", NKV * HD, D)
        put(f"{p}.self_attn.v_proj", NKV * HD, D)
        put(f"{p}.self_attn.o_proj", D, NH * HD)
        put_rms(f"{p}.self_attn.q_norm", HD)
        put_rms(f"{p}.self_attn.k_norm", HD)
        put(f"{p}.mlp.gate_proj", TINY["llm_intermediate_size"], D)
        put(f"{p}.mlp.up_proj", TINY["llm_intermediate_size"], D)
        put(f"{p}.mlp.down_proj", D, TINY["llm_intermediate_size"])
    return sd


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("ov_tiny")
    (root / "transformer").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "OmniVoicePipeline",
                   "transformer": ["vllm_omni", "OmniVoiceGenerator"]},
                  f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "OmniVoiceGenerator", **TINY}, f)
    save_file(_tiny_state_dict(), str(
        root / "transformer" / "diffusion_pytorch_model.safetensors"))
    return str(root)


# ---------------------------------------------------------------------------
# Independent torch oracle
# ---------------------------------------------------------------------------


def _oracle_logits(sd, input_ids_np, audio_mask_np, key_mask_np):
    T = torch.from_numpy
    input_ids = T(input_ids_np).long()
    audio_mask = T(audio_mask_np).bool()
    key_mask = T(key_mask_np).bool()
    b, ncb, s = input_ids.shape

    text_emb = sd["llm.embed_tokens.weight"][input_ids[:, 0, :]].float()
    offsets = (torch.arange(NCB) * AV).view(1, -1, 1)
    shifted = input_ids * audio_mask.unsqueeze(1).long() + offsets
    audio_emb = sd["audio_embeddings.weight"][shifted].float().sum(1)
    x = torch.where(audio_mask.unsqueeze(-1), audio_emb, text_emb)

    def rms(v, name):
        return v / torch.sqrt((v ** 2).mean(-1, keepdim=True) +
                              TINY["llm_rms_norm_eps"]) * \
            sd[f"{name}.weight"].float()

    def lin(v, name):
        return v @ sd[f"{name}.weight"].float().T

    inv = 1.0 / torch.pow(torch.tensor(TINY["llm_rope_theta"]),
                          torch.arange(0, HD, 2).double() / HD)
    fr = torch.arange(s).double()[:, None] * inv[None, :]
    cos = torch.cat([fr.cos(), fr.cos()], -1).float()
    sin = torch.cat([fr.sin(), fr.sin()], -1).float()

    def rope(v):
        half = HD // 2
        x1, x2 = v[..., :half], v[..., half:]
        rot = torch.cat([-x2, x1], -1)
        return v * cos[None, :, None, :] + rot * sin[None, :, None, :]

    am = key_mask[:, None, None, :]
    for i in range(TINY["llm_num_hidden_layers"]):
        p = f"llm.layers.{i}"
        h = rms(x, f"{p}.input_layernorm")
        q = rms(lin(h, f"{p}.self_attn.q_proj").view(b, s, NH, HD),
                f"{p}.self_attn.q_norm")
        k = rms(lin(h, f"{p}.self_attn.k_proj").view(b, s, NKV, HD),
                f"{p}.self_attn.k_norm")
        v = lin(h, f"{p}.self_attn.v_proj").view(b, s, NKV, HD)
        q, k = rope(q), rope(k)
        k = k.repeat_interleave(NH // NKV, dim=2)
        v = v.repeat_interleave(NH // NKV, dim=2)
        o = torch.nn.functional.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2),
            attn_mask=am)
        o = o.transpose(1, 2).reshape(b, s, NH * HD)
        x = x + lin(o, f"{p}.self_attn.o_proj")
        h = rms(x, f"{p}.post_attention_layernorm")
        x = x + lin(torch.nn.functional.silu(lin(h, f"{p}.mlp.gate_proj"))
                    * lin(h, f"{p}.mlp.up_proj"), f"{p}.mlp.down_proj")

    x = rms(x, "llm.norm")
    logits = lin(x, "audio_heads")
    return logits.view(b, s, NCB, AV).permute(0, 2, 1, 3).numpy()


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_loader_maps_every_tensor(pipeline_dir):
    assert is_diffusers_pipeline(pipeline_dir)
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    assert loaded["family"] == "omnivoice"
    cfg = loaded["transformer_cfg"]
    assert isinstance(cfg, OmniVoiceConfig)
    sd = _tiny_state_dict()
    from vllm_omni_tpu.diffusion.omnivoice import (
        assign_omnivoice_tensor, init_omnivoice_params)

    params = init_omnivoice_params(cfg, jax.random.PRNGKey(0),
                                   jnp.float32)
    unmapped = [n for n, t in sd.items()
                if not assign_omnivoice_tensor(params, n, t.numpy(),
                                               jnp.float32)]
    assert unmapped == []


def test_transformer_parity(pipeline_dir):
    loaded = load_diffusers_pipeline(pipeline_dir, dtype=jnp.float32)
    cfg, params = loaded["transformer_cfg"], loaded["params"]
    rng = np.random.default_rng(43)
    s, text_len, t_len = 9, 5, 4
    input_ids = np.zeros((2, NCB, s), np.int32)
    input_ids[0, :, :text_len] = rng.integers(
        0, TINY["llm_vocab_size"], (NCB, text_len))
    input_ids[0, :, text_len:] = rng.integers(0, AV, (NCB, t_len))
    input_ids[1, :, :t_len] = rng.integers(0, AV, (NCB, t_len))
    audio_mask = np.zeros((2, s), bool)
    audio_mask[0, text_len:] = True
    audio_mask[1, :t_len] = True
    key_mask = np.ones((2, s), bool)
    key_mask[1, t_len:] = False

    emb = omnivoice_embed(params, cfg, jnp.asarray(input_ids),
                          jnp.asarray(audio_mask))
    ours = np.asarray(omnivoice_transformer(
        params, cfg, emb, jnp.asarray(key_mask)))
    golden = _oracle_logits(_tiny_state_dict(), input_ids, audio_mask,
                            key_mask)
    assert ours.shape == golden.shape == (2, NCB, s, AV)
    # compare only valid key positions (padded rows are unused garbage)
    np.testing.assert_allclose(ours[0], golden[0], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(ours[1, :, :t_len], golden[1, :, :t_len],
                               rtol=3e-4, atol=3e-4)


def test_unmask_schedule_matches_reference_formula():
    sched = unmask_schedule(10, 6, 0.1, NCB)
    assert sum(sched) == 10 * NCB
    assert all(k >= 0 for k in sched)
    # reference: r_n = shift·s/(1+(shift-1)s), per-step ceil allocation
    steps = np.linspace(0, 1, 7)
    shifted = 0.1 * steps / (1 + (0.1 - 1) * steps)
    total, rem, expect = 40, 40, []
    for i in range(6):
        n = rem if i == 5 else min(
            int(np.ceil(total * (shifted[i + 1] - shifted[i]))), rem)
        expect.append(n)
        rem -= n
    assert sched == expect


def test_pipeline_end_to_end_unmasking(pipeline_dir):
    """Full 6-step generation: every target token leaves [MASK], output
    is deterministic for a fixed seed."""
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32")
    eng = DiffusionEngine(config)
    assert eng.pipeline.family == "omnivoice"

    def gen(seed):
        req = DiffusionRequest(
            f"r{seed}", "hello omnivoice",
            DiffusionSamplingParams(num_inference_steps=6,
                                    guidance_scale=2.0, seed=seed,
                                    output_type="np",
                                    extra_args={"target_len": 7}))
        return eng.generate([req])[0]

    out = gen(0)
    assert out.finished and out.error is None, out.error
    assert out.audio.shape == (1, NCB, 7)
    assert (out.audio != TINY["audio_mask_id"]).all()
    assert (out.audio >= 0).all() and (out.audio < AV).all()
    out2 = gen(0)
    np.testing.assert_array_equal(out.audio, out2.audio)
