"""Pre-quantized ModelOpt FP8 checkpoint ingestion (reference
quantization/component_config.py:51 — the BASELINE anchor config).

A fabricated ModelOpt-style export (fp8 weights + per-tensor
weight_scale + per-layer attention k_scale/v_scale) must load DIRECTLY
onto the fp8 serving path: bit-exact weight payload, scales broadcast
per output channel, KV scales suppressing online calibration, and
logits close to the dequantized full-precision model."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

HF = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 128, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 8, "rope_theta": 10000.0,
    "rms_norm_eps": 1e-5, "eos_token_id": 0,
    "quantization_config": {"quant_method": "modelopt",
                            "quant_algo": "FP8"},
}
LINS = [("self_attn.q_proj", 32, 32), ("self_attn.k_proj", 16, 32),
        ("self_attn.v_proj", 16, 32), ("self_attn.o_proj", 32, 32),
        ("mlp.gate_proj", 64, 32), ("mlp.up_proj", 64, 32),
        ("mlp.down_proj", 32, 64)]


def _make_ckpts(root):
    g = torch.Generator().manual_seed(0)
    fp8_sd, bf16_sd = {}, {}

    def shared(name, t):
        fp8_sd[name] = t.clone()
        bf16_sd[name] = t.clone()

    shared("model.embed_tokens.weight",
           torch.randn(128, 32, generator=g) * 0.05)
    shared("model.norm.weight", torch.rand(32, generator=g) + 0.5)
    shared("lm_head.weight", torch.randn(128, 32, generator=g) * 0.2)
    for i in range(2):
        p = f"model.layers.{i}"
        shared(f"{p}.input_layernorm.weight",
               torch.rand(32, generator=g) + 0.5)
        shared(f"{p}.post_attention_layernorm.weight",
               torch.rand(32, generator=g) + 0.5)
        for name, o, k in LINS:
            w = torch.randn(o, k, generator=g) * (k ** -0.5)
            scale = w.abs().max() / 448.0
            w_q = (w / scale).clamp(-448, 448).to(torch.float8_e4m3fn)
            fp8_sd[f"{p}.{name}.weight"] = w_q
            fp8_sd[f"{p}.{name}.weight_scale"] = scale.float()
            fp8_sd[f"{p}.{name}.input_scale"] = torch.tensor(0.05)
            # the DEQUANTIZED twin: exactly what the fp8 bits encode
            bf16_sd[f"{p}.{name}.weight"] = w_q.float() * scale
        fp8_sd[f"{p}.self_attn.k_scale"] = torch.tensor(0.03 + i * 0.01)
        fp8_sd[f"{p}.self_attn.v_scale"] = torch.tensor(0.02 + i * 0.01)
    d_fp8 = root / "fp8"
    d_bf16 = root / "bf16"
    for d, sd, cfg in ((d_fp8, fp8_sd, HF),
                       (d_bf16, bf16_sd,
                        {k: v for k, v in HF.items()
                         if k != "quantization_config"})):
        d.mkdir()
        with open(d / "config.json", "w") as f:
            json.dump(cfg, f)
        save_file(sd, str(d / "model.safetensors"))
    return str(d_fp8), str(d_bf16), fp8_sd


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    return _make_ckpts(tmp_path_factory.mktemp("modelopt"))


def test_native_fp8_ingestion_bit_exact(ckpts):
    from vllm_omni_tpu.config.engine import ModelConfig
    from vllm_omni_tpu.models.weights import load_model

    d_fp8, _, fp8_sd = ckpts
    cfg, params, hf = load_model(ModelConfig(model=d_fp8,
                                             dtype="float32"))
    lay = params["layers"][0]
    slot = lay["q_proj"]
    assert "w_q" in slot and slot["w_q"].dtype == jnp.float8_e4m3fn
    want_bits = fp8_sd["model.layers.0.self_attn.q_proj.weight"].view(
        torch.uint8).numpy().T
    got_bits = np.asarray(slot["w_q"].view(jnp.uint8))
    np.testing.assert_array_equal(got_bits, want_bits)
    scalar = float(fp8_sd["model.layers.0.self_attn.q_proj"
                          ".weight_scale"])
    np.testing.assert_allclose(np.asarray(slot["scale"]),
                               np.full((32,), scalar, np.float32))
    assert hf["_kv_scales"][0].shape == (2,)
    np.testing.assert_allclose(hf["_kv_scales"][0], [0.03, 0.04],
                               rtol=1e-6)


def test_logits_close_to_dequantized_fp(ckpts):
    """The fp8 serving path over the ingested checkpoint must track the
    full-precision forward over the DEQUANTIZED twin (only per-token
    activation-quant noise remains — weights decode identically)."""
    from vllm_omni_tpu.config.engine import ModelConfig
    from vllm_omni_tpu.models.decoder import compute_logits, decoder_forward
    from vllm_omni_tpu.models.weights import load_model
    from vllm_omni_tpu.ops.attention import mha_xla

    d_fp8, d_bf16, _ = ckpts
    cfg, p_fp8, _ = load_model(ModelConfig(model=d_fp8,
                                           dtype="float32"))
    _, p_ref, _ = load_model(ModelConfig(model=d_bf16, dtype="float32"))
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 128, (2, 7)).astype(np.int32)
    pos = np.broadcast_to(np.arange(7, dtype=np.int32), (2, 7))

    def attn(i, q, k, v):
        return mha_xla(q, k, v, scale=cfg.head_dim ** -0.5, causal=True)

    def logits(p):
        h = decoder_forward(p, cfg, jnp.asarray(ids), jnp.asarray(pos),
                            attn)
        return np.asarray(compute_logits(p, cfg, h), np.float32)

    a, b = logits(p_fp8), logits(p_ref)
    # weights decode identically; the residue is fp8 per-token
    # activation quant accumulated over the layer stack (~e4m3 noise)
    denom = np.maximum(np.abs(b).max(), 1e-6)
    assert np.abs(a - b).max() / denom < 0.12
    agree = (a.argmax(-1) == b.argmax(-1)).mean()
    assert agree >= 0.7, agree


def test_engine_serves_prequantized_fp8(ckpts):
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.core.sampling_params import SamplingParams
    from vllm_omni_tpu.engine.core import EngineCore

    d_fp8, _, _ = ckpts
    engine = EngineCore(EngineConfig.from_kwargs(
        model=d_fp8, dtype="float32", kv_cache_dtype="fp8",
        max_model_len=128, num_pages=32, page_size=16, max_num_seqs=2,
        max_num_batched_tokens=64, multi_step=2))
    # checkpoint KV scales suppress online calibration
    assert engine.runner.kv_scales is not None
    np.testing.assert_allclose(engine.runner.kv_scales[0][:, 0],
                               [0.03, 0.04], rtol=1e-6)
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    engine.add_request(list(range(3, 12)), sp)
    out = engine.run_to_completion()[0]
    assert len(out.outputs[0].token_ids) == 6
