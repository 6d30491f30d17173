"""dfx-role stability tier: sustained engine cycling with resource
monitoring (reference tests/e2e dfx stability tier — long-run
request loops with leak detection; scaled to CI seconds here).

Asserts the properties the reference tier watches: no monotonic
host-memory growth across request waves, no request-state leakage in
the scheduler, deterministic outputs under repetition, and per-request
error isolation that leaves the engine serviceable."""

import gc
import json
import resource

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from tests.models.test_dynin_omni import HF, _tiny_state_dict
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.engine.core import EngineCore

    # tiny AR checkpoint: reuse the dynin fixture's llama-ish geometry
    # through the standard decoder path (plain causal config)
    hf = {
        "architectures": ["Qwen3ForCausalLM"],
        "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 8,
        "rope_theta": 10000.0, "rms_norm_eps": 1e-5,
        "eos_token_id": 2,
    }
    del HF, _tiny_state_dict
    root = tmp_path_factory.mktemp("stab")
    g = torch.Generator().manual_seed(0)
    sd = {"model.embed_tokens.weight": torch.randn(64, 32,
                                                   generator=g) * 0.02,
          "lm_head.weight": torch.randn(64, 32, generator=g) * 0.1,
          "model.norm.weight": torch.rand(32, generator=g) + 0.5}
    for li in range(2):
        p = f"model.layers.{li}"
        for name, o, i in (("self_attn.q_proj", 32, 32),
                           ("self_attn.k_proj", 16, 32),
                           ("self_attn.v_proj", 16, 32),
                           ("self_attn.o_proj", 32, 32),
                           ("mlp.gate_proj", 64, 32),
                           ("mlp.up_proj", 64, 32),
                           ("mlp.down_proj", 32, 64)):
            sd[f"{p}.{name}.weight"] = torch.randn(
                o, i, generator=g) * (i ** -0.5)
        sd[f"{p}.self_attn.q_norm.weight"] = torch.rand(
            8, generator=g) + 0.5
        sd[f"{p}.self_attn.k_norm.weight"] = torch.rand(
            8, generator=g) + 0.5
        sd[f"{p}.input_layernorm.weight"] = torch.rand(
            32, generator=g) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = torch.rand(
            32, generator=g) + 0.5
    with open(root / "config.json", "w") as f:
        json.dump(hf, f)
    save_file(sd, str(root / "model.safetensors"))
    return EngineCore(EngineConfig.from_kwargs(
        model=str(root), dtype="float32", max_model_len=64,
        num_pages=32, page_size=16, max_num_seqs=4,
        max_num_batched_tokens=64))


def _wave(engine, n, base, max_tokens=8):
    from vllm_omni_tpu.core.sampling_params import SamplingParams

    for i in range(n):
        engine.add_request([3 + (base + i) % 40, 9, 17],
                           SamplingParams(max_tokens=max_tokens,
                                          temperature=0.0,
                                          ignore_eos=True),
                           request_id=f"s{base + i}")
    outs = engine.run_to_completion()
    assert len(outs) == n
    return outs


def test_sustained_waves_no_memory_growth(engine):
    """20 request waves; RSS measured after warmup must not grow more
    than 64 MB (leaked per-request state / compiled-fn churn would)."""
    _wave(engine, 4, 0)  # warmup: compile everything
    gc.collect()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    for w in range(20):
        _wave(engine, 4, 100 + w * 4)
    gc.collect()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    growth_mb = (rss1 - rss0) / 1024.0  # ru_maxrss is KB on linux
    assert growth_mb < 64, f"RSS grew {growth_mb:.1f} MB over 20 waves"


def test_no_scheduler_state_leak(engine):
    """Every finished request must leave the scheduler queues."""
    _wave(engine, 4, 1000)
    sched = engine.scheduler
    assert not sched.waiting and not sched.running
    # per-request KV pages all returned to the free pool
    assert sched.page_table.num_free == engine.runner.num_pages \
        if hasattr(sched, "page_table") else True


def test_deterministic_under_repetition(engine):
    a = _wave(engine, 2, 2000)
    b = _wave(engine, 2, 2000)
    for x, y in zip(a, b):
        assert x.outputs[0].token_ids == y.outputs[0].token_ids


def test_error_isolation_keeps_engine_serviceable(engine):
    from vllm_omni_tpu.core.sampling_params import SamplingParams

    with pytest.raises(Exception):
        # prompt longer than max_model_len must be rejected up front
        engine.add_request(list(range(3)) * 40,
                           SamplingParams(max_tokens=2),
                           request_id="bad")
    outs = _wave(engine, 2, 3000)
    assert all(o.outputs[0].token_ids for o in outs)
