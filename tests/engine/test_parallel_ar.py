"""AR-side parallelism parity on the virtual CPU mesh: TP and EP match
single-device greedy outputs."""

import pytest

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.parallel import make_mesh

MOE_HF = {
    "architectures": ["Qwen3MoeForCausalLM"],
    "vocab_size": 128, "hidden_size": 32, "intermediate_size": 0,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "num_experts": 4,
    "num_experts_per_tok": 2, "moe_intermediate_size": 32,
    "eos_token_id": 0,
}


def run(mesh=None, **over):
    kwargs = dict(model="dummy", hf_overrides=MOE_HF, dtype="float32",
                  max_model_len=128, num_pages=32, page_size=16,
                  max_num_seqs=4, max_num_batched_tokens=64)
    kwargs.update(over)
    eng = EngineCore(EngineConfig.from_kwargs(**kwargs), mesh=mesh)
    sp = SamplingParams(max_tokens=8, temperature=0.0, ignore_eos=True)
    rid = eng.add_request(list(range(1, 20)), sp)
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                return o.outputs[0].token_ids


@pytest.mark.parametrize("ep", [False, True], ids=["tp2", "ep2"])
def test_moe_tp_ep_parity(ep):
    base = run()
    mesh = make_mesh((1, 2), ("dp", "tp"))
    par = run(mesh=mesh, tensor_parallel_size=2, expert_parallel=ep)
    assert par == base
