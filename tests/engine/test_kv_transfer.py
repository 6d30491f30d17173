"""KV transfer between engines: prefill/decode disaggregation parity
(reference OmniKVTransferManager + disaggregated_inference.md)."""

import numpy as np

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.distributed.connectors import SharedMemoryConnector
from vllm_omni_tpu.distributed.transfer_manager import TransferManager
from vllm_omni_tpu.engine.core import EngineCore

TINY_HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 128, "hidden_size": 64, "intermediate_size": 128,
    "num_hidden_layers": 2, "num_attention_heads": 4,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}


def make_engine(**over):
    kwargs = dict(model="dummy", hf_overrides=TINY_HF, dtype="float32",
                  max_model_len=256, num_pages=64, page_size=16,
                  max_num_seqs=4, max_num_batched_tokens=128)
    kwargs.update(over)
    return EngineCore(EngineConfig.from_kwargs(**kwargs))


def drain(eng):
    finals = {}
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                finals[o.request_id] = o
    return finals


def test_pd_disaggregation_parity():
    """Prefill on engine A (1 token), KV over a shm connector, decode on
    engine B — output must equal single-engine generation."""
    prompt = list(range(1, 40))
    # reference: single engine, full generation
    ref = drain_one(make_engine(), prompt, max_tokens=16)

    # prefill engine: one token, pin KV
    pre = make_engine()
    sp_pre = SamplingParams(max_tokens=1, temperature=0.0,
                            ignore_eos=True, pin_kv=True)
    rid = pre.add_request(list(prompt), sp_pre)
    finals = drain(pre)
    assert finals[rid].finished
    payload = pre.extract_request_kv(rid)
    assert payload["num_computed_tokens"] == len(prompt)
    assert payload["first_token"] == ref[0]
    pre.release_transfer(rid)

    # ship through the real connector wire format
    tm = TransferManager(SharedMemoryConnector())
    meta = tm.send(0, 1, rid, payload)
    received = tm.receive(0, 1, rid, meta)

    # decode engine: inject + continue, zero prompt recompute
    dec = make_engine()
    sp_dec = SamplingParams(max_tokens=16, temperature=0.0,
                            ignore_eos=True)
    rid2 = dec.inject_request_kv(received, sp_dec)
    passes_before = dec.runner.forward_passes
    outs = drain(dec)
    toks = outs[rid2].outputs[0].token_ids
    assert toks == ref, (toks, ref)
    # no prefill pass happened on the decode engine (decode chains only)
    assert dec.runner.forward_passes - passes_before <= 18


def drain_one(eng, prompt, max_tokens):
    sp = SamplingParams(max_tokens=max_tokens, temperature=0.0,
                        ignore_eos=True)
    rid = eng.add_request(list(prompt), sp)
    return drain(eng)[rid].outputs[0].token_ids


def test_pinned_pages_survive_finish_and_release():
    eng = make_engine()
    sp = SamplingParams(max_tokens=1, temperature=0.0, ignore_eos=True,
                        pin_kv=True)
    rid = eng.add_request(list(range(1, 20)), sp)
    drain(eng)
    free_before = eng.scheduler.block_manager.num_free_pages
    eng.extract_request_kv(rid)  # pages still live
    eng.release_transfer(rid)
    assert eng.scheduler.block_manager.num_free_pages > free_before


def test_pd_hetero_tp_parity():
    """Hetero-TP disaggregation: prefill at TP=2 → decode at TP=1 and
    the reverse (reference _slice_transfer_data_for_target,
    kv_transfer_manager.py:498). TPU-first: extract_kv gathers the
    GLOBAL [L, 2, Hkv, P, ps, D] view out of the sharded cache under
    SPMD and inject re-scatters under the target's own sharding, so no
    per-rank slicing layer exists to get wrong — this pins token-exact
    parity in both directions."""
    from vllm_omni_tpu.parallel import make_mesh

    prompt = list(range(1, 40))
    ref = drain_one(make_engine(), prompt, max_tokens=12)

    for pre_tp, dec_tp in ((2, 1), (1, 2)):
        def build(tp):
            if tp == 1:
                return make_engine()
            mesh = make_mesh((1, tp), ("dp", "tp"))
            return EngineCore(EngineConfig.from_kwargs(
                model="dummy", hf_overrides=TINY_HF, dtype="float32",
                max_model_len=256, num_pages=64, page_size=16,
                max_num_seqs=4, max_num_batched_tokens=128,
                tensor_parallel_size=tp), mesh=mesh)

        pre = build(pre_tp)
        sp_pre = SamplingParams(max_tokens=1, temperature=0.0,
                                ignore_eos=True, pin_kv=True)
        rid = pre.add_request(list(prompt), sp_pre)
        finals = drain(pre)
        assert finals[rid].finished
        payload = pre.extract_request_kv(rid)
        pre.release_transfer(rid)

        tm = TransferManager(SharedMemoryConnector())
        received = tm.receive(0, 1, rid,
                              tm.send(0, 1, rid, payload))

        dec = build(dec_tp)
        rid2 = dec.inject_request_kv(
            received, SamplingParams(max_tokens=12, temperature=0.0,
                                     ignore_eos=True))
        toks = drain(dec)[rid2].outputs[0].token_ids
        assert toks == ref, (pre_tp, dec_tp, toks, ref)
