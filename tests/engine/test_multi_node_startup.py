"""Multi-node stage startup: a stage claimed and served by a separate
`remote_stage` worker PROCESS over TCP (reference OmniMasterServer +
register_stage_with_omni_master, engine/stage_engine_startup.py:102-599).
Single host here, but the full path is exercised: master registration
server, config fetch over TCP, connect-back ZMQ endpoints, READY
handshake, then normal pipeline traffic."""

import subprocess
import sys

import numpy as np
import pytest

from vllm_omni_tpu.core.sampling_params import SamplingParams

TINY = {
    "architectures": ["LlamaForCausalLM"],
    "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
}
BASE = dict(dtype="float32", max_model_len=128, num_pages=32,
            page_size=16, max_num_seqs=2, max_num_batched_tokens=64)


def test_master_fetch_protocol():
    from vllm_omni_tpu.engine.master import (OmniMasterServer,
                                             fetch_assignment)

    master = OmniMasterServer(host="127.0.0.1")
    master.register_stage(7, {"engine_kwargs": {"x": 1},
                              "ctrl_addr": "tcp://127.0.0.1:1",
                              "out_addr": "tcp://127.0.0.1:2"})
    addr = f"tcp://127.0.0.1:{master.port}"
    sid, spec = fetch_assignment(addr, None, timeout_s=10)
    assert sid == 7 and spec["engine_kwargs"] == {"x": 1}
    assert master.status(7) == "claimed"
    with pytest.raises(TimeoutError):
        fetch_assignment(addr, None, timeout_s=1.5, poll_s=0.3)
    master.shutdown()


def test_two_process_pipeline_with_remote_stage(monkeypatch):
    """Stage 1 of a 2-stage pipeline runs in a separately launched
    remote_stage worker process; outputs flow back through the
    orchestrator with token parity against an all-local run."""
    import os

    from vllm_omni_tpu import Omni

    monkeypatch.setenv("OMNI_TPU_MASTER_PORT", "0")

    def pipeline(placement):
        stage1 = dict(BASE, model="dummy", hf_overrides=TINY, seed=1)
        if placement:
            stage1["placement"] = "remote"
            stage1["startup_timeout_s"] = 120.0
        return {"stage_args": [
            {"stage_id": 0, "stage_type": "llm",
             "engine_args": dict(BASE, model="dummy", hf_overrides=TINY),
             "default_sampling_params": {
                 "max_tokens": 4, "temperature": 0.0, "ignore_eos": True,
                 "return_hidden_states": True}},
            {"stage_id": 1, "stage_type": "llm",
             "engine_args": stage1,
             "engine_input_source": [0],
             "custom_process_input_func":
                 "vllm_omni_tpu.models.stage_input_processors."
                 "thinker2talker",
             "final_output": True, "final_output_type": "text",
             "default_sampling_params": {
                 "max_tokens": 4, "temperature": 0.0,
                 "ignore_eos": True}},
        ]}

    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                        return_hidden_states=True)
    local = Omni(model="dummy", stage_configs=pipeline(False))
    want = local.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids

    # launch the worker BEFORE the runner: it polls the master until the
    # stage is published (fixed port via env). Use a free port.
    import socket as s

    sock = s.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    monkeypatch.setenv("OMNI_TPU_MASTER_PORT", str(port))
    monkeypatch.setenv("OMNI_TPU_HOST_IP", "127.0.0.1")
    env = dict(os.environ)
    worker = subprocess.Popen(
        [sys.executable, "-m", "vllm_omni_tpu.engine.remote_stage",
         "--master", f"tcp://127.0.0.1:{port}", "--platform", "cpu",
         "--timeout", "120"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        omni = Omni(model="dummy", stage_configs=pipeline(True))
        got = omni.generate([[1, 2, 3]], sp)[0].outputs[0].token_ids
        assert got == want
    finally:
        worker.terminate()
        worker.wait(timeout=10)
