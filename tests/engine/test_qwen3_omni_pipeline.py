"""Qwen3-Omni 3-stage pipeline over a REAL (reference-shaped) HF
checkpoint: thinker → talker (+MTP code predictor) → code2wav, all
weights loaded from one `Qwen3OmniMoeForConditionalGeneration`
save_pretrained directory via hf_config_name routing (reference stage
YAML hf_config_name, stage_configs/qwen3_omni_moe.yaml)."""

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

from vllm_omni_tpu import Omni  # noqa: E402
from vllm_omni_tpu.core.sampling_params import SamplingParams  # noqa: E402

BASE = dict(dtype="float32", max_model_len=128, num_pages=32,
            page_size=16, max_num_seqs=2, max_num_batched_tokens=64,
            multi_step=2)


@pytest.fixture(scope="module")
def omni_ckpt(tmp_path_factory):
    import torch
    from transformers import Qwen3OmniMoeForConditionalGeneration

    from tests.models.test_qwen3_omni_parity import _tiny_cfg

    torch.manual_seed(0)
    model = Qwen3OmniMoeForConditionalGeneration(_tiny_cfg()).float()
    path = tmp_path_factory.mktemp("omni_ck")
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def _pipeline(ckpt: str) -> dict:
    return {"stage_args": [
        {"stage_id": 0, "stage_type": "llm",
         "engine_args": dict(BASE, model=ckpt,
                             hf_config_name="thinker"),
         "default_sampling_params": {
             "max_tokens": 5, "temperature": 0.0, "ignore_eos": True,
             "return_hidden_states": True}},
        {"stage_id": 1, "stage_type": "llm",
         "engine_args": dict(BASE, model=ckpt, hf_config_name="talker"),
         "engine_input_source": [0],
         "custom_process_input_func":
             "vllm_omni_tpu.models.stage_input_processors.thinker2talker",
         "default_sampling_params": {
             "max_tokens": 6, "temperature": 0.0, "ignore_eos": True,
             "return_hidden_states": True}},
        {"stage_id": 2, "stage_type": "llm",
         "engine_args": dict(BASE, model=ckpt,
                             hf_config_name="code2wav",
                             mode="generation"),
         "engine_input_source": [1],
         "final_output": True, "final_output_type": "audio",
         "default_sampling_params": {"max_tokens": 1}},
    ]}


def test_three_stage_real_checkpoint_pipeline(omni_ckpt):
    omni = Omni(model=omni_ckpt, stage_configs=_pipeline(omni_ckpt))
    out = omni.generate(
        [[5, 9, 2, 6, 1]],
        SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True,
                       return_hidden_states=True))[0]
    audio = out.multimodal_output.get("audio")
    assert audio is not None, "pipeline produced no waveform"
    wav = np.asarray(audio["data"])
    assert wav.ndim == 1 and wav.size > 0
    assert np.all(np.abs(wav) <= 1.0)
    assert np.isfinite(wav).all()


def test_talker_stage_emits_full_rvq_codes(omni_ckpt):
    """The talker stage's output carries [G, T] codec codes: layer 0
    from its own decode, groups 1..G-1 from the MTP code predictor."""
    from vllm_omni_tpu.config.engine import EngineConfig
    from vllm_omni_tpu.engine.core import EngineCore

    eng = EngineCore(EngineConfig.from_kwargs(
        model=omni_ckpt, hf_config_name="talker", **BASE))
    assert "code_predictor" in eng.aux
    cp_cfg, _ = eng.aux["code_predictor"]
    embeds = np.random.default_rng(0).standard_normal(
        (4, 32)).astype(np.float32)  # thinker hidden width
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                        return_hidden_states=True)
    eng.add_request([], sp, prompt_embeds=embeds)
    final = None
    while eng.has_unfinished():
        for o in eng.step():
            if o.finished:
                final = o
    codes = np.asarray(final.additional_information["codec_codes"])
    assert codes.shape[0] == cp_cfg.num_code_groups
    assert codes.shape[1] == 4
    assert (codes[0] == np.asarray(final.outputs[0].token_ids)).all()
