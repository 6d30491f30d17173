import pytest

from vllm_omni_tpu.config.stage_config import (ModelPipeline, StageConfig,
                                               load_stage_configs,
                                               single_stage_pipeline)

YAML = """
async_chunk: true
stage_args:
  - stage_id: 0
    stage_type: llm
    runtime:
      devices: "0"
    engine_args:
      model_stage: thinker
      max_num_seqs: 64
    final_output: true
    final_output_type: text
    default_sampling_params:
      temperature: 0.4
  - stage_id: 1
    stage_type: llm
    runtime:
      devices: "1"
    engine_input_source: [0]
    custom_process_input_func: vllm_omni_tpu.utils.cdiv
  - stage_id: 2
    stage_type: diffusion
    engine_input_source: [1]
    final_output: true
    final_output_type: audio
"""


def test_yaml_load():
    p = load_stage_configs(YAML)
    assert p.num_stages == 3
    assert p.async_chunk is True
    assert p.stage(0).engine_args["model_stage"] == "thinker"
    assert p.stage(1).engine_input_source == [0]
    assert p.stage(2).stage_type == "diffusion"
    assert p.stage(0).runtime.device_indices(4) == [0]
    assert [s.stage_id for s in p.consumers_of(1)] == [2]


def test_final_stage_for_modality():
    p = load_stage_configs(YAML)
    assert p.final_stage_for("text").stage_id == 0
    assert p.final_stage_for("audio").stage_id == 2
    assert p.final_stage_for("video").stage_id == 2  # falls back to last


def test_cycle_rejected():
    with pytest.raises(ValueError):
        ModelPipeline(stages=[
            StageConfig(stage_id=0, stage_type="llm",
                        engine_input_source=[1]),
            StageConfig(stage_id=1, stage_type="llm",
                        engine_input_source=[0]),
        ])


def test_resolve_input_processor():
    p = load_stage_configs(YAML)
    fn = p.stage(1).resolve_input_processor()
    assert fn(7, 2) == 4  # cdiv


def test_single_stage():
    p = single_stage_pipeline(model="x")
    assert p.num_stages == 1 and p.stages[0].final_output


def test_overrides():
    p = load_stage_configs(
        __import__("yaml").safe_load(YAML),
        overrides={0: {"engine_args": {"max_num_seqs": 8}}})
    assert p.stage(0).engine_args["max_num_seqs"] == 8
