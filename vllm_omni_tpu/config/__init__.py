from vllm_omni_tpu.config.engine import (CacheConfig, EngineConfig,
                                         ModelConfig, ParallelConfig,
                                         SchedulerConfig)
from vllm_omni_tpu.config.stage_config import (ModelPipeline, StageConfig,
                                               load_stage_configs)

__all__ = [
    "ModelConfig",
    "CacheConfig",
    "SchedulerConfig",
    "ParallelConfig",
    "EngineConfig",
    "StageConfig",
    "ModelPipeline",
    "load_stage_configs",
]
