from vllm_omni_tpu.core.block_manager import BlockManager
from vllm_omni_tpu.core.outputs import (CompletionOutput, DiffusionOutput,
                                        ModelRunnerOutput, RequestOutput)
from vllm_omni_tpu.core.request import (DiffusionRequest, Request,
                                        RequestStatus)
from vllm_omni_tpu.core.sampling_params import (DiffusionSamplingParams,
                                                SamplingParams)
from vllm_omni_tpu.core.scheduler import (ScheduledPrefill, Scheduler,
                                          SchedulerOutput)

__all__ = [
    "BlockManager",
    "CompletionOutput",
    "DiffusionOutput",
    "DiffusionRequest",
    "DiffusionSamplingParams",
    "ModelRunnerOutput",
    "Request",
    "RequestOutput",
    "RequestStatus",
    "SamplingParams",
    "ScheduledPrefill",
    "Scheduler",
    "SchedulerOutput",
]
