"""vllm-omni-tpu: a TPU-native omni-modality inference & serving framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of vllm-omni
(reference: /root/reference): any-to-any multimodal pipelines composed as a
DAG of disaggregated stages (AR LLM stages with continuous batching + paged
KV cache; diffusion/DiT stages with a natively scheduled denoise loop),
connected through a pluggable connector layer under an asyncio orchestrator.

Public API mirrors the reference's entrypoints (reference:
vllm_omni/entrypoints/omni.py:24, async_omni.py:43) but the implementation
is TPU-first: SPMD over jax.sharding.Mesh, Pallas kernels for the hot ops,
static-shape bucketed compilation instead of CUDA graphs.
"""

from vllm_omni_tpu.version import __version__

__all__ = [
    "__version__",
    "Omni",
    "AsyncOmni",
    "SamplingParams",
    "DiffusionSamplingParams",
    "RequestOutput",
]


def __getattr__(name):  # lazy imports keep `import vllm_omni_tpu` cheap
    if name == "Omni":
        from vllm_omni_tpu.entrypoints.omni import Omni

        return Omni
    if name == "AsyncOmni":
        from vllm_omni_tpu.entrypoints.async_omni import AsyncOmni

        return AsyncOmni
    if name == "SamplingParams":
        from vllm_omni_tpu.core.sampling_params import SamplingParams

        return SamplingParams
    if name == "DiffusionSamplingParams":
        from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams

        return DiffusionSamplingParams
    if name == "RequestOutput":
        from vllm_omni_tpu.core.outputs import RequestOutput

        return RequestOutput
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
