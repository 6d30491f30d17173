"""Pallas/TPU kernel layer.

Replaces the reference's native-kernel surface (SURVEY.md §2.9): upstream
vLLM CUDA kernels (paged attention, quantized GEMMs, sampler) and the
external attention libraries (flash-attn/FA3/FlashInfer/SageAttention).

Every op ships two implementations:
- ``*_xla``: pure jnp — runs everywhere, is the correctness oracle, and is
  what the CPU test tier executes (XLA still fuses it well).
- ``*_pallas``: hand-tiled TPU kernel for the hot path.

Dispatch picks Pallas on TPU unless OMNI_TPU_DISABLE_PALLAS=1.
"""

import os


def use_pallas() -> bool:
    if os.environ.get("OMNI_TPU_DISABLE_PALLAS") == "1":
        return False
    from vllm_omni_tpu.platforms import current_platform

    return current_platform().supports_pallas
