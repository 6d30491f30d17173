"""Platform abstraction (reference: vllm_omni/platforms/interface.py:26).

The reference supports cuda/rocm/npu/xpu/musa through an `OmniPlatform` ABC.
We target TPU first, with a CPU platform for tests (mirrors the reference's
CPU unit tier, SURVEY.md §4). Detection is lazy so importing the package
never initializes a JAX backend.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass


@dataclass(frozen=True)
class Platform:
    """What the rest of the stack needs to know about the device."""

    device_type: str  # "tpu" | "cpu"
    supports_native_fp8: bool
    supports_pallas: bool  # compiled pallas kernels (vs interpret mode)
    default_dtype: str  # activation dtype

    @property
    def is_tpu(self) -> bool:
        return self.device_type == "tpu"

    @property
    def is_cpu(self) -> bool:
        return self.device_type == "cpu"

    def attn_backend(self) -> str:
        """Attention backend selection (reference:
        platforms/interface.py:75 get_diffusion_attn_backend_cls)."""
        return "pallas" if self.supports_pallas else "xla"


TPU_PLATFORM = Platform(
    device_type="tpu",
    # fp8 matmul is native on v5p+/v6; v5e emulates via bf16 upcast
    # (SURVEY.md §7 "hard parts"). We report False and upcast everywhere;
    # flip per-generation once detection is wired.
    supports_native_fp8=False,
    supports_pallas=True,
    default_dtype="bfloat16",
)

CPU_PLATFORM = Platform(
    device_type="cpu",
    supports_native_fp8=False,
    supports_pallas=False,  # pallas interpret=True only
    default_dtype="float32",
)


@functools.cache
def current_platform() -> Platform:
    forced = os.environ.get("OMNI_TPU_PLATFORM")
    if forced == "cpu":
        return CPU_PLATFORM
    if forced == "tpu":
        return TPU_PLATFORM
    import jax

    try:
        plat = jax.devices()[0].platform
    except Exception:
        return CPU_PLATFORM
    return TPU_PLATFORM if plat == "tpu" else CPU_PLATFORM
