"""Diffusion (DiT) runtime (reference: vllm_omni/diffusion/).

TPU-first re-design of the reference's diffusion stack: the denoise step
is ONE jitted fixed-shape program (latents, text states, timestep in;
latents out) chosen per resolution bucket; request state between steps
lives host-side so step-mode scheduling can preempt/interleave without
device-side control flow (reference step contract:
diffusion/models/interface.py:37 prepare_encode/denoise_step/
step_scheduler/post_decode; step scheduler sched/step_scheduler.py:30).
"""

from vllm_omni_tpu.diffusion.config import DiffusionConfig
from vllm_omni_tpu.diffusion.engine import DiffusionEngine

__all__ = ["DiffusionConfig", "DiffusionEngine"]
