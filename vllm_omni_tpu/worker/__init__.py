"""Execution workers (reference: vllm_omni/worker/).

One worker = one stage's device executor. On TPU a "worker" owns the
stage's mesh (possibly all local chips) rather than a single GPU — SPMD
replaces the reference's per-GPU process fan-out for intra-stage
parallelism.
"""

from vllm_omni_tpu.worker.model_runner import ModelRunner

__all__ = ["ModelRunner"]
