"""Metrics & observability (reference: vllm_omni/metrics/stats.py)."""

from vllm_omni_tpu.metrics.stats import (OrchestratorAggregator,
                                         RequestE2EStats, StageStats)

__all__ = ["StageStats", "RequestE2EStats", "OrchestratorAggregator"]
