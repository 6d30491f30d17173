"""Per-stage / per-request serving metrics.

Reference parity: metrics/stats.py (StageStats :18, StageRequestStats :28,
TransferEdgeStats :59, RequestE2EStats :75, OrchestratorAggregator :115
with build_and_log_summary :464) and the --log-stats *.stats.jsonl files
(benchmarks/qwen3-omni/README.md:57-61). Metrics of record: TTFT, TPOT,
ITL, TTFP, RTF, E2E, per-stage tok/s (BASELINE.md).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from typing import Any, Optional

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


@dataclass
class StageStats:
    """Rolling per-stage counters."""

    stage_id: int
    num_requests: int = 0
    num_finished: int = 0
    num_tokens_out: int = 0
    busy_s: float = 0.0
    first_ts: Optional[float] = None
    last_ts: Optional[float] = None

    @property
    def tps_avg(self) -> float:
        if not self.first_ts or not self.last_ts or \
                self.last_ts <= self.first_ts:
            return 0.0
        return self.num_tokens_out / (self.last_ts - self.first_ts)


@dataclass
class RequestE2EStats:
    request_id: str
    arrival_ts: float
    finish_ts: Optional[float] = None
    ttft_s: Optional[float] = None  # first text token
    ttfp_s: Optional[float] = None  # first perceivable output (audio/img)
    stage_durations: dict[str, float] = field(default_factory=dict)
    num_output_tokens: int = 0
    audio_seconds: float = 0.0
    # inter-token latency accumulators (wire-visible token batches)
    last_token_ts: Optional[float] = None
    itl_sum_s: float = 0.0
    itl_count: int = 0
    itl_max_s: float = 0.0

    @property
    def itl_mean_s(self) -> Optional[float]:
        return self.itl_sum_s / self.itl_count if self.itl_count else None

    @property
    def e2e_s(self) -> Optional[float]:
        if self.finish_ts is None:
            return None
        return self.finish_ts - self.arrival_ts

    @property
    def tpot_s(self) -> Optional[float]:
        if self.ttft_s is None or self.finish_ts is None or \
                self.num_output_tokens <= 1:
            return None
        return (self.e2e_s - self.ttft_s) / (self.num_output_tokens - 1)

    @property
    def rtf(self) -> Optional[float]:
        """Real-time factor for audio output: compute time / audio time."""
        if self.audio_seconds <= 0 or self.e2e_s is None:
            return None
        return self.e2e_s / self.audio_seconds


class OrchestratorAggregator:
    """Collects stage + request stats; emits summaries and stats.jsonl
    lines (reference OrchestratorAggregator :115)."""

    def __init__(self, log_stats_path: Optional[str] = None) -> None:
        self.stages: dict[int, StageStats] = {}
        self.requests: dict[str, RequestE2EStats] = {}
        self.transfer_bytes: dict[str, int] = {}
        self.log_stats_path = log_stats_path

    # -- recording ----------------------------------------------------------
    def on_request_start(self, request_id: str) -> None:
        self.requests[request_id] = RequestE2EStats(
            request_id=request_id, arrival_ts=time.monotonic())

    def on_stage_output(self, stage_id: int, request_id: str,
                        num_new_tokens: int = 0,
                        finished: bool = False) -> None:
        st = self.stages.setdefault(stage_id, StageStats(stage_id))
        now = time.monotonic()
        if st.first_ts is None:
            st.first_ts = now
        st.last_ts = now
        st.num_tokens_out += num_new_tokens
        if finished:
            st.num_finished += 1
        req = self.requests.get(request_id)
        if req is not None and num_new_tokens:
            if req.ttft_s is None:
                req.ttft_s = now - req.arrival_ts
            elif req.last_token_ts is not None:
                itl = (now - req.last_token_ts) / num_new_tokens
                req.itl_sum_s += itl * num_new_tokens
                req.itl_count += num_new_tokens
                req.itl_max_s = max(req.itl_max_s, itl)
            req.last_token_ts = now

    def on_request_finish(self, request_id: str,
                          output: Any = None) -> None:
        req = self.requests.get(request_id)
        if req is None:
            return
        req.finish_ts = time.monotonic()
        if output is not None:
            if output.outputs:
                req.num_output_tokens = len(output.outputs[0].token_ids)
            req.stage_durations = dict(output.stage_durations)
            audio = output.multimodal_output.get("audio") \
                if output.multimodal_output else None
            if isinstance(audio, dict) and "data" in audio:
                import numpy as np

                sr = audio.get("sample_rate", 24000)
                req.audio_seconds = len(np.asarray(audio["data"])) / sr
            if req.ttfp_s is None and output.multimodal_output:
                req.ttfp_s = req.finish_ts - req.arrival_ts
        self._maybe_log(req)

    def on_transfer(self, edge: str, nbytes: int) -> None:
        self.transfer_bytes[edge] = self.transfer_bytes.get(edge,
                                                           0) + nbytes

    # -- summaries ----------------------------------------------------------
    def request_summary(self, request_id: str) -> dict[str, Any]:
        req = self.requests.get(request_id)
        if req is None:
            return {}
        return {
            "request_id": req.request_id,
            "e2e_s": req.e2e_s,
            "ttft_s": req.ttft_s,
            "ttfp_s": req.ttfp_s,
            "tpot_s": req.tpot_s,
            "itl_mean_s": req.itl_mean_s,
            "itl_max_s": req.itl_max_s if req.itl_count else None,
            "rtf": req.rtf,
            "num_output_tokens": req.num_output_tokens,
            "stage_durations": req.stage_durations,
        }

    def overall_summary(self) -> dict[str, Any]:
        done = [r for r in self.requests.values()
                if r.finish_ts is not None]
        out: dict[str, Any] = {
            "num_requests": len(self.requests),
            "num_finished": len(done),
            "stages": {sid: {"tps_avg": st.tps_avg,
                             "tokens": st.num_tokens_out,
                             "finished": st.num_finished}
                       for sid, st in self.stages.items()},
            "transfer_bytes": dict(self.transfer_bytes),
        }
        if done:
            import statistics

            e2es = [r.e2e_s for r in done]
            out["e2e_mean_s"] = statistics.mean(e2es)
            ttfts = [r.ttft_s for r in done if r.ttft_s is not None]
            if ttfts:
                out["ttft_mean_s"] = statistics.mean(ttfts)
            tpots = [r.tpot_s for r in done if r.tpot_s is not None]
            if tpots:
                out["tpot_mean_s"] = statistics.mean(tpots)
            total_toks = sum(r.num_output_tokens for r in done)
            span = max(r.finish_ts for r in done) - min(
                r.arrival_ts for r in done)
            out["overall_tps"] = total_toks / span if span > 0 else 0.0
        return out

    def _maybe_log(self, req: RequestE2EStats) -> None:
        if self.log_stats_path:
            with open(self.log_stats_path, "a") as f:
                f.write(json.dumps(self.request_summary(req.request_id)) +
                        "\n")
        logger.info("request %s done: %s", req.request_id,
                    self.request_summary(req.request_id))
