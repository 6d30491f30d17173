"""Prometheus text-exposition rendering of serving metrics.

Reference parity: each reference stage inherits upstream vLLM's
Prometheus metrics (SURVEY.md §5.5; reference
tests/entrypoints/openai_api/test_serving_chat_metrics.py). Here one
scrape endpoint aggregates the whole pipeline: request/token counters,
per-stage throughput, transfer-edge bytes, scheduler queue depths and
TTFT/TPOT/E2E histograms, rendered in the text format
(``text/plain; version=0.0.4``) so a stock Prometheus server can scrape
``GET /metrics`` with no client library required.
"""

from __future__ import annotations

import math
from typing import Any, Optional

from vllm_omni_tpu.metrics.stats import OrchestratorAggregator

CONTENT_TYPE = "text/plain; version=0.0.4; charset=utf-8"

# seconds; chosen to resolve both sub-100ms TTFT and multi-minute video
_TIME_BUCKETS = (0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0,
                 10.0, 30.0, 60.0, 120.0, 300.0)


def _fmt(v: float) -> str:
    if v == math.inf:
        return "+Inf"
    return repr(float(v)) if not float(v).is_integer() else str(int(v))


class _Writer:
    def __init__(self) -> None:
        self.lines: list[str] = []

    def header(self, name: str, mtype: str, help_: str) -> None:
        self.lines.append(f"# HELP {name} {help_}")
        self.lines.append(f"# TYPE {name} {mtype}")

    def sample(self, name: str, value: float,
               labels: Optional[dict[str, Any]] = None) -> None:
        lbl = ""
        if labels:
            inner = ",".join(f'{k}="{v}"' for k, v in labels.items())
            lbl = "{" + inner + "}"
        self.lines.append(f"{name}{lbl} {_fmt(value)}")

    def histogram(self, name: str, values: list[float], help_: str) -> None:
        self.header(name, "histogram", help_)
        count = 0
        for b in _TIME_BUCKETS:
            count = sum(1 for v in values if v <= b)
            self.sample(name + "_bucket", count, {"le": _fmt(b)})
        self.sample(name + "_bucket", len(values), {"le": "+Inf"})
        self.sample(name + "_sum", sum(values))
        self.sample(name + "_count", len(values))

    def render(self) -> str:
        return "\n".join(self.lines) + "\n"


def _queue_depths(runner: Any) -> dict[int, dict[str, int]]:
    """Best-effort scheduler queue depths per stage. Inline engines
    expose their scheduler directly; subprocess stages don't (their
    queues live in another process) and are skipped."""
    depths: dict[int, dict[str, int]] = {}
    for sid, handle in getattr(runner, "handles", {}).items():
        sched = getattr(getattr(handle, "engine", None), "scheduler", None)
        if sched is None:
            continue
        depths[sid] = {
            "waiting": len(getattr(sched, "waiting", ())),
            "running": len(getattr(sched, "running", ())),
            "waiting_for_chunk": len(getattr(sched, "waiting_for_chunk",
                                             ())),
            "waiting_for_transfer": len(getattr(sched,
                                                "waiting_for_transfer",
                                                ())),
        }
    return depths


def render_prometheus(stats: OrchestratorAggregator,
                      runner: Any = None) -> str:
    w = _Writer()
    pre = "vllm_omni_"

    done = [r for r in stats.requests.values() if r.finish_ts is not None]
    w.header(pre + "requests_total", "counter", "Requests received.")
    w.sample(pre + "requests_total", len(stats.requests))
    w.header(pre + "requests_finished_total", "counter",
             "Requests finished.")
    w.sample(pre + "requests_finished_total", len(done))
    w.header(pre + "requests_active", "gauge", "Requests in flight.")
    w.sample(pre + "requests_active", len(stats.requests) - len(done))

    w.header(pre + "stage_tokens_total", "counter",
             "Output tokens emitted per stage.")
    for sid, st in sorted(stats.stages.items()):
        w.sample(pre + "stage_tokens_total", st.num_tokens_out,
                 {"stage": sid})
    w.header(pre + "stage_requests_finished_total", "counter",
             "Requests finished per stage.")
    for sid, st in sorted(stats.stages.items()):
        w.sample(pre + "stage_requests_finished_total", st.num_finished,
                 {"stage": sid})
    w.header(pre + "stage_tokens_per_second", "gauge",
             "Average stage throughput since first output.")
    for sid, st in sorted(stats.stages.items()):
        w.sample(pre + "stage_tokens_per_second", st.tps_avg,
                 {"stage": sid})

    w.header(pre + "transfer_bytes_total", "counter",
             "Inter-stage transfer bytes per edge.")
    for edge, nbytes in sorted(stats.transfer_bytes.items()):
        w.sample(pre + "transfer_bytes_total", nbytes, {"edge": edge})

    if runner is not None:
        depths = _queue_depths(runner)
        if depths:
            w.header(pre + "scheduler_queue_depth", "gauge",
                     "Scheduler queue depth per stage and state.")
            for sid, states in sorted(depths.items()):
                for state, n in states.items():
                    w.sample(pre + "scheduler_queue_depth", n,
                             {"stage": sid, "state": state})

    w.histogram(pre + "ttft_seconds",
                [r.ttft_s for r in done if r.ttft_s is not None],
                "Time to first token.")
    w.histogram(pre + "tpot_seconds",
                [r.tpot_s for r in done if r.tpot_s is not None],
                "Time per output token.")
    w.histogram(pre + "e2e_seconds",
                [r.e2e_s for r in done if r.e2e_s is not None],
                "End-to-end request latency.")
    ttfps = [r.ttfp_s for r in done if r.ttfp_s is not None]
    if ttfps:
        w.histogram(pre + "ttfp_seconds", ttfps,
                    "Time to first perceivable output (audio/image).")
    return w.render()
