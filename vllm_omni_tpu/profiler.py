"""Profiling hooks (reference: profiler/omni_torch_profiler.py:30
OmniTorchProfilerWrapper + HTTP profiler_router api_server.py:124).

On TPU this wraps jax.profiler: traces capture XLA device timelines
(viewable in TensorBoard/Perfetto), tagged per stage.
"""

from __future__ import annotations

import gzip
import os
import threading
import time
from typing import Optional

from vllm_omni_tpu.logger import init_logger

logger = init_logger(__name__)


class StageProfiler:
    """start/stop jax.profiler traces with stage-tagged output dirs."""

    def __init__(self, base_dir: str = "/tmp/omni_traces",
                 stage_id: int = 0) -> None:
        self.base_dir = base_dir
        self.stage_id = stage_id
        self._active_dir: Optional[str] = None
        self._lock = threading.Lock()

    @property
    def is_active(self) -> bool:
        return self._active_dir is not None

    def start(self) -> str:
        import jax

        with self._lock:
            if self._active_dir is not None:
                return self._active_dir
            out = os.path.join(
                self.base_dir,
                f"stage{self.stage_id}_{int(time.time())}")
            os.makedirs(out, exist_ok=True)
            jax.profiler.start_trace(out)
            self._active_dir = out
            logger.info("profiling started → %s", out)
            return out

    def stop(self) -> Optional[str]:
        import jax

        with self._lock:
            if self._active_dir is None:
                return None
            jax.profiler.stop_trace()
            out, self._active_dir = self._active_dir, None
            logger.info("profiling stopped → %s", out)
            return out


def annotate(name: str):
    """Context manager adding a named region to the trace (host + device
    timeline)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
