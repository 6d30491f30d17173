"""Logging setup (reference: vllm_omni/logger.py — we keep it dependency-free)."""

import logging
import os
import sys

_FORMAT = "%(levelname)s %(asctime)s [%(name)s:%(lineno)d] %(message)s"
_DATEFMT = "%m-%d %H:%M:%S"

_configured = False


def _configure_root() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(logging.Formatter(_FORMAT, datefmt=_DATEFMT))
    root = logging.getLogger("vllm_omni_tpu")
    root.addHandler(handler)
    level = os.environ.get("OMNI_TPU_LOG_LEVEL", "INFO").upper()
    root.setLevel(getattr(logging, level, logging.INFO))
    root.propagate = False
    _configured = True


def init_logger(name: str) -> logging.Logger:
    _configure_root()
    if not name.startswith("vllm_omni_tpu"):
        name = f"vllm_omni_tpu.{name}"
    return logging.getLogger(name)
