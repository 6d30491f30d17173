"""`python -m vllm_omni_tpu.entrypoints.cli` (reference: `vllm` console
script, entrypoints/cli/main.py:9)."""
import sys

from vllm_omni_tpu.entrypoints.cli.main import main

sys.exit(main())
