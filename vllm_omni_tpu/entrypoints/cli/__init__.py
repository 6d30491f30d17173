"""CLI (reference: vllm_omni/entrypoints/cli/)."""
