"""User-facing entrypoints (reference: vllm_omni/entrypoints/)."""
