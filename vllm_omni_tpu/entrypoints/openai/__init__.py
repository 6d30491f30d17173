"""OpenAI-compatible serving layer (reference:
vllm_omni/entrypoints/openai/)."""
