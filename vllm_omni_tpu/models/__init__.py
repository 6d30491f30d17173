"""AR model zoo (reference: vllm_omni/model_executor/models/registry.py:7).

The reference merges its omni models over upstream vLLM's registry; we own
the whole registry. Models are pure functions over parameter pytrees —
idiomatic JAX — not module classes: the runner jits `forward` closures with
donated KV buffers, and sharding is a pytree of PartitionSpecs produced
next to the params.
"""

from vllm_omni_tpu.models.decoder import (DecoderConfig, compute_logits,
                                          decoder_forward, init_params,
                                          param_shardings)
from vllm_omni_tpu.models.weights import (hf_config_to_decoder_config,
                                          load_model, quantize_params)

__all__ = [
    "DecoderConfig",
    "decoder_forward",
    "compute_logits",
    "init_params",
    "param_shardings",
    "load_model",
    "quantize_params",
    "hf_config_to_decoder_config",
]
