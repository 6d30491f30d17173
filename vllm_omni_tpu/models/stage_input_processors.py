"""Stage input processors: glue stage N outputs into stage N+1 prompts.

Reference parity: model_executor/stage_input_processors/*.py (17 files) —
e.g. `thinker2talker` (qwen3_omni.py:174-238) packs thinker hidden states
+ tts text embeds into `additional_information` for the talker prompt.

Signature: fn(prev_outputs: dict[stage_id, RequestOutput], stage_cfg,
ctx) -> add_request payload kwargs.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from vllm_omni_tpu.config.stage_config import StageConfig
from vllm_omni_tpu.core.outputs import RequestOutput


def thinker2talker(prev_outputs: dict[int, RequestOutput],
                   stage: StageConfig, ctx: dict[str, Any]
                   ) -> dict[str, Any]:
    """Thinker → talker: the talker's prompt is the thinker's per-token
    hidden states (embeddings prompt); the thinker's sampled text ids
    ride along in additional_information for the talker's text
    conditioning (reference qwen3_omni.py:174 packs thinker hidden +
    embeds into additional_information)."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    if comp.hidden_states is None:
        raise ValueError("thinker2talker needs thinker hidden states")
    return {
        "prompt_token_ids": [],
        "prompt_embeds": np.asarray(comp.hidden_states, np.float32),
        "additional_information": {
            "thinker_token_ids": list(comp.token_ids),
            **{k: v for k, v in prev.additional_information.items()
               if k != "hidden_states"},
        },
    }


def talker2code2wav(prev_outputs: dict[int, RequestOutput],
                    stage: StageConfig, ctx: dict[str, Any]
                    ) -> dict[str, Any]:
    """Talker → code2wav: codec token ids become the vocoder stage's
    prompt (non-chunked fallback path; async_chunk edges stream instead —
    orchestrator._forward_chunks)."""
    src = stage.engine_input_source[0]
    prev = prev_outputs[src]
    comp = prev.outputs[0]
    payload: dict[str, Any] = {"prompt_token_ids": list(comp.token_ids)}
    codes = prev.additional_information.get("codec_codes")
    if codes is not None:
        # full RVQ code matrix from the talker's MTP code predictor
        payload["additional_information"] = {"codec_codes": codes}
    return payload
