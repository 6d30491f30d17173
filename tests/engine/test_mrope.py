"""M-RoPE plumbing: 3-stream position ids for multimodal prompts
(reference: patched MRotaryEmbedding, patch.py:108-119)."""

import numpy as np

from vllm_omni_tpu.config.engine import EngineConfig
from vllm_omni_tpu.core.sampling_params import SamplingParams
from vllm_omni_tpu.engine.core import EngineCore
from vllm_omni_tpu.models.multimodal import MMProcessor

AUDIO, IMAGE = 250, 251
HF = {
    "architectures": ["Qwen3ForCausalLM"],
    "vocab_size": 256, "hidden_size": 32, "intermediate_size": 64,
    "num_hidden_layers": 2, "num_attention_heads": 2,
    "num_key_value_heads": 2, "head_dim": 16, "eos_token_id": 0,
    "rope_scaling": {"mrope_section": [2, 3, 3]},  # sums to head_dim//2
}
MM = {"audio_token_id": AUDIO, "image_token_id": IMAGE,
      "audio": {"n_mels": 16, "hidden_size": 32, "num_layers": 1,
                "num_heads": 2, "max_frames": 64}}


def test_position_ids_structure():
    proc = MMProcessor(32, MM)
    # text(2) + image 2x2 grid(4) + text(1) + audio(3)
    toks = [1, 2] + [IMAGE] * 4 + [3] + [AUDIO] * 3
    pos, delta = proc.compute_mrope_positions(toks)
    # text: all streams equal
    assert pos[:, 0].tolist() == [0, 0, 0]
    assert pos[:, 1].tolist() == [1, 1, 1]
    # image run: t constant, (h, w) grid
    assert pos[0, 2:6].tolist() == [2, 2, 2, 2]
    assert pos[1, 2:6].tolist() == [2, 2, 3, 3]
    assert pos[2, 2:6].tolist() == [2, 3, 2, 3]
    # text after image: max+1 = 4
    assert pos[:, 6].tolist() == [4, 4, 4]
    # audio: time advances
    assert pos[0, 7:10].tolist() == [5, 6, 7]
    # delta = max+1 - T = 8 - 10
    assert delta == 8 - 10


def test_mrope_engine_e2e_and_determinism():
    def make():
        return EngineCore(EngineConfig.from_kwargs(
            model="dummy", hf_overrides=HF, dtype="float32",
            max_model_len=128, num_pages=32, page_size=16,
            max_num_seqs=4, max_num_batched_tokens=64, mm_encoders=MM))

    def gen(eng, prompt, mm=None):
        sp = SamplingParams(max_tokens=6, temperature=0.0,
                            ignore_eos=True)
        eng.add_request(prompt, sp,
                        mm_inputs={"audio": mm} if mm is not None else
                        None)
        while eng.has_unfinished():
            for o in eng.step():
                if o.finished:
                    return o.outputs[0].token_ids

    mel = np.random.default_rng(0).standard_normal((32, 16)).astype(
        np.float32)
    prompt = [1, 2, 3] + [AUDIO] * 8 + [4]
    a = gen(make(), prompt, mel)
    b = gen(make(), prompt, mel)
    assert a == b and len(a) == 6
    # mrope vs absent-mm text prompt still works (1D broadcast path)
    c = gen(make(), [5, 6, 7, 8])
    assert len(c) == 6
