"""PromptEncoder wiring: a flux pipeline dir with REAL text towers
(CLIP pooled + T5 sequence, genuine transformers save_pretrained
checkpoints + offline tokenizers) must encode prompts through those
towers end-to-end — no hash-embed fallback. Reference:
pipeline_flux.py encode_prompt (CLIP text_encoder pooled +
T5 text_encoder_2 sequence)."""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from safetensors.torch import save_file  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tests.diffusion.test_flux_loader import TINY, _tiny_state_dict

VOCAB = {"<pad>": 0, "</s>": 1, "<unk>": 2, "a": 3, "cat": 4, "dog": 5,
         "photo": 6, "of": 7, "riding": 8, "bicycle": 9}


def _write_tokenizer(root, name):
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    d = root / name
    d.mkdir()
    tok = Tokenizer(models.WordLevel(VOCAB, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="$A </s>", special_tokens=[("</s>", 1)])
    tok.save(str(d / "tokenizer.json"))
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "pad_token": "<pad>", "eos_token": "</s>",
                   "unk_token": "<unk>"}, f)


@pytest.fixture(scope="module")
def pipeline_dir(tmp_path_factory):
    from transformers import (CLIPTextConfig, CLIPTextModel, T5Config,
                              T5EncoderModel)

    root = tmp_path_factory.mktemp("flux_with_towers")
    (root / "transformer").mkdir()
    (root / "scheduler").mkdir()
    (root / "vae").mkdir()
    with open(root / "model_index.json", "w") as f:
        json.dump({"_class_name": "FluxPipeline",
                   "transformer": ["diffusers", "FluxTransformer2DModel"],
                   "scheduler": ["diffusers",
                                 "FlowMatchEulerDiscreteScheduler"],
                   "vae": ["diffusers", "AutoencoderKL"],
                   "text_encoder": ["transformers", "CLIPTextModel"],
                   "text_encoder_2": ["transformers",
                                      "T5EncoderModel"]}, f)
    with open(root / "transformer" / "config.json", "w") as f:
        json.dump({"_class_name": "FluxTransformer2DModel", **TINY}, f)
    with open(root / "scheduler" / "scheduler_config.json", "w") as f:
        json.dump({"_class_name": "FlowMatchEulerDiscreteScheduler",
                   "num_train_timesteps": 1000, "shift": 1.0,
                   "use_dynamic_shifting": False}, f)
    with open(root / "vae" / "config.json", "w") as f:
        json.dump({"_class_name": "AutoencoderKL",
                   "latent_channels": 4,
                   "block_out_channels": [16, 32, 32, 32]}, f)
    save_file(_tiny_state_dict(),
              str(root / "transformer" /
                  "diffusion_pytorch_model.safetensors"))
    torch.manual_seed(7)
    # CLIP hidden_size == the flux pooled_projection_dim (no projection
    # head → pooled = EOS hidden state)
    clip = CLIPTextModel(CLIPTextConfig(
        vocab_size=16, hidden_size=TINY["pooled_projection_dim"],
        intermediate_size=48, num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=77, eos_token_id=1, bos_token_id=2,
        pad_token_id=0)).eval()
    clip.save_pretrained(root / "text_encoder")
    _write_tokenizer(root, "tokenizer")
    # T5 d_model == the flux joint_attention_dim (context embedder input)
    t5 = T5EncoderModel(T5Config(
        vocab_size=16, d_model=TINY["joint_attention_dim"], d_kv=8,
        d_ff=64, num_layers=2, num_heads=4,
        relative_attention_num_buckets=8,
        relative_attention_max_distance=16, dropout_rate=0.0)).eval()
    t5.save_pretrained(root / "text_encoder_2")
    _write_tokenizer(root, "tokenizer_2")
    return str(root)


def test_prompt_encoder_parity_vs_transformers(pipeline_dir):
    from transformers import AutoTokenizer, CLIPTextModel, T5EncoderModel

    from vllm_omni_tpu.diffusion.prompt_encoder import PromptEncoder

    pe = PromptEncoder(pipeline_dir, dtype=jnp.float32)
    assert pe.available
    assert {s: v[0] for s, v in pe.encoders.items()} == {
        "text_encoder": "clip", "text_encoder_2": "t5"}
    prompt = "a photo of a cat riding a bicycle"
    out = pe.encode(prompt, "flux", 64)
    assert out["text_states"].shape == (1, 64,
                                        TINY["joint_attention_dim"])
    assert out["pooled"].shape == (1, TINY["pooled_projection_dim"])
    # golden: the genuine transformers towers on the same token ids
    t5_tok = AutoTokenizer.from_pretrained(pipeline_dir,
                                           subfolder="tokenizer_2")
    enc = t5_tok(prompt, padding="max_length", max_length=64,
                 truncation=True, return_tensors="pt")
    t5 = T5EncoderModel.from_pretrained(
        pipeline_dir + "/text_encoder_2").eval()
    with torch.no_grad():
        want_seq = t5(input_ids=enc["input_ids"],
                      attention_mask=enc["attention_mask"]
                      ).last_hidden_state.numpy()
    want_seq = want_seq * enc["attention_mask"].numpy()[..., None]
    np.testing.assert_allclose(out["text_states"], want_seq, atol=3e-4,
                               rtol=3e-3)
    clip_tok = AutoTokenizer.from_pretrained(pipeline_dir,
                                             subfolder="tokenizer")
    cenc = clip_tok(prompt, padding="max_length", max_length=64,
                    truncation=True, return_tensors="pt")
    clip = CLIPTextModel.from_pretrained(
        pipeline_dir + "/text_encoder").eval()
    with torch.no_grad():
        want_pooled = clip(input_ids=cenc["input_ids"]
                           ).pooler_output.numpy()
    np.testing.assert_allclose(out["pooled"], want_pooled, atol=3e-4,
                               rtol=3e-3)
    # cache: a second identical encode returns the same object
    assert pe.encode(prompt, "flux", 64) is out


def test_pipeline_uses_real_towers_end_to_end(pipeline_dir):
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    config = DiffusionConfig(model=pipeline_dir, dtype="float32",
                             resolution_buckets=((32, 32),),
                             flow_shift=1.0)
    eng = DiffusionEngine(config)
    pipe = eng.pipeline
    assert pipe.prompt_encoder is not None and pipe._uses_pooled
    prompt = "a photo of a dog"
    req = DiffusionRequest(
        "r0", prompt,
        DiffusionSamplingParams(num_inference_steps=2, height=32,
                                width=32, guidance_scale=3.5, seed=0,
                                output_type="np"))
    state = pipe.prepare(req)
    # the conditioning must be exactly the towers' output, not a hash
    # (row 0 = conditional; a CFG row would hold the negative prompt)
    enc = pipe.prompt_encoder.encode(prompt, "flux", pipe.TEXT_LEN)
    np.testing.assert_allclose(np.asarray(state.text_states[:1]),
                               enc["text_states"], atol=1e-5)
    assert state.pooled is not None
    np.testing.assert_allclose(np.asarray(state.pooled[:1]),
                               enc["pooled"], atol=1e-5)
    out = eng.generate([req])[0]
    assert out.finished and out.error is None
    assert out.images.shape == (1, 32, 32, 3)
    # pooled conditioning must actually reach the transformer: zeroing
    # it changes the denoised image
    state2 = pipe.prepare(req)
    state2.pooled = jnp.zeros_like(state2.pooled)
    while not state2.done:
        pipe.denoise_step(state2)
    state3 = pipe.prepare(req)
    while not state3.done:
        pipe.denoise_step(state3)
    a = np.asarray(state2.latents)
    b = np.asarray(state3.latents)
    assert np.abs(a - b).max() > 1e-6
