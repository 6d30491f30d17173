"""Dense flash attention kernel vs XLA oracle (interpret tier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.flash_attention import flash_attention_pallas


@pytest.mark.parametrize("t,s,causal", [(160, 160, False),
                                        (100, 257, False),
                                        (128, 128, True)],
                         ids=["square", "ragged-pads", "causal"])
def test_flash_matches_xla(t, s, causal):
    b, h, d = 2, 2, 128
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (b, t, h, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, s, h, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, s, h, d),
                          jnp.float32)
    ref = mha_xla(q, k, v, scale=d ** -0.5, causal=causal)
    got = flash_attention_pallas(q, k, v, scale=d ** -0.5, causal=causal,
                                 q_block=64, block_s=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int8_attention_close_to_exact():
    """SageAttention-role int8 Q/K attention tracks exact attention
    within quantization tolerance, including under key outliers (the
    mean-centering absorbs a large common key offset exactly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vllm_omni_tpu.ops.attention import mha_xla
    from vllm_omni_tpu.ops.flash_attention import int8_attention

    b, t, h, d = 2, 64, 4, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, t, h, d))
    # big common offset on keys: breaks naive int8, centered handles it
    k = jax.random.normal(kk, (b, t, h, d)) + 12.0
    v = jax.random.normal(kv, (b, t, h, d))
    ref = mha_xla(q, k, v, scale=d ** -0.5, causal=False)
    got = int8_attention(q, k, v, scale=d ** -0.5)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 5e-2, err


def test_int8_attention_backend_in_dit():
    """attention_backend="int8" runs the DiT denoise end-to-end and
    stays near the exact-attention output."""
    import numpy as np

    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion import DiffusionConfig, DiffusionEngine

    def run(backend):
        eng = DiffusionEngine(DiffusionConfig(
            dit=dict(hidden_size=32, num_layers=1, num_heads=2,
                     head_dim=16, latent_channels=4, patch_size=2,
                     text_dim=16, axes_dims_rope=(4, 6, 6),
                     attention_backend=backend),
            dtype="float32", vae_latent_channels=4, flow_shift=1.0,
            resolution_buckets=((16, 16),)))
        return eng.generate([DiffusionRequest(
            "r", "x", DiffusionSamplingParams(
                num_inference_steps=2, height=16, width=16,
                guidance_scale=1.0, seed=0, output_type="latent"))])[0]

    exact = run("auto")
    quant = run("int8")
    assert quant.error is None
    diff = np.mean(np.abs(np.asarray(quant.images, np.float32) -
                          np.asarray(exact.images, np.float32)))
    assert diff < 2e-2, diff  # reference DIFF_MEAN_THRESHOLD tier
