"""BigVGAN-class vocoder structure (reference code2wav/token2wav towers
of qwen2_5_omni/qwen3_omni): snake activation, transposed-conv
upsampling, multi-receptive-field fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_omni_tpu.models.vocoder import (VocoderConfig, _snake,
                                          init_vocoder, vocoder_forward)


def test_output_shape_and_range():
    cfg = VocoderConfig(input_dim=32, channels=32,
                        upsample_factors=(4, 3, 2))
    params = init_vocoder(cfg, jax.random.PRNGKey(0))
    codes = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 32))
    wav = np.asarray(vocoder_forward(params, cfg, codes))
    assert wav.shape == (2, 7 * 24)  # 4*3*2 samples per frame
    assert np.all(np.abs(wav) <= 1.0)  # tanh head
    assert np.isfinite(wav).all()


def test_mrf_structure():
    cfg = VocoderConfig(input_dim=16, channels=16,
                        upsample_factors=(2, 2),
                        mrf_kernels=(3, 7, 11), mrf_dilations=(1, 3, 5))
    params = init_vocoder(cfg, jax.random.PRNGKey(0))
    for stage in params["stages"]:
        assert len(stage["mrf"]) == 3  # one resblock per kernel size
        for k, block in zip((3, 7, 11), stage["mrf"]):
            assert len(block["convs1"]) == 3  # one conv per dilation
            assert block["convs1"][0]["w"].shape[0] == k
            # second conv of each pair is same-kernel, dilation 1
            assert block["convs2"][0]["w"].shape[0] == k


def test_snake_activation():
    """snake(x) = x + sin²(αx)/α: identity-plus-periodic, α=1 default;
    larger α → higher-frequency ripple, bounded deviation 1/α."""
    x = jnp.linspace(-4, 4, 101)
    y1 = np.asarray(_snake(x, jnp.ones(())))
    np.testing.assert_allclose(y1, np.asarray(x) + np.sin(
        np.asarray(x)) ** 2, rtol=1e-5, atol=1e-5)
    y4 = np.asarray(_snake(x, jnp.full((), 4.0)))
    assert np.abs(y4 - np.asarray(x)).max() <= 0.25 + 1e-5


def test_determinism_and_jit():
    cfg = VocoderConfig(input_dim=16, channels=16,
                        upsample_factors=(2, 2))
    params = init_vocoder(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(lambda p, c: vocoder_forward(p, cfg, c))
    codes = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 16))
    a = np.asarray(fn(params, codes))
    b = np.asarray(fn(params, codes))
    np.testing.assert_array_equal(a, b)
