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
