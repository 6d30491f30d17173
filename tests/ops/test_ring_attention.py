"""Ring attention parity vs dense reference (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.ops.attention import mha_xla
from vllm_omni_tpu.ops.ring_attention import ring_attention
from vllm_omni_tpu.parallel import make_mesh


@pytest.mark.parametrize("shape", [(2, 2, 2), (4, 1, 2), (2, 4, 1)],
                         ids=["ring2xuly2xcfg2", "ring4", "ring2heads4"])
def test_ring_matches_dense(shape):
    ring, uly, cfgs = shape
    mesh = make_mesh((cfgs, ring, uly), ("cfg", "ring", "ulysses"))
    rng = jax.random.PRNGKey(0)
    b, t, h, d = 2, 32, 4, 16
    q, k, v = (jax.random.normal(jax.random.fold_in(rng, i),
                                 (b, t, h, d), jnp.float32)
               for i in range(3))
    ref = mha_xla(q, k, v, scale=d ** -0.5, causal=False)
    got = ring_attention(q, k, v, scale=d ** -0.5, mesh=mesh,
                         head_axes=("ulysses",))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_in_dit_pipeline():
    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion.config import DiffusionConfig, DiTConfig
    from vllm_omni_tpu.diffusion.engine import DiffusionEngine

    tiny = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
                latent_channels=4, patch_size=2, text_dim=32,
                axes_dims_rope=(4, 6, 6))

    def run(parallel):
        eng = DiffusionEngine(DiffusionConfig(
            dit=DiTConfig(**tiny), dtype="float32",
            vae_latent_channels=4, flow_shift=1.0,
            resolution_buckets=((32, 32),), parallel=parallel or {}))
        p = DiffusionSamplingParams(num_inference_steps=2, height=32,
                                    width=32, seed=5, guidance_scale=1.0,
                                    output_type="latent")
        return eng.generate([DiffusionRequest("r", "x", p)])[0].images

    base = run(None)
    ringed = run({"ring_degree": 2, "ulysses_degree": 2})
    np.testing.assert_allclose(ringed, base, rtol=2e-4, atol=2e-4)
