"""MoE DiT blocks (HunyuanImage3 role, reference diffusion/models/
hunyuan_image3 MoE transformer + expert parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_omni_tpu.diffusion.config import DiTConfig
from vllm_omni_tpu.diffusion.dit import (dit_forward, dit_param_shardings,
                                         init_dit_params)

BASE = dict(hidden_size=64, num_layers=2, num_heads=4, head_dim=16,
            latent_channels=4, patch_size=2, text_dim=64,
            axes_dims_rope=(4, 6, 6))


def _run(cfg, params, seed=0):
    key = jax.random.PRNGKey(seed)
    lat = jax.random.normal(key, (1, 8, 8, 4), jnp.float32)
    txt = jax.random.normal(key, (1, 6, 64), jnp.float32)
    t = jnp.full((1,), 500.0, jnp.float32)
    return np.asarray(dit_forward(params, cfg, lat, txt, t))


def test_single_expert_top1_equals_dense():
    """E=1 routed MoE with the dense weights IS the dense block
    (softmax over one logit = 1.0)."""
    dense_cfg = DiTConfig(**BASE)
    dense = init_dit_params(dense_cfg, jax.random.PRNGKey(0),
                            jnp.float32)
    moe_cfg = DiTConfig(**BASE, num_experts=1, num_experts_per_tok=1)
    moe = init_dit_params(moe_cfg, jax.random.PRNGKey(0), jnp.float32)
    for ld, lm in zip(dense["layers"], moe["layers"]):
        # graft dense FFN weights into the single expert; dense biases
        # are zero at init so the no-bias expert matches exactly
        assert float(jnp.abs(ld["mlp_in"]["b"]).max()) == 0.0
        lm["experts"]["mlp_in"] = ld["mlp_in"]["w"][None]
        lm["experts"]["mlp_out"] = ld["mlp_out"]["w"][None]
        for k in ("ada_mod", "q_proj", "k_proj", "v_proj", "o_proj",
                  "q_norm", "k_norm"):
            lm[k] = ld[k]
    for k in dense:
        if k != "layers":
            moe[k] = dense[k]
    np.testing.assert_allclose(_run(moe_cfg, moe),
                               _run(dense_cfg, dense),
                               rtol=1e-5, atol=1e-5)


def test_moe_forward_finite_and_expert_dependence():
    cfg = DiTConfig(**BASE, num_experts=4, num_experts_per_tok=2)
    params = init_dit_params(cfg, jax.random.PRNGKey(1), jnp.float32)
    out = _run(cfg, params)
    assert np.isfinite(out).all()
    # zeroing one expert's weights changes the output (it is routed to)
    import copy

    p2 = copy.deepcopy(params)
    p2["layers"][0]["experts"]["mlp_out"] = \
        p2["layers"][0]["experts"]["mlp_out"].at[0].set(0.0)
    out2 = _run(cfg, p2)
    assert np.abs(out - out2).max() > 1e-6


def test_moe_ep_sharded_mesh_matches_single_device():
    """Expert-parallel: params sharded over an EP(tp) mesh produce the
    single-device result (XLA inserts the routed-combine psum)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    from jax.sharding import Mesh, NamedSharding

    cfg = DiTConfig(**BASE, num_experts=4, num_experts_per_tok=2)
    params = init_dit_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    ref = _run(cfg, params)
    mesh = Mesh(np.array(jax.devices()[:2]).reshape(2), ("tp",))
    specs = dit_param_shardings(params)
    sharded = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, specs)
    # expert leaves actually shard over tp
    leaf = sharded["layers"][0]["experts"]["mlp_in"]
    assert len(leaf.sharding.device_set) == 2
    out = _run(cfg, sharded)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)
