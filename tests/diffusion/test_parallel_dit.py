

def test_sp_uneven_seq_pads_instead_of_replicating():
    """Joint stream not divisible by the SP extent: the text bucket pads
    up (UAA role) and the sharded run still matches the single-device
    baseline (reference sequence_parallel.md:52-76 uneven-shard mode)."""
    import numpy as np

    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion import DiffusionConfig, DiffusionEngine

    # 16x16 latents / patch 2 → 16 patches; text 64 → joint 80, not
    # divisible by ulysses 2 x ring... use sp extent 3 via ulysses=3?
    # mesh axes are powers of two here; use text bucket tweak instead:
    # joint 80 % 8 == 0, so shrink to height 24 → 24/8=3 lat → invalid.
    # Simplest: force an sp extent that does NOT divide 80: ulysses=2,
    # ring=2 → 80 % 4 == 0... take 8: ulysses 8 → 80 % 8 == 0 too.
    # So drive unevenness from the patch side: 48x16 → 3x1=3 patches
    # → joint 67, 67 % 4 != 0 → pads to 68.
    def run(parallel):
        eng = DiffusionEngine(DiffusionConfig(
            dit=dict(hidden_size=32, num_layers=1, num_heads=2,
                     head_dim=16, latent_channels=4, patch_size=2,
                     text_dim=16, axes_dims_rope=(4, 6, 6)),
            dtype="float32", vae_latent_channels=4, flow_shift=1.0,
            resolution_buckets=((48, 16),), parallel=parallel or {}))
        return eng.generate([DiffusionRequest(
            "r", "x", DiffusionSamplingParams(
                num_inference_steps=2, height=48, width=16,
                guidance_scale=1.0, seed=0, output_type="latent"))])[0]

    base = run(None)
    assert base.error is None
    sharded = run({"ulysses_degree": 2, "ring_degree": 2})
    assert sharded.error is None
    np.testing.assert_allclose(
        np.asarray(sharded.images, np.float32),
        np.asarray(base.images, np.float32), rtol=5e-2, atol=2e-2)


def test_pipeline_parallel_dit_parity():
    """pp=2: transformer layer groups on two "pp" ranks with ppermute
    activation handoff (GPipe over the CFG batch rows) — exact parity
    with the single-device denoise (reference PipeFusion-style PP,
    group_coordinator.py:549)."""
    import numpy as np

    from vllm_omni_tpu.core.request import DiffusionRequest
    from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
    from vllm_omni_tpu.diffusion import DiffusionConfig, DiffusionEngine

    def run(parallel):
        eng = DiffusionEngine(DiffusionConfig(
            dit=dict(hidden_size=32, num_layers=2, num_heads=2,
                     head_dim=16, latent_channels=4, patch_size=2,
                     text_dim=16, axes_dims_rope=(4, 6, 6)),
            dtype="float32", vae_latent_channels=4, flow_shift=1.0,
            resolution_buckets=((16, 16),), parallel=parallel or {}))
        return eng.generate([DiffusionRequest(
            "r", "x", DiffusionSamplingParams(
                num_inference_steps=2, height=16, width=16,
                guidance_scale=4.0, seed=0, output_type="latent"))])[0]

    base = run(None)
    assert base.error is None
    pp = run({"pipeline_parallel_size": 2})
    assert pp.error is None, pp.error
    np.testing.assert_allclose(np.asarray(pp.images, np.float32),
                               np.asarray(base.images, np.float32),
                               rtol=2e-4, atol=2e-5)
