"""Process-isolated diffusion stages: output parity with the inline
engine, and death detection — killing the stage proc mid-request yields
per-request error outputs instead of a hang (reference
StageDiffusionProc stage_diffusion_proc.py:42 + stage death cleanup,
engine/stage_init_utils.py)."""

import time

import numpy as np

from vllm_omni_tpu.core.request import DiffusionRequest
from vllm_omni_tpu.core.sampling_params import DiffusionSamplingParams
from vllm_omni_tpu.engine.diffusion_proc import DiffusionProcClient

CONF = dict(
    dit=dict(hidden_size=32, num_layers=1, num_heads=2, head_dim=16,
             latent_channels=4, patch_size=2, text_dim=16,
             axes_dims_rope=(4, 6, 6)),
    dtype="float32", vae_latent_channels=4, flow_shift=1.0,
    resolution_buckets=((16, 16),))


def _req(rid="r1", steps=2):
    return DiffusionRequest(
        request_id=rid, prompt="x",
        params=DiffusionSamplingParams(
            num_inference_steps=steps, height=16, width=16,
            guidance_scale=1.0, seed=0, output_type="latent"))


def test_proc_matches_inline_latents():
    from vllm_omni_tpu.diffusion import DiffusionConfig, DiffusionEngine

    inline = DiffusionEngine(DiffusionConfig(**CONF))
    want = inline.generate([_req()])[0]
    assert want.error is None

    client = DiffusionProcClient(CONF, platform="cpu")
    try:
        client.add_request(_req())
        outs = []
        t0 = time.time()
        while client.has_unfinished() and time.time() - t0 < 120:
            outs.extend(client.step())
            time.sleep(0.01)
        finals = [o for o in outs if o.finished]
        assert finals and finals[0].error is None
        np.testing.assert_allclose(np.asarray(finals[0].images),
                                   np.asarray(want.images),
                                   rtol=5e-2, atol=2e-2)  # cross-process CPU
        # backend reduction-order drift (reference tolerance tier:
        # DIFF_MEAN_THRESHOLD=2e-2, test_sequence_parallel.py:42)
    finally:
        client.shutdown()


def test_proc_death_reports_errors_without_hanging():
    client = DiffusionProcClient(CONF, platform="cpu")
    try:
        client.add_request(_req("victim", steps=50))
        client.proc.kill()  # simulate a DiT stage OOM/crash
        client.proc.join(timeout=10)
        outs = []
        t0 = time.time()
        while client.has_unfinished() and time.time() - t0 < 30:
            outs.extend(client.step())
            time.sleep(0.01)
        assert not client.has_unfinished(), "pipeline would hang"
        errs = [o for o in outs if o.error]
        assert errs and "died" in errs[0].error
        assert errs[0].request_id == "victim"
    finally:
        client.shutdown()


def test_proc_death_elastic_restart_serves_next_request():
    """Beyond the reference (a dead stage kills its engine, SURVEY
    §5.3): after the in-flight request errors, the stage proc respawns
    and the NEXT request succeeds."""
    client = DiffusionProcClient(CONF, platform="cpu")
    try:
        client.add_request(_req("victim", steps=50))
        client.proc.kill()
        client.proc.join(timeout=10)
        outs = []
        t0 = time.time()
        while client.has_unfinished() and time.time() - t0 < 30:
            outs.extend(client.step())
            time.sleep(0.01)
        assert any(o.error and "died" in o.error for o in outs)
        assert client._restarts_left == 2 and not client._dead
        # the respawned proc serves a fresh request through the same
        # (client-bound) endpoints
        client.add_request(_req("survivor", steps=2))
        outs = []
        t0 = time.time()
        while client.has_unfinished() and time.time() - t0 < 120:
            outs.extend(client.step())
            time.sleep(0.01)
        ok = [o for o in outs if o.request_id == "survivor"]
        assert ok and ok[0].error is None
        assert np.asarray(ok[0].latents).size > 0
    finally:
        client.shutdown()
