"""Test bootstrap: force an 8-device virtual CPU mesh.

Mirrors the reference's CPU unit tier (tests/conftest.py:14-17 sets
VLLM_TARGET_DEVICE=cpu). The axon sitecustomize pins JAX_PLATFORMS=axon, so
we must flip via jax.config (env vars are already consumed).

Set OMNI_TPU_TEST_REAL_TPU=1 to run the suite against the real chip.
"""

import os

os.environ.setdefault("OMNI_TPU_PLATFORM", "cpu")
# fast unit tier: run pipeline stages inline. The production default is
# process-per-stage (orchestrator._default_isolation); that path is
# covered explicitly by tests/engine/test_stage_proc.py and by the
# driver's dryrun_multichip default-isolation scenario.
os.environ.setdefault("OMNI_TPU_INLINE_STAGES", "1")

if os.environ.get("OMNI_TPU_TEST_REAL_TPU") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") +
        " --xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    os.environ["OMNI_TPU_PLATFORM"] = "tpu"
    # numeric-parity tests compare against float64-ish numpy oracles;
    # TPU f32 matmuls default to bf16-accumulated passes — pin highest
    # precision for the correctness tier (perf tiers set their own)
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Skip multi-device tests when the backend exposes fewer devices
    (real-TPU tier runs on one chip)."""
    import jax

    n = len(jax.devices())
    if n >= 8:
        return
    skip = pytest.mark.skip(reason=f"needs 8 devices, have {n}")
    for item in items:
        name = item.nodeid
        if "ring" in name or "parallel" in name or "dp_group" in name \
                or "mrope" not in name and "mesh" in name:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def cpu_mesh():
    import jax

    from vllm_omni_tpu.parallel import make_mesh

    return make_mesh((2, 4), ("dp", "tp"))
