"""DiT pipeline parallelism + layerwise offload on REAL-geometry
families (VERDICT r4 item 7): the qwen_image and wan block loops now
route through dit.gpipe_blocks (ppermute GPipe over "pp") and the
layerwise host-offload streamer, matching the reference's
PipeFusion-style PP (group_coordinator.py:549) and layerwise offload
(offloader/layerwise_backend.py:21) on its shipped models instead of
only the generic tier."""

import numpy as np
import pytest

pytest.importorskip("torch")

from vllm_omni_tpu.core.request import DiffusionRequest  # noqa: E402
from vllm_omni_tpu.core.sampling_params import (  # noqa: E402
    DiffusionSamplingParams)
from vllm_omni_tpu.diffusion.config import DiffusionConfig  # noqa: E402
from vllm_omni_tpu.diffusion.pipeline import (  # noqa: E402
    DiffusionPipeline)

from tests.diffusion.test_qwen_image_loader import (  # noqa: E402,F401
    pipeline_dir as qwen_pipeline_dir)
from tests.diffusion.test_wan_loader import (  # noqa: E402,F401
    pipeline_dir as wan_pipeline_dir)
from tests.diffusion.test_sd3_loader import (  # noqa: E402,F401
    pipeline_dir as sd3_pipeline_dir)
from tests.diffusion.test_flux_loader import (  # noqa: E402,F401
    pipeline_dir as flux_pipeline_dir)


def _run(model, *, parallel=None, offload=None, guidance=4.0,
         steps=2, **p_kw):
    kw = {}
    if parallel:
        kw["parallel"] = parallel
    if offload:
        kw["offload"] = offload
    cfg = DiffusionConfig(model=model, dtype="float32",
                          resolution_buckets=((32, 32),),
                          flow_shift=1.0, **kw)
    pipe = DiffusionPipeline(cfg)
    p = DiffusionSamplingParams(num_inference_steps=steps, height=32,
                                width=32, guidance_scale=guidance,
                                seed=3, output_type="latent", **p_kw)
    st = pipe.prepare(DiffusionRequest("r", "a cat", p))
    while not st.done:
        pipe.denoise_step(st)
    return np.asarray(st.latents), pipe


@pytest.mark.parametrize("fixture_name,family", [
    ("qwen_pipeline_dir", "qwen_image"),
    ("wan_pipeline_dir", "wan"),
])
def test_pp2_parity_real_family(request, fixture_name, family):
    """pp=2 on a real-geometry checkpoint: layer groups on two "pp"
    ranks, (img, txt)/(x) activations hand off via ppermute — parity
    with the single-device denoise (CFG batch rows = the GPipe
    microbatches)."""
    model = request.getfixturevalue(fixture_name)
    base, bp = _run(model)
    assert bp.family == family
    pp, pipe = _run(model, parallel={"pipeline_parallel_size": 2})
    assert pipe.family == family
    assert "blocks_stacked" in pipe.dit_params
    np.testing.assert_allclose(pp, base, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("fixture_name,family", [
    ("qwen_pipeline_dir", "qwen_image"),
    ("wan_pipeline_dir", "wan"),
])
def test_layerwise_offload_parity_real_family(request, fixture_name,
                                              family):
    """offload="layerwise" on a real-geometry checkpoint: blocks live
    in host RAM and stream through one compiled block program with
    double-buffered prefetch — output identical to the resident run."""
    model = request.getfixturevalue(fixture_name)
    base, _ = _run(model)
    lw, pipe = _run(model, offload="layerwise")
    assert pipe.family == family
    assert pipe._host_layers is not None
    assert len(pipe._host_layers) >= 2
    np.testing.assert_allclose(lw, base, rtol=2e-4, atol=2e-5)


def test_layerwise_rejects_unwired_family(sd3_pipeline_dir):
    """Families without a prolog/block/epilog split still raise — no
    silent fall-through to a wrong path."""
    with pytest.raises(ValueError, match="layerwise"):
        _run(sd3_pipeline_dir, offload="layerwise")


def test_layerwise_offload_parity_flux(request):
    """flux's heterogeneous double→single block stream also runs
    layerwise: two block programs with a txt/img-concat transition at
    the phase boundary — identical output to the resident run."""
    from tests.diffusion.test_flux_loader import (
        pipeline_dir as _flux_dir)  # noqa: F401

    model = request.getfixturevalue("flux_pipeline_dir")
    base, bp = _run(model, guidance=1.0)
    assert bp.family == "flux"
    lw, pipe = _run(model, offload="layerwise", guidance=1.0)
    assert pipe._host_layer_tags is not None
    assert "double" in pipe._host_layer_tags and \
        "single" in pipe._host_layer_tags
    np.testing.assert_allclose(lw, base, rtol=2e-4, atol=2e-5)
