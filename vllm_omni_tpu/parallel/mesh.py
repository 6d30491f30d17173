"""Mesh construction helpers.

Axis order convention (outer → inner): dp, cfg, ring, ulysses, tp — TP
innermost so its collectives ride the fastest ICI links (reference's rank
order parallel_state.py:709-731 worked example; same principle, one line
here).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import AxisType, Mesh

from vllm_omni_tpu.config.engine import ParallelConfig


def make_mesh(shape: Sequence[int], names: Sequence[str],
              devices: Optional[list] = None) -> Mesh:
    """Mesh with Auto axis types (jax 0.9 defaults to Explicit, which
    rejects the row-parallel matmuls our TP layout relies on — we want
    XLA sharding propagation, the moral equivalent of the reference's
    implicit NCCL all_reduce placement)."""
    if devices is None:
        devices = jax.devices()
    n = 1
    for s in shape:
        n *= s
    if n > len(devices):
        raise ValueError(f"mesh {tuple(shape)} needs {n} devices, have "
                         f"{len(devices)}")
    import numpy as np

    dev_array = np.asarray(devices[:n]).reshape(tuple(shape))
    return Mesh(dev_array, tuple(names),
                axis_types=(AxisType.Auto,) * len(shape))


def stage_mesh(parallel: ParallelConfig,
               devices: Optional[list] = None) -> Optional[Mesh]:
    """Mesh for one stage from its ParallelConfig; None for the trivial
    single-device layout (jit without a mesh is faster to trace)."""
    if parallel.world_size == 1:
        return None
    # all axes stay in the mesh (size-1 axes are legal and keep the
    # sharding specs' axis names resolvable)
    shape_map = parallel.mesh_shape()
    return make_mesh(list(shape_map.values()), list(shape_map.keys()),
                     devices)
