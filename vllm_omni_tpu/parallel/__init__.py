"""Parallelism: meshes and collective layouts.

Replaces the reference's hand-rolled rank bookkeeping
(diffusion/distributed/parallel_state.py:676 initialize_model_parallel,
RankGenerator :173): a stage's entire parallel layout is one
jax.sharding.Mesh with named axes; XLA SPMD inserts the collectives.
"""

from vllm_omni_tpu.parallel.mesh import make_mesh, stage_mesh

__all__ = ["make_mesh", "stage_mesh"]
