"""Multi-chip scaling: device meshes, sharded train/inference steps.

The reference is strictly single-process / single-GPU (SURVEY.md §2.8 — no
NCCL/MPI/collectives of any kind), so everything here is an additive,
TPU-native capability: a `jax.sharding.Mesh` with a ``data`` axis (batch /
data parallelism over ICI) and a ``model`` axis (Megatron-style tensor
parallelism of the RCNN head), driven through ``jax.shard_map`` with explicit
``psum``/``pmean`` collectives.
"""

from wssdl_bus_tpu.parallel.mesh import make_mesh
from wssdl_bus_tpu.parallel.engine import ParallelEngine

__all__ = ["make_mesh", "ParallelEngine"]
