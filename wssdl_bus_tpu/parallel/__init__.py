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


def build_engine(model, cfg, canvas_hw, mesh_data: int = 1,
                 mesh_model: int = 1, **kw):
    """The one engine-selection rule shared by the train/test CLIs and
    ``train.solver._build_solver``: a ``ParallelEngine`` over a
    (mesh_data, mesh_model) mesh when the product exceeds one device,
    else the single-device ``Engine``."""
    if mesh_data * mesh_model > 1:
        mesh = make_mesh(n_data=mesh_data, n_model=mesh_model)
        return ParallelEngine(model, cfg, canvas_hw, mesh, **kw)
    from wssdl_bus_tpu.train.engine import Engine
    return Engine(model, cfg, canvas_hw, **kw)


__all__ = ["make_mesh", "ParallelEngine", "build_engine"]
