"""Device-mesh construction.

Axis convention:
  data  — batch-parallel axis: each slot processes its own joint minibatch
          (n_s supervised + n_ws weak images); gradients are ``pmean``-ed
          over this axis across ICI.
  model — tensor-parallel axis: the RCNN head's fc6/fc7 weights are sharded
          column-/row-parallel over it (see ``parallel.tp_head``).

There is nothing to mirror in the reference (it has no distributed layer at
all, SURVEY.md §2.8); the layout follows the standard JAX SPMD recipe: one
global jit program, shardings annotated on a named Mesh, collectives ride ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a ("data", "model") mesh.

    With defaults, uses every visible device on the data axis.  ``n_data=None``
    derives the data extent from ``len(devices) // n_model``.
    """
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    need = n_data * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))
