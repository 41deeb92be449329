"""Device mesh construction and sharding helpers.

Design (maps the model onto TPU topology — no reference analog, the reference
is single-GPU by construction, ``custom_job_launcher.sh:36-40``):

- One mesh axis, ``"data"``: the ray batch is sharded over it; parameters and
  optimizer state are fully replicated. The per-ray sample axis (the only
  cross-sample dependency, an exclusive cumprod) always stays on-chip.
- Gradients are combined by the ``psum`` XLA inserts for the replicated-out
  sharding of the loss/grad — riding ICI, overlapped with backward by XLA.
- Multi-host: ``jax.distributed.initialize()`` then the same code; each host
  feeds its slice of the global batch via
  ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A 1-D ``("data",)`` mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-ray arrays: leading (ray) axis split over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))

def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for parameters / optimizer state / scalars: fully replicated."""
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays as ray-sharded device arrays (single-process path)."""
    s = batch_sharding(mesh)
    out = tuple(jax.device_put(a, s) for a in arrays)
    return out if len(out) > 1 else out[0]


def make_global_batch(mesh: Mesh, *host_arrays):
    """Assemble a global ray-sharded array from this process's local slice.

    Multi-host entry point: every process passes its own rows (the slice the
    :class:`data.pipeline.RayDataset` dealt it) and receives a global
    ``jax.Array`` sharded over the ``data`` axis.
    """
    s = batch_sharding(mesh)
    out = tuple(
        jax.make_array_from_process_local_data(s, np.asarray(a)) for a in host_arrays
    )
    return out if len(out) > 1 else out[0]
