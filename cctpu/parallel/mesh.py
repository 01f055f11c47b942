"""Device mesh and sharding policies — the framework's distributed layer.

The reference has no multi-device support at all (SURVEY.md §2.4: single
CUDA GPU, serial python loops over bonds/displacements/scan points). Here
distribution is a first-class component: one module owns the topology and
every other layer stays communication-agnostic, exactly the
mesh/NamedSharding design the survey prescribes.

Axes:
  'task' — embarrassing task parallelism (BDE bonds, FD displacements,
           distance scans, per-solvent jobs): reference's serial loops
           become sharded batches.
  'data' — ML batch axis (GCN training).
  'model'— tensor-ish sharding: DF aux dimension naux, grid batches,
           MLP hidden dim.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Build a mesh over all available devices.

    Default: all devices on the first axis ('data'), 1 on the rest.
    """
    devs = np.array(jax.devices())
    n = devs.size
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    assert int(np.prod(shape)) == n, (shape, n)
    return Mesh(devs.reshape(shape), axis_names=axis_names)


def shard_batch(mesh: Mesh, x, axis: str = "data"):
    """Place array x with its leading dim sharded over `axis`."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P()))


@contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh
