"""Device mesh construction and sharding helpers.

The reference's only parallelism is single-process torch DataParallel
(/root/reference/cpc/train.py:372-375).  The TPU-native equivalent is a
1-D ``data`` mesh over all chips: batches shard over the mesh axis, the
train step runs under ``shard_map``, and gradients reduce with ``psum``
over ICI (SURVEY.md §2.9).

A ``model`` axis is reserved in the mesh API for tensor-parallel extension;
the reference semantics need only ``data``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None,
             devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over local devices (or the first n)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_spec() -> P:
    """Batch sharded over the data axis."""
    return P(DATA_AXIS)


def replicated_spec() -> P:
    return P()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, batch_spec())


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, replicated_spec())


def shard_batch(mesh: Mesh, *arrays):
    """Device-put host arrays with the batch axis sharded over the mesh."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out if len(out) > 1 else out[0]
