"""Mesh construction + sharding helpers.

The scaling recipe: build a Mesh over the chips, annotate batch axes with
``P('data')``, replicate params, and let XLA insert the collectives (grad
psum rides ICI).  Works identically on one real TPU chip, a v5e-8 slice, or
the 8-device virtual CPU mesh the tests use.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1-D data mesh by default; pass ``shape`` + ``axis_names`` for
    multi-axis (e.g. ('data', 'model'))."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),)
    grid = np.asarray(devices).reshape(tuple(shape))
    return Mesh(grid, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """device_put a pytree of batched arrays with the batch axis sharded."""
    return jax.device_put(tree, batch_sharding(mesh, axis))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(batch: np.ndarray, multiple: int):
    """Pad the leading axis to a multiple (device count divisibility);
    returns (padded, valid_count)."""
    n = batch.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    padding = np.zeros((pad,) + batch.shape[1:], batch.dtype)
    return np.concatenate([batch, padding]), n
