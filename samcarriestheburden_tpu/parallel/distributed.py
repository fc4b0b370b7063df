"""Multi-host / multi-slice initialization (SURVEY §5: greenfield — the
reference is single-process, single-device).

The recipe:

* every process calls :func:`initialize` first (on TPU pods all arguments
  auto-detect from the environment; on CPU/GPU pass coordinator + ids);
* ``jax.devices()`` is then the GLOBAL device list — build one Mesh over it
  (``make_mesh`` for a flat data mesh, :func:`make_hybrid_mesh` to split the
  data axis over DCN×ICI on multi-slice);
* host data loading shards per process (:func:`process_shard`);
* per-process local batches assemble into global arrays with
  :func:`global_batch` (jax.make_array_from_process_local_data).

Collectives inside jitted programs are XLA-inserted from the shardings; no
NCCL/MPI wiring.  CPU multi-process (used by the tests / dryrun) rides the
gloo collectives built into jaxlib.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """``jax.distributed.initialize`` wrapper; all-None auto-detects on TPU
    pods (GKE/GCE metadata).  Safe to call once per process, before any
    other JAX API touches the backend."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def process_shard(items: Sequence, process_id: Optional[int] = None,
                  num_processes: Optional[int] = None) -> list:
    """Strided per-process slice of a host-side work list (files, stems):
    process p of N handles items[p::N]."""
    p = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if num_processes is None else num_processes
    return list(items)[p::n]


def global_batch(mesh, local_tree, axis: str = "data"):
    """Assemble per-process local batches into global arrays sharded on
    ``axis``.  Each process passes ITS shard (global_batch_size //
    process_count rows); the result behaves as one global array under jit."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_tree)


def make_hybrid_mesh(ici_axis_size: Optional[int] = None,
                     axis_names: Sequence[str] = ("data",),
                     devices: Optional[Sequence] = None):
    """Data mesh for multi-slice TPU: devices ordered so the leading
    (slower-varying) factor of the data axis crosses DCN and the trailing
    factor stays on ICI.  With one slice this degenerates to the flat mesh.

    Slice count comes from the devices' ``slice_index`` (the attribute real
    multi-slice TPU devices expose); devices without it — CPU, single-slice —
    count as one slice.  When the hybrid ordering cannot be applied on a
    multi-slice topology we *warn* rather than silently falling back (the
    round-2 version swallowed every error into the flat mesh, defeating the
    DCN-vs-ICI ordering it promised)."""
    import numpy as np
    from jax.sharding import Mesh

    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    n_slices = len({getattr(d, "slice_index", 0) for d in devices})
    ici = ici_axis_size or n // n_slices
    if n % ici:
        raise ValueError(f"{n} devices not divisible by ici size {ici}")
    if n // ici == 1:  # one slice: flat mesh IS the right ordering
        return Mesh(np.asarray(devices), tuple(axis_names))
    try:
        from jax.experimental import mesh_utils

        grid = mesh_utils.create_hybrid_device_mesh(
            (ici,), (n // ici,), devices=devices)
        grid = grid.reshape(n)
    except Exception as e:  # pragma: no cover - depends on runtime topology
        import warnings

        warnings.warn(
            f"hybrid mesh ordering not applied ({e}); falling back to the "
            f"flat device order — cross-slice collectives may ride DCN "
            f"suboptimally")
        grid = np.asarray(devices)
    return Mesh(grid.reshape((n,)), tuple(axis_names))


def host_value(x):
    """np.asarray that also works for arrays sharded across processes
    (all-gathers the global value; every process returns the same array)."""
    import numpy as np

    if (hasattr(x, "is_fully_addressable") and not x.is_fully_addressable):
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
