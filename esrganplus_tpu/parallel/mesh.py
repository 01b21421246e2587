"""Device mesh and sharding helpers.

The reference's only parallelism is single-process ``nn.DataParallel``
(``codes/models/networks.py:107,137,153``). The TPU-native equivalent is SPMD over
a ``jax.sharding.Mesh``: parameters replicated (or later sharded) across the
``data`` axis, batches sharded along it, XLA inserting the gradient ``psum`` over
ICI. These helpers centralise mesh construction so trainers and eval loops share
one vocabulary; the mesh generalises to ('data', 'model') for future spatial/
tensor-parallel inference tiling.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "shard_batch",
           "shard_local_batch", "replicate_tree", "local_batch_size"]


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh. Defaults: all devices on the data axis."""
    devs = list(devices) if devices is not None else jax.devices()
    if data is None:
        data = len(devs) // model
    assert data * model == len(devs), f"mesh {data}x{model} != {len(devs)} devices"
    arr = np.asarray(devs).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis along 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with batch-axis sharding.

    Single-process form: each leaf is the GLOBAL batch. For multi-process
    runs use :func:`shard_local_batch` (each process holds only its slice)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def shard_local_batch(mesh: Mesh, batch):
    """Batch-axis sharding from PROCESS-LOCAL data: each process passes its
    own contiguous slice of the global batch (the TrainLoader host-interleave
    order is host-major, so process i's local batch is global rows
    [i·local : (i+1)·local]). Works in single-process runs too, where local
    data IS the global batch."""
    def put(x):
        sh = data_sharding(mesh, np.ndim(x))
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree of host/device arrays over the whole mesh. In
    multi-process runs every process must pass IDENTICAL values (seeded
    init / seeded pools) — replication is assembled from the local copies
    without any cross-process value check (standard SPMD discipline)."""
    rep = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, rep)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(rep, np.asarray(x)),
        tree)


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    n = mesh.shape["data"]
    assert global_batch % n == 0, f"batch {global_batch} not divisible by data={n}"
    return global_batch // n
