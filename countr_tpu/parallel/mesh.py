"""Device-mesh data parallelism.

The reference scales with PyTorch DDP over NCCL (reference:
util/misc.py:225-257 rendezvous, FSC_finetune_cross.py:229-231 DDP
wrapper, util/misc.py:424-432 metric all-reduce). On TPU none of that
machinery exists as a separate backend: we lay out a 1-D
``jax.sharding.Mesh`` over all devices, shard the batch dimension
across it, and jit the global-batch training step — XLA inserts the
gradient all-reduce on ICI automatically because the loss is a mean
over the globally sharded batch. Metric "all-reduce" is likewise just
reading a replicated output.

The reference's parallelism is data-parallel only (SURVEY.md §2); the
mesh is therefore 1-D ("data"). Multi-host: jax.distributed handles
process rendezvous; rank-0-only side effects use is_main_process().
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a host batch pytree with the leading dim sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate_to_mesh(mesh: Optional[Mesh], tree):
    """Replicate host arrays onto EVERY device of the mesh (resident
    stores: the pixel pool lives next to the params on each chip, like
    the reference's per-rank dataset copy under DDP). Multi-host safe:
    every process passes its identical full copy and the global
    replicated jax.Array is assembled without cross-host traffic
    (``make_array_from_process_local_data`` with an unpartitioned
    spec). mesh=None keeps the single-device default placement."""
    if mesh is None:
        return jax.tree.map(jax.device_put, tree)
    sh = replicated_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )


def make_global_batch(mesh: Mesh, local_batch):
    """Assemble a globally-sharded batch from per-process local arrays.

    Multi-host data loading: each process loads only its
    1/process_count slice of the global batch (data.loader.DataLoader
    process_index/process_count), and this stitches the slices into one
    global jax.Array without any cross-host data movement — each
    process's samples land on the devices it addresses. The reference
    gets the same effect from DistributedSampler + DDP (reference:
    FSC_finetune_cross.py:178-210, :229-231). Single-process this is
    equivalent to shard_batch.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        local_batch,
    )


def global_any(flags) -> bool:
    """True if any process's local boolean is set — used to apply the
    reference's batch-level m_flag rule (no shot_num=0 when any sample
    in the *global* batch used a Type-2 mosaic; reference:
    FSC_finetune_cross.py:277-284) consistently across hosts, so every
    process draws the same static shot_num."""
    local = bool(np.asarray(flags).any())
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    return bool(multihost_utils.process_allgather(np.asarray([local])).any())


def is_main_process() -> bool:
    """Rank-0 check (reference: util/misc.py:211-222 is_main_process)."""
    return jax.process_index() == 0
