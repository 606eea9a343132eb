"""Multi-host process management.

Replaces the reference's torch.distributed rendezvous plumbing
(reference: util/misc.py:225-257 env://, OMPI and SLURM variable
handling + NCCL init) with jax.distributed: on TPU pods the
coordinator/process counts come from the TPU environment
automatically; on other launchers the standard JAX env vars
(JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID) are
honored. Gradient/metric all-reduce needs no backend — it is part of
the jitted step (see countr_tpu.parallel.mesh).

Multi-host data loading: DataLoader(process_index, process_count)
loads only this process's slice of each global batch and
mesh.make_global_batch stitches the slices into one global jax.Array
(no cross-host data movement); the train CLIs wire this automatically
from jax.process_index()/process_count().
"""

from __future__ import annotations

import os

import jax


def init_distributed(verbose: bool = True) -> None:
    """Initialize multi-process JAX when launched as part of a
    multi-host job; silently a no-op for single-process runs
    (the reference prints 'Not using distributed mode' similarly,
    util/misc.py:247-250)."""
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    # IMPORTANT: do not touch jax.process_count()/jax.devices() before
    # initialize() — any backend query "initializes" single-process
    # mode and the launch silently degrades to world size 1.
    try:
        if coord and nproc:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(nproc),
                process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
            )
        elif verbose and jax.process_count() == 1:
            print("Not using distributed mode")
    except RuntimeError as e:
        # e.g. called twice, or after backend init in a single-process
        # test run
        if verbose:
            print(f"distributed init skipped: {e}")
    if verbose and jax.process_count() > 1:
        print(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )


def rank0_print(*args, **kwargs) -> None:
    """Master-only print (reference: util/misc.py:179-193)."""
    if jax.process_index() == 0:
        print(*args, **kwargs)
