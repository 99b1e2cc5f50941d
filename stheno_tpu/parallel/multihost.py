"""Multi-host (pod-slice) orchestration — multi-controller JAX over ICI/DCN
(SURVEY.md §2.3 'Communication backend': this replaces NCCL/MPI wholesale;
no separate comm library exists or is idiomatic on TPU).

Usage on each host of a slice:

    from stheno_tpu.parallel import multihost
    multihost.initialize()              # env-driven (TPU pods auto-detect)
    mesh = multihost.global_mesh(("chains",))
    ...run_nuts_sharded(..., mesh=mesh)  # chains spread over every chip

Checkpointing pairs with `inference.checkpoint`: call `save_on_host0` so a
single copy of sampler state lands on persistent storage.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Initialise multi-controller JAX.  On TPU pods all arguments are
    auto-detected from the environment; pass them explicitly for manual
    (e.g. CPU multi-process) bring-up.  Safe to call when already
    initialised or in single-process runs."""
    if jax.process_count() > 1:
        return  # already initialised
    try:
        kwargs = {}
        if coordinator_address is not None:
            kwargs.update(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process / no coordinator configured: stay local
        pass


def global_mesh(axis_names=("chains",), axis_shape=None) -> Mesh:
    """Mesh over ALL devices of the (possibly multi-host) runtime.

    1-D by default; pass `axis_shape` for multi-axis layouts, e.g.
    `global_mesh(("chains", "rows"), (num_hosts, chips_per_host))` so the
    big-N 'rows' collectives ride intra-host ICI while chain parallelism
    crosses DCN.
    """
    devices = np.asarray(jax.devices())
    if axis_shape is None:
        if len(axis_names) != 1:
            raise ValueError("provide axis_shape for multi-axis meshes")
        return Mesh(devices, axis_names)
    return Mesh(devices.reshape(axis_shape), axis_names)


def is_host0() -> bool:
    return jax.process_index() == 0


def save_on_host0(path, tree, step=None):
    """Checkpoint once per slice (all hosts hold replicated sampler state
    for the `('chains',)` layout; host 0 writes)."""
    from stheno_tpu.inference.checkpoint import save_checkpoint

    if is_host0():
        save_checkpoint(path, jax.device_get(tree), step=step)
