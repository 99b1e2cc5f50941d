"""Device-mesh helpers.

All distribution in this framework rides `jax.sharding.Mesh` + `shard_map`
with XLA collectives over ICI/DCN — the TPU-native replacement for the
NCCL/MPI stack a GPU framework would carry (SURVEY.md §2.3).  Two axes cover
the north-star workloads:

- `('chains',)`  — NUTS chains / SMC particles (embarrassingly parallel,
  collectives only for diagnostics and resampling);
- `('rows',)`    — big-N exact GPs: kernel-matrix rows, distributed Cholesky
  panels, triangular solves.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def chains_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    return Mesh(np.asarray(devices[:n]), ("chains",))


def rows_mesh(n_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    return Mesh(np.asarray(devices[:n]), ("rows",))


def grid_mesh(n_chains_axis, n_rows_axis, devices=None):
    """2-D mesh: chains × rows — chains sharded over one axis, each chain's
    big-N linear algebra sharded over the other."""
    devices = devices if devices is not None else jax.devices()
    need = n_chains_axis * n_rows_axis
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_chains_axis, n_rows_axis)
    return Mesh(arr, ("chains", "rows"))


def shard_rows(mesh, x, axis_name="rows"):
    """Place an array with its leading axis sharded over `axis_name`."""
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
