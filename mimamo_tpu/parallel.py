"""Device-mesh parallelism utilities (data-parallel pod-slice scaling).

Reference behavior: the reference has **no** distributed support — single
process, single GPU, no NCCL/MPI anywhere (SURVEY.md §2 "Parallelism
strategies"). The TPU-native equivalent demanded by the north star
(BASELINE.json config 5) is data-parallel sharding over an ICI-connected
pod slice via ``jax.sharding`` — params replicated, the clip batch sharded
over a 1-D ``Mesh(('data',))``, XLA GSPMD inserting the psum for gradient
reduction and metric all-reduces. The mesh abstraction is N-D-ready (add
axes to the tuple) so multi-slice DCN layouts are not precluded.

The model itself (ResNet-50 + 256-wide GRUs) fits trivially on one chip,
so TP/PP/SP are intentionally not applicable (SURVEY.md §2); scaling the
*batch-of-streams* axis is the attach point if long-video streaming ever
needs more than DP.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the mesh; replicate the rest."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """device_put a pytree of [B, ...] arrays with B sharded over the mesh.

    B must be divisible by the mesh size (pad at the data layer).
    """
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host (DCN) initialization for pod slices spanning hosts.

    On single-host (this dev box, or one v5e tray) it is a no-op returning
    the local device count. On multi-host, call once per process before
    any other JAX use; afterwards ``jax.devices()`` spans the slice and
    ``make_mesh()`` builds the global data mesh (collectives ride ICI
    within a slice, DCN across — SURVEY.md §5 last row).
    """
    if coordinator_address is None:
        return len(jax.devices())
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return len(jax.devices())


def pad_to_multiple(batch: Any, multiple: int) -> Any:
    """Zero-pad the leading dim of every array to a mesh-divisible size."""
    def _pad(x):
        b = x.shape[0]
        rem = (-b) % multiple
        if rem == 0:
            return x
        pad = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad)
    return jax.tree_util.tree_map(_pad, batch)
