"""Device mesh + sharding utilities (new capability vs. the reference).

The reference is strictly single-GPU (SURVEY.md §2.9: no torch.distributed,
no NCCL). Here data parallelism is first-class: a 1-D ``data`` mesh over all
local devices, batches sharded on the batch axis, parameters/optimizer state
replicated, and gradient all-reduce left to GSPMD (the summed loss makes XLA
insert the psum over ICI automatically under jit).

Batch slots map to mesh shards exactly like the reference maps slots to
open HDF5 files (dataloader/h5.py:68-70): slot i streams sequence i, shard k
owns slots k*B/D..(k+1)*B/D.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_batch_to_devices",
]


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``num_devices`` local devices.

    Raises when fewer devices exist than requested — silently degrading
    to a smaller mesh would let e.g. ``--num_devices 4`` run single-device
    while the user believes they measured 4-way fan-out."""
    devs = jax.devices()
    if num_devices is not None:
        if len(devs) < num_devices:
            raise ValueError(
                f"requested a {num_devices}-device mesh but jax reports "
                f"{len(devs)} ({devs[0].platform if devs else 'none'})"
            )
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Device-put every array in a pytree with its batch axis sharded.

    Scalars / 0-d entries are replicated.
    """
    bs = batch_sharding(mesh, axis_name)
    rep = replicated(mesh)

    def put(x):
        x = np.asarray(x)
        if x.ndim == 0 or x.shape[0] % mesh.devices.size != 0:
            return jax.device_put(x, rep)
        return jax.device_put(x, bs)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def pad_batch_to_devices(batch_size: int, num_devices: int) -> int:
    """Smallest batch >= batch_size divisible by the device count."""
    return ((batch_size + num_devices - 1) // num_devices) * num_devices
