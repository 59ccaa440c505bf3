"""Spatial partitioning: shard the image H axis across the mesh.

New capability vs. the reference (strictly single-GPU, SURVEY.md §2.9) and
the SP analog of SURVEY.md §5.7: event-camera resolution grows quadratically
(1280x720 Prophesee sensors and beyond), and one chip's HBM bounds
B x H x W x C state. Sharding H across devices scales resolution with the
mesh while keeping every conv local except a 1-row halo.

The TPU-idiomatic mechanics: annotate every image tensor [B, H, W, C] with
``PartitionSpec(dp_axis, sp_axis)`` and let GSPMD insert the halo
collective-permutes for the 3x3 convs' row overlaps — they ride ICI, no
manual ppermute needed. Works for the flax f32/bf16 models AND the int8
deploy engine (whose dy shift-add is pad+slice+add, which GSPMD partitions
the same way). The 2-D mesh composes DP x SP: batch slots shard over
``data`` exactly as evflow.parallel.mesh does, rows over ``space``.

Halo traffic per window step: 9 convs x 2 boundary rows x [B_loc, W, C]
bf16 — ~2.4 MB at the bench shape, microseconds on ICI; the step stays
compute/HBM-bound per shard.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh_2d",
    "image_sharding",
    "shard_image_batch",
    "spatial_jit_step",
]


def make_mesh_2d(
    data: int,
    space: int,
    data_axis: str = "data",
    space_axis: str = "space",
) -> Mesh:
    """``data x space`` mesh over the first data*space local devices.

    The ``space`` axis should map to the fastest ICI dimension — halo
    exchanges are nearest-neighbor along it.
    """
    devs = jax.devices()
    if data * space > len(devs):
        raise ValueError(
            f"mesh {data}x{space} needs {data * space} devices, "
            f"have {len(devs)}"
        )
    grid = np.array(devs[: data * space]).reshape(data, space)
    return Mesh(grid, (data_axis, space_axis))


def image_sharding(
    mesh: Mesh,
    data_axis: Optional[str] = "data",
    space_axis: Optional[str] = "space",
) -> NamedSharding:
    """[B, H, W, C] sharding: batch over ``data``, rows over ``space``."""
    return NamedSharding(mesh, P(data_axis, space_axis))


def _put(x, sh):
    return jax.device_put(x, sh)


def shard_image_batch(tree: Any, mesh: Mesh, data_axis="data", space_axis="space"):
    """Device-put a pytree of image tensors with [B, H, ...] layout.

    Rank>=2 arrays shard (batch, rows); rank-1/0 replicate. H must divide
    by the space-axis size (the loaders' resolutions are powers of two).
    """
    img = image_sharding(mesh, data_axis, space_axis)
    rep = NamedSharding(mesh, P())
    nd = mesh.shape[data_axis]
    ns = mesh.shape[space_axis]

    def put(x):
        a = np.asarray(x)
        if a.ndim >= 2 and a.shape[0] % nd == 0 and a.shape[1] % ns == 0:
            return _put(a, img)
        return _put(a, rep)

    return jax.tree.map(put, tree)


def spatial_jit_step(step_fn, mesh: Mesh, data_axis="data", space_axis="space"):
    """jit ``step_fn(params, window, states) -> (out, states)`` with params
    replicated and every image tensor sharded (batch, rows).

    GSPMD propagates the shardings through the convs / shift-adds and
    inserts the halo exchanges. The returned function accepts and returns
    sharded pytrees; use :func:`shard_image_batch` to place inputs.
    """
    img = image_sharding(mesh, data_axis, space_axis)
    rep = NamedSharding(mesh, P())

    def spec_img(tree):
        nd = mesh.shape[data_axis]
        ns = mesh.shape[space_axis]
        return jax.tree.map(
            lambda x: img if (hasattr(x, "ndim") and x.ndim >= 2
                              and x.shape[0] % nd == 0 and x.shape[1] % ns == 0)
            else rep,
            tree,
        )

    cache = {}

    def jitted(params, window, states):
        # key the jit wrapper on pytree structure + each leaf's shard
        # choice: a later call with a different structure or an axis no
        # longer divisible by the mesh gets its own correctly-specified jit
        def choice(tree):
            nd = mesh.shape[data_axis]
            ns = mesh.shape[space_axis]
            return tuple(
                hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[0] % nd == 0 and x.shape[1] % ns == 0
                for x in jax.tree.leaves(tree)
            )

        key = (jax.tree.structure((window, states)),
               choice(window), choice(states))
        if key not in cache:
            cache[key] = jax.jit(
                step_fn,
                in_shardings=(rep, spec_img(window), spec_img(states)),
            )
        return cache[key](params, window, states)

    return jitted
