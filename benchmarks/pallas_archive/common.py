"""Shared in-kernel helpers for the fused Pallas variants.

The five fused-network kernels (fused_net / lgrid / loop / loop2 / batch)
previously carried byte-identical private copies of the dy patch builder
and the LIF update; the semantics live here ONCE. The remote-Mosaic
"multi-LIF" ICE (BENCH_NOTES.md) is about how many LIF updates a single
kernel BODY traces, not about where the Python function is defined — a
shared helper invoked once per kernel keeps the single-instance property.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["dy_group_patches", "lif_update"]


def dy_group_patches(src: jax.Array, dy: int, C: int, E: int, W: int) -> jax.Array:
    """[C, E, W] channel-major tile -> [3C, E, W] dx-shift patch groups
    (dx in {0, 1, 2}) for one vertical tap ``dy`` with zero borders."""
    z_col = jnp.zeros((C, E, 1), src.dtype)
    z_row = jnp.zeros((C, 1, W + 2), src.dtype)
    vp = jnp.concatenate([z_col, src, z_col], axis=2)
    vp = jnp.concatenate([z_row, vp, z_row], axis=1)  # [C, E+2, W+2]
    sub = vp[:, dy : dy + E, :]
    return jnp.concatenate([sub[:, :, dx : dx + W] for dx in range(3)], axis=0)


def lif_update(ff, mem, beta, theta, hard_reset: bool):
    """Algebraically reduced snn.Leaky update (reset_delay=False) in the
    select form — the arithmetic hard-reset form ICEs this remote Mosaic
    toolchain (benchmarks/probe_wholenet_bisect6.py). Returns (spk, mem')."""
    if hard_reset:
        # u = (1 - H(mem - theta)) * (beta*mem + ff);  mem' = (1 - spk) * u
        u = jnp.where(mem > theta, jnp.zeros_like(ff), beta * mem + ff)
        spk = (u > theta).astype(ff.dtype)
        mem2 = jnp.where(u > theta, jnp.zeros_like(u), u)
        return spk, mem2
    reset_prev = (mem > theta).astype(ff.dtype)
    u = beta * mem + ff - reset_prev * theta
    spk = (u > theta).astype(ff.dtype)
    mem2 = u - (spk - reset_prev) * theta
    return spk, mem2
