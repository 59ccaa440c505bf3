"""Normalization layers for streaming SNNs: BatchNorm, TEBN, MPBN, GroupNorm.

Behavioral reference: models/SNNtorch_spiking_submodules.py (TEBN :18-63,
MPBN :66-121) and the ``nn.BatchNorm2d(momentum=0.1, eps=1e-5)`` used inside
every cell (:251, :475).

torch→flax momentum mapping: torch ``momentum=0.1`` means
``ra = 0.9*ra + 0.1*batch``; flax ``momentum`` is the EMA decay, so 0.9.
Known small divergence: torch updates running_var with the unbiased batch
variance while flax uses the biased one; irrelevant at the batch×HW sample
counts seen here and documented for parity audits.

All modules are channels-last ``[B, H, W, C]``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["BatchNorm", "TEBN", "MPBN", "make_norm"]


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent (running stats in the 'batch_stats' collection)."""

    momentum: float = 0.9  # flax decay == 1 - torch momentum(0.1)
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis=-1,
        )(x)


class TEBN(nn.Module):
    """Temporal Effective Batch Normalization.

    BN followed by a learnable per-timestep, per-channel scale ``p[t]``
    (SNNtorch_spiking_submodules.py:41-63). When ``timestep`` is None or out
    of range, the mean over all ``p`` is used (reference fallback).
    """

    features: int
    num_timesteps: int = 4
    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, timestep: Optional[jax.Array] = None
    ) -> jax.Array:
        x_bn = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis=-1,
        )(x)
        p = self.param(
            "p", lambda key: jnp.ones((self.num_timesteps, self.features))
        )
        if timestep is None:
            p_t = p.mean(axis=0)
        else:
            # traced timestep: clip into range then gather (the reference
            # falls back to the mean when out of range; inside a scan the
            # timestep is always valid modulo num_timesteps)
            t = jnp.clip(jnp.asarray(timestep), 0, self.num_timesteps - 1)
            p_t = p[t]
        return x_bn * p_t


class MPBN(nn.Module):
    """Membrane Potential Batch Normalization
    (SNNtorch_spiking_submodules.py:84-95).

    Normalizes membrane potentials after integration; at inference the
    normalization can be folded into the threshold
    (``effective_threshold``)."""

    momentum: float = 0.9
    eps: float = 1e-5

    @nn.compact
    def __call__(self, mem: jax.Array, train: bool) -> jax.Array:
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.eps,
            axis=-1,
        )(mem)


def mpbn_effective_threshold(
    threshold: jax.Array, mean: jax.Array, var: jax.Array, eps: float = 1e-5
) -> jax.Array:
    """Fuse MPBN into the threshold for zero-cost inference:
    ``theta_eff = theta * std + mean`` (SNNtorch_spiking_submodules.py:97-121).
    """
    return threshold * jnp.sqrt(var + eps) + mean


def make_norm(kind: Optional[str], features: int):
    """Input-norm factory for the 'norm' cell option
    (spiking_submodules.py:111-119): None | 'group'. ('weight' weight-norm is
    a parameterization, handled at the conv level.)"""
    if kind is None or kind == "none" or kind == "weight":
        return None
    if kind == "group":
        # reference quirk: groups = min(1, C // 4) == always 1 (instance-ish)
        return nn.GroupNorm(num_groups=1)
    raise ValueError(f"Unknown norm kind: {kind!r}")
