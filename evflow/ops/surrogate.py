"""Surrogate-gradient spike functions.

Forward pass is an exact Heaviside step; the backward pass substitutes a
smooth surrogate derivative. Implemented with ``jax.custom_vjp`` so they
compose with ``jax.grad`` / ``jax.lax.scan`` / ``pjit``.

Behavioral reference: models/spiking_util.py:13-109 (SuperSpike, MultiGaussSpike,
TriangleSpike, ArctanSpike and their functional wrappers) and the snntorch ATan
surrogate used by the snn.Leaky-based cells
(models/SNNtorch_spiking_submodules.py:200-239).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "heaviside",
    "superspike",
    "mgspike",
    "trianglespike",
    "arctanspike",
    "atanspike_snn",
    "spike_fn",
    "SURROGATES",
]


def heaviside(x: jax.Array) -> jax.Array:
    """Exact step function, no gradient (used for detached resets)."""
    return (x > 0).astype(x.dtype)


def _gaussian(x, mu, sigma):
    return jnp.exp(-((x - mu) ** 2) / (2.0 * sigma * sigma)) / (
        sigma * math.sqrt(2.0 * math.pi)
    )


def _make_spike(sg_fn, name):
    """Build a custom-vjp spike primitive ``f(x, width) -> H(x > 0)``.

    The surrogate gradient flows to ``x`` only (``width`` is a hyperparameter,
    matching the reference where the width tensor gets a ``None`` gradient).
    """

    @jax.custom_vjp
    def spike(x, width):
        return heaviside(x)

    def fwd(x, width):
        return heaviside(x), (x, width)

    def bwd(res, g):
        x, width = res
        return (g * sg_fn(x, width), None)

    spike.defvjp(fwd, bwd)
    spike.__name__ = name
    return spike


# surrogate derivative shapes (see spiking_util.py:39-93)
_superspike_core = _make_spike(
    lambda x, w: 1.0 / (1.0 + w * jnp.abs(x)) ** 2, "superspike_core"
)
_mgspike_core = _make_spike(
    lambda x, w: (
        1.15 * _gaussian(x, 0.0, w)
        - 0.15 * _gaussian(x, w, 6.0 * w)
        - 0.15 * _gaussian(x, -w, 6.0 * w)
    ),
    "mgspike_core",
)
_trianglespike_core = _make_spike(
    lambda x, w: jax.nn.relu(1.0 - w * jnp.abs(x)), "trianglespike_core"
)
_arctanspike_core = _make_spike(lambda x, w: 1.0 / (1.0 + w * x * x), "arctanspike_core")
# snntorch.surrogate.atan(alpha): d/dx = (alpha/2) / (1 + (pi/2 * alpha * x)^2)
_atansnn_core = _make_spike(
    lambda x, a: (a / 2.0) / (1.0 + (math.pi / 2.0 * a * x) ** 2), "atanspike_snn_core"
)


def superspike(x, thresh=1.0, width=10.0):
    """SuperSpike surrogate (Zenke et al. 2018). spiking_util.py:96-97."""
    return _superspike_core(x - thresh, width)


def mgspike(x, thresh=1.0, width=0.5):
    """Multi-Gaussian surrogate (Yin et al. 2021). spiking_util.py:100-101."""
    return _mgspike_core(x - thresh, width)


def trianglespike(x, thresh=1.0, width=1.0):
    """Triangular surrogate (Bellec et al. 2020). spiking_util.py:104-105."""
    return _trianglespike_core(x - thresh, width)


def arctanspike(x, thresh=1.0, width=10.0):
    """Arctan-derivative surrogate (Fang et al. 2021). spiking_util.py:108-109."""
    return _arctanspike_core(x - thresh, width)


def atanspike_snn(x, thresh=0.0, alpha=2.0):
    """snntorch-style ATan surrogate (the default of snn.Leaky)."""
    return _atansnn_core(x - thresh, alpha)


SURROGATES = {
    "superspike": superspike,
    "mgspike": mgspike,
    "trianglespike": trianglespike,
    "arctanspike": arctanspike,
    "atanspike_snn": atanspike_snn,
}


def spike_fn(name: str):
    """Registry lookup (replaces the reference's getattr-based dispatch,
    models/spiking_submodules.py:106-107)."""
    try:
        return SURROGATES[name]
    except KeyError as e:
        raise KeyError(
            f"Unknown surrogate '{name}'. Available: {sorted(SURROGATES)}"
        ) from e
