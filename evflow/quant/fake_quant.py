"""Int8 fake-quantization primitives: weights, activations, membrane state.

Behavioral reference: the brevitas/snntorch quantization stack —
``QuantConv2d(Int8WeightPerTensorFloat, Int8ActPerTensorFloat)`` conv quant
(SNNtorch_spiking_submodules.py:177-229) and snntorch
``quant.state_quant(num_bits=8, uniform=True, threshold=1.0,
lower_limit=249, upper_limit=0)`` membrane quant — range
``[-threshold*(1+lower), threshold*(1+upper)] = [-250, 1]``
(SNNtorch_spiking_submodules.py:190-208).

All fake-quant ops use straight-through gradients (round is identity in the
backward pass) so they drop into QAT training, and are shaped for the TPU
VPU (pure elementwise; XLA fuses them into the surrounding convs).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "ste_round",
    "fake_quant_symmetric",
    "fake_quant_minmax",
    "state_quant_fn",
    "dynamic_conv_quant",
    "static_conv_quant",
]


@jax.custom_vjp
def ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def fake_quant_symmetric(x: jax.Array, scale: jax.Array, num_bits: int = 8) -> jax.Array:
    """Symmetric int fake-quant: clip(round(x/s), -2^{b-1}+1, 2^{b-1}-1)*s
    (brevitas Int8*PerTensorFloat semantics: narrow signed range ±127)."""
    qmax = 2 ** (num_bits - 1) - 1
    s = jnp.maximum(scale, 1e-12)
    return jnp.clip(ste_round(x / s), -qmax, qmax) * s


def fake_quant_minmax(
    x: jax.Array, qmin: float, qmax: float, num_bits: int = 8
) -> jax.Array:
    """Uniform fake-quant over a fixed [qmin, qmax] range (snntorch
    uniform state_quant: round to the nearest of 2^b evenly spaced levels)."""
    levels = 2**num_bits - 1
    step = (qmax - qmin) / levels
    x = jnp.clip(x, qmin, qmax)
    return qmin + ste_round((x - qmin) / step) * step


def state_quant_fn(
    num_bits: int = 8,
    threshold: float = 1.0,
    lower_limit: float = 249.0,
    upper_limit: float = 0.0,
) -> Callable[[jax.Array], jax.Array]:
    """Membrane-state quantizer factory (default range [-250, 1])."""
    qmin = -threshold * (1.0 + lower_limit)
    qmax = threshold * (1.0 + upper_limit)
    return lambda mem: fake_quant_minmax(mem, qmin, qmax, num_bits)


def state_quant_from_range(qmin: float, qmax: float, num_bits: int = 8):
    """Per-layer profiled range quantizer
    (eval_flow_quant.py apply_per_layer_quantization_ranges :466-581)."""
    return lambda mem: fake_quant_minmax(mem, qmin, qmax, num_bits)


def dynamic_conv_quant(num_bits: int = 8) -> Callable[[jax.Array, str], jax.Array]:
    """Per-tensor dynamic-absmax activation fake-quant hook for conv cells.

    The cell calls ``hook(x, tag)`` with tag in {"input", "output"}; the
    scale is the current tensor's absmax/127 (stop-gradient), the QAT
    approximation of brevitas' runtime-collected scales."""

    def hook(x: jax.Array, tag: str) -> jax.Array:
        qmax = 2 ** (num_bits - 1) - 1
        scale = jax.lax.stop_gradient(jnp.max(jnp.abs(x))) / qmax
        return fake_quant_symmetric(x, scale, num_bits)

    return hook


def static_conv_quant(
    scales: dict, layer: str = "", num_bits: int = 8
) -> Callable[[jax.Array, str], jax.Array]:
    """Calibrated static-scale activation quant hook (PTQ path)."""

    def hook(x: jax.Array, tag: str) -> jax.Array:
        s = scales.get(f"{layer}/{tag}") or scales.get(tag)
        if s is None:
            return x
        return fake_quant_symmetric(x, jnp.asarray(s), num_bits)

    return hook


def quantize_weights_symmetric(
    params, num_bits: int = 8, kernel_key: str = "kernel"
):
    """Fake-quantize every conv kernel in a param tree (per-tensor absmax),
    returning (quantized_params, scales_by_path). Used for PTQ weight quant
    and for export metadata (utils/utils.py save_quantized_model:125-184)."""
    qmax = 2 ** (num_bits - 1) - 1
    scales = {}

    def fix(path, v):
        leaf = str(getattr(path[-1], "key", path[-1]))
        if leaf == kernel_key:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            s = float(jnp.max(jnp.abs(v))) / qmax
            scales[name] = s
            return fake_quant_symmetric(v, jnp.float32(s), num_bits)
        return v

    out = jax.tree_util.tree_map_with_path(fix, params)
    return out, scales
