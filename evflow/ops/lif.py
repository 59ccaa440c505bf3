"""Functional leaky-integrate-and-fire (LIF) neuron updates.

Three LIF variants exist in the reference, all reproduced here as pure
functions over arrays so they can live inside ``jax.lax.scan`` carries and
under ``pjit``:

1. ``leaky_step`` — the snntorch ``snn.Leaky`` dynamics used by the default
   model cells (reset_mechanism zero/subtract, ``reset_delay=False``,
   beta clamped to [0, 1], optional int8 membrane fake-quant), per
   models/SNNtorch_spiking_submodules.py:200-239,283-322.
2. ``sigmoid_lif_step`` — the original autograd cell dynamics
   (sigmoid-stabilised leak, ``(1 - leak)`` input scaling, detached reset),
   per models/spiking_submodules.py:121-151.
3. ``export_lif_step`` — the deployment kernel semantics of the C++ ONNX
   operator (``mem' = beta*mem + in``; spike and hard-zero reset when
   ``mem' >= threshold``), per ONNX_LIF_operator/src/lif_op.cpp:8-56. This is
   what the exported StableHLO artifact runs.

State convention: each cell carries ``(mem, spk)`` arrays of the layer's
output shape. ``stop_gradient`` on the membrane carry reproduces the
reference's per-step ``detach_hidden()`` truncation
(SNNtorch_spiking_submodules.py:307-311); the spike element of the carry is
NOT detached, so recurrent-spike gradients flow within a loss window exactly
as in the reference (detached only at window boundaries by the trainer).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from evflow.ops.surrogate import atanspike_snn, heaviside, spike_fn

__all__ = [
    "LIFState",
    "leaky_step",
    "sigmoid_lif_step",
    "export_lif_step",
    "THRESH_MIN",
]

# reference clamps learnable thresholds to >= 0.01 before every forward
# (SNNtorch_spiking_submodules.py:284,516; spiking_submodules.py:133)
THRESH_MIN = 0.01


class LIFState(NamedTuple):
    """Per-layer recurrent state: membrane potential and previous spikes."""

    mem: jax.Array
    spk: jax.Array


# make LIFState serializable inside jax.export artifacts (evflow/export.py)
try:
    from jax import export as _jexport

    _jexport.register_namedtuple_serialization(
        LIFState, serialized_name="evflow.ops.lif.LIFState"
    )
except Exception:  # pragma: no cover - older jax without the API
    pass


def leaky_step(
    ff: jax.Array,
    mem: jax.Array,
    beta: jax.Array,
    threshold: jax.Array,
    *,
    reset: str = "zero",
    alpha: float = 2.0,
    state_quant: Optional[Callable[[jax.Array], jax.Array]] = None,
) -> tuple[jax.Array, jax.Array]:
    """One snntorch-``snn.Leaky`` update with ``reset_delay=False``.

    Semantics (snn.Leaky as configured at
    SNNtorch_spiking_submodules.py:232-239):
      reset_prev = H(mem_prev - theta)          (detached)
      u = clip(beta,0,1)*mem_prev + ff  [- reset_prev * (u | theta)]
      u = state_quant(u)                        (optional int8 membrane quant)
      spk = ATan_surrogate(u - theta)
      mem_out = u - (spk - reset_prev) * (u | theta)   (immediate reset;
                 gradient flows through the surrogate spk)

    Args:
      ff: input current (post conv + norm), any shape.
      mem: previous membrane, same shape (zeros at sequence start).
      beta: per-channel leak, broadcastable to ``ff``.
      threshold: per-channel firing threshold, broadcastable (already
        clamped to ``THRESH_MIN`` by the caller).
      reset: "zero" (hard) or "subtract" (soft).
      alpha: snntorch ATan surrogate sharpness (default 2.0).
      state_quant: optional fake-quant applied to the membrane before firing.
    Returns:
      (spk, mem_out)
    """
    if reset not in ("zero", "subtract"):
        raise ValueError(f"reset must be 'zero' or 'subtract', got {reset!r}")

    beta_c = jnp.clip(beta, 0.0, 1.0)
    reset_prev = jax.lax.stop_gradient(heaviside(mem - threshold))

    base = beta_c * mem + ff
    if reset == "zero":
        u = base - reset_prev * base
    else:
        u = base - reset_prev * threshold

    if state_quant is not None:
        u = state_quant(u)

    spk = atanspike_snn(u, thresh=threshold, alpha=alpha)

    do_reset = spk - reset_prev  # gradient flows through the surrogate spike
    if reset == "zero":
        mem_out = u - do_reset * u
    else:
        mem_out = u - do_reset * threshold
    return spk, mem_out


def sigmoid_lif_step(
    ff: jax.Array,
    mem: jax.Array,
    spk_prev: jax.Array,
    leak: jax.Array,
    thresh: jax.Array,
    *,
    hard_reset: bool = True,
    detach_reset: bool = True,
    activation: str = "arctanspike",
    act_width: float = 10.0,
) -> tuple[jax.Array, jax.Array]:
    """One original-ConvLIF update (models/spiking_submodules.py:121-151).

      leak_s = sigmoid(leak)
      hard:  v' = v * leak_s * (1 - z) + (1 - leak_s) * ff
      soft:  v' = v * leak_s + (1 - leak_s) * ff - z * thresh
      z' = surrogate(v' - clamp_min(thresh, 0.01))

    ``z`` is the previous spike output (detached when ``detach_reset``).
    """
    thresh_c = jnp.maximum(thresh, THRESH_MIN)
    leak_s = jax.nn.sigmoid(leak)
    z = jax.lax.stop_gradient(spk_prev) if detach_reset else spk_prev

    if hard_reset:
        v_out = mem * leak_s * (1.0 - z) + (1.0 - leak_s) * ff
    else:
        v_out = mem * leak_s + (1.0 - leak_s) * ff - z * thresh_c

    z_out = spike_fn(activation)(v_out, thresh_c, act_width)
    return z_out, v_out


def export_lif_step(
    x: jax.Array,
    mem: jax.Array,
    beta: jax.Array,
    threshold: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Deployment LIF kernel (ONNX_LIF_operator/src/lif_op.cpp:41-49).

    Pure inference semantics, no surrogate:
      u = beta * mem + x
      spike = (u >= threshold);  mem_out = where(spike, 0, u)

    Note the reference kernel intentionally differs from the training cells:
    raw beta (no sigmoid), no ``(1 - beta)`` input scaling, spike at ``>=``.
    """
    u = beta * mem + x
    spike = (u >= threshold).astype(x.dtype)
    mem_out = jnp.where(spike > 0, jnp.zeros_like(u), u)
    return spike, mem_out
