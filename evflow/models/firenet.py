"""FireNet model family: LIFFireNet / LIFFireFlowNet (+ _short variants).

Behavioral reference: models/model.py:29-720. Architecture (full variant):
head → G1(rec) → R1a → R1b → G2(rec) → R2a → R2b → pred(1×1 conv, tanh,
w_scale 0.01). "_short" drops R1b/R2b (5 stateful units); "FlowNet" variants
replace the recurrent units with feedforward cells.

TPU-first design: the model is a pure step function over an explicit state
tuple — ``model.apply(vars, voxel, cnt, states, ...) -> (out, new_states)`` —
so a whole TBPTT window rolls inside one ``jax.lax.scan`` and the batch dim
shards over a device mesh. Layout is NHWC; convs can run in bfloat16 via
``compute_dtype`` while LIF state stays f32.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from evflow.models.ann import ConvLayer
from evflow.models.cells import (
    ConvLIF,
    ConvLIFRecurrent,
    SNNConvLIF,
    SNNConvLIFRecurrent,
)
from evflow.ops.lif import LIFState

__all__ = ["FireNet", "nonzero_normalize", "activity_fractions"]


def nonzero_normalize(x: jax.Array) -> jax.Array:
    """Normalize nonzero elements to zero mean / unit std
    (models/model.py:164-169; torch ``.std()`` is unbiased)."""
    mask = (x != 0).astype(x.dtype)
    n = mask.sum()
    mean = (x * mask).sum() / jnp.maximum(n, 1.0)
    var = (mask * (x - mean) ** 2).sum() / jnp.maximum(n - 1.0, 1.0)
    std = jnp.sqrt(var)
    return jnp.where(mask > 0, (x - mean) / jnp.maximum(std, 1e-12), x)


def activity_fractions(tensors: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Fraction of nonzero activations per layer (models/model.py:191-206)."""
    return {k: (v != 0).astype(jnp.float32).mean() for k, v in tensors.items()}


class FireNet(nn.Module):
    """Unified FireNet family module.

    variant axes:
      recurrent: G1/G2 are recurrent cells (LIFFireNet) vs feedforward
        (LIFFireFlowNet, models/model.py:395).
      short: drop R1b/R2b (models/model.py:210-384).
      cell_family: "snn" (default snntorch-style cells) or "sigmoid"
        (original spiking_submodules cells).
    """

    num_bins: int = 2
    base_num_channels: int = 32
    kernel_size: int = 3
    encoding: str = "cnt"
    norm_input: bool = False
    mask_output: bool = True
    recurrent: bool = True
    short: bool = False
    cell_family: str = "snn"
    # spiking neuron options (config section 'spiking_neuron')
    leak: Tuple[float, float] = (0.0, 1.0)
    thresh: Tuple[float, float] = (0.0, 0.8)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    activation: str = "arctanspike"
    act_width: float = 10.0
    # normalization options
    tebn: bool = False
    num_timesteps: int = 4
    mpbn: bool = False
    # quantization hooks
    state_quant: Optional[Callable[[jax.Array], jax.Array]] = None
    state_quant_per_layer: Optional[Tuple[Optional[Callable], ...]] = None
    conv_fake_quant: Optional[Callable[[jax.Array, str], jax.Array]] = None
    # per-layer calibrated static-scale conv quant hooks: one per unit plus a
    # final entry for the pred head (overrides conv_fake_quant when set)
    conv_fake_quant_per_layer: Optional[Tuple[Optional[Callable], ...]] = None
    # performance
    compute_dtype: Optional[jnp.dtype] = None  # e.g. jnp.bfloat16 for convs
    conv_impl: str = "auto"  # "auto"/"im2col" (matmul fast path) or "lax"
    state_dtype: Optional[jnp.dtype] = None  # bf16 membrane carries (eval)
    w_scale_pred: float = 0.01

    @property
    def num_units(self) -> int:
        return 5 if self.short else 7

    @property
    def unit_names(self) -> Tuple[str, ...]:
        if self.short:
            return ("head", "G1", "R1a", "G2", "R2a")
        return ("head", "G1", "R1a", "R1b", "G2", "R2a", "R2b")

    def init_states(self, batch: int, height: int, width: int) -> Tuple[LIFState, ...]:
        """Zero state pytree (replaces reference ``reset_states``,
        models/model.py:129-130)."""
        shape = (batch, height, width, self.base_num_channels)
        sdt = self.state_dtype or jnp.float32
        # distinct buffers per leaf so the train step can donate the carry
        return tuple(
            LIFState(jnp.zeros(shape, sdt), jnp.zeros(shape, sdt))
            for _ in range(self.num_units)
        )

    def _layer_quant(self, idx: int):
        if self.state_quant_per_layer is not None:
            return self.state_quant_per_layer[idx]
        return self.state_quant

    def _layer_conv_quant(self, idx: int):
        """Conv quant hook for unit ``idx`` (``idx == num_units`` → pred)."""
        if self.conv_fake_quant_per_layer is not None:
            return self.conv_fake_quant_per_layer[idx]
        return self.conv_fake_quant

    def _make_cells(self):
        common: Dict[str, Any] = dict(
            kernel_size=self.kernel_size,
            learn_leak=self.learn_leak,
            learn_thresh=self.learn_thresh,
            hard_reset=self.hard_reset,
            detach=self.detach,
            dtype=self.compute_dtype,
            conv_impl=self.conv_impl,
        )
        if self.cell_family == "snn" and self.state_dtype is not None:
            common["state_dtype"] = self.state_dtype
        if self.cell_family == "snn":
            common.update(
                leak=self.leak,
                thresh=self.thresh,
                tebn=self.tebn,
                num_timesteps=self.num_timesteps,
                mpbn=self.mpbn,
            )
            FF, REC = SNNConvLIF, SNNConvLIFRecurrent
        elif self.cell_family == "sigmoid":
            common.update(
                leak=self.leak,
                thresh=self.thresh,
                activation=self.activation,
                act_width=self.act_width,
            )
            FF, REC = ConvLIF, ConvLIFRecurrent
        else:
            raise ValueError(f"Unknown cell_family {self.cell_family!r}")

        C = self.base_num_channels
        mid = REC if self.recurrent else FF

        def ff_extra(idx):
            extra = {"conv_fake_quant": self._layer_conv_quant(idx)}
            if self.cell_family == "snn":
                extra["state_quant"] = self._layer_quant(idx)
            return extra

        cells = [
            FF(self.num_bins, C, name="head", **ff_extra(0), **common),
            mid(C, C, name="G1", **ff_extra(1), **common),
            FF(C, C, name="R1a", **ff_extra(2), **common),
        ]
        if not self.short:
            cells.append(FF(C, C, name="R1b", **ff_extra(3), **common))
        o = 0 if self.short else 1
        cells.append(mid(C, C, name="G2", **ff_extra(3 + o), **common))
        cells.append(FF(C, C, name="R2a", **ff_extra(4 + o), **common))
        if not self.short:
            cells.append(FF(C, C, name="R2b", **ff_extra(6), **common))
        return cells

    @nn.compact
    def __call__(
        self,
        event_voxel: Optional[jax.Array],
        event_cnt: Optional[jax.Array],
        states: Optional[Sequence[Optional[LIFState]]] = None,
        train: bool = False,
        timestep: Optional[jax.Array] = None,
        log: bool = False,
    ):
        """One event-window step.

        Args:
          event_voxel: ``[B, H, W, num_bins]`` voxel encoding (or None).
          event_cnt: ``[B, H, W, 2]`` per-polarity counts (or None).
          states: tuple of per-unit ``LIFState`` (or None → zeros).
          timestep: TEBN timestep index within the window sequence.
        Returns:
          ``({"flow": [flow BHW2], "activity": dict|None}, new_states)``
        """
        if self.encoding == "voxel":
            x = event_voxel
        elif self.encoding == "cnt" and self.num_bins == 2:
            x = event_cnt
        else:
            raise ValueError(
                f"Incorrect input encoding {self.encoding!r} for num_bins="
                f"{self.num_bins} (models/model.py:146-161)"
            )
        if x is None:
            raise ValueError("Selected encoding input is None")

        if self.norm_input:
            x = nonzero_normalize(x)

        if states is None:
            states = (None,) * self.num_units
        cells = self._make_cells()

        new_states = []
        taps = {"0:input": x}
        h = x
        for i, cell in enumerate(cells):
            h, s = cell(h, states[i], train=train, timestep=timestep)
            new_states.append(s)
            taps[f"{i + 1}:{self.unit_names[i]}"] = h

        flow = ConvLayer(
            2,
            kernel_size=1,
            activation="tanh",
            w_scale=self.w_scale_pred,
            conv_fake_quant=self._layer_conv_quant(self.num_units),
            dtype=self.compute_dtype,
            name="pred",
        )(h, train)
        taps[f"{len(cells) + 1}:pred"] = flow

        activity = activity_fractions(taps) if log else None
        return {"flow": [flow], "activity": activity}, tuple(new_states)
