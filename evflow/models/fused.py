"""FusedFireNet: inference-path FireNet built on the Pallas conv+LIF kernel.

Converts trained FireNet variables (params + BN running stats) into a flat
set of folded arrays and runs the whole per-window forward through
``evflow.ops.pallas.conv_lif.fused_conv_lif`` — one fused kernel per layer,
1x1 pred conv + tanh as a plain matmul. This is the serving/eval/bench fast
path; numerics match the flax eval forward to bf16-conv precision (see
tests/test_pallas.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from evflow.ops.lif import LIFState, THRESH_MIN
from evflow.ops.pallas.conv_lif import fused_conv_lif

__all__ = ["FusedFireNet"]


@dataclass(frozen=True)
class _Unit:
    name: str
    recurrent: bool


class FusedFireNet:
    """Inference FireNet over folded parameter arrays.

    Build with ``FusedFireNet.from_firenet(model, variables)``; call
    ``step(variables_fused, x, states)`` (jit-compatible pure function via
    the bound ``self.step``).
    """

    def __init__(self, units, params, base_num_channels: int, num_bins: int,
                 encoding: str, tile_rows: int = 32, hard_reset: bool = True,
                 layout: str = "nhwc"):
        self.units = units
        self.params = params  # dict name -> dict of arrays
        self.base_num_channels = base_num_channels
        self.num_bins = num_bins
        self.encoding = encoding
        self.tile_rows = tile_rows
        self.hard_reset = hard_reset
        if layout not in ("nhwc", "cmajor"):
            raise ValueError(layout)
        self.layout = layout  # "cmajor" = channel-major kernel (NCHW states)

    @classmethod
    def from_firenet(cls, model, variables, tile_rows: int = 32,
                     layout: str = "nhwc"):
        """Fold a trained flax FireNet (models/firenet.py) into fused form."""
        from evflow.ops.pallas.conv_lif import fold_bn

        p = variables["params"]
        stats = variables.get("batch_stats", {})
        units = []
        params = {}
        for i, name in enumerate(model.unit_names):
            up = p[name]
            bn = up["bn"]["BatchNorm_0"]
            bs = stats[name]["bn"]["BatchNorm_0"]
            scale = jnp.asarray(bn["scale"], jnp.float32)
            bias = jnp.asarray(bn["bias"], jnp.float32)
            if "p" in up["bn"]:
                # TEBN mean-p fold (same as export_variables_from_trained)
                pm = jnp.asarray(up["bn"]["p"], jnp.float32).mean(axis=0)
                scale = scale * pm
                bias = bias * pm
            w, b = fold_bn(
                jnp.asarray(up["ff"]["kernel"], jnp.float32),
                scale,
                bias,
                jnp.asarray(bs["mean"], jnp.float32),
                jnp.asarray(bs["var"], jnp.float32),
            )
            rec = "rec" in up
            entry = {
                "w": w,
                "bias": b,
                "beta": jnp.clip(jnp.asarray(up["beta"], jnp.float32), 0.0, 1.0),
                "theta": jnp.maximum(
                    jnp.asarray(up["threshold"], jnp.float32), THRESH_MIN
                ),
            }
            if rec:
                g = scale / jnp.sqrt(
                    jnp.asarray(bs["var"], jnp.float32) + 1e-5
                )
                entry["w_rec"] = (
                    jnp.asarray(up["rec"]["kernel"], jnp.float32)
                    * g[None, None, None, :]
                )
            params[name] = entry
            units.append(_Unit(name, rec))
        params["pred"] = {
            "w": jnp.asarray(p["pred"]["conv2d"]["kernel"], jnp.float32),
            "b": jnp.asarray(p["pred"]["conv2d"]["bias"], jnp.float32),
        }
        return cls(
            tuple(units),
            params,
            model.base_num_channels,
            model.num_bins,
            model.encoding,
            tile_rows=tile_rows,
            hard_reset=model.hard_reset,
            layout=layout,
        )

    def init_states(self, batch: int, height: int, width: int):
        if self.layout == "cmajor":
            shape = (batch, self.base_num_channels, height, width)
        else:
            shape = (batch, height, width, self.base_num_channels)
        return tuple(
            LIFState(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
            for _ in self.units
        )

    def step(self, params, x: jax.Array, states) -> Tuple[jax.Array, tuple]:
        """One event window: x [B, H, W, num_bins or 2] (NHWC) -> flow
        [B, H, W, 2] (NHWC); internal layout per ``self.layout``."""
        if self.layout == "cmajor":
            from evflow.ops.pallas.conv_lif_cmajor import fused_conv_lif_cmajor

            h = jnp.moveaxis(x, -1, 1)  # NHWC -> NCHW
            kernel_fn = fused_conv_lif_cmajor
        else:
            h = x
            kernel_fn = fused_conv_lif
        new_states = []
        for i, unit in enumerate(self.units):
            e = params[unit.name]
            spk, mem = kernel_fn(
                h,
                states[i].mem,
                e["w"],
                e["bias"],
                e["beta"],
                e["theta"],
                prev_spk=states[i].spk if unit.recurrent else None,
                w_rec=e.get("w_rec"),
                hard_reset=self.hard_reset,
                tile_rows=self.tile_rows,
            )
            new_states.append(LIFState(mem, spk))
            h = spk
        pw = params["pred"]["w"].reshape(-1, 2)
        if self.layout == "cmajor":
            B, C, H, W = h.shape
            hh = jnp.moveaxis(h, 1, -1)
        else:
            B, H, W, C = h.shape
            hh = h
        flow = jnp.tanh(
            (hh.astype(pw.dtype).reshape(-1, C) @ pw).reshape(B, H, W, 2)
            + params["pred"]["b"]
        )
        return flow, tuple(new_states)

    def scan_windows(self, params, windows: jax.Array, states):
        """Scan the fused step over [T, B, H, W, C_in] windows."""

        def body(st, x):
            flow, st2 = self.step(params, x, st)
            return st2, flow

        return jax.lax.scan(body, states, windows)
