"""Fused conv3x3 + leaky-integrate-fire Pallas TPU kernel.

The inference hot path of the FireNet models: one kernel computes
``spk, mem' = LIF(BN_folded_conv(x) [+ rec_conv(prev_spk)], mem)`` per layer,
replacing (a) the reference's per-layer torch conv→BN→snn.Leaky chain and
(b) the XLA conv lowering, which reaches only ~11 TFLOP/s at 32 channels on
v5e (see the microbenchmarks in BENCH_NOTES.md). Design:

  * the 3x3 SAME conv is an im2col matmul ``[TH*W, 9*Cin] @ [9*Cin, C]``
    with the patch matrix built in VMEM from a halo'd input block — the
    9x-inflated patch tensor never touches HBM;
  * BN is pre-folded into the weights/bias (inference running stats);
  * the LIF state update (snn.Leaky zero/subtract-reset inference semantics,
    matching evflow.ops.lif.leaky_step at spike time) is fused elementwise on
    the matmul result while it is still in VMEM;
  * recurrent cells concatenate ``[x_patches | spk_patches]`` and use a
    stacked ``[2*9*C, C]`` weight matrix — one MXU pass for both convs;
  * grid over (batch, H row-tiles); overlapping halo windows are
    materialized as a [B, n_tiles, TH+2, W+2, C] tensor before the call
    (a ~6% input copy — Pallas Blocked indexing cannot express overlap).

Training uses the XLA path (autodiff through the surrogate); this kernel is
wired into eval/bench/serving via ``evflow.models.fused.FusedFireNet``.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv_lif", "fold_bn"]


def _kernel(x_ref, w_ref, bias_ref, beta_ref, theta_ref, mem_ref,
            spk_out_ref, mem_out_ref, *, TH: int, W: int, Cin: int, C: int,
            n_in: int, hard_reset: bool):
    """One (batch, row-tile) block.

    x_ref:    [1, 1, n_in, TH+2, W+2, Cin] halo'd input block(s) (bf16)
    w_ref:    [n_in*9*Cin, C] stacked conv weights (bf16)
    bias/beta/theta_ref: [1, C] (f32)
    mem_ref:  [1, TH, W, C] membrane block (f32)
    """
    rows = TH * W

    cols = []
    for s in range(n_in):
        for dy in range(3):
            for dx in range(3):
                sub = x_ref[0, 0, s, dy : dy + TH, dx : dx + W, :]
                cols.append(sub.reshape(rows, Cin))
    patches = jnp.concatenate(cols, axis=-1)  # [rows, n_in*9*Cin]

    ff = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
    ff = ff + bias_ref[0, :][None, :]

    beta = beta_ref[0, :][None, :]
    theta = theta_ref[0, :][None, :]
    mem = mem_ref[0].reshape(rows, C)

    # snn.Leaky inference update (reset_delay=False); see ops/lif.leaky_step
    reset_prev = (mem > theta).astype(jnp.float32)
    base = beta * mem + ff
    if hard_reset:
        u = base - reset_prev * base
    else:
        u = base - reset_prev * theta
    spk = (u > theta).astype(jnp.float32)
    # reset_delay=False immediate reset: do_reset = spk - reset_prev
    if hard_reset:
        mem2 = u - (spk - reset_prev) * u
    else:
        mem2 = u - (spk - reset_prev) * theta

    spk_out_ref[0] = spk.reshape(TH, W, C)
    mem_out_ref[0] = mem2.reshape(TH, W, C)


def _halo_tiles(xp: jax.Array, n_tiles: int, TH: int) -> jax.Array:
    """[B, H+2, W+2, C] -> [B, n_tiles, TH+2, W+2, C] overlapping windows."""
    parts = [xp[:, i * TH : i * TH + TH + 2] for i in range(n_tiles)]
    return jnp.stack(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("hard_reset", "tile_rows"))
def fused_conv_lif(
    x: jax.Array,
    mem: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    beta: jax.Array,
    theta: jax.Array,
    prev_spk: Optional[jax.Array] = None,
    w_rec: Optional[jax.Array] = None,
    hard_reset: bool = True,
    tile_rows: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Fused conv3x3(+rec conv)+folded-BN+LIF step.

    Args:
      x: [B, H, W, Cin] input (cast to bf16 internally).
      mem: [B, H, W, C] membrane (f32).
      w: [3, 3, Cin, C] feedforward conv weights (BN-folded).
      bias: [C] folded BN bias.
      beta, theta: [C] LIF leak / threshold (theta pre-clamped >= 0.01).
      prev_spk / w_rec: recurrent-cell spike input and [3, 3, C, C] weights.
    Returns:
      (spk, mem_out), both [B, H, W, C] f32.
    """
    B, H, W, Cin = x.shape
    C = w.shape[-1]
    TH = min(tile_rows, H)
    assert H % TH == 0, (H, TH)
    n_tiles = H // TH

    recurrent = prev_spk is not None
    n_in = 2 if recurrent else 1
    if recurrent and Cin != C:
        raise ValueError("recurrent cells require Cin == C")

    # zero-pad narrow inputs (the 2-channel head) up to the layer width:
    # tiny lane counts force heavily padded VMEM relayouts that blow the
    # scoped-VMEM budget and waste the MXU anyway
    if Cin < C:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, C - Cin)))
        w = jnp.pad(w, ((0, 0), (0, 0), (0, C - Cin), (0, 0)))
        Cin = C

    xp = jnp.pad(x.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
    if recurrent:
        sp = jnp.pad(prev_spk.astype(jnp.bfloat16), ((0, 0), (1, 1), (1, 1), (0, 0)))
        xin = jnp.stack(
            [_halo_tiles(xp, n_tiles, TH), _halo_tiles(sp, n_tiles, TH)], axis=2
        )  # [B, n_tiles, 2, TH+2, W+2, C]
        wm = jnp.concatenate(
            [w.reshape(9 * Cin, C), w_rec.reshape(9 * C, C)], axis=0
        ).astype(jnp.bfloat16)
    else:
        xin = _halo_tiles(xp, n_tiles, TH)[:, :, None]
        wm = w.reshape(9 * Cin, C).astype(jnp.bfloat16)

    kernel = functools.partial(
        _kernel, TH=TH, W=W, Cin=Cin, C=C, n_in=n_in, hard_reset=hard_reset
    )

    spk, mem_out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_in, TH + 2, W + 2, Cin), lambda b, i: (b, i, 0, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # beta
            pl.BlockSpec(memory_space=pltpu.VMEM),  # theta
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
            pl.BlockSpec((1, TH, W, C), lambda b, i: (b, i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
            jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        ],
    )(xin, wm, bias.reshape(1, C), beta.reshape(1, C), theta.reshape(1, C), mem)
    return spk, mem_out


def fold_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps: float = 1e-5):
    """Fold inference BatchNorm into conv weights + bias (jnp version of
    evflow.export.fold_batchnorm_params)."""
    g = bn_scale / jnp.sqrt(bn_var + eps)
    return kernel * g[None, None, None, :], bn_bias - bn_mean * g
