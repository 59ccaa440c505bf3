"""Channel-major fused conv3x3+LIF Pallas kernel (v2).

Why a second kernel: at 32 channels the NHWC orientation puts C on the
128-wide lane/N dimensions, capping the MXU at 25% and lane-padding every
VMEM buffer 4x. This kernel keeps activations channel-major ``[C, H, W]``
and computes the conv in the transposed orientation

    out[C, row] = W_all[C, 9*Cin] @ patches[9*Cin, row_pixels]

so K = 9*Cin = 288 and N = W (256 lanes) are both MXU-shaped, and C=32 only
appears as the streamed M dimension. Patches are built per output row by
concatenating 9 shifted ``[Cin, W]`` row slices along the sublane dim — no
lane-dim relayout, nothing materialized in HBM.

LIF semantics identical to evflow.ops.pallas.conv_lif (snn.Leaky inference,
reset_delay=False). Recurrent cells stack ``[x | prev_spk]`` patches with
``K = 18*C``. Row iteration is either a static unroll (``unroll=True``,
larger Mosaic programs) or a ``fori_loop`` over values with
dynamic_update_slice accumulators.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_conv_lif_cmajor"]


def _lif_update(ff, mem, beta, theta, hard_reset):
    reset_prev = (mem > theta).astype(jnp.float32)
    base = beta * mem + ff
    if hard_reset:
        u = base - reset_prev * base
    else:
        u = base - reset_prev * theta
    spk = (u > theta).astype(jnp.float32)
    if hard_reset:
        mem2 = u - (spk - reset_prev) * u
    else:
        mem2 = u - (spk - reset_prev) * theta
    return spk, mem2


def _kernel(x_ref, w_ref, bias_ref, beta_ref, theta_ref, mem_ref,
            spk_out_ref, mem_out_ref, *, TH: int, W: int, Cin: int, C: int,
            n_in: int, hard_reset: bool, unroll: bool = True):
    """One (batch x row-tile) block, channel-major, 4-D refs.

    x_ref:   [1, n_in*Cin, TH+2, W+2] halo'd inputs (bf16)
    w_ref:   [C, n_in*9*Cin] transposed weights (bf16)
    bias/beta/theta_ref: [C, 1] (f32)
    mem_ref / outs: [1, C, TH, W] (f32)

    The 3x3 conv is ONE ``dot_general`` contraction against a
    ``[K, TH, W]`` patch stack built from 9 (18 for recurrent) static
    sublane/lane slices — N = TH*W fills the MXU, no per-row loop.
    (Mosaic here supports dot_general with a 3-D rhs; value-level
    dynamic_slice and pltpu.roll do not compile — see BENCH_NOTES.md.)
    """
    beta = beta_ref[:, 0][:, None, None]
    theta = theta_ref[:, 0][:, None, None]
    bias = bias_ref[:, 0][:, None, None]
    wv = w_ref[:]

    subs = []
    for s in range(n_in):
        for dy in range(3):
            for dx in range(3):
                subs.append(
                    x_ref[0, s * Cin : (s + 1) * Cin, dy : dy + TH, dx : dx + W]
                )
    patches = jnp.concatenate(subs, axis=0)  # [K, TH, W]

    ff = (
        jax.lax.dot_general(
            wv, patches, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bias
    )  # [C, TH, W]
    mem = mem_ref[0]
    spk, mem2 = _lif_update(ff, mem, beta, theta, hard_reset)
    spk_out_ref[0] = spk
    mem_out_ref[0] = mem2


@functools.partial(jax.jit, static_argnames=("hard_reset", "tile_rows", "unroll"))
def fused_conv_lif_cmajor(
    x: jax.Array,
    mem: jax.Array,
    w: jax.Array,
    bias: jax.Array,
    beta: jax.Array,
    theta: jax.Array,
    prev_spk: Optional[jax.Array] = None,
    w_rec: Optional[jax.Array] = None,
    hard_reset: bool = True,
    tile_rows: int = 16,
    unroll: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Channel-major fused step.

    Args:
      x: [B, Cin, H, W]; mem: [B, C, H, W] (f32).
      w: [3, 3, Cin, C] HWIO weights (converted internally).
      bias, beta, theta: [C].
      prev_spk / w_rec: [B, C, H, W] and [3, 3, C, C] for recurrent cells.
    Returns:
      (spk, mem_out) [B, C, H, W] f32.
    """
    B, Cin, H, W_ = x.shape
    C = w.shape[-1]
    TH = min(tile_rows, H)
    assert H % TH == 0
    n_tiles = H // TH
    recurrent = prev_spk is not None
    n_in = 2 if recurrent else 1

    def to_wT(k, cin):
        # [3,3,cin,C] -> [C, 9*cin] matching patch order (dy, dx, cin)
        return k.transpose(3, 0, 1, 2).reshape(C, 9 * cin)

    if recurrent:
        wT = jnp.concatenate([to_wT(w, Cin), to_wT(w_rec, C)], axis=1)
    else:
        wT = to_wT(w, Cin)
    wT = wT.astype(jnp.bfloat16)

    def pad_cm(a):
        return jnp.pad(a.astype(jnp.bfloat16), ((0, 0), (0, 0), (1, 1), (1, 1)))

    if recurrent:
        xin = jnp.concatenate([pad_cm(x), pad_cm(prev_spk)], axis=1)
    else:
        xin = pad_cm(x)

    # overlapping row windows -> [B*n_tiles, n_in*Cin, TH+2, W+2]
    tiles = jnp.stack(
        [xin[:, :, i * TH : i * TH + TH + 2, :] for i in range(n_tiles)], axis=1
    ).reshape(B * n_tiles, n_in * Cin, TH + 2, W_ + 2)
    mem_t = mem.reshape(B, C, n_tiles, TH, W_).transpose(0, 2, 1, 3, 4).reshape(
        B * n_tiles, C, TH, W_
    )

    kernel = functools.partial(
        _kernel, TH=TH, W=W_, Cin=Cin, C=C, n_in=n_in, hard_reset=hard_reset,
        unroll=unroll,
    )

    spk, mem_out = pl.pallas_call(
        kernel,
        grid=(B * n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, n_in * Cin, TH + 2, W_ + 2), lambda g: (g, 0, 0, 0)
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, TH, W_), lambda g: (g, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, TH, W_), lambda g: (g, 0, 0, 0)),
            pl.BlockSpec((1, C, TH, W_), lambda g: (g, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * n_tiles, C, TH, W_), jnp.float32),
            jax.ShapeDtypeStruct((B * n_tiles, C, TH, W_), jnp.float32),
        ],
    )(tiles, wT, bias.reshape(C, 1), beta.reshape(C, 1), theta.reshape(C, 1), mem_t)

    def un_tile(a):
        return (
            a.reshape(B, n_tiles, C, TH, W_)
            .transpose(0, 2, 1, 3, 4)
            .reshape(B, C, H, W_)
        )

    return un_tile(spk), un_tile(mem_out)
