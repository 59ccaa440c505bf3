"""dy-packed 3x3 convolution: the TPU-efficient formulation for tiny C.

A SAME 3x3 conv at C=32 as a plain im2col GEMM is ``[B*H*W, 9C] @ [9C, C]``:
the output dim N=C=32 uses only 32 of the MXU's 128 lanes (25%), which is
the measured compute wall of the whole model (BENCH_NOTES.md, v8 analysis +
benchmarks/probe_int8_xla.py: N=32 runs at ~8.8 TF/s bf16 while N=128 runs
at ~27.6 TF/s on the same chip).

dy-packing moves the 3 *vertical* taps into the output dim instead:

    cols[y, x, (dx, ci)] = x[y, x + dx - 1, ci]            # [BHW, 3C]
    Z = cols @ W'                                          # [BHW, 3C] N=3C
    y[r, co] = Z[r-1, (0,co)] + Z[r, (1,co)] + Z[r+1, (2,co)]

with ``W'[(dx, ci), (dy, co)] = w[dy, dx, ci, co]``. Identical FLOPs and
math (bit-exact in f32), but N=96 engages 75% of the lanes and the
materialized patch buffer shrinks 3x. Measured on the 9-conv LIF chain:
1.55x (bf16) / 2.0x (int8 cols, bf16 Z) over plain im2col
(benchmarks/probe_dypack2.py).

The int8 variant quantizes weights per-tensor symmetric (round(w/s),
s = absmax/127) and casts inputs to int8 — exact for spike inputs (0/1) and
integer event counts within +-127, i.e. the deployment PTQ configuration
(reference eval_flow_quant.py). The dot runs int8 x int8 -> int32 on the
MXU and Z is cast to bf16 at the dot output so the epilogue stays 2-byte.

Replaces: the reference's conv stack has no TPU analog — this is the
performance port of models/SNNtorch_spiking_submodules.py conv calls.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["conv3x3_dypack", "conv3x3_dypack_dual", "pack_kernel_dy",
           "cols_dx", "cols_dx_dual", "dy_epilogue"]


def pack_kernel_dy(kernel: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] HWIO -> [(dx, ci), (dy, co)] = [3*Cin, 3*Cout]."""
    k3, k3b, cin, cout = kernel.shape
    assert k3 == 3 and k3b == 3, "dy-pack requires 3x3 kernels"
    # [dy, dx, ci, co] -> [dx, ci, dy, co]
    return kernel.transpose(1, 2, 0, 3).reshape(3 * cin, 3 * cout)


def conv3x3_dypack(
    x: jax.Array,
    kernel: jax.Array,
    dtype: Optional[jnp.dtype] = None,
    int8: bool = False,
) -> jax.Array:
    """SAME stride-1 3x3 conv, dy-packed. ``kernel`` is HWIO [3,3,Cin,C].

    With ``int8=True``, inputs are clipped/rounded to int8 (exact for spikes
    and small integer counts) and weights are per-tensor symmetrically
    quantized; the GEMM accumulates in int32 and rescales to bf16.
    """
    B, H, W, Cin = x.shape
    C = kernel.shape[-1]
    wp = pack_kernel_dy(kernel)

    if int8:
        s_w = jnp.maximum(jnp.max(jnp.abs(wp)), 1e-12) / 127.0
        w_i8 = jnp.clip(jnp.round(wp / s_w), -127, 127).astype(jnp.int8)
        xi = jnp.clip(jnp.round(x), -127, 127).astype(jnp.int8)
        xp = jnp.pad(xi, ((0, 0), (0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
        Z = jax.lax.dot_general(
            cols.reshape(-1, 3 * Cin),
            w_i8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C)
        Z = Z * s_w.astype(jnp.bfloat16)
    else:
        cdt = dtype or x.dtype
        xc = x.astype(cdt)
        xp = jnp.pad(xc, ((0, 0), (0, 0), (1, 1), (0, 0)))
        cols = jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)
        Z = (cols.reshape(-1, 3 * Cin) @ wp.astype(cdt)).reshape(B, H, W, 3 * C)

    return dy_epilogue(Z, H, C)


def dy_epilogue(Z: jax.Array, H: int, C: int) -> jax.Array:
    """y[r] = Z[r-1, dy0] + Z[r, dy1] + Z[r+1, dy2] (SAME padding in y)."""
    Zp = jnp.pad(Z, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return (
        Zp[:, 0:H, :, 0:C]
        + Zp[:, 1 : 1 + H, :, C : 2 * C]
        + Zp[:, 2 : 2 + H, :, 2 * C : 3 * C]
    )


def cols_dx(x: jax.Array) -> jax.Array:
    """dx-shift patch buffer: [B, H, W, 3*C]."""
    W = x.shape[2]
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jnp.concatenate([xp[:, :, dx : dx + W, :] for dx in range(3)], axis=-1)


def cols_dx_dual(a: jax.Array, b: jax.Array) -> jax.Array:
    """``concat([cols_dx(a), cols_dx(b)], -1)`` as ONE flat 6-slice concat:
    [B, H, W, 3*Ca + 3*Cb], ordering [a-dx0|a-dx1|a-dx2|b-dx0|b-dx1|b-dx2]
    (matches the dual packed kernel [pack(k_ff); pack(k_rec)] row order).

    The nested two-stage concat lowers to chains of full-buffer
    dynamic-update-slice copies on TPU (~26% of the deploy step,
    benchmarks/profile_bench.py); the flat form assembles the buffer in one
    fusion pass."""
    W = a.shape[2]
    ap = jnp.pad(a, ((0, 0), (0, 0), (1, 1), (0, 0)))
    bp = jnp.pad(b, ((0, 0), (0, 0), (1, 1), (0, 0)))
    return jnp.concatenate(
        [ap[:, :, dx : dx + W, :] for dx in range(3)]
        + [bp[:, :, dx : dx + W, :] for dx in range(3)],
        axis=-1,
    )


def conv3x3_dypack_dual(
    x1: jax.Array,
    x2: jax.Array,
    kernel1: jax.Array,
    kernel2: jax.Array,
    dtype: Optional[jnp.dtype] = None,
    int8: bool = False,
) -> jax.Array:
    """``conv(x1, k1) + conv(x2, k2)`` as ONE dy-packed GEMM.

    The recurrent cells sum a feedforward conv and a recurrent conv
    (SNNtorch_spiking_submodules.py:531-540); fusing them into a single
    [BHW, 6C] @ [6C, 3C] dot halves the Z materialization and epilogue
    traffic and doubles K (better MXU K-utilization)."""
    B, H, W, C1 = x1.shape
    C = kernel1.shape[-1]
    wp = jnp.concatenate([pack_kernel_dy(kernel1), pack_kernel_dy(kernel2)], axis=0)

    if int8:
        s_w = jnp.maximum(jnp.max(jnp.abs(wp)), 1e-12) / 127.0
        w_i8 = jnp.clip(jnp.round(wp / s_w), -127, 127).astype(jnp.int8)
        cols = cols_dx_dual(
            jnp.clip(jnp.round(x1), -127, 127).astype(jnp.int8),
            jnp.clip(jnp.round(x2), -127, 127).astype(jnp.int8),
        )
        Z = jax.lax.dot_general(
            cols.reshape(-1, cols.shape[-1]),
            w_i8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.bfloat16).reshape(B, H, W, 3 * C)
        Z = Z * s_w.astype(jnp.bfloat16)
    else:
        cdt = dtype or x1.dtype
        cols = cols_dx_dual(x1.astype(cdt), x2.astype(cdt))
        Z = (cols.reshape(-1, cols.shape[-1]) @ wp.astype(cdt)).reshape(
            B, H, W, 3 * C
        )
    return dy_epilogue(Z, H, C)
