"""Convolutional spiking LIF cells as flax modules (channels-last).

Two families, matching the reference:

* ``SNNConvLIF`` / ``SNNConvLIFRecurrent`` — the current default cells:
  conv (no bias) → BatchNorm/TEBN → snn.Leaky dynamics with per-channel
  learnable beta/threshold, hard ("zero") or soft ("subtract") reset,
  per-step membrane detach, optional MPBN and int8 membrane fake-quant.
  Behavioral reference: models/SNNtorch_spiking_submodules.py:124-567.

* ``ConvLIF`` / ``ConvLIFRecurrent`` — the original autograd cells:
  sigmoid-stabilised leak, ``(1 - leak)`` input scaling, detached reset,
  selectable surrogate. Behavioral reference:
  models/spiking_submodules.py:29-300.

State is an explicit ``LIFState(mem, spk)`` pytree passed in and out —
no module-held mutable state — so cells drop directly into
``jax.lax.scan`` carries and shard under ``pjit``. Passing ``state=None``
initializes zeros (the reference's lazy init at first forward).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from evflow.models.norm import MPBN, TEBN, BatchNorm
from evflow.ops.lif import LIFState, THRESH_MIN, leaky_step, sigmoid_lif_step

__all__ = ["SNNConvLIF", "SNNConvLIFRecurrent", "ConvLIF", "ConvLIFRecurrent"]


def uniform_init(scale: float):
    """U(-scale, scale) kernel init (reference w_scale = sqrt(1/fan_in_channels),
    SNNtorch_spiking_submodules.py:242-243)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def uniform_range_init(lo: float, hi: float):
    """U(lo, hi) per-channel parameter init (leak/thresh ranges)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init


def normal_init(mean: float, std: float):
    """N(mean, std) per-channel init (original-cell leak/thresh,
    spiking_submodules.py:89-96)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std + mean

    return init


def _maybe_stop(x: jax.Array, learn: bool) -> jax.Array:
    return x if learn else jax.lax.stop_gradient(x)


class ConvIm2col(nn.Module):
    """SAME conv (stride 1) computed as a matmul (im2col or dy-packed).

    On v5e the XLA conv lowering reaches ~11 TFLOP/s at 32 channels while the
    equivalent ``[B*H*W, k*k*Cin] @ [k*k*Cin, C]`` matmul is ~2x faster (see
    BENCH_NOTES.md). ``impl='dypack'`` uses the dy-packed N=3C formulation
    (evflow/ops/dypack.py) — a further 1.55x (bf16) / 2.0x ('dypack_int8')
    for 3x3 kernels. Parameter name/shape match ``nn.Conv`` ("kernel",
    HWIO), so checkpoints are interchangeable between implementations.
    """

    features: int
    kernel_size: int = 3
    use_bias: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Optional[jnp.dtype] = None
    impl: str = "im2col"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, H, W, Cin = x.shape
        k = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (k, k, Cin, self.features)
        )
        dtype = self.dtype or x.dtype
        if k == 3 and self.impl.startswith("dypack"):
            from evflow.ops.dypack import conv3x3_dypack

            y = conv3x3_dypack(
                x, kernel, dtype=dtype, int8=self.impl == "dypack_int8"
            )
            if self.use_bias:
                y = y + self.param(
                    "bias", self.bias_init, (self.features,)
                ).astype(y.dtype)
            return y
        xk = x.astype(dtype)
        p = k // 2
        xp = jnp.pad(xk, ((0, 0), (p, p), (p, p), (0, 0)))
        cols = jnp.concatenate(
            [
                xp[:, dy : dy + H, dx : dx + W, :]
                for dy in range(k)
                for dx in range(k)
            ],
            axis=-1,
        )
        y = (
            cols.reshape(-1, k * k * Cin)
            @ kernel.astype(dtype).reshape(k * k * Cin, self.features)
        ).reshape(B, H, W, self.features)
        if self.use_bias:
            y = y + self.param("bias", self.bias_init, (self.features,)).astype(dtype)
        return y


class _KernelHolder(nn.Module):
    """Declares a conv kernel param at the same path/shape/init as the
    equivalent ConvIm2col/nn.Conv child ("<name>/kernel"), for fused paths
    that consume raw kernels (conv3x3_dypack_dual). Checkpoints stay
    interchangeable with the unfused modules."""

    kernel_size: int
    in_features: int
    features: int
    kernel_init: Callable

    @nn.compact
    def __call__(self) -> jax.Array:
        k = self.kernel_size
        return self.param(
            "kernel", self.kernel_init, (k, k, self.in_features, self.features)
        )


def make_conv(
    features: int,
    kernel_size: int,
    stride: int,
    kernel_init,
    dtype,
    name: str,
    conv_impl: str = "auto",
):
    """Conv factory: im2col/dy-packed matmul for stride-1 (TPU fast path),
    nn.Conv otherwise or when ``conv_impl='lax'``."""
    if conv_impl in ("auto", "im2col", "dypack", "dypack_int8") and stride == 1:
        return ConvIm2col(
            features,
            kernel_size,
            use_bias=False,
            kernel_init=kernel_init,
            dtype=dtype,
            name=name,
            impl="im2col" if conv_impl == "auto" else conv_impl,
        )
    # explicit symmetric padding k//2: torch Conv2d(padding=k//2) and flax
    # "SAME" agree at stride 1 (odd k) but MISALIGN taps at stride 2 — the
    # reference's strided encoder convs (spiking_submodules.py:29-151 with
    # stride=2 in unet encoders) pad symmetrically. Caught by
    # tests/test_reference_parity.py.
    pad = kernel_size // 2
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=stride,
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        kernel_init=kernel_init,
        dtype=dtype,
        name=name,
    )


class SNNConvLIF(nn.Module):
    """Feedforward conv + BN + snn.Leaky cell.

    Reference: SNNtorch_ConvLIF (SNNtorch_spiking_submodules.py:124-322).
    """

    input_size: int
    features: int
    kernel_size: int = 3
    stride: int = 1
    leak: Tuple[float, float] = (0.0, 1.0)
    thresh: Tuple[float, float] = (0.0, 0.8)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    alpha: float = 2.0  # snntorch ATan surrogate sharpness
    tebn: bool = False
    num_timesteps: int = 4
    mpbn: bool = False
    state_quant: Optional[Callable[[jax.Array], jax.Array]] = None
    conv_fake_quant: Optional[Callable[[jax.Array, str], jax.Array]] = None
    dtype: Optional[jnp.dtype] = None
    conv_impl: str = "auto"
    state_dtype: Optional[jnp.dtype] = None  # bf16 halves the HBM state traffic

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        state: Optional[LIFState],
        train: bool = False,
        timestep: Optional[jax.Array] = None,
        residual: jax.Array | float = 0.0,  # accepted but unused, like the reference
    ) -> Tuple[jax.Array, LIFState]:
        w_scale = math.sqrt(1.0 / self.input_size)
        conv = make_conv(
            self.features,
            self.kernel_size,
            self.stride,
            uniform_init(w_scale),
            self.dtype,
            "ff",
            self.conv_impl,
        )
        if self.conv_fake_quant is not None:
            x = self.conv_fake_quant(x, "input")
        ff = conv(x)
        if self.conv_fake_quant is not None:
            ff = self.conv_fake_quant(ff, "output")

        if self.tebn:
            ff = TEBN(self.features, self.num_timesteps, name="bn")(
                ff, train, timestep
            )
        else:
            ff = BatchNorm(name="bn")(ff, train)
        sdt = self.state_dtype or jnp.float32
        ff = ff.astype(sdt)

        beta = self.param("beta", uniform_range_init(*self.leak), (self.features,))
        theta = self.param(
            "threshold", uniform_range_init(*self.thresh), (self.features,)
        )
        beta = _maybe_stop(beta, self.learn_leak).astype(sdt)
        theta = jnp.maximum(_maybe_stop(theta, self.learn_thresh), THRESH_MIN).astype(sdt)

        mem = jnp.zeros_like(ff) if state is None else state.mem.astype(sdt)
        spk, mem_out = leaky_step(
            ff,
            mem,
            beta,
            theta,
            reset="zero" if self.hard_reset else "subtract",
            alpha=self.alpha,
            state_quant=self.state_quant,
        )

        if self.detach:
            mem_out = jax.lax.stop_gradient(mem_out)
        if self.mpbn:
            mem_out = MPBN(name="mpbn")(mem_out, train)

        return spk, LIFState(mem_out, spk)


class SNNConvLIFRecurrent(nn.Module):
    """Recurrent conv + BN + snn.Leaky cell: adds a conv over previous
    spikes to the input current.

    Reference: SNNtorch_ConvLIFRecurrent
    (SNNtorch_spiking_submodules.py:324-567). The spike element of the carry
    is NOT detached, so recurrent gradients flow within a loss window.
    """

    input_size: int
    features: int
    kernel_size: int = 3
    leak: Tuple[float, float] = (0.0, 1.0)
    thresh: Tuple[float, float] = (0.0, 0.8)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    alpha: float = 2.0
    tebn: bool = False
    num_timesteps: int = 4
    mpbn: bool = False
    state_quant: Optional[Callable[[jax.Array], jax.Array]] = None
    conv_fake_quant: Optional[Callable[[jax.Array, str], jax.Array]] = None
    dtype: Optional[jnp.dtype] = None
    conv_impl: str = "auto"
    state_dtype: Optional[jnp.dtype] = None  # bf16 halves the HBM state traffic

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        state: Optional[LIFState],
        train: bool = False,
        timestep: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, LIFState]:
        w_ff = math.sqrt(1.0 / self.input_size)
        w_rec = math.sqrt(1.0 / self.features)
        if self.conv_fake_quant is not None:
            x = self.conv_fake_quant(x, "input")

        # ff+rec fused into one K=6C GEMM: a win only for the int8 path (one
        # input-quant + rescale instead of two); measured bf16 prefers XLA's
        # separate-dot schedule (BENCH_NOTES.md round 2: 1545 vs 1710 win/s
        # bf16, 1697 vs 1470 int8)
        fused_dual = (
            self.conv_impl == "dypack_int8"
            and self.kernel_size == 3
            and self.conv_fake_quant is None
        )
        if fused_dual:
            from evflow.ops.dypack import conv3x3_dypack_dual

            k_ff = _KernelHolder(3, x.shape[-1], self.features,
                                 uniform_init(w_ff), name="ff")()
            k_rec = _KernelHolder(3, self.features, self.features,
                                  uniform_init(w_rec), name="rec")()
            if state is None:
                shape = x.shape[:-1] + (self.features,)
                mem = jnp.zeros(shape, x.dtype)
                prev_spk = jnp.zeros(shape, x.dtype)
            else:
                mem, prev_spk = state.mem, state.spk
            total = conv3x3_dypack_dual(
                x, prev_spk, k_ff, k_rec,
                dtype=self.dtype, int8=self.conv_impl == "dypack_int8",
            )
        else:
            ff = make_conv(
                self.features,
                self.kernel_size,
                1,
                uniform_init(w_ff),
                self.dtype,
                "ff",
                self.conv_impl,
            )(x)

            if state is None:
                mem = jnp.zeros_like(ff)
                prev_spk = jnp.zeros_like(ff)
            else:
                mem, prev_spk = state.mem, state.spk

            rec = make_conv(
                self.features,
                self.kernel_size,
                1,
                uniform_init(w_rec),
                self.dtype,
                "rec",
                self.conv_impl,
            )(prev_spk)
            if self.conv_fake_quant is not None:
                ff = self.conv_fake_quant(ff, "output")
                rec = self.conv_fake_quant(rec, "output")

            total = ff + rec
        if self.tebn:
            total = TEBN(self.features, self.num_timesteps, name="bn")(
                total, train, timestep
            )
        else:
            total = BatchNorm(name="bn")(total, train)
        sdt = self.state_dtype or jnp.float32
        total = total.astype(sdt)

        beta = self.param("beta", uniform_range_init(*self.leak), (self.features,))
        theta = self.param(
            "threshold", uniform_range_init(*self.thresh), (self.features,)
        )
        beta = _maybe_stop(beta, self.learn_leak).astype(sdt)
        theta = jnp.maximum(_maybe_stop(theta, self.learn_thresh), THRESH_MIN).astype(sdt)

        spk, mem_out = leaky_step(
            total,
            mem.astype(sdt),
            beta,
            theta,
            reset="zero" if self.hard_reset else "subtract",
            alpha=self.alpha,
            state_quant=self.state_quant,
        )

        if self.detach:
            mem_out = jax.lax.stop_gradient(mem_out)
        if self.mpbn:
            mem_out = MPBN(name="mpbn")(mem_out, train)

        return spk, LIFState(mem_out, spk)


class ConvLIF(nn.Module):
    """Original feedforward cell: sigmoid leak, (1-leak) input scaling.

    Reference: spiking_submodules.py:29-151. ``residual`` is added to the
    output spikes (Fang et al. 2021 style).
    """

    input_size: int
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak: Tuple[float, float] = (-4.0, 0.1)  # (mean, std) of normal init
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    norm: Optional[str] = None
    conv_fake_quant: Optional[Callable[[jax.Array, str], jax.Array]] = None
    dtype: Optional[jnp.dtype] = None
    conv_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        state: Optional[LIFState],
        train: bool = False,
        timestep: Optional[jax.Array] = None,
        residual: jax.Array | float = 0.0,
    ) -> Tuple[jax.Array, LIFState]:
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=1, name="norm")(x)
        w_scale = math.sqrt(1.0 / self.input_size)
        # conv fake-quant hooks (the reference's brevitas QuantConv2d in the
        # sigmoid family, spiking_submodules.py:69-84)
        if self.conv_fake_quant is not None:
            x = self.conv_fake_quant(x, "input")
        ff = make_conv(
            self.features,
            self.kernel_size,
            self.stride,
            uniform_init(w_scale),
            self.dtype,
            "ff",
            self.conv_impl,
        )(x).astype(jnp.float32)
        if self.conv_fake_quant is not None:
            ff = self.conv_fake_quant(ff, "output")

        if state is None:
            v = jnp.zeros_like(ff)
            z = jnp.zeros_like(ff)
        else:
            v, z = state.mem, state.spk

        leak = self.param("leak", normal_init(*self.leak), (self.features,))
        thresh = self.param("thresh", normal_init(*self.thresh), (self.features,))
        leak = _maybe_stop(leak, self.learn_leak)
        thresh = _maybe_stop(thresh, self.learn_thresh)

        z_out, v_out = sigmoid_lif_step(
            ff,
            v,
            z,
            leak,
            thresh,
            hard_reset=self.hard_reset,
            detach_reset=self.detach,
            activation=self.activation,
            act_width=self.act_width,
        )
        return z_out + residual, LIFState(v_out, z_out)


class ConvLIFRecurrent(nn.Module):
    """Original recurrent cell (spiking_submodules.py:154-300)."""

    input_size: int
    features: int
    kernel_size: int = 3
    activation: str = "arctanspike"
    act_width: float = 10.0
    leak: Tuple[float, float] = (-4.0, 0.1)
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True
    norm: Optional[str] = None
    conv_fake_quant: Optional[Callable[[jax.Array, str], jax.Array]] = None
    dtype: Optional[jnp.dtype] = None
    conv_impl: str = "auto"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        state: Optional[LIFState],
        train: bool = False,
        timestep: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, LIFState]:
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=1, name="norm_ff")(x)
        w_ff = math.sqrt(1.0 / self.input_size)
        w_rec = math.sqrt(1.0 / self.features)
        if self.conv_fake_quant is not None:
            x = self.conv_fake_quant(x, "input")
        ff = make_conv(
            self.features,
            self.kernel_size,
            1,
            uniform_init(w_ff),
            self.dtype,
            "ff",
            self.conv_impl,
        )(x)
        if self.conv_fake_quant is not None:
            ff = self.conv_fake_quant(ff, "output")

        if state is None:
            v = jnp.zeros_like(ff)
            z = jnp.zeros_like(ff)
        else:
            v, z = state.mem, state.spk

        z_in = z
        if self.norm == "group":
            z_in = nn.GroupNorm(num_groups=1, name="norm_rec")(z_in)
        rec = make_conv(
            self.features,
            self.kernel_size,
            1,
            uniform_init(w_rec),
            self.dtype,
            "rec",
            self.conv_impl,
        )(z_in)
        if self.conv_fake_quant is not None:
            rec = self.conv_fake_quant(rec, "output")

        leak = self.param("leak", normal_init(*self.leak), (self.features,))
        thresh = self.param("thresh", normal_init(*self.thresh), (self.features,))
        leak = _maybe_stop(leak, self.learn_leak)
        thresh = _maybe_stop(thresh, self.learn_thresh)

        z_out, v_out = sigmoid_lif_step(
            (ff + rec).astype(jnp.float32),
            v,
            z,
            leak,
            thresh,
            hard_reset=self.hard_reset,
            detach_reset=self.detach,
            activation=self.activation,
            act_width=self.act_width,
        )
        return z_out, LIFState(v_out, z_out)
