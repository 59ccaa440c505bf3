"""Non-spiking (ANN) submodules: conv layers, recurrent conv blocks, resblocks.

Behavioral reference: models/submodules.py (ConvLayer :16-113, ConvLayer_
:116-135, TransposedConvLayer :138-189, UpsampleConvLayer :192-237,
RecurrentConvLayer :240-287, ResidualBlock :290-363, ConvLSTM :366-426,
ConvGRU :429-470, ConvRecurrent :473-502). Channels-last layout.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from evflow.models.cells import uniform_init

__all__ = [
    "ConvLayer",
    "ConvLayerStateful",
    "TransposedConvLayer",
    "UpsampleConvLayer",
    "RecurrentConvLayer",
    "ResidualBlock",
    "ConvLSTM",
    "ConvGRU",
    "ConvRecurrent",
    "get_activation",
]

ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
}


def get_activation(name: Optional[str]):
    if name is None or name == "none":
        return None
    try:
        return ACTIVATIONS[name]
    except KeyError as e:
        raise KeyError(f"Unknown activation {name!r}") from e


class ConvLayer(nn.Module):
    """Conv + optional norm + activation (submodules.py:16-113).

    ``w_scale`` triggers U(-w, w) weight init and zero bias (used by the
    flow-prediction heads with w_scale=0.01, models/model.py:105-107)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    bn_momentum: float = 0.9
    w_scale: Optional[float] = None
    conv_fake_quant: Optional[Callable[[jax.Array, str], jax.Array]] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        use_bias = self.norm != "BN"
        kwargs = {}
        if self.w_scale is not None:
            kwargs["kernel_init"] = uniform_init(self.w_scale)
            kwargs["bias_init"] = nn.initializers.zeros
        if self.conv_fake_quant is not None:
            x = self.conv_fake_quant(x, "input")
        pad = self.kernel_size // 2
        out = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            # symmetric k//2 padding = torch Conv2d(padding=k//2); flax
            # "SAME" misaligns taps at stride 2 (submodules.py:39,59)
            padding=((pad, pad), (pad, pad)),
            use_bias=use_bias,
            dtype=self.dtype,
            name="conv2d",
            **kwargs,
        )(x)
        if self.conv_fake_quant is not None:
            out = self.conv_fake_quant(out, "output")
        if self.norm == "BN":
            out = nn.BatchNorm(
                use_running_average=not train, momentum=self.bn_momentum, axis=-1
            )(out)
        elif self.norm == "IN":
            out = nn.GroupNorm(num_groups=None, group_size=1)(out)
        act = get_activation(self.activation)
        out = out.astype(jnp.float32)
        if act is not None:
            out = act(out)
        return out


class ConvLayerStateful(nn.Module):
    """ConvLayer clone with a stateful interface + residual input
    (submodules.py ConvLayer_ :116-135): accepts and passes through a dummy
    state so it can stand in for spiking cells in mixed architectures."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, prev_state=None, train: bool = False, residual=0.0):
        pad = self.kernel_size // 2
        out = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=self.stride,
            padding=((pad, pad), (pad, pad)),
            use_bias=self.norm != "BN",
            dtype=self.dtype,
            name="conv2d",
        )(x)
        if self.norm == "BN":
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9, axis=-1)(out)
        out = out + residual
        act = get_activation(self.activation)
        if act is not None:
            out = act(out)
        return out, (prev_state if prev_state is not None else jnp.zeros(()))


class TransposedConvLayer(nn.Module):
    """Transposed conv ×2 upsampling decoder layer (submodules.py:138-189)."""

    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # torch ConvTranspose2d(stride=2, padding=k//2, output_padding=1)
        # alignment: flax needs transpose_kernel=True with asymmetric
        # (k//2, k//2+1) padding — empirically exact vs torch (flax "SAME"
        # produces the same 2x shape but shifted taps, like the stride-2
        # forward-conv case caught by tests/test_reference_parity.py)
        p = self.kernel_size // 2
        out = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(2, 2),
            padding=((p, p + 1), (p, p + 1)),
            transpose_kernel=True,
            use_bias=self.norm != "BN",
            dtype=self.dtype,
        )(x)
        if self.norm == "BN":
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9, axis=-1)(out)
        act = get_activation(self.activation)
        out = out.astype(jnp.float32)
        if act is not None:
            out = act(out)
        return out


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """Bilinear ×2 (torch align_corners=False equivalent via jax.image)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")


class UpsampleConvLayer(nn.Module):
    """Bilinear ×2 + conv decoder layer — avoids checkerboard artifacts
    (submodules.py:192-237)."""

    features: int
    kernel_size: int = 3
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            use_bias=self.norm != "BN",
            dtype=self.dtype,
        )(upsample2x_bilinear(x))
        if self.norm == "BN":
            out = nn.BatchNorm(use_running_average=not train, momentum=0.9, axis=-1)(out)
        act = get_activation(self.activation)
        out = out.astype(jnp.float32)
        if act is not None:
            out = act(out)
        return out


class ConvLSTM(nn.Module):
    """Convolutional LSTM cell (submodules.py:366-426). State: (hidden, cell)."""

    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, state: Optional[Tuple[jax.Array, jax.Array]]
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        B, H, W, _ = x.shape
        if state is None:
            shape = (B, H, W, self.features)
            prev_hidden = jnp.zeros(shape, x.dtype)
            prev_cell = jnp.zeros(shape, x.dtype)
        else:
            prev_hidden, prev_cell = state
        stacked = jnp.concatenate([x, prev_hidden], axis=-1)
        gates = nn.Conv(
            4 * self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            name="gates",
        )(stacked)
        in_g, rem_g, out_g, cell_g = jnp.split(gates, 4, axis=-1)
        in_g = jax.nn.sigmoid(in_g)
        rem_g = jax.nn.sigmoid(rem_g)
        out_g = jax.nn.sigmoid(out_g)
        cell_g = jnp.tanh(cell_g)
        cell = rem_g * prev_cell + in_g * cell_g
        hidden = out_g * jnp.tanh(cell)
        return hidden, (hidden, cell)


class ConvGRU(nn.Module):
    """Convolutional GRU cell with orthogonal init (submodules.py:429-470)."""

    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, state: Optional[jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        B, H, W, _ = x.shape
        if state is None:
            state = jnp.zeros((B, H, W, self.features), x.dtype)
        stacked = jnp.concatenate([x, state], axis=-1)
        conv = lambda name: nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name=name,
        )
        update = jax.nn.sigmoid(conv("update_gate")(stacked))
        reset = jax.nn.sigmoid(conv("reset_gate")(stacked))
        out = jnp.tanh(
            conv("out_gate")(jnp.concatenate([x, state * reset], axis=-1))
        )
        new_state = state * (1.0 - update) + out * update
        return new_state, new_state


class ConvRecurrent(nn.Module):
    """Vanilla conv-RNN cell for direct SNN comparison (submodules.py:473-502)."""

    features: int
    kernel_size: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, state: Optional[jax.Array]
    ) -> Tuple[jax.Array, jax.Array]:
        B, H, W, _ = x.shape
        if state is None:
            state = jnp.zeros((B, H, W, self.features), x.dtype)
        conv = lambda name: nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            name=name,
        )
        ff = conv("ff")(x)
        rec = conv("rec")(state)
        new_state = jnp.tanh(ff + rec)
        out = jax.nn.relu(conv("out")(new_state))
        return out, new_state


class RecurrentConvLayer(nn.Module):
    """Conv + recurrent block (ConvLSTM/GRU/RNN) encoder layer
    (submodules.py:240-287)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    recurrent_block_type: str = "convlstm"
    activation_ff: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, state, train: bool = False):
        x = ConvLayer(
            self.features,
            self.kernel_size,
            self.stride,
            activation=self.activation_ff,
            norm=self.norm,
            dtype=self.dtype,
            name="conv",
        )(x, train)
        if self.recurrent_block_type == "convlstm":
            out, new_state = ConvLSTM(self.features, 3, name="recurrent_block")(
                x, state
            )
        elif self.recurrent_block_type == "convgru":
            out, new_state = ConvGRU(self.features, 3, name="recurrent_block")(x, state)
        elif self.recurrent_block_type == "convrnn":
            out, new_state = ConvRecurrent(self.features, 3, name="recurrent_block")(
                x, state
            )
        else:
            raise ValueError(
                f"Unknown recurrent_block_type {self.recurrent_block_type!r}"
            )
        return out, new_state


class ResidualBlock(nn.Module):
    """Classic two-conv residual block (submodules.py:290-363)."""

    features: int
    stride: int = 1
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> Tuple[jax.Array, jax.Array]:
        act = get_activation(self.activation)
        use_bias = self.norm != "BN"
        out1 = nn.Conv(
            self.features,
            (3, 3),
            strides=self.stride,
            padding=((1, 1), (1, 1)),  # torch padding=1 alignment at stride 2
            use_bias=use_bias,
            dtype=self.dtype,
            name="conv1",
        )(x)
        if self.norm == "BN":
            out1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, axis=-1)(
                out1
            )
        if act is not None:
            out1 = act(out1)
        out2 = nn.Conv(
            self.features,
            (3, 3),
            padding="SAME",
            use_bias=use_bias,
            dtype=self.dtype,
            name="conv2",
        )(out1)
        if self.norm == "BN":
            out2 = nn.BatchNorm(use_running_average=not train, momentum=0.9, axis=-1)(
                out2
            )
        out2 = out2 + x
        if act is not None:
            out2 = act(out2)
        return out2, out1
