"""UNet family: recurrent + multi-resolution variants, spiking and ANN.

Behavioral reference: models/unet.py (BaseUNet :24-141, UNetRecurrent
:144-217, MultiResUNet :220-307, MultiResUNetRecurrent :310-411,
SpikingMultiResUNetRecurrent :414-461) and the composite spiking layers in
models/spiking_submodules.py (SpikingRecurrentConvLayer :303-346,
SpikingResidualBlock :349-385, SpikingUpsampleConvLayer :388-417).

Encoder channel plan (channel_multiplier m, base C, E encoders):
inputs ``[C, mC, ..]`` outputs ``[mC, m^2 C, ..]``; first encoder input is
``num_bins``. Decoders mirror with skip-concat (2× channels) plus the
previous multires prediction (+2 channels after the first decoder).

State is a flat tuple of ``LIFState`` (2 per encoder, 2 per resblock, 1 per
decoder), explicit in/out as everywhere else in evflow.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from evflow.models.ann import ConvLayer, RecurrentConvLayer, ResidualBlock, UpsampleConvLayer, upsample2x_bilinear
from evflow.models.cells import ConvLIF, ConvLIFRecurrent
from evflow.models.firenet import nonzero_normalize
from evflow.ops.lif import LIFState

__all__ = [
    "CropParameters",
    "skip_concat",
    "skip_sum",
    "SpikingRecurrentConvLayer",
    "SpikingResidualBlock",
    "SpikingUpsampleConvLayer",
    "SpikingTransposedConvLayer",
    "SpikingMultiResUNetRecurrent",
    "SpikingRecEVFlowNet",
    "UNetRecurrent",
    "MultiResUNet",
    "MultiResUNetRecurrent",
]


# ---------------------------------------------------------------------------
# pad/crop helpers (models/model_util.py:30-79)
# ---------------------------------------------------------------------------

def optimal_crop_size(max_size: int, max_subsample_factor: int, safety_margin: int = 0) -> int:
    crop = int(2**max_subsample_factor * math.ceil(max_size / 2**max_subsample_factor))
    return crop + safety_margin * 2**max_subsample_factor


class CropParameters:
    """Zero-pad input to a 2^E-divisible size; crop outputs back (NHWC)."""

    def __init__(self, width: int, height: int, num_encoders: int, safety_margin: int = 0):
        self.height, self.width = height, width
        self.height_crop = optimal_crop_size(height, num_encoders, safety_margin)
        self.width_crop = optimal_crop_size(width, num_encoders, safety_margin)
        self.pad_top = math.ceil(0.5 * (self.height_crop - height))
        self.pad_bottom = math.floor(0.5 * (self.height_crop - height))
        self.pad_left = math.ceil(0.5 * (self.width_crop - width))
        self.pad_right = math.floor(0.5 * (self.width_crop - width))
        cx, cy = self.width_crop // 2, self.height_crop // 2
        self.ix0 = cx - math.floor(width / 2)
        self.ix1 = cx + math.ceil(width / 2)
        self.iy0 = cy - math.floor(height / 2)
        self.iy1 = cy + math.ceil(height / 2)

    def pad(self, x: jax.Array) -> jax.Array:
        return jnp.pad(
            x,
            ((0, 0), (self.pad_top, self.pad_bottom), (self.pad_left, self.pad_right), (0, 0)),
        )

    def crop(self, x: jax.Array) -> jax.Array:
        return x[:, self.iy0 : self.iy1, self.ix0 : self.ix1, :]


def _pad_to(x1: jax.Array, x2: jax.Array) -> jax.Array:
    dy = x2.shape[1] - x1.shape[1]
    dx = x2.shape[2] - x1.shape[2]
    return jnp.pad(x1, ((0, 0), (dy // 2, dy - dy // 2), (dx // 2, dx - dx // 2), (0, 0)))


def skip_concat(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Channel concat with zero-pad alignment (model_util.py:14-19)."""
    return jnp.concatenate([_pad_to(x1, x2), x2], axis=-1)


def skip_sum(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Elementwise sum with zero-pad alignment (model_util.py:22-27)."""
    return _pad_to(x1, x2) + x2


# ---------------------------------------------------------------------------
# composite spiking layers
# ---------------------------------------------------------------------------

class SpikingRecurrentConvLayer(nn.Module):
    """Strided ConvLIF followed by ConvLIFRecurrent
    (spiking_submodules.py:303-346). Uses two state slots."""

    input_size: int
    features: int
    kernel_size: int = 3
    stride: int = 1
    activation_ff: str = "arctanspike"
    activation_rec: str = "arctanspike"
    cell_kwargs: dict = None  # leak/thresh/learn/reset options

    @nn.compact
    def __call__(self, x, states: Tuple[Optional[LIFState], Optional[LIFState]], train=False):
        kw = dict(self.cell_kwargs or {})
        x1, s_ff = ConvLIF(
            self.input_size,
            self.features,
            self.kernel_size,
            stride=self.stride,
            activation=self.activation_ff,
            name="conv",
            **kw,
        )(x, states[0], train=train)
        x2, s_rec = ConvLIFRecurrent(
            self.features,
            self.features,
            self.kernel_size,
            activation=self.activation_rec,
            name="recurrent_block",
            **kw,
        )(x1, states[1], train=train)
        return x2, (s_ff, s_rec)


class SpikingResidualBlock(nn.Module):
    """Two ConvLIFs with input spikes added to the second cell's output
    (spiking_submodules.py:349-385). Uses two state slots."""

    input_size: int
    features: int
    stride: int = 1
    activation: str = "arctanspike"
    cell_kwargs: dict = None

    @nn.compact
    def __call__(self, x, states: Tuple[Optional[LIFState], Optional[LIFState]], train=False):
        kw = dict(self.cell_kwargs or {})
        residual = x
        x1, s1 = ConvLIF(
            self.input_size,
            self.features,
            3,
            stride=self.stride,
            activation=self.activation,
            name="conv1",
            **kw,
        )(x, states[0], train=train)
        x2, s2 = ConvLIF(
            self.features,
            self.features,
            3,
            stride=1,
            activation=self.activation,
            name="conv2",
            **kw,
        )(x1, states[1], train=train, residual=residual)
        return x2, (s1, s2)


class SpikingTransposedConvLayer(nn.Module):
    """Transposed spiking decoder layer — unimplemented in the reference too
    (spiking_submodules.py:420-436 raises NotImplementedError)."""

    input_size: int = 0
    features: int = 0

    def __call__(self, *args, **kwargs):
        raise NotImplementedError(
            "SpikingTransposedConvLayer is not implemented (matches reference)"
        )


class SpikingUpsampleConvLayer(nn.Module):
    """Bilinear ×2 then ConvLIF (spiking_submodules.py:388-417)."""

    input_size: int
    features: int
    kernel_size: int = 3
    activation: str = "arctanspike"
    cell_kwargs: dict = None

    @nn.compact
    def __call__(self, x, state: Optional[LIFState], train=False):
        kw = dict(self.cell_kwargs or {})
        x_up = upsample2x_bilinear(x)
        return ConvLIF(
            self.input_size,
            self.features,
            self.kernel_size,
            activation=self.activation,
            name="conv2d",
            **kw,
        )(x_up, state, train=train)


# ---------------------------------------------------------------------------
# spiking multires recurrent UNet
# ---------------------------------------------------------------------------

class SpikingMultiResUNetRecurrent(nn.Module):
    """Spiking recurrent UNet with multi-resolution predictions
    (models/unet.py:414-461 with the channel plan of BaseUNet :79-141).
    """

    num_bins: int
    base_num_channels: int = 32
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    channel_multiplier: int = 2
    kernel_size: int = 3
    skip_type: str = "concat"
    activations: Tuple[str, str] = ("arctanspike", "arctanspike")
    final_activation: Optional[str] = "tanh"
    w_scale_pred: Optional[float] = 0.01
    cell_kwargs: dict = None

    @property
    def encoder_input_sizes(self):
        return [
            int(self.base_num_channels * self.channel_multiplier**i)
            for i in range(self.num_encoders)
        ]

    @property
    def encoder_output_sizes(self):
        return [
            int(self.base_num_channels * self.channel_multiplier ** (i + 1))
            for i in range(self.num_encoders)
        ]

    @property
    def num_states(self) -> int:
        # flat LIFState slots: 2/encoder + 2/resblock + 1/decoder
        return 2 * self.num_encoders + 2 * self.num_residual_blocks + self.num_encoders

    def init_states(self, batch: int, height: int, width: int):
        """Zero flat state tuple; (height, width) must be 2^E-divisible
        (use CropParameters otherwise)."""
        def zs(h, w, c):
            return LIFState(
                jnp.zeros((batch, h, w, c), jnp.float32),
                jnp.zeros((batch, h, w, c), jnp.float32),
            )

        states = []
        h, w = height, width
        outs = self.encoder_output_sizes
        for c in outs:
            h, w = h // 2, w // 2
            states += [zs(h, w, c), zs(h, w, c)]
        for _ in range(2 * self.num_residual_blocks):
            states.append(zs(h, w, outs[-1]))
        for c in reversed(self.encoder_input_sizes):
            h, w = h * 2, w * 2
            states.append(zs(h, w, c))
        return tuple(states)

    @nn.compact
    def __call__(self, x, states=None, train: bool = False):
        if states is None:
            states = (None,) * self.num_states
        states = list(states)
        new_states = list(states)
        skip = skip_concat if self.skip_type == "concat" else skip_sum
        act_ff, act_rec = self.activations
        kw = dict(self.cell_kwargs or {})

        in_sizes = self.encoder_input_sizes
        out_sizes = self.encoder_output_sizes

        # encoders
        blocks = []
        si = 0
        for i, (cin, cout) in enumerate(zip(in_sizes, out_sizes)):
            if i == 0:
                cin = self.num_bins
            x, (s0, s1) = SpikingRecurrentConvLayer(
                cin,
                cout,
                kernel_size=self.kernel_size,
                stride=2,
                activation_ff=act_ff,
                activation_rec=act_rec,
                cell_kwargs=kw,
                name=f"encoder{i}",
            )(x, (states[si], states[si + 1]), train=train)
            new_states[si], new_states[si + 1] = s0, s1
            si += 2
            blocks.append(x)

        # residual blocks
        cmax = out_sizes[-1]
        for i in range(self.num_residual_blocks):
            x, (s0, s1) = SpikingResidualBlock(
                cmax,
                cmax,
                activation=act_ff,
                cell_kwargs=kw,
                name=f"resblock{i}",
            )(x, (states[si], states[si + 1]), train=train)
            new_states[si], new_states[si + 1] = s0, s1
            si += 2

        # decoders + multires predictions
        predictions = []
        dec_in = list(reversed(out_sizes))
        dec_out = list(reversed(in_sizes))
        for i, (cin, cout) in enumerate(zip(dec_in, dec_out)):
            x = skip(x, blocks[self.num_encoders - i - 1])
            if i > 0:
                x = skip(predictions[-1], x)
            in_ch = (cin if self.skip_type == "sum" else 2 * cin) + (
                0 if i == 0 else self.num_output_channels
            )
            x, s = SpikingUpsampleConvLayer(
                in_ch,
                cout,
                kernel_size=self.kernel_size,
                activation=act_ff,
                cell_kwargs=kw,
                name=f"decoder{i}",
            )(x, states[si], train=train)
            new_states[si] = s
            si += 1
            predictions.append(
                ConvLayer(
                    self.num_output_channels,
                    kernel_size=1,
                    activation=self.final_activation,
                    w_scale=self.w_scale_pred,
                    name=f"pred{i}",
                )(x, train)
            )

        return predictions, tuple(new_states)


class SpikingRecEVFlowNet(nn.Module):
    """Spiking recurrent EV-FlowNet (models/model.py:723-858).

    Wraps the spiking multires UNet with input-encoding selection, optional
    nonzero normalization, pad/crop to a 2^4-divisible resolution, and
    nearest-upsampling of the multires flow maps to the finest scale.
    """

    num_bins: int = 2
    base_num_channels: int = 32
    kernel_size: int = 3
    encoding: str = "cnt"
    norm_input: bool = False
    mask_output: bool = True
    norm: Optional[str] = None
    use_upsample_conv: bool = True
    num_encoders: int = 4
    num_residual_blocks: int = 2
    leak: Tuple[float, float] = (-4.0, 0.1)
    thresh: Tuple[float, float] = (0.8, 0.0)
    learn_leak: bool = True
    learn_thresh: bool = True
    hard_reset: bool = True
    detach: bool = True

    def _unet_kwargs(self):
        return dict(
            num_bins=self.num_bins,
            base_num_channels=self.base_num_channels,
            num_encoders=self.num_encoders,
            num_residual_blocks=self.num_residual_blocks,
            kernel_size=self.kernel_size,
            cell_kwargs=dict(
                leak=self.leak,
                thresh=self.thresh,
                learn_leak=self.learn_leak,
                learn_thresh=self.learn_thresh,
                hard_reset=self.hard_reset,
                detach=self.detach,
                norm=self.norm,
            ),
        )

    @property
    def num_states(self):
        return 3 * self.num_encoders + 2 * self.num_residual_blocks

    @property
    def unit_names(self) -> Tuple[str, ...]:
        """Per-state-slot cell names in flat state order (2/encoder +
        2/resblock + 1/decoder) — the profiling/analysis analog of the
        FireNet family's unit_names (VoltageProfiler labels its rows by
        these; evflow/analysis.py)."""
        names = []
        for i in range(self.num_encoders):
            names += [f"enc{i}.conv", f"enc{i}.rec"]
        for i in range(self.num_residual_blocks):
            names += [f"res{i}.c1", f"res{i}.c2"]
        names += [f"dec{i}" for i in range(self.num_encoders)]
        return tuple(names)

    def init_states(self, batch: int, height: int, width: int):
        """Zero flat state tuple (shapes follow the encoder/decoder plan of
        SpikingMultiResUNetRecurrent.init_states, computed on the padded
        2^E-divisible resolution)."""
        crop = CropParameters(width, height, self.num_encoders)
        h, w = crop.height_crop, crop.width_crop
        C, m, E = self.base_num_channels, 2, self.num_encoders
        out_sizes = [int(C * m ** (i + 1)) for i in range(E)]
        in_sizes = [int(C * m**i) for i in range(E)]
        def zs(h, w, c):
            return LIFState(
                jnp.zeros((batch, h, w, c), jnp.float32),
                jnp.zeros((batch, h, w, c), jnp.float32),
            )

        states = []
        for c in out_sizes:
            h, w = h // 2, w // 2
            states += [zs(h, w, c), zs(h, w, c)]
        for _ in range(2 * self.num_residual_blocks):
            states.append(zs(h, w, out_sizes[-1]))
        for c in reversed(in_sizes):
            h, w = h * 2, w * 2
            states.append(zs(h, w, c))
        return tuple(states)

    @nn.compact
    def __call__(
        self,
        event_voxel,
        event_cnt,
        states=None,
        train: bool = False,
        timestep=None,
        log: bool = False,
    ):
        if self.encoding == "voxel":
            x = event_voxel
        elif self.encoding == "cnt" and self.num_bins == 2:
            x = event_cnt
        else:
            raise ValueError(f"Incorrect input encoding {self.encoding!r}")
        if self.norm_input:
            x = nonzero_normalize(x)

        B, H, W, _ = x.shape
        crop = CropParameters(W, H, self.num_encoders)
        x = crop.pad(x)

        predictions, new_states = SpikingMultiResUNetRecurrent(
            **self._unet_kwargs(), name="multires_unetrec"
        )(x, states, train=train)

        # upsample all scales to the finest prediction resolution
        # (models/model.py:840-850; torch F.interpolate default = nearest)
        fh, fw = predictions[-1].shape[1:3]
        flow_list = [
            jax.image.resize(p, (p.shape[0], fh, fw, p.shape[-1]), method="nearest")
            for p in predictions
        ]
        flow_list = [crop.crop(f) for f in flow_list]

        activity = None
        if log:
            activity = {"0:input": (x != 0).astype(jnp.float32).mean()}
        return {"flow": flow_list, "activity": activity}, new_states


# ---------------------------------------------------------------------------
# ANN UNets (models/unet.py:144-411) — completeness of the reference zoo
# ---------------------------------------------------------------------------

class UNetRecurrent(nn.Module):
    """ANN recurrent UNet (ConvLSTM encoders), single full-res output
    (models/unet.py:144-217)."""

    num_bins: int
    base_num_channels: int = 32
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 1
    channel_multiplier: int = 2
    kernel_size: int = 5
    skip_type: str = "concat"
    recurrent_block_type: str = "convlstm"
    norm: Optional[str] = None
    final_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, states=None, train: bool = False):
        E = self.num_encoders
        if states is None:
            states = (None,) * E
        new_states = list(states)
        skip = skip_concat if self.skip_type == "concat" else skip_sum
        in_sizes = [
            int(self.base_num_channels * self.channel_multiplier**i) for i in range(E)
        ]
        out_sizes = [
            int(self.base_num_channels * self.channel_multiplier ** (i + 1))
            for i in range(E)
        ]

        x = ConvLayer(self.base_num_channels, self.kernel_size, 1, name="head")(x, train)
        head = x
        blocks = []
        for i, cout in enumerate(out_sizes):
            x, s = RecurrentConvLayer(
                cout,
                self.kernel_size,
                stride=2,
                recurrent_block_type=self.recurrent_block_type,
                norm=self.norm,
                name=f"encoder{i}",
            )(x, states[i], train=train)
            new_states[i] = s
            blocks.append(x)
        for i in range(self.num_residual_blocks):
            x, _ = ResidualBlock(out_sizes[-1], norm=self.norm, name=f"resblock{i}")(
                x, train
            )
        for i, cout in enumerate(reversed(in_sizes)):
            x = UpsampleConvLayer(
                cout, self.kernel_size, norm=self.norm, name=f"decoder{i}"
            )(skip(x, blocks[E - i - 1]), train)
        img = ConvLayer(
            self.num_output_channels,
            1,
            activation=self.final_activation,
            name="pred",
        )(skip(x, head), train)
        return img, tuple(new_states)


class MultiResUNet(nn.Module):
    """ANN (non-recurrent) UNet with multires predictions
    (models/unet.py:220-307)."""

    num_bins: int
    base_num_channels: int = 32
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    channel_multiplier: int = 2
    kernel_size: int = 3
    skip_type: str = "concat"
    norm: Optional[str] = None
    final_activation: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        E = self.num_encoders
        skip = skip_concat if self.skip_type == "concat" else skip_sum
        in_sizes = [
            int(self.base_num_channels * self.channel_multiplier**i) for i in range(E)
        ]
        out_sizes = [
            int(self.base_num_channels * self.channel_multiplier ** (i + 1))
            for i in range(E)
        ]
        blocks = []
        for i, cout in enumerate(out_sizes):
            x = ConvLayer(
                cout, self.kernel_size, 2, norm=self.norm, name=f"encoder{i}"
            )(x, train)
            blocks.append(x)
        for i in range(self.num_residual_blocks):
            x, _ = ResidualBlock(out_sizes[-1], norm=self.norm, name=f"resblock{i}")(
                x, train
            )
        predictions = []
        for i, cout in enumerate(reversed(in_sizes)):
            x = skip(x, blocks[E - i - 1])
            if i > 0:
                x = skip(predictions[-1], x)
            x = UpsampleConvLayer(
                cout, self.kernel_size, norm=self.norm, name=f"decoder{i}"
            )(x, train)
            predictions.append(
                ConvLayer(
                    self.num_output_channels,
                    1,
                    activation=self.final_activation,
                    name=f"pred{i}",
                )(x, train)
            )
        return predictions


class MultiResUNetRecurrent(nn.Module):
    """ANN recurrent UNet with multires predictions (models/unet.py:310-411)."""

    num_bins: int
    base_num_channels: int = 32
    num_encoders: int = 4
    num_residual_blocks: int = 2
    num_output_channels: int = 2
    channel_multiplier: int = 2
    kernel_size: int = 3
    skip_type: str = "concat"
    recurrent_block_type: str = "convlstm"
    norm: Optional[str] = None
    final_activation: Optional[str] = "tanh"

    @nn.compact
    def __call__(self, x, states=None, train: bool = False):
        E = self.num_encoders
        if states is None:
            states = (None,) * E
        new_states = list(states)
        skip = skip_concat if self.skip_type == "concat" else skip_sum
        in_sizes = [
            int(self.base_num_channels * self.channel_multiplier**i) for i in range(E)
        ]
        out_sizes = [
            int(self.base_num_channels * self.channel_multiplier ** (i + 1))
            for i in range(E)
        ]

        blocks = []
        for i, cout in enumerate(out_sizes):
            x, s = RecurrentConvLayer(
                cout,
                self.kernel_size,
                stride=2,
                recurrent_block_type=self.recurrent_block_type,
                norm=self.norm,
                name=f"encoder{i}",
            )(x, states[i], train=train)
            new_states[i] = s
            blocks.append(x)
        for i in range(self.num_residual_blocks):
            x, _ = ResidualBlock(out_sizes[-1], norm=self.norm, name=f"resblock{i}")(
                x, train
            )
        predictions = []
        for i, cout in enumerate(reversed(in_sizes)):
            x = skip(x, blocks[E - i - 1])
            if i > 0:
                x = skip(predictions[-1], x)
            x = UpsampleConvLayer(
                cout, self.kernel_size, norm=self.norm, name=f"decoder{i}"
            )(x, train)
            predictions.append(
                ConvLayer(
                    self.num_output_channels,
                    1,
                    activation=self.final_activation,
                    name=f"pred{i}",
                )(x, train)
            )
        return predictions, tuple(new_states)
