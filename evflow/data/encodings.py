"""Event-stream encodings: count images, voxel grids, masks, hot-pixel filter.

Behavioral reference: dataloader/encodings.py (events_to_image :30-45,
events_to_voxel :48-67, events_to_channels :70-85, get_hot_event_mask
:88-103) and the encoding builders in dataloader/base.py:161-256.

Two implementations are provided:
  * ``jnp_*`` — jit-able XLA scatter-adds over padded event arrays with a
    validity mask (device path; used by the fused ingest step and tests);
  * ``np_*`` — plain numpy for the host-side streaming dataloader (the
    reference computes encodings on host; so do we, overlapped with device
    compute through the prefetching pipeline).

All image-like outputs are channels-last ``[H, W, C]`` (TPU-friendly NHWC),
vs. the reference's ``[C, H, W]``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "np_events_to_image",
    "np_events_to_voxel",
    "np_events_to_channels",
    "np_events_to_mask",
    "np_polarity_mask",
    "np_hot_event_mask",
    "jnp_events_to_image",
    "jnp_events_to_voxel",
    "jnp_events_to_channels",
    "jnp_events_to_mask",
    "jnp_polarity_mask",
]


# ---------------------------------------------------------------------------
# host (numpy) implementations
# ---------------------------------------------------------------------------

def np_events_to_image(
    xs: np.ndarray,
    ys: np.ndarray,
    ps: np.ndarray,
    sensor_size: Sequence[int],
    accumulate: bool = True,
) -> np.ndarray:
    """Scatter events into an [H, W] image. dataloader/encodings.py:30-45.

    ``accumulate=False`` reproduces torch ``index_put_(accumulate=False)``:
    the value written last wins (used for the binary event mask).
    """
    img = np.zeros(tuple(sensor_size), dtype=np.float32)
    xi = xs.astype(np.int64)
    yi = ys.astype(np.int64)
    if accumulate:
        np.add.at(img, (yi, xi), ps.astype(np.float32))
    else:
        img[yi, xi] = ps.astype(np.float32)
    return img


def np_events_to_voxel(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    num_bins: int,
    sensor_size: Sequence[int],
    round_ts: bool = False,
) -> np.ndarray:
    """Temporal-bilinear voxel grid, [H, W, num_bins].

    dataloader/encodings.py:48-67: ts scaled by (num_bins - 1); per-bin weight
    max(0, 1 - |ts - b|); events splat with polarity sign.
    """
    tb = ts.astype(np.float32) * (num_bins - 1)
    if round_ts:
        tb = np.round(tb)
    bins = []
    for b in range(num_bins):
        weights = np.maximum(0.0, 1.0 - np.abs(tb - b))
        bins.append(np_events_to_image(xs, ys, ps * weights, sensor_size))
    return np.stack(bins, axis=-1)


def np_events_to_channels(
    xs: np.ndarray, ys: np.ndarray, ps: np.ndarray, sensor_size: Sequence[int]
) -> np.ndarray:
    """Two-channel per-polarity count image, [H, W, 2].

    dataloader/encodings.py:70-85: channel 0 accumulates ps*1[ps>0] (positive
    counts), channel 1 accumulates ps*(-1[ps<0]) i.e. |negative| counts...
    note the reference computes ps * mask with mask = ps clamped, giving
    ps^2-weighted counts only when |ps| != 1; with ps in {-1, +1} both
    channels are plain counts (ps*ps = 1).
    """
    pos = np_events_to_image(xs, ys, ps * np.where(ps > 0, ps, 0.0), sensor_size)
    neg = np_events_to_image(xs, ys, ps * np.where(ps < 0, ps, 0.0), sensor_size)
    return np.stack([pos, neg], axis=-1)


def np_events_to_mask(
    xs: np.ndarray, ys: np.ndarray, ps: np.ndarray, sensor_size: Sequence[int]
) -> np.ndarray:
    """Binary event-presence mask, [H, W, 1]. dataloader/base.py:172-184."""
    mask = np_events_to_image(xs, ys, np.abs(ps), sensor_size, accumulate=False)
    return mask[..., None]


def np_polarity_mask(ps: np.ndarray) -> np.ndarray:
    """[N, 2] (pos, neg) polarity indicator. dataloader/base.py:223-235."""
    pos = np.where(ps > 0, ps, 0.0)
    neg = -np.where(ps < 0, ps, 0.0)
    return np.stack([pos, neg], axis=-1).astype(np.float32)


def np_hot_event_mask(
    event_rate: np.ndarray,
    idx: int,
    max_px: int = 100,
    min_obvs: int = 5,
    max_rate: float = 0.8,
) -> np.ndarray:
    """Binary mask zeroing up to ``max_px`` hottest pixels above ``max_rate``.

    dataloader/encodings.py:88-103. Mutates ``event_rate`` in place like the
    reference (caller owns a scratch copy).
    """
    mask = np.ones_like(event_rate, dtype=np.float32)
    if idx > min_obvs:
        for _ in range(max_px):
            flat = int(np.argmax(event_rate))
            yx = np.unravel_index(flat, event_rate.shape)
            if event_rate[yx] > max_rate:
                event_rate[yx] = 0.0
                mask[yx] = 0.0
            else:
                break
    return mask


# ---------------------------------------------------------------------------
# device (jax) implementations — padded events + validity mask
# ---------------------------------------------------------------------------

def _scatter_image(
    xs: jax.Array,
    ys: jax.Array,
    vals: jax.Array,
    sensor_size: Sequence[int],
) -> jax.Array:
    H, W = int(sensor_size[0]), int(sensor_size[1])
    lin = jnp.clip(
        ys.astype(jnp.int32) * W + xs.astype(jnp.int32), 0, H * W - 1
    )
    img = jnp.zeros((H * W,), dtype=vals.dtype).at[lin].add(vals)
    return img.reshape(H, W)


def jnp_events_to_image(
    xs: jax.Array,
    ys: jax.Array,
    ps: jax.Array,
    sensor_size: Sequence[int],
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Accumulating scatter image with optional padding mask."""
    vals = ps if valid is None else ps * valid
    return _scatter_image(xs, ys, vals, sensor_size)


def jnp_events_to_voxel(
    xs: jax.Array,
    ys: jax.Array,
    ts: jax.Array,
    ps: jax.Array,
    num_bins: int,
    sensor_size: Sequence[int],
    round_ts: bool = False,
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Voxel grid [H, W, num_bins]; one fused scatter over (pixel, bin)."""
    H, W = int(sensor_size[0]), int(sensor_size[1])
    tb = ts * (num_bins - 1)
    if round_ts:
        tb = jnp.round(tb)
    v = ps if valid is None else ps * valid
    # weights per bin: [num_bins, N]
    b_idx = jnp.arange(num_bins, dtype=tb.dtype)[:, None]
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(tb[None, :] - b_idx)) * v[None, :]
    lin = jnp.clip(ys.astype(jnp.int32) * W + xs.astype(jnp.int32), 0, H * W - 1)
    # scatter into [num_bins, H*W] in one shot with flattened indices
    full = b_idx.astype(jnp.int32) * (H * W) + lin[None, :]
    flat = (
        jnp.zeros((num_bins * H * W,), dtype=weights.dtype)
        .at[full.reshape(-1)]
        .add(weights.reshape(-1))
    )
    return flat.reshape(num_bins, H, W).transpose(1, 2, 0)


def jnp_events_to_channels(
    xs: jax.Array,
    ys: jax.Array,
    ps: jax.Array,
    sensor_size: Sequence[int],
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Per-polarity count image [H, W, 2]."""
    v = jnp.ones_like(ps) if valid is None else valid.astype(ps.dtype)
    pos = _scatter_image(xs, ys, jnp.where(ps > 0, ps * ps, 0.0) * v, sensor_size)
    neg = _scatter_image(xs, ys, jnp.where(ps < 0, ps * ps, 0.0) * v, sensor_size)
    return jnp.stack([pos, neg], axis=-1)


def jnp_events_to_mask(
    xs: jax.Array,
    ys: jax.Array,
    ps: jax.Array,
    sensor_size: Sequence[int],
    valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Binary presence mask [H, W, 1] (scatter-max of |p|)."""
    H, W = int(sensor_size[0]), int(sensor_size[1])
    v = jnp.abs(ps) if valid is None else jnp.abs(ps) * valid
    lin = jnp.clip(ys.astype(jnp.int32) * W + xs.astype(jnp.int32), 0, H * W - 1)
    img = jnp.zeros((H * W,), dtype=v.dtype).at[lin].max(v)
    return img.reshape(H, W)[..., None]


def jnp_polarity_mask(ps: jax.Array, valid: Optional[jax.Array] = None) -> jax.Array:
    """[N, 2] (pos, neg) indicator with padding zeroed."""
    pos = jnp.where(ps > 0, ps, 0.0)
    neg = -jnp.where(ps < 0, ps, 0.0)
    out = jnp.stack([pos, neg], axis=-1)
    if valid is not None:
        out = out * valid[..., None]
    return out
