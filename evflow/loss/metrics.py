"""Validation metrics: AEE, NEE, AAE, NAAE, AE_ofMeans, AAE_Weighted,
AAE_Filtered — plus window accumulators for visualization.

Behavioral reference: loss/flow.py:306-938. Each metric converts the
predicted flow to GT units (``flow * flow_scaling * dt_gt / dt_input``),
masks pixels without events or without valid ground truth, and reduces.

Replicated reference quirks (documented in SURVEY.md §6):
  * ``AAE`` computes ``cos = (|f||g|) / (dot + 0.01)`` — inverted w.r.t. the
    standard ratio used by NAAE (loss/flow.py:727). Kept for parity; the
    mathematically conventional form is available as ``AAE(strict=True)``.

Design: the math is in pure jitted functions over one association window
(``[B, H, W, ...]`` NHWC); the thin metric classes mirror the reference's
``event_flow_association``/``__call__``/``reset`` API for the eval loop and
accumulate error heatmaps host-side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from evflow.ops.iwe import get_interpolation, interpolate, lookup_event_flow

__all__ = [
    "aee",
    "nee",
    "aae",
    "naae",
    "ae_of_means",
    "aae_weighted",
    "aae_filtered",
    "AEE",
    "NEE",
    "AAE",
    "NAAE",
    "AEofMeans",
    "AAEWeighted",
    "AAEFiltered",
]


def _convert_flow(flow, flow_scaling, dt_gt, dt_input):
    """Map network output to GT displacement units (loss/flow.py:612-613)."""
    scale = flow_scaling * dt_gt / jnp.maximum(dt_input, 1e-9)
    return flow * scale.reshape((-1,) + (1,) * (flow.ndim - 1))


def _masks(gtflow, event_mask):
    """event-presence ∧ GT-validity mask (loss/flow.py:621-634)."""
    ev = event_mask > 0
    gt_zero = (gtflow[..., 0] == 0.0) & (gtflow[..., 1] == 0.0)
    return ev & (~gt_zero)


@partial(jax.jit, static_argnames=("flow_scaling",))
def aee(flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float):
    """Average endpoint error + 3px/5% outlier rate (loss/flow.py:597-648).

    Args: flow/gtflow ``[B, H, W, 2]``, event_mask ``[B, H, W]``,
    dt_gt/dt_input ``[B]``.
    Returns: (AEE[B], percent[B], error_map[B,H,W], mask[B,H,W]).
    """
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    error = jnp.sqrt(((f - gtflow) ** 2).sum(-1))
    flow_mag = jnp.sqrt((f**2).sum(-1))
    mask = _masks(gtflow, event_mask)
    B = flow.shape[0]
    m = mask.reshape(B, -1).astype(f.dtype)
    e = error.reshape(B, -1) * m
    mag = flow_mag.reshape(B, -1) * m
    n = m.sum(axis=1)
    val = e.sum(axis=1) / (n + 1e-9)
    outliers = (e > 3.0) & (e > 0.05 * mag)
    # per-slot outlier rate: the reference evaluates at B=1 where summing over
    # the whole batch is identical; at B>1 each slot streams a different file
    # and must not contaminate the others' per-file percents
    percent = outliers.sum(axis=1) / (n + 1e-9)
    return val, percent, error, mask.astype(f.dtype)


@partial(jax.jit, static_argnames=("flow_scaling",))
def nee(flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float):
    """Normalized endpoint error + >0.5 outlier rate (loss/flow.py:651-701)."""
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    f_norm = jnp.linalg.norm(f, axis=-1)
    g_norm = jnp.linalg.norm(gtflow, axis=-1)
    error = jnp.linalg.norm(f - gtflow, axis=-1) / (jnp.minimum(f_norm, g_norm) + 0.01)
    mask = _masks(gtflow, event_mask)
    B = flow.shape[0]
    m = mask.reshape(B, -1).astype(f.dtype)
    e = error.reshape(B, -1) * m
    n = m.sum(axis=1)
    val = e.sum(axis=1) / (n + 1e-9)
    percent = (e > 0.5).sum(axis=1) / (n + 1e-9)
    return val, percent, error, mask.astype(f.dtype)


@partial(jax.jit, static_argnames=("flow_scaling", "strict"))
def aae(flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float, strict: bool = False):
    """Average angular error (radians) + >30deg outlier rate
    (loss/flow.py:703-762).

    ``strict=False`` replicates the reference's inverted ratio
    ``(|f||g|)/(dot+0.01)``; ``strict=True`` uses ``dot/(|f||g|+1e-9)``.
    """
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    f_norm = jnp.linalg.norm(f, axis=-1)
    g_norm = jnp.linalg.norm(gtflow, axis=-1)
    dot = (f * gtflow).sum(-1)
    if strict:
        cos = dot / (f_norm * g_norm + 1e-9)
    else:
        cos = (f_norm * g_norm) / (dot + 0.01)
    cos = jnp.clip(cos, -1 + 1e-5, 1 - 1e-5)
    error = jnp.arccos(cos)
    mask = _masks(gtflow, event_mask)
    B = flow.shape[0]
    m = mask.reshape(B, -1).astype(f.dtype)
    e = error.reshape(B, -1) * m
    n = m.sum(axis=1)
    val = e.sum(axis=1) / (n + 1e-9)
    percent = (e > (np.pi / 6)).sum(axis=1) / (n + 1e-9)
    return val, percent, error, mask.astype(f.dtype)


@partial(jax.jit, static_argnames=("flow_scaling",))
def naae(flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float):
    """Angular error normalized by flow magnitude (loss/flow.py:764-819)."""
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    f_norm = jnp.linalg.norm(f, axis=-1)
    g_norm = jnp.linalg.norm(gtflow, axis=-1)
    dot = (f * gtflow).sum(-1)
    cos = jnp.clip(dot / (f_norm * g_norm + 1e-9), -1 + 1e-5, 1 - 1e-5)
    error = jnp.arccos(cos) / (f_norm + 1e-9)
    mask = _masks(gtflow, event_mask)
    B = flow.shape[0]
    m = mask.reshape(B, -1).astype(f.dtype)
    e = error.reshape(B, -1) * m
    val = e.sum(axis=1) / (m.sum(axis=1) + 1e-9)
    return val, error, mask.astype(f.dtype)


@partial(jax.jit, static_argnames=("flow_scaling",))
def ae_of_means(flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float):
    """Angle between the masked mean flow vectors (loss/flow.py:822-883)."""
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    mask = _masks(gtflow, event_mask).astype(f.dtype)[..., None]
    n = mask.sum(axis=(1, 2))  # [B, 1]
    mean_f = (f * mask).sum(axis=(1, 2)) / (n + 1e-9)
    mean_g = (gtflow * mask).sum(axis=(1, 2)) / (n + 1e-9)
    dot = (mean_f * mean_g).sum(-1)
    cos = dot / (
        jnp.linalg.norm(mean_f, axis=-1) * jnp.linalg.norm(mean_g, axis=-1) + 1e-9
    )
    return jnp.arccos(jnp.clip(cos, -1 + 1e-5, 1 - 1e-5))


@partial(jax.jit, static_argnames=("flow_scaling",))
def aae_weighted(flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float):
    """Magnitude-weighted angular error (loss/flow.py:885-909).

    Note the reference weights the *unmasked* error sum by the masked
    magnitude sum; replicated as-is."""
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    f_norm = jnp.linalg.norm(f, axis=-1)
    g_norm = jnp.linalg.norm(gtflow, axis=-1)
    dot = (f * gtflow).sum(-1)
    cos = jnp.clip(dot / (f_norm * g_norm + 1e-9), -1 + 1e-5, 1 - 1e-5)
    err = jnp.arccos(cos)
    mask = _masks(gtflow, event_mask).astype(f.dtype)
    B = flow.shape[0]
    weighted = (err * f_norm).reshape(B, -1)
    wsum = (f_norm * mask).reshape(B, -1).sum(axis=1)
    return weighted.sum(axis=1) / (wsum + 1e-9)


@partial(jax.jit, static_argnames=("flow_scaling", "mag_threshold"))
def aae_filtered(
    flow, gtflow, event_mask, dt_gt, dt_input, flow_scaling: float, mag_threshold: float = 0.5
):
    """Angular error over pixels with |flow| >= threshold (loss/flow.py:911-938)."""
    f = _convert_flow(flow, flow_scaling, dt_gt, dt_input)
    f_norm = jnp.linalg.norm(f, axis=-1)
    g_norm = jnp.linalg.norm(gtflow, axis=-1)
    dot = (f * gtflow).sum(-1)
    cos = jnp.clip(dot / (f_norm * g_norm + 1e-9), -1 + 1e-5, 1 - 1e-5)
    err = jnp.arccos(cos)
    mask = _masks(gtflow, event_mask) & (f_norm >= mag_threshold)
    B = flow.shape[0]
    m = mask.reshape(B, -1).astype(f.dtype)
    e = err.reshape(B, -1) * m
    return e.sum(axis=1) / (m.sum(axis=1) + 1e-9)


# ---------------------------------------------------------------------------
# window accumulators for visualization (loss/flow.py:454-487)
# ---------------------------------------------------------------------------

def compute_window_events(events, pol_mask, valid, res):
    """Unwarped per-polarity event count images (loss/flow.py:454-463)."""
    ys = jnp.floor(events[..., 1]).astype(jnp.int32)
    xs = jnp.floor(events[..., 2]).astype(jnp.int32)
    idx = jnp.clip(ys * res[1] + xs, 0, res[0] * res[1] - 1)
    w = valid.astype(events.dtype)
    pos = interpolate(idx, w, res, polarity_mask=pol_mask[..., 0])
    neg = interpolate(idx, w, res, polarity_mask=pol_mask[..., 1])
    return jnp.stack([pos, neg], axis=-1)


def compute_window_iwe(flow_map, events, pol_mask, valid, res, flow_scaling, tref, round_idx=True):
    """Forward IWE of the accumulated window (loss/flow.py:476-487)."""
    event_flow = lookup_event_flow(flow_map, events, res)
    idx, weights = get_interpolation(
        events, event_flow, tref, res, flow_scaling, round_idx=round_idx, valid=valid
    )
    pm = pol_mask if round_idx else jnp.tile(pol_mask, (1, 4, 1))
    pos = interpolate(idx, weights, res, polarity_mask=pm[..., 0])
    neg = interpolate(idx, weights, res, polarity_mask=pm[..., 1])
    return jnp.stack([pos, neg], axis=-1)


def compute_masked_window_flow(flow_maps, event_masks):
    """Event-weighted average of per-pass flow maps (loss/flow.py:465-474).

    flow_maps ``[P, B, H, W, 2]``, event_masks ``[P, B, H, W, 1]``.
    """
    num = (flow_maps * event_masks).sum(axis=0)
    den = event_masks.sum(axis=0) + 1e-9
    return num / den


# ---------------------------------------------------------------------------
# metric classes mirroring the reference eval API
# ---------------------------------------------------------------------------

class _BaseMetric:
    """Holds the latest association window and an aggregated error heatmap
    (loss/flow.py:306-594). Association keeps only the *last* flow map /
    event mask / GT (what AEE-family metrics actually read)."""

    has_percent = False

    def __init__(self, config, flow_scaling: float = 128):
        self.res = tuple(config["loader"]["resolution"])
        # heatmaps aggregate at full (std) resolution regardless of the
        # processing resolution (loss/flow.py:330: _std_resolution is the
        # heatmap resolution) — error maps computed at a pooled resolution
        # are nearest-upsampled before accumulation
        self.std_res = tuple(
            config["loader"].get("std_resolution", config["loader"]["resolution"])
        )
        self.flow_scaling = float(flow_scaling)
        self._reset_window()
        self._agg_error = None
        self._agg_count = None
        self._last_error_map = None

    def _reset_window(self):
        self._flow = None
        self._gtflow = None
        self._event_mask = None
        self._dt_input = None
        self._dt_gt = None
        self._passes = 0

    # -- reference API ----------------------------------------------------
    @property
    def num_events(self):
        return float("inf")

    def event_flow_association(self, flow_list, inputs):
        """flow_list: list of [B, H, W, 2]; inputs: dataloader dict with
        'gtflow' [B, H, W, 2], 'event_mask' [B, H, W, 1], 'dt_gt', 'dt_input'."""
        self._flow = flow_list[-1]
        self._gtflow = inputs.get("gtflow")
        self._event_mask = inputs["event_mask"][..., 0]
        self._dt_input = jnp.asarray(inputs["dt_input"], jnp.float32).reshape(-1)
        self._dt_gt = jnp.asarray(inputs["dt_gt"], jnp.float32).reshape(-1)
        self._passes += 1

    def overwrite_intermediate_flow(self, flow_list, event_mask=None):
        """Replace the association's flow with a refined estimate
        (loss/flow.py:409-433). The reference also collapses its
        accumulated per-pass event masks to their union; this class
        keeps only the latest window per association, so callers using
        the overwrite protocol pass the union mask (``[B, H, W, 1]``)
        explicitly — semantics pinned against the genuine reference in
        test_metric_overwrite_intermediate_direct."""
        self._flow = flow_list[-1]
        if event_mask is not None:
            self._event_mask = event_mask[..., 0]

    def reset(self, slots=None):
        """Full reset, or — given a boolean [B] slot array — clear only the
        rolled-over slots' association so sequence rollover at B>1 never
        touches live slots' windows (reference eval_flow.py:211-214 is B=1
        global; generalized per batch slot). Since association currently
        replaces the whole window each call, the slot form only matters if
        association ever accumulates across windows — it exists so that
        change cannot silently contaminate live slots."""
        if slots is None:
            self._reset_window()
            return
        if self._event_mask is None:
            return
        # a zeroed event mask removes the slot from every metric's reduction
        keep = ~np.asarray(slots, bool)
        self._event_mask = self._event_mask * jnp.asarray(
            keep, self._event_mask.dtype
        ).reshape((-1,) + (1,) * (self._event_mask.ndim - 1))

    def get_error_map(self, consume: bool = True):
        """Error map of the most recent metric evaluation. With ``consume``
        (default) the map is cleared on read so a cadence-gated metric
        (AEE every 1/window windows) never pairs a stale map with a later
        window's flow/events in stored visualizations."""
        if self._last_error_map is None:
            return None
        out = np.asarray(self._last_error_map)
        if consume:
            self._last_error_map = None
        return out

    # -- heatmaps (loss/flow.py:489-594) ----------------------------------
    def accumulate_error_heatmap(self, error_map, mask_map):
        e = np.asarray(error_map, np.float32) * np.asarray(mask_map, np.float32)
        c = np.asarray(mask_map, np.float32)
        self._merge_std(e.sum(axis=0), c.sum(axis=0))

    def merge_aggregated(self, err_sum, count_sum):
        """Fold already-accumulated (sum-of-masked-error, sum-of-mask) maps
        into the heatmap aggregate — the device-side accumulation path of
        ``evaluate(device_metrics=True)``, where whole chunks of windows
        accumulate on the chip and are merged host-side once."""
        self._merge_std(np.asarray(err_sum, np.float32),
                        np.asarray(count_sum, np.float32))

    def _merge_std(self, e, c):
        # accumulate at std_resolution: nearest-upsample pooled-resolution
        # error maps so the stored artifact matches the reference's full-res
        # heatmap (loss/flow.py:330 + eval_flow.py:164-173)
        sh, sw = self.std_res
        if e.shape != (sh, sw) and sh % e.shape[0] == 0 and sw % e.shape[1] == 0:
            fy, fx = sh // e.shape[0], sw // e.shape[1]
            if fy > 1 or fx > 1:
                e = np.repeat(np.repeat(e, fy, axis=0), fx, axis=1)
                c = np.repeat(np.repeat(c, fy, axis=0), fx, axis=1)
        if self._agg_error is None:
            self._agg_error, self._agg_count = e, c
        else:
            self._agg_error += e
            self._agg_count += c

    def get_final_error_heatmap(self):
        if self._agg_error is None:
            return None, None
        return self._agg_error / (self._agg_count + 1e-9), self._agg_count

    def save_error_heatmap(self, save_path, title="Error Heatmap", cmap="jet", **_):
        avg, count = self.get_final_error_heatmap()
        if avg is None:
            return False
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        vis = avg.copy()
        vis[count == 0] = np.nan
        valid = vis[count > 0]
        if valid.size:
            vis = np.clip(vis, None, np.quantile(valid, 0.95))
        fig, ax = plt.subplots(figsize=(12, 10))
        im = ax.imshow(vis, cmap=cmap, aspect="auto")
        ax.set_title(title)
        plt.colorbar(im, ax=ax, label="Average Error (clipped to P95)")
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return True

    def reset_error_heatmap(self):
        self._agg_error = None
        self._agg_count = None


class AEE(_BaseMetric):
    has_percent = True

    def __call__(self):
        val, pct, err, mask = aee(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling,
        )
        self._last_error_map = err
        self.accumulate_error_heatmap(err, mask)
        return val, pct


class NEE(_BaseMetric):
    has_percent = True

    def __call__(self):
        val, pct, err, mask = nee(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling,
        )
        self._last_error_map = err
        return val, pct


class AAE(_BaseMetric):
    has_percent = True

    def __init__(self, config, flow_scaling: float = 128, strict: bool = False):
        super().__init__(config, flow_scaling)
        self.strict = strict

    def __call__(self):
        val, pct, err, mask = aae(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling, self.strict,
        )
        self._last_error_map = err
        self.accumulate_error_heatmap(err, mask)
        return val, pct


class NAAE(_BaseMetric):
    def __call__(self):
        val, err, mask = naae(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling,
        )
        self._last_error_map = err
        self.accumulate_error_heatmap(err, mask)
        return val


class AEofMeans(_BaseMetric):
    def __call__(self):
        return ae_of_means(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling,
        )


class AAEWeighted(_BaseMetric):
    def __call__(self):
        return aae_weighted(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling,
        )


class AAEFiltered(_BaseMetric):
    def __init__(self, config, flow_scaling: float = 128, mag_threshold: float = 0.5):
        super().__init__(config, flow_scaling)
        self.mag_threshold = mag_threshold

    def __call__(self):
        return aae_filtered(
            self._flow, self._gtflow, self._event_mask, self._dt_gt, self._dt_input,
            self.flow_scaling, self.mag_threshold,
        )
