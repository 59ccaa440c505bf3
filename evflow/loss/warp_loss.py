"""Self-supervised contrast-maximization training loss (EventWarping).

Behavioral reference: loss/flow.py:28-303. The loss warps every event in a
TBPTT window forward (tref = num_passes) and backward (tref = 0) using the
flow predicted at the pass the event arrived in, builds per-polarity images
of averaged timestamps, and penalizes their squared magnitude (scaled by the
number of active pixels), plus a Charbonnier smoothness term over spatial and
temporal flow differences.

TPU-first redesign: the reference accumulates python lists across forward
passes and concatenates tensors of growing size; here the whole loss window
is a static ``[P, ...]`` stack (P = window_loss / window passes) produced by
``jax.lax.scan`` over the model step, and the loss is a single pure function
— one compilation, no dynamic shapes, padded events carried with a validity
mask.

Conventions: events ``[P, B, N, 4]`` (ts, y, x, p) with per-window ts in
[0, 1] (the pass offset ``+p`` of loss/flow.py:92 is applied internally);
flow maps ``[P, B, H, W, 2]`` channels (x, y).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from evflow.ops.iwe import get_interpolation, interpolate_multi, lookup_event_flow

__all__ = ["event_warping_loss", "EventWarpingConfig"]


def _charbonnier(x: jax.Array) -> jax.Array:
    return jnp.sqrt(x * x + 1e-6)


def _timestamp_loss_one_direction(
    events: jax.Array,  # [B, M, 4] with offset ts
    event_flow: jax.Array,  # [B, M, 2]
    pol_mask: jax.Array,  # [B, M, 2]
    valid: jax.Array,  # [B, M]
    tref: float,
    ts_img_weights: jax.Array,  # [B, M] timestamps used in the ts image
    max_ts: float,
    res: Sequence[int],
    flow_scaling: float,
    loss_scaling: bool,
) -> jax.Array:
    idx, weights = get_interpolation(
        events, event_flow, tref, res, flow_scaling, round_idx=False, valid=valid
    )
    pol4 = jnp.tile(pol_mask, (1, 4, 1))
    ts4 = jnp.tile(ts_img_weights, (1, 4))

    # all four direction images share the warp's index set — ONE 4-channel
    # scatter instead of four (TPU scatters are index-bound: measured
    # 1.8x fwd / 1.6x grad, benchmarks/probe_scatter_multi.py; this is the
    # train step's dominant term, profile_train.py round 7)
    imgs = interpolate_multi(
        idx,
        jnp.stack(
            [
                weights * pol4[..., 0],
                weights * pol4[..., 1],
                weights * ts4 * pol4[..., 0],
                weights * ts4 * pol4[..., 1],
            ],
            axis=-1,
        ),
        res,
    )
    iwe_pos, iwe_neg = imgs[..., 0], imgs[..., 1]
    iwe_pos_ts, iwe_neg_ts = imgs[..., 2], imgs[..., 3]

    iwe_pos_ts = iwe_pos_ts / (iwe_pos + 1e-9) / max_ts
    iwe_neg_ts = iwe_neg_ts / (iwe_neg + 1e-9) / max_ts

    B = events.shape[0]
    loss = (iwe_pos_ts**2).reshape(B, -1).sum(axis=1) + (iwe_neg_ts**2).reshape(
        B, -1
    ).sum(axis=1)
    if loss_scaling:
        nonzero_px = ((iwe_pos + iwe_neg) > 0).astype(loss.dtype).reshape(B, -1)
        loss = loss / jnp.maximum(nonzero_px.sum(axis=1), 1.0)
    return loss.sum()


def _smoothness(
    flow_x: jax.Array,  # [B, P, H, W]
    flow_y: jax.Array,
    event_mask: Optional[jax.Array],  # [B, P, H, W] or None
    include_dt: bool,
) -> jax.Array:
    """Charbonnier smoothness over dx/dy/two diagonals (+ dt across passes),
    loss/flow.py:264-297. Note the reference sums the x and y *differences*
    before squaring."""

    def d(a, sl1, sl2):
        return a[..., sl1[0], sl1[1]] - a[..., sl2[0], sl2[1]]

    s = jnp.index_exp
    pairs = [
        (s[:, :-1], s[:, 1:]),  # dx (along W)
        (s[:-1, :], s[1:, :]),  # dy (along H)
        (s[:-1, :-1], s[1:, 1:]),  # diag down-right
        (s[1:, :-1], s[:-1, 1:]),  # diag up-right
    ]
    total = 0.0
    components = 4
    for sl1, sl2 in pairs:
        diff = _charbonnier(d(flow_x, sl1, sl2) + d(flow_y, sl1, sl2))
        if event_mask is not None:
            m = event_mask[..., sl1[0], sl1[1]] * event_mask[..., sl2[0], sl2[1]]
            diff = diff * m
        total = total + diff.sum()
    if include_dt:
        # reference parity: the dt component counts toward the divisor
        # whenever overwrite_intermediate is off, even for a single-pass
        # window where its sum is empty/zero (loss/flow.py:290-295)
        components += 1
        if flow_x.shape[1] > 1:
            diff = _charbonnier(
                (flow_x[:, :-1] - flow_x[:, 1:]) + (flow_y[:, :-1] - flow_y[:, 1:])
            )
            if event_mask is not None:
                diff = diff * (event_mask[:, :-1] * event_mask[:, 1:])
            total = total + diff.sum()
    total = total / components
    total = total / flow_x.shape[1]  # /= number of passes (flow_dx.shape[1])
    return total


def event_warping_loss(
    flow_maps: Sequence[jax.Array],  # per scale: [P, B, H, W, 2]
    events: jax.Array,  # [P, B, N, 4], ts in [0, 1] per window
    pol_mask: jax.Array,  # [P, B, N, 2]
    event_mask: jax.Array,  # [P, B, H, W, 1]
    valid: jax.Array,  # [P, B, N]
    *,
    flow_scaling: float,
    smoothness_weight: float,
    res: Optional[Sequence[int]] = None,
    smoothing_mask: bool = False,
    overwrite_intermediate: bool = False,
    loss_scaling: bool = True,
) -> jax.Array:
    """Total contrast-maximization loss over a TBPTT window.

    Mirrors loss/flow.py:178-303 with event_flow_association folded in:
    per-event flow comes from the pass' own flow map (or, when
    ``overwrite_intermediate``, from the final pass' map for all events).
    """
    P, B, N, _ = events.shape
    if res is None:
        res = flow_maps[0].shape[2:4]
    max_ts = float(P)

    # offset each pass' timestamps by its index (loss/flow.py:92)
    offsets = jnp.arange(P, dtype=events.dtype)[:, None, None]
    ts_off = events[..., 0] + offsets
    events_off = jnp.concatenate([ts_off[..., None], events[..., 1:]], axis=-1)

    # flatten passes into one big event list [B, P*N, ...]
    def flat(x):
        return jnp.moveaxis(x, 0, 1).reshape((B, P * N) + x.shape[3:])

    events_all = flat(events_off)
    pol_all = flat(pol_mask)
    valid_all = flat(valid)

    total = 0.0
    for flow_seq in flow_maps:
        if overwrite_intermediate:
            final_map = flow_seq[-1]  # [B, H, W, 2]
            event_flow = lookup_event_flow(final_map, events_all, res)
            flow_x = jnp.moveaxis(flow_seq[-1:, ..., 0], 0, 1)
            flow_y = jnp.moveaxis(flow_seq[-1:, ..., 1], 0, 1)
            mask_seq = jnp.max(event_mask[..., 0], axis=0, keepdims=True)
            mask_seq = jnp.moveaxis(mask_seq, 0, 1)
            include_dt = False
        else:
            per_pass_flow = jax.vmap(lookup_event_flow, in_axes=(0, 0, None))(
                flow_seq, events_off, res
            )  # [P, B, N, 2]
            event_flow = flat(per_pass_flow)
            flow_x = jnp.moveaxis(flow_seq[..., 0], 0, 1)  # [B, P, H, W]
            flow_y = jnp.moveaxis(flow_seq[..., 1], 0, 1)
            mask_seq = jnp.moveaxis(event_mask[..., 0], 0, 1)
            include_dt = True

        fw = _timestamp_loss_one_direction(
            events_all, event_flow, pol_all, valid_all,
            tref=max_ts, ts_img_weights=events_all[..., 0],
            max_ts=max_ts, res=res, flow_scaling=flow_scaling,
            loss_scaling=loss_scaling,
        )
        bw = _timestamp_loss_one_direction(
            events_all, event_flow, pol_all, valid_all,
            tref=0.0, ts_img_weights=max_ts - events_all[..., 0],
            max_ts=max_ts, res=res, flow_scaling=flow_scaling,
            loss_scaling=loss_scaling,
        )
        smooth = _smoothness(
            flow_x, flow_y, mask_seq if smoothing_mask else None, include_dt
        )
        total = total + fw + bw + smoothness_weight * smooth

    return total / len(flow_maps)


class EventWarpingConfig:
    """Config adapter mirroring EventWarping.__init__ (loss/flow.py:38-56)."""

    def __init__(self, config, flow_scaling: Optional[float] = None, loss_scaling: bool = True):
        self.res = tuple(config["loader"]["resolution"])
        self.flow_scaling = (
            flow_scaling if flow_scaling is not None else max(self.res)
        )
        self.weight = config["loss"]["flow_regul_weight"]
        self.smoothing_mask = bool(config.get("model", {}).get("mask_output", False))
        self.overwrite_intermediate = bool(
            config.get("loss", {}).get("overwrite_intermediate", False)
        )
        self.loss_scaling = loss_scaling

    def __call__(self, flow_maps, events, pol_mask, event_mask, valid):
        return event_warping_loss(
            flow_maps,
            events,
            pol_mask,
            event_mask,
            valid,
            flow_scaling=self.flow_scaling,
            smoothness_weight=self.weight,
            res=self.res,
            smoothing_mask=self.smoothing_mask,
            overwrite_intermediate=self.overwrite_intermediate,
            loss_scaling=self.loss_scaling,
        )
