"""Self-supervised training loop: scan-based TBPTT under jit, data-parallel
over a device mesh.

Behavioral reference: train_flow.py:29-326. Loop semantics preserved:
  * accumulate windows until ``window_loss`` events then backprop — here the
    pass count P = window_loss // window is static, the whole loss window is
    one jitted step: ``lax.scan`` over P model steps, EventWarping loss over
    the stacked flows, one Adam update with global-norm clipping;
  * membrane/spike carries persist across loss windows (values only — the
    jit boundary is the TBPTT truncation, matching ``detach_states()`` at
    train_flow.py:278);
  * on sequence rollover: discard the partial window, reset carries and
    start accumulating fresh (train_flow.py:114-119 resets globally);
  * epoch bookkeeping driven by ``seq_num >= len(files)``
    (train_flow.py:121), 3-policy checkpoints, loss-variance tracking over a
    50-step window, patience-50 early stop;
  * threshold params are projected to >= 0.01 after each update (the
    functional analog of the reference's in-place ``clamp_`` at every
    forward, SNNtorch_spiking_submodules.py:284).

TPU notes: batches are sharded on the batch axis over a 1-D ``data`` mesh;
params/opt-state replicated; the summed loss makes GSPMD insert the gradient
all-reduce over ICI. Host streaming/encoding overlaps device compute via the
Prefetcher.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from evflow import registry
from evflow.data.h5_stream import H5EventStream, Prefetcher
from evflow.loss.warp_loss import EventWarpingConfig
from evflow.utils.checkpoint import CheckpointPolicy, load_checkpoint
from evflow.utils.tracker import Run, grad_stats, save_csv

__all__ = ["train", "make_train_step", "stack_window", "clamp_thresholds",
           "restore_window", "compact_window"]


def clamp_thresholds(params):
    """Project threshold parameters to >= 0.01 (reference clamp_ semantics)."""

    def fix(path, v):
        leaf = str(getattr(path[-1], "key", path[-1]))
        if leaf in ("threshold", "thresh"):
            return jnp.maximum(v, 0.01)
        return v

    return jax.tree_util.tree_map_with_path(fix, params)


def stack_window(batches: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Stack P host batches into [P, ...] arrays, padding event lists to a
    common static N."""
    n_max = max(b["event_list"].shape[1] for b in batches)
    out: Dict[str, np.ndarray] = {}
    P_ = len(batches)
    B = batches[0]["event_list"].shape[0]
    el = np.zeros((P_, B, n_max, 4), np.float32)
    pm = np.zeros((P_, B, n_max, 2), np.float32)
    va = np.zeros((P_, B, n_max), np.float32)
    for p, b in enumerate(batches):
        n = b["event_list"].shape[1]
        el[p, :, :n] = b["event_list"]
        pm[p, :, :n] = b["event_list_pol_mask"]
        va[p, :, :n] = b["event_valid"]
    out["event_list"] = el
    out["event_list_pol_mask"] = pm
    out["event_valid"] = va
    for key in ("event_cnt", "event_voxel", "event_mask"):
        out[key] = np.stack([b[key] for b in batches])
    if "hot_mask" in batches[0]:
        out["hot_mask"] = np.stack([b["hot_mask"] for b in batches])
    return out


def compact_window(window: Dict[str, np.ndarray], encoding: str,
                   exact_ints: bool = True,
                   derive_mask: bool = False,
                   cnt_dtype: Optional[type] = None,
                   derive_cnt: bool = False,
                   derive_voxel: bool = False,
                   coords_dtype: Optional[type] = None,
                   pol_bits: bool = False) -> Dict[str, Any]:
    """Shrink the host->device wire for one TBPTT window.

    The model reads exactly one encoding (models/model.py:146-161), so the
    other is dropped (None is pytree-empty and uploads nothing), and masks /
    counts travel as uint8/float16 — the jitted step casts back to f32, so
    numerics are unchanged (counts and masks are exactly representable).
    Event coordinates/timestamps stay f32. This roughly halves bytes on the
    host→device link, which dominates train wall-clock on latency- or
    bandwidth-bound interconnects.

    ``exact_ints=False`` (downsample pooling active: resolution <
    std_resolution makes counts/masks fractional in (0,1)) keeps the
    narrow-dtype casts off — a uint8 cast would truncate pooled masks to 0
    and silently disable the smoothness mask.

    ``derive_mask=True`` drops ``event_mask`` from the wire entirely and the
    jitted step recomputes it as ``cnt.sum(-1) > 0`` — EXACTLY the loader's
    mask for the plain cnt encoding (np_events_to_mask is the binary event
    indicator, and the hot filter / flips apply identically to counts and
    mask, h5_stream.py _slot_finish). Only the train loop sets this, and
    only when the loader guarantee holds (cnt encoding, no pooling, no
    signed temporal_cnt); arbitrary caller-constructed masks ride the wire.

    ``derive_cnt=True`` (implies ``derive_mask``'s guarantees) drops the
    count grids too: for the plain cnt encoding ``event_cnt`` IS the
    per-polarity histogram of the event list (np_events_to_channels ==
    scatter-add of the (pos, |neg|) polarity-mask columns at integer
    (y, x)) times the hot-pixel mask — the list already carries
    augmentation flips and the per-window ts norm, the loader never
    truncates it (bucket pad >= n_max), and the hot filter zeroes count
    PIXELS without dropping list events (h5_stream._slot_finish), so the
    jitted step rebuilds counts exactly with one multi-channel flat-index
    scatter (the measured-optimal scatter family on TPU, BENCH_NOTES
    round 7) and only the packed hot-mask bits ride the wire (W/8
    bytes/row vs 2·H·W count bytes: the count grids are ~2/3 of the
    remaining train wire). Gated off for pooled, voxel and temporal_cnt
    configs, where counts are not a plain histogram.

    ``derive_voxel=True`` is the voxel-family analog: ``event_voxel`` IS
    the temporal-bilinear splat of the event list (np_events_to_voxel:
    per-bin weight max(0, 1-|ts·(num_bins-1) - b|), signed by polarity)
    times the hot mask, so the step rebuilds it with the same
    multi-channel flat-index scatter (num_bins channels) and derives
    ``event_mask`` from the exact per-polarity histogram. One caveat vs
    derive_cnt's bit-exactness: voxel contributions are FRACTIONAL, so
    the per-pixel sum depends on scatter accumulation order — the device
    result is deterministic but may differ from the host encoder at f32
    rounding level (~1e-7 relative; weights themselves are computed by
    the identical f32 expressions). Gated off for pooled configs.

    ``coords_dtype=np.uint16`` ships the (y, x) columns as uint16 — exact
    only when every coordinate is a non-negative integer < 65536, which the
    train loop verifies per window and manages STICKY (flips to f32
    permanently on the first window with fractional coords, e.g. under
    downsample pooling's coordinate rescale: one retrace, never flaps).
    ``pol_bits=True`` replaces the [.., 2] polarity mask with one packed
    bit per event — exact when the mask is one-hot on valid rows (always,
    for loader windows: ps ∈ {-1, +1} after the ±1 normalization), also
    verified per window by the loop. When ``coords_dtype`` is given the
    valid mask also compresses to per-(pass, slot) lengths: it is a prefix
    mask by construction (next_batch / stack_window fill [:n] then
    zero-pad; asserted here). After these the
    per-event wire is ts f32 (the only fundamentally fractional column:
    per-window min-max normalized) + 4 coordinate bytes + 1 polarity bit —
    the payload itself, modulo entropy coding.
    """
    w: Dict[str, Any] = dict(window)
    hot = w.pop("hot_mask", None)  # host-side artifact; never rides as-is
    if encoding == "voxel":
        w["event_cnt"] = None
    else:
        w["event_voxel"] = None
    # the polarity column never rides the wire: pol_mask reconstructs it
    # exactly (pos - neg == ps for any ps, np_polarity_mask semantics), and
    # no device consumer reads events[..., 3] anyway (warp loss and IWE use
    # ts/y/x + the mask). Coordinates stay f32 — they are fractional in
    # general (sensor jitter / sub-pixel event streams), so no narrower
    # exact dtype exists for them.
    w["event_list"] = np.ascontiguousarray(w["event_list"][..., :3])
    if pol_bits:
        pm = w["event_list_pol_mask"]
        va = w["event_valid"]
        # one-hot on valid rows, all-zero on padded rows — the caller's
        # sticky check guarantees it; cheap to re-assert here
        assert ((pm == 0) | (pm == 1)).all() and (pm.sum(-1) == va).all()
        w["event_pol_bits"] = np.packbits(pm[..., 0] > 0, axis=-1)
        w["event_list_pol_mask"] = None
    if coords_dtype is not None:
        el = w["event_list"]
        va = w["event_valid"]
        lens = va.sum(-1).astype(np.int32)
        # prefix-mask invariant (next_batch / stack_window fill [:n])
        assert (va == (np.arange(va.shape[-1]) < lens[..., None])).all()
        w["event_ts"] = np.ascontiguousarray(el[..., 0])
        w["event_yx"] = el[..., 1:3].astype(coords_dtype)
        w["event_len"] = lens
        w["event_list"] = None
        w["event_valid"] = None
    if derive_mask:
        assert exact_ints and (
            (encoding == "cnt" and w["event_cnt"] is not None) or derive_voxel
        )
        w["event_mask"] = None
    if derive_cnt:
        assert derive_mask and encoding == "cnt", \
            "derive_cnt requires derive_mask's guarantees"
        w["event_cnt"] = None
    if derive_voxel:
        assert encoding == "voxel" and exact_ints
        w["event_voxel"] = None
    if (derive_cnt or derive_voxel) and hot is not None:
        w["hot_bits"] = np.packbits(hot, axis=-1)  # big-endian bit order
    if exact_ints:
        for k in ("event_mask", "event_list_pol_mask", "event_valid"):
            if w[k] is not None:
                w[k] = w[k].astype(np.uint8)
        cnt = w.get("event_cnt")
        if cnt is not None:
            # uint8 when exact (plain counts rarely exceed 255/px/window);
            # else int16 — exact to +-32767 (f16 loses exactness past 2048
            # on hot pixels) and covers signed temporal_cnt channels.
            # ``cnt_dtype`` pins the choice: a per-window data-dependent
            # dtype would change the jitted step's signature mid-run and
            # force a full recompile (minutes on remote backends) — the
            # train loop manages it STICKY (uint8 until a window overflows,
            # then int16 for the rest of the run: at most one retrace).
            if cnt_dtype is None:
                cnt_dtype = (
                    np.uint8 if cnt.min() >= 0 and cnt.max() <= 255
                    else np.int16
                )
            w["event_cnt"] = cnt.astype(cnt_dtype)
    return w


def _unpack_bits(b, n: int):
    """Inverse of ``np.packbits(..., axis=-1)`` (big-endian bit order):
    uint8 [..., ceil(n/8)] -> f32 {0,1} [..., n]."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (b[..., None] >> shifts) & jnp.uint8(1)
    return bits.reshape(*b.shape[:-1], -1)[..., :n].astype(jnp.float32)


def restore_window(window: Dict[str, Any], resolution=None,
                   num_bins: Optional[int] = None,
                   round_ts: bool = False) -> Dict[str, Any]:
    """Device-side inverse of ``compact_window`` (traced inside the step).

    Restores f32 from the narrow wire dtypes, rebuilds the polarity column
    from the polarity mask, and re-derives the dropped grids: ``event_cnt``
    as the per-polarity histogram of the event list (one multi-channel
    flat-index scatter over P·B·N events — ~1/16th of the loss's own
    scatter work) times the unpacked hot-mask bits, then ``event_mask`` as
    its event indicator. Bit-exact vs the loader's host encodings: counts
    are small-integer sums (order-independent in f32) of the same events at
    the same integer coordinates (tests/test_train_eval.py
    test_derive_cnt_matches_loader).

    When ``num_bins`` is given and ``event_voxel`` is absent, the voxel
    grid is likewise rebuilt (derive_voxel wire): the temporal-bilinear
    weights are the identical f32 expressions the host encoder uses
    (np_events_to_voxel, dataloader/encodings.py:48-67), splatted signed
    by polarity in one num_bins-channel scatter — deterministic, equal to
    the host grid up to f32 summation order (see compact_window).
    """
    window = dict(window)
    hot_bits = window.pop("hot_bits", None)
    pol_bits = window.pop("event_pol_bits", None)
    lens = window.pop("event_len", None)
    window = {
        k: (v.astype(jnp.float32) if v is not None else None)
        for k, v in window.items()
    }
    if window.get("event_list") is None:
        # packed event wire: ts f32 + (y, x) u16 + per-(pass, slot) lengths
        ts = window.pop("event_ts")
        yx = window.pop("event_yx")
        n = ts.shape[-1]
        window["event_valid"] = (
            jnp.arange(n, dtype=jnp.int32) < lens[..., None]
        ).astype(jnp.float32)
        window["event_list"] = jnp.concatenate([ts[..., None], yx], axis=-1)
    if pol_bits is not None:
        # 1 bit/event: one-hot polarity mask == (pos, valid - pos)
        pos = _unpack_bits(pol_bits, window["event_list"].shape[-2])
        pos = pos * window["event_valid"]
        window["event_list_pol_mask"] = jnp.stack(
            [pos, window["event_valid"] - pos], axis=-1
        )
    if window["event_list"].shape[-1] == 3:
        # compact wire: rebuild the polarity column from the mask
        # (exact: pos - neg == ps, incl. zero-padded rows)
        pm = window["event_list_pol_mask"]
        window["event_list"] = jnp.concatenate(
            [window["event_list"], (pm[..., 0:1] - pm[..., 1:2])], axis=-1
        )
    if window["event_cnt"] is None:
        if resolution is None:
            raise ValueError("derive_cnt wire needs a static resolution")
        H, W = int(resolution[0]), int(resolution[1])
        el = window["event_list"]
        ys = el[..., 1].astype(jnp.int32)
        xs = el[..., 2].astype(jnp.int32)
        # (pos, |neg|) columns zeroed on padded rows == np_events_to_channels
        # weights for ps in {-1, +1}
        contrib = window["event_list_pol_mask"] * window["event_valid"][..., None]
        P_, B_, N_ = ys.shape
        base = (jnp.arange(P_ * B_, dtype=jnp.int32) * (H * W)).reshape(P_, B_, 1)
        flat = (base + ys * W + xs).reshape(-1)
        cnt = jnp.zeros((P_ * B_ * H * W, 2), jnp.float32)
        cnt = cnt.at[flat].add(contrib.reshape(-1, 2))
        cnt = cnt.reshape(P_, B_, H, W, 2)
        if hot_bits is not None:
            cnt = cnt * _unpack_bits(hot_bits, W)[..., None]
        window["event_cnt"] = cnt
    if window.get("event_voxel") is None and num_bins is not None:
        if resolution is None:
            raise ValueError("derive_voxel wire needs a static resolution")
        H, W = int(resolution[0]), int(resolution[1])
        el = window["event_list"]
        ys = el[..., 1].astype(jnp.int32)
        xs = el[..., 2].astype(jnp.int32)
        tb = el[..., 0] * np.float32(num_bins - 1)
        if round_ts:
            tb = jnp.round(tb)  # round-half-even, like np.round
        # per-bin bilinear weight, signed by polarity; padded rows have
        # ps == 0 (pol mask is all-zero there), so they contribute nothing
        wts = jnp.maximum(
            0.0, 1.0 - jnp.abs(tb[..., None]
                               - jnp.arange(num_bins, dtype=jnp.float32))
        )
        contrib = el[..., 3:4] * wts
        P_, B_, N_ = ys.shape
        base = (jnp.arange(P_ * B_, dtype=jnp.int32) * (H * W)).reshape(P_, B_, 1)
        flat = (base + ys * W + xs).reshape(-1)
        vox = jnp.zeros((P_ * B_ * H * W, num_bins), jnp.float32)
        vox = vox.at[flat].add(contrib.reshape(-1, num_bins))
        vox = vox.reshape(P_, B_, H, W, num_bins)
        if hot_bits is not None:
            vox = vox * _unpack_bits(hot_bits, W)[..., None]
        window["event_voxel"] = vox
    if window["event_mask"] is None:
        # compact wire derive_mask: the loader's mask IS the binary
        # event indicator for plain cnt windows (see compact_window)
        window["event_mask"] = (
            window["event_cnt"].sum(-1, keepdims=True) > 0
        ).astype(jnp.float32)
    return window


def make_train_step(model, tx, warp_cfg: EventWarpingConfig, num_timesteps: int = 4,
                    remat: str = "full", resolution=None,
                    num_bins: Optional[int] = None, round_ts: bool = False):
    """Build the jitted TBPTT train step.

    ``remat`` selects the rematerialization policy for the P-pass model scan
    (the backward's saved-residual traffic is a first-order term on a
    traffic-bound chip): "none" saves every forward residual, "full" wraps
    the scan body in ``jax.checkpoint`` (save only carries + flows, recompute
    unit internals in the backward), "dots" additionally saves matmul
    outputs (``dots_with_no_batch_dims_saveable``) so only the elementwise
    chains recompute. Numerics are identical in exact arithmetic
    (the backward recomputes the same deterministic ops); measured on the
    reference-scale step (BENCH_NOTES.md round 8): "full" 2205 vs "none"
    1973 win/s pure-device (+12% — the recompute is cheaper than spilling
    every per-pass residual to HBM) and "dots" 688 (3x slower: saving the
    nine Z buffers per pass re-creates the traffic remat removed), so
    "full" is the shipped default (config key ``loss.remat``).

    ``resolution`` (H, W) is required only when windows arrive on the
    derive_cnt compact wire (no count grids — see ``restore_window``);
    ``num_bins``/``round_ts`` additionally enable the derive_voxel wire
    (voxel grids rebuilt on device) for voxel-encoding models.
    """
    if remat not in ("none", "full", "dots"):
        raise ValueError(f"remat must be none/full/dots, got {remat!r}")

    def train_step(params, batch_stats, opt_state, states, window):
        # restore f32 + derived grids from the compact wire (no-op for f32
        # callers shipping every key)
        window = restore_window(window, resolution, num_bins=num_bins,
                                round_ts=round_ts)
        tsteps = jnp.arange(window["event_list"].shape[0]) % num_timesteps

        def loss_fn(p):
            def step(carry, inp):
                st, bs = carry
                (out, new_st), mut = model.apply(
                    {"params": p, "batch_stats": bs},
                    inp["event_voxel"],
                    inp["event_cnt"],
                    st,
                    train=True,
                    timestep=inp["t"],
                    mutable=["batch_stats"],
                )
                return (new_st, mut["batch_stats"]), tuple(out["flow"])

            scan_in = {
                "event_voxel": window["event_voxel"],
                "event_cnt": window["event_cnt"],
                "t": tsteps,
            }
            if remat == "full":
                # prevent_cse barriers exist to stop XLA CSE un-doing the
                # remat OUTSIDE structured control flow; this checkpoint is
                # the scan body, where scan itself prevents that, so the
                # barriers would be pure fusion blockers (jax.checkpoint
                # docs recommend prevent_cse=False inside scan)
                step_r = jax.checkpoint(step, prevent_cse=False)
            elif remat == "dots":
                step_r = jax.checkpoint(
                    step,
                    policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                )
            else:
                step_r = step
            (fin_st, fin_bs), flows = jax.lax.scan(
                step_r, (states, batch_stats), scan_in
            )
            loss = warp_cfg(
                list(flows),
                window["event_list"],
                window["event_list_pol_mask"],
                window["event_mask"],
                window["event_valid"],
            )
            return loss, (fin_st, fin_bs)

        (loss, (fin_st, fin_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = clamp_thresholds(optax.apply_updates(params, updates))
        return loss, new_params, fin_bs, new_opt, fin_st, grads

    return jax.jit(train_step, donate_argnums=(0, 1, 2, 3))


def _flatten_named(tree) -> Dict[str, Any]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        "/".join(str(getattr(k, "key", k)) for k in path): v for path, v in flat
    }


def log_param_histograms(run, params, grads, step: int):
    """Weights / LIF beta-theta / per-tensor int8 quant scales / gradient
    histograms (reference train_flow_quant.py:386-462 TensorBoard logging)."""
    named = _flatten_named(jax.device_get(params))
    weights = {k: v for k, v in named.items() if k.endswith("kernel")}
    lif = {
        k: v
        for k, v in named.items()
        if k.rsplit("/", 1)[-1] in ("beta", "threshold", "leak", "thresh")
    }
    scales = {
        k + "/int8_scale": np.abs(np.asarray(v)).max() / 127.0
        for k, v in weights.items()
    }
    run.log_histograms(weights, step, group="weights")
    run.log_histograms(lif, step, group="lif")
    run.log_histograms(scales, step, group="quant_scales")
    if grads is not None:
        run.log_histograms(_flatten_named(jax.device_get(grads)), step, group="grads")


def _shard_window(window, mesh, use_process_local=None):
    """Place one host window onto the mesh, batch axis sharded over ``data``.

    On a real multi-process mesh (SURVEY §5.8 topology: one process per
    host, each streaming its own file shard via loader.num_shards /
    shard_index, h5_stream.py:144-169) most mesh devices are
    NON-addressable and plain ``device_put`` raises — the window is this
    process's slice of the global batch, assembled into a global array with
    ``jax.make_array_from_process_local_data``. Single-process meshes (and
    the virtual-CPU test mesh) keep the direct ``device_put`` path; both
    produce identical global arrays when process_count == 1
    (tests/test_parallel.py). See docs/DEPLOYMENT.md.
    """
    if mesh is None:
        return window
    pb = NamedSharding(mesh, P(None, "data"))
    if use_process_local is None:
        use_process_local = jax.process_count() > 1

    if use_process_local:
        def put(x):
            return jax.make_array_from_process_local_data(pb, np.asarray(x))
    else:
        def put(x):
            return jax.device_put(x, pb)

    return jax.tree.map(put, window)


def train(
    config: Dict[str, Any],
    path_runs: str = "runs",
    prev_ckpt: Optional[str] = None,
    mesh=None,
    max_steps: Optional[int] = None,
    verbose: bool = True,
    epoch_callback=None,
):
    """Train a FireNet-family model (train_flow.py ``train()`` equivalent).

    ``epoch_callback(epoch, params, batch_stats, run, opt_state)``, if
    given, fires at
    every epoch end *inside the training process* — the hook for periodic
    ground-truth validation (reference train_flow_validation.py:28-130;
    validation there saves/restores ``model._states``, which is unnecessary
    here: evaluation builds its own state carries, the training carry pytree
    is immutable from its perspective).

    Returns the tracking Run (its dir holds checkpoints + metrics).
    """
    if config["data"]["mode"] == "frames":
        raise ValueError("Training pipeline not compatible with frames mode")

    model_cfg = config["model"]
    model = registry.build_model(model_cfg)
    # loader.num_workers > 1 -> multi-process slot-sharded stream
    # (evflow/data/mp_loader.py), else the in-process H5EventStream
    from evflow.data.mp_loader import build_stream

    data = build_stream(config, model_cfg.get("num_bins", 2),
                        model_cfg.get("round_encoding", False))
    data.shuffle()

    run = Run(path_runs, config.get("experiment", "Default"))
    run.log_params(config)
    run.save_diff()

    warp_cfg = EventWarpingConfig(config)
    clip = config.get("loss", {}).get("clip_grad")
    tx = registry.build_optimizer(config.get("optimizer", {"name": "Adam", "lr": 2e-4}))
    if clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(float(clip)), tx)

    loader = config["loader"]
    H, W = loader["resolution"]
    B = loader["batch_size"]
    # downsample pooling makes counts/masks fractional — keep the compact
    # wire's narrow integer casts off in that case (see compact_window)
    pooled = tuple(loader["resolution"]) != tuple(
        loader.get("std_resolution", loader["resolution"])
    )
    # the loader's event_mask is exactly cnt.sum(-1) > 0 for plain cnt
    # windows — derive it on device instead of uploading it. The voxel
    # encoding gets the same treatment (mask == histogram indicator, voxel
    # == temporal-bilinear splat of the same list; data.derive_voxel: false
    # opts out — the derived voxel equals the host grid up to f32 summation
    # order, see compact_window)
    derive_voxel = (
        model_cfg.get("encoding", "cnt") == "voxel"
        and not pooled
        and bool(config["data"].get("derive_voxel", True))
    )
    derive_mask = derive_voxel or (
        model_cfg.get("encoding", "cnt") == "cnt"
        and not pooled
        and not bool(model_cfg.get("temporal_cnt", False))
    )
    # ... and under the same guarantees the count grids themselves are the
    # event list's per-polarity histogram (× hot mask) — derive them on
    # device too (~2/3 of the remaining wire bytes; config
    # data.derive_cnt: false opts out, e.g. hosts with fast links where
    # the ~1 ms device scatter outweighs the upload, BENCH_NOTES round 8)
    derive_cnt = (not derive_voxel) and derive_mask and bool(
        config["data"].get("derive_cnt", True)
    )
    # sticky wire dtype for counts: start at uint8, upgrade permanently to
    # int16 the first time a window overflows it — never per-window (a
    # flapping dtype would retrace the train step every switch)
    cnt_dtype = np.uint8 if derive_mask else np.int16
    # packed event wire (always on: exactness is checked per window, with
    # sticky f32/full-mask fallbacks — see compact_window): (y, x) as
    # uint16 while integral, polarity as 1 bit while one-hot, valid as
    # per-(pass, slot) lengths
    coords_dtype = np.uint16
    pol_bits = True
    # round, not float floor-div: 0.5 // 0.1 == 4.0 in float (time mode)
    P_ = max(1, int(round(
        config["data"].get("window_loss", config["data"]["window"])
        / config["data"]["window"]
    )))

    # init
    rng = jax.random.PRNGKey(int(loader.get("seed", 0)))
    states = model.init_states(B, H, W)
    dummy_cnt = jnp.zeros((B, H, W, 2), jnp.float32)
    dummy_vox = jnp.zeros((B, H, W, model_cfg.get("num_bins", 2)), jnp.float32)
    variables = model.init(rng, dummy_vox, dummy_cnt, states, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)

    if prev_ckpt:
        restored = load_checkpoint(
            prev_ckpt,
            {"params": params, "batch_stats": batch_stats, "opt_state": opt_state,
             "epoch": 0, "loss": 0.0, "loss_variance": 0.0},
        )
        params = restored["params"]
        batch_stats = restored["batch_stats"]
        opt_state = restored["opt_state"]

    # the built model is the single source of truth for the TEBN cycle
    # length (registry resolves the config schema)
    tebn_T = int(getattr(model, "num_timesteps", 4))
    remat = str(config.get("loss", {}).get("remat", "full"))
    step_fn = make_train_step(
        model, tx, warp_cfg, tebn_T, remat=remat,
        resolution=tuple(loader["resolution"]),
        num_bins=(int(model_cfg.get("num_bins", 2)) if derive_voxel else None),
        round_ts=bool(model_cfg.get("round_encoding", False)),
    )

    ckpt_policy = CheckpointPolicy(os.path.join(run.dir, "checkpoints"))
    patience = 50
    epochs_without_improvement = 0
    train_loss = 0.0
    recent_losses: List[float] = []
    grads_rows: List[dict] = []
    n_epochs = int(loader.get("n_epochs", 100))
    store_grads = bool(config.get("vis", {}).get("store_grads", False))
    store_hists = bool(config.get("vis", {}).get("store_hists", False))
    hist_every = int(config.get("vis", {}).get("hist_every", 50))

    pending: List[dict] = []
    steps = 0
    t_start = time.time()
    encoding = model_cfg.get("encoding", "cnt")
    inflight_loss = None  # device scalar of the step in flight (fetch deferred
    # one iteration so host loading/upload overlaps device compute)

    loss_steps = 0  # flushed loss windows this epoch (the avg denominator)

    def flush_loss():
        nonlocal inflight_loss, train_loss, loss_steps
        if inflight_loss is not None:
            lv = float(inflight_loss)
            train_loss += lv
            loss_steps += 1
            recent_losses.append(lv)
            if len(recent_losses) > 50:
                recent_losses.pop(0)
            inflight_loss = None

    fetch = Prefetcher(data, depth=2)
    try:
        while True:
            batch = next(fetch)

            if batch["new_seq"].any():
                pending = []  # discard the partial loss window (global reset)
                states = model.init_states(B, H, W)

            if batch["epoch_done"]:
                flush_loss()
                # per-loss-window average: samples counts slot-windows, a
                # step consumes P_*B of them — divide by flushed loss steps
                avg = train_loss / max(loss_steps, 1)
                var = float(np.var(recent_losses)) if len(recent_losses) > 1 else float("inf")
                run.log_metric("loss", avg, step=data.epoch)
                run.log_metric("loss_variance", var, step=data.epoch)
                if verbose:
                    print(f"Epoch {data.epoch:04d} - loss {avg:.6f} var {var:.6f}")
                state_dict = {
                    "params": jax.device_get(params),
                    "batch_stats": jax.device_get(batch_stats),
                    "opt_state": jax.device_get(opt_state),
                }
                wrote = ckpt_policy.update(
                    data.epoch, avg, var, len(recent_losses), state_dict, config
                )
                if wrote["lowest_loss"]:
                    epochs_without_improvement = 0
                else:
                    epochs_without_improvement += 1
                train_loss = 0.0
                loss_steps = 0
                data.end_epoch()
                if store_grads and grads_rows:
                    save_csv(grads_rows, os.path.join(run.dir, "grads_w.csv"))
                    grads_rows = []
                if epoch_callback is not None:
                    epoch_callback(data.epoch - 1, params, batch_stats, run,
                                   opt_state)
                if data.epoch >= n_epochs or epochs_without_improvement >= patience:
                    if verbose:
                        print(f"Stopping at epoch {data.epoch}.")
                    break

            pending.append(batch)
            if len(pending) < P_:
                continue

            stacked = stack_window(pending)
            if (encoding == "cnt" and not derive_cnt
                    and cnt_dtype is np.uint8
                    and stacked["event_cnt"].max() > 255):
                cnt_dtype = np.int16  # sticky: one retrace, never flaps
            if coords_dtype is np.uint16:
                yx = stacked["event_list"][..., 1:3]
                if not ((yx >= 0) & (yx < 65536) & (yx == np.floor(yx))).all():
                    coords_dtype = np.float32  # sticky (e.g. pooled rescale)
            if pol_bits:
                pm = stacked["event_list_pol_mask"]
                if not (((pm == 0) | (pm == 1)).all()
                        and (pm.sum(-1) == stacked["event_valid"]).all()):
                    pol_bits = False  # sticky: non-unit polarities ride full
            window = _shard_window(
                compact_window(stacked, encoding,
                               exact_ints=not pooled,
                               derive_mask=derive_mask,
                               cnt_dtype=cnt_dtype,
                               derive_cnt=derive_cnt,
                               derive_voxel=derive_voxel,
                               coords_dtype=coords_dtype,
                               pol_bits=pol_bits),
                mesh,
            )
            pending = []
            flush_loss()  # previous step has long finished; fetch is cheap now
            loss, params, batch_stats, opt_state, states, grads = step_fn(
                params, batch_stats, opt_state, states, window
            )
            inflight_loss = loss
            data.samples += P_ * B
            if store_grads:
                grads_rows.append(grad_stats(jax.device_get(grads)))
            if store_hists and steps % hist_every == 0:
                log_param_histograms(run, params, grads, steps)
            steps += 1
            if verbose and steps % 10 == 0:
                rate = steps * P_ * B / (time.time() - t_start)
                print(
                    f"Epoch {data.epoch:04d} [{data.seq_num:03d}/{len(data.files):03d}] "
                    f"loss {train_loss / max(loss_steps, 1):.6f} ({rate:.1f} win/s)",
                    end="\r",
                )
            if max_steps is not None and steps >= max_steps:
                break

        flush_loss()
    finally:
        # join the prefetch worker BEFORE closing the HDF5 files it reads
        # (exceptions, epoch_callback failures, Ctrl-C): same guard eval.py
        # uses — h5py is not safe against concurrent close
        fetch.close()
        data.close()
    return run
