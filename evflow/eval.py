"""Ground-truth evaluation loop (MVSEC-style AEE/AAE protocol).

Behavioral reference: eval_flow.py:49-397. Protocol details preserved:
  * asserts: AEE requires a gtflow mode and window <= 1 with integer
    inverse (eval_flow.py:62-71);
  * reset model state at sequence boundaries (:211-214);
  * IWE computed at model resolution before any upsampling (:229-237);
  * ``keep_gt_full_res``: predictions nearest-upsampled to GT resolution
    with flow values rescaled by the spatial factor (:239-252), metric
    resolution switched to std_resolution and flow_scaling adjusted by
    ``base * (model_res / 128) / 2`` (:162-174);
  * AEE cadence gate ``idx_AEE == round(1/window)`` and the ``dt_gt > 0``
    skip (:273-278);
  * per-HDF5-file result accumulation with percent-outlier tracking
    (:289-304) and metrics_N.yml output (:350-363).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from evflow import registry
from evflow.data.h5_stream import H5EventStream, Prefetcher
from evflow.loss import metrics as M
from evflow.ops.iwe import compute_pol_iwe, upsample_flow
from evflow.utils.checkpoint import load_checkpoint
from evflow.utils.tracker import create_model_dir, log_config, log_results

__all__ = ["evaluate", "make_eval_step"]


def _raw_eval_step(model, log: bool = False):
    """Unjitted eval forward: (variables, voxel, cnt, states) ->
    (flow tuple, states, activity)."""

    def step(variables, voxel, cnt, states):
        # counts may arrive as compact uint16 over the host wire
        cnt = cnt.astype(jnp.float32) if cnt is not None else None
        out, new_states = model.apply(variables, voxel, cnt, states, train=False,
                                      log=log)
        return tuple(out["flow"]), new_states, out["activity"]

    return step


def make_eval_step(model, log: bool = False):
    """Jitted eval forward: (variables, voxel, cnt, states) ->
    (flow list, states, activity)."""
    return jax.jit(_raw_eval_step(model, log))


def make_chunk_eval_step(raw_step):
    """Jitted K-window forward: one dispatch scans K consecutive windows
    (stacked [K, B, ...] inputs), returning stacked flows/activity and the
    final states. Per-window dispatch costs a full host<->device roundtrip
    (~35 ms on a tunneled chip, BENCH_NOTES.md round 5) that dwarfs the
    sub-ms device step; chunking amortizes it K-fold — the eval-protocol
    analog of tools/serve_stream.py --chunk."""

    @jax.jit
    def step(variables, voxels, cnts, states):
        def body(st, inp):
            flows, st2, act = raw_step(variables, inp["v"], inp["c"], st)
            return st2, (flows, act)

        states, (flows, acts) = jax.lax.scan(
            body, states, {"v": voxels, "c": cnts}
        )
        return flows, states, acts

    return step


def _window_metric_values(criteria, names, flow, gtflow, event_mask, dt_gt,
                          dt_input, want_heatmaps):
    """In-graph metric values for ONE associated window.

    Mirrors the host-side ``criteria[i]()`` calls with the same pure metric
    kernels (loss/flow.py:597-938); returns ``vals[str(i)]`` — ``val[B]`` or
    ``(val[B], percent[B])`` — plus, for the heatmap-accumulating metrics
    (AEE/AAE/NAAE, loss/flow.py:489-594), the per-window batch-summed
    ``(err * mask, mask)`` maps gated exactly as the host path gates its
    criterion calls.
    """
    vals, hmaps = {}, {}
    for i, (name, crit) in enumerate(zip(names, criteria)):
        fs = float(crit.flow_scaling)
        key = str(i)
        hm = None
        if name == "AEE":
            v, p, err, mask = M.aee(flow, gtflow, event_mask, dt_gt, dt_input, fs)
            vals[key] = (v, p)
            # the host path calls the AEE criterion only on windows where
            # some slot is due; at cadence 1 that is exactly (dt_gt > 0).any()
            hm = (err, mask, (dt_gt > 0.0).any())
        elif name == "NEE":
            v, p, _, _ = M.nee(flow, gtflow, event_mask, dt_gt, dt_input, fs)
            vals[key] = (v, p)
        elif name == "AAE":
            v, p, err, mask = M.aae(flow, gtflow, event_mask, dt_gt, dt_input,
                                    fs, crit.strict)
            vals[key] = (v, p)
            hm = (err, mask, jnp.asarray(True))
        elif name == "NAAE":
            v, err, mask = M.naae(flow, gtflow, event_mask, dt_gt, dt_input, fs)
            vals[key] = v
            hm = (err, mask, jnp.asarray(True))
        elif name == "AE_ofMeans":
            vals[key] = M.ae_of_means(flow, gtflow, event_mask, dt_gt, dt_input, fs)
        elif name == "AAE_Weighted":
            vals[key] = M.aae_weighted(flow, gtflow, event_mask, dt_gt, dt_input, fs)
        elif name == "AAE_Filtered":
            vals[key] = M.aae_filtered(flow, gtflow, event_mask, dt_gt, dt_input,
                                       fs, crit.mag_threshold)
        else:  # registry guarantees the set above; fail loudly if it grows
            raise NotImplementedError(f"device metric {name!r}")
        if want_heatmaps and hm is not None:
            err, mask, gate = hm
            g = gate.astype(jnp.float32)
            hmaps[key] = ((err * mask).sum(axis=0) * g, mask.sum(axis=0) * g)
    return vals, hmaps


def make_chunk_eval_metrics_step(raw_step, criteria, names, want_heatmaps,
                                 keep_gt_full_res):
    """Jitted K-window forward + ON-DEVICE metric protocol.

    Like :func:`make_chunk_eval_step`, but instead of returning the K
    stacked flow maps for a host-side metric pass, the scan body computes
    every metric's per-slot value in-graph and accumulates the error
    heatmaps in the carry — the host fetches only ``[K, B]`` scalars per
    metric (and, once per run, two ``[H, W]`` heatmap accumulators). Flow
    maps never leave the device: the dominant fetch of the chunked
    protocol (K x B x H x W x 2 f32) is replaced by the GT upload the
    metrics need anyway, and the per-window host metric math (the
    unmodeled host-sizing term in docs/DEPLOYMENT.md) disappears.
    Protocol parity with the host path is pinned by
    tests/test_train_eval.py::test_evaluate_device_metrics_matches_host.
    """

    @jax.jit
    def step(variables, voxels, cnts, states, gtflows, masks, dt_gts,
             dt_inputs, hm):
        def body(carry, inp):
            st, hm = carry
            flows, st2, act = raw_step(variables, inp["v"], inp["c"], st)
            flow = flows[-1]
            gt = inp["gt"]
            m = inp["m"]
            if m is None:
                # derive_mask wire contract (train.py compact_window,
                # pinned by test_derive_mask_matches_loader): the loader's
                # event_mask IS cnt.sum(-1) > 0 for plain cnt windows —
                # skip the mask upload and rebuild it in-graph
                m = (inp["c"].astype(jnp.float32).sum(-1) > 0).astype(jnp.uint8)
            if keep_gt_full_res:
                # nearest-upsample + rescale predictions to GT resolution
                # (eval_flow.py:239-252), in-graph
                gh, gw = gt.shape[1:3]
                ph, pw = flow.shape[1:3]
                if gh > ph or gw > pw:
                    up = upsample_flow(flow, gh, gw)
                    flow = up * jnp.array([gw / pw, gh / ph], jnp.float32)
            vals, hmaps = _window_metric_values(
                criteria, names, flow, gt, m, inp["dtg"], inp["dti"],
                want_heatmaps,
            )
            if hmaps:
                hm = jax.tree.map(lambda a, b: a + b, hm, hmaps)
            return (st2, hm), (vals, act)

        (states, hm), (vals, acts) = jax.lax.scan(
            body, (states, hm),
            {"v": voxels, "c": cnts, "gt": gtflows, "m": masks,
             "dtg": dt_gts, "dti": dt_inputs},
        )
        return vals, acts, states, hm

    return step


def _reset_slot_states(states, model, flags, B, H, W):
    """Mask-reset carries for slots that started a new sequence."""
    if not flags.any():
        return states
    fresh = model.init_states(B, H, W)
    new_seq = jnp.asarray(flags, bool).reshape(B, *([1] * 3))

    def mix(old, new):
        return jnp.where(new_seq, new, old)

    return jax.tree.map(mix, states, fresh)


def evaluate(
    config: Dict[str, Any],
    checkpoint: Optional[str] = None,
    variables: Optional[Dict[str, Any]] = None,
    model=None,
    fused: bool = False,
    path_results: str = "results_inference",
    runid: str = "eval",
    debug: bool = False,
    max_windows: Optional[int] = None,
    collect_vis: bool = False,
    verbose: bool = True,
    chunk: int = 1,
    mesh=None,
    device_metrics: bool = False,
):
    """Run the full evaluation protocol; returns the per-file results dict.

    Provide either ``checkpoint`` (evflow msgpack dir/file, or a reference
    ``.pth`` which is imported via the torch shim) or ready ``variables``.

    ``chunk`` scans K consecutive windows per device dispatch and fetches
    the K flow maps in one transfer; the per-window protocol (association,
    cadence, metrics, vis) then runs on the host CPU backend with no
    further device roundtrips. Chunks flush early at sequence rollovers so
    state resets stay exact; partial chunks reuse the per-window program.
    Results match the per-window path to CPU-vs-TPU f32 rounding (<1e-6
    relative — benchmarks/bench_eval_chunk.py: 14-20x wall speedup on a
    tunneled chip). ``max_windows`` may overshoot by up to ``chunk - 1``.

    ``mesh`` fans the batch slots out over a 1-D device mesh (SURVEY
    §5.8: each chip evaluates different streamed sequences — states and
    window uploads are sharded on the batch axis; GSPMD keeps the
    non-fused compute local because every op is batch-parallel; the
    Pallas ``fused`` backend cannot be partitioned and is rejected).
    Metric results are identical to single-device evaluation.

    ``device_metrics`` (requires ``chunk > 1``) moves the metric protocol
    in-graph: the chunked dispatch uploads each window's GT flow / event
    mask / dt alongside the encoded events, computes every metric's
    per-slot value inside the scan, and accumulates error heatmaps in the
    device carry — the host fetches only ``[K, B]`` scalars per metric, and
    flow maps never cross the wire. Cadence gating and per-file
    accumulation stay host-side over the fetched scalars, so results match
    the host path to f32 rounding. Visualization paths need the flow maps
    and are rejected; ``heat_map`` needs ``window == 1`` (the AEE criterion
    call gate is evaluated in-graph). On a normally-attached host this
    removes the per-window host metric math from the serving bound
    (docs/DEPLOYMENT.md host sizing); partial chunks at sequence rollovers
    fall back to the host-side per-window program.
    """
    metrics_cfg = config.get("metrics", {})
    names = metrics_cfg.get("name", [])
    mode = config["data"]["mode"]
    window = config["data"]["window"]

    if names and mode not in ("gtflow_dt1", "gtflow_dt4"):
        # every validation metric compares against GT flow maps; fail with a
        # clear error instead of a TypeError deep inside the jitted metric
        raise ValueError(
            f"metrics {names} need ground-truth flow — set data.mode to "
            f"gtflow_dt1/gtflow_dt4 (got {mode!r})"
        )
    if "AEE" in names:
        if window > 1:
            raise ValueError("AEE computation not compatible with window > 1")
        if not np.isclose((1.0 / window) % 1.0, 0.0):
            raise ValueError("AEE needs a window whose inverse is an integer")

    model_cfg = config["model"]
    if model is None:
        model = registry.build_model(model_cfg)
    loader = config["loader"]
    H, W = loader["resolution"]
    B = int(loader.get("batch_size", 1))

    states = model.init_states(B, H, W)
    dummy_cnt = jnp.zeros((B, H, W, 2), jnp.float32)
    dummy_vox = jnp.zeros((B, H, W, model_cfg.get("num_bins", 2)), jnp.float32)
    if variables is None:
        variables = model.init(jax.random.PRNGKey(0), dummy_vox, dummy_cnt, states)
        if checkpoint:
            if checkpoint.endswith((".pth", ".pt")):
                from evflow.utils.checkpoint import import_torch_checkpoint

                variables, _ = import_torch_checkpoint(checkpoint, variables)
            else:
                tmpl = {
                    "params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {}),
                }
                restored = load_checkpoint(
                    checkpoint,
                    {**tmpl, "opt_state": None, "epoch": 0, "loss": 0.0,
                     "loss_variance": 0.0},
                )
                variables = {
                    "params": restored["params"],
                    "batch_stats": restored["batch_stats"],
                }

    flow_scaling = float(metrics_cfg.get("flow_scaling", 128))
    criteria = registry.build_metrics(config, flow_scaling)

    keep_gt_full_res = bool(loader.get("keep_gt_full_res", False))
    if keep_gt_full_res and criteria:
        # metrics derive their resolution from array shapes; only the flow
        # scaling needs adjusting (eval_flow.py:162-174)
        training_resolution = 128  # reference models trained at 128x128
        adjusted = flow_scaling * (loader["resolution"][0] / training_resolution) / 2
        for c in criteria:
            c.flow_scaling = adjusted

    if not debug:
        path_results = create_model_dir(path_results, runid)
        eval_id = log_config(path_results, runid, config)
    else:
        eval_id = -1

    vis_cfg = config.get("vis", {})
    log_activity = bool(vis_cfg.get("activity", False))
    store_vis = bool(vis_cfg.get("store", False)) and not debug
    live_vis = bool(vis_cfg.get("enabled", False))
    vis = None
    if store_vis or live_vis:
        # live windows (vis.enabled, reference eval_flow.py:318-338 +
        # visualization.py:43-220) and/or disk storage (vis.store)
        from evflow.utils.viz import Visualization

        vis = Visualization(
            config,
            eval_id=eval_id,
            path_results=path_results if store_vis else None,
        )
    activity_log = None

    from evflow.data.mp_loader import build_stream

    data = build_stream(config, model_cfg.get("num_bins", 2),
                        model_cfg.get("round_encoding", False))
    step_variables = variables  # what the jitted step receives as its pytree
    if fused:
        # Pallas fused inference path (evflow/models/fused.py); one flow
        # scale, no activity logging
        from evflow.models.fused import FusedFireNet

        if log_activity:
            raise ValueError("fused backend does not support activity logging")
        fused_net = FusedFireNet.from_firenet(model, variables)
        states = fused_net.init_states(B, H, W)
        state_model = fused_net  # rollover resets must match ITS state layout
        # params flow through the jit ARGUMENT, not the closure: closed-over
        # weights bake into the compiled program as literals, so every new
        # checkpoint would miss the persistent compile cache (minutes per
        # remote compile on this backend)
        step_variables = fused_net.params

        def _raw_step(fparams, voxel, cnt, st):
            x = voxel if model.encoding == "voxel" else cnt.astype(jnp.float32)
            flow, st2 = fused_net.step(fparams, x, st)
            return (flow,), st2, None
    else:
        _raw_step = _raw_eval_step(model, log=log_activity)
        state_model = model
    step_fn = jax.jit(_raw_step)
    chunk = max(int(chunk), 1)
    want_heatmaps = bool(metrics_cfg.get("heat_map", False))
    cadence = int(np.round(1.0 / window)) if window else 1
    if device_metrics:
        if chunk <= 1:
            raise ValueError("device_metrics needs chunk > 1 (per-window "
                             "dispatch is host-driven)")
        if not names:
            raise ValueError("device_metrics without metrics does nothing — "
                             "drop the flag or configure metrics.name")
        if collect_vis or vis is not None:
            raise ValueError("device_metrics never fetches flow maps; "
                             "vis/collect_vis need them — disable one")
        if want_heatmaps and cadence != 1:
            raise ValueError("device_metrics with metrics.heat_map needs "
                             "window == 1 (the AEE criterion-call gate is "
                             "evaluated in-graph)")
    chunk_fn = None
    metrics_chunk_fn = None
    if chunk > 1:
        if device_metrics:
            metrics_chunk_fn = make_chunk_eval_metrics_step(
                _raw_step, criteria, names, want_heatmaps, keep_gt_full_res,
            )
        else:
            chunk_fn = make_chunk_eval_step(_raw_step)
    hm_dev = None  # device heatmap accumulators, lazily shaped at first chunk

    batch_shd = chunk_shd = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from evflow.parallel.mesh import batch_sharding

        if fused:
            # the Pallas kernels are Mosaic custom calls with no
            # shard_map/custom_partitioning — GSPMD cannot partition them
            raise ValueError("fused backend does not support mesh fan-out")
        n_dev = int(mesh.devices.size)
        if B % n_dev != 0:
            raise ValueError(
                f"batch_size {B} must be divisible by the mesh size {n_dev}"
            )
        axis = mesh.axis_names[0]
        batch_shd = batch_sharding(mesh, axis)
        chunk_shd = NamedSharding(mesh, P(None, axis))

        def _shard_states(st):
            return jax.tree.map(lambda x: jax.device_put(x, batch_shd), st)

        states = _shard_states(states)

    # per-slot AEE cadence counters (reference eval_flow.py:273-278 is B=1
    # global; generalized per batch slot so each streamed file keeps its own
    # association cadence)
    idx_AEE = np.zeros(B, np.int64)
    # compact host->device wire: count encodings are exact small NON-NEGATIVE
    # integers unless downsample pooling (res < std_res) makes them
    # fractional, or temporal_cnt makes channel 0 = (pos - neg) signed —
    # uint16 would wrap negatives to ~65535
    std_res = tuple(loader.get("std_resolution", loader["resolution"]))
    compact_wire = (
        tuple(loader["resolution"]) == std_res
        and not bool(model_cfg.get("temporal_cnt", False))
    )
    val_results: Dict[str, Dict[str, Dict[str, float]]] = {}
    vis_frames = []
    windows_done = 0

    encoding = model_cfg.get("encoding", "cnt")

    # sticky wire dtype: uint8 until the first window with a pixel count
    # past 255, then uint16 for the rest of the run — never per-window
    # (a flapping dtype would retrace the forward every switch)
    cnt_wire_dtype = np.uint8

    def encode_wire(batch):
        """Host wire arrays for one window: only the encoding the model
        reads (models/model.py:146-161 selects one; shipping the dead one
        wastes host->device bandwidth), counts as uint8/uint16 when exact
        (restored to f32 inside the jitted step)."""
        nonlocal cnt_wire_dtype
        if encoding == "voxel":
            return batch["event_voxel"], None
        if compact_wire:
            # counts are small non-negative integers unless downsample
            # pooling is active — ship uint8 when they fit (a quarter of
            # the f32 bytes), uint16 past 255 (exact to 65535)
            if cnt_wire_dtype is np.uint8 and batch["event_cnt"].max() > 255:
                cnt_wire_dtype = np.uint16
            return None, batch["event_cnt"].astype(cnt_wire_dtype)
        return None, batch["event_cnt"]

    def handle_activity(activity):
        nonlocal activity_log
        if log_activity and activity is not None:
            from evflow.utils.viz import vis_activity

            activity_log = vis_activity(
                {k: float(v) for k, v in activity.items()}, activity_log,
                live=live_vis,
            )

    def finish_window(batch):
        nonlocal windows_done
        windows_done += B
        if verbose and windows_done % (100 * B) < B:
            print(f"eval: {windows_done} windows, seq {data.seq_num}", end="\r")

    def accumulate_metrics(batch, value_of, pre=None, post=None):
        """Shared cadence / per-file accumulation protocol
        (eval_flow.py:271-304). The host path passes the criterion call as
        ``value_of``; the device_metrics path passes the fetched in-graph
        values — the gating and bookkeeping live here exactly once."""
        dt_gt_np = np.asarray(batch["dt_gt"], np.float64).reshape(-1)
        for i, mname in enumerate(names):
            if pre is not None:
                pre(i)
            if mname == "AEE":
                # per-slot protocol (eval_flow.py:273-278 generalized):
                # a slot only advances its cadence when it has valid GT
                # this window, and only due slots accumulate
                idx_AEE[dt_gt_np > 0.0] += 1
                due = (idx_AEE >= cadence) & (dt_gt_np > 0.0)
                if not due.any():
                    continue
            else:
                due = np.ones(B, np.bool_)
            val = value_of(i, mname)
            if mname == "AEE":
                idx_AEE[due] = 0
            for b in range(B):
                if not due[b]:
                    continue
                fname = batch["file_names"][b]
                slot = val_results.setdefault(fname, {})
                entry = slot.setdefault(
                    mname, {"metric": 0.0, "it": 0, "percent": 0.0}
                )
                entry["it"] += 1
                if criteria[i].has_percent:
                    entry["metric"] += float(np.asarray(val[0][b]))
                    entry["percent"] += float(np.asarray(val[1][b]))
                else:
                    entry["metric"] += float(np.asarray(val)[b])
            if post is not None:
                post(i)

    def process_window(batch, flows, activity, host=False):
        """Host-side per-window protocol: activity log, IWE, full-res
        upsample, metric association/cadence, vis. Identical for the
        per-window and chunked dispatch paths. With ``host`` the metric /
        IWE jits run on the CPU backend over already-fetched flows — on a
        high-latency link each per-window device metric call costs a full
        roundtrip, which would cancel the chunked forward's savings."""
        if host:
            with jax.default_device(jax.local_devices(backend="cpu")[0]):
                return process_window(batch, flows, activity, host=False)
        flows = list(flows)
        handle_activity(activity)

        iwe = None
        if collect_vis or vis is not None:
            iwe = compute_pol_iwe(
                flows[-1],
                jnp.asarray(batch["event_list"]),
                tuple(loader["resolution"]),
                jnp.asarray(batch["event_list_pol_mask"][..., 0]),
                jnp.asarray(batch["event_list_pol_mask"][..., 1]),
                flow_scaling=flow_scaling,
                round_idx=True,
                valid=jnp.asarray(batch["event_valid"]),
            )

        # upsample predictions when GT stays at full resolution
        if keep_gt_full_res and "gtflow" in batch:
            gh, gw = batch["gtflow"].shape[1:3]
            ph, pw = flows[-1].shape[1:3]
            if gh > ph or gw > pw:
                up = upsample_flow(flows[-1], gh, gw)
                scale = jnp.array([gw / pw, gh / ph], jnp.float32)  # (x, y)
                flows[-1] = up * scale
        if collect_vis:
            vis_frames.append(
                {
                    "flow": np.asarray(flows[-1]),
                    "iwe": np.asarray(iwe),
                    "event_cnt": batch["event_cnt"],
                    "gtflow": batch.get("gtflow"),
                }
            )
        if names:
            inputs = {
                "gtflow": jnp.asarray(batch["gtflow"]) if "gtflow" in batch else None,
                "event_mask": jnp.asarray(batch["event_mask"]),
                "dt_gt": jnp.asarray(batch["dt_gt"]),
                "dt_input": jnp.asarray(batch["dt_input"]),
            }
            overwrite = bool(
                config.get("loss", {}).get("overwrite_intermediate", False)
            )
            for c in criteria:
                c.event_flow_association(flows, inputs)

            def pre(i):
                # overwrite intermediate flows with the final estimate
                # (eval_flow.py:271-272)
                if overwrite:
                    criteria[i].overwrite_intermediate_flow(flows)

            accumulate_metrics(
                batch,
                lambda i, mname: criteria[i](),
                pre=pre,
                post=lambda i: criteria[i].reset(),
            )

        if vis is not None:
            sequence = os.path.splitext(batch["file_names"][0])[0]
            # event-masked window flow (loss/flow.py:465-474; single-pass
            # window -> flow at event pixels, zero elsewhere)
            fl = np.asarray(flows[-1])
            em = np.asarray(batch["event_mask"])
            if em.shape[1:3] != fl.shape[1:3]:
                masked = None  # resolution mismatch (keep_gt_full_res)
            else:
                masked = fl * (em > 0)
            err_map, err_is_angle = None, False
            for i, mname in enumerate(names):
                em_i = criteria[i].get_error_map()
                if em_i is not None:
                    err_map = em_i
                    err_is_angle = mname in ("AAE", "NAAE")
                    break
            iwe_np = np.asarray(iwe) if iwe is not None else None
            # live window suite (reference eval_flow.py:318-323); no-op
            # unless vis.enabled and a display is present
            vis.update(batch, fl, iwe=iwe_np, masked_flow=masked)
            vis.store(
                batch,
                fl,
                iwe_np,
                sequence,
                masked_flow=masked,
                # slot 0's timestamp: store() renders batch slot 0 and the
                # interval throttle must follow that slot's stream time
                ts=float(np.asarray(batch["ts"]).reshape(-1)[0]),
                error_map=err_map,
                error_is_angle=err_is_angle,
            )

        finish_window(batch)

    pending: list = []
    inflight: list = []  # dispatched device-metrics chunks not yet fetched

    def drain_inflight(keep=0):
        """Fetch + accumulate dispatched device-metrics chunks in stream
        order, leaving at most ``keep`` in flight. ``keep=1`` is depth-1
        pipelining: the newest chunk computes on-device while the host
        assembles and uploads the next one — metric accumulation order is
        unchanged because chunks drain strictly front-first."""
        while len(inflight) > keep:
            batches, vals_f, acts_f = inflight.pop(0)
            vals_np = jax.device_get(vals_f)
            acts_np = jax.device_get(acts_f) if acts_f is not None else None
            for k, b in enumerate(batches):
                if acts_np is not None:
                    handle_activity({kk: vv[k] for kk, vv in acts_np.items()})

                def value_of(i, mname, _k=k):
                    v = vals_np[str(i)]
                    if isinstance(v, tuple):
                        return (v[0][_k], v[1][_k])
                    return v[_k]

                accumulate_metrics(b, value_of)
                finish_window(b)

    def run_pending():
        """Dispatch buffered windows: one scanned device call for a full
        chunk, the per-window jit otherwise (partial chunks at sequence /
        epoch / stream boundaries reuse the per-window program so only two
        compiled programs exist)."""
        nonlocal states, hm_dev
        if not pending:
            return
        full = len(pending) == chunk

        def up(stack):  # [K, B, ...] upload, batch axis over the mesh
            a = np.stack(stack)
            return (jax.device_put(a, chunk_shd) if chunk_shd is not None
                    else jnp.asarray(a))

        if metrics_chunk_fn is not None and full:
            vs, cs = zip(*(encode_wire(p) for p in pending))
            voxels = up(vs) if vs[0] is not None else None
            cnts = up(cs) if cs[0] is not None else None
            # metric inputs ride UP the wire instead of flow maps riding
            # down: GT f32 (exactness), event mask as its boolean (all the
            # metrics read, loss/flow.py:621-634) in uint8 — or not at all
            # when the derive_mask contract lets the chip rebuild it from
            # the count wire (cnt encoding, unpooled, unsigned)
            gts = up([np.asarray(p["gtflow"], np.float32) for p in pending])
            ems = None if (encoding == "cnt" and compact_wire) else up([
                (np.asarray(p["event_mask"])[..., 0] > 0).astype(np.uint8)
                for p in pending
            ])
            dtg = up([np.asarray(p["dt_gt"], np.float32).reshape(-1)
                      for p in pending])
            dti = up([np.asarray(p["dt_input"], np.float32).reshape(-1)
                      for p in pending])
            if hm_dev is None:
                hm_dev = {}
                if want_heatmaps:
                    # error maps live at the metric-input resolution: GT res
                    # when keep_gt_full_res upsamples in-graph, model res
                    # otherwise; merged to std_res at save time
                    res_hm = (tuple(gts.shape[3:5]) if keep_gt_full_res
                              else (H, W))
                    for i, mname in enumerate(names):
                        if mname in ("AEE", "AAE", "NAAE"):
                            hm_dev[str(i)] = (
                                jnp.zeros(res_hm, jnp.float32),
                                jnp.zeros(res_hm, jnp.float32),
                            )
            vals, acts, states, hm_dev = metrics_chunk_fn(
                step_variables, voxels, cnts, states, gts, ems, dtg, dti,
                hm_dev,
            )
            # the ONLY per-chunk fetch: [K, B] scalars per metric (+ the
            # activity scalars); flow maps stay on the device. The fetch of
            # THIS chunk is deferred until the next one is dispatched
            # (depth-1 pipelining) — jit returns futures, so holding them
            # costs nothing and device_get later syncs exactly once
            inflight.append((list(pending), vals, acts))
            pending.clear()
            drain_inflight(keep=1)
            return
        # a non-fast dispatch processes its windows synchronously — older
        # in-flight chunks must accumulate first to keep stream order
        drain_inflight()
        if chunk_fn is not None and full:
            vs, cs = zip(*(encode_wire(p) for p in pending))
            voxels = up(vs) if vs[0] is not None else None
            cnts = up(cs) if cs[0] is not None else None
            flows_st, states, acts = chunk_fn(step_variables, voxels, cnts, states)
            # ONE fetch per chunk; the per-window protocol then runs on the
            # host CPU backend with no further device roundtrips
            flows_np = [np.asarray(f) for f in flows_st]
            acts_np = jax.device_get(acts) if acts is not None else None
            for k, b in enumerate(pending):
                flows_k = [f[k] for f in flows_np]
                act_k = (
                    {kk: vv[k] for kk, vv in acts_np.items()}
                    if acts_np is not None else None
                )
                process_window(b, flows_k, act_k, host=True)
        else:
            for b in pending:
                voxel, cnt = encode_wire(b)
                if batch_shd is not None:
                    voxel = (jax.device_put(voxel, batch_shd)
                             if voxel is not None else None)
                    cnt = (jax.device_put(cnt, batch_shd)
                           if cnt is not None else None)
                flows, states, activity = step_fn(step_variables, voxel, cnt, states)
                process_window(b, list(flows), activity)
        pending.clear()

    fetch = Prefetcher(data, depth=2)
    try:
        while True:
            batch = next(fetch)
            if batch["epoch_done"]:
                run_pending()
                drain_inflight()
                break
            if batch["new_seq"].any():
                # flush so carries reset BEFORE this window runs; in-flight
                # chunks must accumulate before idx_AEE / association resets
                run_pending()
                drain_inflight()
                activity_log = None
                states = _reset_slot_states(
                    states, state_model, batch["new_seq"], B, H, W
                )
                if batch_shd is not None:
                    states = _shard_states(states)
                # clear rolled-over slots' association state and restart
                # their AEE cadence. NB: association currently REPLACES the
                # whole window before every metric call, so the slot-masked
                # reset is future-proofing for accumulating association, not
                # load-bearing today (VERDICT r2 weak #5)
                for c in criteria:
                    c.reset(slots=batch["new_seq"])
                idx_AEE[np.asarray(batch["new_seq"])] = 0

            pending.append(batch)
            if len(pending) >= chunk:
                run_pending()
            if max_windows is not None:
                # windows_done lags by the in-flight chunk; drain before
                # testing the stop condition once the total could reach it
                if (windows_done
                        + B * sum(len(bs) for bs, _, _ in inflight)
                        >= max_windows):
                    drain_inflight()
                if windows_done >= max_windows:
                    run_pending()
                    drain_inflight()
                    break

    except KeyboardInterrupt:
        # close video writers cleanly on interrupt (eval_flow.py:344-348)
        print("Evaluation interrupted. Closing video files...")
    finally:
        # join the prefetch worker BEFORE closing the HDF5 files it reads
        fetch.close()
    drain_inflight()  # at most one chunk (KeyboardInterrupt mid-pipeline)
    data.close()
    if vis is not None:
        vis.close_videos()
    if log_activity and activity_log and not debug:
        from evflow.utils.viz import vis_activity

        vis_activity({}, activity_log,
                     save_path=os.path.join(path_results, "activity.png"))

    results: Dict[str, Dict[str, str]] = {}
    for mname in names:
        results[mname] = {}
        pct_key = mname + "_percent"
        has_pct = any(
            mname in v and v[mname]["it"] and criteria[names.index(mname)].has_percent
            for v in val_results.values()
        )
        if has_pct:
            results[pct_key] = {}
        for fname, v in val_results.items():
            if mname not in v or v[mname]["it"] == 0:
                continue
            results[mname][fname] = str(v[mname]["metric"] / v[mname]["it"])
            if has_pct:
                results[pct_key][fname] = str(v[mname]["percent"] / v[mname]["it"])

    if hm_dev:
        # fold the device-accumulated heatmaps into the criteria aggregates
        # (partial chunks accumulated host-side into the same aggregates)
        for i, crit in enumerate(criteria):
            if str(i) in hm_dev:
                e_dev, c_dev = hm_dev[str(i)]
                crit.merge_aggregated(np.asarray(e_dev), np.asarray(c_dev))

    if not debug and names:
        log_results(runid, results, path_results, eval_id)
        if metrics_cfg.get("heat_map", False):
            heat_dir = os.path.join(path_results, "heatmaps")
            os.makedirs(heat_dir, exist_ok=True)
            for i, mname in enumerate(names):
                if mname in ("AEE", "AAE", "NAAE"):
                    criteria[i].save_error_heatmap(
                        os.path.join(heat_dir, f"{mname}_heatmap.png"),
                        title=f"Aggregated {mname} Error Distribution",
                    )

    if collect_vis:
        return results, vis_frames
    return results
