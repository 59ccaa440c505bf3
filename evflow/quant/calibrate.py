"""PTQ calibration: activation-scale collection, membrane-range profiling,
per-layer auto-tuned state quantization.

Behavioral reference: eval_flow.py:31-47 (``calibrate_model``: run N batches
with quantization observing), eval_flow_quant.py:186-463
(``profile_membrane_ranges``: disable state quant, stream membrane samples,
percentile/IQR analysis, per-layer range recommendation) and :466-581
(``apply_per_layer_quantization_ranges``) and :584-880
(``calibrate_model_ptq`` modes: full / conv-only / states-only).

TPU design: profiling statistics are computed on device (per-layer membrane
min/max and a fixed-width histogram as scan outputs of the jitted forward),
only tiny summaries come back to host; percentiles are evaluated from the
histogram instead of sampling 10k values per batch to host memory.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evflow.quant.fake_quant import state_quant_from_range

__all__ = [
    "collect_activation_scales",
    "profile_membrane_ranges",
    "recommend_ranges",
    "build_per_layer_state_quants",
    "calibrate_model_ptq",
]

# histogram support for membrane profiling: [-300, 10] covers the reference's
# observed ranges (default quant range is [-250, 1])
_HIST_LO, _HIST_HI, _HIST_BINS = -300.0, 10.0, 1024


def _membrane_stats(states) -> Dict[str, jax.Array]:
    """Per-unit histogram + min/max of membrane values (device-side)."""
    out = {}
    for i, st in enumerate(states):
        mem = st.mem
        hist = jnp.histogram(
            jnp.clip(mem, _HIST_LO, _HIST_HI), bins=_HIST_BINS,
            range=(_HIST_LO, _HIST_HI),
        )[0]
        out[str(i)] = {
            "hist": hist,
            "min": mem.min(),
            "max": mem.max(),
        }
    return out


def profile_membrane_ranges(
    model,
    variables,
    stream,
    num_batches: int = 100,
) -> Dict[str, Dict[str, float]]:
    """Stream batches through the (unquantized) model collecting per-layer
    membrane statistics; returns summary dicts per unit index."""
    loader = stream.config["loader"]
    B = int(loader.get("batch_size", 1))
    H, W = loader["resolution"]
    states = model.init_states(B, H, W)

    @jax.jit
    def step(variables, voxel, cnt, states):
        out, new_states = model.apply(variables, voxel, cnt, states, train=False)
        return new_states, _membrane_stats(new_states)

    agg: Dict[str, Dict[str, Any]] = {}
    for _ in range(num_batches):
        batch = stream.next_batch()
        if batch["epoch_done"]:
            break
        if batch["new_seq"].any():
            stream.new_seq = False
            states = model.init_states(B, H, W)
        states, stats = step(
            variables,
            jnp.asarray(batch["event_voxel"]),
            jnp.asarray(batch["event_cnt"]),
            states,
        )
        stats = jax.device_get(stats)
        for k, s in stats.items():
            if k not in agg:
                agg[k] = {"hist": np.zeros(_HIST_BINS), "min": np.inf, "max": -np.inf}
            agg[k]["hist"] += np.asarray(s["hist"], np.float64)
            agg[k]["min"] = min(agg[k]["min"], float(s["min"]))
            agg[k]["max"] = max(agg[k]["max"], float(s["max"]))

    edges = np.linspace(_HIST_LO, _HIST_HI, _HIST_BINS + 1)
    centers = (edges[:-1] + edges[1:]) / 2
    out = {}
    for k, s in agg.items():
        h = s["hist"]
        total = h.sum()
        if total == 0:
            out[k] = {"min": 0.0, "max": 0.0, "p01": 0.0, "p2_5": 0.0, "p50": 0.0,
                      "p97_5": 0.0, "p99": 0.0, "mean": 0.0}
            continue
        cdf = np.cumsum(h) / total

        def pct(q):
            return float(centers[np.searchsorted(cdf, q, side="left").clip(0, _HIST_BINS - 1)])

        out[k] = {
            "min": s["min"],
            "max": s["max"],
            "p01": pct(0.01),
            "p2_5": pct(0.025),
            "p50": pct(0.50),
            "p97_5": pct(0.975),
            "p99": pct(0.99),
            "mean": float((h * centers).sum() / total),
        }
    return out


def recommend_ranges(
    profiles: Dict[str, Dict[str, float]],
    floor: float = -15.0,
    hard_min: float = -250.0,
    upper: float = 1.0,
) -> Dict[str, Tuple[float, float]]:
    """Per-layer quantization range from profiled percentiles.

    Mirrors the reference auto-tune policy (eval_flow_quant.py:466-581):
    lower bound = P2.5 of the membrane distribution, floored at ``floor``
    (never shallower than -15) and clipped at ``hard_min`` (never below
    -250); upper bound kept at the spike-reset ceiling."""
    out = {}
    for k, p in profiles.items():
        lo = min(p["p2_5"], floor)
        lo = max(lo, hard_min)
        out[k] = (float(lo), float(upper))
    return out


def build_per_layer_state_quants(
    ranges: Dict[str, Tuple[float, float]], num_units: int, num_bits: int = 8
):
    """Tuple of per-unit state-quant callables for FireNet(state_quant_per_layer)."""
    quants: List[Optional[Any]] = []
    for i in range(num_units):
        r = ranges.get(str(i))
        quants.append(state_quant_from_range(*r, num_bits) if r else None)
    return tuple(quants)


def collect_activation_scales(
    model, variables, stream, num_batches: int = 50, num_bits: int = 8
) -> Dict[str, float]:
    """Collect per-layer conv input/output absmax scales over calibration
    batches (the reference's brevitas ``calibration_mode`` pass,
    eval_flow.py:31-47 / eval_flow_quant.py:584-880).

    Returns ``{"<unit>/input": s, "<unit>/output": s, ..., "pred/...": s}``
    keyed exactly as :func:`evflow.quant.fake_quant.static_conv_quant` hooks
    look scales up. ``output`` covers the unit's ff (and rec) conv outputs;
    ``input`` is the tensor entering the unit's convs (raw event counts for
    the head, previous-unit spikes elsewhere)."""
    loader = stream.config["loader"]
    B = int(loader.get("batch_size", 1))
    H, W = loader["resolution"]
    # probe with a plain conv impl: the fused dypack_int8 path exposes its
    # kernels through _KernelHolder modules whose __call__ returns the RAW
    # WEIGHT (cells.py:311-331) — the capture filter would record weight
    # absmax as the activation scale. im2col is f32-exact to lax conv
    # (tests/test_models.py), so the collected scales match any impl.
    if getattr(model, "conv_impl", "auto") == "dypack_int8":
        model = model.clone(conv_impl="im2col")
    states = model.init_states(B, H, W)

    qmax = 2 ** (num_bits - 1) - 1
    maxima: Dict[str, float] = {}

    def bump(key: str, m: float):
        maxima[key] = max(maxima.get(key, 0.0), m)

    @jax.jit
    def step(variables, voxel, cnt, states):
        (out, new_states), inter = model.apply(
            variables, voxel, cnt, states, train=False,
            capture_intermediates=lambda mdl, name: name == "__call__",
        )
        return new_states, inter["intermediates"]

    units = list(model.unit_names)
    for _ in range(num_batches):
        batch = stream.next_batch()
        if batch["epoch_done"]:
            break
        if batch["new_seq"].any():
            stream.new_seq = False
            states = model.init_states(B, H, W)
        cnt = jnp.asarray(batch["event_cnt"])
        voxel = (
            jnp.asarray(batch["event_voxel"])
            if getattr(model, "encoding", "cnt") == "voxel" else None
        )
        states, inter = step(variables, voxel, cnt, states)
        head_in = voxel if voxel is not None else cnt
        bump(f"{units[0]}/input", float(np.max(np.abs(np.asarray(head_in)))))
        flat = jax.tree_util.tree_flatten_with_path(jax.device_get(inter))[0]
        taps = {}
        for path, v in flat:
            if not hasattr(v, "shape"):
                continue
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            taps[name] = float(np.max(np.abs(v)))
        for i, u in enumerate(units):
            out_m = max(
                taps.get(f"{u}/ff/__call__/[0]", 0.0),
                taps.get(f"{u}/rec/__call__/[0]", 0.0),
            )
            bump(f"{u}/output", out_m)
            spk_m = taps.get(f"{u}/__call__/[0]/[0]", 0.0)
            nxt = units[i + 1] if i + 1 < len(units) else "pred"
            bump(f"{nxt}/input", spk_m)
        bump("pred/output", taps.get("pred/conv2d/__call__/[0]", 0.0))
    for u in units:  # a zero output scale means the tap was never captured
        if maxima.get(f"{u}/output", 0.0) <= 0.0:
            raise RuntimeError(
                f"calibration captured no conv output for unit {u!r} — "
                "intermediate capture names changed?"
            )
    return {k: v / qmax for k, v in maxima.items()}


def calibrate_model_ptq(
    config: Dict[str, Any],
    variables,
    mode: str = "full",
    num_batches: int = 50,
    auto_tune: bool = False,
    profile_batches: int = 100,
):
    """Build a PTQ-quantized model from an FP32 model + calibration data.

    Modes (eval_flow_quant.py:584-880):
      'full'        — int8 conv weights/acts + int8 membrane state;
      'conv_only'   — int8 convs, fp32 membranes;
      'states_only' — fp32 convs, int8 membranes (hybrid with QAT convs).
    With ``auto_tune``, membrane ranges are profiled per layer and the
    default [-250, 1] is replaced by the recommended ranges.

    Conv activation quantization is *calibrated static-scale* by default
    (the reference's brevitas ``calibration_mode`` over ``num_batches``
    batches, eval_flow.py:31-47): per-unit input/output scales are collected
    with :func:`collect_activation_scales` and installed as
    :func:`static_conv_quant` hooks per layer. Pass ``num_batches=0`` to
    fall back to per-batch dynamic-absmax quantization instead.

    Returns (quantized_model, variables) — the model is rebuilt with quant
    hooks; parameters are unchanged (fake-quant happens in the forward).
    """
    from evflow import registry
    from evflow.data.h5_stream import H5EventStream
    from evflow.quant.fake_quant import (
        dynamic_conv_quant,
        state_quant_fn,
        static_conv_quant,
    )

    model_cfg = dict(config["model"])
    base_model = registry.build_model(model_cfg)

    want_states = mode in ("full", "states_only")
    want_convs = mode in ("full", "conv_only")

    state_quant = None
    per_layer = None
    if want_states:
        if auto_tune:
            stream = H5EventStream(config, model_cfg.get("num_bins", 2))
            profiles = profile_membrane_ranges(
                base_model, variables, stream, num_batches=profile_batches
            )
            stream.close()
            ranges = recommend_ranges(profiles)
            per_layer = build_per_layer_state_quants(ranges, base_model.num_units)
        else:
            state_quant = state_quant_fn()

    conv_quant = None
    conv_quant_per_layer = None
    if want_convs:
        if num_batches > 0:
            stream = H5EventStream(config, model_cfg.get("num_bins", 2))
            scales = collect_activation_scales(
                base_model, variables, stream, num_batches=num_batches
            )
            stream.close()
            conv_quant_per_layer = tuple(
                static_conv_quant(scales, layer=u)
                for u in (*base_model.unit_names, "pred")
            )
        else:
            conv_quant = dynamic_conv_quant()

    qmodel = base_model.clone(
        state_quant=state_quant,
        state_quant_per_layer=per_layer,
        conv_fake_quant=conv_quant,
        conv_fake_quant_per_layer=conv_quant_per_layer,
    )
    return qmodel, variables
