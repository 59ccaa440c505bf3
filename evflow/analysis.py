"""Analysis & profiling: voltage dynamics, spike statistics, IWE demos.

Behavioral reference: analyze_voltage_dynamics.py (VoltageProfiler :33-241,
analyze_model :244-361, report :364-678), tools/demo_iwe.py (brute-force
contrast-maximization heatmap :20-116), tools/compare_dynrange.py,
tools/compare_inits.py.

TPU design: instead of forward hooks mutating python state, statistics are
computed on device from the explicit state pytree each step (one jitted
reduction per window) and streamed into Welford accumulators on host.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evflow.ops.iwe import deblur_events

__all__ = ["VoltageProfiler", "analyze_model", "contrast_heatmap",
           "activity_vs_window", "ops_report"]


@jax.jit
def _state_summary(states):
    """Per-unit membrane stats + per-channel/neuron spike indicators."""
    out = []
    for st in states:
        mem, spk = st.mem, st.spk
        out.append(
            {
                "mem_min": mem.min(),
                "mem_max": mem.max(),
                "mem_sum": mem.sum(),
                "mem_sumsq": (mem * mem).sum(),
                "mem_count": jnp.float32(mem.size),
                "spike_channel": spk.mean(axis=(0, 1, 2)),  # [C] rate this step
                "spike_neuron_any": (spk > 0).any(axis=0),  # [H, W, C]
                "spike_rate": spk.mean(),
            }
        )
    return out


class VoltageProfiler:
    """Streaming membrane/spike statistics over an evaluation run.

    Equivalent of the forward-hook profiler at
    analyze_voltage_dynamics.py:33-241: per-unit membrane min/max/mean/std,
    per-channel mean spike rates, per-neuron ever-spiked masks and
    dead-neuron counts.
    """

    def __init__(self, unit_names: Sequence[str]):
        self.unit_names = list(unit_names)
        n = len(self.unit_names)
        self.mem_min = [np.inf] * n
        self.mem_max = [-np.inf] * n
        self.mem_sum = [0.0] * n
        self.mem_sumsq = [0.0] * n
        self.mem_count = [0.0] * n
        self.spike_channel_sum: List[Optional[np.ndarray]] = [None] * n
        self.neuron_ever_spiked: List[Optional[np.ndarray]] = [None] * n
        self.spike_rate_sum = [0.0] * n
        self.steps = 0

    def update(self, states):
        stats = jax.device_get(_state_summary(states))
        for i, s in enumerate(stats):
            self.mem_min[i] = min(self.mem_min[i], float(s["mem_min"]))
            self.mem_max[i] = max(self.mem_max[i], float(s["mem_max"]))
            self.mem_sum[i] += float(s["mem_sum"])
            self.mem_sumsq[i] += float(s["mem_sumsq"])
            self.mem_count[i] += float(s["mem_count"])
            ch = np.asarray(s["spike_channel"])
            self.spike_channel_sum[i] = (
                ch if self.spike_channel_sum[i] is None else self.spike_channel_sum[i] + ch
            )
            ever = np.asarray(s["spike_neuron_any"])
            self.neuron_ever_spiked[i] = (
                ever
                if self.neuron_ever_spiked[i] is None
                else (self.neuron_ever_spiked[i] | ever)
            )
            self.spike_rate_sum[i] += float(s["spike_rate"])
        self.steps += 1

    def report(self) -> Dict[str, Dict[str, object]]:
        out = {}
        for i, name in enumerate(self.unit_names):
            if self.mem_count[i] == 0:
                continue
            mean = self.mem_sum[i] / self.mem_count[i]
            var = max(0.0, self.mem_sumsq[i] / self.mem_count[i] - mean * mean)
            ch_rate = (
                self.spike_channel_sum[i] / max(1, self.steps)
                if self.spike_channel_sum[i] is not None
                else None
            )
            ever = self.neuron_ever_spiked[i]
            out[name] = {
                "mem_min": self.mem_min[i],
                "mem_max": self.mem_max[i],
                "mem_mean": mean,
                "mem_std": float(np.sqrt(var)),
                "spike_rate": self.spike_rate_sum[i] / max(1, self.steps),
                "channel_spike_rate": ch_rate,
                "dead_channels": int((ch_rate == 0).sum()) if ch_rate is not None else 0,
                "dead_neurons": int((~ever).sum()) if ever is not None else 0,
                "total_neurons": int(ever.size) if ever is not None else 0,
            }
        return out

    def print_table(self):
        rep = self.report()
        print(f"{'unit':8s} {'mem_min':>9s} {'mem_max':>9s} {'mem_mean':>9s} "
              f"{'mem_std':>8s} {'spk_rate':>8s} {'dead_ch':>7s} {'dead_n':>8s}")
        for name, r in rep.items():
            print(
                f"{name:8s} {r['mem_min']:9.3f} {r['mem_max']:9.3f} "
                f"{r['mem_mean']:9.4f} {r['mem_std']:8.4f} {r['spike_rate']:8.4f} "
                f"{r['dead_channels']:7d} {r['dead_neurons']:8d}"
            )


def ops_report(model, height: int, width: int,
               activity: Optional[Dict[str, Dict[str, object]]] = None,
               input_density: Optional[float] = None,
               verbose: bool = True) -> Dict[str, object]:
    """Synaptic-operation accounting per event window: dense vs event-driven.

    The SNN efficiency argument (the reference's activity analysis,
    analyze_voltage_dynamics.py:364-678, exists to support it) is that
    spikes are sparse, so event-driven hardware performs only
    ``presynaptic_activity x fan-out`` synaptic ops while dense hardware
    (the TPU MXU) always performs the full conv MACs. This report computes
    both for the FireNet topology at ``height x width``:

      * dense MACs/window per unit: ``H*W*k^2*Cin*Cout`` (+ the recurrent
        conv for G1/G2; + the 1x1 pred head);
      * effective synaptic ops/window: the same fan-out gated by the
        measured presynaptic activity — ``input_density`` (mean activations
        per input element: each event drives one fan-out, so multi-event
        pixels count multiply and the gate can exceed 1) for the head,
        unit i-1's mean spike rate for unit i, the unit's own rate for its
        recurrent conv. All gates share the per-element convention of
        ``spk.mean()`` over {0,1} spikes.

    ``activity`` is a :meth:`VoltageProfiler.report` dict (from
    :func:`analyze_model`); without it only dense counts are reported.
    Returns per-unit and total counts; prints a table when ``verbose``.
    """
    from evflow.models.firenet import FireNet
    from evflow.models.unet import SpikingRecEVFlowNet

    if isinstance(model, SpikingRecEVFlowNet):
        return _ops_report_unet(model, height, width, activity=activity,
                                input_density=input_density, verbose=verbose)
    if not isinstance(model, FireNet):
        raise ValueError(
            "ops_report models the FireNet family's uniform-width unit "
            "chain and the SpikingRecEVFlowNet UNet; "
            f"{type(model).__name__} has a different topology"
        )
    C = model.base_num_channels
    k2 = model.kernel_size ** 2
    hw = height * width
    rec_units = {"G1", "G2"} if getattr(model, "recurrent", False) else set()
    names = list(model.unit_names)
    rates = {n: float(activity[n]["spike_rate"]) for n in activity} if activity else {}

    units: Dict[str, Dict[str, float]] = {}
    total_dense = total_eff = 0.0
    for i, name in enumerate(names):
        cin = model.num_bins if i == 0 else C
        dense = hw * k2 * cin * C
        pre = input_density if i == 0 else rates.get(names[i - 1])
        eff = dense * pre if pre is not None else None
        if name in rec_units:
            dense_rec = hw * k2 * C * C
            dense += dense_rec
            own = rates.get(name)
            if eff is not None and own is not None:
                eff += dense_rec * own
            elif eff is not None:
                eff = None
        units[name] = {"dense_macs": dense, "effective_ops": eff}
        total_dense += dense
        total_eff = total_eff + eff if (eff is not None and total_eff is not None) else None
    pred_dense = hw * C * 2
    pred_pre = rates.get(names[-1])
    pred_eff = pred_dense * pred_pre if pred_pre is not None else None
    units["pred"] = {"dense_macs": pred_dense, "effective_ops": pred_eff}
    total_dense += pred_dense
    if total_eff is not None and pred_eff is not None:
        total_eff += pred_eff
    else:
        total_eff = None

    out = {
        "units": units,
        "dense_macs_per_window": total_dense,
        "effective_ops_per_window": total_eff,
        "sparsity_speedup": (total_dense / total_eff)
        if total_eff else None,
    }
    if verbose:
        print(f"{'unit':8s} {'dense MMAC':>11s} {'eff MOP':>9s} {'gate':>6s}")
        for name, u in units.items():
            eff = u["effective_ops"]
            gate = (eff / u["dense_macs"]) if eff is not None else float("nan")
            print(f"{name:8s} {u['dense_macs'] / 1e6:11.2f} "
                  f"{(eff / 1e6) if eff is not None else float('nan'):9.3f} "
                  f"{gate:6.3f}")
        if total_eff:
            print(f"total    {total_dense / 1e6:11.2f} {total_eff / 1e6:9.3f}"
                  f"   event-driven sparsity: {total_dense / total_eff:.1f}x")
    return out


def _ops_report_unet(model, height: int, width: int,
                     activity: Optional[Dict[str, Dict[str, object]]] = None,
                     input_density: Optional[float] = None,
                     verbose: bool = True) -> Dict[str, object]:
    """Synaptic-operation accounting for the SpikingRecEVFlowNet UNet.

    Same convention as the FireNet report (``spk.mean()`` per-element
    gates from :class:`VoltageProfiler`, keyed by the model's
    ``unit_names`` state slots), walked over the encoder/resblock/decoder
    channel plan at the CropParameters-padded resolution. Two gate classes:

      * MEASURED — the conv input is a cell's spike map (or the event
        grid): gate = that source's mean rate (or ``input_density``).
      * BOUND (marked ``*``) — the conv input is a residual sum or a
        bilinear-upsampled concat, whose nonzero fraction is not derivable
        from per-cell rates alone: residual sums use the union bound
        ``min(1, r_a + r_b)``; bilinear x2 spreads each nonzero source
        pixel over at most 4 output pixels, so upsampled inputs use
        ``min(1, 4 * q)`` on the channel-weighted source occupancy ``q``
        (prediction-feedback channels count as dense, q=1). Bounds make
        the reported event-driven speedup CONSERVATIVE.
    """
    from evflow.models.unet import CropParameters

    E, R = model.num_encoders, model.num_residual_blocks
    C = model.base_num_channels
    k2 = model.kernel_size ** 2
    crop = CropParameters(width, height, E)
    hp, wp = crop.height_crop, crop.width_crop
    rates = ({n: float(activity[n]["spike_rate"]) for n in activity}
             if activity else {})

    def r(name):
        return rates.get(name)

    units: Dict[str, Dict[str, object]] = {}

    def add(name, dense, gate, bound=False):
        eff = dense * gate if gate is not None else None
        units[name] = {"dense_macs": float(dense), "effective_ops": eff,
                       "gate_is_bound": bound}

    for i in range(E):
        cin = model.num_bins if i == 0 else C * 2 ** i
        cout = C * 2 ** (i + 1)
        hw = (hp >> (i + 1)) * (wp >> (i + 1))
        add(f"enc{i}.conv", hw * k2 * cin * cout,
            input_density if i == 0 else r(f"enc{i - 1}.rec"))
        g_ff, g_rec = r(f"enc{i}.conv"), r(f"enc{i}.rec")
        dense_half = hw * k2 * cout * cout
        eff = (dense_half * g_ff + dense_half * g_rec
               if g_ff is not None and g_rec is not None else None)
        units[f"enc{i}.rec"] = {"dense_macs": float(2 * dense_half),
                                "effective_ops": eff, "gate_is_bound": False}

    cmax = C * 2 ** E
    hwb = (hp >> E) * (wp >> E)
    occ_in = r(f"enc{E - 1}.rec")  # occupancy of the current resblock input
    for i in range(R):
        dense = hwb * k2 * cmax * cmax
        add(f"res{i}.c1", dense, occ_in, bound=i > 0)
        add(f"res{i}.c2", dense, r(f"res{i}.c1"))
        # next block consumes z2 + residual: union bound on nonzero fraction
        occ_in = (min(1.0, r(f"res{i}.c2") + occ_in)
                  if r(f"res{i}.c2") is not None and occ_in is not None
                  else None)

    out_sizes = [C * 2 ** (j + 1) for j in range(E)]
    in_sizes = [C * 2 ** j for j in range(E)]
    occ_x = occ_in  # decoder chain input occupancy (pre-upsample)
    for i in range(E):
        cx = list(reversed(out_sizes))[i]
        cout = list(reversed(in_sizes))[i]
        cin = 2 * cx + (0 if i == 0 else 2)
        hw = (hp >> (E - 1 - i)) * (wp >> (E - 1 - i))
        g_block = r(f"enc{E - i - 1}.rec")
        if occ_x is not None and g_block is not None:
            q = (cx * occ_x + cx * g_block + (0 if i == 0 else 2 * 1.0)) / cin
            gate = min(1.0, 4.0 * q)  # bilinear x2 spread bound
        else:
            gate = None
        add(f"dec{i}", hw * k2 * cin * cout, gate, bound=True)
        occ_x = r(f"dec{i}")
        add(f"pred{i}", hw * cout * 2, r(f"dec{i}"))  # 1x1 flow head

    total_dense = sum(u["dense_macs"] for u in units.values())
    effs = [u["effective_ops"] for u in units.values()]
    total_eff = sum(effs) if all(e is not None for e in effs) else None
    out = {
        "units": units,
        "dense_macs_per_window": total_dense,
        "effective_ops_per_window": total_eff,
        "sparsity_speedup": (total_dense / total_eff) if total_eff else None,
    }
    if verbose:
        print(f"{'unit':10s} {'dense MMAC':>11s} {'eff MOP':>9s} {'gate':>7s}")
        for name, u in units.items():
            eff = u["effective_ops"]
            gate = (eff / u["dense_macs"]) if eff is not None else float("nan")
            mark = "*" if u["gate_is_bound"] else " "
            print(f"{name:10s} {u['dense_macs'] / 1e6:11.2f} "
                  f"{(eff / 1e6) if eff is not None else float('nan'):9.3f} "
                  f"{gate:6.3f}{mark}")
        if total_eff:
            print(f"total      {total_dense / 1e6:11.2f} {total_eff / 1e6:9.3f}"
                  f"   event-driven sparsity: {total_dense / total_eff:.1f}x "
                  f"(* = conservative bound gates)")
    return out


def analyze_model(model, variables, stream, num_batches: int = 100,
                  verbose: bool = True, ops: bool = False):
    """Stream batches and profile voltage dynamics
    (analyze_voltage_dynamics.py:244-361). With ``ops=True`` also print the
    dense-vs-event-driven synaptic-operation report (:func:`ops_report`)
    using the measured spike rates and input occupancy."""
    if ops:
        # fail BEFORE streaming num_batches: ops_report models the FireNet
        # and SpikingRecEVFlowNet topologies, and a terminal raise would
        # waste the whole run
        from evflow.models.firenet import FireNet
        from evflow.models.unet import SpikingRecEVFlowNet

        if not isinstance(model, (FireNet, SpikingRecEVFlowNet)):
            raise ValueError(
                "ops=True requires a FireNet-family or SpikingRecEVFlowNet "
                f"model (ops_report models those topologies); got "
                f"{type(model).__name__}"
            )
    loader = stream.config["loader"]
    B = int(loader.get("batch_size", 1))
    H, W = loader["resolution"]
    states = model.init_states(B, H, W)
    profiler = VoltageProfiler(model.unit_names)
    occ_sum, occ_n = 0.0, 0

    @jax.jit
    def step(variables, voxel, cnt, states):
        out, new_states = model.apply(variables, voxel, cnt, states, train=False)
        # mean activations per input element — the same convention as the
        # downstream gates (spk.mean() over {0,1} spikes): each input EVENT
        # drives one fan-out of synaptic work, so multi-event pixels count
        # multiply and single-polarity pixels count once, not per-channel
        occupancy = jnp.abs(cnt).mean()
        return new_states, occupancy

    for _ in range(num_batches):
        batch = stream.next_batch()
        if batch["epoch_done"]:
            break
        if batch["new_seq"].any():
            stream.new_seq = False
            states = model.init_states(B, H, W)
        states, occupancy = step(
            variables,
            jnp.asarray(batch["event_voxel"]),
            jnp.asarray(batch["event_cnt"]),
            states,
        )
        occ_sum += float(occupancy)
        occ_n += 1
        profiler.update(states)

    if verbose:
        profiler.print_table()
    if ops:
        ops_report(model, H, W, activity=profiler.report(),
                   input_density=occ_sum / max(1, occ_n), verbose=verbose)
    return profiler


def contrast_heatmap(
    events: np.ndarray,
    res: Tuple[int, int],
    flow_range: Tuple[float, float] = (-1.0, 1.0),
    steps: int = 21,
    flow_scaling: float = 128,
) -> np.ndarray:
    """Brute-force contrast-maximization landscape (tools/demo_iwe.py:20-116):
    for a grid of constant (fx, fy) flows, warp the events and measure image
    contrast (variance of the IWE). Returns [steps, steps] contrast values;
    the max should be at the true flow.
    """
    H, W = res
    fxs = np.linspace(*flow_range, steps)
    ev = jnp.asarray(events[None] if events.ndim == 2 else events)
    heat = np.zeros((steps, steps), np.float32)
    for i, fy in enumerate(fxs):
        for j, fx in enumerate(fxs):
            fm = jnp.zeros((1, H, W, 2), jnp.float32).at[..., 0].set(fx).at[..., 1].set(fy)
            iwe = deblur_events(fm, ev, res, flow_scaling=flow_scaling, round_idx=False)
            heat[i, j] = float(jnp.var(iwe))
    return heat


def activity_vs_window(model, variables, stream_factory, windows: Sequence[int],
                       num_batches: int = 20) -> Dict[int, float]:
    """Mean spike activity as a function of event-window size
    (tools/compare_dynrange.py behavior)."""
    out = {}
    for w in windows:
        stream = stream_factory(w)
        loader = stream.config["loader"]
        B = int(loader.get("batch_size", 1))
        H, Wd = loader["resolution"]
        states = model.init_states(B, H, Wd)
        total, n = 0.0, 0
        for _ in range(num_batches):
            batch = stream.next_batch()
            if batch["epoch_done"]:
                break
            if batch["new_seq"].any():
                stream.new_seq = False
                states = model.init_states(B, H, Wd)
            out_, states = model.apply(
                variables,
                jnp.asarray(batch["event_voxel"]),
                jnp.asarray(batch["event_cnt"]),
                states,
                log=True,
            )
            acts = [v for k, v in out_["activity"].items() if not k.startswith("0:")]
            total += float(np.mean([float(a) for a in acts]))
            n += 1
        stream.close()
        out[w] = total / max(1, n)
    return out
