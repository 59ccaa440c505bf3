"""Int8 deployment/serving engine for the FireNet family.

This is the TPU serving analog of the reference's quantized deployment
pipeline (eval_flow_quant.py PTQ modes + the Deeploy/ONNX int8 artifacts):
a trained FP32 checkpoint is prepared ONCE on the host — BatchNorm folded
into the conv kernels (eval running stats), weights quantized per output
channel to int8, leak/threshold clamped — and inference then runs with
every cross-layer tensor int8 at rest:

  * spikes are carried as int8 {0,1} — exact, no activation fake-quant;
  * conv GEMMs are dy-packed int8 x int8 -> int32 MXU dots
    (evflow/ops/dypack.py formulation) with hoisted, pre-quantized weights
    — nothing is re-quantized inside the streaming scan;
  * recurrent cells fuse their feedforward + recurrent convs into one
    K=6C dot (the two kernels share per-channel scales so the int32
    accumulator dequantizes with a single per-column multiply);
  * membranes are carried bf16, int8 on a per-channel asymmetric affine
    grid with an exact zero point (the PTQ states configuration; ranges
    from :func:`profile_mem_ranges`, mirroring the reference's membrane
    auto-tune, eval_flow_quant.py:186-581), or per-unit mixed
    (``"mixed"`` = bf16 head membrane, int8 elsewhere: the sensitivity
    sweep shows the head unit, which integrates raw event counts, is the
    sole source of the int8-membrane AEE penalty,
    benchmarks/deploy_aee_tiers.py --sweep). The default serving tier is
    ``mem_dtype="bfloat16"`` — best accuracy (+0.03% AEE) and, at the
    residency-optimal B=2, also the fastest (the int8-membrane
    quant/dequant arithmetic costs more than the state bytes it saves;
    BENCH_NOTES.md round 6). Prefer int8/mixed membranes when serving
    many streams per chip (B≥8), where state traffic binds again.

Accuracy: with integer event-count inputs and binary spikes, every GEMM is
EXACT in int32 — the only approximations are the per-channel weight
rounding (the reference's conv PTQ, eval_flow_quant.py:584-880) and, when
enabled, the int8 membrane grid (the reference's snntorch state_quant,
SNNtorch_spiking_submodules.py:190-208). tests/test_deploy.py pins both:
the engine matches the fake-quant flax path and holds AEE parity on the
synthetic gtflow protocol.

Measured on the round-3 probe (benchmarks/probe_int8_deploy.py): int8
spike carries + int8 membranes run the 9-conv chain at 1860 win/s-equiv
vs 1575 for the round-2 in-graph int8 path — at the chip's measured
effective HBM bandwidth (~740 GB/s) for the step's byte count.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evflow.export import fold_batchnorm_params
from evflow.ops.dypack import cols_dx, cols_dx_dual, dy_epilogue, pack_kernel_dy
from evflow.ops.lif import LIFState, THRESH_MIN, leaky_step

__all__ = [
    "Int8DeployEngine",
    "prepare_int8_params",
    "profile_mem_scales",
    "profile_mem_ranges",
    "save_engine",
]


def save_engine(engine: "Int8DeployEngine", path: str, serving=None) -> str:
    """Write the engine's prepared int8 parameters + config to one ``.npz``
    deployment artifact (loaded by :meth:`Int8DeployEngine.from_artifact`).
    bf16 tensors are stored as f32 (npz has no bfloat16) and restored to
    their recorded dtypes on load. The real-int8 analog of the reference's
    save_quantized_model state-dict artifact (utils/utils.py:125-184).

    ``serving`` optionally embeds a measured
    :class:`evflow.autotune.ServingConfig` (or its ``to_meta()`` dict) so
    serving hosts load the chip-tuned operating point with the weights;
    it defaults to the engine's own ``serving`` attribute when set."""
    import json

    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}

    def put(key, v):
        dt = str(v.dtype)
        dtypes[key] = dt
        # npz has no bfloat16 — store as f32, restore on load
        arrays[key] = np.asarray(v, np.float32) if dt == "bfloat16" else np.asarray(v)

    unit_keys = []
    for i, u in enumerate(engine.params["units"]):
        unit_keys.append(sorted(u.keys()))
        for k, v in u.items():
            put(f"unit{i}.{k}", v)
    put("pred_kernel", engine.params["pred_kernel"])
    if engine.params["pred_bias"] is not None:
        put("pred_bias", engine.params["pred_bias"])
    meta = {
        "num_units": engine.num_units,
        "unit_keys": unit_keys,
        "dtypes": dtypes,
        "mem_dtype": ["int8" if b else "bfloat16" for b in engine.unit_mem_int8],
        "input_scale": engine.input_scale,
        "model": engine.model.__class__.__name__,
    }
    if serving is None:
        serving = getattr(engine, "serving", None)
    if serving is not None:
        meta["serving"] = serving if isinstance(serving, dict) else serving.to_meta()
    if not path.endswith(".npz"):
        path = path + ".npz"  # np.savez appends it anyway; return the truth
    np.savez(path, __meta__=np.asarray(json.dumps(meta)), **arrays)
    return path


def profile_mem_scales(
    model,
    variables: Dict[str, Any],
    windows: Sequence[Any],
    margin: float = 1.1,
    floor: float = 1e-3,
    per_channel: bool = True,
    input_scale: float = 1.0,
) -> List[np.ndarray]:
    """Per-layer (optionally per-channel) symmetric membrane quant scales,
    profiled by streaming sample windows through the bf16-membrane engine —
    the deployment analog of the reference's membrane-range auto-tune
    (eval_flow_quant.py profile_membrane_ranges :186-463). Returns one
    ``[C]`` (or scalar) array per unit: ``absmax * margin / 127``."""
    ranges = profile_mem_ranges(model, variables, windows, margin=margin,
                                floor=floor, per_channel=per_channel,
                                input_scale=input_scale)
    return [np.maximum(np.abs(lo), np.abs(hi)) / 127.0 for lo, hi in ranges]


def profile_mem_ranges(
    model,
    variables: Dict[str, Any],
    windows: Sequence[Any],
    margin: float = 1.1,
    floor: float = 1e-3,
    per_channel: bool = True,
    input_scale: float = 1.0,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Per-layer per-channel membrane (lo, hi) ranges for ASYMMETRIC int8
    membranes. SNN membranes sit mostly below threshold (the reference's own
    default state_quant range is [-250, 1], SNNtorch_spiking_submodules.py
    :190-208), so an asymmetric grid nearly doubles the resolution near the
    firing threshold — where spike decisions happen. ``windows`` feed the
    model's own encoding (cnt or voxel; voxel needs ``input_scale``)."""
    probe = Int8DeployEngine(model, variables, input_scale=input_scale)
    x0 = np.asarray(windows[0])
    B, H, W, _ = x0.shape
    axes = (0, 1, 2) if per_channel else None
    is_cnt = probe.encoding == "cnt"

    @jax.jit
    def prof_step(params, x, states):
        _, new_states = probe.apply(
            params, None if is_cnt else x, x if is_cnt else None, states
        )
        mins = [jnp.min(s.mem.astype(jnp.float32), axis=axes) for s in new_states]
        maxs = [jnp.max(s.mem.astype(jnp.float32), axis=axes) for s in new_states]
        return new_states, mins, maxs

    states = probe.init_states(B, H, W)
    shape = probe.features if per_channel else ()
    lo = [np.zeros(shape) for _ in range(probe.num_units)]
    hi = [np.zeros(shape) for _ in range(probe.num_units)]
    for w in windows:
        states, mins, maxs = prof_step(probe.params, jnp.asarray(w), states)
        for i in range(probe.num_units):
            lo[i] = np.minimum(lo[i], np.asarray(mins[i]))
            hi[i] = np.maximum(hi[i], np.asarray(maxs[i]))
    out = []
    for l, h in zip(lo, hi):
        l = np.minimum(l * margin, -floor)
        h = np.maximum(h * margin, floor)
        out.append((l, h))
    return out


def _quantize_per_channel(kernel: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """HWIO kernel -> (int8 kernel, per-output-channel scale)."""
    absmax = np.max(np.abs(kernel), axis=(0, 1, 2))
    scale = np.maximum(absmax, 1e-12) / 127.0
    w_i8 = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
    return w_i8, scale.astype(np.float32)


def prepare_int8_params(
    model,
    variables: Dict[str, Any],
    mem_scales: Optional[Sequence[Any]] = None,
    mem_ranges: Optional[Sequence[Tuple[Any, Any]]] = None,
    input_scale: float = 1.0,
) -> Dict[str, Any]:
    """Fold + quantize trained FireNet variables into the engine's pytree.

    Host-side, runs once. Int8 membranes use either ``mem_scales`` (one
    symmetric scale — scalar or per-channel — per unit) or ``mem_ranges``
    (per-unit (lo, hi) arrays → asymmetric affine grid with an exact zero
    point; see :func:`profile_mem_ranges`).
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    rec_units = {"G1", "G2"} if model.recurrent else set()

    out: Dict[str, Any] = {"units": []}
    for i, name in enumerate(model.unit_names):
        p = params[name]
        bn = p["bn"]["BatchNorm_0"]
        bs = stats[name]["bn"]["BatchNorm_0"]
        fk, fb = fold_batchnorm_params(
            np.asarray(p["ff"]["kernel"], np.float32),
            np.asarray(bn["scale"], np.float32),
            np.asarray(bn["bias"], np.float32),
            np.asarray(bs["mean"], np.float32),
            np.asarray(bs["var"], np.float32),
        )
        unit: Dict[str, Any] = {}
        if name in rec_units:
            g = np.asarray(bn["scale"], np.float32) / np.sqrt(
                np.asarray(bs["var"], np.float32) + 1e-5
            )
            rk = np.asarray(p["rec"]["kernel"], np.float32) * g[None, None, None, :]
            # shared per-channel scale so ff+rec accumulate in one int32 dot
            absmax = np.maximum(
                np.max(np.abs(fk), axis=(0, 1, 2)), np.max(np.abs(rk), axis=(0, 1, 2))
            )
            scale = np.maximum(absmax, 1e-12) / 127.0
            wf = np.clip(np.round(fk / scale), -127, 127).astype(np.int8)
            wr = np.clip(np.round(rk / scale), -127, 127).astype(np.int8)
            unit["w"] = jnp.concatenate(
                [pack_kernel_dy(jnp.asarray(wf)), pack_kernel_dy(jnp.asarray(wr))],
                axis=0,
            )
        else:
            w_i8, scale = _quantize_per_channel(fk)
            unit["w"] = pack_kernel_dy(jnp.asarray(w_i8))
        # dequant scale per GEMM column [(dy, co)] = tile(scale, 3); the
        # head folds the input scale in as well
        col = np.tile(scale, 3) * (input_scale if i == 0 else 1.0)
        unit["col_scale"] = jnp.asarray(col, jnp.bfloat16)
        unit["bias"] = jnp.asarray(fb, jnp.bfloat16)
        unit["beta"] = jnp.asarray(
            np.clip(np.asarray(p["beta"], np.float32), 0.0, 1.0), jnp.bfloat16
        )
        unit["theta"] = jnp.asarray(
            np.maximum(np.asarray(p["threshold"], np.float32), THRESH_MIN),
            jnp.bfloat16,
        )
        if mem_ranges is not None:
            lo = np.asarray(mem_ranges[i][0], np.float32)
            hi = np.asarray(mem_ranges[i][1], np.float32)
            s = np.maximum(hi - lo, 1e-6) / 254.0
            zp = np.round(-127.0 - lo / s)  # integer zero point; mem=0 -> q=zp
            unit["mem_scale"] = jnp.asarray(s, jnp.float32)
            unit["mem_inv_scale"] = jnp.asarray(1.0 / s, jnp.float32)
            unit["mem_zp"] = jnp.asarray(zp, jnp.float32)
        elif mem_scales is not None:
            # scalar or per-channel [C]; broadcasts over [..., C] membranes
            s = np.asarray(mem_scales[i], np.float32)
            unit["mem_scale"] = jnp.asarray(s, jnp.float32)
            unit["mem_inv_scale"] = jnp.asarray(1.0 / np.maximum(s, 1e-12),
                                                jnp.float32)
            unit["mem_zp"] = jnp.asarray(np.zeros_like(s), jnp.float32)
        out["units"].append(unit)

    out["pred_kernel"] = jnp.asarray(
        np.asarray(params["pred"]["conv2d"]["kernel"], np.float32), jnp.bfloat16
    )
    pred_bias = params["pred"]["conv2d"].get("bias")
    out["pred_bias"] = (
        jnp.asarray(np.asarray(pred_bias, np.float32), jnp.bfloat16)
        if pred_bias is not None
        else None
    )
    return out


def _mem_dequant(mem: jax.Array, unit: Dict[str, Any]) -> jax.Array:
    """int8 (affine, exact zero point) -> bf16 membrane. Arithmetic in f32
    (fused elementwise; bf16 would mis-round near the grid edges)."""
    return ((mem.astype(jnp.float32) - unit["mem_zp"]) * unit["mem_scale"]).astype(
        jnp.bfloat16
    )


def _mem_quant(mem_out: jax.Array, unit: Dict[str, Any]) -> jax.Array:
    """bf16 membrane -> int8 affine storage.

    Multiplies by the precomputed reciprocal scale: the profiled step spends
    ~25% in these quant fusions and the f32 divide is the VPU term
    (benchmarks/profile_bench.py round-5 trace); ``mem_inv_scale`` is
    prepared host-side so the loop body carries no divides."""
    inv = unit.get("mem_inv_scale")
    if inv is None:  # pre-round-5 artifacts
        inv = 1.0 / unit["mem_scale"]
    return jnp.clip(
        jnp.round(mem_out.astype(jnp.float32) * inv) + unit["mem_zp"],
        -127, 127,
    ).astype(jnp.int8)


# the dy-pack indexing invariants live in ONE place — evflow/ops/dypack.py
# (cols_dx builds the dx patch buffer, cols_dx_dual the fused ff+rec buffer,
# dy_epilogue the row shift-add); the serving engine must stay bit-identical
# to the training-side formulation
_cols_dx_i8 = cols_dx
_cols_dx_dual_i8 = cols_dx_dual
_dy_shift_add = dy_epilogue


def _gemm_epilogue(cols: jax.Array, w: jax.Array, col_scale: jax.Array,
                   bias: jax.Array, B: int, H: int, W: int, C: int,
                   z_requant: Optional[jax.Array] = None,
                   z_scale: Optional[jax.Array] = None) -> jax.Array:
    """int8 GEMM -> int32 -> dequant -> dy shift-add -> +bias.

    With calibrated ``z_requant``/``z_scale`` (per GEMM column), the
    intermediate Z is requantized to int8 right at the dot output —
    halving the dominant HBM term of the step (Z write + the epilogue's
    3 shifted reads) at the cost of one more 8-bit grid
    (|error| <= z_scale/2 per tap before the dy-sum). NB: neither the int8
    requant chain nor a pure float8 convert fuses into the dot epilogue on
    this toolchain (measured: int8-Z 986, f8-Z 768 vs bf16-Z 2407 win/s —
    benchmarks/probe_f8_z.py), so bf16 Z is the fast path."""
    Zi = jax.lax.dot_general(
        cols.reshape(-1, cols.shape[-1]),
        w,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    if z_requant is not None:
        # all-bf16 requant chain so it can fuse into the dot's output
        # epilogue (an f32 intermediate forces the int32 Z to materialize)
        Zq = jnp.clip(
            jnp.round(Zi.astype(jnp.bfloat16) * z_requant.astype(jnp.bfloat16)),
            -127, 127,
        ).astype(jnp.int8).reshape(B, H, W, 3 * C)
        Z = Zq.astype(jnp.bfloat16) * z_scale
    else:
        Z = Zi.astype(jnp.bfloat16).reshape(B, H, W, 3 * C) * col_scale
    return _dy_shift_add(Z, H, C) + bias


class Int8DeployEngine:
    """Duck-types the FireNet model protocol (``init_states`` / ``apply``)
    so ``evflow.eval.evaluate(config, model=engine, variables=prepared)``
    runs the full AEE protocol on the quantized serving path.

    ``hard_reset``/``alpha`` mirror the training cell config; LIF dynamics
    reuse :func:`evflow.ops.lif.leaky_step` exactly (inference forward).
    """

    def __init__(
        self,
        model,
        variables: Optional[Dict[str, Any]],
        mem_dtype: Any = "bfloat16",
        mem_scales: Optional[Sequence[Any]] = None,
        mem_ranges: Optional[Sequence[Tuple[Any, Any]]] = None,
        input_scale: float = 1.0,
        _prepared: Optional[Dict[str, Any]] = None,
    ):
        if variables is None and _prepared is None:
            raise ValueError("need trained variables or a prepared artifact")
        if model.cell_family != "snn":
            raise ValueError("Int8DeployEngine supports the snn cell family")
        if model.norm_input:
            raise ValueError("norm_input is not supported on the int8 path")
        if model.tebn or model.mpbn:
            raise ValueError("TEBN/MPBN models are not supported on the int8 path")
        if model.kernel_size != 3:
            raise ValueError("the dy-packed int8 path requires 3x3 kernels")
        if model.encoding != "cnt" and input_scale == 1.0:
            raise ValueError(
                "voxel-encoding models need a calibrated input_scale: voxel "
                "values are fractional in (0, 1) and would be rounded to "
                "int8 on the unit grid, destroying the input signal"
            )
        # mem_dtype: one name for all units, "mixed", or a per-unit sequence
        # — the per-layer analog of the reference's per-layer membrane
        # strategy table (eval_flow_quant.py:186-463). "mixed" = bf16 head
        # membrane, int8 everywhere else: the membrane-sensitivity sweep
        # (benchmarks/deploy_aee_tiers.py --sweep) shows the head unit —
        # which integrates raw event counts — is the SOLE source of the
        # int8-membrane AEE penalty (+1.2% with head int8 in ANY combo vs
        # +0.12% with every non-head membrane int8).
        if mem_dtype == "mixed":
            per_unit = ("bfloat16",) + ("int8",) * (model.num_units - 1)
        elif isinstance(mem_dtype, str):
            per_unit = (mem_dtype,) * model.num_units
        else:
            per_unit = tuple(mem_dtype)
            if len(per_unit) != model.num_units:
                raise ValueError(
                    f"mem_dtype sequence must have {model.num_units} entries"
                )
        for d in per_unit:
            if d not in ("bfloat16", "int8"):
                raise ValueError(f"mem_dtype must be bfloat16 or int8, got {d!r}")
        if "int8" in per_unit and mem_scales is None and mem_ranges is None:
            # reference default state_quant range [-250, 1]
            # (SNNtorch_spiking_submodules.py:190-208)
            mem_ranges = [(-250.0, 1.0)] * model.num_units
        self.model = model
        self.encoding = model.encoding
        rec_units = {"G1", "G2"} if model.recurrent else set()
        self.unit_recurrent = tuple(n in rec_units for n in model.unit_names)
        self.num_units = model.num_units
        self.features = model.base_num_channels
        self.unit_mem_int8 = tuple(d == "int8" for d in per_unit)
        self.mem_dtype = "int8" if all(self.unit_mem_int8) else (
            "bfloat16" if not any(self.unit_mem_int8) else "mixed"
        )
        self.hard_reset = model.hard_reset
        self.alpha = model.alpha if hasattr(model, "alpha") else 2.0
        if _prepared is not None:
            self.params = _prepared
        else:
            self.params = prepare_int8_params(
                model, variables, mem_scales=mem_scales, mem_ranges=mem_ranges,
                input_scale=input_scale,
            )
        self.input_scale = float(input_scale)
        # chip-measured serving operating point (evflow.autotune); carried
        # through save_engine/from_artifact so hosts serve the tuned config
        self.serving: Optional[Dict[str, Any]] = None
        self.z_int8 = all(
            "z_requant" in u for u in self.params["units"]
        ) if _prepared is not None else False  # enabled by calibrate_z()

    @classmethod
    def from_artifact(cls, model, path: str) -> "Int8DeployEngine":
        """Reconstruct an engine from a :func:`save_engine` artifact —
        serving hosts load the folded/quantized parameters directly
        without the f32 checkpoint or re-preparation (the deployment
        analog of the reference's load_quantized_model, utils/utils.py
        :187-224)."""
        import json

        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))

            def arr(key):
                return jnp.asarray(z[key], jnp.dtype(meta["dtypes"][key]))

            units = []
            for i in range(meta["num_units"]):
                unit = {}
                for k in meta["unit_keys"][i]:
                    unit[k] = arr(f"unit{i}.{k}")
                units.append(unit)
            params = {"units": units, "pred_kernel": arr("pred_kernel")}
            params["pred_bias"] = (
                arr("pred_bias") if "pred_bias" in z.files else None
            )
        if meta["num_units"] != model.num_units:
            raise ValueError(
                f"artifact has {meta['num_units']} units, model has "
                f"{model.num_units}"
            )
        engine = cls(model, variables=None, mem_dtype=meta["mem_dtype"],
                     input_scale=meta["input_scale"], _prepared=params)
        engine.serving = meta.get("serving")
        return engine

    def calibrate_z(self, windows: Sequence[Any], margin: float = 1.05):
        """Enable int8 requantization of the GEMM intermediate Z using
        per-column scales collected over sample windows — the TPU analog of
        the reference's activation calibration (eval_flow.py:31-47 runs 50
        batches through brevitas ``calibration_mode``). Halves the step's
        dominant HBM term. Call with a list of ``[B, H, W, 2]`` input
        windows drawn from the eval distribution."""
        if not windows:
            raise ValueError("calibrate_z needs at least one sample window")
        x0 = jnp.asarray(windows[0])
        B, H, W, _ = x0.shape

        @jax.jit
        def probe(params, x, states):
            xi = jnp.clip(
                jnp.round(x / self.input_scale if self.input_scale != 1.0 else x),
                -127, 127,
            ).astype(jnp.int8)
            h = xi
            new_states = []
            zmaxes = []
            C = self.features
            for i, unit in enumerate(params["units"]):
                mem, prev_spk = states[i]
                mem_f = _mem_dequant(mem, unit) if self.unit_mem_int8[i] else mem
                cols = (
                    _cols_dx_dual_i8(h, prev_spk)
                    if self.unit_recurrent[i] else _cols_dx_i8(h)
                )
                Zi = jax.lax.dot_general(
                    cols.reshape(-1, cols.shape[-1]), unit["w"],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32,
                )
                Zf = Zi.astype(jnp.float32) * unit["col_scale"].astype(jnp.float32)
                zmaxes.append(jnp.max(jnp.abs(Zf), axis=0))
                y = (_dy_shift_add(
                    Zf.astype(jnp.bfloat16).reshape(B, H, W, 3 * C), H, C
                ) + unit["bias"])
                spk, mem_out = leaky_step(
                    y, mem_f, unit["beta"], unit["theta"],
                    reset="zero" if self.hard_reset else "subtract", alpha=self.alpha,
                )
                h = spk.astype(jnp.int8)
                if self.unit_mem_int8[i]:
                    mem_out = _mem_quant(mem_out, unit)
                new_states.append(
                    LIFState(mem_out, h if self.unit_recurrent[i] else None)
                )
            return tuple(new_states), zmaxes

        states = self.init_states(B, H, W)
        maxes = [np.zeros(u["w"].shape[-1], np.float32) for u in self.params["units"]]
        for w in windows:
            states, zm = probe(self.params, jnp.asarray(w), states)
            for i, m in enumerate(zm):
                maxes[i] = np.maximum(maxes[i], np.asarray(m, np.float32))
        for unit, m in zip(self.params["units"], maxes):
            s_z = np.maximum(m * margin, 1e-8) / 127.0
            col = np.asarray(unit["col_scale"], np.float32)
            unit["z_scale"] = jnp.asarray(s_z, jnp.bfloat16)
            unit["z_requant"] = jnp.asarray(col / s_z, jnp.float32)
        self.z_int8 = True

    def init_states(self, batch: int, height: int, width: int):
        """Only recurrent units carry their previous spikes — feedforward
        units' spike carries are never read back (the reference carries
        them for observability only), so dropping them saves one image-
        sized HBM write+read per FF unit per step."""
        shape = (batch, height, width, self.features)

        def mem0(u, int8):
            if int8:
                # zero membrane encodes as the affine grid's zero point
                return jnp.broadcast_to(
                    jnp.round(u["mem_zp"]).astype(jnp.int8), shape
                ).copy()
            return jnp.zeros(shape, jnp.bfloat16)

        return tuple(
            LIFState(mem0(u, i8), jnp.zeros(shape, jnp.int8) if rec else None)
            for u, rec, i8 in zip(
                self.params["units"], self.unit_recurrent, self.unit_mem_int8
            )
        )

    def apply(
        self,
        variables: Dict[str, Any],
        event_voxel: Optional[jax.Array],
        event_cnt: Optional[jax.Array],
        states: Sequence[LIFState],
        train: bool = False,
        timestep: Optional[jax.Array] = None,
        log: bool = False,
    ):
        """One event-window step on the int8 path. ``variables`` is the
        prepared pytree from :func:`prepare_int8_params` (``engine.params``).
        """
        del train, timestep
        x = event_cnt if self.encoding == "cnt" else event_voxel
        if x is None:
            raise ValueError("Selected encoding input is None")
        B, H, W, _ = x.shape
        C = self.features
        reset = "zero" if self.hard_reset else "subtract"

        xi = jnp.clip(
            jnp.round(x / self.input_scale if self.input_scale != 1.0 else x),
            -127,
            127,
        ).astype(jnp.int8)

        h = xi
        new_states: List[LIFState] = []
        taps = {"0:input": x} if log else None
        for i, unit in enumerate(variables["units"]):
            mem, prev_spk = states[i]
            if self.unit_mem_int8[i]:
                mem_f = _mem_dequant(mem, unit)
            else:
                mem_f = mem
            if self.unit_recurrent[i]:
                cols = _cols_dx_dual_i8(h, prev_spk)
            else:
                cols = _cols_dx_i8(h)
            y = _gemm_epilogue(
                cols, unit["w"], unit["col_scale"], unit["bias"], B, H, W, C,
                z_requant=unit.get("z_requant") if self.z_int8 else None,
                z_scale=unit.get("z_scale") if self.z_int8 else None,
            )
            spk, mem_out = leaky_step(
                y, mem_f, unit["beta"], unit["theta"], reset=reset, alpha=self.alpha
            )
            h = spk.astype(jnp.int8)
            if self.unit_mem_int8[i]:
                mem_out = _mem_quant(mem_out, unit)
            new_states.append(
                LIFState(mem_out, h if self.unit_recurrent[i] else None)
            )
            if log:
                taps[f"{i + 1}:{self.model.unit_names[i]}"] = spk

        hs = h.astype(jnp.bfloat16)
        flow = jnp.einsum(
            "bhwc,co->bhwo", hs, variables["pred_kernel"][0, 0]
        )
        if variables["pred_bias"] is not None:
            flow = flow + variables["pred_bias"]
        flow = jnp.tanh(flow).astype(jnp.float32)
        if log:
            taps[f"{self.num_units + 1}:pred"] = flow
            from evflow.models.firenet import activity_fractions

            activity = activity_fractions(taps)
        else:
            activity = None
        return {"flow": [flow], "activity": activity}, tuple(new_states)
