"""Int8 deployment/serving engine for the spiking multires UNet family.

Extends the real-int8 TPU serving path (evflow/deploy.py, FireNet family)
to the second flagship — SpikingRecEVFlowNet (reference models/model.py
:723-858 over the spiking UNet of models/unet.py:414-461). The reference
quantizes/exports only FireNet (Model_export_RealQuant.py,
eval_flow_quant.py); this engine closes that gap on the TPU side: the full
model zoo has a deployment story.

Design — every cross-layer tensor int8 at rest, quantization points chosen
so almost all of them are EXACT:

  * spikes are int8: the sigmoid-LIF family emits {0, 1}; residual blocks
    add their (spike) input to the output spikes (unet.py
    SpikingResidualBlock), so resblock activations are small ints
    (<= 1 + num_residual_blocks) — still exact int8.
  * convs run the quantized grids with per-output-channel weight scales
    on one of three COMPUTE tiers carrying the same integer arithmetic:
    ``compute="bfloat16"`` casts the int8 weights/grids to bf16
    — every value is a small exact integer, and f32 accumulates integer
    products exactly below 2^24; ``compute="int8"`` keeps s8 x s8 -> s32
    everywhere; ``compute="hybrid"`` (default — it dominates the uniform
    tiers at every measured point) routes stride-1 convs with input
    spatial dim >= ``dypack_min_spatial`` (128) through the dy-packed s8
    cols GEMM — the FireNet engine's fast int8 emitter (cols_dx + one
    [BHW, 3Cin] x [3Cin, 3Cout] dot + dy shift-add, evflow/ops/dypack.py)
    — and the rest through bf16 NHWC. The shape probes
    (benchmarks/probe_unet_conv.py, probe_unet_dypack.py) measure the s8
    NHWC 3x3 path no better than bf16 anywhere that matters, while the
    dy-pack GEMM is 2-3x faster than EITHER on the big-spatial decoder
    convs — so the tier winner is resolution-dependent (BENCH_NOTES
    "UNet family deployed"; the autotuner sweeps the tier axis per
    target). No bias, no BN in this family (cells.py make_conv
    ``use_bias=False``, norm=None).
  * recurrent cells fuse their feedforward + recurrent convs into ONE conv
    over input-channel-concatenated kernels — both inputs are binary
    spikes (unit scale), so one shared per-output-channel scale
    dequantizes the fused accumulator (the UNet analog of the FireNet
    engine's K=6C dual GEMM).
  * decoder inputs are the one fractional surface: bilinear x2 of a
    concat of spike-valued channels and the previous multires flow
    prediction (unet.py:319-339). Bilinear-2x weights live on a 1/16 grid
    (torch ``align_corners=False`` taps {9, 3, 1}/16), so upsampled SPIKE
    channels are exact int8 at scale 1/16 (max 16 * (1 + num_resblocks)
    << 127); prediction channels (tanh, in (-1, 1)) ride a fixed 1/127
    grid — the engine's only lossy activation quantization, |err| <=
    1/254 on a 2-channel auxiliary input. Per-input-channel scales are
    folded into the decoder kernels BEFORE weight quantization, so the
    conv still dequantizes with one per-output-channel multiply.
  * LIF dynamics reuse :func:`evflow.ops.lif.sigmoid_lif_step` exactly
    (its forward is the pure inference update; surrogate forward is the
    exact heaviside). Membranes are carried bf16 (serving default) or f32
    (``mem_dtype="float32"``, bit-parity harness for tests).

With integer inputs the remaining approximations are per-channel weight
rounding (the reference's conv PTQ, eval_flow_quant.py:584-880) and the
1/127 prediction-feedback grid; tests/test_deploy_unet.py pins the
finest-path flow to BIT-EXACT vs the fake-quant f32 model and AEE parity
on the synthetic gtflow protocol.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from evflow.deploy import _quantize_per_channel
from evflow.models.unet import CropParameters
from evflow.ops.dypack import (cols_dx, cols_dx_dual, dy_epilogue,
                               pack_kernel_dy)
from evflow.ops.lif import LIFState, sigmoid_lif_step

__all__ = [
    "Int8UNetEngine",
    "prepare_unet_int8_params",
    "quantize_unet_weights",
    "save_unet_engine",
]

# the decoder spike-channel fixed-point grid: bilinear-2x tap weights are
# sixteenths, so 16 is the exact LSB of any upsampled integer-valued map
_UP_GRID = 16.0
_PRED_GRID = 127.0  # tanh flow feedback in (-1, 1)

def _phase_interleave(z_ph: jax.Array, cout: int) -> jax.Array:
    """[B, Hc, Wc, 4*cout] phase-stacked -> [B, 2Hc, 2Wc, cout]
    interleaved (phase index ph = 2*p + q -> output pixel (2i+p, 2j+q)).

    The reshape/transpose formulation is the measured winner: a
    pad-and-add variant (4 dilated lax.pads summed, no transpose)
    benched 21% SLOWER end-to-end at 256^2 (BENCH_NOTES round 10)."""
    Bc, Hc, Wc, _ = z_ph.shape
    return z_ph.reshape(Bc, Hc, Wc, 2, 2, cout).transpose(
        0, 1, 3, 2, 4, 5).reshape(Bc, 2 * Hc, 2 * Wc, cout)


# half-pixel bilinear x2 row weights: _PHASE_A[n + 1, m + 1] is the
# coefficient of x[i + m] in the upsampled row at output index 2i + n
# (U[2i-1] = .75 x[i-1] + .25 x[i]; U[2i] = .25 x[i-1] + .75 x[i]; ...)
_PHASE_A = np.zeros((4, 3), np.float32)
_PHASE_A[0, 0], _PHASE_A[0, 1] = 0.75, 0.25
_PHASE_A[1, 0], _PHASE_A[1, 1] = 0.25, 0.75
_PHASE_A[2, 1], _PHASE_A[2, 2] = 0.75, 0.25
_PHASE_A[3, 1], _PHASE_A[3, 2] = 0.25, 0.75


def _phase_decoder_params(du: Dict[str, Any], num_pred_channels: int,
                          first: bool) -> Dict[str, Any]:
    """Fold the bilinear x2 INTO the decoder kernel: 4 per-phase 3x3
    kernels at the LOW (pre-upsample) resolution, dy-packed and int8
    per-(phase, output-channel) quantized. conv3x3(bilinear_up2(x)) is
    algebraically the interleave of these 4 phase convs on x
    (benchmarks/probe_unet_phase.py verifies interior exactness); the
    materialized upsampled tensor and the 1/16-grid requantize disappear
    — the fractional bilinear taps live in the WEIGHTS instead. The only
    semantic divergence is a 1-2 px border frame (resize edge-clamps and
    the SAME conv zero-pads the upsampled map; the phase convs zero-pad
    x), documented as a deploy-tier divergence and covered by the AEE
    budget.

    Layout (v2, measured on the full engine — see BENCH_NOTES): the two
    SPIKE parts of the decoder input (h, skip — equal channel counts,
    powers of two) ride the dy-packed cols GEMM with the prediction
    feedback channels SPLIT OUT: keeping the 2 pred channels inside the
    cols buffer made every concat segment lane-misaligned (130/258/514
    wide), which ran the s8 concat ~4x below HBM bandwidth. The pred
    contribution instead rides one small NHWC conv whose kernel stacks
    the 4 phases on the output axis ([3,3,npred,4*cout]) — matching the
    phase-stacked activation layout the engine carries (see apply). Both
    parts are quantized per-output-channel int8 and summed after dequant;
    the split scales are at least as tight as the joint one."""
    k = np.asarray(du["w"], np.float32) * np.asarray(du["scale"])
    k = k / np.asarray(du["in_scale"], np.float32)[None, None, :, None]
    npred = 0 if first else num_pred_channels
    # pre-upsample channel grids: spike channels ride unit ints; the
    # prediction feedback rides its 1/127 grid (pred_q)
    k_pred = k[:, :, :npred] / _PRED_GRID
    k_spk = k[:, :, npred:]
    ch = k_spk.shape[2] // 2  # h / skip parts have equal channel counts

    def fold(kin: np.ndarray, p: int, q: int) -> np.ndarray:
        kp = np.zeros_like(kin)
        for dy in range(3):
            for dx in range(3):
                for my in range(3):
                    for mx in range(3):
                        kp[my, mx] += (kin[dy, dx]
                                       * _PHASE_A[p + dy, my]
                                       * _PHASE_A[q + dx, mx])
        return kp

    out: Dict[str, Any] = {}
    for p in range(2):
        for q in range(2):
            w8, sc = _quantize_per_channel(fold(k_spk, p, q))
            # row order matches cols_dx_dual(h, skip):
            # [h-dx0|h-dx1|h-dx2|skip-dx0|skip-dx1|skip-dx2]
            out[f"pw{p}{q}"] = jnp.concatenate(
                [pack_kernel_dy(jnp.asarray(w8[:, :, :ch])),
                 pack_kernel_dy(jnp.asarray(w8[:, :, ch:]))], axis=0)
            out[f"ps{p}{q}"] = jnp.asarray(np.tile(sc, 3), jnp.bfloat16)
    if npred:
        cout = k.shape[3]
        kph = np.concatenate(
            [fold(k_pred, p, q) for p in range(2) for q in range(2)], axis=3)
        w8, sc = _quantize_per_channel(kph)
        del cout  # channel index of the stacked output: ph * cout + co
        out["pwp"] = jnp.asarray(w8)
        out["psp"] = jnp.asarray(sc, jnp.float32)
    # per-channel LIF params tiled over the 4 stacked phases
    for name in ("leak", "thresh"):
        out[f"p{name}"] = jnp.tile(jnp.asarray(du[name]), 4)
    return out


def quantize_unet_weights(model, params: Dict[str, Any],
                          input_scale: float = 1.0) -> Dict[str, Any]:
    """Return ``params`` with every conv kernel replaced by its
    dequantized-int8 image (same shared/folded scales as
    :func:`prepare_unet_int8_params`) — the fake-quant f32 twin of the
    engine, used by the parity tests: running the flax model on these
    weights isolates the weight-rounding approximation so the engine's
    integer arithmetic can be checked EXACTLY against it."""
    prepared = prepare_unet_int8_params(model, {"params": params},
                                        input_scale=input_scale)
    p = jax.tree.map(lambda x: x, params)  # deep-ish copy of the dict tree
    u = {k: dict(v) for k, v in p["multires_unetrec"].items()}
    for i in range(model.num_encoders):
        enc = prepared["enc"][i]
        conv = dict(u[f"encoder{i}"]["conv"])
        # undo the folded head input scale to recover the kernel itself
        kq = np.asarray(enc["conv"]["w"], np.float32) * np.asarray(enc["conv"]["scale"])
        if i == 0 and input_scale != 1.0:
            kq = kq / input_scale
        conv["ff"] = {"kernel": jnp.asarray(kq)}
        rec = dict(u[f"encoder{i}"]["recurrent_block"])
        kcat = np.asarray(enc["rec"]["w"], np.float32) * np.asarray(enc["rec"]["scale"])
        cin = kcat.shape[2] // 2
        rec["ff"] = {"kernel": jnp.asarray(kcat[:, :, :cin])}
        rec["rec"] = {"kernel": jnp.asarray(kcat[:, :, cin:])}
        u[f"encoder{i}"] = {**u[f"encoder{i}"], "conv": conv,
                            "recurrent_block": rec}
    for i in range(model.num_residual_blocks):
        blk = dict(u[f"resblock{i}"])
        for j, name in enumerate(("conv1", "conv2")):
            cu = prepared["res"][i][j]
            kq = np.asarray(cu["w"], np.float32) * np.asarray(cu["scale"])
            blk[name] = {**dict(blk[name]), "ff": {"kernel": jnp.asarray(kq)}}
        u[f"resblock{i}"] = blk
    for i in range(model.num_encoders):
        du = prepared["dec"][i]
        kq = np.asarray(du["w"], np.float32) * np.asarray(du["scale"])
        # undo the folded per-input-channel grid scales
        kq = kq / np.asarray(du["in_scale"], np.float32)[None, None, :, None]
        dec = dict(u[f"decoder{i}"])
        dec["conv2d"] = {**dict(dec["conv2d"]), "ff": {"kernel": jnp.asarray(kq)}}
        u[f"decoder{i}"] = dec
    p = dict(p)
    p["multires_unetrec"] = u
    return p


def prepare_unet_int8_params(model, variables: Dict[str, Any],
                             input_scale: float = 1.0) -> Dict[str, Any]:
    """Fold + quantize trained SpikingRecEVFlowNet variables into the
    engine pytree. Host-side, runs once.

    Layout: ``{"enc": [{"conv": u, "rec": u}], "res": [(u, u)],
    "dec": [u], "pred": [{"kernel", "bias"}]}`` where each conv unit ``u``
    holds int8 ``w`` (HWIO), per-output-channel f32 ``scale``, f32
    ``leak``/``thresh``; decoder units add the folded per-input-channel
    ``in_scale`` (for the fake-quant twin / artifact introspection).
    """
    p = variables["params"]["multires_unetrec"]
    E, R = model.num_encoders, model.num_residual_blocks

    def unit(kernel: np.ndarray, cell) -> Dict[str, Any]:
        w, s = _quantize_per_channel(kernel)
        return {
            "w": jnp.asarray(w),
            "scale": jnp.asarray(s, jnp.float32),
            "leak": jnp.asarray(np.asarray(cell["leak"], np.float32)),
            "thresh": jnp.asarray(np.asarray(cell["thresh"], np.float32)),
        }

    out: Dict[str, Any] = {"enc": [], "res": [], "dec": [], "pred": []}
    for i in range(E):
        c = p[f"encoder{i}"]["conv"]
        k = np.asarray(c["ff"]["kernel"], np.float32)
        if i == 0:
            k = k * input_scale  # head folds the input grid in
        r = p[f"encoder{i}"]["recurrent_block"]
        # fused ff+rec kernel: both inputs are unit-scale spikes, so one
        # shared per-output-channel scale dequantizes the single conv
        kcat = np.concatenate(
            [np.asarray(r["ff"]["kernel"], np.float32),
             np.asarray(r["rec"]["kernel"], np.float32)], axis=2
        )
        out["enc"].append({"conv": unit(k, c), "rec": unit(kcat, r)})
    for i in range(R):
        b = p[f"resblock{i}"]
        out["res"].append((
            unit(np.asarray(b["conv1"]["ff"]["kernel"], np.float32), b["conv1"]),
            unit(np.asarray(b["conv2"]["ff"]["kernel"], np.float32), b["conv2"]),
        ))
    for i in range(E):
        d = p[f"decoder{i}"]["conv2d"]
        k = np.asarray(d["ff"]["kernel"], np.float32)
        cin = k.shape[2]
        s_in = np.full((cin,), 1.0 / _UP_GRID, np.float32)
        if i > 0:
            # skip(pred, skip(x, block)): prediction channels lead
            s_in[: getattr(model, "num_output_channels", 2)] = 1.0 / _PRED_GRID
        u = unit(k * s_in[None, None, :, None], d)
        u["in_scale"] = jnp.asarray(s_in)
        out["dec"].append(u)
    for i in range(E):
        pr = p[f"pred{i}"]["conv2d"]
        out["pred"].append({
            "kernel": jnp.asarray(np.asarray(pr["kernel"], np.float32)),
            "bias": jnp.asarray(np.asarray(pr["bias"], np.float32)),
        })
    return out


def _conv_q(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """Quantized-grid conv: s8 x s8 -> s32, or the same integer values as
    bf16 x bf16 -> f32 (exact integer products on the bf16 MXU path).
    The stored weight dtype selects the path; the input is cast to it
    (a no-op on uniform tiers, an exact small-int cast at hybrid-tier
    boundaries)."""
    acc = jnp.int32 if w.dtype == jnp.int8 else jnp.float32
    # symmetric k//2 padding to match the flax model / torch reference
    # (flax-style "SAME" misaligns taps at stride 2)
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )


def save_unet_engine(engine: "Int8UNetEngine", path: str,
                     serving=None) -> str:
    """One-file ``.npz`` deployment artifact (the UNet analog of
    :func:`evflow.deploy.save_engine`); loaded by
    :meth:`Int8UNetEngine.from_artifact` without the f32 checkpoint.
    ``serving`` optionally embeds a measured
    :class:`evflow.autotune.ServingConfig` (or its ``to_meta()`` dict) so
    serving hosts load the chip-tuned operating point with the weights;
    defaults to the engine's own ``serving`` attribute when set."""
    arrays: Dict[str, np.ndarray] = {}
    dtypes: Dict[str, str] = {}
    canonical = {"w", "scale", "leak", "thresh", "in_scale", "kernel", "bias"}
    flat = jax.tree_util.tree_flatten_with_path(engine.params)[0]
    for kp, v in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)
        if key.rsplit("/", 1)[-1] not in canonical:
            continue  # derived (phase kernels etc.) — re-derived at load
        if key.endswith("/w"):
            # weights are canonically int8 on disk whatever the engine's
            # compute tier carries (bf16-tier values are exact small ints)
            dtypes[key] = "int8"
            arrays[key] = np.asarray(v, np.float32).astype(np.int8)
            continue
        dtypes[key] = str(v.dtype)
        arrays[key] = (np.asarray(v, np.float32) if str(v.dtype) == "bfloat16"
                       else np.asarray(v))
    meta = {
        "dtypes": dtypes,
        "num_encoders": engine.num_encoders,
        "num_residual_blocks": engine.num_residual_blocks,
        "mem_dtype": engine.mem_dtype,
        "compute": engine.compute,
        "phase_decoders": getattr(engine, "phase_decoders", False),
        "input_scale": engine.input_scale,
        "model": engine.model.__class__.__name__,
    }
    if serving is None:
        serving = getattr(engine, "serving", None)
    if serving is not None:
        meta["serving"] = (serving if isinstance(serving, dict)
                           else serving.to_meta())
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez(path, __meta__=np.asarray(json.dumps(meta)), **arrays)
    return path


class Int8UNetEngine:
    """Duck-types the SpikingRecEVFlowNet protocol (``init_states`` /
    ``apply``) so ``evflow.eval.evaluate(config, model=engine,
    variables=engine.params)`` runs the full AEE protocol on the
    quantized serving path; state layout matches the flax model's flat
    LIFState tuple, so sequence-rollover mask resets work unchanged."""

    def __init__(self, model, variables: Optional[Dict[str, Any]],
                 mem_dtype: str = "bfloat16", input_scale: float = 1.0,
                 compute: str = "hybrid", phase_decoders: bool = False,
                 dypack_min_spatial: int = 128,
                 _prepared: Optional[Dict[str, Any]] = None):
        if variables is None and _prepared is None:
            raise ValueError("need trained variables or a prepared artifact")
        if model.__class__.__name__ != "SpikingRecEVFlowNet":
            raise ValueError(
                "Int8UNetEngine deploys SpikingRecEVFlowNet; the FireNet "
                "family uses evflow.deploy.Int8DeployEngine"
            )
        if model.norm is not None:
            raise ValueError("normalized cells are not supported on the int8 path")
        if model.norm_input:
            raise ValueError("norm_input is not supported on the int8 path")
        if model.encoding != "cnt" and input_scale == 1.0:
            raise ValueError(
                "voxel-encoding models need a calibrated input_scale "
                "(fractional voxel values would round to the unit grid)"
            )
        if mem_dtype not in ("bfloat16", "float32"):
            raise ValueError(f"mem_dtype must be bfloat16/float32, got {mem_dtype!r}")
        # compute tier: the SAME integer arithmetic on either MXU path.
        # "bfloat16" (serving default) casts the int8 weights/spike grids to
        # bf16 — every value is a small integer, exactly representable, and
        # the f32 accumulator sums integer products exactly below 2^24 — so
        # it matches the int8 tier to f32-accumulation rounding while
        # skipping the s8 conv emitter, which the shape probe measures
        # equal-or-SLOWER than bf16 for NHWC 3x3 convs on this toolchain
        # (benchmarks/probe_unet_conv.py: the fast int8 emitter is the
        # 1x1/cols path the FireNet engine rides, not general 3x3).
        # Artifacts always store weights as int8 (save_unet_engine
        # normalizes), so the tier is a load-time choice.
        # "hybrid" routes big-spatial stride-1 convs through the dy-pack
        # s8 cols GEMM (see _conv_ff); "hybrid8" = same routing with int8
        # spike carriers: the extra cast pairs cost ~10% at 128² but the
        # carrier byte savings win ~5% back at 256² (BENCH_NOTES) — the
        # autotuner sweeps all four tiers.
        if compute not in ("bfloat16", "int8", "hybrid", "hybrid8"):
            raise ValueError(
                f"compute must be bfloat16/int8/hybrid/hybrid8, "
                f"got {compute!r}")
        # residual chains grow spike amplitudes by +1 per block; the exact
        # decoder grid holds while 16 * (1 + R) fits int8
        if _UP_GRID * (1 + model.num_residual_blocks) > 127:
            raise ValueError(
                f"{model.num_residual_blocks} residual blocks overflow the "
                "exact 1/16 decoder grid"
            )
        self.model = model
        self.encoding = model.encoding
        self.num_encoders = model.num_encoders
        self.num_residual_blocks = model.num_residual_blocks
        self.hard_reset = model.hard_reset
        self.mem_dtype = mem_dtype
        self._mem_jdtype = jnp.bfloat16 if mem_dtype == "bfloat16" else jnp.float32
        self.compute = compute
        # spike/grid carrier dtype: int8 only on the uniform s8 tier. The
        # hybrid tier carries bf16 like the bf16 tier — its dy-pack sites
        # cast their (integer-valued) inputs to int8 locally, so the rest
        # of the net pays zero extra casts (an int8 carrier measured ~10%
        # slower end-to-end: every layer paid an int8<->bf16 cast pair)
        self._cdtype = (jnp.int8 if compute in ("int8", "hybrid8")
                        else jnp.bfloat16)
        self.input_scale = float(input_scale)
        # chip-measured serving operating point (evflow.autotune); carried
        # through save_unet_engine/from_artifact like the FireNet engine
        self.serving: Optional[Dict[str, Any]] = None
        self.params = (_prepared if _prepared is not None else
                       prepare_unet_int8_params(model, variables,
                                                input_scale=input_scale))
        # phase-decomposed decoders: fold bilinear x2 into 4 low-res
        # kernels (see _phase_decoder_params) — derived here from the
        # canonical int8 weights so artifacts stay unchanged
        self.phase_decoders = bool(phase_decoders)
        if self.phase_decoders:
            npred = getattr(model, "num_output_channels", 2)
            self.params = {
                **self.params,
                "dec": [
                    {**du, **_phase_decoder_params(du, npred, first=(i == 0))}
                    for i, du in enumerate(self.params["dec"])
                ],
            }
        # the hybrid tier's dy-pack crossover: stride-1 convs whose input
        # spatial dim is >= this ride the s8 cols GEMM (the FireNet-style
        # fast int8 emitter — 2-3x the NHWC conv paths on the big decoder
        # layers, benchmarks/probe_unet_dypack.py); smaller layers use
        # bf16 NHWC. Tests lower it to exercise the path at toy sizes.
        self.dypack_min_spatial = int(dypack_min_spatial)
        if compute == "bfloat16":
            # one-time cast: int8 weight values are exact in bf16
            def cast_w(u):
                return {**u, "w": u["w"].astype(jnp.bfloat16)}

            self.params = {
                "enc": [{s: cast_w(e[s]) for s in ("conv", "rec")}
                        for e in self.params["enc"]],
                "res": [tuple(cast_w(u) for u in pair)
                        for pair in self.params["res"]],
                "dec": [cast_w(u) for u in self.params["dec"]],
                "pred": self.params["pred"],
            }

    @classmethod
    def from_artifact(cls, model, path: str) -> "Int8UNetEngine":
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(str(z["__meta__"]))

            def arr(key):
                return jnp.asarray(z[key], jnp.dtype(meta["dtypes"][key]))

            E, R = meta["num_encoders"], meta["num_residual_blocks"]
            conv_keys = ("w", "scale", "leak", "thresh")
            params: Dict[str, Any] = {
                "enc": [{side: {k: arr(f"enc/{i}/{side}/{k}") for k in conv_keys}
                         for side in ("conv", "rec")} for i in range(E)],
                "res": [tuple({k: arr(f"res/{i}/{j}/{k}") for k in conv_keys}
                              for j in range(2)) for i in range(R)],
                "dec": [{k: arr(f"dec/{i}/{k}")
                         for k in conv_keys + ("in_scale",)} for i in range(E)],
                "pred": [{k: arr(f"pred/{i}/{k}") for k in ("kernel", "bias")}
                         for i in range(E)],
            }
        if E != model.num_encoders or R != model.num_residual_blocks:
            raise ValueError(
                f"artifact is a {E}-encoder/{R}-resblock net, model has "
                f"{model.num_encoders}/{model.num_residual_blocks}"
            )
        engine = cls(model, variables=None, mem_dtype=meta["mem_dtype"],
                     compute=meta.get("compute", "int8"),
                     phase_decoders=meta.get("phase_decoders", False),
                     input_scale=meta["input_scale"], _prepared=params)
        engine.serving = meta.get("serving")
        return engine

    # -- state ------------------------------------------------------------

    def init_states(self, batch: int, height: int, width: int):
        """Flat LIFState tuple in the flax model's slot order (2/encoder +
        2/resblock + 1/decoder), membranes in ``mem_dtype``, spikes in the
        carrier dtype. With ``phase_decoders`` the decoder slots carry the
        phase-stacked layout (same slot order/count, see apply)."""
        crop = CropParameters(width, height, self.num_encoders)
        h, w = crop.height_crop, crop.width_crop
        C, E = self.model.base_num_channels, self.num_encoders
        out_sizes = [int(C * 2 ** (i + 1)) for i in range(E)]
        in_sizes = [int(C * 2 ** i) for i in range(E)]

        def zs(h, w, c):
            return LIFState(jnp.zeros((batch, h, w, c), self._mem_jdtype),
                            jnp.zeros((batch, h, w, c), self._cdtype))

        states = []
        for c in out_sizes:
            h, w = h // 2, w // 2
            states += [zs(h, w, c), zs(h, w, c)]
        for _ in range(2 * self.num_residual_blocks):
            states.append(zs(h, w, out_sizes[-1]))
        for c in reversed(in_sizes):
            if self.phase_decoders:
                # phase-stacked decoder carry [B, Hc, Wc, 4C]: same
                # element count as the interleaved [B, 2Hc, 2Wc, C] map,
                # laid out so the LIF runs without the phase-interleave
                # transpose (see apply); rank-4 with leading batch, so
                # slot-mask resets and data-mesh sharding work unchanged
                states.append(zs(h, w, 4 * c))
                h, w = h * 2, w * 2
            else:
                h, w = h * 2, w * 2
                states.append(zs(h, w, c))
        return tuple(states)

    # -- inference --------------------------------------------------------

    def _conv_ff(self, x, unit, stride: int = 1):
        """Scaled conv input current on the unit's measured-fast path.

        Uniform tiers: NHWC conv in the stored weight dtype, then the
        per-output-channel dequant. Hybrid tier: stride-1 convs at
        >= ``dypack_min_spatial`` input ride the dy-packed s8 cols GEMM
        (cols_dx -> one [BHW, 3Cin] x [3Cin, 3Cout] int8 dot -> bf16
        dequant -> dy shift-add — the same formulation/invariants as the
        FireNet engine, evflow/ops/dypack.py), smaller ones bf16 NHWC.
        The dy-pack Z rides bf16 like FireNet's (the dominant byte
        stream; int values round at 2^-9 relative — inside the AEE
        budget, benchmarks/VALIDATION.md)."""
        w = unit["w"]
        if (self.compute in ("hybrid", "hybrid8") and stride == 1
                and x.shape[1] >= self.dypack_min_spatial):
            B_, H_, W_, _ = x.shape
            cout = w.shape[3]
            cols = cols_dx(x.astype(jnp.int8))
            Z = jax.lax.dot_general(
                cols.reshape(-1, cols.shape[-1]), pack_kernel_dy(w),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.bfloat16).reshape(B_, H_, W_, 3 * cout)
            Z = Z * jnp.tile(unit["scale"], 3).astype(jnp.bfloat16)
            return dy_epilogue(Z, H_, cout).astype(jnp.float32)
        if self.compute in ("hybrid", "hybrid8"):
            w = w.astype(jnp.bfloat16)  # exact; hoisted out of scans
        return _conv_q(x, w, stride).astype(jnp.float32) * unit["scale"]

    def _lif(self, ff, unit, state: LIFState):
        """Run one exact sigmoid-LIF update on the scaled input current;
        returns (compute-dtype spikes, new LIFState)."""
        z, v = sigmoid_lif_step(
            ff, state.mem.astype(jnp.float32), state.spk.astype(jnp.float32),
            unit["leak"], unit["thresh"], hard_reset=self.hard_reset,
        )
        zi = z.astype(self._cdtype)
        return zi, LIFState(v.astype(self._mem_jdtype), zi)

    def tp_jit_step(self, mesh, data_axis: str = "data",
                    model_axis: str = "model"):
        """Tensor-parallel jitted engine step over ``mesh``.

        Wraps :func:`evflow.parallel.tensor.tp_jit_step` around
        :meth:`apply`, forwarding this engine's own ``phase_decoders``
        flag so the measured-bad model-axis-4 x phase configuration is
        refused at construction (guard_tp_phase; round-5 verdict item 4)
        instead of silently compiling with 3 full-tensor remats/step.
        Returns ``step(params, window, states) -> (flow_list, states)``.
        """
        from evflow.parallel.tensor import tp_jit_step as _tp_jit_step

        def step(params, window, states):
            out, new_states = self.apply(params, None, window, states)
            return out["flow"], new_states

        return _tp_jit_step(step, mesh, data_axis, model_axis,
                            phase_decoders=self.phase_decoders)

    def apply(self, variables: Dict[str, Any], event_voxel, event_cnt,
              states: Sequence[LIFState], train: bool = False,
              timestep=None, log: bool = False):
        """One event-window step on the int8 path (``variables`` is the
        prepared pytree, ``engine.params``)."""
        del train, timestep
        x = event_cnt if self.encoding == "cnt" else event_voxel
        if x is None:
            raise ValueError("Selected encoding input is None")
        B, H, W, _ = x.shape
        E = self.num_encoders
        crop = CropParameters(W, H, E)

        xi = jnp.clip(
            jnp.round(x / self.input_scale if self.input_scale != 1.0 else x),
            -127, 127,
        ).astype(self._cdtype)
        xi = crop.pad(xi)

        states = list(states)
        new_states: List[Optional[LIFState]] = list(states)
        taps = {"0:input": x.astype(jnp.float32)} if log else None
        si = 0
        h = xi
        blocks = []
        for i, eu in enumerate(variables["enc"]):
            z1, s1 = self._lif(self._conv_ff(h, eu["conv"], 2),
                               eu["conv"], states[si])
            new_states[si] = s1
            cat = jnp.concatenate([z1, states[si + 1].spk], axis=-1)
            z2, s2 = self._lif(self._conv_ff(cat, eu["rec"]),
                               eu["rec"], states[si + 1])
            new_states[si + 1] = s2
            si += 2
            h = z2
            blocks.append(h)
            if log:
                taps[f"enc{i}"] = z2.astype(jnp.float32)

        for i, (u1, u2) in enumerate(variables["res"]):
            residual = h
            z1, s1 = self._lif(self._conv_ff(h, u1), u1, states[si])
            new_states[si] = s1
            z2, s2 = self._lif(self._conv_ff(z1, u2), u2, states[si + 1])
            new_states[si + 1] = s2
            si += 2
            h = z2 + residual  # spike-valued small ints, exact either tier
            if log:
                taps[f"res{i}"] = h.astype(jnp.float32)

        predictions = []
        pred_q = None
        for i, (du, pu) in enumerate(zip(variables["dec"], variables["pred"])):
            parts = [h, blocks[E - i - 1]]
            if i > 0:
                parts.insert(0, pred_q)
            if self.phase_decoders:
                # bilinear x2 folded into 4 per-phase kernels: one cols
                # buffer at the LOW resolution feeds 4 s8 dots — no
                # materialized up tensor, no requantize chain (the
                # fractional taps live in the weights). 1-2 px border
                # frame diverges from the resize path (docstring of
                # _phase_decoder_params). The phases stay STACKED on the
                # channel axis ([B,Hc,Wc,4*cout], index ph*cout+co with
                # ph = 2*p + q for output pixel (2i+p, 2j+q)): the LIF is
                # elementwise and the flow tap a per-phase 1x1 conv, so
                # only the 2-channel flow ever pays the interleave
                # transpose — the f32 [2,2,B,Hc,Wc,C] interleave copy of
                # the v1 phase path was the single most expensive op of
                # the 256^2 step (benchmarks/profile_unet.py). The pred
                # feedback rides its own small conv (kernel split in
                # _phase_decoder_params) so the cols segments stay
                # lane-aligned.
                hq, sq = (part.astype(jnp.int8) for part in (h, blocks[E - i - 1]))
                Bc, Hc, Wc, _ = hq.shape
                cout = du["w"].shape[3]
                # cols_dx_dual is the measured-best build: a fused
                # concat-then-cols_dx variant tied it (+1.9%, inside the
                # min-of-4 spread) and a pad-and-add build lost 1.7%
                # (BENCH_NOTES round 10)
                cols = cols_dx_dual(hq, sq)
                cols = cols.reshape(-1, cols.shape[-1])
                ys = []
                for pph in range(2):
                    for qph in range(2):
                        Z = jax.lax.dot_general(
                            cols, du[f"pw{pph}{qph}"],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32,
                        ).astype(jnp.bfloat16).reshape(Bc, Hc, Wc, 3 * cout)
                        Z = Z * du[f"ps{pph}{qph}"]
                        ys.append(dy_epilogue(Z, Hc, cout))
                ff = jnp.concatenate(ys, axis=-1).astype(jnp.float32)
                if i > 0:
                    ff = ff + du["psp"] * jax.lax.conv_general_dilated(
                        pred_q.astype(jnp.bfloat16),
                        du["pwp"].astype(jnp.bfloat16),
                        (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.float32,
                    )
                z_ph, s = self._lif(
                    ff, {"leak": du["pleak"], "thresh": du["pthresh"]},
                    states[si])
                new_states[si] = s
                si += 1
                zf = z_ph.astype(jnp.float32).reshape(Bc, Hc, Wc, 4, cout)
                flow = jnp.einsum(
                    "bhwpc,co->bhwpo", zf, pu["kernel"][0, 0]) + pu["bias"]
                flow = jnp.tanh(flow)
                # interleave phases: only the 2 flow channels (and, for
                # non-final decoders, the carrier-dtype spikes) pay it
                npred = flow.shape[-1]
                flow = _phase_interleave(
                    flow.reshape(Bc, Hc, Wc, 4 * npred), npred)
                if i < E - 1 or log:
                    h = _phase_interleave(z_ph, cout)
                predictions.append(flow)
                pred_q = jnp.clip(
                    jnp.round(flow * _PRED_GRID), -127, 127
                ).astype(self._cdtype)
                if log:
                    taps[f"dec{i}"] = h.astype(jnp.float32)
                continue
            else:
                cat = jnp.concatenate(parts, axis=-1).astype(jnp.float32)
                Bc, Hc, Wc, Cc = cat.shape
                up = jax.image.resize(cat, (Bc, 2 * Hc, 2 * Wc, Cc),
                                      method="bilinear")
                # exact requant onto the folded grids: spike channels land
                # on the 1/16 bilinear grid (lossless); pred channels
                # re-round to 1/127 (|err| <= 1/254, the engine's only
                # lossy activation)
                q_up = jnp.clip(
                    jnp.round(up / du["in_scale"]), -127, 127
                ).astype(self._cdtype)
                z, s = self._lif(self._conv_ff(q_up, du), du, states[si])
            new_states[si] = s
            si += 1
            h = z
            flow = jnp.einsum(
                "bhwc,co->bhwo", z.astype(jnp.float32), pu["kernel"][0, 0]
            ) + pu["bias"]
            flow = jnp.tanh(flow)
            predictions.append(flow)
            pred_q = jnp.clip(
                jnp.round(flow * _PRED_GRID), -127, 127
            ).astype(self._cdtype)
            if log:
                taps[f"dec{i}"] = z.astype(jnp.float32)

        fh, fw = predictions[-1].shape[1:3]
        flow_list = [
            crop.crop(jax.image.resize(
                p, (p.shape[0], fh, fw, p.shape[-1]), method="nearest"))
            for p in predictions
        ]
        activity = None
        if log:
            from evflow.models.firenet import activity_fractions
            activity = activity_fractions(taps)
        return {"flow": flow_list, "activity": activity}, tuple(new_states)
