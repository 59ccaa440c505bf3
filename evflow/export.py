"""Deployment export: StableHLO artifacts + golden data parity harness.

Behavioral reference: the entire ONNX export pipeline — Model_export.py
(custom LIF operator registration :27-38, golden inputs/outputs .npz
:126-187, ONNX export + graph surgery :200-367), Model_export_RealQuant.py,
LIF_layer_export.py, ConvLIF_layer_export.py, and the C++ operator itself
(ONNX_LIF_operator/src/lif_op.cpp). On TPU the whole chain collapses to
``jax.export``: the deployment graph is serialized StableHLO with no custom
ops, and golden .npz pairs are written for bit-exact verification on the
target.

Deployment semantics (intentionally different from training, matching the
reference — SURVEY.md §6 quirks):
  * LIF kernel: ``u = beta*mem + x``; spike at ``u >= theta``; hard zero
    reset (lif_op.cpp:41-49) — no sigmoid(leak), no (1-beta) input scaling;
  * BatchNorm folded into the conv (inference-only running stats), so the
    exported graph is conv(+bias) → LIF per layer;
  * fixed input resolution and batch (static shapes).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from evflow.ops.lif import LIFState, export_lif_step

__all__ = [
    "fold_batchnorm_params",
    "ExportFireNet",
    "export_variables_from_trained",
    "export_stablehlo",
    "load_and_run_stablehlo",
    "export_model",
    "export_lif_layer",
    "export_conv_lif_layer",
]


def fold_batchnorm_params(
    kernel: np.ndarray,
    bn_scale: np.ndarray,
    bn_bias: np.ndarray,
    bn_mean: np.ndarray,
    bn_var: np.ndarray,
    eps: float = 1e-5,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold BN(conv(x)) into conv'(x) = conv(x)*g + b.

    kernel is HWIO; BN params are per-output-channel."""
    g = bn_scale / np.sqrt(bn_var + eps)
    return kernel * g[None, None, None, :], bn_bias - bn_mean * g


class ExportFireNet(nn.Module):
    """Inference-only FireNet with deployment LIF semantics.

    Layer = conv(+folded-BN bias) [+ rec conv] → export LIF. State is the
    (mem, spk) pair per unit, exactly like the training model, so streaming
    deployment carries the same pytree.
    """

    num_bins: int = 2
    base_num_channels: int = 32
    kernel_size: int = 3
    recurrent: bool = True
    short: bool = False
    encoding: str = "cnt"

    @property
    def num_units(self):
        return 5 if self.short else 7

    @property
    def unit_names(self):
        if self.short:
            return ("head", "G1", "R1a", "G2", "R2a")
        return ("head", "G1", "R1a", "R1b", "G2", "R2a", "R2b")

    @property
    def recurrent_units(self):
        return {"G1", "G2"} if self.recurrent else set()

    def init_states(self, batch, height, width):
        shape = (batch, height, width, self.base_num_channels)
        return tuple(
            LIFState(jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
            for _ in range(self.num_units)
        )

    @nn.compact
    def __call__(self, x, states):
        new_states = []
        h = x
        for i, name in enumerate(self.unit_names):
            ff = nn.Conv(
                self.base_num_channels,
                (self.kernel_size, self.kernel_size),
                padding="SAME",
                use_bias=True,
                name=f"{name}_ff",
            )(h)
            if name in self.recurrent_units:
                ff = ff + nn.Conv(
                    self.base_num_channels,
                    (self.kernel_size, self.kernel_size),
                    padding="SAME",
                    use_bias=False,
                    name=f"{name}_rec",
                )(states[i].spk)
            beta = self.param(f"{name}_beta", nn.initializers.zeros, (self.base_num_channels,))
            theta = self.param(f"{name}_threshold", nn.initializers.ones, (self.base_num_channels,))
            spk, mem = export_lif_step(ff, states[i].mem, beta, theta)
            new_states.append(LIFState(mem, spk))
            h = spk
        flow = jnp.tanh(
            nn.Conv(2, (1, 1), padding="SAME", use_bias=True, name="pred")(h)
        )
        return flow, tuple(new_states)


def export_variables_from_trained(
    model, variables: Dict[str, Any]
) -> Tuple[ExportFireNet, Dict[str, Any]]:
    """Convert trained FireNet variables into ExportFireNet params:
    BN folded into conv kernels/biases, beta clipped to [0, 1] (the training
    cell clamps at use), thresholds clamped >= 0.01."""
    if getattr(model, "mpbn", False):
        raise NotImplementedError(
            "MPBN models cannot be exported through ExportFireNet: the "
            "membrane BatchNorm changes the spike condition (fold via "
            "evflow.models.norm.mpbn_effective_threshold needs the export "
            "cell to separate thresholding from the raw-membrane reset); "
            "export the plain-BN equivalent instead"
        )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    emodel = ExportFireNet(
        num_bins=model.num_bins,
        base_num_channels=model.base_num_channels,
        kernel_size=model.kernel_size,
        recurrent=model.recurrent,
        short=model.short,
        encoding=model.encoding,
    )
    ep: Dict[str, Any] = {}
    for name in emodel.unit_names:
        p = params[name]
        kernel = np.asarray(p["ff"]["kernel"], np.float32)
        bn = p["bn"]["BatchNorm_0"]
        bs = stats[name]["bn"]["BatchNorm_0"]
        scale = np.asarray(bn["scale"], np.float32)
        bias = np.asarray(bn["bias"], np.float32)
        if "p" in p["bn"]:
            # TEBN: y = BN(x) * p_t; flax eval with no timestep uses
            # p.mean(0) (models/norm.py:69) — exact fold: scale'=γ·p̄,
            # bias'=β·p̄
            pm = np.asarray(p["bn"]["p"], np.float32).mean(axis=0)
            scale = scale * pm
            bias = bias * pm
        fk, fb = fold_batchnorm_params(
            kernel,
            scale,
            bias,
            np.asarray(bs["mean"], np.float32),
            np.asarray(bs["var"], np.float32),
        )
        ep[f"{name}_ff"] = {"kernel": fk, "bias": fb}
        if "rec" in p:
            # rec conv output also passes through the same BN (applied to
            # ff+rec in training); fold the scale into the rec kernel too
            g = scale / np.sqrt(
                np.asarray(bs["var"], np.float32) + 1e-5
            )
            ep[f"{name}_rec"] = {
                "kernel": np.asarray(p["rec"]["kernel"], np.float32)
                * g[None, None, None, :]
            }
        ep[f"{name}_beta"] = np.clip(np.asarray(p["beta"], np.float32), 0.0, 1.0)
        ep[f"{name}_threshold"] = np.maximum(
            np.asarray(p["threshold"], np.float32), 0.01
        )
    ep["pred"] = {
        "kernel": np.asarray(params["pred"]["conv2d"]["kernel"], np.float32),
        "bias": np.asarray(params["pred"]["conv2d"]["bias"], np.float32),
    }
    return emodel, {"params": ep}


def export_stablehlo(fn, example_args, path: str) -> bytes:
    """Serialize a jitted function to a portable StableHLO artifact.

    Lowered for BOTH tpu and cpu so the artifact replays on any
    deployment host (jax.export locks artifacts to their lowering
    platforms; the reference's ONNX is platform-neutral)."""
    from jax import export as jexport

    try:
        exported = jexport.export(jax.jit(fn), platforms=("tpu", "cpu"))(
            *example_args
        )
    except Exception:
        # some jax builds reject multi-platform lowering for programs with
        # platform-specific ops — fall back to the default platform
        exported = jexport.export(jax.jit(fn))(*example_args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return data


def load_and_run_stablehlo(path: str, *args):
    """Deserialize and execute an exported artifact (deployment side)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call(*args)


def _pick_golden_input(rng, B, H, W, C=2, min_nonzero_frac=0.10):
    """Golden input with >= 10% nonzero pixels (Model_export.py:133-138)."""
    while True:
        x = (rng.random((B, H, W, C)) < 0.2).astype(np.float32) * rng.integers(
            1, 4, (B, H, W, C)
        ).astype(np.float32)
        if (x != 0).mean() >= min_nonzero_frac:
            return x


def export_model(
    model,
    variables: Dict[str, Any],
    out_dir: str,
    batch: int = 1,
    height: int = 256,
    width: int = 256,
    seed: int = 0,
    quantized: bool = False,
) -> Dict[str, str]:
    """Full-model export: StableHLO + golden inputs/outputs .npz
    (Model_export.py export_to_onnx equivalent).

    ``quantized=True`` exports int8-grid weights plus a quantization metadata
    sidecar (Model_export_RealQuant.py / QCDQ-export equivalent)."""
    emodel, evars = export_variables_from_trained(model, variables)
    if quantized:
        from evflow.quant.fake_quant import quantize_weights_symmetric

        qparams, scales = quantize_weights_symmetric(evars["params"])
        evars = {"params": qparams}
        os.makedirs(out_dir, exist_ok=True)
        import yaml

        with open(os.path.join(out_dir, "quant_metadata.yaml"), "w") as f:
            yaml.safe_dump(
                {"num_bits": 8, "weight_scales": scales,
                 "zero_points": {k: 0 for k in scales}}, f)
    states = emodel.init_states(batch, height, width)
    # bind params once so the exported callable takes (x, states) only
    def fwd(x, states):
        return emodel.apply(evars, x, states)

    rng = np.random.default_rng(seed)
    cin = int(getattr(model, "num_bins", 2)) if getattr(
        model, "encoding", "cnt") == "voxel" else 2
    x = jnp.asarray(_pick_golden_input(rng, batch, height, width, C=cin))
    flow, new_states = jax.jit(fwd)(x, states)

    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, "model.stablehlo")
    export_stablehlo(fwd, (x, states), artifact)
    np.savez(
        os.path.join(out_dir, "inputs.npz"),
        input=np.asarray(x),
        **{f"mem_{i}": np.asarray(s.mem) for i, s in enumerate(states)},
        **{f"spk_{i}": np.asarray(s.spk) for i, s in enumerate(states)},
    )
    np.savez(
        os.path.join(out_dir, "outputs.npz"),
        flow=np.asarray(flow),
        **{f"mem_{i}": np.asarray(s.mem) for i, s in enumerate(new_states)},
        **{f"spk_{i}": np.asarray(s.spk) for i, s in enumerate(new_states)},
    )
    return {"artifact": artifact, "inputs": os.path.join(out_dir, "inputs.npz"),
            "outputs": os.path.join(out_dir, "outputs.npz")}


def export_deploy_engine(
    engine,
    out_dir: str,
    batch: int = 1,
    height: int = 256,
    width: int = 256,
    seed: int = 0,
) -> Dict[str, str]:
    """StableHLO export of the int8 serving step (evflow/deploy.py).

    Unlike ``export_model(quantized=True)`` — which exports f32 convs with
    int8-grid weights — this artifact contains the REAL int8 dataflow:
    int8 dot_generals, int8 spike/membrane carries, host-folded scales.
    The deployable analog of the reference's Model_export_RealQuant.py
    QCDQ ONNX artifact."""
    params = engine.params

    def fwd(cnt, states):
        out, new_states = engine.apply(params, None, cnt, states)
        # the finest flow map (multires engines return coarse->fine;
        # FireNet's list has one entry)
        return out["flow"][-1], new_states

    rng = np.random.default_rng(seed)
    cnt = jnp.asarray(_pick_golden_input(rng, batch, height, width))
    states = engine.init_states(batch, height, width)
    flow, new_states = jax.jit(fwd)(cnt, states)

    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, "model_int8.stablehlo")
    export_stablehlo(fwd, (cnt, states), artifact)
    # FF units carry no spikes (engine drops never-read carries)
    np.savez(
        os.path.join(out_dir, "int8_inputs.npz"),
        input=np.asarray(cnt),
        **{f"mem_{i}": np.asarray(s.mem) for i, s in enumerate(states)},
        **{f"spk_{i}": np.asarray(s.spk) for i, s in enumerate(states)
           if s.spk is not None},
    )
    np.savez(
        os.path.join(out_dir, "int8_outputs.npz"),
        flow=np.asarray(flow),
        **{f"mem_{i}": np.asarray(s.mem) for i, s in enumerate(new_states)},
        **{f"spk_{i}": np.asarray(s.spk) for i, s in enumerate(new_states)
           if s.spk is not None},
    )
    return {"artifact": artifact,
            "inputs": os.path.join(out_dir, "int8_inputs.npz"),
            "outputs": os.path.join(out_dir, "int8_outputs.npz")}


def export_lif_layer(
    out_dir: str, channels: int = 4, height: int = 32, width: int = 32, seed: int = 0
):
    """Single-LIF-layer export (LIF_layer_export.py equivalent)."""
    rng = np.random.default_rng(seed)
    beta = jnp.asarray(rng.uniform(0, 1, (channels,)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0.01, 0.8, (channels,)).astype(np.float32))

    def fwd(x, mem):
        return export_lif_step(x, mem, beta, theta)

    x = jnp.asarray(rng.normal(size=(1, height, width, channels)).astype(np.float32))
    mem = jnp.zeros_like(x)
    spk, mem_out = jax.jit(fwd)(x, mem)
    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, "lif_layer.stablehlo")
    export_stablehlo(fwd, (x, mem), artifact)
    np.savez(os.path.join(out_dir, "lif_inputs.npz"), x=np.asarray(x), mem=np.asarray(mem))
    np.savez(
        os.path.join(out_dir, "lif_outputs.npz"),
        spk=np.asarray(spk), mem=np.asarray(mem_out),
    )
    return artifact


def export_conv_lif_layer(
    out_dir: str,
    in_channels: int = 2,
    channels: int = 16,
    height: int = 32,
    width: int = 32,
    seed: int = 0,
):
    """Conv+LIF layer export (ConvLIF_layer_export.py equivalent)."""
    rng = np.random.default_rng(seed)
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, in_channels, channels)).astype(np.float32))
    beta = jnp.asarray(rng.uniform(0, 1, (channels,)).astype(np.float32))
    theta = jnp.asarray(rng.uniform(0.01, 0.8, (channels,)).astype(np.float32))

    def fwd(x, mem):
        ff = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return export_lif_step(ff, mem, beta, theta)

    x = jnp.asarray(rng.normal(size=(1, height, width, in_channels)).astype(np.float32))
    mem = jnp.zeros((1, height, width, channels), jnp.float32)
    spk, mem_out = jax.jit(fwd)(x, mem)
    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, "conv_lif_layer.stablehlo")
    export_stablehlo(fwd, (x, mem), artifact)
    np.savez(os.path.join(out_dir, "conv_lif_inputs.npz"), x=np.asarray(x), mem=np.asarray(mem))
    np.savez(
        os.path.join(out_dir, "conv_lif_outputs.npz"),
        spk=np.asarray(spk), mem=np.asarray(mem_out),
    )
    return artifact
