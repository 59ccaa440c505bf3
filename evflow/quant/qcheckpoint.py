"""Quantized checkpoint save/load/inspect.

Behavioral reference: utils/utils.py:125-280 (``save_quantized_model`` — state
dict plus extracted brevitas scales/zero-points and LIF beta/theta with a
separate ``*_quant_metadata`` file; ``load_quantized_model``;
``inspect_quantized_model``) and the QAT variant at train_flow_quant.py:33-117.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np
import yaml

import jax

from evflow.quant.fake_quant import quantize_weights_symmetric
from evflow.utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = [
    "save_quantized_checkpoint",
    "load_quantized_checkpoint",
    "inspect_quantized_checkpoint",
]


def _extract_lif_params(params) -> Dict[str, Dict[str, list]]:
    out: Dict[str, Dict[str, list]] = {}

    def walk(path, v):
        leaf = str(getattr(path[-1], "key", path[-1]))
        if leaf in ("beta", "threshold", "leak", "thresh"):
            unit = "/".join(str(getattr(k, "key", k)) for k in path[:-1]) or "root"
            out.setdefault(unit, {})[leaf] = np.asarray(v).ravel().tolist()
        return v

    jax.tree_util.tree_map_with_path(walk, params)
    return out


def save_quantized_checkpoint(
    directory: str,
    state: Dict[str, Any],
    config: Optional[dict] = None,
    num_bits: int = 8,
    state_quant_ranges: Optional[Dict[str, Tuple[float, float]]] = None,
) -> str:
    """Quantize conv kernels (per-tensor symmetric int8 fake-quant), save the
    checkpoint plus a ``quant_metadata.yaml`` sidecar with weight scales,
    zero-points, LIF beta/theta and membrane quant ranges."""
    qparams, scales = quantize_weights_symmetric(state["params"], num_bits)
    qstate = dict(state)
    qstate["params"] = qparams
    path = save_checkpoint(directory, qstate, config)
    metadata = {
        "num_bits": num_bits,
        "weight_scales": scales,
        "zero_points": {k: 0 for k in scales},  # symmetric quant
        "lif_params": _extract_lif_params(qparams),
        "state_quant_ranges": (
            {k: list(v) for k, v in state_quant_ranges.items()}
            if state_quant_ranges
            else {"default": [-250.0, 1.0]}
        ),
    }
    with open(os.path.join(directory, "quant_metadata.yaml"), "w") as f:
        yaml.safe_dump(metadata, f)
    return path


def load_quantized_checkpoint(path: str, template: Dict[str, Any]):
    """Restore a quantized checkpoint and its metadata sidecar."""
    directory = path if os.path.isdir(path) else os.path.dirname(path)
    state = load_checkpoint(path, template)
    meta_path = os.path.join(directory, "quant_metadata.yaml")
    metadata = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            metadata = yaml.safe_load(f)
    return state, metadata


def inspect_quantized_checkpoint(path: str, verbose: bool = True) -> Dict[str, Any]:
    """Summarize quantization metadata + per-tensor value ranges
    (eval_flow_quant.py print_quantization_info :30-183 analog)."""
    directory = path if os.path.isdir(path) else os.path.dirname(path)
    meta_path = os.path.join(directory, "quant_metadata.yaml")
    report: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = yaml.safe_load(f)
        report["num_bits"] = meta.get("num_bits")
        report["weight_scales"] = meta.get("weight_scales", {})
        report["state_quant_ranges"] = meta.get("state_quant_ranges", {})
        report["lif_units"] = sorted(meta.get("lif_params", {}))
        if verbose:
            print(f"quantized checkpoint: {directory}")
            print(f"  num_bits: {report['num_bits']}")
            print(f"  membrane ranges: {report['state_quant_ranges']}")
            for k, s in sorted(report["weight_scales"].items()):
                eff_bits = np.log2(max(2.0, 2 / max(s, 1e-12))) if s else 0
                print(f"  {k:40s} scale={s:.6g}")
    elif verbose:
        print(f"no quant_metadata.yaml in {directory}")
    return report
