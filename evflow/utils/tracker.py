"""Experiment tracking: run directories with params/metrics/artifacts.

Behavioral reference: the MLflow usage of train_flow.py:39-48,124-125 and
utils/mlflow.py:8-41 (``log_config`` writing auto-incremented ``eval_N.yml``
eval configs, ``log_results`` writing ``metrics_N.yml``). MLflow itself is
not a dependency here; the tracker writes the same information to a local
run directory (params.yaml / metrics.jsonl / artifacts/), which ``eval``
reads back the way eval_flow.py re-hydrates run params
(configs/parser.py:98-115).
"""

from __future__ import annotations

import json
import os
import subprocess
import time
import uuid
from typing import Any, Dict, Optional

import yaml

__all__ = ["Run", "log_config", "log_results", "create_model_dir", "save_csv", "grad_stats"]


class Run:
    """A local tracking run (mlflow.start_run analog)."""

    def __init__(self, root: str = "runs", experiment: str = "Default", runid: Optional[str] = None):
        self.runid = runid or uuid.uuid4().hex[:12]
        self.dir = os.path.join(root, experiment, self.runid)
        os.makedirs(os.path.join(self.dir, "artifacts"), exist_ok=True)
        self._metrics_path = os.path.join(self.dir, "metrics.jsonl")

    def log_params(self, params: Dict[str, Any]):
        with open(os.path.join(self.dir, "params.yaml"), "w") as f:
            yaml.safe_dump(params, f)

    def log_metric(self, name: str, value: float, step: int = 0):
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps({"t": time.time(), "name": name, "value": float(value), "step": step}) + "\n")

    def log_artifact(self, path: str):
        import shutil

        shutil.copy(path, os.path.join(self.dir, "artifacts", os.path.basename(path)))

    def log_histograms(self, tensors: Dict[str, Any], step: int, bins: int = 64,
                       group: str = "params"):
        """Append per-tensor histograms + stats to ``histograms.jsonl``.

        The file-based analog of the reference's TensorBoard histogram
        logging during QAT/validation training (train_flow_quant.py:386-462,
        train_flow_validation.py:427-432): weights, LIF beta/theta, quant
        scales, and gradients every N steps."""
        import numpy as np

        path = os.path.join(self.dir, "histograms.jsonl")
        with open(path, "a") as f:
            for name, v in tensors.items():
                a = np.asarray(v, np.float64).ravel()
                if a.size == 0 or not np.isfinite(a).any():
                    continue
                a = a[np.isfinite(a)]
                counts, edges = np.histogram(a, bins=bins)
                f.write(json.dumps({
                    "t": time.time(), "step": step, "group": group, "name": name,
                    "min": float(a.min()), "max": float(a.max()),
                    "mean": float(a.mean()), "std": float(a.std()),
                    "counts": counts.tolist(),
                    "lo": float(edges[0]), "hi": float(edges[-1]),
                }) + "\n")

    def save_diff(self, name: str = "train_diff.txt"):
        """Record the working-tree diff (utils/utils.py:116-122)."""
        try:
            diff = subprocess.run(
                ["git", "diff"], capture_output=True, text=True, timeout=30
            ).stdout
        except Exception:
            diff = ""
        with open(os.path.join(self.dir, "artifacts", name), "w") as f:
            f.write(diff)

    @staticmethod
    def load_params(root: str, experiment: str, runid: str) -> Dict[str, Any]:
        with open(os.path.join(root, experiment, runid, "params.yaml")) as f:
            return yaml.safe_load(f)


def create_model_dir(path_results: str, runid: str) -> str:
    """utils/utils.py:90-95."""
    path = os.path.join(path_results, runid)
    os.makedirs(path, exist_ok=True)
    return path


def log_config(path_results: str, runid: str, config: dict) -> int:
    """Store eval settings as ``eval_N.yml`` with auto-increment
    (utils/mlflow.py:8-26)."""
    eval_id = 0
    while os.path.exists(os.path.join(path_results, f"eval_{eval_id}.yml")):
        eval_id += 1
    with open(os.path.join(path_results, f"eval_{eval_id}.yml"), "w") as f:
        yaml.safe_dump(config, f)
    return eval_id


def log_results(runid: str, results: dict, path_results: str, eval_id: int):
    """Store eval results as ``metrics_N.yml`` (utils/mlflow.py:29-41)."""
    with open(os.path.join(path_results, f"metrics_{eval_id}.yml"), "w") as f:
        yaml.safe_dump({"runid": runid, **results}, f)


def save_csv(rows, path: str):
    """Append rows of dicts to a CSV (utils/utils.py:103-113)."""
    import csv

    exists = os.path.exists(path)
    if not rows:
        return
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=sorted(rows[0].keys()))
        if not exists:
            w.writeheader()
        for r in rows:
            w.writerow(r)


def grad_stats(grads) -> Dict[str, float]:
    """Per-weight |grad| mean/min/max (utils/gradients.py:4-11)."""
    import jax
    import numpy as np

    out = {}
    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    for path, g in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        a = np.abs(np.asarray(g))
        out[f"{name}/mean"] = float(a.mean())
        out[f"{name}/min"] = float(a.min())
        out[f"{name}/max"] = float(a.max())
    return out
