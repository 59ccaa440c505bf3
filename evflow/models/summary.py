"""Model summaries: trainable parameter counts per module.

Behavioral reference: models/base.py:11-31 (``BaseModel.__str__`` appending
"Trainable parameters: N") and the torchinfo ``summary`` call in
eval_flow.py:8.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict

import jax
import numpy as np

__all__ = ["count_params", "summarize"]


def count_params(variables: Dict[str, Any]) -> int:
    params = variables.get("params", variables)
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def summarize(variables: Dict[str, Any], name: str = "model") -> str:
    """Per-top-level-module parameter table + total."""
    params = variables.get("params", variables)
    per_module = defaultdict(int)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, v in flat:
        top = str(getattr(path[0], "key", path[0]))
        per_module[top] += int(np.prod(v.shape))
    lines = [f"{name} parameter summary:"]
    for mod in sorted(per_module):
        lines.append(f"  {mod:16s} {per_module[mod]:>10,d}")
    lines.append(f"  {'TOTAL':16s} {sum(per_module.values()):>10,d}")
    if "batch_stats" in variables:
        n_stats = int(
            sum(np.prod(x.shape) for x in jax.tree.leaves(variables["batch_stats"]))
        )
        lines.append(f"  (+ {n_stats:,d} BatchNorm running-stat values)")
    return "\n".join(lines)
