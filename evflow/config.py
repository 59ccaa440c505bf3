"""Config system: YAML schema with programmatic defaults + recursive merge.

Behavioral reference: configs/parser.py (YAMLParser :6-126 — defaults :32-66,
``parse_dict`` recursive merge :72-81, ``merge_configs`` :98-115,
``combine_entries`` :117-126) and the schema exercised by
configs/train_SNN.yml / configs/eval_MVSEC.yml.

Differences by design:
  * model/metric/optimizer classes are resolved through explicit registries
    (``evflow.registry``) instead of ``eval(name)``;
  * no torch device selection — device placement is handled by jax/pjit;
  * ``merge_configs`` re-hydrates stringified dicts with ``ast.literal_eval``
    rather than ``eval``.
"""

from __future__ import annotations

import ast
import copy
from typing import Any, Dict, Mapping, Optional

import yaml

__all__ = ["default_config", "load_config", "parse_dict", "merge_configs", "combine_entries", "Config"]

Config = Dict[str, Any]


def default_config() -> Config:
    """Programmatic defaults (configs/parser.py:32-66)."""
    cfg: Config = {}
    cfg["experiment"] = "Default"

    cfg["data"] = {"mode": "events", "window": 5000}

    cfg["loader"] = {
        "resolution": [180, 240],
        "batch_size": 1,
        "augment": [],
        "augment_prob": [],
        "seed": 0,
    }

    cfg["hot_filter"] = {"enabled": True, "max_px": 100, "min_obvs": 5, "max_rate": 0.8}

    cfg["model"] = {}
    cfg["spiking_neuron"] = {}

    cfg["vis"] = {"bars": False}
    return cfg


def parse_dict(src: Mapping[str, Any], dst: Optional[Config] = None) -> Config:
    """Recursive dict merge: values in ``src`` overwrite ``dst`` leaves
    (configs/parser.py:72-81). Returns ``dst``."""
    if dst is None:
        dst = {}
    for key, val in src.items():
        if isinstance(val, Mapping):
            if key not in dst or not isinstance(dst.get(key), dict):
                dst[key] = {}
            parse_dict(val, dst[key])
        else:
            dst[key] = val
    return dst


def load_config(path: str) -> Config:
    """Defaults + YAML overlay + ``combine_entries`` normalization."""
    cfg = default_config()
    with open(path) as fid:
        overlay = yaml.safe_load(fid) or {}
    parse_dict(overlay, cfg)
    return combine_entries(cfg)


def combine_entries(cfg: Config) -> Config:
    """Move top-level ``spiking_neuron`` under ``model`` (parser.py:117-126)."""
    if "spiking_neuron" in cfg:
        sn = cfg.pop("spiking_neuron")
        if sn:
            cfg.setdefault("model", {})["spiking_neuron"] = sn
        else:
            cfg.setdefault("model", {}).setdefault("spiking_neuron", {})
    return cfg


def merge_configs(run_params: Mapping[str, str], cfg: Config) -> Config:
    """Overlay training-run params (stringified, e.g. from a tracker) with the
    current eval config — eval settings win (parser.py:98-115)."""
    base: Config = {}
    for key, val in run_params.items():
        if isinstance(val, str) and len(val) > 0 and val[0] == "{":
            try:
                base[key] = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                base[key] = val
        else:
            base[key] = val
    parse_dict(cfg, base)
    return combine_entries(base)


def seed_from(cfg: Config) -> int:
    return int(cfg.get("loader", {}).get("seed", 0))


def clone(cfg: Config) -> Config:
    return copy.deepcopy(cfg)
