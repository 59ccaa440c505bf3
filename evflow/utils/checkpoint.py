"""Checkpointing: atomic saves, 3-policy retention, resume, torch import.

Behavioral reference: utils/utils.py:9-184 (load_model/save_model) and the
checkpoint policy of train_flow.py:95-214 — three live checkpoints
(``lowest_loss`` with >1e-6 improvement, ``smoothest_loss`` by loss variance
over a 50-batch window, ``most_recent``), atomic tmp+rename writes,
superseded directories deleted.

Format: a msgpack file (flax.serialization) holding
``{params, batch_stats, opt_state, epoch, loss, loss_variance}`` plus a
sidecar ``config.yaml`` — the functional analog of the reference's torch
``.pth`` dict (train_flow.py:131-139).

``import_torch_checkpoint`` maps a reference PyTorch state_dict onto evflow
FireNet parameters (OIHW→HWIO kernels, ``lif.beta``/``lif.threshold`` →
per-channel vectors, BN stats → flax batch_stats), so reference-trained
models evaluate here directly — including the PTQ ``.lif.beta``→``.beta``
remap of utils/utils.py:44-70.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import numpy as np
import yaml

import flax
import jax

__all__ = [
    "save_checkpoint",
    "load_checkpoint",
    "CheckpointPolicy",
    "import_torch_checkpoint",
]


def save_checkpoint(directory: str, state: Dict[str, Any], config: Optional[dict] = None):
    """Atomic checkpoint write (tmp + os.replace, train_flow.py:148-151)."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, "model.msgpack")
    tmp = path + ".tmp"
    data = flax.serialization.to_bytes(jax.tree.map(np.asarray, state))
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    if config is not None:
        with open(os.path.join(directory, "config.yaml"), "w") as f:
            yaml.safe_dump(config, f)
    return path


def load_checkpoint(path: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a checkpoint onto a structure-matching template pytree."""
    if os.path.isdir(path):
        path = os.path.join(path, "model.msgpack")
    with open(path, "rb") as f:
        data = f.read()
    return flax.serialization.from_bytes(template, data)


class CheckpointPolicy:
    """Three-way retention policy (train_flow.py:95-214)."""

    def __init__(self, base_dir: str, improvement_eps: float = 1e-6, min_history: int = 10):
        self.base_dir = base_dir
        self.eps = improvement_eps
        self.min_history = min_history
        self.best_loss = float("inf")
        self.best_variance = float("inf")
        self.paths: Dict[str, Optional[str]] = {
            "lowest_loss": None,
            "smoothest_loss": None,
            "most_recent": None,
        }

    def _save(self, kind: str, epoch: int, state, config) -> str:
        old = self.paths[kind]
        new_dir = os.path.join(self.base_dir, kind, str(epoch))
        save_checkpoint(new_dir, state, config)
        if old is not None and os.path.exists(old) and old != new_dir:
            shutil.rmtree(old, ignore_errors=True)
        self.paths[kind] = new_dir
        return new_dir

    def update(
        self,
        epoch: int,
        avg_loss: float,
        loss_variance: float,
        history_len: int,
        state: Dict[str, Any],
        config: Optional[dict] = None,
    ) -> Dict[str, bool]:
        """Call at each epoch end; returns which checkpoints were written."""
        wrote = {"lowest_loss": False, "smoothest_loss": False, "most_recent": True}
        full_state = dict(state)
        full_state.update(epoch=epoch, loss=avg_loss, loss_variance=loss_variance)
        if avg_loss < self.best_loss - self.eps:
            self._save("lowest_loss", epoch, full_state, config)
            self.best_loss = avg_loss
            wrote["lowest_loss"] = True
        if loss_variance < self.best_variance and history_len > self.min_history:
            self._save("smoothest_loss", epoch, full_state, config)
            self.best_variance = loss_variance
            wrote["smoothest_loss"] = True
        self._save("most_recent", epoch, full_state, config)
        return wrote


# ---------------------------------------------------------------------------
# reference (PyTorch) checkpoint import
# ---------------------------------------------------------------------------

_UNIT_NAMES = ("head", "G1", "G2", "R1a", "R1b", "R2a", "R2b")


def _conv_kernel(t) -> np.ndarray:
    # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(t, np.float32), (2, 3, 1, 0))


def import_torch_checkpoint(path: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Map a reference FireNet ``state_dict`` onto evflow variables.

    Handles both the plain key layout (``head.ff.weight``, ``head.lif.beta``)
    and the PTQ layout where LIF params live at ``head.beta``
    (utils/utils.py:44-70). Unmatched evflow leaves keep their values;
    unmatched torch keys are returned for inspection.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model_state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v) for k, v in sd.items()}

    params = flax.core.unfreeze(variables["params"])
    batch_stats = flax.core.unfreeze(variables.get("batch_stats", {}))
    used = set()

    def take(key):
        if key in sd:
            used.add(key)
            return sd[key]
        return None

    for unit in _UNIT_NAMES:
        if unit not in params:
            continue
        p = params[unit]
        for conv in ("ff", "rec"):
            w = take(f"{unit}.{conv}.weight")
            if w is not None and conv in p:
                p[conv]["kernel"] = _conv_kernel(w)
        beta = take(f"{unit}.lif.beta")
        if beta is None:
            beta = take(f"{unit}.beta")
        if beta is not None and "beta" in p:
            p["beta"] = np.asarray(beta, np.float32).reshape(-1)
        thr = take(f"{unit}.lif.threshold")
        if thr is None:
            thr = take(f"{unit}.threshold")
        if thr is not None and "threshold" in p:
            p["threshold"] = np.asarray(thr, np.float32).reshape(-1)
        # original sigmoid-family cells (spiking_submodules.py:89-96) store
        # per-channel [C,1,1] 'leak'/'thresh' parameters directly on the unit
        lk = take(f"{unit}.leak")
        if lk is not None and "leak" in p:
            p["leak"] = np.asarray(lk, np.float32).reshape(-1)
        th = take(f"{unit}.thresh")
        if th is not None and "thresh" in p:
            p["thresh"] = np.asarray(th, np.float32).reshape(-1)
        # BatchNorm: torch {weight, bias, running_mean, running_var}.
        # TEBN modules nest theirs one level deeper ({unit}.bn.bn.* —
        # SNNtorch_spiking_submodules.py:33) — same flax destination.
        def import_bn(src: str, dst_p, dst_bs):
            g = take(f"{src}.weight")
            if g is None:
                src = f"{src}.bn"
                g = take(f"{src}.weight")
            if g is None or dst_p is None:
                return
            bn_params = dst_p["BatchNorm_0"]
            bn_params["scale"] = np.asarray(g, np.float32)
            b = take(f"{src}.bias")
            if b is not None:
                bn_params["bias"] = np.asarray(b, np.float32)
            rm = take(f"{src}.running_mean")
            rv = take(f"{src}.running_var")
            if dst_bs is not None and rm is not None:
                bs = dst_bs["BatchNorm_0"]
                bs["mean"] = np.asarray(rm, np.float32)
                bs["var"] = np.asarray(rv, np.float32)

        import_bn(f"{unit}.bn", p.get("bn"),
                  batch_stats.get(unit, {}).get("bn"))
        # MPBN (membrane-potential BN, {unit}.mpbn.bn.* in torch)
        import_bn(f"{unit}.mpbn", p.get("mpbn"),
                  batch_stats.get(unit, {}).get("mpbn"))
        # TEBN temporal weights
        tp = take(f"{unit}.bn.p")
        if tp is not None and "bn" in p and "p" in p["bn"]:
            p["bn"]["p"] = np.asarray(tp, np.float32).reshape(p["bn"]["p"].shape)

    w = take("pred.conv2d.weight")
    if w is not None and "pred" in params:
        params["pred"]["conv2d"]["kernel"] = _conv_kernel(w)
    b = take("pred.conv2d.bias")
    if b is not None and "pred" in params:
        params["pred"]["conv2d"]["bias"] = np.asarray(b, np.float32)

    if "multires_unetrec" in params:
        # SpikingRecEVFlowNet (models/model.py:723-858): torch modules
        # multires_unetrec.{encoders.N.conv|recurrent_block, resblocks.N
        # .conv1|conv2, decoders.N.conv2d, preds.N.conv2d} map 1:1 onto
        # the flax tree (same attribute names by design); ConvLIF leak/
        # thresh are [C, 1, 1] parameters (spiking_submodules.py:62-68)
        # flattened to our [C] vectors.
        u = params["multires_unetrec"]

        def cell(dst, src):
            w = take(f"{src}.ff.weight")
            if w is not None and "ff" in dst:
                dst["ff"]["kernel"] = _conv_kernel(w)
            wr = take(f"{src}.rec.weight")
            if wr is not None and "rec" in dst:
                dst["rec"]["kernel"] = _conv_kernel(wr)
            for name in ("leak", "thresh"):
                v = take(f"{src}.{name}")
                if v is not None and name in dst:
                    dst[name] = np.asarray(v, np.float32).reshape(-1)

        i = 0
        while f"encoder{i}" in u:
            cell(u[f"encoder{i}"]["conv"],
                 f"multires_unetrec.encoders.{i}.conv")
            cell(u[f"encoder{i}"]["recurrent_block"],
                 f"multires_unetrec.encoders.{i}.recurrent_block")
            i += 1
        i = 0
        while f"resblock{i}" in u:
            cell(u[f"resblock{i}"]["conv1"],
                 f"multires_unetrec.resblocks.{i}.conv1")
            cell(u[f"resblock{i}"]["conv2"],
                 f"multires_unetrec.resblocks.{i}.conv2")
            i += 1
        i = 0
        while f"decoder{i}" in u:
            cell(u[f"decoder{i}"]["conv2d"],
                 f"multires_unetrec.decoders.{i}.conv2d")
            w = take(f"multires_unetrec.preds.{i}.conv2d.weight")
            if w is not None:
                u[f"pred{i}"]["conv2d"]["kernel"] = _conv_kernel(w)
            b = take(f"multires_unetrec.preds.{i}.conv2d.bias")
            if b is not None:
                u[f"pred{i}"]["conv2d"]["bias"] = np.asarray(b, np.float32)
            i += 1

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    leftover = sorted(set(sd) - used)
    return out, leftover
