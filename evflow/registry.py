"""Explicit registries for models / metrics / optimizers.

Replaces the reference's ``eval(name)`` dispatch (train_flow.py:75,82;
eval_flow.py:149,159) with whitelisted factories.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import optax

_MODEL_BUILDERS: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    def deco(fn):
        _MODEL_BUILDERS[name] = fn
        return fn

    return deco


def model_names():
    return sorted(_MODEL_BUILDERS)


def build_model(model_cfg: Dict[str, Any]):
    """Build a model module from the config's ``model`` section
    (schema of configs/train_SNN.yml model+spiking_neuron)."""
    name = model_cfg.get("name")
    if name not in _MODEL_BUILDERS:
        raise KeyError(f"Unknown model {name!r}. Registered: {model_names()}")
    return _MODEL_BUILDERS[name](model_cfg)


def _firenet_kwargs(cfg: Dict[str, Any]) -> Dict[str, Any]:
    sn = cfg.get("spiking_neuron") or {}
    tebn = cfg.get("tebn") or {}
    mpbn = cfg.get("mpbn") or {}
    tebn_enabled = tebn.get("enabled", False) if isinstance(tebn, dict) else bool(tebn)
    mpbn_enabled = mpbn.get("enabled", False) if isinstance(mpbn, dict) else bool(mpbn)
    kwargs = dict(
        num_bins=int(cfg.get("num_bins", 2)),
        base_num_channels=int(cfg.get("base_num_channels", 32)),
        kernel_size=int(cfg.get("kernel_size", 3)),
        encoding=cfg.get("encoding", "cnt"),
        norm_input=bool(cfg.get("norm_input", False)),
        mask_output=bool(cfg.get("mask_output", True)),
        tebn=tebn_enabled,
        num_timesteps=int(tebn.get("num_timesteps", 4)) if isinstance(tebn, dict) else 4,
        mpbn=mpbn_enabled,
        cell_family=cfg.get("cell_family", "snn"),
    )
    acts = cfg.get("activations")
    if acts:
        kwargs["activation"] = acts[0]
    for key in ("leak", "thresh"):
        if key in sn:
            kwargs[key] = tuple(sn[key])
    for key in ("learn_leak", "learn_thresh", "hard_reset", "detach"):
        if key in sn:
            kwargs[key] = bool(sn[key])
    if "act_width" in sn:
        kwargs["act_width"] = float(sn["act_width"])
    if cfg.get("compute_dtype") == "bfloat16":
        import jax.numpy as jnp

        kwargs["compute_dtype"] = jnp.bfloat16
    if "conv_impl" in cfg:
        kwargs["conv_impl"] = cfg["conv_impl"]
    if cfg.get("state_dtype") == "bfloat16":
        import jax.numpy as jnp

        kwargs["state_dtype"] = jnp.bfloat16

    # QAT wiring (train_flow_quant.py modes): quantization.enabled without
    # PTQ builds the model with fake-quant hooks in the training graph
    q = cfg.get("quantization") or {}
    if q.get("enabled") and not q.get("PTQ"):
        from evflow.quant.fake_quant import dynamic_conv_quant, state_quant_fn

        # dynamic absmax unless calibrated static scales are installed
        # (_apply_static_qat swaps in per-layer static hooks post-build)
        kwargs["conv_fake_quant"] = dynamic_conv_quant()
        if not q.get("Conv_only"):
            kwargs["state_quant"] = state_quant_fn()
    return kwargs


def _apply_static_qat(model, cfg: Dict[str, Any]):
    """Swap the dynamic QAT conv-quant hook for calibrated static-scale
    hooks when ``quantization.static_scales`` is present.

    The reference's brevitas QAT runs with scales calibrated from the
    pretrained FP32 start (train_flow_quant.py:153-155 +
    SNNtorch_spiking_submodules.py:177-208), so train-time and deploy-time
    quantization grids agree; ``train_flow_quant.py --calibration static``
    collects the scales (evflow/quant/calibrate.py
    collect_activation_scales) and stores them in the config for this hook.
    """
    q = cfg.get("quantization") or {}
    scales = q.get("static_scales")
    if not (q.get("enabled") and not q.get("PTQ") and scales):
        return model
    from evflow.quant.fake_quant import static_conv_quant

    hooks = tuple(
        static_conv_quant(scales, layer=u) for u in (*model.unit_names, "pred")
    )
    return model.clone(conv_fake_quant=None, conv_fake_quant_per_layer=hooks)


@register_model("LIFFireNet")
def _build_liffirenet(cfg):
    from evflow.models.firenet import FireNet

    return _apply_static_qat(FireNet(recurrent=True, short=False, **_firenet_kwargs(cfg)), cfg)


@register_model("LIFFireNet_short")
def _build_liffirenet_short(cfg):
    from evflow.models.firenet import FireNet

    return _apply_static_qat(FireNet(recurrent=True, short=True, **_firenet_kwargs(cfg)), cfg)


@register_model("LIFFireFlowNet")
def _build_liffireflownet(cfg):
    from evflow.models.firenet import FireNet

    return _apply_static_qat(FireNet(recurrent=False, short=False, **_firenet_kwargs(cfg)), cfg)


@register_model("LIFFireFlowNet_short")
def _build_liffireflownet_short(cfg):
    from evflow.models.firenet import FireNet

    return _apply_static_qat(FireNet(recurrent=False, short=True, **_firenet_kwargs(cfg)), cfg)


@register_model("SpikingRecEVFlowNet")
def _build_spikingrecevflownet(cfg):
    from evflow.models.unet import SpikingRecEVFlowNet

    sn = cfg.get("spiking_neuron") or {}
    kwargs = dict(
        num_bins=int(cfg.get("num_bins", 2)),
        base_num_channels=int(cfg.get("base_num_channels", 32)),
        kernel_size=int(cfg.get("kernel_size", 3)),
        encoding=cfg.get("encoding", "cnt"),
        norm_input=bool(cfg.get("norm_input", False)),
        mask_output=bool(cfg.get("mask_output", True)),
        norm=cfg.get("norm"),
        use_upsample_conv=bool(cfg.get("use_upsample_conv", True)),
    )
    for key in ("leak", "thresh"):
        if key in sn:
            kwargs[key] = tuple(sn[key])
    for key in ("learn_leak", "learn_thresh", "hard_reset", "detach"):
        if key in sn:
            kwargs[key] = bool(sn[key])
    return SpikingRecEVFlowNet(**kwargs)


# ---------------------------------------------------------------------------
# optimizers (train_flow.py:82 uses eval(config.optimizer.name))
# ---------------------------------------------------------------------------

_OPTIMIZERS: Dict[str, Callable[..., optax.GradientTransformation]] = {
    "Adam": lambda lr, **kw: optax.adam(lr, **kw),
    "AdamW": lambda lr, **kw: optax.adamw(lr, **kw),
    "SGD": lambda lr, **kw: optax.sgd(lr, **kw),
    "RMSprop": lambda lr, **kw: optax.rmsprop(lr, **kw),
}


def build_optimizer(opt_cfg: Dict[str, Any]) -> optax.GradientTransformation:
    name = opt_cfg.get("name", "Adam")
    if name not in _OPTIMIZERS:
        raise KeyError(f"Unknown optimizer {name!r}. Registered: {sorted(_OPTIMIZERS)}")
    # forward every hyperparameter except the name (weight_decay, momentum,
    # ...) — the registered factories accept keyword args
    kw = {k: v for k, v in opt_cfg.items() if k not in ("name", "lr")}
    return _OPTIMIZERS[name](float(opt_cfg.get("lr", 2e-4)), **kw)


# ---------------------------------------------------------------------------
# validation metrics (eval_flow.py:156-159 uses eval(metric))
# ---------------------------------------------------------------------------

def build_metrics(config: Dict[str, Any], flow_scaling: float):
    from evflow.loss import metrics as M

    table = {
        "AEE": M.AEE,
        "NEE": M.NEE,
        "AAE": M.AAE,
        "NAAE": M.NAAE,
        "AE_ofMeans": M.AEofMeans,
        "AAE_Weighted": M.AAEWeighted,
        "AAE_Filtered": M.AAEFiltered,
    }
    names = config.get("metrics", {}).get("name", [])
    out = []
    for n in names:
        if n not in table:
            raise KeyError(f"Unknown metric {n!r}. Registered: {sorted(table)}")
        out.append(table[n](config, flow_scaling=flow_scaling))
    return out
