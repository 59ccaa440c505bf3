"""Measure the TP (channel-sharding) communication cost of the serving
engines — in particular the UNet phase tier's GSPMD "involuntary full
rematerialization" reshards around the phase interleave transposes.

Method: compile each engine step under TP on the virtual 8-CPU mesh
(1x8 data x model), walk the optimized HLO, and sum the output bytes of
every cross-partition collective (all-gather / all-to-all / all-reduce /
collective-permute / cross-replica copies). The per-window collective
bytes, compared against the engine's activation working set, is the
overhead factor ROOFLINE §4 documents; timing on the CPU mesh would be
meaningless for TPU, byte volume is topology-independent.

Engines measured:
  firenet      : Int8DeployEngine (FireNet 32ch, 64^2) — TP bit-exact,
                 collectives are the per-layer channel halos only
  unet         : Int8UNetEngine, resize decoders (phase_decoders=False)
  unet-phase   : Int8UNetEngine, phase decoders — the flagged tier

Run: python benchmarks/probe_tp_phase_cost.py
"""
import sys

sys.path.insert(0, "/root/repo")

import re

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np

assert all(d.platform == "cpu" for d in jax.devices())

from evflow.parallel.tensor import (
    channel_shardings,
    make_mesh_tp,
    param_shardings,
)

COLLECTIVES = ("all-gather", "all-to-all", "all-reduce",
               "collective-permute", "reduce-scatter")

_SHAPE_RE = re.compile(r"(f32|bf16|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1,
          "u8": 1, "pred": 1}


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _BYTES[dt]
    return total


def collective_bytes(compiled) -> dict:
    """Sum output bytes of every collective instruction. HLO lines read
    ``%name = <shape(s)> op(...)`` — shapes sit between '=' and the op
    token."""
    txt = compiled.as_text()
    out = {k: 0 for k in COLLECTIVES}
    for line in txt.splitlines():
        s = line.strip()
        if " = " not in s:
            continue
        rhs = s.split(" = ", 1)[1]
        for k in COLLECTIVES:
            m = re.search(rf"\b{k}(-start)?\(", rhs)
            if m:
                out[k] += _shape_bytes(rhs[: m.start()])
    out["total"] = sum(out.values())
    return out


def compile_tp(step_fn, mesh, variables, window, states):
    vspec = param_shardings(variables, mesh)
    wspec = channel_shardings(window, mesh)
    sspec = channel_shardings(states, mesh)
    return (
        jax.jit(step_fn, in_shardings=(vspec, wspec, sspec))
        .lower(variables, window, states)
        .compile()
    )


def firenet_engine(H=64, W=64, C=32):
    from evflow.deploy import Int8DeployEngine
    from evflow.registry import build_model

    cfg = {"name": "LIFFireNet", "num_bins": 2, "base_num_channels": C,
           "kernel_size": 3, "encoding": "cnt",
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    states = model.init_states(1, H, W)
    cnt = jnp.zeros((1, H, W, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), None, cnt, states)
    eng = Int8DeployEngine(model, variables, mem_dtype="bfloat16")

    def step(params, window, st):
        out, new_st = eng.apply(params, None, window, st)
        return out["flow"][0], new_st

    return step, eng.params, cnt, eng.init_states(1, H, W)


def unet_engine(phase, H=64, W=64, C=32):
    from evflow.deploy_unet import Int8UNetEngine
    from evflow.registry import build_model

    cfg = {"name": "SpikingRecEVFlowNet", "num_bins": 2,
           "base_num_channels": C, "kernel_size": 3, "encoding": "cnt",
           "mask_output": True,
           "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}}
    model = build_model(cfg)
    states = model.init_states(1, H, W)
    vox = jnp.zeros((1, H, W, 2), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), None, vox, states)
    eng = Int8UNetEngine(model, variables, compute="hybrid",
                         phase_decoders=phase)

    def step(params, window, st):
        out, new_st = eng.apply(params, None, window, st)
        return out["flow"][0], new_st

    return step, eng.params, vox, eng.init_states(1, H, W)


def _run_one(engine: str, d: int, nm: int):
    """Compile one (engine, mesh) cell and print its collective bytes.
    'Involuntary full rematerialization' is an XLA C++ stderr warning, so
    the sweep driver runs each cell in a subprocess and greps stderr."""
    mesh = make_mesh_tp(d, nm)
    if engine == "firenet":
        step, params, window, states = firenet_engine()
    else:
        step, params, window, states = unet_engine(engine == "unet-phase")
    compiled = compile_tp(step, mesh, params, window, states)
    cb = collective_bytes(compiled)
    detail = ", ".join(f"{k}={v / 1e6:.2f}MB" for k, v in cb.items()
                       if k != "total" and v)
    print(f"{engine:11s} mesh {d}x{nm}: collectives "
          f"{cb['total'] / 1e6:7.2f} MB/window  [{detail}]", flush=True)


if __name__ == "__main__":
    import subprocess

    if len(sys.argv) == 4:  # subprocess worker: engine d nm
        _run_one(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
        sys.exit(0)

    import os

    env = dict(os.environ, TF_CPP_MIN_LOG_LEVEL="0")
    for engine in ("firenet", "unet", "unet-phase"):
        for d, nm in [(1, 8), (2, 4), (1, 2)]:
            proc = subprocess.run(
                [sys.executable, __file__, engine, str(d), str(nm)],
                capture_output=True, text=True, env=env)
            sys.stdout.write(proc.stdout)
            n_remat = proc.stderr.count("Involuntary full rematerialization")
            if n_remat:
                print(f"  ^^ {n_remat} involuntary-full-remat reshards "
                      "(decoder phase-interleave transposes)", flush=True)
            if proc.returncode != 0:
                print(proc.stderr[-800:])
                sys.exit(proc.returncode)
