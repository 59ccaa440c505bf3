"""Serving autotuner (evflow/autotune.py): grid measurement + artifact carry.

The tuned operating point is a measurement, so tests only pin structure
and plumbing: every grid cell is measured and positive, the winner is the
argmax of the table, and the config survives the save_engine /
from_artifact roundtrip (serving hosts read the tuned point from the
deploy artifact). The measurement protocol itself (donated carries,
scalar-fetch sync) is bench.py's, exercised here on tiny CPU shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np

from evflow.autotune import ServingConfig, autotune_serving, measure_serving
from evflow.deploy import Int8DeployEngine, save_engine
from evflow.registry import build_model

RES = 16


def _model():
    cfg = {
        "name": "LIFFireNet_short",
        "encoding": "cnt",
        "num_bins": 2,
        "base_num_channels": 8,
        "kernel_size": 3,
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
    }
    model = build_model(cfg)
    states = model.init_states(1, RES, RES)
    variables = model.init(
        jax.random.PRNGKey(0), None, jnp.zeros((1, RES, RES, 2)), states
    )
    return model, variables


def test_measure_serving_positive():
    model, variables = _model()
    engine = Int8DeployEngine(model, variables, mem_dtype="bfloat16")
    rate = measure_serving(engine, 2, RES, RES, chunk=4, iters=1)
    assert np.isfinite(rate) and rate > 0


def test_autotune_grid_and_winner():
    model, variables = _model()
    cfg = autotune_serving(
        model, variables, RES, RES,
        tiers=("bfloat16", "int8"), batches=(1, 2), chunk=4, iters=1,
    )
    # every cell measured
    assert set(cfg.table) == {
        "bfloat16/B1/T4", "bfloat16/B2/T4", "int8/B1/T4", "int8/B2/T4",
    }
    assert all(v > 0 for v in cfg.table.values())
    # winner is the table argmax and is self-consistent
    best_cell = max(cfg.table, key=cfg.table.get)
    assert cfg.table[best_cell] == cfg.windows_per_s
    assert best_cell == f"{cfg.mem_dtype}/B{cfg.batch}/T{cfg.chunk}"


def test_serving_config_artifact_roundtrip(tmp_path):
    model, variables = _model()
    engine = Int8DeployEngine(model, variables, mem_dtype="mixed")
    tuned = ServingConfig(
        mem_dtype="mixed", batch=2, chunk=64, windows_per_s=1234.5,
        table={"mixed/B2/T64": 1234.5},
    )
    path = save_engine(engine, str(tmp_path / "eng"), serving=tuned)
    loaded = Int8DeployEngine.from_artifact(model, path)
    assert loaded.serving is not None
    back = ServingConfig.from_meta(loaded.serving)
    assert back.mem_dtype == "mixed" and back.batch == 2 and back.chunk == 64
    assert back.windows_per_s == 1234.5
    assert back.table == {"mixed/B2/T64": 1234.5}
    # artifacts without a tuned config stay None (backwards compatible)
    path2 = save_engine(engine, str(tmp_path / "eng2"))
    assert Int8DeployEngine.from_artifact(model, path2).serving is None


def test_autotune_chunk_sweep():
    model, variables = _model()
    cfg = autotune_serving(
        model, variables, RES, RES,
        tiers=("bfloat16",), batches=(1,), chunks=(2, 4), iters=1,
    )
    assert set(cfg.table) == {"bfloat16/B1/T2", "bfloat16/B1/T4"}
    assert cfg.chunk in (2, 4)
    assert cfg.table[f"bfloat16/B1/T{cfg.chunk}"] == cfg.windows_per_s
