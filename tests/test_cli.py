"""CLI entry-point smoke tests (the reference script surface, SURVEY §2 L6)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

from evflow.data.synthetic import make_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("cli")
    data_root = str(ws / "data")
    make_dataset(data_root, num_sequences=1, resolution=(32, 32),
                 events_per_sec=20_000, duration=0.4, flows=[(10.0, -5.0)])
    train_cfg = {
        "experiment": "cli_test",
        "data": {"path": data_root, "mode": "events", "window": 250, "window_loss": 500},
        "model": {
            "name": "LIFFireNet_short", "encoding": "cnt", "round_encoding": False,
            "num_bins": 2, "base_num_channels": 8, "kernel_size": 3,
            "mask_output": True,
        },
        "spiking_neuron": {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]},
        "loss": {"flow_regul_weight": 0.001, "clip_grad": 1.0},
        "optimizer": {"name": "Adam", "lr": 0.0002},
        "loader": {"n_epochs": 100, "batch_size": 1, "resolution": [32, 32],
                   "std_resolution": [32, 32], "augment": [], "seed": 0},
        "vis": {"verbose": False, "store_grads": False, "bars": False},
        "hot_filter": {"enabled": False},
    }
    eval_cfg = dict(train_cfg)
    eval_cfg = yaml.safe_load(yaml.safe_dump(train_cfg))
    eval_cfg["data"] = {"path": data_root, "mode": "gtflow_dt1", "window": 1}
    eval_cfg["metrics"] = {"name": ["AEE", "AAE"], "flow_scaling": 32, "heat_map": False}
    tc = str(ws / "train.yml")
    ec = str(ws / "eval.yml")
    with open(tc, "w") as f:
        yaml.safe_dump(train_cfg, f)
    with open(ec, "w") as f:
        yaml.safe_dump(eval_cfg, f)
    return {"ws": str(ws), "train_cfg": tc, "eval_cfg": ec, "data": data_root}


def run_cli(args, timeout=420):
    env = dict(os.environ, JAX_PLATFORMS="cpu", MPLBACKEND="Agg")
    # drop the axon sitecustomize registration: its compile hook slows every
    # CPU jit ~20x in subprocesses (see BENCH_NOTES.md)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    out = subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                         capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, f"stderr:\n{out.stderr[-3000:]}"
    return out


@pytest.fixture(scope="module")
def trained_run(workspace):
    runs = os.path.join(workspace["ws"], "runs")
    # enough steps to cross an epoch boundary so a checkpoint is written
    run_cli(["train_flow.py", "--config", workspace["train_cfg"],
             "--path_runs", runs, "--max_steps", "40", "--num_devices", "1"])
    exp_dir = os.path.join(runs, "cli_test")
    runid = os.listdir(exp_dir)[0]
    return os.path.join(exp_dir, runid)


def test_train_flow_cli(trained_run):
    assert os.path.exists(os.path.join(trained_run, "params.yaml"))


def test_eval_flow_cli(workspace, trained_run):
    # eval with a random-weight model path is exercised via the quant CLI;
    # here: eval the trained checkpoint dir if present, else random init
    ckpts = os.path.join(trained_run, "checkpoints", "most_recent")
    if not os.path.isdir(ckpts):
        pytest.skip("no checkpoint written in 3 steps (no epoch boundary)")
    ckpt = os.path.join(ckpts, sorted(os.listdir(ckpts))[-1])
    out = run_cli(["eval_flow.py", ckpt, "--config", workspace["eval_cfg"],
                   "--max_windows", "3", "--debug"])
    assert "AEE" in out.stdout


def test_eval_flow_profile_cli(workspace, trained_run, tmp_path):
    """--profile writes a jax.profiler device trace (SURVEY §5.1 TPU analog)."""
    prof = str(tmp_path / "trace")
    run_cli(["eval_flow.py", _ckpt(trained_run), "--config", workspace["eval_cfg"],
             "--max_windows", "2", "--debug", "--profile", prof])
    hits = []
    for root, _, files in os.walk(prof):
        hits += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
    assert hits, "no profiler trace files written"


def _ckpt(trained_run):
    ckpts = os.path.join(trained_run, "checkpoints", "most_recent")
    if not os.path.isdir(ckpts):
        pytest.skip("no checkpoint written")
    return os.path.join(ckpts, sorted(os.listdir(ckpts))[-1])


def test_eval_flow_quant_ptq_cli(workspace, trained_run):
    out = run_cli(["eval_flow_quant.py", _ckpt(trained_run),
                   "--config", workspace["eval_cfg"], "--mode", "ptq",
                   "--calibration_batches", "2", "--max_windows", "3", "--debug"])
    assert "AEE" in out.stdout


def test_eval_flow_quant_deploy_cli(workspace, trained_run):
    """The real int8 serving engine through the CLI, fastest tier
    (int8 membranes + calibrated int8 GEMM intermediates)."""
    out = run_cli(["eval_flow_quant.py", _ckpt(trained_run),
                   "--config", workspace["eval_cfg"], "--mode", "deploy",
                   "--mem_dtype", "int8", "--z_int8", "--profile_batches", "3",
                   "--calibration_batches", "3", "--max_windows", "3", "--debug"])
    assert "deploy" in out.stdout and "AEE" in out.stdout


def test_model_export_cli(workspace, tmp_path):
    out_dir = str(tmp_path / "exported")
    out = run_cli(["model_export.py", "--config", workspace["eval_cfg"],
                   "--out", out_dir, "--height", "32", "--width", "32"])
    assert os.path.exists(os.path.join(out_dir, "model.stablehlo"))
    assert os.path.exists(os.path.join(out_dir, "inputs.npz"))
    g = np.load(os.path.join(out_dir, "outputs.npz"))
    assert np.isfinite(g["flow"]).all()


def test_model_export_deploy_cli(workspace, tmp_path):
    """--what deploy: real-int8 StableHLO + loadable engine-params artifact."""
    out_dir = str(tmp_path / "exported_deploy")
    run_cli(["model_export.py", "--config", workspace["eval_cfg"],
             "--out", out_dir, "--height", "32", "--width", "32",
             "--what", "deploy", "--mem_dtype", "mixed"])
    assert os.path.exists(os.path.join(out_dir, "model_int8.stablehlo"))
    art = os.path.join(out_dir, "engine_int8.npz")
    assert os.path.exists(art)
    # artifact reconstructs a working engine
    import jax
    import jax.numpy as jnp
    import yaml as _yaml

    from evflow.deploy import Int8DeployEngine
    from evflow.registry import build_model

    with open(workspace["eval_cfg"]) as f:
        mc = _yaml.safe_load(f)["model"]
    mc["spiking_neuron"] = {"leak": [0.0, 1.0], "thresh": [0.0, 0.8]}
    model = build_model(mc)
    eng = Int8DeployEngine.from_artifact(model, art)
    cnt = jnp.ones((1, 32, 32, 2), jnp.float32)
    out2, _ = eng.apply(eng.params, None, cnt, eng.init_states(1, 32, 32))
    assert np.isfinite(np.asarray(out2["flow"][0])).all()


def test_model_export_deploy_unet_cli(workspace, tmp_path):
    """--what deploy on a SpikingRecEVFlowNet config: real-int8 StableHLO +
    loadable UNet-engine artifact (evflow/deploy_unet.py)."""
    mc = {"name": "SpikingRecEVFlowNet", "encoding": "cnt", "num_bins": 2,
          "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
          "round_encoding": False}
    cfg = yaml.safe_load(open(workspace["eval_cfg"]))
    cfg["model"] = mc
    ucfg = os.path.join(workspace["ws"], "export_unet.yml")
    with open(ucfg, "w") as f:
        yaml.safe_dump(cfg, f)
    out_dir = str(tmp_path / "exported_deploy_unet")
    run_cli(["model_export.py", "--config", ucfg,
             "--out", out_dir, "--height", "32", "--width", "32",
             "--what", "deploy", "--compute", "hybrid8",
             "--phase_decoders"])
    assert os.path.exists(os.path.join(out_dir, "model_int8.stablehlo"))
    art = os.path.join(out_dir, "engine_int8.npz")
    assert os.path.exists(art)
    import jax.numpy as jnp

    from evflow.deploy_unet import Int8UNetEngine
    from evflow.registry import build_model

    eng = Int8UNetEngine.from_artifact(build_model(mc), art)
    # the exported artifact carries the tuned serving tier
    assert eng.compute == "hybrid8" and eng.phase_decoders
    cnt = jnp.ones((1, 32, 32, 2), jnp.float32)
    out2, _ = eng.apply(eng.params, None, cnt, eng.init_states(1, 32, 32))
    assert all(np.isfinite(np.asarray(f)).all() for f in out2["flow"])


def test_lif_layer_export_cli(tmp_path):
    out_dir = str(tmp_path / "lif")
    run_cli(["model_export.py", "--what", "lif_layer", "--out", out_dir])
    assert os.path.exists(os.path.join(out_dir, "lif_layer.stablehlo"))


def test_train_flow_validation_cli(workspace):
    """In-process periodic validation: one run dir, val metrics logged,
    best_val_aae checkpoint kept (reference train_flow_validation.py:28-130)."""
    import glob

    runs = os.path.join(workspace["ws"], "runs_val")
    out = run_cli(["train_flow_validation.py",
                   "--config", workspace["train_cfg"],
                   "--val_config", workspace["eval_cfg"],
                   "--path_runs", runs,
                   "--val_every", "1", "--val_max_windows", "6",
                   "--max_steps", "20"])
    assert "validation" in out.stdout and "best val AAE" in out.stdout
    # layout: runs/<experiment>/<runid>/
    run_dirs = [d for d in glob.glob(os.path.join(runs, "*", "*"))
                if os.path.isdir(d)]
    assert len(run_dirs) == 1  # single run dir across validation rounds
    assert glob.glob(os.path.join(run_dirs[0], "checkpoints", "best_val_aae", "*"))


def test_serve_stream_cli(workspace):
    """Streaming serving demo: HDF5 -> Prefetcher -> int8 engine."""
    out = run_cli(["tools/serve_stream.py", "--config", workspace["eval_cfg"],
                   "--synthetic", "--resolution", "32", "--windows", "10"])
    assert "win/s end-to-end" in out.stdout and "issue latency" in out.stdout


def test_serve_stream_unet_cli(workspace):
    """The serving demo dispatches the UNet engine family for
    SpikingRecEVFlowNet configs (evflow/deploy_unet.py)."""
    cfg = yaml.safe_load(open(workspace["eval_cfg"]))
    cfg["model"] = {"name": "SpikingRecEVFlowNet", "encoding": "cnt",
                    "num_bins": 2, "base_num_channels": 4, "kernel_size": 3,
                    "mask_output": True, "round_encoding": False}
    ucfg = os.path.join(workspace["ws"], "serve_unet.yml")
    with open(ucfg, "w") as f:
        yaml.safe_dump(cfg, f)
    out = run_cli(["tools/serve_stream.py", "--config", ucfg,
                   "--synthetic", "--resolution", "32", "--windows", "6"])
    assert "win/s end-to-end" in out.stdout


def test_serve_stream_chunked_cli(workspace):
    """Micro-batched serving: K windows per device dispatch (one scan);
    --windows rounds down to whole chunks (no overshoot)."""
    out = run_cli(["tools/serve_stream.py", "--config", workspace["eval_cfg"],
                   "--synthetic", "--resolution", "32", "--windows", "12",
                   "--chunk", "4"])
    assert "(chunks of 4)" in out.stdout and "chunk latency" in out.stdout
    assert "served 12 windows" in out.stdout
    # non-multiple request serves floor(10/4)*4 = 8, never 12
    out = run_cli(["tools/serve_stream.py", "--config", workspace["eval_cfg"],
                   "--synthetic", "--resolution", "32", "--windows", "10",
                   "--chunk", "4"])
    assert "served 8 windows" in out.stdout


@pytest.fixture(scope="module")
def tuned_artifact(workspace, trained_run):
    """Autotuned deploy artifact (tools/autotune_serving.py --save) built
    from a trained checkpoint (--save rejects random-init weights)."""
    art = os.path.join(workspace["ws"], "tuned_engine.npz")
    out = run_cli(["tools/autotune_serving.py", _ckpt(trained_run),
                   "--config", workspace["eval_cfg"],
                   "--tiers", "bfloat16", "--batches", "1", "--chunk", "2",
                   "--iters", "1", "--save", art])
    assert '"best"' in out.stdout and os.path.exists(art)
    return art


def test_serve_stream_artifact_cli(workspace, tuned_artifact):
    """autotune -> artifact -> serve: the tuned tier/chunk ride the .npz."""
    art = tuned_artifact
    out = run_cli(["tools/serve_stream.py", "--config", workspace["eval_cfg"],
                   "--synthetic", "--resolution", "32", "--windows", "6",
                   "--artifact", art])
    # serving defaults come from the artifact's tuned config
    assert "serving config from artifact: tier bfloat16, chunk 2" in out.stdout
    assert "(chunks of 2)" in out.stdout and "served 6 windows" in out.stdout
    assert "membranes bfloat16" in out.stdout


def test_eval_flow_quant_artifact_cli(workspace, tuned_artifact):
    """Acceptance-evaluate a deploy artifact under the full AEE protocol
    without the f32 checkpoint (the serving-host acceptance gate)."""
    out = run_cli(["eval_flow_quant.py", "--config", workspace["eval_cfg"],
                   "--mode", "deploy", "--artifact", tuned_artifact,
                   "--max_windows", "4", "--chunk", "2",
                   "--path_results", os.path.join(workspace["ws"], "res_art")])
    assert "artifact acceptance" in out.stdout
    assert "AEE" in out.stdout


def test_eval_flow_quant_unet_artifact_cli(workspace):
    """The UNet engine family through the CLI: a SpikingRecEVFlowNet deploy
    artifact is dispatched by its meta model record and acceptance-evaluated
    under the full AEE protocol (evflow/deploy_unet.py)."""
    import jax
    import jax.numpy as jnp

    from evflow.deploy_unet import Int8UNetEngine, save_unet_engine
    from evflow.registry import build_model

    mc = {"name": "SpikingRecEVFlowNet", "encoding": "cnt", "num_bins": 2,
          "base_num_channels": 4, "kernel_size": 3, "mask_output": True,
          "round_encoding": False}
    model = build_model(mc)
    st = model.init_states(1, 32, 32)
    v = model.init(jax.random.PRNGKey(0), None, jnp.zeros((1, 32, 32, 2)), st)
    art = save_unet_engine(Int8UNetEngine(model, v),
                           os.path.join(workspace["ws"], "unet_engine"))

    cfg = yaml.safe_load(open(workspace["eval_cfg"]))
    cfg["model"] = mc
    ucfg = os.path.join(workspace["ws"], "eval_unet.yml")
    with open(ucfg, "w") as f:
        yaml.safe_dump(cfg, f)
    out = run_cli(["eval_flow_quant.py", "--config", ucfg,
                   "--mode", "deploy", "--artifact", art,
                   "--max_windows", "3", "--debug",
                   "--path_results", os.path.join(workspace["ws"], "res_unet")])
    assert "artifact acceptance" in out.stdout
    assert "AEE" in out.stdout


def test_analyze_voltage_cli(workspace):
    out = run_cli(["analyze_voltage_dynamics.py", "--config", workspace["eval_cfg"],
                   "--num_batches", "2"])
    assert "mem_min" in out.stdout and "head" in out.stdout


def test_model_export_verify_cli(workspace, tmp_path):
    """--verify replays exported artifacts against their goldens (the
    deployment-host acceptance check) for both the f32 and int8 kinds."""
    out_dir = str(tmp_path / "exported_verify")
    run_cli(["model_export.py", "--config", workspace["eval_cfg"],
             "--out", out_dir, "--height", "32", "--width", "32"])
    run_cli(["model_export.py", "--config", workspace["eval_cfg"],
             "--out", out_dir, "--height", "32", "--width", "32",
             "--what", "deploy", "--mem_dtype", "mixed"])
    out = run_cli(["model_export.py", "--verify", out_dir])
    assert out.stdout.count("OK") == 2 and "FAIL" not in out.stdout


def test_train_flow_quant_cli(workspace, trained_run):
    """QAT training from a pretrained FP32 start (reference
    train_flow_quant.py flow): quant hooks in the training graph, histogram
    logging on, checkpoints written."""
    import glob

    runs = os.path.join(workspace["ws"], "runs_qat")
    out = run_cli(["train_flow_quant.py", "--config", workspace["train_cfg"],
                   "--path_runs", runs, "--prev_runid", _ckpt(trained_run),
                   "--max_steps", "6"])
    assert "Run dir:" in out.stdout
    run_dirs = [d for d in glob.glob(os.path.join(runs, "*", "*"))
                if os.path.isdir(d)]
    assert run_dirs and os.path.exists(os.path.join(run_dirs[0], "params.yaml"))


def test_train_flow_quant_static_calibration_cli(workspace, trained_run):
    """--calibration static: conv-act scales calibrated from the FP32 start
    checkpoint land in the QAT training graph (reference brevitas semantics,
    train_flow_quant.py:153-155)."""
    runs = os.path.join(workspace["ws"], "runs_qat_static")
    out = run_cli(["train_flow_quant.py", "--config", workspace["train_cfg"],
                   "--path_runs", runs, "--prev_runid", _ckpt(trained_run),
                   "--calibration", "static", "--calibration_batches", "2",
                   "--max_steps", "4"])
    assert "calibrated" in out.stdout and "static conv-act scales" in out.stdout
    assert "Run dir:" in out.stdout


def test_train_seed_determinism(workspace):
    """Same config + seed -> identical training losses (full pipeline
    determinism on the virtual CPU mesh: loader order, augmentation rng,
    init, optimizer)."""
    import yaml as _yaml

    from evflow.config import load_config
    from evflow.train import train

    import glob

    ckpt_bytes = []
    for tag in ("a", "b"):
        cfg = load_config(workspace["train_cfg"])
        cfg["vis"]["bars"] = False
        run = train(cfg, path_runs=os.path.join(workspace["ws"], f"runs_det_{tag}"),
                    max_steps=20, verbose=False)
        ck = sorted(glob.glob(os.path.join(run.dir, "checkpoints",
                                           "most_recent", "*",
                                           "model.msgpack")))[-1]
        with open(ck, "rb") as f:
            ckpt_bytes.append(f.read())
    assert ckpt_bytes[0] == ckpt_bytes[1]


def test_eval_flow_quant_deploy_chunked_cli(workspace, trained_run):
    """--mode deploy with --chunk: the int8 engine under the chunked
    dispatch path (scan over engine.apply) through the CLI."""
    out = run_cli(["eval_flow_quant.py", _ckpt(trained_run),
                   "--config", workspace["eval_cfg"], "--mode", "deploy",
                   "--mem_dtype", "mixed", "--calibration_batches", "2",
                   "--max_windows", "6", "--chunk", "3", "--debug"])
    assert "AEE" in out.stdout


def test_autotune_unet_cli(workspace):
    """The autotuner CLI measures a SpikingRecEVFlowNet config over the
    UNet engine's compute-tier grid (measure-only run; no checkpoint)."""
    cfg = yaml.safe_load(open(workspace["eval_cfg"]))
    cfg["model"] = {"name": "SpikingRecEVFlowNet", "encoding": "cnt",
                    "num_bins": 2, "base_num_channels": 4, "kernel_size": 3,
                    "mask_output": True, "round_encoding": False}
    ucfg = os.path.join(workspace["ws"], "autotune_unet.yml")
    with open(ucfg, "w") as f:
        yaml.safe_dump(cfg, f)
    out = run_cli(["tools/autotune_serving.py", "--config", ucfg,
                   "--tiers", "bfloat16", "hybrid",
                   "--batches", "1", "--chunk", "2", "--iters", "1"])
    assert '"best"' in out.stdout and "hybrid" in out.stdout


def test_autotune_pooled_config_input_scale(workspace, trained_run):
    """On a pooled config (resolution < std_resolution) the autotuner's
    saved artifact must carry the pooling-derived input_scale — the
    serving grid that keeps fractional pooled counts exact (review
    regression: a 1.0 scale silently rounds 1/4-multiples to 0/1)."""
    import yaml

    with open(workspace["eval_cfg"]) as f:
        cfg = yaml.safe_load(f)
    cfg["loader"]["resolution"] = [16, 16]
    cfg["loader"]["std_resolution"] = [32, 32]
    pooled_cfg = os.path.join(workspace["ws"], "eval_pooled.yml")
    with open(pooled_cfg, "w") as f:
        yaml.safe_dump(cfg, f)

    art = os.path.join(workspace["ws"], "tuned_pooled.npz")
    run_cli(["tools/autotune_serving.py", _ckpt(trained_run),
             "--config", pooled_cfg, "--tiers", "bfloat16",
             "--batches", "1", "--chunk", "2", "--iters", "1",
             "--save", art])
    import json

    import numpy as np

    with np.load(art, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
    assert meta["input_scale"] == 0.25  # 1 / ((32//16) * (32//16))

    # --save with --resolution would bake the wrong scale: rejected
    out = subprocess.run(
        [sys.executable, "tools/autotune_serving.py", _ckpt(trained_run),
         "--config", pooled_cfg, "--tiers", "bfloat16", "--batches", "1",
         "--chunk", "2", "--iters", "1", "--resolution", "16",
         "--save", art],
        cwd=REPO, capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert out.returncode != 0 and "rejected" in out.stderr


def test_train_flow_validation_device_metrics_cli(workspace):
    """--val_chunk/--val_device_metrics: the periodic validation pass runs
    the in-graph metric protocol (only [K,B] scalars fetched)."""
    import glob

    runs = os.path.join(workspace["ws"], "runs_val_dm")
    out = run_cli(["train_flow_validation.py",
                   "--config", workspace["train_cfg"],
                   "--val_config", workspace["eval_cfg"],
                   "--path_runs", runs,
                   "--val_every", "1", "--val_max_windows", "8",
                   "--max_steps", "20",
                   "--val_chunk", "4", "--val_device_metrics"])
    assert "validation" in out.stdout and "best val AAE" in out.stdout


def test_eval_flow_device_metrics_cli(workspace, trained_run):
    """--device_metrics end-to-end through the eval CLI: same per-file
    metrics as the host-side path."""
    ckpt = _ckpt(trained_run)
    out_h = run_cli(["eval_flow.py", ckpt, "--config", workspace["eval_cfg"],
                     "--debug", "--max_windows", "8", "--chunk", "4"])
    out_d = run_cli(["eval_flow.py", ckpt, "--config", workspace["eval_cfg"],
                     "--debug", "--max_windows", "8", "--chunk", "4",
                     "--device_metrics"])
    def parse(stdout):
        vals = {}
        for line in stdout.splitlines():
            parts = line.split()
            if len(parts) == 3 and parts[1].endswith(".h5"):
                vals[(parts[0], parts[1])] = float(parts[2])
        return vals
    vh, vd = parse(out_h.stdout), parse(out_d.stdout)
    assert vh and vh.keys() == vd.keys()
    for k in vh:
        assert vh[k] == pytest.approx(vd[k], rel=1e-5, abs=1e-7), k
