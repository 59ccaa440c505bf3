"""Serving-configuration autotuner: measure, don't hardcode.

The perf campaign (BENCH_NOTES.md rounds 4-7) established that the optimal
serving configuration of the int8 engine is a property of the *regime*,
not of the program: at short scans (dispatch-tax-dominated) B=8 with int8
membranes won; with the tax amortized, B=2 with bf16 membranes is both the
fastest AND the most accurate tier — and the training step inverts again
(bigger B wins). A production deployment should therefore measure the
candidate grid on the actual target chip and ship the measured optimum
with the artifact, exactly like the reference auto-tunes its membrane
quantization ranges per layer (eval_flow_quant.py:186-463) rather than
hardcoding them.

:func:`autotune_serving` times the deployment engine over a small grid of
(membrane tier x streams-per-chip B x scan chunk), using the repo's
measurement protocol (persistent compile cache, donated state carries,
scalar-fetch synchronization — ``block_until_ready`` does not synchronize
on tunneled backends), and returns the best :class:`ServingConfig` plus
the full measurement table. :func:`evflow.deploy.save_engine` accepts the
result so serving hosts load the tuned configuration from the artifact
(``engine.serving`` after :meth:`Int8DeployEngine.from_artifact`).

Accuracy is NOT re-measured here — tier accuracy is a property of the
model/data, not the chip (benchmarks/deploy_aee_tiers.py measures it);
``tiers`` restricts the grid to those within the deployment's AEE budget.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Sequence, Tuple

__all__ = ["ServingConfig", "autotune_serving", "measure_serving"]


@dataclasses.dataclass(frozen=True)
class ServingConfig:
    """A measured serving operating point for one chip.

    ``batch`` is streams packed per chip (the engine's B); ``chunk`` is
    windows scanned per device dispatch (``serve_stream --chunk`` /
    ``evaluate(chunk=...)``); ``windows_per_s`` is the measured steady-state
    device throughput at that point. ``table`` holds every measured cell
    keyed ``"{mem_dtype}/B{batch}/T{chunk}"``.
    """

    mem_dtype: str
    batch: int
    chunk: int
    windows_per_s: float
    table: Dict[str, float] = dataclasses.field(default_factory=dict)

    def to_meta(self) -> Dict[str, Any]:
        """JSON-serializable form stored in the deploy artifact meta."""
        return {
            "mem_dtype": self.mem_dtype,
            "batch": self.batch,
            "chunk": self.chunk,
            "windows_per_s": round(self.windows_per_s, 1),
            "table": {k: round(v, 1) for k, v in self.table.items()},
        }

    @classmethod
    def from_meta(cls, meta: Dict[str, Any]) -> "ServingConfig":
        return cls(
            mem_dtype=meta["mem_dtype"],
            batch=int(meta["batch"]),
            chunk=int(meta["chunk"]),
            windows_per_s=float(meta["windows_per_s"]),
            table={k: float(v) for k, v in meta.get("table", {}).items()},
        )


def measure_serving(
    engine,
    batch: int,
    height: int,
    width: int,
    chunk: int = 256,
    iters: int = 3,
    rate: float = 0.05,
) -> float:
    """Steady-state windows/sec of ``engine`` at (B=batch, scan T=chunk).

    One jitted ``lax.scan`` of ``chunk`` engine steps per dispatch, state
    carry donated, synchronized by fetching the reduced flow scalar (the
    only sync that works on tunneled backends — CLAUDE.md). Min over
    ``iters`` timed dispatches after one warm-up (compile) dispatch.
    """
    import jax
    import jax.numpy as jnp

    states = engine.init_states(batch, height, width)
    key = jax.random.PRNGKey(0)
    window = jax.random.poisson(
        key, rate, (batch, height, width, 2)
    ).astype(jnp.float32)

    def run(params, window, states):
        def step(st, _):
            out, new_st = engine.apply(params, None, window, st)
            # finest flow map (multires engines return coarse->fine)
            return new_st, out["flow"][-1].sum()

        final, fsum = jax.lax.scan(step, states, None, length=chunk)
        return fsum.sum(), final

    run_j = jax.jit(run, donate_argnums=(2,))
    s, st = run_j(engine.params, window, states)
    float(s)  # warm-up: compile + first execution
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        s, st = run_j(engine.params, window, st)
        float(s)
        best = min(best, time.perf_counter() - t0)
    return (chunk * batch) / best


def autotune_serving(
    model,
    variables: Dict[str, Any],
    height: int,
    width: int,
    tiers: Sequence[str] = ("bfloat16", "mixed", "int8"),
    batches: Sequence[int] = (1, 2, 4),
    chunk: int = 256,
    chunks: Optional[Sequence[int]] = None,
    iters: int = 3,
    input_scale: float = 1.0,
    mem_ranges: Optional[Sequence[Tuple[Any, Any]]] = None,
    verbose: bool = False,
) -> ServingConfig:
    """Measure the (tier x B x chunk) grid on the current default device
    and return the fastest :class:`ServingConfig` (ties broken toward the
    earlier — more accurate — tier in ``tiers``, the smaller B, and the
    smaller — lower-latency — chunk).

    The chunk is the measured scan length AND the recommended serving
    dispatch size: larger values amortize per-dispatch overhead but cost
    ``chunk`` windows of latency per stream. Pass ``chunks`` to sweep the
    latency/throughput trade-off (each cell is keyed ``tier/B/Tchunk`` in
    the table, so the caller can pick a latency-constrained point from the
    same measurement run); the scalar ``chunk`` remains the single-point
    shorthand. ``tiers`` should already reflect the deployment's accuracy
    budget — the measured tier AEE deltas live in benchmarks/VALIDATION.md,
    and int8-membrane tiers use ``mem_ranges`` (or the reference-default
    [-250, 1] grid) exactly as in :class:`evflow.deploy.Int8DeployEngine`.
    """
    from evflow.deploy import Int8DeployEngine

    is_unet = model.__class__.__name__ == "SpikingRecEVFlowNet"
    if is_unet:
        # the UNet engine's tier axis is the conv COMPUTE tier (membranes
        # are bf16), optionally with phase-decomposed decoders ("+phase"
        # suffix): same integer arithmetic, regime-dependent winner
        # (BENCH_NOTES "UNet family deployed")
        for t in tiers:
            base = t[:-6] if t.endswith("+phase") else t
            if base not in ("bfloat16", "int8", "hybrid", "hybrid8"):
                raise ValueError(
                    f"UNet engine tiers are compute tiers bfloat16/int8/"
                    f"hybrid/hybrid8 (optionally '+phase'); got {t!r}")
    if chunks is None:
        chunks = (chunk,)
    table: Dict[str, float] = {}
    best_key: Optional[Tuple[str, int, int]] = None
    best_rate = 0.0
    for tier in tiers:
        if is_unet:
            from evflow.deploy_unet import Int8UNetEngine

            phase = tier.endswith("+phase")
            engine = Int8UNetEngine(
                model, variables,
                compute=tier[:-6] if phase else tier,
                phase_decoders=phase, input_scale=input_scale)
        else:
            engine = Int8DeployEngine(
                model, variables, mem_dtype=tier,
                mem_ranges=mem_ranges, input_scale=input_scale,
            )
        for b in batches:
            for k in chunks:
                rate_meas = measure_serving(
                    engine, b, height, width, chunk=k, iters=iters
                )
                table[f"{tier}/B{b}/T{k}"] = rate_meas
                if verbose:
                    print(
                        f"autotune {tier:9s} B={b:<2d} T={k}: "
                        f"{rate_meas:.0f} win/s", flush=True,
                    )
                if rate_meas > best_rate:
                    best_rate = rate_meas
                    best_key = (tier, b, k)
    assert best_key is not None, "empty autotune grid"
    return ServingConfig(
        mem_dtype=best_key[0],
        batch=best_key[1],
        chunk=best_key[2],
        windows_per_s=best_rate,
        table=table,
    )
