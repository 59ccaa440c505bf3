"""Pipeline parallelism: stream the SNN's layer chain across the mesh.

New capability vs. the reference (strictly single-GPU, SURVEY.md §2.9) and
the PP axis of the mesh story (dp: evflow/parallel/mesh.py, sp:
evflow/parallel/spatial.py). A FireNet forward is a chain of LIF units with
per-unit membrane state; at one window per step the chain is sequential,
but across a *stream* of windows it pipelines perfectly: while stage s
processes window t, stage s-1 processes window t+1. Each chip owns a
contiguous group of units, keeps those units' membranes resident in its
own HBM, and forwards one int8 spike tensor [B, H, W, C] per step to the
next chip over ICI (`lax.ppermute` inside `shard_map`).

Why this matters for serving: data parallelism multiplies *independent
streams* (evaluate(mesh=...) shards batch slots), but cannot speed up a
single stream — the membrane carry is a strict serial dependency in the
window index. Pipelining is the one decomposition that scales single-stream
throughput with chips: S stages run S windows in flight, so steady-state
throughput approaches S x the one-chip rate while per-window math and
state stay bit-identical (fill/drain steps are validity-gated so membranes
only ever integrate real windows). Inter-chip traffic is one int8
activation per hop per window (~2 MB at the bench shape) — microseconds on
ICI, negligible against the per-stage compute.

Semantics are EXACT, not approximate: the same int8 GEMMs, bf16 epilogues
and LIF updates run in the same order as `Int8DeployEngine.apply`;
tests/test_pipeline.py pins bit-identical flows and final membranes vs the
sequential engine on the virtual CPU mesh for S in {2, 4, 8}.

Reference parity anchor: the reference serves its quantized export
single-device only (eval_flow_quant.py, Deeploy artifacts); this module is
a TPU-native extension along SURVEY.md §5.8.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from evflow.ops.dypack import cols_dx, cols_dx_dual
from evflow.ops.lif import LIFState, leaky_step

__all__ = ["PipelineServer", "make_mesh_pipe"]


def make_mesh_pipe(stages: int, axis: str = "pipe", data: int = 1,
                   data_axis: str = "data") -> Mesh:
    """Pipeline mesh over ``stages`` (x ``data``) local devices.

    The pipe axis should map to a contiguous ICI dimension — every
    exchange is a nearest-neighbor permute along it. ``data > 1`` adds an
    orthogonal data axis: each stage's unit group is replicated ``data``
    ways and the batch (stream) dimension shards across it — S x D chips
    serve D independent stream groups, each pipelined S deep, composing
    the two ways the mesh scales serving (single-stream rate via pipe,
    stream count via data)."""
    devs = jax.devices()
    need = stages * data
    if need > len(devs):
        raise ValueError(f"pipeline of {stages} stages x {data} data needs "
                         f"{need} devices, have {len(devs)}")
    if data == 1:
        return Mesh(np.array(devs[:stages]), (axis,))
    # keep PIPE neighbors adjacent in device order (the per-window spike
    # ppermute is the only per-step inter-chip traffic; the data axis
    # carries none): stage s of replica d is devs[d * stages + s]
    return Mesh(
        np.array(devs[:need]).reshape(data, stages).T, (axis, data_axis)
    )


class PipelineServer:
    """Serve an :class:`evflow.deploy.Int8DeployEngine` pipelined over a mesh.

    The engine's ops — its ``num_units`` LIF units plus the pred head —
    are split into ``S = mesh.shape[axis]`` contiguous stages of equal
    size, so ``num_units + 1`` must divide by S (LIFFireNet: 8 ops -> S in
    {2, 4, 8}; the short variants: 6 ops -> S in {2, 3, 6}).

    Restrictions: the bf16-membrane tier only (the headline serving tier;
    int8/mixed membranes target many-stream DP serving where this axis is
    the wrong tool), and every op carries a uniform [B, H, W, C] (mem, spk)
    pair so stage state shards as two stacked global arrays over the pipe
    axis — feedforward units' dummy spk slots cost one zero buffer each
    but keep the layout mesh-shardable.

    ``serve(windows, states)`` runs ``T = windows.shape[0]`` consecutive
    windows through the pipeline (``T + S - 1`` internal steps including
    fill/drain) and returns the T flow maps plus the advanced state, ready
    for the next chunk — chunked streaming composes exactly because fill
    and drain steps never touch membranes (validity-gated).
    """

    def __init__(self, engine, mesh: Mesh, axis: str = "pipe",
                 data_axis: str = "data"):
        if any(engine.unit_mem_int8):
            raise ValueError(
                "PipelineServer supports the bf16-membrane tier only "
                "(mem_dtype='bfloat16'); int8/mixed tiers target "
                "many-stream DP serving (evaluate(mesh=...))"
            )
        self.engine = engine
        self.mesh = mesh
        self.axis = axis
        self.S = mesh.shape[axis]
        # optional orthogonal data axis: batch slots shard across it while
        # each stage's unit group replicates (make_mesh_pipe(stages, data=D))
        self.data_axis = data_axis
        self.D = dict(mesh.shape).get(data_axis, 1)
        self.num_ops = engine.num_units + 1  # units + pred
        if self.num_ops % self.S != 0:
            raise ValueError(
                f"{self.num_ops} pipeline ops do not divide into "
                f"{self.S} stages; pick S in "
                f"{[s for s in range(2, self.num_ops + 1) if self.num_ops % s == 0]}"
            )
        self.ops_per_stage = self.num_ops // self.S
        self.C = engine.features
        if self.C < engine.model.num_bins:
            raise ValueError("carrier needs C >= num_bins to hold the window")
        self._serve_cache: Dict[Any, Any] = {}

    # -- state layout ------------------------------------------------------

    def init_states(self, batch: int, height: int, width: int):
        """Stacked pipeline state (mem [O,B,H,W,C] bf16, spk [O,B,H,W,C]
        int8), sharded over the pipe axis. Op ``num_units`` (pred) carries
        dummies."""
        return self.pack_states(self.engine.init_states(batch, height, width))

    def pack_states(self, states: Sequence[LIFState]):
        """Engine state tuple -> sharded stacked (mem, spk) arrays."""
        if states[0].mem.shape[0] % self.D != 0:
            raise ValueError(
                f"batch {states[0].mem.shape[0]} does not shard over the "
                f"{self.D}-way data axis"
            )
        mems = [jnp.asarray(s.mem, jnp.bfloat16) for s in states]
        spks = [
            s.spk if s.spk is not None else jnp.zeros(s.mem.shape, jnp.int8)
            for s in states
        ]
        shape = mems[0].shape
        mem = jnp.stack(mems + [jnp.zeros(shape, jnp.bfloat16)])  # + pred dummy
        spk = jnp.stack(spks + [jnp.zeros(shape, jnp.int8)])
        sh = NamedSharding(self.mesh, self._state_spec())
        return jax.device_put(mem, sh), jax.device_put(spk, sh)

    def _state_spec(self) -> P:
        """[O, B, ...]: ops over pipe, batch slots over data (when present)."""
        return P(self.axis, self.data_axis) if self.D > 1 else P(self.axis)

    def unpack_states(self, states) -> Tuple[LIFState, ...]:
        """Stacked (mem, spk) -> the engine's state tuple (host copies)."""
        mem, spk = states
        mem = np.asarray(jax.device_get(mem).astype(jnp.float32))
        spk = np.asarray(jax.device_get(spk))
        return tuple(
            LIFState(
                jnp.asarray(mem[i], jnp.bfloat16),
                jnp.asarray(spk[i]) if rec else None,
            )
            for i, rec in enumerate(self.engine.unit_recurrent)
        )

    # -- op branches (uniform protocol for lax.switch) ----------------------

    def _branches(self, params, B, H, W):
        """One branch per global op: (h_i8, mem, spk) -> (h_i8, flow, mem, spk).

        Identical math to Int8DeployEngine.apply — the GEMM/epilogue and
        LIF code are shared imports, so the dy-pack indexing invariants
        stay single-sourced (evflow/ops/dypack.py)."""
        from evflow.deploy import _gemm_epilogue

        eng = self.engine
        C = self.C
        bins = eng.model.num_bins
        reset = "zero" if eng.hard_reset else "subtract"
        flow_c = params["pred_kernel"].shape[-1]

        def unit_branch(i):
            unit = params["units"][i]

            def f(h, mem, spk):
                x_in = h[..., :bins] if i == 0 else h
                if eng.unit_recurrent[i]:
                    cols = cols_dx_dual(x_in, spk)
                else:
                    cols = cols_dx(x_in)
                y = _gemm_epilogue(
                    cols, unit["w"], unit["col_scale"], unit["bias"], B, H, W, C,
                    z_requant=unit.get("z_requant") if eng.z_int8 else None,
                    z_scale=unit.get("z_scale") if eng.z_int8 else None,
                )
                s, mem_out = leaky_step(
                    y, mem, unit["beta"], unit["theta"], reset=reset,
                    alpha=eng.alpha,
                )
                h_out = s.astype(jnp.int8)
                spk_out = h_out if eng.unit_recurrent[i] else spk
                return h_out, jnp.zeros((B, H, W, flow_c), jnp.float32), mem_out, spk_out

            return f

        def pred_branch(h, mem, spk):
            hs = h.astype(jnp.bfloat16)
            flow = jnp.einsum("bhwc,co->bhwo", hs, params["pred_kernel"][0, 0])
            if params["pred_bias"] is not None:
                flow = flow + params["pred_bias"]
            flow = jnp.tanh(flow).astype(jnp.float32)
            return jnp.zeros_like(h), flow, mem, spk

        return [unit_branch(i) for i in range(eng.num_units)] + [pred_branch]

    # -- the pipelined stream ----------------------------------------------

    def _build_serve(self, T, B, H, W, bins):
        S, U, C = self.S, self.ops_per_stage, self.C
        axis = self.axis
        eng = self.engine
        steps = T + S - 1
        flow_c = self.engine.params["pred_kernel"].shape[-1]
        Bloc = B // self.D  # batch slots per data shard

        def body(params, windows, mem, spk):
            # local shapes: mem/spk [U, Bloc, H, W, C]; windows
            # [T, Bloc, ...] (replicated over pipe, sharded over data)
            B = Bloc
            sidx = jax.lax.axis_index(axis)
            branches = self._branches(params, B, H, W)
            fwd = [(i, i + 1) for i in range(S - 1)]

            def step(carry, t):
                carrier, mem, spk = carry
                win = jax.lax.dynamic_index_in_dim(
                    windows, jnp.clip(t, 0, T - 1), 0, keepdims=False
                )
                xi = jnp.clip(
                    jnp.round(
                        win / eng.input_scale if eng.input_scale != 1.0 else win
                    ),
                    -127, 127,
                ).astype(jnp.int8)
                xi = jnp.pad(xi, ((0, 0), (0, 0), (0, 0), (0, C - bins)))
                h = jnp.where(sidx == 0, xi, carrier)
                # stage s processes window t - s; gate state updates to the
                # fill/drain window so membranes only integrate real inputs
                w_idx = t - sidx
                active = jnp.logical_and(w_idx >= 0, w_idx < T)
                flow = jnp.zeros((B, H, W, flow_c), jnp.float32)
                new_mem, new_spk = [], []
                for u in range(U):
                    g = sidx * U + u  # global op index (runtime dispatch)
                    h, flow_u, m_u, s_u = jax.lax.switch(
                        g, branches, h, mem[u], spk[u]
                    )
                    flow = flow + flow_u
                    new_mem.append(jnp.where(active, m_u, mem[u]))
                    new_spk.append(jnp.where(active, s_u, spk[u]))
                out = jax.lax.ppermute(h, axis, fwd)
                return (out, jnp.stack(new_mem), jnp.stack(new_spk)), flow

            carrier0 = jnp.zeros((B, H, W, C), jnp.int8)
            (_, mem, spk), flows = jax.lax.scan(
                step, (carrier0, mem, spk), jnp.arange(steps)
            )
            # flows: [steps, ...] local; stages other than the last emit
            # zeros — expose as a [S, steps, ...] pipe-sharded global and
            # let the host slice the last stage (no collective)
            return flows[None], mem, spk

        pspec = jax.tree.map(lambda _: P(), self.engine.params)
        st = self._state_spec()
        win_spec = P(None, self.data_axis) if self.D > 1 else P()
        flow_spec = P(axis, None, self.data_axis) if self.D > 1 else P(axis)
        sharded = jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(pspec, win_spec, st, st),
            out_specs=(flow_spec, st, st),
            check_vma=False,
        )

        @jax.jit
        def serve(params, windows, states):
            mem, spk = states
            flows, mem, spk = sharded(params, windows, mem, spk)
            # last stage's rows S-1.. are windows 0..T-1
            return flows[-1, S - 1:], (mem, spk)

        return serve

    def serve(self, windows, states):
        """Run ``windows [T, B, H, W, num_bins]`` through the pipeline.

        Returns ``(flows [T, B, H, W, 2], states)`` — flows land on the last
        stage's shard; states stay pipe-sharded and feed the next chunk
        directly (chunked streaming composes exactly)."""
        windows = jnp.asarray(windows, jnp.float32)
        T, B, H, W, bins = windows.shape
        if B % self.D != 0:
            raise ValueError(
                f"batch {B} does not shard over the {self.D}-way data axis"
            )
        key = (T, B, H, W, bins)
        if key not in self._serve_cache:
            self._serve_cache[key] = self._build_serve(T, B, H, W, bins)
        return self._serve_cache[key](self.engine.params, windows, states)
