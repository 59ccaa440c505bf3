"""Whole-network fused FireNet step, layer-as-grid-dimension variant (v5).

Same goal as evflow.ops.pallas.fused_net (one kernel invocation per window,
states round-trip HBM exactly once), but structured to dodge the Mosaic ICE
that kills multi-LIF kernels on this toolchain (see BENCH_NOTES.md): the
kernel body contains exactly ONE conv+LIF instance and the layer index is
the fastest grid dimension. Per (batch, row-tile) the activation buffer
persists in VMEM scratch across the layer sweep.

Key differences from the v4 design:
  * uniform row extent E = TH + 16 for every layer — boundary garbage
    penetrates at most (n_layers + 1) <= 8 rows, so the written central TH
    rows stay exact;
  * stacked state tensors [L, B, C, Hp, W] (mem) and [L, B, C, Hp, W]
    (spikes; only recurrent layers' slots are consumed next step);
  * uniform stacked weights [L, C, 2*9*C] (head channel-padded; feedforward
    layers' recurrent half unused) selected by a dynamic leading index;
  * K-split matmuls: 3 dy-group dots for the input half, 3 more for the
    recurrent half under @pl.when(is_rec) — keeps the patch buffer at
    [3C, E, W] in VMEM;
  * recurrent prev-spike tiles are DMA'd only on recurrent layers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from benchmarks.pallas_archive.common import (
    dy_group_patches as _dy_group_patches, lif_update)
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_firenet_step_lgrid", "LayerGridFusedFireNet"]


def _make_kernel(L: int, TH: int, E: int, W: int, C: int,
                 rec_layer_ids: Tuple[int, ...], hard_reset: bool,
                 state_dtype):
    rec0 = rec_layer_ids[0] if rec_layer_ids else -1
    rec1 = rec_layer_ids[1] if len(rec_layer_ids) > 1 else -1

    def kernel(x_hbm, mem_hbm, spk_hbm, w_ref, p_ref, predw_ref, predb_ref,
               mem_out, spk_out, flow_out,
               hbuf, smem_all, saux_all, sem_x, sem_a0, sem_a1, *sems_m):
        b = pl.program_id(0)
        i = pl.program_id(1)
        l = pl.program_id(2)
        r0 = i * TH + (TH - 8)

        # tile prologue (l == 0): launch ALL state DMAs for this tile at once
        # so their latencies overlap; the layer sweep is then pure compute
        @pl.when(l == 0)
        def _():
            dx = pltpu.make_async_copy(
                x_hbm.at[b, :, pl.ds(r0, E), :], hbuf, sem_x)
            dx.start()
            dms = []
            for ll in range(L):
                d = pltpu.make_async_copy(
                    mem_hbm.at[ll, b, :, pl.ds(r0, E), :],
                    smem_all.at[ll], sems_m[ll])
                d.start()
                dms.append(d)
            das = []
            for s, lid in enumerate(rec_layer_ids):
                d = pltpu.make_async_copy(
                    spk_hbm.at[lid, b, :, pl.ds(r0, E), :],
                    saux_all.at[s], (sem_a0, sem_a1)[s])
                d.start()
                das.append(d)
            dx.wait()
            for d in dms:
                d.wait()
            for d in das:
                d.wait()

        is_rec = jnp.logical_or(l == rec0, l == rec1)

        def dy_group_patches(src, dy):  # bound to the shared helper
            return _dy_group_patches(src, dy, C, E, W)

        wv = w_ref[pl.ds(l, 1)][0]  # [C, 18C]
        hv = hbuf[:]
        ff = jnp.zeros((C, E, W), jnp.float32)
        for dy in range(3):
            pg = dy_group_patches(hv, dy)
            ff = ff + jax.lax.dot_general(
                wv[:, dy * 3 * C : (dy + 1) * 3 * C], pg,
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

        # recurrent half (skipped entirely for feedforward layers)
        def rec_contrib():
            slot = jnp.where(l == rec0, 0, 1)
            av = saux_all[pl.ds(slot, 1)][0]
            out = ff
            for dy in range(3):
                pg = dy_group_patches(av, dy)
                out = out + jax.lax.dot_general(
                    wv[:, (9 + dy * 3) * C : (9 + (dy + 1) * 3) * C], pg,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return out

        ff = jax.lax.cond(is_rec, rec_contrib, lambda: ff)

        pv = p_ref[pl.ds(l, 1)][0]  # [C, 3]
        bias = pv[:, 0][:, None, None]
        beta = pv[:, 1][:, None, None]
        theta = pv[:, 2][:, None, None]
        ff = ff + bias
        mem = smem_all[pl.ds(l, 1)][0].astype(jnp.float32)

        # single LIF instance (snn.Leaky inference, reset_delay=False)
        spk, mem2 = lif_update(ff, mem, beta, theta, hard_reset)

        mem_out[0, 0] = mem2[:, 8 : 8 + TH, :].astype(state_dtype)
        spk_out[0, 0] = spk[:, 8 : 8 + TH, :].astype(state_dtype)
        hbuf[:] = spk.astype(jnp.bfloat16)

        @pl.when(l == L - 1)
        def _():
            hc = spk[:, 8 : 8 + TH, :].astype(jnp.bfloat16)
            flow = jax.lax.dot_general(
                predw_ref[:], hc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            flow_out[0] = jnp.tanh(flow + predb_ref[:, 0][:, None, None])

    return kernel


@functools.partial(
    jax.jit, static_argnames=("rec_layer_ids", "tile_rows", "hard_reset"))
def fused_firenet_step_lgrid(
    x_pad: jax.Array,       # [B, C, Hp, W] (head input channel-padded to C)
    mem_stack: jax.Array,   # [L, B, C, Hp, W] state dtype, zero borders
    spk_stack: jax.Array,   # [L, B, C, Hp, W]
    w_stack: jax.Array,     # [L, C, 18C]
    p_stack: jax.Array,     # [L, C, 3] (bias, beta, theta)
    pred_w: jax.Array,      # [2, C]
    pred_b: jax.Array,      # [2, 1]
    rec_layer_ids: Tuple[int, ...],
    tile_rows: int = 32,
    hard_reset: bool = True,
):
    """One fused step. Returns (flow [B,2,H,W], mem_stack', spk_stack');
    output stacks have unspecified border blocks (caller re-zeros)."""
    L, B, C, Hp, W = mem_stack.shape
    TH = tile_rows
    H = Hp - 2 * TH
    E = TH + 16
    assert (TH - 8) % 8 == 0 and H % TH == 0
    n_tiles = H // TH
    state_dtype = mem_stack.dtype

    kernel = _make_kernel(L, TH, E, W, C, tuple(rec_layer_ids), hard_reset,
                          state_dtype)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    mem_block = pl.BlockSpec(
        (1, 1, C, TH, W), lambda b, i, l: (l, b, 0, i + 1, 0))
    flow_block = pl.BlockSpec((1, 2, TH, W), lambda b, i, l: (b, 0, i, 0))

    outs = pl.pallas_call(
        kernel,
        grid=(B, n_tiles, L),
        in_specs=[any_spec, any_spec, any_spec, vmem, vmem, vmem, vmem],
        out_specs=[mem_block, mem_block, flow_block],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, C, Hp, W), state_dtype),
            jax.ShapeDtypeStruct((L, B, C, Hp, W), state_dtype),
            jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, E, W), jnp.bfloat16),        # hbuf
            pltpu.VMEM((L, C, E, W), state_dtype),      # smem_all
            pltpu.VMEM((2, C, E, W), jnp.bfloat16),     # saux_all
            pltpu.SemaphoreType.DMA,                    # sem_x
            pltpu.SemaphoreType.DMA,                    # sem_a0
            pltpu.SemaphoreType.DMA,                    # sem_a1
        ] + [pltpu.SemaphoreType.DMA for _ in range(L)],
    )(
        x_pad.astype(jnp.bfloat16),
        mem_stack,
        spk_stack.astype(jnp.bfloat16),
        w_stack.astype(jnp.bfloat16),
        p_stack.astype(jnp.float32),
        pred_w.astype(jnp.bfloat16),
        pred_b.astype(jnp.float32),
    )
    return outs[2], outs[0], outs[1]


class LayerGridFusedFireNet:
    """Runner: folds trained FireNet variables into the stacked layout and
    carries padded state stacks across steps."""

    def __init__(self, model, variables, tile_rows: int = 32):
        from evflow.models.fused import FusedFireNet

        base = FusedFireNet.from_firenet(model, variables)
        self.tile_rows = tile_rows
        self.hard_reset = base.hard_reset
        self.C = base.base_num_channels
        self.num_bins = model.num_bins
        self.L = len(base.units)
        self.rec_layer_ids = tuple(
            l for l, u in enumerate(base.units) if u.recurrent
        )

        C = self.C
        ws, ps = [], []
        for u in base.units:
            e = base.params[u.name]
            w = np.asarray(e["w"], np.float32)  # [3,3,cin,C]
            cin = w.shape[2]
            # channel-pad head kernels so every layer consumes C channels
            if cin < C:
                w = np.pad(w, ((0, 0), (0, 0), (0, C - cin), (0, 0)))
            wT = w.transpose(3, 0, 1, 2).reshape(C, 9 * C)
            if u.recurrent:
                wr = np.asarray(e["w_rec"], np.float32)
                wrT = wr.transpose(3, 0, 1, 2).reshape(C, 9 * C)
            else:
                wrT = np.zeros((C, 9 * C), np.float32)
            ws.append(np.concatenate([wT, wrT], axis=1))
            ps.append(
                np.stack(
                    [np.asarray(e["bias"], np.float32),
                     np.asarray(e["beta"], np.float32),
                     np.asarray(e["theta"], np.float32)], axis=1))
        self.w_stack = jnp.asarray(np.stack(ws))     # [L, C, 18C]
        self.p_stack = jnp.asarray(np.stack(ps))     # [L, C, 3]
        self.pred_w = jnp.asarray(
            np.asarray(base.params["pred"]["w"], np.float32).reshape(C, 2).T)
        self.pred_b = jnp.asarray(
            np.asarray(base.params["pred"]["b"], np.float32).reshape(2, 1))

    def init_states(self, batch: int, height: int, width: int,
                    dtype=jnp.bfloat16):
        Hp = height + 2 * self.tile_rows
        z = jnp.zeros((self.L, batch, self.C, Hp, width), dtype)
        return z, jnp.zeros_like(z)

    def _zero_borders(self, a):
        TH = self.tile_rows
        z = jnp.zeros(a.shape[:3] + (TH, a.shape[4]), a.dtype)
        a = jax.lax.dynamic_update_slice(a, z, (0, 0, 0, 0, 0))
        return jax.lax.dynamic_update_slice(
            a, z, (0, 0, 0, a.shape[3] - TH, 0))

    def step(self, x, states):
        """x [B, H, W, Cin] NHWC -> (flow [B, H, W, 2], states)."""
        mem_stack, spk_stack = states
        TH = self.tile_rows
        xc = jnp.moveaxis(x, -1, 1)
        B, Cin, H, W = xc.shape
        xc = jnp.pad(
            xc, ((0, 0), (0, self.C - Cin), (TH, TH), (0, 0)))
        flow, mem2, spk2 = fused_firenet_step_lgrid(
            xc, mem_stack, spk_stack, self.w_stack, self.p_stack,
            self.pred_w, self.pred_b,
            rec_layer_ids=self.rec_layer_ids,
            tile_rows=TH, hard_reset=self.hard_reset)
        # scatter the 2 consumed spike slots back into the full stack layout:
        # the kernel writes spikes for ALL layers, so spk2 already has every
        # layer's output — it becomes the next spk_stack directly.
        return (
            jnp.moveaxis(flow, 1, -1),
            (self._zero_borders(mem2), self._zero_borders(spk2)),
        )
