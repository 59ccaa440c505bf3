"""Whole-network fused FireNet step, one-grid-step-per-batch variant (v8).

v7 (fused_net_loop2.py) proved the in-kernel layer ``fori_loop`` compiles at
tile_rows=8, but 256 grid steps/window (B x row-tiles) leave it overhead-
bound at 379 win/s. v8 moves the TILE sweep inside the kernel too: grid is
``(B,)`` — 8 steps per window — with a nested ``fori_loop`` (tiles, layers).
Every construct was probed individually on this toolchain
(benchmarks/probe_loop_dyn*.py):

  * dynamic-index DMA (HBM<->VMEM) from loop-derived offsets;
  * ref loads/stores with ``pl.ds`` and where()-computed slots at any dtype;
  * value slicing via ``lax.slice_in_dim`` (jnp mixed None+slice indexing
    lowers to an unsupported gather);
  * tile_rows=8 / E=24 shapes (E>=32 trips an opaque remote-compiler ICE).

All outputs live in ANY (HBM) space and are written by per-tile DMA from
VMEM staging; input states stream in per tile. One textual LIF instance.

Reference behavior: models/model.py:135-207 (LIFFireNet step),
models/SNNtorch_spiking_submodules.py:200-320 (snn.Leaky inference).
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

__all__ = ["fused_firenet_step_batch", "BatchFusedFireNet"]


def _make_kernel(L: int, TH: int, E: int, W: int, C: int, n_tiles: int,
                 rec_layer_ids: Tuple[int, ...], hard_reset: bool,
                 state_dtype):
    rec0 = rec_layer_ids[0] if rec_layer_ids else -1
    rec1 = rec_layer_ids[1] if len(rec_layer_ids) > 1 else -1

    def kernel(x_hbm, mem_hbm, spk_hbm, w_ref, p_ref, predw_ref, predb_ref,
               mem_out, spk_out, flow_out,
               hbuf, smem_all, saux_all, sout_m, sout_s, fstage,
               sem_x, sem_a0, sem_a1, sem_om, sem_os, sem_of, *sems_m):
        b = pl.program_id(0)

        def dy_group_patches(src, dy):  # bound to the shared helper
            return _dy_group_patches(src, dy, C, E, W)

        def layer_body(l, _):
            wv = w_ref[pl.ds(l, 1)][0]  # [C, 18C]
            hv = hbuf[:]
            slot = jnp.where(l == rec0, 0, jnp.where(l == rec1, 1, 2))
            av = saux_all[pl.ds(slot, 1)][0]
            ff = jnp.zeros((C, E, W), jnp.float32)
            for dy in range(3):
                pg = dy_group_patches(hv, dy)
                ff = ff + jax.lax.dot_general(
                    wv[:, dy * 3 * C : (dy + 1) * 3 * C], pg,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            for dy in range(3):
                pg = dy_group_patches(av, dy)
                ff = ff + jax.lax.dot_general(
                    wv[:, (9 + dy * 3) * C : (9 + (dy + 1) * 3) * C], pg,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            pv = p_ref[pl.ds(l, 1)][0]  # [C, 3]
            bias = pv[:, 0][:, None, None]
            beta = pv[:, 1][:, None, None]
            theta = pv[:, 2][:, None, None]
            ff = ff + bias
            mem = smem_all[pl.ds(l, 1)][0].astype(jnp.float32)

            # single LIF instance (snn.Leaky inference, reset_delay=False)
            spk, mem2 = lif_update(ff, mem, beta, theta, hard_reset)

            sout_m[pl.ds(l, 1)] = jax.lax.expand_dims(
                jax.lax.slice_in_dim(mem2, 8, 8 + TH, axis=1), [0]
            ).astype(state_dtype)
            sout_s[pl.ds(slot, 1)] = jax.lax.expand_dims(
                jax.lax.slice_in_dim(spk, 8, 8 + TH, axis=1), [0]
            ).astype(state_dtype)
            hbuf[:] = spk.astype(jnp.bfloat16)
            return 0

        def tile_body(i, _):
            r0 = i * TH + (TH - 8)

            # stream this tile's input + states in (starts overlap)
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
            for s in range(2):
                d = pltpu.make_async_copy(
                    spk_hbm.at[s, b, :, pl.ds(r0, E), :],
                    saux_all.at[s], (sem_a0, sem_a1)[s])
                d.start()
                das.append(d)
            saux_all[2] = jnp.zeros((C, E, W), jnp.bfloat16)
            dx.wait()
            for d in dms:
                d.wait()
            for d in das:
                d.wait()

            jax.lax.fori_loop(0, L, layer_body, 0)

            hc = hbuf[:, 8 : 8 + TH, :]
            flow = jax.lax.dot_general(
                predw_ref[:], hc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            fstage[:] = jnp.tanh(flow + predb_ref[:, 0][:, None, None])

            # flush staged results for this tile (wait immediately: the next
            # tile iteration overwrites the staging buffers)
            dm = pltpu.make_async_copy(
                sout_m, mem_out.at[:, b, :, pl.ds(r0 + 8, TH), :], sem_om)
            ds_ = pltpu.make_async_copy(
                sout_s, spk_out.at[:, b, :, pl.ds(r0 + 8, TH), :], sem_os)
            df = pltpu.make_async_copy(
                fstage, flow_out.at[b, :, pl.ds(i * TH, TH), :], sem_of)
            dm.start()
            ds_.start()
            df.start()
            dm.wait()
            ds_.wait()
            df.wait()
            return 0

        jax.lax.fori_loop(0, n_tiles, tile_body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rec_layer_ids", "tile_rows", "hard_reset", "interpret"))
def fused_firenet_step_batch(
    x_pad: jax.Array,       # [B, C, Hp, W] (head input channel-padded to C)
    mem_stack: jax.Array,   # [L, B, C, Hp, W]
    spk_slots: jax.Array,   # [3, B, C, Hp, W] (slots 0/1 rec, 2 scratch)
    w_stack: jax.Array,     # [L, C, 18C]
    p_stack: jax.Array,     # [L, C, 3] (bias, beta, theta)
    pred_w: jax.Array,      # [2, C]
    pred_b: jax.Array,      # [2, 1]
    rec_layer_ids: Tuple[int, ...],
    tile_rows: int = 8,
    hard_reset: bool = True,
    interpret: bool = False,
):
    """One fused step. Returns (flow [B,2,H,W], mem_stack', spk_slots');
    output stacks have unspecified border blocks (caller re-zeros)."""
    L, B, C, Hp, W = mem_stack.shape
    TH = tile_rows
    H = Hp - 2 * TH
    E = TH + 16
    assert (TH - 8) % 8 == 0 and H % TH == 0
    n_tiles = H // TH
    state_dtype = mem_stack.dtype

    kernel = _make_kernel(L, TH, E, W, C, n_tiles, tuple(rec_layer_ids),
                          hard_reset, state_dtype)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[any_spec, any_spec, any_spec, vmem, vmem, vmem, vmem],
        out_specs=[any_spec, any_spec, any_spec],
        out_shape=[
            jax.ShapeDtypeStruct((L, B, C, Hp, W), state_dtype),
            jax.ShapeDtypeStruct((3, B, C, Hp, W), state_dtype),
            jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((C, E, W), jnp.bfloat16),        # hbuf
            pltpu.VMEM((L, C, E, W), state_dtype),      # smem_all
            pltpu.VMEM((3, C, E, W), jnp.bfloat16),     # saux_all
            pltpu.VMEM((L, C, TH, W), state_dtype),     # sout_m
            pltpu.VMEM((3, C, TH, W), state_dtype),     # sout_s
            pltpu.VMEM((2, TH, W), jnp.float32),        # fstage
            pltpu.SemaphoreType.DMA,                    # sem_x
            pltpu.SemaphoreType.DMA,                    # sem_a0
            pltpu.SemaphoreType.DMA,                    # sem_a1
            pltpu.SemaphoreType.DMA,                    # sem_om
            pltpu.SemaphoreType.DMA,                    # sem_os
            pltpu.SemaphoreType.DMA,                    # sem_of
        ] + [pltpu.SemaphoreType.DMA for _ in range(L)],
        interpret=interpret,
    )(
        x_pad.astype(jnp.bfloat16),
        mem_stack,
        spk_slots.astype(jnp.bfloat16),
        w_stack.astype(jnp.bfloat16),
        p_stack.astype(jnp.float32),
        pred_w.astype(jnp.bfloat16),
        pred_b.astype(jnp.float32),
    )
    return outs[2], outs[0], outs[1]


class BatchFusedFireNet:
    """Runner for the v8 kernel: identical state layout to LoopFusedFireNet2
    (padded stacked membranes + 3-slot spike array)."""

    def __init__(self, model, variables, tile_rows: int = 8):
        from benchmarks.pallas_archive.fused_net_lgrid import LayerGridFusedFireNet

        base = LayerGridFusedFireNet(model, variables, tile_rows=tile_rows)
        self.tile_rows = tile_rows
        self.hard_reset = base.hard_reset
        self.C = base.C
        self.L = base.L
        self.rec_layer_ids = base.rec_layer_ids
        self.w_stack = base.w_stack
        self.p_stack = base.p_stack
        self.pred_w = base.pred_w
        self.pred_b = base.pred_b

    def init_states(self, batch: int, height: int, width: int,
                    dtype=jnp.bfloat16):
        Hp = height + 2 * self.tile_rows
        mems = jnp.zeros((self.L, batch, self.C, Hp, width), dtype)
        spks = jnp.zeros((3, batch, self.C, Hp, width), dtype)
        return mems, spks

    def _zero_borders(self, a):
        TH = self.tile_rows
        z = jnp.zeros(a.shape[:3] + (TH, a.shape[4]), a.dtype)
        a = jax.lax.dynamic_update_slice(a, z, (0, 0, 0, 0, 0))
        return jax.lax.dynamic_update_slice(a, z, (0, 0, 0, a.shape[3] - TH, 0))

    def step(self, x, states, interpret: bool = False):
        """x [B, H, W, Cin] NHWC -> (flow [B, H, W, 2], states)."""
        mem_stack, spk_slots = states
        TH = self.tile_rows
        xc = jnp.moveaxis(x, -1, 1)
        B, Cin, H, W = xc.shape
        xc = jnp.pad(xc, ((0, 0), (0, self.C - Cin), (TH, TH), (0, 0)))
        flow, mem2, spk2 = fused_firenet_step_batch(
            xc, mem_stack, spk_slots, self.w_stack, self.p_stack,
            self.pred_w, self.pred_b,
            rec_layer_ids=self.rec_layer_ids,
            tile_rows=TH, hard_reset=self.hard_reset, interpret=interpret)
        return (
            jnp.moveaxis(flow, 1, -1),
            (self._zero_borders(mem2), self._zero_borders(spk2)),
        )
