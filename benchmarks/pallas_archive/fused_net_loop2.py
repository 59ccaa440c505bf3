"""Whole-network fused FireNet step, ref-indexed in-kernel layer loop (v7).

v5 (layer-as-grid) measured ~10-20 us of fixed overhead per Pallas grid
step — with layers on the grid that is L x tiles x B steps per window. v7
moves the layer sweep inside the kernel as a ``fori_loop`` whose body is
the v5 compute (ONE textual LIF instance, dodging the multi-LIF Mosaic
ICE), cutting grid steps by 7x. The two failure modes of earlier attempts
are engineered around:

  * the old fori_loop form used value-level dynamic indexing of loaded
    arrays ("Only 2D gather is supported"); v7 uses ONLY ref-level
    ``pl.ds`` loads/stores with the loop index — the exact pattern v5
    compiles with ``program_id`` scalars;
  * all layer-dependent control flow is removed: feedforward layers read a
    zeroed garbage spike slot (slot 2) whose contribution is annihilated by
    their zero recurrent-weight half, and every layer stores its spikes to
    a slot (rec0->0, rec1->1, ff->2), so the body has no cond at all.

States: membranes [L, B, C, Hp, W]; spikes as a compact [3, B, C, Hp, W]
slot array (slots 0/1 = recurrent layers, slot 2 = scratch).
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

__all__ = ["fused_firenet_step_loop2", "LoopFusedFireNet2"]


def _make_kernel(L: int, TH: int, E: int, W: int, C: int,
                 rec_layer_ids: Tuple[int, ...], hard_reset: bool,
                 state_dtype):
    rec0 = rec_layer_ids[0] if rec_layer_ids else -1
    rec1 = rec_layer_ids[1] if len(rec_layer_ids) > 1 else -1

    def kernel(x_hbm, mem_hbm, spk_hbm, w_ref, p_ref, predw_ref, predb_ref,
               mem_out, spk_out, flow_out,
               hbuf, smem_all, saux_all, sout_m, sout_s,
               sem_x, sem_a0, sem_a1, *sems_m):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * TH + (TH - 8)

        # prologue: all state DMAs for this tile in flight together
        dx = pltpu.make_async_copy(x_hbm.at[b, :, pl.ds(r0, E), :], hbuf, sem_x)
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
        # garbage slot read by feedforward layers: must hold finite values
        # (their rec weights are zero, but NaN * 0 = NaN)
        saux_all[2] = jnp.zeros((C, E, W), jnp.bfloat16)
        dx.wait()
        for d in dms:
            d.wait()
        for d in das:
            d.wait()

        def dy_group_patches(src, dy):  # bound to the shared helper
            return _dy_group_patches(src, dy, C, E, W)

        def body(l, _):
            wv = w_ref[pl.ds(l, 1)][0]   # [C, 18C]
            hv = hbuf[:]
            # spike slot: rec layers read their own previous spikes; ff
            # layers read the zero slot (their rec weight half is zero)
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

            pv = p_ref[pl.ds(l, 1)][0]   # [C, 3]
            bias = pv[:, 0][:, None, None]
            beta = pv[:, 1][:, None, None]
            theta = pv[:, 2][:, None, None]
            ff = ff + bias
            mem = smem_all[pl.ds(l, 1)][0].astype(jnp.float32)

            # single LIF instance (snn.Leaky inference, reset_delay=False)
            spk, mem2 = lif_update(ff, mem, beta, theta, hard_reset)

            # 4-D dynamic stores into scratch; the stored values are sliced
            # with lax.slice_in_dim — jnp's mixed None+slice indexing falls
            # through to a gather, which Mosaic only supports in 2D (see
            # benchmarks/probe_loop_dyn*.py)
            sout_m[pl.ds(l, 1)] = jax.lax.expand_dims(
                jax.lax.slice_in_dim(mem2, 8, 8 + TH, axis=1), [0]
            ).astype(state_dtype)
            sout_s[pl.ds(slot, 1)] = jax.lax.expand_dims(
                jax.lax.slice_in_dim(spk, 8, 8 + TH, axis=1), [0]
            ).astype(state_dtype)
            hbuf[:] = spk.astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, L, body, 0)

        # static full-block flush of the staged per-layer results
        mem_out[:, 0] = sout_m[:]
        spk_out[:, 0] = sout_s[:]
        hc = hbuf[:, 8 : 8 + TH, :]
        flow = jax.lax.dot_general(
            predw_ref[:], hc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        flow_out[0] = jnp.tanh(flow + predb_ref[:, 0][:, None, None])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("rec_layer_ids", "tile_rows", "hard_reset", "interpret"))
def fused_firenet_step_loop2(
    x_pad: jax.Array,       # [B, C, Hp, W] (head input channel-padded to C)
    mem_stack: jax.Array,   # [L, B, C, Hp, W]
    spk_slots: jax.Array,   # [3, B, C, Hp, W] (slots 0/1 rec, 2 scratch)
    w_stack: jax.Array,     # [L, C, 18C]
    p_stack: jax.Array,     # [L, C, 3] (bias, beta, theta)
    pred_w: jax.Array,      # [2, C]
    pred_b: jax.Array,      # [2, 1]
    rec_layer_ids: Tuple[int, ...],
    tile_rows: int = 16,
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

    kernel = _make_kernel(L, TH, E, W, C, tuple(rec_layer_ids), hard_reset,
                          state_dtype)

    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    mem_block = pl.BlockSpec((L, 1, C, TH, W), lambda b, i: (0, b, 0, i + 1, 0))
    spk_block = pl.BlockSpec((3, 1, C, TH, W), lambda b, i: (0, b, 0, i + 1, 0))
    flow_block = pl.BlockSpec((1, 2, TH, W), lambda b, i: (b, 0, i, 0))

    outs = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[any_spec, any_spec, any_spec, vmem, vmem, vmem, vmem],
        out_specs=[mem_block, spk_block, flow_block],
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
            pltpu.SemaphoreType.DMA,                    # sem_x
            pltpu.SemaphoreType.DMA,                    # sem_a0
            pltpu.SemaphoreType.DMA,                    # sem_a1
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


class LoopFusedFireNet2:
    """Runner for the v7 kernel: padded stacked membrane carries + a 3-slot
    spike array (2 recurrent + 1 scratch)."""

    def __init__(self, model, variables, tile_rows: int = 16):
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

    def step(self, x, states):
        """x [B, H, W, Cin] NHWC -> (flow [B, H, W, 2], states)."""
        mem_stack, spk_slots = states
        TH = self.tile_rows
        xc = jnp.moveaxis(x, -1, 1)
        B, Cin, H, W = xc.shape
        xc = jnp.pad(xc, ((0, 0), (0, self.C - Cin), (TH, TH), (0, 0)))
        flow, mem2, spk2 = fused_firenet_step_loop2(
            xc, mem_stack, spk_slots, self.w_stack, self.p_stack,
            self.pred_w, self.pred_b,
            rec_layer_ids=self.rec_layer_ids,
            tile_rows=TH, hard_reset=self.hard_reset)
        return (
            jnp.moveaxis(flow, 1, -1),
            (self._zero_borders(mem2), self._zero_borders(spk2)),
        )
