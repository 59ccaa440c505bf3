"""Fully-fused FireNet step: the whole 7-layer conv+LIF pipeline in ONE
Pallas kernel invocation per window.

Motivation (BENCH_NOTES.md): the measured state-traffic ceiling of this chip
is ~740 GB/s / ~9.8k windows/s, while the per-layer XLA path moves ~6 GB per
step (materialized im2col patches + unfused LIF) and lands at ~0.9k. Fusing
the full network keeps every inter-layer activation and all conv patches in
VMEM; HBM sees only: the event window in, the persistent LIF states
(read+write once), and the flow out.

Design:
  * channel-major [C, rows, W] tiles (W=lane dim, zero padding waste at 32
    channels); conv = one ``dot_general`` against a ``[K, rows, W]`` patch
    stack (K = 9*Cin, = 18*C for recurrent layers) — N = rows*W fills the
    MXU;
  * grid over (batch, H row-tiles). Each tile reads a halo of
    ``n_layers + 1`` rows; valid extents shrink by 1 row per conv layer
    (static value slicing), so the written central ``tile_rows`` are exact;
  * persistent states live in HBM as PADDED arrays [B, C, H + 2*TH, W] whose
    border rows are zero: halo reads need no bounds logic and 8-aligned
    manual DMAs (`make_async_copy` with dynamic row offsets) fetch each
    tile's extent. Tiles write only interior blocks; the caller re-zeros the
    two border blocks after each step (cheap slivers) because fresh XLA
    output buffers are not guaranteed zero;
  * only recurrent layers' spikes are persisted (feedforward spike carries
    are never read by the next step — dropping them saves 5 full-array
    writes per step vs. the reference's state layout).

LIF semantics: snn.Leaky inference (reset_delay=False), identical to
evflow.ops.pallas.conv_lif / ops.lif.leaky_step at spike time.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from benchmarks.pallas_archive.common import lif_update
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_firenet_step", "PallasFusedFireNet"]


def _lif(ff, mem, beta, theta, hard_reset: bool):
    return lif_update(ff, mem, beta, theta, hard_reset)


def _wpad(v):
    """[c, r, W] -> [c, r, W+2] zero columns left/right."""
    z = jnp.zeros((v.shape[0], v.shape[1], 1), v.dtype)
    return jnp.concatenate([z, v, z], axis=2)


def _patches(v, rows_out: int, W: int):
    """[c, rows_out+2, W] -> [9c, rows_out, W] shifted stack (dy, dx, c)."""
    vp = _wpad(v)
    subs = []
    for dy in range(3):
        for dx in range(3):
            subs.append(vp[:, dy : dy + rows_out, dx : dx + W])
    return jnp.concatenate(subs, axis=0)


def _make_kernel(layers, TH: int, E: int, W: int, Cin: int, C: int,
                 hard_reset: bool, state_dtype):
    """layers: list of dicts {recurrent: bool, spk_slot: int|None}."""
    n_layers = len(layers)
    n_rec = sum(1 for l in layers if l["recurrent"])
    center = (E - TH) // 2  # window-row offset of the tile interior

    def kernel(*refs):
        # refs layout:
        #  hbm inputs: x_pad, mem_pad[0..n-1], spk_pad[0..n_rec-1]
        #  vmem inputs: w[0..n-1], params [3, n_layers, C] (bias, beta, theta)
        #  outputs (blocked): mem_out[0..n-1], spk_out[0..n_rec-1], flow,
        #                     pred weights handled via vmem input
        idx = 0
        x_hbm = refs[idx]; idx += 1
        mem_hbm = refs[idx : idx + n_layers]; idx += n_layers
        spk_hbm = refs[idx : idx + n_rec]; idx += n_rec
        w_refs = refs[idx : idx + n_layers]; idx += n_layers
        param_refs = refs[idx : idx + n_layers]; idx += n_layers  # each [C, 3]
        predw_ref = refs[idx]; idx += 1  # [2, C] pred kernel
        predb_ref = refs[idx]; idx += 1  # [2, 1]
        mem_out = refs[idx : idx + n_layers]; idx += n_layers
        spk_out = refs[idx : idx + n_rec]; idx += n_rec
        flow_out = refs[idx]; idx += 1
        # scratch
        sx = refs[idx]; idx += 1
        sm = refs[idx : idx + n_layers]; idx += n_layers
        ss = refs[idx : idx + n_rec]; idx += n_rec
        n_dma = 1 + n_layers + n_rec
        sems = refs[idx : idx + n_dma]; idx += n_dma

        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * TH + (TH - center)  # 8-aligned padded-row start of the window

        copies = []
        copies.append(pltpu.make_async_copy(
            x_hbm.at[b, :, pl.ds(r0, E), :], sx, sems[0]))
        for l in range(n_layers):
            copies.append(pltpu.make_async_copy(
                mem_hbm[l].at[b, :, pl.ds(r0, E), :], sm[l], sems[1 + l]))
        for s in range(n_rec):
            copies.append(pltpu.make_async_copy(
                spk_hbm[s].at[b, :, pl.ds(r0, E), :], ss[s],
                sems[1 + n_layers + s]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        h = sx[:]  # [Cin, E, W] current activation (window rows [0, E))
        h_off = 0  # window-row offset of h[., 0, .]
        for l, spec in enumerate(layers):
            out_lo, out_hi = l + 1, E - (l + 1)  # valid output window rows
            rows_out = out_hi - out_lo
            # ff patches from h (h covers [h_off, E - h_off))
            a = out_lo - 1 - h_off
            pat = _patches(h[:, a : a + rows_out + 2, :], rows_out, W)
            if spec["recurrent"]:
                sv = ss[spec["spk_slot"]][:, out_lo - 1 : out_hi + 1, :]
                pat = jnp.concatenate([pat, _patches(sv, rows_out, W)], axis=0)
            ff = jax.lax.dot_general(
                w_refs[l][:], pat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bias = param_refs[l][:, 0][:, None, None]
            beta = param_refs[l][:, 1][:, None, None]
            theta = param_refs[l][:, 2][:, None, None]
            ff = ff + bias
            mem = sm[l][:, out_lo:out_hi, :].astype(jnp.float32)
            spk, mem2 = _lif(ff, mem, beta, theta, hard_reset)
            # write central TH rows (window rows [center, center+TH))
            w0 = center - out_lo
            mem_out[l][0] = mem2[:, w0 : w0 + TH, :].astype(state_dtype)
            if spec["recurrent"]:
                spk_out[spec["spk_slot"]][0] = spk[:, w0 : w0 + TH, :].astype(
                    state_dtype
                )
            h = spk.astype(jnp.bfloat16)
            h_off = out_lo

        # pred: 1x1 conv + tanh on central TH rows of the last spikes
        w0 = center - h_off
        hc = h[:, w0 : w0 + TH, :]
        flow = jax.lax.dot_general(
            predw_ref[:], hc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        flow = jnp.tanh(flow + predb_ref[:, 0][:, None, None])
        flow_out[0] = flow

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("recurrent_slots", "tile_rows", "hard_reset"),
)
def fused_firenet_step(
    x_pad: jax.Array,
    mems_pad: Tuple[jax.Array, ...],
    spks_pad: Tuple[jax.Array, ...],
    weights: Tuple[jax.Array, ...],
    params: Tuple[jax.Array, ...],  # per layer [C, 3] (bias, beta, theta) cols
    pred_w: jax.Array,  # [2, C]
    pred_b: jax.Array,  # [2, 1]
    recurrent_slots: Tuple[int, ...],  # layer index -> spk slot, -1 if ff
    tile_rows: int = 16,
    hard_reset: bool = True,
):
    """One fused step over padded state arrays.

    Shapes: x_pad [B, Cin, H+2*TH, W]; each mems_pad/spks_pad
    [B, C, H+2*TH, W] (state dtype, zero borders); weights[l] is the
    [C, K_l] transposed stack (K = 9*Cin_l, rec layers 9*(Cin+C)).
    Returns (flow [B, 2, H, W] f32, new mems_pad, new spks_pad) — outputs
    are padded arrays whose border blocks are UNSPECIFIED; the caller must
    re-zero them (see PallasFusedFireNet.step).
    """
    B, Cin, Hp, W = x_pad.shape
    TH = tile_rows
    H = Hp - 2 * TH
    C = mems_pad[0].shape[1]
    n_layers = len(mems_pad)
    n_rec = len(spks_pad)
    E = TH + 16
    assert (TH - (E - TH) // 2) % 8 == 0, "DMA row alignment"
    assert n_layers + 1 <= (E - TH) // 2 + 1

    layers = []
    for l in range(n_layers):
        rec = recurrent_slots[l] >= 0
        layers.append({"recurrent": rec, "spk_slot": recurrent_slots[l]})

    state_dtype = mems_pad[0].dtype
    kernel = _make_kernel(layers, TH, E, W, Cin, C, hard_reset, state_dtype)

    n_tiles = H // TH
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    state_block = pl.BlockSpec(
        (1, C, TH, W), lambda b, i: (b, 0, i + 1, 0)
    )
    flow_block = pl.BlockSpec((1, 2, TH, W), lambda b, i: (b, 0, i, 0))

    out_shapes = (
        [jax.ShapeDtypeStruct((B, C, Hp, W), state_dtype) for _ in range(n_layers)]
        + [jax.ShapeDtypeStruct((B, C, Hp, W), state_dtype) for _ in range(n_rec)]
        + [jax.ShapeDtypeStruct((B, 2, H, W), jnp.float32)]
    )
    out_specs = [state_block] * (n_layers + n_rec) + [flow_block]

    scratch = (
        [pltpu.VMEM((Cin, E, W), jnp.bfloat16)]
        + [pltpu.VMEM((C, E, W), state_dtype) for _ in range(n_layers)]
        + [pltpu.VMEM((C, E, W), jnp.bfloat16) for _ in range(n_rec)]
        + [pltpu.SemaphoreType.DMA for _ in range(1 + n_layers + n_rec)]
    )

    outs = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=(
            [any_spec] * (1 + n_layers + n_rec) + [vmem] * (2 * n_layers + 2)
        ),
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
    )(
        x_pad.astype(jnp.bfloat16),
        *mems_pad,
        *[s.astype(jnp.bfloat16) for s in spks_pad],
        *[w.astype(jnp.bfloat16) for w in weights],
        *params,
        pred_w.astype(jnp.bfloat16),
        pred_b,
    )
    new_mems = tuple(outs[:n_layers])
    new_spks = tuple(outs[n_layers : n_layers + n_rec])
    flow = outs[-1]
    return flow, new_mems, new_spks


class PallasFusedFireNet:
    """Whole-network fused inference runner built from trained FireNet
    variables (same folding as models/fused.FusedFireNet, cmajor layout).

    States are padded [B, C, H+2*TH, W] arrays carried across steps; border
    blocks are re-zeroed after every step.
    """

    def __init__(self, model, variables, tile_rows: int = 16):
        from evflow.models.fused import FusedFireNet

        base = FusedFireNet.from_firenet(model, variables)
        self.tile_rows = tile_rows
        self.hard_reset = base.hard_reset
        self.C = base.base_num_channels
        self.num_bins = model.num_bins
        self.unit_names = [u.name for u in base.units]
        rec_slots = []
        slot = 0
        for u in base.units:
            rec_slots.append(slot if u.recurrent else -1)
            if u.recurrent:
                slot += 1
        self.recurrent_slots = tuple(rec_slots)
        self.n_rec = slot

        def to_wT(k):
            k = np.asarray(k, np.float32)
            return jnp.asarray(k.transpose(3, 0, 1, 2).reshape(k.shape[3], -1))

        ws, biases, betas, thetas = [], [], [], []
        for u in base.units:
            e = base.params[u.name]
            w = to_wT(e["w"])
            if u.recurrent:
                w = jnp.concatenate([w, to_wT(e["w_rec"])], axis=1)
            ws.append(w)
            biases.append(np.asarray(e["bias"], np.float32))
            betas.append(np.asarray(e["beta"], np.float32))
            thetas.append(np.asarray(e["theta"], np.float32))
        self.weights = tuple(ws)
        self.params = tuple(
            jnp.asarray(np.stack([biases[l], betas[l], thetas[l]], axis=1))
            for l in range(len(ws))
        )  # per layer [C, 3]
        self.pred_w = jnp.asarray(
            np.asarray(base.params["pred"]["w"], np.float32).reshape(self.C, 2).T
        )
        self.pred_b = jnp.asarray(
            np.asarray(base.params["pred"]["b"], np.float32).reshape(2, 1)
        )

    def init_states(self, batch: int, height: int, width: int,
                    dtype=jnp.bfloat16):
        Hp = height + 2 * self.tile_rows
        n = len(self.unit_names)
        mems = tuple(
            jnp.zeros((batch, self.C, Hp, width), dtype) for _ in range(n)
        )
        spks = tuple(
            jnp.zeros((batch, self.C, Hp, width), dtype) for _ in range(self.n_rec)
        )
        return mems, spks

    def _zero_borders(self, arrs):
        TH = self.tile_rows
        out = []
        for a in arrs:
            z = jnp.zeros((a.shape[0], a.shape[1], TH, a.shape[3]), a.dtype)
            a = jax.lax.dynamic_update_slice(a, z, (0, 0, 0, 0))
            a = jax.lax.dynamic_update_slice(a, z, (0, 0, a.shape[2] - TH, 0))
            out.append(a)
        return tuple(out)

    def step(self, x, states):
        """x [B, H, W, Cin] NHWC window -> (flow [B, H, W, 2], states)."""
        mems, spks = states
        TH = self.tile_rows
        xc = jnp.moveaxis(x, -1, 1)  # NCHW
        x_pad = jnp.pad(xc, ((0, 0), (0, 0), (TH, TH), (0, 0)))
        flow, mems2, spks2 = fused_firenet_step(
            x_pad, mems, spks, self.weights, self.params,
            self.pred_w, self.pred_b,
            recurrent_slots=self.recurrent_slots,
            tile_rows=TH, hard_reset=self.hard_reset,
        )
        mems2 = self._zero_borders(mems2)
        spks2 = self._zero_borders(spks2)
        return jnp.moveaxis(flow, 1, -1), (mems2, spks2)
