"""Plain-torch mirrors of the reference's SNN cells and FireNet model.

These are independent reimplementations of the reference's *documented
update equations* in stock PyTorch (no snntorch / brevitas, neither of
which is installed here), used as the cross-framework oracle for
tests/test_reference_parity.py and as the real-layout checkpoint source
for tests/test_torch_import.py-style fixtures:

* ``MirrorConvLIF`` / ``MirrorConvLIFRecurrent`` — the original autograd
  cells: sigmoid-stabilised leak, ``(1 - leak)`` input scaling, detached
  hard/soft reset, arctan surrogate. Behavioral reference:
  models/spiking_submodules.py:121-151 (ff) and :267-300 (recurrent);
  surrogate per models/spiking_util.py:82-93.
* ``MirrorLeaky`` — snntorch ``snn.Leaky`` dynamics as configured by the
  reference cells (learn beta/threshold, reset_mechanism zero/subtract,
  ``reset_delay=False``, ATan surrogate alpha=2): beta clamped to [0, 1],
  previous-step reset folded into the state function, immediate reset of
  the new membrane by ``(spk - reset_prev)``. Behavioral reference:
  SNNtorch_spiking_submodules.py:232-239 (construction) and the snntorch
  Leaky update it delegates to.
* ``MirrorSNNConvLIF`` / ``MirrorSNNConvLIFRecurrent`` — conv (no bias)
  -> BatchNorm2d(momentum=0.1, eps=1e-5) -> Leaky, with the per-forward
  in-place threshold clamp to >= 0.01 and the per-step membrane detach.
  Behavioral reference: SNNtorch_spiking_submodules.py:283-322, :515-567.
* ``MirrorFireNet`` — head/G1/R1a[/R1b]/G2/R2a[/R2b]/pred wiring with
  module attribute names matching the reference exactly (``ff``, ``rec``,
  ``bn``, ``lif.beta``, ``lif.threshold``, ``pred.conv2d``), so its
  ``state_dict()`` / pickled-module checkpoints have the genuine
  reference layout. Behavioral reference: models/model.py:210-384
  (LIFFireNet_short) and :29-207 (full variant).

``SPIKE_MARGINS`` records min |membrane - threshold| at every firing so
parity tests can assert the chosen seed keeps all spikes far from the
threshold (no epsilon-level spike flips between frameworks).
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as nn

# min |u - theta| at each fire() call, for seed-safety guards in tests
SPIKE_MARGINS: list[float] = []


def _track_margin(shifted: torch.Tensor) -> None:
    SPIKE_MARGINS.append(float(shifted.detach().abs().min()))


class _ArctanSurrogate(torch.autograd.Function):
    """H(x > 0) forward; 1 / (1 + width x^2) backward
    (spiking_util.py:13-25, 82-93)."""

    @staticmethod
    def forward(ctx, x, width):
        ctx.save_for_backward(x, width)
        return (x > 0).to(x.dtype)

    @staticmethod
    def backward(ctx, g):
        x, width = ctx.saved_tensors
        return g / (1.0 + width * x * x), None


class _ATanSNN(torch.autograd.Function):
    """snntorch.surrogate.atan: H(x > 0) forward;
    (alpha/2) / (1 + (pi/2 * alpha * x)^2) backward."""

    @staticmethod
    def forward(ctx, x, alpha):
        ctx.save_for_backward(x)
        ctx.alpha = alpha
        return (x > 0).to(x.dtype)

    @staticmethod
    def backward(ctx, g):
        (x,) = ctx.saved_tensors
        a = ctx.alpha
        return g * (a / 2.0) / (1.0 + (math.pi / 2.0 * a * x) ** 2), None


class MirrorConvLIF(nn.Module):
    """Original feedforward cell (spiking_submodules.py:29-151)."""

    def __init__(self, input_size, hidden_size, kernel_size=3, stride=1,
                 act_width=10.0, hard_reset=True, detach=True):
        super().__init__()
        self.ff = nn.Conv2d(input_size, hidden_size, kernel_size,
                            stride=stride,
                            padding=kernel_size // 2, bias=False)
        self.leak = nn.Parameter(torch.full((hidden_size, 1, 1), -4.0))
        self.thresh = nn.Parameter(torch.full((hidden_size, 1, 1), 0.8))
        self.register_buffer("act_width", torch.tensor(float(act_width)))
        self.hard_reset = hard_reset
        self.detach = detach

    def _lif(self, current, prev_state):
        if prev_state is None:
            prev_state = torch.zeros(2, *current.shape, dtype=current.dtype)
        v, z = prev_state
        theta = self.thresh.clamp_min(0.01)
        lam = torch.sigmoid(self.leak)
        if self.detach:
            z = z.detach()
        if self.hard_reset:
            v_out = v * lam * (1.0 - z) + (1.0 - lam) * current
        else:
            v_out = v * lam + (1.0 - lam) * current - z * theta
        _track_margin(v_out - theta)
        z_out = _ArctanSurrogate.apply(v_out - theta, self.act_width)
        return z_out, torch.stack([v_out, z_out])

    def forward(self, x, prev_state, residual=0):
        z_out, state = self._lif(self.ff(x), prev_state)
        return z_out + residual, state


class MirrorConvLIFRecurrent(MirrorConvLIF):
    """Original recurrent cell (spiking_submodules.py:154-300): adds a
    conv over the previous spikes to the input current."""

    def __init__(self, input_size, hidden_size, kernel_size=3, **kw):
        super().__init__(input_size, hidden_size, kernel_size, **kw)
        self.rec = nn.Conv2d(hidden_size, hidden_size, kernel_size,
                             padding=kernel_size // 2, bias=False)

    def forward(self, x, prev_state):
        ff = self.ff(x)
        prev_spk = (torch.zeros_like(ff) if prev_state is None
                    else prev_state[1])
        return self._lif(ff + self.rec(prev_spk), prev_state)


class _STEQuant(torch.autograd.Function):
    """Straight-through uniform quantizer (snntorch quant.state_quant's
    backward: gradient passes unchanged)."""

    @staticmethod
    def forward(ctx, x, qmin, qmax, step):
        xc = x.clamp(qmin, qmax)
        return qmin + torch.round((xc - qmin) / step) * step

    @staticmethod
    def backward(ctx, g):
        return g, None, None, None


def mirror_state_quant(num_bits=8, threshold=1.0, lower_limit=249.0,
                       upper_limit=0.0):
    """snntorch ``quant.state_quant(uniform=True, thr_centered=False)``:
    2^bits evenly spaced levels over
    [-threshold*(1+lower_limit), threshold*(1+upper_limit)] (the cells'
    default is [-250, 1], SNNtorch_spiking_submodules.py:190-208),
    nearest-level rounding, straight-through gradient."""
    qmin = -threshold * (1.0 + lower_limit)
    qmax = threshold * (1.0 + upper_limit)
    step = (qmax - qmin) / (2 ** num_bits - 1)

    def q(mem):
        return _STEQuant.apply(mem, qmin, qmax, step)

    return q


class MirrorLeaky(nn.Module):
    """snn.Leaky(learn_beta, learn_threshold, reset_delay=False) dynamics."""

    def __init__(self, beta, threshold, reset_mechanism="zero", alpha=2.0,
                 state_quant=None):
        super().__init__()
        self.beta = nn.Parameter(beta.clone())
        self.threshold = nn.Parameter(threshold.clone())
        if reset_mechanism not in ("zero", "subtract"):
            raise ValueError(reset_mechanism)
        self.reset_mechanism = reset_mechanism
        self.alpha = alpha
        self.state_quant = state_quant

    def forward(self, input_, mem):
        if mem is None:
            mem = torch.zeros_like(input_)
        # previous-step reset, detached (snntorch mem_reset)
        reset = (mem - self.threshold > 0).to(input_.dtype).detach()
        u = self.beta.clamp(0.0, 1.0) * mem + input_
        if self.reset_mechanism == "zero":
            u = u - reset * u
        else:
            u = u - reset * self.threshold
        if self.state_quant is not None:
            u = self.state_quant(u)
        _track_margin(u - self.threshold)
        spk = _ATanSNN.apply(u - self.threshold, self.alpha)
        # reset_delay=False: apply the NEW spike's reset immediately
        # (gradient flows through the surrogate spk)
        if self.reset_mechanism == "zero":
            u = u - (spk - reset) * u
        else:
            u = u - (spk - reset) * self.threshold
        return spk, u


class MirrorTEBN(nn.Module):
    """Temporal Effective BN: BN2d then a learnable per-timestep,
    per-channel scale p[t]; mean over p when no timestep is given
    (SNNtorch_spiking_submodules.py:18-63)."""

    def __init__(self, num_features, num_timesteps=4):
        super().__init__()
        self.bn = nn.BatchNorm2d(num_features, momentum=0.1, eps=1e-5)
        self.p = nn.Parameter(torch.ones(num_timesteps, num_features, 1, 1))
        self.num_timesteps = num_timesteps

    def forward(self, x, timestep=None):
        x_bn = self.bn(x)
        if timestep is not None and 0 <= timestep < self.num_timesteps:
            return x_bn * self.p[timestep : timestep + 1]
        return x_bn * self.p.mean(dim=0, keepdim=True)


class MirrorMPBN(nn.Module):
    """Membrane Potential BN, applied to mem_out after the per-step
    detach (SNNtorch_spiking_submodules.py:66-121)."""

    def __init__(self, num_features):
        super().__init__()
        self.bn = nn.BatchNorm2d(num_features, momentum=0.1, eps=1e-5)

    def forward(self, mem):
        return self.bn(mem)


class MirrorSNNConvLIF(nn.Module):
    """conv -> BN (or TEBN) -> Leaky feedforward cell, optional MPBN on
    the detached membrane (SNNtorch_spiking_submodules.py:124-322)."""

    def __init__(self, input_size, hidden_size, kernel_size=3,
                 leak=(0.0, 1.0), thresh=(0.0, 0.8), hard_reset=True,
                 detach=True, tebn=False, num_timesteps=4, mpbn=False,
                 state_quant=None):
        super().__init__()
        self.ff = nn.Conv2d(input_size, hidden_size, kernel_size,
                            padding=kernel_size // 2, bias=False)
        w = math.sqrt(1.0 / input_size)
        nn.init.uniform_(self.ff.weight, -w, w)
        if tebn:
            self.bn = MirrorTEBN(hidden_size, num_timesteps)
        else:
            self.bn = nn.BatchNorm2d(hidden_size, momentum=0.1, eps=1e-5)
        self.mpbn = MirrorMPBN(hidden_size) if mpbn else None
        beta = torch.empty(hidden_size, 1, 1).uniform_(*leak)
        theta = torch.empty(hidden_size, 1, 1).uniform_(*thresh)
        self.lif = MirrorLeaky(beta, theta,
                               "zero" if hard_reset else "subtract",
                               state_quant=state_quant)
        self.detach = detach
        self.tebn = tebn

    def _norm(self, current, timestep):
        if self.tebn:
            return self.bn(current, timestep)
        return self.bn(current)

    def _fire(self, current, prev_state):
        mem = None if prev_state is None else prev_state[0]
        spk, mem_out = self.lif(current, mem)
        if self.detach:
            mem_out = mem_out.detach()
        if self.mpbn is not None:
            mem_out = self.mpbn(mem_out)
        return spk, torch.stack([mem_out, spk])

    def forward(self, x, prev_state, timestep=None):
        self.lif.threshold.data.clamp_(min=0.01)
        return self._fire(self._norm(self.ff(x), timestep), prev_state)


class MirrorSNNConvLIFRecurrent(MirrorSNNConvLIF):
    """conv_ff + conv_rec(prev spikes) -> BN -> Leaky
    (SNNtorch_spiking_submodules.py:324-567)."""

    def __init__(self, input_size, hidden_size, kernel_size=3, **kw):
        super().__init__(input_size, hidden_size, kernel_size, **kw)
        self.rec = nn.Conv2d(hidden_size, hidden_size, kernel_size,
                             padding=kernel_size // 2, bias=False)
        w = math.sqrt(1.0 / hidden_size)
        nn.init.uniform_(self.rec.weight, -w, w)

    def forward(self, x, prev_state, timestep=None):
        self.lif.threshold.data.clamp_(min=0.01)
        ff = self.ff(x)
        prev_spk = (torch.zeros_like(ff) if prev_state is None
                    else prev_state[1])
        return self._fire(
            self._norm(ff + self.rec(prev_spk), timestep), prev_state)


class _MirrorRecEncoder(nn.Module):
    """SpikingRecurrentConvLayer: strided ConvLIF ('conv') + recurrent
    cell ('recurrent_block') (spiking_submodules.py:303-346)."""

    def __init__(self, cin, cout, kernel_size=3, stride=2):
        super().__init__()
        self.conv = MirrorConvLIF(cin, cout, kernel_size, stride=stride)
        self.recurrent_block = MirrorConvLIFRecurrent(cout, cout,
                                                      kernel_size)

    def forward(self, x, prev_state):
        if prev_state is None:
            prev_state = [None, None]
        ff, rec = prev_state
        x1, ff = self.conv(x, ff)
        x2, rec = self.recurrent_block(x1, rec)
        return x2, [ff, rec]


class _MirrorResBlock(nn.Module):
    """SpikingResidualBlock: two ConvLIFs, input spikes added to the
    second cell's output (spiking_submodules.py:349-385)."""

    def __init__(self, ch):
        super().__init__()
        self.conv1 = MirrorConvLIF(ch, ch, 3)
        self.conv2 = MirrorConvLIF(ch, ch, 3)

    def forward(self, x, prev_state):
        if prev_state is None:
            prev_state = [None, None]
        s1, s2 = prev_state
        x1, s1 = self.conv1(x, s1)
        x2, s2 = self.conv2(x1, s2, residual=x)
        return x2, [s1, s2]


class _MirrorUpDecoder(nn.Module):
    """SpikingUpsampleConvLayer: bilinear x2 (align_corners=False) then
    ConvLIF 'conv2d' (spiking_submodules.py:388-417)."""

    def __init__(self, cin, cout, kernel_size=3):
        super().__init__()
        self.conv2d = MirrorConvLIF(cin, cout, kernel_size)

    def forward(self, x, prev_state):
        up = torch.nn.functional.interpolate(
            x, scale_factor=2, mode="bilinear", align_corners=False)
        return self.conv2d(up, prev_state)


class _MirrorMultiResUNetRec(nn.Module):
    """SpikingMultiResUNetRecurrent wiring (unet.py:414-461): 4 recurrent
    encoders (channel x2 each), 2 residual blocks, 4 upsample decoders
    with concat skips (+ previous multires prediction), per-scale tanh
    flow preds."""

    def __init__(self, num_bins=2, C=4, kernel_size=3, E=4, R=2):
        super().__init__()
        ins = [C * 2 ** i for i in range(E)]
        outs = [C * 2 ** (i + 1) for i in range(E)]
        self.encoders = nn.ModuleList(
            _MirrorRecEncoder(num_bins if i == 0 else ins[i], outs[i],
                              kernel_size)
            for i in range(E))
        self.resblocks = nn.ModuleList(
            _MirrorResBlock(outs[-1]) for _ in range(R))
        self.decoders = nn.ModuleList(
            _MirrorUpDecoder(2 * cin + (0 if i == 0 else 2), cout,
                             kernel_size)
            for i, (cin, cout) in enumerate(
                zip(reversed(outs), reversed(ins))))
        self.preds = nn.ModuleList(
            MirrorPred(cout) for cout in reversed(ins))
        self.E, self.R = E, R
        self.states = [None] * (2 * E + R)

    def forward(self, x):
        blocks = []
        for i, enc in enumerate(self.encoders):
            x, self.states[i] = enc(x, self.states[i])
            blocks.append(x)
        off = self.E
        for i, res in enumerate(self.resblocks):
            x, self.states[off + i] = res(x, self.states[off + i])
        off += self.R
        predictions = []
        for i, (dec, pred) in enumerate(zip(self.decoders, self.preds)):
            x = torch.cat([x, blocks[self.E - i - 1]], dim=1)
            if i > 0:
                x = torch.cat([predictions[-1], x], dim=1)
            x, self.states[off + i] = dec(x, self.states[off + i])
            predictions.append(pred(x))
        return predictions


class MirrorEVFlowNet(nn.Module):
    """SpikingRecEVFlowNet (models/model.py:723-858): the multires UNet
    plus nearest-upsampling of every scale to the finest prediction
    resolution. NCHW counts in, list of NCHW flows out."""

    def __init__(self, num_bins=2, base_num_channels=4, kernel_size=3):
        super().__init__()
        self.multires_unetrec = _MirrorMultiResUNetRec(
            num_bins, base_num_channels, kernel_size)

    def reset_states(self):
        self.multires_unetrec.states = [None] * len(
            self.multires_unetrec.states)

    def forward(self, event_cnt):
        flows = self.multires_unetrec(event_cnt)
        fh, fw = flows[-1].shape[2:]
        return [
            torch.nn.functional.interpolate(
                f, scale_factor=(fh / f.shape[2], fw / f.shape[3]))
            for f in flows
        ]


class MirrorPred(nn.Module):
    """Flow head: 1x1 conv (bias) + tanh, U(-0.01, 0.01) weights
    (submodules.py ConvLayer, models/model.py:105-107)."""

    def __init__(self, in_channels, out_channels=2):
        super().__init__()
        self.conv2d = nn.Conv2d(in_channels, out_channels, 1)
        nn.init.uniform_(self.conv2d.weight, -0.01, 0.01)
        nn.init.zeros_(self.conv2d.bias)

    def forward(self, x):
        return torch.tanh(self.conv2d(x))


class MirrorFireNet(nn.Module):
    """LIFFireNet[_short] wiring with reference attribute names
    (models/model.py:29-384). ``forward`` takes NCHW event counts and
    returns the NCHW flow tensor; recurrent state is held in ``_states``
    exactly like the reference (None = zeros at sequence start)."""

    def __init__(self, num_bins=2, base_num_channels=8, kernel_size=3,
                 short=True, leak=(0.0, 1.0), thresh=(0.0, 0.8),
                 recurrent=True):
        super().__init__()
        C = base_num_channels
        cell_kw = dict(kernel_size=kernel_size, leak=leak, thresh=thresh)
        # LIFFireFlowNet variants swap the recurrent G units for
        # feedforward cells (models/model.py:387-720, rec_neuron = ff)
        Mid = MirrorSNNConvLIFRecurrent if recurrent else MirrorSNNConvLIF
        self.head = MirrorSNNConvLIF(num_bins, C, **cell_kw)
        self.G1 = Mid(C, C, **cell_kw)
        self.R1a = MirrorSNNConvLIF(C, C, **cell_kw)
        if not short:
            self.R1b = MirrorSNNConvLIF(C, C, **cell_kw)
        self.G2 = Mid(C, C, **cell_kw)
        self.R2a = MirrorSNNConvLIF(C, C, **cell_kw)
        if not short:
            self.R2b = MirrorSNNConvLIF(C, C, **cell_kw)
        self.pred = MirrorPred(C)
        self.short = short
        self.unit_names = (("head", "G1", "R1a", "G2", "R2a") if short else
                           ("head", "G1", "R1a", "R1b", "G2", "R2a", "R2b"))
        self.reset_states()

    def reset_states(self):
        self._states = [None] * len(self.unit_names)

    def detach_states(self):
        self._states = [None if s is None else s.detach()
                        for s in self._states]

    def forward(self, event_cnt):
        x = event_cnt
        for i, name in enumerate(self.unit_names):
            x, self._states[i] = getattr(self, name)(x, self._states[i])
        return self.pred(x)


def mirror_warp_loss(flow_maps, events, pol_mask, event_mask, valid,
                     flow_scaling, smoothness_weight, smoothing_mask=False):
    """The EventWarping training loss (loss/flow.py:28-303) in vectorized
    torch, for gradient cross-checks against evflow's
    ``event_warping_loss``: per-pass flow gathered at each event's pixel,
    forward (tref=P) and backward (tref=0) warps, per-polarity
    count/timestamp splat images (4-corner bilinear, out-of-bounds
    zeroed), loss = sum of squared average-timestamp images per nonzero
    pixel, plus Charbonnier smoothness over dx/dy/diagonals/dt (the
    reference sums x and y differences before the penalty).

    Args mirror evflow/loss/warp_loss.py:134-162: flow_maps [P,B,H,W,2]
    (channels x,y), events [P,B,N,4] (ts in [0,1], y, x, p), pol_mask
    [P,B,N,2], event_mask [P,B,H,W,1], valid [P,B,N].
    """
    P, B, N, _ = events.shape
    H, W = flow_maps.shape[2:4]
    max_ts = float(P)
    ts = events[..., 0] + torch.arange(P, dtype=events.dtype)[:, None, None]
    ys, xs = events[..., 1], events[..., 2]
    lin = (ys.long() * W + xs.long()).clamp(0, H * W - 1)
    fmap = flow_maps.reshape(P, B, H * W, 2)
    fxy = torch.gather(fmap, 2, lin[..., None].expand(P, B, N, 2))
    fx, fy = fxy[..., 0], fxy[..., 1]

    def flat(t):
        return t.transpose(0, 1).reshape(B, P * N, *t.shape[3:])

    tsf, ysf, xsf = flat(ts), flat(ys), flat(xs)
    fyf, fxf = flat(fy), flat(fx)
    polf, validf = flat(pol_mask), flat(valid)

    total = flow_maps.new_zeros(())
    for tref in (max_ts, 0.0):
        tw = tsf if tref else (max_ts - tsf)  # fw: ts image; bw: max_ts - ts
        wy = ysf + (tref - tsf) * fyf * flow_scaling
        wx = xsf + (tref - tsf) * fxf * flow_scaling
        cnt = [flow_maps.new_zeros(B, H * W) for _ in range(2)]
        tsim = [flow_maps.new_zeros(B, H * W) for _ in range(2)]
        for cy in (torch.floor(wy), torch.floor(wy) + 1.0):
            for cx in (torch.floor(wx), torch.floor(wx) + 1.0):
                w = ((1.0 - (wy - cy).abs()).clamp(min=0)
                     * (1.0 - (wx - cx).abs()).clamp(min=0))
                inb = ((cy >= 0) & (cy < H) & (cx >= 0) & (cx < W))
                w = w * inb.to(w.dtype) * validf
                k = torch.where(inb, cy.long() * W + cx.long(),
                                torch.zeros_like(inb, dtype=torch.long))
                for pol in range(2):
                    cnt[pol] = cnt[pol].scatter_add(1, k, w * polf[..., pol])
                    tsim[pol] = tsim[pol].scatter_add(
                        1, k, w * tw * polf[..., pol])
        loss_b = 0.0
        for pol in range(2):
            avg = tsim[pol] / (cnt[pol] + 1e-9) / max_ts
            loss_b = loss_b + (avg ** 2).sum(dim=1)
        nz = ((cnt[0] + cnt[1]) > 0).to(flow_maps.dtype).sum(dim=1)
        total = total + (loss_b / nz.clamp(min=1.0)).sum()

    # smoothness (loss/flow.py:264-297)
    flow_x = flow_maps[..., 0].transpose(0, 1)  # [B, P, H, W]
    flow_y = flow_maps[..., 1].transpose(0, 1)
    mask = (event_mask[..., 0].transpose(0, 1)
            if smoothing_mask else None)

    def charb(x):
        return torch.sqrt(x * x + 1e-6)

    smooth = flow_maps.new_zeros(())
    pairs = [
        (np.index_exp[:, :-1], np.index_exp[:, 1:]),
        (np.index_exp[:-1, :], np.index_exp[1:, :]),
        (np.index_exp[:-1, :-1], np.index_exp[1:, 1:]),
        (np.index_exp[1:, :-1], np.index_exp[:-1, 1:]),
    ]
    for sl1, sl2 in pairs:
        diff = charb((flow_x[(...,) + sl1] - flow_x[(...,) + sl2])
                     + (flow_y[(...,) + sl1] - flow_y[(...,) + sl2]))
        if mask is not None:
            diff = diff * mask[(...,) + sl1] * mask[(...,) + sl2]
        smooth = smooth + diff.sum()
    components = 5  # dt counts toward the divisor even when P == 1
    if P > 1:
        diff = charb((flow_x[:, :-1] - flow_x[:, 1:])
                     + (flow_y[:, :-1] - flow_y[:, 1:]))
        if mask is not None:
            diff = diff * (mask[:, :-1] * mask[:, 1:])
        smooth = smooth + diff.sum()
    smooth = smooth / components / P
    return total + smoothness_weight * smooth
