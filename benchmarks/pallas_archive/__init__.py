"""ARCHIVAL Pallas kernels — measured research artifacts, NOT on any
supported user path.

These are the whole-network fused-kernel experiments (v4-v8, BENCH_NOTES.md
rounds 1-2): each compiles (or has a minimal compiler-ICE repro in
benchmarks/) and is interpret-validated against the flax reference, but all
lose to the XLA dy-packed schedule on this toolchain because in-kernel
(Mosaic) dots are latency-capped at ~3-4 TF/s here
(benchmarks/probe_inkernel_dot2.py). They are kept as the evidence base for
the fused-kernel dead end and as ready-made starting points if the Mosaic
toolchain improves:

  fused_net.py       v4  one-pass whole-net kernel (multi-LIF ICE repro)
  fused_net_lgrid.py v5  layer-as-grid-dim, runs at 745 win/s
  fused_net_loop.py  v6  in-kernel layer loop (gather-lowering analysis)
  fused_net_loop2.py v7  fori_loop sweep with fixed lowering, 379 win/s
  fused_net_batch.py v8  grid=(B,) decisive overhead-vs-compute probe
  common.py          shared in-kernel dy-patch + LIF helpers

The SUPPORTED Pallas kernels live in evflow/ops/pallas/ (conv_lif.py / the models'
fused.py path). Tests: tests/test_pallas.py keeps these archival kernels
interpret-correct so the evidence stays reproducible.
"""
