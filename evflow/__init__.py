"""evflow — TPU-native framework for event-based optical flow with spiking neural networks.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch research stack (FireNet-family SNNs trained with self-supervised
contrast maximization on event-camera streams, evaluated against MVSEC
ground truth, with int8 quantization and a deployable export artifact).

Layer map (mirrors reference SURVEY.md §1, redesigned TPU-first):
  evflow.config    — YAML config schema + explicit registries (replaces eval()-based dispatch)
  evflow.data      — host-side HDF5 event streaming + device event encodings
  evflow.ops       — surrogate gradients, LIF cell math, IWE warping kernels (XLA + Pallas)
  evflow.models    — FireNet family + spiking multires UNet as flax modules
  evflow.loss      — contrast-maximization training loss + validation metrics
  evflow.parallel  — jax.sharding mesh / pjit utilities (new capability vs. reference)
  evflow.quant     — int8 fake-quant (weights/acts/membrane state) + calibration
  evflow.deploy    — int8 serving engine (folded BN, real int8 MXU GEMMs,
                     int8 spike/membrane carries) — the deployment runtime
  evflow.utils     — checkpointing, tracking, visualization
"""

__version__ = "0.1.0"

from evflow import config as config  # noqa: F401
