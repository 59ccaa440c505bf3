"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by exposing 8 XLA CPU
devices (the TPU-native answer to "test multi-node without a cluster" — see
SURVEY.md §4(f)).

Note: this environment pre-imports jax with a tunneled TPU backend via
sitecustomize (JAX_PLATFORMS=axon), so env vars are too late here — we
switch platforms through jax.config before any backend initializes.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
