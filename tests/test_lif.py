"""LIF cell math vs. hand-computed closed-form updates.

Covers the three variants documented in SURVEY.md §2:
  * snntorch snn.Leaky semantics (zero/subtract reset, reset_delay=False)
  * the original sigmoid-leak cell (spiking_submodules.py:144-151)
  * the C++ export kernel (lif_op.cpp:41-49)
"""

import jax
import jax.numpy as jnp
import numpy as np

from evflow.ops.lif import export_lif_step, leaky_step, sigmoid_lif_step


def ref_leaky_zero(ff, mem, beta, theta):
    """Closed form of snn.Leaky(reset='zero', reset_delay=False) forward."""
    beta = np.clip(beta, 0, 1)
    reset_prev = (mem - theta > 0).astype(np.float32)
    base = beta * mem + ff
    u = base - reset_prev * base
    spk = (u - theta > 0).astype(np.float32)
    mem_out = u - (spk - reset_prev) * u
    return spk, mem_out


def ref_leaky_subtract(ff, mem, beta, theta):
    beta = np.clip(beta, 0, 1)
    reset_prev = (mem - theta > 0).astype(np.float32)
    u = beta * mem + ff - reset_prev * theta
    spk = (u - theta > 0).astype(np.float32)
    mem_out = u - (spk - reset_prev) * theta
    return spk, mem_out


def test_leaky_zero_matches_reference(rng):
    ff = rng.normal(size=(4, 8)).astype(np.float32)
    mem = rng.normal(size=(4, 8)).astype(np.float32)
    beta = rng.uniform(0, 1, size=(8,)).astype(np.float32)
    theta = rng.uniform(0.01, 0.8, size=(8,)).astype(np.float32)
    spk, mem_out = leaky_step(jnp.array(ff), jnp.array(mem), jnp.array(beta), jnp.array(theta))
    espk, emem = ref_leaky_zero(ff, mem, beta, theta)
    np.testing.assert_allclose(np.asarray(spk), espk, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mem_out), emem, atol=1e-6)


def test_leaky_subtract_matches_reference(rng):
    ff = rng.normal(size=(4, 8)).astype(np.float32)
    mem = rng.normal(size=(4, 8)).astype(np.float32)
    beta = rng.uniform(0, 1, size=(8,)).astype(np.float32)
    theta = rng.uniform(0.01, 0.8, size=(8,)).astype(np.float32)
    spk, mem_out = leaky_step(
        jnp.array(ff), jnp.array(mem), jnp.array(beta), jnp.array(theta), reset="subtract"
    )
    espk, emem = ref_leaky_subtract(ff, mem, beta, theta)
    np.testing.assert_allclose(np.asarray(spk), espk, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mem_out), emem, atol=1e-5)


def test_leaky_beta_out_of_range_is_clamped():
    # snntorch clamps beta to [0, 1] inside the state function
    ff = jnp.array([0.3])
    mem = jnp.array([0.5])
    spk, mem_out = leaky_step(ff, mem, jnp.array([2.5]), jnp.array([10.0]))
    # beta -> 1.0: u = 0.5 + 0.3 = 0.8, below theta -> no spike
    np.testing.assert_allclose(np.asarray(mem_out), [0.8], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(spk), [0.0])


def test_leaky_hard_reset_zeroes_membrane():
    ff = jnp.array([1.0])
    mem = jnp.array([0.0])
    spk, mem_out = leaky_step(ff, mem, jnp.array([0.5]), jnp.array([0.5]))
    np.testing.assert_array_equal(np.asarray(spk), [1.0])
    np.testing.assert_array_equal(np.asarray(mem_out), [0.0])


def test_leaky_spike_sequence():
    """Integrate a constant sub-threshold current until firing."""
    beta, theta = jnp.array([0.9]), jnp.array([1.0])
    mem = jnp.array([0.0])
    ff = jnp.array([0.4])
    fired_at = None
    for t in range(10):
        spk, mem = leaky_step(ff, mem, beta, theta)
        if float(spk[0]) == 1.0 and fired_at is None:
            fired_at = t
    # u_t = 0.4 * (1 - 0.9^(t+1)) / 0.1 -> u = 0.4, 0.76, 1.084: fires at t=2
    assert fired_at == 2
    # after fire, membrane was reset; it restarts accumulating
    assert 0.0 <= float(mem[0]) < 1.0


def test_leaky_membrane_gradient_is_surrogate_not_step():
    def loss(ff):
        spk, _ = leaky_step(ff, jnp.zeros_like(ff), jnp.array([0.5]), jnp.array([1.0]))
        return spk.sum()

    g = jax.grad(loss)(jnp.array([0.7]))
    # d spk / d ff = atan surrogate at u - theta = -0.3 with alpha=2
    expected = (2.0 / 2.0) / (1.0 + (np.pi / 2.0 * 2.0 * (-0.3)) ** 2)
    np.testing.assert_allclose(np.asarray(g), [expected], rtol=1e-5)


def test_sigmoid_lif_hard_reset(rng):
    ff = rng.normal(size=(2, 4)).astype(np.float32)
    v = rng.normal(size=(2, 4)).astype(np.float32)
    z = (rng.uniform(size=(2, 4)) > 0.5).astype(np.float32)
    leak = rng.normal(size=(4,)).astype(np.float32) * 0.1 - 4.0
    thresh = rng.normal(size=(4,)).astype(np.float32) * 0.0 + 0.8

    z_out, v_out = sigmoid_lif_step(
        jnp.array(ff), jnp.array(v), jnp.array(z), jnp.array(leak), jnp.array(thresh)
    )
    sig = 1.0 / (1.0 + np.exp(-leak))
    ev = v * sig * (1 - z) + (1 - sig) * ff
    ez = (ev - np.maximum(thresh, 0.01) > 0).astype(np.float32)
    np.testing.assert_allclose(np.asarray(v_out), ev, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(z_out), ez)


def test_sigmoid_lif_soft_reset(rng):
    ff = rng.normal(size=(2, 4)).astype(np.float32)
    v = rng.normal(size=(2, 4)).astype(np.float32)
    z = (rng.uniform(size=(2, 4)) > 0.5).astype(np.float32)
    leak = np.full((4,), -1.0, np.float32)
    thresh = np.full((4,), 0.5, np.float32)
    z_out, v_out = sigmoid_lif_step(
        jnp.array(ff), jnp.array(v), jnp.array(z), jnp.array(leak), jnp.array(thresh),
        hard_reset=False,
    )
    sig = 1.0 / (1.0 + np.exp(-leak))
    ev = v * sig + (1 - sig) * ff - z * thresh
    np.testing.assert_allclose(np.asarray(v_out), ev, atol=1e-5)


def test_export_lif_matches_cpp_kernel(rng):
    """mem' = beta*mem + in; spike at >= threshold, hard zero reset."""
    x = rng.normal(size=(1, 3, 4, 4)).astype(np.float32)
    mem = rng.normal(size=(1, 3, 4, 4)).astype(np.float32)
    beta = rng.uniform(0, 1, size=(1, 3, 1, 1)).astype(np.float32)
    theta = rng.uniform(0.1, 0.8, size=(1, 3, 1, 1)).astype(np.float32)
    spk, mem_out = export_lif_step(jnp.array(x), jnp.array(mem), jnp.array(beta), jnp.array(theta))
    u = beta * mem + x
    espk = (u >= theta).astype(np.float32)
    emem = np.where(espk > 0, 0.0, u)
    np.testing.assert_array_equal(np.asarray(spk), espk)
    np.testing.assert_allclose(np.asarray(mem_out), emem, atol=1e-6)


def test_export_lif_spike_at_exact_threshold():
    # the C++ kernel fires at >= (training cells fire at >)
    spk, mem = export_lif_step(
        jnp.array([0.5]), jnp.array([0.0]), jnp.array([0.9]), jnp.array([0.5])
    )
    np.testing.assert_array_equal(np.asarray(spk), [1.0])
    np.testing.assert_array_equal(np.asarray(mem), [0.0])
