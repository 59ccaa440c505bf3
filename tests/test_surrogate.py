"""Surrogate spike functions: forward is Heaviside, backward matches the
closed-form surrogate derivatives from models/spiking_util.py."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from evflow.ops import surrogate as sg


@pytest.mark.parametrize("name", ["superspike", "mgspike", "trianglespike", "arctanspike"])
def test_forward_is_heaviside(name):
    f = sg.spike_fn(name)
    x = jnp.array([-2.0, -0.1, 0.0, 0.1, 2.0])
    out = f(x, 0.0)
    np.testing.assert_array_equal(np.asarray(out), [0.0, 0.0, 0.0, 1.0, 1.0])


def test_forward_threshold_shift():
    x = jnp.array([0.5, 1.5])
    out = sg.arctanspike(x, thresh=1.0)
    np.testing.assert_array_equal(np.asarray(out), [0.0, 1.0])


def _grad(f, x, *args):
    return jax.vmap(jax.grad(lambda v: f(v, *args).sum()))(x[:, None]).ravel()


def test_arctan_gradient():
    # d/dv arctanspike(v, thresh, w) = 1 / (1 + w*(v-thresh)^2)
    v = jnp.linspace(-2, 2, 9)
    g = _grad(sg.arctanspike, v, 1.0, 10.0)
    expected = 1.0 / (1.0 + 10.0 * (np.asarray(v) - 1.0) ** 2)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


def test_superspike_gradient():
    v = jnp.linspace(-2, 2, 9)
    g = _grad(sg.superspike, v, 0.5, 10.0)
    expected = 1.0 / (1.0 + 10.0 * np.abs(np.asarray(v) - 0.5)) ** 2
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


def test_triangle_gradient():
    v = jnp.linspace(-2, 2, 9)
    g = _grad(sg.trianglespike, v, 0.0, 1.0)
    expected = np.maximum(0.0, 1.0 - np.abs(np.asarray(v)))
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


def test_mgspike_gradient():
    def gauss(x, mu, s):
        return np.exp(-((x - mu) ** 2) / (2 * s * s)) / (s * math.sqrt(2 * math.pi))

    v = jnp.linspace(-2, 2, 9)
    w = 0.5
    g = _grad(sg.mgspike, v, 0.0, w)
    x = np.asarray(v)
    expected = 1.15 * gauss(x, 0, w) - 0.15 * gauss(x, w, 6 * w) - 0.15 * gauss(x, -w, 6 * w)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


def test_snntorch_atan_gradient():
    # snntorch ATan alpha=2: grad = (a/2) / (1 + (pi/2 * a * x)^2)
    v = jnp.linspace(-2, 2, 9)
    a = 2.0
    g = _grad(sg.atanspike_snn, v, 0.0, a)
    x = np.asarray(v)
    expected = (a / 2.0) / (1.0 + (math.pi / 2.0 * a * x) ** 2)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-6)


def test_threshold_receives_negative_gradient():
    # spike(v - thresh): d/dthresh = -surrogate(v - thresh)
    f = lambda v, t: sg.arctanspike(v, t, 10.0).sum()
    v = jnp.array([0.7])
    t = jnp.array([0.5])
    gt = jax.grad(f, argnums=1)(v, t)
    expected = -1.0 / (1.0 + 10.0 * (0.7 - 0.5) ** 2)
    np.testing.assert_allclose(np.asarray(gt), [expected], rtol=1e-6)


def test_works_under_jit_and_scan():
    def step(carry, x):
        return carry, sg.arctanspike(x, 0.0, 10.0)

    xs = jnp.linspace(-1, 1, 16)
    _, out = jax.jit(lambda xs: jax.lax.scan(step, 0.0, xs))(xs)
    np.testing.assert_array_equal(np.asarray(out), (np.asarray(xs) > 0).astype(np.float32))
