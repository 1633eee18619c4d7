"""Mosaic-safe transcendental kernels: accuracy + patch context."""

import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import mathx


def test_atan_accuracy():
    x = np.linspace(-80.0, 80.0, 40001)
    got = np.asarray(mathx.atan(jnp.asarray(x)))
    assert np.max(np.abs(got - np.arctan(x))) < 1e-6


def test_atan2_quadrants():
    ys, xs = np.meshgrid(np.linspace(-3, 3, 121), np.linspace(-3, 3, 121))
    got = np.asarray(mathx.atan2(jnp.asarray(ys), jnp.asarray(xs)))
    assert np.max(np.abs(got - np.arctan2(ys, xs))) < 1e-6
    # axis cases
    assert float(mathx.atan2(jnp.asarray(1.0), jnp.asarray(0.0))) == np.pi / 2
    assert float(mathx.atan2(jnp.asarray(-1.0), jnp.asarray(0.0))) == -np.pi / 2
    assert float(mathx.atan2(jnp.asarray(0.0), jnp.asarray(-2.0))) == np.pi


def test_asin_acos():
    s = np.linspace(-1.0, 1.0, 20001)
    assert np.max(np.abs(np.asarray(mathx.asin(jnp.asarray(s)))
                         - np.arcsin(s))) < 2e-6
    assert np.max(np.abs(np.asarray(mathx.acos(jnp.asarray(s)))
                         - np.arccos(s))) < 2e-6


def test_mosaic_safe_patch_roundtrip():
    orig = jnp.arctan2
    with mathx.mosaic_safe():
        assert jnp.arctan2 is mathx.atan2
        v = jnp.arctan2(jnp.asarray(1.0), jnp.asarray(1.0))
        assert abs(float(v) - np.pi / 4) < 1e-6
    assert jnp.arctan2 is orig


pytestmark = pytest.mark.fast
