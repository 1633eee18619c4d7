import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import quaternions as Q


def rand_quat(rng, unit=True, batch=()):
    v = rng.standard_normal(batch + (4,))
    if unit:
        v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v)


def test_mul_identity():
    rng = np.random.default_rng(0)
    q = rand_quat(rng)
    e = Q.qidentity()
    np.testing.assert_allclose(Q.qmul(e, q), q, atol=1e-15)
    np.testing.assert_allclose(Q.qmul(q, e), q, atol=1e-15)


def test_inverse():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, unit=False) * 3.0
    qi = Q.qinv(q)
    np.testing.assert_allclose(Q.qmul(q, qi), Q.qidentity(), atol=1e-14)
    u = rand_quat(rng, unit=True)
    np.testing.assert_allclose(Q.qmul(u, Q.qinv_unit(u)), Q.qidentity(), atol=1e-14)


def test_mul_associative_distributive():
    rng = np.random.default_rng(2)
    q1, q2, q3 = (rand_quat(rng, unit=False) for _ in range(3))
    np.testing.assert_allclose(Q.qmul(Q.qmul(q1, q2), q3),
                               Q.qmul(q1, Q.qmul(q2, q3)), atol=1e-13)
    np.testing.assert_allclose(Q.qmul(q1, q2 + q3),
                               Q.qmul(q1, q2) + Q.qmul(q1, q3), atol=1e-13)


def test_norm_multiplicative():
    rng = np.random.default_rng(3)
    q1, q2 = rand_quat(rng, unit=False), rand_quat(rng, unit=False)
    np.testing.assert_allclose(Q.qnorm(Q.qmul(q1, q2)), Q.qnorm(q1) * Q.qnorm(q2), rtol=1e-12)


def test_rotation_preserves_norm_and_composes():
    rng = np.random.default_rng(4)
    q1, q2 = rand_quat(rng), rand_quat(rng)
    v = jnp.asarray(rng.standard_normal(3))
    np.testing.assert_allclose(np.linalg.norm(Q.qrot(q1, v)), np.linalg.norm(v), rtol=1e-12)
    np.testing.assert_allclose(Q.qrot(q1, Q.qrot(q2, v)), Q.qrot(Q.qmul(q1, q2), v), atol=1e-12)
    np.testing.assert_allclose(Q.qrot_inv(q1, Q.qrot(q1, v)), v, atol=1e-12)


def test_qdt_omega_roundtrip():
    rng = np.random.default_rng(5)
    q = rand_quat(rng)
    w = jnp.asarray(rng.standard_normal(3))
    qdot = Q.qdt(q, w)
    np.testing.assert_allclose(Q.qomega(q, qdot), w, atol=1e-12)


def test_batched():
    rng = np.random.default_rng(6)
    q = rand_quat(rng, batch=(5, 7))
    v = jnp.asarray(rng.standard_normal((5, 7, 3)))
    out = Q.qrot(q, v)
    assert out.shape == (5, 7, 3)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), np.linalg.norm(v, axis=-1), rtol=1e-12)


pytestmark = pytest.mark.fast
