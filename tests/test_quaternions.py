import jax
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


def test_axis_rotation_specializations():
    """qmul_zpre/qmul_zpost/rot2_z/rot2_y vs the general qmul/qrot forms
    (the TPU hot-path specializations used by kinematics.WA and the C172
    aero stability-axes rotation)."""
    from flightjax.ops import attitude as att
    rng = np.random.default_rng(7)
    psi = jnp.asarray(np.concatenate([
        rng.uniform(-np.pi, np.pi, 64),
        [0.0, np.pi, np.pi / 2, -np.pi / 2, 1e-15, -1e-15]]))
    c, s = jnp.cos(psi), jnp.sin(psi)
    c2, s2 = att.half_angle_cs(c, s)
    np.testing.assert_allclose(c2, np.cos(psi / 2), atol=1e-14)
    np.testing.assert_allclose(s2, np.sin(psi / 2), atol=1e-14)

    q = rand_quat(rng, batch=psi.shape)
    v = jnp.asarray(rng.standard_normal(psi.shape + (3,)))
    qz, qy = att.rot_z(psi), att.rot_y(psi)
    np.testing.assert_allclose(Q.qmul_zpre(c2, s2, q), Q.qmul(qz, q), atol=1e-14)
    np.testing.assert_allclose(Q.qmul_zpost(q, c2, s2), Q.qmul(q, qz), atol=1e-14)
    np.testing.assert_allclose(Q.rot2_z(c, s, v), Q.qrot(qz, v), atol=1e-13)
    np.testing.assert_allclose(Q.rot2_z(c, -s, v), Q.qrot_inv(qz, v), atol=1e-13)
    np.testing.assert_allclose(Q.rot2_y(c, s, v), Q.qrot(qy, v), atol=1e-13)

    # psi = pi convention matches atan2 (+pi), and grads stay finite at the
    # half-angle branch point (c = -1)
    g = jax.grad(lambda cs: sum(jnp.sum(t)
                                for t in att.half_angle_cs(cs[0], cs[1])))(
        jnp.asarray([-1.0, 0.0]))
    assert bool(jnp.all(jnp.isfinite(g)))
