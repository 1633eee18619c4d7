import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import attitude as A
from flightjax.ops import quaternions as Q


def rand_unit_quat(rng, batch=()):
    v = rng.standard_normal(batch + (4,))
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))


def quat_equiv(q1, q2, atol=1e-10):
    """Equality up to the double cover of SO(3)."""
    d = np.minimum(np.abs(np.asarray(q1) - np.asarray(q2)).max(-1),
                   np.abs(np.asarray(q1) + np.asarray(q2)).max(-1))
    assert np.all(d < atol), d


def test_matrix_roundtrip():
    rng = np.random.default_rng(0)
    q = rand_unit_quat(rng, batch=(32,))
    R = A.quat_to_matrix(q)
    # orthonormality and determinant
    np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, rtol=1e-12)
    quat_equiv(A.matrix_to_quat(R), q)
    # vector transformation agrees with quaternion rotation
    v = jnp.asarray(rng.standard_normal((32, 3)))
    np.testing.assert_allclose(jnp.einsum("bij,bj->bi", R, v), Q.qrot(q, v), atol=1e-12)


def test_euler_roundtrip():
    rng = np.random.default_rng(1)
    psi = rng.uniform(-np.pi, np.pi, 64)
    theta = rng.uniform(-np.pi / 2 + 1e-3, np.pi / 2 - 1e-3, 64)
    phi = rng.uniform(-np.pi, np.pi, 64)
    e = jnp.stack([jnp.asarray(psi), jnp.asarray(theta), jnp.asarray(phi)], axis=-1)
    q = A.euler_to_quat(e)
    np.testing.assert_allclose(A.quat_to_euler(q), e, atol=1e-10)
    R = A.euler_to_matrix(e)
    np.testing.assert_allclose(A.quat_to_matrix(q), R, atol=1e-12)
    np.testing.assert_allclose(A.matrix_to_euler(R), e, atol=1e-10)


def test_axis_angle_and_rvec():
    rng = np.random.default_rng(2)
    axis = rng.standard_normal(3)
    axis = jnp.asarray(axis / np.linalg.norm(axis))
    angle = 1.234
    q = A.axis_angle_to_quat(axis, angle)
    ax2, an2 = A.quat_to_axis_angle(q)
    np.testing.assert_allclose(ax2, axis, atol=1e-12)
    np.testing.assert_allclose(an2, angle, atol=1e-12)
    rv = A.quat_to_rvec(q)
    quat_from_rv = A.rvec_to_quat(rv)
    np.testing.assert_allclose(quat_from_rv, q, atol=1e-12)
    # zero rotation edge case
    np.testing.assert_allclose(A.rvec_to_quat(jnp.zeros(3)), Q.qidentity(), atol=0)


def test_elemental_rotations():
    v = jnp.asarray([1.0, 0.0, 0.0])
    out = Q.qrot(A.rot_z(jnp.pi / 2), v)
    np.testing.assert_allclose(out, [0.0, 1.0, 0.0], atol=1e-12)
    out = Q.qrot(A.rot_y(jnp.pi / 2), v)
    np.testing.assert_allclose(out, [0.0, 0.0, -1.0], atol=1e-12)
    out = Q.qrot(A.rot_x(jnp.pi / 2), jnp.asarray([0.0, 1.0, 0.0]))
    np.testing.assert_allclose(out, [0.0, 0.0, 1.0], atol=1e-12)


def test_euler_rates_roundtrip():
    rng = np.random.default_rng(3)
    e = jnp.asarray([0.3, -0.4, 1.1])
    w = jnp.asarray(rng.standard_normal(3))
    edot = A.euler_dt(e, w)
    np.testing.assert_allclose(A.euler_to_omega(e, edot), w, atol=1e-12)
    # consistency with quaternion kinematics
    q = A.euler_to_quat(e)
    qdot = Q.qdt(q, w)
    eps = 1e-7
    q2 = q + eps * qdot
    e2 = A.quat_to_euler(Q.qnormalize(q2))
    np.testing.assert_allclose((e2 - e) / eps, edot, atol=1e-5)


def test_wrap_and_az_inc():
    np.testing.assert_allclose(A.wrap_to_pi(jnp.asarray(3 * jnp.pi / 2)), -jnp.pi / 2, atol=1e-12)
    np.testing.assert_allclose(A.wrap_to_pi(jnp.asarray(-3 * jnp.pi / 2)), jnp.pi / 2, atol=1e-12)
    v = jnp.asarray([1.0, 1.0, -np.sqrt(2.0)])
    np.testing.assert_allclose(A.azimuth(v), np.pi / 4, atol=1e-12)
    np.testing.assert_allclose(A.inclination(v), np.pi / 4, atol=1e-12)


def test_skew():
    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([-2.0, 0.5, 4.0])
    np.testing.assert_allclose(A.skew(a) @ b, jnp.cross(a, b), atol=1e-14)


pytestmark = pytest.mark.fast
