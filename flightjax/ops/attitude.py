"""3D attitude representations and conversions, batched and branch-free.

Representations (all plain arrays over leading batch dims):
- quaternion `q`: (..., 4) unit quaternion [re, i, j, k]  — the primary rep
- rotation matrix `R`: (..., 3, 3)
- Euler angles ZYX `(psi, theta, phi)`: (..., 3) [heading, inclination, bank]
- axis-angle `(axis (...,3), angle (...,))`
- rotation vector `rv`: (..., 3)

Conversion formulas mirror the reference
(`/root/reference/lib/FlightPhysics/src/attitude.jl`): quat→matrix
(`attitude.jl:175-190`), Shepperd-style matrix→quat with max-component
selection (`:192-233`), quat↔Euler (`:382-394`), Euler→matrix (`:397-411`),
Euler-rate matrices (`:436-474`). All data-dependent branches are
`jnp.where`/`jnp.select`, so everything vmaps and jits.
"""

import jax.numpy as jnp

from flightjax.ops.quaternions import qmul, qconj, qnormalize


def skew(v):
    """Skew-symmetric (cross-product) matrix of a 3-vector (batched)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ], axis=-2)


# ---------------------------------------------------------------- quaternion

def quat_to_matrix(q):
    q = qnormalize(q)
    q1, q2, q3, q4 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sq = q * q
    dq12 = 2 * q1 * q2
    dq13 = 2 * q1 * q3
    dq14 = 2 * q1 * q4
    dq23 = 2 * q2 * q3
    dq24 = 2 * q2 * q4
    dq34 = 2 * q3 * q4
    r00 = 1 - 2 * (sq[..., 2] + sq[..., 3])
    r11 = 1 - 2 * (sq[..., 1] + sq[..., 3])
    r22 = 1 - 2 * (sq[..., 1] + sq[..., 2])
    return jnp.stack([
        jnp.stack([r00, dq23 - dq14, dq24 + dq13], axis=-1),
        jnp.stack([dq23 + dq14, r11, dq34 - dq12], axis=-1),
        jnp.stack([dq24 - dq13, dq34 + dq12, r22], axis=-1),
    ], axis=-2)


def matrix_to_quat(R):
    """Shepperd's method: pick the largest of {1+tr, 1+2Rii-tr} for numerical
    conditioning, branch-free via argmax + select."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    c0 = 1 + tr
    c1 = 1 + 2 * R[..., 0, 0] - tr
    c2 = 1 + 2 * R[..., 1, 1] - tr
    c3 = 1 + 2 * R[..., 2, 2] - tr
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    i_max = jnp.argmax(cands, axis=-1)

    v0 = jnp.stack([c0,
                    R[..., 2, 1] - R[..., 1, 2],
                    R[..., 0, 2] - R[..., 2, 0],
                    R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    v1 = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                    c1,
                    R[..., 0, 1] + R[..., 1, 0],
                    R[..., 2, 0] + R[..., 0, 2]], axis=-1)
    v2 = jnp.stack([R[..., 0, 2] - R[..., 2, 0],
                    R[..., 0, 1] + R[..., 1, 0],
                    c2,
                    R[..., 1, 2] + R[..., 2, 1]], axis=-1)
    v3 = jnp.stack([R[..., 1, 0] - R[..., 0, 1],
                    R[..., 2, 0] + R[..., 0, 2],
                    R[..., 1, 2] + R[..., 2, 1],
                    c3], axis=-1)

    # expand the int32 index BEFORE comparing: a bool minor-dim insert does
    # not lower in Mosaic kernels ("only supported for 32-bit types")
    im = jnp.broadcast_to(i_max[..., None], jnp.shape(i_max) + (4,))
    v = jnp.where(im == 0, v0, jnp.where(im == 1, v1, jnp.where(im == 2, v2, v3)))
    return qnormalize(v)


def axis_angle_to_quat(axis, angle):
    angle = jnp.asarray(angle)
    half = 0.5 * angle
    re = jnp.cos(half)
    im = axis * jnp.sin(half)[..., None]
    return jnp.concatenate([re[..., None], im], axis=-1)


def quat_to_axis_angle(q):
    q_re = q[..., 0]
    q_im = q[..., 1:4]
    n_im = jnp.linalg.norm(q_im, axis=-1)
    angle = 2 * jnp.arctan2(n_im, q_re)
    safe = jnp.where(n_im > 0, n_im, 1.0)
    axis = jnp.where((n_im > 0)[..., None], q_im / safe[..., None],
                     jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=q.dtype), q_im.shape))
    return axis, angle


def rvec_to_quat(rv):
    mu = jnp.linalg.norm(rv, axis=-1)
    safe = jnp.where(mu > 0, mu, 1.0)
    axis = rv / safe[..., None]
    q = axis_angle_to_quat(axis, mu)
    identity = jnp.zeros_like(q).at[..., 0].set(1.0)
    return jnp.where((mu > 0)[..., None], q, identity)


def quat_to_rvec(q):
    axis, angle = quat_to_axis_angle(q)
    return axis * angle[..., None]


def half_angle_cs(c, s):
    """(cos(psi/2), sin(psi/2)) from (cos psi, sin psi), psi ∈ (-pi, pi],
    via half-angle square roots — NO transcendentals. Replaces the
    atan2(s, c) → cos/sin(psi/2) chain on TPU hot paths (rot_z of a wander
    angle recovered from quaternion components).

    Branch-free and AD-safe: both `where` branches stay finite (sqrt
    arguments clamped away from 0 so reverse-mode grads cannot produce
    inf·0 at the branch points). At (c, s) = (-1, 0) returns (0, +1),
    matching atan2's psi = +pi convention."""
    cpos = c >= 0
    # cos(psi/2) = sqrt((1+c)/2) is well-conditioned for c >= 0;
    # |sin(psi/2)| = sqrt((1-c)/2) for c < 0. The 1e-30 floors only bind in
    # the branch `where` discards.
    a1 = jnp.sqrt(jnp.maximum((1.0 + c) * 0.5, 1e-30))
    a2 = jnp.sqrt(jnp.maximum((1.0 - c) * 0.5, 1e-30))
    c2 = jnp.where(cpos, a1, jnp.abs(s) / (2.0 * a2))
    s2 = jnp.where(cpos, s / (2.0 * a1), jnp.where(s < 0, -a2, a2))
    return c2, s2


def rot_x(phi):
    """Quaternion for rotation about body X by phi."""
    phi = jnp.asarray(phi)
    z = jnp.zeros_like(phi)
    return jnp.stack([jnp.cos(0.5 * phi), jnp.sin(0.5 * phi), z, z], axis=-1)


def rot_y(theta):
    theta = jnp.asarray(theta)
    z = jnp.zeros_like(theta)
    return jnp.stack([jnp.cos(0.5 * theta), z, jnp.sin(0.5 * theta), z], axis=-1)


def rot_z(psi):
    psi = jnp.asarray(psi)
    z = jnp.zeros_like(psi)
    return jnp.stack([jnp.cos(0.5 * psi), z, z, jnp.sin(0.5 * psi)], axis=-1)


# ---------------------------------------------------------------- Euler ZYX

def euler_to_quat(euler):
    """euler = (..., 3) [psi, theta, phi] ZYX → unit quaternion
    (Rz(psi) ∘ Ry(theta) ∘ Rx(phi))."""
    psi, theta, phi = euler[..., 0], euler[..., 1], euler[..., 2]
    return qmul(rot_z(psi), qmul(rot_y(theta), rot_x(phi)))


def quat_to_euler(q):
    q1, q2, q3, q4 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    psi = jnp.arctan2(2 * (q1 * q4 + q2 * q3), 1 - 2 * (q3 * q3 + q4 * q4))
    theta = jnp.arcsin(jnp.clip(2 * (q1 * q3 - q2 * q4), -1.0, 1.0))
    phi = jnp.arctan2(2 * (q1 * q2 + q3 * q4), 1 - 2 * (q2 * q2 + q3 * q3))
    return jnp.stack([psi, theta, phi], axis=-1)


def euler_to_matrix(euler):
    psi, theta, phi = euler[..., 0], euler[..., 1], euler[..., 2]
    cps, sps = jnp.cos(psi), jnp.sin(psi)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    cph, sph = jnp.cos(phi), jnp.sin(phi)
    return jnp.stack([
        jnp.stack([cps * cth, -sps * cph + cps * sth * sph, sps * sph + cps * sth * cph], axis=-1),
        jnp.stack([sps * cth, cps * cph + sps * sth * sph, -cps * sph + sps * sth * cph], axis=-1),
        jnp.stack([-sth, cth * sph, cth * cph], axis=-1),
    ], axis=-2)


def matrix_to_euler(R):
    psi = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    theta = -jnp.arcsin(jnp.clip(R[..., 2, 0], -1.0, 1.0))
    phi = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    return jnp.stack([psi, theta, phi], axis=-1)


def euler_dt(euler, omega_ab_b):
    """Euler angle rates [psi_dot, theta_dot, phi_dot] from body rates."""
    theta, phi = euler[..., 1], euler[..., 2]
    sph, cph = jnp.sin(phi), jnp.cos(phi)
    tth = jnp.tan(theta)
    sec = 1.0 / jnp.cos(theta)
    p, q, r = omega_ab_b[..., 0], omega_ab_b[..., 1], omega_ab_b[..., 2]
    psi_dot = sph * sec * q + cph * sec * r
    theta_dot = cph * q - sph * r
    phi_dot = p + sph * tth * q + cph * tth * r
    return jnp.stack([psi_dot, theta_dot, phi_dot], axis=-1)


def euler_to_omega(euler, euler_dot):
    """Body angular velocity from Euler angles and their rates."""
    theta, phi = euler[..., 1], euler[..., 2]
    sth, cth = jnp.sin(theta), jnp.cos(theta)
    sph, cph = jnp.sin(phi), jnp.cos(phi)
    psd, thd, phd = euler_dot[..., 0], euler_dot[..., 1], euler_dot[..., 2]
    p = -sth * psd + phd
    q = cth * sph * psd + cph * thd
    r = cth * cph * psd - sph * thd
    return jnp.stack([p, q, r], axis=-1)


# ---------------------------------------------------------------- helpers

def azimuth(v):
    return jnp.arctan2(v[..., 1], v[..., 0])


def inclination(v):
    return jnp.arctan2(-v[..., 2], jnp.sqrt(v[..., 0] ** 2 + v[..., 1] ** 2))


def wrap_to_pi(x):
    return x + 2 * jnp.pi * jnp.floor((jnp.pi - x) / (2 * jnp.pi))
