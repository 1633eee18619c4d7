"""Quaternion algebra on plain JAX arrays.

Quaternions are `(..., 4)` arrays `[re, i, j, k]`. All functions broadcast
over leading batch dimensions and are jit/vmap/grad-safe. Unit quaternions
are a convention of the caller, not a type: functions that assume unit norm
say so.

Semantics follow the reference implementation
(`/root/reference/lib/FlightPhysics/src/quaternions.jl`): the Hamilton
product (`quaternions.jl:109-115`), conjugate/inverse (`:71-78`), and
normalization.
"""

import jax.numpy as jnp


def quat(re=0.0, im=(0.0, 0.0, 0.0), dtype=None):
    """Build a quaternion array from real and imaginary parts."""
    re = jnp.asarray(re, dtype=dtype)
    im = jnp.asarray(im, dtype=dtype)
    return jnp.concatenate([re[..., None], jnp.broadcast_to(im, re.shape + (3,))], axis=-1)


def qre(q):
    return q[..., 0]


def qim(q):
    return q[..., 1:4]


def qmul(q1, q2):
    """Hamilton product q1 ∘ q2 (no renormalization)."""
    r1, v1 = q1[..., 0], q1[..., 1:]
    r2, v2 = q2[..., 0], q2[..., 1:]
    re = r1 * r2 - jnp.sum(v1 * v2, axis=-1)
    im = (r1[..., None] * v2 + r2[..., None] * v1 + jnp.cross(v1, v2))
    return jnp.concatenate([re[..., None], im], axis=-1)


def qconj(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def qinv(q):
    """Inverse of a general (free) quaternion: conj(q)/|q|^2."""
    return qconj(q) / jnp.sum(q * q, axis=-1, keepdims=True)


def qinv_unit(q):
    """Inverse of a unit quaternion (= conjugate)."""
    return qconj(q)


def qnorm(q):
    return jnp.linalg.norm(q, axis=-1)


def qnormalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qrot(q, v):
    """Rotate vector(s) v by unit quaternion q: a-frame coords of a b-frame
    vector when q = q_ab. Uses v + 2*q_im × (q_re*v + q_im × v)
    (cf. reference `attitude.jl:98-103`)."""
    q_re = q[..., 0:1]
    q_im = q[..., 1:4]
    return v + 2.0 * jnp.cross(q_im, q_re * v + jnp.cross(q_im, v))


def qrot_inv(q, v):
    """Rotate v by the inverse of unit quaternion q (b-frame coords of an
    a-frame vector when q = q_ab)."""
    return qrot(qconj(q), v)


def qdt(q_ab, omega_ab_b):
    """Time derivative of a rotation quaternion: 0.5 * q ∘ (0, ω)
    (cf. reference `attitude.jl:118`), with the pure-imaginary factor's zero
    real part folded out algebraically (re = -0.5 v·ω, im = 0.5 (r ω + v×ω))
    instead of materializing a concatenated [0, ω] quaternion."""
    r, v = q_ab[..., 0:1], q_ab[..., 1:4]
    re = -0.5 * jnp.sum(v * omega_ab_b, axis=-1, keepdims=True)
    im = 0.5 * (r * omega_ab_b + jnp.cross(v, omega_ab_b))
    return jnp.concatenate([re, im], axis=-1)


def qomega(q_ab, qdot_ab):
    """Angular velocity from a unit rotation quaternion and its derivative:
    ω_ab_b = 2 * Im(q' ∘ q̇) (cf. reference `attitude.jl:129`)."""
    return 2.0 * qmul(qconj(q_ab), qdot_ab)[..., 1:4]


def qmul_zpre(c2, s2, q):
    """[c2, 0, 0, s2] ∘ q — pre-multiply by a z-axis rotation quaternion
    given its HALF-angle cosine/sine. 8 mul / 4 add vs a general `qmul`'s
    ~28 flops; the z-rotation structure zeroes out the cross-product terms.
    (TPU hot-path specialization; semantics = qmul(rot_z(psi), q).)"""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([c2 * w - s2 * z,
                      c2 * x - s2 * y,
                      c2 * y + s2 * x,
                      c2 * z + s2 * w], axis=-1)


def qmul_zpost(q, c2, s2):
    """q ∘ [c2, 0, 0, s2] — post-multiply by a z-axis rotation quaternion
    given its HALF-angle cosine/sine (see `qmul_zpre`)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([w * c2 - z * s2,
                      x * c2 + y * s2,
                      y * c2 - x * s2,
                      z * c2 + w * s2], axis=-1)


def rot2_z(c, s, v):
    """R_z(psi) · v given the FULL-angle cosine/sine of psi: a plane
    rotation of the xy components, z passes through (4 mul / 2 add vs a
    general `qrot`'s ~30 flops). R_z(-psi) is `rot2_z(c, -s, v)`."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def rot2_y(c, s, v):
    """R_y(theta) · v given the FULL-angle cosine/sine of theta: a plane
    rotation of the zx components, y passes through. R(rot_y(theta)) =
    [[c,0,s],[0,1,0],[-s,0,c]], so R_y(-theta) is `rot2_y(c, -s, v)`."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack([x * c + z * s, y, -x * s + z * c], axis=-1)


def qidentity(dtype=None, batch=()):
    # constant broadcast (NOT .at[].set: that is a scatter, which does not
    # lower inside the Pallas megakernel)
    q = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype=dtype)
    return jnp.broadcast_to(q, batch + (4,))
