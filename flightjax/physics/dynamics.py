"""Rigid-body 6-DOF dynamics: frames, wrenches, mass properties, Newton-Euler.

Mirrors `/root/reference/lib/FlightPhysics/src/dynamics.jl`:
- `FrameTransform` (r, q) with compose/inverse/translate of points, wrenches
  and mass properties (`dynamics.jl:37-103,141-156,284-317`)
- `Wrench` force+torque (`:114-128`)
- `MassProps` with point/rigid-body constructors, parallel-axis (Steiner)
  transport and aggregation (`:162-272`)
- `VehicleDynamics`: Newton-Euler solved **at the center of mass**, with
  Earth-rotation Coriolis terms and Somigliana gravity at the CoM
  (`:443-525`); x = {omega_eb_b, v_eb_b}, u = total mass props + wrench +
  internal angular momentum + attitude/position from kinematics.

All containers are NamedTuples of arrays; everything broadcasts over leading
batch dims.
"""

from typing import NamedTuple

import jax.numpy as jnp

from flightjax.core.modeling import Component, bscale
from flightjax.ops import geodesy as geo
from flightjax.ops.attitude import skew
from flightjax.ops.quaternions import qrot, qrot_inv, qidentity


class Wrench(NamedTuple):
    """Force + torque applied at (and projected in) some frame."""
    F: jnp.ndarray  # (..., 3)
    tau: jnp.ndarray  # (..., 3)

    def __add__(self, other):
        return Wrench(self.F + other.F, self.tau + other.tau)


def wrench_zero(batch=(), dtype=None):
    z = jnp.zeros(batch + (3,), dtype=dtype)
    return Wrench(F=z, tau=z)


class FrameTransform(NamedTuple):
    """Frame c relative to frame b: r = r_ObOc_b, q = q_bc."""
    r: jnp.ndarray  # (..., 3)
    q: jnp.ndarray  # (..., 4)


def ft_identity(batch=(), dtype=None):
    return FrameTransform(r=jnp.zeros(batch + (3,), dtype=dtype),
                          q=qidentity(dtype=dtype, batch=batch))


def ft_compose(t_bc: FrameTransform, t_cd: FrameTransform) -> FrameTransform:
    from flightjax.ops.quaternions import qmul
    return FrameTransform(r=t_bc.r + qrot(t_bc.q, t_cd.r),
                          q=qmul(t_bc.q, t_cd.q))


def ft_inv(t_bc: FrameTransform) -> FrameTransform:
    from flightjax.ops.quaternions import qconj
    q_cb = qconj(t_bc.q)
    return FrameTransform(r=qrot(q_cb, -t_bc.r), q=q_cb)


def translate_point(t_bc: FrameTransform, r_cP_c):
    return t_bc.r + qrot(t_bc.q, r_cP_c)


def translate_wrench(t_bc: FrameTransform, wr_c: Wrench) -> Wrench:
    """Wrench defined on frame c → equivalent wrench on frame b
    (`dynamics.jl:141-156`)."""
    F_b = qrot(t_bc.q, wr_c.F)
    tau_b = qrot(t_bc.q, wr_c.tau) + jnp.cross(t_bc.r, F_b)
    return Wrench(F=F_b, tau=tau_b)


class MassProps(NamedTuple):
    """Mass properties in some frame fb: total mass m, inertia tensor J about
    Ob in b axes, CoM position r_OG in b axes (`dynamics.jl:200-204`)."""
    m: jnp.ndarray        # (...,)
    J: jnp.ndarray        # (..., 3, 3)
    r_OG: jnp.ndarray     # (..., 3)

    def __add__(self, other):
        """Aggregate two mass properties expressed in a common frame
        (`dynamics.jl:262-272`)."""
        m = self.m + other.m
        safe_m = jnp.where(m > 0, m, 1.0)
        r = (self.m[..., None] * self.r_OG + other.m[..., None] * other.r_OG) \
            / safe_m[..., None]
        return MassProps(m=m, J=self.J + other.J, r_OG=r)


def mass_props_zero(batch=(), dtype=None):
    return MassProps(m=jnp.zeros(batch, dtype=dtype),
                     J=jnp.zeros(batch + (3, 3), dtype=dtype),
                     r_OG=jnp.zeros(batch + (3,), dtype=dtype))


def mass_props_point(m, r_bP_b) -> MassProps:
    """Point mass at position r_bP_b (`dynamics.jl:211-214`)."""
    m = jnp.asarray(m)
    S = skew(r_bP_b)
    J = -bscale(m, _mm(S, S))
    return MassProps(m=m, J=J, r_OG=jnp.asarray(r_bP_b))


def mass_props_rigid(m, J_G_c, t_bc: FrameTransform) -> MassProps:
    """Rigid body with CoM-frame inertia J_G_c placed via t_bc
    (`dynamics.jl:234-254`)."""
    from flightjax.ops.attitude import quat_to_matrix
    m = jnp.asarray(m)
    R = quat_to_matrix(t_bc.q)
    J_G_b = _mm(_mm(R, J_G_c), jnp.swapaxes(R, -1, -2))
    S = skew(t_bc.r)
    J_b_b = J_G_b - bscale(m, _mm(S, S))
    return MassProps(m=m, J=J_b_b, r_OG=t_bc.r)


def _mm(A, B):
    """Small (...,3,3) matmul as broadcast+reduce: Mosaic lowers batched
    dot_general via minor-dim shape casts it does not support inside
    Pallas kernels; the VPU form is equivalent for 3x3."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def translate_mass_props(t_bc: FrameTransform, mp_c: MassProps) -> MassProps:
    """MassProps in frame c → frame b (`dynamics.jl:284-317`)."""
    from flightjax.ops.attitude import quat_to_matrix
    m = mp_c.m
    Sc = skew(mp_c.r_OG)
    J_G_c = mp_c.J + bscale(m, _mm(Sc, Sc))
    R = quat_to_matrix(t_bc.q)
    J_G_b = _mm(_mm(R, J_G_c), jnp.swapaxes(R, -1, -2))
    r_bG_b = t_bc.r + qrot(t_bc.q, mp_c.r_OG)
    Sb = skew(r_bG_b)
    J_b_b = J_G_b - bscale(m, _mm(Sb, Sb))
    return MassProps(m=m, J=J_b_b, r_OG=r_bG_b)


def _mv(M, v):
    """Mat-vec as multiply+reduce: a dot_general with an empty rhs
    non-contracting set hits a Mosaic parser bug inside Pallas kernels,
    and for 3x3 the VPU form is at least as fast."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def solve3(A, b):
    """Closed-form 3x3 solve via the adjugate (Cramer). Batched LU with
    pivoting (`jnp.linalg.solve`) lowers to a sequential loop kernel on TPU;
    the adjugate is a handful of fused elementwise ops."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    b0, b1, b2 = b[..., 0], b[..., 1], b[..., 2]
    x0 = (c00 * b0 + c10 * b1 + c20 * b2) / det
    x1 = (c01 * b0 + c11 * b1 + c21 * b2) / det
    x2 = (c02 * b0 + c12 * b1 + c22 * b2) / det
    return jnp.stack([x0, x1, x2], axis=-1)


class DynamicsU(NamedTuple):
    """Input to the Newton-Euler solver (`dynamics.jl:408-414`)."""
    mp_sum_b: MassProps    # total mass properties, body frame
    wr_sum_b: Wrench       # total external wrench, body frame
    ho_sum_b: jnp.ndarray  # total internal angular momentum, body axes
    q_eb: jnp.ndarray      # body attitude wrt ECEF
    r_eb_e: jnp.ndarray    # ECEF position of body origin


class DynamicsData(NamedTuple):
    """Outputs (`dynamics.jl:416-434`)."""
    wr_sum_c: Wrench
    wr_sum_b: Wrench
    mp_sum_c: MassProps
    mp_sum_b: MassProps
    ho_sum_b: jnp.ndarray
    omega_dot_ec_c: jnp.ndarray
    v_dot_ec_c: jnp.ndarray
    a_ec_c: jnp.ndarray
    a_ic_c: jnp.ndarray
    g_c_c: jnp.ndarray
    G_c_c: jnp.ndarray
    f_c_c: jnp.ndarray      # specific force at CoM
    omega_dot_eb_b: jnp.ndarray
    v_dot_eb_b: jnp.ndarray
    alpha_ib_b: jnp.ndarray
    a_eb_b: jnp.ndarray
    a_ib_b: jnp.ndarray


class VehicleDynamics(Component):
    """Newton-Euler rigid-body dynamics at the CoM (`dynamics.jl:443-525`).
    x = {omega_eb_b (3), v_eb_b (3)} — the same template as the kinematics
    velocity input."""

    def init_x(self, omega_eb_b=None, v_eb_b=None):
        return {"omega_eb_b": jnp.zeros(3) if omega_eb_b is None else jnp.asarray(omega_eb_b),
                "v_eb_b": jnp.zeros(3) if v_eb_b is None else jnp.asarray(v_eb_b)}

    def f_ode(self, x, u: DynamicsU, s, t):
        omega_eb_b = x["omega_eb_b"]
        v_eb_b = x["v_eb_b"]
        mp_sum_b, wr_sum_b, ho_sum_b, q_eb, r_eb_e = u

        omega_ie_e = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, geo.omega_ie]), r_eb_e.shape)
        omega_ie_b = qrot_inv(q_eb, omega_ie_e)

        # frame transform from c (CoM) to b: pure translation by -r_OG
        r_bc_b = mp_sum_b.r_OG
        t_cb = FrameTransform(r=-r_bc_b, q=qidentity(dtype=r_bc_b.dtype,
                                                     batch=r_bc_b.shape[:-1]))

        mp_sum_c = translate_mass_props(t_cb, mp_sum_b)
        wr_sum_c = translate_wrench(t_cb, wr_sum_b)
        ho_sum_c = ho_sum_b

        F_c = wr_sum_c.F
        tau_c = wr_sum_c.tau
        m_sum = mp_sum_c.m
        J_c = mp_sum_c.J

        omega_ec_c = omega_eb_b
        v_ec_c = v_eb_b + jnp.cross(omega_ec_c, r_bc_b)
        omega_ie_c = omega_ie_b
        omega_ic_c = omega_ie_c + omega_ec_c

        # geographic position of the CoM
        r_bc_e = qrot(q_eb, r_bc_b)
        r_ec_e = r_eb_e + r_bc_e
        n_c, h_c = geo.geographic_from_cartesian(r_ec_e)

        # gravity at CoM in CoM axes. The reference goes through an
        # auxiliary local-level frame (q_cl = conj(q_eb) ∘ ltf(n_c), then
        # rotates [0,0,g] — `dynamics.jl:472-480`), but the ltf's down
        # column is EXACTLY -n_c, so the whole ltf construction
        # (2 atan2 + 4 trig + 2 qmul + qrot) collapses to one qrot_inv:
        # g_c_c = g * R(q_eb)^T (-n_c). Same value to roundoff (tighter,
        # actually: no trig round-trip through lat/lon).
        g_mag = geo.gravity(n_c, h_c)
        g_c_c = g_mag[..., None] * qrot_inv(q_eb, -n_c)

        # angular & linear momentum equations at c (`dynamics.jl:491-493`)
        hc = _mv(J_c, omega_ic_c) + ho_sum_c
        rhs = (tau_c
               - _mv(J_c, jnp.cross(omega_ie_c, omega_ec_c))
               - jnp.cross(omega_ic_c, hc))
        omega_dot_ec_c = solve3(J_c, rhs)
        v_dot_ec_c = (F_c / m_sum[..., None] + g_c_c
                      - jnp.cross(omega_ec_c + 2 * omega_ie_c, v_ec_c))

        omega_dot_eb_b = omega_dot_ec_c
        v_dot_eb_b = v_dot_ec_c - jnp.cross(omega_dot_ec_c, r_bc_b)

        # additional outputs (`dynamics.jl:500-513`)
        r_ec_c = qrot_inv(q_eb, r_ec_e)
        r_eb_b = qrot_inv(q_eb, r_eb_e)
        a_ec_c = v_dot_ec_c + jnp.cross(omega_ec_c, v_ec_c)
        a_ic_c = (v_dot_ec_c
                  + jnp.cross(omega_ec_c + 2 * omega_ie_c, v_ec_c)
                  + jnp.cross(omega_ie_c, jnp.cross(omega_ie_c, r_ec_c)))
        G_c_c = g_c_c + jnp.cross(omega_ie_c, jnp.cross(omega_ie_c, r_ec_c))
        f_c_c = a_ic_c - G_c_c

        alpha_ib_b = omega_dot_eb_b - jnp.cross(omega_eb_b, omega_ie_b)
        a_eb_b = v_dot_eb_b + jnp.cross(omega_eb_b, v_eb_b)
        a_ib_b = (v_dot_eb_b
                  + jnp.cross(omega_eb_b + 2 * omega_ie_b, v_eb_b)
                  + jnp.cross(omega_ie_b, jnp.cross(omega_ie_b, r_eb_b)))

        x_dot = {"omega_eb_b": omega_dot_eb_b, "v_eb_b": v_dot_eb_b}
        y = DynamicsData(
            wr_sum_c=wr_sum_c, wr_sum_b=wr_sum_b, mp_sum_c=mp_sum_c,
            mp_sum_b=mp_sum_b, ho_sum_b=ho_sum_b,
            omega_dot_ec_c=omega_dot_ec_c, v_dot_ec_c=v_dot_ec_c,
            a_ec_c=a_ec_c, a_ic_c=a_ic_c, g_c_c=g_c_c, G_c_c=G_c_c,
            f_c_c=f_c_c, omega_dot_eb_b=omega_dot_eb_b, v_dot_eb_b=v_dot_eb_b,
            alpha_ib_b=alpha_ib_b, a_eb_b=a_eb_b, a_ib_b=a_ib_b)
        return x_dot, y
