"""WGS84 geodesy: locations, altitudes, positions, gravity, geoid.

Mirrors the semantics of the reference
(`/root/reference/lib/FlightPhysics/src/geodesy.jl`):
- WGS84 constants (`geodesy.jl:15-35`)
- n-vector / lat-lon 2D locations and conversions (`:45-119`)
- radii of curvature, local tangent frame (wander-azimuth), wander angle
  (`:125-147`)
- altitude datums: Ellipsoidal / Orthometric / Geopotential, related through
  the EGM96 geoid undulation grid (15', 721x1441; `:161-246`)
- geodetic↔ECEF Cartesian, the latter via Fukushima/Halley's closed form
  (`:363-428`)
- Somigliana gravity + 2nd-order altitude correction, NED gravity and
  gravitational attraction (`:451-489`)

Representation conventions (all plain arrays, batched over leading dims):
- 2D location: n-vector `n_e` (..., 3) on the unit sphere (primary), or
  `lat`,`lon` scalars.
- altitude: plain float + the datum tracked by the caller (suffix `_ellip`,
  `_orth`, `_geop` in variable names).
- 3D position: ECEF Cartesian `r (...,3)` or (n_e, h_ellip) pairs.
"""

import jax.numpy as jnp
import numpy as np

from flightjax.ops.quaternions import qmul, qrot_inv
from flightjax.ops.attitude import rot_y, rot_z
from flightjax.ops.interp import Lookup

# WGS84 fundamental constants (SI)
GM = 3.986005e14
a = 6378137.0
f = 1 / 298.257223563
omega_ie = 7.292115e-05  # Earth rotation rate wrt ECI

# derived
b = a * (1 - f)
e2 = 2 * f - f**2
e = float(np.sqrt(e2))
ep2 = e2 / (1 - e2)
a2 = a**2
b2 = b**2
m_g = omega_ie**2 * a**2 * b / GM

# gravity parameters
g_a = 9.7803253359  # normal gravity at equator
g_b = 9.8321849378  # normal gravity at poles
k_g = b * g_b / (a * g_a) - 1  # Somigliana parameter


# ------------------------------------------------------------- 2D locations

def nvector_from_latlon(lat, lon):
    lat = jnp.asarray(lat)
    lon = jnp.asarray(lon)
    cl = jnp.cos(lat)
    return jnp.stack([cl * jnp.cos(lon), cl * jnp.sin(lon), jnp.sin(lat)], axis=-1)


def latlon_from_nvector(n_e):
    lat = jnp.arctan2(n_e[..., 2], jnp.sqrt(n_e[..., 0] ** 2 + n_e[..., 1] ** 2))
    lon = jnp.arctan2(n_e[..., 1], n_e[..., 0])
    return lat, lon


def nvector_from_qew(q_ew):
    """n-vector from an ECEF→wander-azimuth rotation quaternion: minus the
    third column of R_ew (`geodesy.jl:62-69`)."""
    q1, q2, q3, q4 = q_ew[..., 0], q_ew[..., 1], q_ew[..., 2], q_ew[..., 3]
    dq12 = 2 * q1 * q2
    dq13 = 2 * q1 * q3
    dq24 = 2 * q2 * q4
    dq34 = 2 * q3 * q4
    return -jnp.stack([dq24 + dq13, dq34 - dq12, 1 - 2 * (q2 * q2 + q3 * q3)], axis=-1)


def radii(n_e):
    """Meridian (M) and prime-vertical (N) radii of curvature."""
    den = jnp.sqrt(1 - e2 * n_e[..., 2] ** 2)
    M = a * (1 - e2) / den**3
    N = a / den
    return M, N


def ltf(n_e, psi_nw=0.0):
    """ECEF→local-tangent-frame rotation quaternion, wander azimuth psi_nw:
    q_ew = Rz(lon) ∘ Ry(-(lat + π/2)) ∘ Rz(psi_nw) (`geodesy.jl:132-135`).
    psi_nw = 0 gives the NED frame (q_en)."""
    lat, lon = latlon_from_nvector(n_e)
    return qmul(rot_z(lon), qmul(rot_y(-(lat + 0.5 * jnp.pi)), rot_z(psi_nw)))


def get_psi_nw_ab(q_ew):
    """(A, B) with the wander angle psi_nw = atan2(A, B)
    (`geodesy.jl:140-147`). Exposed separately so hot paths can recover
    cos/sin(psi_nw) = (B, A)/hypot algebraically instead of paying
    atan2 + cos + sin per RK4 stage (see `kinematics.WA.f_ode`)."""
    q1, q2, q3, q4 = q_ew[..., 0], q_ew[..., 1], q_ew[..., 2], q_ew[..., 3]
    dq12 = 2 * q1 * q2
    dq13 = 2 * q1 * q3
    dq24 = 2 * q2 * q4
    dq34 = 2 * q3 * q4
    return -(dq34 + dq12), dq24 - dq13


def get_psi_nw(q_ew):
    """Wander angle from ECEF→wander-azimuth quaternion (`geodesy.jl:140-147`)."""
    A, B = get_psi_nw_ab(q_ew)
    return jnp.arctan2(A, B)


# ------------------------------------------------------------- geoid (EGM96)

_egm96_lookup = None


def egm96_lookup():
    """EGM96 geoid undulation interpolator over (lat ∈ [-π/2,π/2],
    lon ∈ [0,2π]), 15-arcmin grid, linear extrapolation at the boundary
    (matches `geodesy.jl:186-196`). Loaded once from packaged data
    (public NGA WW15MGH grid)."""
    global _egm96_lookup
    if _egm96_lookup is None:
        import os
        import jax
        path = os.path.join(os.path.dirname(__file__), "..", "data", "egm96_ww15mgh.npz")
        data = np.load(path)["geoid_height"].astype(np.float64)
        lat_ax = np.linspace(-np.pi / 2, np.pi / 2, data.shape[0])
        lon_ax = np.linspace(0.0, 2 * np.pi, data.shape[1])
        # must materialize concrete arrays even if first touched inside a jit
        # trace, or the cached Lookup would capture leaked tracers
        with jax.ensure_compile_time_eval():
            # rowgather: contiguous row DMA + hat reduce instead of
            # per-element gathers (the hottest op of the whole vehicle step
            # on TPU). Queries are always in-range (lat in [-pi/2, pi/2],
            # lon wrapped), where 'flat' == the reference's Line().
            _egm96_lookup = Lookup((lat_ax, lon_ax), data, extrap="flat",
                                   rowgather=True)
    return _egm96_lookup


def geoid_height(n_e):
    """EGM96 geoid undulation (m) above the WGS84 ellipsoid at a 2D location."""
    lat, lon = latlon_from_nvector(n_e)
    lon = jnp.mod(lon + 2 * jnp.pi, 2 * jnp.pi)
    return egm96_lookup()(lat, lon)


# altitude datum conversions (`geodesy.jl:232-246`)

def ellip_from_orth(h_orth, n_e):
    return h_orth + geoid_height(n_e)


def orth_from_ellip(h_ellip, n_e):
    return h_ellip - geoid_height(n_e)


def geop_from_orth(h_orth):
    return h_orth * a / (a + h_orth)


def orth_from_geop(h_geop):
    return h_geop * a / (a - h_geop)


def geop_from_ellip(h_ellip, n_e):
    return geop_from_orth(orth_from_ellip(h_ellip, n_e))


def ellip_from_geop(h_geop, n_e):
    return ellip_from_orth(orth_from_geop(h_geop), n_e)


# ------------------------------------------------------------- 3D positions

def cartesian_from_geographic(n_e, h_ellip):
    """ECEF position vector from (n-vector, ellipsoidal altitude)
    (`geodesy.jl:418-428`)."""
    _, N = radii(n_e)
    h = jnp.asarray(h_ellip)
    return jnp.stack([
        (N + h) * n_e[..., 0],
        (N + h) * n_e[..., 1],
        (N * (1 - e2) + h) * n_e[..., 2],
    ], axis=-1)


def geographic_from_cartesian(r_e):
    """(n-vector, ellipsoidal altitude) from ECEF position, via Fukushima's
    closed form accelerated by Halley's method (`geodesy.jl:367-412`).
    Branch-free (`jnp.where` on the |lat|≷π/4 and polar-axis cases).

    Works in units of the semi-major axis so intermediate powers stay O(1):
    the raw formulation overflows float32 (a0³ ~ 1e21), and this path must
    survive the f32 fast path on TPU."""
    inv_a = 1.0 / a
    x, y, z = r_e[..., 0] * inv_a, r_e[..., 1] * inv_a, r_e[..., 2] * inv_a
    p = jnp.sqrt(x * x + y * y)

    c = e2  # = a * e2, in units of a
    ec2 = 1 - e2
    ec = jnp.sqrt(ec2)
    zc = ec * jnp.abs(z)

    s0 = jnp.abs(z)
    c0 = ec * p
    a0 = jnp.sqrt(s0 * s0 + c0 * c0)
    a03 = a0**3
    b0 = 1.5 * c * s0 * c0 * ((p * s0 - zc * c0) * a0 - c * s0 * c0)
    s1 = (zc * a03 + c * s0**3) * a03 - b0 * s0
    c1 = (p * a03 - c * c0**3) * a03 - b0 * c0

    cc = ec * c1
    s1sq = s1 * s1
    ccsq = cc * cc
    h = a * (p * cc + s0 * s1 - jnp.sqrt(ec2 * s1sq + ccsq)) / jnp.sqrt(s1sq + ccsq)

    # |lat| < π/4 branch
    safe_cc = jnp.where(cc != 0, cc, 1.0)
    abs_tan = s1 / safe_cc
    cos_lo = 1.0 / jnp.sqrt(1 + abs_tan * abs_tan)
    sin_lo = abs_tan * cos_lo * jnp.sign(z)
    # |lat| > π/4 branch
    safe_s1 = jnp.where(s1 != 0, s1, 1.0)
    abs_cot = cc / safe_s1
    abs_sin_hi = 1.0 / jnp.sqrt(1 + abs_cot * abs_cot)
    cos_hi = abs_cot * abs_sin_hi
    sin_hi = abs_sin_hi * jnp.sign(z)

    lo = s1 < cc
    cos_lat = jnp.where(lo, cos_lo, cos_hi)
    sin_lat = jnp.where(lo, sin_lo, sin_hi)

    pos = p > 0
    cos_lon = jnp.where(pos, x / jnp.where(pos, p, 1.0), 1.0)
    sin_lon = jnp.where(pos, y / jnp.where(pos, p, 1.0), 0.0)

    n_e = jnp.stack([cos_lat * cos_lon, cos_lat * sin_lon, sin_lat], axis=-1)
    return n_e, h


# ------------------------------------------------------------- gravity

def gravity(n_e, h_ellip):
    """Normal gravity magnitude: Somigliana + 2nd order altitude correction
    (`geodesy.jl:451-467`)."""
    h = jnp.asarray(h_ellip)
    sin2 = n_e[..., 2] ** 2
    g0 = g_a * (1 + k_g * sin2) / jnp.sqrt(1 - e2 * sin2)
    return g0 * (1 - 2 / a * (1 + f + m_g - 2 * f * sin2) * h + 3 / a2 * h * h)


def g_n(n_e, h_ellip):
    """Gravity vector in NED."""
    g = gravity(n_e, h_ellip)
    zero = jnp.zeros_like(g)
    return jnp.stack([zero, zero, g], axis=-1)


def G_n(n_e, h_ellip):
    """Gravitational attraction in NED = gravity + centrifugal term removal
    (`geodesy.jl:481-489`)."""
    q_en = ltf(n_e)
    r_e = cartesian_from_geographic(n_e, h_ellip)
    w = jnp.broadcast_to(jnp.asarray([0.0, 0.0, omega_ie]), r_e.shape)
    cent = jnp.cross(w, jnp.cross(w, r_e))
    return g_n(n_e, h_ellip) + qrot_inv(q_en, cent)
