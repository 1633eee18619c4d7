"""Strap-down kinematic mechanizations (WA, ECEF, NED).

Mirrors `/root/reference/lib/FlightPhysics/src/kinematics.jl`:
- `KinInit` initializer (`kinematics.jl:22-40`)
- `KinData` 16-field kinematic snapshot (`:46-91`)
- WA (wander-azimuth, singularity-free; `:150-242`), ECEF (`:250-320`),
  NED (Euler + lat/lon, has singularities, used for linearization; `:329-425`)
- quaternion renormalization with tolerance gate in `f_step` (`:114-118,
  226-229`) — branch-free here
- transport rates `get_omega_ew_n` / `get_omega_en_n` (`:232-242,414-425`)

All three mechanizations share the velocity input u = {omega_eb_b, v_eb_b},
fed from the dynamics continuous state by the vehicle composite.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flightjax.core.modeling import Component, bwhere
from flightjax.ops import geodesy as geo
from flightjax.ops import attitude as att
from flightjax.ops.quaternions import (qmul, qconj, qrot, qrot_inv, qdt,
                                       qnormalize, qmul_zpre, qmul_zpost,
                                       rot2_z)

V_MIN_CHI_GAMMA = 0.1  # minimum ground speed for valid course/FPA


class KinData(NamedTuple):
    """Kinematic output snapshot (all reference-frame conventions as in
    `kinematics.jl:46-63`)."""
    e_nb: jnp.ndarray      # (3,) Euler ZYX [psi, theta, phi], body wrt NED
    q_nb: jnp.ndarray      # (4,) body attitude wrt NED
    q_eb: jnp.ndarray      # (4,) body attitude wrt ECEF
    q_en: jnp.ndarray      # (4,) NED attitude wrt ECEF
    lat: jnp.ndarray
    lon: jnp.ndarray
    n_e: jnp.ndarray       # (3,) n-vector
    h_e: jnp.ndarray       # ellipsoidal altitude
    h_o: jnp.ndarray       # orthometric altitude
    r_eb_e: jnp.ndarray    # (3,) ECEF Cartesian position
    omega_wb_b: jnp.ndarray  # (3,) angular velocity wrt local-level frame
    omega_eb_b: jnp.ndarray  # (3,) angular velocity wrt ECEF
    v_eb_b: jnp.ndarray    # (3,) ECEF-relative velocity, body axes
    v_eb_n: jnp.ndarray    # (3,) ECEF-relative velocity, NED axes
    v_gnd: jnp.ndarray     # ground speed
    chi_gnd: jnp.ndarray   # course angle
    gamma_gnd: jnp.ndarray  # flight path angle


class KinInit(NamedTuple):
    """User-friendly initial conditions (`kinematics.jl:22-40`)."""
    q_nb: jnp.ndarray       # (4,) attitude wrt NED
    n_e: jnp.ndarray        # (3,) 2D location n-vector
    h_e: jnp.ndarray        # ellipsoidal altitude
    omega_wb_b: jnp.ndarray  # (3,) angular velocity wrt local-level frame
    v_eb_n: jnp.ndarray     # (3,) ECEF-relative velocity, NED axes


def kin_init(q_nb=None, lat=0.0, lon=0.0, h=0.0, h_datum="ellipsoidal",
             omega_wb_b=None, v_eb_n=None, euler=None):
    """Build a KinInit from convenient arguments. `h_datum` may be
    'ellipsoidal' or 'orthometric'."""
    n_e = geo.nvector_from_latlon(jnp.asarray(lat), jnp.asarray(lon))
    h = jnp.asarray(h)
    if h_datum == "orthometric":
        h_e = geo.ellip_from_orth(h, n_e)
    else:
        h_e = h
    if q_nb is None:
        if euler is not None:
            q_nb = att.euler_to_quat(jnp.asarray(euler))
        else:
            q_nb = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    omega_wb_b = (jnp.zeros(3) if omega_wb_b is None
                  else jnp.asarray(omega_wb_b))
    v_eb_n = jnp.zeros(3) if v_eb_n is None else jnp.asarray(v_eb_n)
    return KinInit(q_nb=q_nb, n_e=n_e, h_e=h_e, omega_wb_b=omega_wb_b,
                   v_eb_n=v_eb_n)


def get_omega_ew_n(v_eb_n, n_e, h_e):
    """Transport rate of the wander-azimuth/local-level frame wrt ECEF in NED
    axes (`kinematics.jl:232-242`)."""
    R_N, R_E = geo.radii(n_e)
    return jnp.stack([
        v_eb_n[..., 1] / (R_E + h_e),
        -v_eb_n[..., 0] / (R_N + h_e),
        jnp.zeros_like(h_e)], axis=-1)


def get_omega_en_n(v_eb_n, n_e, h_e):
    """NED-frame transport rate incl. vertical component
    (`kinematics.jl:414-425`)."""
    R_N, R_E = geo.radii(n_e)
    lat, _ = geo.latlon_from_nvector(n_e)
    return jnp.stack([
        v_eb_n[..., 1] / (R_E + h_e),
        -v_eb_n[..., 0] / (R_N + h_e),
        -v_eb_n[..., 1] * jnp.tan(lat) / (R_E + h_e)], axis=-1)


def _course_gamma(v_eb_n):
    v_gnd = jnp.linalg.norm(v_eb_n, axis=-1)
    valid = v_gnd > V_MIN_CHI_GAMMA
    chi = jnp.where(valid, att.azimuth(v_eb_n), 0.0)
    gamma = jnp.where(valid, att.inclination(v_eb_n), 0.0)
    return v_gnd, chi, gamma


def _kin_data_common(q_nb, q_en, q_eb, n_e, h_e, omega_wb_b, omega_eb_b,
                     v_eb_b, v_eb_n, gate_chi=True, geoid_N=None):
    """`geoid_N`: optionally supply the geoid undulation (m) instead of
    looking it up — the EGM96 gather is the hottest op of a vehicle step on
    TPU, and N changes by ~1e-5 m per integration step of flight, so the
    Vehicle carries it in its discrete state and refreshes it once per step
    (the reference re-interpolates every stage, `geodesy.jl:232-246`)."""
    lat, lon = geo.latlon_from_nvector(n_e)
    h_o = (h_e - geoid_N) if geoid_N is not None \
        else geo.orth_from_ellip(h_e, n_e)
    r_eb_e = geo.cartesian_from_geographic(n_e, h_e)
    if gate_chi:
        v_gnd, chi, gamma = _course_gamma(v_eb_n)
    else:
        v_gnd = jnp.linalg.norm(v_eb_n, axis=-1)
        chi, gamma = att.azimuth(v_eb_n), att.inclination(v_eb_n)
    return KinData(
        e_nb=att.quat_to_euler(q_nb), q_nb=q_nb, q_eb=q_eb, q_en=q_en,
        lat=lat, lon=lon, n_e=n_e, h_e=h_e, h_o=h_o, r_eb_e=r_eb_e,
        omega_wb_b=omega_wb_b, omega_eb_b=omega_eb_b, v_eb_b=v_eb_b,
        v_eb_n=v_eb_n, v_gnd=v_gnd, chi_gnd=chi, gamma_gnd=gamma)


def kin_data_from_init(ic: KinInit) -> KinData:
    """KinData at an initial condition (`kinematics.jl:65-91`)."""
    q_en = geo.ltf(ic.n_e)
    q_eb = qmul(q_en, ic.q_nb)
    omega_ew_n = get_omega_ew_n(ic.v_eb_n, ic.n_e, ic.h_e)
    omega_ew_b = qrot_inv(ic.q_nb, omega_ew_n)
    omega_eb_b = omega_ew_b + ic.omega_wb_b
    v_eb_b = qrot_inv(ic.q_nb, ic.v_eb_n)
    return _kin_data_common(ic.q_nb, q_en, q_eb, ic.n_e, ic.h_e,
                            ic.omega_wb_b, omega_eb_b, v_eb_b, ic.v_eb_n)


def _normalize_block(x, eps=None):
    """Renormalize only when drifted beyond eps (`kinematics.jl:114-118`),
    branch-free. The default eps is dtype-aware: the reference's 1e-8 in
    f64; 32 ulp (~3.8e-6) in f32, where the norm MEASUREMENT itself is only
    ~ulp-accurate — a 1e-8 gate would fire every step on measurement noise,
    and each spurious x/n rounds the state by ±ulp, defeating the
    compensated position accumulation (`core.sim.comp_add`). True norm
    drift of the quaternion/n-vector ODEs is orders of magnitude below
    either gate over any realistic flight."""
    if eps is None:
        eps = 32 * jnp.finfo(jnp.asarray(x).dtype).eps
        eps = max(float(eps), 1e-8)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return bwhere(jnp.abs(n - 1.0)[..., 0] > eps, x / n, x)


def vel_input(omega_eb_b, v_eb_b):
    return {"omega_eb_b": omega_eb_b, "v_eb_b": v_eb_b}


class WA(Component):
    """Wander-azimuth mechanization: x = {q_wb (4), q_ew (4), h_e}.
    Singularity-free; the simulation default (`kinematics.jl:150-229`)."""

    def init_x(self, ic: KinInit = None):
        if ic is None:
            ic = kin_init()
        # wander angle initialized to 0 => q_wb = q_nb, q_ew = q_en
        return {"q_wb": ic.q_nb, "q_ew": geo.ltf(ic.n_e), "h_e": ic.h_e}

    def init_u(self, ic: KinInit = None):
        if ic is None:
            ic = kin_init()
        kd = kin_data_from_init(ic)
        return vel_input(kd.omega_eb_b, kd.v_eb_b)

    def f_ode(self, x, u, s, t):
        q_wb, q_ew, h_e = x["q_wb"], x["q_ew"], x["h_e"]
        omega_eb_b, v_eb_b = u["omega_eb_b"], u["v_eb_b"]

        # Wander-angle rotation WITHOUT transcendentals: psi_nw = atan2(A,B),
        # so (cos, sin) psi_nw = (B, A)/hypot and the half-angle pair follows
        # from sqrt identities (`att.half_angle_cs`). This replaces
        # atan2 + cos + sin + two general qmuls per RK4 stage — the single
        # hottest chain of the TPU fleet step (tools/profile_fleet.py).
        A, B = geo.get_psi_nw_ab(q_ew)
        n2 = A * A + B * B
        ok = n2 > 0
        hinv = jax.lax.rsqrt(jnp.maximum(n2, 1e-30))
        cpsi = jnp.where(ok, B * hinv, 1.0)   # atan2(0, 0) := 0
        spsi = jnp.where(ok, A * hinv, 0.0)
        c2, s2 = att.half_angle_cs(cpsi, spsi)

        q_nb = qmul_zpre(c2, s2, q_wb)        # = qmul(rot_z(psi_nw), q_wb)
        q_eb = qmul(q_ew, q_wb)
        # q_en = q_eb ∘ conj(q_nb) = q_ew ∘ conj(q_nw) for unit q_wb
        q_en = qmul_zpost(q_ew, c2, -s2)

        n_e = geo.nvector_from_qew(q_ew)
        v_eb_n = qrot(q_nb, v_eb_b)
        omega_ew_n = get_omega_ew_n(v_eb_n, n_e, h_e)
        omega_ew_w = rot2_z(cpsi, -spsi, omega_ew_n)   # = qrot_inv(q_nw, ·)
        omega_ew_b = qrot_inv(q_wb, omega_ew_w)
        omega_wb_b = omega_eb_b - omega_ew_b

        x_dot = {
            "q_wb": qdt(q_wb, omega_wb_b),
            "q_ew": qdt(q_ew, omega_ew_w),
            "h_e": -v_eb_n[..., 2],
        }
        y = _kin_data_common(q_nb, q_en, q_eb, n_e, h_e, omega_wb_b,
                             omega_eb_b, v_eb_b, v_eb_n, geoid_N=s)
        return x_dot, y

    def f_step(self, x, u, s, t):
        x = dict(x)
        x["q_wb"] = _normalize_block(x["q_wb"])
        x["q_ew"] = _normalize_block(x["q_ew"])
        return x, s


class ECEF(Component):
    """ECEF mechanization: x = {q_eb (4), n_e (3), h_e}
    (`kinematics.jl:250-320`)."""

    def init_x(self, ic: KinInit = None):
        if ic is None:
            ic = kin_init()
        q_en = geo.ltf(ic.n_e)
        return {"q_eb": qmul(q_en, ic.q_nb), "n_e": ic.n_e, "h_e": ic.h_e}

    init_u = WA.init_u

    def f_ode(self, x, u, s, t):
        q_eb, n_e, h_e = x["q_eb"], x["n_e"], x["h_e"]
        omega_eb_b, v_eb_b = u["omega_eb_b"], u["v_eb_b"]

        q_en = geo.ltf(n_e)
        q_nb = qmul(qconj(q_en), q_eb)

        v_eb_n = qrot(q_nb, v_eb_b)
        omega_ew_n = get_omega_ew_n(v_eb_n, n_e, h_e)
        omega_ew_b = qrot_inv(q_nb, omega_ew_n)
        omega_wb_b = omega_eb_b - omega_ew_b

        down = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), omega_ew_n.shape)
        x_dot = {
            "q_eb": qdt(q_eb, omega_eb_b),
            "n_e": qrot(q_en, jnp.cross(omega_ew_n, down)),
            "h_e": -v_eb_n[..., 2],
        }
        y = _kin_data_common(q_nb, q_en, q_eb, n_e, h_e, omega_wb_b,
                             omega_eb_b, v_eb_b, v_eb_n, geoid_N=s)
        return x_dot, y

    def f_step(self, x, u, s, t):
        x = dict(x)
        x["q_eb"] = _normalize_block(x["q_eb"])
        x["n_e"] = _normalize_block(x["n_e"])
        return x, s


class NED(Component):
    """NED/Euler mechanization: x = {psi, theta, phi, lat, lon, h_e}. Not
    singularity-free; used for control design & linearization
    (`kinematics.jl:329-411`). No course/FPA gating (`:392-394`)."""

    def init_x(self, ic: KinInit = None):
        if ic is None:
            ic = kin_init()
        e_nb = att.quat_to_euler(ic.q_nb)
        lat, lon = geo.latlon_from_nvector(ic.n_e)
        return {"psi": e_nb[..., 0], "theta": e_nb[..., 1], "phi": e_nb[..., 2],
                "lat": lat, "lon": lon, "h_e": ic.h_e}

    init_u = WA.init_u

    def f_ode(self, x, u, s, t):
        e_nb = jnp.stack([x["psi"], x["theta"], x["phi"]], axis=-1)
        lat, lon, h_e = x["lat"], x["lon"], x["h_e"]
        omega_eb_b, v_eb_b = u["omega_eb_b"], u["v_eb_b"]

        n_e = geo.nvector_from_latlon(lat, lon)
        q_nb = att.euler_to_quat(e_nb)
        q_en = geo.ltf(n_e)
        q_eb = qmul(q_en, q_nb)

        v_eb_n = qrot(q_nb, v_eb_b)
        omega_en_n = get_omega_en_n(v_eb_n, n_e, h_e)
        omega_en_b = qrot_inv(q_nb, omega_en_n)
        omega_nb_b = omega_eb_b - omega_en_b

        omega_ew_n = get_omega_ew_n(v_eb_n, n_e, h_e)
        omega_ew_b = qrot_inv(q_nb, omega_ew_n)
        omega_wb_b = omega_eb_b - omega_ew_b

        e_dot = att.euler_dt(e_nb, omega_nb_b)
        # dt(LatLon, omega_en_n): lat_dot = -w2, lon_dot = w1/cos(lat)
        # (`geodesy.jl:114-119`)
        x_dot = {
            "psi": e_dot[..., 0], "theta": e_dot[..., 1], "phi": e_dot[..., 2],
            "lat": -omega_en_n[..., 1],
            "lon": omega_en_n[..., 0] / jnp.cos(lat),
            "h_e": -v_eb_n[..., 2],
        }
        y = _kin_data_common(q_nb, q_en, q_eb, n_e, h_e, omega_wb_b,
                             omega_eb_b, v_eb_b, v_eb_n, gate_chi=False,
                             geoid_N=s)
        return x_dot, y
