"""Propeller: offline blade-element/momentum coefficient generation + runtime
table-interpolated aerodynamic wrench.

Mirrors `/root/reference/lib/FlightPhysics/src/propellers.jl`:
- `DefaultAirfoil` compressible cL/cD/cL_alpha with transonic blending
  (`propellers.jl:44-94`)
- parametric `Blade` (hub ratio, elliptic chord, constant pitch distribution,
  `:96-107`)
- per-(J, Mt, dbeta) radial integration with induced-angle root solve and
  trapezoidal integration -> {C_Fx, C_Mx, C_Fz_alpha, C_Mz_alpha, C_P, eta_p}
  (`:131-207`) — offline, in numpy/scipy (design-time, like the reference's
  table generation), cached to .npz
- 3-D lookup with linear interpolation + flat extrapolation (`:215-325`),
  here a single fused table with trailing coefficient axis (one gather pass
  for all six coefficients)
- runtime `Propeller` component: advance ratio, tip Mach, y/z symmetry for
  sideforce, CW/CCW sign handling, dimensionalization rho f^2 d^4/d^5
  (`:405-452`).
"""

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component
from flightjax.ops.interp import Lookup
from flightjax.ops.quaternions import qrot, qrot_inv
from flightjax.physics.dynamics import Wrench, FrameTransform, translate_wrench
from flightjax.physics.atmosphere import get_airflow_angles

CW, CCW = 1, -1

COEF_NAMES = ("C_Fx", "C_Mx", "C_Fz_alpha", "C_Mz_alpha", "C_P", "eta_p")


# ----------------------------------------------------- airfoil (offline, np)

ALPHA_0 = np.deg2rad(-2.1)


def _cL_inc(alpha, sub):
    # subsonic / supersonic incompressible shapes (`propellers.jl:50-58`)
    if sub:
        return 2 * np.pi * alpha if alpha < 0.25 else \
            np.pi / 2 * np.cos(alpha) / np.cos(0.25)
    return 4 * alpha if alpha < 0.25 else np.cos(alpha) / np.cos(0.25)


def airfoil_cL(alpha, M=0.0):
    if M <= 0.8:
        return _cL_inc(alpha, True) / np.sqrt(1 - M**2)
    if M >= 1.2:
        return _cL_inc(alpha, False) / np.sqrt(M**2 - 1)
    c08, c12 = airfoil_cL(alpha, 0.8), airfoil_cL(alpha, 1.2)
    return c08 + (c12 - c08) / 0.4 * (M - 0.8)


def airfoil_cL_alpha(alpha, M=0.0):
    def inc(sub):
        if sub:
            return 2 * np.pi if alpha < 0.25 else \
                -np.pi / 2 * np.sin(alpha) / np.cos(0.25)
        return 4.0 if alpha < 0.25 else -np.sin(alpha) / np.cos(0.25)
    if M <= 0.8:
        return inc(True) / np.sqrt(1 - M**2)
    if M >= 1.2:
        return inc(False) / np.sqrt(M**2 - 1)
    c08, c12 = airfoil_cL_alpha(alpha, 0.8), airfoil_cL_alpha(alpha, 1.2)
    return c08 + (c12 - c08) / 0.4 * (M - 0.8)


def airfoil_cD(alpha, M=0.0):
    if alpha < 0.25:
        cD_inc = 0.006 + 0.224 * alpha**2
    elif alpha < 0.3:
        cD_inc = -1.0234 + 16.6944 * alpha**2
    else:
        cD_inc = np.pi / 2 * np.sin(alpha) / np.cos(0.25)
    if M <= 0.8:
        k = 1.0
    elif M <= 0.95:
        k = 1.0 + 160000 * (M - 0.8)**4 / 27
    elif M <= 1.0:
        k = 6.0 - 800 * (1 - M)**2
    else:
        k = 6 - 5 * (M - 1)
    return k * cD_inc


# ------------------------------------------------------------ blade (config)

class Blade(NamedTuple):
    zeta_h: float = 0.2        # hub/diameter ratio
    chord_a: float = 0.075     # elliptic chord-to-diameter amplitude
    pitch_p: float = 0.8       # constant chord-line-pitch/diameter ratio


def blade_chord(b: Blade, zeta):
    return b.chord_a * np.sqrt(1 - zeta**2)


def blade_beta_a(b: Blade, zeta, dbeta):
    """Aerodynamic pitch angle (zero-lift-line referenced),
    `propellers.jl:104-107`."""
    return np.arctan(b.pitch_p / (np.pi * zeta)) + dbeta - ALPHA_0


def _m_section(J, Mt, zeta, eps_i):
    return Mt * np.sqrt((np.pi**2 * zeta**2 + J**2) /
                        (np.pi**2 + J**2)) * np.cos(eps_i)


def blade_coefficients(n_blades, blade: Blade, J, Mt, dbeta, n_zeta=101):
    """One (J, Mt, dbeta) point of the BEM integration
    (`propellers.jl:131-196`). CW sense assumed."""
    from scipy.optimize import brentq

    zetas = np.linspace(blade.zeta_h, 1.0, n_zeta)
    beta_a_t = blade_beta_a(blade, 1.0, dbeta)
    F_tip = lambda zeta: np.arccos(np.clip(
        np.exp(-n_blades * (1 - zeta) / (2 * np.sin(beta_a_t))), -1.0, 1.0))

    dC = np.zeros((n_zeta, 4))
    eps_i_prev = 1.0

    for i, zeta in enumerate(zetas):
        eps_inf = np.arctan(J / (np.pi * zeta))
        beta_a = blade_beta_a(blade, zeta, dbeta)
        c_tilde = blade_chord(blade, zeta)
        kc = n_blades * c_tilde

        def f(eps_i):
            alpha = beta_a - eps_inf - eps_i
            M = _m_section(J, Mt, zeta, eps_i)
            return (kc / (8 * zeta) * airfoil_cL(alpha, M)
                    - F_tip(zeta) * np.tan(eps_i) * np.sin(eps_inf + eps_i))

        # secant from the previous radial solution, bracketed fallback
        try:
            from scipy.optimize import newton
            eps_i = newton(f, eps_i_prev, tol=1e-12, maxiter=100)
        except RuntimeError:
            eps_i = brentq(f, -0.5, 1.5, xtol=1e-12)
        eps_i_prev = eps_i

        eps = eps_inf + eps_i
        alpha = beta_a - eps
        M = _m_section(J, Mt, zeta, eps_i)
        cL = airfoil_cL(alpha, M)
        cD = airfoil_cD(alpha, M)
        cLa = airfoil_cL_alpha(alpha, M)

        z2, z3 = zeta**2, zeta**3
        ce, se = np.cos(eps), np.sin(eps)
        c2i = np.cos(eps_i)**2
        c2inf = np.cos(eps_inf)**2
        tinf = np.tan(eps_inf)

        dC[i, 0] = np.pi**2 / 4 * z2 * kc * c2i / c2inf * (cL * ce - cD * se)
        dC[i, 1] = -np.pi**2 / 8 * z3 * kc * c2i / c2inf * (cD * ce + cL * se)
        dC[i, 2] = -np.pi**2 / 8 * z2 * kc * c2i * (
            2 * tinf * (cD * ce + cL * se)
            - tinf**2 * (cL * ce - (cLa + cD) * se))
        dC[i, 3] = -np.pi**2 / 16 * z3 * kc * c2i * (
            2 * tinf * (cL * ce - cD * se)
            + tinf**2 * ((cLa + cD) * ce + cL * se))

    C_Fx, C_Mx, C_Fz_a, C_Mz_a = np.trapezoid(dC, zetas, axis=0)
    C_P = 2 * np.pi * C_Mx
    eta_p = -J * C_Fx / C_P if C_Fx > 0 else 0.0
    return np.array([C_Fx, C_Mx, C_Fz_a, C_Mz_a, C_P, eta_p])


def generate_lookup(n_blades=2, blade: Blade = Blade(),
                    J_range=(0.0, 1.5, 21), Mt_range=(0.0, 1.5, 21),
                    dbeta_range=(0.0, 0.0, 1), n_zeta=101, cache=None):
    """Build (or load from `cache`) the fused (J, Mt, dbeta, 6) coefficient
    table and return a flightjax Lookup (flat extrapolation,
    `propellers.jl:235-276`)."""
    J_ax = np.linspace(*J_range)
    Mt_ax = np.linspace(*Mt_range)
    db_ax = np.linspace(*dbeta_range)

    if cache is not None and os.path.exists(cache):
        with np.load(cache) as z:
            if (np.array_equal(z["J"], J_ax) and np.array_equal(z["Mt"], Mt_ax)
                    and np.array_equal(z["dbeta"], db_ax)):
                return Lookup((z["J"], z["Mt"], z["dbeta"]), z["values"],
                              extrap="flat")

    values = np.zeros((len(J_ax), len(Mt_ax), len(db_ax), 6))
    for i, J in enumerate(J_ax):
        for j, Mt in enumerate(Mt_ax):
            for k, db in enumerate(db_ax):
                values[i, j, k] = blade_coefficients(
                    n_blades, blade, J, Mt, db, n_zeta)

    if cache is not None:
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez_compressed(cache, J=J_ax, Mt=Mt_ax, dbeta=db_ax,
                            values=values)
    return Lookup((J_ax, Mt_ax, db_ax), values, extrap="flat")


# --------------------------------------------------------- runtime component

class PropellerY(NamedTuple):
    v_wOp_p: jnp.ndarray
    omega: jnp.ndarray
    J: jnp.ndarray
    Mt: jnp.ndarray
    dbeta: jnp.ndarray
    wr_p: Wrench
    wr_b: Wrench
    hr_p: jnp.ndarray
    hr_b: jnp.ndarray
    P: jnp.ndarray
    eta_p: jnp.ndarray


class Propeller(Component):
    """Table-interpolated propeller (`propellers.jl:354-456`).

    pitch: ("fixed", dbeta) or ("variable", lo, hi) — variable pitch maps a
    [0,1] input onto [lo, hi] (`:392-400`).
    """

    def __init__(self, lookup: Lookup, pitch=("fixed", 0.0), sense=CW,
                 d=2.0, J_xx=0.3, r_bp=(0.0, 0.0, 0.0), q_bp=None):
        self.lookup = lookup
        self.pitch = pitch
        self.sense = int(sense)
        self.d = float(d)
        self.J_xx = float(J_xx)
        self.r_bp = np.asarray(r_bp, dtype=float)
        self.q_bp = (np.array([1.0, 0, 0, 0]) if q_bp is None
                     else np.asarray(q_bp, dtype=float))

    def init_u(self):
        if self.pitch[0] == "variable":
            return {"pitch": jnp.asarray(0.0)}
        return {}

    def get_dbeta(self, u):
        if self.pitch[0] == "fixed":
            return jnp.asarray(self.pitch[1])
        lo, hi = self.pitch[1], self.pitch[2]
        return lo + (hi - lo) * jnp.clip(u["pitch"], 0.0, 1.0)

    def output(self, u, kin, air, omega) -> PropellerY:
        """Aerodynamic wrench + angular momentum (`propellers.jl:405-452`).
        `omega` is the propeller angular rate (signed by sense)."""
        d, sense = self.d, self.sense
        q_bp, r_bp = jnp.asarray(self.q_bp), jnp.asarray(self.r_bp)

        v_wOp_b = air.v_wb_b + jnp.cross(kin.omega_eb_b, r_bp)
        v_wOp_p = qrot_inv(q_bp, v_wOp_b)

        v_J = jnp.sqrt(jnp.sum(v_wOp_p**2) + 1e-12)
        omega_J = jnp.maximum(jnp.abs(omega), 1.0)  # `:417-419`
        J = 2 * jnp.pi * v_J / (omega_J * d)
        Mt = jnp.abs(omega) * (d / 2) / air.a

        dbeta = self.get_dbeta(u)
        C = self.lookup(J, Mt, dbeta)  # (6,) fused gather
        C_Fx, C_Mx, C_Fz_a, C_Mz_a, C_P, eta_p = (C[..., i] for i in range(6))

        alpha_p, beta_p = get_airflow_angles(v_wOp_p)

        C_F = jnp.stack([C_Fx, C_Fz_a * beta_p, C_Fz_a * alpha_p])
        C_M = sense * jnp.stack([C_Mx, C_Mz_a * beta_p, C_Mz_a * alpha_p])

        rho = air.rho
        f = omega / (2 * jnp.pi)
        f2 = f * f
        d4 = d**4
        d5 = d * d4

        F_Op_p = rho * f2 * d4 * C_F
        tau_Op_p = rho * f2 * d5 * C_M
        P = rho * jnp.abs(f * f2) * d5 * C_P

        wr_p = Wrench(F=F_Op_p, tau=tau_Op_p)
        t_bp = FrameTransform(r=r_bp, q=q_bp)
        wr_b = translate_wrench(t_bp, wr_p)

        hr_p = jnp.stack([self.J_xx * omega, jnp.zeros_like(omega),
                          jnp.zeros_like(omega)])
        hr_b = qrot(q_bp, hr_p)

        return PropellerY(v_wOp_p=v_wOp_p, omega=omega, J=J, Mt=Mt,
                          dbeta=dbeta, wr_p=wr_p, wr_b=wr_b, hr_p=hr_p,
                          hr_b=hr_b, P=P, eta_p=eta_p)
