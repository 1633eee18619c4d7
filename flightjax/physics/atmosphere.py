"""ISA atmosphere, wind models, and airflow data.

Mirrors `/root/reference/lib/FlightPhysics/src/atmosphere.jl`:
- gas constants and standard conditions (`atmosphere.jl:22-30`)
- 7-layer ISA temperature/pressure propagation (`:99-135`) — branch-free:
  the layer walk unrolls statically with clipped segment lengths, yielding
  exactly the reference's values inside the table and its downward
  extrapolation below sea level
- sea-level condition models (standard/tunable, `:56-95`) and wind models
  (none/tunable, `:151-181`)
- `AtmosphericData` and the full `AirData` set: TAS/EAS/CAS, Mach,
  total/impact/dynamic pressure (`:186-242`)
- airflow-angle utilities and stability/wind axes (`:320-356`)
"""

from typing import NamedTuple

import jax.numpy as jnp

from flightjax.core.modeling import Component
from flightjax.ops import geodesy as geo
from flightjax.ops.attitude import rot_y, rot_z
from flightjax.ops.quaternions import qmul, qrot_inv

# dry-air constants (ISO 2533)
R_GAS = 287.05287
GAMMA = 1.40
BETA_S = 1.458e-6  # Sutherland viscosity constants
S_SUTH = 110.4

T_STD = 288.15
P_STD = 101325.0
RHO_STD = P_STD / (R_GAS * T_STD)
G_STD = 9.80665

# ISA layers: (lapse rate beta [K/m], ceiling geopotential altitude [m])
ISA_LAYERS = (
    (-6.5e-3, 11000.0),
    (0.0, 20000.0),
    (1e-3, 32000.0),
    (2.8e-3, 47000.0),
    (0.0, 51000.0),
    (-2.8e-3, 71000.0),
    (-2e-3, 84852.0),
)


def density(p, T):
    return p / (R_GAS * T)


def speed_of_sound(T):
    return jnp.sqrt(GAMMA * R_GAS * T)


def dynamic_viscosity(T):
    return (BETA_S * T**1.5) / (T + S_SUTH)


def si2kts(v):
    return 1.94384 * v


def isa_data(h_geop, T_sl=T_STD, p_sl=P_STD):
    """(T, p) at geopotential altitude, propagating sea-level conditions
    through the ISA layers (`atmosphere.jl:116-135`). Unrolled & branch-free;
    altitudes above the table ceiling clamp to the ceiling."""
    h = jnp.asarray(h_geop)
    T = jnp.broadcast_to(jnp.asarray(T_sl, dtype=h.dtype), h.shape)
    p = jnp.broadcast_to(jnp.asarray(p_sl, dtype=h.dtype), h.shape)
    h_base = 0.0
    for i, (beta, h_ceil) in enumerate(ISA_LAYERS):
        if i == 0:
            dh = jnp.minimum(h, h_ceil) - h_base  # may be negative: extrapolate down
        else:
            dh = jnp.clip(h, h_base, h_ceil) - h_base
        if beta != 0.0:
            T_new = T + beta * dh
            p_new = p * (1 + beta / T * dh) ** (-G_STD / (beta * R_GAS))
        else:
            T_new = T
            p_new = p * jnp.exp(-G_STD / (R_GAS * T) * dh)
        T, p = T_new, p_new
        h_base = h_ceil
    return T, p


class AtmosphericData(NamedTuple):
    T: jnp.ndarray
    p: jnp.ndarray
    rho: jnp.ndarray
    a: jnp.ndarray
    mu: jnp.ndarray
    v: jnp.ndarray  # (...,3) local NED wind velocity


class AirData(NamedTuple):
    """Full airdata set (`atmosphere.jl:198-215`)."""
    v_ew_n: jnp.ndarray  # wind velocity, NED axes
    v_ew_b: jnp.ndarray  # wind velocity, body axes
    v_wb_b: jnp.ndarray  # aerodynamic velocity, body axes
    T: jnp.ndarray
    p: jnp.ndarray
    rho: jnp.ndarray
    a: jnp.ndarray
    mu: jnp.ndarray
    M: jnp.ndarray
    Tt: jnp.ndarray      # total temperature
    pt: jnp.ndarray      # total pressure
    Dp: jnp.ndarray      # impact pressure
    q: jnp.ndarray       # dynamic pressure
    TAS: jnp.ndarray
    EAS: jnp.ndarray
    CAS: jnp.ndarray


def tas2eas(TAS, rho):
    return TAS * jnp.sqrt(rho / RHO_STD)


def eas2tas(EAS, rho):
    return EAS * jnp.sqrt(RHO_STD / rho)


def air_data(atm: AtmosphericData, kin, v_ew_b=None) -> AirData:
    """AirData from atmospheric conditions + kinematics
    (`atmosphere.jl:220-242`). `v_ew_b`: optionally the body-axes wind
    already in hand (the disturbance chain computes it while building the
    gust field — passing it skips re-rotating `atm.v`; for a zero gust the
    two forms are bit-identical)."""
    v_ew_n = atm.v
    if v_ew_b is None:
        v_ew_b = qrot_inv(kin.q_nb, v_ew_n)
    v_wb_b = kin.v_eb_b - v_ew_b

    TAS = jnp.linalg.norm(v_wb_b, axis=-1)
    M = TAS / atm.a
    Tt = atm.T * (1 + (GAMMA - 1) / 2 * M**2)
    pt = atm.p * (Tt / atm.T) ** (GAMMA / (GAMMA - 1))
    Dp = pt - atm.p
    q = 0.5 * atm.rho * TAS**2
    EAS = tas2eas(TAS, atm.rho)
    CAS = jnp.sqrt(2 * GAMMA / (GAMMA - 1) * P_STD / RHO_STD
                   * ((1 + Dp / P_STD) ** ((GAMMA - 1) / GAMMA) - 1))
    return AirData(v_ew_n=v_ew_n, v_ew_b=v_ew_b, v_wb_b=v_wb_b, T=atm.T,
                   p=atm.p, rho=atm.rho, a=atm.a, mu=atm.mu, M=M, Tt=Tt,
                   pt=pt, Dp=Dp, q=q, TAS=TAS, EAS=EAS, CAS=CAS)


class SimpleAtmosphere(Component):
    """ISA hydrostatic model + tunable sea-level conditions + tunable uniform
    NED wind (`atmosphere.jl:260-283`). u = {T_sl, p_sl, wind (3,)}, all
    clamped to the reference's Ranged bounds (`:70-78`)."""

    T_SL_MIN, T_SL_MAX = T_STD - 50.0, T_STD + 50.0
    P_SL_MIN, P_SL_MAX = P_STD - 10000.0, P_STD + 10000.0

    def init_u(self):
        return {"T_sl": jnp.asarray(T_STD), "p_sl": jnp.asarray(P_STD),
                "wind": jnp.zeros(3)}

    def atmospheric_data(self, u, n_e, h_orth) -> AtmosphericData:
        T_sl = jnp.clip(u["T_sl"], self.T_SL_MIN, self.T_SL_MAX)
        p_sl = jnp.clip(u["p_sl"], self.P_SL_MIN, self.P_SL_MAX)
        h_geop = geo.geop_from_orth(h_orth)
        T, p = isa_data(h_geop, T_sl, p_sl)
        return AtmosphericData(T=T, p=p, rho=density(p, T),
                               a=speed_of_sound(T), mu=dynamic_viscosity(T),
                               v=u["wind"])

    def air_data(self, u, kin) -> AirData:
        atm = self.atmospheric_data(u, kin.n_e, kin.h_o)
        return air_data(atm, kin)


# ------------------------------------------------------------ airflow utils

TAS_MIN_ALPHA_BETA = 0.1


def get_velocity_vector(TAS, alpha, beta):
    """Aerodynamic velocity vector from TAS and airflow angles
    (`atmosphere.jl:323-326`)."""
    cb = jnp.cos(beta)
    return jnp.asarray(TAS)[..., None] * jnp.stack(
        [jnp.cos(alpha) * cb, jnp.sin(beta), jnp.sin(alpha) * cb], axis=-1)


def get_airflow_angles(v_wa_a):
    """(alpha, beta) from the aerodynamic velocity vector, gated to 0 below
    0.1 m/s TAS (`atmosphere.jl:329-337`)."""
    n = jnp.linalg.norm(v_wa_a, axis=-1)
    valid = n >= TAS_MIN_ALPHA_BETA
    alpha = jnp.where(valid, jnp.arctan2(v_wa_a[..., 2], v_wa_a[..., 0]), 0.0)
    beta = jnp.where(
        valid,
        jnp.arctan2(v_wa_a[..., 1],
                    jnp.sqrt(v_wa_a[..., 0] ** 2 + v_wa_a[..., 2] ** 2)), 0.0)
    return alpha, beta


def get_wind_axes(alpha, beta):
    """Rotation from airframe axes to wind axes (`atmosphere.jl:347-350`)."""
    return qmul(rot_y(-alpha), rot_z(beta))


def get_stability_axes(alpha):
    return rot_y(-alpha)
