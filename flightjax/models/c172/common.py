"""Cessna 172 shared platform: airframe, aerodynamics, landing gear set,
payload, fuel, systems composite, and the trim problem definition.

Mirrors `/root/reference/lib/FlightApps/src/c172/c172.jl`:
- airframe rigid-body mass properties (767 kg, `c172.jl:26-44`)
- JSBSim-C172R-derived aero coefficient tables with ground effect, flap,
  stall-hysteresis dimensions (`:51-199`) and the coefficient assembly
  `get_aero_coeffs` (`:226-245`)
- aero wrench in stability axes -> body axes (`:307-373`), stall hysteresis
  in f_step (`:375-384`)
- tricycle gear with C172 geometry/dampers (`:435-476`)
- payload stations (`:513-557`), two-tank fuel model (`:589-641`)
- systems composite with update order act -> assign -> aero -> ldg -> pwp ->
  fuel (`:678-724`)
- TrimState/TrimParameters and the trim residual (`:796-867`)
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component, bwhere
from flightjax.ops import interp
from flightjax.ops.interp import Lookup
from flightjax.ops import geodesy as geo
from flightjax.ops import attitude as att
from flightjax.ops.quaternions import qrot, qrot_inv, rot2_y
from flightjax.physics import atmosphere as atm
from flightjax.physics.aircraftbase import theta_constraint
from flightjax.physics.dynamics import (FrameTransform, Wrench, MassProps,
                                        mass_props_point, mass_props_rigid,
                                        wrench_zero, mass_props_zero)
from flightjax.physics.landinggear import (GearSet, GearUnitY,
                                           LandingGearUnit, SimpleDamper)
from flightjax.physics.kinematics import KinInit, kin_init, KinData
from flightjax.physics.piston import PistonThruster, PistonThrusterY, ENG_RUNNING
from flightjax.physics.terrain import TerrainData


# ------------------------------------------------------------------ airframe

def airframe_mp_b() -> MassProps:
    """Standard-empty-weight rigid body (`c172.jl:26-44`)."""
    J = np.diag([820.0, 1164.0, 1702.0])
    t_bc = FrameTransform(r=jnp.asarray([0.056, 0.0, 0.582]),
                          q=jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    return mass_props_rigid(767.0, jnp.asarray(J), t_bc)


# ---------------------------------------------------------------- aero data
# digitized JSBSim C172R tables (`c172.jl:51-159`)

def _lk(axes, vals, extrap="flat"):
    return Lookup(tuple(np.asarray(a, float) for a in axes),
                  np.asarray(vals, float), extrap)


_d2r = np.deg2rad

AERO_TABLES = dict(
    CD_beta=_lk([[-1.0, 0.0, 1.0]], [0.17, 0.0, 0.17]),
    CD_de=_lk([[-1.0, 0.0, 1.0]], [0.06, 0.0, 0.06]),
    CD_df=_lk([_d2r([0, 10, 20, 30])], [0.0, 0.007, 0.012, 0.018]),
    CD_ge=_lk([[0.0, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1]],
              [0.48, 0.515, 0.629, 0.709, 0.815, 0.882, 0.928, 0.962, 0.988,
               1.0, 1.0, 1.0, 1.0]),
    CD_alpha_df=_lk(
        [[-0.0873, -0.0698, -0.0524, -0.0349, -0.0175, 0.0, 0.0175, 0.0349,
          0.0524, 0.0698, 0.0873, 0.1047, 0.1222, 0.1396, 0.1571, 0.1745,
          0.192, 0.2094, 0.2269, 0.2443, 0.2618, 0.2793, 0.2967, 0.3142,
          0.3316, 0.3491],
         _d2r([0, 10, 20, 30])],
        np.array([
            [0.0041, 0.0013, 0.0001, 0.0003, 0.002, 0.0052, 0.0099, 0.0162,
             0.024, 0.0334, 0.0442, 0.0566, 0.0706, 0.086, 0.0962, 0.1069,
             0.118, 0.1298, 0.1424, 0.1565, 0.1727, 0.1782, 0.1716, 0.1618,
             0.1475, 0.1097],
            [0.0, 0.0004, 0.0023, 0.0057, 0.0105, 0.0168, 0.0248, 0.0342,
             0.0452, 0.0577, 0.0718, 0.0874, 0.1045, 0.1232, 0.1353, 0.1479,
             0.161, 0.1746, 0.1892, 0.2054, 0.224, 0.2302, 0.2227, 0.2115,
             0.1951, 0.1512],
            [0.0005, 0.0025, 0.0059, 0.0108, 0.0172, 0.0251, 0.0346, 0.0457,
             0.0583, 0.0724, 0.0881, 0.1053, 0.124, 0.1442, 0.1573, 0.1708,
             0.1849, 0.1995, 0.2151, 0.2323, 0.2521, 0.2587, 0.2507, 0.2388,
             0.2214, 0.1744],
            [0.0014, 0.0041, 0.0084, 0.0141, 0.0212, 0.0299, 0.0402, 0.0521,
             0.0655, 0.0804, 0.0968, 0.1148, 0.1343, 0.1554, 0.169, 0.183,
             0.1975, 0.2126, 0.2286, 0.2464, 0.2667, 0.2735, 0.2653, 0.2531,
             0.2351, 0.1866]]).T),
    CY_beta_df=_lk([[-0.349, 0.0, 0.349], _d2r([0, 30])],
                   [[0.137, 0.106], [0.0, 0.0], [-0.137, -0.106]]),
    CY_p=_lk([[0.0, 0.094], _d2r([0, 30])],
             [[-0.075, -0.161], [-0.145, -0.231]]),
    CY_r=_lk([[0.0, 0.094], _d2r([0, 30])],
             [[0.214, 0.162], [0.267, 0.215]]),
    CL_ge=_lk([[0.0, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0, 1.1]],
              [1.203, 1.127, 1.09, 1.073, 1.046, 1.055, 1.019, 1.013, 1.008,
               1.006, 1.003, 1.002, 1.0]),
    CL_alpha=_lk(
        [[-0.09, 0.0, 0.09, 0.1, 0.12, 0.14, 0.16, 0.17, 0.19, 0.21, 0.24,
          0.26, 0.28, 0.3, 0.32, 0.34, 0.36],
         [0.0, 1.0]],
        np.array([
            [-0.22, 0.25, 0.73, 0.83, 0.92, 1.02, 1.08, 1.13, 1.19, 1.25,
             1.35, 1.44, 1.47, 1.43, 1.38, 1.3, 1.15],
            [-0.22, 0.25, 0.73, 0.78, 0.79, 0.81, 0.82, 0.83, 0.85, 0.86,
             0.88, 0.9, 0.92, 0.95, 0.99, 1.05, 1.15]]).T),
    CL_df=_lk([_d2r([0, 10, 20, 30])], [0.0, 0.2, 0.3, 0.35]),
    Cl_r=_lk([[0.0, 0.094], _d2r([0, 30])],
             [[0.0798, 0.1246], [0.1869, 0.2317]]),
    Cm_df=_lk([_d2r([0, 10, 20, 30])], [0.0, -0.0654, -0.0981, -0.114]),
)

# scalar coefficients (`c172.jl:87-159`)
AERO_CONST = dict(
    CD_zero=0.027,
    CY_dr=0.187, CY_da=0.0,
    CL_de=0.43, CL_q=3.9, CL_adot=1.7,
    Cl_da=0.229, Cl_dr=0.0147, Cl_beta=-0.09226, Cl_p=-0.484,
    Cm_zero=0.1, Cm_de=-1.122, Cm_alpha=-1.8, Cm_q=-12.4, Cm_adot=-7.27,
    Cn_dr=-0.043, Cn_da=-0.0053, Cn_beta=0.05874, Cn_p=-0.0278, Cn_r=-0.0937,
)


class AeroCoeffs(NamedTuple):
    C_D: jnp.ndarray
    C_Y: jnp.ndarray
    C_L: jnp.ndarray
    C_l: jnp.ndarray
    C_m: jnp.ndarray
    C_n: jnp.ndarray


# How the table lookups in `get_aero_coeffs` evaluate (A/B with
# tools/exp_bundle.py):
#   False   — one matmul kernel per table (11 kernels); SHIPS
#   "all"   — every table through ONE `interp.eval_bundle` matmul
#   "small" — only the nine tables with <=13 grid points bundle
# Bundling measured NEGATIVE on-chip (2026-08-20, batch 4096:
# off 196.1 us/fleet-step, small 197.4, all 216.0 — the TPU scheduler
# already overlaps the small matmuls with neighboring VPU kernels, so
# concatenating their weights serializes the critical path; see
# docs/notes/performance.md "Measured negatives"). Values agree across
# modes to summation-order roundoff
# (`tests/test_c172s.py::test_aero_bundle_matches_per_table`).
_BUNDLE_AERO = False


def get_aero_coeffs(alpha, beta, p_nd, q_nd, r_nd, da, dr, de, df,
                    alpha_dot_nd, beta_dot_nd, dh_nd, stall):
    """Coefficient assembly (`c172.jl:226-245`) with the reference's input
    clamps."""
    T, K = AERO_TABLES, AERO_CONST
    alpha = jnp.clip(alpha, -0.1, 0.36)
    beta = jnp.clip(beta, -0.2, 0.2)
    alpha_dot_nd = jnp.clip(alpha_dot_nd, -0.04, 0.04)
    beta_dot_nd = jnp.clip(beta_dot_nd, -0.2, 0.2)
    stall = jnp.asarray(stall, dtype=alpha.dtype if hasattr(alpha, "dtype") else float)

    # CD_beta/CD_de are symmetric two-segment tables evaluated strictly
    # inside their knot span (beta clipped to ±0.2 above; de is a Ranged
    # norm in [-1, 1]): 0.17|β| and 0.06|δe| EXACTLY reproduce the hat
    # interpolation at 1 VPU op instead of a (B, 3) matmul each.
    cd_beta = 0.17 * jnp.abs(beta)
    cd_de = 0.06 * jnp.abs(de)

    if _BUNDLE_AERO == "all":
        (cd_df, cd_ge, cd_adf, cy_bdf, cy_p, cy_r, cl_ge, cl_a, cl_df,
         cl_r, cm_df) = interp.eval_bundle([
            (T["CD_df"], (df,)), (T["CD_ge"], (dh_nd,)),
            (T["CD_alpha_df"], (alpha, df)), (T["CY_beta_df"], (beta, df)),
            (T["CY_p"], (alpha, df)), (T["CY_r"], (alpha, df)),
            (T["CL_ge"], (dh_nd,)), (T["CL_alpha"], (alpha, stall)),
            (T["CL_df"], (df,)), (T["Cl_r"], (alpha, df)),
            (T["Cm_df"], (df,))])
    elif _BUNDLE_AERO == "small":
        (cd_df, cd_ge, cy_bdf, cy_p, cy_r, cl_ge, cl_df, cl_r,
         cm_df) = interp.eval_bundle([
            (T["CD_df"], (df,)), (T["CD_ge"], (dh_nd,)),
            (T["CY_beta_df"], (beta, df)),
            (T["CY_p"], (alpha, df)), (T["CY_r"], (alpha, df)),
            (T["CL_ge"], (dh_nd,)), (T["CL_df"], (df,)),
            (T["Cl_r"], (alpha, df)), (T["Cm_df"], (df,))])
        cd_adf = T["CD_alpha_df"](alpha, df)
        cl_a = T["CL_alpha"](alpha, stall)
    else:
        cd_df, cd_ge, cd_adf = T["CD_df"](df), T["CD_ge"](dh_nd), \
            T["CD_alpha_df"](alpha, df)
        cy_bdf, cy_p, cy_r = T["CY_beta_df"](beta, df), \
            T["CY_p"](alpha, df), T["CY_r"](alpha, df)
        cl_ge, cl_a, cl_df = T["CL_ge"](dh_nd), \
            T["CL_alpha"](alpha, stall), T["CL_df"](df)
        cl_r, cm_df = T["Cl_r"](alpha, df), T["Cm_df"](df)

    C_D = K["CD_zero"] + cd_ge * (cd_adf + cd_df) + cd_de + cd_beta
    C_Y = (K["CY_dr"] * dr + K["CY_da"] * da + cy_bdf
           + cy_p * p_nd + cy_r * r_nd)
    C_L = (cl_ge * (cl_a + cl_df)
           + K["CL_de"] * de + K["CL_q"] * q_nd + K["CL_adot"] * alpha_dot_nd)
    C_l = (K["Cl_da"] * da + K["Cl_dr"] * dr + K["Cl_beta"] * beta
           + K["Cl_p"] * p_nd + cl_r * r_nd)
    C_m = (K["Cm_zero"] + K["Cm_de"] * de + cm_df
           + K["Cm_alpha"] * alpha + K["Cm_q"] * q_nd
           + K["Cm_adot"] * alpha_dot_nd)
    C_n = (K["Cn_dr"] * dr + K["Cn_da"] * da + K["Cn_beta"] * beta
           + K["Cn_p"] * p_nd + K["Cn_r"] * r_nd)
    return AeroCoeffs(C_D=C_D, C_Y=C_Y, C_L=C_L, C_l=C_l, C_m=C_m, C_n=C_n)


class AeroY(NamedTuple):
    e: jnp.ndarray
    a: jnp.ndarray
    r: jnp.ndarray
    f: jnp.ndarray
    de: jnp.ndarray
    da: jnp.ndarray
    dr: jnp.ndarray
    df: jnp.ndarray
    alpha: jnp.ndarray
    beta: jnp.ndarray
    alpha_filt: jnp.ndarray
    beta_filt: jnp.ndarray
    alpha_filt_dot: jnp.ndarray
    beta_filt_dot: jnp.ndarray
    stall: jnp.ndarray
    coeffs: AeroCoeffs
    wr_b: Wrench


class Aero(Component):
    """C172 aerodynamics (`c172.jl:247-384`)."""

    S = 16.165
    b = 10.912
    c = 1.494
    de_range = tuple(_d2r((-28.0, 23.0)))
    da_range = tuple(_d2r((-20.0, 20.0)))
    dr_range = tuple(_d2r((-16.0, 16.0)))
    df_range = tuple(_d2r((0.0, 30.0)))
    alpha_stall = (0.09, 0.36)
    V_min = 1.0
    tau = 0.02

    def init_x(self, alpha_filt=0.0, beta_filt=0.0):
        return {"alpha_filt": jnp.asarray(alpha_filt),
                "beta_filt": jnp.asarray(beta_filt)}

    def init_u(self):
        return {"e": jnp.asarray(0.0), "a": jnp.asarray(0.0),
                "r": jnp.asarray(0.0), "f": jnp.asarray(0.0)}

    def init_s(self, stall=False):
        return {"stall": jnp.asarray(stall)}

    @staticmethod
    def _scale(u, rng, lo_u=-1.0, hi_u=1.0):
        """`linear_scaling` over a clamped normalized input
        (`types.jl:66-73`)."""
        u = jnp.clip(u, lo_u, hi_u)
        return rng[0] + (rng[1] - rng[0]) / (hi_u - lo_u) * (u - lo_u)

    def f_ode(self, x, u, s, t, kin: KinData, air: atm.AirData,
              trn: TerrainData):
        alpha_filt, beta_filt = x["alpha_filt"], x["beta_filt"]

        # airflow angles with the low-TAS chattering guard (`c172.jl:318-325`)
        small = air.TAS <= 0.1
        v_safe = bwhere(small, jnp.asarray([1.0, 0.0, 0.0]), air.v_wb_b)
        alpha_raw, beta_raw = atm.get_airflow_angles(v_safe)
        alpha = jnp.where(small, 0.0, alpha_raw)
        beta = jnp.where(small, 0.0, beta_raw)
        V = jnp.maximum(air.TAS, self.V_min)

        alpha_filt_dot = (alpha - alpha_filt) / self.tau
        beta_filt_dot = (beta - beta_filt) / self.tau

        p_nd = kin.omega_wb_b[..., 0] * self.b / (2 * V)
        q_nd = kin.omega_wb_b[..., 1] * self.c / (2 * V)
        r_nd = kin.omega_wb_b[..., 2] * self.b / (2 * V)
        alpha_dot_nd = alpha_filt_dot * self.c / (2 * V)
        beta_dot_nd = beta_filt_dot * self.b / (2 * V)

        de = self._scale(u["e"], self.de_range)
        da = self._scale(u["a"], self.da_range)
        dr = self._scale(u["r"], self.dr_range)
        df = self._scale(u["f"], self.df_range, lo_u=0.0)

        dh_nd = (kin.h_o - trn.elevation) / self.b

        coeffs = get_aero_coeffs(alpha, beta, p_nd, q_nd, r_nd, da, dr, de,
                                 df, alpha_dot_nd, beta_dot_nd, dh_nd,
                                 s["stall"])

        # Stability→airframe rotation R_y(-alpha) using the ALGEBRAIC
        # cos/sin of alpha (= v_x, v_z of v_safe over their hypot): no
        # trig, no quaternion — replaces get_stability_axes(alpha) + qrot
        # on the hot path. v_safe = [1,0,0] when gated, so ca,sa stay
        # consistent with the gated alpha above.
        vx, vz = v_safe[..., 0], v_safe[..., 2]
        m2 = vx * vx + vz * vz
        minv = jax.lax.rsqrt(jnp.maximum(m2, 1e-30))
        okm = m2 > 0
        ca = jnp.where(okm, vx * minv, 1.0)
        sa = jnp.where(okm, vz * minv, 0.0)
        qS = air.q * self.S
        F_s = qS * jnp.stack([-coeffs.C_D, coeffs.C_Y, -coeffs.C_L], axis=-1)
        F_a = rot2_y(ca, -sa, F_s)  # = qrot(get_stability_axes(alpha), F_s)
        tau_a = qS * jnp.stack([coeffs.C_l * self.b, coeffs.C_m * self.c,
                                coeffs.C_n * self.b], axis=-1)
        wr_b = Wrench(F=F_a, tau=tau_a)  # f_ba = identity (`c172.jl:204`)

        x_dot = {"alpha_filt": alpha_filt_dot, "beta_filt": beta_filt_dot}
        y = AeroY(e=u["e"], a=u["a"], r=u["r"], f=u["f"], de=de, da=da,
                  dr=dr, df=df, alpha=alpha, beta=beta,
                  alpha_filt=alpha_filt, beta_filt=beta_filt,
                  alpha_filt_dot=alpha_filt_dot, beta_filt_dot=beta_filt_dot,
                  stall=s["stall"], coeffs=coeffs, wr_b=wr_b)
        return x_dot, y

    def f_step_stall(self, alpha, stall):
        """Stall hysteresis (`c172.jl:375-384`). Pure logical form — a
        bool-valued select does not lower inside Pallas kernels."""
        return jnp.logical_or(
            alpha > self.alpha_stall[1],
            jnp.logical_and(stall, alpha >= self.alpha_stall[0]))


# ---------------------------------------------------------------------- ldg

def make_ldg() -> GearSet:
    """Tricycle gear with C172 geometry (`c172.jl:442-476`), evaluated as a
    single vmapped 3-leg strut/contact computation."""
    mlg = SimpleDamper(k_s=39404.0, k_d_ext=9340.0, k_d_cmp=9340.0)
    nlg = SimpleDamper(k_s=26269.0, k_d_ext=3503.0, k_d_cmp=3503.0)
    return GearSet(
        names=("left", "right", "nose"),
        r_bs=[[-0.381, -1.092, 1.902], [-0.381, 1.092, 1.902],
              [1.27, 0.0, 1.9]],
        dampers=[mlg, mlg, nlg],
        psi_max=[0.0, 0.0, np.pi / 6],
        eta_br=[1.0, 1.0, 0.0])


# ------------------------------------------------------------------ payload

PAYLOAD_SLOTS = {
    "pilot": [0.183, -0.356, 0.899],
    "copilot": [0.183, 0.356, 0.899],
    "lpass": [-0.681, -0.356, 0.899],
    "rpass": [-0.681, 0.356, 0.899],
    "baggage": [-1.316, 0.0, 0.899],
}

PAYLOAD_DEFAULT = {"pilot": 75.0, "copilot": 75.0, "lpass": 0.0,
                   "rpass": 0.0, "baggage": 50.0}


def payload_mp_b(u_pld) -> MassProps:
    """5 clamped point-mass stations (`c172.jl:513-557`)."""
    mp = mass_props_zero()
    for name, r in PAYLOAD_SLOTS.items():
        m = jnp.clip(u_pld[name], 0.0, 100.0)
        mp = mp + mass_props_point(m, jnp.asarray(r))
    return mp


# --------------------------------------------------------------------- fuel

M_FULL = 114.4
M_RES = 1.0
FUEL_TANKS = ([0.325, -2.845, 0.0], [0.325, 2.845, 0.0])


class FuelY(NamedTuple):
    x_avail: jnp.ndarray
    m_total: jnp.ndarray
    m_avail: jnp.ndarray


def fuel_output(x_fuel) -> FuelY:
    m_total = M_RES + x_fuel * (M_FULL - M_RES)
    return FuelY(x_avail=x_fuel, m_total=m_total, m_avail=m_total - M_RES)


def fuel_mp_b(fy: FuelY) -> MassProps:
    m = jnp.maximum(0.0, fy.m_total)
    mp = mass_props_zero()
    for r in FUEL_TANKS:
        mp = mp + mass_props_point(0.5 * m, jnp.asarray(r))
    return mp


# ------------------------------------------------------------------ systems

class SystemsY(NamedTuple):
    act: "object"
    aero: AeroY
    ldg: dict
    pwp: PistonThrusterY
    fuel: FuelY
    mp_b: MassProps
    wr_b: Wrench
    hr_b: jnp.ndarray


class Systems(Component):
    """C172 vehicle systems composite (`c172.jl:678-724`). The actuation
    component maps its outputs onto aero/gear/engine inputs via
    `act.assign(act_y)` -> dict with keys {e, a, r, f, steering, brake_left,
    brake_right} (`c172s.jl:103-120`)."""

    def __init__(self, pwp: PistonThruster, act):
        self.aero = Aero()
        self.ldg = make_ldg()
        self.pwp = pwp
        self.act = act

    def init_x(self, n_eng=0.0, fuel=0.5, alpha_filt=0.0, beta_filt=0.0):
        return {"aero": self.aero.init_x(alpha_filt, beta_filt),
                "ldg": self.ldg.init_x(),
                "pwp": self.pwp.init_x(n_eng=n_eng),
                "fuel": jnp.asarray(fuel),
                **self.act.init_x_extra()}

    def init_u(self):
        return {"act": self.act.init_u(),
                "pwp": self.pwp.init_u(),
                "pld": {k: jnp.asarray(v) for k, v in PAYLOAD_DEFAULT.items()}}

    def init_s(self, engine_state=0, stall=False):
        return {"aero": self.aero.init_s(stall),
                "pwp": self.pwp.init_s(engine_state),
                "crashed": jnp.asarray(False)}

    def _gear_inputs(self, asg):
        """Stacked (left, right, nose) steering/braking inputs."""
        z = jnp.zeros_like(asg["steering"])
        return {
            "steering": jnp.stack([z, z, asg["steering"]]),
            "braking": jnp.stack([asg["brake_left"], asg["brake_right"], z]),
        }

    def f_ode(self, x, u, s, t, kin: KinData, air: atm.AirData, trn_fn):
        # actuation -> surface/brake/throttle assignments
        act_y, asg, x_act_dot = self.act.f_ode(x, u["act"], t)

        aero_u = {"e": asg["e"], "a": asg["a"], "r": asg["r"], "f": asg["f"]}
        trn = trn_fn(kin.n_e)
        aero_dot, aero_y = self.aero.f_ode(x["aero"], aero_u, s["aero"], t,
                                           kin, air, trn)

        gear_u = self._gear_inputs(asg)
        ldg_dot, ldg_y = self.ldg.f_ode(x["ldg"], gear_u, t, kin, trn)

        pwp_u = dict(u["pwp"])
        pwp_u["engine"] = dict(pwp_u["engine"], throttle=asg["throttle"],
                               mixture=asg["mixture"])
        pwp_dot, pwp_y = self.pwp.f_ode(x["pwp"], pwp_u, s["pwp"], t, air, kin)

        fuel_y = fuel_output(x["fuel"])
        fuel_dot = -pwp_y.engine.mdot / (M_FULL - M_RES)

        # aggregation (`dynamics.jl:328-399` recursive summation, explicit)
        mp_b = airframe_mp_b() + payload_mp_b(u["pld"]) + fuel_mp_b(fuel_y)
        wr_ldg = Wrench(F=jnp.sum(ldg_y.contact.wr_b.F, axis=0),
                        tau=jnp.sum(ldg_y.contact.wr_b.tau, axis=0))
        wr_b = aero_y.wr_b + pwp_y.propeller.wr_b + wr_ldg
        hr_b = pwp_y.propeller.hr_b

        x_dot = {"aero": aero_dot, "ldg": ldg_dot, "pwp": pwp_dot,
                 "fuel": fuel_dot, **x_act_dot}
        y = SystemsY(act=act_y, aero=aero_y, ldg=ldg_y, pwp=pwp_y,
                     fuel=fuel_y, mp_b=mp_b, wr_b=wr_b, hr_b=hr_b)
        return x_dot, y

    def f_ode_parts(self):
        """Decompose `f_ode` into three data-flow stages for per-part
        Pallas cluster kernels (`parallel/clusterstep.py`, split="fine"):
        the whole systems update as ONE Mosaic kernel exceeds the
        compiler's memory cap. Same subsystem calls and the same wrench /
        mass-property summation order as `f_ode` (no y assembly; kernels
        only carry states and the dynamics inputs)."""

        def actaero(x_act, x_aero, u_act, s_aero, t, kin, air, trn_fn):
            act_y, asg, x_act_dot = self.act.f_ode(x_act, u_act, t)
            aero_u = {"e": asg["e"], "a": asg["a"], "r": asg["r"],
                      "f": asg["f"]}
            trn = trn_fn(kin.n_e)
            aero_dot, aero_y = self.aero.f_ode(x_aero, aero_u, s_aero, t,
                                               kin, air, trn)
            thr_mix = {"throttle": asg["throttle"],
                       "mixture": asg["mixture"]}
            return (x_act_dot, aero_dot, self._gear_inputs(asg), thr_mix,
                    aero_y.wr_b)

        def ldg(x_ldg, gear_u, t, kin, trn_fn):
            trn = trn_fn(kin.n_e)
            ldg_dot, ldg_y = self.ldg.f_ode(x_ldg, gear_u, t, kin, trn)
            wr_ldg = Wrench(F=jnp.sum(ldg_y.contact.wr_b.F, axis=0),
                            tau=jnp.sum(ldg_y.contact.wr_b.tau, axis=0))
            return ldg_dot, wr_ldg

        def pwp(x_pwp, x_fuel, u_pwp, s_pwp, thr_mix, u_pld, t, kin, air,
                wr_aero, wr_ldg):
            pwp_u = dict(u_pwp)
            pwp_u["engine"] = dict(pwp_u["engine"],
                                   throttle=thr_mix["throttle"],
                                   mixture=thr_mix["mixture"])
            pwp_dot, pwp_y = self.pwp.f_ode(x_pwp, pwp_u, s_pwp, t, air,
                                            kin)
            fuel_y = fuel_output(x_fuel)
            fuel_dot = -pwp_y.engine.mdot / (M_FULL - M_RES)
            mp_b = airframe_mp_b() + payload_mp_b(u_pld) + fuel_mp_b(fuel_y)
            wr_b = wr_aero + pwp_y.propeller.wr_b + wr_ldg
            hr_b = pwp_y.propeller.hr_b
            return pwp_dot, fuel_dot, mp_b, wr_b, hr_b

        return actaero, ldg, pwp

    def f_ode_gear_legs(self):
        """Per-leg decomposition of the gear stage for the fine cluster
        split: the whole 3-leg gear kernel alone SIGKILLs the remote
        Mosaic compile helper (measured at batch 4096); one leg fits.
        Each returned fn: (x_frc (2,), steering, braking, t, kin, trn_fn)
        -> (frc_dot (2,), contact wrench)."""
        def make(i):
            def leg(x_frc, steering, braking, t, kin, trn_fn):
                trn = trn_fn(kin.n_e)
                return self.ldg.f_ode_leg(i, x_frc, steering, braking,
                                          t, kin, trn)
            return leg
        return [make(i) for i in range(self.ldg.n)]

    def f_step_parts(self):
        """Decompose `f_step` for the fine cluster split: the whole
        finish-systems kernel (3x strut geometry + engine FSM) alone
        SIGKILLs the remote Mosaic compile helper (measured at batch
        4096). Returns (pre, legs, rest): `pre(x_act, u_act, t)` ->
        gear_u; `legs[i](steering, braking, kin, trn_fn)` -> (wow mask,
        alpha_ts, xi_dot) for leg i; `rest(x, u_pwp, s, t, kin, air, wow,
        alpha_ts, xi_dot)` -> (x2, s2). Same formulas and masking as
        `f_step` (wow rides as a 0/1 float between kernels — Mosaic
        kernels avoid bool outputs)."""

        def pre(x_act, u_act, t):
            _, asg, _ = self.act.f_ode(x_act, u_act, t)
            return self._gear_inputs(asg)

        def make_leg(i):
            def leg(steering, braking, kin, trn_fn):
                trn = trn_fn(kin.n_e)
                sy = self.ldg.strut_y_leg(i, steering, braking, kin, trn)
                return (jnp.where(sy.wow, 1.0, 0.0), sy.alpha_ts,
                        sy.xi_dot)
            return leg

        def rest(x, u_pwp, s, t, kin, air, wow, alpha_ts, xi_dot):
            small = air.TAS <= 0.1
            v_safe = bwhere(small, jnp.asarray([1.0, 0.0, 0.0]),
                            air.v_wb_b)
            alpha = jnp.where(small, 0.0,
                              atm.get_airflow_angles(v_safe)[0])
            stall = self.aero.f_step_stall(alpha, s["aero"]["stall"])

            from flightjax.physics.landinggear import (ALPHA_TS_MAX,
                                                       XI_DOT_MAX)
            wow_b = wow > 0.5
            x_ldg = {"frc": bwhere(wow_b, x["ldg"]["frc"], 0.0)}
            crashed = jnp.logical_or(s["crashed"], jnp.any(
                jnp.logical_or(
                    jnp.logical_and(wow_b, alpha_ts > ALPHA_TS_MAX),
                    -xi_dot > XI_DOT_MAX)))

            fuel_avail = fuel_output(x["fuel"]).m_avail > 0
            x_pwp, s_pwp = self.pwp.f_step(x["pwp"], u_pwp, s["pwp"], t,
                                           fuel_avail)
            x2 = dict(x, ldg=x_ldg, pwp=x_pwp)
            s2 = {"aero": {"stall": stall}, "pwp": s_pwp,
                  "crashed": crashed}
            return x2, s2

        return pre, [make_leg(i) for i in range(self.ldg.n)], rest

    def f_step(self, x, u, s, t, kin: KinData, air: atm.AirData, trn_fn):
        """Stall hysteresis + gear regulator resets + engine FSM
        (`c172.jl:715-724`). Each gear strut geometry is computed once and
        reused for both the regulator reset and the crash check."""
        act_y, asg, _ = self.act.f_ode(x, u["act"], t)
        trn = trn_fn(kin.n_e)

        # stall hysteresis needs only the current (unclamped) alpha
        small = air.TAS <= 0.1
        v_safe = bwhere(small, jnp.asarray([1.0, 0.0, 0.0]), air.v_wb_b)
        alpha = jnp.where(small, 0.0, atm.get_airflow_angles(v_safe)[0])
        stall = self.aero.f_step_stall(alpha, s["aero"]["stall"])

        gear_u = self._gear_inputs(asg)
        from flightjax.physics.landinggear import ALPHA_TS_MAX, XI_DOT_MAX
        sy = self.ldg.strut_y(x["ldg"], gear_u, t, kin, trn)
        x_ldg = {"frc": bwhere(sy.wow, x["ldg"]["frc"], 0.0)}
        crashed = jnp.logical_or(s["crashed"], jnp.any(jnp.logical_or(
            jnp.logical_and(sy.wow, sy.alpha_ts > ALPHA_TS_MAX),
            -sy.xi_dot > XI_DOT_MAX)))

        fuel_avail = fuel_output(x["fuel"]).m_avail > 0
        x_pwp, s_pwp = self.pwp.f_step(x["pwp"], u["pwp"], s["pwp"], t,
                                       fuel_avail)

        x = dict(x, ldg=x_ldg, pwp=x_pwp)
        s = {"aero": {"stall": stall}, "pwp": s_pwp, "crashed": crashed}
        return x, s


# --------------------------------------------------------------------- trim

class TrimState(NamedTuple):
    """7 trim variables (`c172.jl:796-804`)."""
    alpha_a: jnp.ndarray
    phi_nb: jnp.ndarray
    n_eng: jnp.ndarray
    throttle: jnp.ndarray
    aileron: jnp.ndarray
    elevator: jnp.ndarray
    rudder: jnp.ndarray


TRIM_X0 = np.array([0.1, 0.0, 0.75, 0.47, 0.014, -0.0015, 0.02])
TRIM_LB = np.array([-np.pi / 12, -np.pi / 3, 0.4, 0.0, -1.0, -1.0, -1.0])
TRIM_UB = np.array([0.36, np.pi / 3, 1.1, 1.0, 1.0, 1.0, 1.0])

# multi-start pool for the bounded Gauss-Newton (the reference's BOBYQA is
# more tolerant of a single poor start; a handful of spread starts restores
# robustness at demanding conditions like EAS=25 with full flaps)
TRIM_STARTS = np.array([
    TRIM_X0,
    [0.18, 0.0, 0.95, 0.85, 0.0, -0.1, 0.0],   # slow flight: high alpha/power
    [0.04, 0.0, 0.80, 0.55, 0.0, 0.05, 0.0],   # fast cruise
    [0.25, 0.0, 1.00, 1.00, 0.0, -0.3, 0.0],   # near-stall, full power
])


class TrimParameters(NamedTuple):
    """Trim condition (`c172.jl:806-818`). `n_e`/`h_e` locate Ob."""
    n_e: jnp.ndarray
    h_e: jnp.ndarray
    psi_nb: jnp.ndarray
    EAS: jnp.ndarray
    gamma_wb_n: jnp.ndarray
    psi_wb_dot: jnp.ndarray
    theta_wb_dot: jnp.ndarray
    beta_a: jnp.ndarray
    fuel_load: jnp.ndarray
    mixture: jnp.ndarray
    flaps: jnp.ndarray
    payload: dict


def trim_parameters(lat=0.0, lon=0.0, h=1050.0, psi_nb=0.0, EAS=50.0,
                    gamma=0.0, psi_dot=0.0, theta_dot=0.0, beta=0.0,
                    fuel_load=0.5, mixture=0.5, flaps=0.0, payload=None):
    n_e = geo.nvector_from_latlon(jnp.asarray(lat), jnp.asarray(lon))
    pld = dict(PAYLOAD_DEFAULT)
    if payload:
        pld.update(payload)
    return TrimParameters(
        n_e=n_e, h_e=jnp.asarray(float(h)), psi_nb=jnp.asarray(float(psi_nb)),
        EAS=jnp.asarray(float(EAS)), gamma_wb_n=jnp.asarray(float(gamma)),
        psi_wb_dot=jnp.asarray(float(psi_dot)),
        theta_wb_dot=jnp.asarray(float(theta_dot)),
        beta_a=jnp.asarray(float(beta)),
        fuel_load=jnp.asarray(float(fuel_load)),
        mixture=jnp.asarray(float(mixture)), flaps=jnp.asarray(float(flaps)),
        payload={k: jnp.asarray(v) for k, v in pld.items()})


def trim_kin_init(ts: TrimState, tp: TrimParameters, atm_component,
                  atm_u) -> KinInit:
    """Kinematic initial condition from a trim point (`c172.jl:825-854`)."""
    atm_data = atm_component.atmospheric_data(
        atm_u, tp.n_e, geo.orth_from_ellip(tp.h_e, tp.n_e))
    TAS = atm.eas2tas(tp.EAS, atm_data.rho)
    v_wb_b = atm.get_velocity_vector(TAS, ts.alpha_a, tp.beta_a)  # f_ba = I

    theta_nb = theta_constraint(v_wb_b, tp.gamma_wb_n, ts.phi_nb)
    e_nb = jnp.stack([tp.psi_nb, theta_nb, ts.phi_nb])
    q_nb = att.euler_to_quat(e_nb)

    e_dot = jnp.stack([tp.psi_wb_dot, tp.theta_wb_dot, jnp.zeros_like(ts.phi_nb)])
    omega_wb_b = att.euler_to_omega(e_nb, e_dot)

    v_wb_n = qrot(q_nb, v_wb_b)
    v_eb_n = atm_data.v + v_wb_n

    return KinInit(q_nb=q_nb, n_e=tp.n_e, h_e=tp.h_e,
                   omega_wb_b=omega_wb_b, v_eb_n=v_eb_n)
