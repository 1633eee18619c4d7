"""Piston engine (normalized Lycoming IO-360A family) + PistonThruster.

Mirrors `/root/reference/lib/FlightPhysics/src/piston.jl`:
- performance chart tables delta_wot, mu_wot (inverse-interpolated), pi_std,
  pi_wot, pi_ratio(f), sfc_ratio(f), sfc_pow built from the digitized chart
  knots (`piston.jl:60-195`) — constructed in numpy at import into dense
  rectilinear lookups with the reference's per-table extrapolation modes
- altitude/MAP power interpolation `compute_pi_ISA_pow` (`:457-477`)
- `PistonEngine`: x = {omega, idle-PI, friction-PI}; discrete state machine
  off(0) -> starting(1) -> running(2) in f_step (`:428-453`); f_ode computes
  MAP from throttle with the idle-compensator-controlled idle MAP ratio,
  mixture -> fuel/air ratio, shaft torque/power, SFC, fuel flow, and
  crankshaft omega_dot = sum(tau)/sum(J) including reflected propeller load
  (`:314-426`) — the three-state branch becomes a masked select
- `PistonThruster` = engine + propeller + gear ratio, coupling tau_prop /
  J_prop back into the engine load (`:559-607`).
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component
from flightjax.ops import interp
from flightjax.ops.interp import Lookup

# Bundle the engine chart lookups into per-dependency-stage matmuls
# (7 kernels -> 4; see PistonEngine.f_ode). Measured NEGATIVE on-chip
# (tools/exp_bundle.py, 2026-08-20: 208.2 vs 196.1 us/fleet-step at
# batch 4096 — same scheduler-overlap effect as the aero bundle; see
# docs/notes/performance.md "Measured negatives"), so ships False.
_BUNDLE_ENGINE = False
from flightjax.physics import control as C
from flightjax.physics.atmosphere import (AirData, G_STD, P_STD, R_GAS,
                                          RHO_STD, T_STD)
from flightjax.physics.propellers import Propeller, CW

BETA_TROPO = -6.5e-3

# fuel-to-air ratios (`piston.jl:28-30`)
F_CUTOFF = 0.0580
F_LEAN = 0.0625
F_RICH = 0.0950

ENG_OFF, ENG_STARTING, ENG_RUNNING = 0, 1, 2
MIX_MANUAL, MIX_AUTO = 0, 1


def hp2w(P):
    return 735.49875 * P


def rpm2radps(n):
    return n * np.pi / 30.0


def T_ISA(p):
    """ISA temperature at the altitude where pressure is p (`piston.jl:38`)."""
    return T_STD * (p / P_STD) ** (-BETA_TROPO * R_GAS / G_STD)


def p2delta(p):
    """Inlet air parameter from static pressure, ISA (`piston.jl:41`)."""
    return (p / P_STD) * (T_ISA(p) / T_STD) ** (-0.5)


# ----------------------------------------------------- chart tables (numpy)

def _build_tables(n_stall, n_max):
    """Digitized IO-360 performance charts (`piston.jl:70-195`)."""
    assert n_stall < 0.667 and n_max > 1.074

    # delta_wot(n, mu): delta at which mu is the wide-open-throttle MAP
    n_ax2 = np.array([0.667, 1.0])
    mu_ax9 = np.linspace(0.401, 0.936, 9)
    delta_data = np.array([
        [0.455, 0.523, 0.587, 0.652, 0.718, 0.781, 0.844, 0.906, 0.965],
        [0.464, 0.530, 0.596, 0.662, 0.727, 0.792, 0.855, 0.921, 0.981]])
    delta_wot = Lookup((n_ax2, mu_ax9), delta_data, extrap="line")

    # mu_wot(n, delta): inverse interpolation per n row (`piston.jl:89-104`)
    delta_ax9 = np.linspace(0.441, 1.0, 9)
    mu_data = np.zeros((2, 9))
    for i in range(2):
        # linear inverse with Line extrapolation on both ends
        mu_data[i] = _interp_line(delta_data[i], mu_ax9, delta_ax9)
    mu_wot = Lookup((n_ax2, delta_ax9), mu_data, extrap="line")

    # pi_std(n, mu): part-throttle normalized power at sea level (`:108-134`)
    n_data = np.array([n_stall, 0.667, 0.704, 0.741, 0.778, 0.815, 0.852,
                       0.889, 0.926, 0.963, 1.000, 1.074, n_max])
    mu_data3 = np.array([0.0, 0.568, 1.0])
    mu_knots = np.vstack([
        np.zeros(len(n_data)),
        np.full(len(n_data), 0.568),
        [1.000, 0.836, 0.854, 0.874, 0.898, 0.912, 0.939, 0.961, 0.959,
         0.958, 0.956, 0.953, 1.000]])
    pi_knots = np.vstack([
        np.zeros(len(n_data)),
        [0, 0.270, 0.305, 0.335, 0.360, 0.380, 0.405, 0.428, 0.450, 0.476,
         0.498, 0.498, 0],
        [0, 0.489, 0.548, 0.609, 0.680, 0.729, 0.810, 0.880, 0.920, 0.965,
         1.000, 0.950, 0]])
    pi_std_data = np.zeros((len(n_data), 3))
    for i in range(len(n_data)):
        pi_std_data[i] = _interp_line(mu_knots[:, i], pi_knots[:, i], mu_data3)
    pi_std = Lookup((n_data, mu_data3), pi_std_data, extrap="flat")

    # pi_wot(n, delta): full-throttle normalized power (`:138-151`)
    n_data5 = np.array([n_stall, 0.667, 1.000, 1.074, n_max])
    delta_data3 = np.array([0.0, 0.441, 1.0])
    pi_wot_data = np.zeros((5, 3))
    pi_wot_data[:, 1] = [0, 0.23, 0.409, 0.409, 0]
    for i, n in enumerate(n_data5):
        mu_w = float(mu_wot(n, 1.0))
        pi_wot_data[i, 2] = float(pi_std(n, mu_w))
    # extrapolation: n flat; delta line above 1 (below 0 never queried)
    pi_wot = Lookup((n_data5, delta_data3), pi_wot_data,
                    extrap=("flat", "line"))

    # pi_ratio(f), sfc_ratio(f): fuel-to-air corrections (`:154-174`)
    f_ax = np.concatenate([[F_CUTOFF], np.linspace(F_LEAN, F_RICH, 10)])
    pi_ratio = Lookup((f_ax,), np.array(
        [0.000, 0.8600, 0.9492, 0.9776, 0.9933, 1.000, 0.9983, 0.9910,
         0.9798, 0.9657, 0.9500]), extrap="flat")
    sfc_ratio = Lookup((f_ax,), np.array(
        [5, 0.8700, 0.8524, 0.8818, 0.9261, 0.9839, 1.0510, 1.1279,
         1.2135, 1.3163, 1.4280]), extrap="flat")

    # sfc_pow(n, pi): SFC at max-power mixture (`:177-191`)
    n_sfc = np.array([2000, 2200, 2400, 2600, 2700]) / 2700
    pi_sfc = 10 ** np.linspace(-1, 0, 8)
    sfc_data = 1e-7 * np.array([
        [1.7671, 1.43728, 1.19992, 1.02909, 0.906153, 0.817674, 0.753997, 0.708169],
        [1.83791, 1.49664, 1.25103, 1.07427, 0.947056, 0.855503, 0.789613, 0.742193],
        [1.98614, 1.60588, 1.3322, 1.13524, 0.993496, 0.891482, 0.818064, 0.765226],
        [2.11663, 1.70062, 1.40123, 1.18576, 1.03069, 0.919083, 0.838765, 0.780961],
        [2.33484, 1.85418, 1.50825, 1.2593, 1.08012, 0.951177, 0.858376, 0.791588]])
    sfc_pow = Lookup((n_sfc, pi_sfc), sfc_data, extrap="line")

    return dict(delta_wot=delta_wot, mu_wot=mu_wot, pi_std=pi_std,
                pi_wot=pi_wot, pi_ratio=pi_ratio, sfc_ratio=sfc_ratio,
                sfc_pow=sfc_pow)


def _interp_line(x, y, xq):
    """1-D linear interpolation with linear (Line) extrapolation."""
    x, y, xq = map(np.asarray, (x, y, xq))
    out = np.interp(xq, x, y)
    lo = xq < x[0]
    hi = xq > x[-1]
    out = np.where(lo, y[0] + (xq - x[0]) * (y[1] - y[0]) / (x[1] - x[0]), out)
    out = np.where(hi, y[-1] + (xq - x[-1]) * (y[-1] - y[-2]) / (x[-1] - x[-2]), out)
    return out


def compute_pi_isa_pow(tables, n, mu, delta):
    """Altitude/MAP interpolation of normalized power (`piston.jl:457-477`)."""
    delta_wot = tables["delta_wot"](n, mu)
    pi_std = tables["pi_std"](n, mu)
    pi_wot = tables["pi_wot"](n, delta_wot)
    denom = delta_wot - 1.0
    degenerate = jnp.abs(denom) < 5e-3
    denom_safe = jnp.where(degenerate, 1.0, denom)
    pi_interp = pi_std + (pi_wot - pi_std) / denom_safe * (delta - 1.0)
    return jnp.maximum(jnp.where(degenerate, pi_std, pi_interp), 0.0)


# ------------------------------------------------------------------- engine

class PistonEngineY(NamedTuple):
    state: jnp.ndarray
    throttle: jnp.ndarray
    MAP: jnp.ndarray
    mixture: jnp.ndarray
    mixture_pos: jnp.ndarray
    f: jnp.ndarray          # fuel-to-air ratio
    mdot: jnp.ndarray       # fuel flow
    omega: jnp.ndarray
    n: jnp.ndarray
    tau_shaft: jnp.ndarray
    P_shaft: jnp.ndarray
    SFC: jnp.ndarray
    idle: C.PIOutput
    frc: C.PIOutput


class PistonEngine(Component):
    """Normalized naturally-aspirated piston engine (`piston.jl:220-453`)."""

    def __init__(self, P_rated=hp2w(200), omega_rated=rpm2radps(2700),
                 omega_stall=rpm2radps(300), omega_max=rpm2radps(3100),
                 omega_idle=rpm2radps(600), tau_start=40.0, J=0.05):
        self.P_rated = float(P_rated)
        self.omega_rated = float(omega_rated)
        self.omega_stall = float(omega_stall)
        self.omega_max = float(omega_max)
        self.omega_idle = float(omega_idle)
        self.tau_start = float(tau_start)
        self.J = float(J)
        self.tables = _build_tables(omega_stall / omega_rated,
                                    omega_max / omega_rated)
        # compensator gains (`piston.jl:299-312`)
        self.idle = C.pi_params(k_p=4.0, k_i=2.0, bound_lo=-0.5, bound_hi=0.5)
        self.frc = C.pi_params(k_p=5.0, k_i=200.0, bound_lo=-1.0, bound_hi=1.0)

    def init_x(self, n_eng=0.0):
        return {"omega": jnp.asarray(n_eng * self.omega_rated),
                "idle": jnp.asarray(0.0), "frc": jnp.asarray(0.0)}

    def init_u(self):
        return {"start": jnp.asarray(False), "stop": jnp.asarray(False),
                "throttle": jnp.asarray(0.0), "mixture": jnp.asarray(0.5),
                "mixture_ctl": jnp.asarray(MIX_AUTO, dtype=jnp.int32)}

    def init_s(self, state=ENG_OFF):
        return {"state": jnp.asarray(state, dtype=jnp.int32)}

    def f_ode(self, x, u, s, t, air: AirData, tau_load=0.0, J_load=0.0):
        """Continuous engine dynamics (`piston.jl:314-426`), three-state
        branch as masked selects."""
        omega = x["omega"]
        state = s["state"]
        throttle = jnp.clip(u["throttle"], 0.0, 1.0)
        mixture = jnp.clip(u["mixture"], 0.0, 1.0)

        frc_dot, frc_out = C.pi_ode(self.frc, x["frc"], -omega)
        idle_dot, idle_out = C.pi_ode(self.idle, x["idle"],
                                      1.0 - omega / self.omega_idle)

        mu_ratio_idle = 0.5 + idle_out.output
        n = omega / self.omega_rated
        delta = p2delta(air.p)

        k_f = 1.0 / jnp.sqrt(air.rho / RHO_STD)
        f_target = F_LEAN + mixture * (F_RICH - F_LEAN)
        mixture_pos = jnp.where(u["mixture_ctl"] == MIX_MANUAL,
                                0.5 * (mixture + 1.0),
                                f_target / (k_f * F_RICH))
        f_run = k_f * F_RICH * mixture_pos

        # The 7 chart lookups split into 4 dependency stages; with
        # `_BUNDLE_ENGINE` each stage bundles into ONE matmul kernel
        # (`interp.eval_bundle` — the step is fixed-overhead-bound, see
        # docs/notes/performance.md; A/B with tools/exp_bundle.py):
        #   A: mu_wot(n,delta) + the two f_run corrections  (independent)
        #   B: delta_wot(n,mu) + pi_std(n,mu)               (need mu <- A)
        #   C: pi_wot(n, delta_wot)                         (needs B)
        #   D: sfc_pow(n, pi_actual)                        (needs C)
        T = self.tables
        if _BUNDLE_ENGINE:
            mu_wot, pi_ratio_f, sfc_ratio_f = interp.eval_bundle([
                (T["mu_wot"], (n, delta)), (T["pi_ratio"], (f_run,)),
                (T["sfc_ratio"], (f_run,))])
        else:
            mu_wot = T["mu_wot"](n, delta)
            pi_ratio_f = T["pi_ratio"](f_run)
            sfc_ratio_f = T["sfc_ratio"](f_run)
        mu = mu_wot * (mu_ratio_idle + throttle * (1.0 - mu_ratio_idle))

        # running-state quantities (`:388-413`); the pi_isa formula is
        # `compute_pi_isa_pow` with stage-B bundled (same math)
        if _BUNDLE_ENGINE:
            delta_wot, pi_std = interp.eval_bundle([
                (T["delta_wot"], (n, mu)), (T["pi_std"], (n, mu))])
        else:
            delta_wot = T["delta_wot"](n, mu)
            pi_std = T["pi_std"](n, mu)
        pi_wot = T["pi_wot"](n, delta_wot)
        denom = delta_wot - 1.0
        degenerate = jnp.abs(denom) < 5e-3
        denom_safe = jnp.where(degenerate, 1.0, denom)
        pi_interp = pi_std + (pi_wot - pi_std) / denom_safe * (delta - 1.0)
        pi_isa = jnp.maximum(jnp.where(degenerate, pi_std, pi_interp), 0.0)

        pi_pow = pi_isa * jnp.sqrt(T_ISA(air.p) / air.T)
        pi_actual = pi_pow * pi_ratio_f
        P_run = self.P_rated * pi_actual
        omega_safe = jnp.where(omega > 1e-3, omega, 1.0)
        tau_run = jnp.where(omega > 0, P_run / omega_safe, 0.0)
        SFC_run = T["sfc_pow"](n, pi_actual) * sfc_ratio_f
        mdot_run = SFC_run * P_run

        # off-state friction brake (`:363-377`)
        tau_fr = frc_out.output * (0.01 * self.P_rated / self.omega_rated)

        off = state == ENG_OFF
        starting = state == ENG_STARTING

        MAP = jnp.where(off, air.p, mu * P_STD)
        f = jnp.where(state == ENG_RUNNING, f_run, 0.0)
        tau_shaft = jnp.where(off, tau_fr,
                              jnp.where(starting, self.tau_start, tau_run))
        P_shaft = jnp.where(off, 0.0,
                            jnp.where(starting, self.tau_start * omega, P_run))
        SFC = jnp.where(state == ENG_RUNNING, SFC_run, 0.0)
        mdot = jnp.where(state == ENG_RUNNING, mdot_run, 0.0)

        omega_dot = (tau_shaft + tau_load) / (self.J + J_load)

        x_dot = {"omega": omega_dot, "idle": idle_dot, "frc": frc_dot}
        y = PistonEngineY(state=state, throttle=throttle, MAP=MAP,
                          mixture=mixture, mixture_pos=mixture_pos, f=f,
                          mdot=mdot, omega=omega, n=n, tau_shaft=tau_shaft,
                          P_shaft=P_shaft, SFC=SFC, idle=idle_out, frc=frc_out)
        return x_dot, y

    def f_step(self, x, u, s, t, fuel_available=True):
        """Engine state machine (`piston.jl:428-453`), branch-free."""
        omega = x["omega"]
        state = s["state"]
        fuel = jnp.asarray(fuel_available)

        next_off = jnp.where(u["start"], ENG_STARTING, ENG_OFF)
        next_starting = jnp.where(
            jnp.logical_and(omega > self.omega_idle, fuel), ENG_RUNNING,
            jnp.where(jnp.logical_not(u["start"]), ENG_OFF, ENG_STARTING))
        dies = jnp.logical_or(u["stop"],
                              jnp.logical_or(omega < self.omega_stall,
                                             jnp.logical_not(fuel)))
        next_running = jnp.where(dies, ENG_OFF, ENG_RUNNING)

        new_state = jnp.where(
            state == ENG_OFF, next_off,
            jnp.where(state == ENG_STARTING, next_starting, next_running))
        return x, {"state": new_state.astype(jnp.int32)}


# ----------------------------------------------------------------- thruster

class PistonThrusterY(NamedTuple):
    engine: PistonEngineY
    propeller: "jnp.ndarray"


class PistonThruster(Component):
    """Engine + propeller + gear ratio (`piston.jl:559-607`)."""

    def __init__(self, engine: PistonEngine = None, propeller: Propeller = None,
                 gear_ratio=1.0):
        self.engine = engine if engine is not None else PistonEngine()
        self.propeller = propeller
        self.gear_ratio = float(gear_ratio)
        assert np.sign(self.gear_ratio) * self.propeller.sense > 0

    def init_x(self, n_eng=0.0):
        return {"engine": self.engine.init_x(n_eng=n_eng)}

    def init_u(self):
        return {"engine": self.engine.init_u(), **self.propeller.init_u()}

    def init_s(self, state=ENG_OFF):
        return {"engine": self.engine.init_s(state)}

    def f_ode(self, x, u, s, t, air: AirData, kin):
        gr = self.gear_ratio
        omega_eng = x["engine"]["omega"]
        omega_prop = gr * omega_eng
        prop_y = self.propeller.output(u, kin, air, omega_prop)

        tau_eq = gr * prop_y.wr_p.tau[..., 0]
        J_eq = gr**2 * self.propeller.J_xx

        eng_dot, eng_y = self.engine.f_ode(
            x["engine"], u["engine"], s["engine"], t, air,
            tau_load=tau_eq, J_load=J_eq)
        return {"engine": eng_dot}, PistonThrusterY(engine=eng_y,
                                                    propeller=prop_y)

    def f_step(self, x, u, s, t, fuel_available=True):
        xe, se = self.engine.f_step(x["engine"], u["engine"], s["engine"], t,
                                    fuel_available)
        return {"engine": xe}, {"engine": se}
