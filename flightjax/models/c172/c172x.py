"""Cessna 172X: fly-by-wire variant.

Mirrors `/root/reference/lib/FlightApps/src/c172/c172x/c172x.jl`:
- `Actuator1` first-order servo (`c172x.jl:19-53`) and `Actuator2`
  second-order underdamped servo with clamped output position
  (`c172x.jl:56-106`); saturation is flagged on the *command*, not the
  position (which only tends asymptotically to it)
- `FlyByWireActuation` defaults to seven `Actuator1(tau=0.05)` channels
  (`:113-121`), but any channel may be swapped for an `Actuator2`
- actuation -> systems assignment with the C172S sign conventions
  (`:126-143`)
- trim assignment seeding actuator positions = commands (`:268-276`)
- NED state-space extraction x(20)/u(4)/y(38) incl. the four primary
  actuator positions (`:332-498`)
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.physics import kinematics as K
from flightjax.physics import piston as PE
from flightjax.physics.aircraftbase import (Aircraft, SimpleWorld, Vehicle,
                                            make_gauss_newton_solver)
from flightjax.physics.linearization import LinearizedSS, linearize

from flightjax.models.c172 import common as C172
from flightjax.models.c172.c172s import power_plant

ACT_CHANNELS = ("throttle", "aileron", "elevator", "rudder", "flaps",
                "brake_left", "brake_right")
ACT_RANGES = {"throttle": (0.0, 1.0), "aileron": (-1.0, 1.0),
              "elevator": (-1.0, 1.0), "rudder": (-1.0, 1.0),
              "flaps": (0.0, 1.0), "brake_left": (0.0, 1.0),
              "brake_right": (0.0, 1.0)}
ACT_TAU = 0.05


def _saturation(cmd, lo, hi):
    """`Ranged` saturation flag of the *command* (`types.jl:64`,
    `c172x.jl:46,66`): +1 at/above the upper bound, -1 at/below the lower,
    0 inside."""
    return (jnp.asarray(cmd >= hi, jnp.int32)
            - jnp.asarray(cmd <= lo, jnp.int32))


class Actuator1:
    """First-order servo (`c172x.jl:19-53`): F(s) = 1/(1 + s tau).

    State = scalar position p; x_dot = (cmd - p)/tau. The reported position
    is clamped to the command range, and `sat` flags command saturation."""

    order = 1

    def __init__(self, tau=ACT_TAU, range=(-1.0, 1.0)):
        self.tau = tau
        self.range = range

    def init_x(self, pos=0.0):
        return jnp.asarray(pos)

    def trim_x(self, cmd):
        # position = command makes the servo derivative vanish (`c172x.jl`
        # trim assignment `:268-276`)
        return jnp.asarray(cmd)

    def f_ode(self, x, cmd):
        lo, hi = self.range
        c = jnp.clip(cmd, lo, hi)
        pos = jnp.clip(x, lo, hi)
        y = {"cmd": c, "pos": pos, "sat": _saturation(cmd, lo, hi)}
        return y, (c - x) / self.tau


class Actuator2:
    """Second-order servo (`c172x.jl:56-106`): underdamped by default
    (omega_n = 10*pi rad/s, zeta = 0.6), so the position state can
    transiently overshoot the command range; the *output* position is
    clamped (a clutched output actuator), while saturation is flagged on
    the command, which the state only approaches asymptotically."""

    order = 2

    def __init__(self, omega_n=10.0 * np.pi, zeta=0.6, range=(-1.0, 1.0)):
        self.omega_n = omega_n
        self.zeta = zeta
        self.range = range

    def init_x(self, pos=0.0, vel=0.0):
        return {"p": jnp.asarray(pos), "v": jnp.asarray(vel)}

    def trim_x(self, cmd):
        return {"p": jnp.asarray(cmd), "v": jnp.asarray(0.0)}

    def f_ode(self, x, cmd):
        lo, hi = self.range
        c = jnp.clip(cmd, lo, hi)
        pos = jnp.clip(x["p"], lo, hi)
        y = {"cmd": c, "pos": pos, "vel": x["v"],
             "sat": _saturation(cmd, lo, hi)}
        x_dot = {"p": x["v"],
                 "v": self.omega_n ** 2 * (c - x["p"])
                      - 2.0 * self.zeta * self.omega_n * x["v"]}
        return y, x_dot


class FlyByWireActuation:
    """Seven servo channels; continuous state = servo states.

    Defaults to `Actuator1(tau=0.05)` on every channel like the reference
    (`c172x.jl:113-121`); pass `actuators={"elevator": Actuator2(), ...}`
    to override individual channels.

    Protocol (see `flightjax.models.c172.common.Systems`): f_ode(x, u, t) ->
    (act_y, assignments, extra x_dot). x["act"][ch] is the servo state
    (scalar position for 1st-order, {"p","v"} for 2nd-order); u[ch] the
    command. act_y keeps the transposed {"cmd","pos","sat"[,"vel"]}[ch]
    layout consumed by the control laws and state-space extraction."""

    def __init__(self, actuators=None):
        self.actuators = {
            ch: Actuator1(ACT_TAU, ACT_RANGES[ch]) for ch in ACT_CHANNELS}
        if actuators:
            for ch, act in actuators.items():
                if ch not in ACT_RANGES:
                    raise KeyError(f"unknown actuation channel {ch!r}")
                act.range = ACT_RANGES[ch]
                self.actuators[ch] = act

    def init_u(self):
        return {ch: jnp.asarray(0.0) for ch in ACT_CHANNELS} | {
            "mixture": jnp.asarray(0.5)}

    def init_x_extra(self, positions=None):
        return {"act": {
            ch: self.actuators[ch].init_x(
                0.0 if positions is None else positions[ch])
            for ch in ACT_CHANNELS}}

    def trim_x(self, cmds):
        """Per-channel servo states at which derivatives vanish for the
        given commands (`c172x.jl` trim assignment `:268-276`)."""
        return {ch: self.actuators[ch].trim_x(cmds[ch]) for ch in ACT_CHANNELS}

    def f_ode(self, x, u, t):
        pos, cmd, sat, vel, x_dot = {}, {}, {}, {}, {}
        for ch in ACT_CHANNELS:
            y, dx = self.actuators[ch].f_ode(x["act"][ch], u[ch])
            cmd[ch], pos[ch], sat[ch] = y["cmd"], y["pos"], y["sat"]
            if "vel" in y:
                vel[ch] = y["vel"]
            x_dot[ch] = dx

        asg = {
            "e": -pos["elevator"], "a": pos["aileron"], "r": -pos["rudder"],
            "f": pos["flaps"],
            "steering": pos["rudder"],
            "brake_left": pos["brake_left"], "brake_right": pos["brake_right"],
            "throttle": pos["throttle"],
            "mixture": jnp.clip(u["mixture"], 0.0, 1.0),
        }
        act_y = {"cmd": cmd, "pos": pos, "sat": sat}
        if vel:
            act_y["vel"] = vel
        return act_y, asg, {"act": x_dot}


def build_vehicle(kinematics="wa", atmosphere=None, terrain=None,
                  actuators=None, turbulence=None) -> Vehicle:
    kin = {"wa": K.WA, "ecef": K.ECEF, "ned": K.NED}[kinematics]()
    systems = C172.Systems(power_plant(), FlyByWireActuation(actuators))
    return Vehicle(systems, kin, atmosphere=atmosphere, terrain=terrain,
                   turbulence=turbulence)


def build_aircraft(kinematics="wa", avionics=None, **kw) -> Aircraft:
    return Aircraft(build_vehicle(kinematics, **kw), avionics=avionics)


# ------------------------------------------------------------------- trim

def trim_assign(vehicle: Vehicle, tp: C172.TrimParameters, ts: C172.TrimState):
    """(`c172x.jl:289-325`): like the C172S, plus actuator positions seeded
    to their commands so actuator state derivatives vanish at trim."""
    kin_ic = C172.trim_kin_init(ts, tp, vehicle.atmosphere,
                                vehicle.atmosphere.init_u())

    x = vehicle.init_x(kin_ic)
    x["systems"]["aero"] = {"alpha_filt": ts.alpha_a, "beta_filt": tp.beta_a}
    x["systems"]["pwp"]["engine"]["omega"] = \
        ts.n_eng * vehicle.systems.pwp.engine.omega_rated
    x["systems"]["pwp"]["engine"]["idle"] = jnp.asarray(0.0)
    x["systems"]["pwp"]["engine"]["frc"] = jnp.asarray(0.0)
    x["systems"]["fuel"] = tp.fuel_load

    cmds = {"throttle": ts.throttle, "aileron": ts.aileron,
            "elevator": ts.elevator, "rudder": ts.rudder,
            "flaps": tp.flaps, "brake_left": jnp.asarray(0.0),
            "brake_right": jnp.asarray(0.0)}
    x["systems"]["act"] = vehicle.systems.act.trim_x(cmds)

    u = vehicle.init_u()
    u["systems"]["act"].update(cmds)
    u["systems"]["act"]["mixture"] = tp.mixture
    u["systems"]["pld"] = dict(tp.payload)

    s = vehicle.init_s(x=x, engine_state=PE.ENG_RUNNING, stall=False)
    return x, u, s


def trim_residual(vehicle: Vehicle, tp: C172.TrimParameters, ts_vec):
    ts = C172.TrimState(*[ts_vec[i] for i in range(7)])
    x, u, s = trim_assign(vehicle, tp, ts)
    x_dot, y = vehicle.f_ode(x, u, s, 0.0)
    v_norm = jnp.linalg.norm(y.kinematics.v_eb_b)
    return jnp.concatenate([
        x_dot["dynamics"]["v_eb_b"] / v_norm,
        x_dot["dynamics"]["omega_eb_b"],
        jnp.atleast_1d(x_dot["systems"]["pwp"]["engine"]["omega"]
                       / vehicle.systems.pwp.engine.omega_rated),
    ])


def trim(vehicle: Vehicle, tp: C172.TrimParameters = None, iters=30):
    """Multi-start bounded Gauss-Newton trim (see c172s.trim)."""
    if tp is None:
        tp = C172.trim_parameters()
    # cache the jitted solver on the vehicle: repeated trims at different
    # conditions (envelope sweeps) then reuse one compilation
    solver = getattr(vehicle, "_trim_solver", None)
    if solver is None:
        solver = make_gauss_newton_solver(
            lambda ts_vec, tp: trim_residual(vehicle, tp, ts_vec),
            C172.TRIM_LB, C172.TRIM_UB, iters=iters, batched=True)
        vehicle._trim_solver = solver
    ts_vecs, rnorms = solver(C172.TRIM_STARTS, tp)
    best = jnp.argmin(rnorms)
    ts_vec, rnorm = ts_vecs[best], rnorms[best]
    ts = C172.TrimState(*[ts_vec[i] for i in range(7)])
    x, u, s = trim_assign(vehicle, tp, ts)
    return x, u, s, ts, rnorm


# ------------------------------------------------------- NED state space

X_SS_LABELS = ("p", "q", "r", "psi", "theta", "phi", "v_x", "v_y", "v_z",
               "lat", "lon", "h", "alpha_filt", "beta_filt", "omega_eng",
               "fuel", "thr_p", "ail_p", "ele_p", "rud_p")
U_SS_LABELS = ("throttle_cmd", "aileron_cmd", "elevator_cmd", "rudder_cmd")
Y_SS_LABELS = ("p", "q", "r", "psi", "theta", "phi", "v_x", "v_y", "v_z",
               "lat", "lon", "h", "alpha_filt", "beta_filt", "omega_eng",
               "n_eng", "fuel", "thr_p", "ail_p", "ele_p", "rud_p",
               "f_x", "f_y", "f_z", "alpha", "beta", "EAS", "TAS",
               "v_N", "v_E", "v_D", "chi", "gamma", "climb_rate",
               "throttle_cmd", "aileron_cmd", "elevator_cmd", "rudder_cmd")


def get_x_ss(x):
    kin, dyn, sys = x["kinematics"], x["dynamics"], x["systems"]
    act = sys["act"]
    return jnp.concatenate([
        dyn["omega_eb_b"], jnp.stack([kin["psi"], kin["theta"], kin["phi"]]),
        dyn["v_eb_b"], jnp.stack([kin["lat"], kin["lon"], kin["h_e"]]),
        jnp.stack([sys["aero"]["alpha_filt"], sys["aero"]["beta_filt"],
                   sys["pwp"]["engine"]["omega"], sys["fuel"],
                   act["throttle"], act["aileron"], act["elevator"],
                   act["rudder"]]),
    ])


def assign_x_ss(x, v):
    x = {"kinematics": dict(x["kinematics"]), "dynamics": dict(x["dynamics"]),
         "systems": {"aero": dict(x["systems"]["aero"]),
                     "ldg": x["systems"]["ldg"],
                     "pwp": {"engine": dict(x["systems"]["pwp"]["engine"])},
                     "fuel": x["systems"]["fuel"],
                     "act": dict(x["systems"]["act"])}}
    x["dynamics"]["omega_eb_b"] = v[0:3]
    k = x["kinematics"]
    k["psi"], k["theta"], k["phi"] = v[3], v[4], v[5]
    x["dynamics"]["v_eb_b"] = v[6:9]
    k["lat"], k["lon"], k["h_e"] = v[9], v[10], v[11]
    x["systems"]["aero"]["alpha_filt"] = v[12]
    x["systems"]["aero"]["beta_filt"] = v[13]
    x["systems"]["pwp"]["engine"]["omega"] = v[14]
    x["systems"]["fuel"] = v[15]
    a = x["systems"]["act"]
    a["throttle"], a["aileron"], a["elevator"], a["rudder"] = \
        v[16], v[17], v[18], v[19]
    return x


def get_u_ss(u):
    act = u["systems"]["act"]
    return jnp.stack([act["throttle"], act["aileron"], act["elevator"],
                      act["rudder"]])


def assign_u_ss(u, v):
    u = {"systems": dict(u["systems"]), "atm": u["atm"], "trn": u["trn"]}
    u["systems"]["act"] = dict(u["systems"]["act"], throttle=v[0],
                               aileron=v[1], elevator=v[2], rudder=v[3])
    return u


def get_y_ss(x, u, y, omega_rated):
    kin, dyn, air, sys = y.kinematics, y.dynamics, y.airflow, y.systems
    act_pos = sys.act["pos"]
    act_u = u["systems"]["act"]
    return jnp.concatenate([
        kin.omega_eb_b, kin.e_nb, kin.v_eb_b,
        jnp.stack([kin.lat, kin.lon, kin.h_e]),
        jnp.stack([sys.aero.alpha_filt, sys.aero.beta_filt,
                   sys.pwp.engine.omega, sys.pwp.engine.omega / omega_rated,
                   sys.fuel.x_avail,
                   act_pos["throttle"], act_pos["aileron"],
                   act_pos["elevator"], act_pos["rudder"]]),
        dyn.f_c_c,
        jnp.stack([sys.aero.alpha, sys.aero.beta, air.EAS, air.TAS]),
        kin.v_eb_n,
        jnp.stack([kin.chi_gnd, kin.gamma_gnd, -kin.v_eb_n[2]]),
        jnp.stack([act_u["throttle"], act_u["aileron"], act_u["elevator"],
                   act_u["rudder"]]),
    ])


_NED_VEHICLE = None


def linearize_ned(tp: C172.TrimParameters = None, iters=30):
    """Trim + exact-Jacobian linearization of the NED C172X
    (`c172x.jl:332-498`). The NED vehicle (and its jitted trim solver) is
    cached across calls — envelope sweeps linearize at 28 points."""
    global _NED_VEHICLE
    if _NED_VEHICLE is None:
        _NED_VEHICLE = build_vehicle("ned")
    vehicle = _NED_VEHICLE
    if tp is None:
        tp = C172.trim_parameters()
    x0, u0, s0, ts, rnorm = trim(vehicle, tp, iters=iters)
    w_rated = vehicle.systems.pwp.engine.omega_rated

    def f(xv, uv, x0, u0, s0):
        x = assign_x_ss(x0, xv)
        u = assign_u_ss(u0, uv)
        x_dot, _ = vehicle.f_ode(x, u, s0, 0.0)
        return get_x_ss(x_dot)

    def h(xv, uv, x0, u0, s0):
        x = assign_x_ss(x0, xv)
        u = assign_u_ss(u0, uv)
        _, y = vehicle.f_ode(x, u, s0, 0.0)
        return get_y_ss(x, u, y, w_rated)

    lss = linearize(f, h, get_x_ss(x0), get_u_ss(u0),
                    X_SS_LABELS, U_SS_LABELS, Y_SS_LABELS,
                    captures=(x0, u0, s0), cache_key="c172x_ned")
    return lss, ts, rnorm


# ------------------------------------------------------------ world builders

def build_xv1(kinematics="wa", gains=None, **kw) -> Aircraft:
    """Cessna172Xv1 = FBW + ControlLaws (`c172x1.jl`)."""
    from flightjax.models.c172.c172x_ctl import ControlLaws
    return Aircraft(build_vehicle(kinematics, **kw),
                    avionics=ControlLaws(gains))


def build_xv2(kinematics="wa", gains=None, **kw) -> Aircraft:
    """Cessna172Xv2 = FBW + {GuidanceLaws, ControlLaws} (`c172x2.jl`)."""
    from flightjax.models.c172.c172x_gdc import Avionics
    return Aircraft(build_vehicle(kinematics, **kw),
                    avionics=Avionics(gains))


def build_xv1_nav(kinematics="wa", gains=None, periodic_dt=0.02,
                  use_estimates=True, nav_kw=None, **kw) -> Aircraft:
    """Cessna172Xv1 flying on ESTIMATED states: FBW + NavAvionics(
    SensorSuite -> InsGps -> ControlLaws). No reference counterpart —
    Flight.jl's control laws read true KinData (`aircraftbase.jl:201-210`);
    see `flightjax.physics.navigation`. `periodic_dt` must match the
    Simulation's periodic interval (the sensor/filter rate)."""
    from flightjax.models.c172.c172x_ctl import ControlLaws
    from flightjax.physics.navigation import NavAvionics
    nav = NavAvionics(ControlLaws(gains), dt=periodic_dt,
                      use_estimates=use_estimates, **(nav_kw or {}))
    return Aircraft(build_vehicle(kinematics, **kw), avionics=nav)


def build_xv2_nav(kinematics="wa", gains=None, periodic_dt=0.02,
                  use_estimates=True, nav_kw=None, **kw) -> Aircraft:
    """Cessna172Xv2 flying on ESTIMATED states: FBW + NavAvionics(
    SensorSuite -> InsGps -> {GuidanceLaws, ControlLaws}) — segment and
    LOITER guidance closed entirely over the navigation solution (the
    guidance laws consume the estimated position/course through the
    same estimated VehicleY as the control laws)."""
    from flightjax.models.c172.c172x_gdc import Avionics
    from flightjax.physics.navigation import NavAvionics
    nav = NavAvionics(Avionics(gains), dt=periodic_dt,
                      use_estimates=use_estimates, **(nav_kw or {}))
    return Aircraft(build_vehicle(kinematics, **kw), avionics=nav)


def trim_world(aircraft: Aircraft, tp: C172.TrimParameters = None,
               periodic_dt=0.02):
    """World-level SimState at trim with bumpless avionics startup
    (`c172x_ctl.jl:463-519`). Returns (SimState, trim_state, residual_norm)."""
    from flightjax.core.sim import SimState

    # trim + bumpless avionics startup are eager design-time work: pin them
    # to the host CPU (pathologically slow over a remote-accelerator tunnel)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x, u, s, ts, rnorm = trim(aircraft.vehicle, tp)
        x_w, u_w = {"vehicle": x}, {"vehicle": u}
        s_w = {"vehicle": s, "terminated": jnp.asarray(False)}
        if aircraft.avionics is not None:
            _, veh_y = aircraft.vehicle.f_ode(x, u, s, 0.0)
            av_u, av_s = aircraft.avionics.init_from_trim(veh_y, periodic_dt)
            u_w["avionics"] = av_u
            s_w["avionics"] = av_s
    from flightjax.core.modeling import canonical
    state = canonical(SimState(t=jnp.asarray(0.0),
                               i=jnp.asarray(0, dtype=jnp.int32),
                               x=x_w, u=u_w, s=s_w))
    return state, ts, rnorm
