"""Cessna 172S: classic variant with mechanical actuation.

Mirrors `/root/reference/lib/FlightApps/src/c172/c172s/c172s.jl`:
- `PowerPlant()` = IO-360 + fixed-pitch 2-blade prop at [2.055, 0, 0.833]
  (`c172s.jl:16-34`)
- `MechanicalActuation`: direct pass-through with offsets and elevator /
  rudder sign inversions (`:60-120`)
- trim assignment building the full vehicle state from (TrimState,
  TrimParameters) (`:227-263`)
- NED state-space extraction x(16)/u(4)/y(33) for linearization
  (`:269-412`)
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import Component
from flightjax.ops import geodesy as geo
from flightjax.physics import kinematics as K
from flightjax.physics import piston as PE
from flightjax.physics import propellers as PR
from flightjax.physics.aircraftbase import (Aircraft, SimpleWorld, Vehicle,
                                            make_gauss_newton_solver)
from flightjax.physics.atmosphere import SimpleAtmosphere
from flightjax.physics.linearization import LinearizedSS, linearize
from flightjax.physics.terrain import HorizontalTerrain

from flightjax.models.c172 import common as C172

_PROP_CACHE = "flightjax/data/c172_prop_2blade.npz"


def power_plant() -> PE.PistonThruster:
    """IO-360 + fixed-pitch 2-blade propeller (`c172s.jl:16-34`)."""
    import os
    cache = os.path.join(os.path.dirname(__file__), "..", "..", "data",
                         "c172_prop_2blade.npz")
    lookup = PR.generate_lookup(cache=os.path.normpath(cache))
    prop = PR.Propeller(lookup, pitch=("fixed", 0.0), sense=PR.CW, d=2.0,
                        J_xx=0.3, r_bp=[2.055, 0.0, 0.833])
    return PE.PistonThruster(PE.PistonEngine(), prop, gear_ratio=1.0)


class MechanicalActuation:
    """Direct mechanical linkage (`c172s.jl:60-120`). Stateless; outputs the
    aero/gear/engine assignments with the reference's sign conventions:
    aero.e = -(elevator_offset + elevator), aero.r = -(rudder_offset +
    rudder), nose steering = +(rudder_offset + rudder)."""

    U_FIELDS = ("aileron", "elevator", "rudder", "aileron_offset",
                "elevator_offset", "rudder_offset", "flaps", "brake_left",
                "brake_right", "throttle", "mixture")

    def init_u(self):
        u = {k: jnp.asarray(0.0) for k in self.U_FIELDS}
        u["mixture"] = jnp.asarray(0.5)
        return u

    def init_x_extra(self):
        return {}

    def f_ode(self, x, u, t):
        clip1 = lambda v: jnp.clip(v, -1.0, 1.0)
        ail = clip1(u["aileron_offset"] + u["aileron"])
        elv = clip1(u["elevator_offset"] + u["elevator"])
        rud = clip1(u["rudder_offset"] + u["rudder"])
        asg = {
            "e": -elv, "a": ail, "r": -rud,
            "f": jnp.clip(u["flaps"], 0.0, 1.0),
            "steering": rud,
            "brake_left": jnp.clip(u["brake_left"], 0.0, 1.0),
            "brake_right": jnp.clip(u["brake_right"], 0.0, 1.0),
            "throttle": jnp.clip(u["throttle"], 0.0, 1.0),
            "mixture": jnp.clip(u["mixture"], 0.0, 1.0),
        }
        return dict(u), asg, {}


def build_vehicle(kinematics="wa", atmosphere=None, terrain=None,
                  turbulence=None) -> Vehicle:
    kin = {"wa": K.WA, "ecef": K.ECEF, "ned": K.NED}[kinematics]()
    systems = C172.Systems(power_plant(), MechanicalActuation())
    return Vehicle(systems, kin, atmosphere=atmosphere, terrain=terrain,
                   turbulence=turbulence)


def build_aircraft(kinematics="wa", avionics=None, **kw) -> Aircraft:
    return Aircraft(build_vehicle(kinematics, **kw), avionics=avionics)


# ------------------------------------------------------------------- trim

def trim_assign(vehicle: Vehicle, tp: C172.TrimParameters, ts: C172.TrimState):
    """Build the full vehicle (x, u, s) at a trim point (`c172s.jl:227-263`
    + `c172s.jl:168-220`)."""
    kin_ic = C172.trim_kin_init(ts, tp, vehicle.atmosphere,
                                vehicle.atmosphere.init_u())

    x = vehicle.init_x(kin_ic)
    x["systems"]["aero"] = {"alpha_filt": ts.alpha_a, "beta_filt": tp.beta_a}
    x["systems"]["pwp"]["engine"]["omega"] = ts.n_eng * vehicle.systems.pwp.engine.omega_rated
    x["systems"]["pwp"]["engine"]["idle"] = jnp.asarray(0.0)
    x["systems"]["pwp"]["engine"]["frc"] = jnp.asarray(0.0)
    x["systems"]["fuel"] = tp.fuel_load

    u = vehicle.init_u()
    act = u["systems"]["act"]
    act["aileron"] = ts.aileron
    act["elevator"] = ts.elevator
    act["rudder"] = ts.rudder
    act["flaps"] = tp.flaps
    act["throttle"] = ts.throttle
    act["mixture"] = tp.mixture
    u["systems"]["pld"] = dict(tp.payload)

    s = vehicle.init_s(x=x, engine_state=PE.ENG_RUNNING, stall=False)
    return x, u, s


def trim_residual(vehicle: Vehicle, tp: C172.TrimParameters, ts_vec):
    """7-dim dynamics residual whose root is the reference's zero-cost trim
    (`c172.jl:857-867`)."""
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
    """Solve the trim problem from a multi-start pool (batched Gauss-Newton);
    returns (x, u, s, trim_state, residual_norm)."""
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
               "fuel")
U_SS_LABELS = ("throttle", "aileron", "elevator", "rudder")
Y_SS_LABELS = X_SS_LABELS + (
    "f_x", "f_y", "f_z", "alpha", "beta", "EAS", "TAS", "v_N", "v_E", "v_D",
    "chi", "gamma", "climb_rate", "throttle_out", "aileron_out",
    "elevator_out", "rudder_out")


def get_x_ss(x):
    """Vehicle x pytree (NED kinematics) -> 16-vector (`c172s.jl:304-320`)."""
    kin, dyn, sys = x["kinematics"], x["dynamics"], x["systems"]
    return jnp.concatenate([
        dyn["omega_eb_b"], jnp.stack([kin["psi"], kin["theta"], kin["phi"]]),
        dyn["v_eb_b"], jnp.stack([kin["lat"], kin["lon"], kin["h_e"]]),
        jnp.stack([sys["aero"]["alpha_filt"], sys["aero"]["beta_filt"],
                   sys["pwp"]["engine"]["omega"], sys["fuel"]]),
    ])


def assign_x_ss(x, v):
    """16-vector -> vehicle x pytree (`c172s.jl:390-412`)."""
    x = jax.tree.map(lambda a: a, x)  # shallow-ish copy
    x = {"kinematics": dict(x["kinematics"]), "dynamics": dict(x["dynamics"]),
         "systems": {"aero": dict(x["systems"]["aero"]),
                     "ldg": x["systems"]["ldg"],
                     "pwp": {"engine": dict(x["systems"]["pwp"]["engine"])},
                     "fuel": x["systems"]["fuel"]}}
    x["dynamics"]["omega_eb_b"] = v[0:3]
    x["kinematics"]["psi"], x["kinematics"]["theta"], x["kinematics"]["phi"] = \
        v[3], v[4], v[5]
    x["dynamics"]["v_eb_b"] = v[6:9]
    x["kinematics"]["lat"], x["kinematics"]["lon"], x["kinematics"]["h_e"] = \
        v[9], v[10], v[11]
    x["systems"]["aero"]["alpha_filt"] = v[12]
    x["systems"]["aero"]["beta_filt"] = v[13]
    x["systems"]["pwp"]["engine"]["omega"] = v[14]
    x["systems"]["fuel"] = v[15]
    return x


def assign_u_ss(u, v):
    u = {"systems": dict(u["systems"]), "atm": u["atm"], "trn": u["trn"]}
    u["systems"]["act"] = dict(u["systems"]["act"], throttle=v[0],
                               aileron=v[1], elevator=v[2], rudder=v[3])
    return u


def get_u_ss(u):
    act = u["systems"]["act"]
    return jnp.stack([act["throttle"], act["aileron"], act["elevator"],
                      act["rudder"]])


def get_y_ss(x, u, y):
    """Vehicle output -> 33-vector (`c172s.jl:330-369`)."""
    kin, dyn, air, sys = y.kinematics, y.dynamics, y.airflow, y.systems
    act = u["systems"]["act"]
    return jnp.concatenate([
        kin.omega_eb_b, kin.e_nb,  # [psi, theta, phi]
        kin.v_eb_b,
        jnp.stack([kin.lat, kin.lon, kin.h_e]),
        jnp.stack([sys.aero.alpha_filt, sys.aero.beta_filt,
                   sys.pwp.engine.omega, sys.fuel.x_avail]),
        dyn.f_c_c,
        jnp.stack([sys.aero.alpha, sys.aero.beta, air.EAS, air.TAS]),
        kin.v_eb_n,
        jnp.stack([kin.chi_gnd, kin.gamma_gnd, -kin.v_eb_n[2]]),
        jnp.stack([act["throttle"], act["aileron"], act["elevator"],
                   act["rudder"]]),
    ])


_NED_VEHICLE = None


def linearize_ned(tp: C172.TrimParameters = None, iters=30) -> LinearizedSS:
    """Trim + exact-Jacobian linearization of the NED-kinematics vehicle
    (`aircraftbase.jl:292-334`). Wind is forced to zero (the atmosphere
    default) so velocity states are aerodynamic. The vehicle and the jitted
    Jacobian pass are cached across calls; the trim point rides through as
    traced `captures`, so envelope sweeps pay one compile."""
    global _NED_VEHICLE
    if _NED_VEHICLE is None:
        _NED_VEHICLE = build_vehicle("ned")
    vehicle = _NED_VEHICLE
    if tp is None:
        tp = C172.trim_parameters()
    x0, u0, s0, ts, rnorm = trim(vehicle, tp, iters=iters)

    def f(xv, uv, x0, u0, s0):
        x = assign_x_ss(x0, xv)
        u = assign_u_ss(u0, uv)
        x_dot, _ = vehicle.f_ode(x, u, s0, 0.0)
        return get_x_ss(x_dot)

    def h(xv, uv, x0, u0, s0):
        x = assign_x_ss(x0, xv)
        u = assign_u_ss(u0, uv)
        _, y = vehicle.f_ode(x, u, s0, 0.0)
        return get_y_ss(x, u, y)

    lss = linearize(f, h, get_x_ss(x0), get_u_ss(u0),
                    X_SS_LABELS, U_SS_LABELS, Y_SS_LABELS,
                    captures=(x0, u0, s0), cache_key="c172s_ned")
    return lss, ts, rnorm


# get_x_ss maps x_dot through the same extraction: x_dot pytree has the same
# structure as x for the NED mechanization (psi/theta/phi/lat/lon/h_e keys).


# ------------------------------------------------------------- flagship sim

def flagship_world(kinematics="wa", **kw) -> SimpleWorld:
    """`**kw` forwards to `build_vehicle` (atmosphere/terrain/turbulence),
    so e.g. `flagship_world(turbulence=DrydenTurbulence(0.02))` is the
    supported way to opt the canonical fleet entry point into gusts."""
    return SimpleWorld(build_aircraft(kinematics, **kw))


def flagship_sim():
    """(sim, trimmed initial SimState, ctx) on the WA-kinematics C172S —
    consumed by bench.py and __graft_entry__.py."""
    import jax as _jax
    from flightjax.core.sim import Simulation

    world = flagship_world("wa")
    # geoid_every=128: the carried EGM96 undulation refreshes every 128th
    # step via Simulation.fleet_step — at ~1.5 m of travel per 20 ms step
    # the undulation moves micrometres between refreshes (slope <~1e-4 m/m,
    # so the ~190 m between refreshes changes N by <2 cm), while the
    # refresh itself is the widest HBM read in the step (two [B,1441] row
    # gathers, measured ~190 us per firing at batch 4096)
    # gear_gate_margin=10: with every lane >=10 m above terrain (wheels sit
    # ~3 m below Ob; <2 m of state motion per 20 ms step) no leg can have
    # weight on wheel, so fleet_step skips the strut/contact math behind a
    # scalar lax.cond (measured 56 us/fleet-step at batch 4096,
    # tools/exp_gearskip.py); ground/landing fleets take the full path
    sim = Simulation(world, dt=0.02, periodic_dt=0.02, geoid_every=128,
                     gear_gate_margin=10.0)

    # trim on the host CPU (eager design-time work), then assemble the
    # aircraft/world-level SimState
    with _jax.default_device(_jax.local_devices(backend="cpu")[0]):
        vehicle = world.aircraft.vehicle
        x, u, s, _, _ = trim(vehicle, C172.trim_parameters())

    from flightjax.core.modeling import canonical
    from flightjax.core.sim import SimState
    state = canonical(SimState(
        t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
        x={"vehicle": x}, u={"vehicle": u},
        s={"vehicle": s, "terminated": jnp.asarray(False)}))
    # f32 runs get Kahan-compensated position accumulation (no-op in f64)
    return sim, sim.with_compensation(state), ()
