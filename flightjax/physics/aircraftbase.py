"""Vehicle / Aircraft / World scaffolding + trim machinery.

Mirrors `/root/reference/lib/FlightPhysics/src/aircraftbase.jl` and
`world.jl`:
- `Vehicle` = {systems, kinematics, dynamics} with the update order
  kinematics.u <- dynamics.x -> f_ode(kin) -> KinData/AirData ->
  f_ode(systems) -> gather mp/wr/hr -> f_ode(dynamics)
  (`aircraftbase.jl:142-170`)
- `Aircraft` = {vehicle, avionics}: avionics update first, `assign` maps
  avionics outputs onto systems inputs, then vehicle update
  (`aircraftbase.jl:221-252`)
- `SimpleWorld` = {aircraft, atmosphere, terrain} (`world.jl:26-57`)
- trim pitch constraint `theta_constraint` (`aircraftbase.jl:110-118`)
- trim solver: the reference minimizes the squared dynamics residual with
  NLopt BOBYQA (`c172.jl:883-942`); here the same stationary point is found
  by a bounded damped Gauss-Newton on the 7-var residual with exact
  `jax.jacfwd` Jacobians — jittable and vmappable over batches of trim
  conditions.

Systems protocol (the L2->L3 interface, `dynamics.jl:328-399`): a systems
component's `f_ode(x, u, s, t, kin, air, trn_fn)` returns `(x_dot, y)` where
`y.mp_b / y.wr_b / y.hr_b` are the aggregated mass properties, external
wrench and internal angular momentum — the functional replacement for the
reference's @generated recursive summation.
"""

import contextlib
import contextvars
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flightjax.core.modeling import Component
from flightjax.physics.atmosphere import SimpleAtmosphere, air_data, AirData
from flightjax.physics.dynamics import VehicleDynamics, DynamicsU, DynamicsData
from flightjax.physics.kinematics import KinData, vel_input
from flightjax.physics.terrain import HorizontalTerrain


# Trace-scoped deferral of the per-step EGM96 geoid refresh. A context-local
# (not an attribute on the Vehicle) so concurrent traces of the same
# component tree cannot race on shared mutable state.
_geoid_deferred = contextvars.ContextVar("flightjax_geoid_deferred",
                                         default=False)


@contextlib.contextmanager
def geoid_deferred():
    """Within this scope, `Vehicle.f_step` carries `s['geoid_N']` forward
    unchanged; the caller must refresh it once per step via
    `Vehicle.refresh_geoid` (see `Simulation.fleet_step`)."""
    token = _geoid_deferred.set(True)
    try:
        yield
    finally:
        _geoid_deferred.reset(token)


def theta_constraint(v_wb_b, gamma_wb_n, phi_nb):
    """Pitch angle from wind-relative velocity, flight-path angle and bank
    (`aircraftbase.jl:110-118`)."""
    TAS = jnp.linalg.norm(v_wb_b, axis=-1)
    a = v_wb_b[..., 0] / TAS
    b = (v_wb_b[..., 1] * jnp.sin(phi_nb)
         + v_wb_b[..., 2] * jnp.cos(phi_nb)) / TAS
    sg = jnp.sin(gamma_wb_n)
    return jnp.arctan((a * b + sg * jnp.sqrt(a**2 + b**2 - sg**2))
                      / (a**2 - sg**2))


class VehicleY(NamedTuple):
    systems: "object"
    kinematics: KinData
    dynamics: DynamicsData
    airflow: AirData


class NoSystemsY(NamedTuple):
    mp_b: "object"
    wr_b: "object"
    hr_b: "object"


class NoVehicleSystems:
    """Placeholder vehicle systems (`aircraftbase.jl:27-43`): a bare rigid
    body with a configurable mass distribution, zero external wrench and
    zero internal angular momentum. Lets a `Vehicle` run standalone as a
    free 6-DOF body for kinematics/dynamics work."""

    def __init__(self, mass=1.0, J=None):
        from flightjax.physics.dynamics import ft_identity, mass_props_rigid
        J = jnp.eye(3) if J is None else jnp.asarray(J)
        self._mp_b = mass_props_rigid(jnp.asarray(mass), J, ft_identity())

    def init_x(self):
        return {}

    def init_u(self):
        return {}

    def init_s(self, **kw):
        return {}

    def f_ode(self, x, u, s, t, kin, air, trn_fn):
        from flightjax.physics.dynamics import wrench_zero
        y = NoSystemsY(mp_b=self._mp_b, wr_b=wrench_zero(),
                       hr_b=jnp.zeros(3))
        return {}, y

    def f_step(self, x, u, s, t, kin, air, trn_fn):
        return x, s


class Vehicle(Component):
    """Systems + kinematics + dynamics composite (`aircraftbase.jl:49-195`)."""

    def __init__(self, systems, kinematics,
                 atmosphere: SimpleAtmosphere = None,
                 terrain: HorizontalTerrain = None,
                 turbulence=None):
        # systems=None mirrors the reference default (`aircraftbase.jl:51`)
        self.systems = systems if systems is not None else NoVehicleSystems()
        self.kinematics = kinematics
        self.dynamics = VehicleDynamics()
        self.atmosphere = atmosphere if atmosphere is not None else SimpleAtmosphere()
        self.terrain = terrain if terrain is not None else HorizontalTerrain()
        # optional Dryden gust model (physics/turbulence.py) — beyond the
        # reference (its wind is uniform only, `atmosphere.jl:151-181`).
        # None keeps the state tree identical to the turbulence-free build.
        self.turbulence = turbulence

    # x/u/s layout: atmosphere and terrain inputs ride in the vehicle u so a
    # fleet can see per-lane winds/surfaces
    def init_x(self, kin_init=None, **sys_kw):
        x = {"kinematics": self.kinematics.init_x(kin_init),
             "dynamics": self.kinematics.init_u(kin_init),
             "systems": self.systems.init_x(**sys_kw)}
        if self.turbulence is not None:
            x["turb"] = self.turbulence.init_x()
        return x

    def init_u(self):
        u = {"systems": self.systems.init_u(),
             "atm": self.atmosphere.init_u(),
             "trn": self.terrain.init_u()}
        if self.turbulence is not None:
            u["turb"] = self.turbulence.init_u()
        return u

    def init_s(self, x=None, **kw):
        """`x` (the vehicle continuous state) seeds the carried geoid
        undulation; without it N starts at 0 and corrects at the first
        f_step."""
        if x is not None:
            _, kin = self.kinematics.f_ode(x["kinematics"], x["dynamics"],
                                           None, 0.0)
            from flightjax.ops.geodesy import geoid_height
            N = geoid_height(kin.n_e)
        else:
            N = jnp.asarray(0.0)
        s = {"systems": self.systems.init_s(**kw), "geoid_N": N}
        if self.turbulence is not None:
            s["turb"] = self.turbulence.init_s()
        return s

    def _apply_disturbances(self, x, u, s, t, kin, atm_data, trn_fn,
                            want_dot):
        """Atmospheric disturbance chain (physics/turbulence.py): the mean
        wind is first shaped by the boundary-layer shear profile, then the
        Dryden/discrete gust field is superposed. The gust filters see the
        airspeed relative to the SHEARED MEAN wind (the gust never feeds
        back into its own coefficients) and the height above terrain.
        Returns (disturbed AtmosphericData, body-axes total wind for
        `air_data` — already in hand, skipping a re-rotation — and turb
        x_dot or None)."""
        from flightjax.ops.quaternions import qrot, qrot_inv
        from flightjax.physics.turbulence import shear_scale
        h_agl = kin.h_o - trn_fn().elevation
        k = shear_scale(u["turb"], h_agl)
        v_mean = atm_data.v * jnp.stack(
            [k, k, jnp.ones_like(k)], axis=-1)
        v_ew_b = qrot_inv(kin.q_nb, v_mean)
        V = jnp.linalg.norm(kin.v_eb_b - v_ew_b, axis=-1)
        if want_dot:
            turb_dot, gust_b = self.turbulence.f_ode(
                x["turb"], u["turb"], s["turb"], t, V, h_agl)
        else:
            turb_dot = None
            gust_b = self.turbulence.gust(x["turb"], u["turb"], V, h_agl, t)
        atm2 = atm_data._replace(v=v_mean + qrot(kin.q_nb, gust_b))
        return atm2, v_ew_b + gust_b, turb_dot

    def _context(self, x, u, s, t=0.0):
        """KinData, AirData, terrain query fn at the current state."""
        _, kin = self.kinematics.f_ode(x["kinematics"], x["dynamics"],
                                       s["geoid_N"], 0.0)
        atm_data = self.atmosphere.atmospheric_data(u["atm"], kin.n_e, kin.h_o)
        trn_fn = lambda n_e=None: self.terrain.terrain_data(u["trn"], n_e)
        v_ew_b = None
        if self.turbulence is not None:
            atm_data, v_ew_b, _ = self._apply_disturbances(
                x, u, s, t, kin, atm_data, trn_fn, False)
        air = air_data(atm_data, kin, v_ew_b)
        return kin, air, trn_fn

    def f_ode(self, x, u, s, t):
        """`aircraftbase.jl:142-170` update order."""
        kin_dot, kin = self.kinematics.f_ode(x["kinematics"], x["dynamics"],
                                             s["geoid_N"], t)
        atm_data = self.atmosphere.atmospheric_data(u["atm"], kin.n_e, kin.h_o)
        trn_fn = lambda n_e=None: self.terrain.terrain_data(u["trn"], n_e)
        turb_dot, v_ew_b = None, None
        if self.turbulence is not None:
            atm_data, v_ew_b, turb_dot = self._apply_disturbances(
                x, u, s, t, kin, atm_data, trn_fn, True)
        air = air_data(atm_data, kin, v_ew_b)

        sys_dot, sys_y = self.systems.f_ode(x["systems"], u["systems"],
                                            s["systems"], t, kin, air, trn_fn)

        dyn_u = DynamicsU(mp_sum_b=sys_y.mp_b, wr_sum_b=sys_y.wr_b,
                          ho_sum_b=sys_y.hr_b, q_eb=kin.q_eb,
                          r_eb_e=kin.r_eb_e)
        dyn_dot, dyn_y = self.dynamics.f_ode(x["dynamics"], dyn_u, None, t)

        x_dot = {"kinematics": kin_dot, "dynamics": dyn_dot,
                 "systems": sys_dot}
        if turb_dot is not None:
            x_dot["turb"] = turb_dot
        return x_dot, VehicleY(systems=sys_y, kinematics=kin,
                               dynamics=dyn_y, airflow=air)

    # When the geoid refresh is deferred (see `geoid_deferred()`), f_step
    # carries the undulation forward unchanged and the caller refreshes it
    # externally (the EGM96 grid gather cannot live inside a Pallas
    # megakernel, and fleet steps hoist it to a scalar-gated lax.cond —
    # see parallel/megakernel.py, core/sim.py). Semantics are identical as
    # long as the caller refreshes once per step. `geoid_in_step` remains as
    # a static per-instance design knob; trace-scoped switching goes through
    # the context manager, never by mutating this attribute.
    geoid_in_step = True

    def f_step(self, x, u, s, t):
        """Kinematics renorm + systems discrete impulse
        (`aircraftbase.jl:172-181`), plus the once-per-step refresh of the
        carried geoid undulation."""
        from flightjax.ops.geodesy import geoid_height
        kin_x, _ = self.kinematics.f_step(x["kinematics"], x["dynamics"],
                                          None, t)
        x = dict(x, kinematics=kin_x)
        kin, air, trn_fn = self._context(x, u, s, t)
        sys_x, sys_s = self.systems.f_step(x["systems"], u["systems"],
                                           s["systems"], t, kin, air, trn_fn)
        in_step = self.geoid_in_step and not _geoid_deferred.get()
        N = geoid_height(kin.n_e) if in_step else s["geoid_N"]
        s2 = dict(s, systems=sys_s, geoid_N=N)
        if self.turbulence is not None:
            _, s2["turb"] = self.turbulence.f_step(x["turb"], u["turb"],
                                                   s["turb"], t)
        return dict(x, systems=sys_x), s2

    def refresh_geoid(self, x, s):
        """External once-per-step geoid refresh for geoid_in_step=False."""
        return dict(s, geoid_N=self.geoid_N_from_kin(x["kinematics"]))

    def geoid_N_from_kin(self, xk):
        """EGM96 undulation at the location encoded in the kinematics
        position states (any mechanization)."""
        from flightjax.ops import geodesy as geo
        return geo.geoid_height(self._n_e({"kinematics": xk}))

    @staticmethod
    def _n_e(x):
        """Location n-vector from any mechanization's position states."""
        from flightjax.ops import geodesy as geo
        xk = x["kinematics"]
        if "q_ew" in xk:       # WA mechanization
            return geo.nvector_from_qew(xk["q_ew"])
        if "q_eb" in xk:       # ECEF: n_e carried directly
            return xk["n_e"]
        return geo.nvector_from_latlon(xk["lat"], xk["lon"])  # NED

    def h_agl(self, x, u, s):
        """Ellipsoidal height of the body origin above the terrain surface.
        Used by `Simulation.fleet_step`'s gear gate: a lane with
        h_agl >= margin cannot have weight on wheel this step (the wheels
        sit a few metres below Ob; within one dt the state moves <~2 m), so
        `any(h_agl < margin)` is a conservative scalar predicate for
        skipping the strut/contact math fleet-wide."""
        h_e = x["kinematics"]["h_e"]
        trn = self.terrain.terrain_data(u["trn"], self._n_e(x))
        return h_e - (trn.elevation + s["geoid_N"])


class AircraftY(NamedTuple):
    vehicle: VehicleY
    avionics: "object"


class Aircraft(Component):
    """Vehicle + avionics (`aircraftbase.jl:216-252`). `avionics=None` is the
    reference's NoAvionics.

    Avionics protocol: `init_u()/init_s()`,
    `f_periodic(s_av, u_av, vehicle_y, dt) -> (s_av, av_y)` and
    `assign(u_systems, av_y) -> u_systems` mapping avionics commands onto
    systems inputs (`aircraftbase.jl:201-210`).
    """

    def __init__(self, vehicle: Vehicle, avionics=None):
        self.vehicle = vehicle
        self.avionics = avionics

    def init_x(self, **kw):
        return {"vehicle": self.vehicle.init_x(**kw)}

    def init_u(self):
        u = {"vehicle": self.vehicle.init_u()}
        if self.avionics is not None:
            u["avionics"] = self.avionics.init_u()
        return u

    def init_s(self, x=None, **kw):
        s = {"vehicle": self.vehicle.init_s(
            x=None if x is None else x["vehicle"], **kw)}
        if self.avionics is not None:
            s["avionics"] = self.avionics.init_s()
        return s

    def f_ode(self, x, u, s, t):
        veh_dot, veh_y = self.vehicle.f_ode(x["vehicle"], u["vehicle"],
                                            s["vehicle"], t)
        av_y = None
        if self.avionics is not None:
            av_y = self.avionics.output(s["avionics"], u["avionics"], veh_y)
        return {"vehicle": veh_dot}, AircraftY(vehicle=veh_y, avionics=av_y)

    def f_step(self, x, u, s, t):
        veh_x, veh_s = self.vehicle.f_step(x["vehicle"], u["vehicle"],
                                           s["vehicle"], t)
        return dict(x, vehicle=veh_x), dict(s, vehicle=veh_s)

    # overwritten by Simulation
    periodic_dt = 0.02

    def f_periodic(self, x, u, s, t, k):
        """Avionics periodic pass + assignment (`aircraftbase.jl:232-242`).
        Avionics with `needs_terrain = True` (e.g. `physics.navigation.
        NavAvionics` — its radar altimeter references the ground) also
        receive the terrain elevation under the vehicle as `h_trn`."""
        if self.avionics is None:
            return x, u, s
        _, veh_y = self.vehicle.f_ode(x["vehicle"], u["vehicle"],
                                      s["vehicle"], t)
        kw = {}
        if getattr(self.avionics, "needs_terrain", False):
            trn = self.vehicle.terrain.terrain_data(
                u["vehicle"]["trn"], veh_y.kinematics.n_e)
            kw["h_trn"] = trn.elevation
        s_av, av_y = self.avionics.f_periodic(s["avionics"], u["avionics"],
                                              veh_y, self.periodic_dt, **kw)
        u_sys = self.avionics.assign(u["vehicle"]["systems"], av_y)
        u = dict(u, vehicle=dict(u["vehicle"], systems=u_sys))
        return x, u, dict(s, avionics=s_av)


class SimpleWorld(Component):
    """Aircraft in an atmosphere over terrain (`world.jl:18-57`). Thin alias:
    atmosphere/terrain already live inside Vehicle (their inputs in
    vehicle.u), so the world is the aircraft plus a termination latch."""

    def __init__(self, aircraft: Aircraft):
        self.aircraft = aircraft

    def init(self, **kw):
        x = self.aircraft.init_x(**kw)
        u = self.aircraft.init_u()
        s = self.aircraft.init_s(x=x)
        s["terminated"] = jnp.asarray(False)
        return x, u, s

    def f_ode(self, x, u, s, t):
        from flightjax.core.modeling import bscale
        x_dot, y = self.aircraft.f_ode(x, u, s, t)
        alive = 1.0 - s["terminated"]
        x_dot = jax.tree.map(lambda v: bscale(alive, v), x_dot)
        return x_dot, y

    def f_step(self, x, u, s, t):
        x, s2 = self.aircraft.f_step(x, u, s, t)
        term = s["terminated"]
        crashed = s2["vehicle"]["systems"].get("crashed")
        if crashed is not None:
            term = jnp.logical_or(term, crashed)
        s2["terminated"] = term
        return x, s2

    @property
    def periodic_dt(self):
        return self.aircraft.periodic_dt

    @periodic_dt.setter
    def periodic_dt(self, v):
        self.aircraft.periodic_dt = v

    def f_periodic(self, x, u, s, t, k):
        term = s["terminated"]
        x, u, s = self.aircraft.f_periodic(x, u, s, t, k)
        s["terminated"] = term
        return x, u, s


# ------------------------------------------------------------------- trim

def make_gauss_newton_solver(residual_fn, lb, ub, iters=30, batched=False):
    """Build a reusable bounded Gauss-Newton solver: returns
    `solve(x0, *args) -> (x, residual_norm)` where `residual_fn(x, *args)`.
    The jitted kernels are created once, so repeated solves with different
    `args` (e.g. different trim conditions) hit the jit cache instead of
    recompiling (the envelope sweep calls this 28 times)."""
    lb = jnp.asarray(lb, dtype=float)
    ub = jnp.asarray(ub, dtype=float)
    scales = jnp.asarray([1.0, 0.5, 0.25, 0.125])

    def _step(x, *args):
        r = residual_fn(x, *args)
        J = jax.jacfwd(residual_fn)(x, *args)
        JtJ = J.T @ J
        dx = jnp.linalg.solve(JtJ + 1e-12 * jnp.eye(x.shape[-1]), -(J.T @ r))
        return jnp.sum(r * r), dx

    def _probe(x, dx, *args):
        def c(scale):
            x_try = jnp.clip(x + scale * dx, lb, ub)
            r = residual_fn(x_try, *args)
            return jnp.sum(r * r)
        return jax.vmap(c)(scales)

    def _norm2(x, *args):
        r = residual_fn(x, *args)
        return jnp.sum(r * r)

    if batched:
        bax = lambda n: (0,) * n + (None,)
        _step_v = lambda x, *args: jax.vmap(
            lambda xi: _step(xi, *args))(x)
        _probe_v = lambda x, dx, *args: jax.vmap(
            lambda xi, dxi: _probe(xi, dxi, *args))(x, dx)
        _norm2_v = lambda x, *args: jax.vmap(
            lambda xi: _norm2(xi, *args))(x)
        step = jax.jit(_step_v)
        probe = jax.jit(_probe_v)
        norm2 = jax.jit(_norm2_v)
    else:
        step = jax.jit(_step)
        probe = jax.jit(_probe)
        norm2 = jax.jit(_norm2)

    def solve(x0, *args):
        x = jnp.clip(jnp.asarray(x0, dtype=float), lb, ub)
        for _ in range(iters):
            c0, dx = step(x, *args)
            costs = probe(x, dx, *args)
            best = jnp.argmin(costs, axis=-1)
            best_c = jnp.take_along_axis(costs, best[..., None], axis=-1)[..., 0]
            scale = scales[best]
            x_new = jnp.clip(x + scale[..., None] * dx if batched
                             else x + scale * dx, lb, ub)
            improved = best_c < c0
            x = jnp.where(improved[..., None] if batched else improved,
                          x_new, x)
        return x, jnp.sqrt(norm2(x, *args))

    return solve


def trim_gauss_newton(residual_fn, x0, lb, ub, iters=30, batched=False):
    """Bounded damped Gauss-Newton root solve of `residual_fn` (n-in/n-out or
    m>=n), replacing the reference's NLopt BOBYQA cost minimization
    (`c172.jl:920-932`) — same stationary point, exact Jacobians.

    The iteration runs as a host-side Python loop over two small jitted
    kernels (one residual+Jacobian eval, one vmapped line search over step
    scales 1, 1/2, 1/4, 1/8) rather than one fused `lax.scan` — compiling a
    single graph with six inlined vehicle evaluations took minutes of XLA
    time for zero runtime benefit on this host-side design path.
    With `batched=True`, x0 (and optionally lb/ub) carry a leading batch
    axis and whole fleets of trim problems solve together (vmapped kernels).
    Returns (x, residual_norm)."""
    x0 = jnp.asarray(x0, dtype=float)
    # bounds are per-variable (shared across a batch of starts)
    lb = jnp.broadcast_to(jnp.asarray(lb, dtype=float), x0.shape[-1:])
    ub = jnp.broadcast_to(jnp.asarray(ub, dtype=float), x0.shape[-1:])
    scales = jnp.asarray([1.0, 0.5, 0.25, 0.125])

    def _step(x):
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        JtJ = J.T @ J
        dx = jnp.linalg.solve(JtJ + 1e-12 * jnp.eye(x.shape[-1]), -(J.T @ r))
        return jnp.sum(r * r), dx

    def _probe(x, dx):
        def c(scale):
            x_try = jnp.clip(x + scale * dx, lb, ub)
            r = residual_fn(x_try)
            return jnp.sum(r * r)
        return jax.vmap(c)(scales)

    def _norm2(x):
        r = residual_fn(x)
        return jnp.sum(r * r)

    if batched:
        _step = jax.vmap(_step)
        _probe = jax.vmap(_probe, in_axes=(0, 0))
        _norm2 = jax.vmap(_norm2)
    step = jax.jit(_step)
    probe = jax.jit(_probe)
    norm2 = jax.jit(_norm2)

    x = jnp.clip(x0, lb, ub)
    for _ in range(iters):
        c0, dx = step(x)
        costs = probe(x, dx)  # (4,) or (batch, 4)
        best = jnp.argmin(costs, axis=-1)
        best_c = jnp.take_along_axis(costs, best[..., None], axis=-1)[..., 0]
        scale = scales[best]
        x_new = jnp.clip(x + scale[..., None] * dx if batched
                         else x + scale * dx, lb, ub)
        improved = (best_c < c0)
        x = jnp.where(improved[..., None] if batched else improved, x_new, x)
    return x, jnp.sqrt(norm2(x))
