"""C172 end-to-end scenarios.

Mirrors `/root/reference/lib/FlightApps/demos/c172_demos.jl`:
- `elevator_doublet`: C172Sv0 trim + elevator doublet, headless
  (`c172_demos.jl:262-314`)
- `turning_climb`: 600 s C172Xv1 climb with gain-scheduled autopilot
  (EAS + climb-rate hold, course tracking) under wind
  (`c172_demos.jl:214-259`)
- `generic_simulation`: interactive run with X-Plane visualization
  (`:36-102`) via the real-time loop.

Each headless scenario returns (final SimState, TimeSeries log).
"""

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, c172x, common as C172
from flightjax.models.c172 import c172x_ctl as CTL


def elevator_doublet(amplitude=0.1, t_pulse=2.0, t_end=10.0, dt=0.02):
    """Trim, then elevator +A for t_pulse, -A for t_pulse, back to trim
    (`c172_demos.jl:262-314`)."""
    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=dt)
    vehicle = world.aircraft.vehicle
    x, u, s, ts, rnorm = c172s.trim(vehicle)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})

    def with_elevator(st, delta):
        act = dict(st.u["vehicle"]["systems"]["act"])
        act["elevator"] = jnp.asarray(float(ts.elevator) + delta)
        sys_u = dict(st.u["vehicle"]["systems"], act=act)
        return st._replace(u={"vehicle": dict(st.u["vehicle"],
                                              systems=sys_u)})

    logs = []
    segments = [(amplitude, t_pulse), (-amplitude, t_pulse),
                (0.0, t_end - 2 * t_pulse)]
    t0 = 0.0
    for delta, dur in segments:
        state = with_elevator(state, delta)
        state, log = sim.run(state, t_end=t0 + dur, t0=t0, save_every=5)
        logs.append(log)
        t0 += dur

    from flightjax.core.sim import TimeSeries
    ts_all = TimeSeries(
        jnp.concatenate([l.t for l in logs]),
        jax.tree.map(lambda *ls: jnp.concatenate(ls), *[l.y for l in logs]))
    return state, ts_all


def turning_climb(t_end=600.0, dt=0.01, EAS_ref=40.0, clm_ref=2.0,
                  chi_ref=np.pi / 2, wind_n=(2.0, 3.0, 0.0),
                  save_every=100, gains=None):
    """600 s autopilot climb: EAS + climb-rate hold, course capture, wind
    (`c172_demos.jl:214-259`)."""
    from flightjax.physics.aircraftbase import SimpleWorld

    aircraft = c172x.build_xv1("wa", gains=gains)
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=dt, periodic_dt=dt)
    state, ts, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                        periodic_dt=dt)
    # f64 trims to ~1e-15; f32 (TPU default) bottoms out near 1e-6
    tol = 1e-8 if jnp.asarray(0.0).dtype == jnp.float64 else 3e-5
    assert float(rnorm) < tol, float(rnorm)

    # engage EAS_clm + chi_beta, blow some wind
    av = {"lon": dict(state.u["avionics"]["lon"]),
          "lat": dict(state.u["avionics"]["lat"])}
    av["lon"]["mode_req"] = jnp.asarray(CTL.LON_EAS_CLM, dtype=jnp.int32)
    av["lon"]["EAS_ref"] = jnp.asarray(float(EAS_ref))
    av["lon"]["clm_ref"] = jnp.asarray(float(clm_ref))
    av["lat"]["mode_req"] = jnp.asarray(CTL.LAT_CHI_BETA, dtype=jnp.int32)
    av["lat"]["chi_ref"] = jnp.asarray(float(chi_ref))
    u = dict(state.u, avionics=av)
    veh_u = dict(u["vehicle"])
    veh_u["atm"] = dict(veh_u["atm"], wind=jnp.asarray(wind_n, dtype=float))
    u["vehicle"] = veh_u
    state = state._replace(u=u)

    final, log = sim.run(state, t_end=t_end, t0=0.0, save_every=save_every,
                         dispatch_blocks=10)
    return final, log


def generic_simulation(t_end=60.0, pace=1.0, xplane_address="127.0.0.1",
                       xplane_port=49000):
    """Interactive C172Sv0 with X-Plane 12 visualization
    (`c172_demos.jl:36-102`). Requires a reachable X-Plane instance."""
    from flightjax.io.devices import IOMapping
    from flightjax.io.network import XPlane12Control, c172_xplane_messages
    from flightjax.io.realtime import RealTimeLoop

    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=0.02)
    vehicle = world.aircraft.vehicle
    x, u, s, ts, _ = c172s.trim(vehicle)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})

    class XPlaneMapping(IOMapping):
        def extract_output(self, snapshot, y):
            return c172_xplane_messages(float(snapshot.t), y.vehicle)

    loop = RealTimeLoop(sim, state)
    loop.attach(XPlane12Control(xplane_address, xplane_port), XPlaneMapping(),
                period=0.05)
    return loop.run(t_end=t_end, pace=pace)
