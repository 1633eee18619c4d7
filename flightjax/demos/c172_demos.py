"""C172 end-to-end scenarios.

Mirrors `/root/reference/lib/FlightApps/demos/c172_demos.jl`:
- `elevator_doublet`: C172Sv0 trim + elevator doublet, headless
  (`c172_demos.jl:262-314`)
- `turning_climb`: 600 s C172Xv1 climb with gain-scheduled autopilot
  (EAS + climb-rate hold, course tracking) under wind
  (`c172_demos.jl:214-259`)
- `generic_simulation`: interactive run with X-Plane visualization
  (`:36-102`) via the real-time loop.
- `crosswind_landing`: C172Xv2 final approach under 6 m/s crosswind with
  segment guidance, flare, touchdown and braked rollout
  (`c172_demos.jl:406-505`)
- `traffic_pattern`: full scripted mission around LOWS runway 15 — cold
  start, engine start, takeoff, 5-leg pattern, landing, rollout
  (`c172_demos.jl:514-645`)

Beyond the reference: `turbulent_fleet_loads` — a Monte Carlo fleet
through MIL-F-8785C Dryden turbulence with per-lane peak-load tracking
and exceedance fractions (the reference has no stochastic wind at all).

Each headless scenario returns (final SimState, TimeSeries log). The
reference scripts missions through an imperative `user_callback!`; here
they are pure in-graph phase machines (`flightjax.core.mission`), so a
whole Monte Carlo fleet of missions can run vmapped.
"""

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, c172x, common as C172
from flightjax.models.c172 import c172x_ctl as CTL


def elevator_doublet_setup(dt=0.02):
    """Trimmed C172Sv0 rig for the doublet: (sim, state, trim_state)."""
    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=dt)
    vehicle = world.aircraft.vehicle
    x, u, s, ts, rnorm = c172s.trim(vehicle)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    return sim, state, ts


def elevator_doublet(amplitude=0.1, t_pulse=2.0, t_end=10.0, dt=0.02,
                     rig=None):
    """Trim, then elevator +A for t_pulse, -A for t_pulse, back to trim
    (`c172_demos.jl:262-314`). `rig` = cached `elevator_doublet_setup()`
    output to skip the trim solve."""
    sim, state, ts = elevator_doublet_setup(dt) if rig is None else rig

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


def turning_climb_setup(dt=0.01, EAS_ref=40.0, clm_ref=2.0,
                        chi_ref=np.pi / 2, wind_n=(2.0, 3.0, 0.0),
                        gains=None):
    """Trimmed C172Xv1 rig with EAS_clm + chi_beta engaged and wind set:
    (sim, state)."""
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
    return sim, state._replace(u=u)


def turning_climb(t_end=600.0, dt=0.01, EAS_ref=40.0, clm_ref=2.0,
                  chi_ref=np.pi / 2, wind_n=(2.0, 3.0, 0.0),
                  save_every=100, gains=None, rig=None, unroll=1):
    """600 s autopilot climb: EAS + climb-rate hold, course capture, wind
    (`c172_demos.jl:214-259`). `rig` = cached `turning_climb_setup()`
    output to skip the trim solve."""
    sim, state = (turning_climb_setup(dt, EAS_ref, clm_ref, chi_ref,
                                      wind_n, gains) if rig is None else rig)
    final, log = sim.run(state, t_end=t_end, t0=0.0, save_every=save_every,
                         dispatch_blocks=10, unroll=unroll)
    return final, log


def loiter(t_end=300.0, dt=0.02, radius=1500.0, turn_dir=1.0,
           center_offset_n=2000.0, EAS_ref=40.0, save_every=50, gains=None):
    """Holding-pattern demo on the C172Xv2: engage circular guidance on a
    circle `center_offset_n` m north of the trim point and orbit it at the
    trim altitude. Exercises the loiter mode the reference stubs out
    (`c172x_gdc.jl:256-268`). Returns (final_state, log)."""
    from flightjax.physics.aircraftbase import SimpleWorld
    from flightjax.models.c172 import c172x_gdc as GDC
    from flightjax.ops import geodesy as geo
    from flightjax.ops.quaternions import qrot

    aircraft = c172x.build_xv2("wa", gains=gains)
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=dt, periodic_dt=dt)
    state, ts, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                        periodic_dt=dt)
    vehicle = aircraft.vehicle
    _, y0 = vehicle.f_ode(state.x["vehicle"], state.u["vehicle"],
                          state.s["vehicle"], 0.0)
    h0 = float(y0.kinematics.h_e)

    q_en = geo.ltf(y0.kinematics.n_e)
    r_c = geo.cartesian_from_geographic(y0.kinematics.n_e, y0.kinematics.h_e)\
        + qrot(q_en, jnp.asarray([float(center_offset_n), 0.0, 0.0]))
    n_c, _ = geo.geographic_from_cartesian(r_c)
    lat_c, lon_c = geo.latlon_from_nvector(n_c)
    orbit = GDC.circle(float(lat_c), float(lon_c), h0, radius=float(radius),
                       turn_dir=float(turn_dir))

    gdc_u = dict(state.u["avionics"]["gdc"],
                 mode_req=jnp.asarray(GDC.GDC_CIRCULAR, jnp.int32),
                 orbit=orbit, hor_gdc_req=jnp.asarray(True),
                 vrt_gdc_req=jnp.asarray(True))
    ctl_u = dict(state.u["avionics"]["ctl"])
    ctl_u["lon"] = dict(ctl_u["lon"], EAS_ref=jnp.asarray(float(EAS_ref)))
    state = state._replace(u=dict(state.u, avionics=dict(
        state.u["avionics"], gdc=gdc_u, ctl=ctl_u)))
    return sim.run(state, t_end=t_end, t0=0.0, save_every=save_every,
                   dispatch_blocks=10)


def turbulent_fleet_loads(batch=256, t_end=60.0, dt=0.02, W20=10.0,
                          thresholds=(1.5, 2.0, 2.5), seed=0):
    """Certification-style gust-load study (beyond the reference — no
    stochastic wind exists there): a Monte Carlo C172S fleet flies
    `t_end` s through MIL-F-8785C Dryden turbulence of severity `W20`
    (20-ft wind, m/s), tracking each lane's peak load factor. Returns
    (final fleet state, per-lane peak n, exceedance fractions over
    `thresholds`)."""
    from flightjax.core.modeling import canonical
    from flightjax.physics.turbulence import DrydenTurbulence
    from flightjax.parallel import fleet

    world = c172s.flagship_world("wa", turbulence=DrydenTurbulence(dt))
    sim = Simulation(world, dt=dt, periodic_dt=dt, geoid_every=128,
                     gear_gate_margin=10.0)
    vehicle = world.aircraft.vehicle
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x, u, s, _, rnorm = c172s.trim(vehicle)
    state = canonical(SimState(
        t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
        x={"vehicle": x}, u={"vehicle": u},
        s={"vehicle": s, "terminated": jnp.asarray(False)}))
    state = sim.with_compensation(state)

    st = fleet.broadcast_state(state, batch)
    st = fleet.monte_carlo_c172(st, jax.random.PRNGKey(seed))
    turb_u = dict(st.u["vehicle"]["turb"],
                  W20=jnp.full((batch,), float(W20)))
    st = st._replace(u=dict(st.u, vehicle=dict(st.u["vehicle"],
                                               turb=turb_u)))

    n_steps = int(round(t_end / dt))
    n_steps -= n_steps % 5  # load sampling cadence (fleet_rollout_loads)
    final, peaks = fleet.fleet_rollout_loads(sim, st, n_steps=n_steps)
    frac = fleet.exceedance(peaks, list(thresholds))
    return final, peaks, frac


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


# ---------------------------------------------------------- scripted missions

# Salzburg LOWS runway 15 (`c172_demos.jl:16-19`); h is orthometric (HOrth)
LAT_LOWS15 = np.deg2rad(47.80433)
LON_LOWS15 = np.deg2rad(12.997)
H_LOWS15 = 427.2
PSI_LOWS15 = np.deg2rad(157.0)
DH_TO_GND = 1.81          # gear-extended CoM height over ground (`c172.jl:488`)
CAPTURE_THRESHOLD = -200.0  # along-track distance-to-go gate (`c172_demos.jl:523`)


def _lows_pattern():
    """Traffic-pattern legs around LOWS 15 (`c172_demos.jl:514-520`).
    Built eagerly host-side in f64; altitudes ellipsoidal."""
    from flightjax.models.c172 import c172x_gdc as GDC
    from flightjax.ops import geodesy as geo

    n_rwy = geo.nvector_from_latlon(jnp.asarray(LAT_LOWS15),
                                    jnp.asarray(LON_LOWS15))
    h_rwy = float(geo.ellip_from_orth(jnp.asarray(H_LOWS15), n_rwy))

    def leg_to(p_latlon_h, chi, s, gamma):
        lat, lon, h = p_latlon_h
        return GDC.reversed_segment(
            GDC.segment_from_vector(lat, lon, h, chi, s, gamma=gamma))

    def p1_of(seg):
        lat, lon = GDC.segment_latlon(seg.n_e1)
        return lat, lon, float(seg.h_e1)

    p_rwy = (LAT_LOWS15, LON_LOWS15, h_rwy)
    final_leg = leg_to(p_rwy, PSI_LOWS15 + np.pi, 3e3, np.deg2rad(3))
    base_leg = leg_to(p1_of(final_leg), PSI_LOWS15 - np.pi / 2, 1e3, 0.0)
    downwind_leg = leg_to(p1_of(base_leg), PSI_LOWS15, 6e3, 0.0)
    crosswind_leg = leg_to(p1_of(downwind_leg), PSI_LOWS15 + np.pi / 2, 1e3, 0.0)
    cw = p1_of(crosswind_leg)
    departure_leg = GDC.segment(LAT_LOWS15, LON_LOWS15, h_rwy,
                                cw[0], cw[1], cw[2])
    return {"final": final_leg, "base": base_leg, "downwind": downwind_leg,
            "crosswind": crosswind_leg, "departure": departure_leg,
            "h_rwy": h_rwy}


def _mission_phase_lib(legs):
    """Shared phase bodies for the landing/pattern missions
    (`c172_demos.jl:424-485` and `:525-630`)."""
    from flightjax.models.c172 import c172x_gdc as GDC
    from flightjax.ops import attitude as att
    from flightjax.physics.piston import ENG_RUNNING

    final_leg = legs["final"]
    h_rwy_end = float(final_leg.h_e2)

    def fly_leg(leg, EAS_ref, throttle=None, vrt=True):
        def apply(u, y, t):
            gdc = dict(u["gdc"], mode_req=jnp.asarray(GDC.GDC_SEGMENT, jnp.int32),
                       target=leg, hor_gdc_req=jnp.asarray(True),
                       vrt_gdc_req=jnp.asarray(vrt))
            lon = dict(u["ctl"]["lon"], EAS_ref=jnp.asarray(float(EAS_ref)))
            if throttle is not None:
                lon["throttle_axis"] = jnp.asarray(float(throttle))
            return dict(u, gdc=gdc, ctl=dict(u["ctl"], lon=lon))
        return apply

    def captured(leg):
        def done(y, t):
            data = GDC.segment_data(leg, y.kinematics.n_e, y.kinematics.h_e)
            return data.s_2b > CAPTURE_THRESHOLD
        return done

    def final_done(y, t):
        return (y.kinematics.h_e - h_rwy_end) < 6.0

    def flare_apply(u, y, t):
        """Kill vertical guidance, shallow EAS+climb descent, decrab: the
        sideslip reference is the current runway-relative crab angle
        (`c172_demos.jl:450-462`; the reference freezes psi at the phase
        transition, here it tracks — same decrab, smoother)."""
        data = GDC.segment_data(final_leg, y.kinematics.n_e, y.kinematics.h_e)
        gdc = dict(u["gdc"], mode_req=jnp.asarray(GDC.GDC_SEGMENT, jnp.int32),
                   target=final_leg, hor_gdc_req=jnp.asarray(True),
                   vrt_gdc_req=jnp.asarray(False))
        lon = dict(u["ctl"]["lon"],
                   mode_req=jnp.asarray(CTL.LON_EAS_CLM, jnp.int32),
                   clm_ref=jnp.asarray(-0.3), EAS_ref=jnp.asarray(30.0))
        lat = dict(u["ctl"]["lat"],
                   mode_req=jnp.asarray(CTL.LAT_PHI_BETA, jnp.int32),
                   beta_ref=att.wrap_to_pi(y.kinematics.e_nb[0] - data.chi_12),
                   phi_ref=jnp.asarray(0.0))
        return dict(u, gdc=gdc, ctl=dict(lon=lon, lat=lat))

    def ground_apply(u, y, t):
        """Idle + slight left rudder + brakes (`c172_demos.jl:466-479`)."""
        gdc = dict(u["gdc"], mode_req=jnp.asarray(GDC.GDC_DIRECT, jnp.int32))
        lon = dict(u["ctl"]["lon"], throttle_axis=jnp.asarray(0.0),
                   mode_req=jnp.asarray(CTL.LON_DIRECT, jnp.int32))
        lat = dict(u["ctl"]["lat"], rudder_axis=jnp.asarray(-0.04),
                   mode_req=jnp.asarray(CTL.LAT_DIRECT, jnp.int32))
        return dict(u, gdc=gdc, ctl=dict(lon=lon, lat=lat))

    def flaps(setting):
        def systems(u_sys):
            return dict(u_sys, act=dict(u_sys["act"],
                                        flaps=jnp.asarray(float(setting))))
        return systems

    def ground_systems(u_sys):
        act = dict(u_sys["act"], flaps=jnp.asarray(0.0),
                   brake_left=jnp.asarray(1.0), brake_right=jnp.asarray(1.0))
        return dict(u_sys, act=act)

    def engine_start(u_sys):
        pwp = dict(u_sys["pwp"],
                   engine=dict(u_sys["pwp"]["engine"],
                               start=jnp.asarray(True)))
        return dict(u_sys, pwp=pwp)

    def engine_running(y, t):
        return y.systems.pwp.engine.state == ENG_RUNNING

    def on_gnd(y, t):
        return CTL.is_on_gnd(y)

    def airborne(y, t):
        return jnp.logical_not(CTL.is_on_gnd(y))

    return dict(fly_leg=fly_leg, captured=captured, final_done=final_done,
                flare_apply=flare_apply, ground_apply=ground_apply,
                flaps=flaps, ground_systems=ground_systems,
                engine_start=engine_start, engine_running=engine_running,
                on_gnd=on_gnd, airborne=airborne)


def _mission_world(avionics_phases, gains=None):
    """C172Xv2 + MissionAvionics world over LOWS-elevation flat terrain."""
    from flightjax.core.mission import MissionAvionics
    from flightjax.models.c172.c172x_gdc import Avionics
    from flightjax.physics.aircraftbase import Aircraft, SimpleWorld
    from flightjax.physics.terrain import HorizontalTerrain

    vehicle = c172x.build_vehicle("wa", terrain=HorizontalTerrain(H_LOWS15))
    avionics = MissionAvionics(Avionics(gains), avionics_phases)
    return SimpleWorld(Aircraft(vehicle, avionics=avionics))


def crosswind_landing(t_end=220.0, dt=0.02, wind_E=6.0, save_every=25,
                      gains=None):
    """Final approach + flare + rollout under crosswind
    (`c172_demos.jl:406-505`). Trims on the final leg at EAS 30, full
    flaps, -3 deg wind-relative slope; 6 m/s easterly crosswind."""
    from flightjax.core.mission import Phase

    legs = _lows_pattern()
    lib = _mission_phase_lib(legs)
    p1 = legs["final"].n_e1
    from flightjax.ops import geodesy as geo
    lat1, lon1 = (float(v) for v in geo.latlon_from_nvector(p1))

    phases = [
        Phase("final", lib["fly_leg"](legs["final"], 30.0), lib["final_done"],
              systems=lib["flaps"](1.0)),
        Phase("flare", lib["flare_apply"], lib["on_gnd"],
              systems=lib["flaps"](1.0)),
        Phase("ground", lib["ground_apply"], lambda y, t: jnp.asarray(False),
              systems=lib["ground_systems"]),
    ]
    world = _mission_world(phases, gains)
    sim = Simulation(world, dt=dt, periodic_dt=dt)

    tp = C172.trim_parameters(lat=lat1, lon=lon1, h=float(legs["final"].h_e1),
                              psi_nb=PSI_LOWS15, EAS=30.0,
                              gamma=-np.deg2rad(3), flaps=1.0, fuel_load=0.5)
    state, ts, rnorm = c172x.trim_world(world.aircraft, tp, periodic_dt=dt)

    veh_u = dict(state.u["vehicle"])
    veh_u["atm"] = dict(veh_u["atm"],
                        wind=jnp.asarray([0.0, float(wind_E), 0.0]))
    state = state._replace(u=dict(state.u, vehicle=veh_u))

    final, log = sim.run(state, t_end=t_end, t0=0.0, save_every=save_every,
                         dispatch_blocks=20)
    return final, log


def _mission_world_nav(avionics_phases, gains=None, dt=0.02, nav_kw=None):
    """C172Xv2 + MissionAvionics wrapped in NavAvionics: the mission's
    phase machine, guidance AND control all consume the ESTIMATED
    VehicleY (SensorSuite -> InsGps -> phases/gdc/ctl), with the radar
    altimeter aiding the filter near the ground (`use_radar=True`).
    The weight-on-wheels squat switches and engine state remain truth
    channels (discrete switches the flight computer reads directly)."""
    from flightjax.core.mission import MissionAvionics
    from flightjax.models.c172.c172x_gdc import Avionics
    from flightjax.physics.aircraftbase import Aircraft, SimpleWorld
    from flightjax.physics.navigation import NavAvionics
    from flightjax.physics.terrain import HorizontalTerrain

    vehicle = c172x.build_vehicle("wa", terrain=HorizontalTerrain(H_LOWS15))
    inner = MissionAvionics(Avionics(gains), avionics_phases)
    nav = NavAvionics(inner, dt=dt, use_radar=True, **(nav_kw or {}))
    return SimpleWorld(Aircraft(vehicle, avionics=nav))


def crosswind_landing_nav(t_end=120.0, dt=0.02, wind_E=6.0, save_every=25,
                          gains=None, s_togo=1500.0, seed=0, nav_kw=None):
    """Crosswind landing flown ON THE NAVIGATION SOLUTION to wheels-stop
    (the reference's crown-jewel mission, `c172_demos.jl:406-505`, which
    Flight.jl can only fly on truth): segment guidance tracks the
    FILTER's position fix down the glide slope, the flare phase triggers
    on the RADAR ALTIMETER (AGL through the estimated `h_o` channel —
    the h_radar consumer), decrab/touchdown/braking run on estimated
    attitude/course, and the monitored radar row aids the filter's
    altitude through the flare. Starts trimmed on final `s_togo` m from
    the threshold. Returns (final SimState, TimeSeries log)."""
    from flightjax.core.mission import Phase
    from flightjax.models.c172 import c172x_gdc as GDC
    from flightjax.ops import geodesy as geo

    legs = _lows_pattern()
    lib = _mission_phase_lib(legs)

    def final_done_agl(y, t):
        # radar-altimeter flare gate: below use_radar's max-AGL the
        # estimated h_o IS terrain + radar return (physics/navigation.py)
        return (y.kinematics.h_o - H_LOWS15) < 6.0

    phases = [
        Phase("final", lib["fly_leg"](legs["final"], 30.0), final_done_agl,
              systems=lib["flaps"](1.0)),
        Phase("flare", lib["flare_apply"], lib["on_gnd"],
              systems=lib["flaps"](1.0)),
        Phase("ground", lib["ground_apply"], lambda y, t: jnp.asarray(False),
              systems=lib["ground_systems"]),
    ]
    world = _mission_world_nav(phases, gains, dt=dt, nav_kw=nav_kw)
    sim = Simulation(world, dt=dt, periodic_dt=dt)

    # trim point s_togo metres up the final leg (same heading/slope)
    seg_up = GDC.segment_from_vector(LAT_LOWS15, LON_LOWS15,
                                     float(legs["final"].h_e2),
                                     PSI_LOWS15 + np.pi, float(s_togo),
                                     gamma=np.deg2rad(3))
    lat1, lon1 = (float(v) for v in GDC.segment_latlon(seg_up.n_e2))
    tp = C172.trim_parameters(lat=lat1, lon=lon1, h=float(seg_up.h_e2),
                              psi_nb=PSI_LOWS15, EAS=30.0,
                              gamma=-np.deg2rad(3), flaps=1.0, fuel_load=0.5)
    state, ts, rnorm = c172x.trim_world(world.aircraft, tp, periodic_dt=dt)

    av_u = dict(state.u["avionics"],
                sens=dict(state.u["avionics"]["sens"],
                          seed=jnp.asarray(int(seed), jnp.int32)))
    veh_u = dict(state.u["vehicle"])
    veh_u["atm"] = dict(veh_u["atm"],
                        wind=jnp.asarray([0.0, float(wind_E), 0.0]))
    state = state._replace(u=dict(state.u, vehicle=veh_u, avionics=av_u))

    final, log = sim.run(state, t_end=t_end, t0=0.0, save_every=save_every,
                         dispatch_blocks=20)
    return final, log


def takeoff_nav(t_end=80.0, dt=0.02, save_every=25, gains=None, seed=0,
                nav_kw=None):
    """Takeoff flown ON THE NAVIGATION SOLUTION from a cold start on the
    LOWS 15 threshold — the other ground end of the sensor-fed story
    (the landing is `crosswind_landing_nav`): parked ground ALIGNMENT
    (`NavAvionics.align_cold` — origin/baro datum/field at the parked
    fix, no trim solve), engine start, full-throttle ground roll,
    rotation and climb-out on the departure leg, with the filter aided
    through the roll by GPS/baro/mag and the radar row reading the
    gear-extended CoM height. Returns (final SimState, TimeSeries log)."""
    from flightjax.core.mission import Phase
    from flightjax.core.sim import SimState
    from flightjax.physics.kinematics import kin_init

    legs = _lows_pattern()
    lib = _mission_phase_lib(legs)
    hold = lambda u, y, t: u

    phases = [
        Phase("standby", hold, lambda y, t: t >= 5.0),
        Phase("startup", hold, lib["engine_running"],
              systems=lib["engine_start"]),
        Phase("takeoff", lib["fly_leg"](legs["departure"], 35.0,
                                        throttle=1.0), lib["airborne"]),
        Phase("departure",
              lib["fly_leg"](legs["departure"], 35.0, throttle=1.0),
              lib["captured"](legs["departure"])),
    ]
    world = _mission_world_nav(phases, gains, dt=dt, nav_kw=nav_kw)
    sim = Simulation(world, dt=dt, periodic_dt=dt)

    ic = kin_init(lat=LAT_LOWS15, lon=LON_LOWS15, h=H_LOWS15 + DH_TO_GND,
                  h_datum="orthometric", euler=[PSI_LOWS15, 0.0, 0.0])
    x, u, s = world.init(kin_init=ic, fuel=0.5)
    _, veh_y = world.aircraft.vehicle.f_ode(x["vehicle"], u["vehicle"],
                                            s["vehicle"], 0.0)
    u["avionics"], s["avionics"] = world.aircraft.avionics.align_cold(
        u["avionics"], s["avionics"], veh_y, seed=seed)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x=x, u=u, s=s)
    final, log = sim.run(state, t_end=t_end, t0=0.0,
                         save_every=save_every, dispatch_blocks=20)
    return final, log


def traffic_pattern(t_end=700.0, dt=0.02, save_every=50, gains=None):
    """Full scripted mission around LOWS 15 (`c172_demos.jl:514-645`):
    standby 5 s -> engine start -> full-throttle takeoff on the departure
    leg -> crosswind -> downwind (EAS 50) -> base (EAS 30, flaps) ->
    final -> flare -> braked rollout. Starts cold on the runway."""
    from flightjax.core.mission import Phase
    from flightjax.core.sim import SimState
    from flightjax.physics.kinematics import kin_init

    legs = _lows_pattern()
    lib = _mission_phase_lib(legs)
    hold = lambda u, y, t: u

    phases = [
        Phase("standby", hold, lambda y, t: t >= 5.0),
        Phase("startup", hold, lib["engine_running"],
              systems=lib["engine_start"]),
        Phase("takeoff", lib["fly_leg"](legs["departure"], 35.0, throttle=1.0),
              lib["airborne"]),
        Phase("departure",
              lib["fly_leg"](legs["departure"], 35.0, throttle=1.0),
              lib["captured"](legs["departure"])),
        Phase("crosswind",
              lib["fly_leg"](legs["crosswind"], 35.0, throttle=1.0),
              lib["captured"](legs["crosswind"])),
        Phase("downwind", lib["fly_leg"](legs["downwind"], 50.0),
              lib["captured"](legs["downwind"])),
        Phase("base", lib["fly_leg"](legs["base"], 30.0),
              lib["captured"](legs["base"]), systems=lib["flaps"](1.0)),
        Phase("final", lib["fly_leg"](legs["final"], 30.0),
              lib["final_done"], systems=lib["flaps"](1.0)),
        Phase("flare", lib["flare_apply"], lib["on_gnd"],
              systems=lib["flaps"](1.0)),
        Phase("ground", lib["ground_apply"], lambda y, t: jnp.asarray(False),
              systems=lib["ground_systems"]),
    ]
    world = _mission_world(phases, gains)
    sim = Simulation(world, dt=dt, periodic_dt=dt)

    # cold start on the runway threshold (`c172_demos.jl:634-640`)
    ic = kin_init(lat=LAT_LOWS15, lon=LON_LOWS15, h=H_LOWS15 + DH_TO_GND,
                  h_datum="orthometric", euler=[PSI_LOWS15, 0.0, 0.0])
    x, u, s = world.init(kin_init=ic, fuel=0.5)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x=x, u=u, s=s)

    final, log = sim.run(state, t_end=t_end, t0=0.0, save_every=save_every,
                         dispatch_blocks=20)
    return final, log


# ------------------------------------------------- linear-vs-nonlinear, UDP

def nlsim_q(amplitude=0.1, t_pulse=1.0, t_end=10.0, dt=0.02):
    """Nonlinear C172X vs its NED linearization under the same elevator
    pulse (`c172_demos.jl:108-206`, mode q comparison). Returns
    (ts_nonlinear, q_nonlinear, ts_linear, q_linear)."""
    from flightjax.physics.linearization import LinearStateSpace

    tp = C172.trim_parameters()
    lss, _, _ = c172x.linearize_ned(tp)

    # --- nonlinear: elevator pulse on the NED aircraft at the same trim
    from flightjax.physics.aircraftbase import SimpleWorld
    aircraft = c172x.build_aircraft("ned")
    world = SimpleWorld(aircraft)
    x0, u0, s0, _, _ = c172x.trim(aircraft.vehicle, tp)
    sim = Simulation(world, dt=dt)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x0}, u={"vehicle": u0},
                     s={"vehicle": s0, "terminated": jnp.asarray(False)})

    def with_delta(st, delta):
        act = dict(st.u["vehicle"]["systems"]["act"])
        act["elevator"] = act["elevator"] + delta
        sys_u = dict(st.u["vehicle"]["systems"], act=act)
        return st._replace(u={"vehicle": dict(st.u["vehicle"],
                                              systems=sys_u)})

    logs = []
    t0 = 0.0
    for delta, dur in [(amplitude, t_pulse), (-amplitude, t_end - t_pulse)]:
        state = with_delta(state, delta)
        state, log = sim.run(state, t_end=t0 + dur, t0=t0, save_every=2)
        logs.append(log)
        state = with_delta(state, -delta)
        t0 += dur
    t_nl = jnp.concatenate([l.t for l in logs])
    q_nl = jnp.concatenate(
        [l.y.aircraft.vehicle.kinematics.omega_wb_b[:, 1] for l in logs])

    # --- linear: same pulse through the LinearStateSpace component
    lin = LinearStateSpace(lss)
    lsim = Simulation(lin, dt=dt)
    lstate = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                      x=lin.init_x(), u=lin.init_u(), s=None)
    i_ele = list(lss.u_labels).index("elevator_cmd")
    i_q = list(lss.y_labels).index("q")
    llogs = []
    t0 = 0.0
    for delta, dur in [(amplitude, t_pulse), (-amplitude, t_end - t_pulse)]:
        lstate = lstate._replace(u=lstate.u.at[i_ele].add(delta))
        lstate, log = lsim.run(lstate, t_end=t0 + dur, t0=t0, save_every=2)
        llogs.append(log)
        lstate = lstate._replace(u=lstate.u.at[i_ele].add(-delta))
        t0 += dur
    t_l = jnp.concatenate([l.t for l in llogs])
    q_l = jnp.concatenate([l.y[:, i_q] for l in llogs])
    return t_nl, q_nl, t_l, q_l


def json_loopback(t_end=10.0, pace=30.0, port_cmd=49017, port_tlm=49018):
    """UDP JSON telecommand loopback (`c172_demos.jl:318-400`): a paced
    C172Xv1 run whose control-law inputs arrive as JSON over UDP and whose
    state is streamed back out as JSON — both ends over localhost inside
    this process. Returns the received telemetry lines."""
    import json as _json
    import threading
    import time as _time

    from flightjax.io.network import UDPInput, UDPOutput
    from flightjax.io.realtime import RealTimeLoop
    from flightjax.models.c172.mappings import (TelecommandMapping,
                                                TelemetryMapping)
    from flightjax.physics.aircraftbase import SimpleWorld

    aircraft = c172x.build_xv1("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=0.02, periodic_dt=0.02)
    state, _, _ = c172x.trim_world(aircraft, C172.trim_parameters())

    loop = RealTimeLoop(sim, state)
    loop.attach(UDPInput(port=port_cmd), TelecommandMapping(), period=0.1)
    loop.attach(UDPOutput(port=port_tlm), TelemetryMapping(), period=0.1)

    # external-side loopback threads (the reference runs these as separate
    # Simulations; a plain socket pair shows the same protocol)
    received = []

    def telemetry_rx():
        import socket
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.settimeout(0.5)
        sock.bind(("127.0.0.1", port_tlm))
        while len(received) < 20:
            try:
                data, _ = sock.recvfrom(65536)
            except OSError:
                if loop.control.abort:
                    break
                continue
            if data == b"\x04":
                break
            received.append(_json.loads(data.decode()))
        sock.close()

    def command_tx():
        import socket
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        _time.sleep(0.3)
        cmd = {"lon": {"mode_req": 8, "EAS_ref": 45.0, "h_ref": 1100.0},
               "lat": {"mode_req": 4, "chi_ref": 0.5}}
        for _ in range(5):
            sock.sendto(_json.dumps(cmd).encode(), ("127.0.0.1", port_cmd))
            _time.sleep(0.2)
        sock.close()

    rx = threading.Thread(target=telemetry_rx, daemon=True)
    tx = threading.Thread(target=command_tx, daemon=True)
    rx.start()
    tx.start()
    loop.run(t_end=t_end, pace=pace)
    rx.join(timeout=2)
    tx.join(timeout=2)
    return received
