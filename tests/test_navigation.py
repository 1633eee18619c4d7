"""Closed-loop navigation avionics tests: the C172X control laws flying
on ESTIMATED states (truth -> SensorSuite -> InsGps -> ControlLaws),
the VERDICT-r3 #1 'close the sensor->control loop' capability.

No reference counterpart: Flight.jl's avionics consume true KinData
(`aircraftbase.jl:201-210`). The acceptance bands mirror the truth-fed
autopilot suite (`tests/test_c172x1.py`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation
from flightjax.models.c172 import c172x, common as C172
from flightjax.models.c172 import c172x_ctl as CTL
from flightjax.physics.aircraftbase import SimpleWorld

pytestmark = pytest.mark.fast

DT = 0.02


def _engage_turning_climb(state, EAS_ref=45.0, clm_ref=1.5,
                          chi_ref=np.pi / 2):
    av = dict(state.u["avionics"])
    inner = {"lon": dict(av["inner"]["lon"]), "lat": dict(av["inner"]["lat"])}
    inner["lon"]["mode_req"] = jnp.asarray(CTL.LON_EAS_CLM, jnp.int32)
    inner["lon"]["EAS_ref"] = jnp.asarray(float(EAS_ref))
    inner["lon"]["clm_ref"] = jnp.asarray(float(clm_ref))
    inner["lat"]["mode_req"] = jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32)
    inner["lat"]["chi_ref"] = jnp.asarray(float(chi_ref))
    av["inner"] = inner
    return state._replace(u=dict(state.u, avionics=av))


@pytest.fixture(scope="module")
def nav_rig():
    aircraft = c172x.build_xv1_nav("wa", periodic_dt=DT)
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state, _, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                       periodic_dt=DT)
    assert float(rnorm) < 1e-10
    return sim, state, aircraft


def test_estimate_airspeed_exact_inverse():
    """With a zero-noise suite the pressure-derived TAS/EAS reproduce the
    truth chain (`atmosphere.air_data`) bit-for-bit-ish."""
    from flightjax.models.c172 import c172s
    from flightjax.physics.navigation import estimate_airspeed
    from flightjax.physics.sensors import SensorSuite, exact_suite_params

    vehicle = c172s.build_vehicle("wa")
    x, u, s, _, _ = c172s.trim(vehicle, C172.trim_parameters())
    _, y = vehicle.f_ode(x, u, s, 0.0)
    suite = SensorSuite(dt=DT)
    su = {"seed": jnp.asarray(0, jnp.int32), "params": exact_suite_params()}
    z = suite.measure(su, suite.init_s(), y.kinematics, y.airflow,
                      y.dynamics)
    TAS, EAS = estimate_airspeed(z)
    np.testing.assert_allclose(float(TAS), float(y.airflow.TAS), rtol=1e-12)
    np.testing.assert_allclose(float(EAS), float(y.airflow.EAS), rtol=1e-12)


def test_sensor_fed_turning_climb_holds_bands(nav_rig):
    """40 s EAS+climb+course capture flown entirely on estimated states:
    the truth-fed acceptance bands (test_c172x1) hold on the TRUE
    trajectory, and the estimator tracked truth throughout."""
    sim, state0, aircraft = nav_rig
    state = _engage_turning_climb(state0)
    final, log = sim.run(state, t_end=40.0, save_every=10)

    kin = log.y.vehicle.kinematics
    nav = log.y.avionics["nav"]
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    clm = -np.asarray(kin.v_eb_n)[:, 2]
    chi = np.asarray(kin.chi_gnd)

    # tracking of the TRUE quantities (same bands as the truth-fed suite)
    assert abs(EAS[-1] - 45.0) < 0.3, EAS[-1]
    assert abs(clm[-1] - 1.5) < 0.15, clm[-1]
    assert abs(chi[-1] - np.pi / 2) < 1e-2, chi[-1]

    # the estimator stayed honest: attitude within 3 deg through the
    # engagement transient (bias observability builds with the maneuver;
    # 2.3 deg measured at the production 10 Hz mag/baro aiding rates)
    # and under 0.3 deg once settled; altitude within a few metres; no
    # false FDI alarms on a healthy run
    q_t, q_e = np.asarray(kin.q_nb), np.asarray(nav["q_nb"])
    att_err = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(q_t * q_e, axis=-1)), 0.0, 1.0)))
    assert att_err.max() < 3.0, att_err.max()
    assert att_err[-50:].max() < 0.3, att_err[-50:].max()
    h_err = np.abs(np.asarray(nav["h_est"]) - np.asarray(kin.h_e))
    assert h_err.max() < 5.0, h_err.max()
    assert not np.asarray(nav["gps_alarm"]).any()
    assert not np.asarray(nav["baro_alarm"]).any()


def test_shadow_mode_matches_truth_fed_exactly(nav_rig):
    """use_estimates=False: filters run in shadow but the inner laws see
    truth — the vehicle trajectory must be bit-identical to the plain
    truth-fed C172Xv1 (regression anchor for the estimated-Y plumbing)."""
    aircraft_sh = c172x.build_xv1_nav("wa", periodic_dt=DT,
                                      use_estimates=False)
    world_sh = SimpleWorld(aircraft_sh)
    sim_sh = Simulation(world_sh, dt=DT, periodic_dt=DT)
    st_sh, _, _ = c172x.trim_world(aircraft_sh, C172.trim_parameters(),
                                   periodic_dt=DT)

    aircraft_tr = c172x.build_xv1("wa")
    world_tr = SimpleWorld(aircraft_tr)
    sim_tr = Simulation(world_tr, dt=DT, periodic_dt=DT)
    st_tr, _, _ = c172x.trim_world(aircraft_tr, C172.trim_parameters(),
                                   periodic_dt=DT)

    def engage(state):
        av = dict(state.u["avionics"])
        tgt = av["inner"] if "inner" in av else av
        lon = dict(tgt["lon"], mode_req=jnp.asarray(CTL.LON_EAS_CLM,
                                                    jnp.int32),
                   EAS_ref=jnp.asarray(45.0), clm_ref=jnp.asarray(1.5))
        lat = dict(tgt["lat"], mode_req=jnp.asarray(CTL.LAT_PHI_BETA,
                                                    jnp.int32),
                   phi_ref=jnp.asarray(np.pi / 12))
        new = dict(tgt, lon=lon, lat=lat)
        if "inner" in av:
            av = dict(av, inner=new)
        else:
            av = new
        return state._replace(u=dict(state.u, avionics=av))

    f_sh, _ = sim_sh.run(engage(st_sh), t_end=10.0, save_y=False)
    f_tr, _ = sim_tr.run(engage(st_tr), t_end=10.0, save_y=False)
    a = f_sh.x["vehicle"]["kinematics"]
    b = f_tr.x["vehicle"]["kinematics"]
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=1e-12, err_msg=k)


def test_nav_loop_vmaps_over_fleet(nav_rig):
    """Per-lane sensor seeds: the closed loop vmaps; lanes diverge only
    by sensor noise (metres/centi-m/s scale over 5 s)."""
    from flightjax.parallel import fleet

    sim, state0, _ = nav_rig
    state = _engage_turning_climb(state0)
    B = 4
    st = fleet.broadcast_state(state, B)
    av_u = dict(st.u["avionics"])
    sens = dict(av_u["sens"], seed=jnp.arange(B, dtype=jnp.int32))
    st = st._replace(u=dict(st.u, avionics=dict(av_u, sens=sens)))

    st = fleet.fleet_rollout(sim, st, n_steps=250)
    h = np.asarray(st.x["vehicle"]["kinematics"]["h_e"])
    assert np.isfinite(h).all()
    assert h.std() > 0.0          # lanes actually saw different noise
    assert h.std() < 5.0          # but stayed together
    for leaf in jax.tree.leaves(st.s["avionics"]["nav"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gps_freeze_alarm_and_coast(nav_rig):
    """In-loop FDI mission (single lane): freeze the GPS mid-flight —
    the innovation monitor must latch, updates must stop (coast), and
    the altitude estimate must stay usable on IMU+baro."""
    sim, state0, _ = nav_rig
    from flightjax.physics import navigation as NAV

    state = _engage_turning_climb(state0)
    av_u = dict(state.u["avionics"])
    fault = dict(NAV.no_fault(),
                 channel=jnp.asarray(NAV.FAULT_GPS, jnp.int32),
                 mode=jnp.asarray(NAV.MODE_FREEZE, jnp.int32),
                 k0=jnp.asarray(750, jnp.int32))  # 15 s in
    state = state._replace(u=dict(state.u,
                                  avionics=dict(av_u, fault=fault)))
    final, log = sim.run(state, t_end=40.0, save_every=5)
    nav = log.y.avionics["nav"]
    alarms = np.asarray(nav["gps_alarm"])
    t = np.asarray(log.t)
    # no alarm before the fault epoch, latched alarm well after
    assert not alarms[t < 15.0].any()
    assert alarms[-1]
    # coasting: altitude estimate still within 15 m on IMU+baro
    h_err = np.abs(np.asarray(nav["h_est"]) - np.asarray(
        log.y.vehicle.kinematics.h_e))
    assert h_err.max() < 15.0, h_err.max()
    # and the aircraft kept flying sanely (EAS within 2 m/s of ref)
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    assert abs(EAS[-1] - 45.0) < 2.0


def test_fleet_fdi_mission_on_virtual_mesh(nav_rig):
    """VERDICT r3 #3 'done' criterion: a Monte Carlo fleet on the virtual
    device mesh where GPS-faulted lanes latch the alarm and healthy lanes
    don't — the in-loop FDI mission at fleet scale through the shipped
    shard_map path."""
    from flightjax.parallel import fleet
    from flightjax.physics import navigation as NAV

    sim, state0, _ = nav_rig
    state = _engage_turning_climb(state0)
    B = 8
    st = fleet.broadcast_state(state, B)
    av_u = dict(st.u["avionics"])
    av_u["sens"] = dict(av_u["sens"], seed=jnp.arange(B, dtype=jnp.int32))
    # lanes 0..3 healthy (k0 = never), lanes 4..7 GPS-frozen at 10 s
    faulted = jnp.arange(B) >= 4
    k0 = jnp.where(faulted, 500, NAV._NEVER).astype(jnp.int32)
    av_u["fault"] = dict(NAV.no_fault(),
                         channel=jnp.full(B, NAV.FAULT_GPS, jnp.int32),
                         mode=jnp.full(B, NAV.MODE_FREEZE, jnp.int32),
                         k0=k0, k1=jnp.full(B, NAV._NEVER, jnp.int32),
                         delta=jnp.zeros(B))
    st = st._replace(u=dict(st.u, avionics=av_u))

    n_dev = 4
    mesh, st_sh = fleet.shard_fleet(st, devices=jax.devices()[:n_dev])
    roll = fleet.sharded_rollout_fn(sim, mesh, n_steps=1000)  # 20 s
    out, t_mean = roll(st_sh)
    np.testing.assert_allclose(float(t_mean), 20.0, atol=1e-9)

    alarms = np.asarray(out.s["avionics"]["mon_gps"]["alarm"])
    np.testing.assert_array_equal(alarms, np.asarray(faulted))
    # healthy lanes still hold the climb; faulted lanes coast but stay
    # airborne and finite
    h = np.asarray(out.x["vehicle"]["kinematics"]["h_e"])
    assert np.isfinite(h).all()
    assert not np.asarray(out.s["terminated"]).any()


def test_gps_epoch_gate_is_exact(nav_rig):
    """`Simulation.fleet_step`'s fleet-level GPS-epoch gate (skip the
    monitored-GPS block when no lane has an epoch) must reproduce the
    ungated fleet path to reassociation tolerance (same geoid cadence;
    only the gate differs)."""
    from flightjax.parallel import fleet

    sim, state0, aircraft = nav_rig
    state = _engage_turning_climb(state0)
    B = 3
    st0 = fleet.broadcast_state(state, B)
    av_u = dict(st0.u["avionics"])
    av_u["sens"] = dict(av_u["sens"], seed=jnp.arange(B, dtype=jnp.int32))
    st0 = st0._replace(u=dict(st0.u, avionics=av_u))

    def roll(st):
        step = jax.jit(lambda s: sim.fleet_step(s, ()))
        for _ in range(25):
            st = step(st)
        return st

    gated = roll(st0)

    av = aircraft.avionics
    orig = av.__class__.epoch_preds
    try:
        av.epoch_preds = lambda s_av: None  # disable all gates
        ungated = roll(st0)
    finally:
        del av.epoch_preds
        assert av.__class__.epoch_preds is orig

    for a, b in zip(jax.tree.leaves(gated), jax.tree.leaves(ungated)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == bool or np.issubdtype(a.dtype, np.integer):
            np.testing.assert_array_equal(a, b)
        else:
            np.testing.assert_allclose(a, b, rtol=1e-9, atol=1e-12)


def test_guided_loiter_on_estimates():
    """C172Xv2 + NavAvionics: circular (loiter) guidance closed entirely
    over the navigation solution — the guidance laws read the FILTER's
    position/course (estimated n_e/chi in the estimated VehicleY), not
    truth. 60 s from 500 m outside the circle: radial error shrinking,
    altitude held, no FDI alarms."""
    from flightjax.core.sim import Simulation
    from flightjax.models.c172 import c172x_gdc as GDC
    from flightjax.ops import geodesy as geo
    from flightjax.ops.quaternions import qrot

    aircraft = c172x.build_xv2_nav("wa", periodic_dt=DT)
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state, _, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                       periodic_dt=DT)
    assert float(rnorm) < 1e-10

    _, y0 = aircraft.vehicle.f_ode(state.x["vehicle"], state.u["vehicle"],
                                   state.s["vehicle"], 0.0)
    h0 = float(y0.kinematics.h_e)
    q_en = geo.ltf(y0.kinematics.n_e)
    r_c = geo.cartesian_from_geographic(y0.kinematics.n_e,
                                        y0.kinematics.h_e) \
        + qrot(q_en, jnp.asarray([2000.0, 0.0, 0.0]))
    n_c, _ = geo.geographic_from_cartesian(r_c)
    lat_c, lon_c = geo.latlon_from_nvector(n_c)
    orbit = GDC.circle(float(lat_c), float(lon_c), h0, radius=1500.0)

    av = dict(state.u["avionics"])
    inner = dict(av["inner"])
    inner["gdc"] = dict(inner["gdc"],
                        mode_req=jnp.asarray(GDC.GDC_CIRCULAR, jnp.int32),
                        orbit=orbit, hor_gdc_req=jnp.asarray(True),
                        vrt_gdc_req=jnp.asarray(True))
    inner["ctl"] = dict(inner["ctl"],
                        lon=dict(inner["ctl"]["lon"],
                                 EAS_ref=jnp.asarray(40.0)))
    av["inner"] = inner
    state = state._replace(u=dict(state.u, avionics=av))

    final, log = sim.run(state, t_end=60.0, save_every=100)
    assert not bool(final.s["terminated"])
    kin = log.y.vehicle.kinematics
    assert abs(float(kin.h_e[-1]) - h0) < 10.0
    d0 = GDC.circle_data(orbit, kin.n_e[0], kin.h_e[0])
    d1 = GDC.circle_data(orbit, kin.n_e[-1], kin.h_e[-1])
    assert abs(float(d1.e_cb)) < abs(float(d0.e_cb)) * 0.7, \
        (float(d0.e_cb), float(d1.e_cb))
    nav = log.y.avionics["nav"]
    assert not np.asarray(nav["gps_alarm"]).any()
    assert not np.asarray(nav["baro_alarm"]).any()


def test_baro_fault_alarm_and_reject(nav_rig):
    """In-loop FDI, baro channel: a 60 m baro bias jump mid-flight must
    latch the baro alarm (updates rejected — the filter stays
    GPS-anchored, altitude estimate error bounded) while the GPS monitor
    stays quiet."""
    sim, state0, _ = nav_rig
    from flightjax.physics import navigation as NAV

    state = _engage_turning_climb(state0)
    av_u = dict(state.u["avionics"])
    fault = dict(NAV.no_fault(),
                 channel=jnp.asarray(NAV.FAULT_BARO, jnp.int32),
                 mode=jnp.asarray(NAV.MODE_BIAS, jnp.int32),
                 k0=jnp.asarray(750, jnp.int32),     # 15 s in
                 delta=jnp.asarray(60.0))
    state = state._replace(u=dict(state.u,
                                  avionics=dict(av_u, fault=fault)))
    final, log = sim.run(state, t_end=30.0, save_every=5)
    nav = log.y.avionics["nav"]
    t = np.asarray(log.t)
    b_alarms = np.asarray(nav["baro_alarm"])
    assert not b_alarms[t < 15.0].any()
    assert b_alarms[-1]
    assert not np.asarray(nav["gps_alarm"]).any()
    # altitude estimate stays GPS-anchored despite the 60 m baro lie
    h_err = np.abs(np.asarray(nav["h_est"]) - np.asarray(
        log.y.vehicle.kinematics.h_e))
    assert h_err[t > 20.0].max() < 10.0, h_err[t > 20.0].max()
    # and the aircraft keeps tracking
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    assert abs(EAS[-1] - 45.0) < 1.0
