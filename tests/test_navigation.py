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


def test_gps_velocity_ramp_alarm_and_coast(nav_rig):
    """VERDICT r4 #3(a): a velocity-channel-only GPS fault (healthy
    position — the receiver failure mode a position-only monitor
    misses). A 1 m/s^2 velocity ramp must latch the GPS alarm through
    the VELOCITY NIS monitor and coast; the attitude estimate (coupled
    to velocity residuals through -C[fx]) must stay honest."""
    sim, state0, _ = nav_rig
    from flightjax.physics import navigation as NAV

    state = _engage_turning_climb(state0)
    av_u = dict(state.u["avionics"])
    fault = dict(NAV.no_fault(),
                 channel=jnp.asarray(NAV.FAULT_GPS_VEL, jnp.int32),
                 mode=jnp.asarray(NAV.MODE_RAMP, jnp.int32),
                 k0=jnp.asarray(750, jnp.int32),     # 15 s in
                 delta=jnp.asarray(1.0))             # 1 m/s per second
    state = state._replace(u=dict(state.u,
                                  avionics=dict(av_u, fault=fault)))
    final, log = sim.run(state, t_end=30.0, save_every=5)
    nav = log.y.avionics["nav"]
    t = np.asarray(log.t)
    alarms = np.asarray(nav["gps_alarm"])
    assert not alarms[t < 15.0].any()
    assert alarms[-1]
    # the POSITION monitor alone must NOT have latched before the
    # velocity monitor could (velocity-only fault): check the velocity
    # NIS is what blew up
    assert np.asarray(nav["nis_gps_vel"]).max() > 16.27
    # coasting: attitude stays sane, aircraft keeps tracking
    q_t = np.asarray(log.y.vehicle.kinematics.q_nb)
    q_e = np.asarray(nav["q_nb"])
    att_err = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(q_t * q_e, axis=-1)), 0.0, 1.0)))
    assert att_err[-1] < 3.0, att_err[-1]
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    assert abs(EAS[-1] - 45.0) < 2.0


def test_mag_hard_iron_jump_rejected(nav_rig):
    """VERDICT r4 #3(b): a hard-iron jump (20 uT on every body axis,
    ~half the field magnitude) must latch the MAG alarm and be rejected
    before it walks the heading: with mag aiding coasting, the heading
    error stays bounded by the gyro-bias drift rate, nowhere near the
    ~30 deg the corrupted field direction implies."""
    sim, state0, _ = nav_rig
    from flightjax.physics import navigation as NAV

    state = _engage_turning_climb(state0)
    av_u = dict(state.u["avionics"])
    fault = dict(NAV.no_fault(),
                 channel=jnp.asarray(NAV.FAULT_MAG, jnp.int32),
                 mode=jnp.asarray(NAV.MODE_BIAS, jnp.int32),
                 k0=jnp.asarray(750, jnp.int32),
                 delta=jnp.asarray(20e-6))
    state = state._replace(u=dict(state.u,
                                  avionics=dict(av_u, fault=fault)))
    final, log = sim.run(state, t_end=35.0, save_every=5)
    nav = log.y.avionics["nav"]
    t = np.asarray(log.t)
    m_alarms = np.asarray(nav["mag_alarm"])
    assert not m_alarms[t < 15.0].any()
    assert m_alarms[-1]
    assert not np.asarray(nav["gps_alarm"]).any()
    # heading stays honest (reject-and-coast, GPS-coupled attitude)
    psi_t = np.asarray(log.y.vehicle.kinematics.e_nb)[:, 0]
    q_e = np.asarray(nav["q_nb"])
    from flightjax.ops.attitude import quat_to_euler
    psi_e = np.asarray(jax.vmap(quat_to_euler)(jnp.asarray(q_e)))[:, 0]
    dpsi = np.degrees(np.abs(np.unwrap(psi_e) - np.unwrap(psi_t)))
    assert dpsi[t > 15.0].max() < 5.0, dpsi[t > 15.0].max()


def test_alignment_robustness_degraded_start(nav_rig):
    """VERDICT r4 #7: initialize the filter with realistic alignment
    errors (5 deg heading, 30 m position, 1 m/s velocity, catalog
    turn-on biases) — it must CAPTURE without false alarms and without
    the control loop departing (P0 is widened to the injected errors,
    which keeps the first innovations chi-square consistent)."""
    sim, _, aircraft = nav_rig
    from flightjax.core.sim import SimState
    from flightjax.models.c172 import c172x

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        x, u, s, ts, rnorm = c172x.trim(aircraft.vehicle,
                                        C172.trim_parameters())
        _, veh_y = aircraft.vehicle.f_ode(x, u, s, 0.0)
        init_errors = {"datt_n": (0.01, -0.01, np.deg2rad(5.0)),
                       "dp_n": (30.0, -20.0, 5.0),
                       "dv_n": (1.0, -0.5, 0.3)}
        u_av, s_av = aircraft.avionics.init_from_trim(
            veh_y, DT, init_key=jax.random.PRNGKey(42),
            init_errors=init_errors)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u, "avionics": u_av},
                     s={"vehicle": s, "avionics": s_av,
                        "terminated": jnp.asarray(False)})
    state = _engage_turning_climb(state)
    final, log = sim.run(state, t_end=40.0, save_every=10)

    nav = log.y.avionics["nav"]
    kin = log.y.vehicle.kinematics
    # no false alarms during capture
    assert not np.asarray(nav["gps_alarm"]).any()
    assert not np.asarray(nav["baro_alarm"]).any()
    assert not np.asarray(nav["mag_alarm"]).any()
    # capture: attitude error from 5+ deg down to < 1 deg settled
    q_t, q_e = np.asarray(kin.q_nb), np.asarray(nav["q_nb"])
    att_err = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(q_t * q_e, axis=-1)), 0.0, 1.0)))
    # the injected error is 5.0+ deg at t=0 by construction; the first
    # LOGGED sample (0.2 s, after a few aiding epochs) must still show
    # the capture in progress, and the tail must be settled
    assert att_err[0] > 0.8, att_err[0]
    assert att_err[-20:].max() < 1.0, att_err[-20:].max()
    assert att_err[0] > 3 * att_err[-1]
    # position capture: 30+ m initial error pulled under 5 m
    from flightjax.utils.estimation import ned_from_geodetic
    org = state.u["avionics"]["origin"]
    p_true = np.asarray(jax.vmap(
        lambda la, lo, he: ned_from_geodetic(la, lo, he, org["lat0"],
                                             org["lon0"], org["h0"]))(
        jnp.asarray(kin.lat), jnp.asarray(kin.lon), jnp.asarray(kin.h_e)))
    p_err = np.linalg.norm(np.asarray(nav["p_n"]) - p_true, axis=-1)
    assert p_err[-20:].max() < 5.0, p_err[-20:].max()
    # and the aircraft did not depart
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    assert abs(EAS[-1] - 45.0) < 1.0
    assert not bool(final.s["terminated"])


def test_synthetic_alpha_beta_holds_bands():
    """VERDICT r4 #4: the cascade flown with NO truth airflow-angle
    channels — alpha synthesized from the filter attitude/velocity and
    measured TAS, beta flown as zero — must still hold the turning-climb
    acceptance bands on the TRUE trajectory."""
    aircraft = c172x.build_xv1_nav("wa", periodic_dt=DT,
                                   nav_kw={"alpha_beta": "synthetic"})
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state, _, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                       periodic_dt=DT)
    assert float(rnorm) < 1e-10
    state = _engage_turning_climb(state)
    final, log = sim.run(state, t_end=40.0, save_every=10)

    kin = log.y.vehicle.kinematics
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    clm = -np.asarray(kin.v_eb_n)[:, 2]
    chi = np.asarray(kin.chi_gnd)
    assert abs(EAS[-1] - 45.0) < 0.5, EAS[-1]
    assert abs(clm[-1] - 1.5) < 0.2, clm[-1]
    assert abs(chi[-1] - np.pi / 2) < 2e-2, chi[-1]
    nav = log.y.avionics["nav"]
    assert not np.asarray(nav["gps_alarm"]).any()
    assert not np.asarray(nav["baro_alarm"]).any()


def test_vane_error_sensitivity_bands_hold():
    """VERDICT r4 #4 (sensitivity form): vane-grade alpha/beta errors
    (1 deg alpha bias, 0.5 deg beta bias) injected into the LQR feature
    channels — the acceptance bands must hold, bounding the documented
    truth-channel approximation."""
    aircraft = c172x.build_xv1_nav(
        "wa", periodic_dt=DT,
        nav_kw={"alpha_beta": ("perturb", np.deg2rad(1.0),
                               np.deg2rad(0.5))})
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state, _, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                       periodic_dt=DT)
    state = _engage_turning_climb(state)
    final, log = sim.run(state, t_end=40.0, save_every=10)
    kin = log.y.vehicle.kinematics
    EAS = np.asarray(log.y.vehicle.airflow.EAS)
    clm = -np.asarray(kin.v_eb_n)[:, 2]
    chi = np.asarray(kin.chi_gnd)
    assert abs(EAS[-1] - 45.0) < 0.5, EAS[-1]
    assert abs(clm[-1] - 1.5) < 0.2, clm[-1]
    assert abs(chi[-1] - np.pi / 2) < 2e-2, chi[-1]


def test_min_detectable_gps_fault_scales_with_R():
    """ADVICE r4: characterize the FDI sensitivity consequence of the
    f32 GPS derating. The NIS monitor's minimum detectable instant
    position bias is ~sqrt(gate)*sigma_R: with the catalog R (f64 path,
    sigma ~1.7 m) a 10 m jump alarms within the monitor window; with the
    f32-derated R (sigma ~20 m) the same 10 m jump does NOT, while an
    85+ m jump does."""
    from flightjax.utils.estimation import InsGps, innovation_monitor, nis

    def alarms_for(delta, R):
        # static hover: innovation = delta against S = P_pos + R
        P_pos = jnp.eye(3) * 1.0
        S = P_pos + R
        init, update = innovation_monitor(16.27, window=6, min_hits=3)
        mon = init()
        y = jnp.asarray([delta, 0.0, 0.0])
        for _ in range(6):
            mon, alarm = update(mon, nis(y, S), valid=True)
        return bool(alarm)

    f = InsGps(dt=0.02)
    R64 = f.R_pos_eff(jnp.float64)
    R32 = f.R_pos_eff(jnp.float32).astype(jnp.float64)
    assert alarms_for(10.0, R64)          # f64: 10 m jump detected
    assert not alarms_for(10.0, R32)      # f32 derating: 10 m invisible
    assert alarms_for(85.0, R32)          # f32: ~4-sigma of derated R
    assert not alarms_for(3.0, R64)       # both: inside catalog noise


def test_deferred_covariance_matches_exact(nav_rig):
    """The deferred covariance scheme (mean mechanization every firing,
    one compounded P propagation per aiding interval —
    `InsGps.predict_mean`/`propagate_P`) must reproduce the exact
    per-firing recursion's navigation solution to well inside the
    estimation error: same 20 s closed-loop run, attitude estimates
    within 0.05 deg, position estimates within 0.1 m of each other."""
    sim, state0, _ = nav_rig  # deferred (default)
    state = _engage_turning_climb(state0)
    _, log_d = sim.run(state, t_end=20.0, save_every=10)

    aircraft_e = c172x.build_xv1_nav("wa", periodic_dt=DT,
                                     nav_kw={"defer_cov": False})
    world_e = SimpleWorld(aircraft_e)
    sim_e = Simulation(world_e, dt=DT, periodic_dt=DT)
    st_e, _, _ = c172x.trim_world(aircraft_e, C172.trim_parameters(),
                                  periodic_dt=DT)
    _, log_e = sim_e.run(_engage_turning_climb(st_e), t_end=20.0,
                         save_every=10)

    nav_d, nav_e = log_d.y.avionics["nav"], log_e.y.avionics["nav"]
    q_d, q_e = np.asarray(nav_d["q_nb"]), np.asarray(nav_e["q_nb"])
    datt = np.degrees(2 * np.arccos(np.clip(
        np.abs(np.sum(q_d * q_e, axis=-1)), 0.0, 1.0)))
    assert datt.max() < 0.05, datt.max()
    dp = np.linalg.norm(np.asarray(nav_d["p_n"]) - np.asarray(nav_e["p_n"]),
                        axis=-1)
    assert dp.max() < 0.1, dp.max()
    # the truth trajectories (closed loop!) also stay together
    dh = np.abs(np.asarray(log_d.y.vehicle.kinematics.h_e)
                - np.asarray(log_e.y.vehicle.kinematics.h_e))
    assert dh.max() < 0.5, dh.max()
    # and neither run alarmed
    for nav in (nav_d, nav_e):
        assert not np.asarray(nav["gps_alarm"]).any()
        assert not np.asarray(nav["baro_alarm"]).any()


def test_heading_at_high_declination_location():
    """VERDICT r4 #5 'done' criterion: closed-loop nav at a HIGH-
    DECLINATION location (northern Canada; dipole declination ~ -25 deg).
    `init_from_trim`'s default geomag="dipole" feeds the SAME
    location-derived field to the magnetometer truth and the filter, so
    the heading estimate must stay unbiased — and a deliberately
    mismatched (zero-declination) filter field must be CAUGHT by the mag
    innovation gate (a ~25 deg direction mismatch scores NIS in the
    hundreds): alarm latched, corrupted aiding rejected, heading still
    honest instead of silently walking to the declination bias."""
    from flightjax.ops.attitude import quat_to_euler
    from flightjax.physics.sensors import mag_declination, mag_field_dipole

    lat, lon = np.deg2rad(68.0), np.deg2rad(-120.0)
    D, _, _ = mag_declination(mag_field_dipole(jnp.asarray(lat),
                                               jnp.asarray(lon)))
    assert abs(np.degrees(float(D))) > 10.0  # genuinely high declination

    def rig(geomag):
        aircraft = c172x.build_xv1_nav("wa", periodic_dt=DT,
                                       nav_kw={"geomag": geomag})
        world = SimpleWorld(aircraft)
        sim = Simulation(world, dt=DT, periodic_dt=DT)
        tp = C172.trim_parameters(lat=float(lat), lon=float(lon))
        state, _, rnorm = c172x.trim_world(aircraft, tp, periodic_dt=DT)
        assert float(rnorm) < 1e-8
        return sim, state

    def run_leg(sim, state, t_end=30.0):
        final, log = sim.run(state, t_end=t_end, save_every=25)
        nav = log.y.avionics["nav"]
        psi_e = np.asarray(jax.vmap(quat_to_euler)(
            jnp.asarray(nav["q_nb"])))[:, 0]
        psi_t = np.asarray(log.y.vehicle.kinematics.e_nb)[:, 0]
        d = np.degrees(np.unwrap(psi_e) - np.unwrap(psi_t))
        return d[-10:], nav  # settled tail + nav log

    sim_d, st_d = rig("dipole")
    tail, nav = run_leg(sim_d, st_d)
    # convergence is slower here than at mid-latitudes (the horizontal
    # field component shrinks toward the pole), hence the 30 s leg
    assert np.abs(tail).max() < 1.0, tail  # correct-by-default
    assert not np.asarray(nav["mag_alarm"]).any()

    # mismatch control: filter believes the fixed zero-declination field
    # while the magnetometer measures the local dipole field — the mag
    # direction innovation is ~|D| (far outside the gate), so the FDI
    # must flag the misconfiguration and reject the aiding
    sim_m, st_m = rig("dipole")
    av_u = dict(st_m.u["avionics"])
    from flightjax.physics.sensors import mag_params
    av_u["origin"] = dict(av_u["origin"],
                          B_n=mag_params()["B_n"])  # zero-declination
    st_m = st_m._replace(u=dict(st_m.u, avionics=av_u))
    tail_m, nav_m = run_leg(sim_m, st_m)
    assert np.asarray(nav_m["mag_alarm"])[-1]      # caught
    assert np.abs(tail_m).max() < 3.0, tail_m      # heading not walked
