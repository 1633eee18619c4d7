"""Cessna 172Xv2 (guidance) tests — mirrors `test_c172x2.jl:55-176`:
segment guidance geometry, mode overrides and thresholds, closed-loop
segment capture."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation
from flightjax.models.c172 import c172x, common as C172
from flightjax.models.c172 import c172x_ctl as CTL
from flightjax.models.c172 import c172x_gdc as GDC
from flightjax.models.c172.c172x_design import GAINS_PATH

pytestmark = pytest.mark.skipif(
    not os.path.exists(GAINS_PATH), reason="gain schedules not generated")

DT = 0.01


@pytest.mark.fast
def test_segment_data_geometry():
    """Along/cross-track decomposition (`c172x_gdc.jl:102-148`)."""
    seg = GDC.segment_from_vector(0.0, 0.0, 1000.0, chi=0.0, s=10000.0,
                                  dh=0.0)
    # a point 2 km along, 300 m right of track, 50 m above
    from flightjax.ops import geodesy as geo
    from flightjax.ops.quaternions import qrot
    n_e1 = seg.n_e1
    q_en = geo.ltf(n_e1)
    r = geo.cartesian_from_geographic(n_e1, seg.h_e1) \
        + qrot(q_en, jnp.asarray([2000.0, 300.0, -50.0]))
    n_e_b, h_e_b = geo.geographic_from_cartesian(r)
    d = GDC.segment_data(seg, n_e_b, h_e_b)
    assert float(d.s_12) == pytest.approx(10000.0, abs=0.1)
    assert float(d.s_1b) == pytest.approx(2000.0, abs=1.0)
    assert float(d.e_sb) == pytest.approx(300.0, abs=1.0)
    # a straight 2 km NED offset genuinely rises ~0.31 m above the ellipsoid
    # (earth curvature), so v_sb = 50 + s^2/(2R)
    assert float(d.v_sb) == pytest.approx(50.31, abs=0.1)
    assert float(d.chi_12) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.fast
def test_guidance_intercept_law():
    """dchi = -dchi_inf (2/pi) atan(e/e_sf) (`c172x_gdc.jl:243-244`)."""
    g = GDC.GuidanceLaws()
    # far right of track -> intercept ~ -90 deg; on track -> 0
    assert -np.pi / 2 < -g.DCHI_INF / (np.pi / 2) * np.arctan(1e6 / g.E_SF) \
        < -np.pi / 2 + 0.01


@pytest.mark.fast
def test_circle_data_geometry():
    """Circle-relative coordinates: bearing, radial error, tangent course
    (the reference's CircularGuidance is an unimplemented stub,
    `c172x_gdc.jl:256-268`; this mode exceeds it)."""
    from flightjax.ops import geodesy as geo
    from flightjax.ops.quaternions import qrot

    crc = GDC.circle(0.0, 0.0, 1000.0, radius=1500.0, turn_dir=1.0)
    # a point 2 km EAST of the center, 50 m below the circle altitude
    q_en = geo.ltf(crc.n_e)
    r = geo.cartesian_from_geographic(crc.n_e, crc.h_e) \
        + qrot(q_en, jnp.asarray([0.0, 2000.0, 50.0]))
    n_e_b, h_e_b = geo.geographic_from_cartesian(r)
    d = GDC.circle_data(crc, n_e_b, h_e_b)
    assert float(d.d_cb) == pytest.approx(2000.0, abs=1.0)
    assert float(d.e_cb) == pytest.approx(500.0, abs=1.0)
    assert float(d.sigma) == pytest.approx(np.pi / 2, abs=1e-3)
    # clockwise orbit at the east point flies SOUTH (sigma + 90 deg)
    assert abs(float(d.v_cb) + 50.0) < 0.5  # below the circle
    assert float(d.chi_tan) == pytest.approx(np.pi, abs=1e-3)
    # CCW tangent is the reverse: north
    crc2 = crc._replace(turn_dir=jnp.asarray(-1.0))
    d2 = GDC.circle_data(crc2, n_e_b, h_e_b)
    assert float(d2.chi_tan) == pytest.approx(0.0, abs=1e-3)


@pytest.mark.fast
def test_circular_capture_law_limits():
    """Far outside the circle the commanded course points AT the center;
    on the circle it is the pure tangent."""
    g = GDC.GuidanceLaws()
    # e -> +inf: correction -> turn_dir * pi/2, so chi_ref -> sigma + pi
    corr = 1.0 * g.DCHI_INF / (np.pi / 2) * np.arctan(1e9 / g.E_SF)
    assert corr == pytest.approx(np.pi / 2, abs=1e-3)
    # on-circle: zero correction
    assert 1.0 * g.DCHI_INF / (np.pi / 2) * np.arctan(0.0 / g.E_SF) == 0.0


@pytest.fixture(scope="module")
def v2rig():
    from flightjax.physics.aircraftbase import SimpleWorld
    aircraft = c172x.build_xv2("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state, ts, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                        periodic_dt=DT)
    assert float(rnorm) < 1e-10
    return sim, state, aircraft


def test_guidance_overrides_ctl(v2rig):
    """Active segment guidance forces chi_beta + EAS_alt mode requests
    (`c172x_gdc.jl:297-329`, `test_c172x2.jl:55-176`)."""
    sim, s0, aircraft = v2rig
    vehicle = aircraft.vehicle
    _, y0 = vehicle.f_ode(s0.x["vehicle"], s0.u["vehicle"],
                          s0.s["vehicle"], 0.0)
    h0 = float(y0.kinematics.h_e)

    # segment due east through the current position, at current altitude
    seg = GDC.segment_from_vector(0.0, -0.01, h0, chi=np.pi / 2, s=50000.0,
                                  dh=0.0)
    gdc_u = dict(s0.u["avionics"]["gdc"])
    gdc_u.update(mode_req=jnp.asarray(GDC.GDC_SEGMENT, dtype=jnp.int32),
                 target=seg, hor_gdc_req=jnp.asarray(True),
                 vrt_gdc_req=jnp.asarray(True))
    state = s0._replace(u=dict(s0.u, avionics=dict(s0.u["avionics"],
                                                   gdc=gdc_u)))

    # one periodic firing: ctl must be in chi_beta + EAS_alt
    final, _ = sim.run(state, t_end=1.0, t0=0.0, save_y=False)
    ctl_s = final.s["avionics"]["ctl"]
    assert int(ctl_s["lat"]["mode_prev"]) == CTL.LAT_CHI_BETA
    assert int(ctl_s["lon"]["mode_prev"]) in (CTL.LON_EAS_ALT,
                                              CTL.LON_THR_EAS)

    # fly 120 s: course captured east, altitude held on segment
    final, _ = sim.run(final, t_end=120.0, t0=1.0, save_y=False)
    _, y = vehicle.f_ode(final.x["vehicle"], final.u["vehicle"],
                         final.s["vehicle"], 120.0)
    assert abs(float(y.kinematics.chi_gnd) - np.pi / 2) < 0.05
    assert abs(float(y.kinematics.h_e) - h0) < 5.0
    # cross-track error shrinking toward the segment
    d = GDC.segment_data(seg, y.kinematics.n_e, y.kinematics.h_e)
    assert abs(float(d.e_sb)) < 500.0


def test_circular_guidance_orbit(v2rig):
    """Closed-loop loiter: capture a 1500 m circle from 500 m outside and
    orbit it clockwise at the circle altitude."""
    sim, s0, aircraft = v2rig
    vehicle = aircraft.vehicle
    _, y0 = vehicle.f_ode(s0.x["vehicle"], s0.u["vehicle"],
                          s0.s["vehicle"], 0.0)
    h0 = float(y0.kinematics.h_e)

    # circle center 2 km north of the aircraft -> initial e_cb = +500 m
    from flightjax.ops import geodesy as geo
    from flightjax.ops.quaternions import qrot
    q_en = geo.ltf(y0.kinematics.n_e)
    r_c = geo.cartesian_from_geographic(y0.kinematics.n_e, y0.kinematics.h_e)\
        + qrot(q_en, jnp.asarray([2000.0, 0.0, 0.0]))
    n_c, _ = geo.geographic_from_cartesian(r_c)
    lat_c, lon_c = geo.latlon_from_nvector(n_c)
    crc = GDC.circle(float(lat_c), float(lon_c), h0, radius=1500.0,
                     turn_dir=1.0)

    gdc_u = dict(s0.u["avionics"]["gdc"])
    gdc_u.update(mode_req=jnp.asarray(GDC.GDC_CIRCULAR, dtype=jnp.int32),
                 orbit=crc, hor_gdc_req=jnp.asarray(True),
                 vrt_gdc_req=jnp.asarray(True))
    state = s0._replace(u=dict(s0.u, avionics=dict(s0.u["avionics"],
                                                   gdc=gdc_u)))

    # 120 s: captured onto the circle
    mid, _ = sim.run(state, t_end=120.0, t0=0.0, save_y=False)
    _, y1 = vehicle.f_ode(mid.x["vehicle"], mid.u["vehicle"],
                          mid.s["vehicle"], 120.0)
    d1 = GDC.circle_data(crc, y1.kinematics.n_e, y1.kinematics.h_e)
    assert abs(float(d1.e_cb)) < 150.0
    assert abs(float(y1.kinematics.h_e) - h0) < 5.0

    # +60 s: still on the circle, bearing swept CLOCKWISE by ~v*t/R
    fin, _ = sim.run(mid, t_end=180.0, t0=120.0, save_y=False)
    _, y2 = vehicle.f_ode(fin.x["vehicle"], fin.u["vehicle"],
                          fin.s["vehicle"], 180.0)
    d2 = GDC.circle_data(crc, y2.kinematics.n_e, y2.kinematics.h_e)
    assert abs(float(d2.e_cb)) < 150.0
    assert abs(float(y2.kinematics.h_e) - h0) < 5.0
    from flightjax.ops.attitude import wrap_to_pi
    sweep = float(wrap_to_pi(d2.sigma - d1.sigma))
    # clockwise = bearing increasing; ~60 m/s on R=1500 m -> ~2.4 rad/60 s
    assert sweep > 1.0


def test_mission_phase_machine(v2rig):
    """3-phase scripted mission over the v1 avionics: climb -> level -> turn
    (exercises `core.mission` the way the reference's traffic-pattern script
    drives modes, `c172_demos.jl:406-660`)."""
    from flightjax.core.mission import MissionAvionics, Phase
    from flightjax.core.sim import SimState
    from flightjax.physics.aircraftbase import SimpleWorld
    from flightjax.models.c172.c172x_ctl import ControlLaws

    def eng_climb(u, y, t):
        lon = dict(u["lon"], mode_req=jnp.asarray(CTL.LON_EAS_CLM, jnp.int32),
                   clm_ref=jnp.asarray(2.0), EAS_ref=jnp.asarray(45.0))
        return dict(u, lon=lon)

    h_target = None  # set below from trim

    def eng_level(u, y, t):
        lon = dict(u["lon"], mode_req=jnp.asarray(CTL.LON_EAS_ALT, jnp.int32),
                   h_ref=jnp.asarray(h_target))
        return dict(u, lon=lon)

    def eng_turn(u, y, t):
        # each phase specifies its FULL override set (the level hold stays on)
        lon = dict(u["lon"], mode_req=jnp.asarray(CTL.LON_EAS_ALT, jnp.int32),
                   h_ref=jnp.asarray(h_target))
        lat = dict(u["lat"], mode_req=jnp.asarray(CTL.LAT_CHI_BETA, jnp.int32),
                   chi_ref=jnp.asarray(np.pi / 2))
        return dict(u, lon=lon, lat=lat)

    ctl = ControlLaws()
    aircraft = c172x.build_xv1("wa")
    world = SimpleWorld(c172x.Aircraft(
        aircraft.vehicle, avionics=None))  # placeholder

    # build a v1 aircraft with mission-wrapped avionics
    from flightjax.physics.aircraftbase import Aircraft
    vehicle = aircraft.vehicle
    x, u, s, ts, rnorm = c172x.trim(vehicle)
    _, y0 = vehicle.f_ode(x, u, s, 0.0)
    h0 = float(y0.kinematics.h_e)
    h_target = h0 + 50.0

    phases = [
        Phase("climb", eng_climb, lambda y, t: y.kinematics.h_e > h_target),
        Phase("level", eng_level,
              lambda y, t: jnp.abs(y.kinematics.h_e - h_target) < 5.0),
        Phase("turn", eng_turn, lambda y, t: jnp.asarray(False)),
    ]
    mission = MissionAvionics(ctl, phases)
    ac = Aircraft(vehicle, avionics=mission)
    world = SimpleWorld(ac)
    sim = Simulation(world, dt=DT, periodic_dt=DT)

    av_u, av_s = mission.init_from_trim(y0, DT)
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u, "avionics": av_u},
                     s={"vehicle": s, "avionics": av_s,
                        "terminated": jnp.asarray(False)})

    final, _ = sim.run(state, t_end=120.0, t0=0.0, save_y=False)
    assert int(final.s["avionics"]["phase"]) == 2  # reached the turn phase
    _, yf = vehicle.f_ode(final.x["vehicle"], final.u["vehicle"],
                          final.s["vehicle"], 120.0)
    assert abs(float(yf.kinematics.h_e) - h_target) < 5.0
    assert abs(float(yf.kinematics.chi_gnd) - np.pi / 2) < 0.1
