"""Cessna 172Xv1 autopilot suite (mirrors `test_c172x1.jl:101-557`): trim
the aircraft, engage each mode, assert (a) no transient on engagement, and
(b) reference tracking within physical acceptance bands."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation
from flightjax.models.c172 import c172x, common as C172
from flightjax.models.c172 import c172x_ctl as CTL
from flightjax.models.c172.c172x_design import GAINS_PATH

pytestmark = pytest.mark.skipif(
    not os.path.exists(GAINS_PATH),
    reason="gain schedules not generated (run c172x_design.generate_lookups)")

DT = 0.01


@pytest.fixture(scope="module")
def rig():
    from flightjax.physics.aircraftbase import SimpleWorld
    aircraft = c172x.build_xv1("wa")
    world = SimpleWorld(aircraft)
    sim = Simulation(world, dt=DT, periodic_dt=DT)
    state0, ts, rnorm = c172x.trim_world(aircraft, C172.trim_parameters(),
                                         periodic_dt=DT)
    assert float(rnorm) < 1e-10
    vehicle = aircraft.vehicle
    _, y_trim = vehicle.f_ode(state0.x["vehicle"], state0.u["vehicle"],
                              state0.s["vehicle"], 0.0)
    return sim, state0, vehicle, y_trim


def set_ctl(state, **kw):
    """Return a new SimState with updated lon/lat control-law inputs."""
    av = {"lon": dict(state.u["avionics"]["lon"]),
          "lat": dict(state.u["avionics"]["lat"])}
    for k, v in kw.items():
        side, name = k.split("__")
        av[side][name] = (jnp.asarray(v, dtype=jnp.int32)
                          if name == "mode_req" else jnp.asarray(float(v)))
    return state._replace(u=dict(state.u, avionics=av))


def run(sim, state, seconds):
    final, _ = sim.run(state, t_end=float(state.t) + seconds, save_y=False,
                       t0=float(state.t))
    return final


def veh_y(vehicle, state):
    _, y = vehicle.f_ode(state.x["vehicle"], state.u["vehicle"],
                         state.s["vehicle"], float(state.t))
    return y


@pytest.mark.fast
def test_direct_preserves_trim(rig):
    sim, s0, vehicle, y_trim = rig
    final = run(sim, s0, 10.0)
    y = veh_y(vehicle, final)
    np.testing.assert_allclose(np.asarray(y.kinematics.omega_wb_b),
                               np.asarray(y_trim.kinematics.omega_wb_b),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(y.kinematics.v_eb_b),
                               np.asarray(y_trim.kinematics.v_eb_b),
                               atol=1e-2)


def test_sas_engagement_bumpless(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_SAS, lat__mode_req=CTL.LAT_SAS)
    final = run(sim, state, 10.0)
    assert int(final.s["avionics"]["lon"]["mode_prev"]) == CTL.LON_SAS
    assert int(final.s["avionics"]["lat"]["mode_prev"]) == CTL.LAT_SAS
    y = veh_y(vehicle, final)
    # reference acceptance band (`test_c172x1.jl:101-557`): 1e-5 rad/s,
    # 1e-2 m/s. Measured floor here is 6.7e-8 / 2.8e-4 (tools round-3
    # probe), so the reference band carries >1 decade of margin.
    np.testing.assert_allclose(np.asarray(y.kinematics.omega_wb_b),
                               np.asarray(y_trim.kinematics.omega_wb_b),
                               atol=1e-5)
    assert abs(float(y.kinematics.v_eb_b[0])
               - float(y_trim.kinematics.v_eb_b[0])) < 1e-2


def test_phi_beta_tracking(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_SAS,
                    lat__mode_req=CTL.LAT_PHI_BETA,
                    lat__phi_ref=np.pi / 12, lat__beta_ref=np.deg2rad(3))
    final = run(sim, state, 10.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.e_nb[2]) - np.pi / 12) < 1e-3
    assert abs(float(y.systems.aero.beta) - np.deg2rad(3)) < 1e-3


def test_p_beta_tracking(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_SAS,
                    lat__mode_req=CTL.LAT_P_BETA, lat__p_ref=0.02)
    final = run(sim, state, 10.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.omega_wb_b[0]) - 0.02) < 1e-3


def test_thr_theta_tracking(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_THR_THETA,
                    lat__mode_req=CTL.LAT_PHI_BETA,
                    lon__theta_ref=np.deg2rad(5), lat__phi_ref=np.pi / 6)
    final = run(sim, state, 10.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.e_nb[1]) - np.deg2rad(5)) < 1e-3


def test_thr_eas_tracking(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_THR_EAS,
                    lat__mode_req=CTL.LAT_PHI_BETA, lon__EAS_ref=45.0)
    final = run(sim, state, 30.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.airflow.EAS) - 45.0) < 0.2


def test_eas_clm_tracking(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_EAS_CLM,
                    lat__mode_req=CTL.LAT_PHI_BETA,
                    lon__EAS_ref=45.0, lon__clm_ref=2.0)
    final = run(sim, state, 30.0)
    y = veh_y(vehicle, final)
    assert abs(-float(y.kinematics.v_eb_n[2]) - 2.0) < 0.15
    assert abs(float(y.airflow.EAS) - 45.0) < 0.3


def test_eas_alt_acquire_and_hold(rig):
    sim, s0, vehicle, y_trim = rig
    h0 = float(y_trim.kinematics.h_e)
    state = set_ctl(s0, lon__mode_req=CTL.LON_EAS_ALT,
                    lat__mode_req=CTL.LAT_PHI_BETA,
                    lon__h_ref=h0 + 100.0)
    # far from target -> acquire (= thr_EAS at full throttle)
    state = run(sim, state, 1.0)
    assert int(state.s["avionics"]["lon"]["h_state"]) == CTL.ALT_ACQUIRE
    assert int(state.s["avionics"]["lon"]["mode_prev"]) == CTL.LON_THR_EAS
    # climb until captured
    state = run(sim, state, 80.0)
    assert int(state.s["avionics"]["lon"]["h_state"]) == CTL.ALT_HOLD
    y = veh_y(vehicle, state)
    assert abs(float(y.kinematics.h_e) - (h0 + 100.0)) < 2.0
    assert abs(float(y.airflow.EAS) - float(y_trim.airflow.EAS)) < 0.5


def test_thr_q_tracking(rig):
    """LON_THR_Q: direct throttle + pitch-rate tracking through the q2e
    integrator+PID over the te2te SAS (`test_c172x1.jl` thr_q block)."""
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_THR_Q,
                    lat__mode_req=CTL.LAT_PHI_BETA, lon__q_ref=0.01)
    final = run(sim, state, 5.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.omega_wb_b[1]) - 0.01) < 1e-3


def test_eas_q_tracking(rig):
    """LON_EAS_Q: EAS via throttle (v2t PID) + pitch rate via elevator."""
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_EAS_Q,
                    lat__mode_req=CTL.LAT_PHI_BETA,
                    lon__EAS_ref=45.0, lon__q_ref=0.0)
    final = run(sim, state, 30.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.omega_wb_b[1])) < 1e-3
    assert abs(float(y.airflow.EAS) - 45.0) < 0.3


def test_eas_theta_tracking(rig):
    """LON_EAS_THETA: EAS via throttle + pitch attitude via the theta->q
    conversion feeding the q2e loop."""
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_EAS_THETA,
                    lat__mode_req=CTL.LAT_PHI_BETA,
                    lon__EAS_ref=48.0, lon__theta_ref=np.deg2rad(3))
    final = run(sim, state, 30.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.e_nb[1]) - np.deg2rad(3)) < 1e-3
    assert abs(float(y.airflow.EAS) - 48.0) < 0.3


def test_chi_beta_tracking(rig):
    sim, s0, vehicle, y_trim = rig
    state = set_ctl(s0, lon__mode_req=CTL.LON_SAS,
                    lat__mode_req=CTL.LAT_CHI_BETA, lat__chi_ref=np.pi / 2)
    final = run(sim, state, 40.0)
    y = veh_y(vehicle, final)
    assert abs(float(y.kinematics.chi_gnd) - np.pi / 2) < 1e-2
