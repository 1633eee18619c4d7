"""Sensor-suite tests: exactness (zero-noise = truth), ISA baro inverse,
noise statistics, error-process growth, stream reproducibility, in-loop
vs post-hoc equivalence, GPS epoch gating, fleet vmap."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import geodesy as geo
from flightjax.ops.quaternions import qrot_inv
from flightjax.physics.atmosphere import P_STD, isa_data
from flightjax.physics.sensors import (
    SensorSuite, exact_suite_params, measure_trajectory, pressure_altitude,
    suite_params)

pytestmark = pytest.mark.fast


# -------------------------------------------------------------------- truth

@pytest.fixture(scope="module")
def vehicle_y():
    """Trimmed C172S vehicle output (KinData/AirData/DynamicsData)."""
    from flightjax.models.c172 import c172s, common as C172
    vehicle = c172s.build_vehicle("wa")
    x, u, s, ts, rnorm = c172s.trim(vehicle, C172.trim_parameters())
    assert float(rnorm) < 1e-8
    _, y = vehicle.f_ode(x, u, s, 0.0)
    return y


def _suite_inputs(seed=0, params=None):
    return {"seed": jnp.asarray(seed, jnp.int32),
            "params": suite_params() if params is None else params}


# --------------------------------------------------------------- baro core

def test_pressure_altitude_inverts_isa():
    h = jnp.linspace(-500.0, 80000.0, 257)
    _, p = isa_data(h)
    np.testing.assert_allclose(np.asarray(pressure_altitude(p)),
                               np.asarray(h), atol=1e-6)


def test_pressure_altitude_at_std_sea_level_is_zero():
    assert float(pressure_altitude(jnp.asarray(P_STD))) == 0.0


# -------------------------------------------------------------- exactness

def test_exact_suite_returns_truth(vehicle_y):
    y = vehicle_y
    kin, air, dyn = y.kinematics, y.airflow, y.dynamics
    suite = SensorSuite(dt=0.02)
    params = exact_suite_params()
    # place the IMU at the CoM so the lever-arm terms vanish identically
    params["imu"]["r_imu_b"] = dyn.mp_sum_b.r_OG
    u = _suite_inputs(params=params)
    s = suite.init_s()
    z = suite.measure(u, s, kin, air, dyn, h_trn=0.0)

    omega_ie_b = qrot_inv(kin.q_eb, jnp.asarray([0.0, 0.0, geo.omega_ie]))
    np.testing.assert_array_equal(np.asarray(z.omega_b),
                                  np.asarray(kin.omega_eb_b + omega_ie_b))
    np.testing.assert_allclose(np.asarray(z.f_b), np.asarray(dyn.f_c_c),
                               atol=1e-12)
    np.testing.assert_array_equal(np.asarray(z.p_s), np.asarray(air.p))
    np.testing.assert_array_equal(np.asarray(z.p_t), np.asarray(air.pt))
    np.testing.assert_allclose(np.asarray(z.CAS), np.asarray(air.CAS),
                               rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(z.mag_b),
        np.asarray(qrot_inv(kin.q_nb, u["params"]["mag"]["B_n"])))
    np.testing.assert_array_equal(np.asarray(z.gps_lat), np.asarray(kin.lat))
    np.testing.assert_array_equal(np.asarray(z.gps_lon), np.asarray(kin.lon))
    np.testing.assert_array_equal(np.asarray(z.gps_h), np.asarray(kin.h_e))
    np.testing.assert_array_equal(np.asarray(z.gps_v_n),
                                  np.asarray(kin.v_eb_n))
    # baro reads the geopotential altitude of the ISA-standard column
    np.testing.assert_allclose(np.asarray(z.h_baro),
                               np.asarray(geo.geop_from_orth(kin.h_o)),
                               atol=1e-6)
    # radar: the trim altitude (~1030 m AGL over zero-elevation terrain)
    # is beyond the 762 m range -> clamped reading, invalid flag
    np.testing.assert_allclose(
        np.asarray(z.h_radar),
        np.asarray(u["params"]["radar"]["h_max"]), atol=1e-12)
    assert not bool(z.radar_valid)
    # raise the terrain so the vehicle sits 500 m AGL: in-range and exact
    z2 = suite.measure(u, s, kin, air, dyn, h_trn=kin.h_o - 500.0)
    np.testing.assert_allclose(np.asarray(z2.h_radar), 500.0, atol=1e-9)
    assert bool(z2.radar_valid)


def test_imu_lever_arm_terms(vehicle_y):
    """With the IMU off the CoM, the accelerometer picks up the rigid-body
    transport terms alpha x r + omega x (omega x r) exactly."""
    y = vehicle_y
    kin, air, dyn = y.kinematics, y.airflow, y.dynamics
    suite = SensorSuite(dt=0.02)
    params = exact_suite_params()
    r_imu = jnp.asarray([1.0, 0.2, -0.3])
    params["imu"]["r_imu_b"] = r_imu
    z = suite.measure(_suite_inputs(params=params), suite.init_s(),
                      kin, air, dyn)
    omega_ib = kin.omega_eb_b + qrot_inv(
        kin.q_eb, jnp.asarray([0.0, 0.0, geo.omega_ie]))
    r = r_imu - dyn.mp_sum_b.r_OG
    expect = (dyn.f_c_c + jnp.cross(dyn.alpha_ib_b, r)
              + jnp.cross(omega_ib, jnp.cross(omega_ib, r)))
    np.testing.assert_allclose(np.asarray(z.f_b), np.asarray(expect),
                               rtol=1e-12)


# ----------------------------------------------------------- noise physics

def test_white_noise_statistics(vehicle_y):
    """Sample std across a fleet of lanes matches each sensor's sigma."""
    y = vehicle_y
    kin, air, dyn = y.kinematics, y.airflow, y.dynamics
    suite = SensorSuite(dt=0.02)
    p = suite_params()
    seeds = jnp.arange(4096, dtype=jnp.int32)

    def one(seed):
        u = {"seed": seed, "params": p}
        s = suite.init_s()
        s = dict(s, n=jnp.asarray(3, jnp.int32))  # arbitrary epoch
        return suite.measure(u, s, kin, air, dyn)

    z = jax.vmap(one)(seeds)
    checks = [
        (z.omega_b[:, 0] , float(p["imu"]["sigma_gyro"])),
        (z.f_b[:, 1], float(p["imu"]["sigma_accel"])),
        (z.p_s, float(p["airdata"]["sigma_p"])),
        (z.mag_b[:, 2], float(p["mag"]["sigma"])),
        (z.gps_v_n[:, 0], float(p["gps"]["sigma_vel"])),
    ]
    # the altimeter shares the (noisy) static port, so its output variance
    # compounds the pressure noise through dh/dp = R T / (g p) with its
    # own output-domain noise
    from flightjax.physics.atmosphere import G_STD, R_GAS
    dh_dp = float(R_GAS * air.T / (G_STD * air.p))
    sigma_h = float(jnp.sqrt((dh_dp * p["airdata"]["sigma_p"])**2
                             + p["baro"]["sigma"]**2))
    checks.append((z.h_baro, sigma_h))
    for arr, sigma in checks:
        sd = float(jnp.std(arr))
        assert 0.93 * sigma < sd < 1.07 * sigma, (sd, sigma)
    # GPS position: white + zero GM state -> sigma_pos mapped through M+h
    M, _ = geo.radii(kin.n_e)
    sd_lat = float(jnp.std(z.gps_lat)) * float(M + kin.h_e)
    assert 0.9 * float(p["gps"]["sigma_pos"]) < sd_lat < 1.1 * float(
        p["gps"]["sigma_pos"])


def test_bias_random_walk_and_gm_growth():
    """After N steps: gyro-bias variance = rw^2 dt N; the GPS Gauss-Markov
    variance follows sigma^2 (1 - phi^(2N)) from a zero start."""
    suite = SensorSuite(dt=0.02)
    p = suite_params()
    N = 400
    seeds = jnp.arange(2048, dtype=jnp.int32)

    def walk(seed):
        u = {"seed": seed, "params": p}
        s = suite.init_s()

        def body(s, _):
            _, s = suite.f_step(None, u, s, 0.0)
            return s, None

        s, _ = jax.lax.scan(body, s, None, length=N)
        return s

    s = jax.vmap(walk)(seeds)
    rw = float(p["imu"]["rw_gyro"])
    var_expect = rw * rw * suite.dt * N
    var = float(jnp.var(s["b_g"][:, 0]))
    assert 0.85 * var_expect < var < 1.15 * var_expect
    phi = float(jnp.exp(-suite.dt / p["gps"]["gm_tau"]))
    gm_sig = float(p["gps"]["gm_sigma"])
    var_gm_expect = gm_sig**2 * (1.0 - phi**(2 * N))
    var_gm = float(jnp.var(s["gm_gps"][:, 1]))
    assert 0.85 * var_gm_expect < var_gm < 1.15 * var_gm_expect


def test_streams_reproducible_and_lane_independent(vehicle_y):
    y = vehicle_y
    suite = SensorSuite(dt=0.02)
    s = dict(suite.init_s(), n=jnp.asarray(7, jnp.int32))
    za = suite.measure(_suite_inputs(seed=1), s, y.kinematics, y.airflow,
                       y.dynamics)
    zb = suite.measure(_suite_inputs(seed=1), s, y.kinematics, y.airflow,
                       y.dynamics)
    zc = suite.measure(_suite_inputs(seed=2), s, y.kinematics, y.airflow,
                       y.dynamics)
    np.testing.assert_array_equal(np.asarray(za.f_b), np.asarray(zb.f_b))
    assert not np.allclose(np.asarray(za.f_b), np.asarray(zc.f_b))


def test_turnon_bias_draw():
    suite = SensorSuite(dt=0.02)
    u = _suite_inputs()
    s = suite.init_s(u, init_key=jax.random.PRNGKey(3))
    assert float(jnp.linalg.norm(s["b_g"])) > 0.0
    s2 = suite.init_s(u, init_key=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(s["b_a"]), np.asarray(s2["b_a"]))


# ------------------------------------------------- trajectory / composition

def test_inloop_vs_posthoc_identical(vehicle_y):
    """measure_trajectory reproduces the in-loop step-then-measure stream
    bit-for-bit."""
    y = vehicle_y
    kin, air, dyn = y.kinematics, y.airflow, y.dynamics
    suite = SensorSuite(dt=0.02)
    u = _suite_inputs(seed=5)
    s0 = suite.init_s()
    K = 16
    stack = lambda tree: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), tree)
    zs, s_end = measure_trajectory(suite, u, s0, stack(kin), stack(air),
                                   stack(dyn))
    # manual in-loop: same PRNG stream draws; the compiled scan body may
    # fuse arithmetic differently from eager by a last-ulp, so compare to
    # tight float tolerance rather than bitwise
    s = s0
    for k in range(K):
        _, s = suite.f_step(None, u, s, 0.0)
        z = suite.measure(u, s, kin, air, dyn)
        np.testing.assert_allclose(np.asarray(zs.f_b[k]),
                                   np.asarray(z.f_b), rtol=1e-13, atol=1e-16)
        np.testing.assert_allclose(np.asarray(zs.gps_lat[k]),
                                   np.asarray(z.gps_lat), rtol=1e-13)
    assert int(s_end["n"]) == K


def test_gps_epoch_gating(vehicle_y):
    y = vehicle_y
    suite = SensorSuite(dt=0.02, gps_every=5)
    u = _suite_inputs()
    s0 = suite.init_s()
    K = 12
    stack = lambda tree: jax.tree.map(
        lambda a: jnp.broadcast_to(a, (K,) + jnp.shape(a)), tree)
    zs, _ = measure_trajectory(suite, u, s0, stack(y.kinematics),
                               stack(y.airflow), stack(y.dynamics))
    new = np.asarray(zs.gps_new)
    # epochs run 1..K; refresh when n % 5 == 0
    expect = np.asarray([(k % 5) == 0 for k in range(1, K + 1)])
    np.testing.assert_array_equal(new, expect)


def test_fleet_vmap_shapes(vehicle_y):
    """The whole suite vmaps over a fleet axis (per-lane seeds AND
    per-lane sensor grades)."""
    y = vehicle_y
    B = 8
    suite = SensorSuite(dt=0.02)
    p = suite_params()
    # per-lane gyro noise grades
    p["imu"]["sigma_gyro"] = jnp.linspace(1e-4, 1e-3, B)
    seeds = jnp.arange(B, dtype=jnp.int32)

    def one(seed, sigma_g):
        pi = jax.tree.map(lambda a: a, p)
        pi["imu"] = dict(pi["imu"], sigma_gyro=sigma_g)
        u = {"seed": seed, "params": pi}
        s = suite.init_s()
        _, s = suite.f_step(None, u, s, 0.0)
        return suite.measure(u, s, y.kinematics, y.airflow, y.dynamics)

    z = jax.vmap(one)(seeds, p["imu"]["sigma_gyro"])
    assert z.omega_b.shape == (B, 3)
    assert z.gps_lat.shape == (B,)


# --------------------------------------------------- end-to-end navigation

def test_c172_flight_sensors_feed_ahrs():
    """Close the avionics loop on real physics: fly the trimmed C172S for
    10 s, record the noisy IMU/mag stream post-hoc, and check a 6-state
    AHRS EKF holds attitude against the truth trajectory."""
    from flightjax.core.sim import Simulation, SimState
    from flightjax.models.c172 import c172s, common as C172
    from flightjax.utils.estimation import Ahrs, attitude_error_deg

    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=0.02)
    vehicle = world.aircraft.vehicle
    x, u, s, ts_trim, rnorm = c172s.trim(vehicle, C172.trim_parameters())
    assert float(rnorm) < 1e-8
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    _, log = sim.run(state, t_end=10.0, save_y=True)
    ys = log.y  # AircraftY stack
    kins, airs, dyns = (ys.vehicle.kinematics, ys.vehicle.airflow,
                        ys.vehicle.dynamics)

    suite = SensorSuite(dt=0.02)
    u_s = _suite_inputs(seed=11)
    s0 = suite.init_s(u_s, init_key=jax.random.PRNGKey(4))
    zs, _ = measure_trajectory(suite, u_s, s0, kins, airs, dyns)

    ahrs = Ahrs(dt=0.02)
    st0 = ahrs.init(q_nb=kins.q_nb[0])  # start at truth, prove tracking
    st, q_hist = ahrs.run(st0, zs.omega_b, zs.f_b, zs.mag_b)
    err = attitude_error_deg(q_hist, kins.q_nb)
    # trimmed cruise is near-1g: the gate keeps accel aiding live and the
    # filter must hold attitude within 2 deg throughout
    assert float(jnp.max(err)) < 2.0, float(jnp.max(err))
    assert float(err[-1]) < 1.0


def test_mag_field_ned_declination():
    """mag_field_ned reproduces the default field at D=0 and rotates the
    horizontal component east by D."""
    from flightjax.physics.sensors import mag_field_ned
    B0 = np.asarray(mag_field_ned())
    np.testing.assert_allclose(B0, [19.0e-6, 0.0, 45.0e-6], rtol=1e-12)
    D = np.deg2rad(12.0)
    B = np.asarray(mag_field_ned(declination=D))
    # total intensity and inclination preserved, horizontal rotated by D
    np.testing.assert_allclose(np.linalg.norm(B), np.linalg.norm(B0),
                               rtol=1e-12)
    np.testing.assert_allclose(B[2], B0[2], rtol=1e-12)
    np.testing.assert_allclose(np.arctan2(B[1], B[0]), D, rtol=1e-12)


def test_inject_fault_freeze_per_lane_k0():
    """ADVICE r3: 'freeze' must gather each lane's OWN frozen epoch when
    k0 is a per-lane array over trailing (lane) axes."""
    from flightjax.physics.sensors import SensorData, inject_fault
    K, L = 8, 3
    base = (jnp.arange(K, dtype=jnp.float64)[:, None]
            + 100.0 * jnp.arange(L, dtype=jnp.float64)[None, :])  # (K, L)
    z3 = jnp.zeros((K, 3))
    zb = jnp.zeros(K, bool)
    zs = SensorData(omega_b=z3, f_b=base, p_s=base[:, 0], p_t=base[:, 0],
                    T_oat=base[:, 0], CAS=base[:, 0], h_baro=base[:, 0],
                    mag_b=z3, gps_lat=base[:, 0], gps_lon=base[:, 0],
                    gps_h=base[:, 0], gps_v_n=z3, gps_new=zb,
                    h_radar=base[:, 0], radar_valid=jnp.ones(K, bool))
    k0 = jnp.asarray([2, 5, 7])
    out = np.asarray(inject_fault(zs, "f_b", "freeze", k0).f_b)
    for lane, kk in enumerate([2, 5, 7]):
        expect = np.asarray(base[:, lane]).copy()
        expect[kk:] = expect[kk]
        np.testing.assert_array_equal(out[:, lane], expect)
    # scalar k0 unchanged semantics
    out_s = np.asarray(inject_fault(zs, "f_b", "freeze", 4).f_b)
    expect = np.asarray(base).copy()
    expect[4:] = expect[4]
    np.testing.assert_array_equal(out_s, expect)
