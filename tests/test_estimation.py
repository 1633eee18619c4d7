"""Estimation tests: Kalman algebra against closed forms, EKF = KF on
linear models, masked (intermittent) updates, and AHRS convergence on a
synthetic IMU/mag record generated with the sensor-suite noise idioms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops.attitude import euler_to_quat, rvec_to_quat
from flightjax.ops.quaternions import qmul, qnormalize, qrot_inv
from flightjax.utils.estimation import (
    Ahrs, attitude_error_deg, ekf_predict, ekf_update, kf_predict,
    kf_update, masked_update)

pytestmark = pytest.mark.fast


# ------------------------------------------------------------ linear KF

def test_scalar_kf_steady_state():
    """Random-walk + direct observation: the steady-state predicted
    variance solves M = M + q - M^2/(M + r) -> M = (q + sqrt(q^2 + 4qr))/2."""
    q, r = 0.04, 1.0
    F = jnp.eye(1)
    Q = jnp.asarray([[q]])
    H = jnp.eye(1)
    R = jnp.asarray([[r]])
    x, P = jnp.zeros(1), jnp.asarray([[10.0]])
    for _ in range(200):
        x, P = kf_predict(x, P, F, Q)
        x, P, _ = kf_update(x, P, H, jnp.zeros(1), R)
        x, P = x, P
    M = float(P[0, 0]) + 0.0
    # steady-state *updated* variance: P = M r/(M + r) with M the predicted
    M_pred = (q + np.sqrt(q * q + 4 * q * r)) / 2
    P_expect = M_pred * r / (M_pred + r)
    np.testing.assert_allclose(M, P_expect, rtol=1e-10)


def test_kf_estimates_constant():
    """Observing a constant through noise: the estimate converges to the
    sample-mean rate (variance ~ r/k)."""
    key = jax.random.PRNGKey(0)
    truth = 3.7
    K = 500
    zs = truth + 0.5 * jax.random.normal(key, (K, 1))
    F, Q, H, R = jnp.eye(1), jnp.zeros((1, 1)), jnp.eye(1), jnp.asarray([[0.25]])

    def body(carry, z):
        x, P = carry
        x, P = kf_predict(x, P, F, Q)
        x, P, _ = kf_update(x, P, H, z, R)
        return (x, P), None

    (x, P), _ = jax.lax.scan(body, (jnp.zeros(1), jnp.eye(1) * 100.0), zs)
    assert abs(float(x[0]) - truth) < 0.1
    assert float(P[0, 0]) < 1e-3


def test_ekf_equals_kf_on_linear_model():
    F = jnp.asarray([[1.0, 0.1], [0.0, 0.95]])
    Q = jnp.diag(jnp.asarray([1e-4, 1e-3]))
    H = jnp.asarray([[1.0, 0.0]])
    R = jnp.asarray([[0.04]])
    x0 = jnp.asarray([1.0, -0.5])
    P0 = jnp.eye(2) * 2.0
    z = jnp.asarray([1.3])

    xk, Pk = kf_predict(x0, P0, F, Q)
    xk, Pk, _ = kf_update(xk, Pk, H, z, R)

    xe, Pe = ekf_predict(x0, P0, lambda x: F @ x, Q)
    xe, Pe, _ = ekf_update(xe, Pe, lambda x: H @ x, z, R)

    np.testing.assert_allclose(np.asarray(xe), np.asarray(xk), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Pe), np.asarray(Pk), rtol=1e-12)


def test_masked_update_gates_whole_state():
    a = (jnp.ones(3), jnp.eye(3))
    b = (jnp.zeros(3), 2 * jnp.eye(3))
    on = masked_update(jnp.asarray(True), a, b)
    off = masked_update(jnp.asarray(False), a, b)
    np.testing.assert_array_equal(np.asarray(on[0]), np.ones(3))
    np.testing.assert_array_equal(np.asarray(off[1]), 2 * np.eye(3))


# ---------------------------------------------------------------- AHRS

def _synthetic_record(K, dt, seed=0, bias=(4e-3, -2e-3, 3e-3),
                      sigma_gyro=8.7e-4, sigma_accel=0.02,
                      sigma_mag=150e-9):
    """True attitude driven by sinusoidal body rates; IMU/mag records with
    bias + white noise. Returns (records, q_true stack)."""
    g_n = jnp.asarray([0.0, 0.0, -9.80665])
    B_n = jnp.asarray([19.0e-6, 0.0, 45.0e-6])
    t = jnp.arange(K) * dt
    omega = jnp.stack([0.3 * jnp.sin(2 * jnp.pi * 0.1 * t),
                       0.2 * jnp.sin(2 * jnp.pi * 0.17 * t + 1.0),
                       0.1 * jnp.sin(2 * jnp.pi * 0.05 * t)], axis=-1)

    def prop(q, om):
        q = qnormalize(qmul(q, rvec_to_quat(om * dt)))
        return q, q

    q0 = euler_to_quat(jnp.asarray([0.4, 0.05, -0.1]))
    _, qs = jax.lax.scan(prop, q0, omega)

    key = jax.random.PRNGKey(seed)
    kg, ka, km = jax.random.split(key, 3)
    gyro = omega + jnp.asarray(bias) + sigma_gyro * jax.random.normal(
        kg, (K, 3))
    acc = jax.vmap(lambda q: qrot_inv(q, g_n))(qs) \
        + sigma_accel * jax.random.normal(ka, (K, 3))
    mag = jax.vmap(lambda q: qrot_inv(q, B_n))(qs) \
        + sigma_mag * jax.random.normal(km, (K, 3))
    return (gyro, acc, mag), qs


def test_ahrs_converges_and_estimates_bias():
    dt = 0.02
    K = 3000  # 60 s
    (gyro, acc, mag), qs = _synthetic_record(K, dt)
    ahrs = Ahrs(dt=dt)
    # start 20 deg off in every axis
    q_init = qnormalize(qmul(qs[0], rvec_to_quat(jnp.full(3, 0.2))))
    st, q_hist = ahrs.run(ahrs.init(q_nb=q_init), gyro, acc, mag)

    err_end = attitude_error_deg(q_hist[-1], qs[-1])
    assert float(err_end) < 1.0, float(err_end)
    # mean error over the last 10 s below a degree
    tail = attitude_error_deg(q_hist[-500:], qs[-500:])
    assert float(jnp.mean(tail)) < 1.0
    # gyro bias identified
    np.testing.assert_allclose(np.asarray(st.b_g),
                               [4e-3, -2e-3, 3e-3], atol=1.5e-3)
    # covariance stayed symmetric PD
    P = np.asarray(st.P)
    np.testing.assert_allclose(P, P.T, rtol=1e-8)
    assert np.all(np.linalg.eigvalsh(P) > 0)


def test_ahrs_accel_gate_rejects_dynamic_epochs():
    """A large non-gravitational acceleration must not corrupt the
    attitude: the gate freezes the accel update."""
    ahrs = Ahrs(dt=0.02)
    st = ahrs.init(q_nb=euler_to_quat(jnp.asarray([0.0, 0.0, 0.0])))
    f_bad = jnp.asarray([5.0, 0.0, -9.80665])  # |f| far from g
    upd = ahrs.update_accel(st, f_bad)
    np.testing.assert_array_equal(np.asarray(upd.q_nb), np.asarray(st.q_nb))
    np.testing.assert_array_equal(np.asarray(upd.P), np.asarray(st.P))


def test_ahrs_vmaps_over_fleet():
    dt, K, B = 0.02, 400, 4
    records = [_synthetic_record(K, dt, seed=i) for i in range(B)]
    gyro = jnp.stack([r[0][0] for r in records])
    acc = jnp.stack([r[0][1] for r in records])
    mag = jnp.stack([r[0][2] for r in records])
    q_true = jnp.stack([r[1][-1] for r in records])
    ahrs = Ahrs(dt=dt)

    def one(g, a, m):
        st, _ = ahrs.run(ahrs.init(), g, a, m)
        return st.q_nb

    q_est = jax.vmap(one)(gyro, acc, mag)
    err = attitude_error_deg(q_est, q_true)
    assert q_est.shape == (B, 4)
    assert float(jnp.max(err)) < 5.0  # short record, loose band


def test_ahrs_gyro_only_drifts_but_runs():
    """Without aiding, the filter integrates gyro only (placeholder lanes
    must not update) and covariance grows."""
    dt, K = 0.02, 200
    (gyro, _, _), qs = _synthetic_record(K, dt, bias=(0.0, 0.0, 0.0))
    ahrs = Ahrs(dt=dt)
    st0 = ahrs.init(q_nb=qs[0])
    st, _ = ahrs.run(st0, gyro)
    # covariance grows without aiding (process noise only adds)
    assert float(jnp.trace(st.P[:3, :3])) > float(jnp.trace(st0.P[:3, :3]))
    # attitude still tracks open-loop over 4 s of small noise
    assert float(attitude_error_deg(st.q_nb, qs[-1])) < 2.0

# ----------------------------------------------------------------- INS

def test_ins_static_converges_bias():
    """Stationary vehicle, level attitude: with GPS at 1 Hz the filter
    must hold position and identify a constant accelerometer bias."""
    from flightjax.utils.estimation import Ins
    dt, K = 0.02, 3000  # 60 s
    ins = Ins(dt=dt)
    bias = jnp.asarray([0.05, -0.03, 0.08])
    g = 9.80665
    key = jax.random.PRNGKey(1)
    f_ms = (jnp.asarray([0.0, 0.0, -g]) + bias
            + 0.02 * jax.random.normal(key, (K, 3)))
    q_nbs = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (K, 4))
    gps_news = (jnp.arange(K) % 50) == 0
    kp, kv = jax.random.split(jax.random.PRNGKey(2))
    gps_ps = 1.5 * jax.random.normal(kp, (K, 3))       # truth at origin
    gps_vs = 0.05 * jax.random.normal(kv, (K, 3))
    st, (p_hist, _) = ins.run(ins.init(), f_ms, q_nbs, gps_ps, gps_vs,
                              gps_news)
    assert float(jnp.linalg.norm(st.p_n)) < 3.0
    assert float(jnp.linalg.norm(st.v_n)) < 0.3
    np.testing.assert_allclose(np.asarray(st.b_a), np.asarray(bias),
                               atol=0.02)
    P = np.asarray(st.P)
    np.testing.assert_allclose(P, P.T, rtol=1e-8)
    assert np.all(np.linalg.eigvalsh(P) > 0)


def test_ins_gps_outage_drifts_then_recovers():
    """During a GPS outage the position error grows; after reacquisition
    it snaps back within the GPS noise floor."""
    from flightjax.utils.estimation import Ins
    dt, K = 0.02, 4000
    ins = Ins(dt=dt)
    g = 9.80665
    key = jax.random.PRNGKey(5)
    f_ms = jnp.asarray([0.0, 0.0, -g]) + 0.02 * jax.random.normal(
        key, (K, 3))
    q_nbs = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (K, 4))
    epoch = (jnp.arange(K) % 50) == 0
    outage = (jnp.arange(K) >= 1000) & (jnp.arange(K) < 3000)
    gps_news = epoch & ~outage
    gps_ps = jnp.zeros((K, 3))
    gps_vs = jnp.zeros((K, 3))
    # seed a velocity error so the outage integrates it into position
    st0 = ins.init(v_n=jnp.asarray([0.3, -0.2, 0.0]))
    _, (p_hist, _) = ins.run(st0, f_ms, q_nbs, gps_ps, gps_vs, gps_news)
    err = jnp.linalg.norm(p_hist, axis=-1)
    # error present during outage, pulled back under 1 m at the end
    assert float(jnp.max(err[1000:3000])) > float(err[-1])
    assert float(err[-1]) < 1.0


def test_c172_full_navigation_stack():
    """Cascade on real physics: C172 flight -> SensorSuite -> AHRS
    (attitude) -> INS (position/velocity, GPS@1Hz + baro). Position error
    must stay within a few metres of truth over 10 s."""
    from flightjax.core.sim import Simulation, SimState
    from flightjax.models.c172 import c172s, common as C172
    from flightjax.physics.sensors import SensorSuite, measure_trajectory
    from flightjax.utils.estimation import Ahrs, Ins, ned_from_geodetic

    world = c172s.flagship_world("wa")
    sim = Simulation(world, dt=0.02)
    vehicle = world.aircraft.vehicle
    x, u, s, _, rnorm = c172s.trim(vehicle, C172.trim_parameters())
    assert float(rnorm) < 1e-8
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    _, log = sim.run(state, t_end=10.0, save_y=True)
    kins = log.y.vehicle.kinematics
    airs, dyns = log.y.vehicle.airflow, log.y.vehicle.dynamics

    suite = SensorSuite(dt=0.02, gps_every=50)
    u_s = {"seed": jnp.asarray(3, jnp.int32),
           "params": suite.init_u()["params"]}
    s0 = suite.init_s(u_s, init_key=jax.random.PRNGKey(9))
    zs, _ = measure_trajectory(suite, u_s, s0, kins, airs, dyns)

    ahrs = Ahrs(dt=0.02)
    _, q_est = ahrs.run(ahrs.init(q_nb=kins.q_nb[0]), zs.omega_b, zs.f_b,
                        zs.mag_b)

    lat0, lon0, h0 = kins.lat[0], kins.lon[0], kins.h_e[0]
    gps_ps = ned_from_geodetic(zs.gps_lat, zs.gps_lon, zs.gps_h,
                               lat0, lon0, h0)
    p_true = ned_from_geodetic(kins.lat, kins.lon, kins.h_e,
                               lat0, lon0, h0)

    ins = Ins(dt=0.02)
    st0 = ins.init(v_n=kins.v_eb_n[0])
    # baro origin: indicated altitude at t0 corresponds to p_d = 0
    st, (p_hist, v_hist) = ins.run(st0, zs.f_b, q_est, gps_ps, zs.gps_v_n,
                                   zs.gps_new, h_baros=zs.h_baro,
                                   h_origin=zs.h_baro[0])
    perr = jnp.linalg.norm(p_hist - p_true, axis=-1)
    verr = jnp.linalg.norm(v_hist - kins.v_eb_n, axis=-1)
    assert float(jnp.max(perr)) < 8.0, float(jnp.max(perr))
    assert float(perr[-1]) < 5.0, float(perr[-1])
    assert float(jnp.mean(verr)) < 0.5, float(jnp.mean(verr))


# ------------------------------------------------------- fault detection

def test_nis_chi_square_consistency():
    """For a consistent filter, E[NIS] = dim(y)."""
    from flightjax.utils.estimation import nis
    key = jax.random.PRNGKey(0)
    S = jnp.diag(jnp.asarray([0.5, 2.0, 1.3]))
    L = jnp.sqrt(S)
    ys = (L @ jax.random.normal(key, (3, 4096))).T
    vals = jax.vmap(lambda y: nis(y, S))(ys)
    assert 2.8 < float(jnp.mean(vals)) < 3.2


def test_frozen_gps_detected_by_innovation_monitor():
    """Freeze the GPS mid-run on a moving vehicle: the INS position
    innovation NIS must blow past the chi-square gate and the monitor
    must latch an alarm only after the fault."""
    from flightjax.physics.sensors import inject_fault
    from flightjax.utils.estimation import (Ins, innovation_monitor,
                                            masked_update, nis)
    dt, K = 0.02, 2000
    ins = Ins(dt=dt)
    g = 9.80665
    # constant-velocity truth northbound at 60 m/s
    v_true = jnp.asarray([60.0, 0.0, 0.0])
    t = jnp.arange(K, dtype=jnp.float64) * dt
    p_true = t[:, None] * v_true
    key = jax.random.PRNGKey(3)
    f_ms = jnp.asarray([0.0, 0.0, -g]) + 0.02 * jax.random.normal(
        key, (K, 3))
    q_nbs = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0, 0.0]), (K, 4))
    kp, kv = jax.random.split(jax.random.PRNGKey(4))
    gps_ps = p_true + 1.5 * jax.random.normal(kp, (K, 3))
    gps_vs = v_true + 0.05 * jax.random.normal(kv, (K, 3))
    # reuse SensorData-style injection on a bare array via the same masks
    k_fault = 1000
    frozen = jnp.where((jnp.arange(K) >= k_fault)[:, None],
                       gps_ps[k_fault], gps_ps)
    gps_news = (jnp.arange(K) % 50) == 0

    I3 = jnp.eye(3)
    Z3 = jnp.zeros((3, 3))
    Hp = jnp.concatenate([I3, Z3, Z3], axis=1)
    mon_init, mon_update = innovation_monitor(threshold=16.27,  # chi2_3 99.9%
                                              window=6, min_hits=3)

    def body(carry, z):
        st, mon = carry
        f, q, gp, gv, gn = z
        st = ins.predict(st, f, q)
        y = gp - st.p_n
        S = Hp @ st.P @ Hp.T + ins.R_pos
        nis_val = nis(y, S)
        upd = ins.update_gps(st, gp, gv, valid=gn)
        mon, alarm = mon_update(mon, nis_val, valid=gn)
        return (upd, mon), (nis_val, alarm)

    st0 = ins.init(v_n=v_true)
    (_, mon), (nis_hist, alarms) = jax.lax.scan(
        body, (st0, mon_init()), (f_ms, q_nbs, frozen, gps_vs, gps_news))
    alarms = np.asarray(alarms)
    # no alarm before the fault, alarm latched well after it
    assert not alarms[:k_fault].any()
    assert alarms[-1]
    # and the faulty-epoch NIS dwarfs the healthy ones
    healthy = np.asarray(nis_hist)[np.asarray(gps_news) & (np.arange(K) < k_fault)]
    faulty = np.asarray(nis_hist)[np.asarray(gps_news) & (np.arange(K) >= k_fault + 200)]
    assert faulty.min() > healthy.max()


def test_inject_fault_modes():
    from flightjax.physics.sensors import inject_fault, SensorData
    K = 10
    base = jnp.arange(K, dtype=jnp.float64)
    zs = SensorData(*([jnp.zeros((K, 3))] * 2 + [base] * 5
                      + [jnp.zeros((K, 3))] + [base] * 3
                      + [jnp.zeros((K, 3))] + [jnp.zeros(K, bool)]
                      + [base] + [jnp.ones(K, bool)]))
    fr = inject_fault(zs, "p_s", "freeze", 4)
    np.testing.assert_array_equal(np.asarray(fr.p_s),
                                  [0, 1, 2, 3, 4, 4, 4, 4, 4, 4])
    bj = inject_fault(zs, "p_s", "bias_jump", 6, delta=100.0)
    np.testing.assert_array_equal(np.asarray(bj.p_s[6:]),
                                  np.asarray(base[6:]) + 100.0)
    do = inject_fault(zs, "p_s", "dropout", 2, k1=5)
    np.testing.assert_array_equal(np.asarray(do.p_s),
                                  [0, 1, 0, 0, 0, 5, 6, 7, 8, 9])
    # untouched channels identical
    np.testing.assert_array_equal(np.asarray(do.CAS), np.asarray(zs.CAS))


def test_ahrs_heading_with_declination():
    """AHRS fed the true declination-rotated field recovers heading; an
    AHRS that wrongly assumes zero declination converges to a heading
    biased by ~D (the classic mis-set-variation error)."""
    from flightjax.ops.attitude import quat_to_euler, wrap_to_pi
    from flightjax.physics.sensors import mag_field_ned

    dt, K = 0.02, 2000
    D = np.deg2rad(10.0)
    B_true = mag_field_ned(declination=D)
    g_n = jnp.asarray([0.0, 0.0, -9.80665])
    t = jnp.arange(K) * dt
    omega = jnp.stack([0.05 * jnp.sin(2 * jnp.pi * 0.1 * t),
                       0.05 * jnp.sin(2 * jnp.pi * 0.13 * t),
                       jnp.zeros(K)], axis=-1)

    def prop(q, om):
        q = qnormalize(qmul(q, rvec_to_quat(om * dt)))
        return q, q

    q0 = euler_to_quat(jnp.asarray([0.7, 0.02, -0.03]))  # psi = 0.7 rad
    _, qs = jax.lax.scan(prop, q0, omega)
    key = jax.random.PRNGKey(11)
    kg, ka, km = jax.random.split(key, 3)
    gyro = omega + 8.7e-4 * jax.random.normal(kg, (K, 3))
    acc = jax.vmap(lambda q: qrot_inv(q, g_n))(qs) \
        + 0.02 * jax.random.normal(ka, (K, 3))
    mag = jax.vmap(lambda q: qrot_inv(q, B_true))(qs) \
        + 150e-9 * jax.random.normal(km, (K, 3))

    # start 15 deg off in heading so the mag update does real work
    q_init = qnormalize(qmul(qs[0], rvec_to_quat(jnp.asarray(
        [0.0, 0.0, 0.26]))))

    matched = Ahrs(dt=dt, B_n=B_true)
    _, qh = matched.run(matched.init(q_nb=q_init), gyro, acc, mag)
    psi_err = wrap_to_pi(quat_to_euler(qh[-1])[0] - quat_to_euler(qs[-1])[0])
    assert abs(float(psi_err)) < np.deg2rad(0.5), float(psi_err)

    mismatched = Ahrs(dt=dt)  # assumes zero declination
    _, qm = mismatched.run(mismatched.init(q_nb=q_init), gyro, acc, mag)
    psi_bias = wrap_to_pi(quat_to_euler(qm[-1])[0]
                          - quat_to_euler(qs[-1])[0])
    # converges to roughly -D (field rotated east reads as heading west)
    assert abs(float(psi_bias) + D) < np.deg2rad(2.0), float(psi_bias)


# ------------------------------------------------------- fused INS/GPS EKF

def _coordinated_turn_truth(K, dt, V=45.0, psi_dot=np.deg2rad(3.0),
                            phi0=np.deg2rad(15.0), g=9.80665):
    """Kinematic coordinated-turn truth: constant bank, constant yaw
    rate, level. Returns (qs, omega_bs, f_bs, v_ns, p_ns)."""
    t = jnp.arange(K) * dt
    psi = psi_dot * t
    g_n = jnp.asarray([0.0, 0.0, g])

    def one(psi_k):
        q = euler_to_quat(jnp.stack([psi_k, 0.0 * psi_k,
                                     jnp.asarray(phi0)]))
        om = qrot_inv(q, jnp.asarray([0.0, 0.0, psi_dot]))
        v_n = V * jnp.stack([jnp.cos(psi_k), jnp.sin(psi_k), 0.0 * psi_k])
        a_n = V * psi_dot * jnp.stack([-jnp.sin(psi_k), jnp.cos(psi_k),
                                       0.0 * psi_k])
        f_b = qrot_inv(q, a_n - g_n)
        return q, om, v_n, f_b

    qs, oms, v_ns, f_bs = jax.vmap(one)(psi)
    p_ns = (V / psi_dot) * jnp.stack(
        [jnp.sin(psi), 1.0 - jnp.cos(psi), jnp.zeros_like(psi)], axis=-1)
    return qs, oms, f_bs, v_ns, p_ns


def test_insgps_holds_attitude_in_sustained_turn():
    """THE design-motivating case (physics/navigation.py): in a sustained
    coordinated turn, gravity-direction aiding is biased toward
    wings-level; the fused error-state EKF must hold the banked attitude
    through the GPS-velocity/specific-force coupling + mag heading."""
    from flightjax.physics.sensors import mag_field_ned
    from flightjax.utils.estimation import InsGps

    dt, K = 0.02, 3000  # 60 s = half a standard-rate-ish orbit
    phi0 = np.deg2rad(15.0)
    qs, oms, f_bs, v_ns, p_ns = _coordinated_turn_truth(K, dt, phi0=phi0)
    B_n = mag_field_ned()
    key = jax.random.PRNGKey(7)
    kg, ka, km, kp, kv = jax.random.split(key, 5)
    gyro = oms + jnp.asarray([3e-3, -2e-3, 1e-3]) \
        + 8.7e-4 * jax.random.normal(kg, (K, 3))
    acc = f_bs + jnp.asarray([0.03, -0.02, 0.05]) \
        + 0.02 * jax.random.normal(ka, (K, 3))
    mag = jax.vmap(lambda q: qrot_inv(q, B_n))(qs) \
        + 150e-9 * jax.random.normal(km, (K, 3))
    gps_news = (jnp.arange(K) % 10) == 0
    gps_ps = p_ns + 1.6 * jax.random.normal(kp, (K, 3))
    gps_vs = v_ns + 0.06 * jax.random.normal(kv, (K, 3))

    ekf = InsGps(dt=dt, B_n=B_n)
    # start 5 deg off in roll AND pitch
    q0 = qnormalize(qmul(qs[0], rvec_to_quat(jnp.asarray(
        [0.087, 0.087, 0.0]))))
    st, (q_hist, v_hist, p_hist) = ekf.run(
        ekf.init(q_nb=q0, v_n=v_ns[0]), gyro, acc, mag, gps_ps, gps_vs,
        gps_news)

    err = attitude_error_deg(q_hist, qs)
    # converged and HELD through the turn: last 30 s under 1 deg
    assert float(jnp.mean(err[-1500:])) < 1.0, float(jnp.mean(err[-1500:]))
    assert float(jnp.max(err[-1500:])) < 2.0, float(jnp.max(err[-1500:]))
    # the bank is real in the estimate (not dragged to wings-level)
    from flightjax.ops.attitude import quat_to_euler
    phi_est = quat_to_euler(q_hist[-1])[2]
    assert abs(float(phi_est) - phi0) < np.deg2rad(1.0)
    # velocity/position track
    assert float(jnp.linalg.norm(v_hist[-1] - v_ns[-1])) < 0.5
    assert float(jnp.linalg.norm(p_hist[-1] - p_ns[-1])) < 5.0
    # biases heading toward truth (loose: observability varies by axis)
    assert float(jnp.linalg.norm(st.b_g - jnp.asarray(
        [3e-3, -2e-3, 1e-3]))) < 2e-3
    # covariance symmetric PD in the long run
    P = np.asarray(st.P)
    np.testing.assert_allclose(P, P.T, rtol=1e-7)
    assert np.all(np.linalg.eigvalsh(P) > 0)


def test_insgps_static_identifies_biases():
    """Stationary, level: GPS at 1 Hz + mag; gyro and accel biases must
    be identified and position held."""
    from flightjax.physics.sensors import mag_field_ned
    from flightjax.utils.estimation import InsGps

    dt, K = 0.02, 3000
    g = 9.80665
    B_n = mag_field_ned()
    bg = jnp.asarray([4e-3, -2e-3, 3e-3])
    ba = jnp.asarray([0.05, -0.03, 0.08])
    key = jax.random.PRNGKey(9)
    kg, ka, km, kp, kv = jax.random.split(key, 5)
    gyro = bg + 8.7e-4 * jax.random.normal(kg, (K, 3))
    acc = jnp.asarray([0.0, 0.0, -g]) + ba \
        + 0.02 * jax.random.normal(ka, (K, 3))
    mag = jnp.broadcast_to(B_n, (K, 3)) \
        + 150e-9 * jax.random.normal(km, (K, 3))
    gps_news = (jnp.arange(K) % 50) == 0
    gps_ps = 1.6 * jax.random.normal(kp, (K, 3))
    gps_vs = 0.06 * jax.random.normal(kv, (K, 3))

    ekf = InsGps(dt=dt, B_n=B_n)
    st, (q_hist, v_hist, p_hist) = ekf.run(
        ekf.init(), gyro, acc, mag, gps_ps, gps_vs, gps_news)
    assert float(jnp.linalg.norm(st.p_n)) < 3.0
    assert float(jnp.linalg.norm(st.v_n)) < 0.3
    np.testing.assert_allclose(np.asarray(st.b_g), np.asarray(bg),
                               atol=1.5e-3)
    # z accel bias is directly observable via baro-free GPS altitude;
    # x/y couple through attitude — allow a looser band
    np.testing.assert_allclose(np.asarray(st.b_a), np.asarray(ba),
                               atol=0.03)
    err = attitude_error_deg(q_hist[-1], jnp.asarray([1.0, 0, 0, 0]))
    assert float(err) < 1.0


# ------------------------------------------ stacked simultaneous update

def test_chol_solve_matches_dense():
    """Unrolled static-size Cholesky solve == dense solve for SPD systems
    of every stacked-update size (the TPU-safe innovation solver)."""
    from flightjax.utils.estimation import chol_solve

    rng = np.random.default_rng(7)
    for m in (2, 4, 7, 10, 11):
        A = rng.normal(size=(m, m))
        S = A @ A.T + m * np.eye(m)
        B = rng.normal(size=(m, 15))
        X = chol_solve(jnp.asarray(S), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(S, B),
                                   rtol=1e-9, atol=1e-12)


def _insgps_realistic_state(seed=3):
    """An InsGps state with a converged-magnitude covariance (attitude
    ~mrad, velocity ~dm/s, position ~m, biases at catalog scale)."""
    from flightjax.utils.estimation import InsGps

    rng = np.random.default_rng(seed)
    f = InsGps(dt=0.02)
    q = np.asarray([0.95, 0.05, -0.1, 0.2])
    st = f.init(q_nb=jnp.asarray(q / np.linalg.norm(q)),
                v_n=jnp.asarray([40.0, 3.0, -1.5]))
    stds = np.concatenate([np.full(3, 2e-3), np.full(3, 0.1),
                           np.full(3, 1.5), np.full(3, 2e-3),
                           np.full(3, 0.02)])
    A = rng.normal(size=(15, 15)) * 0.05
    C = (np.eye(15) + A @ A.T * 0.1)  # correlated, SPD, O(1) conditioned
    P = np.diag(stds) @ C @ np.diag(stds)
    return f, st._replace(P=jnp.asarray(0.5 * (P + P.T)))


def test_stacked_update_equals_sequential_path():
    """One masked simultaneous Joseph update over GPS pos+vel / baro /
    mag == the round-4 sequential update chain, to EKF-relinearization
    tolerance (for linear(ized) blocks the batched update is the same
    posterior; the only difference is the sequential path re-linearizing
    the mag H after each MEKF reset — second order in the corrections)."""
    f, st = _insgps_realistic_state()
    p_meas = jnp.asarray([1.2, -0.8, 0.5])
    v_meas = jnp.asarray([40.1, 2.9, -1.4])
    h_baro, h0 = jnp.asarray(503.0), jnp.asarray(500.0)
    mag = jnp.asarray([20e-6, 2e-6, 44e-6])

    seq = f.update_gps(st, p_meas, v_meas, valid=True)
    seq = f.update_baro(seq, h_baro, h0)
    seq = f.update_mag(seq, mag)

    H, y, r = f.stacked_rows(st, p_meas, v_meas, h_baro, h0, mag)
    stk = f.update_stacked(st, H, y, r, jnp.ones(10, bool))

    np.testing.assert_allclose(np.asarray(stk.q_nb), np.asarray(seq.q_nb),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(stk.v_n), np.asarray(seq.v_n),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(stk.p_n), np.asarray(seq.p_n),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(stk.b_g), np.asarray(seq.b_g),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(stk.b_a), np.asarray(seq.b_a),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(stk.P), np.asarray(seq.P),
                               rtol=5e-3, atol=1e-10)


def test_stacked_update_mask_is_exact_row_deletion():
    """Masked rows must contribute EXACTLY nothing: masking out the GPS
    rows reproduces the update built from only the baro+mag rows, to
    f64 roundoff (the zero-H/zero-y/unit-R construction makes S block
    diagonal with masked gain columns identically zero)."""
    f, st = _insgps_realistic_state(seed=11)
    p_meas = jnp.asarray([1.2, -0.8, 0.5])
    v_meas = jnp.asarray([40.1, 2.9, -1.4])
    h_baro, h0 = jnp.asarray(503.0), jnp.asarray(500.0)
    mag = jnp.asarray([20e-6, 2e-6, 44e-6])

    H, y, r = f.stacked_rows(st, p_meas, v_meas, h_baro, h0, mag)
    mask = jnp.asarray([False] * 6 + [True] * 4)
    stk = f.update_stacked(st, H, y, r, mask)

    # reference: dense Joseph over only the active rows
    Ha, ya, ra = H[6:], y[6:], r[6:]
    P = np.asarray(st.P)
    S = Ha @ P @ Ha.T + np.diag(ra)
    K = P @ np.asarray(Ha).T @ np.linalg.inv(np.asarray(S))
    dx = K @ np.asarray(ya)
    IKH = np.eye(15) - K @ np.asarray(Ha)
    P2 = IKH @ P @ IKH.T + (K * np.asarray(ra)) @ K.T

    np.testing.assert_allclose(np.asarray(stk.v_n),
                               np.asarray(st.v_n) + dx[3:6], atol=1e-14)
    np.testing.assert_allclose(np.asarray(stk.p_n),
                               np.asarray(st.p_n) + dx[6:9], atol=1e-14)
    np.testing.assert_allclose(np.asarray(stk.P), 0.5 * (P2 + P2.T),
                               rtol=1e-10, atol=1e-16)


def test_stacked_update_radar_row_pulls_altitude():
    """The 11th (radar) row observes -p_d exactly like baro: with a
    radar-only mask the altitude error shrinks toward the radar reading
    and nothing else moves at first order."""
    f, st = _insgps_realistic_state(seed=5)
    H, y, r = f.stacked_rows(
        st, jnp.zeros(3), st.v_n, jnp.asarray(0.0), jnp.asarray(500.0),
        jnp.asarray([20e-6, 2e-6, 44e-6]),
        h_radar_e=jnp.asarray(497.0))  # radar says 3 m BELOW the filter
    assert H.shape == (11, 15)
    mask = jnp.asarray([False] * 10 + [True])
    stk = f.update_stacked(st, H, y, r, mask)
    # filter altitude h = h0 - p_d must move DOWN toward 497
    dh = -(float(stk.p_n[2]) - float(st.p_n[2]))
    assert -3.0 < dh < -0.5, dh
    # horizontal position untouched by a -dp_d row through a diagonal-ish P
    assert abs(float(stk.p_n[0] - st.p_n[0])) < 0.2


# ------------------------------------------------ location-tied geomagnetics

def test_mag_field_dipole_physics():
    """Centered-dipole sanity: intensity 22-70 uT everywhere, downward
    (positive-Z) in the northern hemisphere, northward at the equator,
    and the (D, I, F) triple round-trips through `mag_field_ned`."""
    from flightjax.physics.sensors import (mag_declination, mag_field_dipole,
                                           mag_field_ned)

    rng = np.random.default_rng(2)
    lats = np.deg2rad(rng.uniform(-80, 80, size=32))
    lons = np.deg2rad(rng.uniform(-180, 180, size=32))
    B = np.asarray(jax.vmap(mag_field_dipole)(jnp.asarray(lats),
                                              jnp.asarray(lons)))
    F = np.linalg.norm(B, axis=-1)
    assert (F > 2.2e-5).all() and (F < 7.0e-5).all()
    north = lats > np.deg2rad(30)
    assert (B[north, 2] > 0).all()          # inclination down up north

    # equator, at the dipole-equator longitude: field ~ due north
    B_eq = np.asarray(mag_field_dipole(jnp.asarray(0.0), jnp.asarray(0.0)))
    assert B_eq[0] > 2.0e-5 and abs(B_eq[1]) < 0.3 * B_eq[0]

    # (D, I, F) round trip
    D, I, Fs = (np.asarray(v) for v in
                mag_declination(jnp.asarray(B)))
    B_rt = np.asarray(jax.vmap(
        lambda f, i, d: mag_field_ned(f, i, d))(jnp.asarray(Fs),
                                                jnp.asarray(I),
                                                jnp.asarray(D)))
    np.testing.assert_allclose(B_rt, B, rtol=1e-10, atol=1e-18)

    # a known high-declination spot (northern Canada, toward the
    # magnetic pole): |D| well away from zero
    D_hi, _, _ = mag_declination(mag_field_dipole(
        jnp.asarray(np.deg2rad(68.0)), jnp.asarray(np.deg2rad(-120.0))))
    assert abs(np.degrees(float(D_hi))) > 10.0


def test_blocked_spd_solve_matches_dense():
    """Block-partitioned SPD solve (the stacked update's launch-count
    solver) == dense solve for every shipped partition."""
    from flightjax.utils.estimation import blocked_spd_solve

    rng = np.random.default_rng(1)
    for sizes in [(3, 3, 1, 3), (3, 3, 1, 3, 1), (1, 1, 1), (3,)]:
        m = sum(sizes)
        A = rng.normal(size=(m, m))
        S = A @ A.T + m * np.eye(m)
        B = rng.normal(size=(m, 15))
        X = blocked_spd_solve(jnp.asarray(S), jnp.asarray(B), sizes)
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(S, B),
                                   rtol=1e-9, atol=1e-12)
