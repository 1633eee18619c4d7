"""State estimation: Kalman filtering and an attitude/heading reference
system (AHRS) built on the sensor suite.

Beyond-reference capability: Flight.jl has no estimation layer — its
control laws consume true `KinData` directly (`aircraftbase.jl:201-210`).
Together with `flightjax.physics.sensors` this closes the realistic
avionics loop: truth -> sensors -> filter -> control. Designed TPU-first:

- all filter steps are pure `(x, P, z) -> (x, P)` functions of small
  fixed-shape arrays — they jit, scan over measurement epochs, and vmap
  over Monte Carlo fleets unchanged (one fleet = one batched Riccati
  recursion on the MXU);
- Jacobians for the EKF come from `jax.jacfwd` of the supplied models —
  exact, no finite differencing (same policy as
  `physics/linearization.py`);
- intermittent measurements (the GPS `gps_new` flag) are handled by
  `masked_update` — a branch-free `where` over the updated/prior pair,
  the scan-friendly form of "skip the update this epoch";
- covariance updates use the Joseph form, which stays symmetric
  positive-definite in f32 (the fleet fast path) as well as f64.

Three filters, by use case:
- `Ahrs` — 6-state multiplicative EKF (attitude error + gyro bias):
  gravity-direction + mag aiding, with optional ω×v centripetal
  compensation. For sensor studies and mild-dynamics attitude work.
- `Ins` — 9-state loosely-coupled position/velocity/accel-bias
  navigator fed an external attitude (pair with `Ahrs`).
- `InsGps` — the fused 15-state error-state EKF (attitude + velocity +
  position + both bias sets). THE closed-loop navigator
  (`physics/navigation.py`): in sustained maneuvers, gravity-direction
  aiding is biased by the maneuver acceleration and a cascaded AHRS
  cannot receive the GPS-velocity information that disambiguates it —
  the fused filter observes attitude through the −C[f×] coupling of
  velocity residuals. f32-hardened for the TPU fleet path: HIGHEST-
  precision matmuls, direction-domain mag updates, adjugate gains
  (`_inv3`/`_gain` — batched LU is a TPU trap), P symmetrization, and
  f32-truth GPS derating (`R_pos_eff`).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from flightjax.ops.attitude import rvec_to_quat, skew
from flightjax.ops.quaternions import qmul, qnormalize, qrot_inv

__all__ = [
    "kf_predict", "kf_update", "ekf_predict", "ekf_update",
    "masked_update", "chol_solve", "Ahrs", "AhrsState", "Ins", "InsState",
    "InsGps", "InsGpsState", "ned_from_geodetic", "attitude_error_deg",
    "nis", "innovation_monitor",
]


# --------------------------------------------------------------- linear KF

def kf_predict(x, P, F, Q, B=None, u=None):
    """Discrete-time predict: x+ = F x (+ B u), P+ = F P Fᵀ + Q."""
    x = F @ x if B is None else F @ x + B @ u
    return x, F @ P @ F.T + Q


def kf_update(x, P, H, z, R):
    """Measurement update (Joseph form). Returns (x, P, innovation)."""
    y = z - H @ x
    S = H @ P @ H.T + R
    K = jnp.linalg.solve(S.T, (P @ H.T).T).T  # P Hᵀ S⁻¹ without inverse
    x = x + K @ y
    IKH = jnp.eye(P.shape[0], dtype=P.dtype) - K @ H
    P = IKH @ P @ IKH.T + K @ R @ K.T
    return x, P, y


# ------------------------------------------------------------------- EKF

def ekf_predict(x, P, f, Q, *args):
    """EKF predict through a nonlinear transition x+ = f(x, *args); the
    Jacobian F = ∂f/∂x comes from `jax.jacfwd` (exact)."""
    F = jax.jacfwd(f)(x, *args)
    return f(x, *args), F @ P @ F.T + Q


def ekf_update(x, P, h, z, R, *args):
    """EKF update with measurement model z = h(x, *args) + v."""
    H = jax.jacfwd(h)(x, *args)
    y = z - h(x, *args)
    S = H @ P @ H.T + R
    K = jnp.linalg.solve(S.T, (P @ H.T).T).T
    x = x + K @ y
    IKH = jnp.eye(P.shape[0], dtype=P.dtype) - K @ H
    P = IKH @ P @ IKH.T + K @ R @ K.T
    return x, P, y


def masked_update(valid, updated, prior):
    """Branch-free intermittent-measurement gate: select the updated
    filter state where `valid`, the prior elsewhere. Works on arbitrary
    pytrees of (x, P, ...) tuples — the scan/vmap-friendly counterpart of
    'if gps_new: update()'."""
    return jax.tree.map(
        lambda a, b: jnp.where(valid, a, b), updated, prior)



def _inv3(S):
    """Closed-form 3x3 inverse via the adjugate. `jnp.linalg.solve`'s
    batched LU lowers to a sequential pivoting loop on TPU (measured
    ~80x slowdown of the closed-loop nav fleet step at batch 4096 —
    same trap `physics.dynamics.solve3` documents); the adjugate is a
    handful of fused elementwise ops. Innovation covariances here are
    SPD and O(1)-conditioned, so Cramer is numerically safe."""
    a00, a01, a02 = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    a10, a11, a12 = S[..., 1, 0], S[..., 1, 1], S[..., 1, 2]
    a20, a21, a22 = S[..., 2, 0], S[..., 2, 1], S[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    adjT = jnp.stack([jnp.stack([c00, c10, c20], axis=-1),
                      jnp.stack([c01, c11, c21], axis=-1),
                      jnp.stack([c02, c12, c22], axis=-1)], axis=-2)
    return adjT / det[..., None, None]


def _gain(P, H, S):
    """Kalman gain K = P Hᵀ S⁻¹ with a TPU-friendly small-matrix solve:
    scalar division for 1-DoF, adjugate inverse for 3-DoF, unrolled
    Cholesky otherwise (never `jnp.linalg.solve` — its batched LU lowers
    to a sequential pivoting loop on TPU, see `_inv3`)."""
    PHt = P @ H.T
    m = S.shape[0]
    if m == 1:
        return PHt / S[0, 0]
    if m == 3:
        return PHt @ _inv3(S)
    return chol_solve(S, PHt.T).T


def blocked_spd_solve(S, B, sizes):
    """Solve S X = B for SPD `S` ((m, m), m static) via BLOCK Gaussian
    elimination over the static partition `sizes` (e.g. (3, 3, 1, 3, 1)
    for the stacked GPS-pos/GPS-vel/baro/mag/radar system), with each
    pivot inverted in closed form (`_inv3` adjugate for 3x3, reciprocal
    for 1x1). Launch-count is the point: every block operation is ONE
    fused batched matmul, ~10x fewer kernels than the scalar Cholesky's
    serial chain at m=11 — and the fleet step is kernel-count-bound
    (docs/notes/performance.md). Block pivots are SPD Schur complements
    (each O(its channel's own scale)), so no equilibration is needed."""
    assert sum(sizes) == S.shape[0], (sizes, S.shape)
    ofs = [0]
    for n in sizes:
        ofs.append(ofs[-1] + n)
    k = len(sizes)
    Sb = [[S[ofs[i]:ofs[i + 1], ofs[j]:ofs[j + 1]] for j in range(k)]
          for i in range(k)]
    Bb = [B[ofs[i]:ofs[i + 1]] for i in range(k)]

    def inv_blk(M, n):
        if n == 1:
            return 1.0 / M
        if n == 3:
            return _inv3(M)
        return jnp.linalg.inv(M)  # unused for the shipped partitions

    invs = [None] * k
    for i in range(k):
        invs[i] = inv_blk(Sb[i][i], sizes[i])
        for j in range(i + 1, k):
            Lji = Sb[j][i] @ invs[i]
            for l in range(i + 1, k):
                Sb[j][l] = Sb[j][l] - Lji @ Sb[i][l]
            Bb[j] = Bb[j] - Lji @ Bb[i]
    X = [None] * k
    for i in reversed(range(k)):
        acc = Bb[i]
        for j in range(i + 1, k):
            acc = acc - Sb[i][j] @ X[j]
        X[i] = invs[i] @ acc
    return jnp.concatenate(X, axis=0)


def chol_solve(S, B):
    """Solve S X = B for a small STATIC-size SPD `S` ((m, m), m known at
    trace time) via a fully unrolled Cholesky factorization + triangular
    solves. No pivoting, no `lax.while_loop` — every operation is a
    scalar/row op that vmaps into fused elementwise VPU work over fleet
    lanes, which is the TPU-safe form for the stacked-measurement
    innovation system (m <= 11). SPD is guaranteed for innovation
    covariances S = H P Hᵀ + R with R ≻ 0."""
    m = S.shape[0]
    # L lower-triangular, computed entry-wise (Cholesky–Banachiewicz)
    L = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i + 1):
            acc = S[i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(acc)
            else:
                L[i][j] = acc / L[j][j]
    # forward substitution: L Z = B  (rows of B are vectors)
    Z = [None] * m
    for i in range(m):
        acc = B[i]
        for k in range(i):
            acc = acc - L[i][k] * Z[k]
        Z[i] = acc / L[i][i]
    # back substitution: Lᵀ X = Z
    X = [None] * m
    for i in reversed(range(m)):
        acc = Z[i]
        for k in range(i + 1, m):
            acc = acc - L[k][i] * X[k]
        X[i] = acc / L[i][i]
    return jnp.stack(X, axis=0)


# ------------------------------------------------------------------ AHRS

class AhrsState(NamedTuple):
    q_nb: jnp.ndarray   # (4,) nominal attitude, body wrt NED
    b_g: jnp.ndarray    # (3,) gyro bias estimate [rad/s]
    P: jnp.ndarray      # (6, 6) error covariance [dtheta(3), db_g(3)]


class Ahrs:
    """6-state multiplicative EKF attitude/heading reference.

    Error state dx = [dtheta (3, body-axes attitude error), db_g (3, gyro
    bias error)]. The nominal quaternion integrates bias-corrected gyro
    rates; accelerometer updates observe the gravity direction (gated to
    quasi-static epochs by `accel_gate` on |f| vs g), magnetometer
    updates observe the NED field direction. After each update the
    attitude error is injected into the nominal and re-zeroed (MEKF
    reset).

    Noise parameters default to the `sensors.imu_params`/`mag_params`
    grades. All methods are pure and vmappable; `run` scans a whole
    measurement record in one `lax.scan`.

    Behavior changes (round 4, f32-hardening — affects external users of
    this class): `update_mag` now works in the unit field-DIRECTION
    domain with `R_mag_dir` (the Tesla-domain `R_mag` attribute is gone
    — in Tesla units the innovation covariance is ~1e-13, un-invertible
    at f32), and `Q`'s attitude block changed from sigma²·dt to
    (sigma·dt)² to match `sigma_gyro`'s per-sample-white-noise
    definition (`sensors.imu_params`). Identical physics, different
    numbers than rounds ≤3.
    """

    def __init__(self, dt, sigma_gyro=8.7e-4, rw_gyro=3.0e-5,
                 sigma_accel=0.02, sigma_mag=150.0e-9,
                 B_n=(19.0e-6, 0.0, 45.0e-6), g=9.80665, accel_gate=0.5,
                 sigma_grav=0.3):
        self.dt = float(dt)
        self.g = float(g)
        # NED field the mag update predicts against — MUST match the
        # magnetometer model's field (`sensors.mag_params`/`mag_field_ned`);
        # a declination mismatch becomes a one-for-one heading bias.
        self.B_n = jnp.asarray(B_n)
        self.accel_gate = float(accel_gate)
        dt_ = self.dt
        # discrete process noise: attitude from gyro white noise, bias
        # from its random walk (diagonal — cross terms are O(dt^2)).
        # sigma_gyro is a PER-SAMPLE white noise std (sensors.imu_params),
        # so one epoch adds (sigma*dt)^2 of attitude variance; rw_gyro is a
        # per-sqrt(s) density, so its variance grows as rw^2*dt.
        self.Q = jnp.diag(jnp.concatenate([
            jnp.full(3, (sigma_gyro * dt_)**2),
            jnp.full(3, (rw_gyro**2) * dt_)]))
        # gravity-direction observation error is dominated by UNMODELED
        # accelerations (gusts, uncompensated maneuver residuals), not the
        # accelerometer noise floor — weight it accordingly (sigma_grav),
        # with the sensor noise as the lower bound
        self.R_acc = jnp.eye(3) * (sigma_grav**2 + sigma_accel**2)
        B_mag = float(jnp.linalg.norm(jnp.asarray(B_n)))
        self.R_mag_dir = jnp.eye(3) * max(sigma_mag / B_mag, 1e-3)**2

    def init(self, q_nb=None, att_std=0.3, bias_std=0.01):
        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0]) if q_nb is None else \
            jnp.asarray(q_nb)
        P0 = jnp.diag(jnp.concatenate([
            jnp.full(3, att_std**2), jnp.full(3, bias_std**2)]))
        return AhrsState(q_nb=q0, b_g=jnp.zeros(3), P=P0)

    # ------------------------------------------------------------ predict

    def predict(self, st: AhrsState, omega_m) -> AhrsState:
        """Propagate one IMU epoch with measured body rates `omega_m`."""
        with jax.default_matmul_precision("highest"):
            return self._predict(st, omega_m)

    def _predict(self, st: AhrsState, omega_m) -> AhrsState:
        w = omega_m - st.b_g
        q = qnormalize(qmul(st.q_nb, rvec_to_quat(w * self.dt)))
        # Phi = I + F dt, F = [[-[w x], -I], [0, 0]]
        I3 = jnp.eye(3, dtype=st.P.dtype)
        Phi = jnp.block([[I3 - skew(w) * self.dt, -I3 * self.dt],
                         [jnp.zeros((3, 3), st.P.dtype), I3]])
        P = Phi @ st.P @ Phi.T + self.Q.astype(st.P.dtype)
        return AhrsState(q_nb=q, b_g=st.b_g, P=P)

    # ------------------------------------------------------------- update

    def _vector_update(self, st: AhrsState, v_b_meas, v_n_ref, R):
        """Update from a body-frame observation of a known NED vector.
        Measurement model: v_b = C(q_nb)ᵀ v_n + v; for the error state,
        H = [ [v_b_pred x], 0 ]. (matmuls at HIGHEST precision: TPU f32
        defaults run through bf16 products — see InsGps.predict.)"""
        with jax.default_matmul_precision("highest"):
            return self._vector_update_hp(st, v_b_meas, v_n_ref, R)

    def _vector_update_hp(self, st, v_b_meas, v_n_ref, R):
        v_pred = qrot_inv(st.q_nb, v_n_ref)
        H = jnp.concatenate(
            [skew(v_pred), jnp.zeros((3, 3), st.P.dtype)], axis=1)
        y = v_b_meas - v_pred
        S = H @ st.P @ H.T + R.astype(st.P.dtype)
        K = _gain(st.P, H, S)
        dx = K @ y
        IKH = jnp.eye(6, dtype=st.P.dtype) - K @ H
        P = IKH @ st.P @ IKH.T + K @ R.astype(st.P.dtype) @ K.T
        # MEKF reset: inject dtheta into the nominal, keep the bias delta
        q = qnormalize(qmul(st.q_nb, rvec_to_quat(dx[:3])))
        return AhrsState(q_nb=q, b_g=st.b_g + dx[3:], P=P)

    def update_accel(self, st: AhrsState, f_m, v_b=None,
                     omega=None) -> AhrsState:
        """Gravity-direction update, gated to quasi-gravity epochs:
        applied only when the (compensated) specific force magnitude is
        within `accel_gate` of g (branch-free mask). The accelerometer
        reads -g in NED when unaccelerated (z-down).

        `v_b`/`omega` (body-frame velocity estimate + bias-corrected body
        rates) enable CENTRIPETAL COMPENSATION, f_grav = f_m - omega x v_b
        — without it, a sustained coordinated turn (|f| = g/cos(phi),
        within the gate at light-aircraft bank angles) reads as a tilted
        gravity vector and drags the attitude toward wings-level, which
        destabilizes any autopilot flying on the estimate (the flightjax
        closed-loop case, `physics/navigation.py`). With a velocity
        source (INS/GPS/TAS), always pass it."""
        if v_b is not None and omega is not None:
            f_m = f_m - jnp.cross(omega, v_b)
        quasi_static = jnp.abs(
            jnp.linalg.norm(f_m, axis=-1) - self.g) < self.accel_gate
        upd = self._vector_update(
            st, f_m, jnp.asarray([0.0, 0.0, -self.g], st.P.dtype),
            self.R_acc)
        return masked_update(quasi_static, upd, st)

    def update_mag(self, st: AhrsState, mag_m) -> AhrsState:
        """Field-DIRECTION update (unit-normalized): in Tesla units the
        innovation covariance is ~1e-13, which f32 linear algebra cannot
        survive (see InsGps.update_mag); direction units are scale-sane
        on the f32 fleet path and identical physics."""
        m = mag_m / (jnp.linalg.norm(mag_m, axis=-1, keepdims=True) + 1e-30)
        b_dir = self.B_n / jnp.linalg.norm(self.B_n)
        return self._vector_update(st, m, b_dir.astype(st.P.dtype),
                                   self.R_mag_dir)

    def step(self, st: AhrsState, omega_m, f_m=None, mag_m=None, v_b=None):
        st = self.predict(st, omega_m)
        if f_m is not None:
            st = self.update_accel(st, f_m, v_b=v_b,
                                   omega=omega_m - st.b_g)
        if mag_m is not None:
            st = self.update_mag(st, mag_m)
        return st

    def run(self, st: AhrsState, omega_ms, f_ms=None, mag_ms=None):
        """Scan a whole record (leading dim = epochs). Returns the final
        state and the per-epoch attitude history (K, 4)."""

        have_f, have_m = f_ms is not None, mag_ms is not None

        def body(st, z):
            om, f, mg = z
            st = self.step(st, om, f if have_f else None,
                           mg if have_m else None)
            return st, st.q_nb

        K = omega_ms.shape[0]
        zf = jnp.zeros((K, 3), omega_ms.dtype)  # ignored placeholder lanes
        f_ms = zf if f_ms is None else f_ms
        mag_ms = zf if mag_ms is None else mag_ms
        return jax.lax.scan(body, st, (omega_ms, f_ms, mag_ms))


def attitude_error_deg(q_est, q_true):
    """Total rotation angle [deg] between two unit quaternions (batched)."""
    from flightjax.ops.quaternions import qinv_unit
    dq = qmul(qinv_unit(q_true), q_est)
    re = jnp.clip(jnp.abs(dq[..., 0]), 0.0, 1.0)
    return jnp.degrees(2.0 * jnp.arccos(re))


# ------------------------------------------------------------------- INS

def ned_from_geodetic(lat, lon, h, lat0, lon0, h0):
    """Local-tangent NED position [m] of (lat, lon, h) relative to the
    origin (lat0, lon0, h0), small-offset linearization through the
    origin's radii of curvature (adequate for the km-scale legs the nav
    filter works over; the full geodesy lives in `ops.geodesy`)."""
    from flightjax.ops import geodesy as geo
    n0 = geo.nvector_from_latlon(lat0, lon0)
    M, N = geo.radii(n0)
    dN = (lat - lat0) * (M + h0)
    dE = (lon - lon0) * (N + h0) * jnp.cos(lat0)
    dD = h0 - h
    return jnp.stack([dN, dE, dD], axis=-1)


class InsState(NamedTuple):
    p_n: jnp.ndarray   # (3,) NED position relative to the filter origin [m]
    v_n: jnp.ndarray   # (3,) NED velocity [m/s]
    b_a: jnp.ndarray   # (3,) accelerometer bias estimate [m/s^2]
    P: jnp.ndarray     # (9, 9)


class Ins:
    """Loosely-coupled 9-state inertial navigator: position, velocity and
    accelerometer bias in local NED, mechanized with the accelerometer
    specific force rotated by an externally supplied attitude (cascade
    architecture: pair with `Ahrs` for the full IMU+GPS+baro stack, or
    feed truth attitude to isolate translational errors).

    Predict:  v+ = v + (C_nb (f_m - b_a) + g_n) dt,  p+ = p + v dt
    Updates:  GPS position/velocity (gate on `gps_new` via
    `masked_update`), baro altitude (observes -p_d + h_origin).
    """

    def __init__(self, dt, sigma_accel=0.02, rw_accel=1.0e-3,
                 sigma_gps_pos=1.6, sigma_gps_vel=0.06, sigma_baro=1.5,
                 g=9.80665):
        self.dt = float(dt)
        self.g_n = jnp.asarray([0.0, 0.0, g])
        dt_ = self.dt
        # sigma_accel is per-sample white noise (sensors.imu_params): one
        # epoch adds (sigma*dt)^2 of velocity variance; rw_accel is a
        # per-sqrt(s) random-walk density (rw^2*dt).
        self.Q = jnp.diag(jnp.concatenate([
            jnp.full(3, 1e-8),                       # position pseudo-noise
            jnp.full(3, (sigma_accel * dt_)**2),     # velocity from accel white
            jnp.full(3, (rw_accel**2) * dt_)]))      # bias random walk
        self.R_pos = jnp.eye(3) * sigma_gps_pos**2
        self.R_vel = jnp.eye(3) * sigma_gps_vel**2
        self.R_baro = jnp.asarray([[sigma_baro**2]])

    def init(self, p_n=None, v_n=None, pos_std=5.0, vel_std=0.5,
             bias_std=0.05):
        z = jnp.zeros(3)
        P0 = jnp.diag(jnp.concatenate([
            jnp.full(3, pos_std**2), jnp.full(3, vel_std**2),
            jnp.full(3, bias_std**2)]))
        return InsState(p_n=z if p_n is None else jnp.asarray(p_n),
                        v_n=z if v_n is None else jnp.asarray(v_n),
                        b_a=z, P=P0)

    def predict(self, st: InsState, f_m, q_nb) -> InsState:
        with jax.default_matmul_precision("highest"):
            return self._predict(st, f_m, q_nb)

    def _predict(self, st: InsState, f_m, q_nb) -> InsState:
        from flightjax.ops.attitude import quat_to_matrix
        C = quat_to_matrix(q_nb)
        a_n = C @ (f_m - st.b_a) + self.g_n.astype(st.P.dtype)
        v = st.v_n + a_n * self.dt
        p = st.p_n + st.v_n * self.dt + 0.5 * a_n * self.dt**2
        I3 = jnp.eye(3, dtype=st.P.dtype)
        Z3 = jnp.zeros((3, 3), st.P.dtype)
        # exact discrete Phi for the mean propagation above: the dt^2 term
        # couples position to the accel bias exactly as the trapezoidal
        # position update does (p+ depends on a_n, and da_n/db_a = -C)
        Phi = jnp.block([[I3, I3 * self.dt, -0.5 * self.dt**2 * C],
                         [Z3, I3, -C * self.dt],
                         [Z3, Z3, I3]])
        P = Phi @ st.P @ Phi.T + self.Q.astype(st.P.dtype)
        return InsState(p_n=p, v_n=v, b_a=st.b_a, P=P)

    def _update(self, st: InsState, H, y, R):
        with jax.default_matmul_precision("highest"):
            return self._update_hp(st, H, y, R)

    def _update_hp(self, st: InsState, H, y, R):
        S = H @ st.P @ H.T + R.astype(st.P.dtype)
        K = _gain(st.P, H, S)
        dx = K @ y
        IKH = jnp.eye(9, dtype=st.P.dtype) - K @ H
        P = IKH @ st.P @ IKH.T + K @ R.astype(st.P.dtype) @ K.T
        return InsState(p_n=st.p_n + dx[0:3], v_n=st.v_n + dx[3:6],
                        b_a=st.b_a + dx[6:9], P=P)

    def update_gps(self, st: InsState, p_meas, v_meas, valid=True):
        I3 = jnp.eye(3, dtype=st.P.dtype)
        Z3 = jnp.zeros((3, 3), st.P.dtype)
        Hp = jnp.concatenate([I3, Z3, Z3], axis=1)
        Hv = jnp.concatenate([Z3, I3, Z3], axis=1)
        upd = self._update(st, Hp, p_meas - st.p_n, self.R_pos)
        upd = self._update(upd, Hv, v_meas - upd.v_n, self.R_vel)
        return masked_update(jnp.asarray(valid), upd, st)

    def update_baro(self, st: InsState, h_meas, h_origin):
        """Baro observes altitude above the filter origin: h - h_origin =
        -p_d."""
        H = jnp.zeros((1, 9), st.P.dtype).at[0, 2].set(-1.0)
        y = jnp.atleast_1d(h_meas - h_origin + st.p_n[2])
        return self._update(st, H, y, self.R_baro)

    def step(self, st: InsState, f_m, q_nb, gps_p=None, gps_v=None,
             gps_new=False, h_baro=None, h_origin=0.0):
        st = self.predict(st, f_m, q_nb)
        if gps_p is not None:
            st = self.update_gps(st, gps_p, gps_v, valid=gps_new)
        if h_baro is not None:
            st = self.update_baro(st, h_baro, h_origin)
        return st

    def run(self, st: InsState, f_ms, q_nbs, gps_ps=None, gps_vs=None,
            gps_news=None, h_baros=None, h_origin=0.0):
        """Scan a whole record. Returns (final, (p_n, v_n) histories)."""
        have_gps = gps_ps is not None
        have_baro = h_baros is not None
        K = f_ms.shape[0]
        z3 = jnp.zeros((K, 3), f_ms.dtype)
        z1 = jnp.zeros((K,), f_ms.dtype)
        gps_ps = z3 if gps_ps is None else gps_ps
        gps_vs = z3 if gps_vs is None else gps_vs
        gps_news = jnp.zeros(K, bool) if gps_news is None else gps_news
        h_baros = z1 if h_baros is None else h_baros

        def body(st, z):
            f, q, gp, gv, gn, hb = z
            st = self.step(st, f, q,
                           gp if have_gps else None,
                           gv if have_gps else None, gn,
                           hb if have_baro else None, h_origin)
            return st, (st.p_n, st.v_n)

        return jax.lax.scan(body, st,
                            (f_ms, q_nbs, gps_ps, gps_vs, gps_news, h_baros))


# ---------------------------------------------------- fused 15-state INS/GPS

class InsGpsState(NamedTuple):
    q_nb: jnp.ndarray   # (4,) nominal attitude, body wrt NED
    v_n: jnp.ndarray    # (3,) NED velocity
    p_n: jnp.ndarray    # (3,) NED position wrt the filter origin [m]
    b_g: jnp.ndarray    # (3,) gyro bias [rad/s]
    b_a: jnp.ndarray    # (3,) accel bias [m/s^2]
    P: jnp.ndarray      # (15, 15) error covariance [dθ, dv, dp, dbg, dba]


class InsGps:
    """Loosely-coupled 15-state error-state EKF — the production INS/GPS
    architecture (attitude + velocity + position + gyro/accel biases in
    ONE filter). Unlike the `Ahrs`+`Ins` cascade, GPS velocity residuals
    observe ATTITUDE through the -C[f×] specific-force coupling in the
    transition, so sustained maneuvers (where gravity-direction aiding is
    blind or biased) keep the attitude estimate honest — the property the
    closed-loop autopilot (`physics/navigation.py`) needs. Heading is
    anchored by the magnetometer vector update against the configured NED
    field (declination-aware, `sensors.mag_field_ned`).

    Mechanization per epoch (dt): q+ = q ∘ exp((ω_m − b_g) dt),
    a_n = C(q)(f_m − b_a) + g_n, trapezoidal v/p. First-order Phi with
    exact dt² position couplings. Joseph-form updates; all methods pure,
    vmappable, scan-friendly (no branches; intermittent measurements via
    `masked_update`)."""

    def __init__(self, dt, sigma_gyro=8.7e-4, rw_gyro=3.0e-5,
                 sigma_accel=0.02, rw_accel=1.0e-3, sigma_mag=150.0e-9,
                 B_n=(19.0e-6, 0.0, 45.0e-6), sigma_gps_pos=1.6,
                 sigma_gps_vel=0.06, sigma_baro=1.5, g=9.80665,
                 sigma_geo_f32=20.0, sigma_radar=0.5,
                 sigma_mag_dir=0.015):
        self.dt = float(dt)
        self.g_n = jnp.asarray([0.0, 0.0, g])
        self.B_n = jnp.asarray(B_n)
        dt_ = self.dt
        # per-sample white sigmas enter as (sigma*dt)^2; per-sqrt(s)
        # random-walk densities as rw^2*dt (see imu_params)
        self.Q = jnp.diag(jnp.concatenate([
            jnp.full(3, (sigma_gyro * dt_)**2),
            jnp.full(3, (sigma_accel * dt_)**2),
            jnp.full(3, 1e-8),
            jnp.full(3, (rw_gyro**2) * dt_),
            jnp.full(3, (rw_accel**2) * dt_)]))
        self.R_pos = jnp.eye(3) * sigma_gps_pos**2
        self.R_vel = jnp.eye(3) * sigma_gps_vel**2
        self.R_baro = jnp.asarray([[sigma_baro**2]])
        # direction-domain mag noise (see update_mag): the sensor's own
        # white noise relative to the field magnitude is ~3 mrad, but the
        # IN-FLIGHT field-direction observation error is dominated by
        # unmodeled effects (field-model error, airframe fields, and the
        # maneuver-transient attitude error the overconfident EKF doesn't
        # carry in P) — the same reasoning as Ahrs.sigma_grav. Flooring
        # at sigma_mag_dir (default 0.86 deg) keeps the mag NIS
        # chi-square-consistent through engagement transients; with a
        # tighter floor the per-epoch gates latch FALSE mag alarms at
        # fleet scale on the f32 chip path (measured round 5: 221/512
        # lanes) and the rejected updates then let heading drift —
        # a gating death spiral. A hard-iron jump still scores NIS in the
        # hundreds against this floor (alarm fires immediately).
        B_mag = float(jnp.linalg.norm(jnp.asarray(B_n)))
        self.R_mag_dir = jnp.eye(3) * max(sigma_mag / B_mag,
                                          float(sigma_mag_dir))**2
        # f32-truth geodesy derating (see R_pos_eff)
        self.sigma_geo_f32 = float(sigma_geo_f32)
        # radar-altimeter aiding noise (sensor noise + terrain-datum
        # margin; used by the stacked radar row near the ground)
        self.sigma_radar = float(sigma_radar)

    def R_pos_eff(self, dtype):
        """GPS position measurement covariance for the given compute
        dtype. On the f32 fleet fast path, the SIMULATION TRUTH's
        geodetic position itself carries maneuver-correlated rounding
        wander (the position quaternion's f32 increments; measured ~15 m
        steady / ~45 m transient on the C172X turning climb — see
        docs/notes/performance.md), which reaches the filter through the
        GPS measurement construction. Modeling it as extra position-
        measurement noise (exactly how a real receiver derates for
        multipath) keeps the update consistent and the NIS monitor
        false-alarm-free on BOTH precisions; f64 keeps the catalog R.

        FDI sensitivity consequence (deliberate): the derated R also
        sets the NIS monitor's innovation covariance on the f32 path, so
        the minimum detectable GPS position fault scales with
        sigma_geo_f32 — roughly sqrt(16.27)*20 ≈ 80 m for an instant
        bias at the 99.9% gate, vs ~9 m on f64 (characterized by
        `tests/test_navigation.py::test_min_detectable_gps_fault_scales_
        with_R`). Using the catalog R for the monitor alone would
        re-introduce the f32 false alarms the derating exists to remove
        — the f32-truth wander is real innovation error, not
        conservatism."""
        R = self.R_pos
        if jnp.dtype(dtype) == jnp.float32:
            R = R + jnp.eye(3) * self.sigma_geo_f32**2
        return R.astype(dtype)

    def init(self, q_nb=None, v_n=None, p_n=None, att_std=0.05,
             vel_std=0.2, pos_std=3.0, bg_std=5e-3, ba_std=0.05):
        z = jnp.zeros(3)
        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0]) if q_nb is None else \
            jnp.asarray(q_nb)
        P0 = jnp.diag(jnp.concatenate([
            jnp.full(3, att_std**2), jnp.full(3, vel_std**2),
            jnp.full(3, pos_std**2), jnp.full(3, bg_std**2),
            jnp.full(3, ba_std**2)]))
        return InsGpsState(q_nb=q0, v_n=z if v_n is None else jnp.asarray(v_n),
                           p_n=z if p_n is None else jnp.asarray(p_n),
                           b_g=z, b_a=z, P=P0)

    # ------------------------------------------------------------- predict

    def predict(self, st: InsGpsState, omega_m, f_m) -> InsGpsState:
        from flightjax.ops.attitude import quat_to_matrix
        # full-f32 matmul precision is load-bearing on TPU: the default
        # MXU pass runs f32 matmuls through bf16 products, which the
        # Riccati recursion (P spans ~1e-8..1e1) cannot survive — NaNs on
        # the chip within seconds (caught by the round-4 verify drive)
        with jax.default_matmul_precision("highest"):
            return self._predict(st, omega_m, f_m)

    def _predict(self, st: InsGpsState, omega_m, f_m) -> InsGpsState:
        from flightjax.ops.attitude import quat_to_matrix
        dt = self.dt
        dtp = st.P.dtype
        w = omega_m - st.b_g
        f = f_m - st.b_a
        q = qnormalize(qmul(st.q_nb, rvec_to_quat(w * dt)))
        C = quat_to_matrix(st.q_nb)
        a_n = C @ f + self.g_n.astype(dtp)
        v = st.v_n + a_n * dt
        p = st.p_n + st.v_n * dt + 0.5 * a_n * dt**2

        I3 = jnp.eye(3, dtype=dtp)
        Z3 = jnp.zeros((3, 3), dtp)
        Cf = C @ skew(f)
        Phi = jnp.block([
            [I3 - skew(w) * dt, Z3, Z3, -I3 * dt, Z3],
            [-Cf * dt, I3, Z3, Z3, -C * dt],
            [-0.5 * Cf * dt**2, I3 * dt, I3, Z3, -0.5 * C * dt**2],
            [Z3, Z3, Z3, I3, Z3],
            [Z3, Z3, Z3, Z3, I3]])
        P = Phi @ st.P @ Phi.T + self.Q.astype(dtp)
        P = 0.5 * (P + P.T)  # f32 symmetry guard (state scales span ~1e7)
        return InsGpsState(q_nb=q, v_n=v, p_n=p, b_g=st.b_g, b_a=st.b_a,
                           P=P)

    # ------------------------------------- deferred covariance propagation

    def predict_mean(self, st: InsGpsState, omega_m, f_m):
        """Mean-only strapdown mechanization (P untouched): the per-
        firing half of the DEFERRED covariance scheme. Returns
        (st', F dt) where F dt is this epoch's transition-minus-identity
        contribution; the caller accumulates A = Σ F dt between aiding
        epochs and compounds ONE covariance propagation per interval
        (`propagate_P`). This is the round-5 sensor-fed throughput move
        beyond the stacked update: the per-firing pair of 15x15
        covariance matmuls (which dominate the filter's device time at
        fleet scale) collapse to one pair per aiding interval, while the
        navigation solution itself stays mechanized at the full rate.
        First-order compounding is exact to O((F dt)^2) per interval
        (|F dt| <= ~0.2/firing at 1 g; `propagate_P` keeps the A^2/2
        term, bounding the interval error at ~1e-3 relative) —
        equivalence vs the exact per-firing recursion is test-enforced
        (`tests/test_navigation.py::test_deferred_covariance_matches_
        exact`)."""
        with jax.default_matmul_precision("highest"):
            return self._predict_mean_hp(st, omega_m, f_m)

    def _predict_mean_hp(self, st, omega_m, f_m):
        from flightjax.ops.attitude import quat_to_matrix
        dt = self.dt
        dtp = st.P.dtype
        w = omega_m - st.b_g
        f = f_m - st.b_a
        q = qnormalize(qmul(st.q_nb, rvec_to_quat(w * dt)))
        C = quat_to_matrix(st.q_nb)
        a_n = C @ f + self.g_n.astype(dtp)
        v = st.v_n + a_n * dt
        p = st.p_n + st.v_n * dt + 0.5 * a_n * dt**2
        # A's only varying blocks are three 3x3 sums (the dt^2 position
        # couplings are dt-multiples of the dt^1 sums, the bias columns
        # are -I*k*dt): accumulate just (skew(w) dt, C[f x] dt, C dt) —
        # a handful of fused 3x3 adds per firing instead of a 15x15
        # block assembly (launch-count matters; see propagate_P)
        Cf = C @ skew(f)
        parts = (skew(w) * dt, Cf * dt, C * dt)
        return (InsGpsState(q_nb=q, v_n=v, p_n=p, b_g=st.b_g, b_a=st.b_a,
                            P=st.P), parts)

    @staticmethod
    def zero_A(dtype=None):
        """Zero accumulator for the deferred-covariance scheme (the
        three varying 3x3 block-sums of A — see `predict_mean`)."""
        z = jnp.zeros((3, 3), dtype)
        return {"w": z, "cf": z, "c": z}

    @staticmethod
    def accum_A(A, parts):
        sw, scf, sc = parts
        return {"w": A["w"] + sw, "cf": A["cf"] + scf, "c": A["c"] + sc}

    def propagate_P(self, st: InsGpsState, A, k):
        """Compounded covariance propagation over an aiding interval of
        `k` firings: Phi ≈ I + A + A²/2 with A = Σ F dt assembled from
        the three accumulated block-sums (see `predict_mean`), Q scaled
        by k (first order — Q is diagonal and tiny per firing)."""
        with jax.default_matmul_precision("highest"):
            dtp = st.P.dtype
            dt = self.dt
            Z3 = jnp.zeros((3, 3), dtp)
            Ikdt = jnp.eye(3, dtype=dtp) * (float(k) * dt)
            Sw, Scf, Sc = (A["w"].astype(dtp), A["cf"].astype(dtp),
                           A["c"].astype(dtp))
            Am = jnp.block([
                [-Sw, Z3, Z3, -Ikdt, Z3],
                [-Scf, Z3, Z3, Z3, -Sc],
                [-0.5 * dt * Scf, Ikdt, Z3, Z3, -0.5 * dt * Sc],
                [Z3, Z3, Z3, Z3, Z3],
                [Z3, Z3, Z3, Z3, Z3]])
            Phi = (jnp.eye(15, dtype=dtp) + Am + 0.5 * (Am @ Am))
            P = Phi @ st.P @ Phi.T + (float(k) * self.Q).astype(dtp)
            P = 0.5 * (P + P.T)
            return st._replace(P=P)

    # -------------------------------------------------------------- updates

    def _update(self, st: InsGpsState, H, y, R):
        with jax.default_matmul_precision("highest"):
            return self._update_hp(st, H, y, R)

    def _update_hp(self, st: InsGpsState, H, y, R):
        S = H @ st.P @ H.T + R.astype(st.P.dtype)
        K = _gain(st.P, H, S)
        dx = K @ y
        IKH = jnp.eye(15, dtype=st.P.dtype) - K @ H
        P = IKH @ st.P @ IKH.T + K @ R.astype(st.P.dtype) @ K.T
        P = 0.5 * (P + P.T)  # f32 symmetry guard
        q = qnormalize(qmul(st.q_nb, rvec_to_quat(dx[0:3])))
        return InsGpsState(q_nb=q, v_n=st.v_n + dx[3:6],
                           p_n=st.p_n + dx[6:9], b_g=st.b_g + dx[9:12],
                           b_a=st.b_a + dx[12:15], P=P)

    @staticmethod
    def _blockH(idx, dtype):
        H = jnp.zeros((3, 15), dtype)
        return jax.lax.dynamic_update_slice(
            H, jnp.eye(3, dtype=dtype), (0, idx))

    def update_gps(self, st: InsGpsState, p_meas, v_meas, valid=True):
        dtp = st.P.dtype
        upd = self._update(st, self._blockH(6, dtp), p_meas - st.p_n,
                           self.R_pos_eff(dtp))
        upd = self._update(upd, self._blockH(3, dtp), v_meas - upd.v_n,
                           self.R_vel)
        return masked_update(jnp.asarray(valid), upd, st)

    def update_baro(self, st: InsGpsState, h_meas, h_origin):
        """Baro observes altitude above the filter origin = -p_d."""
        H = jnp.zeros((1, 15), st.P.dtype).at[0, 8].set(-1.0)
        y = jnp.atleast_1d(h_meas - h_origin + st.p_n[2])
        return self._update(st, H, y, self.R_baro)

    def update_mag(self, st: InsGpsState, mag_m, B_n=None):
        """Heading anchor: body-frame observation of the known NED field
        DIRECTION (unit-normalized, same right-multiplicative
        H = [v_pred×] as `Ahrs`). Normalization is load-bearing for the
        f32 fleet path: in Tesla units S ~ 1e-13, which the 15x15 solve
        cannot survive at f32 precision (NaNs on the chip, caught by the
        round-4 verify drive); in direction units S ~ 1e-5. `B_n`
        overrides the constructor field (location-tied field: the caller
        passes the SAME vector the magnetometer truth model uses)."""
        m = mag_m / (jnp.linalg.norm(mag_m, axis=-1, keepdims=True) + 1e-30)
        B = self.B_n if B_n is None else jnp.asarray(B_n)
        b_dir = B / jnp.linalg.norm(B)
        v_pred = qrot_inv(st.q_nb, b_dir.astype(st.P.dtype))
        H = jnp.concatenate(
            [skew(v_pred), jnp.zeros((3, 12), st.P.dtype)], axis=1)
        return self._update(st, H, m - v_pred, self.R_mag_dir)

    # --------------------------------------------- stacked (batched) update

    def stacked_rows(self, st: InsGpsState, p_meas, v_meas, h_baro_e,
                     h_origin, mag_m, B_n=None, h_radar_e=None):
        """Assemble the simultaneous-measurement system for one aiding
        epoch: returns (H (m,15), y (m,), r (m,) diagonal measurement
        variances) with the row layout

            0:3  GPS position        3:6  GPS velocity
            6    baro altitude       7:10 mag field direction
            [10  radar altitude]     (present iff h_radar_e is not None)

        Rows are assembled UNCONDITIONALLY; the caller passes a per-row
        validity mask to `update_stacked`, which zeroes masked rows in a
        way that is exactly equivalent to deleting them (see there)."""
        dtp = st.P.dtype
        Z = lambda r, c: jnp.zeros((r, c), dtp)
        I3 = jnp.eye(3, dtype=dtp)

        H_pos = jnp.concatenate([Z(3, 6), I3, Z(3, 6)], axis=1)
        y_pos = p_meas - st.p_n
        r_pos = jnp.diagonal(self.R_pos_eff(dtp))

        H_vel = jnp.concatenate([Z(3, 3), I3, Z(3, 9)], axis=1)
        y_vel = v_meas - st.v_n
        r_vel = jnp.diagonal(self.R_vel).astype(dtp)

        H_baro = jnp.zeros((1, 15), dtp).at[0, 8].set(-1.0)
        y_baro = jnp.atleast_1d(h_baro_e - h_origin + st.p_n[2])
        r_baro = self.R_baro[0].astype(dtp)

        m = mag_m / (jnp.linalg.norm(mag_m, axis=-1, keepdims=True) + 1e-30)
        B = self.B_n if B_n is None else jnp.asarray(B_n)
        b_dir = B / jnp.linalg.norm(B)
        v_pred = qrot_inv(st.q_nb, b_dir.astype(dtp))
        H_mag = jnp.concatenate([skew(v_pred), Z(3, 12)], axis=1)
        y_mag = m - v_pred
        r_mag = jnp.diagonal(self.R_mag_dir).astype(dtp)

        Hs = [H_pos, H_vel, H_baro, H_mag]
        ys = [y_pos, y_vel, y_baro, y_mag]
        rs = [r_pos, r_vel, r_baro, r_mag]
        if h_radar_e is not None:
            # radar altimeter mapped to ellipsoidal altitude by the
            # caller (terrain + AGL + undulation): same -dp_d row as baro
            Hs.append(jnp.zeros((1, 15), dtp).at[0, 8].set(-1.0))
            ys.append(jnp.atleast_1d(h_radar_e - h_origin + st.p_n[2]))
            rs.append(jnp.asarray([self.sigma_radar**2], dtp))
        return (jnp.concatenate(Hs, axis=0), jnp.concatenate(ys, axis=0),
                jnp.concatenate(rs, axis=0))

    def stacked_innovation(self, st: InsGpsState, H, r):
        """(P Hᵀ, S = H P Hᵀ + diag(r)) for a stacked system — computed
        ONCE per aiding epoch and shared between the per-channel NIS
        monitors (marginal innovation systems are S's diagonal blocks)
        and the update itself (`update_stacked(..., PHt=, S=)`)."""
        with jax.default_matmul_precision("highest"):
            PHt = st.P @ H.T
            S = H @ PHt + jnp.diag(r.astype(st.P.dtype))
            return PHt, S

    def update_stacked(self, st: InsGpsState, H, y, r, mask,
                       PHt=None, S=None, sizes=None):
        """ONE simultaneous Joseph update over a stacked measurement
        system with per-row validity `mask` (bool (m,)). Masked rows are
        zeroed in H, y, P Hᵀ and S (diagonal reset to 1), which makes S
        block-diagonal between active and masked rows with an identity
        masked block — the posterior is then EXACTLY the update over the
        active rows alone (masked gain columns vanish identically), with
        no branches and a single fixed shape.

        This is the sensor-fed fleet's throughput move (round-5; the
        round-4 profile showed the step kernel-count-bound on up to four
        sequential 15x15 Joseph updates per firing — BENCHMARKS.md
        'known headroom'): same-epoch GPS/baro/mag/radar blocks collapse
        into one ≤11-row update whose innovation system solves by BLOCK
        elimination over the channel partition (`blocked_spd_solve` —
        the scalar unrolled Cholesky measured NEGATIVE on-chip: its
        ~200-kernel serial chain cost more than the merged Josephs
        saved; docs/notes/performance.md round 5). For simultaneous
        linear(ized) measurement blocks the batched update equals
        sequential processing in exact arithmetic (equivalence-tested
        in `tests/test_estimation.py`)."""
        with jax.default_matmul_precision("highest"):
            return self._update_stacked_hp(st, H, y, r, mask, PHt, S,
                                           sizes)

    def _update_stacked_hp(self, st, H, y, r, mask, PHt, S, sizes):
        dtp = st.P.dtype
        m = H.shape[0]
        mf = mask.astype(dtp)
        Hm = H * mf[:, None]
        ym = y * mf
        rm = jnp.where(mask, r.astype(dtp), jnp.ones_like(mf))
        if S is None:
            PHt = st.P @ Hm.T
            Sm = Hm @ PHt + jnp.diag(rm)
            PHtm = PHt
        else:
            # mask the precomputed unmasked system: zero masked
            # rows/cols, reset masked diagonal entries to 1
            PHtm = PHt * mf[None, :]
            Sm = S * (mf[:, None] * mf[None, :])
            dm = jnp.where(mask, jnp.diagonal(S), jnp.ones((), dtp))
            Sm = Sm - jnp.diag(jnp.diagonal(Sm)) + jnp.diag(dm)
        if sizes is None:
            sizes = (3, 3, 1, 3) if m == 10 else \
                ((3, 3, 1, 3, 1) if m == 11 else (1,) * m)
        K = blocked_spd_solve(Sm, PHtm.T, sizes).T
        dx = K @ ym
        IKH = jnp.eye(15, dtype=dtp) - K @ Hm
        P = IKH @ st.P @ IKH.T + (K * rm) @ K.T
        P = 0.5 * (P + P.T)  # f32 symmetry guard
        q = qnormalize(qmul(st.q_nb, rvec_to_quat(dx[0:3])))
        return InsGpsState(q_nb=q, v_n=st.v_n + dx[3:6],
                           p_n=st.p_n + dx[6:9], b_g=st.b_g + dx[9:12],
                           b_a=st.b_a + dx[12:15], P=P)

    def step(self, st: InsGpsState, omega_m, f_m, mag_m=None, gps_p=None,
             gps_v=None, gps_new=False, h_baro=None, h_origin=0.0):
        st = self.predict(st, omega_m, f_m)
        if gps_p is not None:
            st = self.update_gps(st, gps_p, gps_v, valid=gps_new)
        if h_baro is not None:
            st = self.update_baro(st, h_baro, h_origin)
        if mag_m is not None:
            st = self.update_mag(st, mag_m)
        return st

    def run(self, st: InsGpsState, omega_ms, f_ms, mag_ms=None, gps_ps=None,
            gps_vs=None, gps_news=None, h_baros=None, h_origin=0.0):
        """Scan a whole record (leading dim = epochs). Returns the final
        state and (q_nb, v_n, p_n) histories."""
        have_m = mag_ms is not None
        have_g = gps_ps is not None
        have_b = h_baros is not None
        K = f_ms.shape[0]
        z3 = jnp.zeros((K, 3), f_ms.dtype)
        mag_ms = z3 if mag_ms is None else mag_ms
        gps_ps = z3 if gps_ps is None else gps_ps
        gps_vs = z3 if gps_vs is None else gps_vs
        gps_news = jnp.zeros(K, bool) if gps_news is None else gps_news
        h_baros = jnp.zeros((K,), f_ms.dtype) if h_baros is None else h_baros

        def body(st, zz):
            om, f, mg, gp, gv, gn, hb = zz
            st = self.step(st, om, f, mg if have_m else None,
                           gp if have_g else None,
                           gv if have_g else None, gn,
                           hb if have_b else None, h_origin)
            return st, (st.q_nb, st.v_n, st.p_n)

        return jax.lax.scan(body, st, (omega_ms, f_ms, mag_ms, gps_ps,
                                       gps_vs, gps_news, h_baros))


# ---------------------------------------------------------- fault detection

def nis(y, S):
    """Normalized innovation squared yᵀ S⁻¹ y — chi-square distributed
    with dim(y) degrees of freedom when the filter is consistent. The
    standard residual test for sensor-fault detection: compare against a
    chi-square quantile (e.g. 16.3 = 99.9% for 3 DoF) and flag epochs
    above it. (1-DoF is a scalar divide and 3-DoF the adjugate inverse
    — see `_inv3`; larger systems the unrolled Cholesky. Never batched
    LU: a TPU performance trap.)"""
    if S.shape[-1] == 1:
        return (y[..., 0] * y[..., 0]) / S[..., 0, 0]
    if S.shape[-1] == 3:
        return y @ (_inv3(S) @ y)
    return y @ chol_solve(S, y[..., None])[..., 0]


def innovation_monitor(threshold, window=10, min_hits=5):
    """Builds a scan-friendly persistent fault monitor: `update(state,
    nis_value, valid)` pushes one epoch's NIS into a shift register and
    returns (state, alarm) — alarm latches when >= `min_hits` of the last
    `window` *valid* epochs exceeded `threshold`. Branch-free; vmappable.

    The register is a BITMASK (uint32 shift + population count), not an
    indexed ring buffer: a per-lane `hits.at[idx].set()` ring is a
    batched dynamic scatter, which lowers to one of the slowest kernel
    classes on TPU — five monitors' scatters dominated the stacked
    aiding block at fleet scale (measured round 5,
    docs/notes/performance.md) — while the bitmask form is three fused
    elementwise integer ops."""
    assert window <= 32, "bitmask register holds at most 32 epochs"
    mask = jnp.uint32((1 << window) - 1)

    def init():
        return {"bits": jnp.asarray(0, jnp.uint32),
                "alarm": jnp.asarray(False)}

    def update(st, nis_value, valid=True):
        valid = jnp.asarray(valid)
        hit = (valid & (nis_value > threshold)).astype(jnp.uint32)
        bits = jnp.where(valid, ((st["bits"] << 1) | hit) & mask,
                         st["bits"])
        alarm = st["alarm"] | (jax.lax.population_count(bits) >= min_hits)
        return {"bits": bits, "alarm": alarm}, alarm

    return init, update
