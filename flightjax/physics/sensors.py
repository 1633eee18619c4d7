"""Onboard sensor models: IMU, pitot-static, baro/radar altimeters, GPS,
magnetometer.

Beyond-reference capability: Flight.jl has no sensor layer at all — its
avionics read the true `KinData`/`AirData` directly (`aircraftbase.jl:201-210`).
Real avionics see noisy, biased, rate-limited measurements; any state
estimation, sensor-fusion, or certification-style failure study needs a
sensor model between truth and the filter. This module provides one,
designed TPU-first:

- every sensor is a **pure function of truth + an error-state pytree +
  counter-based PRNG draws** (`key = fold_in(fold_in(base, seed), n)`, the
  same reproducible per-lane stream idiom as
  `flightjax.physics.turbulence`), so the whole suite vmaps over Monte
  Carlo fleets and shards with the fleet axis unchanged;
- slowly-varying error processes (gyro/accel bias random walks, GPS
  Gauss-Markov error) ride in a small discrete state advanced in
  `f_step` — branch-free, fixed shapes, scan-carry friendly;
- zeroing a sensor's noise parameters makes it exact: `measure` then
  returns the underlying truth bit-for-bit, which is the test anchor
  (`tests/test_sensors.py`).

The suite composes two ways: in-loop as a `Component` (error states in the
vehicle carry, measurements in `y` for closed-loop estimation), or
post-hoc via `measure_trajectory` over a saved rollout's `KinData`/
`AirData`/`DynamicsData` stacks (sensor studies without re-running
physics).

Truth sources (all already computed by the vehicle step):
`KinData` (`physics/kinematics.py`), `AirData` (`physics/atmosphere.py`),
`DynamicsData` (`physics/dynamics.py` — specific force / angular
acceleration for the IMU lever-arm terms, `dynamics.jl:416-434`).
"""

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flightjax.core.modeling import Component
from flightjax.ops import geodesy as geo
from flightjax.ops.quaternions import qrot_inv
from flightjax.physics.atmosphere import (
    GAMMA, G_STD, ISA_LAYERS, P_STD, R_GAS, RHO_STD, T_STD)

_KEY_BASE = 0x5E45  # sensors' PRNG domain (distinct from turbulence 0x0D27)


# --------------------------------------------------------------------------
# ISA pressure -> altitude inverse (baro altimeter core)

def _layer_bases():
    """Python-scalar (h_base, T_base, p_base) per ISA layer."""
    bases = []
    T, p, h = T_STD, P_STD, 0.0
    for beta, h_ceil in ISA_LAYERS:
        bases.append((h, T, p))
        dh = h_ceil - h
        if beta != 0.0:
            p = p * (1 + beta / T * dh) ** (-G_STD / (beta * R_GAS))
            T = T + beta * dh
        else:
            p = p * math.exp(-G_STD / (R_GAS * T) * dh)
        h = h_ceil
    return tuple(bases)


_ISA_BASES = _layer_bases()


def pressure_altitude(p):
    """Geopotential altitude [m] of static pressure `p` [Pa] in the
    standard atmosphere — the exact inverse of
    `atmosphere.isa_data(h, T_STD, P_STD)[1]` (round-trip verified in
    `tests/test_sensors.py`). Branch-free layer selection; pressures above
    sea level extrapolate the first layer downward, pressures below the
    84.852 km ceiling clamp to the last layer's law."""
    p = jnp.asarray(p)
    h_out = None
    for (beta, h_ceil), (h_b, T_b, p_b) in zip(ISA_LAYERS, _ISA_BASES):
        if beta != 0.0:
            h = h_b + T_b / beta * ((p / p_b) ** (-beta * R_GAS / G_STD) - 1.0)
        else:
            h = h_b - R_GAS * T_b / G_STD * jnp.log(p / p_b)
        h_out = h if h_out is None else jnp.where(p < p_b, h, h_out)
    return h_out


# --------------------------------------------------------------------------
# Parameter bundles (plain dicts of arrays: vmappable for per-lane grades)

def imu_params(sigma_gyro=8.7e-4, sigma_accel=0.02,
               rw_gyro=3.0e-5, rw_accel=1.0e-3,
               bias0_gyro=4.8e-3, bias0_accel=0.05,
               scale_gyro=0.0, scale_accel=0.0,
               r_imu_b=(0.0, 0.0, 0.0)):
    """Tactical/consumer-grade MEMS defaults. sigma_*: white noise per
    sample [rad/s, m/s^2]; rw_*: bias random-walk increment std per
    sqrt(s); bias0_*: turn-on bias std (drawn once at init); scale_*:
    fractional scale-factor error std; r_imu_b: IMU position from the body
    origin [m] (lever arm for the accelerometer)."""
    return {"sigma_gyro": jnp.asarray(sigma_gyro),
            "sigma_accel": jnp.asarray(sigma_accel),
            "rw_gyro": jnp.asarray(rw_gyro),
            "rw_accel": jnp.asarray(rw_accel),
            "bias0_gyro": jnp.asarray(bias0_gyro),
            "bias0_accel": jnp.asarray(bias0_accel),
            "scale_gyro": jnp.asarray(scale_gyro),
            "scale_accel": jnp.asarray(scale_accel),
            "r_imu_b": jnp.asarray(r_imu_b, jnp.float64
                                   if jax.config.jax_enable_x64 else jnp.float32)}


def airdata_params(sigma_p=15.0, sigma_pt=15.0, bias_p=0.0, bias_pt=0.0,
                   sigma_T=0.5):
    """Pitot-static noise [Pa] and static-source bias; OAT noise [K]."""
    return {"sigma_p": jnp.asarray(sigma_p), "sigma_pt": jnp.asarray(sigma_pt),
            "bias_p": jnp.asarray(bias_p), "bias_pt": jnp.asarray(bias_pt),
            "sigma_T": jnp.asarray(sigma_T)}


def gps_params(sigma_pos=0.5, sigma_vel=0.05, gm_sigma=1.5, gm_tau=60.0):
    """White position/velocity noise [m, m/s] plus a first-order
    Gauss-Markov position error (correlated multipath/atmospheric error:
    stationary std gm_sigma [m], time constant gm_tau [s])."""
    return {"sigma_pos": jnp.asarray(sigma_pos),
            "sigma_vel": jnp.asarray(sigma_vel),
            "gm_sigma": jnp.asarray(gm_sigma),
            "gm_tau": jnp.asarray(gm_tau)}


def mag_field_ned(magnitude=None, inclination=None, declination=0.0):
    """NED geomagnetic field vector [T] from the standard per-location
    triple (total intensity F, inclination I — positive down, declination
    D — positive east of true north):

        B_n = F * [cos I cos D,  cos I sin D,  sin I]

    The defaults reproduce the historical mid-latitude zero-declination
    field (19, 0, 45) uT. A heading reference (AHRS) must be fed the SAME
    field as the magnetometer model — a declination mismatch shows up
    one-for-one as a heading bias (tested in `tests/test_sensors.py` /
    `tests/test_estimation.py`)."""
    if magnitude is None:
        magnitude = math.hypot(19.0e-6, 45.0e-6)
    if inclination is None:
        inclination = math.atan2(45.0, 19.0)  # 67.1 deg, mid-latitude
    cI = jnp.cos(inclination)
    return magnitude * jnp.stack([
        cI * jnp.cos(declination), cI * jnp.sin(declination),
        jnp.sin(inclination) * jnp.ones_like(jnp.asarray(declination))],
        axis=-1)


# IGRF-13 epoch-2020 degree-1 Gauss coefficients [T] (public constants):
# the centered tilted dipole. Good to a few degrees of declination /
# ~20% of intensity against the full model — exactly the fidelity a
# location-consistent heading reference needs (truth and filter consume
# the SAME vector, so model error cancels out of the heading loop).
_G10, _G11, _H11 = -29404.8e-9, -1450.9e-9, 4652.5e-9


def mag_field_dipole(lat, lon, h=0.0):
    """NED geomagnetic field [T] at a geodetic fix from the centered
    tilted dipole (degree-1 IGRF). Ties declination/inclination/
    intensity to the LOCATION, so a heading reference initialized from
    the trim fix is correct-by-default anywhere on the globe (the fixed
    `mag_field_ned` default is only right at mid-latitude zero
    declination).

    Degree-1 potential V = a (a/r)^2 [g10 cosθ + (g11 cosφ + h11 sinφ)
    sinθ] with colatitude θ; B = -∇V in spherical components, mapped to
    NED as (X, Y, Z) = (-B_θ, B_φ, -B_r). Geocentric latitude is
    approximated by geodetic (sub-degree effect on D/I)."""
    from flightjax.ops.geodesy import a as A_E
    theta = jnp.pi / 2 - lat
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(lon), jnp.cos(lon)
    ar3 = (A_E / (A_E + h)) ** 3
    m = _G11 * cp + _H11 * sp
    B_r = 2.0 * ar3 * (_G10 * ct + m * st)
    B_t = -ar3 * (-_G10 * st + m * ct)
    B_p = -ar3 * (-_G11 * sp + _H11 * cp)
    return jnp.stack([-B_t, B_p, -B_r], axis=-1)


def mag_declination(B_n):
    """(declination D, inclination I, intensity F) of a NED field vector
    — D positive east of true north, I positive down."""
    D = jnp.arctan2(B_n[..., 1], B_n[..., 0])
    H = jnp.hypot(B_n[..., 0], B_n[..., 1])
    I = jnp.arctan2(B_n[..., 2], H)
    return D, I, jnp.linalg.norm(B_n, axis=-1)


def mag_params(B_n=None, sigma=150.0e-9, hard_iron=(0.0, 0.0, 0.0),
               magnitude=None, inclination=None, declination=0.0):
    """NED geomagnetic field [T] — either an explicit `B_n` vector or the
    (magnitude, inclination, declination) triple via `mag_field_ned`
    (default: mid-latitude, zero declination) — plus white noise std [T]
    and hard-iron offset [T]."""
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if B_n is None:
        B_n = mag_field_ned(magnitude, inclination, declination)
    return {"B_n": jnp.asarray(B_n, dt), "sigma": jnp.asarray(sigma),
            "hard_iron": jnp.asarray(hard_iron, dt)}


def baro_params(sigma=0.3, qnh=P_STD):
    """Altimeter output noise [m] and Kollsman (QNH) setting [Pa]:
    indicated altitude = pressure_altitude(p) - pressure_altitude(qnh)."""
    return {"sigma": jnp.asarray(sigma), "qnh": jnp.asarray(qnh)}


def radar_params(sigma=0.2, h_max=762.0):
    """Radar altimeter: noise [m], max range [m] (2500 ft typical); AGL
    readings clamp to [0, h_max] and `radar_valid` flags in-range."""
    return {"sigma": jnp.asarray(sigma), "h_max": jnp.asarray(h_max)}


def suite_params(imu=None, airdata=None, gps=None, mag=None, baro=None,
                 radar=None):
    return {"imu": imu_params() if imu is None else imu,
            "airdata": airdata_params() if airdata is None else airdata,
            "gps": gps_params() if gps is None else gps,
            "mag": mag_params() if mag is None else mag,
            "baro": baro_params() if baro is None else baro,
            "radar": radar_params() if radar is None else radar}


def exact_suite_params():
    """All noise/bias parameters zero: `measure` returns truth exactly."""
    p = suite_params()

    def zero(d, keep=()):
        return {k: (v if k in keep else jnp.zeros_like(v))
                for k, v in d.items()}

    p["imu"] = zero(p["imu"], keep=("r_imu_b",))
    p["airdata"] = zero(p["airdata"])
    p["gps"] = {**zero(p["gps"]), "gm_tau": p["gps"]["gm_tau"]}
    p["mag"] = zero(p["mag"])
    p["mag"]["B_n"] = mag_params()["B_n"]
    p["baro"] = {**zero(p["baro"]), "qnh": p["baro"]["qnh"]}
    p["radar"] = {**zero(p["radar"]), "h_max": p["radar"]["h_max"]}
    return p


# --------------------------------------------------------------------------

class SensorData(NamedTuple):
    """One measurement epoch. All quantities in SI; `gps_new` flags the
    steps on which the GPS solution refreshes (consumers mask updates on
    it — there is no hidden held state)."""
    omega_b: jnp.ndarray    # (3,) gyro [rad/s], body axes, wrt ECI
    f_b: jnp.ndarray        # (3,) accelerometer specific force [m/s^2]
    p_s: jnp.ndarray        # static pressure [Pa]
    p_t: jnp.ndarray        # total pressure [Pa]
    T_oat: jnp.ndarray      # outside air temperature [K]
    CAS: jnp.ndarray        # calibrated airspeed from (p_t - p_s) [m/s]
    h_baro: jnp.ndarray     # indicated baro altitude [m]
    mag_b: jnp.ndarray      # (3,) body-axes magnetic field [T]
    gps_lat: jnp.ndarray
    gps_lon: jnp.ndarray
    gps_h: jnp.ndarray      # ellipsoidal altitude [m]
    gps_v_n: jnp.ndarray    # (3,) NED velocity [m/s]
    gps_new: jnp.ndarray    # bool: GPS epoch this step
    h_radar: jnp.ndarray    # AGL radar altitude [m], clamped to range
    radar_valid: jnp.ndarray  # bool: within [0, h_max]


def cas_from_pressures(p_t, p_s):
    """Calibrated airspeed from measured impact pressure — the same
    subsonic compressible formula the truth chain uses
    (`atmosphere.air_data`, `atmosphere.jl:236-238`)."""
    Dp = jnp.maximum(p_t - p_s, 0.0)
    return jnp.sqrt(2 * GAMMA / (GAMMA - 1) * P_STD / RHO_STD
                    * ((1 + Dp / P_STD) ** ((GAMMA - 1) / GAMMA) - 1))


class SensorSuite(Component):
    """Full sensor complement as a Component.

    u = {"seed": int32 per-lane stream id, "params": suite_params()} —
    parameters ride in u so Monte Carlo fleets can randomize sensor
    grades per lane with plain vmap.
    s = {"b_g","b_a": (3,) IMU bias random walks, "gm_gps": (3,)
    Gauss-Markov GPS position error [m NED], "n": int32 epoch counter}.

    `f_step` advances the error processes once per sim step (dt fixed at
    construction); `measure` is pure in (u, s, n, truth) so the in-loop
    and post-hoc paths produce identical streams.
    """

    def __init__(self, dt, gps_every=1):
        self.dt = float(dt)
        self.gps_every = int(gps_every)

    def init_u(self):
        return {"seed": jnp.asarray(0, jnp.int32), "params": suite_params()}

    def init_s(self, u=None, init_key=None):
        """Error-state init. With `init_key`, turn-on biases are drawn at
        their bias0_* stds and the GPS Gauss-Markov state at its
        stationary std; without, all start at zero (exact suite)."""
        z = jnp.zeros(3)
        if init_key is None:
            b_g, b_a, gm = z, z, z
        else:
            p = (u or self.init_u())["params"]
            kg, ka, km = jax.random.split(init_key, 3)
            b_g = p["imu"]["bias0_gyro"] * jax.random.normal(kg, (3,))
            b_a = p["imu"]["bias0_accel"] * jax.random.normal(ka, (3,))
            gm = p["gps"]["gm_sigma"] * jax.random.normal(km, (3,))
        return {"b_g": b_g, "b_a": b_a, "gm_gps": gm,
                "n": jnp.asarray(0, jnp.int32)}

    # ---------------------------------------------------------------- noise

    @staticmethod
    def _draws(seed, n, tag, count, dtype):
        """(count,) white N(0,1) draws for epoch n of lane `seed` — a
        pure, counter-based stream (reproducible, resume-safe,
        lane-independent; same idiom as
        `turbulence.DrydenTurbulence.f_step`). `tag` separates the
        process-noise (f_step) and measurement-noise (measure) domains so
        the two are uncorrelated at the same epoch."""
        key = jax.random.fold_in(jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(_KEY_BASE), seed), n), tag)
        # the stream is DEFINED in f32 and cast up: an f64 (validation)
        # run and an f32 (fleet fast path) run of the same (seed, n, tag)
        # then see bit-identical noise, so cross-precision comparisons
        # measure arithmetic drift, not realization scatter
        # (tests/test_drift.py::test_f32_envelope_600s_autopilot_nav)
        return jax.random.normal(key, (count,), dtype=jnp.float32).astype(
            dtype)

    def f_step(self, x, u, s, t, *ctx):
        """Advance bias random walks + GPS Gauss-Markov error (exact
        discrete-time transition for the OU process) and bump the epoch."""
        p = u["params"]
        n = s["n"] + 1
        dt_ = self.dt
        eta = self._draws(u["seed"], n, 0, 9, jnp.result_type(s["b_g"]))
        sq = math.sqrt(dt_)
        b_g = s["b_g"] + p["imu"]["rw_gyro"] * sq * eta[0:3]
        b_a = s["b_a"] + p["imu"]["rw_accel"] * sq * eta[3:6]
        # OU exact step: x+ = phi x + sigma sqrt(1 - phi^2) w
        phi = jnp.exp(-dt_ / p["gps"]["gm_tau"])
        gm = (phi * s["gm_gps"]
              + p["gps"]["gm_sigma"] * jnp.sqrt(1.0 - phi * phi) * eta[6:9])
        return x, {"b_g": b_g, "b_a": b_a, "gm_gps": gm, "n": n}

    # -------------------------------------------------------------- measure

    def measure(self, u, s, kin, air, dyn, h_trn=0.0) -> SensorData:
        """Measurements at the current epoch from truth (KinData, AirData,
        DynamicsData) and the error state. `h_trn`: terrain orthometric
        elevation under the vehicle (radar altimeter ground reference)."""
        p = u["params"]
        dtp = jnp.result_type(s["b_g"])
        eta = (self._draws(u["seed"], s["n"], 1, 20, dtp)
               if _noise_on(p) else None)

        def white(sl, sigma):
            if eta is None:
                return 0.0
            return sigma * eta[sl]

        # --- IMU: omega_ib_b and specific force at the IMU location
        omega_ie_b = qrot_inv(
            kin.q_eb, jnp.asarray([0.0, 0.0, geo.omega_ie], dtp))
        omega_ib_b = kin.omega_eb_b + omega_ie_b
        # lever arm from CoM to IMU, body axes (frame c shares body axes)
        r = p["imu"]["r_imu_b"] - dyn.mp_sum_b.r_OG
        f_imu = (dyn.f_c_c + jnp.cross(dyn.alpha_ib_b, r)
                 + jnp.cross(omega_ib_b, jnp.cross(omega_ib_b, r)))
        omega_m = (omega_ib_b * (1.0 + p["imu"]["scale_gyro"]) + s["b_g"]
                   + white(slice(0, 3), p["imu"]["sigma_gyro"]))
        f_m = (f_imu * (1.0 + p["imu"]["scale_accel"]) + s["b_a"]
               + white(slice(3, 6), p["imu"]["sigma_accel"]))

        # --- pitot-static + OAT
        p_s = air.p + p["airdata"]["bias_p"] + white(6, p["airdata"]["sigma_p"])
        p_t = air.pt + p["airdata"]["bias_pt"] + white(7, p["airdata"]["sigma_pt"])
        p_t = jnp.maximum(p_t, p_s)  # a real pitot cannot read below static
        T_oat = air.T + white(8, p["airdata"]["sigma_T"])
        CAS = cas_from_pressures(p_t, p_s)

        # --- baro altimeter (noise drawn in altitude, the instrument's
        # output domain; Kollsman correction per baro_params)
        h_baro = (pressure_altitude(p_s)
                  - pressure_altitude(p["baro"]["qnh"])
                  + white(9, p["baro"]["sigma"]))

        # --- magnetometer
        mag_b = (qrot_inv(kin.q_nb, p["mag"]["B_n"]) + p["mag"]["hard_iron"]
                 + white(slice(10, 13), p["mag"]["sigma"]))

        # --- GPS (Gauss-Markov + white position error, mapped through the
        # local radii of curvature; epoch gating by counter)
        d_ned = s["gm_gps"] + white(slice(13, 16), p["gps"]["sigma_pos"])
        M, N = geo.radii(kin.n_e)
        gps_lat = kin.lat + d_ned[..., 0] / (M + kin.h_e)
        gps_lon = kin.lon + d_ned[..., 1] / ((N + kin.h_e) * jnp.cos(kin.lat))
        gps_h = kin.h_e - d_ned[..., 2]
        gps_v = kin.v_eb_n + white(slice(16, 19), p["gps"]["sigma_vel"])
        gps_new = (s["n"] % self.gps_every) == 0

        # --- radar altimeter
        h_agl = kin.h_o - h_trn + white(19, p["radar"]["sigma"])
        radar_valid = (h_agl >= 0.0) & (h_agl <= p["radar"]["h_max"])
        h_radar = jnp.clip(h_agl, 0.0, p["radar"]["h_max"])

        return SensorData(
            omega_b=omega_m, f_b=f_m, p_s=p_s, p_t=p_t, T_oat=T_oat,
            CAS=CAS, h_baro=h_baro, mag_b=mag_b, gps_lat=gps_lat,
            gps_lon=gps_lon, gps_h=gps_h, gps_v_n=gps_v,
            gps_new=jnp.asarray(gps_new), h_radar=h_radar,
            radar_valid=radar_valid)


def _noise_on(p):
    """Static check: with every stochastic parameter a Python/traced zero
    we still draw (traced values can't be inspected), but the all-zeros
    `exact_suite_params()` case short-circuits the draws when the zeros
    are concrete — keeping the exactness tests bit-for-bit and sparing
    the PRNG kernels in exact mode."""
    import numpy as np
    vals = [p["imu"]["sigma_gyro"], p["imu"]["sigma_accel"],
            p["airdata"]["sigma_p"], p["airdata"]["sigma_pt"],
            p["airdata"]["sigma_T"], p["gps"]["sigma_pos"],
            p["gps"]["sigma_vel"], p["mag"]["sigma"], p["baro"]["sigma"],
            p["radar"]["sigma"]]
    try:
        return any(float(np.asarray(v)) != 0.0 for v in vals)
    except (TypeError, jax.errors.ConcretizationTypeError):
        return True


def measure_trajectory(suite: SensorSuite, u, s0, kins, airs, dyns,
                       h_trn=0.0):
    """Post-hoc sensor pass over a saved rollout: scan the error processes
    along the time axis of stacked `KinData`/`AirData`/`DynamicsData`
    pytrees (leading dim = steps) and emit the `SensorData` stack. The
    stream is identical to running the suite in-loop with the same
    (seed, s0): measurement k uses the error state after k `f_step`s
    from s0 — step the suite first, then measure, exactly like the sim's
    ode -> f_step -> save ordering (`core/sim.py`)."""

    def body(s, truth):
        kin, air, dyn = truth
        _, s = suite.f_step(None, u, s, 0.0)
        z = suite.measure(u, s, kin, air, dyn, h_trn=h_trn)
        return s, z

    s_end, zs = jax.lax.scan(body, s0, (kins, airs, dyns))
    return zs, s_end


# --------------------------------------------------------------------------
# Fault injection (failure studies; SURVEY §5 failure-detection theme)

def inject_fault(zs: SensorData, field: str, mode: str, k0, k1=None,
                 delta=0.0) -> SensorData:
    """Inject a fault into one channel of a `SensorData` record (leading
    dim = epochs) — pure, mask-based, vmappable over fleets (`k0/k1/delta`
    may be per-lane arrays):

    - "freeze":    the channel holds its value at epoch k0 from k0 on
                   (stuck sensor);
    - "bias_jump": `delta` is added from k0 on (latent hardover/step);
    - "dropout":   the channel reads zero on [k0, k1) (power loss —
                   detectable; NaNs would poison downstream filters).

    Returns a new SensorData; the truth record is not modified."""
    z = getattr(zs, field)
    K = z.shape[0]
    k = jnp.arange(K).reshape((K,) + (1,) * (z.ndim - 1))
    after = k >= k0
    if mode == "freeze":
        # per-lane gather: broadcast k0 over the non-epoch axes, then pick
        # each lane's own frozen epoch (scalar k0 reduces to a plain take)
        idx = jnp.broadcast_to(jnp.asarray(k0, jnp.int32), z.shape[1:])
        frozen = jnp.take_along_axis(z, idx[None, ...], axis=0)
        out = jnp.where(after, frozen, z)
    elif mode == "bias_jump":
        out = jnp.where(after, z + delta, z)
    elif mode == "dropout":
        upto = k < (K if k1 is None else k1)
        out = jnp.where(after & upto, jnp.zeros_like(z), z)
    else:
        raise ValueError(f"unknown fault mode {mode!r}")
    return zs._replace(**{field: out})
