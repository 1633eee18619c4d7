"""In-loop navigation avionics: SensorSuite + fused INS/GPS filter
between the vehicle truth and the control laws.

Beyond-reference capability — Flight.jl's avionics consume true `KinData`
directly (`aircraftbase.jl:201-210`); flightjax closes the realistic loop
IN the simulation step:

    truth (VehicleY) -> SensorSuite.measure -> [fault injection]
        -> InsGps (fused 15-state error-state EKF: attitude + velocity +
           position + gyro/accel biases; GPS/baro/mag aiding)
        -> innovation monitors (GPS / baro NIS, latched alarms)
        -> estimated VehicleY -> inner avionics (ControlLaws/GuidanceLaws)

    The fused filter (not the standalone Ahrs+Ins cascade) is deliberate:
    in a sustained turn, gravity-direction attitude aiding is biased by
    the centripetal acceleration, and a cascaded AHRS cannot receive the
    GPS-velocity information that disambiguates it — flying the control
    laws on cascade estimates measurably diverges (73 deg attitude error
    in 40 s of turning climb). The error-state EKF observes attitude
    through the -C[fx] coupling of velocity residuals, which is exactly
    the information a coordinated turn produces.

`NavAvionics` wraps any inner avionics that implements the Aircraft
protocol (`f_periodic(s, u, veh_y, dt)`, `assign`, `output`,
`init_from_trim`) and swaps the attitude / body-rate / velocity /
altitude / course / EAS channels of the `VehicleY` it sees for filtered
estimates. Everything is branch-free fixed-shape JAX, so the whole
closed loop vmaps over Monte Carlo fleets and shards over a device mesh
exactly like the truth-fed aircraft (`parallel/fleet.py`).

Fault handling (SURVEY §5 failure-detection theme): `u["fault"]`
carries a per-lane fault spec with the same freeze / bias_jump / dropout
semantics as the post-hoc `sensors.inject_fault`, applied at measure
time through hold registers in the discrete state. The GPS and baro
innovation NIS feed `estimation.innovation_monitor`s whose latched
alarms gate the corresponding filter updates — the documented response
is *reject-and-coast*: a detected GPS freeze stops position updates (the
INS coasts on IMU + baro), a detected baro fault stops baro updates.

Channels left as truth, deliberately: actuator positions/commands and
engine speed (internal FBW / RPM-sensor states the flight computer knows
essentially exactly), the weight-on-wheel squat switches, and the
alpha/beta vane channels of the LQR feature vectors (the C172X carries
no air-data boom; see `docs/notes/estimation.md`).

Known approximations (documented, all far below the control bands):
- the gyro estimate feeds both omega_eb_b and omega_wb_b (their true
  difference is the transport rate, ~1e-5 rad/s at cruise);
- the earth rate removed from the gyro uses the filter-origin latitude
  (error < 1e-8 rad/s over a local flight);
- baro altitude maps to ellipsoidal altitude through a datum captured at
  init (non-standard-atmosphere scale error is absorbed by GPS updates).
"""

import contextlib
import contextvars
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flightjax.ops import geodesy as geo
from flightjax.ops.attitude import quat_to_euler
from flightjax.ops.quaternions import qrot_inv
from flightjax.physics.atmosphere import GAMMA, R_GAS, RHO_STD
from flightjax.physics.sensors import (SensorData, SensorSuite,
                                       pressure_altitude, suite_params)
from flightjax.utils.estimation import (InsGps, innovation_monitor,
                                        masked_update, ned_from_geodetic,
                                        nis)

__all__ = ["NavAvionics", "NavY", "estimate_airspeed",
           "FAULT_NONE", "FAULT_GPS", "FAULT_BARO",
           "MODE_FREEZE", "MODE_BIAS", "MODE_DROPOUT", "no_fault"]

# fault spec enums (u["fault"]; same semantics as sensors.inject_fault)
FAULT_NONE, FAULT_GPS, FAULT_BARO = 0, 1, 2
MODE_FREEZE, MODE_BIAS, MODE_DROPOUT = 0, 1, 2

_NEVER = 2**31 - 1

# Trace-scoped fleet-level aiding-epoch gates (see NavAvionics.f_periodic
# and Simulation.fleet_step): a context-local, not an attribute, so
# concurrent traces cannot race (same design as aircraftbase.geoid_deferred).
_epoch_gates = contextvars.ContextVar("flightjax_nav_gates", default=None)


@contextlib.contextmanager
def epoch_gated(preds):
    """Scope in which NavAvionics' monitored aiding blocks are
    `lax.cond`-gated on fleet-level scalars: `preds` maps
    {"gps"|"baro"|"mag"} to "some lane has this aiding epoch on this
    step" (True = the full block must run; per-lane masks still apply,
    so the gate is conservative and exact)."""
    token = _epoch_gates.set(preds or {})
    try:
        yield
    finally:
        _epoch_gates.reset(token)


def no_fault():
    """Inactive fault spec (k0 = never). All leaves may be per-lane
    arrays under vmap."""
    return {"channel": jnp.asarray(FAULT_NONE, jnp.int32),
            "mode": jnp.asarray(MODE_FREEZE, jnp.int32),
            "k0": jnp.asarray(_NEVER, jnp.int32),
            "k1": jnp.asarray(_NEVER, jnp.int32),
            "delta": jnp.asarray(0.0)}


def estimate_airspeed(z: SensorData):
    """(TAS, EAS) from the measured pitot-static pressures and OAT — the
    exact inverse of the truth chain (`atmosphere.air_data`,
    `atmosphere.jl:220-242`): subsonic compressible Mach from Dp/p_s,
    TAS = M*a(T), EAS = TAS*sqrt(rho/rho0). With a zero-noise suite this
    reproduces the true TAS/EAS bit-for-bit (tested)."""
    Dp = jnp.maximum(z.p_t - z.p_s, 0.0)
    M2 = 2.0 / (GAMMA - 1) * ((1.0 + Dp / z.p_s) ** ((GAMMA - 1) / GAMMA)
                              - 1.0)
    a = jnp.sqrt(GAMMA * R_GAS * z.T_oat)
    TAS = jnp.sqrt(M2) * a
    rho = z.p_s / (R_GAS * z.T_oat)
    return TAS, TAS * jnp.sqrt(rho / RHO_STD)


class NavY(NamedTuple):
    """Per-firing navigation output (logged alongside the inner
    avionics' output)."""
    q_nb: jnp.ndarray       # (4,) estimated attitude
    b_g: jnp.ndarray        # (3,) gyro bias estimate
    p_n: jnp.ndarray        # (3,) NED position wrt the filter origin
    v_n: jnp.ndarray        # (3,) NED velocity estimate
    b_a: jnp.ndarray        # (3,) accel bias estimate
    h_est: jnp.ndarray      # estimated ellipsoidal altitude
    EAS_est: jnp.ndarray
    nis_gps: jnp.ndarray    # 3-DoF position-innovation NIS (valid epochs)
    nis_baro: jnp.ndarray   # 1-DoF baro-innovation NIS
    gps_alarm: jnp.ndarray  # latched FDI alarms
    baro_alarm: jnp.ndarray
    z: SensorData           # the (possibly faulted) measurement epoch


class NavAvionics:
    """Sensor + estimation stage wrapped around an inner avionics.

    `dt` must equal the Simulation's periodic interval (the avionics
    firing rate is the sensor/filter rate). `use_estimates=False` runs
    the whole stack in shadow mode — filters advance and alarms latch,
    but the inner avionics flies on truth (the selectable state source
    asked for by VERDICT r3 #1).

    State tree (`s`): sensor error processes, the InsGpsState, fault
    hold registers, monitor ring counters — all fixed-shape, advancing
    only on periodic firings (`core/sim.py` masks the whole f_periodic
    result), so the closed loop scans/vmaps/shards unchanged.
    """

    needs_terrain = True  # Aircraft.f_periodic plumbs h_trn when set

    def __init__(self, inner, dt, gps_every=10, mag_every=5, baro_every=5,
                 params=None, use_estimates=True, gps_gate=16.27,
                 baro_gate=10.83, monitor_window=6, monitor_min_hits=3,
                 filter_kw=None):
        self.inner = inner
        self.dt = float(dt)
        self.use_estimates = bool(use_estimates)
        self.suite = SensorSuite(dt=dt, gps_every=gps_every)
        # aiding rates: the gyro/accel PROPAGATION runs at the avionics
        # rate (50 Hz default); mag and baro AIDING run every mag_every /
        # baro_every epochs (10 Hz at the defaults — typical production
        # rates). Each skipped epoch saves a full 15x15 Joseph update —
        # at fleet scale these dominate the filter's device time
        # (profiled: docs/notes/performance.md round 4) — and the skips
        # ride the same fleet-level scalar lax.cond as the GPS block.
        self.mag_every = int(mag_every)
        self.baro_every = int(baro_every)
        p = params if params is not None else suite_params()
        self._params = p

        def _f(d, k):
            return float(jnp.asarray(d[k]))

        # GPS measurement noise seen by the filter: white + Gauss-Markov
        # stationary std (the GM error is colored but the loose filter
        # treats it as measurement noise — standard loose coupling).
        # Baro R is inflated by the baro-datum model error (non-standard
        # atmosphere scale, geoid drift over the leg).
        kw = {"sigma_gyro": _f(p["imu"], "sigma_gyro"),
              "rw_gyro": _f(p["imu"], "rw_gyro"),
              "sigma_accel": _f(p["imu"], "sigma_accel"),
              "rw_accel": _f(p["imu"], "rw_accel"),
              "sigma_mag": max(_f(p["mag"], "sigma"), 1e-9),
              "B_n": p["mag"]["B_n"],
              "sigma_gps_pos": max(math.hypot(_f(p["gps"], "sigma_pos"),
                                              _f(p["gps"], "gm_sigma")),
                                   1e-3),
              "sigma_gps_vel": max(_f(p["gps"], "sigma_vel"), 1e-3),
              "sigma_baro": max(_f(p["baro"], "sigma"), 1e-3) + 1.0}
        kw.update(filter_kw or {})
        self.filter = InsGps(dt=dt, **kw)
        self._mon_init, self._mon_update = innovation_monitor(
            gps_gate, window=monitor_window, min_hits=monitor_min_hits)
        self._bmon_init, self._bmon_update = innovation_monitor(
            baro_gate, window=monitor_window, min_hits=monitor_min_hits)

    # ------------------------------------------------------------- protocol

    def init_u(self):
        return {"inner": self.inner.init_u(),
                "sens": {"seed": jnp.asarray(0, jnp.int32),
                         "params": self._params},
                "origin": {"lat0": jnp.asarray(0.0), "lon0": jnp.asarray(0.0),
                           "h0": jnp.asarray(0.0),
                           "baro_datum": jnp.asarray(0.0)},
                "fault": no_fault()}

    def init_s(self):
        return {"inner": self.inner.init_s(),
                "sens": self.suite.init_s(),
                "nav": self.filter.init(),
                "hold": {"gps_p": jnp.zeros(3), "gps_v": jnp.zeros(3),
                         "h_baro": jnp.asarray(0.0)},
                "nis": {"gps": jnp.asarray(0.0), "baro": jnp.asarray(0.0)},
                "mon_gps": self._mon_init(), "mon_baro": self._bmon_init()}

    def assign(self, u_systems, av_y):
        return self.inner.assign(u_systems, av_y["inner"])

    def output(self, s, u, veh_y):
        """Aircraft.f_ode avionics output (what `Simulation.run` logs):
        the inner laws' carried commands plus the carried navigation
        solution and latched FDI alarms."""
        st = s["nav"]
        return {"inner": self.inner.output(s["inner"], u["inner"], veh_y),
                "nav": {"q_nb": st.q_nb, "b_g": st.b_g,
                        "p_n": st.p_n, "v_n": st.v_n, "b_a": st.b_a,
                        "h_est": u["origin"]["h0"] - st.p_n[2],
                        "nis_gps": s["nis"]["gps"],
                        "nis_baro": s["nis"]["baro"],
                        "gps_alarm": s["mon_gps"]["alarm"],
                        "baro_alarm": s["mon_baro"]["alarm"]}}

    # ----------------------------------------------------------- fault stage

    def _apply_faults(self, fault, hold, n, p_gps, v_gps, gps_new, h_baro):
        """In-loop fault injection on the NED-converted GPS solution and
        the baro channel, with `sensors.inject_fault` semantics. Hold
        registers capture the epoch-k0 values for freeze (register
        updates while n <= k0, matching the post-hoc injector exactly)."""
        ch, mode = fault["channel"], fault["mode"]
        active = (n >= fault["k0"])
        in_win = active & (n < fault["k1"])
        take = n <= fault["k0"]

        hold_gp = jnp.where(take, p_gps, hold["gps_p"])
        hold_gv = jnp.where(take, v_gps, hold["gps_v"])
        hold_hb = jnp.where(take, h_baro, hold["h_baro"])

        def faulted(z, held, channel_on):
            frz = channel_on & active & (mode == MODE_FREEZE)
            bia = channel_on & active & (mode == MODE_BIAS)
            drp = channel_on & in_win & (mode == MODE_DROPOUT)
            z = jnp.where(frz, held, z)
            z = jnp.where(bia, z + fault["delta"], z)
            return jnp.where(drp, jnp.zeros_like(z), z)

        gps_on = ch == FAULT_GPS
        baro_on = ch == FAULT_BARO
        p_f = faulted(p_gps, hold_gp, gps_on)
        v_f = faulted(v_gps, hold_gv, gps_on)
        h_f = faulted(h_baro, hold_hb, baro_on)
        # a dropped-out GPS stops producing solutions entirely
        gps_new = gps_new & ~(gps_on & in_win & (mode == MODE_DROPOUT))
        return ({"gps_p": hold_gp, "gps_v": hold_gv, "h_baro": hold_hb},
                p_f, v_f, gps_new, h_f)

    # ------------------------------------------------------------- main pass

    def f_periodic(self, s, u, veh_y, dt, h_trn=0.0):
        kin, air, dyn = veh_y.kinematics, veh_y.airflow, veh_y.dynamics
        org = u["origin"]

        # 1. sensors: advance error processes, measure this epoch
        _, s_sens = self.suite.f_step(None, u["sens"], s["sens"], 0.0)
        z = self.suite.measure(u["sens"], s_sens, kin, air, dyn, h_trn=h_trn)

        # 2. GPS geodetic -> filter NED; faults on GPS/baro channels
        p_gps = ned_from_geodetic(z.gps_lat, z.gps_lon, z.gps_h,
                                  org["lat0"], org["lon0"], org["h0"])
        hold, p_gps, v_gps, gps_new, h_baro = self._apply_faults(
            u["fault"], s["hold"], s_sens["n"], p_gps, z.gps_v_n,
            z.gps_new, z.h_baro)
        z = z._replace(gps_v_n=v_gps, gps_new=gps_new, h_baro=h_baro)

        # 3. fused INS/GPS error-state EKF: predict on the IMU epoch, then
        # monitored GPS / baro updates (reject-and-coast FDI) + mag heading
        st = self.filter.predict(s["nav"], z.omega_b, z.f_b)

        def gps_block(op):
            st, mon, p_g, v_g, new = op
            y_gps = p_g - st.p_n
            S_gps = st.P[6:9, 6:9] + self.filter.R_pos_eff(st.P.dtype)
            nis_gps = nis(y_gps, S_gps)
            mon2, alarm = self._mon_update(mon, nis_gps, valid=new)
            st2 = self.filter.update_gps(st, p_g, v_g,
                                         valid=new & ~alarm)
            return st2, mon2, alarm, nis_gps

        from flightjax.core.modeling import match_vma

        gates = _epoch_gates.get() or {}

        def gated(gate, block, skip, operand):
            """Fleet-level scalar lax.cond around an aiding block (the
            gear-gate pattern): inside vmap a per-lane mask runs both
            sides; the scalar cond genuinely skips. match_vma keeps the
            branch types legal under shard_map."""
            if gate is None:
                return block(operand)
            return jax.lax.cond(
                gate,
                lambda op: match_vma(block(op), op),
                lambda op: match_vma(skip(op), op),
                operand)

        def mon_skip(op):
            st, mon, *_ = op
            return st, mon, mon["alarm"], jnp.zeros((), st.P.dtype)

        st, mon_gps, gps_alarm, nis_gps = gated(
            gates.get("gps"), gps_block, mon_skip,
            (st, s["mon_gps"], p_gps, v_gps, gps_new))

        # baro aiding on baro_every epochs (monitored, reject-and-coast)
        baro_new = (s_sens["n"] % self.baro_every) == 0
        h_meas = h_baro - org["baro_datum"]      # ~ ellipsoidal altitude

        def baro_block(op):
            st, mon, h_m, new = op
            y_b = h_m - org["h0"] + st.p_n[2]
            S_b = st.P[8, 8] + self.filter.R_baro[0, 0].astype(st.P.dtype)
            nis_b = y_b * y_b / S_b
            mon2, alarm = self._bmon_update(mon, nis_b, valid=new)
            upd = self.filter.update_baro(st, h_m, org["h0"])
            return masked_update(new & ~alarm, upd, st), mon2, alarm, nis_b

        st, mon_baro, baro_alarm, nis_baro = gated(
            gates.get("baro"), baro_block, mon_skip,
            (st, s["mon_baro"], h_meas, baro_new))

        # mag (heading) aiding on mag_every epochs
        mag_new = (s_sens["n"] % self.mag_every) == 0

        def mag_block(op):
            st, m, new = op
            return (masked_update(new, self.filter.update_mag(st, m), st),)

        (st,) = gated(gates.get("mag"), mag_block, lambda op: (op[0],),
                      (st, z.mag_b, mag_new))
        q_est = st.q_nb

        # 4. estimated VehicleY for the inner avionics
        TAS_est, EAS_est = estimate_airspeed(z)
        omega_ie_n = geo.omega_ie * jnp.stack([
            jnp.cos(org["lat0"]), jnp.zeros_like(org["lat0"]),
            -jnp.sin(org["lat0"])], axis=-1)
        omega_est = (z.omega_b - st.b_g
                     - qrot_inv(q_est, omega_ie_n.astype(q_est.dtype)))
        h_est = org["h0"] - st.p_n[2]
        v_n = st.v_n
        chi_est = jnp.arctan2(v_n[..., 1], v_n[..., 0])
        gamma_est = jnp.arctan2(
            -v_n[..., 2], jnp.hypot(v_n[..., 0], v_n[..., 1]) + 1e-9)
        # geographic position from the filter NED solution (the inverse
        # of ned_from_geodetic's linearization) — guidance laws consume
        # n_e/lat/lon/h_e, so a guided aircraft navigates on ITS OWN fix
        n0 = geo.nvector_from_latlon(org["lat0"], org["lon0"])
        M, N = geo.radii(n0)
        lat_est = org["lat0"] + st.p_n[0] / (M + org["h0"])
        lon_est = org["lon0"] + st.p_n[1] / ((N + org["h0"])
                                             * jnp.cos(org["lat0"]))
        kin_est = kin._replace(
            q_nb=q_est, e_nb=quat_to_euler(q_est),
            omega_eb_b=omega_est, omega_wb_b=omega_est,
            v_eb_n=v_n, h_e=h_est, chi_gnd=chi_est, gamma_gnd=gamma_est,
            lat=lat_est, lon=lon_est,
            n_e=geo.nvector_from_latlon(lat_est, lon_est))
        air_est = air._replace(EAS=EAS_est, TAS=TAS_est, CAS=z.CAS,
                               p=z.p_s, T=z.T_oat)
        y_est = veh_y._replace(kinematics=kin_est, airflow=air_est)

        # 6. inner avionics on the selected source
        s_in, y_in = self.inner.f_periodic(
            s["inner"], u["inner"], y_est if self.use_estimates else veh_y,
            dt)

        nav_y = NavY(q_nb=q_est, b_g=st.b_g, p_n=st.p_n, v_n=st.v_n,
                     b_a=st.b_a, h_est=h_est, EAS_est=EAS_est,
                     nis_gps=nis_gps, nis_baro=nis_baro,
                     gps_alarm=gps_alarm, baro_alarm=baro_alarm, z=z)
        s_new = {"inner": s_in, "sens": s_sens, "nav": st,
                 "hold": hold,
                 "nis": {"gps": jnp.where(gps_new, nis_gps, s["nis"]["gps"]),
                         "baro": jnp.where(baro_new, nis_baro,
                                           s["nis"]["baro"])},
                 "mon_gps": mon_gps, "mon_baro": mon_baro}
        return s_new, {"inner": y_in, "nav": nav_y}

    def epoch_preds(self, s_av):
        """Fleet-level scalar predicates for `Simulation.fleet_step`:
        per aiding channel, does ANY lane have an epoch on this step's
        firing? Conservative — when True the full monitored block runs
        with its per-lane masks; when False every lane's epoch flag is
        False and the block is skipped exactly. Channels with every==1
        are omitted (their gate would never skip). Returns None when
        nothing is gateable."""
        n1 = s_av["sens"]["n"] + 1
        preds = {}
        for name, every in (("gps", self.suite.gps_every),
                            ("baro", self.baro_every),
                            ("mag", self.mag_every)):
            if every > 1:
                preds[name] = jnp.any(n1 % every == 0)
        return preds or None

    # ----------------------------------------------------------------- init

    def init_from_trim(self, veh_y, dt, seed=0, init_key=None):
        """Trim-aligned startup: inner avionics bumpless start (on truth —
        at alignment the estimates ARE truth), filter origin at the trim
        fix, filter fine-aligned to the trim attitude/velocity, baro
        datum captured from the trim static pressure. With `init_key`,
        sensor turn-on biases / GM states draw at their catalog stds
        (Monte Carlo lanes); without, they start at zero."""
        assert abs(float(dt) - self.dt) < 1e-12, \
            f"NavAvionics(dt={self.dt}) vs periodic dt {dt}"
        u_in, s_in = self.inner.init_from_trim(veh_y, dt)
        u = self.init_u()
        s = self.init_s()
        u["inner"], s["inner"] = u_in, s_in
        u["sens"]["seed"] = jnp.asarray(seed, jnp.int32)

        kin, air = veh_y.kinematics, veh_y.airflow
        p = self._params
        datum = (pressure_altitude(air.p)
                 - pressure_altitude(p["baro"]["qnh"]) - kin.h_e)
        u["origin"] = {"lat0": kin.lat, "lon0": kin.lon, "h0": kin.h_e,
                       "baro_datum": datum}
        s["sens"] = self.suite.init_s(u["sens"], init_key=init_key)
        s["nav"] = self.filter.init(
            q_nb=kin.q_nb, v_n=kin.v_eb_n,
            bg_std=float(jnp.asarray(p["imu"]["bias0_gyro"])) + 1e-4,
            ba_std=float(jnp.asarray(p["imu"]["bias0_accel"])) + 1e-3)
        return u, s
