"""C172X gain-scheduled multimode control laws (100% discrete).

Mirrors `/root/reference/lib/FlightApps/src/c172/c172x/control/c172x_ctl.jl`:
- longitudinal modes direct/sas/thr_q/thr_theta/thr_EAS/EAS_q/EAS_theta/
  EAS_clm/EAS_alt composed as a cascade of PIDs over inner LQR trackers
  (`c172x_ctl.jl:29-39, 286-446`)
- lateral modes direct/sas/p_beta/phi_beta/chi_beta (`:733-983`)
- ground override to direct (`:313-314`), altitude acquire/hold state
  machine with hysteresis (`:316-325`)
- anti-windup chaining: the inner LQR's output saturation (previous firing)
  feeds the upstream PIDs' external saturation inputs (`:332-341`)
- bumpless mode transitions: on mode change, integrators re-seed from the
  current commands (`:338-374`)
- gains interpolated from (EAS, h) schedules (`:203-220`)

The reference's imperative if/else mode logic becomes masked selects: every
sub-controller computes each firing; its state advances only when its
branch is enabled, and re-seeds when the active mode just changed.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flightjax.core.modeling import tree_where
from flightjax.ops.attitude import wrap_to_pi
from flightjax.physics import control as C
from flightjax.physics.aircraftbase import VehicleY

# longitudinal modes (`c172x_ctl.jl:29-39`)
LON_DIRECT, LON_SAS, LON_THR_Q, LON_THR_THETA, LON_THR_EAS, LON_EAS_Q, \
    LON_EAS_THETA, LON_EAS_CLM, LON_EAS_ALT = range(9)
# lateral modes (`:733-739`)
LAT_DIRECT, LAT_SAS, LAT_P_BETA, LAT_PHI_BETA, LAT_CHI_BETA = range(5)

ALT_ACQUIRE, ALT_HOLD = 0, 1


def _isin(mode, modes):
    out = jnp.zeros_like(mode, dtype=bool)
    for m in modes:
        out = jnp.logical_or(out, mode == m)
    return out


def _pid_params(g, bound_lo=-C.INF, bound_hi=C.INF):
    return C.pid_params(k_p=g["k_p"], k_i=g["k_i"], k_d=g["k_d"],
                        tau_f=g["tau_f"], bound_lo=bound_lo, bound_hi=bound_hi)


def _lqr_params(g, lo, hi):
    return C.LQRParams(K_fbk=g["K_fbk"], K_fwd=g["K_fwd"], K_int=g["K_int"],
                       x_trim=g["x_trim"], u_trim=g["u_trim"],
                       z_trim=g["z_trim"], bound_lo=jnp.asarray(lo),
                       bound_hi=jnp.asarray(hi))


def _pid_reset(s_pid, seed, k_i):
    """f_init! + conditional x_i0 seed (`c172x_ctl.jl:338-341`)."""
    x_i0 = jnp.where(k_i != 0, seed, 0.0)
    return C.PIDState(x_i0=x_i0, x_d0=jnp.zeros_like(s_pid.x_d0),
                      sat_out_0=jnp.zeros_like(s_pid.sat_out_0))


def flaps_schedule(EAS):
    return jnp.clip(1.0 - (EAS - 30.0) / 5.0, 0.0, 1.0)


# ----------------------------------------------------------- vehicle feature
# extraction (XLonRed/XLonFull/XLatRed, `c172x_ctl.jl:84-151, 760-790`)

def x_lon_red(y: VehicleY):
    act = y.systems.act["pos"]
    return jnp.stack([
        y.kinematics.omega_eb_b[1], y.kinematics.e_nb[1], y.airflow.EAS,
        y.systems.aero.alpha, y.systems.aero.alpha_filt,
        y.systems.pwp.engine.n, act["throttle"], act["elevator"]])


def x_lon_full(y: VehicleY):
    act = y.systems.act["pos"]
    return jnp.stack([
        y.kinematics.omega_eb_b[1], y.kinematics.e_nb[1], y.airflow.EAS,
        y.systems.aero.alpha, y.kinematics.h_e, y.systems.aero.alpha_filt,
        y.systems.pwp.engine.n, act["throttle"], act["elevator"]])


def x_lat_red(y: VehicleY):
    act = y.systems.act["pos"]
    return jnp.stack([
        y.kinematics.omega_eb_b[0], y.kinematics.omega_eb_b[2],
        y.kinematics.e_nb[2], y.airflow.EAS, y.systems.aero.beta,
        y.systems.aero.beta_filt, act["aileron"], act["rudder"]])


def is_on_gnd(y: VehicleY):
    return jnp.any(y.systems.ldg.strut.wow)


class LonY(NamedTuple):
    mode: jnp.ndarray
    throttle_ref: jnp.ndarray
    elevator_ref: jnp.ndarray
    q_ref: jnp.ndarray
    theta_ref: jnp.ndarray
    EAS_ref: jnp.ndarray
    clm_ref: jnp.ndarray
    h_ref: jnp.ndarray
    h_state: jnp.ndarray
    throttle_cmd: jnp.ndarray
    elevator_cmd: jnp.ndarray


class LatY(NamedTuple):
    mode: jnp.ndarray
    aileron_ref: jnp.ndarray
    rudder_ref: jnp.ndarray
    p_ref: jnp.ndarray
    beta_ref: jnp.ndarray
    phi_ref: jnp.ndarray
    chi_ref: jnp.ndarray
    aileron_cmd: jnp.ndarray
    rudder_cmd: jnp.ndarray


class CtlY(NamedTuple):
    lon: LonY
    lat: LatY


class ControlLaws:
    """Avionics component for the Aircraft protocol: lon + lat cascades
    (`c172x_ctl.jl:1213-1250`)."""

    K_P_THETA = 1.0   # theta -> q proportional gain (`:216`)
    H_THR = 10.0      # altitude tracking mode switch threshold (`:217`)
    H_HYS = 1.0       # and its hysteresis (`:218`)

    def __init__(self, gains=None):
        if gains is None:
            from flightjax.models.c172.c172x_design import load_gains
            gains = load_gains()
        self.gains = gains

    # -------------------------------------------------------------- inputs

    def init_u(self):
        return {
            "lon": {
                "mode_req": jnp.asarray(LON_DIRECT, dtype=jnp.int32),
                "throttle_axis": jnp.asarray(0.0),
                "throttle_offset": jnp.asarray(0.0),
                "elevator_axis": jnp.asarray(0.0),
                "elevator_offset": jnp.asarray(0.0),
                "q_ref": jnp.asarray(0.0),
                "theta_ref": jnp.asarray(0.0),
                "EAS_ref": jnp.asarray(50.0),
                "clm_ref": jnp.asarray(0.0),
                "h_ref": jnp.asarray(0.0),
            },
            "lat": {
                "mode_req": jnp.asarray(LAT_DIRECT, dtype=jnp.int32),
                "aileron_axis": jnp.asarray(0.0),
                "aileron_offset": jnp.asarray(0.0),
                "rudder_axis": jnp.asarray(0.0),
                "rudder_offset": jnp.asarray(0.0),
                "p_ref": jnp.asarray(0.0),
                "beta_ref": jnp.asarray(0.0),
                "phi_ref": jnp.asarray(0.0),
                "chi_ref": jnp.asarray(0.0),
            },
        }

    def init_s(self):
        return {
            "lon": {
                "mode_prev": jnp.asarray(LON_DIRECT, dtype=jnp.int32),
                "h_state": jnp.asarray(ALT_HOLD, dtype=jnp.int32),
                "te2te": C.lqr_state(2), "tv2te": C.lqr_state(2),
                "vh2te": C.lqr_state(2),
                "q2e_int": C.integrator_state(),
                "q2e_pid": C.pid_state(), "c2theta_pid": C.pid_state(),
                "v2t_pid": C.pid_state(),
                # previous firing's commands / z_refs for bumpless seeds
                "prev_throttle_cmd": jnp.asarray(0.0),
                "prev_te_zref_ele": jnp.asarray(0.0),
                "out": {"throttle_cmd": jnp.asarray(0.0),
                        "elevator_cmd": jnp.asarray(0.0)},
            },
            "lat": {
                "mode_prev": jnp.asarray(LAT_DIRECT, dtype=jnp.int32),
                "ar2ar": C.lqr_state(2), "pb2ar": C.lqr_state(2),
                "p2phi_int": C.integrator_state(),
                "p2phi_pid": C.pid_state(), "chi2phi_pid": C.pid_state(),
                "prev_pb_zref_phi": jnp.asarray(0.0),
                "out": {"aileron_cmd": jnp.asarray(0.0),
                        "rudder_cmd": jnp.asarray(0.0)},
            },
        }

    # ------------------------------------------------------------ lon pass

    def lon_step(self, s, u, y: VehicleY, dt):
        """(`c172x_ctl.jl:286-446`)"""
        g = self.gains
        EAS = y.airflow.EAS
        h_e = y.kinematics.h_e
        q = y.kinematics.omega_wb_b[1]
        r = y.kinematics.omega_wb_b[2]
        theta = y.kinematics.e_nb[1]
        phi = y.kinematics.e_nb[2]
        clm = -y.kinematics.v_eb_n[2]
        h_err = u["h_ref"] - h_e
        mode_prev = s["mode_prev"]

        sched = lambda ch: C.schedule(g[ch], EAS, h_e)

        throttle_ref = jnp.clip(u["throttle_axis"], 0, 1) + u["throttle_offset"]
        throttle_ref = jnp.clip(throttle_ref, 0.0, 1.0)
        elevator_ref = jnp.clip(
            jnp.clip(u["elevator_axis"], -1, 1) + u["elevator_offset"],
            -1.0, 1.0)

        # mode arbitration + altitude acquire/hold FSM (`:313-325`)
        h_state = s["h_state"]
        acquiring = h_state == ALT_ACQUIRE
        alt_req = u["mode_req"] == LON_EAS_ALT
        mode_air = jnp.where(
            alt_req, jnp.where(acquiring, LON_THR_EAS, LON_EAS_ALT),
            u["mode_req"]).astype(jnp.int32)
        throttle_ref = jnp.where(
            jnp.logical_and(alt_req, acquiring),
            jnp.where(h_err > 0, 1.0, 0.0), throttle_ref)
        h_state_new = jnp.where(
            alt_req,
            jnp.where(acquiring,
                      jnp.where(jnp.abs(h_err) < self.H_THR - self.H_HYS,
                                ALT_HOLD, ALT_ACQUIRE),
                      jnp.where(jnp.abs(h_err) > self.H_THR + self.H_HYS,
                                ALT_ACQUIRE, ALT_HOLD)),
            h_state).astype(jnp.int32)
        mode = jnp.where(is_on_gnd(y), LON_DIRECT, mode_air).astype(jnp.int32)
        changed = mode != mode_prev

        te2te_on = _isin(mode, (LON_SAS, LON_THR_Q, LON_THR_THETA, LON_EAS_Q,
                                LON_EAS_THETA, LON_EAS_CLM))
        q2e_on = _isin(mode, (LON_THR_Q, LON_THR_THETA, LON_EAS_Q,
                              LON_EAS_THETA, LON_EAS_CLM))
        t2q_on = _isin(mode, (LON_THR_THETA, LON_EAS_THETA, LON_EAS_CLM))
        v2t_on = _isin(mode, (LON_EAS_Q, LON_EAS_THETA, LON_EAS_CLM))
        c2t_on = mode == LON_EAS_CLM
        tv2te_on = mode == LON_THR_EAS
        vh2te_on = mode == LON_EAS_ALT

        # previous te2te saturation feeds the upstream compensators (`:332`)
        sat_thr = s["te2te"].out_sat_0[0]
        sat_ele = s["te2te"].out_sat_0[1]

        # ---- v2t: EAS -> throttle_ref (`:334-350`)
        pv = _pid_params(sched("v2t"))
        s_v2t = tree_where(
            jnp.logical_and(changed, v2t_on),
            _pid_reset(s["v2t_pid"], s["prev_throttle_cmd"], pv.k_i),
            s["v2t_pid"])
        s_v2t_new, v2t_out = C.pid_step(pv, s_v2t, u["EAS_ref"] - EAS, dt,
                                        sat_ext=sat_thr)
        s_v2t_final = tree_where(v2t_on, s_v2t_new, s["v2t_pid"])
        throttle_ref = jnp.where(v2t_on, v2t_out.output, throttle_ref)

        # ---- c2theta: climb rate -> theta_ref (`:364-380`)
        pc = _pid_params(sched("c2theta"))
        s_c2t = tree_where(
            jnp.logical_and(changed, c2t_on),
            _pid_reset(s["c2theta_pid"], theta, pc.k_i), s["c2theta_pid"])
        s_c2t_new, c2t_out = C.pid_step(pc, s_c2t, u["clm_ref"] - clm, dt,
                                        sat_ext=sat_ele)
        s_c2t_final = tree_where(c2t_on, s_c2t_new, s["c2theta_pid"])
        theta_ref = jnp.where(c2t_on, c2t_out.output, u["theta_ref"])

        # ---- theta2q with bank compensation (`:382-385`)
        theta_dot_ref = self.K_P_THETA * (theta_ref - theta)
        phi_bnd = jnp.clip(phi, -jnp.pi / 3, jnp.pi / 3)
        q_ref_t2q = theta_dot_ref / jnp.cos(phi_bnd) + r * jnp.tan(phi_bnd)
        q_ref = jnp.where(t2q_on, q_ref_t2q, u["q_ref"])

        # ---- q2e: pitch rate -> elevator_ref (`:352-397`)
        pq = _pid_params(sched("q2e"))
        q2e_changed = jnp.logical_and(changed, q2e_on)
        s_q2e_int = tree_where(
            q2e_changed,
            C.IntegratorState(x0=jnp.asarray(0.0),
                              sat_out_0=jnp.asarray(0, dtype=jnp.int32)),
            s["q2e_int"])
        s_q2e_pid = tree_where(
            q2e_changed,
            _pid_reset(s["q2e_pid"], s["prev_te_zref_ele"], pq.k_i),
            s["q2e_pid"])

        s_int_new, int_out = C.integrator_step(s_q2e_int, q_ref - q, dt,
                                               sat_ext=sat_ele)
        s_pid_new, q2e_out = C.pid_step(pq, s_q2e_pid, int_out.output, dt,
                                        sat_ext=sat_ele)
        s_int_final = tree_where(q2e_on, s_int_new, s["q2e_int"])
        s_pid_final = tree_where(q2e_on, s_pid_new, s["q2e_pid"])
        elevator_ref = jnp.where(q2e_on, q2e_out.output, elevator_ref)

        # ---- te2te SAS LQR (`:399-410`): purely proportional, no reset
        p_te = _lqr_params(sched("te2te"), [0.0, -1.0], [1.0, 1.0])
        x_red = x_lon_red(y)
        z_te = jnp.stack([y.systems.act["cmd"]["throttle"],
                          y.systems.act["cmd"]["elevator"]])
        z_ref_te = jnp.stack([throttle_ref, elevator_ref])
        s_te_new, te_out = C.lqr_step(p_te, s["te2te"], x_red, z_te, z_ref_te,
                                      dt)
        s_te_final = tree_where(te2te_on, s_te_new, s["te2te"])
        throttle_cmd = jnp.where(te2te_on, te_out.output[0], throttle_ref)
        elevator_cmd = jnp.where(te2te_on, te_out.output[1], elevator_ref)

        # ---- tv2te: throttle + EAS tracker (`:412-424`)
        p_tv = _lqr_params(sched("tv2te"), [0.0, -1.0], [1.0, 1.0])
        s_tv = tree_where(jnp.logical_and(changed, tv2te_on),
                          C.lqr_state(2), s["tv2te"])
        z_tv = jnp.stack([y.systems.act["cmd"]["throttle"], EAS])
        z_ref_tv = jnp.stack([throttle_ref, u["EAS_ref"]])
        s_tv_new, tv_out = C.lqr_step(p_tv, s_tv, x_red, z_tv, z_ref_tv, dt)
        s_tv_final = tree_where(tv2te_on, s_tv_new, s["tv2te"])
        throttle_cmd = jnp.where(tv2te_on, tv_out.output[0], throttle_cmd)
        elevator_cmd = jnp.where(tv2te_on, tv_out.output[1], elevator_cmd)

        # ---- vh2te: EAS + altitude tracker (`:426-438`)
        p_vh = _lqr_params(sched("vh2te"), [0.0, -1.0], [1.0, 1.0])
        s_vh = tree_where(jnp.logical_and(changed, vh2te_on),
                          C.lqr_state(2), s["vh2te"])
        z_vh = jnp.stack([EAS, h_e])
        z_ref_vh = jnp.stack([u["EAS_ref"], u["h_ref"]])
        s_vh_new, vh_out = C.lqr_step(p_vh, s_vh, x_lon_full(y), z_vh,
                                      z_ref_vh, dt)
        s_vh_final = tree_where(vh2te_on, s_vh_new, s["vh2te"])
        throttle_cmd = jnp.where(vh2te_on, vh_out.output[0], throttle_cmd)
        elevator_cmd = jnp.where(vh2te_on, vh_out.output[1], elevator_cmd)

        s_new = {
            "mode_prev": mode, "h_state": h_state_new,
            "te2te": s_te_final, "tv2te": s_tv_final, "vh2te": s_vh_final,
            "q2e_int": s_int_final, "q2e_pid": s_pid_final,
            "c2theta_pid": s_c2t_final, "v2t_pid": s_v2t_final,
            "prev_throttle_cmd": throttle_cmd,
            "prev_te_zref_ele": elevator_ref,
            "out": {"throttle_cmd": throttle_cmd,
                    "elevator_cmd": elevator_cmd},
        }
        y_out = LonY(mode=mode, throttle_ref=throttle_ref,
                     elevator_ref=elevator_ref, q_ref=q_ref,
                     theta_ref=theta_ref, EAS_ref=u["EAS_ref"],
                     clm_ref=u["clm_ref"], h_ref=u["h_ref"],
                     h_state=h_state_new, throttle_cmd=throttle_cmd,
                     elevator_cmd=elevator_cmd)
        return s_new, y_out

    # ------------------------------------------------------------ lat pass

    def lat_step(self, s, u, y: VehicleY, dt):
        """(`c172x_ctl.jl:880-983`)"""
        g = self.gains
        EAS = y.airflow.EAS
        h_e = y.kinematics.h_e
        p = y.kinematics.omega_wb_b[0]
        chi = y.kinematics.chi_gnd
        mode_prev = s["mode_prev"]

        sched = lambda ch: C.schedule(g[ch], EAS, h_e)

        mode = jnp.where(is_on_gnd(y), LAT_DIRECT,
                         u["mode_req"]).astype(jnp.int32)
        changed = mode != mode_prev

        ar2ar_on = mode == LAT_SAS
        pb2ar_on = _isin(mode, (LAT_P_BETA, LAT_PHI_BETA, LAT_CHI_BETA))
        p2phi_on = mode == LAT_P_BETA
        chi2phi_on = mode == LAT_CHI_BETA

        aileron_ref = jnp.clip(
            jnp.clip(u["aileron_axis"], -1, 1) + u["aileron_offset"], -1, 1)
        rudder_ref = jnp.clip(
            jnp.clip(u["rudder_axis"], -1, 1) + u["rudder_offset"], -1, 1)

        sat_ail = s["pb2ar"].out_sat_0[0]

        # ---- p2phi: roll rate -> phi_ref (`:912-933`)
        pp = _pid_params(sched("p2phi"))
        s_p2phi_int = tree_where(
            jnp.logical_and(changed, p2phi_on),
            C.IntegratorState(x0=jnp.asarray(0.0),
                              sat_out_0=jnp.asarray(0, dtype=jnp.int32)),
            s["p2phi_int"])
        s_p2phi_pid = tree_where(
            jnp.logical_and(changed, p2phi_on),
            _pid_reset(s["p2phi_pid"], s["prev_pb_zref_phi"], pp.k_i),
            s["p2phi_pid"])
        s_pint_new, pint_out = C.integrator_step(s_p2phi_int, u["p_ref"] - p,
                                                 dt, sat_ext=sat_ail)
        s_ppid_new, p2phi_out = C.pid_step(pp, s_p2phi_pid, pint_out.output,
                                           dt, sat_ext=sat_ail)
        s_pint_final = tree_where(p2phi_on, s_pint_new, s["p2phi_int"])
        s_ppid_final = tree_where(p2phi_on, s_ppid_new, s["p2phi_pid"])

        # ---- chi2phi: course angle -> phi_ref, error wrapped (`:935-955`)
        pc = _pid_params(sched("chi2phi"), bound_lo=-jnp.pi / 4,
                         bound_hi=jnp.pi / 4)
        s_chi2phi = tree_where(
            jnp.logical_and(changed, chi2phi_on),
            _pid_reset(s["chi2phi_pid"], s["prev_pb_zref_phi"], pc.k_i),
            s["chi2phi_pid"])
        s_cpid_new, chi2phi_out = C.pid_step(
            pc, s_chi2phi, wrap_to_pi(u["chi_ref"] - chi), dt,
            sat_ext=sat_ail)
        s_cpid_final = tree_where(chi2phi_on, s_cpid_new, s["chi2phi_pid"])

        phi_ref = jnp.where(p2phi_on, p2phi_out.output,
                            jnp.where(chi2phi_on, chi2phi_out.output,
                                      u["phi_ref"]))

        x_lat = x_lat_red(y)

        # ---- ar2ar SAS (`:896-907`): no reset needed
        p_ar = _lqr_params(sched("ar2ar"), [-1.0, -1.0], [1.0, 1.0])
        z_ar = jnp.stack([y.systems.act["cmd"]["aileron"],
                          y.systems.act["cmd"]["rudder"]])
        z_ref_ar = jnp.stack([aileron_ref, rudder_ref])
        s_ar_new, ar_out = C.lqr_step(p_ar, s["ar2ar"], x_lat, z_ar, z_ref_ar,
                                      dt)
        s_ar_final = tree_where(ar2ar_on, s_ar_new, s["ar2ar"])
        aileron_cmd = jnp.where(ar2ar_on, ar_out.output[0], aileron_ref)
        rudder_cmd = jnp.where(ar2ar_on, ar_out.output[1], rudder_ref)

        # ---- phibeta2ar tracker (`:957-970`)
        p_pb = _lqr_params(sched("phibeta2ar"), [-1.0, -1.0], [1.0, 1.0])
        s_pb = tree_where(jnp.logical_and(changed, pb2ar_on),
                          C.lqr_state(2), s["pb2ar"])
        z_pb = jnp.stack([y.kinematics.e_nb[2], y.systems.aero.beta])
        z_ref_pb = jnp.stack([phi_ref, u["beta_ref"]])
        s_pb_new, pb_out = C.lqr_step(p_pb, s_pb, x_lat, z_pb, z_ref_pb, dt)
        s_pb_final = tree_where(pb2ar_on, s_pb_new, s["pb2ar"])
        aileron_cmd = jnp.where(pb2ar_on, pb_out.output[0], aileron_cmd)
        rudder_cmd = jnp.where(pb2ar_on, pb_out.output[1], rudder_cmd)

        s_new = {
            "mode_prev": mode,
            "ar2ar": s_ar_final, "pb2ar": s_pb_final,
            "p2phi_int": s_pint_final, "p2phi_pid": s_ppid_final,
            "chi2phi_pid": s_cpid_final,
            "prev_pb_zref_phi": phi_ref,
            "out": {"aileron_cmd": aileron_cmd, "rudder_cmd": rudder_cmd},
        }
        y_out = LatY(mode=mode, aileron_ref=aileron_ref,
                     rudder_ref=rudder_ref, p_ref=u["p_ref"],
                     beta_ref=u["beta_ref"], phi_ref=phi_ref,
                     chi_ref=u["chi_ref"], aileron_cmd=aileron_cmd,
                     rudder_cmd=rudder_cmd)
        return s_new, y_out

    # -------------------------------------------------- avionics protocol

    def f_periodic(self, s, u, veh_y: VehicleY, dt):
        s_lon, y_lon = self.lon_step(s["lon"], u["lon"], veh_y, dt)
        s_lat, y_lat = self.lat_step(s["lat"], u["lat"], veh_y, dt)
        return {"lon": s_lon, "lat": s_lat}, CtlY(lon=y_lon, lat=y_lat)

    def assign(self, u_systems, av_y: CtlY):
        """Map commands onto the FBW actuation inputs
        (`c172x_ctl.jl:449-458, 986-995`)."""
        act = dict(u_systems["act"],
                   throttle=av_y.lon.throttle_cmd,
                   elevator=av_y.lon.elevator_cmd,
                   aileron=av_y.lat.aileron_cmd,
                   rudder=av_y.lat.rudder_cmd)
        return dict(u_systems, act=act)

    def output(self, s, u, veh_y):
        """Aircraft.f_ode avionics output: the carried commands."""
        return {"lon": s["lon"]["out"], "lat": s["lat"]["out"]}

    # -------------------------------------------------------------- init

    def init_from_trim(self, veh_y: VehicleY, dt):
        """Bumpless startup (`c172x_ctl.jl:463-519, 998-1032`): seed inputs
        from the trim condition and run each SAS mode once so the LQR/PID
        outputs match the trim actuator commands before the first firing."""
        u = self.init_u()
        s = self.init_s()

        act_pos = veh_y.systems.act["pos"]
        kin = veh_y.kinematics
        u["lon"].update(
            throttle_axis=act_pos["throttle"], elevator_axis=act_pos["elevator"],
            q_ref=kin.omega_wb_b[1], theta_ref=kin.e_nb[1],
            EAS_ref=veh_y.airflow.EAS, clm_ref=-kin.v_eb_n[2],
            h_ref=kin.h_e)
        u["lat"].update(
            aileron_axis=act_pos["aileron"], rudder_axis=act_pos["rudder"],
            p_ref=kin.omega_wb_b[0], phi_ref=kin.e_nb[2],
            beta_ref=veh_y.systems.aero.beta, chi_ref=kin.chi_gnd)

        s["lon"]["prev_throttle_cmd"] = act_pos["throttle"]
        s["lon"]["prev_te_zref_ele"] = act_pos["elevator"]
        s["lat"]["prev_pb_zref_phi"] = kin.e_nb[2]

        for mode in (LON_SAS, LON_THR_EAS, LON_EAS_ALT, LON_DIRECT):
            u["lon"]["mode_req"] = jnp.asarray(mode, dtype=jnp.int32)
            s["lon"], _ = self.lon_step(s["lon"], u["lon"], veh_y, dt)
        for mode in (LAT_SAS, LAT_PHI_BETA, LAT_DIRECT):
            u["lat"]["mode_req"] = jnp.asarray(mode, dtype=jnp.int32)
            s["lat"], _ = self.lat_step(s["lat"], u["lat"], veh_y, dt)
        return u, s
