"""C172X control-law design pipeline: gain-scheduled LQR trackers + PID
cascades over the (EAS, h) envelope.

Replaces `design/c172/c172x_design.jl` + `design/pidopt.jl`:
- `get_design_model`: NED linearization + similarity transform replacing
  (v_x, v_y, v_z, omega_eng) states with (EAS, alpha, beta, n_eng)
  (`c172x_design.jl:27-82`)
- `design_lon`: te2te SAS (8-state LQR), q2e/v2t/c2theta PIDs optimized over
  closed-loop metrics, tv2te and vh2te integrator-augmented LQR trackers
  (`:136-540`)
- `design_lat`: ar2ar SAS, phibeta2ar tracker, p2phi/chi2phi PIDs
  (`:555-760`)
- `generate_lookups`: sweep the (EAS, h) envelope, stack the per-point gain
  sets into npz gain schedules (`:87-129`)

Host-side numpy/scipy design tooling; runtime only interpolates the tables.
"""

import os

import numpy as np
import scipy.linalg

from flightjax.physics.linearization import LinearizedSS
from flightjax.utils import lti
from flightjax.utils.pidopt import Metrics, PIDGains, optimize_pid

from flightjax.models.c172 import c172x, common as C172

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")
GAINS_PATH = os.path.normpath(os.path.join(DATA_DIR, "c172x_gains.npz"))

# state/command layouts shared with the runtime control laws
X_LON_FULL = ("q", "theta", "EAS", "alpha", "h", "alpha_filt", "n_eng",
              "thr_p", "ele_p")
X_LON_RED = ("q", "theta", "EAS", "alpha", "alpha_filt", "n_eng",
             "thr_p", "ele_p")
U_LON = ("throttle_cmd", "elevator_cmd")
X_LAT_RED = ("p", "r", "phi", "EAS", "beta", "beta_filt", "ail_p", "rud_p")
U_LAT = ("aileron_cmd", "rudder_cmd")


def flaps_schedule(EAS):
    """(`c172x_ctl.jl:19-25`)"""
    if EAS < 30:
        return 1.0
    if EAS > 35:
        return 0.0
    return 1.0 - (EAS - 30) / 5.0


def get_design_model(tp: C172.TrimParameters):
    """Linearize + similarity transform to aerodynamic states
    (`c172x_design.jl:27-82`). Returns a LinearizedSS over the transformed
    20-state vector."""
    lss, ts, rnorm = c172x.linearize_ned(tp)
    assert float(rnorm) < 1e-8, f"trim failed: {rnorm}"

    x_labels = list(lss.x_labels)
    xp_labels = list(x_labels)
    for old, new in zip(("v_x", "v_y", "v_z", "omega_eng"),
                        ("EAS", "alpha", "beta", "n_eng")):
        xp_labels[xp_labels.index(old)] = new

    yi = [list(lss.y_labels).index(l) for l in xp_labels]
    T = lss.C[yi, :]
    T_inv = np.linalg.inv(T)

    Ap = T @ lss.A @ T_inv
    Bp = T @ lss.B
    Cp = lss.C @ T_inv
    Dp = lss.D

    out = LinearizedSS(
        x0=lss.y0[yi], u0=lss.u0, y0=lss.y0,
        x_dot0=T @ lss.x_dot0, A=Ap, B=Bp, C=Cp, D=Dp,
        x_labels=xp_labels, u_labels=list(lss.u_labels),
        y_labels=list(lss.y_labels))
    return out


def _sub(lss: LinearizedSS, x, u, y):
    return lss.subsystem(x=list(x), u=list(u), y=list(y))


def _lqr(A, B, Q, R):
    P = scipy.linalg.solve_continuous_are(A, B, Q, R)
    return np.linalg.solve(R, B.T @ P)


def _ff_gain(A, B, C, D, K_fbk):
    """K_fwd = M_22 + K_fbk M_12 with M = inv([A B; C D])
    (`c172x_design.jl:190-196`)."""
    n_x = A.shape[0]
    L = np.block([[A, B], [C, D]])
    M = np.linalg.inv(L)
    M_12 = M[:n_x, n_x:]
    M_22 = M[n_x:, n_x:]
    return M_22 + K_fbk @ M_12


def _lqr_data(lss, z_labels, Q_diag, R_diag, xi_weights=None):
    """LQR tracker gain set. With xi_weights, design on the integrator-
    augmented plant (K_int extracted from the augmented gain)."""
    A, B = lss.A, lss.B
    zi = [list(lss.y_labels).index(z) for z in z_labels]
    C = lss.C[zi, :]
    D = lss.D[zi, :]
    n_x, n_u = B.shape
    n_z = len(z_labels)

    Q_x = np.diag([float(Q_diag.get(l, 0.0)) for l in lss.x_labels])
    R = np.diag([float(R_diag[l]) for l in lss.u_labels])

    if xi_weights is None:
        K_fbk = _lqr(A, B, Q_x, R)
        K_int = np.zeros((n_u, n_z))
    else:
        A_aug = np.block([[A, np.zeros((n_x, n_z))],
                          [C, np.zeros((n_z, n_z))]])
        B_aug = np.vstack([B, D])
        Q_aug = scipy.linalg.block_diag(Q_x, np.diag(xi_weights))
        K_aug = _lqr(A_aug, B_aug, Q_aug, R)
        K_fbk = K_aug[:, :n_x]
        K_int = K_aug[:, n_x:]

    K_fwd = _ff_gain(A, B, C, D, K_fbk)
    return dict(K_fbk=K_fbk, K_fwd=K_fwd, K_int=K_int,
                x_trim=np.asarray(lss.x0), u_trim=np.asarray(lss.u0),
                z_trim=np.asarray(lss.y0[zi]))


def _pid_data(g: PIDGains):
    return dict(k_p=g.k_p, k_i=g.k_i, k_d=g.k_d, tau_f=g.tau_f)


def design_lon(tp: C172.TrimParameters, lss=None):
    """All longitudinal gain sets at one design point
    (`c172x_design.jl:136-540`)."""
    if lss is None:
        lss = get_design_model(tp)
    y_lon = list(X_LON_FULL) + ["f_x", "f_z", "TAS", "gamma", "climb_rate",
                                "throttle_cmd", "elevator_cmd"]
    lss_lon = _sub(lss, X_LON_FULL, U_LON, y_lon)
    lss_red = lss_lon.delete_vars(x=("h",), y=("h",))

    # ----- te2te SAS (`:155-220`)
    data_te2te = _lqr_data(
        lss_red, ["throttle_cmd", "elevator_cmd"],
        {"q": 1, "theta": 20, "EAS": 0.02},
        {"throttle_cmd": 100, "elevator_cmd": 5})

    P_red = lti.ss(lss_red.A, lss_red.B, lss_red.C, lss_red.D)
    P_te2te = lti.state_feedback(P_red, data_te2te["K_fbk"],
                                 data_te2te["K_fwd"])
    ylab = lss_red.y_labels

    # ----- q2e PID on integrator * (elevator_cmd_ref -> q) (`:224-256`)
    P_e2q = lti.select(P_te2te, ylab.index("q"), 1)
    gains_q2e, m_q2e, _ = optimize_pid(
        lti.series(lti.integrator(), P_e2q),
        PIDGains(2.0, 15.0, 0.4, 0.01),
        PIDGains(0.1, 0.0, 0.0, 0.01), PIDGains(10.0, 50.0, 2.0, 0.01),
        Metrics(Ms=1, int_e=15, e_f=2, int_u=0.1, u_p=0.0), t_sim=10.0)
    C_q2e = lti.series(lti.integrator(), lti.pid_ss(*gains_q2e))
    P_tq = lti.close_siso(P_te2te, C_q2e, 1, ylab.index("q"))

    # ----- theta2q fixed P gain k_p = 1 (`:259-270`)
    C_t2q = lti.ss_gain(1.0)
    P_ttheta = lti.close_siso(P_tq, C_t2q, 1, ylab.index("theta"))

    # ----- v2t PID on (throttle_cmd_ref -> EAS) (`:273-300`)
    P_t2v = lti.select(P_ttheta, ylab.index("EAS"), 0)
    gains_v2t, m_v2t, _ = optimize_pid(
        P_t2v, PIDGains(0.2, 0.1, 0.0, 0.01),
        PIDGains(0.1, 0.0, 0.0, 0.01), PIDGains(1.5, 0.5, 0.0, 0.01),
        Metrics(Ms=2.0, int_e=5.0, e_f=1.0, int_u=0.0, u_p=0.0), t_sim=10.0)
    C_v2t = lti.pid_ss(*gains_v2t)
    P_vtheta = lti.close_siso(P_ttheta, C_v2t, 0, ylab.index("EAS"))

    # ----- c2theta PID on (theta_ref -> climb_rate) (`:303-325`)
    P_th2c = lti.select(P_vtheta, ylab.index("climb_rate"), 1)
    gains_c2t, m_c2t, _ = optimize_pid(
        P_th2c, PIDGains(0.02, 0.01, 0.0, 0.01),
        PIDGains(0.001, 0.001, 0.0, 0.01), PIDGains(0.05, 0.03, 0.0, 0.01),
        Metrics(Ms=2.0, int_e=5.0, e_f=1.0, int_u=0.0, u_p=0.1), t_sim=20.0)

    # ----- tv2te integrator-augmented tracker (`:330-425`)
    data_tv2te = _lqr_data(
        lss_red, ["throttle_cmd", "EAS"],
        {"q": 20, "theta": 0, "EAS": 0.3},
        {"throttle_cmd": 1, "elevator_cmd": 0.1},
        xi_weights=[0.1, 0.01])

    # ----- vh2te integrator-augmented tracker on the full model (`:429-540`)
    data_vh2te = _lqr_data(
        lss_lon, ["EAS", "h"],
        {"q": 20, "theta": 100, "EAS": 0.06, "h": 0.04},
        {"throttle_cmd": 0.1, "elevator_cmd": 0.05},
        xi_weights=[0.005, 0.001])

    return dict(te2te=data_te2te, q2e=_pid_data(gains_q2e),
                v2t=_pid_data(gains_v2t), c2theta=_pid_data(gains_c2t),
                tv2te=data_tv2te, vh2te=data_vh2te)


def pid_eval_plants(lss, pid_gains, lqr_te2te, lqr_pb2ar):
    """The SISO plant + horizon each PID channel is scored on, with every
    inner loop closed using `pid_gains` (dict channel -> PIDGains) and the
    LQR closures from `lqr_te2te`/`lqr_pb2ar` (K_fbk/K_fwd dicts).

    Mirrors the plant constructions inside `design_lon`/`design_lat` but
    takes the gains as inputs instead of optimizing them — used by the
    reference-parity response-metric anchor to score the repo's and the
    reference's PID stacks on the SAME linearized plant
    (`tests/test_reference_parity.py`). Returns {channel: (SS, t_sim)}."""
    out = {}
    # ----- longitudinal chain (same construction as design_lon)
    y_lon = list(X_LON_FULL) + ["f_x", "f_z", "TAS", "gamma", "climb_rate",
                                "throttle_cmd", "elevator_cmd"]
    lss_lon = _sub(lss, X_LON_FULL, U_LON, y_lon)
    lss_red = lss_lon.delete_vars(x=("h",), y=("h",))
    P_red = lti.ss(lss_red.A, lss_red.B, lss_red.C, lss_red.D)
    P_te2te = lti.state_feedback(P_red, lqr_te2te["K_fbk"],
                                 lqr_te2te["K_fwd"])
    ylab = lss_red.y_labels
    out["q2e"] = (lti.series(lti.integrator(),
                             lti.select(P_te2te, ylab.index("q"), 1)), 10.0)
    C_q2e = lti.series(lti.integrator(), lti.pid_ss(*pid_gains["q2e"]))
    P_tq = lti.close_siso(P_te2te, C_q2e, 1, ylab.index("q"))
    P_ttheta = lti.close_siso(P_tq, lti.ss_gain(1.0), 1, ylab.index("theta"))
    out["v2t"] = (lti.select(P_ttheta, ylab.index("EAS"), 0), 10.0)
    C_v2t = lti.pid_ss(*pid_gains["v2t"])
    P_vtheta = lti.close_siso(P_ttheta, C_v2t, 0, ylab.index("EAS"))
    out["c2theta"] = (lti.select(P_vtheta, ylab.index("climb_rate"), 1), 20.0)

    # ----- lateral chain (same construction as design_lat)
    x_lat = ("p", "r", "psi", "phi", "EAS", "beta", "beta_filt",
             "ail_p", "rud_p")
    y_lat = list(x_lat) + ["f_y", "chi", "aileron_cmd", "rudder_cmd"]
    lss_lat = _sub(lss, x_lat, U_LAT, y_lat)
    lss_red_lat = lss_lat.delete_vars(x=("psi",), y=("psi", "chi"))
    idx = [list(lss_lat.x_labels).index(l) for l in lss_red_lat.x_labels]
    K_fbk_full = np.zeros((2, len(lss_lat.x_labels)))
    K_fbk_full[:, idx] = lqr_pb2ar["K_fbk"]
    P_lat = lti.ss(lss_lat.A, lss_lat.B, lss_lat.C, lss_lat.D)
    P_pb = lti.state_feedback(P_lat, K_fbk_full, lqr_pb2ar["K_fwd"])
    ylab2 = lss_lat.y_labels
    out["p2phi"] = (lti.series(lti.integrator(),
                               lti.select(P_pb, ylab2.index("p"), 0)), 10.0)
    out["chi2phi"] = (lti.select(P_pb, ylab2.index("chi"), 0), 30.0)
    return out


def design_lat(tp: C172.TrimParameters, lss=None):
    """All lateral gain sets at one design point (`c172x_design.jl:555-760`)."""
    if lss is None:
        lss = get_design_model(tp)
    x_lat = ("p", "r", "psi", "phi", "EAS", "beta", "beta_filt",
             "ail_p", "rud_p")
    y_lat = list(x_lat) + ["f_y", "chi", "aileron_cmd", "rudder_cmd"]
    lss_lat = _sub(lss, x_lat, U_LAT, y_lat)
    lss_red = lss_lat.delete_vars(x=("psi",), y=("psi", "chi"))

    # ----- ar2ar SAS (`:564-625`)
    data_ar2ar = _lqr_data(
        lss_red, ["aileron_cmd", "rudder_cmd"],
        {"r": 0.1, "phi": 0.1},
        {"aileron_cmd": 0.1, "rudder_cmd": 0.01})
    data_ar2ar["K_fwd"] = np.eye(2)  # passthrough feedforward (`:593-594`)

    # ----- phibeta2ar tracker (`:629-700`)
    data_pb2ar = _lqr_data(
        lss_red, ["phi", "beta"],
        {"r": 0.1, "phi": 2, "beta": 5},
        {"aileron_cmd": 0.1, "rudder_cmd": 0.03})

    # closed phibeta loop ON THE FULL lat model (chi needed for chi2phi)
    P_lat = lti.ss(lss_lat.A, lss_lat.B, lss_lat.C, lss_lat.D)
    # pad gains from reduced states to the full lat state order
    idx = [list(lss_lat.x_labels).index(l) for l in lss_red.x_labels]
    K_fbk_full = np.zeros((2, len(lss_lat.x_labels)))
    K_fbk_full[:, idx] = data_pb2ar["K_fbk"]
    P_pb = lti.state_feedback(P_lat, K_fbk_full, data_pb2ar["K_fwd"])
    ylab = lss_lat.y_labels

    # ----- p2phi PID on integrator * (phi_ref -> p) (`:705-732`)
    P_ph2p = lti.select(P_pb, ylab.index("p"), 0)
    gains_p2phi, m_p, _ = optimize_pid(
        lti.series(lti.integrator(), P_ph2p),
        PIDGains(1.5, 3.0, 0.1, 0.01),
        PIDGains(0.1, 0.0, 0.0, 0.01), PIDGains(10.0, 35.0, 1.5, 0.01),
        Metrics(Ms=0, int_e=2, e_f=2, int_u=1, u_p=0.0), t_sim=10.0)

    # ----- chi2phi PID on (phi_ref -> chi); k_i pinned at 0.4 (`:736-758`)
    P_ph2chi = lti.select(P_pb, ylab.index("chi"), 0)
    gains_chi2phi, m_chi, _ = optimize_pid(
        P_ph2chi, PIDGains(3.0, 0.4, 0.0, 0.01),
        PIDGains(0.1, 0.4, 0.0, 0.01), PIDGains(10.0, 0.4, 1.5, 0.01),
        Metrics(Ms=3, int_e=10, e_f=1, int_u=0.0, u_p=0.01), t_sim=30.0)

    return dict(ar2ar=data_ar2ar, phibeta2ar=data_pb2ar,
                p2phi=_pid_data(gains_p2phi), chi2phi=_pid_data(gains_chi2phi))


def generate_lookups(EAS_points=(25.0, 55.0), h_points=(50.0, 3050.0),
                     path=GAINS_PATH, verbose=True):
    """Sweep the envelope and write the stacked gain schedules
    (`c172x_design.jl:87-129`). Returns the stacked dict."""
    results = {}
    for i, EAS in enumerate(EAS_points):
        for j, h in enumerate(h_points):
            if verbose:
                print(f"designing EAS={EAS} h={h}", flush=True)
            tp = C172.trim_parameters(h=h, EAS=EAS,
                                      flaps=flaps_schedule(EAS))
            lss = get_design_model(tp)  # one trim+linearize per point
            point = {**design_lon(tp, lss), **design_lat(tp, lss)}
            for ch, data in point.items():
                for k, v in data.items():
                    results.setdefault(f"{ch}/{k}", {})[(i, j)] = np.asarray(v)

    stacked = {}
    for key, vals in results.items():
        arr = np.stack([np.stack([vals[(i, j)] for j in range(len(h_points))])
                        for i in range(len(EAS_points))])
        stacked[key] = arr

    np.savez_compressed(path, __EAS__=np.asarray(EAS_points, float),
                        __h__=np.asarray(h_points, float), **stacked)
    return stacked


def load_gains(path=GAINS_PATH):
    """Gain schedules as a dict of channel -> dict of Lookups over (EAS, h)
    (dense mode: two-knot axes contract on the MXU)."""
    from flightjax.ops.interp import Lookup
    data = np.load(path)
    EAS_ax, h_ax = data["__EAS__"], data["__h__"]
    out = {}
    for key in data.files:
        if key.startswith("__"):
            continue
        ch, name = key.split("/")
        out.setdefault(ch, {})[name] = Lookup((EAS_ax, h_ax), data[key],
                                              extrap="flat")
    return out


# To regenerate the gain schedules, force the CPU backend BEFORE any
# flightjax import (module-level table construction touches jax, and the
# axon sitecustomize overrides JAX_PLATFORMS):
#   python -c "import jax; jax.config.update('jax_platforms','cpu'); \
#              jax.config.update('jax_enable_x64', True); \
#              from flightjax.models.c172.c172x_design import generate_lookups; \
#              generate_lookups()"
