"""Minimal LTI state-space toolbox for offline control design.

Replaces the reference's ControlSystems.jl usage in the design scripts
(`design/c172/c172x_design.jl`, `design/pidopt.jl`): state-space containers,
series/feedback composition, frequency response, step response, and the
sensitivity metrics used by the PID optimizer. Pure numpy/scipy — this is
host-side design-time tooling, not the TPU compute path.
"""

from typing import NamedTuple

import numpy as np
import scipy.linalg


class SS(NamedTuple):
    """ẋ = Ax + Bu, y = Cx + Du."""
    A: np.ndarray
    B: np.ndarray
    C: np.ndarray
    D: np.ndarray

    @property
    def nx(self):
        return self.A.shape[0]

    @property
    def nu(self):
        return self.B.shape[1]

    @property
    def ny(self):
        return self.C.shape[0]


def ss(A, B, C, D=None):
    A = np.atleast_2d(np.asarray(A, float))
    B = np.asarray(B, float).reshape(A.shape[0], -1)
    C = np.atleast_2d(np.asarray(C, float))
    if C.shape[1] != A.shape[0]:
        C = C.reshape(-1, A.shape[0])
    if D is None:
        D = np.zeros((C.shape[0], B.shape[1]))
    D = np.asarray(D, float).reshape(C.shape[0], B.shape[1])
    return SS(A, B, C, D)


def ss_gain(K):
    """Static gain block as a state-less SS."""
    K = np.atleast_2d(np.asarray(K, float))
    return SS(np.zeros((0, 0)), np.zeros((0, K.shape[1])),
              np.zeros((K.shape[0], 0)), K)


def integrator():
    """1/s."""
    return SS(np.zeros((1, 1)), np.ones((1, 1)), np.eye(1), np.zeros((1, 1)))


def pid_ss(k_p, k_i, k_d, tau_f):
    """Parallel PID k_p + k_i/s + k_d s/(tau_f s + 1) (`pidopt.jl:32-35`)."""
    A = np.diag([0.0, -1.0 / tau_f])
    B = np.array([[1.0], [1.0]])
    C = np.array([[k_i, -k_d / tau_f**2]])
    D = np.array([[k_p + k_d / tau_f]])
    return SS(A, B, C, D)


def series(s1: SS, s2: SS) -> SS:
    """u -> s1 -> s2 -> y."""
    A = np.block([
        [s1.A, np.zeros((s1.nx, s2.nx))],
        [s2.B @ s1.C, s2.A]])
    B = np.vstack([s1.B, s2.B @ s1.D])
    C = np.hstack([s2.D @ s1.C, s2.C])
    D = s2.D @ s1.D
    return SS(A, B, C, D)


def select(sys: SS, y_idx, u_idx) -> SS:
    """Sub-system picking output rows / input columns."""
    y_idx = np.atleast_1d(y_idx)
    u_idx = np.atleast_1d(u_idx)
    return SS(sys.A, sys.B[:, u_idx], sys.C[y_idx, :],
              sys.D[np.ix_(y_idx, u_idx)])


def state_feedback(plant: SS, K_fbk, K_fwd) -> SS:
    """Close u = K_fwd z_ref - K_fbk x around ẋ = Ax + Bu; keeps the plant's
    outputs. Inputs become z_ref (the LQR tracker loop of
    `c172x_design.jl:155-220`)."""
    A = plant.A - plant.B @ K_fbk
    B = plant.B @ K_fwd
    C = plant.C - plant.D @ K_fbk
    D = plant.D @ K_fwd
    return SS(A, B, C, D)


def state_feedback_int(plant: SS, K_fbk, K_fwd, K_int, Cz, Dz) -> SS:
    """Close u = K_fwd z_ref - K_fbk x - K_int ∫(z - z_ref) around the plant
    (the integrator-augmented trackers, `c172x_design.jl:330-425`). Requires
    Dz @ (input map) == 0 for the integrator feedback to be well-posed; holds
    for the C172X channels (commands feed actuators, z are outputs)."""
    nx, nu = plant.nx, plant.nu
    nz = Cz.shape[0]
    # augmented state [x; xi], xi_dot = z - z_ref = Cz x + Dz u - z_ref
    # u = K_fwd z_ref - K_fbk x - K_int xi
    U_x = -K_fbk
    U_xi = -K_int
    A = np.block([
        [plant.A + plant.B @ U_x, plant.B @ U_xi],
        [Cz + Dz @ U_x, Dz @ U_xi]])
    B = np.vstack([plant.B @ K_fwd,
                   Dz @ K_fwd - np.eye(nz)])
    C = np.hstack([plant.C + plant.D @ U_x, plant.D @ U_xi])
    D = plant.D @ K_fwd
    return SS(A, B, C, D)


def close_siso(plant: SS, ctl: SS, u_idx, y_idx) -> SS:
    """Close one loop: plant input `u_idx` driven by ctl(e), e = ref - y_sel.
    The returned system keeps ALL plant inputs, with channel `u_idx` now
    meaning `ref` (the ControlSystems.jl `connect` pattern of
    `c172x_design.jl:246-252`). Requires the fed-back output to have no
    direct feedthrough from the closed channel (holds for all C172X loop
    closures — the fed-back outputs are states)."""
    np.testing.assert_allclose(plant.D[y_idx, u_idx], 0.0, atol=1e-12)
    Cy = plant.C[y_idx:y_idx + 1, :]
    Bu = plant.B[:, u_idx:u_idx + 1]
    Du = plant.D[:, u_idx:u_idx + 1]

    # e = ref - Cy x ; u_ch = Cc xc + Dc e
    A = np.block([
        [plant.A - Bu @ ctl.D @ Cy, Bu @ ctl.C],
        [-ctl.B @ Cy, ctl.A]])
    B = np.vstack([plant.B, np.zeros((ctl.nx, plant.nu))])
    B[:plant.nx, u_idx:u_idx + 1] = Bu @ ctl.D
    B[plant.nx:, u_idx:u_idx + 1] = ctl.B
    C = np.hstack([plant.C - Du @ ctl.D @ Cy, Du @ ctl.C])
    D = plant.D.copy()
    D[:, u_idx:u_idx + 1] = Du @ ctl.D
    return SS(A, B, C, D)


# ------------------------------------------------------------------ analysis

def freqresp(sys: SS, w):
    """(len(w), ny, nu) complex frequency response."""
    out = np.empty((len(w), sys.ny, sys.nu), dtype=complex)
    I = np.eye(sys.nx)
    for k, wk in enumerate(w):
        out[k] = sys.C @ np.linalg.solve(1j * wk * I - sys.A, sys.B) + sys.D
    return out


def step_response(sys: SS, t_end, n=500):
    """Unit step on a SISO system: returns (t, y)."""
    assert sys.nu == 1 and sys.ny == 1
    t = np.linspace(0.0, t_end, n)
    dt = t[1] - t[0]
    nx = sys.nx
    if nx == 0:
        return t, np.full(n, float(sys.D[0, 0]))
    # exact ZOH discretization
    M = np.zeros((nx + 1, nx + 1))
    M[:nx, :nx] = sys.A * dt
    M[:nx, nx:] = sys.B * dt
    Md = scipy.linalg.expm(M)
    Ad, Bd = Md[:nx, :nx], Md[:nx, nx:]
    x = np.zeros((nx, 1))
    y = np.empty(n)
    for k in range(n):
        y[k] = float((sys.C @ x + sys.D)[0, 0])
        x = Ad @ x + Bd
    return t, y


def sensitivity_peak(plant: SS, ctl: SS, w=None):
    """Ms = max |1/(1 + P(jw) C(jw))| over a log frequency grid (SISO;
    `pidopt.jl:44-49`), clamped to 1e3."""
    if w is None:
        w = np.logspace(-2, 3, 300)
    L = freqresp(series(ctl, plant), w)[:, 0, 0]
    S = 1.0 / (1.0 + L)
    return float(min(np.max(np.abs(S)), 1e3))
