"""Offline control design tools: continuous LQR synthesis with integrator
augmentation and trim-tracking feedforward.

Replaces the reference's ControlSystems.jl-based design scripts
(`design/robot2d/robot2d_design.jl`, `design/c172/c172x_design.jl`): given a
labeled LinearizedSS, compute the (K_fbk, K_fwd, K_int) gain set consumed by
`flightjax.physics.control.lqr_step`.
"""

import numpy as np
import scipy.linalg

from flightjax.physics.control import LQRParams
from flightjax.physics.linearization import LinearizedSS


def lqr_gain(A, B, Q, R):
    """Continuous-time infinite-horizon LQR state feedback K (u = -K x)."""
    P = scipy.linalg.solve_continuous_are(A, B, Q, R)
    return np.linalg.solve(R, B.T @ P)


def design_lqr_tracker(lss: LinearizedSS, z_labels, Q_diag, R_diag,
                       integrate_z=True, bound_lo=None, bound_hi=None):
    """LQR steady-state tracker design with optional integrator augmentation
    (mirrors `robot2d_design.jl:10-85` / `c172x_design.jl:328-540`).

    - `z_labels`: names of the commanded outputs (must be in lss.y_labels)
    - `Q_diag`: dict label -> weight over x labels plus (if integrate_z)
      `xi_<z>` integrator weights
    - `R_diag`: dict label -> weight over u labels

    Feedforward: with L = [A B; C D], M = inv(L), K_fwd = M_22 + K_x @ M_12
    gives exact steady-state tracking of z_ref (`robot2d_design.jl:60-71`).
    """
    A, B = lss.A, lss.B
    yi = [list(lss.y_labels).index(z) for z in z_labels]
    C = lss.C[yi, :]
    D = lss.D[yi, :]
    n_x, n_u = B.shape
    n_z = len(z_labels)

    if integrate_z:
        A_aug = np.block([[A, np.zeros((n_x, n_z))],
                          [C, np.zeros((n_z, n_z))]])
        B_aug = np.vstack([B, D])
        labels_aug = list(lss.x_labels) + [f"xi_{z}" for z in z_labels]
    else:
        A_aug, B_aug = A, B
        labels_aug = list(lss.x_labels)

    Q = np.diag([float(Q_diag.get(l, 0.0)) for l in labels_aug])
    R = np.diag([float(R_diag[l]) for l in lss.u_labels])

    K_aug = lqr_gain(A_aug, B_aug, Q, R)
    K_x = K_aug[:, :n_x]
    K_int = K_aug[:, n_x:] if integrate_z else np.zeros((n_u, n_z))

    # steady-state feedforward from the plant inverse
    L = np.block([[A, B], [C, D]])
    M = np.linalg.inv(L)
    M_12 = M[:n_x, n_x:]
    M_22 = M[n_x:, n_x:]
    K_fwd = M_22 + K_x @ M_12

    return LQRParams(
        K_fbk=np.asarray(K_x), K_fwd=np.asarray(K_fwd),
        K_int=np.asarray(K_int),
        x_trim=np.asarray(lss.x0), u_trim=np.asarray(lss.u0),
        z_trim=np.asarray(lss.y0[yi]),
        bound_lo=(np.full(n_u, -np.inf) if bound_lo is None else np.asarray(bound_lo, float)),
        bound_hi=(np.full(n_u, np.inf) if bound_hi is None else np.asarray(bound_hi, float)))
