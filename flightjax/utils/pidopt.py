"""PID gain optimization over closed-loop metrics.

Replaces `design/pidopt.jl`: minimize a weighted sum of {Ms (sensitivity
peak), integrated error, final error, integrated control effort, peak
control effort} of the closed loop over (k_p, k_i, k_d) within bounds,
using a bounded local optimizer (the reference uses NLopt BOBYQA; scipy
Powell has the same derivative-free bounded-local character).
"""

from typing import NamedTuple

import numpy as np
from scipy.optimize import minimize

from flightjax.utils import lti


class Metrics(NamedTuple):
    Ms: float
    int_e: float
    e_f: float
    int_u: float
    u_p: float


class PIDGains(NamedTuple):
    k_p: float = 1.0
    k_i: float = 0.0
    k_d: float = 0.0
    tau_f: float = 0.01


def _closed_loops(plant: lti.SS, ctl: lti.SS):
    """(T, CS): ref->y and ref->u of the unity-feedback loop (SISO)."""
    T = lti.close_siso(plant, ctl, 0, 0)
    # ref -> u: same closed loop, output = controller output
    nxp, nxc = plant.nx, ctl.nx
    Cy = plant.C[0:1, :]
    C_u = np.hstack([-ctl.D @ Cy, ctl.C])
    CS = lti.SS(T.A, T.B, C_u, ctl.D)
    return T, CS


def metrics(plant: lti.SS, gains: PIDGains, t_sim) -> Metrics:
    """`pidopt.jl:40-66`."""
    ctl = lti.pid_ss(*gains)
    Ms = lti.sensitivity_peak(plant, ctl)
    T, CS = _closed_loops(plant, ctl)

    t, y = lti.step_response(T, t_sim)
    abs_e = np.abs(y - 1.0)
    int_e = float(np.trapezoid(abs_e, t) / t[-1])
    e_f = float(abs_e[-1])

    t, yu = lti.step_response(CS, t_sim)
    abs_u = np.abs(yu - 1.0)
    int_u = float(np.trapezoid(abs_u, t) / t[-1])
    u_p = float(np.max(abs_u))

    return Metrics(Ms=Ms, int_e=int_e, e_f=e_f, int_u=int_u, u_p=u_p)


def optimize_pid(plant: lti.SS, gains_0: PIDGains, lower: PIDGains,
                 upper: PIDGains, weights: Metrics, t_sim, maxeval=2000):
    """Returns (PIDGains, Metrics, cost)."""
    lo = np.asarray(lower, float)
    hi = np.asarray(upper, float)
    x0 = np.clip(np.asarray(gains_0, float), lo, hi)
    wsum = sum(weights)

    free = hi > lo  # optimize only non-degenerate gains (tau_f is fixed)

    def expand(xf):
        x = x0.copy()
        x[free] = np.clip(xf, lo[free], hi[free])
        return x

    def cost(xf):
        g = PIDGains(*expand(xf))
        try:
            m = metrics(plant, g, t_sim)
        except Exception:
            return 1e6
        return float(np.dot(np.asarray(m), np.asarray(weights)) / wsum)

    res = minimize(cost, x0[free], method="Powell",
                   bounds=list(zip(lo[free], hi[free])),
                   options={"maxfev": maxeval, "xtol": 1e-4, "ftol": 1e-6})
    gains = PIDGains(*expand(res.x))
    return gains, metrics(plant, gains, t_sim), float(res.fun)
