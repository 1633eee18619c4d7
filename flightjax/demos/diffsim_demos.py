"""Differentiable-simulation demos on the full C172 stack.

No reference counterpart — the reference can only finite-difference its
models at a point (`linearization.jl:89-111`). Because the whole flightjax
simulation is one pure JAX program, `jax.grad` flows through the complete
C172 physics (aero tables, propeller/engine, gear, RK4) over whole
rollouts, enabling gradient-based maneuver design directly on the
nonlinear aircraft:

    state, sched, losses = optimize_pitch_capture()   # ~1 min on CPU

shapes an elevator schedule that captures a pitch-attitude target and
nulls the pitch rate at the end of the horizon.
"""

import jax
import jax.numpy as jnp

from flightjax.demos.c172_demos import elevator_doublet_setup
from flightjax.utils.diffsim import fit, open_loop


def optimize_pitch_capture(theta_delta=0.05, n_steps=100, dt=0.02,
                           opt_steps=60, lr=0.1, rig=None):
    """Gradient-shape an elevator schedule on the trimmed C172Sv0 so that
    after `n_steps` of dt the pitch attitude has moved by `theta_delta`
    (rad) from trim with zero terminal pitch rate.

    Returns (sched, losses, final_state): the per-step elevator deltas
    around trim (tanh-bounded to ±0.3), the loss history, and the rollout
    endpoint under the optimized schedule."""
    sim, state0, ts = elevator_doublet_setup(dt) if rig is None else rig

    _, y0 = sim.system.f_ode(state0.x, state0.u, state0.s, 0.0)
    theta_trim = y0.vehicle.kinematics.e_nb[1]
    theta_ref = theta_trim + theta_delta

    def apply_u(st, delta):
        act = dict(st.u["vehicle"]["systems"]["act"],
                   elevator=ts.elevator + delta)
        sys_u = dict(st.u["vehicle"]["systems"], act=act)
        return st._replace(u={"vehicle": dict(st.u["vehicle"],
                                              systems=sys_u)})

    def loss(params):
        sched = 0.3 * jnp.tanh(params)
        fin, _ = open_loop(sim, state0, sched, apply_u)
        _, y = sim.system.f_ode(fin.x, fin.u, fin.s, fin.t)
        kin = y.vehicle.kinematics
        return ((kin.e_nb[1] - theta_ref) ** 2
                + 0.1 * kin.omega_eb_b[1] ** 2
                + 1e-3 * jnp.mean(sched ** 2))

    import optax
    params, losses = fit(loss, jnp.zeros(n_steps), steps=opt_steps,
                         optimizer=optax.adam(lr))
    sched = 0.3 * jnp.tanh(params)
    fin, _ = open_loop(sim, state0, sched, apply_u)
    return sched, losses, fin


if __name__ == "__main__":
    sched, losses, fin = optimize_pitch_capture()
    print(f"loss {float(losses[0]):.3e} -> {float(losses[-1]):.3e} "
          f"({len(losses)} steps)")
