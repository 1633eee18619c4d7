"""Differentiable-simulation suite (`flightjax/utils/diffsim.py`) — the
capability upgrade over the reference's point finite differences: exact
gradients through whole rollouts, used for open-loop trajectory optimization
and parameter identification on the Robot2D stack."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation
from flightjax.models import robot2d as R
from flightjax.utils.diffsim import fit, open_loop, rollout


def make_sim(u_m=0.0):
    sim = Simulation(R.Vehicle(), dt=0.01)
    state = sim.init()
    if u_m:
        state = state._replace(u={"m": jnp.asarray(u_m)})
    return sim, state


@pytest.mark.fast
def test_rollout_matches_run():
    sim, state = make_sim(u_m=0.3)
    final_a = rollout(sim, state, 100)
    final_b, _ = sim.run(state, t_end=1.0, save_y=False)
    for a, b in zip(jax.tree.leaves(final_a), jax.tree.leaves(final_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpointed_rollout_matches_plain():
    # jax.checkpoint changes memory, not math: the segmented rollout and its
    # gradient must match the plain scan (to the last couple of ulps — the
    # nested-scan structure compiles to a different but equivalent schedule)
    sim, state = make_sim()

    def loss(u_m, segment):
        st = state._replace(u={"m": u_m})
        fin = rollout(sim, st, 200, segment=segment)
        return fin.x["eta"] ** 2

    u = jnp.asarray(0.25)
    l_plain, g_plain = jax.value_and_grad(loss)(u, None)
    l_seg, g_seg = jax.value_and_grad(loss)(u, 32)
    np.testing.assert_allclose(float(l_plain), float(l_seg), rtol=1e-12)
    np.testing.assert_allclose(float(g_plain), float(g_seg), rtol=1e-10)


@pytest.mark.fast
def test_gradient_matches_finite_difference():
    # the whole point: d(loss)/d(input) through RK4 + f_step agrees with
    # central finite differences
    sim, state = make_sim()

    def loss(u_m):
        st = state._replace(u={"m": u_m})
        fin = rollout(sim, st, 50)
        return fin.x["theta"] ** 2 + 0.1 * fin.x["omega"] ** 2

    u0 = jnp.asarray(0.2)
    g_ad = float(jax.grad(loss)(u0))
    eps = 1e-6
    g_fd = float((loss(u0 + eps) - loss(u0 - eps)) / (2 * eps))
    np.testing.assert_allclose(g_ad, g_fd, rtol=1e-6)


def test_open_loop_schedule_optimization():
    # shape a 100-step motor schedule so the robot's wheel travels to
    # eta = 0.2 m with the body steadied — pure gradient descent through
    # the rollout, no controller in the loop
    import optax

    sim, state0 = make_sim()
    n = 150
    target = 0.2

    def apply_u(st, u_t):
        return st._replace(u={"m": u_t})

    def loss(params):
        sched = jnp.tanh(params)  # inherently physical: |u| < 1, smooth
        fin, _ = open_loop(sim, state0, sched, apply_u)
        return ((fin.x["eta"] - target) ** 2
                + 0.01 * fin.x["omega"] ** 2
                + 1e-4 * jnp.mean(sched ** 2))

    params, losses = fit(loss, jnp.zeros(n), steps=600,
                         optimizer=optax.adam(5e-2))
    assert losses[-1] < losses[0] / 100.0, (losses[0], losses[-1])
    # the optimized schedule actually reaches the target at rest, with
    # commands inside the vehicle's |u| <= 1 clip
    sched = jnp.tanh(params)
    fin, _ = open_loop(sim, state0, sched, apply_u)
    np.testing.assert_allclose(float(fin.x["eta"]), target, atol=0.01)
    np.testing.assert_allclose(float(fin.x["omega"]), 0.0, atol=0.01)
    assert float(jnp.max(jnp.abs(sched))) < 1.0


def test_parameter_identification():
    # recover the motor constant k_m from a logged trajectory: simulate
    # truth with k_m*, re-fit a model whose k_m starts 30% off
    import optax

    sim_true, state = make_sim(u_m=0.4)
    truth = rollout(sim_true, state, 100)
    eta_true, omega_true = truth.x["eta"], truth.x["omega"]
    k_true = float(sim_true.system.k_m)

    def loss(log_km):
        veh = R.Vehicle()
        veh.k_m = jnp.exp(log_km)
        sim = Simulation(veh, dt=0.01)
        fin = rollout(sim, state, 100)
        return ((fin.x["eta"] - eta_true) ** 2
                + (fin.x["omega"] - omega_true) ** 2)

    p0 = jnp.log(jnp.asarray(k_true * 1.3))
    p, losses = fit(loss, p0, steps=200, optimizer=optax.adam(3e-2))
    np.testing.assert_allclose(float(jnp.exp(p)), k_true, rtol=2e-3)
    assert losses[-1] < losses[0] / 1e3
