"""Robot2D behaviors, mirroring the reference `test_robot2d.jl`:
equilibria of the free vehicle, steady-state init, LQR velocity tracking,
PID position tracking, and lost-balance termination masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation, SimState
from flightjax.models import robot2d as R


def run_vehicle(ip, t_end=20.0, dt=0.01):
    veh = R.Vehicle()
    sim = Simulation(veh, dt=dt)
    st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                  x=veh.init_x(**ip), u=veh.init_u(ip.get("u_m", 0.0)),
                  s=None)
    st, _ = sim.run(st, t_end=t_end, save_y=False)
    return veh, st


def test_vehicle_stationary():
    veh, st = run_vehicle({})
    for k in ("omega", "v", "theta", "eta"):
        np.testing.assert_allclose(float(st.x[k]), 0.0, atol=1e-3)


def test_vehicle_steady_velocity():
    # The steady-rolling init must be an equilibrium. We check derivatives
    # exactly, then hold only 2 s: the inverted equilibrium is exponentially
    # unstable (lambda ~ 9/s) and XLA's x/R -> x*(1/R) rewrite leaves ~1e-17
    # residual torque which capsizes the open-loop vehicle by t ~ 8 s (the
    # reference holds 20 s only by bit-level luck in Julia's op ordering).
    u_m = 0.7
    veh = R.Vehicle()
    xd, _ = veh.f_ode(veh.init_x(u_m=u_m), veh.init_u(u_m), None, 0.0)
    for k in ("omega", "v", "theta"):
        np.testing.assert_allclose(float(xd[k]), 0.0, atol=1e-15)
    np.testing.assert_allclose(float(xd["eta"]),
                               veh.k_m * u_m * veh.R / veh.b_m, rtol=1e-12)
    veh, st = run_vehicle({"u_m": u_m}, t_end=2.0)
    np.testing.assert_allclose(float(st.x["v"]),
                               veh.k_m * u_m * veh.R / veh.b_m, atol=1e-6)
    np.testing.assert_allclose(float(st.x["omega"]), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(st.x["theta"]), 0.0, atol=1e-6)
    assert float(st.x["eta"]) > 0


def test_vehicle_falls_to_hanging():
    # tiny forward tip: converges to theta = +pi (hanging)
    veh, st = run_vehicle({"omega": 1e-3})
    np.testing.assert_allclose(float(st.x["theta"]), np.pi, atol=1e-3)
    np.testing.assert_allclose(float(st.x["omega"]), 0.0, atol=1e-3)
    np.testing.assert_allclose(float(st.x["v"]), 0.0, atol=1e-3)
    assert float(st.x["eta"]) > 0
    veh, st = run_vehicle({"omega": -1e-3})
    np.testing.assert_allclose(float(st.x["theta"]), -np.pi, atol=1e-3)
    assert float(st.x["eta"]) < 0


def test_linearization_unstable_pole():
    """The inverted equilibrium must have one unstable real pole."""
    lss = R.Vehicle().linearize()
    eigs = np.linalg.eigvals(lss.A)
    assert np.max(eigs.real) > 1.0  # inverted pendulum instability
    assert lss.x_labels == ["omega", "v", "theta", "eta"]


@pytest.fixture(scope="module")
def robot():
    # the reference controller test uses a smaller vehicle
    return R.Robot(R.Vehicle(L=0.1, R=0.08, m_b=0.5))


def make_sim(robot, dt=0.01, periodic_dt=0.01):
    sim = Simulation(robot, dt=dt, periodic_dt=periodic_dt)
    x, u, s = robot.init()
    st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32), x=x, u=u, s=s)
    return sim, st


def set_u(st, **kw):
    u = dict(st.u)
    ctl = dict(u["ctl"])
    for k, v in kw.items():
        ctl[k] = jnp.asarray(v, dtype=ctl[k].dtype)
    u["ctl"] = ctl
    return st._replace(u=u)


def test_controller_direct_mode(robot):
    sim, st = make_sim(robot)
    st = set_u(st, mode=R.MODE_DIRECT, m_ref=0.1)
    st, _ = sim.run(st, t_end=0.1, save_y=False)
    np.testing.assert_allclose(float(st.u["m"]), 0.1, atol=1e-12)
    assert float(st.x["vehicle"]["theta"]) < 0  # tilts backward under torque


def test_controller_velocity_and_position(robot):
    sim, st = make_sim(robot)
    # velocity mode
    st = set_u(st, mode=R.MODE_VELOCITY, v_ref=0.3)
    st, _ = sim.run(st, t_end=10.0, save_y=False)
    np.testing.assert_allclose(float(st.x["vehicle"]["v"]), 0.3, atol=1e-3)
    assert not bool(st.s["lost_balance"])
    # unbounded reference clamps at v_lim
    st = set_u(st, v_ref=1e9)
    st, _ = sim.run(st, t_end=20.0, save_y=False, t0=10.0)
    np.testing.assert_allclose(float(st.x["vehicle"]["v"]),
                               robot.controller.v_lim, atol=1e-3)
    # position mode
    st = set_u(st, mode=R.MODE_POSITION, eta_ref=float(st.x["vehicle"]["eta"]) + 1.0)
    eta_ref = float(st.u["ctl"]["eta_ref"])
    st, _ = sim.run(st, t_end=45.0, save_y=False, t0=20.0)
    np.testing.assert_allclose(float(st.x["vehicle"]["eta"]), eta_ref, atol=1e-3)
    assert not bool(st.s["lost_balance"])


def test_lost_balance_masks(robot):
    sim, st = make_sim(robot)
    # huge direct command capsizes it
    st = set_u(st, mode=R.MODE_DIRECT, m_ref=1.0)
    st, _ = sim.run(st, t_end=5.0, save_y=False)
    assert bool(st.s["lost_balance"])
    frozen = st.x["vehicle"]["theta"]
    st, _ = sim.run(st, t_end=6.0, save_y=False, t0=5.0)
    np.testing.assert_allclose(st.x["vehicle"]["theta"], frozen, atol=0)


def test_robot_fleet_vmap(robot):
    """Batched robots with different velocity references all converge."""
    sim, st0 = make_sim(robot)
    B = 8
    st = jax.tree.map(lambda v: jnp.broadcast_to(v, (B,) + v.shape), st0)
    v_refs = jnp.linspace(-0.2, 0.3, B)
    u = dict(st.u)
    ctl = dict(u["ctl"])
    ctl["v_ref"] = v_refs
    u["ctl"] = ctl
    st = st._replace(u=u)
    run = jax.jit(jax.vmap(lambda s: sim.run(s, t_end=10.0, save_y=False, t0=0.0)[0]))
    st = run(st)
    np.testing.assert_allclose(np.asarray(st.x["vehicle"]["v"]),
                               np.asarray(v_refs), atol=1e-3)


pytestmark = pytest.mark.fast
