"""FBW servo models (reference `c172x.jl:19-106` + `test_c172x.jl`).

Checks the two actuator models against the analytic first/second-order step
responses, the command-saturation flags, the clamped-position semantics of
the underdamped servo, and a mixed-order FlyByWireActuation including its
trim (derivative-vanishing) states.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.models.c172.c172x import (ACT_CHANNELS, Actuator1, Actuator2,
                                         FlyByWireActuation)


def rk4(f, x, dt, n):
    """Fixed-step RK4 over state pytree x' = f(x); returns trajectory list."""
    traj = [x]
    for _ in range(n):
        k1 = f(x)
        k2 = f(jax.tree.map(lambda a, k: a + 0.5 * dt * k, x, k1))
        k3 = f(jax.tree.map(lambda a, k: a + 0.5 * dt * k, x, k2))
        k4 = f(jax.tree.map(lambda a, k: a + dt * k, x, k3))
        x = jax.tree.map(
            lambda a, a1, a2, a3, a4: a + dt / 6 * (a1 + 2 * a2 + 2 * a3 + a4),
            x, k1, k2, k3, k4)
        traj.append(x)
    return traj


def test_actuator1_step_response():
    tau, cmd = 0.05, 0.8
    act = Actuator1(tau=tau, range=(-1.0, 1.0))
    dt, n = 1e-3, 200
    traj = rk4(lambda x: act.f_ode(x, jnp.asarray(cmd))[1],
               act.init_x(), dt, n)
    t = np.arange(n + 1) * dt
    analytic = cmd * (1.0 - np.exp(-t / tau))
    np.testing.assert_allclose(np.array(traj), analytic, atol=1e-9)
    # reported position clamps; command inside range is passed through
    y, _ = act.f_ode(jnp.asarray(1.7), jnp.asarray(cmd))
    assert float(y["pos"]) == 1.0 and float(y["cmd"]) == cmd


def test_actuator2_step_response():
    wn, z, cmd = 10.0 * np.pi, 0.6, 0.5
    act = Actuator2(omega_n=wn, zeta=z, range=(-1.0, 1.0))
    dt, n = 1e-4, 3000
    traj = rk4(lambda x: act.f_ode(x, jnp.asarray(cmd))[1],
               act.init_x(), dt, n)
    p = np.array([float(x["p"]) for x in traj])
    t = np.arange(n + 1) * dt
    wd = wn * np.sqrt(1 - z**2)
    analytic = cmd * (1.0 - np.exp(-z * wn * t)
                      * (np.cos(wd * t) + z / np.sqrt(1 - z**2)
                         * np.sin(wd * t)))
    np.testing.assert_allclose(p, analytic, atol=1e-6)
    # underdamped: the state overshoots the command
    assert p.max() > cmd * 1.05


def test_actuator2_clamped_output_position():
    """`c172x.jl:58-64`: commanded to the range limit, the underdamped state
    transiently exceeds it — but the *reported* position is clamped."""
    act = Actuator2(range=(-1.0, 1.0))
    dt, n = 1e-4, 2000
    state, raw_max, pos_max = act.init_x(), -np.inf, -np.inf
    for _ in range(n):
        y, dx = act.f_ode(state, jnp.asarray(1.0))
        raw_max = max(raw_max, float(state["p"]))
        pos_max = max(pos_max, float(y["pos"]))
        state = jax.tree.map(lambda a, k: a + dt * k, state, dx)
        # midpoint refinement not needed: we only care about the bound
    assert raw_max > 1.0          # state overshoot happened
    assert pos_max == 1.0         # output never exceeded the range


def test_saturation_flags():
    for act in (Actuator1(range=(0.0, 1.0)), Actuator2(range=(0.0, 1.0))):
        x = act.init_x()
        hi, _ = act.f_ode(x, jnp.asarray(1.5))
        lo, _ = act.f_ode(x, jnp.asarray(-0.2))
        mid, _ = act.f_ode(x, jnp.asarray(0.3))
        assert int(hi["sat"]) == 1 and float(hi["cmd"]) == 1.0
        assert int(lo["sat"]) == -1 and float(lo["cmd"]) == 0.0
        assert int(mid["sat"]) == 0


def test_fbw_mixed_actuators():
    """Elevator swapped for an Actuator2; protocol layout, trim states and
    convergence all hold."""
    fbw = FlyByWireActuation(actuators={"elevator": Actuator2()})
    x = fbw.init_x_extra()
    assert set(x["act"]["elevator"].keys()) == {"p", "v"}

    cmds = {ch: jnp.asarray(0.0) for ch in ACT_CHANNELS}
    cmds["elevator"] = jnp.asarray(0.4)
    cmds["throttle"] = jnp.asarray(0.7)

    # trim states null every derivative
    x_trim = {"act": fbw.trim_x(cmds)}
    u = fbw.init_u() | cmds
    act_y, asg, x_dot = fbw.f_ode(x_trim, u, 0.0)
    flat, _ = jax.flatten_util.ravel_pytree(x_dot)
    np.testing.assert_allclose(np.array(flat), 0.0, atol=1e-12)
    assert float(act_y["vel"]["elevator"]) == 0.0
    np.testing.assert_allclose(float(asg["e"]), -0.4)
    np.testing.assert_allclose(float(asg["throttle"]), 0.7)

    # from rest, all channels converge to their commands
    state = {"act": fbw.trim_x({ch: jnp.asarray(0.0) for ch in ACT_CHANNELS})}
    dt = 1e-3
    for _ in range(1500):
        _, _, dx = fbw.f_ode(state, u, 0.0)
        state = jax.tree.map(lambda a, k: a + dt * k, state, dx)
    y, _, _ = fbw.f_ode(state, u, 0.0)
    np.testing.assert_allclose(float(y["pos"]["elevator"]), 0.4, atol=1e-3)
    np.testing.assert_allclose(float(y["pos"]["throttle"]), 0.7, atol=1e-3)
    assert int(y["sat"]["elevator"]) == 0


pytestmark = pytest.mark.fast
