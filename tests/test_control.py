import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.physics import control as C


def test_pi_tracks_and_antiwindup():
    p = C.pi_params(k_p=2.0, k_i=1.0, bound_lo=-1.0, bound_hi=1.0)
    # unsaturated: xdot = k_i * input
    xd, out = C.pi_ode(p, jnp.asarray(0.0), jnp.asarray(0.1))
    np.testing.assert_allclose(xd, 0.1)
    np.testing.assert_allclose(out.output, 0.2)
    assert int(out.sat_out) == 0
    # saturated high with positive input: integrator halted
    xd, out = C.pi_ode(p, jnp.asarray(0.9), jnp.asarray(0.5))
    assert int(out.sat_out) == 1
    assert bool(out.int_halted)
    np.testing.assert_allclose(xd, 0.0)
    np.testing.assert_allclose(out.output, 1.0)
    # saturated high but input pulls back down: integrator active
    xd, out = C.pi_ode(p, jnp.asarray(1.2), jnp.asarray(-0.3))
    assert not bool(out.int_halted)
    np.testing.assert_allclose(xd, -0.3)
    # external saturation halts too
    xd, out = C.pi_ode(p, jnp.asarray(0.0), jnp.asarray(0.5), sat_ext=1)
    assert bool(out.int_halted)
    # leak
    p2 = C.pi_params(k_i=0.0, k_l=0.5)
    xd, _ = C.pi_ode(p2, jnp.asarray(2.0), jnp.asarray(0.0))
    np.testing.assert_allclose(xd, -1.0)


def test_integrator():
    s = C.integrator_state()
    dt = 0.1
    for _ in range(10):
        s, out = C.integrator_step(s, jnp.asarray(1.0), dt, bound_hi=0.5)
    # would be 1.0 free, but halts at the bound
    np.testing.assert_allclose(out.output, 0.5)
    assert int(out.sat_out) == 1
    # integrates back down immediately
    s, out = C.integrator_step(s, jnp.asarray(-1.0), dt, bound_hi=0.5)
    assert not bool(out.halted)


def test_leadlag_dc_gain():
    # lead-lag DC gain = k * z/p
    s = C.leadlag_state()
    z, p, k = -1.0, -10.0, 2.0
    for _ in range(2000):
        s, y = C.leadlag_step(s, jnp.asarray(1.0), 0.01, z=z, p=p, k=k)
    np.testing.assert_allclose(float(y), k * z / p, rtol=1e-6)


def test_pid_steps():
    dt = 0.01
    p = C.pid_params(k_p=1.0, k_i=2.0, k_d=0.1, tau_f=0.05)
    s = C.pid_state()
    # constant input: y_p stays, y_i ramps at k_i*u per sec, y_d decays
    outs = []
    for i in range(100):
        s, out = C.pid_step(p, s, jnp.asarray(1.0), dt)
        outs.append(float(out.output))
    # after 1 s: y_p = 1, y_i = 2.0, y_d ~ 0
    np.testing.assert_allclose(outs[-1], 1.0 + 2.0, atol=0.05)
    # first step derivative kick: alpha*(k_d*u) = k_d/(tau_f+dt)
    np.testing.assert_allclose(outs[0], 1.0 + dt * 2.0 + 0.1 / (0.05 + dt),
                               atol=1e-9)


def test_pid_antiwindup_bound():
    dt = 0.01
    p = C.pid_params(k_p=0.0, k_i=10.0, bound_hi=0.5)
    s = C.pid_state()
    for _ in range(200):
        s, out = C.pid_step(p, s, jnp.asarray(1.0), dt)
    # the integrator halts right when output crosses the bound
    assert float(out.output) == 0.5
    assert float(s.x_i0) <= 0.6  # no windup beyond one step past bound


def test_pid_vectorized():
    p = C.pid_params(k_p=jnp.asarray([1.0, 2.0]), k_i=jnp.asarray([0.0, 0.0]),
                     bound_lo=jnp.full(2, -C.INF), bound_hi=jnp.full(2, C.INF))
    s = C.pid_state((2,))
    s, out = C.pid_step(p, s, jnp.asarray([1.0, 1.0]), 0.01)
    np.testing.assert_allclose(out.output, [1.0, 2.0])


def test_lqr_regulation():
    """Double integrator regulated to a reference by LQR with known gains."""
    dt = 0.01
    # plant: x1' = x2, x2' = u ; discrete Euler
    K_fbk = jnp.asarray([[2.0, 2.0]])   # u = -K x (stabilizing)
    p = C.lqr_params(2, 1, 1, K_fbk=K_fbk, K_fwd=[[2.0]])
    s = C.lqr_state(1)
    x = jnp.asarray([0.0, 0.0])
    z_ref = jnp.asarray([1.0])
    for _ in range(2000):
        z = x[:1]
        s, out = C.lqr_step(p, s, x, z, z_ref, dt)
        u = out.output[0]
        x = x + dt * jnp.asarray([x[1], u])
    np.testing.assert_allclose(float(x[0]), 1.0, atol=1e-3)


def test_lqr_integral_removes_bias():
    """Plant with constant disturbance: integral action nulls the error."""
    dt = 0.01
    p = C.lqr_params(1, 1, 1, K_fbk=[[3.0]], K_fwd=[[3.0]], K_int=[[4.0]])
    s = C.lqr_state(1)
    x = jnp.asarray([0.0])
    z_ref = jnp.asarray([1.0])
    for _ in range(3000):
        s, out = C.lqr_step(p, s, x, x, z_ref, dt)
        u = out.output[0]
        x = x + dt * (-1.0 * x + u + 0.5)  # +0.5 disturbance
    np.testing.assert_allclose(float(x[0]), 1.0, atol=1e-3)


def test_lqr_trim_passthrough():
    p = C.lqr_params(2, 2, 1, u_trim=[0.3, -0.2], x_trim=[1.0, 2.0],
                     z_trim=[0.5])
    s = C.lqr_state(2)
    # at the trim point with z_ref = z_trim, output = u_trim
    s, out = C.lqr_step(p, s, jnp.asarray([1.0, 2.0]), jnp.asarray([0.5]),
                        jnp.asarray([0.5]), 0.01)
    np.testing.assert_allclose(out.output, [0.3, -0.2], atol=1e-12)


def test_schedule_roundtrip(tmp_path):
    """Gain schedule save/load/evaluate."""
    from flightjax.ops.interp import Lookup

    eas_ax = np.linspace(30.0, 60.0, 4)
    h_ax = np.linspace(0.0, 3000.0, 3)
    E, H = np.meshgrid(eas_ax, h_ax, indexing="ij")
    grid = C.PIDParams(
        k_p=jnp.asarray(E * 0.1), k_i=jnp.asarray(H * 0.001),
        k_d=jnp.zeros_like(jnp.asarray(E)), tau_f=jnp.full(E.shape, 0.01),
        beta_p=jnp.ones(E.shape), beta_d=jnp.ones(E.shape),
        bound_lo=jnp.full(E.shape, -1.0), bound_hi=jnp.full(E.shape, 1.0))
    path = str(tmp_path / "sched.npz")
    C.save_schedule(path, grid, (eas_ax, h_ax), ("EAS", "h"))
    lut = C.load_schedule(path, C.pid_params())
    p = C.schedule(lut, 45.0, 1500.0)
    np.testing.assert_allclose(p.k_p, 4.5, atol=1e-12)
    np.testing.assert_allclose(p.k_i, 1.5, atol=1e-12)
    np.testing.assert_allclose(p.bound_hi, 1.0)
    # flat extrapolation beyond the envelope
    p2 = C.schedule(lut, 1000.0, -500.0)
    np.testing.assert_allclose(p2.k_p, 6.0, atol=1e-12)
    # jit-compatible
    f = jax.jit(lambda e, h: C.schedule(lut, e, h).k_p)
    np.testing.assert_allclose(f(45.0, 1500.0), 4.5, atol=1e-12)


pytestmark = pytest.mark.fast
