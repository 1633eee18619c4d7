"""Linearization suite — the counterpart of the reference's dedicated
`test_linearization.jl` (hand-built A,B,C,D exactness, subsystem slicing by
name and by deletion, and the LinearizedSS running as a simulatable model),
plus the autodiff upgrade: `linearize` must recover the exact Jacobians of an
analytic system (the reference only gets FiniteDiff accuracy,
`linearization.jl:89-111`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation
from flightjax.physics.linearization import (LinearStateSpace, LinearizedSS,
                                             linearize)

X_LABELS = ["V", "q", "theta", "alpha"]
U_LABELS = ["e", "a"]
Y_LABELS = ["V", "q", "theta", "alpha", "f_z"]


def build_ss():
    """Rank-1 outer-product system like the reference's fixture
    (`test_linearization.jl:14-25`)."""
    x0 = np.array([1.0, 0.5, 0.3, 5.0])
    u0 = np.array([0.1, 0.2])
    y0 = np.array([0.3, 0.8, 2.0, 3.0, -9.8])
    return LinearizedSS(
        x0=x0, u0=u0, y0=y0, x_dot0=x0.copy(),
        A=np.outer(x0, x0), B=np.outer(x0, u0),
        C=np.outer(y0, x0), D=np.outer(y0, u0),
        x_labels=X_LABELS, u_labels=U_LABELS, y_labels=Y_LABELS)


def test_model_evaluation_exact():
    # `test_linearization.jl:27-45`: at x = 2 x0, u = 3 u0 the component's
    # f_ode must return exactly x_dot0 + A dx + B du and y0 + C dx + D du
    lss = build_ss()
    comp = LinearStateSpace(lss)
    x = 2.0 * jnp.asarray(lss.x0)
    u = 3.0 * jnp.asarray(lss.u0)
    x_dot, y = comp.f_ode(x, u, None, 0.0)

    dx = np.asarray(x) - lss.x0
    du = np.asarray(u) - lss.u0
    np.testing.assert_array_equal(np.asarray(x_dot),
                                  lss.x_dot0 + lss.A @ dx + lss.B @ du)
    np.testing.assert_array_equal(np.asarray(y),
                                  lss.y0 + lss.C @ dx + lss.D @ du)


def test_subsystem_by_name():
    # `test_linearization.jl:59-72`
    lss = build_ss()
    sub = lss.subsystem(x=["V", "q"], u=["e"], y=["V", "q", "f_z"])
    assert sub.x_labels == ["V", "q"]
    assert sub.u_labels == ["e"]
    assert sub.y_labels == ["V", "q", "f_z"]
    assert sub.A.shape == (2, 2) and sub.B.shape == (2, 1)
    assert sub.C.shape == (3, 2) and sub.D.shape == (3, 1)
    # slices address the right entries
    np.testing.assert_array_equal(sub.A, lss.A[np.ix_([0, 1], [0, 1])])
    np.testing.assert_array_equal(sub.C, lss.C[np.ix_([0, 1, 4], [0, 1])])


def test_delete_vars_matches_subsystem():
    # `test_linearization.jl:74-82`: deleting the complement must reproduce
    # the named subsystem exactly
    lss = build_ss()
    sub = lss.subsystem(x=["V", "q"], u=["e"], y=["V", "q", "f_z"])
    sub2 = lss.delete_vars(x=("theta", "alpha"), u=("a",),
                           y=("theta", "alpha"))
    assert sub2.x_labels == sub.x_labels
    assert sub2.u_labels == sub.u_labels
    assert sub2.y_labels == sub.y_labels
    for m in ("A", "B", "C", "D", "x0", "u0", "y0", "x_dot0"):
        np.testing.assert_array_equal(getattr(sub, m), getattr(sub2, m))


def test_subsystem_unknown_label_raises():
    lss = build_ss()
    with pytest.raises(ValueError):
        lss.subsystem(x=["nope"])


def test_linearize_exact_jacobians():
    # autodiff linearization recovers the analytic Jacobians of a nonlinear
    # system to machine precision (the FiniteDiff reference cannot)
    def f(x, u):
        return jnp.array([x[0] * x[1] + u[0],
                          jnp.sin(x[0]) + x[1] ** 2 * u[0]])

    def h(x, u):
        return jnp.array([x[0] ** 2, x[1] * u[0], x[0] + x[1] + u[0]])

    x0 = jnp.array([0.7, -1.2])
    u0 = jnp.array([0.3])
    lss = linearize(f, h, x0, u0)

    A_exact = np.array([[x0[1], x0[0]],
                        [np.cos(x0[0]), 2 * x0[1] * u0[0]]])
    B_exact = np.array([[1.0], [x0[1] ** 2]])
    C_exact = np.array([[2 * x0[0], 0.0], [0.0, u0[0]], [1.0, 1.0]])
    D_exact = np.array([[0.0], [x0[1]], [1.0]])

    np.testing.assert_allclose(lss.A, A_exact, rtol=0, atol=1e-14)
    np.testing.assert_allclose(lss.B, B_exact, rtol=0, atol=1e-14)
    np.testing.assert_allclose(lss.C, C_exact, rtol=0, atol=1e-14)
    np.testing.assert_allclose(lss.D, D_exact, rtol=0, atol=1e-14)
    np.testing.assert_allclose(lss.x_dot0, np.asarray(f(x0, u0)), atol=1e-15)
    np.testing.assert_allclose(lss.y0, np.asarray(h(x0, u0)), atol=1e-15)


def test_linear_state_space_simulates():
    # the LinearizedSS as a Model inside a Simulation
    # (`linearization.jl:157-192`): a stable scalar decay ẋ = -x must follow
    # exp(-t) under RK4 to O(dt^4)
    lss = LinearizedSS(
        x0=np.array([0.0]), u0=np.array([0.0]), y0=np.array([0.0]),
        x_dot0=np.array([0.0]),
        A=np.array([[-1.0]]), B=np.array([[1.0]]),
        C=np.array([[1.0]]), D=np.array([[0.0]]),
        x_labels=["x"], u_labels=["u"], y_labels=["x"])
    comp = LinearStateSpace(lss)
    sim = Simulation(comp, dt=0.01)
    state = sim.init()
    state = state._replace(x=jnp.array([1.0]))
    final, ts = sim.run(state, t_end=1.0)
    np.testing.assert_allclose(float(final.x[0]), np.exp(-1.0), atol=1e-9)
    # TimeSeries logged y = x every step
    assert len(ts) == 100
    np.testing.assert_allclose(np.asarray(ts.y)[-1, 0], np.exp(-1.0),
                               atol=1e-9)


pytestmark = pytest.mark.fast
