import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.physics import kinematics as K
from flightjax.ops import geodesy as geo
from flightjax.ops import attitude as att


def make_ic():
    return K.kin_init(euler=[0.3, 0.05, -0.1], lat=0.7, lon=-1.2, h=1000.0,
                      omega_wb_b=[0.01, -0.02, 0.03], v_eb_n=[50.0, 5.0, -2.0])


def test_kin_data_from_init():
    ic = make_ic()
    kd = K.kin_data_from_init(ic)
    np.testing.assert_allclose(kd.e_nb, [0.3, 0.05, -0.1], atol=1e-12)
    np.testing.assert_allclose(kd.v_eb_n, [50.0, 5.0, -2.0], atol=1e-12)
    np.testing.assert_allclose(kd.lat, 0.7, atol=1e-12)
    np.testing.assert_allclose(kd.h_e, 1000.0, atol=1e-12)
    np.testing.assert_allclose(kd.v_gnd, np.linalg.norm([50, 5, -2]), atol=1e-12)
    np.testing.assert_allclose(kd.chi_gnd, np.arctan2(5, 50), atol=1e-12)
    # omega_wb_b round trip
    np.testing.assert_allclose(kd.omega_wb_b, [0.01, -0.02, 0.03], atol=1e-12)


def consistency(mech):
    """f_ode y must reproduce the init conditions for any mechanization."""
    ic = make_ic()
    x = mech.init_x(ic)
    u = mech.init_u(ic)
    xdot, y = mech.f_ode(x, u, None, 0.0)
    kd0 = K.kin_data_from_init(ic)
    np.testing.assert_allclose(y.q_nb, kd0.q_nb, atol=1e-10)
    np.testing.assert_allclose(y.v_eb_n, kd0.v_eb_n, atol=1e-9)
    np.testing.assert_allclose(y.omega_wb_b, kd0.omega_wb_b, atol=1e-12)
    np.testing.assert_allclose(y.n_e, kd0.n_e, atol=1e-12)
    np.testing.assert_allclose(y.r_eb_e, kd0.r_eb_e, atol=1e-6)
    np.testing.assert_allclose(y.h_o, kd0.h_o, atol=1e-9)
    return x, u, xdot, y


def test_wa_consistency():
    consistency(K.WA())


def test_ecef_consistency():
    consistency(K.ECEF())


def test_ned_consistency():
    consistency(K.NED())


def integrate(mech, ic, t_end=10.0, dt=0.01):
    """RK4 integrate the mechanization with constant body-frame velocity
    input."""
    from flightjax.core.sim import Simulation, SimState

    sim = Simulation(mech, dt=dt)
    x = mech.init_x(ic)
    u = mech.init_u(ic)
    st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32), x=x, u=u, s=None)
    st, _ = sim.run(st, t_end=t_end, save_y=False)
    _, y = mech.f_ode(st.x, st.u, None, st.t)
    return y


def test_mechanization_agreement():
    """WA, ECEF and NED must produce the same trajectory for the same
    velocity input (constant omega_eb_b, v_eb_b)."""
    ic = make_ic()
    y_wa = integrate(K.WA(), ic)
    y_ec = integrate(K.ECEF(), ic)
    y_ned = integrate(K.NED(), ic)
    for a, b, tag in ((y_wa, y_ec, "wa/ecef"), (y_wa, y_ned, "wa/ned")):
        np.testing.assert_allclose(a.n_e, b.n_e, atol=1e-9, err_msg=tag)
        np.testing.assert_allclose(a.h_e, b.h_e, atol=1e-6, err_msg=tag)
        d = min(np.abs(np.asarray(a.q_nb) - np.asarray(b.q_nb)).max(),
                np.abs(np.asarray(a.q_nb) + np.asarray(b.q_nb)).max())
        assert d < 1e-8, (tag, d)
        np.testing.assert_allclose(a.v_eb_n, b.v_eb_n, atol=1e-7, err_msg=tag)


def test_northward_motion():
    """Pure northward flight raises latitude at rate v/(R_N+h)."""
    ic = K.kin_init(lat=0.3, lon=0.5, h=0.0, v_eb_n=[100.0, 0.0, 0.0])
    y = integrate(K.NED(), ic, t_end=100.0)
    M, _ = geo.radii(ic.n_e)
    expect = 0.3 + 100.0 * 100.0 / float(M)
    np.testing.assert_allclose(float(y.lat), expect, rtol=1e-6)
    np.testing.assert_allclose(float(y.h_e), 0.0, atol=1e-3)  # transport-rate drift from frozen body-frame input


def test_climb():
    ic = K.kin_init(lat=0.0, lon=0.0, v_eb_n=[0.0, 0.0, -5.0])
    y = integrate(K.WA(), ic, t_end=10.0)
    np.testing.assert_allclose(float(y.h_e), 50.0, atol=1e-9)


def test_yaw_rate():
    """Constant body yaw rate with zero velocity: heading integrates."""
    ic = K.kin_init(lat=0.2, lon=0.1, omega_wb_b=[0.0, 0.0, 0.05])
    y = integrate(K.WA(), ic, t_end=10.0)
    np.testing.assert_allclose(float(y.e_nb[0]), 0.5, atol=1e-9)


def test_quat_renorm_step():
    wa = K.WA()
    ic = make_ic()
    x = wa.init_x(ic)
    x["q_wb"] = x["q_wb"] * 1.001  # drift norm
    x2, _ = wa.f_step(x, wa.init_u(ic), None, 0.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(x2["q_wb"])), 1.0,
                               atol=1e-14)
    # below tolerance: untouched
    x["q_wb"] = x2["q_wb"] * (1 + 1e-10)
    x3, _ = wa.f_step(x, wa.init_u(ic), None, 0.0)
    np.testing.assert_allclose(x3["q_wb"], x["q_wb"], atol=0)


pytestmark = pytest.mark.fast
