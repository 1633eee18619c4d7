import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.physics import atmosphere as atm
from flightjax.physics import kinematics as K
from flightjax.ops.quaternions import qrot


def test_isa_standard_values():
    # canonical ISA checkpoints
    T0, p0 = atm.isa_data(jnp.asarray(0.0))
    np.testing.assert_allclose(T0, 288.15)
    np.testing.assert_allclose(p0, 101325.0)
    T11, p11 = atm.isa_data(jnp.asarray(11000.0))
    np.testing.assert_allclose(T11, 216.65, atol=1e-10)
    np.testing.assert_allclose(p11, 22632.0, rtol=1e-4)
    T20, p20 = atm.isa_data(jnp.asarray(20000.0))
    np.testing.assert_allclose(T20, 216.65, atol=1e-10)
    np.testing.assert_allclose(p20, 5474.9, rtol=1e-4)
    T32, _ = atm.isa_data(jnp.asarray(32000.0))
    np.testing.assert_allclose(T32, 228.65, atol=1e-10)
    # below sea level extrapolates layer 0
    Tm, pm = atm.isa_data(jnp.asarray(-100.0))
    np.testing.assert_allclose(Tm, 288.15 + 6.5e-3 * 100, atol=1e-10)
    assert float(pm) > 101325.0
    # 5 km half-pressure-ish sanity
    _, p5 = atm.isa_data(jnp.asarray(5000.0))
    np.testing.assert_allclose(p5, 54019.9, rtol=1e-4)


def test_isa_nonstandard_sl():
    T, p = atm.isa_data(jnp.asarray(1000.0), T_sl=298.15, p_sl=100000.0)
    np.testing.assert_allclose(T, 298.15 - 6.5, atol=1e-10)
    assert 85000 < float(p) < 92000


def test_air_data_still_air():
    ic = K.kin_init(lat=0.3, lon=0.1, h=1000.0, v_eb_n=[50.0, 0.0, 0.0])
    kin = K.kin_data_from_init(ic)
    model = atm.SimpleAtmosphere()
    air = model.air_data(model.init_u(), kin)
    np.testing.assert_allclose(air.TAS, 50.0, atol=1e-9)
    np.testing.assert_allclose(air.v_wb_b, kin.v_eb_b, atol=1e-12)
    assert float(air.EAS) < 50.0  # rho < rho_std at altitude
    np.testing.assert_allclose(air.M, 50.0 / float(air.a), atol=1e-12)
    # CAS ≈ EAS at low Mach/altitude
    np.testing.assert_allclose(air.CAS, air.EAS, rtol=2e-3)
    np.testing.assert_allclose(air.q, 0.5 * float(air.rho) * 2500.0, rtol=1e-12)


def test_air_data_wind():
    ic = K.kin_init(lat=0.0, lon=0.0, h=0.0, v_eb_n=[50.0, 0.0, 0.0])
    kin = K.kin_data_from_init(ic)
    model = atm.SimpleAtmosphere()
    u = model.init_u()
    u["wind"] = jnp.asarray([-10.0, 0.0, 0.0])  # headwind
    air = model.air_data(u, kin)
    np.testing.assert_allclose(air.TAS, 60.0, atol=1e-9)


def test_airflow_angles():
    v = atm.get_velocity_vector(100.0, 0.1, -0.05)
    a, b = atm.get_airflow_angles(v)
    np.testing.assert_allclose(a, 0.1, atol=1e-12)
    np.testing.assert_allclose(b, -0.05, atol=1e-12)
    np.testing.assert_allclose(jnp.linalg.norm(v), 100.0, atol=1e-9)
    # gate below 0.1 m/s
    a0, b0 = atm.get_airflow_angles(jnp.asarray([0.01, 0.001, 0.001]))
    assert float(a0) == 0.0 and float(b0) == 0.0
    # wind axes rotate the velocity onto x
    q_aw = atm.get_wind_axes(0.1, -0.05)
    v_w = qrot(jnp.concatenate([q_aw[:1], -q_aw[1:]]), v)  # q_wa rotation
    np.testing.assert_allclose(v_w, [100.0, 0.0, 0.0], atol=1e-9)


pytestmark = pytest.mark.fast
