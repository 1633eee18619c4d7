"""AircraftBase scaffolding tests (reference `test_aircraft_base.jl`).

The theta-constraint round-trip (`test_aircraft_base.jl:17-44`): compute the
trim pitch from (wind-relative velocity, flight-path angle, bank), then
rebuild the attitude and verify the resulting NED flight-path inclination
matches the requested one.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import attitude as att
from flightjax.physics import atmosphere as atm
from flightjax.physics.aircraftbase import theta_constraint


def test_theta_constraint_roundtrip():
    alpha_a, beta_a, TAS = 0.15, -0.11, 100.0
    v_wb_b = atm.get_velocity_vector(TAS, alpha_a, beta_a)

    gamma_wb_n = -0.07
    psi_nb = 0.3  # irrelevant to inclination
    phi_nb = 0.7
    theta_nb = theta_constraint(v_wb_b, gamma_wb_n, phi_nb)

    R_nb = att.euler_to_matrix(jnp.asarray([psi_nb, theta_nb, phi_nb]))
    v_wb_n = R_nb @ v_wb_b
    np.testing.assert_allclose(
        float(att.inclination(v_wb_n)), gamma_wb_n, rtol=1e-10)


def test_theta_constraint_zero_bank_matches_alpha_plus_gamma():
    """At zero bank and zero sideslip, theta = alpha + gamma exactly."""
    alpha, gamma = 0.08, 0.05
    v_wb_b = atm.get_velocity_vector(60.0, alpha, 0.0)
    theta = float(theta_constraint(v_wb_b, gamma, 0.0))
    np.testing.assert_allclose(theta, alpha + gamma, rtol=1e-10)


def test_bare_vehicle_free_fall():
    """`NoVehicleSystems` (`aircraftbase.jl:27-43`): a Vehicle with no
    systems is a free unit-mass rigid body — under gravity alone it
    accelerates downward at ~g with no rotation."""
    import jax
    from flightjax.core.sim import Simulation
    from flightjax.physics.aircraftbase import Aircraft, SimpleWorld, Vehicle
    from flightjax.physics.kinematics import WA, kin_init

    world = SimpleWorld(Aircraft(Vehicle(None, WA())))
    sim = Simulation(world, dt=0.01, periodic_dt=0.01)
    state = sim.init(kin_init=kin_init(h=1000.0))
    ctx = ()

    T = 2.0
    n = int(T / 0.01)
    step = jax.jit(lambda st: sim.step(st, ctx))
    for _ in range(n):
        state = step(state)
    y = sim.output(state, ctx)
    kin = y.vehicle.kinematics
    # v_D ~ g*T (gravity at 1 km is slightly below standard 9.80665)
    v_D = float(kin.v_eb_n[2])
    assert abs(v_D - 9.8 * T) < 0.05
    np.testing.assert_allclose(np.asarray(kin.omega_eb_b), 0.0, atol=1e-9)


def test_print_tree_and_timeseries_accessors():
    from flightjax.core.modeling import tree_repr
    from flightjax.core.sim import TimeSeries

    s = tree_repr({"a": {"b": jnp.zeros(3)}, "c": jnp.asarray(1.0)})
    assert "├─ a" in s and "b: float64[3]" in s and "└─ c" in s

    ts = TimeSeries(jnp.arange(4.0), {"v": jnp.ones((4, 3))})
    assert ts.get_time().shape == (4,)
    comps = ts.v.get_components()
    assert len(comps) == 3 and comps[0].y.shape == (4,)
    assert set(ts.get_components().keys()) == {"v"}


def test_theta_constraint_batched():
    """The constraint vmaps over trailing batch shapes (fleet trim)."""
    v = atm.get_velocity_vector(jnp.asarray([50.0, 60.0, 70.0]),
                                jnp.asarray([0.1, 0.05, 0.0]),
                                jnp.asarray([0.0, 0.02, -0.01]))
    th = theta_constraint(v, jnp.asarray([0.0, 0.03, -0.02]),
                          jnp.asarray([0.0, 0.2, -0.3]))
    assert th.shape == (3,)
    for i in range(3):
        th_i = theta_constraint(v[i], float(jnp.asarray([0.0, 0.03, -0.02])[i]),
                                float(jnp.asarray([0.0, 0.2, -0.3])[i]))
        np.testing.assert_allclose(float(th[i]), float(th_i), rtol=1e-12)


pytestmark = pytest.mark.fast
