"""Dryden turbulence (physics/turbulence.py) — beyond-reference capability
(the reference's wind models are uniform only, `atmosphere.jl:151-181`).

The stationary output variance per axis must equal the MIL-F-8785C
sigma^2 — this pins the filter realization AND the noise-drive scaling
(eta ~ N(0, pi/dt)) end-to-end through the engine's RK4 + f_step
interleave. Plus: counter-based stream reproducibility, the exact-off
guarantee at W20=0, and the Vehicle wiring (gusts enter AirData; the
turbulence-free state trajectory is bit-preserved when W20=0).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.modeling import Component
from flightjax.core.sim import Simulation, SimState
from flightjax.physics.turbulence import DrydenTurbulence, scales, FT

DT = 0.02
V_REF = 50.0
H_REF = 200.0  # m AGL


class _FixedCondition(Component):
    """Harness: the gust filters at a frozen (V, h_AGL) flight condition."""

    def __init__(self, dt=DT, V=V_REF, h=H_REF):
        self.turb = DrydenTurbulence(dt)
        self.V, self.h = V, h

    def init_x(self):
        return self.turb.init_x()

    def init_u(self):
        return self.turb.init_u()

    def init_s(self):
        return self.turb.init_s()

    def f_ode(self, x, u, s, t):
        return self.turb.f_ode(x, u, s, t, self.V, self.h)

    def f_step(self, x, u, s, t):
        return self.turb.f_step(x, u, s, t)


def _state(harness, seed=0, W20=10.0, **u_over):
    u = dict(harness.init_u(), seed=jnp.asarray(seed, jnp.int32),
             W20=jnp.asarray(float(W20)), **u_over)
    return SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                    x=harness.init_x(), u=u, s=harness.init_s())


def _gust_rollout(sim, harness, state, n_steps):
    """(n_steps, ..., 3) gust history via the engine's own step."""
    def body(st, _):
        st = sim.step(st, ())
        g = harness.turb.gust(st.x, st.u, harness.V, harness.h)
        return st, g
    return jax.lax.scan(body, state, None, length=n_steps)


def test_stationary_variance_matches_mil_sigma():
    """Sample variance of each gust component over 64 independent lanes x
    60 s must land on the spec sigma^2 (the filters' whole point). The
    longest correlation time at this condition is L_u/V ~ 6 s, so a 30 s
    burn-in + 60 s sample over 64 lanes gives ~600 effective samples —
    a ~6% standard error on the variance; assert within 25%."""
    harness = _FixedCondition()
    sim = Simulation(harness, dt=DT)
    W20 = 10.0
    lanes = 64
    states = jax.vmap(lambda i: _state(harness, seed=i, W20=W20))(
        jnp.arange(lanes, dtype=jnp.int32))

    n_burn, n_samp = 1500, 3000  # 30 s + 60 s

    @jax.jit
    def run(states):
        def burn(st, _):
            return jax.vmap(lambda s: sim.step(s, ()))(st), None
        states, _ = jax.lax.scan(burn, states, None, length=n_burn)

        def body(st, _):
            st = jax.vmap(lambda s: sim.step(s, ()))(st)
            g = jax.vmap(lambda s: harness.turb.gust(
                s.x, s.u, harness.V, harness.h))(st)
            return st, g
        _, gusts = jax.lax.scan(body, states, None, length=n_samp)
        return gusts  # (n_samp, lanes, 3)

    gusts = np.asarray(run(states))
    assert np.all(np.isfinite(gusts))

    _, _, _, s_u, s_v, s_w = scales(jnp.asarray(H_REF), jnp.asarray(W20))
    target = np.asarray([s_u, s_v, s_w]) ** 2
    var = gusts.reshape(-1, 3).var(axis=0)
    np.testing.assert_allclose(var, target, rtol=0.25)
    # zero-mean process
    mean = gusts.reshape(-1, 3).mean(axis=0)
    assert np.all(np.abs(mean) < 0.2 * np.sqrt(target))


def test_low_altitude_scales_follow_spec():
    """Spot-check the MIL-F-8785C low-altitude formulas (spec in feet):
    at h = 500 ft, W20 = 15 kt: L_w = 500 ft, L_u = L_v =
    500/(0.177+0.4115)^1.2, sigma_w = 0.1 W20,
    sigma_u = sigma_w/(0.5885)^0.4."""
    h_ft = 500.0
    W20 = 7.716  # 15 kt in m/s
    L_u, L_v, L_w, s_u, s_v, s_w = scales(jnp.asarray(h_ft * FT),
                                          jnp.asarray(W20))
    den = 0.177 + 0.000823 * h_ft
    np.testing.assert_allclose(float(L_w), h_ft * FT, rtol=1e-6)
    np.testing.assert_allclose(float(L_u), h_ft / den**1.2 * FT, rtol=1e-6)
    assert float(L_u) == float(L_v)
    np.testing.assert_allclose(float(s_w), 0.1 * W20, rtol=1e-6)
    np.testing.assert_allclose(float(s_u), 0.1 * W20 / den**0.4, rtol=1e-6)
    assert float(s_u) == float(s_v)


def test_streams_reproducible_and_independent():
    harness = _FixedCondition()
    sim = Simulation(harness, dt=DT)
    _, g_a = _gust_rollout(sim, harness, _state(harness, seed=7), 200)
    _, g_a2 = _gust_rollout(sim, harness, _state(harness, seed=7), 200)
    _, g_b = _gust_rollout(sim, harness, _state(harness, seed=8), 200)
    assert bool(jnp.all(g_a == g_a2))  # same seed -> bit-identical
    assert float(jnp.max(jnp.abs(g_a - g_b))) > 1e-3  # distinct stream


def test_w20_zero_is_exactly_off():
    harness = _FixedCondition()
    sim = Simulation(harness, dt=DT)
    _, gusts = _gust_rollout(sim, harness,
                             _state(harness, seed=3, W20=0.0), 300)
    assert bool(jnp.all(gusts == 0.0))


def test_vehicle_wiring_gusts_enter_airdata():
    """A bare 6-DOF Vehicle with turbulence: gusts show up in the airflow
    (TAS fluctuates around the no-wind value), the rollout is finite, and
    W20 = 0 reproduces the turbulence-free trajectory bit-exactly on the
    shared state leaves."""
    from flightjax.physics.aircraftbase import Vehicle, NoVehicleSystems
    from flightjax.physics.kinematics import WA, kin_init

    ic = kin_init(lat=0.7, lon=0.2, h=800.0, v_eb_n=[50.0, 0.0, 0.0])

    def build(turb):
        veh = Vehicle(NoVehicleSystems(mass=100.0), WA(),
                      turbulence=DrydenTurbulence(DT) if turb else None)
        x = veh.init_x(kin_init=ic)
        u = veh.init_u()
        s = veh.init_s(x=x)
        if turb:
            u["turb"] = dict(u["turb"], W20=jnp.asarray(8.0))
        st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                      x=x, u=u, s=s)
        return veh, Simulation(veh, dt=DT), st

    veh, sim, st = build(turb=True)
    final, ts = sim.run(st, t_end=5.0, save_every=5)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(
        final.x) if jnp.issubdtype(l.dtype, jnp.floating))
    TAS = np.asarray(ts.y.airflow.TAS)
    assert TAS.std() > 0.05  # gusts visibly modulate the airspeed

    # exact-off: W20=0 turbulence build == turbulence-free build on the
    # shared leaves (the gust adds exactly 0 to the wind)
    veh0, sim0, st0 = build(turb=False)
    u_off = dict(st.u, turb=dict(st.u["turb"], W20=jnp.asarray(0.0)))
    final_off, _ = sim.run(st._replace(u=u_off), t_end=2.0, save_y=False)
    final_ref, _ = sim0.run(st0, t_end=2.0, save_y=False)
    for k in ("kinematics", "dynamics"):
        a, b = final_off.x[k], final_ref.x[k]
        assert all(bool(jnp.all(x == y)) for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))


def test_discrete_gust_pulse_shape():
    """1-cosine pulse (CS 25.341(a) shape): zero before t0 and after
    t0 + 2T, amp/2 at the quarter points, exactly amp at the crest."""
    from flightjax.physics.turbulence import discrete_gust

    u = {"gust_amp": jnp.asarray([0.0, 0.0, 5.0]),
         "gust_t0": jnp.asarray(10.0), "gust_T": jnp.asarray(2.0)}
    g = lambda t: np.asarray(discrete_gust(u, jnp.asarray(t)))
    assert np.all(g(9.99) == 0.0) and np.all(g(14.01) == 0.0)
    np.testing.assert_allclose(g(12.0), [0.0, 0.0, 5.0], atol=1e-12)
    np.testing.assert_allclose(g(11.0)[2], 2.5, atol=1e-12)
    np.testing.assert_allclose(g(13.0)[2], 2.5, atol=1e-12)


def test_discrete_gust_through_engine():
    """A pure discrete gust (W20 = 0, no stochastic field) through the
    full vehicle: the trajectory is bit-identical to the no-gust build
    until t0, visibly disturbed through the pulse, and the gust input
    itself vanishes after t0 + 2T."""
    from flightjax.physics.aircraftbase import Vehicle, NoVehicleSystems
    from flightjax.physics.kinematics import WA, kin_init

    ic = kin_init(lat=0.7, lon=0.2, h=800.0, v_eb_n=[50.0, 0.0, 0.0])
    veh = Vehicle(NoVehicleSystems(mass=100.0), WA(),
                  turbulence=DrydenTurbulence(DT))
    sim = Simulation(veh, dt=DT)

    def run_to(u_turb, t_end):
        x = veh.init_x(kin_init=ic)
        u = veh.init_u()
        u["turb"] = dict(u["turb"], **u_turb)
        st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                      x=x, u=u, s=veh.init_s(x=x))
        return sim.run(st, t_end=t_end, save_every=5)

    gust = {"gust_amp": jnp.asarray([0.0, 0.0, 4.0]),
            "gust_t0": jnp.asarray(1.0), "gust_T": jnp.asarray(0.5)}
    f_g, ts_g = run_to(gust, 3.0)
    f_0, ts_0 = run_to({}, 3.0)

    TAS_g = np.asarray(ts_g.y.airflow.TAS)
    TAS_0 = np.asarray(ts_0.y.airflow.TAS)
    t = np.asarray(ts_g.t)
    pre = t < 1.0
    assert np.array_equal(TAS_g[pre], TAS_0[pre])  # bit-identical before t0
    during = (t > 1.2) & (t < 1.8)
    # a 4 m/s vertical gust on a 50 m/s airstream moves |v| only
    # quadratically (~0.16 m/s direct), but the disturbed free-body
    # trajectory separates visibly — demand a clear fraction of that
    assert np.max(np.abs(TAS_g[during] - TAS_0[during])) > 0.5
    # the input is exactly zero again after the pulse (states differ — the
    # vehicle was disturbed — but the forcing is gone)
    from flightjax.physics.turbulence import discrete_gust
    u_after = dict(veh.init_u()["turb"], **gust)
    assert np.all(np.asarray(discrete_gust(u_after, jnp.asarray(2.5))) == 0)


def test_shear_profile_values():
    """Log boundary-layer shear (MIL-F-8785C 3.7.3.1): multiplier 1 at the
    20 ft reference, ln-ratio above, clamped to 0 at the roughness length,
    and exactly 1 everywhere when disabled (z0 <= 0)."""
    from flightjax.physics.turbulence import shear_scale

    u = {"shear_z0_ft": jnp.asarray(0.15)}
    k = lambda h_ft: float(shear_scale(u, jnp.asarray(h_ft * FT)))
    np.testing.assert_allclose(k(20.0), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k(100.0),
                               np.log(100 / 0.15) / np.log(20 / 0.15),
                               rtol=1e-6)
    assert 0.0 <= k(0.1) < 1e-5  # below z0: clamped to ~0, never negative
    u_off = {"shear_z0_ft": jnp.asarray(0.0)}
    assert float(shear_scale(u_off, jnp.asarray(500.0))) == 1.0


def test_shear_scales_mean_wind_in_airdata():
    """With shear enabled the horizontal mean wind seen by the airdata
    follows the log profile (the wind input is the 20-ft wind); the
    vertical component is untouched."""
    from flightjax.physics.aircraftbase import Vehicle, NoVehicleSystems
    from flightjax.physics.kinematics import WA, kin_init
    from flightjax.physics.turbulence import shear_scale

    h = 150.0  # m AGL (terrain at 0 elevation, orthometric ~ this test's h)
    veh = Vehicle(NoVehicleSystems(mass=100.0), WA(),
                  turbulence=DrydenTurbulence(DT))
    ic = kin_init(lat=0.0, lon=0.0, h=h, h_datum="orthometric",
                  v_eb_n=[50.0, 0.0, 0.0])
    x = veh.init_x(kin_init=ic)
    u = veh.init_u()
    u["atm"] = dict(u["atm"], wind=jnp.asarray([6.0, 2.0, 0.7]))
    u["turb"] = dict(u["turb"], shear_z0_ft=jnp.asarray(0.15))
    s = veh.init_s(x=x)
    _, y = veh.f_ode(x, u, s, 0.0)
    k = float(shear_scale(u["turb"], y.kinematics.h_o))
    assert k > 1.2  # ~490 ft AGL: well above the 20-ft reference
    np.testing.assert_allclose(np.asarray(y.airflow.v_ew_n),
                               [6.0 * k, 2.0 * k, 0.7], rtol=1e-6)


def test_dt_mismatch_rejected():
    """A DrydenTurbulence whose noise-hold interval differs from the
    engine step would silently rescale every gust variance — the
    Simulation must reject the pairing at construction."""
    from flightjax.physics.aircraftbase import Vehicle, NoVehicleSystems
    from flightjax.physics.kinematics import WA

    veh = Vehicle(NoVehicleSystems(), WA(), turbulence=DrydenTurbulence(0.02))
    with pytest.raises(ValueError, match="does not match"):
        Simulation(veh, dt=0.01)
    Simulation(veh, dt=0.02)  # matching dt constructs fine


def test_shear_gradient_finite_on_ground():
    """With shear disabled (the default) and the vehicle on the ground
    (h_agl <= 0), shear_scale must stay differentiable: log(0) in the
    untaken where-branch would poison reverse-mode gradients through
    diffsim/linearize."""
    from flightjax.physics.turbulence import shear_scale

    def f(h):
        return shear_scale({"shear_z0_ft": jnp.asarray(0.0)}, h)

    for h in (0.0, -0.4, 5.0):
        v, g = jax.value_and_grad(f)(jnp.asarray(h))
        assert float(v) == 1.0 and np.isfinite(float(g))
    # and with shear on, gradients stay finite at/below the clamp too
    def f_on(h):
        return shear_scale({"shear_z0_ft": jnp.asarray(0.15)}, h)
    for h in (0.0, 0.02, 100.0):
        _, g = jax.value_and_grad(f_on)(jnp.asarray(h))
        assert np.isfinite(float(g))


def test_c172_builder_passthrough():
    """`c172s.build_vehicle(turbulence=...)` threads the gust model through
    the full aircraft: the turb states ride in the vehicle x tree, a
    gusty step stays finite, and `fleet.monte_carlo_c172` hands every lane
    its own noise stream."""
    from flightjax.models.c172 import c172s
    from flightjax.physics.kinematics import kin_init
    from flightjax.parallel import fleet

    veh = c172s.build_vehicle("wa", turbulence=DrydenTurbulence(DT))
    ic = kin_init(lat=0.7, lon=0.2, h=1000.0, v_eb_n=[50.0, 0.0, 0.0])
    x = veh.init_x(kin_init=ic)
    assert "turb" in x
    u = veh.init_u()
    u["turb"] = dict(u["turb"], W20=jnp.asarray(10.0))
    s = veh.init_s(x=x)
    sim = Simulation(veh, dt=DT)
    st = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, jnp.int32),
                  x=x, u=u, s=s)
    st = sim.step(st, ())
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree.leaves(st.x)
               if jnp.issubdtype(l.dtype, jnp.floating))

    # fleet randomization: per-lane turbulence seeds
    wrapped = SimState(t=st.t, i=st.i, x={"vehicle": st.x},
                       u={"vehicle": st.u},
                       s={"vehicle": st.s, "terminated": jnp.asarray(False)})
    fl = fleet.broadcast_state(wrapped, 4)
    fl0 = fleet.monte_carlo_c172(fl, jax.random.PRNGKey(0))
    seeds = fl0.u["vehicle"]["turb"]["seed"]
    assert seeds.shape == (4,) and len(set(np.asarray(seeds).tolist())) == 4
    # seeds derive from the key: two fleets randomized with different keys
    # draw disjoint gust streams (pooled exceedance statistics stay valid)
    fl1 = fleet.monte_carlo_c172(fl, jax.random.PRNGKey(1))
    seeds1 = fl1.u["vehicle"]["turb"]["seed"]
    assert not np.array_equal(np.asarray(seeds), np.asarray(seeds1))


pytestmark = pytest.mark.fast
