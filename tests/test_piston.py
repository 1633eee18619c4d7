"""Piston engine tests against digitized IO-360 charts
(mirrors `test_piston.jl:58-127` truth values) plus FSM/coupling behaviors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.physics import piston as PE
from flightjax.physics.atmosphere import (SimpleAtmosphere, air_data, isa_data,
                                          P_STD)
from flightjax.physics.kinematics import kin_init, kin_data_from_init
from flightjax.physics.propellers import Propeller, generate_lookup


def inHg2Pa(p):
    return 3386.389 * p


def ft2m(h):
    return 0.3048 * h


def h2delta(h):
    T, p = isa_data(jnp.asarray(h))[:2]
    return float(p / P_STD / np.sqrt(T / 288.15))


@pytest.fixture(scope="module")
def tables():
    return PE._build_tables(0.15, 1.4)


W_RATED = 2700.0
P_RATED = 200.0  # hp, chart units


def test_delta_wot(tables):
    dw = tables["delta_wot"]
    cases = [(1800, 20, 9500), (2700, 22, 7000), (2100, 16, 15250),
             (2300, 12, 22000)]
    for rpm, map_inhg, h_ft in cases:
        got = float(dw(rpm / W_RATED, inHg2Pa(map_inhg) / P_STD))
        assert got == pytest.approx(h2delta(ft2m(h_ft)), abs=0.1)


def test_pi_std(tables):
    ps = tables["pi_std"]
    cases = [(1800, 20, 71), (2050, 24, 113), (2400, 17, 85), (2400, 28.8, 176)]
    for rpm, map_inhg, hp in cases:
        got = float(ps(rpm / W_RATED, inHg2Pa(map_inhg) / P_STD)) * P_RATED
        assert got == pytest.approx(hp, abs=1)


def test_pi_wot(tables):
    pw = tables["pi_wot"]
    cases = [(1800, 3e3, 108), (2300, 2.4e3, 153), (2500, 10e3, 129),
             (2000, 20e3, 65)]
    for rpm, h_ft, hp in cases:
        got = float(pw(rpm / W_RATED, h2delta(ft2m(h_ft)))) * P_RATED
        assert got == pytest.approx(hp, abs=3)


def test_pi_isa_pow(tables):
    f = lambda n, mu, d: float(PE.compute_pi_isa_pow(tables, n, mu, d))
    n_stall = 0.15
    assert f(n_stall, 0.0, 1.0) == pytest.approx(0.0, abs=1e-9)
    assert f(0.5 * n_stall, 0.5, 1.0) == pytest.approx(0.0, abs=1e-9)
    assert f(1.5 * n_stall, 0.5, 1.0) > f(1.5 * n_stall, 0.3, 1.0)
    assert 71 < f(1800 / W_RATED, inHg2Pa(20) / P_STD,
                  h2delta(ft2m(3e3))) * P_RATED < 84
    assert 131 < f(2310 / W_RATED, inHg2Pa(23.6) / P_STD,
                   h2delta(ft2m(2.4e3))) * P_RATED < 139
    assert 102 < f(2500 / W_RATED, inHg2Pa(18) / P_STD,
                   h2delta(ft2m(10e3))) * P_RATED < 119


# ---------------------------------------------------------------- engine FSM

def _air():
    kin = kin_data_from_init(kin_init(h=0.0, v_eb_n=(50.0, 0.0, 0.0)))
    atm = SimpleAtmosphere()
    return air_data(atm.atmospheric_data(atm.init_u(), kin.n_e, kin.h_o), kin), kin


def test_engine_fsm():
    eng = PE.PistonEngine()
    x, u, s = eng.init_x(), eng.init_u(), eng.init_s()
    # off + start -> starting
    _, s = eng.f_step(x, {**u, "start": jnp.asarray(True)}, s, 0.0)
    assert int(s["state"]) == PE.ENG_STARTING
    # starting at speed + fuel -> running
    x_fast = {**x, "omega": jnp.asarray(eng.omega_idle * 1.5)}
    _, s = eng.f_step(x_fast, {**u, "start": jnp.asarray(True)}, s, 0.0)
    assert int(s["state"]) == PE.ENG_RUNNING
    # running + no fuel -> off
    _, s = eng.f_step(x_fast, u, s, 0.0, fuel_available=False)
    assert int(s["state"]) == PE.ENG_OFF
    # starting + start released -> off
    s = eng.init_s(PE.ENG_STARTING)
    _, s = eng.f_step(x, u, s, 0.0)
    assert int(s["state"]) == PE.ENG_OFF


def test_engine_running_power():
    eng = PE.PistonEngine()
    air, _ = _air()
    x = eng.init_x(n_eng=0.75)
    u = {**eng.init_u(), "throttle": jnp.asarray(0.65)}
    s = eng.init_s(PE.ENG_RUNNING)
    x_dot, y = eng.f_ode(x, u, s, 0.0, air)
    assert float(y.P_shaft) > 50e3          # tens of kW at 65% throttle
    assert float(y.tau_shaft) > 0
    assert float(y.mdot) > 0
    assert float(y.MAP) < float(air.p)      # part throttle
    # unloaded engine at positive torque accelerates
    assert float(x_dot["omega"]) > 0


def test_engine_off_friction():
    eng = PE.PistonEngine()
    air, _ = _air()
    x = eng.init_x(n_eng=0.2)
    s = eng.init_s(PE.ENG_OFF)
    # let the friction PI integrate against the spinning shaft
    for _ in range(100):
        x_dot, y = eng.f_ode(x, eng.init_u(), s, 0.0, air)
        x = jax.tree.map(lambda a, b: a + 0.01 * b, x, x_dot)
    _, y = eng.f_ode(x, eng.init_u(), s, 0.0, air)
    assert float(y.tau_shaft) < 0           # friction opposes rotation
    assert float(y.P_shaft) == 0.0
    assert float(y.mdot) == 0.0


def test_thruster_coupling():
    lookup = generate_lookup(cache="flightjax/data/c172_prop_2blade.npz")
    prop = Propeller(lookup, sense=PE.CW, d=2.0, J_xx=0.3,
                     r_bp=[2.055, 0, 0.833])
    thr = PE.PistonThruster(PE.PistonEngine(), prop)
    air, kin = _air()
    x = thr.init_x(n_eng=0.75)
    u = thr.init_u()
    u["engine"]["throttle"] = jnp.asarray(0.65)
    s = thr.init_s(PE.ENG_RUNNING)
    x_dot, y = thr.f_ode(x, u, s, 0.0, air, kin)
    # propeller load reduces net shaft acceleration vs unloaded engine
    eng_dot_unloaded, _ = thr.engine.f_ode(x["engine"], u["engine"],
                                           s["engine"], 0.0, air)
    assert float(x_dot["engine"]["omega"]) < float(eng_dot_unloaded["omega"])
    assert float(y.propeller.wr_b.F[0]) > 500.0  # thrust


pytestmark = pytest.mark.fast
