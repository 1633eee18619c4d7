"""Cessna 172S end-to-end tests (mirrors `test_c172s.jl`: trim success +
post-trim sanity, 10 s elevator-step response, NED linearization)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.core.sim import Simulation, SimState
from flightjax.models.c172 import c172s, common as C172
from flightjax.physics import piston as PE


@pytest.fixture(scope="module")
def trimmed():
    vehicle = c172s.build_vehicle("wa")
    x, u, s, ts, rnorm = c172s.trim(vehicle)
    return vehicle, x, u, s, ts, float(rnorm)


@pytest.mark.fast
def test_trim_converges(trimmed):
    vehicle, x, u, s, ts, rnorm = trimmed
    assert rnorm < 1e-10

    x_dot, y = vehicle.f_ode(x, u, s, 0.0)
    # post-trim sanity (`c172s.jl:255-262`)
    assert not bool(np.any(np.asarray(y.systems.ldg.strut.wow)))
    assert float(x["systems"]["pwp"]["engine"]["omega"]) > \
        vehicle.systems.pwp.engine.omega_idle
    assert abs(float(x_dot["systems"]["aero"]["alpha_filt"])) < 1e-10
    assert abs(float(x_dot["systems"]["aero"]["beta_filt"])) < 1e-10
    # level unaccelerated flight
    assert float(y.airflow.EAS) == pytest.approx(50.0, abs=1e-6)
    np.testing.assert_allclose(np.asarray(x_dot["dynamics"]["v_eb_b"]), 0.0,
                               atol=1e-9)


@pytest.mark.fast
def test_trim_state_plausible(trimmed):
    _, _, _, _, ts, _ = trimmed
    assert 0.0 < float(ts.alpha_a) < 0.09      # below stall onset
    assert 0.3 < float(ts.throttle) < 0.9
    assert 0.6 < float(ts.n_eng) < 1.0
    assert abs(float(ts.phi_nb)) < 0.05


def test_elevator_step_10s(trimmed):
    vehicle, x, u, s, ts, _ = trimmed
    world = c172s.flagship_world("wa")
    # rebuild world-level containers around the vehicle trim
    state = SimState(t=jnp.asarray(0.0), i=jnp.asarray(0, dtype=jnp.int32),
                     x={"vehicle": x}, u={"vehicle": u},
                     s={"vehicle": s, "terminated": jnp.asarray(False)})
    sim = Simulation(world, dt=0.02)

    # elevator step (+0.1 from trim)
    act = dict(state.u["vehicle"]["systems"]["act"])
    act["elevator"] = act["elevator"] + 0.1
    state = state._replace(u={"vehicle": dict(
        state.u["vehicle"], systems=dict(state.u["vehicle"]["systems"],
                                         act=act))})

    final, ts_log = sim.run(state, t_end=10.0, save_every=10)
    leaves = jax.tree.leaves(final)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert not bool(final.s["terminated"])

    _, y0 = vehicle.f_ode(x, u, s, 0.0)
    _, yf = vehicle.f_ode(final.x["vehicle"], final.u["vehicle"],
                          final.s["vehicle"], 10.0)
    # nose-up elevator step -> climb + slower airspeed
    assert float(yf.kinematics.h_e) > float(y0.kinematics.h_e) + 5.0
    assert float(yf.airflow.TAS) < float(y0.airflow.TAS)
    # engine still running
    assert int(final.s["vehicle"]["systems"]["pwp"]["engine"]["state"]) == \
        PE.ENG_RUNNING


@pytest.fixture(scope="module")
def lss():
    out, ts, rnorm = c172s.linearize_ned()
    assert rnorm < 1e-10
    return out


def test_linearize_shapes(lss):
    assert lss.A.shape == (16, 16)
    assert lss.B.shape == (16, 4)
    assert lss.C.shape == (33, 16)
    assert lss.D.shape == (33, 4)
    assert np.all(np.isfinite(lss.A)) and np.all(np.isfinite(lss.B))
    # trim point: x_dot ~ 0 for the dynamic states (lon drifts only through
    # earth rotation terms; all true derivatives vanish)
    assert np.max(np.abs(lss.x_dot0[:9])) < 1e-8


def test_linearized_modes(lss):
    """The full 16-state model must show the classic airframe mode set:
    short period, dutch roll, and phugoid oscillatory pairs, all stable."""
    eig = np.linalg.eigvals(lss.A)
    osc = sorted([e for e in eig if e.imag > 1e-6], key=lambda e: -abs(e))
    assert len(osc) >= 3, f"expected >=3 oscillatory modes, got {eig}"
    sp, dr, ph = osc[0], osc[1], osc[-1]
    assert 4.0 < abs(sp) < 15.0       # short period
    assert 1.0 < abs(dr) < 5.0        # dutch roll
    assert 0.05 < abs(ph) < 0.6       # phugoid: slow, lightly damped
    assert all(m.real < 0 for m in (sp, dr, ph))  # all stable


def test_linearize_cached_pass_tracks_trim_point(lss):
    """The jitted Jacobian pass is cached across calls (cache_key); a second
    linearization at a different trim point must reuse the compiled pass yet
    produce that point's own matrices — guards the captures contract (the
    trim point rides as traced args, never baked into the trace)."""
    from flightjax.physics import linearization as L
    assert "c172s_ned" in L._JAC_CACHE
    t0 = time.time()
    lss2, _, rnorm2 = c172s.linearize_ned(
        C172.trim_parameters(EAS=40.0, h=2000.0))
    warm_s = time.time() - t0
    assert rnorm2 < 1e-8
    # different point -> different dynamics (short-period stiffness scales
    # with dynamic pressure, so A must move)
    assert np.max(np.abs(lss2.A - lss.A)) > 1e-2
    # the new point's airspeed shows up in its own trim state, not the old
    eas_i = lss2.y_labels.index("EAS")
    assert abs(float(lss2.y0[eas_i]) - 40.0) < 0.5
    assert abs(float(lss.y0[eas_i]) - 50.0) < 0.5
    # warm call = no recompile: seconds, not minutes
    assert warm_s < 30.0


def test_elevator_pitch_sign(lss):
    """Positive stick (elevator input up) must pitch up: the q-row entry of
    B for the elevator must be positive (act.elevator -> aero.e inversion,
    `c172s.jl:39-44`)."""
    qi = lss.x_labels.index("q")
    ei = lss.u_labels.index("elevator")
    assert lss.B[qi, ei] > 0.1


def test_aero_bundle_matches_per_table():
    """The bundled (one-matmul) aero coefficient path must agree with the
    per-table lookups to summation-order roundoff, and the algebraic
    CD_beta/CD_de forms must be exact inside their guaranteed input
    domains (beta clipped to ±0.2; |de| <= 0.489 rad from de_range)."""
    rng = np.random.default_rng(11)
    B = 257
    args = dict(
        alpha=jnp.asarray(rng.uniform(-0.2, 0.5, B)),
        beta=jnp.asarray(rng.uniform(-0.4, 0.4, B)),
        p_nd=jnp.asarray(rng.normal(0, 0.05, B)),
        q_nd=jnp.asarray(rng.normal(0, 0.05, B)),
        r_nd=jnp.asarray(rng.normal(0, 0.05, B)),
        da=jnp.asarray(rng.uniform(-0.35, 0.35, B)),
        dr=jnp.asarray(rng.uniform(-0.28, 0.28, B)),
        de=jnp.asarray(rng.uniform(-0.489, 0.401, B)),
        df=jnp.asarray(rng.uniform(0, 0.53, B)),
        alpha_dot_nd=jnp.asarray(rng.normal(0, 0.02, B)),
        beta_dot_nd=jnp.asarray(rng.normal(0, 0.1, B)),
        dh_nd=jnp.asarray(rng.uniform(0, 1.2, B)),
        stall=jnp.asarray(rng.integers(0, 2, B), float),
    )
    shipped = C172._BUNDLE_AERO
    try:
        C172._BUNDLE_AERO = False
        b = C172.get_aero_coeffs(**args)
        for mode in ("small", "all"):
            C172._BUNDLE_AERO = mode
            a = C172.get_aero_coeffs(**args)
            for f in a._fields:
                np.testing.assert_allclose(np.asarray(getattr(a, f)),
                                           np.asarray(getattr(b, f)),
                                           rtol=0, atol=5e-15)
    finally:
        C172._BUNDLE_AERO = shipped
    # algebraic CD_beta/CD_de vs the tables they replace (the hat-weight
    # path rounds 1-(1-x) at ~2e-16 rel; the algebraic form is exact)
    T = C172.AERO_TABLES
    beta = jnp.clip(args["beta"], -0.2, 0.2)
    np.testing.assert_allclose(np.asarray(0.17 * jnp.abs(beta)),
                               np.asarray(T["CD_beta"](beta)),
                               rtol=1e-13, atol=0)
    np.testing.assert_allclose(np.asarray(0.06 * jnp.abs(args["de"])),
                               np.asarray(T["CD_de"](args["de"])),
                               rtol=1e-13, atol=0)
