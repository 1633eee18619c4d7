"""Landing gear unit tests (mirrors `test_landing_gear.jl` behaviors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.ops import geodesy as geo
from flightjax.physics.landinggear import (
    LandingGearUnit, SimpleDamper, damper_force, mu_roll, mu_skid)
from flightjax.physics.kinematics import kin_init, kin_data_from_init
from flightjax.physics.terrain import HorizontalTerrain, DRY_TARMAC, ICY_TARMAC


def make_unit(**kw):
    kw.setdefault("r_bs", [0.0, 0.0, 1.9])
    kw.setdefault("damper", SimpleDamper(k_s=25000, k_d_ext=1000, k_d_cmp=1000))
    return LandingGearUnit(**kw)


def kin_at_height(h_strut_above_gnd, v_eb_n=(0.0, 0.0, 0.0), psi=0.0):
    """KinData with the strut origin (1.9 m below Ob) at the given height
    above a zero-elevation terrain."""
    h_e_gnd = float(geo.ellip_from_orth(0.0, jnp.asarray([1.0, 0.0, 0.0])))
    ic = kin_init(euler=(psi, 0.0, 0.0), h=h_e_gnd + 1.9 + h_strut_above_gnd,
                  v_eb_n=np.asarray(v_eb_n, dtype=float))
    return kin_data_from_init(ic)


TRN = HorizontalTerrain(0.0)


def run_ode(unit, kin, x=None, u=None):
    x = unit.init_x() if x is None else x
    u = unit.init_u() if u is None else u
    trn = TRN.terrain_data(TRN.init_u())
    return unit.f_ode(x, u, None, 0.0, kin, trn)


def test_damper():
    d = SimpleDamper(k_s=100.0, k_d_ext=10.0, k_d_cmp=20.0)
    assert float(damper_force(d, -0.1, 0.0)) == pytest.approx(10.0)
    assert float(damper_force(d, 0.0, -1.0)) == pytest.approx(20.0)
    assert float(damper_force(d, 0.0, 1.0)) == pytest.approx(-10.0)


def test_friction_blend():
    assert float(mu_roll(0.0)) == pytest.approx(0.03)
    assert float(mu_roll(1.0)) == pytest.approx(0.02)
    assert float(mu_skid(DRY_TARMAC, 0.0)) == pytest.approx(0.75)
    assert float(mu_skid(ICY_TARMAC, 1.0)) == pytest.approx(0.025)


def test_airborne_defaults():
    unit = make_unit()
    _, y = run_ode(unit, kin_at_height(5.0))
    assert not bool(y.strut.wow)
    assert float(y.strut.delta_h) == pytest.approx(5.0, abs=1e-6)
    np.testing.assert_allclose(np.asarray(y.contact.wr_b.F), 0.0)
    np.testing.assert_allclose(np.asarray(y.contact.wr_b.tau), 0.0)
    assert not bool(y.crashed)
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(y._replace(trn=None)
        if hasattr(y, "trn") else y)[0])))


def test_ground_contact_normal_force():
    unit = make_unit()
    _, y = run_ode(unit, kin_at_height(-0.10))  # 10 cm compression
    assert bool(y.strut.wow)
    assert float(y.strut.xi) == pytest.approx(-0.10, abs=1e-6)
    # damper pushes down along strut z -> reaction force on body is upward
    assert float(y.strut.F_dmp_zs) == pytest.approx(2500.0, rel=1e-3)
    F_b = np.asarray(y.contact.wr_b.F)
    assert F_b[2] < -2000  # upward (negative z in body axes, level attitude)


def test_friction_opposes_motion():
    unit = make_unit()
    x = unit.init_x()
    kin = kin_at_height(-0.05, v_eb_n=(5.0, 0.0, 0.0))
    # run a few friction-regulator updates (forward Euler on the PI state)
    for _ in range(50):
        xd, y = run_ode(unit, kin, x=x)
        x = jax.tree.map(lambda a, b: a + 0.01 * b, x, xd)
    _, y = run_ode(unit, kin, x=x)
    F_b = np.asarray(y.contact.wr_b.F)
    assert F_b[0] < -10.0  # friction decelerates forward rolling


def test_braking_increases_drag():
    roll = make_unit()
    brake = make_unit(braking={"eta_br": 1.0})
    kin = kin_at_height(-0.05, v_eb_n=(5.0, 0.0, 0.0))

    def settle(unit, u):
        x = unit.init_x()
        for _ in range(100):
            xd, _ = run_ode(unit, kin, x=x, u=u)
            x = jax.tree.map(lambda a, b: a + 0.01 * b, x, xd)
        _, y = run_ode(unit, kin, x=x, u=u)
        return float(y.contact.wr_b.F[0])

    u_roll = roll.init_u()
    u_brake = {"steering": jnp.asarray(0.0), "braking": jnp.asarray(1.0)}
    # braking multiplies the longitudinal friction budget
    assert abs(settle(brake, u_brake)) > 3 * abs(settle(roll, u_roll))


def test_steering_rotates_contact_frame():
    unit = make_unit(steering={"psi_max": np.pi / 6})
    u = {"steering": jnp.asarray(1.0), "braking": jnp.asarray(0.0)}
    _, y = run_ode(unit, kin_at_height(-0.05), u=u)
    assert float(y.strut.psi_sw) == pytest.approx(np.pi / 6, abs=1e-9)


def test_crash_flag_on_fast_compression():
    unit = make_unit()
    kin = kin_at_height(-0.05, v_eb_n=(0.0, 0.0, 15.0))  # 15 m/s sink
    _, y = run_ode(unit, kin)
    assert bool(y.crashed)


def test_frc_reset_when_airborne():
    unit = make_unit()
    x = {"frc": jnp.asarray([0.5, -0.3])}
    trn = TRN.terrain_data(TRN.init_u())
    x2, _ = unit.f_step(x, unit.init_u(), None, 0.0, kin_at_height(2.0), trn)
    np.testing.assert_allclose(np.asarray(x2["frc"]), 0.0)
    x3, _ = unit.f_step(x, unit.init_u(), None, 0.0, kin_at_height(-0.05), trn)
    np.testing.assert_allclose(np.asarray(x3["frc"]), [0.5, -0.3])


def test_jit_and_grad_clean():
    unit = make_unit()
    trn = TRN.terrain_data(TRN.init_u())

    @jax.jit
    def total_fz(h):
        kin = kin_data_from_init(kin_init(h=h))
        _, y = unit.f_ode(unit.init_x(), unit.init_u(), None, 0.0, kin, trn)
        return y.contact.wr_b.F[2]

    h_gnd = float(geo.ellip_from_orth(0.0, jnp.asarray([1.0, 0.0, 0.0])))
    g = jax.grad(total_fz)(h_gnd + 1.9 - 0.05)
    assert np.isfinite(float(g))
    g_air = jax.grad(total_fz)(h_gnd + 10.0)
    assert float(g_air) == 0.0  # airborne: no ground force sensitivity


def test_gearset_per_leg_matches_vmapped():
    """GearSet.f_ode_leg / strut_y_leg (the fine Pallas split path) must be
    bit-identical to the vmapped 3-leg evaluation."""
    from flightjax.models.c172.common import make_ldg

    ldg = make_ldg()
    kin = kin_at_height(-0.3, v_eb_n=(2.0, 0.3, 0.0), psi=0.1)
    trn = TRN.terrain_data(TRN.init_u())
    x = {"frc": jnp.asarray([[0.1, -0.2], [0.0, 0.05], [-0.1, 0.0]])}
    u = {"steering": jnp.asarray([0.0, 0.0, 0.3]),
         "braking": jnp.asarray([0.6, 0.4, 0.0])}

    xd_ref, y_ref = ldg.f_ode(x, u, 0.0, kin, trn)
    sy_ref = ldg.strut_y(x, u, 0.0, kin, trn)

    for i in range(ldg.n):
        frc_dot, wr = ldg.f_ode_leg(i, x["frc"][i], u["steering"][i],
                                    u["braking"][i], 0.0, kin, trn)
        assert bool(jnp.all(frc_dot == xd_ref["frc"][i]))
        assert bool(jnp.all(wr.F == y_ref.contact.wr_b.F[i]))
        assert bool(jnp.all(wr.tau == y_ref.contact.wr_b.tau[i]))

        sy = ldg.strut_y_leg(i, u["steering"][i], u["braking"][i], kin,
                             trn)
        assert bool(sy.wow == sy_ref.wow[i])
        assert bool(jnp.all(sy.alpha_ts == sy_ref.alpha_ts[i]))
        assert bool(jnp.all(sy.xi_dot == sy_ref.xi_dot[i]))


def test_strut_perturbation_matches_exact_geodesy():
    """`strut_y` computes the wheel-endpoint geodetic solution as a
    first-order perturbation of the vehicle's (n_e, h_e) instead of a
    second Fukushima solve + forward transform per leg
    (`landinggear.jl:228-255` does the exact transforms). The curvature
    error over the ~2-4 m lever arm must stay below 1e-5 m — orders of
    magnitude under the contact-dynamics scale."""
    from flightjax.ops.quaternions import qmul, qrot
    from flightjax.physics.landinggear import E3

    unit = make_unit(steering={"psi_max": np.pi / 6})
    trn = TRN.terrain_data(TRN.init_u())
    h_e_gnd = geo.ellip_from_orth(0.0, geo.nvector_from_latlon(0.83, 0.228))

    # mid-latitude (~LOWS), banked+pitched attitude so the lever arm has
    # horizontal components, slight compression so wow=True
    ic = kin_init(lat=0.83, lon=0.228, h=float(h_e_gnd) + 1.9 - 0.08,
                  euler=(0.7, 0.06, -0.04), v_eb_n=np.asarray([3.0, 1.0, 0.1]))
    kin = kin_data_from_init(ic)
    u = {"steering": jnp.asarray(0.4), "braking": jnp.asarray(0.2)}

    strut = unit.strut_y(u, kin, trn)
    assert bool(strut.wow)

    # exact two-transform geometry, inline (the form strut_y replaced)
    q_bs = jnp.asarray(unit.q_bs)
    r_bs_b = jnp.asarray(unit.r_bs, jnp.float64)
    ks_e = qrot(qmul(kin.q_eb, q_bs), jnp.asarray(E3))
    r_bs_e = qrot(kin.q_eb, r_bs_b)
    r_ew0_e = kin.r_eb_e + r_bs_e + unit.l_0 * ks_e
    n_e_w0, h_e_w0 = geo.geographic_from_cartesian(r_ew0_e)
    h_e_trn = trn.elevation + (kin.h_e - kin.h_o)
    delta_h_exact = h_e_w0 - h_e_trn
    r_et_e = geo.cartesian_from_geographic(n_e_w0, h_e_trn)
    r_st_e_exact = r_et_e - (kin.r_eb_e + r_bs_e)
    r_st_e_pert = unit.l_0 * ks_e - strut.delta_h * kin.n_e

    assert abs(float(strut.delta_h - delta_h_exact)) < 1e-5
    np.testing.assert_allclose(np.asarray(r_st_e_pert),
                               np.asarray(r_st_e_exact), atol=1e-5)

    # and the quantities dynamics consumes agree through the full chain
    ut_e = qrot(kin.q_en, trn.normal)
    l_exact = jnp.dot(ut_e, r_st_e_exact) / jnp.dot(ut_e, ks_e)
    xi_exact = jnp.minimum(0.0, l_exact - unit.l_0)
    assert abs(float(strut.xi - xi_exact)) < 1e-5
    _, y = run_ode(unit, kin, u=u)
    assert np.all(np.isfinite(np.asarray(y.contact.wr_b.F)))

    # f32 robustness: the perturbation form never subtracts ~6.4e6 m ECEF
    # coordinates to get a ~0.1 m result, so single-precision strut
    # geometry stays at h_e-ulp accuracy (~1e-4 m) instead of the ~0.5 m
    # cancellation noise of the two-transform form — this is what makes
    # ground contact usable on the f32 fleet fast path.
    kin32 = jax.tree.map(
        lambda a: a.astype(jnp.float32)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, kin)
    trn32 = jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float32)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, trn)
    u32 = jax.tree.map(lambda a: a.astype(jnp.float32), u)
    strut32 = unit.strut_y(u32, kin32, trn32)
    assert abs(float(strut32.delta_h) - float(strut.delta_h)) < 1e-3
    assert abs(float(strut32.xi) - float(strut.xi)) < 1e-3


pytestmark = pytest.mark.fast
