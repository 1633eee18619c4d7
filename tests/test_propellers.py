"""Propeller tests (mirrors `test_propellers.jl`: cL_alpha finite-diff
cross-check, coefficient sanity, runtime wrench direction)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.physics import propellers as P
from flightjax.physics.atmosphere import (SimpleAtmosphere, air_data)
from flightjax.physics.kinematics import kin_init, kin_data_from_init

CACHE = "flightjax/data/c172_prop_2blade.npz"


def test_airfoil_cL_alpha_consistency():
    """cL_alpha must match d(cL)/d(alpha) (`test_propellers.jl:26-50`)."""
    h = 1e-7
    for M in (0.0, 0.5, 0.9, 1.3):
        for alpha in (-0.1, 0.0, 0.1, 0.2, 0.3):
            fd = (P.airfoil_cL(alpha + h, M) - P.airfoil_cL(alpha - h, M)) / (2 * h)
            assert P.airfoil_cL_alpha(alpha, M) == pytest.approx(fd, abs=1e-4)


@pytest.fixture(scope="module")
def lookup():
    return P.generate_lookup(cache=CACHE)


def test_coefficient_sanity(lookup):
    # static thrust positive, torque negative (CW), efficiency in [0, 1)
    C0 = np.asarray(lookup(0.0, 0.3, 0.0))
    assert C0[0] > 0 and C0[1] < 0
    eta = np.asarray(lookup.values[..., 5])
    assert eta.min() >= 0.0 and eta.max() < 1.0
    # thrust falls off with advance ratio
    assert float(lookup(1.2, 0.3, 0.0)[0]) < float(lookup(0.2, 0.3, 0.0)[0])


def _air_kin(TAS=50.0):
    kin = kin_data_from_init(kin_init(h=1000.0, v_eb_n=(TAS, 0.0, 0.0)))
    atm = SimpleAtmosphere()
    return air_data(atm.atmospheric_data(atm.init_u(), kin.n_e, kin.h_o), kin), kin


def test_runtime_wrench(lookup):
    prop = P.Propeller(lookup, sense=P.CW, d=1.9, J_xx=0.3,
                       r_bp=[2.055, 0, 0.833])
    air, kin = _air_kin(TAS=50.0)
    omega = 2700 * np.pi / 30  # rated speed
    y = prop.output({}, kin, air, jnp.asarray(omega))
    F = np.asarray(y.wr_p.F)
    tau = np.asarray(y.wr_p.tau)
    assert F[0] > 500.0          # forward thrust at cruise
    assert tau[0] < 0.0          # reaction torque opposes CW rotation
    assert float(y.J) == pytest.approx(2 * np.pi * 50 / (omega * 1.9), rel=1e-3)
    assert float(y.hr_p[0]) == pytest.approx(0.3 * omega)
    assert 0.0 < float(y.eta_p) < 1.0


def test_ccw_symmetry(lookup):
    cw = P.Propeller(lookup, sense=P.CW, d=1.9)
    ccw = P.Propeller(lookup, sense=P.CCW, d=1.9)
    air, kin = _air_kin(TAS=40.0)
    omega = 200.0
    y_cw = cw.output({}, kin, air, jnp.asarray(omega))
    y_ccw = ccw.output({}, kin, air, jnp.asarray(-omega))
    # same axial force magnitude, opposite axial torque
    assert float(y_cw.wr_p.F[0]) == pytest.approx(float(y_ccw.wr_p.F[0]))
    assert float(y_cw.wr_p.tau[0]) == pytest.approx(-float(y_ccw.wr_p.tau[0]))


def test_variable_pitch_mapping():
    lk = P.generate_lookup(J_range=(0.0, 1.0, 5), Mt_range=(0.0, 1.0, 5),
                           dbeta_range=(0.0, 0.3, 4), n_zeta=55)
    prop = P.Propeller(lk, pitch=("variable", 0.0, 0.3))
    assert float(prop.get_dbeta({"pitch": jnp.asarray(0.0)})) == 0.0
    assert float(prop.get_dbeta({"pitch": jnp.asarray(1.0)})) == pytest.approx(0.3)
    assert float(prop.get_dbeta({"pitch": jnp.asarray(0.5)})) == pytest.approx(0.15)


pytestmark = pytest.mark.fast
