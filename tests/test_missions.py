"""Scripted-mission demo tests (short horizons — the full missions are
exercised by the demos; these check the phase machinery, leg geometry and
the first mission phases against physical expectations, mirroring the
acceptance-band style of `test_c172x2.jl:55-176`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from flightjax.demos import c172_demos as D


@pytest.mark.fast
def test_lows_pattern_geometry():
    """Leg endpoints chain and the final leg descends 3 deg to the runway."""
    from flightjax.models.c172 import c172x_gdc as GDC

    legs = D._lows_pattern()
    fin, base = legs["final"], legs["base"]
    # chaining: base ends where final starts
    assert float(jnp.linalg.norm(base.n_e2 - fin.n_e1)) < 1e-12
    assert float(base.h_e2) == pytest.approx(float(fin.h_e1))
    # final leg: 3 km long, ~157 m height loss (3 deg slope)
    dh = float(fin.h_e1 - fin.h_e2)
    assert dh == pytest.approx(3e3 * np.tan(np.deg2rad(3)), rel=1e-6)
    data = GDC.segment_data(fin, fin.n_e1, fin.h_e1)
    assert float(data.s_12) == pytest.approx(3e3, rel=1e-3)
    # course of the final leg is the runway heading
    assert float(data.chi_12) == pytest.approx(D.PSI_LOWS15, abs=1e-3)
    # departure leg starts at the runway
    dep = legs["departure"]
    assert float(dep.h_e1) == pytest.approx(legs["h_rwy"])


def test_loiter_demo_first_60s():
    """First 60 s of the loiter demo: circular guidance engaged, radial
    error shrinking toward the circle, altitude held."""
    from flightjax.models.c172 import c172x_gdc as GDC

    final, log = D.loiter(t_end=60.0, save_every=100)
    assert not bool(final.s["terminated"])
    kin = log.y.vehicle.kinematics
    h0, h1 = float(kin.h_e[0]), float(kin.h_e[-1])
    assert abs(h1 - h0) < 10.0
    # radial error: started 500 m outside (2000 m offset - 1500 m radius),
    # must have shrunk substantially by 60 s
    gdc_u = final.u["avionics"]["gdc"]
    orbit = GDC.Circle(*[gdc_u["orbit"][k] for k in
                         ("n_e", "h_e", "radius", "turn_dir")]) \
        if isinstance(gdc_u["orbit"], dict) else gdc_u["orbit"]
    d0 = GDC.circle_data(orbit, kin.n_e[0], kin.h_e[0])
    d1 = GDC.circle_data(orbit, kin.n_e[-1], kin.h_e[-1])
    assert abs(float(d1.e_cb)) < abs(float(d0.e_cb)) * 0.7


def test_crosswind_landing_on_slope():
    """First 20 s of the approach: still in phase 'final', tracking the
    3-deg glide slope down under the 6 m/s crosswind."""
    final, log = D.crosswind_landing(t_end=20.0, save_every=100)
    assert int(final.s["avionics"]["phase"]) == 0  # still on final
    assert not bool(final.s["terminated"])
    h0 = float(log.y.vehicle.kinematics.h_e[0])
    h1 = float(final.x["vehicle"]["kinematics"]["h_e"])
    # ~30 m/s ground speed at -3 deg -> ~1.5 m/s sink over 20 s
    assert 10.0 < (h0 - h1) < 60.0
    # cross-track error stays bounded despite the crosswind
    from flightjax.models.c172 import c172x_gdc as GDC
    legs = D._lows_pattern()
    kin_ne = final.x["vehicle"]["kinematics"]
    _, kin = None, None  # endpoint check via segment_data on logged output
    e = GDC.segment_data(legs["final"],
                         log.y.vehicle.kinematics.n_e[-1],
                         log.y.vehicle.kinematics.h_e[-1]).e_sb
    assert abs(float(e)) < 100.0


def test_traffic_pattern_startup_sequence():
    """Standby holds for 5 s; the starter then spins the engine up and the
    mission reaches the takeoff phase with full throttle."""
    from flightjax.physics.piston import ENG_RUNNING

    final, log = D.traffic_pattern(t_end=40.0, save_every=100)
    phase = int(final.s["avionics"]["phase"])
    assert phase >= 2, f"still in phase {phase} at t=40"
    eng = final.s["vehicle"]["systems"]["pwp"]["engine"]["state"]
    assert int(eng) == ENG_RUNNING
    assert not bool(final.s["terminated"])


def test_turbulent_fleet_loads_demo():
    """The gust-load study demo end-to-end on a small fleet: peaks are
    physical (~1 g jostled cruise), exceedance fractions are monotone
    non-increasing in the threshold, and nobody crashes in 2 s of
    moderate turbulence at altitude."""
    final, peaks, frac = D.turbulent_fleet_loads(batch=8, t_end=2.0,
                                                 W20=10.0)
    peaks, frac = np.asarray(peaks), np.asarray(frac)
    assert peaks.shape == (8,) and np.all(np.isfinite(peaks))
    assert np.all(peaks > 0.7) and np.all(peaks < 5.0)
    assert np.all(np.diff(frac) <= 1e-12)  # monotone in threshold
    assert float(np.asarray(final.s["terminated"]).sum()) == 0.0
